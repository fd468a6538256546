package graft

import org.apache.spark.unsafe.types.UTF8String

/** Web-table kernel pins (round 15): every contract rule on crafted
  * HTML, plus exact agreement with an independent java.util.regex
  * replay of the oracle's non-greedy pattern chain on generated pages.
  */
class HtmlTablesSpec extends SparkSpec {
  import graft.plans.HtmlTables

  private def cells(html: String): Seq[(Int, Int, Int, Boolean, String)] = {
    val a = HtmlTables.compute(UTF8String.fromString(html))
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 5)
      (r.getInt(0), r.getInt(1), r.getInt(2), r.getBoolean(3), r.getUTF8String(4).toString)
    }
  }

  test("basic table: 1-based indices, header flag per row, cell order") {
    val h = "<p>x</p><table id=\"a\"><tr><th>k</th><th>v</th></tr>" +
      "<tr><td>lang</td><td>en</td></tr></table>"
    assert(cells(h) == Seq(
      (1, 1, 1, true, "k"), (1, 1, 2, true, "v"),
      (1, 2, 1, false, "lang"), (1, 2, 2, false, "en")))
  }

  test("cell text: inner tags strip, entities decode in pinned order, ws collapses") {
    val h = "<table><tr><td> a  <b>b</b>\tc </td>" +
      "<td>x &amp; y</td><td>&lt;tag&gt;</td><td>&quot;q&#39;</td></tr></table>"
    assert(cells(h).map(_._5) == Seq("a b c", "x & y", "<tag>", "\"q'"))
    // &amp;lt; decodes the &amp; LAST → literal '&lt;' text, not '<'
    assert(cells("<table><tr><td>&amp;lt;</td></tr></table>").map(_._5) == Seq("&lt;"))
  }

  test("multiple tables number sequentially; text between them is ignored") {
    val h = "<table><tr><td>a</td></tr></table>prose" +
      "<table class=\"x\"><tr><td>b</td><td>c</td></tr></table>"
    assert(cells(h) == Seq(
      (1, 1, 1, false, "a"), (2, 1, 1, false, "b"), (2, 1, 2, false, "c")))
  }

  test("unterminated structures match nothing (the non-greedy contract)") {
    assert(cells("<table><tr><td>a</td></tr>") == Seq())
    assert(cells("<table><tr><td>a</table>") ==
      Seq())
    assert(cells("no tables here at all") == Seq())
    assert(cells("") == Seq())
    // an unterminated CELL inside a terminated row yields no cell
    assert(cells("<table><tr><td>a</tr></table>") == Seq())
  }

  test("a newline inside any body kills the match (RE2 '.' never crosses lines)") {
    assert(cells("<table><tr><td>a\nb</td></tr></table>") == Seq())
    assert(cells("<table><tr>\n<td>a</td></tr></table>") == Seq())
    // recovery: a later clean table still matches
    assert(cells("<table><tr><td>a\nb</td></tr></table>" +
      "<table><tr><td>c</td></tr></table>") == Seq((1, 1, 1, false, "c")))
  }

  test("mismatched </th> closes a <td> (exactly like the oracle's regex)") {
    val h = "<table><tr><td>a</th><td>b</td></tr></table>"
    assert(cells(h) == Seq((1, 1, 1, false, "a"), (1, 1, 2, false, "b")))
  }

  test("agrees with an independent regex replay on generated pages") {
    import java.util.regex.Pattern
    val tableP = Pattern.compile("<table[^>]*>(.*?)</table>")
    val rowP = Pattern.compile("<tr[^>]*>(.*?)</tr>")
    val cellP = Pattern.compile("<t[hd][^>]*>(.*?)</t[hd]>")
    def ref(h: String): Seq[(Int, Int, Int, Boolean, String)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Boolean, String)]
      val tm = tableP.matcher(h); var ti = 0
      while (tm.find()) {
        ti += 1
        val rm = rowP.matcher(tm.group(1)); var ri = 0
        while (rm.find()) {
          ri += 1
          val rb = rm.group(1)
          val hdr = rm.group(1).contains("<th") ||
            // the kernel checks the row BODY; '<th' in attrs of the row
            // tag itself is outside the body in both engines
            false
          val cm = cellP.matcher(rb); var ci = 0
          while (cm.find()) {
            ci += 1
            val txt = cm.group(1).replaceAll("<[^>]*>", "")
              .replace("&lt;", "<").replace("&gt;", ">")
              .replace("&quot;", "\"").replace("&#39;", "'")
              .replace("&amp;", "&")
              .replaceAll("\\s+", " ").trim
            out += ((ti, ri, ci, hdr, txt))
          }
        }
      }
      out.toSeq
    }
    val rng = new scala.util.Random(7)
    val frags = Array("<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
      "<th>", "</th>", "word", " ", "&amp;", "<b>x</b>", "<table class=\"z\">",
      "<td colspan=\"2\">", "7", "&lt;", "\n")
    (1 to 300).foreach { _ =>
      val h = (1 to rng.nextInt(30)).map(_ => frags(rng.nextInt(frags.length))).mkString
      assert(cells(h) == ref(h), s"divergence on: ${h.replace("\n", "\\n")}")
    }
  }

  private def anchors(html: String): Seq[(String, String)] = {
    val a = graft.plans.HtmlAnchors.compute(UTF8String.fromString(html))
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
    }
  }

  test("anchors kernel: contract pins (r15)") {
    assert(anchors("<a href=\"https://x/\">hi <b>there</b></a>") ==
      Seq(("https://x/", "hi there")))
    // missing the literal '>' after the quote → no match, scan continues
    assert(anchors("<a href=\"u\" class=\"z\">t</a><a href=\"v\">w</a>") ==
      Seq(("v", "w")))
    // unterminated anchor → nothing
    assert(anchors("<a href=\"u\">text") == Seq())
    // a newline inside the TEXT kills the match (RE2 '.'), one inside
    // the href does not (negated class)
    assert(anchors("<a href=\"u\">a\nb</a>") == Seq())
    assert(anchors("<a href=\"u\nv\">t</a>") == Seq(("u\nv", "t")))
    // entity + ws cleanup in text
    assert(anchors("<a href=\"u\">  a &amp;\tb </a>") == Seq(("u", "a & b")))
  }

  test("anchors kernel: agrees with an independent regex replay on generated pages (r15)") {
    import java.util.regex.Pattern
    val pat = Pattern.compile("<a href=\"([^\"]*)\">(.*?)</a>")
    def ref(h: String): Seq[(String, String)] = {
      val m = pat.matcher(h)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (m.find()) out += ((m.group(1), graft.plans.HtmlAnchors.clean(m.group(2))))
      out.toSeq
    }
    val rng = new scala.util.Random(11)
    val frags = Array("<a href=\"", "\">", "</a>", "u1", "txt", " ", "\"",
      "<b>x</b>", "&amp;", "<a href=\"v\" id=\"k\">", "\n", ">")
    (1 to 300).foreach { _ =>
      val h = (1 to rng.nextInt(25)).map(_ => frags(rng.nextInt(frags.length))).mkString
      assert(anchors(h) == ref(h), s"divergence on: ${h.replace("\n", "\\n")}")
    }
  }

  test("q_anchor_text: hub consensus and alias collapse live on the fixture (r15)") {
    val rows = SparkEntry.queries("q_anchor_text")(spark, TestSpark.Sf0001).collect()
    try {
      assert(rows.length == 40)
      val hub = rows.head
      // the hub target dominates, with ONE consensus text
      assert(hub.getString(0) == "https://site0.com/")
      assert(hub.getString(3) == "the hub page")
      assert(hub.getLong(2) == 1L && hub.getLong(1) == hub.getLong(4))
      // every target key is canonical: lowercase, no :443, no utm
      rows.foreach { r =>
        val t = r.getString(0)
        assert(t == t.toLowerCase && !t.contains(":443") && !t.contains("utm_"),
          s"non-canonical target leaked: $t")
      }
    } finally CacheScope.release()
  }

  test("q_html_tables: planted arms live on the real fixture") {
    val rows = SparkEntry.queries("q_html_tables")(spark, TestSpark.Sf0001).collect()
    try {
      assert(rows.length == 5)
      rows.foreach { r =>
        val (nDocs, nTables, nRows, nCells, hdr) =
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        // every cell-bearing doc has 1 or 2 tables; header cells are the
        // 2 <th> of each meta table; num_mass > 0 (the chars cell)
        assert(nTables >= nDocs && nTables <= 2 * nDocs)
        // header cells are exactly the two <th> of each meta table, and
        // meta tables have 4 rows vs the extra table's 1: solving the
        // row equation, meta_docs = (nRows - nTables) / 3
        val metaDocs = (nRows - nTables) / 3
        assert((nRows - nTables) % 3 == 0)
        assert(hdr == 2 * metaDocs, s"header cells $hdr vs meta docs $metaDocs")
        assert(nCells == 2 * nRows, "every fixture row has exactly 2 cells")
        assert(r.getLong(6) > 0L, "numeric harvest must be live")
      }
    } finally CacheScope.release()
  }
}
