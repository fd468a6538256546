package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HTML→text extraction kernel — the one-pass-per-stage character
  * scanner behind [[graft.operators.HtmlExtract.extract]].
  *
  * The Column reference runs FIVE java.util.regex passes per document
  * (script elision, style elision, whitespace normalization, block
  * sentinel insertion, then per-line tag-strip + anchor regexes inside
  * interpreted `transform`/`aggregate`/`filter` HOF trees — the exact
  * CodegenFallback shape the round-9 campaign measured and cut ~10× with
  * byte scanners, e.g. pii_redact 114.2→10.1 s at 100×). This kernel
  * reproduces the SAME semantics with hand-rolled scanners, each stage
  * mirroring its regex's leftmost, non-overlapping behavior exactly:
  *
  *  1. `(?s)<script[^>]*>.*?</script>` elision — literal `<script`, skip
  *     to the FIRST `>`, then to the FIRST `</script>`; a start with no
  *     closing pair is NOT a match (the `<` passes through to tag
  *     stripping), and the scan resumes AFTER a successful match, so an
  *     opener inside an elided span is never reconsidered. Scripts run
  *     over the whole input BEFORE styles — two separate passes, exactly
  *     like the two sequential regexp_replace calls (order is observable
  *     when the two element kinds interleave unbalanced).
  *  2. `[ \t\r\n]+` → one space (r14 semantics: source newlines must NOT
  *     act as block boundaries).
  *  3. `</(title|nav|p|div|…)>` block sentinels: a closing tag whose name
  *     (the chars strictly between `</` and the next `>`) is in the block
  *     set ends the current line; the final segment (split keeps the
  *     trailing empty) is a line too.
  *  4. per line, tag strip `<[^>]*>` (first `<` to first LATER `>`, NOT
  *     bracket-balanced — a `<` with no `>` left in the line stays
  *     literal and scanning continues at the next char), space-trim, and
  *     anchor mass via `(?s)<a [^>]*>(.*?)</a>` (literal lowercase
  *     `<a␣`, first `>`, capture to the FIRST `</a>`, inner tags
  *     stripped from the capture before counting; a failed start resumes
  *     searching at the next character, a successful one after the
  *     closing tag).
  *  5. classify (codepoint length ≥ minChars AND a·densityNum < length —
  *     the float-free cross-multiply), join kept blocks with `\n`, decode
  *     the five standard entities in the reference's order (`&amp;`
  *     last).
  *
  * All lengths are Unicode CODEPOINT counts (Spark's `length`, DuckDB's
  * `length`), so the kernel is exact on non-BMP input too.
  * HtmlExtractSpec pins kernel ≡ Column form on the crafted hazard
  * corpus (unclosed scripts, interleaved script/style, nested anchors,
  * pretty-printed paragraphs) and on generated documents; the
  * q_html_extract DuckDB oracle is the mass cross-check at both SFs.
  */
object HtmlText {

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("title", "nav", "p", "div", "aside", "footer", "li",
      "h1", "h2", "h3", "h4", "h5", "h6", "tr", "blockquote").foreach(s.add)
    s
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n'

  /** Stage 1: elide `<tag[^>]*>.*?</tag>` spans (one element kind per
    * pass, mirroring one regexp_replace). */
  private def elide(h: String, tag: String): String = {
    val open = "<" + tag
    val close = "</" + tag + ">"
    var p = h.indexOf(open)
    if (p < 0) return h
    val sb = new java.lang.StringBuilder(h.length)
    var from = 0
    while (p >= 0) {
      val g = h.indexOf('>', p + open.length)
      val q = if (g < 0) -1 else h.indexOf(close, g + 1)
      if (q < 0) {
        // no closing pair: the regex fails at this start; a later opener
        // can still match, so only skip past this occurrence
        p = h.indexOf(open, p + 1)
      } else {
        sb.append(h, from, p)
        from = q + close.length
        p = h.indexOf(open, from)
      }
    }
    sb.append(h, from, h.length)
    sb.toString
  }

  /** Stage 2: collapse `[ \t\r\n]+` runs to one space. */
  private def normalizeWs(h: String): String = {
    val n = h.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pending = false
    while (i < n) {
      val c = h.charAt(i)
      if (isWs(c)) pending = true
      else {
        if (pending) { sb.append(' '); pending = false }
        sb.append(c)
      }
      i += 1
    }
    if (pending) sb.append(' ')
    sb.toString
  }

  /** If t(i…) is a block-closing tag `</name>` with name in the block
    * set, returns the index just past its `>`; else -1. */
  private def blockClose(t: String, i: Int): Int = {
    if (i + 1 >= t.length || t.charAt(i) != '<' || t.charAt(i + 1) != '/') return -1
    val g = t.indexOf('>', i + 2)
    if (g < 0) return -1
    if (BlockTags.contains(t.substring(i + 2, g))) g + 1 else -1
  }

  /** Per-line visible text: tag spans removed (first-`<`-to-first-`>`,
    * line-bounded), appended to `out`; returns nothing — caller trims. */
  private def stripTags(t: String, ls: Int, le: Int,
                        out: java.lang.StringBuilder): Unit = {
    var i = ls
    while (i < le) {
      val c = t.charAt(i)
      if (c == '<') {
        val g = t.indexOf('>', i + 1)
        if (g >= 0 && g < le) i = g + 1
        else { out.append(c); i += 1 } // unclosed: literal, keep scanning
      } else { out.append(c); i += 1 }
    }
  }

  /** Per-line anchor mass: codepoints inside `<a [^>]*>(.*?)</a>` bodies
    * with inner tags stripped (capture-bounded). */
  private def anchorChars(t: String, ls: Int, le: Int): Long = {
    var total = 0L
    var p = t.indexOf("<a ", ls)
    while (p >= 0 && p < le) {
      val g = t.indexOf('>', p + 3)
      val q = if (g < 0 || g >= le) -1 else t.indexOf("</a>", g + 1)
      if (q < 0 || q + 4 > le) {
        p = t.indexOf("<a ", p + 1)
      } else {
        // count capture codepoints excluding tag spans (capture-bounded)
        var i = g + 1
        while (i < q) {
          val c = t.charAt(i)
          if (c == '<') {
            val h2 = t.indexOf('>', i + 1)
            if (h2 >= 0 && h2 < q) i = h2 + 1
            else { total += 1; i += 1 }
          } else {
            total += 1
            if (Character.isHighSurrogate(c) && i + 1 < q &&
              Character.isLowSurrogate(t.charAt(i + 1))) i += 2
            else i += 1
          }
        }
        p = t.indexOf("<a ", q + 4)
      }
    }
    total
  }

  /** Sequential literal entity decode, `&amp;` strictly last. */
  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&amp;", "&")

  def compute(html: UTF8String, minChars: Int, densityNum: Int): InternalRow = {
    val t = normalizeWs(elide(elide(html.toString, "script"), "style"))
    val n = t.length
    val extracted = new java.lang.StringBuilder(n)
    val lineBuf = new java.lang.StringBuilder(256)
    var keptLines = 0L
    var droppedLines = 0L
    var boilerChars = 0L

    def processLine(ls: Int, le: Int): Unit = {
      lineBuf.setLength(0)
      stripTags(t, ls, le, lineBuf)
      // trim spaces (post-normalization the only whitespace is ' ')
      var s = 0
      var e = lineBuf.length
      while (s < e && lineBuf.charAt(s) == ' ') s += 1
      while (e > s && lineBuf.charAt(e - 1) == ' ') e -= 1
      val cleanLen = lineBuf.codePointCount(s, e).toLong
      val a = anchorChars(t, ls, le)
      val isContent = cleanLen >= minChars && a * densityNum < cleanLen
      if (isContent) {
        if (keptLines > 0L) extracted.append('\n')
        extracted.append(lineBuf, s, e)
        keptLines += 1L
      } else if (e > s) {
        droppedLines += 1L
        boilerChars += cleanLen
      }
    }

    var ls = 0
    var i = 0
    while (i < n) {
      val e = if (t.charAt(i) == '<') blockClose(t, i) else -1
      if (e >= 0) { processLine(ls, i); ls = e; i = e }
      else i += 1
    }
    processLine(ls, n) // split keeps the trailing segment

    InternalRow(
      UTF8String.fromString(decodeEntities(extracted.toString)),
      keptLines, droppedLines, boilerChars)
  }

  val schema: StructType = StructType(Seq(
    StructField("extracted", StringType, nullable = false),
    StructField("kept_lines", LongType, nullable = false),
    StructField("dropped_lines", LongType, nullable = false),
    StructField("boiler_chars", LongType, nullable = false)))
}

/** Outlink extraction — the WAT-side companion of the text kernel
  * (round-15 verdict item 2: href targets were framed for link-density
  * but discarded). Semantics are EXACTLY the regex
  * `href="([^"]*)"` applied leftmost, non-overlapping over the raw HTML
  * (the engine-portable contract — DuckDB replays it verbatim with
  * `regexp_extract_all(html, 'href="([^"]*)"', 1)`): scan for the literal
  * `href="`, capture to the next `"`, resume after the closing quote; an
  * opener with no closing quote never matches. Attribute-level on
  * purpose: real crawl WAT extractors record every href (a/link/area);
  * element filtering, absolutization, and canonicalization are downstream
  * row-local stages ([[UrlExpressions.urlCanon]] + the scheme gate). */
object HtmlOutlinks {
  def compute(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = html.toString
    val out = new java.util.ArrayList[UTF8String](8)
    var p = h.indexOf("href=\"")
    while (p >= 0) {
      val q = h.indexOf('"', p + 6)
      if (q < 0) p = -1
      else {
        out.add(UTF8String.fromString(h.substring(p + 6, q)))
        p = h.indexOf("href=\"", q + 1)
      }
    }
    val arr = new Array[Any](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** `html_outlinks(html)` — [[HtmlOutlinks]] as a codegen'd expression. */
case class HtmlOutlinksExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HtmlOutlinks.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HtmlOutlinks.compute($c)")
  override def prettyName: String = "html_outlinks"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Web-table extraction — the structured-data-mining step (WDC Web Table
  * Corpus family: harvesting relational rows out of crawl HTML). One
  * left-to-right byte scan yields every `(tbl, row, col, is_header,
  * cell)` cell of every `<table>` in the page.
  *
  * The contract is EXACTLY the oracle's RE2 replay, so the two engines
  * cannot drift (the html_outlinks discipline):
  *  - tables: leftmost non-greedy `<table[^>]*>(.*?)</table>` — an
  *    unterminated table matches nothing; NESTED tables are out of
  *    contract (the scanner, like the regex, treats the first
  *    `</table>` as the close);
  *  - rows within a table body: `<tr[^>]*>(.*?)</tr>`;
  *  - cells within a row body: `<t[hd][^>]*>(.*?)</t[hd]>` (note the
  *    regex accepts a mismatched `</th>` close for a `<td>` open — the
  *    scanner mirrors that: earliest of the two closers wins);
  *  - `is_header` ⇔ the ROW body contains `<th` (attribute-insensitive
  *    substring, exactly `LIKE '%<th%'`);
  *  - cell text: strip inner tags (`<[^>]*>` → ''), decode the five
  *    basic entities in the pinned order (&lt; &gt; &quot; &#39; then
  *    &amp; LAST), collapse `\s+` runs to one space, trim.
  * Indices are 1-based (the oracle's generate_series ordinality). */
object HtmlTables {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{BooleanType, IntegerType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("tbl", IntegerType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("is_header", BooleanType, nullable = false),
    StructField("cell", StringType, nullable = false)))

  /** Leftmost-repeated `(open1|open2)[^>]*>(.*?)(closer1|closer2)` body
    * spans of `h` within [from, to) — the exact scan the oracle's
    * non-greedy regex performs: earliest open token wins, its body ends
    * at the EARLIEST closer token after the open tag's `>`, and the next
    * search resumes after that closer. */
  private def spans(h: String, from: Int, to: Int, opens: Seq[String],
                    closers: Seq[String]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var cur = from
    var done = false
    while (!done) {
      val openHits = opens.map(o => (h.indexOf(o, cur), o))
        .filter { case (i, _) => i >= 0 && i < to }
      if (openHits.isEmpty) done = true
      else {
        val (p, o) = openHits.minBy(_._1)
        val gt = h.indexOf('>', p + o.length)
        if (gt < 0 || gt >= to) done = true
        else {
          val closeHits = closers.map(c => (h.indexOf(c, gt + 1), c))
            .filter { case (i, c) => i >= 0 && i + c.length <= to }
          if (closeHits.isEmpty) done = true
          else {
            val (e, c) = closeHits.minBy(_._1)
            // RE2 '.' never matches a newline: a BODY containing one
            // cannot match, and the engine advances one position
            if (h.substring(gt + 1, e).contains('\n')) cur = p + 1
            else {
              out += ((gt + 1, e))
              cur = e + c.length
            }
          }
        }
      }
    }
    out.toSeq
  }

  /** The pinned inner-text cleanup (strip tags, the five entities in
    * order with `&amp;` LAST, collapse `\s+`, trim) — shared with
    * [[HtmlAnchors]] so the two oracle-pinned contracts cannot drift. */
  private[plans] def cellText(raw: String): String = {
    val noTags = raw.replaceAll("<[^>]*>", "")
    val decoded = noTags
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&amp;", "&")
    decoded.replaceAll("\\s+", " ").trim
  }

  def compute(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = html.toString
    val cells = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val tables = spans(h, 0, h.length, Seq("<table"), Seq("</table>"))
    tables.zipWithIndex.foreach { case ((ts, te), ti) =>
      val rows = spans(h, ts, te, Seq("<tr"), Seq("</tr>"))
      rows.zipWithIndex.foreach { case ((rs, re), ri) =>
        val hdr = h.indexOf("<th", rs) match {
          case i if i >= 0 && i < re => true
          case _ => false
        }
        val ordered = spans(h, rs, re, Seq("<td", "<th"), Seq("</td>", "</th>"))
        ordered.zipWithIndex.foreach { case ((cs, ce), ci) =>
          val row = new GenericInternalRow(5)
          row.update(0, ti + 1)
          row.update(1, ri + 1)
          row.update(2, ci + 1)
          row.update(3, hdr)
          row.update(4, UTF8String.fromString(cellText(h.substring(cs, ce))))
          cells += row
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(cells.toArray[Any])
  }
}

/** Anchor extraction with TEXT — the input to an anchor-text corpus
  * (the classic Common-Crawl derivative: anchor text is a labeled
  * description of the TARGET page, used as a retrieval/training
  * signal). [[HtmlOutlinks]] captures hrefs only; this kernel captures
  * `(href, text)` pairs under the exact oracle contract
  * `<a href="([^"]*)">(.*?)</a>` (leftmost, non-greedy — an anchor
  * missing the literal `">` or its `</a>` closer matches nothing and
  * the scan resumes one char later, exactly like the regex engine).
  * Anchor text gets the [[HtmlTables]] cell cleanup: inner tags strip,
  * the five entities decode in the pinned order, whitespace collapses,
  * trim. */
object HtmlAnchors {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val Open = "<a href=\""

  /** Anchor-text cleanup ≡ [[HtmlTables.cellText]] (one shared pinned
    * transformation — two copies could drift independently). */
  def clean(raw: String): String = HtmlTables.cellText(raw)

  def compute(html: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val h = html.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var cur = 0
    var done = false
    while (!done) {
      val p = h.indexOf(Open, cur)
      if (p < 0) done = true
      else {
        val q = h.indexOf('"', p + Open.length)
        if (q < 0) done = true
        else if (q + 1 >= h.length || h.charAt(q + 1) != '>') cur = p + 1
        else {
          val e = h.indexOf("</a>", q + 2)
          // RE2 '.' never matches a newline (negated classes like [^"]
          // do): a TEXT span containing one cannot match, engine advances
          if (e < 0) cur = p + 1
          else if (h.substring(q + 2, e).contains('\n')) cur = p + 1
          else {
            val row = new GenericInternalRow(2)
            row.update(0, UTF8String.fromString(h.substring(p + Open.length, q)))
            row.update(1, UTF8String.fromString(clean(h.substring(q + 2, e))))
            out += row
            cur = e + 4
          }
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }
}

/** `html_anchors(html)` — [[HtmlAnchors]] as a codegen'd expression. */
case class HtmlAnchorsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(HtmlAnchors.schema, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HtmlAnchors.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HtmlAnchors.compute($c)")
  override def prettyName: String = "html_anchors"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `html_tables(html)` — [[HtmlTables]] as a codegen'd expression. */
case class HtmlTablesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(HtmlTables.schema, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HtmlTables.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HtmlTables.compute($c)")
  override def prettyName: String = "html_tables"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `html_extract(html)` — [[HtmlText]] as a codegen'd expression; the
  * thresholds are plan-time constants baked into the generated call. */
case class HtmlExtractExpr(child: Expression, minChars: Int, densityNum: Int)
    extends UnaryExpression {
  override def dataType: DataType = HtmlText.schema
  override def nullSafeEval(input: Any): Any =
    HtmlText.compute(input.asInstanceOf[UTF8String], minChars, densityNum)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.HtmlText.compute($c, $minChars, $densityNum)")
  override def prettyName: String = "html_extract"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlExtractExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def htmlExtract(html: Column,
                  minChars: Int = graft.operators.HtmlExtract.MinChars,
                  densityNum: Int = graft.operators.HtmlExtract.DensityNum): Column =
    column(HtmlExtractExpr(expression(html), minChars, densityNum))

  def htmlOutlinks(html: Column): Column =
    column(HtmlOutlinksExpr(expression(html)))

  def htmlTables(html: Column): Column =
    column(HtmlTablesExpr(expression(html)))

  def htmlAnchors(html: Column): Column =
    column(HtmlAnchorsExpr(expression(html)))
}
