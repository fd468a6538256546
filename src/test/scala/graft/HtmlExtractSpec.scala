package graft

import org.apache.spark.sql.functions._
import graft.operators.HtmlExtract

/** Pins each rule of the jusText-shape extraction
  * ([[graft.operators.HtmlExtract]]) on handcrafted HTML, including the
  * two ordering hazards (script removal BEFORE block segmentation; entity
  * decode AFTER tag stripping) and the per-rule death of every fixture
  * boilerplate block used by q_html_extract. */
class HtmlExtractSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def run(html: String): (String, Long, Long, Long) = {
    val r = Seq(html).toDF("h")
      .select(HtmlExtract.extract(col("h")).as("e"))
      .select("e.extracted", "e.kept_lines", "e.dropped_lines", "e.boiler_chars")
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("content survives, short and link-dense blocks drop") {
    val (ex, k, d, bc) = run(
      "<html><body>" +
        "<nav><a href=\"/\">home page</a> <a href=\"/x\">about this site</a></nav>" +
        "<p>this paragraph is long enough to keep and has no links at all</p>" +
        "<footer><a href=\"/t\">terms of use</a> short</footer>" +
        "</body></html>")
    assert(ex == "this paragraph is long enough to keep and has no links at all")
    assert(k == 1)
    assert(d == 2) // nav (density), footer (density: 12 of 18 anchored)
    assert(bc == ("home page about this site".length + "terms of use short".length))
  }

  test("mixed line dies by density even when most text is outside anchors") {
    // 27 visible chars, 12 anchored → 36 ≥ 27
    val (ex, _, d, _) = run("<p><a href=\"/tos\">terms of use</a> © 2024 example</p>")
    assert(ex == "" && d == 1)
  }

  test("content with a modest inline link stays content") {
    val body = "x" * 60
    val (ex, k, _, _) = run(s"<p>$body <a href=\"/r\">see reference notes</a></p>")
    assert(k == 1 && ex == s"$body see reference notes")
  }

  test("script containing '</div>' and style containing '>' are removed whole") {
    val (ex, k, d, _) = run(
      "<style>body{color:#333} .x>y{margin:0}</style>" +
        "<script>var s='</div>'; if(a<b){go()}</script>" +
        "<p>the only real content line in this document body</p>")
    assert(ex == "the only real content line in this document body")
    assert(k == 1 && d == 0)
  }

  test("entities decode AFTER tag stripping: literal &lt;b&gt; survives as text") {
    val (ex, _, _, _) = run(
      "<p>encoded markup &lt;b&gt; &amp; &quot;q&quot; &#39;s&#39; stays visible text</p>")
    assert(ex == "encoded markup <b> & \"q\" 's' stays visible text")
  }

  test("multi-block content survives in document order") {
    val (ex, k, _, _) = run(
      "<div><p>first paragraph with enough characters</p>" +
        "<p>second paragraph with enough characters</p></div>")
    assert(k == 2)
    assert(ex == "first paragraph with enough characters\nsecond paragraph with enough characters")
  }

  test("q_html_extract round-trip: extraction recovers documents.text") {
    // even doc_ids, no entity arm (doc_id%7!=3), no ref arm (doc_id%5!=4):
    // extracted text must equal the original byte-for-byte
    val docs = graft.Tables.t(spark, TestSpark.Sf0001, "documents")
      .filter(col("doc_id") % 2 === 0 && col("doc_id") % 7 =!= 3 &&
        col("doc_id") % 5 =!= 4)
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val html = concat(lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit("</title>"), lit(graft.queries.PipelineQueries.HtmlFixture.Head),
      lit(graft.queries.PipelineQueries.HtmlFixture.Nav),
      lit("<div class=\"main\"><p>"), col("text"), lit("</p></div>"),
      lit(graft.queries.PipelineQueries.HtmlFixture.Footer), lit("</body></html>"))
    val bad = docs.select(col("doc_id"), col("text"),
        HtmlExtract.extract(html).getField("extracted").as("ex"))
      .filter(col("ex") =!= col("text"))
      .count()
    assert(bad == 0L)
  }

  test("pretty-printed HTML: source newlines are NOT block boundaries (r14)") {
    // the r13 reviewer's case: a single paragraph spread over source lines
    // must stay ONE block (the old code shredded it into per-source-line
    // fragments that minChars then dropped)
    val (ex, k, d, _) = run(
      "<div>\n  <p>\n    a paragraph that real crawl markup\n" +
        "    pretty-prints across many short source lines\n  </p>\n</div>")
    assert(k == 1 && d == 0)
    assert(ex == "a paragraph that real crawl markup pretty-prints across many short source lines")
    // and an anchor split across source lines still matches
    val (ex2, _, d2, _) = run(
      "<nav><a\n   href=\"/\">home page links</a> <a href=\"/x\">more of the same</a></nav>")
    assert(ex2 == "" && d2 == 1)
  }

  test("nested inline markup inside anchors counts toward link density (r14)") {
    // the r13 reviewer's case: <a><b>…</b></a> counted ZERO anchor chars,
    // so nested-markup link farms survived as content
    val (ex, _, d, _) = run(
      "<div><a href=\"/p1\"><b>click here to win</b></a> " +
        "<a href=\"/p2\"><i>read more articles</i></a> " +
        "<a href=\"/p3\"><span>best deals today</span></a></div>")
    assert(ex == "" && d == 1)
  }

  private val crafted = Seq(
    "", "plain text with no markup at all, long enough to keep",
    "<p>ok content line long enough to keep</p>",
    // unclosed script: the opener passes through to tag stripping
    "<script>var x = 1; content after an unclosed script element stays",
    // interleaved unbalanced script/style (pass ORDER is observable)
    "<style><script></style></script><p>content line long enough to keep here</p>",
    "<script><style></script></style><p>content line long enough to keep here</p>",
    // uppercase tags / bare <a> are documented non-matches
    "<P>UPPER close does not segment</P><p>real content line long enough here</p>",
    "<div><A HREF=\"/x\">upper anchor not counted as link mass here</A></div>",
    "<div><a>bare anchor with no attribute is not counted either ok</a></div>",
    // nested anchors: capture runs to the FIRST </a>
    "<div><a href=x>outer <a href=y>inner</a> tail</a> filler text</div>",
    // anchor with no close in the line
    "<div><a href=x>never closed anchor but the line is long enough</div>",
    // '<' with no '>' stays literal; later tags still strip
    "<p>math: a < b and c <b>bold</b> still works as content text</p>",
    // consecutive boundaries and trailing whitespace
    "<p></p><p>middle content line long enough to keep</p></div>   ",
    // double-encoded entities decode exactly once
    "<p>double encoded &amp;lt;tag&amp;gt; survives as &lt;tag&gt; text</p>",
    // non-BMP codepoints in content and anchor mass
    "<p>clef 𝄞 content long enough to keep either way</p>",
    "<div><a href=x>𝄞𝄞𝄞</a> tiny</div>",
    // tabs inside tags normalize, making the anchor matchable
    "<nav><a\thref=\"/\">tabbed anchor link text</a>\t<a href=\"/y\">more link text</a></nav>",
    // block-close with attributes / unknown names do not segment
    "<p>alpha</p attr><p>beta content line long enough to keep</p></h7>")

  test("kernel ≡ Column reference on crafted hazards (r14)") {
    val df = crafted.toDF("h")
    val both = df.select(
        HtmlExtract.extract(col("h")).as("ref"),
        graft.plans.HtmlExtractExpressions.htmlExtract(col("h")).as("ker"))
      .collect()
    both.zip(crafted).foreach { case (r, src) =>
      assert(r.getStruct(0) == r.getStruct(1),
        s"kernel diverges from Column form on: $src\nref=${r.getStruct(0)}\nker=${r.getStruct(1)}")
    }
  }

  test("kernel ≡ Column reference on the generated fixture corpus (r14)") {
    val docs = graft.Tables.t(spark, TestSpark.Sf0001, "documents")
    val html = graft.queries.PipelineQueries.htmlFixtureCol
    val bad = docs.select(
        HtmlExtract.extract(html).as("ref"),
        graft.plans.HtmlExtractExpressions.htmlExtract(html).as("ker"))
      .filter(col("ref") =!= col("ker"))
      .count()
    assert(bad == 0L)
  }

  test("html_extract SQL function ≡ kernel Column API (r14)") {
    GraftExtensions.register(spark)
    val df = crafted.toDF("h")
    df.createOrReplaceTempView("html_ext")
    val viaSql = spark.sql(
      "SELECT html_extract(h, 15, 3) AS e FROM html_ext").collect().toSeq
    val viaCol = df.select(
      graft.plans.HtmlExtractExpressions.htmlExtract(col("h")).as("e")).collect().toSeq
    assert(viaSql.map(_.toString) == viaCol.map(_.toString))
  }

  test("q_html_extract is one narrow pass: no exchange before the final aggregate") {
    val p = graft.queries.PipelineQueries
      .qHtmlExtract(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    // allowed: one shuffle for the lang aggregate + the output range sort;
    // anything more means the HOF pipeline broke row-locality
    val exchanges = p.split("Exchange ").length - 1
    assert(exchanges <= 2, s"expected ≤2 exchanges (agg + sort), got $exchanges:\n$p")
  }

  test("html_outlinks kernel ≡ the regex contract on crafted hazards (r15)") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    // the contract: regexp_extract_all(html, 'href="([^"]*)"', 1) —
    // leftmost, non-overlapping, unclosed quote never matches
    val crafted = Seq(
      """<a href="https://a.com/x">a</a>""",
      """<a href="/rel">r</a><link href="style.css"><area href="#f">""",
      """no links at all""",
      """href="unclosed""",                        // no closing quote: none
      """<a href="">empty</a>""",                  // empty capture kept
      """<a href="a"b href="c">""",                // resume AFTER the close
      """<a HREF="upper">case-sensitive</a>""",    // literal lowercase only
      """text href="x" more href="y" tail""",      // attribute-level scan
      """<a href="q?a=1&b=2#f">q</a>""")
    val rows = crafted.toDF("h").select(
        graft.plans.HtmlExtractExpressions.htmlOutlinks(col("h")).as("ker"),
        regexp_extract_all(col("h"), lit("href=\"([^\"]*)\""), lit(1)).as("ref"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zip(crafted).foreach { case ((ker, ref), src) =>
      assert(ker == ref, s"diverged on '$src': ker=$ker ref=$ref")
    }
    // and on the generated link fixture (every planted href shape)
    val docs = graft.Tables.t(spark, TestSpark.Sf0001, "documents")
    val bad = docs.select(graft.queries.PipelineQueries.linkFixtureCol.as("h"))
      .select(
        graft.plans.HtmlExtractExpressions.htmlOutlinks(col("h")).as("ker"),
        regexp_extract_all(col("h"), lit("href=\"([^\"]*)\""), lit(1)).as("ref"))
      .filter(col("ker") =!= col("ref")).count()
    assert(bad == 0L)
  }
}
