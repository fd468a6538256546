package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction (boilerplate removal) — the trafilatura/jusText-
  * shape curation stage every web pipeline runs BEFORE language-ID /
  * quality / dedup (none of which the reference's FASTX domain needs, but
  * all of which this engine ships downstream of here).
  *
  * The algorithm is the deterministic core of jusText (Pomikálek 2011):
  *
  *   1. remove `<script>`/`<style>` elements WHOLE (their content is code,
  *      and may itself contain markup like `'</div>'` string literals that
  *      would corrupt later stages — order matters and is spec-pinned);
  *   2. segment into blocks at closing block-level tags
  *      (`</title|nav|p|div|aside|footer|...>`);
  *   3. per block, BEFORE stripping inline tags, measure anchor-text mass
  *      (the characters inside `<a …>…</a>`) — the link-density signal;
  *   4. strip remaining tags, trim, and classify: a block is content iff
  *      it is long enough (`minChars`) AND its link density is below the
  *      threshold (`densityNum·a_chars < n_chars`, integer cross-multiply
  *      so the rule is float-free and bit-exact in any engine);
  *   5. join kept blocks with `\n` and decode HTML entities LAST —
  *      decoding before tag-stripping would turn literal `&lt;b&gt;` text
  *      into a tag and delete it (the classic extraction bug; the fixture
  *      plants exactly that hazard).
  *
  * Everything is per-row `Column` algebra over higher-order functions —
  * one narrow scan pass, no explode, no shuffle; at 100 TB the stage is
  * embarrassingly parallel and fuses into whatever aggregation follows.
  * Stopword/quality signals on the EXTRACTED text come from the existing
  * [[graft.plans.TextStatsExpressions.textStats]] kernel rather than a
  * second tokenizer.
  */
object HtmlExtract {

  /** Closing tags treated as block boundaries. */
  val BlockTags = "title|nav|p|div|aside|footer|li|h[1-6]|tr|blockquote"

  /** Default jusText-ish thresholds: blocks shorter than 15 visible chars
    * are headers/footers/crumbs; blocks whose anchor mass is ≥ 1/3 of
    * their text are link lists. */
  val MinChars = 15
  val DensityNum = 3

  /** Stage 1-2: drop script/style elements, NORMALIZE WHITESPACE (r14 —
    * review: real crawl HTML is pretty-printed, and without this every
    * source newline acted as a block boundary, shredding paragraphs into
    * per-source-line fragments that minChars then misclassified; runs of
    * space/tab/CR/LF collapse to one space, so the only `\n` in the
    * stream are the block sentinels inserted next — and `<a\nhref=…>`
    * anchors become matchable `<a href=…>`), then put each block on its
    * own line. Non-greedy `(?s).*?` spans are RE2-compatible (no
    * backrefs) so the DuckDB oracle replays the identical patterns. */
  def blockLines(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", "")
    val ws = regexp_replace(noStyle, "[ \\t\\r\\n]+", " ")
    split(regexp_replace(ws, s"</($BlockTags)>", "\n"), "\n")
  }

  /** Stage 3-4 per-line stats: visible text (tags stripped, trimmed) and
    * anchor-text character mass measured on the RAW line. Anchors are
    * lowercase `<a …>` with at least one attribute (a bare `<a>` carries
    * no href and uppercase tags do not occur in markup this stage
    * targets — documented contract); since r14 the anchor BODY is the
    * non-greedy span to the first `</a>` with inner inline tags stripped
    * before measuring (review: `<a href=x><b>link</b></a>` counted zero
    * anchor chars, letting nested-markup link farms through the density
    * rule). */
  def lineStats(lines: Column): Column =
    transform(lines, l => struct(
      trim(regexp_replace(l, "<[^>]*>", "")).as("clean"),
      coalesce(aggregate(
        transform(regexp_extract_all(l, lit("(?s)<a [^>]*>(.*?)</a>"), lit(1)),
          a => length(regexp_replace(a, "<[^>]*>", "")).cast("long")),
        lit(0L), (acc, x) => acc + x), lit(0L)).as("a_chars")))

  private def isContent(s: Column, minChars: Int, densityNum: Int): Column =
    length(s.getField("clean")) >= minChars &&
      s.getField("a_chars") * densityNum < length(s.getField("clean"))

  /** Decode the five standard entities; `&amp;` strictly last so encoded
    * ampersands never double-decode. */
  def decodeEntities(text: Column): Column = {
    val pairs = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
    pairs.foldLeft(text) { case (c, (from, to)) => regexp_replace(c, java.util.regex.Pattern.quote(from), to) }
  }

  /** Full extraction: returns
    * `struct(extracted, kept_lines, dropped_lines, boiler_chars)` where
    * `dropped_lines`/`boiler_chars` count only non-empty visible blocks
    * (tag-only fragments like a bare `</div>` boundary produce empty
    * cleans and are structural noise, not boilerplate). */
  def extract(html: Column, minChars: Int = MinChars,
              densityNum: Int = DensityNum): Column = {
    val ls = lineStats(blockLines(html))
    val kept = filter(ls, s => isContent(s, minChars, densityNum))
    val dropped = filter(ls, s =>
      s.getField("clean") =!= "" && !isContent(s, minChars, densityNum))
    struct(
      decodeEntities(array_join(transform(kept, _.getField("clean")), "\n"))
        .as("extracted"),
      size(kept).cast("long").as("kept_lines"),
      size(dropped).cast("long").as("dropped_lines"),
      coalesce(aggregate(transform(dropped, s => length(s.getField("clean")).cast("long")),
        lit(0L), (acc, x) => acc + x), lit(0L)).as("boiler_chars"))
  }
}
