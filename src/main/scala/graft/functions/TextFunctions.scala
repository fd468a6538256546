package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data-pipeline surface
  * ([ext] rows of SURVEY §2.2): tokenization, language-ID heuristic, quality
  * scoring, token counting, document fingerprinting. All pure `Column`
  * combinators over built-ins (codegen'd, shuffle-free per row) so they
  * scale linearly with input bytes.
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped (split on single space — the
    * documents corpus is single-space separated; `tokensRe` handles the
    * general case). Since r9 this is the native
    * [[graft.plans.SplitTokens]] kernel — a codegen'd leaf, so consumers
    * that nest it no longer fall out of whole-stage codegen. */
  def tokens(text: Column): Column =
    graft.plans.TextStatsExpressions.splitTokens(text)

  /** COLUMNAR REFERENCE IMPLEMENTATION of [[tokens]] (ArrayFilter —
    * CodegenFallback); TokensKernelSpec pins the kernel against it. */
  def tokensColumnar(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Abbreviations protected by [[sentences]] — the bounded guard list of
    * rule-based splitters (the punkt-family tradeoff: `etc.` can also end
    * a sentence; a guard list is a precision/recall choice, documented,
    * and swappable per corpus). */
  val SentenceAbbrevs: Seq[String] = Seq(
    "Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "St.", "vs.", "e.g.", "i.e.", "No.")

  /** Rule-based sentence segmentation — the alignment/bitext prep step
    * (sentence-level mining needs sentences, not documents): a boundary
    * is `[.!?]` + space; guarded abbreviations ([[SentenceAbbrevs]]) are
    * masked before boundary marking and restored after the split, so
    * `Dr. Smith agreed.` stays one sentence. Pure codegen'd built-ins
    * (regexp_replace is natively code-generated), row-local, no explode
    * until the caller chooses one; engine-portable (the DuckDB oracle
    * replays the identical mask → mark → split → unmask chain).
    *
    * Contract: input must not contain the control sentinels U+0001/U+0002
    * (crawl text post-extraction never does; the html_extract kernel's
    * whitespace normalization upstream removes control runs too). A text
    * with no terminator is one sentence; a trailing fragment after the
    * last terminator is kept as its own sentence. */
  def sentences(text: Column,
                abbrevs: Seq[String] = SentenceAbbrevs): Column = {
    // mask: "Dr. " -> "Dr\u0002 " so the boundary regex cannot fire on it
    val masked = abbrevs.foldLeft(text) { (c, a) =>
      regexp_replace(c, java.util.regex.Pattern.quote(a) + " ",
        java.util.regex.Matcher.quoteReplacement(a.dropRight(1)) + "\u0002 ")
    }
    val marked = regexp_replace(masked, "([.!?]) ", "$1\u0001")
    transform(split(marked, "\u0001"),
      s => regexp_replace(s, "\u0002", "."))
  }

  /** BPE-ish token segmentation: letter runs, digit runs, or single
    * non-alphanumeric marks — the classic pre-tokenizer regex. */
  val TokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def approxTokenCount(text: Column): Column =
    regexp_count(text, lit(TokenRegex)).cast("long")

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic and SQL-expressible for the oracle. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "我", "不"))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("long")

  /** Quality score in [0,1]: mix of length saturation, alpha ratio and
    * stopword ratio. Fixed expression tree → identical IEEE arithmetic in
    * any engine that mirrors it. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val lenSat = least(length(text).cast("double") / 500d, lit(1d))
    val alphaRatio =
      (length(text) - length(regexp_replace(text, "[a-zA-Z]", ""))).cast("double") /
        length(text)
    val stopRatio = stopwordHits(toks, StopwordLists.head._2).cast("double") / nTok
    lit(0.4) * lenSat + lit(0.4) * alphaRatio + lit(0.2) * least(stopRatio * 5d, lit(1d))
  }

  /** Deterministic 64-bit document fingerprint: xxhash64 of the
    * space-normalized text (the "exact-dup key at scale" — cheaper than md5,
    * collision-safe enough for blocking; md5 remains the byte-exact key). */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(trim(text), "\\s+", " "))

  /** Gopher-style quality gates over a token array — named boolean columns
    * in fixed order, each an EXACT integer/boolean expression (no floats, so
    * any engine agrees bit-for-bit; ratio thresholds are cross-multiplied):
    * token count in [minTok, maxTok]; mean token length in
    * [meanLen10Lo, meanLen10Hi]/10 chars (`charSum·10` vs `bound·n`); ≥ half
    * the tokens purely alphabetic; ≥ 2 stopword occurrences (any language's
    * list); type-token ratio ≥ 1/3 (repetition guard). All row-local —
    * a 100 TB filter pass is one scan, no shuffle. */
  def qualityGates(toks: Column, minTok: Long = 10L, maxTok: Long = 1000L,
                   meanLen10Lo: Long = 20L, meanLen10Hi: Long = 120L): Seq[(String, Column)] = {
    val n = size(toks).cast("long")
    val charSum = aggregate(toks, lit(0L), (a, t) => a + length(t).cast("long"))
    val alphaToks = size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("long")
    val stopAll = StopwordLists.flatMap(_._2).distinct
    val stopHits = size(filter(toks, t => t.isInCollection(stopAll))).cast("long")
    val distinctN = size(array_distinct(toks)).cast("long")
    Seq(
      "g_len" -> (n >= minTok && n <= maxTok),
      "g_wordlen" -> (charSum * 10L >= n * meanLen10Lo && charSum * 10L <= n * meanLen10Hi),
      "g_alpha" -> (alphaToks * 2L >= n),
      "g_stop" -> (stopHits >= 2L),
      "g_ttr" -> (distinctN * 3L >= n))
  }

  /** Rolling polynomial hash over the token stream (order-sensitive — two
    * docs with the same bag of words but different order differ). Computed
    * as a sequential fold via the `aggregate` HOF; mod 1e9+7 keeps every
    * intermediate in exact Long range (max (p-1)*31 + tokHash < 2^63).
    * The per-token hash uses only cross-engine primitives (length + first/
    * last code point) so DuckDB can mirror it for the oracle. */
  def rollingFingerprint(text: Column): Column = {
    val p = lit(1000000007L)
    val tokHashes = transform(tokens(text), t =>
      (length(t).cast("long") * 1009L + ascii(t) * 31L + ascii(reverse(t))) % p)
    aggregate(tokHashes, lit(0L), (acc, x) => (acc * 31L + x) % p)
  }
}
