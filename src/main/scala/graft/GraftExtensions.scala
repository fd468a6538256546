package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans._

/** Session-extension entry point: registers the native kernel expressions
  * as SQL functions for every session of a cluster via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)` at build time) — the surface
  * that lets a pure-SQL user (spark-sql shell, Thrift server, notebooks)
  * run the engine's kernels without touching the Scala Column API.
  * Per-session registration without extensions:
  * `GraftExtensions.register(spark)` (the legacy
  * `SeqExpressions.register` / `StringDistanceExpressions.register`
  * entry points delegate here).
  *
  * Only kernels with literal-friendly signatures are exposed; model-bound
  * expressions (argmin over trained centroids, OOV vs a vocab list,
  * text_stats against stopword lists) stay Column-API-only because their
  * Seq parameters have no SQL literal form worth faking. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", "", name, usage, "", "", "", "", "", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit =
    functionTable.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}

object GraftExtensions {

  /** Runtime (per-session) registration of the same function table, for
    * sessions built without `spark.sql.extensions` — e.g. tests or an
    * already-running shell. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functionTable.foreach { case (name, _, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  private def intArg(exprs: Seq[Expression], i: Int): Int = {
    // foldability gate first: a non-literal arg (e.g. a column) would hit an
    // unbound-attribute internal error inside eval(); surface the intended
    // "must be an integer literal" contract instead.
    if (!exprs(i).foldable)
      throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got ${exprs(i).sql}")
    exprs(i).eval() match {
      case n: Int => n
      case n: java.lang.Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"argument ${i + 1} must be an integer literal, got $other")
    }
  }

  /** (name, usage, builder) rows shared by the extension injection and the
    * runtime registry path. */
  private val functionTable: Seq[(String, String, Seq[Expression] => Expression)] = {
    val rows = Seq.newBuilder[(String, String, Seq[Expression] => Expression)]
    def reg(name: String, usage: String)(f: Seq[Expression] => Expression): Unit =
      rows += ((name, usage, f))

    // sequence family
    reg("kmer_frequencies",
      "kmer_frequencies(seq[, k]) - overlapping k-mer frequency map (uppercase, N-windows dropped)") {
      exprs => KmerFrequenciesExpr(exprs.head,
        if (exprs.length > 1) intArg(exprs, 1) else 3) }
    reg("codon_usage",
      "codon_usage(seq) - non-overlapping stride-3 codon frequency map") {
      exprs => CodonUsageExpr(exprs.head) }
    reg("minimizer_counts",
      "minimizer_counts(seq, k, w) - (k,w)-minimizer sketch counts") {
      exprs => MinimizerCountsExpr(exprs.head, intArg(exprs, 1), intArg(exprs, 2)) }
    reg("dna_translate",
      "dna_translate(seq) - standard-code protein translation of frame 0") {
      exprs => DnaTranslateExpr(exprs.head) }
    reg("phred_stats",
      "phred_stats(qual) - (n, sum_q, min_q, max_q, n_q20, n_q30) of a Phred+33 string") {
      exprs => PhredStatsExpr(exprs.head) }

    // url family (r13): the same codegen'd built-in composition as
    // graft.operators.Sampling.{urlHost, registrableDomain}, built as a
    // Catalyst tree directly (a Column can't cross into the function
    // registry — its bridge expression stays Unevaluable). Divergence
    // from the Column-level source of truth is pinned by the
    // SQL ≡ Column API check in ExtensionsSqlSpec.
    {
      import org.apache.spark.sql.catalyst.expressions.{CaseWhen, In, Literal, SubstringIndex}
      def host(u: Expression): Expression =
        SubstringIndex(SubstringIndex(u, Literal("://"), Literal(-1)),
          Literal("/"), Literal(1))
      reg("url_host",
        "url_host(url) - host of a scheme://host/path URL (pure string ops)") {
        exprs => host(exprs.head) }
      reg("registrable_domain",
        "registrable_domain(host) - PSL-backed eTLD+1 (normal + wildcard + exception rules)") {
        exprs =>
          val h = exprs.head
          def lastK(k: Int): Expression =
            SubstringIndex(h, Literal("."), Literal(-k))
          // one CaseWhen generated from the SAME precedence-ordered rule
          // chain as the Column form — the two surfaces cannot drift
          CaseWhen(
            graft.operators.PublicSuffixes.RuleChain.map {
              case (m, set, keep) =>
                (In(lastK(m), set.map(Literal(_))), lastK(keep))
            },
            Some(lastK(2))) }
    }

    // text family
    reg("split_tokens",
      "split_tokens(text) - single-space tokens, empties dropped") {
      exprs => SplitTokensExpr(exprs.head) }
    reg("distinct_shingles",
      "distinct_shingles(text, n) - distinct word n-shingles") {
      exprs => DistinctShinglesExpr(exprs.head, intArg(exprs, 1)) }
    reg("rolling_fingerprint",
      "rolling_fingerprint(text) - order-sensitive 64-bit token-chain fingerprint") {
      exprs => RollingFingerprintExpr(exprs.head) }
    reg("window_hashes",
      "window_hashes(text, w) - md5 of every overlapping w-token window") {
      exprs => WindowHashesExpr(exprs.head, intArg(exprs, 1)) }
    reg("chunk_texts",
      "chunk_texts(text, c, step) - c-token chunks at the given stride") {
      exprs => ChunkTextsExpr(exprs.head, intArg(exprs, 1), intArg(exprs, 2)) }
    reg("feature_hist",
      "feature_hist(text, n) - hashed-token count histogram of width n") {
      exprs => FeatureHistExpr(exprs.head, intArg(exprs, 1)) }
    reg("pii_redact",
      "pii_redact(text) - emails/phones/SSNs/IPs replaced by type tags") {
      exprs => PiiRedactExpr(exprs.head) }
    reg("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC canonical composition: (normalized, changed)") {
      exprs => NfcNormalizeExpr(exprs.head) }
    reg("fix_encoding",
      "fix_encoding(text) - mojibake repair (UTF-8 decoded as sloppy Windows-1252, re-encoded): (fixed, n_runs)") {
      exprs => FixEncodingExpr(exprs.head) }
    reg("url_canon",
      "url_canon(url) - canonical URL: lowercase scheme/host, default ports and fragments stripped, tracking params dropped, params byte-sorted, trailing slash normalized") {
      exprs => UrlCanonExpr(exprs.head) }
    reg("html_extract",
      "html_extract(html, minChars, densityNum) - jusText-shape boilerplate removal: (extracted, kept_lines, dropped_lines, boiler_chars)") {
      exprs => HtmlExtractExpr(exprs.head, intArg(exprs, 1), intArg(exprs, 2)) }
    reg("html_outlinks",
      "html_outlinks(html) - href=\"...\" capture list (exact byte-scan contract)") {
      exprs => HtmlOutlinksExpr(exprs.head) }
    reg("html_tables",
      "html_tables(html) - every <table> cell as (tbl, row, col, is_header, cell) under the non-greedy regex contract") {
      exprs => HtmlTablesExpr(exprs.head) }
    reg("html_anchors",
      "html_anchors(html) - (href, text) anchor pairs under the non-greedy regex contract, text cell-cleaned") {
      exprs => HtmlAnchorsExpr(exprs.head) }
    reg("md5_prefix",
      "md5_prefix(s, n) - first n hex chars of md5(s)") {
      exprs => Md5PrefixExpr(exprs.head, intArg(exprs, 1)) }
    reg("damerau_levenshtein",
      "damerau_levenshtein(a, b) - unrestricted Damerau-Levenshtein edit distance (byte-wise)") {
      exprs => DamerauLevenshteinExpr(exprs.head, exprs(1)) }

    // vector family
    reg("quantize_vec",
      "quantize_vec(vec) - floor(v * 2^20) fixed-point BIGINT array") {
      exprs => QuantizeVecExpr(exprs.head) }
    reg("long_dot",
      "long_dot(a, b) - exact integer dot product of two BIGINT arrays") {
      exprs => LongDotExpr(exprs.head, exprs(1)) }

    rows.result()
  }
}
