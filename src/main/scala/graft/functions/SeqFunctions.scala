package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The six per-sequence expressions of the reference
  * (`/root/reference/src/polars_fastx/fastx_parsers.py:16-67`), re-expressed
  * as Spark `Column` combinators (E1–E4: pure built-ins, fully inside
  * whole-stage codegen — no UDF) and Scala UDFs (E5/E6 map outputs).
  *
  * Pinned reference semantics (SURVEY §2.1):
  *  - E2/E3 count only the literal uppercase characters (`fastx_parsers.py:19,24`)
  *    while E5/E6 uppercase before counting (`fastx_parsers.py:35,59`) —
  *    asymmetry preserved.
  *  - gc_content("") is 0/0: Polars yields NaN; Spark 4 (ANSI mode default)
  *    performs IEEE double division → NaN as well. Divergence note in
  *    SURVEY §2.1 resolved in favor of NaN — exact Polars parity.
  *  - E5 windows are non-overlapping stride-3 complete codons
  *    (`range(0, len-2, 3)`, `fastx_parsers.py:34`); E6 windows are all
  *    overlapping start positions (`range(len-k+1)`, `fastx_parsers.py:58`).
  *  - Codons/k-mers containing "N" (post-uppercase) are dropped from both the
  *    numerator and the denominator (`fastx_parsers.py:36,61`).
  */
object SeqFunctions {

  /** E1 — sequence length (`fastx_parsers.py:26-28`). BIGINT for oracle
    * schema stability (DuckDB length() is BIGINT). */
  def seqLength(seq: Column): Column = length(seq).cast("long")

  /** Count of literal ASCII characters. Production path is the one-pass
    * byte-count kernel (exact for ASCII sets by UTF-8 structure — see
    * [[graft.plans.AsciiKernels]]); the translate-diff idiom below stays
    * as the AsciiKernelSpec-pinned reference (Spark's `translate` walks a
    * boxed char map — 8 s/call over the 100× corpus). */
  private def charCount(seq: Column, chars: String): Column =
    graft.plans.AsciiExpressions.asciiCharCount(seq, chars)

  /** Translate-diff form of [[charCount]], kept as the kernel's pinned
    * reference. */
  private[graft] def charCountColumnar(seq: Column, chars: String): Column =
    (length(seq) - length(translate(seq, chars, ""))).cast("long")

  /** E2 — GC fraction, case-sensitive literal G/C counts over full length
    * (`fastx_parsers.py:16-20`). Empty string → NaN, matching Polars' 0/0;
    * the explicit guard is needed because Spark 4's ANSI mode raises
    * DIVIDE_BY_ZERO instead of following IEEE semantics. */
  def gcContent(seq: Column): Column =
    when(length(seq) === 0, lit(Double.NaN))
      .otherwise(charCount(seq, "GC").cast("double") / length(seq))

  /** E3 — literal uppercase-N count (`fastx_parsers.py:22-24`). */
  def nCount(seq: Column): Column = charCount(seq, "N")

  /** E4 — MD5 hex digest truncated to `len` chars (`fastx_parsers.py:43-50`);
    * bit-identical to `hashlib.md5(s.encode()).hexdigest()[:len]`. Production
    * path is the [[graft.plans.Md5Prefix]] kernel (thread-local digest, no
    * per-row `MessageDigest.getInstance` / String round-trips); the built-in
    * chain below stays as the HashKernelSpec-pinned reference. */
  def seqHash(seq: Column, len: Int = 32): Column =
    graft.plans.HashExpressions.md5Prefix(seq, len)

  /** The built-in-chain form of E4, kept as the kernel's pinned reference. */
  private[graft] def seqHashColumnar(seq: Column, len: Int = 32): Column =
    substring(md5(seq.cast("binary")), 1, len)

  // ---------------------------------------------------------------------
  // E5/E6 — frequency maps. Two implementations each:
  //  * a Scala UDF returning Map[String, Double] (the reference's exact
  //    output shape; in-JVM, no serialization boundary — already a
  //    structural win over the reference's GIL-bound Python map_elements);
  //  * a pure-built-in exploded form (see SeqQueries) used for the
  //    DuckDB-verifiable queries and for scale (stays in codegen).
  // ---------------------------------------------------------------------

  private[graft] def codonUsageImpl(s: String): Map[String, Double] = {
    if (s == null) return null
    // range(0, len-2, 3): complete stride-3 codons only (trailing 1-2 chars
    // dropped), uppercased, N-containing codons skipped.
    val kept = (0 until (s.length - 2) by 3).iterator
      .map(i => s.substring(i, i + 3).toUpperCase)
      .filterNot(_.contains("N"))
      .toSeq
    val total = kept.size.toDouble
    if (total == 0) Map.empty[String, Double]
    else kept.groupBy(identity).map { case (k, v) => k -> v.size / total }
  }

  private[graft] def kmerFrequenciesImpl(s: String, k: Int): Map[String, Double] = {
    if (s == null) return null
    if (k <= 0 || s.length < k) return Map.empty[String, Double]
    // range(len-k+1): every overlapping window, uppercased, N-skip.
    val kept = (0 to (s.length - k)).iterator
      .map(i => s.substring(i, i + k).toUpperCase)
      .filterNot(_.contains("N"))
      .toSeq
    val total = kept.size.toDouble
    if (total == 0) Map.empty[String, Double]
    else kept.groupBy(identity).map { case (kk, v) => kk -> v.size / total }
  }

  private val codonUsageUdf = udf(codonUsageImpl _)

  /** E5 — non-overlapping codon frequency map (`fastx_parsers.py:30-41`).
    * MapType, not Struct: keys vary per row (SURVEY §0.1.6). */
  def codonUsage(seq: Column): Column = codonUsageUdf(seq)

  private val kmerUdf = udf(kmerFrequenciesImpl _)

  /** E6 — overlapping k-mer frequency map (`fastx_parsers.py:52-67`). */
  def kmerFrequencies(seq: Column, k: Int = 3): Column = kmerUdf(seq, lit(k))

  // ---------------------------------------------------------------------
  // Exploded pure-built-in forms: one row per (window), no UDF, codegen'd.
  // Used by q_kmer_explode / q_codon_explode and by anything at scale.
  // ---------------------------------------------------------------------

  /** All overlapping k-mers of `seq`, uppercased. N-windows are NOT filtered
    * here (filter downstream to keep numerator/denominator control at the
    * call site). Empty array when len < k — the guard matters because Spark's
    * `sequence(0, stop)` generates a DESCENDING range when stop < 0. */
  def kmerArray(seq: Column, k: Int): Column = {
    val s = upper(seq)
    when(length(s) >= k,
      transform(sequence(lit(0), length(s) - k, lit(1)), i => s.substr(i + 1, lit(k))))
      .otherwise(array().cast("array<string>"))
  }

  /** Non-overlapping complete stride-3 codons of `seq`, uppercased
    * (reference window rule `range(0, len-2, 3)` ⟺ starts 0,3,… ≤ len-3). */
  def codonArray(seq: Column): Column = {
    val s = upper(seq)
    when(length(s) >= 3,
      transform(sequence(lit(0), length(s) - 3, lit(3)), i => s.substr(i + 1, lit(3))))
      .otherwise(array().cast("array<string>"))
  }
}
