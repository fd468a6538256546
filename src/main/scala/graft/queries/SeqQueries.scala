package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.SeqFunctions._

/** Sequence-expression queries (SURVEY §2.3 q_seq_stats / q_kmer_explode /
  * q_codon_explode / q_kmer_map) over `documents.text` as the sequence
  * surrogate. `seq` = upper(text with spaces removed) gives a biology-ish
  * alphabet-dense string; raw `text` exercises the case-sensitive literal
  * counts exactly as the reference defines them.
  *
  * Scale notes: every query here is a narrow per-row pipeline followed by a
  * keyed aggregation — no joins, map-side combine applies, and the explode
  * fan-out (len·~1 windows per doc) partitions on doc_id naturally. At 100 TB
  * the only knob is input split size; nothing accumulates on the driver.
  */
object SeqQueries {

  // literal StringReplace, not regexp_replace: a single-space pattern is
  // byte-identical either way, and the regex engine scanned every char
  private def surrogate(c: org.apache.spark.sql.Column) =
    upper(replace(c, lit(" "), lit("")))

  def qSeqStats(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    // sort the narrow (doc_id, text) side FIRST: range partitioning
    // samples its child to pick bounds, so a projection below the sort
    // is evaluated twice — the stat columns stay above the exchange
    docs
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) >= 50)
      .orderBy("doc_id")
      .select(
        col("doc_id"),
        seqLength(col("text")).as("seq_len"),
        gcContent(surrogate(col("text"))).as("gc_frac"),
        nCount(col("text")).as("n_cnt"),
        seqHash(col("text"), 8).as("seq_hash"))
  }

  val qSeqStatsSql: String =
    """SELECT doc_id,
      |       length(text) AS seq_len,
      |       CAST(length(u) - length(replace(replace(u,'G',''),'C','')) AS DOUBLE)
      |         / length(u) AS gc_frac,
      |       length(text) - length(replace(text,'N','')) AS n_cnt,
      |       substr(md5(text), 1, 8) AS seq_hash
      |FROM (SELECT *, upper(replace(text,' ','')) AS u FROM documents)
      |WHERE length(text) >= 50
      |ORDER BY doc_id""".stripMargin

  /** Shared count→freq tail for kmer/codon queries. freq is an exact
    * BIGINT/BIGINT IEEE division — deterministic across engines.
    *
    * Shape: the native `seq_window_counts` expression builds each doc's
    * {window → count} map in one byte-level codegen pass; exploding that
    * map and folding its values for the denominator keeps the entire
    * pipeline shuffle-free until the output sort (2.3× over the previous
    * explode+substr+repartition+window plan; PlanQualitySpec pins the
    * 1-exchange shape). `step` = 1 for overlapping k-mers, k for
    * non-overlapping codons.
    *
    * Measured dead ends (don't repeat): a CodegenFallback window Generator
    * was ~30% slower than explode+substr (breaks the WSCG span); the
    * repartition+window formulation costs two more exchanges. */
  /** r9: two fixes to the old shape. (1) The `aggregate(map_values(…))`
    * total fold was CodegenFallback — it evaluated its entire child
    * subtree interpreted, including the count-map scan once CollapseProject
    * inlined it; `window_counts_total` emits struct(counts, total) from
    * the one packed-key pass. (2) A global `orderBy` above the Generate
    * made range-partitioning sampling evaluate scan+kernel+explode TWICE;
    * instead the narrow (doc_id, text) input is range-partitioned first
    * (sampling pays only the scan), and the exploded rows get a
    * partition-local sort on the full (doc_id, gram) key — equal doc_ids
    * land in one range partition, so the order is total. */
  private def windowFreqs(docs: DataFrame, k: Int, step: Int): DataFrame =
    docs
      .repartitionByRange(col("doc_id"))
      .select(col("doc_id"),
        graft.plans.SeqExpressions
          .windowCountsTotal(surrogate(col("text")), k, step).as("ct"))
      .select(col("doc_id"),
        explode(col("ct.counts")).as(Seq("gram", "cnt")),
        col("ct.total").as("total"))
      .withColumn("freq", col("cnt").cast("double") / col("total"))
      .drop("total")
      .sortWithinPartitions("doc_id", "gram")

  def qKmerExplode(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    windowFreqs(docs, k = 3, step = 1)
  }

  val qKmerExplodeSql: String =
    """WITH seqs AS (SELECT doc_id, upper(replace(text,' ','')) AS s FROM documents),
      |grams AS (
      |  SELECT doc_id, substr(s, i, 3) AS gram
      |  FROM seqs, LATERAL unnest(generate_series(1, length(s)-2)) AS t(i)
      |),
      |cnts AS (
      |  SELECT doc_id, gram, count(*) AS cnt FROM grams
      |  WHERE gram NOT LIKE '%N%' GROUP BY doc_id, gram
      |)
      |SELECT doc_id, gram, cnt,
      |       CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY doc_id) AS freq
      |FROM cnts ORDER BY doc_id, gram""".stripMargin

  /** Minimizer sketch ([[graft.plans.MinimizerOps]]): the distinct (k=5,
    * w=4) minimizers per document with the number of windows each
    * minimizes — the k-mer sub-sampling primitive of genomics
    * mappers/assemblers (expected density ≈ 2/(w+1), so the sketch is
    * ~60% smaller than the full gram set at the same locality
    * guarantees). One codegen pass per doc (packed grams + monotonic
    * deque); the oracle replays it relationally: per-position grams, a
    * ROWS-frame window min with invalid (N) grams as NULLs, full windows
    * only, count per distinct minimizer.
    *
    * Scale shape: identical to the kmer family — doc-local kernel fused
    * into the scan, narrow range partition before the explode, partition-
    * local sort on the full key. */
  private def minimizersQuery(spark: SparkSession, sfDir: String,
                              k: Int, w: Int): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .repartitionByRange(col("doc_id"))
      .select(col("doc_id"),
        explode(graft.plans.SeqExpressions
          .minimizerCounts(surrogate(col("text")), k, w))
          .as(Seq("minimizer", "n_win")))
      .sortWithinPartitions("doc_id", "minimizer")

  def qMinimizers(spark: SparkSession, sfDir: String): DataFrame =
    minimizersQuery(spark, sfDir, k = 5, w = 4)

  /** The relational replay, parameterized on (k, w): per-position grams,
    * ROWS-frame window min with invalid (N) grams as NULLs, full windows
    * only, count per distinct minimizer. */
  private def minimizersSql(k: Int, w: Int): String =
    s"""WITH seqs AS (SELECT doc_id, upper(replace(text,' ','')) AS s FROM documents),
       |grams AS (
       |  SELECT doc_id, i,
       |         CASE WHEN substr(s, i, $k) NOT LIKE '%N%' THEN substr(s, i, $k) END AS g,
       |         length(s) - ${k - 1} AS p
       |  FROM seqs, LATERAL unnest(generate_series(1, length(s) - ${k - 1})) AS t(i)),
       |wins AS (
       |  SELECT doc_id, i, p,
       |         min(g) OVER (PARTITION BY doc_id ORDER BY i
       |                      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS m
       |  FROM grams)
       |SELECT doc_id, m AS minimizer, count(*) AS n_win
       |FROM wins
       |WHERE i <= p - ${w - 1} AND m IS NOT NULL
       |GROUP BY doc_id, m
       |ORDER BY doc_id, minimizer""".stripMargin

  val qMinimizersSql: String = minimizersSql(k = 5, w = 4)

  /** The WIDE-k minimizer path (k > 8 — minimap2's regime; here k=15,
    * w=10) under its own oracle gate: same query shape, but the kernel
    * takes the round-11 byte-compare-deque branch instead of the packed-
    * Long one (the packed path physically cannot represent k=15). The
    * parameterized oracle replays it with 15-char grams. */
  def qMinimizersWide(spark: SparkSession, sfDir: String): DataFrame =
    minimizersQuery(spark, sfDir, k = 15, w = 10)

  val qMinimizersWideSql: String = minimizersSql(k = 15, w = 10)

  def qCodonExplode(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    windowFreqs(docs, k = 3, step = 3)
  }

  val qCodonExplodeSql: String =
    """WITH seqs AS (SELECT doc_id, upper(replace(text,' ','')) AS s FROM documents),
      |grams AS (
      |  SELECT doc_id, substr(s, i, 3) AS gram
      |  FROM seqs, LATERAL unnest(generate_series(1, length(s)-2, 3)) AS t(i)
      |),
      |cnts AS (
      |  SELECT doc_id, gram, count(*) AS cnt FROM grams
      |  WHERE gram NOT LIKE '%N%' GROUP BY doc_id, gram
      |)
      |SELECT doc_id, gram, cnt,
      |       CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY doc_id) AS freq
      |FROM cnts ORDER BY doc_id, gram""".stripMargin

  /** E6 full-map shape (`kmer_frequencies`, `fastx_parsers.py:52-67`) under
    * the driver gate: the native codegen count-map is built per doc in one
    * pass, then serialized as a *sorted, integer-valued* entry string
    * (`GRAM=count,...`) plus the total — a byte-stable encoding both engines
    * produce identically (raw map columns are unorderable in the harness and
    * double freqs don't stringify portably; freq = cnt/total is recoverable
    * exactly). The map-typed API itself (`kmerFrequenciesNative`) stays
    * pinned against the UDF reference impl in SeqExpressionsSpec. Since
    * r9 the whole encode runs inside the native [[graft.plans.KmerEnc]]
    * kernel (SeqExpressionsSpec pins it against the columnar
    * sort+transform derivation it replaced). */
  def qKmerMap(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    // sort the narrow side first — see windowFreqs note (2)
    docs
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select(col("doc_id"),
        graft.plans.SeqExpressions.kmerEnc(surrogate(col("text")), 3, 1).as("e"))
      .select(
        col("doc_id"),
        col("e.n_kmers").as("n_kmers"),
        col("e.total").as("total"),
        col("e.kmer_enc").as("kmer_enc"))
  }

  val qKmerMapSql: String =
    """WITH seqs AS (SELECT doc_id, upper(replace(text,' ','')) AS s FROM documents),
      |grams AS (
      |  SELECT doc_id, substr(s, i, 3) AS gram
      |  FROM seqs, LATERAL unnest(generate_series(1, length(s)-2)) AS t(i)
      |),
      |cnts AS (
      |  SELECT doc_id, gram, count(*) AS cnt FROM grams
      |  WHERE gram NOT LIKE '%N%' GROUP BY doc_id, gram
      |),
      |enc AS (
      |  SELECT doc_id, count(*) AS n_kmers, CAST(sum(cnt) AS BIGINT) AS total,
      |         string_agg(gram || '=' || cnt, ',' ORDER BY gram) AS kmer_enc
      |  FROM cnts GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |       CAST(COALESCE(e.n_kmers, 0) AS BIGINT) AS n_kmers,
      |       CAST(COALESCE(e.total, 0) AS BIGINT) AS total,
      |       COALESCE(e.kmer_enc, '') AS kmer_enc
      |FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Corpus-level GC per language through the typed [[graft.functions
    * .GcAggregator]] UDAF (the Aggregator rung of the UDF ladder, here
    * under the oracle gate, not just unit tests). The aggregator's state
    * is two exact longs (gc count, total length) merged associatively —
    * map-side combinable — and `finish` is ONE double division of those
    * longs, which the oracle reproduces with the identical operands, so
    * the fraction is bit-exact with no quantization. */
  def qUdafGc(spark: SparkSession, sfDir: String): DataFrame = {
    val gcUdaf = udaf(graft.functions.GcAggregator)
    t(spark, sfDir, "documents")
      .select(col("lang"), surrogate(col("text")).as("s"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), gcUdaf(col("s")).as("gc_frac"))
      .orderBy("lang")
  }

  val qUdafGcSql: String =
    """WITH s AS (SELECT lang, upper(replace(text, ' ', '')) AS s FROM documents)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(length(s) - length(replace(replace(s,'G',''),'C',''))) AS DOUBLE)
      |         / sum(length(s)) AS gc_frac
      |FROM s GROUP BY lang ORDER BY lang""".stripMargin

  /** Reverse complement — the one strand-symmetry primitive every
    * sequence toolkit ships. `reverse(translate(seq, ACGT→TGCA))` over the
    * surrogate: both are built-in codegen'd string expressions (the
    * Spark-first answer — no custom expression needed when two built-ins
    * compose exactly). Non-ACGT bytes pass through untranslated, the same
    * convention both engines share by `translate` semantics. Row-local,
    * shuffle-free until the output sort; palindrome check (seq == its own
    * revcomp) exercises full-string equality on the computed column. */
  def qRevcomp(spark: SparkSession, sfDir: String): DataFrame = {
    val u = surrogate(col("text"))
    // byte-table kernel ≡ translate for same-length ASCII from/to
    val rc = reverse(graft.plans.AsciiExpressions.asciiTranslate(u, "ACGT", "TGCA"))
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // before the wide projection — see qSeqStats
      .select(col("doc_id"),
        substring(rc, 1, 24).as("rc_prefix"),
        seqHash(rc, 12).as("rc_hash"),
        (u === rc).as("is_palindrome"))
  }

  val qRevcompSql: String =
    """WITH s AS (SELECT doc_id, upper(replace(text, ' ', '')) AS u FROM documents)
      |SELECT doc_id,
      |       substr(reverse(translate(u, 'ACGT', 'TGCA')), 1, 24) AS rc_prefix,
      |       substr(md5(reverse(translate(u, 'ACGT', 'TGCA'))), 1, 12) AS rc_hash,
      |       u = reverse(translate(u, 'ACGT', 'TGCA')) AS is_palindrome
      |FROM s ORDER BY doc_id""".stripMargin

  /** DNA→protein translation (standard genetic code) — the step a FASTX
    * user runs right after `fasta_stats`: frame-0 complete codons map
    * through the 64-entry table, non-ACGT codons → 'X', stops '*'
    * counted. The whole translate runs in the native
    * [[graft.plans.DnaTranslateExpr]] codegen kernel (one code-point pass,
    * no per-codon substring); stop/unknown counts reuse the
    * [[graft.plans.AsciiCharCountExpr]] byte counter on the (short)
    * protein. The oracle replays the same table as a 64-row VALUES join —
    * GENERATED from the kernel's own [[graft.plans.BioKernels.CodonTable]]
    * constant, so the two can never drift.
    *
    * Scale: row-local map work end-to-end (protein is 1/3 the corpus
    * bytes); the only exchange is the output sort's. */
  def qTranslate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.plans.{AsciiExpressions, BioExpressions}
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow side first — see qSeqStats
      .select(col("doc_id"),
        BioExpressions.dnaTranslate(surrogate(col("text"))).as("prot"))
      .select(
        col("doc_id"),
        length(col("prot")).cast("long").as("n_aa"),
        AsciiExpressions.asciiCharCount(col("prot"), "*").as("n_stop"),
        AsciiExpressions.asciiCharCount(col("prot"), "X").as("n_unknown"),
        substring(col("prot"), 1, 24).as("prot_prefix"),
        seqHash(col("prot"), 16).as("prot_md5"))
  }

  /** The 64-row codon VALUES table, generated from the kernel constant. */
  private lazy val codonValuesSql: String = {
    val bases = "ACGT"
    (0 until 64).map { i =>
      val codon = s"${bases(i >> 4)}${bases((i >> 2) & 3)}${bases(i & 3)}"
      s"('$codon','${graft.plans.BioKernels.CodonTable(i)}')"
    }.mkString(",")
  }

  lazy val qTranslateSql: String =
    s"""WITH s AS (SELECT doc_id, upper(replace(text,' ','')) AS u FROM documents),
       |codons AS (
       |  SELECT doc_id, i, substr(u, CAST((i-1)*3+1 AS INTEGER), 3) AS codon
       |  FROM s, LATERAL unnest(generate_series(1, length(u)//3)) AS t(i)),
       |ct(codon, aa) AS (VALUES $codonValuesSql),
       |aas AS (
       |  SELECT c.doc_id, c.i,
       |         COALESCE(ct.aa, 'X') AS aa
       |  FROM codons c LEFT JOIN ct ON c.codon = ct.codon),
       |prot AS (
       |  SELECT doc_id, string_agg(aa, '' ORDER BY i) AS protein
       |  FROM aas GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(length(COALESCE(p.protein,'')) AS BIGINT) AS n_aa,
       |       CAST(length(COALESCE(p.protein,''))
       |         - length(replace(COALESCE(p.protein,''), '*', '')) AS BIGINT) AS n_stop,
       |       CAST(length(COALESCE(p.protein,''))
       |         - length(replace(COALESCE(p.protein,''), 'X', '')) AS BIGINT) AS n_unknown,
       |       substr(COALESCE(p.protein,''), 1, 24) AS prot_prefix,
       |       substr(md5(COALESCE(p.protein,'')), 1, 16) AS prot_md5
       |FROM documents d LEFT JOIN prot p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** FASTQ phred-quality analytics: per-record base count, mean quality,
    * min/max, and fraction ≥ Q30 — the standard read-quality gate. The
    * quality string is the same deterministic Sanger-offset pattern the
    * FASTQ fixture writes (its byte-exact round-trip through the
    * splittable reader is already under the oracle via q_fastq_roundtrip's
    * qual_md5); here the [[graft.plans.PhredStatsExpr]] kernel decodes it
    * in one pass to EXACT integers, and mean/frac are single divisions of
    * those integers — the identical operands the oracle divides, so the
    * doubles are bit-equal. Row-local until the output sort. */
  def qPhredStats(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.plans.{AsciiExpressions, BioExpressions}
    t(spark, sfDir, "documents")
      .select(col("doc_id"),
        AsciiExpressions.asciiStrip(col("text"), " \t\r\n").as("seq"))
      .filter(length(col("seq")) > 0)
      .orderBy("doc_id") // narrow side first — see qSeqStats
      .select(col("doc_id"),
        BioExpressions.phredStats(
          expr("substring(repeat('@+!~IJKLMNOP', cast(ceil(length(seq)/12.0) as int)), 1, length(seq))"))
          .as("ps"))
      .select(
        col("doc_id"),
        col("ps.n_bases").as("n_bases"),
        (col("ps.sum_q").cast("double") / col("ps.n_bases")).as("mean_q"),
        col("ps.min_q").as("min_q"),
        col("ps.max_q").as("max_q"),
        (col("ps.n_ge30").cast("double") / col("ps.n_bases")).as("frac_q30"))
  }

  val qPhredStatsSql: String =
    """WITH s AS (SELECT doc_id, regexp_replace(text, '[ \t\r\n]', '', 'g') AS seq FROM documents),
      |q AS (SELECT doc_id,
      |        substr(repeat('@+!~IJKLMNOP', CAST(ceil(length(seq)/12.0) AS INTEGER)),
      |               1, length(seq)) AS qual
      |      FROM s WHERE length(seq) > 0),
      |b AS (SELECT doc_id, ord(c) - 33 AS ph
      |      FROM q, LATERAL unnest(string_split(qual, '')) AS t(c))
      |SELECT doc_id,
      |       count(*) AS n_bases,
      |       CAST(sum(ph) AS DOUBLE) / count(*) AS mean_q,
      |       CAST(min(ph) AS INTEGER) AS min_q,
      |       CAST(max(ph) AS INTEGER) AS max_q,
      |       CAST(sum(CASE WHEN ph >= 30 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS frac_q30
      |FROM b GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Longest open reading frame per document across the 3 forward frames
    * — the gene-finding primitive (exact ATG → in-frame TAA/TAG/TGA; see
    * [[graft.plans.OrfScan]] for the unknown-codon and tie-break
    * conventions). The kernel keeps all three frame states in ONE
    * code-point pass — O(n) row-local, allocation-free — where the
    * relational form (and the oracle) pays a 3×-explode, a running-stop
    * window, two group-mins and a join. Only the output sort exchanges. */
  def qOrfScan(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow side first — see qSeqStats
      .select(col("doc_id"),
        graft.plans.BioExpressions.orfScan(surrogate(col("text"))).as("o"))
      .select(
        col("doc_id"),
        col("o.orf_len").as("orf_len"),
        col("o.frame").as("frame"),
        col("o.start_pos").as("start_pos"))
  }

  val qOrfScanSql: String =
    """WITH s AS (SELECT doc_id, upper(replace(text,' ','')) AS u FROM documents),
      |cod AS (
      |  SELECT doc_id, f, i, substr(u, CAST(f + (i-1)*3 + 1 AS INTEGER), 3) AS codon
      |  FROM s CROSS JOIN (VALUES (0),(1),(2)) t(f),
      |       LATERAL unnest(generate_series(1, (length(u)-f)//3)) g(i)),
      |g AS (
      |  SELECT doc_id, f, i, codon,
      |         sum(CASE WHEN codon IN ('TAA','TAG','TGA') THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY doc_id, f ORDER BY i)
      |         - CASE WHEN codon IN ('TAA','TAG','TGA') THEN 1 ELSE 0 END AS grp
      |  FROM cod),
      |starts AS (
      |  SELECT doc_id, f, grp, min(i) AS atg_i FROM g
      |  WHERE codon = 'ATG' GROUP BY doc_id, f, grp),
      |stops AS (
      |  SELECT doc_id, f, grp, min(i) AS stop_i FROM g
      |  WHERE codon IN ('TAA','TAG','TGA') GROUP BY doc_id, f, grp),
      |orfs AS (
      |  SELECT st.doc_id, st.f, sp.stop_i - st.atg_i AS len_c, st.atg_i
      |  FROM starts st JOIN stops sp
      |    ON st.doc_id = sp.doc_id AND st.f = sp.f AND st.grp = sp.grp),
      |best AS (
      |  SELECT doc_id, f, len_c, atg_i,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY len_c DESC, f, atg_i) AS rn
      |  FROM orfs)
      |SELECT d.doc_id,
      |       CAST(COALESCE(b.len_c, 0) AS BIGINT) AS orf_len,
      |       CAST(b.f AS INTEGER) AS frame,
      |       CAST(b.f + (b.atg_i - 1) * 3 + 1 AS BIGINT) AS start_pos
      |FROM documents d
      |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Longest homopolymer run per sequence — the sequencing-QC primitive
    * (homopolymer tracts drive indel error in most chemistries). One
    * code-point pass in the native [[graft.plans.HomopolymerScan]] kernel
    * where the oracle pays a per-char explode + gaps-and-islands grouping
    * (i − row_number() island keys) + rank. Ties → earliest run, the
    * (len DESC, start ASC) pick both forms share. Row-local; only the
    * output sort exchanges. */
  def qHomopolymer(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow side first — see qSeqStats
      .select(col("doc_id"),
        graft.plans.BioExpressions.homopolymer(surrogate(col("text"))).as("h"))
      .select(
        col("doc_id"),
        col("h.max_run").as("max_run"),
        col("h.run_char").as("run_char"),
        col("h.run_start").as("run_start"))
  }

  val qHomopolymerSql: String =
    """WITH s AS (SELECT doc_id, upper(replace(text,' ','')) AS u FROM documents),
      |chars AS (
      |  SELECT doc_id, i, substr(u, CAST(i AS INTEGER), 1) AS c
      |  FROM s, LATERAL unnest(generate_series(1, length(u))) t(i)),
      |isl AS (
      |  SELECT doc_id, c, min(i) AS start_i, count(*) AS len
      |  FROM (SELECT doc_id, i, c,
      |          i - row_number() OVER (PARTITION BY doc_id, c ORDER BY i) AS grp
      |        FROM chars)
      |  GROUP BY doc_id, c, grp),
      |best AS (
      |  SELECT doc_id, len, c, start_i,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY len DESC, start_i ASC) AS rn
      |  FROM isl)
      |SELECT d.doc_id,
      |       CAST(COALESCE(b.len, 0) AS BIGINT) AS max_run,
      |       b.c AS run_char,
      |       CAST(b.start_i AS BIGINT) AS run_start
      |FROM documents d
      |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** N50/L50 per language — THE assembly-stats summary every FASTA
    * toolkit reports: N50 = the length of the sequence at which the
    * descending-length cumulative sum first reaches half the total
    * residue count; L50 = how many sequences that takes. All integers
    * (2·cum ≥ total avoids any halving), ROWS frame with the unique
    * doc_id tie-break ⇒ fully deterministic in both engines. One window
    * exchange + a |langs|-row aggregation — the 100 TB shape is a sort
    * within each group key, nothing global. */
  def qN50(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = t(spark, sfDir, "documents")
      .select(col("lang"), col("doc_id"),
        length(replace(col("text"), lit(" "), lit(""))).cast("long").as("len"))
    val ord = Window.partitionBy("lang").orderBy(col("len").desc, col("doc_id"))
    val r = s
      .withColumn("cum", sum("len").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("total", sum("len").over(Window.partitionBy("lang")))
    val firstHalf = r.filter(lit(2) * col("cum") >= col("total"))
      .groupBy("lang")
      .agg(min(struct(col("rn"), col("len"))).as("m"))
      .select(col("lang"), col("m.rn").as("l50"), col("m.len").as("n50"))
    s.groupBy("lang")
      .agg(count(lit(1)).as("n_seqs"), sum("len").as("total_len"))
      .join(firstHalf, Seq("lang"))
      .select(col("lang"), col("n_seqs"), col("total_len"), col("n50"), col("l50"))
      .orderBy("lang")
  }

  val qN50Sql: String =
    """WITH s AS (SELECT lang, doc_id, length(replace(text,' ','')) AS len FROM documents),
      |r AS (
      |  SELECT lang, len,
      |         sum(len) OVER (PARTITION BY lang ORDER BY len DESC, doc_id
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |         row_number() OVER (PARTITION BY lang ORDER BY len DESC, doc_id) AS rn,
      |         sum(len) OVER (PARTITION BY lang) AS total
      |  FROM s),
      |q AS (SELECT lang, min(rn) AS l50 FROM r WHERE 2*cum >= total GROUP BY lang),
      |stats AS (
      |  SELECT lang, count(*) AS n_seqs, CAST(sum(len) AS BIGINT) AS total_len
      |  FROM s GROUP BY lang)
      |SELECT st.lang, st.n_seqs, st.total_len,
      |       CAST(r.len AS BIGINT) AS n50, CAST(q.l50 AS BIGINT) AS l50
      |FROM stats st
      |JOIN q ON q.lang = st.lang
      |JOIN r ON r.lang = q.lang AND r.rn = q.l50
      |ORDER BY st.lang""".stripMargin

  /** CpG observed/expected ratio + GC skew per sequence — the two classic
    * dinucleotide-composition diagnostics (CpG-island detection, strand
    * asymmetry). Everything is built-in string arithmetic: CG dinucleotide
    * count via the `length − length(replace(s,'CG',''))` idiom (CG cannot
    * self-overlap, so non-overlapping replace counts ALL occurrences; the
    * /2 is exact), char counts via the byte-table `ascii_char_count`
    * kernel. Ratios are single IEEE divisions of exact longs, NULL-guarded
    * (ANSI mode) exactly like the oracle's NULLIF. Row-local. */
  def qCpgRatio(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.plans.AsciiExpressions.asciiCharCount
    val u = surrogate(col("text"))
    val nC = asciiCharCount(u, "C")
    val nG = asciiCharCount(u, "G")
    val nCg = call_function("div",
      (length(u) - length(replace(u, lit("CG"), lit("")))).cast("long"), lit(2L))
    val len = length(u).cast("long")
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow side first — see qSeqStats
      .select(
        col("doc_id"),
        nCg.as("n_cg"),
        when(nC * nG > 0,
          (nCg * len).cast("double") / (nC * nG).cast("double"))
          .as("cpg_oe"),
        when(nC + nG > 0,
          (nG - nC).cast("double") / (nG + nC).cast("double"))
          .as("gc_skew"))
  }

  val qCpgRatioSql: String =
    """WITH s AS (SELECT doc_id, upper(replace(text,' ','')) AS u FROM documents),
      |c AS (SELECT doc_id, length(u) AS len,
      |        length(u) - length(replace(u, 'C', '')) AS n_c,
      |        length(u) - length(replace(u, 'G', '')) AS n_g,
      |        (length(u) - length(replace(u, 'CG', ''))) // 2 AS n_cg
      |      FROM s)
      |SELECT doc_id,
      |       CAST(n_cg AS BIGINT) AS n_cg,
      |       CAST(n_cg * len AS DOUBLE) / CAST(NULLIF(n_c * n_g, 0) AS DOUBLE) AS cpg_oe,
      |       CAST(n_g - n_c AS DOUBLE) / CAST(NULLIF(n_g + n_c, 0) AS DOUBLE) AS gc_skew
      |FROM c ORDER BY doc_id""".stripMargin

  /** DUST-style low-complexity score per sequence — the seq analog of the
    * text repetition filter: over overlapping k=3 windows (uppercase,
    * N-skip — E6 semantics, same native `window_counts_total` kernel as
    * the k-mer family), score_num = Σ c·(c−1)/2 over window counts,
    * normalized by (windows − 1). Exact integer numerator (the product of
    * consecutive integers is even ⇒ /2 exact), one division for the
    * double. The Σ c·(c−1)/2 fold is FUSED into the packed-key window
    * pass (`window_dust_stats` — the explode+groupBy form cost 14.2 s at
    * 100×, the fused kernel is row-local; SeqExpressionsSpec pins them
    * equal), so only the output sort exchanges. */
  def qDustScore(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow side first — see qSeqStats
      .select(col("doc_id"),
        graft.plans.SeqExpressions
          .windowDustStats(surrogate(col("text")), 3, 1).as("ds"))
      .select(
        col("doc_id"),
        col("ds.dust_num").as("dust_num"),
        col("ds.total").as("n_windows"),
        when(col("ds.total") > 1,
          col("ds.dust_num").cast("double") /
            (col("ds.total") - lit(1L)).cast("double"))
          .as("dust"))
  }

  val qDustScoreSql: String =
    """WITH seqs AS (SELECT doc_id, upper(replace(text,' ','')) AS s FROM documents),
      |grams AS (
      |  SELECT doc_id, substr(s, i, 3) AS gram
      |  FROM seqs, LATERAL unnest(generate_series(1, length(s)-2)) AS t(i)
      |),
      |cnts AS (
      |  SELECT doc_id, gram, count(*) AS cnt FROM grams
      |  WHERE gram NOT LIKE '%N%' GROUP BY doc_id, gram
      |),
      |agg AS (
      |  SELECT doc_id,
      |         CAST(sum(cnt * (cnt - 1) // 2) AS BIGINT) AS dust_num,
      |         CAST(sum(cnt) AS BIGINT) AS n_windows
      |  FROM cnts GROUP BY doc_id)
      |SELECT d.doc_id,
      |       COALESCE(a.dust_num, 0) AS dust_num,
      |       COALESCE(a.n_windows, 0) AS n_windows,
      |       CASE WHEN COALESCE(a.n_windows, 0) > 1
      |            THEN CAST(COALESCE(a.dust_num, 0) AS DOUBLE)
      |                   / CAST(a.n_windows - 1 AS DOUBLE) END AS dust
      |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
      |ORDER BY d.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cpg_ratio" -> (qCpgRatio _),
    "q_dust_score" -> (qDustScore _),
    "q_homopolymer" -> (qHomopolymer _),
    "q_n50" -> (qN50 _),
    "q_orf_scan" -> (qOrfScan _),
    "q_translate" -> (qTranslate _),
    "q_phred_stats" -> (qPhredStats _),
    "q_revcomp" -> (qRevcomp _),
    "q_udaf_gc" -> (qUdafGc _),
    "q_seq_stats" -> (qSeqStats _),
    "q_kmer_explode" -> (qKmerExplode _),
    "q_minimizers" -> (qMinimizers _),
    "q_minimizers_wide" -> (qMinimizersWide _),
    "q_codon_explode" -> (qCodonExplode _),
    "q_kmer_map" -> (qKmerMap _))

  val oracles: Map[String, String] = Map(
    "q_cpg_ratio" -> qCpgRatioSql,
    "q_dust_score" -> qDustScoreSql,
    "q_homopolymer" -> qHomopolymerSql,
    "q_n50" -> qN50Sql,
    "q_orf_scan" -> qOrfScanSql,
    "q_translate" -> qTranslateSql,
    "q_phred_stats" -> qPhredStatsSql,
    "q_revcomp" -> qRevcompSql,
    "q_udaf_gc" -> qUdafGcSql,
    "q_seq_stats" -> qSeqStatsSql,
    "q_kmer_explode" -> qKmerExplodeSql,
    "q_minimizers" -> qMinimizersSql,
    "q_minimizers_wide" -> qMinimizersWideSql,
    "q_codon_explode" -> qCodonExplodeSql,
    "q_kmer_map" -> qKmerMapSql)
}
