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
  private def materializeFasta(spark: SparkSession, sfDir: String): String = {
    val dir = new File("/root/repo/target/fastx_roundtrip/" + new File(sfDir).getName + "_fasta")
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), regexp_replace(col("text"), " ", "").as("seq"))
      .select(
        concat(lit("doc_"), col("doc_id"), lit(" nchars="), length(col("seq"))).as("header"),
        col("seq").as("sequence"))
    graft.FastxIO.writeFasta(docs, dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  def qFastxRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val path = materializeFasta(spark, sfDir)
    spark.read.format("fastx")
      .option("maxSplitBytes", (64 * 1024).toString) // force multi-split reads
      .load(path)
      .select(
        regexp_extract(col("header"), "^doc_(\\d+)", 1).cast("long").as("doc_id"),
        seqLength(col("sequence")).as("seq_len"),
        nCount(col("sequence")).as("n_cnt"),
        seqHash(col("sequence"), 16).as("seq_md5"))
      .orderBy("doc_id")
  }

  /** Oracle recomputes the same stats straight from `documents`. */
  val qFastxRoundtripSql: String =
    """SELECT doc_id,
      |       length(replace(text, ' ', '')) AS seq_len,
      |       length(replace(text, ' ', ''))
      |         - length(replace(replace(text, ' ', ''), 'N', '')) AS n_cnt,
      |       substr(md5(replace(text, ' ', '')), 1, 16) AS seq_md5
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fastx_roundtrip" -> (qFastxRoundtrip _))

  val oracles: Map[String, String] = Map(
    "q_fastx_roundtrip" -> qFastxRoundtripSql)
}
