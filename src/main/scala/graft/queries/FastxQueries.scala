package graft.queries

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

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

  /** Deterministic FASTA fixture for an sfDir; rewritten on each call. */
  private def materializeFasta(spark: SparkSession, sfDir: String): String = {
    val outDir = new File("/root/repo/target/fastx_roundtrip")
    outDir.mkdirs()
    val f = new File(outDir, new File(sfDir).getName + ".fasta")
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), regexp_replace(col("text"), " ", "").as("seq"))
      .orderBy("doc_id")
      .collect() // fixture generation only — bounded (≤5000 docs at sf0.1)
    val sb = new StringBuilder
    docs.foreach { r =>
      val id = r.getLong(0)
      val seq = r.getString(1)
      sb.append(s">doc_$id nchars=${seq.length}\n")
      seq.grouped(60).foreach(chunk => sb.append(chunk).append('\n'))
    }
    Files.write(f.toPath, sb.toString.getBytes(StandardCharsets.UTF_8))
    f.getAbsolutePath
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
