package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SeqFunctions._

/** The reference's only end-to-end pipeline, `fasta_stats`
  * (`fastx_parsers.py:137-223`), re-expressed Spark-first:
  * read FASTX → optional length filters (`:161-164`, truthiness: 0 disables)
  * → field validation against the registry (`:168-189`, unknown fields
  * warned and dropped) → aliased stat projection (`:192-211`) → nested
  * columns JSON-stringified (`:214-220`, Polars casts nested→Utf8) → TSV
  * sink (`:222`).
  *
  * Unlike the reference (eager read, post-materialization filters), the
  * whole pipeline is one lazy narrow plan: the length filter and column
  * pruning reach the scan, and the TSV write streams partition-parallel.
  */
object FastaStats {

  /** The reference's 8-field registry (`fastx_parsers.py:168-177`). */
  val Fields: Seq[String] = Seq(
    "header", "sequence", "length", "gc_content", "n_count", "hash",
    "codon_usage", "kmer_frequencies")

  def statColumns(k: Int, hashLen: Int): Map[String, Column] = Map(
    "header" -> col("header"),
    "sequence" -> col("sequence"),
    "length" -> seqLength(col("sequence")),
    "gc_content" -> gcContent(col("sequence")),
    "n_count" -> nCount(col("sequence")),
    "hash" -> seqHash(col("sequence"), hashLen),
    "codon_usage" -> graft.plans.SeqExpressions.codonUsageNative(col("sequence")),
    "kmer_frequencies" -> graft.plans.SeqExpressions.kmerFrequenciesNative(col("sequence"), k))

  /** Build the stats DataFrame (separated from the sink for testability). */
  def stats(spark: SparkSession, inputPath: String,
            fields: Seq[String] = Seq("header", "length", "gc_content"),
            minLen: Int = 0, maxLen: Int = 0,
            k: Int = 3, hashLen: Int = 32): DataFrame = {
    val cols = statColumns(k, hashLen)
    val (known, unknown) = fields.partition(cols.contains)
    if (unknown.nonEmpty)
      System.err.println(s"[fasta_stats] ignoring unknown fields: ${unknown.mkString(", ")}")
    val selected = if (known.nonEmpty) known else Seq("header")

    var df = spark.read.format("fastx").load(inputPath)
    // truthiness semantics: 0 disables the bound (fastx_parsers.py:161-164)
    if (minLen != 0) df = df.filter(length(col("sequence")) >= minLen)
    if (maxLen != 0) df = df.filter(length(col("sequence")) <= maxLen)
    df.select(selected.map(f => cols(f).as(f)): _*)
  }

  /** Full pipeline: stats → nested-to-JSON → headered TSV directory. */
  def run(spark: SparkSession, inputPath: String, outputPath: String,
          fields: Seq[String] = Seq("header", "length", "gc_content"),
          minLen: Int = 0, maxLen: Int = 0,
          k: Int = 3, hashLen: Int = 32): Unit = {
    val df = stats(spark, inputPath, fields, minLen, maxLen, k, hashLen)
    // CSV can't hold maps: JSON-encode nested columns (P4, fastx_parsers.py:214-220)
    val out = df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType =>
          acc.withColumn(f.name, to_json(col(f.name)))
        case _ => acc
      }
    }
    out.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .csv(outputPath)
  }
}
