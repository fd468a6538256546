package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.sources.fastx.FastxRecord

/** User-facing entry points mirroring the reference API surface
  * (`LazyFrame.from_fastx` / `DataFrame.from_fastx`,
  * `fastx_parsers.py:70-71,132-134`). Spark DataFrames are lazy, so the
  * lazy/eager split collapses: `scanFastx` IS the lazy scan; call
  * `.cache()`/an action for the eager behavior.
  */
object FastxIO {

  /** S1 — lazy FASTX scan (`LazyFrame.from_fastx`). */
  def scanFastx(spark: SparkSession, path: String): DataFrame =
    spark.read.format("fastx").load(path)

  /** S2 — "eager" read (`DataFrame.from_fastx`): same scan; `batch_size`
    * has no Spark analog (the engine batches internally,
    * cf. `fastx_parsers.py:101-102`). */
  def readFastx(spark: SparkSession, path: String): DataFrame =
    scanFastx(spark, path)

  /** Typed veneer (SURVEY §1.2): case-class Dataset for compile-time field
    * checks. FASTA files surface `quality = null`. */
  def records(spark: SparkSession, path: String): Dataset[FastxRecord] = {
    import spark.implicits._
    val df = scanFastx(spark, path)
    val withQuality =
      if (df.columns.contains("quality")) df
      else df.withColumn("quality", org.apache.spark.sql.functions.lit(null: String))
    withQuality.as[FastxRecord]
  }
}
