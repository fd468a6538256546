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

  /** FASTA sink — the write-side twin of the scan (the reference only
    * ships a TSV sink, `fastx_parsers.py:222`; a FASTA writer is the
    * natural complement for a sequence engine). Fully distributed: each
    * row is formatted to its complete multi-line record (`wrap`-char
    * wrapped sequence lines) as one text value with embedded newlines and
    * written with `df.write.text` — one file per partition, nothing on the
    * driver, and the output directory scans back via `scanFastx`.
    *
    * `headerCol`/`sequenceCol` name the input columns; headers are written
    * after `>` verbatim (descriptions kept, matching needletail's header
    * semantics). */
  def writeFasta(df: DataFrame, path: String,
                 headerCol: String = "header", sequenceCol: String = "sequence",
                 wrap: Int = 60): Unit = {
    import org.apache.spark.sql.functions._
    require(wrap > 0, "wrap must be positive")
    val record = concat(
      lit(">"), col(headerCol), lit("\n"),
      // newline between wrap-size chunks; the lookahead avoids a trailing
      // blank line when the length is an exact multiple
      regexp_replace(col(sequenceCol), s"(.{$wrap})(?=.)", "$1\n"))
    df.select(record.as("value")).write.mode("overwrite").text(path)
  }

  /** FASTQ sink — 4-line records (`@header / sequence / + / quality`),
    * written unwrapped per FASTQ convention. Same fully-distributed shape
    * as [[writeFasta]]: one formatted text value per record, one file per
    * partition, nothing through the driver; the output scans back via the
    * fastx reader (including its `@`-in-quality-line disambiguation).
    * Rows must satisfy length(sequence) == length(quality) — violations
    * fail the job rather than corrupt the 4-line framing downstream. */
  def writeFastq(df: DataFrame, path: String,
                 headerCol: String = "header", sequenceCol: String = "sequence",
                 qualityCol: String = "quality"): Unit = {
    import org.apache.spark.sql.functions._
    val checkedQual = when(
      length(col(qualityCol)) === length(col(sequenceCol)), col(qualityCol))
      .otherwise(raise_error(concat(
        lit("writeFastq: quality length != sequence length for header "),
        col(headerCol))))
    val record = concat(
      lit("@"), col(headerCol), lit("\n"),
      col(sequenceCol), lit("\n+\n"),
      checkedQual)
    df.select(record.as("value")).write.mode("overwrite").text(path)
  }
}
