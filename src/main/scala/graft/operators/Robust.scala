package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust-statistics transforms for feature pipelines: percentile-based
  * outlier clipping (winsorization). The per-group quantile bounds are a
  * group-cardinality-sized aggregate that BROADCASTS back onto the fact
  * table, so clipping a 100 TB column costs two scans and no fact
  * shuffle.
  */
object Robust {

  /** Per-group [pLo, pHi] quantile bounds of `valueCol` — one array-form
    * percentile aggregate (a single sorted buffer per group serves both
    * quantiles). Returns (groupCols*, __lo, __hi). */
  def quantileBounds(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     pLo: Double, pHi: Double): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, array(${pLo}D, ${pHi}D))").as("__b"))
      .select(groupCols.map(col) :+ col("__b").getItem(0).as("__lo") :+
        col("__b").getItem(1).as("__hi"): _*)

  /** `df` with `valueCol` winsorized into its per-group [pLo, pHi] band:
    * adds `<valueCol>_w` (clipped value) plus the bound columns. The
    * bounds join is broadcast; everything else is row-local. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val bounds = quantileBounds(df, groupCols, valueCol, pLo, pHi)
    df.join(broadcast(bounds), groupCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
  }

  /** The clip indicator columns for conditional aggregation. */
  def clipFlags(valueCol: String): (Column, Column) =
    (col(valueCol) < col("__lo"), col(valueCol) > col("__hi"))
}
