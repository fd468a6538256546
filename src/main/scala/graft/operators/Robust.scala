package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust-statistics transforms for feature pipelines: percentile-based
  * outlier clipping (winsorization). The per-group quantile bounds are a
  * group-cardinality-sized aggregate that BROADCASTS back onto the fact
  * table, so clipping a 100 TB column costs two scans and no fact
  * shuffle.
  *
  * Two bounds paths, mirroring the q_percentile / q_approx_percentile
  * sketch pair:
  *  - exact (`approxAccuracy = None`): `percentile` buffers every group
  *    value in one aggregation buffer — bit-exact, oracle-checkable, but
  *    the state is O(group size). Right for tests and bounded groups.
  *  - approx (`approxAccuracy = Some(acc)`): `approx_percentile`'s
  *    Greenwald-Khanna sketch keeps O(acc) state per group regardless of
  *    group size — the only shape that survives a 10^10-row group at
  *    100 TB. Rank error is at most 1/acc of the group size.
  */
object Robust {

  /** Per-group [pLo, pHi] quantile bounds of `valueCol` — one array-form
    * percentile aggregate (a single buffer per group serves both
    * quantiles). Returns (groupCols*, __lo, __hi).
    *
    * @param approxAccuracy None → exact `percentile` (unbounded state);
    *                       Some(acc) → `approx_percentile` GK sketch with
    *                       bounded state and rank error ≤ 1/acc. */
  def quantileBounds(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     pLo: Double, pHi: Double,
                     approxAccuracy: Option[Int] = None): DataFrame = {
    val agg = approxAccuracy match {
      case Some(acc) =>
        expr(s"approx_percentile($valueCol, array(${pLo}D, ${pHi}D), $acc)")
      case None =>
        expr(s"percentile($valueCol, array(${pLo}D, ${pHi}D))")
    }
    df.groupBy(groupCols.map(col): _*)
      .agg(agg.as("__b"))
      .select(groupCols.map(col) :+
        col("__b").getItem(0).cast("double").as("__lo") :+
        col("__b").getItem(1).cast("double").as("__hi"): _*)
  }

  /** `df` with `valueCol` winsorized into its per-group [pLo, pHi] band:
    * adds `<valueCol>_w` (clipped value) plus the bound columns. The
    * bounds join is broadcast (bounds are group-cardinality-sized by
    * construction — one row per group); everything else is row-local.
    *
    * @param approxAccuracy see [[quantileBounds]] — pass Some(acc) at
    *                       scale so the bounds aggregation state stays
    *                       bounded per group.
    * @param hintBroadcast  true (default) forces the bounds join to
    *                       broadcast — right for bounded group keys
    *                       (enums, types, sources). Pass false for
    *                       entity-scale group keys (per-user bounds at
    *                       10^8+ users outgrow the broadcast limit) so
    *                       AQE picks the join strategy instead. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                pLo: Double = 0.05, pHi: Double = 0.95,
                approxAccuracy: Option[Int] = None,
                hintBroadcast: Boolean = true): DataFrame = {
    val bounds = quantileBounds(df, groupCols, valueCol, pLo, pHi, approxAccuracy)
    df.join(if (hintBroadcast) broadcast(bounds) else bounds, groupCols)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
  }

  /** The clip indicator columns for conditional aggregation. */
  def clipFlags(valueCol: String): (Column, Column) =
    (col(valueCol) < col("__lo"), col(valueCol) > col("__hi"))

  /** Per-group (median, MAD) — the robust location/scale pair behind
    * outlier detection (MAD tolerates up to 50% contamination where
    * stddev is dragged by the outliers it is meant to find). Two passes:
    * a per-group median, broadcast back; then the median of absolute
    * residuals. Returns (groupCols*, __med, __mad). Same exact/approx
    * split as [[quantileBounds]]: exact `percentile` is oracle-grade but
    * O(group) state; `approxAccuracy` bounds state for 100 TB groups.
    * `hintBroadcast` as in [[winsorize]]: default-forced broadcast of the
    * one-row-per-group median table, opt out for entity-scale keys. */
  def mad(df: DataFrame, groupCols: Seq[String], valueCol: String,
          approxAccuracy: Option[Int] = None,
          hintBroadcast: Boolean = true): DataFrame = {
    val med = quantileBounds(df, groupCols, valueCol, 0.5, 0.5, approxAccuracy)
      .select(groupCols.map(col) :+ col("__lo").as("__med"): _*)
    val resAgg = approxAccuracy match {
      case Some(acc) => expr(s"approx_percentile(__absdev, 0.5D, $acc)")
      case None      => expr("percentile(__absdev, 0.5D)")
    }
    df.join(if (hintBroadcast) broadcast(med) else med, groupCols)
      .withColumn("__absdev", abs(col(valueCol) - col("__med")))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__med")).as("__med"), resAgg.cast("double").as("__mad"))
  }

  /** The outlier indicator for conditional aggregation: |x − med| > k·mad
    * (strict, so a zero-MAD group flags only true deviants). Every op is
    * one correctly-rounded IEEE step on engine-identical inputs, so the
    * flag is oracle-exact. */
  def anomalyFlag(valueCol: String, k: Double = 3.0): Column =
    abs(col(valueCol) - col("__med")) > lit(k) * col("__mad")
}
