package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.dsum

/** Time-series operators: gap-fill resampling onto a dense per-key grid —
  * the densification step (metrics-per-bucket matrices, forward-filled
  * state) event logs need before feature extraction.
  *
  * Scale shape: the grid is generated per key with `sequence` + `explode`
  * from a two-column min/max aggregate — no driver loop and no cross join
  * against a global calendar — so grid size grows with span × keys, never
  * with event count; the fill is one window per key and the gap join is an
  * equi-join on (key, bucket).
  */
object TimeSeries {

  /** Resample `df` per `keyCol` onto a dense `unit` grid ("day", "hour",
    * "week", …) spanning each key's min..max active bucket. Returns one
    * row per (key, bucket): `cnt` (0 on gaps), `value_sum` (decimal-exact
    * per-bucket sum of `valueCol`, null on gaps), and `value_filled` (last
    * observed sum carried forward). The per-bucket aggregate feeds both
    * the grid bounds and the gap join, so it is cached for the plan's
    * lifetime (CacheScope-scoped). */
  def resample(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
               unit: String = "day"): DataFrame = {
    val step = expr(s"interval 1 $unit")
    val perBucket = graft.CacheScope.cached(df
      .groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("cnt"), dsum(col(valueCol)).as("value_sum")))
    val grid = perBucket.groupBy(keyCol)
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"), step)).as("bucket"))
    val fill = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(perBucket, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        col("value_sum"),
        last(col("value_sum"), ignoreNulls = true).over(fill).as("value_filled"))
  }
}
