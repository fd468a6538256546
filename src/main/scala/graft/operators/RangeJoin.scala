package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tolerance (band/range) join: all (left, right) pairs with the same key
  * whose timestamps lie within ±tolerance of each other.
  *
  * Spark plans a raw `|l.ts - r.ts| <= tol` predicate as a broadcast
  * nested loop (O(n·m) — a non-starter at corpus scale). The scale-safe
  * plan used here is BINNING: bucket timestamps by `floor(ts / tol)`,
  * replicate each right row into its bin and both neighbors, equi-join on
  * (key, bin), then apply the exact tolerance filter. Any qualifying pair
  * has bins differing by at most 1, so exactly ONE replica matches —
  * no duplicates, no misses — and the join is a plain hash equi-join with
  * 3× replication of the smaller side as the only overhead. */
object RangeJoin {

  /** `leftTs`/`rightTs` name TimestampType columns; `tolMicros` is the
    * inclusive band half-width in microseconds. Right payload column names
    * must not collide with left's. */
  def toleranceJoin(left: DataFrame, right: DataFrame, key: Seq[String],
                    leftTs: String, rightTs: String, tolMicros: Long): DataFrame = {
    require(tolMicros > 0, "tolerance must be positive")
    val lb = left.withColumn("__bin", floor(unix_micros(col(leftTs)) / tolMicros))
    val rb = right
      .withColumn("__rbin", floor(unix_micros(col(rightTs)) / tolMicros))
      .withColumn("__bin", explode(array(col("__rbin") - 1, col("__rbin"), col("__rbin") + 1)))
      .drop("__rbin")
    lb.join(rb, key :+ "__bin")
      .filter(abs(unix_micros(col(leftTs)) - unix_micros(col(rightTs))) <= tolMicros)
      .drop("__bin")
  }
}
