package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — the feature-attachment join every
  * training-data pipeline needs: each left row picks the single right row
  * with the largest `rightTs <= leftTs` for the same key (or nulls when
  * none), guaranteeing no look-ahead leakage into features.
  *
  * Spark has no native as-of join; the scale-safe formulation is the
  * union-and-window sweep used here, NOT a per-row range subquery:
  * tag both sides, union, and run one window per key ordered by
  * (ts, side) carrying the last right payload forward. Cost = ONE shuffle
  * of left+right on the key plus a per-partition sort — linear at any
  * scale, versus the O(n·m) expansion of a naive range join. At equal
  * timestamps the right row sorts first, so a left row sees a same-instant
  * right row (DuckDB `ASOF JOIN ... ON l.ts >= r.ts` semantics — the
  * oracle for q_asof_join).
  *
  * The right payload is carried as ONE struct through
  * `last(_, ignoreNulls)` so multi-column matches stay atomic (carrying
  * columns independently could mix rows when payload columns contain
  * nulls). `right` must be unique per (key, rightTs); dedupe first with a
  * deterministic tie policy (see q_asof_join).
  *
  * Skew note: one window partition per key value is inherent to as-of
  * semantics (a key's timeline must be ordered in one place). A pathological
  * hot key needs pre-bucketing by time range; normal key cardinality ≫
  * cores needs nothing.
  */
object AsofJoin {

  /** Left rows + the right side's non-key payload columns as-of-matched
    * (null when the key has no right row at or before the left timestamp).
    * Column names must not collide: right payload columns (everything
    * outside `key` + `rightTsCol`) must be absent from `left`. */
  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTsCol: String, rightTsCol: String): DataFrame = {
    val leftOther = left.columns.filterNot(c => key.contains(c) || c == leftTsCol).toSeq
    val payload = right.columns.filterNot(c => key.contains(c) || c == rightTsCol).toSeq
    require(payload.nonEmpty, "asofJoin: right side has no payload columns")
    require(payload.intersect(left.columns.toSeq).isEmpty,
      s"asofJoin: colliding columns ${payload.intersect(left.columns.toSeq).mkString(",")}")

    val rightTypes = payload.map(c => c -> right.schema(c).dataType).toMap
    val lTagged = left.select(
      key.map(col) ++
        Seq(col(leftTsCol).as("__ts"), lit(1).as("__is_left")) ++
        leftOther.map(col) ++
        Seq(lit(null).cast(org.apache.spark.sql.types.StructType(
          payload.map(c => org.apache.spark.sql.types.StructField(c, rightTypes(c)))))
          .as("__payload")): _*)
    val rTagged = right.select(
      key.map(col) ++
        Seq(col(rightTsCol).as("__ts"), lit(0).as("__is_left")) ++
        leftOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col): _*).as("__payload")): _*)

    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(
        key.map(col) ++
          Seq(col("__ts").as(leftTsCol)) ++
          leftOther.map(col) ++
          payload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
