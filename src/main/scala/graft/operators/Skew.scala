package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) covers
  * sort-merge joins at runtime; explicit salting remains the tool when a
  * hot key would overwhelm even a split partition, or for aggregations.
  */
object Skew {

  /** Salted inner equi-join for a skewed LEFT side: the left side gets a
    * deterministic salt in [0, salt) derived from a stable column (so the
    * same row always lands on the same salted key — no RNG, replayable),
    * the right side is replicated `salt` times via explode. Key cardinality
    * multiplies by `salt`, so the hot key's rows spread over `salt`
    * partitions. Use when one key holds ≫ 1/parallelism of the rows. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int, leftStableCol: String): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val l = left.withColumn("__salt", pmod(xxhash64(col(leftStableCol)), lit(salt)))
    val r = right.withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase skew-proof aggregation: partial aggregate on (key, salt)
    * first (spreads a hot key across `salt` reducers), then final
    * aggregate on key. Expressed here for SUM; the pattern generalizes to
    * any commutative/associative aggregate. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salt: Int, stableCol: String): DataFrame = {
    require(salt > 1, "salt must be > 1")
    df.withColumn("__salt", pmod(xxhash64(col(stableCol)), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** [[saltedSum]] with the repo's decimal-exact discipline: partials sum
    * in DECIMAL(18,6) (order-independent), the final pass sums the exact
    * partials — so the salted two-phase result is bit-identical to a plain
    * one-phase decimal sum, which is what makes it oracle-checkable.
    * Also carries the row count (same two-phase shape). */
  def saltedSumExact(df: DataFrame, key: String, valueCol: String,
                     salt: Int, stableCol: String): DataFrame = {
    require(salt > 1, "salt must be > 1")
    df.withColumn("__salt", pmod(xxhash64(col(stableCol)), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(
        sum(graft.Tables.dec(col(valueCol))).as("__partial"),
        count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(
        graft.Tables.decOut(sum(col("__partial"))).as(s"sum_$valueCol"),
        sum(col("__n")).as("cnt"))
  }
}
