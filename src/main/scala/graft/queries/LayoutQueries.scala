package graft.queries

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-layout queries: partition-pruned scans over a hive-partitioned
  * parquet table.
  *
  * At 100 TB the single cheapest query optimization is not reading the
  * data: a table partitioned on a low-cardinality predicate column lets the
  * planner drop whole directories at METADATA time, before any IO. This
  * module materializes `lineitem` partitioned by ship month (83 partitions
  * at any SF — partition count scales with the date range, not the data)
  * and proves the pruned plan shape under the oracle gate; PlanQualitySpec
  * asserts the scan's `PartitionFilters` so a regression that silently
  * turns the prune into a full scan fails CI.
  */
object LayoutQueries {

  /** Write lineitem hive-partitioned by ship month. `repartition` on the
    * partition column first: dynamic partition writes otherwise emit one
    * file per (task × partition) — task-parallel small-file spray is the
    * classic large-cluster layout bug. One shuffle, one file per month.
    * Rewritten on each call (the fixture is the product under test). */
  private def materializePartitioned(spark: SparkSession, sfDir: String): String = {
    val dir = new File("/root/repo/target/layout/" + new File(sfDir).getName + "_lineitem_by_month")
    t(spark, sfDir, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .repartition(col("ship_month"))
      .write.mode("overwrite").partitionBy("ship_month")
      .parquet(dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  /** Revenue for 3 of ~83 months: the filter on the partition column must
    * prune 80 directories at planning time (PartitionFilters, zero IO for
    * pruned months). Decimal-exact sums per §2.3. */
  def qPartitionPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = materializePartitioned(spark, sfDir)
    spark.read.parquet(dir)
      .filter(col("ship_month").isin("1995-03", "1995-04", "1995-05"))
      .groupBy("ship_month", "l_returnflag")
      .agg(
        dsum(col("l_extendedprice")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("ship_month", "l_returnflag")
  }

  val qPartitionPruneSql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_returnflag,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem
      |WHERE strftime(l_shipdate, '%Y-%m') IN ('1995-03', '1995-04', '1995-05')
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** 16-bit Morton spread: bits of the low 16 bits of `x` moved to even
    * positions (0,2,4,…). Pure codegen'd integer Column math — the
    * standard mask-shift spread. */
  private def spreadBits(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) key of two 16-bit dimensions: interleaved bits, so a
    * range of keys covers a 2-D rectangle of (a, b) space. */
  def zorderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Z-order layout key — the multi-dimension data-skipping technique
    * (Delta/Iceberg OPTIMIZE ZORDER BY): interleave the bits of
    * (user_id, minute-of-day) so that sorting by the single Morton key
    * co-locates rows that are close in BOTH dimensions. Parquet row-group
    * min/max stats on zkey then skip data for predicates on either column —
    * the layout that makes a 100 TB table selectively readable on two axes
    * at once, where a lexicographic sort only serves its leading column.
    * The key is pure integer bit math, so the oracle is bit-exact; the
    * orderBy IS the layout (range partitioning = the cluster write shape). */
  def qZorder(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        (hour(col("ts")) * 60 + minute(col("ts"))).cast("long").as("minute_of_day"))
    ev.select(col("event_id"), col("user_id"), col("minute_of_day"),
        zorderKey(col("user_id"), col("minute_of_day")).as("zkey"))
      .orderBy(col("zkey"), col("event_id"))
  }

  val qZorderSql: String = {
    def spread(x: String): String = {
      val v0 = s"($x & 65535)"
      val v1 = s"(($v0 | ($v0 << 8)) & 16711935)"
      val v2 = s"(($v1 | ($v1 << 4)) & 252645135)"
      val v3 = s"(($v2 | ($v2 << 2)) & 858993459)"
      s"(($v3 | ($v3 << 1)) & 1431655765)"
    }
    val minute = "(CAST(hour(ts) AS BIGINT) * 60 + CAST(minute(ts) AS BIGINT))"
    s"""SELECT event_id, user_id, $minute AS minute_of_day,
       |       (${spread("user_id")} | (${spread(minute)} << 1)) AS zkey
       |FROM events
       |ORDER BY zkey, event_id""".stripMargin
  }

  /** Shuffle-free join on co-bucketed tables: orders and customer are
    * written ONCE as bucketed+sorted managed tables on the join key, after
    * which every join on that key reads bucket-aligned files and the
    * planner elides BOTH join-side exchanges — the standard way a 100 TB
    * pipeline amortizes its repeated fact-fact joins (the bucketed write
    * pays the shuffle once). The `merge` hint keeps the plan a sort-merge
    * join (a broadcast would hide the exchange elision this query
    * demonstrates); PlanQualitySpec asserts no exchange feeds the join.
    * Aggregation output is the usual decimal-exact revenue per segment. */
  def qBucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val sf = new File(sfDir).getName.replace('.', '_')
    val (ot, ct) = (s"bkt_orders_$sf", s"bkt_customer_$sf")
    graft.operators.Bucketing.writeBucketed(
      t(spark, sfDir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      ot, "o_custkey", buckets = 8)
    graft.operators.Bucketing.writeBucketed(
      t(spark, sfDir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
      ct, "o_custkey", buckets = 8)
    spark.table(ot).join(spark.table(ct).hint("merge"), "o_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_total"))
      .orderBy("c_mktsegment")
  }

  val qBucketedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partition_prune" -> (qPartitionPrune _),
    "q_zorder" -> (qZorder _),
    "q_bucketed_join" -> (qBucketedJoin _))

  val oracles: Map[String, String] = Map(
    "q_partition_prune" -> qPartitionPruneSql,
    "q_zorder" -> qZorderSql,
    "q_bucketed_join" -> qBucketedJoinSql)
}
