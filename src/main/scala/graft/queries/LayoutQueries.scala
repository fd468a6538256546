package graft.queries

import java.io.File

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
    * Aggregation output is the usual decimal-exact revenue per segment.
    *
    * Bucket count must scale with the cluster, not the demo: a bucketed
    * scan gets exactly one task per bucket, so a fixed count caps every
    * downstream join/agg at that parallelism regardless of data size
    * (measured: buckets=8 left 24 of 32 cores idle at the 100× fixture —
    * 48.8 s). One bucket per core keeps the post-write pipeline fully
    * parallel; result hashes are bucket-count independent. */
  def qBucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val sf = new File(sfDir).getName.replace('.', '_')
    val (ot, ct) = (s"bkt_orders_$sf", s"bkt_customer_$sf")
    val nBuckets = math.max(8, spark.sparkContext.defaultParallelism)
    graft.operators.Bucketing.writeBucketed(
      t(spark, sfDir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      ot, "o_custkey", buckets = nBuckets)
    graft.operators.Bucketing.writeBucketed(
      t(spark, sfDir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
      ct, "o_custkey", buckets = nBuckets)
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

  /** Small-file compaction planner — the maintenance pass every
    * lakehouse table needs (Delta OPTIMIZE / Iceberg rewrite_data_files):
    * given a file inventory, assign small files to target-size compaction
    * bins and emit one plan row per output file. The inventory is derived
    * from `documents` (20 docs per pseudo-file, size = sum(n_chars));
    * files at/above the target pass through untouched — only the
    * small-file tail is planned.
    *
    * Bin assignment is offset packing: files ordered by id within a
    * source, bin = floor(exclusive-running-size / target) — deterministic,
    * each bin ≥ target except the last, expressible as one window sum
    * (no iterative greedy loop). Scale shape: this plans over file
    * METADATA (~10⁶ rows per source at 100 TB, not data rows); the
    * per-source window is a single sorted pass after one shuffle on
    * `source`, and the two window passes share that partitioning. */
  def qCompactionPlan(spark: SparkSession, sfDir: String): DataFrame = {
    val target = 40000L
    val files = t(spark, sfDir, "documents")
      .groupBy(col("source"),
        floor(col("doc_id") / lit(20.0d)).cast("long").as("file_id"))
      .agg(sum(col("n_chars")).as("size_bytes"), count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("source")).orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.filter(col("size_bytes") < target)
      .withColumn("off", coalesce(sum(col("size_bytes")).over(w), lit(0L)))
      .withColumn("bin", floor(col("off") / lit(target.toDouble)).cast("long"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"), sum(col("size_bytes")).as("bin_bytes"),
        min(col("file_id")).as("first_file"), max(col("file_id")).as("last_file"))
      .orderBy("source", "bin")
  }

  val qCompactionPlanSql: String =
    """WITH files AS (
      |  SELECT source, CAST(floor(doc_id / 20.0) AS BIGINT) AS file_id,
      |         CAST(sum(n_chars) AS BIGINT) AS size_bytes, count(*) AS n_docs
      |  FROM documents GROUP BY 1, 2),
      |small AS (SELECT * FROM files WHERE size_bytes < 40000),
      |packed AS (
      |  SELECT *, coalesce(sum(size_bytes) OVER
      |      (PARTITION BY source ORDER BY file_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      |  FROM small)
      |SELECT source, CAST(floor(off / 40000.0) AS BIGINT) AS bin,
      |       count(*) AS n_files, CAST(sum(size_bytes) AS BIGINT) AS bin_bytes,
      |       min(file_id) AS first_file, max(file_id) AS last_file
      |FROM packed
      |GROUP BY 1, 2
      |ORDER BY source, bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partition_prune" -> (qPartitionPrune _),
    "q_zorder" -> (qZorder _),
    "q_compaction_plan" -> (qCompactionPlan _),
    "q_bucketed_join" -> (qBucketedJoin _))

  val oracles: Map[String, String] = Map(
    "q_partition_prune" -> qPartitionPruneSql,
    "q_zorder" -> qZorderSql,
    "q_compaction_plan" -> qCompactionPlanSql,
    "q_bucketed_join" -> qBucketedJoinSql)
}
