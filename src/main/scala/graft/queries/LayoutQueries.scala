package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_partition_prune" -> (qPartitionPrune _))

  val oracles: Map[String, String] = Map(
    "q_partition_prune" -> qPartitionPruneSql)
}
