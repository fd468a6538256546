package graft

import org.apache.spark.sql.functions.col

/** SQL-interface parity: the ANSI-portable subset of the oracle SQL (the
  * exact strings the DuckDB gate runs) must ALSO run unchanged through
  * `spark.sql` over registered temp views and produce the same rows as the
  * DataFrame plans. This pins two things at once: a SQL user of the
  * library gets the same results as the DataFrame API, and the oracle
  * strings for these queries stay engine-neutral ANSI rather than drifting
  * into DuckDB dialect.
  */
class SqlParitySpec extends SparkSpec {

  /** Oracle SQL that is ANSI enough for both engines (no list/string_split
    * lambdas, no strftime/quantile_cont dialect). */
  private val portable = Seq(
    "q_agg_q1", "q_join_star", "q_semi_anti", "q_full_outer",
    "q_set_ops", "q_rollup", "q_cube", "q_distinct_exact", "q_approx_topk",
    "q_stats_moments", "q_window_ranks", "q_cross_grid", "q_incremental_agg")

  private def registerViews(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(n => Tables.t(spark, TestSpark.Sf0001, n).createOrReplaceTempView(n))

  portable.foreach { name =>
    test(s"$name: oracle SQL via spark.sql matches the DataFrame plan") {
      registerViews()
      val fromSql = spark.sql(SparkEntry.oracleSql(name))
      val fromDf = SparkEntry.queries(name)(spark, TestSpark.Sf0001)
      val a = fromSql.select(fromSql.columns.sorted.map(col).toIndexedSeq: _*)
        .collect().map(_.toString).toSeq
      val b = fromDf.select(fromDf.columns.sorted.map(col).toIndexedSeq: _*)
        .collect().map(_.toString).toSeq
      assert(a == b,
        s"$name: spark.sql result differs from DataFrame result\nsql=${a.take(5)}\ndf=${b.take(5)}")
    }
  }
}
