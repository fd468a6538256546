package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and follows the §2.3 determinism rules:
  * total ORDER BY on a unique key; double aggregates summed in DECIMAL and
  * cast back to DOUBLE; timestamps formatted to strings. Each `queries`
  * entry with an `oracleSql` twin is hash-compared against DuckDB by the
  * driver's Verify harness.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SeqQueries.qSeqStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SeqQueries.queries ++
      RelationalQueries.queries ++
      EventQueries.queries ++
      TextQueries.queries ++
      SimilarityQueries.queries ++
      DedupQueries.queries ++
      FastxQueries.queries ++
      PipelineQueries.queries ++
      LayoutQueries.queries ++
      EntityQueries.queries ++
      StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (map-typed outputs) get the
    * driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    SeqQueries.oracles ++
      RelationalQueries.oracles ++
      EventQueries.oracles ++
      TextQueries.oracles ++
      SimilarityQueries.oracles ++
      DedupQueries.oracles ++
      FastxQueries.oracles ++
      PipelineQueries.oracles ++
      LayoutQueries.oracles ++
      EntityQueries.oracles ++
      StreamQueries.oracles
}
