package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run a subset of SparkEntry.queries and dump each result the
  * same way graft.Verify does, without paying for the full query set.
  *
  * Usage: runMain graft.tools.RunOne <sfDir> <outDir> <query>[,<query>...]
  * The dumped parquet slots into tools/local_verify.py's layout, so a
  * targeted `python3 tools/local_verify.py <sfDir> <outDir>` re-checks just
  * the listed queries (it only iterates oracle keys with a dump present
  * when pointed at a partial outDir).
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra session confs (k=v;k=v) — e.g. forcing a data-size-gated code
    // path ON at a verification SF so the oracle pins its equivalence
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dumped = names.split(",").toSet
    dumped.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      graft.CacheScope.release()
      println(s"[runone] dumped $name")
    }
    // refresh the oracle map so local_verify.py sees oracles added since
    // the last full graft.Verify run (same escaping rules as Verify) —
    // restricted to queries with a dump PRESENT in outDir (this run's plus
    // any earlier RunOne's into the same dir), so sequential partial runs
    // accumulate oracle coverage instead of clobbering each other's keys
    val present = Option(new java.io.File(outDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && graft.SparkEntry.queries.contains(f.getName))
      .map(_.getName).toSet ++ dumped
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => present(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
