package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: prints the physical plan of the named queries (all
  * when none given) at the given sfDir — the `.explain` loop SURVEY's
  * build discipline calls for after each operator lands.
  *
  * Usage: runMain graft.tools.Explain <sfDir> [query ...] [--full]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val full = args.contains("--full")
    val names = args.drop(1).filterNot(_ == "--full") match {
      case Array() => graft.SparkEntry.queries.keys.toSeq.sorted
      case qs      => qs.toSeq
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"===== $q =====")
      val p = graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      if (full) println(p)
      else println(p.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate") ||
          l.contains("Scan") || l.contains("Sort") || l.contains("Window") ||
          l.contains("Cartesian") || l.contains("Generate")).mkString("\n"))
      graft.CacheScope.release()
    }
    spark.stop()
  }
}
