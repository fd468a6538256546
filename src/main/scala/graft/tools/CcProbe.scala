package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch probe for the r15 optimization round: where does the
  * CC-family query time go — pair generation or the star loop — and how
  * many rounds does the loop run at each SF?
  *
  * Usage: runMain graft.tools.CcProbe <sfDir> [reps]
  */
object CcProbe {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ccprobe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, sfDir, "documents")
    (1 to reps).foreach { _ =>
      import org.apache.spark.sql.functions._
      // stage A: exact-collapse rep filter (inline: contentRepMap is private)
      val repDocs = time("exactCollapseRepFilter") {
        val keyed = graft.CacheScope.cached(docs.select(col("doc_id").as("id"),
          graft.plans.HashExpressions.md5Hex(col("text")).as("__key")))
        val repMap = keyed.join(
          keyed.groupBy(col("__key")).agg(min(col("id")).as("__rep")), "__key")
          .select(col("id"), col("__rep"))
        val r = docs.join(
          repMap.filter(col("id") === col("__rep")).select(col("id").as("doc_id")),
          Seq("doc_id"), "left_semi")
        noop(r); r
      }
      // stage B: pair generation (candidates + verify)
      val pairs = time("verifiedNearDupPairs") {
        val p = graft.operators.Dedup
          .verifiedNearDupPairs(repDocs, "doc_id", "text", 3, 0.5,
            graft.operators.Dedup.DefaultMaxShingleDF)
        noop(p); p
      }
      val nPairs = pairs.count()
      // stage C: the star loop alone (pairs already materialized above,
      // but uncached — this re-runs the cascade too; the delta vs B is
      // the loop's own cost since B's caches are still warm)
      val (labels, rounds) = time("ccStarWithRounds") {
        val lr = graft.operators.Dedup.ccStarWithRounds(pairs)
        noop(lr._1); lr
      }
      println(s"[ccprobe] pairs=$nPairs rounds=$rounds labels=${labels.count()}")
      graft.CacheScope.release()
    }
    spark.stop()
  }
}
