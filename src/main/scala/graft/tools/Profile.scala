package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = t(spark, sfDir, "documents")
    val cands = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text")
    time("minhash candidates count")(println(cands.count()))
    time("minhash candidates again")(println(cands.count()))
    time("full cascade")(noop(graft.queries.DedupQueries.qDedupCascade(spark, sfDir)))
    time("full cascade again")(noop(graft.queries.DedupQueries.qDedupCascade(spark, sfDir)))
    spark.stop()
  }
}
