package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scratch profiling main — rewritten per investigation; current target:
  * semanticDedup's nCells scaling at the 100× fixture (does a larger cell
  * count restore near-linear wall time, and does the argmin kernel hold at
  * k where the literal-tree assignment could not codegen?). */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = t(spark, sfDir, "embeddings")
    println(s"[profile] embeddings rows: ${emb.count()}")
    for (k <- args.drop(1).map(_.toInt) match {
           case Array() => Seq(16, 64, 256, 1024); case a => a.toSeq
         }) {
      time(s"semanticDedup nCells=$k") {
        val out = graft.operators.Similarity
          .semanticDedup(emb, "vec_id", "embedding", nCells = k, iters = 2,
            minCosine = 0.3)
        val kept = out.filter(col("kept") === 1L).count()
        println(s"[profile]   nCells=$k kept=$kept")
      }
      graft.CacheScope.release()
    }
    spark.stop()
  }
}
