package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scratch profiling main — rewritten per investigation; current target:
  * round-11 sample-trained SemDeDup centroids (FAISS-style shortcut) vs
  * the full-corpus Lloyd loop at the 1000× fixture (2 M vectors), the
  * VERDICT r10 item-1 measurement. Args: sfDir then `k:trainSample` specs
  * (trainSample 0 = full training, -1 = operator-adaptive).
  */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }
  def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = t(spark, sfDir, "embeddings")
    println(s"[profile] embeddings rows: ${emb.count()}")
    val specs = args.drop(1) match {
      case Array() => Seq((2048, 0), (2048, -1))
      case a => a.toSeq.map { s =>
        val Array(k, ts) = s.split(":"); (k.toInt, ts.toInt)
      }
    }
    for ((k, ts) <- specs) {
      time(s"semanticDedup nCells=$k trainSample=$ts") {
        val out = graft.operators.Similarity
          .semanticDedup(emb, "vec_id", "embedding", nCells = k, iters = 2,
            minCosine = 0.3, trainSample = ts)
        val kept = out.filter(col("kept") === 1L).count()
        println(s"[profile]   nCells=$k trainSample=$ts kept=$kept")
      }
      graft.CacheScope.release()
    }
    spark.stop()
  }
}
