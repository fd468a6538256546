package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch fixture builder for the r15 knn-training-sample A/B: an
  * embeddings-ONLY ×n replica dir (ScaleUp's exact vec transform — key
  * shift + per-replica diagonal sign flip — without paying for the
  * document/lineitem replication the knn family never reads).
  *
  * Usage: runMain graft.tools.EmbScale [srcDir] [dstDir] [n]
  */
object EmbScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/sf100e")
    val n = args.lift(2).map(_.toInt).getOrElse(1000)
    val Off = 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$src/embeddings.parquet")
      .withColumn("__r", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("vec_id", col("vec_id") + col("__r").cast("long") * Off)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(col("__r") === 0 ||
            pmod(xxhash64(col("__r"), i), lit(2L)) === 0L, x).otherwise(-x)))
      .drop("__r")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[embscale] wrote $dst/embeddings.parquet x$n")
    spark.stop()
  }
}
