package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.Profile.{noop, time}

object HashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, sfDir, "documents")
    def e0(wins: org.apache.spark.sql.DataFrame) =
      wins.as("a").join(wins.as("b"),
        col("a.wh") === col("b.wh") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src"), col("b.source").as("dst")).distinct()
    val winsHexNC = docs.select(col("source"),
      explode(graft.plans.WindowHashExpressions.windowHashes(col("text"), 16)).as("wh")).distinct()
    time("hex nocache e0 (exchange reuse)")(noop(e0(winsHexNC)))
    val winsRawNC = docs.select(col("source"),
      explode(graft.plans.WindowHashExpressions.windowHashesRaw(col("text"), 16)).as("wh")).distinct()
    time("raw-binary nocache e0")(noop(e0(winsRawNC)))
    time("raw-binary nocache e0 (2)")(noop(e0(winsRawNC)))
    spark.stop()
  }
}
