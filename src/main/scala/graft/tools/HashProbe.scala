package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tools.Profile.{noop, time}
import graft.functions.SeqFunctions._

object HashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def surrogate(c: org.apache.spark.sql.Column) =
      upper(replace(c, lit(" "), lit("")))
    val docs = graft.Tables.t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    time("warm scan")(noop(docs))
    time("seq_len only")(noop(docs.select(seqLength(col("text")))))
    time("n_cnt only")(noop(docs.select(nCount(col("text")))))
    time("md5 only")(noop(docs.select(seqHash(col("text"), 8))))
    time("replace only")(noop(docs.select(length(replace(col("text"), lit(" "), lit(""))))))
    time("upper(replace) only")(noop(docs.select(length(surrogate(col("text"))))))
    time("gc full")(noop(docs.select(gcContent(surrogate(col("text"))))))
    spark.stop()
  }
}
