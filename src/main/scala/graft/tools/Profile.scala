package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.SeqFunctions._
import graft.functions.TextFunctions.tokens

/** Ad-hoc profiling scratchpad (not part of the driver contract). */
object Profile {
  def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), upper(regexp_replace(col("text"), " ", "")).as("s"))
    docs.count()

    // A: current — string-array explode, groupBy, window, orderBy
    def variantA: DataFrame = {
      val w = Window.partitionBy("doc_id")
      docs.select(col("doc_id"), explode(kmerArray(col("s"), 3)).as("gram"))
        .filter(!col("gram").contains("N"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
        .withColumn("freq", col("cnt").cast("double") / sum("cnt").over(w))
        .orderBy("doc_id", "gram")
    }
    // B: position explode (no string array), repartition(doc_id) once
    def variantB: DataFrame = {
      val w = Window.partitionBy("doc_id")
      docs.filter(length(col("s")) >= 3)
        .select(col("doc_id"), col("s"), explode(sequence(lit(1), length(col("s")) - 2)).as("i"))
        .select(col("doc_id"), col("s").substr(col("i"), lit(3)).as("gram"))
        .filter(!col("gram").contains("N"))
        .repartition(col("doc_id"))
        .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
        .withColumn("freq", col("cnt").cast("double") / sum("cnt").over(w))
        .orderBy("doc_id", "gram")
    }
    time("kmer A (array explode)")(noop(variantA))
    time("kmer B (pos explode+repart)")(noop(variantB))
    time("kmer A again")(noop(variantA))
    time("kmer B again")(noop(variantB))

    // jaccard variants
    def shingleArr(tk: org.apache.spark.sql.Column) =
      when(size(tk) >= 3,
        array_distinct(transform(sequence(lit(0), size(tk) - 3, lit(1)), i =>
          concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2), element_at(tk, i + 3)))))
        .otherwise(array().cast("array<string>"))

    val docsT = t(spark, sfDir, "documents")
    def jacHash: DataFrame = {
      val sh = docsT.select(col("doc_id"),
        explode(shingleArr(tokens(col("text")))).as("sh"))
        .select(col("doc_id"), xxhash64(col("sh")).as("h")).cache()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      val r = inter
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
        .withColumn("jaccard", col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
        .filter(col("jaccard") >= 0.2)
        .select("d1", "d2", "inter", "jaccard")
        .orderBy("d1", "d2")
      r
    }
    time("jaccard hashed+cached")(noop(jacHash))
    time("jaccard hashed again")(noop(jacHash))
    spark.stop()
  }
}
