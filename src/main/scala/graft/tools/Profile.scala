package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

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

    def grams = docs.filter(length(col("s")) >= 3)
      .select(col("doc_id"), col("s"),
        explode(sequence(lit(1), length(col("s")) - 2, lit(1))).as("i"))
      .select(col("doc_id"), col("s").substr(col("i"), lit(3)).as("gram"))
      .filter(!col("gram").contains("N"))

    for (_ <- 1 to 3)
      time("qKmerExplode (current)  ")(noop(graft.queries.SeqQueries.qKmerExplode(spark, sfDir)))
    // stage A: explode+substr only
    for (_ <- 1 to 2) time("explode+substr only")(noop(grams))
    // stage B: + repartition + groupBy count
    def counted = grams.repartition(col("doc_id"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
    for (_ <- 1 to 2) time("+ repartition+groupBy")(noop(counted))
    // stage C: + window + sort (full query)
    val w = Window.partitionBy("doc_id")
    def full = counted
      .withColumn("freq", col("cnt").cast("double") / sum("cnt").over(w))
      .orderBy("doc_id", "gram")
    for (_ <- 1 to 2) time("full query")(noop(full))
    spark.stop()
  }
}
