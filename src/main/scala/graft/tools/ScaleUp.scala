package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-scale fixture builder: replicates an sfDir N× with per-replica
  * key shifts, producing a dataset ~N× the rows with the same schema,
  * key-uniqueness, and join relationships (dimension tables nation/region
  * are copied unshifted; every fact/entity key moves by replica×OFFSET so
  * FK joins still land). Events keep `ts` as the raw nanos BIGINT so the
  * copy reads back through Tables.t exactly like the driver's files.
  *
  * This exists to validate the two-phase/broadcast/split claims at a 10×
  * datapoint (BASELINE.md) — it is NOT an oracle input; correctness stays
  * pinned at the driver's SFs.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [n]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val Off = 10000000L

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts is TIMESTAMP(NANOS): read as Long and KEEP it Long so the
    // copy re-reads through Tables.t's `timestamp_micros(ts DIV 1000)`
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def copy(name: String): Unit =
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")

    def rep(name: String, keys: Seq[String]): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val out = df.withColumn("__r", explode(sequence(lit(0), lit(n - 1))))
      val shifted = keys.foldLeft(out)((d, k) =>
        d.withColumn(k, col(k) + col("__r").cast("long") * Off)).drop("__r")
      shifted.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name ×$n")
    }

    copy("region"); copy("nation")
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rep("events", Seq("event_id", "user_id"))
    rep("documents", Seq("doc_id"))
    rep("embeddings", Seq("vec_id"))
    println(s"[scaleup] wrote $dst")
    spark.stop()
  }
}
