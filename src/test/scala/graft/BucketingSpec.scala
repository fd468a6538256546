package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located joins: same-key bucketed tables must join with NO
  * shuffle exchange, and match the plain join's rows. */
class BucketingSpec extends SparkSpec {

  test("bucketed join elides both exchanges and matches plain join") {
    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bkt", "l_orderkey", 8)
    // tables this small would broadcast (also exchange-light, but it hides
    // the bucketing story); force the shuffle-join path to show buckets
    // replacing the shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_bkt", "o_bkt", "l_orderkey")
      joined.count() // materialize so the adaptive plan is final
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"bucket scan missing:\n$plan")

      val plain = li.join(o, "l_orderkey")
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS o_bkt")
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(li, "li_bkt2", "l_orderkey", 8)
    try {
      val agg = spark.table("li_bkt2").groupBy("l_orderkey")
        .agg(sum("l_quantity").as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed agg must not shuffle:\n$plan")
      assert(agg.count() == li.select("l_orderkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS li_bkt2")
  }
}
