package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // 10k rows, 90% on one hot key
    val left = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = Seq((1L, "hot"), (20L, "cold"), (30L, "cold2")).toDF("k", "attr")
    val plain = left.join(right, "k").select("k", "payload", "attr")
    val salted = Skew.saltedJoin(left, right, "k", salt = 8, leftStableCol = "payload")
      .select("k", "payload", "attr")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    assert(salted.count() == plain.count())
  }

  test("saltedSum equals plain groupBy sum (long-exact)") {
    val df = spark.range(10000)
      .select((col("id") % 3).as("k"), col("id").as("v"))
    val plain = df.groupBy("k").agg(sum("v").as("sum_v"))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val salted = Skew.saltedSum(df, "k", "v", salt = 8, stableCol = "v")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(plain == salted)
  }

  test("AQE splits skewed join partitions at runtime (skew=true in final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key carrying ~200k rows vs a uniform right side: the hot
      // shuffle partition exceeds threshold and factor×median → AQE must
      // split it instead of letting one task drag the stage
      val left = spark.range(200000).select(lit(1L).as("k"), col("id").as("v"))
        .union(spark.range(50).select((col("id") + 2).as("k"), col("id").as("v")))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      // collect() drives THIS dataset's QueryExecution, so AQE finalizes
      // the plan we inspect (count() would plan a separate query)
      assert(j.collect().length == 200000 + 50)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("fastx limit pushdown caps per-partition parsing") {
    val df = spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta")).limit(2)
    assert(df.count() == 2)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("limit=2"), s"limit not pushed to fastx scan:\n$p")
  }

  test("fastx scan reports size statistics scaled by pruning") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def scanStats(df: org.apache.spark.sql.DataFrame): Long = {
      val scans = df.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b.scan
      }
      val s = scans.head.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      s.estimateStatistics().sizeInBytes().getAsLong
    }
    val full = scanStats(spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta")))
    val pruned = scanStats(spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta"))
      .select("header"))
    assert(full > 0 && pruned > 0 && pruned < full, s"full=$full pruned=$pruned")
  }
}

