package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Similarity

class TextFunctionsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("tokens drops empties from repeated separators") {
    val r = Seq("a  b   c ").toDF("t")
      .select(TextFunctions.tokens($"t")).collect()(0).getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("approxTokenCount: letter runs, digit runs, single marks") {
    val r = Seq("hello world42, x=1!").toDF("t")
      .select(TextFunctions.approxTokenCount($"t")).collect()(0).getLong(0)
    // hello|world|42|,|x|=|1|! -> 8
    assert(r == 8L)
  }

  test("rollingFingerprint is order-sensitive; fingerprint64 whitespace-normalizing") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),   // same bag, different order
      (3L, "alpha  beta   gamma")) // same tokens, extra spaces
      .toDF("id", "t")
    val rows = df.select($"id",
      TextFunctions.rollingFingerprint($"t").as("roll"),
      TextFunctions.fingerprint64($"t").as("fp64"))
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    assert(rows(1L)._1 != rows(2L)._1, "rolling fp must be order-sensitive")
    assert(rows(1L)._2 != rows(2L)._2)
    // fingerprint64 normalizes runs of whitespace; rolling works on tokens
    assert(rows(1L)._2 == rows(3L)._2, "fp64 must normalize whitespace")
    assert(rows(1L)._1 == rows(3L)._1, "token-based rolling fp ignores extra spaces")
  }

  test("qualityScore lands in [0,1] on real documents") {
    val q = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(TextFunctions.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).collect()(0)
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("randomHyperplaneBucket: deterministic, fixed width, splits the corpus") {
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    def buckets = emb.select($"vec_id",
      Similarity.randomHyperplaneBucket($"embedding", dim = 64, bits = 8).as("b"))
    val a = buckets.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = buckets.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
    val distinct = a.values.toSet.size
    assert(distinct > 50, s"hyperplanes should spread buckets, got $distinct")
  }

  test("lshNearDupPairs accepts the hyperplane family as a drop-in bucket") {
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val pairs = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
      minCosine = 0.3,
      bucketFn = v => Similarity.randomHyperplaneBucket(v, dim = 64, bits = 8))
      .select("v1", "v2").as[(Long, Long)].collect()
    // every returned pair genuinely clears the exact-cosine threshold
    pairs.take(3).foreach { case (v1, v2) =>
      val c = emb.as("a").join(emb.as("b"),
          col("a.vec_id") === v1 && col("b.vec_id") === v2)
        .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
        .as[Double].collect()(0)
      assert(c >= 0.3)
    }
  }
}

