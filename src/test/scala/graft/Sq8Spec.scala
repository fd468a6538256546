package graft

import org.apache.spark.sql.functions._
import graft.plans.{VectorExpressions => VE}

/** SQ8 encode/decode arithmetic ([[graft.plans.VectorOps.sq8Encode]] /
  * `sq8Decode`) and the batch search shape
  * ([[graft.operators.Similarity.sq8TopKBatchQ]]). */
class Sq8Spec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("encode/decode match the hand computation, clamp, and constant-dim rule") {
    // dim stats: mins = (0, -10, 5), ranges = (510, 20, 0)
    val mins = Array(0L, -10L, 5L)
    val ranges = Array(510L, 20L, 0L)
    val df = Seq(Tuple1(Seq(255L, 0L, 5L))).toDF("vq")
      .select(VE.sq8Encode(col("vq"), mins, ranges).as("c"))
      .select(col("c"), VE.sq8Decode(col("c"), mins, ranges).as("dq"))
    val r = df.collect()(0)
    // c0 = (255-0)*255/510 = 127;  c1 = (0+10)*255/20 = 127 (floor 127.5)
    // c2 = (5-5)*255/max(0,1) = 0 (constant dim)
    assert(r.getSeq[Long](0) == Seq(127L, 127L, 0L), r.getSeq[Long](0))
    // dq0 = 0 + 127*510/255 = 254;  dq1 = -10 + 127*20/255 = -10+9 = -1
    // dq2 = 5 + 0*0/255 = 5
    assert(r.getSeq[Long](1) == Seq(254L, -1L, 5L), r.getSeq[Long](1))
  }

  test("out-of-range values clamp to [0, 255]") {
    val mins = Array(0L)
    val ranges = Array(100L)
    val got = Seq(Tuple1(Seq(1000L)), Tuple1(Seq(-50L))).toDF("vq")
      .select(VE.sq8Encode(col("vq"), mins, ranges).as("c"))
      .collect().map(_.getSeq[Long](0).head).toSeq
    assert(got == Seq(255L, 0L), got)
  }

  test("sq8TopKBatchQ finds the planted nearest neighbor") {
    // 4-dim corpus: id 0 is the probe; id 1 a near-copy; ids 2..9 far
    val rows = (Seq(
      (0L, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      (1L, Seq(0.51f, 0.5f, 0.5f, 0.5f))) ++
      (2L to 9L).map(i => (i, Seq(-0.9f + i * 0.01f, 0.9f, -0.9f, 0.9f))))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity
      .sq8TopKBatchQ(rows, "vec_id", "embedding", Seq(0L), k = 3)
      .orderBy("rnk").select("vec_id").as[Long].collect().toSeq
    assert(got.head == 1L, s"nearest must be the planted near-copy: $got")
    assert(got.size == 3 && !got.contains(0L), got)
    CacheScope.release()
  }
}
