package graft

import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss projection pins (round 15): deterministic ±1
  * sign matrix, hand-checked projection arithmetic, planted-duplicate
  * nearest neighbor, and fixture recall sanity.
  */
class JlSpec extends SparkSpec {
  import testImplicits._
  private lazy val testImplicits = spark.implicits
  import graft.operators.Similarity

  test("sign matrix: ±1, deterministic, md5-parity entries") {
    val s = Similarity.jlSigns(16, 64)
    assert(s.length == 16 && s.forall(_.length == 64))
    assert(s.flatten.forall(v => v == 1L || v == -1L))
    assert(Similarity.jlSigns(16, 64).map(_.toSeq).toSeq == s.map(_.toSeq).toSeq)
    // spot-check one entry against the documented derivation
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want =
      if (java.lang.Long.parseLong(md5hex("3#7").substring(0, 6), 16) % 2 == 0) 1L
      else -1L
    assert(s(3)(7) == want)
    // a dense random ±1 matrix is roughly balanced
    val plus = s.flatten.count(_ == 1L)
    assert(plus > 350 && plus < 650, s"suspiciously unbalanced: $plus/1024")
  }

  test("projection arithmetic: operator output equals the plain-Scala reference") {
    val vecs = Seq(
      (0L, Array.tabulate(8)(i => (i + 1) * 0.125f)),
      (1L, Array.tabulate(8)(i => 1.0f - i * 0.0625f)),
      (2L, Array.fill(8)(0.5f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.jlTopKBatchQ(df, "vec_id", "embedding",
      probeIds = Seq(0L), k = 2, outDims = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val signs = Similarity.jlSigns(4, 8)
    def proj(v: Array[Float]): Array[Long] = {
      val q = v.map(x => math.floor(x.toDouble * 1048576).toLong)
      signs.map(row => row.zip(q).map { case (s, x) => s * x }.sum)
    }
    val ps = vecs.map { case (id, v) => id -> proj(v) }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val want = Seq(1L, 2L).map(id => id -> d2(ps(0L), ps(id))).sortBy(x => (x._2, x._1))
      .zipWithIndex.map { case ((id, d), i) => (0L, (i + 1).toLong, id, d) }
    assert(out.sortBy(_._2).toSeq == want)
  }

  test("planted duplicate projects to distance zero and ranks first") {
    val base = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val rows = (0L until 20L).map { i =>
      if (i == 7L) (i, base.clone)
      else (i, base.map(v => v + 0.01f * (i + 1) * ((i % 2) * 2 - 1)))
    } :+ (99L, base.clone)
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.jlTopKBatchQ(df, "vec_id", "embedding",
      probeIds = Seq(7L), k = 3, outDims = 8).collect()
    assert(out.head.getLong(2) == 99L, "the exact duplicate must rank #1")
    assert(out.head.getLong(3) == 0L, "duplicate projects to distance 0")
  }

  test("q_ann_persist: persisted-index serving equals the in-memory path bit-for-bit (r15)") {
    val persisted = SparkEntry.queries("q_ann_persist")(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSeq
    val inMemory = SparkEntry.queries("q_ann_ivf")(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSeq
    try {
      assert(persisted == inMemory,
        s"persistence must be invisible:\n$persisted\nvs\n$inMemory")
      // the artifacts are real and the centroid matrix round-trips
      val base = "/root/repo/target/ann_index/sf0.001"
      val cents = spark.read.parquet(base + "/centroids").collect()
      assert(cents.length == 16)
      assert(cents.forall(_.getSeq[Long](1).nonEmpty))
      val asg = spark.read.parquet(base + "/assignments")
      assert(asg.count() == 500L)
      assert(asg.select("cell").distinct().count() <= 16L)
    } finally CacheScope.release()
  }

  test("q_ann_jl: the dimension-tradeoff curve is live and rises with dims") {
    val rows = SparkEntry.queries("q_ann_jl")(spark, TestSpark.Sf0001).collect()
    try {
      assert(rows.length == 15) // 3 dims × 5 probes
      rows.foreach { r =>
        assert(r.getLong(2) == 10L)
        val rec = r.getLong(3)
        assert(rec >= 0L && rec <= 10L)
      }
      val byDims = rows.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(3)).sum).toMap
      assert(byDims.keySet == Set(16L, 32L, 48L))
      // the curve must rise: more projected dims preserve more ranking
      // (the fixture's random embeddings concentrate distances, so the
      // absolute level is low — the SHAPE is the signal)
      assert(byDims(48L) >= byDims(16L),
        s"recall curve inverted: $byDims")
      assert(byDims(48L) >= 5L,
        s"48-dim projection collapsed to chance: $byDims")
    } finally CacheScope.release()
  }
}
