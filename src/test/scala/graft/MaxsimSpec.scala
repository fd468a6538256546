package graft

/** Late-interaction rerank pins (round 15): exact agreement with an
  * INDEPENDENT brute-force reference (separate tokenizer, separate md5
  * path, no Spark) on a crafted corpus, plus self-retrieval and
  * non-degeneracy on the real fixture (the fixture's shared synthetic
  * vocabulary made the unigram formulation tie degenerate — this spec
  * is the regression gate for that).
  */
class MaxsimSpec extends SparkSpec {
  import testImplicits._
  private lazy val testImplicits = spark.implicits

  // ---- independent reference implementation -------------------------
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def vec(unit: String): Array[Long] =
    (0 until 16).map { d =>
      (java.lang.Long.parseLong(md5hex(s"$unit#$d").substring(0, 6), 16) % 17L) - 8L
    }.toArray

  private def bigrams(text: String, cap: Int): Seq[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.matches("^[a-z]+$"))
    val bgs = toks.indices.map { i =>
      (if (i == 0) "^" else toks(i - 1)) + " " + toks(i)
    }
    // first-occurrence order, distinct, capped
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    bgs.foreach(seen += _)
    seen.toSeq.take(cap)
  }

  private def reference(docs: Seq[(Long, String)], probes: Seq[Long])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val dset = docs.map { case (id, t) => id -> bigrams(t, 24) }.toMap
    val qset = probes.map(p => p -> bigrams(docs.toMap.apply(p), 8)).toMap
    probes.sorted.flatMap { p =>
      val q = qset(p)
      val cands = docs.map(_._1)
        .map(d => (d, q.count(dset(d).toSet)))
        .filter(_._2 > 0)
        .sortBy { case (d, ov) => (-ov, d) }
        .take(16)
      val reranked = cands.map { case (d, ov) =>
        val maxsim = q.map { qt =>
          val qv = vec(qt)
          dset(d).map { dt =>
            val dv = vec(dt)
            (0 until 16).map(i => qv(i) * dv(i)).sum
          }.max
        }.sum
        (d, ov.toLong, maxsim)
      }.sortBy { case (d, _, ms) => (-ms, d) }.take(5)
      reranked.zipWithIndex.map { case ((d, ov, ms), i) =>
        (p, (i + 1).toLong, d, ov, ms)
      }
    }
  }

  test("crafted corpus: exact agreement with the independent reference") {
    // 12 docs over a small vocab; doc 0 and 5 are probes; doc 7 copies
    // doc 0's opening (high overlap AND high maxsim), doc 9 shares one
    // bigram only, doc 11 shares nothing with either probe
    val docs = Seq(
      0L -> "red fox jumps over the lazy dog near the red barn",
      1L -> "blue bird sings over the green hill every day",
      2L -> "red fox runs under the old bridge at dawn",
      3L -> "the lazy dog sleeps near the warm fire tonight",
      4L -> "green hill rolls toward the blue lake slowly",
      5L -> "quick brown cat climbs the tall tree behind the barn",
      6L -> "quick brown cat naps in the sun all afternoon",
      7L -> "red fox jumps over the lazy dog and vanishes",
      8L -> "tall tree shades the quiet garden in summer",
      9L -> "the red barn stands beyond the wide field",
      10L -> "brown cat and lazy dog share the old porch",
      11L -> "silver ship sails across calm water at night")
    val probes = Seq(0L, 5L)
    val got = graft.queries.SimilarityQueries
      .maxsimRerankCore(docs.toDF("doc_id", "text"), probes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val want = reference(docs, probes)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the copying doc is a live arm: doc 7 must be probe 0's top non-self hit
    val p0 = got.filter(_._1 == 0L)
    assert(p0.head._3 == 0L, "probe must retrieve itself first")
    assert(p0(1)._3 == 7L, "the near-copy must rerank to #2")
    // the no-overlap doc never appears
    assert(!got.exists(_._3 == 11L))
  }

  test("real fixture: self-retrieval at full overlap, non-degenerate scores") {
    val rows = SparkEntry.queries("q_maxsim_rerank")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    try {
      val probes = Seq(3L, 57L, 91L, 142L)
      assert(rows.length == 20)
      probes.foreach { p =>
        val mine = rows.filter(_._1 == p).sortBy(_._2)
        assert(mine.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
        // self-retrieval: the probe's 8 query bigrams are a prefix-subset
        // of its own 24 doc bigrams → overlap 8, and it must win rank 1
        assert(mine.head._3 == p, s"probe $p must rank itself #1: $mine")
        assert(mine.head._4 == 8L)
        // scores strictly ordered below the self hit — the degenerate-tie
        // regression gate (unigram units tied all candidates)
        assert(mine.head._5 > mine(1)._5,
          s"self hit must strictly beat the runner-up for probe $p")
      }
      val distinctScores = rows.map(_._5).distinct.length
      assert(distinctScores >= 12,
        s"readout must discriminate: only $distinctScores distinct scores")
    } finally CacheScope.release()
  }
}
