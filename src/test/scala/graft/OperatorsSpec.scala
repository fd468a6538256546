package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Semantics of the reusable operator layer: exact dedup keeps one winner
  * per content, SimHash finds planted near-dups within Hamming 3, LSH/IVF
  * candidate search agrees with brute force, and the quantized oracle
  * query ranks like the double-precision fast path.
  */
class OperatorsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
  private def emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")

  test("exactByContent keeps min-id winner per duplicate text") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exactByContent(df, "doc_id", "text")
      .orderBy("doc_id").select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  test("incrementalStatus labels exact/near/admitted by the asymmetric admission rules") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    val corpus = Seq(
      (100L, base.trim),                                    // standing corpus doc
      (101L, "completely unrelated corpus words about engines and planners")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (200L, base.trim),                                    // exact dup of corpus
      (201L, "fresh batch document with its own distinct vocabulary one"),
      (202L, "fresh batch document with its own distinct vocabulary one"), // exact dup within batch (201 wins)
      (203L, (base + "lambda").trim),                       // near dup of corpus 100
      (204L, "fresh batch document with its own distinct vocabulary one two three"), // near dup of batch 201 (smaller id wins)
      (205L, "entirely new admitted content nothing shares these tokens at all")
    ).toDF("doc_id", "text")
    val st = Dedup.incrementalStatus(corpus, batch, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(st(200L) == "exact_dup", st.toString)
    assert(st(201L) == "admitted", st.toString)
    assert(st(202L) == "exact_dup", st.toString)
    assert(st(203L) == "near_dup", st.toString)
    assert(st(204L) == "near_dup", st.toString)
    assert(st(205L) == "admitted", st.toString)
    CacheScope.release()
  }

  test("Robust.winsorize clips exactly to the per-group quantile band") {
    // group g: values 1..20 → p0.05/p0.95 interpolated bounds clip the tails
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = graft.operators.Robust.winsorize(df, Seq("grp"), "v", 0.05, 0.95)
      .select("v", "v_w").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // percentile(1..20, 0.05) ≈ 1.95, percentile(1..20, 0.95) ≈ 19.05
    assert(math.abs(out(1.0) - 1.95) < 1e-9 && math.abs(out(20.0) - 19.05) < 1e-9)
    assert(out(2.0) == 2.0 && out(19.0) == 19.0)   // interior untouched
  }

  test("Robust.quantileBounds approx path tracks exact within the sketch error band") {
    // The bounded-state scale path (approx_percentile GK sketch) must land
    // within the sketch's rank-error band of the exact bounds — mirrors the
    // q_approx_percentile 5% pin. 2000 values, accuracy 1000 → rank error
    // ≤ 2 ranks ≈ 0.1% of the value range; 5% is a generous ceiling.
    val df = (1 to 2000).map(i => ("g", i.toDouble)).toDF("grp", "v")
    def bounds(acc: Option[Int]) = {
      val r = graft.operators.Robust
        .quantileBounds(df, Seq("grp"), "v", 0.05, 0.95, acc).collect().head
      (r.getDouble(1), r.getDouble(2))
    }
    val (exLo, exHi) = bounds(None)
    val (apLo, apHi) = bounds(Some(1000))
    assert(math.abs(apLo - exLo) / exLo < 0.05, s"lo: approx $apLo vs exact $exLo")
    assert(math.abs(apHi - exHi) / exHi < 0.05, s"hi: approx $apHi vs exact $exHi")
    // and the approx-winsorized output still clips tails / keeps interior
    val w = graft.operators.Robust
      .winsorize(df, Seq("grp"), "v", 0.05, 0.95, Some(1000))
      .select("v", "v_w").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(w(1.0) > 1.0 && w(2000.0) < 2000.0)   // tails clipped
    assert(w(1000.0) == 1000.0)                  // interior untouched
  }

  test("leakage-safe split: no near-dup cluster spans train/holdout, both sides populated") {
    val d = docs.select("doc_id", "text")
    // same composition as qLeakageSplit: exact-collapse → cluster → re-expand
    val labels = Dedup.collapsedClusterLabels(d, "doc_id", "text", n = 3, minJaccard = 0.5)
      .withColumnRenamed("id", "doc_id")
    val sided = d.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("side", when(graft.operators.Sampling
        .gateBelow(col("cluster").cast("string"), "4"), "holdout").otherwise("train"))
    val spanning = sided.groupBy("cluster")
      .agg(countDistinct(col("side")).as("ns")).filter(col("ns") > 1).count()
    assert(spanning == 0L, "a duplicate cluster leaked across the split")
    val sides = sided.select("side").distinct().count()
    assert(sides == 2L, "gate degenerated to one side on the fixture")
    CacheScope.release()
  }

  test("Robust.mad: crafted group — exact median/MAD, outlier flag catches the plant") {
    // values 1..9 plus one planted outlier 1000: med of 10 values
    // (1..9,1000) = 5.5; |x-5.5| = 4.5,3.5,...,3.5,994.5 → mad = 2.5
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(v => ("g", v)).toDF("grp", "v")
    val stats = graft.operators.Robust.mad(df, Seq("grp"), "v").collect().head
    assert(stats.getDouble(1) == 5.5 && stats.getDouble(2) == 2.5, s"got $stats")
    val flagged = df.join(graft.operators.Robust.mad(df, Seq("grp"), "v"), Seq("grp"))
      .filter(graft.operators.Robust.anomalyFlag("v"))
      .select("v").collect().map(_.getDouble(0)).toSet
    // |x-5.5| > 7.5 → x < -2 or x > 13: only the plant
    assert(flagged == Set(1000.0), s"flagged: $flagged")
    // approx path stays in the error band and still catches the plant
    val approx = graft.operators.Robust.mad(df, Seq("grp"), "v", Some(1000)).collect().head
    assert(math.abs(approx.getDouble(1) - 5.5) <= 1.0 &&
      math.abs(approx.getDouble(2) - 2.5) <= 1.5, s"approx: $approx")
  }

  test("temperatureRates/Sample: rarest source kept whole, rates sqrt-flattened, deterministic") {
    // sources with 4:1 imbalance: rate(b)=1 (rarest), rate(a)=sqrt(1/4)=0.5
    val df = ((1 to 400).map(i => (s"d$i", "a")) ++ (1 to 100).map(i => (s"e$i", "b")))
      .toDF("k", "source")
    val rates = graft.operators.Sampling.temperatureRates(df, "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rates("a") == ((400L, (1L << 19))) && rates("b") == ((100L, (1L << 20))),
      s"rates: $rates")
    val out = graft.operators.Sampling.temperatureSample(df, col("k"), "source")
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("b") == 100L, s"rarest source must be kept whole: $kept")
    // source a keeps ~50%: hash-gated, so pin a generous band not an exact n
    assert(kept("a") > 120L && kept("a") < 280L, s"flattened source off-band: $kept")
    // determinism under repartitioning
    val again = graft.operators.Sampling
      .temperatureSample(df.repartition(7), col("k"), "source")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("foldAssign: folds cover 0..k-1, are deterministic, and roughly balanced") {
    val df = docs.select(col("doc_id").cast("string").as("k"))
    val folds = df.select(graft.operators.Sampling.foldAssign(col("k"), 5).as("fold"))
      .groupBy("fold").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folds.keySet == Set(0L, 1L, 2L, 3L, 4L), s"folds: $folds")
    val n = folds.values.sum.toDouble
    folds.values.foreach(c =>
      assert(math.abs(c / n - 0.2) < 0.08, s"unbalanced folds: $folds"))
    // determinism: same assignment on a repartitioned input
    val again = df.repartition(7)
      .select(graft.operators.Sampling.foldAssign(col("k"), 5).as("fold"))
      .groupBy("fold").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == folds)
  }

  test("chunkDedup: exact duplicate doc is fully dropped, first stays intact") {
    // 12 words → chunks of 4: doc 1 and doc 2 identical; doc 3 unique
    val w12 = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (1 to 12).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, w12), (2L, w12), (3L, other)).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 3L), (2L, 3L, 0L), (3L, 3L, 3L)))
    assert(out(0).getString(3) == w12)      // first occurrence rebuilds intact
    assert(out(1).isNullAt(3))              // fully-deduped doc has no text
    assert(out(2).getString(3) == other)
  }

  test("chunkDedup: shared chunk drops only in the later doc; rest survives in order") {
    val shared = "a b c d"                  // one full 4-word chunk
    val df = Seq(
      (1L, s"$shared e f g h"),             // chunks: [a b c d] [e f g h]
      (2L, s"$shared p q r s")              // shares chunk 0 with doc 1
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 4)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == 2L && out(0).getString(3) == s"$shared e f g h")
    assert(out(1).getLong(2) == 1L && out(1).getString(3) == "p q r s")
  }

  test("chunkDedup: pathological hot chunk — one chunk duplicated across 20k docs") {
    // worst-case dedup skew: every doc shares the SAME first chunk, plus a
    // unique second chunk. The rank-1 filter must keep the hot chunk only
    // in the min-(id,pos) doc and every unique chunk everywhere — and the
    // plan's WindowGroupLimit (gated in PlanQualitySpec) keeps the hot key
    // from piling into a single window partition at scale.
    val hot = "h1 h2 h3 h4"
    val df = spark.range(0, 20000).selectExpr(
      "id AS doc_id",
      s"concat('$hot', ' u', id, ' v', id, ' w', id, ' x', id) AS text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 4)
    val agg = out.selectExpr(
      "sum(n_kept) AS kept",
      "sum(CASE WHEN n_kept = 2 THEN 1 ELSE 0 END) AS full_docs",
      "min(doc_id) FILTER (WHERE n_kept = 2) AS winner").collect().head
    // 20000 unique second chunks + exactly 1 surviving hot chunk
    assert(agg.getLong(0) == 20001L, s"kept=${agg.getLong(0)}")
    assert(agg.getLong(1) == 1L && agg.getLong(2) == 0L,
      s"hot chunk must survive only in doc 0: $agg")
  }

  test("chunkDedup: null text yields 0 chunks / 0 kept, no phantom chunk rows") {
    val df = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L, 1L), (2L, 0L, 0L)))
    assert(out(1).isNullAt(3))
  }

  test("TimeSeries.resample: gaps zero-counted, last value carried forward") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // key 1 active on days 1 and 4 (gap 2-3); key 2 single day (no grid rows added)
    val df = Seq(
      (1L, ts(1), 10.0), (1L, ts(1), 5.0), (1L, ts(4), 7.0),
      (2L, ts(2), 1.0)
    ).toDF("k", "t", "v")
    val out = graft.operators.TimeSeries.resample(df, "k", "t", "v")
      .orderBy("k", "bucket")
      .select("k", "cnt", "value_sum", "value_filled")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3))).toSeq
    assert(out == Seq(
      (1L, 2L, Some(15.0), 15.0),   // day 1: two events
      (1L, 0L, None, 15.0),         // day 2: gap, filled
      (1L, 0L, None, 15.0),         // day 3: gap, filled
      (1L, 1L, Some(7.0), 7.0),     // day 4: new observation
      (2L, 1L, Some(1.0), 1.0)))
    CacheScope.release()
  }

  test("simhash64 is deterministic and order-sensitive but near-dup tolerant") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // 1 token differs
      (3L, "completely different words about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val hs = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(1L), hs(2L)) < hamming(hs(1L), hs(3L)),
      s"near-dup pair should be closer: ${hs.toSeq}")
    // deterministic across evaluations
    val again = df.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hs == again)
  }

  test("simhashPairs finds a planted near-duplicate (bag-of-words invariant)") {
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5).trim
    // SimHash is bag-of-words: a token permutation has Hamming distance 0
    val near = base.split(" ").reverse.mkString(" ")
    val far = "one two three four five six seven eight nine ten " * 5
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    for (portable <- Seq(true, false)) {
      val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3, portable = portable)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"planted pair missing (portable=$portable): $pairs")
      assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
    }
  }

  test("simhashPairs hot-bucket cap drops degenerate cliques, keeps planted pairs") {
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5).trim
    val near = base.split(" ").reverse.mkString(" ") // permutation: Hamming 0
    // 50 byte-identical templated docs: identical simhash, all 4 block
    // buckets degenerate with population 50 — the post-exact-dedup
    // boilerplate scenario the cap exists for
    val boiler = "identical template boilerplate row that slipped past exact dedup"
    val rows = Seq((1L, base), (2L, near)) ++ (10L until 60L).map(i => (i, boiler))
    val df = rows.toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(df, "doc_id", "text", maxBucketSize = 8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)), s"cap should keep only the planted pair: $capped")
    // uncapped: the clique contributes C(50,2) = 1225 pairs
    val uncapped = Dedup.simhashPairs(df, "doc_id", "text", maxBucketSize = 0).count()
    assert(uncapped == 1225L + 1L, s"uncapped clique pair count: $uncapped")
    // default cap is far above any test-corpus density: identical output
    assert(Dedup.simhashPairs(df, "doc_id", "text").count() == uncapped)
    CacheScope.release()
  }

  test("containmentPairs: hand arithmetic, asymmetry, and the excerpt arm (r15)") {
    // A="a b c d e" (3 shingles), B="b c d e f" (3 shingles), inter=2:
    //   c(A→B) = c(B→A) = 2·2^20 div 3 = 699050; jaccard_q = 2^21 div 4
    val df = Seq((1L, "a b c d e"), (2L, "b c d e f")).toDF("doc_id", "text")
    val all = Dedup.containmentPairs(df, "doc_id", "text", n = 3,
      minContainmentQ = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(all == Set((1L, 2L, 699050L, 524288L), (2L, 1L, 699050L, 524288L)))
    graft.CacheScope.release()
    // excerpt: E's shingles ⊂ P's → c(E→P) = 2^20 EXACTLY, c(P→E) < 2^20
    val df2 = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "w3 w4 w5 w6 w7")).toDF("doc_id", "text")
    val ex = Dedup.containmentPairs(df2, "doc_id", "text", n = 3,
      minContainmentQ = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(ex((2L, 1L)) == 1048576L, "excerpt is fully contained")
    assert(ex((1L, 2L)) == 3L * 1048576L / 8L, "parent only partially")
    graft.CacheScope.release()
    // the fixture query: every planted excerpt reports full containment
    // toward exactly its parent
    val fx = SparkEntry.queries("q_containment")(spark, TestSpark.Sf0001).collect()
    val excerptRows = fx.filter(_.getLong(0) >= 1000000L)
    assert(excerptRows.nonEmpty)
    excerptRows.foreach { r =>
      if (r.getLong(1) == r.getLong(0) - 1000000L)
        assert(r.getLong(2) == 1048576L,
          s"excerpt ${r.getLong(0)} not fully contained in its parent")
    }
    assert(excerptRows.exists(r => r.getLong(1) == r.getLong(0) - 1000000L),
      "no excerpt→parent row surfaced")
    graft.CacheScope.release()
  }

  test("hot-shingle DF cap bounds join fan-out without changing cold pairs") {
    // 20 docs all sharing one boilerplate tail (a hot shingle source) plus
    // two planted near-dups that also overlap in their distinctive heads
    val boiler = "all rights reserved by the example corporation of testland"
    val rows = (0 until 20).map { i =>
      val head = if (i < 2) s"unique alpha beta gamma delta epsilon marker$i"
      else s"totally distinct head number$i with words $i${i * 7} x${i * 13}"
      (i.toLong, s"$head $boiler")
    }
    val df = rows.toDF("doc_id", "text")
    // cap at 10: boilerplate shingles (DF=20) drop, head shingles (DF<=2) stay
    val capped = Dedup.jaccardPairs(df, "doc_id", "text", n = 3,
      minJaccard = 0.05, maxShingleDF = 10)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped.contains((0L, 1L)), s"planted pair lost under cap: $capped")
    // boilerplate-only pairs (e.g. 5-6) must be gone once hot shingles drop
    assert(!capped.exists(p => p._1 >= 2L), s"boilerplate-only pair survived: $capped")
    // uncapped finds everything (all docs share the boilerplate shingles)
    val uncapped = Dedup.jaccardPairs(df, "doc_id", "text", n = 3,
      minJaccard = 0.05, maxShingleDF = 0)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(uncapped.size > capped.size)
    // default cap is far above any test-corpus DF: identical to uncapped
    val default = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, minJaccard = 0.05)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(default == uncapped)
  }

  test("CacheScope.release drops operator caches") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")
    Dedup.dedupeNear(df, "doc_id", "text", n = 2, minJaccard = 0.1).count()
    assert(!spark.sharedState.cacheManager.isEmpty, "expected a registered cache")
    CacheScope.release()
    assert(spark.sharedState.cacheManager.isEmpty, "caches must be freed on release")
  }

  test("asofJoin: latest right row at-or-before each left row, atomic payload") {
    import graft.operators.AsofJoin
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 10L, "d"))
      .toDF("k", "ts", "tag")
    // right payload has a null column value at ts=10: the struct carry must
    // keep (10, null) atomic, not mix w=10's x with an earlier non-null y
    val right = Seq((1L, 8L, 100L, Some("y8")), (1L, 10L, 200L, None),
      (3L, 1L, 300L, Some("z")))
      .toDF("k", "ts", "x", "y")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select("k", "ts", "tag", "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getString(4))).toSet
    assert(out == Set(
      (1L, 10L, "a", 200L, null), // equal-ts right row matches, null y kept atomic
      (1L, 20L, "b", 200L, null), // latest at-or-before 20 is ts=10
      (1L, 5L, "c", -1L, null),   // before any right row → null payload
      (2L, 10L, "d", -1L, null))) // key with no right rows at all
  }

  test("deterministic sampling: partition-stable, disjoint-complete split") {
    import graft.operators.Sampling
    val base = docs.select(col("doc_id"), col("text"))
    val s1 = Sampling.sampledBelow(base.repartition(1), col("text"), "4")
      .select("doc_id").as[Long].collect().toSet
    val s8 = Sampling.sampledBelow(base.repartition(8), col("text"), "4")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s8, "sample membership must not depend on partitioning")
    assert(s1.nonEmpty && s1.size < 500, s"~25% of 500 expected, got ${s1.size}")
    val (train, holdout) = Sampling.holdoutSplit(base, col("text"), "4")
    val tr = train.select("doc_id").as[Long].collect().toSet
    val ho = holdout.select("doc_id").as[Long].collect().toSet
    assert((tr & ho).isEmpty && (tr | ho).size == 500)
    assert(ho == s1, "holdout must be exactly the sampled subset")
  }

  test("stratified sampling: per-stratum rates, subset of flat sample, stable") {
    import graft.operators.Sampling
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
    val thr = Map("en" -> "2", "de" -> "8", "es" -> "8", "fr" -> "8", "zh" -> "4")
    val s1 = Sampling.stratifiedBelow(base.repartition(1), col("text"), col("lang"), thr)
      .select("doc_id").as[Long].collect().toSet
    val s8 = Sampling.stratifiedBelow(base.repartition(8), col("text"), col("lang"), thr)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s8, "stratified membership must not depend on partitioning")
    // each stratum's pick is the flat sample at that stratum's threshold
    for ((lang, t) <- thr) {
      val flat = Sampling.sampledBelow(base.filter(col("lang") === lang), col("text"), t)
        .select("doc_id").as[Long].collect().toSet
      val strat = Sampling.stratifiedBelow(base, col("text"), col("lang"), thr)
        .filter(col("lang") === lang).select("doc_id").as[Long].collect().toSet
      assert(strat == flat, s"stratum $lang must equal its flat-threshold sample")
    }
    // a stratum absent from the map is dropped entirely
    val dropped = Sampling.stratifiedBelow(base, col("text"), col("lang"), thr - "en")
      .filter(col("lang") === "en").count()
    assert(dropped == 0L)
  }

  test("toleranceJoin equals the brute-force band join incl. bin boundaries") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(5)
    val tol = 1000000L // 1s in micros
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // timestamps clustered around bin edges (multiples of tol) to hit the
    // exactly-at-tolerance and cross-bin cases
    val ls = (0 until 80).map { i =>
      (i % 3L, i.toLong, ts(rnd.nextInt(20) * tol + rnd.nextInt(3) - 1))
    }
    val rs = (0 until 80).map { i =>
      (i % 3L, 1000L + i, ts(rnd.nextInt(20) * tol + rnd.nextInt(3) - 1))
    }
    val left = ls.toDF("k", "lid", "lts")
    val right = rs.toDF("k", "rid", "rts")
    val got = RangeJoin.toleranceJoin(left, right, Seq("k"), "lts", "rts", tol)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val expected = for {
      (lk, lid, lts) <- ls
      (rk, rid, rts) <- rs
      if lk == rk && math.abs(lts.getTime - rts.getTime) * 1000 <= tol
    } yield (lid, rid)
    // exact multiset equality: binning must neither duplicate nor drop pairs
    assert(got.sorted == expected.sorted,
      s"got ${got.length} pairs, expected ${expected.length}")
  }

  test("quantized q_simsearch ranking equals double-precision brute force") {
    val quant = graft.queries.SimilarityQueries.qSimsearch(spark, TestSpark.Sf0001)
      .select("vec_id").as[Long].collect().toSeq
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 5,
        quantized = false)
      .select("vec_id").as[Long].collect().toSeq
    assert(quant == brute, s"quantized=$quant brute=$brute")
  }

  test("IVF top-k achieves recall vs brute force on its probed cells") {
    val (centroids, assignments) =
      Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    assert(centroids.length == 8)
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", centroids, assignments,
      probeId = 0L, k = 5, nProbe = 4).select("vec_id").as[Long].collect().toSet
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 20,
        quantized = false)
      .select("vec_id").as[Long].collect().toSeq
    // every IVF hit must be a genuinely close vector (top-20 of brute force)
    assert(ivf.size == 5)
    assert(ivf.forall(brute.toSet.contains), s"ivf=$ivf brute20=$brute")
  }

  test("native longDot/longDist2 kernels equal the HOF zip_with+aggregate forms") {
    import org.apache.spark.sql.functions._
    val vq = Similarity.quantize(col("embedding"))
    val shifted = org.apache.spark.sql.functions.transform(vq, x => x + 1L)
    val rows = emb.select(
      graft.plans.VectorExpressions.longDot(vq, shifted).as("fused_dot"),
      aggregate(zip_with(vq, shifted, (x, y) => x * y), lit(0L), (a, x) => a + x).as("hof_dot"),
      graft.plans.VectorExpressions.longDist2(vq, shifted).as("fused_d2"),
      aggregate(zip_with(vq, shifted, (x, y) => (x - y) * (x - y)),
        lit(0L), (a, x) => a + x).as("hof_d2"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"dot mismatch: $r")
      assert(r.getLong(2) == r.getLong(3), s"dist2 mismatch: $r")
    }
  }

  test("quant_err_stats kernel equals the transform+aggregate+array_max HOFs") {
    import org.apache.spark.sql.functions._
    val errs = org.apache.spark.sql.functions.transform(col("embedding"), x => {
      val xd = x.cast("double")
      val q = greatest(lit(-127L), least(lit(127L), floor(xd * 127).cast("long")))
      abs(xd - q.cast("double") / 127.0d)
    })
    val crafted = Seq(
      Array.empty[Float], Array(0f), Array(1f, -1f, 0.5f, -0.5f),
      Array(2.5f, -3.7f, 127f, -127f, 1e-8f),
      Array(0.0078740157f, -0.0078740157f)) // ±1/127 boundaries
      .toDF("embedding")
    Seq(emb.select(col("embedding")), crafted).foreach { df =>
      val rows = df.select(
        graft.plans.VectorExpressions.quantErrStats(col("embedding")).as("st"),
        size(col("embedding")).as("c_n"),
        aggregate(errs, lit(0.0d), (acc, e) => acc + e).as("c_l1"),
        array_max(errs).as("c_max")).collect()
      rows.foreach { r =>
        val st = r.getStruct(0)
        assert(st.getInt(0) == r.getInt(1), s"n_dims: $r")
        assert(st.getDouble(1) == r.getDouble(2), s"l1 bits: $r")
        if (r.isNullAt(3)) assert(st.isNullAt(2), s"max null: $r")
        else assert(st.getDouble(2) == r.getDouble(3), s"max bits: $r")
      }
    }
  }

  test("quantized IVF (oracle twin): recall vs brute force, and run-to-run determinism") {
    val (centroids, assignments) =
      Similarity.ivfIndexQ(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    assert(centroids.length == 8)
    val run1 = Similarity.ivfTopKQ(emb, "vec_id", "embedding", centroids, assignments,
      probeId = 0L, k = 5, nProbe = 4).collect().toSeq
    assert(run1.size == 5)
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 20,
        quantized = false)
      .select("vec_id").as[Long].collect().toSet
    assert(run1.map(_.getLong(0)).forall(brute.contains),
      s"ivfQ=${run1.map(_.getLong(0))} not within brute top-20")
    // bit-identical on a fresh index build (integer math ⇒ no partition-order drift)
    val (c2, a2) = Similarity.ivfIndexQ(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    assert(centroids.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq)
    val run2 = Similarity.ivfTopKQ(emb, "vec_id", "embedding", c2, a2,
      probeId = 0L, k = 5, nProbe = 4).collect().toSeq
    assert(run1 == run2)
  }

  test("sample-trained ivfIndexQ: sample >= corpus is exact full training; bounded sample still assigns all") {
    val n = emb.count().toInt
    val (cFull, aFull) = Similarity.ivfIndexQ(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    // a sample covering the corpus degenerates to the unsampled build bit-for-bit
    val (cSame, aSame) = Similarity.ivfIndexQ(emb, "vec_id", "embedding",
      nCells = 8, iters = 2, trainSample = n + 10)
    assert(cFull.map { case (i, v) => (i, v.toSeq) }.toSeq ==
      cSame.map { case (i, v) => (i, v.toSeq) }.toSeq)
    assert(aFull.orderBy("id").collect().toSeq == aSame.orderBy("id").collect().toSeq)
    CacheScope.release()
    // a genuinely restricted sample still yields 8 centroids and assigns EVERY row
    val (cS, aS) = Similarity.ivfIndexQ(emb, "vec_id", "embedding",
      nCells = 8, iters = 2, trainSample = 64)
    assert(cS.length == 8)
    assert(aS.count() == n)
    // run-to-run determinism of the sampled build
    val (cS2, _) = Similarity.ivfIndexQ(emb, "vec_id", "embedding",
      nCells = 8, iters = 2, trainSample = 64)
    assert(cS.map { case (i, v) => (i, v.toSeq) }.toSeq ==
      cS2.map { case (i, v) => (i, v.toSeq) }.toSeq)
    CacheScope.release()
  }

  test("bruteTopKBatchQ ≡ per-probe cosineTopK (quantized conventions)") {
    val batch = Similarity.bruteTopKBatchQ(emb, "vec_id", "embedding", Seq(0L, 3L), k = 5)
    for (pid <- Seq(0L, 3L)) {
      val b = batch.filter(col("probe_id") === pid).orderBy("rnk")
        .select("vec_id").as[Long].collect().toSeq
      val s = Similarity.cosineTopK(emb, "vec_id", "embedding", pid, 5)
        .select("vec_id").as[Long].collect().toSeq
      assert(b == s, s"probe $pid: batch=$b single=$s")
    }
  }

  test("pqIndexQ: deterministic codebooks, every code references a surviving cell") {
    val (books, codes) = Similarity.pqIndexQ(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2)
    assert(books.length == 8)
    books.foreach { b =>
      assert(b.nonEmpty && b.length <= 16)
      b.foreach { case (_, c) => assert(c.length == 8) } // 64 dims / 8 subspaces
    }
    val codeRows = codes.collect()
    assert(codeRows.length == emb.count())
    val surviving = books.map(_.map(_._1).toSet)
    codeRows.foreach { r =>
      (0 until 8).foreach { j =>
        assert(surviving(j).contains(r.getInt(j + 1)),
          s"code c$j=${r.getInt(j + 1)} not a surviving cell for id=${r.getLong(0)}")
      }
    }
    CacheScope.release()
    // integer math ⇒ bit-identical rebuild
    val (books2, _) = Similarity.pqIndexQ(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2)
    assert(books.map(_.map { case (i, v) => (i, v.toSeq) }.toSeq).toSeq ==
      books2.map(_.map { case (i, v) => (i, v.toSeq) }.toSeq).toSeq)
    CacheScope.release()
  }

  test("pqTopKBatchQ: ADC distances equal code-reconstructed squared L2; recall vs exact > 0") {
    val probes = Seq(0L, 3L)
    val (books, codes) = Similarity.pqIndexQ(emb, "vec_id", "embedding",
      m = 8, ksub = 16, iters = 2)
    val codeMap = codes.collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getInt).toArray).toMap
    val probeVecs = emb.filter(col("vec_id").isInCollection(probes))
      .select(col("vec_id"), Similarity.quantize(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    CacheScope.release()
    val pq = Similarity.pqTopKBatchQ(emb, "vec_id", "embedding", probes, k = 10,
      m = 8, ksub = 16, iters = 2).collect()
    assert(pq.length == probes.length * 10)
    // every returned adist reconstructs exactly from (codebooks, codes, probe)
    pq.foreach { r =>
      val (pid, vid, adist) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val pv = probeVecs(pid)
      val expected = (0 until 8).map { j =>
        val cent = books(j).find(_._1 == codeMap(vid)(j)).get._2
        cent.indices.map { i => val t = cent(i) - pv(j * 8 + i); t * t }.sum
      }.sum
      assert(adist == expected, s"probe=$pid vec=$vid adist=$adist != $expected")
    }
    CacheScope.release()
    // the approximation must retrieve SOME of the exact squared-L2 top-10
    val brute = Similarity.bruteL2TopKBatchQ(emb, "vec_id", "embedding", probes, k = 10)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val hits = pq.count(r => brute.contains((r.getLong(0), r.getLong(2))))
    assert(hits > 0, "PQ top-10 shares nothing with exact top-10")
    CacheScope.release()
  }

  test("argmin_residual ≡ argmin_cell + elementwise subtract (fused kernel pin)") {
    import graft.plans.VectorExpressions
    val (coarse, _) = Similarity.ivfIndexQ(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    CacheScope.release()
    val sorted = coarse.sortBy(_._1)
    val q = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("vq"))
    val rows = q.select(col("vec_id"), col("vq"),
        VectorExpressions.argminResidual(col("vq"), sorted.map(_._1), sorted.map(_._2)).as("ar"),
        VectorExpressions.argminCell(col("vq"), sorted.map(_._1), sorted.map(_._2)).as("cell"))
      .collect()
    val centById = coarse.map { case (i, c) => i -> c }.toMap
    rows.foreach { r =>
      val vq = r.getSeq[Long](1)
      val ar = r.getStruct(2)
      assert(ar.getInt(0) == r.getInt(3), s"cell mismatch for ${r.getLong(0)}")
      val cent = centById(ar.getInt(0))
      val expected = vq.indices.map(i => vq(i) - cent(i))
      assert(ar.getSeq[Long](1) == expected, s"residual mismatch for ${r.getLong(0)}")
    }
  }

  test("ivfPqIndexQ: coarse quantizer equals the IVF build; codes reference surviving cells") {
    val (coarse, books, codes) = Similarity.ivfPqIndexQ(
      emb, "vec_id", "embedding", nCells = 8, m = 8, ksub = 16, iters = 2)
    CacheScope.release()
    val (cIvf, _) = Similarity.ivfIndexQ(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    CacheScope.release()
    // the coarse stage IS ivfIndexQ's Lloyd build (shared lloydTrainQ)
    assert(coarse.map { case (i, v) => (i, v.toSeq) }.toSeq ==
      cIvf.map { case (i, v) => (i, v.toSeq) }.toSeq)
    val coarseIds = coarse.map(_._1).toSet
    val surviving = books.map(_.map(_._1).toSet)
    val rows = codes.collect()
    assert(rows.length == emb.count())
    rows.foreach { r =>
      assert(coarseIds.contains(r.getInt(1)), s"coarse cell invalid: $r")
      (0 until 8).foreach { j =>
        assert(surviving(j).contains(r.getInt(j + 2)), s"code c$j invalid: $r")
      }
    }
  }

  test("ivfPqTopKBatchQ: candidates only from probed cells; adist reconstructs from codes") {
    val probes = Seq(0L, 3L)
    val (coarse, books, codes) = Similarity.ivfPqIndexQ(
      emb, "vec_id", "embedding", nCells = 8, m = 8, ksub = 16, iters = 2)
    val codeRows = codes.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), (2 until 10).map(r.getInt).toArray)).toMap
    val probeVecs = emb.filter(col("vec_id").isInCollection(probes))
      .select(col("vec_id"), Similarity.quantize(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    CacheScope.release()
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map { i => val t = a(i) - b(i); t * t }.sum
    val nProbe = 3
    val probedCells: Map[Long, Seq[Int]] = probes.map { pid =>
      pid -> coarse.map { case (cid, c) => (d2(probeVecs(pid), c), cid) }
        .sortBy(identity).take(nProbe).map(_._2).toSeq
    }.toMap
    val out = Similarity.ivfPqTopKBatchQ(emb, "vec_id", "embedding", probes,
      k = 10, nCells = 8, m = 8, ksub = 16, iters = 2, nProbe = nProbe).collect()
    CacheScope.release()
    val centById = coarse.map { case (i, c) => i -> c }.toMap
    out.foreach { r =>
      val (pid, vid, adist) = (r.getLong(0), r.getLong(2), r.getLong(3))
      val (cell, cs) = codeRows(vid)
      assert(probedCells(pid).contains(cell),
        s"candidate $vid from unprobed cell $cell (probe $pid probes ${probedCells(pid)})")
      // adist = Σ_j ||probe_residual_sub_j − book_j[c_j]||², probe residual vs THAT cell
      val pv = probeVecs(pid); val cent = centById(cell)
      val rp = Array.tabulate(pv.length)(i => pv(i) - cent(i))
      val expected = (0 until 8).map { j =>
        val bc = books(j).find(_._1 == cs(j)).get._2
        bc.indices.map { i => val t = bc(i) - rp(j * 8 + i); t * t }.sum
      }.sum
      assert(adist == expected, s"probe=$pid vec=$vid adist=$adist != $expected")
    }
  }

  test("bruteL2TopKBatchQ ranks by exact integer squared L2 (hand-checked tiny corpus)") {
    val tiny = Seq(
      (0L, Array(0f, 0f)), (1L, Array(1f, 0f)), (2L, Array(0f, 2f)),
      (3L, Array(3f, 3f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteL2TopKBatchQ(tiny, "vec_id", "embedding", Seq(0L), k = 3)
      .orderBy("rnk").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("domainCap: subdomains collapse, quota binds per registrable domain, keep rule deterministic") {
    import graft.operators.Sampling
    val rows = Seq(
      (1L, "https://w0.big.com/p/1", "alpha one"),
      (2L, "https://w1.big.com/p/2", "alpha two"),
      (3L, "https://w2.big.com/p/3", "alpha three"),
      (4L, "https://w0.big.com/p/4", "alpha four"),
      (5L, "https://w0.small.com/p/5", "beta one"),
      (6L, "https://w1.small.com/p/6", "beta two"))
      .toDF("doc_id", "url", "text")
    // host + normalization semantics
    val norm = rows.select(
        Sampling.urlHost(col("url")).as("h"),
        Sampling.registrableDomain(Sampling.urlHost(col("url"))).as("d"))
      .as[(String, String)].collect().toSet
    assert(norm.contains(("w0.big.com", "big.com")) &&
      norm.contains(("w1.small.com", "small.com")))
    // cap 2: big.com keeps exactly 2 (lowest md5(text), tie id), small keeps both
    val kept = Sampling.domainCap(rows, "doc_id", "url", "text", maxPerDomain = 2)
      .select("id", "domain").as[(Long, String)].collect().toSet
    assert(kept.count(_._2 == "big.com") == 2)
    assert(kept.count(_._2 == "small.com") == 2)
    // the keep rule replayed by hand: md5 hex prefix of text, tie doc_id
    val pri = rows.select(col("doc_id"),
        graft.plans.HashExpressions.md5Prefix(col("text"), 15).as("p"))
      .as[(Long, String)].collect().toMap
    val expectBig = Seq(1L, 2L, 3L, 4L).sortBy(id => (pri(id), id)).take(2).toSet
    assert(kept.filter(_._2 == "big.com").map(_._1) == expectBig)
    // determinism across partitionings
    val kept8 = Sampling.domainCap(rows.repartition(8), "doc_id", "url", "text", 2)
      .select("id", "domain").as[(Long, String)].collect().toSet
    assert(kept8 == kept)
  }

  test("registrableDomain: PSL multi-label suffixes keep three labels (r13)") {
    import graft.operators.Sampling
    val hosts = Seq("w3.example.co.uk", "example.co.uk", "co.uk",
      "news.bbc.co.uk", "a.b.site1.com.au", "plain.example.com", "example.com",
      "single-label", "deep.w.co.jp", "notasuffix.zz.uk")
    val out = hosts.toDF("h")
      .select(col("h"), Sampling.registrableDomain(col("h")).as("d"))
      .as[(String, String)].collect().toMap
    assert(out("w3.example.co.uk") == "example.co.uk")
    assert(out("example.co.uk") == "example.co.uk")
    assert(out("co.uk") == "co.uk") // bare suffix maps to itself
    assert(out("news.bbc.co.uk") == "bbc.co.uk")
    assert(out("a.b.site1.com.au") == "site1.com.au")
    assert(out("plain.example.com") == "example.com")
    assert(out("example.com") == "example.com")
    assert(out("single-label") == "single-label")
    assert(out("deep.w.co.jp") == "w.co.jp")
    // zz.uk is not in the bundled table → two-label fallback applies
    assert(out("notasuffix.zz.uk") == "zz.uk")
    // and the explicit two-label fallback rule is unchanged
    val two = Seq("w3.example.co.uk").toDF("h")
      .select(Sampling.registrableDomainTwoLabel(col("h"))).as[String].head()
    assert(two == "co.uk")
  }

  test("registrableDomain: wildcard, exception, private, 3-label PSL rules (r14)") {
    import graft.operators.Sampling
    val hosts = Seq(
      // wildcard *.ck: every child of ck is itself a suffix
      "a.b.site.ck", "b.site.ck", "site.ck",
      // exception !www.ck beats the wildcard
      "www.ck", "sub.www.ck", "deep.sub.www.ck",
      // wildcard *.kawasaki.jp (2-label base) + !city.kawasaki.jp
      "x.y.kawasaki.jp", "y.kawasaki.jp", "kawasaki.jp",
      "city.kawasaki.jp", "ward.city.kawasaki.jp",
      // PRIVATE section 2-label: GitHub Pages is NOT one domain
      "user1.github.io", "www.user1.github.io", "github.io",
      // 3-label normal rules: US locality + blogspot ccTLD variants
      "school.k12.ca.us", "www.school.k12.ca.us",
      "myblog.blogspot.co.uk", "www.myblog.blogspot.co.uk",
      // 3-label wildcard base (PRIVATE AWS): each EC2 host own domain
      "ec2-1-2-3-4.us-east.compute.amazonaws.com",
      // plain amazonaws.com is NOT a suffix in the table → two-label
      "s3.amazonaws.com", "bucket.s3.amazonaws.com")
    val out = hosts.toDF("h")
      .select(col("h"), Sampling.registrableDomain(col("h")).as("d"))
      .as[(String, String)].collect().toMap
    assert(out("a.b.site.ck") == "b.site.ck")   // suffix = site.ck
    assert(out("b.site.ck") == "b.site.ck")
    assert(out("site.ck") == "site.ck")         // bare child suffix → itself
    assert(out("www.ck") == "www.ck")           // exception: registrable
    assert(out("sub.www.ck") == "www.ck")
    assert(out("deep.sub.www.ck") == "www.ck")
    assert(out("x.y.kawasaki.jp") == "x.y.kawasaki.jp") // suffix = y.kawasaki.jp
    assert(out("y.kawasaki.jp") == "y.kawasaki.jp")     // bare suffix → itself
    assert(out("kawasaki.jp") == "kawasaki.jp")
    assert(out("city.kawasaki.jp") == "city.kawasaki.jp") // exception
    assert(out("ward.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(out("user1.github.io") == "user1.github.io")
    assert(out("www.user1.github.io") == "user1.github.io")
    assert(out("github.io") == "github.io")
    assert(out("school.k12.ca.us") == "school.k12.ca.us")
    assert(out("www.school.k12.ca.us") == "school.k12.ca.us")
    assert(out("myblog.blogspot.co.uk") == "myblog.blogspot.co.uk")
    assert(out("www.myblog.blogspot.co.uk") == "myblog.blogspot.co.uk")
    // *.compute.amazonaws.com: the EC2 hostname is its own registrable domain
    assert(out("ec2-1-2-3-4.us-east.compute.amazonaws.com") ==
      "ec2-1-2-3-4.us-east.compute.amazonaws.com")
    // s3.amazonaws.com is a NORMAL rule: bucket.s3.amazonaws.com registrable
    assert(out("s3.amazonaws.com") == "s3.amazonaws.com")
    assert(out("bucket.s3.amazonaws.com") == "bucket.s3.amazonaws.com")
  }

  test("urlVerdict: first-match precedence, every rule class, PSL-backed domain block (r14)") {
    import graft.operators.Sampling
    val rules = Sampling.UrlRules(
      blockedDomains = Seq("bad.com", "www.ck"),
      blockedHostTokens = Seq("ads."),
      blockedPathTokens = Seq("/track/"))
    val cases = Seq(
      "ftp://ok.com/x" -> "scheme",
      "nourl" -> "scheme",                       // no :// → whole string is the scheme
      "https://ok.com:8080/x" -> "port",
      "https://ok.com:443/x" -> "kept",          // allowed explicit port passes on
      "https://sub.bad.com/x" -> "domain",       // registrable domain, not host match
      "https://deep.www.ck/x" -> "domain",       // PSL exception rule feeds the gate
      "https://ads.ok.com/x" -> "host",
      "https://ok.com/a/track/1" -> "path",
      "https://ok.com/p/1" -> "kept",
      // precedence: scheme beats domain beats path
      "ftp://sub.bad.com/track/1" -> "scheme",
      "https://sub.bad.com/track/1" -> "domain")
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), Sampling.urlVerdict(col("u"), rules).as("v"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, want) =>
      assert(out(u) == want, s"$u → ${out(u)}, want $want") }
    // empty blocklists never match
    val none = Seq("https://anything.com/x").toDF("u")
      .select(Sampling.urlVerdict(col("u"), Sampling.UrlRules())).as[String].head()
    assert(none == "kept")
  }

  test("argmin expressions compare structurally (canonicalization, ADVICE r10)") {
    import org.apache.spark.sql.graftbridge.ColumnBridge.expression
    import graft.plans.VectorExpressions
    // share the child Column: a fresh col() captures a distinct call-site
    // Origin, which is exactly what plan canonicalization strips — the pin
    // here isolates the ids/cents fields the ADVICE flagged
    val vq = col("vq")
    def freshLong() = (Array(0, 1), Array(Array(1L, 2L), Array(3L, 4L)))
    val (i1, c1) = freshLong(); val (i2, c2) = freshLong()
    assert(expression(VectorExpressions.argminCell(vq, i1, c1)) ==
      expression(VectorExpressions.argminCell(vq, i2, c2)))
    assert(expression(VectorExpressions.argminCellDist(vq, i1, c1)) ==
      expression(VectorExpressions.argminCellDist(vq, i2, c2)))
    assert(expression(VectorExpressions.argminCellD(vq, Array(0),
        Array(Array(1.5d)))) ==
      expression(VectorExpressions.argminCellD(vq, Array(0),
        Array(Array(1.5d)))))
    // different matrices must NOT compare equal
    assert(expression(VectorExpressions.argminCell(vq, i1, c1)) !=
      expression(VectorExpressions.argminCell(vq, i2,
        Array(Array(1L, 2L), Array(3L, 5L)))))
  }

  test("semanticDedup adaptive defaults resolve to the fixed small-corpus build") {
    // n << 320000 and << 131072 ⇒ adaptive nCells = 16, full training:
    // identical to the explicit legacy parameters
    val adaptive = Similarity.semanticDedup(emb, "vec_id", "embedding")
      .orderBy("id").collect().toSeq
    CacheScope.release()
    val fixed = Similarity.semanticDedup(emb, "vec_id", "embedding",
      nCells = 16, iters = 2, minCosine = 0.3, trainSample = 0)
      .orderBy("id").collect().toSeq
    assert(adaptive == fixed)
    CacheScope.release()
  }

  test("lshNearDupPairs is a subset of brute-force pairs above threshold") {
    val pairs = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
      bits = 8, minCosine = 0.3)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    // spot-check one pair's true cosine
    val (v1, v2) = pairs.head
    val c = emb.as("a").join(emb.as("b"),
        col("a.vec_id") === v1 && col("b.vec_id") === v2)
      .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .as[Double].collect()(0)
    assert(c >= 0.3)
  }

  test("dedupeNear drops the higher-id member of verified near-dup pairs") {
    val base = ("w%d ".format(0) + (1 to 40).map(i => s"w$i").mkString(" "))
    val near = base.replace("w40", "w40x")         // 1 of 41 tokens differs
    val far = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val kept = Dedup.dedupeNear(df, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"kept=$kept")
    CacheScope.release()
    // with exact-dup cliques: the collapse path must drop exact twins (5, 6)
    // AND the near-dup of the clique's representative (2), keep the rest
    val df2 = Seq((1L, base), (2L, near), (3L, far), (5L, base), (6L, base))
      .toDF("doc_id", "text")
    val kept2 = Dedup.dedupeNear(df2, "doc_id", "text", n = 3, minJaccard = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(1L, 3L), s"kept=$kept2")
  }

  test("connectedComponents labels a chain, a triangle, and leaves them disjoint") {
    // components: chain 1-2-3-4 (diameter 3, needs >1 round), triangle 10-11-12,
    // isolated edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("d1", "d2")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L), s"labels=$labels")
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L), s"labels=$labels")
    assert(Seq(20L, 21L).forall(labels(_) == 20L), s"labels=$labels")
    assert(labels.size == 9)
  }

  test("connectedComponents of an empty pair set is empty") {
    val pairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.connectedComponents(pairs).isEmpty)
  }

  test("connectedComponents labels self-pair-only vertices as singletons") {
    // vertex 5 appears ONLY reflexively; vertex 1 appears both reflexively
    // and in a real edge — the (1,1) self-pair must not add a second label
    val pairs = Seq((1L, 2L), (1L, 1L), (5L, 5L)).toDF("d1", "d2")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect()
    assert(labels.toMap == Map(1L -> 1L, 2L -> 1L, 5L -> 5L), s"labels=${labels.toSeq}")
    assert(labels.length == 3, s"duplicate label rows: ${labels.toSeq}")
  }

  test("connectedComponents throws rather than return non-converged labels") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val ex = intercept[IllegalStateException] {
      Dedup.ccStarWithRounds(pairs, maxIter = 0)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("star CC == propagation CC on a seeded random graph (bit-identical labels)") {
    val rnd = new scala.util.Random(41)
    // ~120 edges over 200 ids: mixes singleton edges, trees, and cycles
    val pairs = (0 until 120)
      .map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .toDF("d1", "d2")
    val star = Dedup.ccStarWithRounds(pairs)._1
      .as[(Long, Long)].collect().toMap
    val prop = Dedup.ccPropagateWithRounds(pairs)._1
      .as[(Long, Long)].collect().toMap
    assert(star == prop, s"star/propagation label mismatch")
    CacheScope.release()
  }

  test("star CC converges in O(log d) rounds on a 1000-link chain; propagation cannot") {
    val chain = (0L until 1000L).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, rounds) = Dedup.ccStarWithRounds(chain, maxIter = 30)
    val m = labels.as[(Long, Long)].collect().toMap
    assert(m.size == 1001 && m.values.forall(_ == 0L),
      s"chain must collapse to component 0: ${m.toSeq.sortBy(_._1).take(5)}…")
    assert(rounds <= 15, s"star CC took $rounds rounds on a 1000-chain")
    // the old propagation loop needs O(diameter)=1000 rounds — at its
    // default budget it must NOT have converged (this is why star is now
    // the default implementation)
    val (badLabels, propRounds) = Dedup.ccPropagateWithRounds(chain, maxIter = 20)
    assert(propRounds == 20, s"propagation should exhaust its budget, took $propRounds")
    assert(badLabels.filter(col("cluster") =!= 0L).count() > 0,
      "propagation unexpectedly converged within 20 rounds on a 1000-chain")
    CacheScope.release()
  }

  test("VectorSumAggregator: elementwise group sums, dimension mismatch fails") {
    import org.apache.spark.sql.functions.udaf
    val vsum = udaf(graft.functions.VectorSumAggregator)
    val df = Seq((0, Array(1L, 2L, 3L)), (0, Array(10L, 20L, 30L)),
      (1, Array(5L, 5L, 5L))).toDF("g", "v")
    val got = df.groupBy("g").agg(vsum(col("v")).as("s"))
      .as[(Int, Array[Long])].collect().toMap
    assert(got(0).toSeq == Seq(11L, 22L, 33L) && got(1).toSeq == Seq(5L, 5L, 5L))
    val bad = Seq((0, Array(1L)), (0, Array(1L, 2L))).toDF("g", "v")
      .groupBy("g").agg(vsum(col("v")))
    val e = intercept[Exception] { bad.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimension mismatch")), s"got: ${msgs(e)}")
  }

  test("collapsedClusterLabels == direct clustering on a duplicate-heavy fixture") {
    // adversarial shape: exact-dup cliques (1,2,3 share text a; 4,5 share
    // text b; a~b near-dup), a transitive chain through a clique member,
    // and content-singletons (7 near 6; 9 isolated). The collapsed path
    // must label every doc exactly as clustering the raw pair graph does.
    val w = (1 to 60).map(i => s"w$i")
    val a = w.mkString(" ")
    val b = w.updated(0, "x0").mkString(" ")
    val c = w.updated(0, "x0").updated(59, "x59").mkString(" ")
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val farNear = ((100 to 159).map(i => s"v$i") :+ "z160").mkString(" ")
    val df = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b), (6L, far),
      (7L, farNear), (9L, c)).toDF("doc_id", "text")
    val direct = {
      val pairs = Dedup.verifiedNearDupPairs(df, "doc_id", "text", n = 3, minJaccard = 0.5)
      val labels = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
      // direct path covers only paired docs; extend to all docs as the
      // queries do (cluster = own id when unpaired)
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L).map(i => i -> labels.getOrElse(i, i)).toMap
    }
    CacheScope.release()
    val collapsed = Dedup.collapsedClusterLabels(df, "doc_id", "text", n = 3, minJaccard = 0.5)
      .as[(Long, Long)].collect().toMap
    CacheScope.release()
    assert(collapsed == direct, s"collapsed=$collapsed direct=$direct")
    // and the fixture exercised what it claims: cliques merged across
    // content groups (1..5,9 one cluster), singleton-content pair 6~7
    assert(direct(5L) == 1L && direct(9L) == 1L && direct(7L) == 6L && direct(6L) == 6L)
  }

  test("minhashFromSignatures drops degenerate band buckets above maxBucketSize") {
    // 10 identical docs → every band bucket has 10 members → 45 pairs
    // uncapped; with maxBucketSize=5 every bucket is dropped → 0 candidates
    val txt = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = (1L to 10L).map(i => (i, txt)).toDF("doc_id", "text")
    val sh = Dedup.shingleSets(df, "doc_id", "text", n = 3)
    val sig = Dedup.minhashSignatures(sh)
    assert(Dedup.minhashFromSignatures(sig).count() == 45L)
    CacheScope.release()
    assert(Dedup.minhashFromSignatures(sig, maxBucketSize = 5).count() == 0L)
    CacheScope.release()
    // a mixed corpus: the mega-clique is capped out, the small pair survives
    val w2 = (100 to 140).map(i => s"v$i")
    val mixed = df.union(Seq((20L, w2.mkString(" ")),
      (21L, w2.updated(0, "z").mkString(" "))).toDF("doc_id", "text"))
    val shM = Dedup.shingleSets(mixed, "doc_id", "text", n = 3)
    val capped = Dedup.minhashFromSignatures(Dedup.minhashSignatures(shM), maxBucketSize = 5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    CacheScope.release()
    assert(capped == Set((20L, 21L)), s"capped=$capped")
  }

  test("Robust.winsorize/mad shuffle path (hintBroadcast=false) matches broadcast path") {
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val b = graft.operators.Robust.winsorize(df, Seq("grp"), "v", 0.05, 0.95)
      .select("v", "v_w").as[(Double, Double)].collect().toMap
    val s = graft.operators.Robust
      .winsorize(df, Seq("grp"), "v", 0.05, 0.95, hintBroadcast = false)
      .select("v", "v_w").as[(Double, Double)].collect().toMap
    assert(b == s, s"broadcast=$b shuffle=$s")
    val mb = graft.operators.Robust.mad(df, Seq("grp"), "v").collect().head
    val ms = graft.operators.Robust.mad(df, Seq("grp"), "v", hintBroadcast = false)
      .collect().head
    assert(mb.getDouble(1) == ms.getDouble(1) && mb.getDouble(2) == ms.getDouble(2))
  }

  test("deepenBuckets splits only oversized buckets, loses no rows, bounds membership") {
    // 64 vectors, all sharing the 8-dim sign prefix (one mega-bucket);
    // dims 9-12 carry 16 distinct sign patterns, 4 vectors each
    val vecs = (0 until 64).map { i =>
      val ext = (0 until 4).map(b => if (((i >> b) & 1) == 1) 1f else -1f)
      (i.toLong, (Seq.fill(8)(1f) ++ ext ++ Seq.fill(4)(0.5f)).toArray)
    }.toDF("vec_id", "embedding")
    val b0 = vecs.select(col("vec_id"), col("embedding").as("v"),
      Similarity.signBucket(col("embedding"), 8).as("bucket"))
    val out = Similarity.deepenBuckets(b0, "bucket", maxBucketSize = 8, maxLevels = 3)(
      l => Similarity.signBits(col("v"), 8 + (l - 1) * 4, 8 + l * 4))
    val sizes = out.groupBy("bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    CacheScope.release()
    assert(sizes.map(_._2).sum == 64L, s"rows lost/duplicated: ${sizes.toSeq}")
    assert(sizes.length == 16 && sizes.forall(_._2 == 4L), s"sizes=${sizes.toSeq}")
    assert(sizes.forall(_._1.length == 12), s"keys=${sizes.map(_._1).toSeq}")
    // cap above the density: untouched keys, single count job
    val flat = Similarity.deepenBuckets(b0, "bucket", maxBucketSize = 100)(
      l => Similarity.signBits(col("v"), 8 + (l - 1) * 4, 8 + l * 4))
    assert(flat.select("bucket").distinct().count() == 1L)
    CacheScope.release()
  }

  test("Redact.scrub: class counts, sequential order, exact rewrite") {
    val df = Seq(
      (1L, "mail a@b.co and c.d+x@e-f.org, call +1 555-123-4567, acct 123456789012"),
      (2L, "no pii here, short num 12345678"),
      (3L, "id 999999999 then 555-000-1111")).toDF("doc_id", "text")
    val out = graft.operators.Redact.scrub(df, "text")
      .select("doc_id", "n_emails", "n_phones", "n_ids", "redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // row 1: two emails, one phone (the +1 prefix is not part of the fixed
    // 3-3-4 shape), one 12-digit run
    assert(out(1L) == ((2L, 1L, 1L,
      "mail <EMAIL> and <EMAIL>, call +1 <PHONE>, acct <ID>")), s"got ${out(1L)}")
    // row 2: 8 digits is below the 9+ threshold — untouched
    assert(out(2L) == ((0L, 0L, 0L, "no pii here, short num 12345678")))
    // row 3: the digit-run class must NOT see digits already inside the
    // redacted phone (sequential order), and 999999999 is exactly 9 digits
    assert(out(3L) == ((0L, 1L, 1L, "id <ID> then <PHONE>")), s"got ${out(3L)}")
  }

  test("windowDupStats: cross-doc windows flagged, within-doc repeats are not") {
    val df = Seq(
      (1L, "a b c d e"),               // 2 windows, both shared with doc 2
      (2L, "x a b c d e y"),           // 4 windows, 2 shared with doc 1
      (3L, "p q r s"),                 // 1 window, unique
      (4L, "a b c"),                   // too short — no row
      (5L, "m n o p m n o p m n o")    // 8 windows, repeats only WITHIN doc
    ).toDF("doc_id", "text")
    val out = Dedup.windowDupStats(df, "doc_id", "text", windowWords = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    try {
      assert(out == Map(1L -> ((2L, 2L)), 2L -> ((4L, 2L)),
        3L -> ((1L, 0L)), 5L -> ((8L, 0L))), s"got $out")
    } finally CacheScope.release()
  }

  test("semanticIncrementalStatus: standing mates drop probes; batch-batch only by smaller id") {
    val standing = Seq(
      (100L, Array(1f, 0f)),
      (101L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (0L, Array(0.69f, 0.71f)),  // near 2 and 3 — but both have LARGER ids → admitted
      (1L, Array(0.99f, 0.1f)),   // cos ≈ 0.995 vs standing 100 → near_dup
      (2L, Array(0.7f, 0.7f)),    // no standing mate ≥ 0.9; smaller-id mate 0 ≈ 0.9999 → near_dup
      (3L, Array(0.71f, 0.69f))   // near batch 0 and 2 (both smaller) → near_dup
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticIncrementalStatus(standing, batch,
        "vec_id", "embedding", nCells = 1, iters = 1, minCosine = 0.9)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    try {
      assert(out == Map(0L -> "admitted", 1L -> "near_dup",
        2L -> "near_dup", 3L -> "near_dup"), s"got $out")
    } finally CacheScope.release()
  }

  test("substringRewrite: losing spans cut, first occurrence intact, self-dedup works") {
    val df = Seq(
      (1L, "a b c d e"),          // first occurrence of all its windows
      (2L, "a b c d e"),          // exact dup — loses both windows, all tokens cut
      (3L, "z a b c d w"),        // window (a b c d) at pos 1 loses to doc 1 pos 0
      (4L, "m n o p m n o p"),    // pos-4 window repeats pos 0 WITHIN the doc
      (5L, "a b c"),              // shorter than one window — untouched
      (6L, "p  q   r s t")        // untouched, but spacing normalizes
    ).toDF("doc_id", "text")
    val out = Dedup.substringRewrite(df, "doc_id", "text", windowWords = 4)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    try {
      assert(out(1L) == ((5L, 5L, "a b c d e")))
      assert(out(2L) == ((5L, 0L, null)))            // fully removed
      assert(out(3L) == ((6L, 2L, "z w")))           // span [1,5) cut
      assert(out(4L) == ((8L, 4L, "m n o p")))       // within-doc repeat cut
      assert(out(5L) == ((3L, 3L, "a b c")))
      assert(out(6L) == ((5L, 5L, "p q r s t")))
    } finally CacheScope.release()
  }

  test("substringRewrite: overlapping losing spans union; winner chosen by (id, pos)") {
    // doc 11 holds the two source windows; doc 12 contains both as
    // OVERLAPPING spans — covered indices union, no double-cut
    val df = Seq(
      (11L, "a b c d x p q r s"),          // windows incl (a b c d), (p q r s)... w=4
      (12L, "a b c d p q r s tail1 tail2 tail3")
    ).toDF("doc_id", "text")
    val out = Dedup.substringRewrite(df, "doc_id", "text", windowWords = 4)
      .orderBy("id").collect()
    try {
      val r11 = out(0); val r12 = out(1)
      assert(r11.getLong(2) == 9L && r11.getString(3) == "a b c d x p q r s")
      // doc 12: windows (a b c d)@0 and (p q r s)@4 lose → tokens 0..7 cut
      assert(r12.getLong(1) == 11L && r12.getLong(2) == 3L &&
        r12.getString(3) == "tail1 tail2 tail3", s"got ${r12.mkString(",")}")
    } finally CacheScope.release()
  }

  test("priorityKey: exact integer quotient, weight-monotone") {
    val df = Seq(("k1", 10L), ("k1", 500L), ("k2", 123L), ("k3", 1L))
      .toDF("key", "w")
    val got = df.select(col("key"), col("w"),
        graft.operators.Sampling.priorityKey(col("key"), col("w")).as("skey"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    def manual(key: String, w: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 10)
      ((java.lang.Long.parseLong(hex, 16) + 1L) * 1048576L) / math.max(w, 1L)
    }
    got.foreach { case ((k, w), s) =>
      assert(s == manual(k, w), s"($k,$w): got $s want ${manual(k, w)}") }
    // same key, 50× weight → strictly smaller reciprocal key (higher priority)
    assert(got(("k1", 500L)) < got(("k1", 10L)))
  }

  test("pagerank: bit-exact vs a reference integer loop; star center ranks highest") {
    // star 1-{2,3} (symmetrized) + isolated 4 (exercises dangling mass)
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e0 = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val edges = e0.union(e0.select($"dst".as("src"), $"src".as("dst")))
    val got = graft.operators.LinkAnalysis.pagerank(nodes, edges, "id", iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    try {
      // independent reference loop with the same fixed-point formula
      val n = 4L
      val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L), 3L -> Seq(1L), 4L -> Seq.empty[Long])
      val teleport = 3L * (1L << 40) / 20L / n
      var pr = Map(1L -> (1L << 40) / n, 2L -> (1L << 40) / n,
        3L -> (1L << 40) / n, 4L -> (1L << 40) / n)
      (1 to 3).foreach { _ =>
        val dangShare = pr.collect { case (v, p) if adj(v).isEmpty => p }.sum / n
        val inflow = adj.toSeq.flatMap { case (u, vs) => vs.map(_ -> pr(u) / vs.size) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        pr = adj.keys.map(v =>
          v -> (teleport + 17L * (inflow.getOrElse(v, 0L) + dangShare) / 20L)).toMap
      }
      adj.keys.foreach { v =>
        assert(got(v)._2 == pr(v), s"node $v: got ${got(v)._2} want ${pr(v)}")
      }
      assert(got(1L)._1 == 2L && got(4L)._1 == 0L)
      assert(got(1L)._2 > got(2L)._2, "star center must outrank leaves")
      assert(got(2L)._2 == got(3L)._2, "symmetric leaves must tie exactly")
      assert(got(4L)._2 < got(2L)._2, "isolated node must rank lowest")
    } finally CacheScope.release()
  }

  test("nearDupClusters groups a transitive near-dup chain into one component") {
    // a~b and b~c verify, a~c may not: cluster view must still unite them
    val w = (1 to 60).map(i => s"w$i")
    val a = w.mkString(" ")
    val b = w.updated(0, "x0").mkString(" ")             // differs from a in 1 token
    val c = w.updated(0, "x0").updated(59, "x59").mkString(" ") // differs from b in 1
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c), (9L, far)).toDF("doc_id", "text")
    val labels = Dedup.nearDupClusters(df, "doc_id", "text", n = 3, minJaccard = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(labels.keySet == Set(1L, 2L, 3L), s"labels=$labels")
    assert(labels.values.toSet == Set(1L), s"labels=$labels")
  }

  test("exact_median kernel ≡ reference sort-median on odd/even/single/dup frames") {
    import graft.plans.VectorExpressions.exactMedian
    val frames: Seq[Seq[Double]] = Seq(
      Seq(1.0), Seq(2.0, 1.0), Seq(3.0, 1.0, 2.0),
      Seq(4.0, 4.0, 4.0, 4.0), Seq(-1.5, 2.5), Seq(0.1, 0.2, 0.3, 0.4),
      Seq(5.0, 1.0, 4.0, 2.0, 3.0, 6.0, 7.0, 0.5),
      Seq(1e300, -1e300),            // midpoint of extremes — IEEE exact 0.0
      Seq(0.1, 0.1, 0.1))            // duplicate-heavy
    val rows = frames.map(f => Tuple1(f)).toDF("arr")
      .select(col("arr"), exactMedian(col("arr")).as("m")).collect()
    rows.foreach { r =>
      val f = r.getSeq[Double](0).toArray.sorted
      val want = if (f.length % 2 == 1) f(f.length / 2)
        else (f(f.length / 2 - 1) + f(f.length / 2)) / 2.0
      assert(java.lang.Double.compare(r.getDouble(1), want) === 0,
        s"median of ${f.toSeq}")
    }
    // empty array (an all-null window frame after collect_list's null
    // drop) → NULL, matching SQL median() over zero non-null values
    val e = Seq(Tuple1(Seq.empty[Double])).toDF("arr")
      .select(exactMedian(col("arr"))).head()
    assert(e.isNullAt(0))
  }

  test("LinkAnalysis.triangles ≡ brute force on crafted hub/clique/chain graphs") {
    // K4 on 1-4 (4 triangles), a star hub 10→{11..30} (0 triangles — the
    // case naive wedge counting pays deg² for), a chain 40-41-42-43 (0),
    // one extra triangle 50-51-52, and edges bridging hub↔K4 that close
    // exactly one more: 10-1, 10-2 (plus hub spokes) → triangle (1,2,10)
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val star = (11L to 30L).map(x => (10L, x))
    val chain = Seq((40L, 41L), (41L, 42L), (42L, 43L))
    val extra = Seq((50L, 51L), (50L, 52L), (51L, 52L), (1L, 10L), (2L, 10L))
    val edges = (k4 ++ star ++ chain ++ extra).toDF("a", "b")
    val got = graft.operators.LinkAnalysis.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the same edge set
    val es = (k4 ++ star ++ chain ++ extra).toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val want = (for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if es((i, j)) && es((j, k)) && es((i, k))
    } yield (i, j, k)).toSet
    assert(want.size === 6, s"crafted graph should have 6 triangles, got ${want.size}")
    assert(got === want)
    // every triangle emitted once, in canonical id order
    val rows = graft.operators.LinkAnalysis.triangles(edges).collect()
    assert(rows.length === got.size)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1) && r.getLong(1) < r.getLong(2)))
    // the bloom-reduced path (opt-in) is result-identical: no false
    // negatives, closing join removes false positives
    val gotBloom = graft.operators.LinkAnalysis.triangles(edges, bloomBitsPerKey = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotBloom === want)
  }

  test("argmin_cell kernels ≡ the array_min(struct(dist, cell)) derivation") {
    val rnd = new scala.util.Random(1307)
    val vecs = (0L until 300L).map(i =>
      (i, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))).toSeq
    val df = vecs.toDF("vec_id", "embedding")
    // non-contiguous ids exercise the sorted-id indirection; include exact
    // centroid copies so distance-0 rows and tie candidates exist
    val centIds = Array(0, 3, 4, 9)
    val centsD: Array[Array[Double]] = Array(
      vecs(5)._2.map(_.toDouble), vecs(17)._2.map(_.toDouble),
      Array.fill(16)(0.0), vecs(17)._2.map(_.toDouble)) // cells 3,9 tie for vec 17
    val centsQ: Array[Array[Long]] =
      centsD.map(_.map(x => math.floor(x * 1048576d).toLong))
    val vq = transform(col("embedding"), x => floor(x.cast("double") * 1048576d).cast("long"))

    def treeD = {
      val dists = centIds.zip(centsD).map { case (cid, c) =>
        val cArr = array(c.toIndexedSeq.map(lit): _*)
        struct(aggregate(zip_with(col("embedding"), cArr,
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0d), (acc, x) => acc + x).as("d"), lit(cid).as("cell"))
      }
      array_min(array(dists.toIndexedSeq: _*)).getField("cell")
    }
    def treeQ = {
      val dists = centIds.zip(centsQ).map { case (cid, c) =>
        val cArr = array(c.toIndexedSeq.map(lit): _*)
        struct(graft.plans.VectorExpressions.longDist2(vq, cArr).as("d"),
          lit(cid).as("cell"))
      }
      array_min(array(dists.toIndexedSeq: _*)).getField("cell")
    }
    val rows = df.select(col("vec_id"),
        graft.plans.VectorExpressions.argminCellD(col("embedding"), centIds, centsD).as("kd"),
        treeD.as("td"),
        graft.plans.VectorExpressions.argminCell(vq, centIds, centsQ).as("kq"),
        treeQ.as("tq"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2), s"double argmin mismatch vec ${r.getLong(0)}")
      assert(r.getInt(3) === r.getInt(4), s"long argmin mismatch vec ${r.getLong(0)}")
    }
    // the tie (vec 17 at distance 0 to cells 3 and 9) resolves to the lower id
    val v17 = rows.find(_.getLong(0) == 17L).get
    assert(v17.getInt(1) === 3 && v17.getInt(3) === 3)
  }

  test("quantize_vec kernel ≡ the transform HOF derivation") {
    val rnd = new scala.util.Random(977)
    val df = ((0 until 200).map(i =>
        (i.toLong, Array.fill(16)((rnd.nextDouble() * 4 - 2).toFloat))) ++
      Seq((1000L, Array.empty[Float]),
        (1001L, Array(0f, -0f, 1e-7f, -1e-7f, Float.MinPositiveValue))))
      .toDF("vec_id", "embedding")
    val bad = df.select(
        Similarity.quantize(col("embedding")).as("k"),
        Similarity.quantizeColumnar(col("embedding")).as("h"))
      .filter(col("k") =!= col("h")).count()
    assert(bad === 0L)
    // null vector stays null
    val nr = Seq(Option.empty[Seq[Float]]).toDF("embedding")
      .select(Similarity.quantize(col("embedding"))).collect()(0)
    assert(nr.isNullAt(0))
  }

  test("ivfTopKBatchQ ≡ per-probe ivfTopKQ (same index, same params)") {
    try {
      val probes = Seq(0L, 7L, 23L)
      val batch = Similarity.ivfTopKBatchQ(emb, "vec_id", "embedding",
          probeIds = probes, k = 5, nCells = 16, iters = 2, nProbe = 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1)
      val (cents, assignments) =
        Similarity.ivfIndexQ(emb, "vec_id", "embedding", nCells = 16, iters = 2)
      probes.foreach { pid =>
        val single = Similarity.ivfTopKQ(emb, "vec_id", "embedding",
            cents, assignments, probeId = pid, k = 5, nProbe = 4)
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
        val got = batch(pid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
        assert(got == single.toSeq, s"probe $pid: batch=$got single=${single.toSeq}")
      }
    } finally CacheScope.release()
  }

  test("semanticDedup keeps the member farthest from its centroid (paper rule)") {
    try {
      // two orthogonal families far apart (guaranteed different k-means
      // cells with nCells=2): family A = e1-aligned, family B = e2-aligned;
      // within each family the vectors are near-identical (cosine ≈ 1)
      def vec(axis: Int, eps: Float): Array[Float] = {
        val a = Array.fill(8)(0.001f)
        a(axis) = 1.0f + eps
        a
      }
      // family A: axis-0 grid values 1048576 / 1059061 / 1101004 plus an
      // exact vq-twin (v30) of v10; centroid floor-mean over the four is
      // 1064304 — distances 15728² (v10, v30) / 5243² (v11) / 36700² (v12)
      // ⇒ v12 is farthest and survives; the (10, 30) twin pair is an
      // exact distance tie ⇒ the larger id 30 drops via the tie branch.
      // family B: values 1048576 / 1059061, floor-mean 1053818 — distances
      // 5242² vs 5243² ⇒ v21 is (barely) farther and survives.
      val df = Seq(
        (10L, vec(0, 0f)), (11L, vec(0, 0.01f)), (12L, vec(0, 0.05f)),
        (30L, vec(0, 0f)),
        (20L, vec(1, 0f)), (21L, vec(1, 0.01f))
      ).toDF("vec_id", "embedding")
      val out = Similarity.semanticDedup(df, "vec_id", "embedding",
          nCells = 2, iters = 2, minCosine = 0.95)
        .select("id", "kept").as[(Long, Long)].collect().toMap
      assert(out == Map(10L -> 0L, 11L -> 0L, 12L -> 1L, 30L -> 0L,
        20L -> 0L, 21L -> 1L), s"out=$out")
      // with an impossible threshold nothing drops
      CacheScope.release()
      val none = Similarity.semanticDedup(df, "vec_id", "embedding",
          nCells = 2, iters = 2, minCosine = 1.1)
        .filter(col("kept") === 0L).count()
      assert(none === 0L)
    } finally CacheScope.release()
  }

  test("dsirWeights ranks target-like documents above off-target ones") {
    try {
      // target = docs labelled t; doc 3 shares the target vocabulary, doc 4
      // shares the raw-only vocabulary → w(3) > w(4). Weights are exact
      // integer sums, so the comparison is deterministic.
      val df = Seq(
        (1L, "alpha beta gamma alpha beta", true),
        (2L, "alpha gamma beta beta alpha", true),
        (3L, "alpha beta gamma", false),
        (4L, "xray yankee zulu", false)
      ).toDF("doc_id", "text", "is_t")
      val w = graft.operators.Sampling
        .dsirWeights(df, "doc_id", "text", isTarget = col("is_t"), nBuckets = 64)
        .select("id", "n_tokens", "w_q").as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(w.keySet == Set(1L, 2L, 3L, 4L))
      assert(w(3L)._1 === 3L && w(4L)._1 === 3L) // token counts
      assert(w(3L)._2 > w(4L)._2,
        s"target-vocab doc must outscore raw-only doc: $w")
    } finally CacheScope.release()
  }

  test("priorityDedup: better-priority doc wins regardless of id; ties fall back to id") {
    val df = Seq(
      // exact-dup group: doc 10 (web, p=2) vs doc 20 (curated, p=0) —
      // the HIGHER id wins because its priority is better
      (10L, "alpha beta gamma delta epsilon zeta", 2L),
      (20L, "alpha beta gamma delta epsilon zeta", 0L),
      // near-dup pair (5/7 shingles shared): doc 30 (p=1) loses to doc 40 (p=0)
      (30L, "one two three four five six seven eight nine", 1L),
      (40L, "one two three four five six seven eight ten", 0L),
      // same-priority near-dups: min id 50 wins
      (50L, "red green blue cyan magenta yellow black white", 1L),
      (60L, "red green blue cyan magenta yellow black grey", 1L),
      // no duplicate at all — kept
      (70L, "completely unrelated standalone document text here", 2L)
    ).toDF("doc_id", "text", "prio")
    val kept = Dedup.priorityDedup(df, "doc_id", "text", "prio", n = 3, minJaccard = 0.4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    try assert(kept == Map(10L -> 0L, 20L -> 1L, 30L -> 0L, 40L -> 1L,
      50L -> 1L, 60L -> 0L, 70L -> 1L), s"got $kept")
    finally CacheScope.release()
  }

  test("q_ann_mrr: integer metrics consistent with q_ann_recall's overlap") {
    val mrr = SparkEntry.queries("q_ann_mrr")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val rec = SparkEntry.queries("q_ann_recall")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    try {
      assert(mrr.keySet == rec.keySet)
      mrr.foreach { case (p, (nRel, fr, rrQ, apQ, p5)) =>
        assert(nRel == rec(p), s"probe $p: n_rel vs recall overlap")
        if (nRel == 0) assert(fr == 0 && rrQ == 0 && apQ == 0 && p5 == 0)
        else {
          assert(fr >= 1 && fr <= 10 && rrQ == 1048576L / fr)
          assert(apQ > 0 && apQ <= 1048576L && p5 <= math.min(5L, nRel))
        }
      }
    } finally CacheScope.release()
  }

  test("q_ann_dim_tradeoff: both dims per probe, overlaps bounded, truncation loses signal") {
    val rows = SparkEntry.queries("q_ann_dim_tradeoff")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    try {
      val probes = rows.keys.map(_._1).toSet
      assert(probes == Set(0L, 1L, 2L, 3L, 4L))
      probes.foreach { p =>
        val (n16, o16) = rows((p, 16L)); val (n32, o32) = rows((p, 32L))
        assert(n16 == 10L && n32 == 10L)
        assert(o16 >= 0L && o16 <= 10L && o32 >= 0L && o32 <= 10L)
      }
      // the fixture must show truncation actually costing something
      // somewhere, or the measurement is vacuous
      assert(rows.exists { case ((_, d), (_, o)) => d == 16L && o < 10L },
        s"16-dim overlap was perfect everywhere: $rows")
    } finally CacheScope.release()
  }

  test("q_tree_train: root stump equals the brute exhaustive search; holdout beats majority") {
    val rowsOut = SparkEntry.queries("q_tree_train")(spark, TestSpark.Sf0001).collect()
    val out = rowsOut.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // brute recomputation of the root search from raw text
    def bucket(t: String): Int =
      (((t.length * 1009 + t.head.toInt * 31 + t.last.toInt) % 1000000007) % 64).toInt
    def gate(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      hex.head < 'c'
    }
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    val trainRows = rows.filter(r => gate(r._1)).map { case (_, t) =>
      val toks = t.split(' ').filter(_.nonEmpty)
      val x = new Array[Int](64)
      toks.foreach(tok => x(bucket(tok)) += 1)
      (x, toks.exists(_.startsWith("spark")))
    }
    var best: (Long, Int, Int, Int) = null
    for (b <- 0 until 64; tau <- 1 to 3; polOrd <- 0 to 1) {
      val err = trainRows.count { case (x, pos) =>
        ((x(b) >= tau) == (polOrd == 0)) != pos }.toLong
      val k = (err, b, tau, polOrd)
      if (best == null ||
        Ordering.Tuple4(Ordering.Long, Ordering.Int, Ordering.Int, Ordering.Int).lt(k, best))
        best = k
    }
    try {
      val (rb, rt, rp, re) = out("root")
      assert((rb, rt, rp, re) ==
        ((best._2.toLong, best._3.toLong, if (best._4 == 0) 1L else -1L, best._1)),
        s"root ${out("root")} vs brute $best")
      // accuracy beats the majority baseline on the holdout
      val hold = rows.filterNot(r => gate(r._1))
      val nPos = hold.count(_._2.split(' ').exists(_.startsWith("spark")))
      val majority = math.max(nPos, hold.length - nPos).toLong
      // accuracy columns repeat on every row of the already-collected result
      assert(rowsOut(0).getLong(10) >= majority,
        s"holdout ${rowsOut(0).getLong(10)} below majority $majority")
    } finally CacheScope.release()
  }

  test("q_bootstrap_ci: replicate-0 mean recomputed brutely falls inside [min, max]") {
    val out = SparkEntry.queries("q_bootstrap_ci")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6)))).toMap
    val q20 = docs.select(col("doc_id"), col("lang"),
        floor(graft.queries.TextQueries.qualityCol(graft.plans.TextStatsExpressions
          .textStats(col("text"), graft.functions.TextFunctions.StopwordLists.map(_._2)))
          * 1048576).cast("long").as("q"))
      .as[(Long, String, Long)].collect()
    def mult(id: Long, b: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$b".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(hex, 16)
      if (u < 94) 0L else if (u < 188) 1L else if (u < 235) 2L else if (u < 251) 3L else 4L
    }
    try {
      q20.groupBy(_._2).foreach { case (lang, rows) =>
        val (nDocs, point, mn, mx, nReps) = out(lang)
        assert(nDocs == rows.length && nReps == 32L)
        // exact point estimate
        assert(point == rows.map(_._3).sum / rows.length)
        // replicate 0 is one of the 32 means — must be inside the range
        val num = rows.map(r => mult(r._1, 0) * r._3).sum
        val den = rows.map(r => mult(r._1, 0)).sum
        assert(den > 0, s"$lang: replicate 0 empty")
        val b0 = num / den
        assert(b0 >= mn && b0 <= mx, s"$lang: b0=$b0 outside [$mn,$mx]")
      }
    } finally CacheScope.release()
  }

  test("q_phrase_search counts equal a brute sliding-window scan") {
    val out = SparkEntry.queries("q_phrase_search")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val texts = docs.select("text").as[String].collect()
    val brute = out.keySet.map { p =>
      val ts = p.split(' ').toSeq
      var hits = 0L; var nd = 0L
      texts.foreach { t =>
        val w = t.split(' ').filter(_.nonEmpty).toSeq
        val c = w.indices.count(i => i + ts.length <= w.length &&
          w.slice(i, i + ts.length) == ts)
        if (c > 0) nd += 1
        hits += c
      }
      p -> ((nd, hits))
    }.toMap
    try assert(out == brute, s"got $out want $brute")
    finally CacheScope.release()
  }

  test("q_dedup_keep_best winner has max quality (min-id ties) within its cluster") {
    val labels = Dedup.collapsedClusterLabels(docs, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val q20 = docs.select(col("doc_id"), floor(graft.queries.TextQueries
        .qualityCol(graft.plans.TextStatsExpressions.textStats(col("text"),
          graft.functions.TextFunctions.StopwordLists.map(_._2))) * 1048576)
        .cast("long").as("q"))
      .as[(Long, Long)].collect().toMap
    val out = SparkEntry.queries("q_dedup_keep_best")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    try {
      assert(out.nonEmpty)
      val members = labels.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
      out.foreach { case (cid, nDocs, keptId, keptQ) =>
        val m = members(cid)
        assert(m.size == nDocs, s"cluster $cid size")
        val want = m.map(id => (-q20(id), id))
          .min(Ordering.Tuple2(Ordering.Long, Ordering.Long))
        assert((keptId, keptQ) == ((want._2, -want._1)),
          s"cluster $cid winner: got ($keptId,$keptQ) want $want of $m")
      }
      // at least one cluster must pick a non-min-id winner, or the
      // quality ranking is vacuous on this fixture
      assert(out.exists { case (cid, _, keptId, _) => keptId != cid },
        s"every winner was the min id — quality never decided: ${out.toSeq}")
    } finally CacheScope.release()
  }

  test("q_snapshot_diff statuses partition both versions exactly") {
    val out = SparkEntry.queries("q_snapshot_diff")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ids = docs.select("doc_id").as[Long].collect()
    val v1 = ids.count(_ % 11 != 3).toLong
    val v2 = ids.count(_ % 13 != 5).toLong
    def n(s: String) = out.get(s).map(_._1).getOrElse(0L)
    try {
      assert(n("removed") + n("changed") + n("unchanged") == v1, s"$out v1=$v1")
      assert(n("added") + n("changed") + n("unchanged") == v2, s"$out v2=$v2")
      assert(out("added")._2 == 0L && out("removed")._3 == 0L)
      assert(out("unchanged")._2 == out("unchanged")._3)
      // every revised survivor really differs (the ' rev2' suffix)
      assert(out("changed")._3 == out("changed")._2 + 5L * n("changed"))
    } finally CacheScope.release()
  }

  test("topCells kernel: element 0 is argmin, order is (d, cell), ties keep lower id (r13)") {
    import graft.plans.VectorExpressions
    val vecs = Seq(
      (0L, Array(0f, 0f)), (1L, Array(10f, 0f)), (2L, Array(0f, 10f)),
      (3L, Array(7f, 7f)), (4L, Array(-10f, 0f))).toDF("vec_id", "embedding")
    // centroids: cell 0 = (0,0), 1 = (10s, 0), 2 = (0, 10s), 3 = (−10s, 0)
    // with s = 2^20 — cells 1, 2, 3 are all EQUIDISTANT from the origin
    // probe, so its top-3 list pins the (d, cell) tie order: 0, then 1, 2
    val s = (10L * 1048576L)
    val ids = Array(0, 1, 2, 3)
    val cents = Array(Array(0L, 0L), Array(s, 0L), Array(0L, s), Array(-s, 0L))
    val out = vecs.select(col("vec_id"),
        graft.operators.Similarity.quantize(col("embedding")).as("vq"))
      .select(col("vec_id"),
        VectorExpressions.topCells(col("vq"), ids, cents, 3).as("tc"),
        VectorExpressions.argminCell(col("vq"), ids, cents).as("am"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1).toList, r.getInt(2))))
      .toMap
    val byId = out
    byId.foreach { case (_, (tc, am)) => assert(tc.head == am) }
    // origin: d to cells 1,2,3 all equal → (d, cell) keeps 0,1,2
    assert(byId(0L)._1 == List(0, 1, 2))
    // (7,7): nearest 1 and 2 tie after 0? d(0)=2·49s², d(1)=(3²+7²)s², keep order by distance then id
    assert(byId(3L)._1.head == byId(3L)._2)
    // p larger than nCells clamps
    val clamp = vecs.limit(1).select(VectorExpressions.topCells(
        graft.operators.Similarity.quantize(col("embedding")), ids, cents, 9).as("tc"))
      .head().getSeq[Int](0)
    assert(clamp.length == 4)
  }

  test("knnGraphQ: edges match brute-force within probed cells; k bound holds (r13)") {
    val emb = graft.Tables.t(spark, TestSpark.Sf0001, "embeddings")
    val g = graft.operators.Similarity.knnGraphQ(emb, "vec_id", "embedding",
        k = 3, nCells = 8, iters = 1, nProbe = 8)
      .collect()
    try {
      val bySrc = g.groupBy(_.getLong(0))
      assert(bySrc.values.forall(_.length <= 3))
      // with nProbe = nCells every cell is probed → the graph must equal
      // the BRUTE top-3 (quantized cosine, ties by dst): check one src
      val brute = graft.operators.Similarity.bruteTopKBatchQ(
          emb, "vec_id", "embedding", probeIds = Seq(7L), k = 3)
        .orderBy("rnk").select("vec_id").collect().map(_.getLong(0)).toSeq
      val mine = g.filter(_.getLong(0) == 7L).sortBy(_.getLong(1))
        .map(_.getLong(2)).toSeq
      assert(mine == brute, s"knnGraph $mine vs brute $brute")
      // ranks are 1..n contiguous per src
      bySrc.values.foreach { rows =>
        assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length).toSeq)
      }
    } finally graft.CacheScope.release()
  }

  test("knnGraphQ: nCells default resolves adaptively to knnCellsFor(n) (r14)") {
    val emb = graft.Tables.t(spark, TestSpark.Sf0001, "embeddings")
    val n = emb.count()
    // footer-metadata row count (the action-free path the queries use)
    // agrees with the real count
    assert(graft.Tables.parquetRowCount(spark, TestSpark.Sf0001, "embeddings") == n)
    try {
      // the DEFAULT (nCells = 0 sentinel) must equal the explicit adaptive
      // value — the fixed-32 default was the r13 `weak` (the exact config
      // BASELINE 13b measured unrunnable at 200 k vectors)
      val byDefault = graft.operators.Similarity.knnGraphQ(
          emb, "vec_id", "embedding", k = 3, iters = 1, nProbe = 2, nRows = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val explicit = graft.operators.Similarity.knnGraphQ(
          emb, "vec_id", "embedding", k = 3,
          nCells = graft.operators.Similarity.knnCellsFor(n), iters = 1, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(byDefault == explicit)
      assert(graft.operators.Similarity.knnCellsFor(n) == 32,
        "verification SF must resolve to the oracle's pinned 32 cells")
    } finally graft.CacheScope.release()
  }

  test("q_graph_semdedup: clusters are the transitive closure of strong kNN edges (r13)") {
    val emb = graft.Tables.t(spark, TestSpark.Sf0001, "embeddings")
    try {
      val edges = graft.operators.Similarity.knnGraphQ(emb, "vec_id", "embedding",
          k = 4, nCells = 32, iters = 2, nProbe = 2)
        .filter(floor(col("cosine") * 1048576).cast("long") >= 314573L)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      // brute union-find over the collected edge list
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .groupBy(find).map { case (_, ms) => ms.min -> ms.toSet }
      val got = SparkEntry.queries("q_graph_semdedup")(spark, TestSpark.Sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == want.size)
      got.foreach { case (cid, n, idSum) =>
        assert(want.contains(cid), s"cluster $cid not in brute union-find")
        assert(n == want(cid).size && idSum == want(cid).sum)
      }
    } finally graft.CacheScope.release()
  }

  test("q_margin_mining: margins recompute from the graph; pairs are cross-side (r13)") {
    val emb = graft.Tables.t(spark, TestSpark.Sf0001, "embeddings")
    try {
      val out = SparkEntry.queries("q_margin_mining")(spark, TestSpark.Sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.length == 50)
      // recompute the graph + margin by hand for the mined pairs
      val g = graft.operators.Similarity.knnGraphQ(emb, "vec_id", "embedding",
          k = 4, nCells = 32, iters = 2, nProbe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      val cq = g.map { case (s, d, c) => (s, d) -> math.floor(c * 1048576).toLong }.toMap
      val byNode = g.groupBy(_._1).map { case (n, rows) =>
        n -> (rows.map(r => math.floor(r._3 * 1048576).toLong).sum, rows.length.toLong)
      }
      val side = emb.select(col("vec_id"), (col("label") % 2))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      out.foreach { case (s, d, cosq, mq) =>
        assert(side(s) == 0 && side(d) == 1, s"pair ($s,$d) not cross-side")
        assert(cq((s, d)) == cosq)
        val (sx, nx) = byNode(s); val (sy, ny) = byNode(d)
        val expect = (cosq * 2 * nx * ny * 4096) / (sx * ny + sy * nx)
        assert(mq == expect, s"margin ($s,$d): $mq vs $expect")
      }
      // output is (margin desc, src, dst)-ordered
      assert(out.toSeq == out.toSeq.sortBy { case (s, d, _, m) => (-m, s, d) })
    } finally graft.CacheScope.release()
  }

  test("unigramTrainTable: hand-checkable corpus trains to the obvious vocab (r13)") {
    // corpus: 'abab' ×4, 'ab' ×2, 'cd' ×3 — candidate 'ab' dominates;
    // Viterbi must segment abab as [ab][ab] once costs favor 'ab'
    val docs = Seq.fill(4)("abab").++(Seq.fill(2)("ab")).++(Seq.fill(3)("cd"))
      .toDF("text")
    val out = graft.queries.TextQueries.unigramTrainTable(docs, "text",
      topWords = 16, maxWordLen = 8, pieceMax = 4, topPieces = 8,
      emRounds = 2, outRows = 16)
    val byPiece = out.map { case (p, u, c) => p -> (u, c) }.toMap
    // 'abab' (f=4·1 as substring of type abab) beats… usage: type abab
    // (cnt 4) has candidates; whatever the winner, invariants hold:
    assert(out.nonEmpty)
    // usages are weighted by type counts: total piece usage mass must
    // cover every char of every type at most (singles) and at least
    // (one piece per type) — loose structural bounds
    val totalUsage = out.map(_._2).sum
    assert(totalUsage >= 9L) // ≥ one piece per type occurrence class… 3 types, weighted 4+2+3 = 9
    assert(totalUsage <= 4L * 4 + 2L * 2 + 3L * 2)
    // 'ab' or 'abab' is the top piece (dominant substring mass)
    assert(Set("ab", "abab").contains(out.head._1))
    // costs are positive quantized -log probs and ordering is (cnt desc, piece)
    assert(out.forall(_._3 > 0L))
    assert(out == out.sortBy { case (p, u, _) => (-u, p) })
    // determinism: retraining yields the identical table
    val again = graft.queries.TextQueries.unigramTrainTable(docs, "text",
      topWords = 16, maxWordLen = 8, pieceMax = 4, topPieces = 8,
      emRounds = 2, outRows = 16)
    assert(again == out)
    assert(byPiece.keySet.forall(_.length <= 4))
  }

  test("unigram_encode kernel: DP optimum, smallest-l ties, UNK fallback (r13)") {
    import graft.plans.UnigramExpressions.unigramEncode
    def enc(costs: Seq[(String, Long)], words: String*): Seq[Seq[String]] =
      words.toDF("w").select(unigramEncode(col("w"), costs, 4).as("p"))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
    // 'ab' cheaper than a+b → DP picks [ab][ab]
    val c1 = Seq("a" -> 10L, "b" -> 10L, "ab" -> 5L)
    assert(enc(c1, "abab") == Seq(Seq("ab", "ab")))
    // equal-cost tie (a+b = 20 vs ab = 20): smallest-l backtrack picks singles
    val c2 = Seq("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    assert(enc(c2, "ab") == Seq(Seq("a", "b")))
    // unknown char 'z' prices at UnkCost and still encodes
    assert(enc(c1, "azb") == Seq(Seq("a", "z", "b")))
    // UNK is dear: a 4-char vocab piece beats char-by-char with one unk
    val c3 = Seq("a" -> 10L, "abcd" -> 100L)
    assert(enc(c3, "abcd") == Seq(Seq("abcd")))
    // reconstruction invariant over the real fixture + trained model
    val docs = graft.Tables.t(spark, TestSpark.Sf0001, "documents")
    val costs = graft.queries.TextQueries.unigramTrainModel(docs, "text",
      topWords = 192, maxWordLen = 16, pieceMax = 4, topPieces = 48,
      emRounds = 2).map { case (p, _, c) => (p, c) }
    val bad = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 16)
      .select(col("w"), concat_ws("", unigramEncode(col("w"), costs, 4)).as("joined"))
      .filter(col("w") =!= col("joined"))
      .count()
    assert(bad == 0L, "pieces must concatenate back to every word")
  }

  test("top_k_by_score ≡ rank-filtered window for every k, with score ties (r16)") {
    // deterministic pseudo-random stream with deliberate ties: ~40 groups,
    // ~6 distinct scores so (score, id) tie-breaks are exercised, ids
    // unique per group (the knnGraphQ contract). 7 input partitions so
    // partial buffers MERGE (the sort_array path), not just update.
    val rows = (0 until 4000).map { i =>
      val g = (i * 2654435761L) % 40
      val id = i.toLong
      val score = ((i * 40503L) % 6).toDouble / 4.0 - 0.5
      (g, id, score)
    }
    val df = spark.createDataFrame(rows).toDF("g", "id", "score")
      .repartition(7)
    for (k <- Seq(1, 3, 8)) {
      val viaAgg = df.groupBy("g")
        .agg(graft.plans.TopKExpressions
          .topKByScore(col("score"), col("id"), k).as("tk"))
        .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("g"), (col("pos") + 1).cast("long").as("rnk"),
          col("e.id").as("id"), col("e.score").as("score"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("score").desc, col("id").asc)
      val viaWindow = df
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(viaAgg == viaWindow, s"k=$k: agg and window top-k disagree")
    }
    // empty-group edge: a group whose rows are all filtered never appears,
    // and k > group size yields exactly the group, ranked contiguously
    val tiny = Seq((1L, 10L, 0.5), (1L, 11L, 0.5), (2L, 20L, -1.0))
      .toDF("g", "id", "score")
    val out = tiny.groupBy("g")
      .agg(graft.plans.TopKExpressions
        .topKByScore(col("score"), col("id"), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getStruct(2).getLong(0)))
      .toSet
    assert(out == Set((1L, 0, 10L), (1L, 1, 11L), (2L, 0, 20L)))
  }

  test("top_k_by_long_asc ≡ rank-filtered window (dist asc) with ties (r16)") {
    // integer-distance twin: ~40 groups, ~7 distinct dists for heavy
    // ties, 7 partitions so partial buffers MERGE
    val rows = (0 until 4000).map { i =>
      val g = (i * 2654435761L) % 40
      (g, i.toLong, ((i * 48271L) % 7) * 1000L)
    }
    val df = spark.createDataFrame(rows).toDF("g", "id", "dist")
      .repartition(7)
    for (k <- Seq(1, 4, 8)) {
      val viaAgg = df.groupBy("g")
        .agg(graft.plans.TopKExpressions
          .topKByLongAsc(col("dist"), col("id"), k).as("tk"))
        .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("g"), (col("pos") + 1).cast("long").as("rnk"),
          col("e.id").as("id"), col("e.dist").as("dist"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("dist").asc, col("id").asc)
      val viaWindow = df
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(1), r.getLong(2)))
        .toSet
      assert(viaAgg == viaWindow, s"k=$k: agg and window top-k disagree")
    }
  }

  test("q_tok_fertility: BPE-per-word ≥ 1, exact quantized ratios of the sums") {
    val rows = SparkEntry.queries("q_tok_fertility")(spark, TestSpark.Sf0001)
      .collect()
    try {
      assert(rows.length == 5)
      rows.foreach { r =>
        val (ws, bpe, ch, fq, cq) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
        assert(bpe >= ws, s"${r.getString(0)}: a word is ≥1 BPE token")
        assert(fq == math.floor(bpe.toDouble / ws.toDouble * 1048576).toLong)
        assert(cq == math.floor(ch.toDouble / bpe.toDouble * 1048576).toLong)
      }
    } finally CacheScope.release()
  }
}

