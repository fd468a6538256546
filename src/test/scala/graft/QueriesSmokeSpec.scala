package graft

/** Every SparkEntry query runs at sf0.001 and returns rows with the
  * expected columns; entry() (the driver's t1 smoke) returns rows > 0.
  * Hash-level correctness is the driver's DuckDB compare (locally:
  * tools/local_verify.py after runMain graft.Verify).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, TestSpark.Sf0001)
      assert(df.columns.nonEmpty)
      val n = df.count()
      // near-dup pair queries may legitimately be sparse, but must not error
      if (name != "q_embed_neardup" && name != "q_jaccard_pairs" && name != "q_minhash_lsh")
        assert(n > 0, s"$name returned no rows")
      else assert(n >= 0)
    }
  }

  test("q_quality_trim: BOTH trim arms fire on the fixture (r10 VERDICT item 5)") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.FastxQueries.qQualityTrim(spark, TestSpark.Sf0001)
    val arms = df.agg(
      sum(when(col("trim_start") > 0L, 1L).otherwise(0L)),
      sum(when(col("kept_len") + col("trim_start") < col("raw_len"), 1L).otherwise(0L)),
      count(lit(1))).head()
    assert(arms.getLong(0) > 0, "no read had a leading trim")
    assert(arms.getLong(1) > 0, "no read had a trailing trim")
    assert(arms.getLong(0) <= arms.getLong(2))
  }

  test("q_embed_decontam: the drop arm actually fires on the fixture") {
    import org.apache.spark.sql.functions._
    val r = graft.queries.SimilarityQueries.qEmbedDecontam(spark, TestSpark.Sf0001)
      .agg(sum(col("n_dropped")), sum(col("n_total"))).head()
    assert(r.getLong(0) > 0, "no corpus vector was close to any eval vector — threshold too strict for the fixture")
    assert(r.getLong(0) < r.getLong(1), "every corpus vector dropped — threshold vacuously low")
  }

  test("q_bpe_train: merges satisfy the training invariant and compose with apply") {
    val rows = graft.queries.TextQueries.qBpeTrain(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 12)
    // every merge's parts are single chars or outputs of strictly earlier
    // merges — the invariant that makes sequential in-order application
    // equivalent to greedy lowest-rank BPE apply (BpeMerges scaladoc)
    val produced = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      val (lhs, rhs) = (r.getString(1), r.getString(2))
      assert(lhs.length == 1 || produced(lhs), s"lhs '$lhs' not derivable at step ${r.getLong(0)}")
      assert(rhs.length == 1 || produced(rhs), s"rhs '$rhs' not derivable at step ${r.getLong(0)}")
      produced += lhs + rhs
    }
    assert(rows.forall(_.getLong(3) > 0))
    // pair counts are non-increasing is NOT an invariant (a merge can
    // create a new hot pair), but step order must be 1..12
    assert(rows.map(_.getLong(0)).toSeq == (1L to 12L))
  }

  test("bpeTrainMerges stops gracefully when pair statistics exhaust") {
    val ss = TestSpark.spark
    import ss.implicits._
    // all single-char word types: no adjacent pairs at all
    val singles = Seq((1L, "a b c"), (2L, "a c")).toDF("doc_id", "text")
    assert(graft.queries.TextQueries.bpeTrainMerges(singles, "text", 10, 5).isEmpty)
    // one two-char type: exactly one learnable merge, then exhaustion
    val one = Seq((1L, "ab a b")).toDF("doc_id", "text")
    val m = graft.queries.TextQueries.bpeTrainMerges(one, "text", 10, 5)
    assert(m.map { case (step, a, b, _) => (step, a, b) } == Seq((1, "a", "b")))
  }

  test("q_cms_merge: CMS estimates are overestimates and the top user is exact-heaviest") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.EventQueries.qCmsMerge(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 10)
    // CMS property: collisions only ADD counts, so est ≥ exact always
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"CMS underestimated user ${r.getLong(0)}: est=${r.getLong(1)} exact=${r.getLong(2)}")
    }
    // the true heaviest user must surface at rank 1 (its estimate can only
    // have grown; no other user's estimate outranks it unless a collision
    // lifted a lighter key — tolerated only as est ties)
    val trueTop = graft.Tables.t(spark, TestSpark.Sf0001, "events")
      .groupBy("user_id").count().orderBy(col("count").desc, col("user_id"))
      .head()
    assert(rows.map(_.getLong(0)).contains(trueTop.getLong(0)),
      s"true heaviest user ${trueTop.getLong(0)} missing from CMS top-10")
  }

  test("session_window boundary: exact-gap row MERGES, gap+1min breaks") {
    import org.apache.spark.sql.functions._
    val ss = spark
    import ss.implicits._
    def ts(min: Long) = new java.sql.Timestamp((400000 + min) * 60000L)
    // t=30 is exactly prev + gap — session intervals are CLOSED at the
    // end, so it merges (matches the lag sessionizer's strict-> break);
    // t=75 is 45 min after the (extended) last event — breaks
    val df = Seq((1L, ts(0)), (1L, ts(30)), (1L, ts(75))).toDF("user_id", "ts")
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("sw.start").cast("long").as("start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sessions == Set((ts(0).getTime / 1000, 2L), (ts(75).getTime / 1000, 1L)),
      s"unexpected sessions: $sessions")
  }

  test("q_approx_percentile: sketch within 5% relative value error of exact") {
    val rows = SparkEntry.queries("q_approx_percentile")(spark, TestSpark.Sf0001).collect()
    rows.foreach { r =>
      for ((e, a) <- Seq("exact_p50" -> "approx_p50", "exact_p90" -> "approx_p90")) {
        val exact = r.getAs[Double](e)
        val approx = r.getAs[Double](a)
        assert(math.abs(approx - exact) / exact <= 0.05, s"$a=$approx $e=$exact")
      }
    }
  }

  test("q_approx_distinct: HLL within its 2% relative-error bound (5x slack)") {
    val rows = SparkEntry.queries("q_approx_distinct")(spark, TestSpark.Sf0001).collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"approx=$approx exact=$exact")
    }
  }

  test("q_hll_merge: merged daily sketches estimate weekly distincts within 5%") {
    val rows = SparkEntry.queries("q_hll_merge")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(est - exact) / exact <= 0.05,
        s"week ${r.getAs[Long]("week")}: est=$est exact=$exact")
    }
  }

  test("q_stats_moments: power-sum stddev matches built-in stddev_samp") {
    import org.apache.spark.sql.functions._
    val builtin = Tables.t(spark, TestSpark.Sf0001, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(stddev_samp(col("l_quantity")).as("b"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val ours = SparkEntry.queries("q_stats_moments")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("std_q"))
    assert(ours.nonEmpty)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) <= 1e-9 * math.max(1.0, v),
        s"$k: power-sum $v vs built-in ${builtin(k)}")
    }
  }

  test("q_chunk_dedup: docs with every chunk kept rebuild to the original text") {
    import org.apache.spark.sql.functions._
    val orig = Tables.t(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q_chunk_dedup")(spark, TestSpark.Sf0001).collect()
    val full = rows.filter(r => r.getAs[Long]("n_kept") == r.getAs[Long]("n_chunks"))
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getAs[String]("kept_md5") == orig(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}: rebuilt text differs from original")
    }
  }

  test("q_dataset_card: card facets are internally consistent (r15)") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_dataset_card")(spark, TestSpark.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nUniq, dupQ) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nUniq >= 1L && nUniq <= nDocs)
      assert(dupQ == (nDocs - nUniq) * 1048576L / nDocs)
      assert(r.getLong(5) <= r.getLong(6), "token mass cannot exceed char mass")
      assert(r.getLong(7) <= r.getLong(8), "p50 must not exceed p90")
    }
    // the card's volume facets must total to the corpus it describes
    val corpus = Tables.t(spark, TestSpark.Sf0001, "documents")
    assert(rows.map(_.getLong(2)).sum == corpus.count())
    val charMass = corpus.select(sum(length(col("text")))).head().getLong(0)
    assert(rows.map(_.getLong(6)).sum == charMass)
  }

  test("q_resample: grid is dense per user; fill echoes actual on active days") {
    val rows = SparkEntry.queries("q_resample")(spark, TestSpark.Sf0001).collect()
    rows.filter(_.getAs[Long]("cnt") > 0).foreach { r =>
      assert(r.getAs[Double]("filled_value") == r.getAs[Double]("day_value"))
    }
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val days = rs.map(_.getAs[String]("day")).sorted
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head),
        java.time.LocalDate.parse(days.last)) + 1
      assert(rs.length.toLong == span, s"user $u: ${rs.length} rows over $span days")
    }
  }
}
