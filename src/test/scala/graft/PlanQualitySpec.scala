package graft

/** Plan-shape regression gates: these assert the physical-plan properties
  * that matter at 100 TB — filters and projections reaching the parquet
  * scan, tiny dimensions broadcast (no fact-table shuffle), two-phase
  * aggregation (map-side combine), and narrow per-row pipelines staying in
  * one codegen span. A query that silently loses one of these still passes
  * correctness; this spec is what fails.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSpark.Sf0001).queryExecution.executedPlan.toString

  test("q_scan_project_filter: predicate and projection pushed to parquet") {
    val p = plan("q_scan_project_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_shipdate"),
      s"projection not pruned:\n$p")
  }

  test("q_join_star: dimension joins broadcast, no fact-table shuffle join") {
    val p = plan("q_join_star")
    assert(p.split("BroadcastHashJoin").length >= 3, s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join:\n$p")
  }

  test("q_agg_q1: two-phase hash aggregation (map-side partial)") {
    val p = plan("q_agg_q1")
    assert(p.split("HashAggregate").length >= 3, s"expected partial+final agg:\n$p")
  }

  test("q_seq_stats: narrow per-row pipeline — only the output sort exchanges") {
    val p = plan("q_seq_stats")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"per-row stats should not shuffle except for the sort:\n$p")
    assert(p.contains("PushedFilters"), s"scan missing:\n$p")
  }

  test("q_pii_redact: row-local redaction — only the output sort exchanges") {
    val p = plan("q_pii_redact")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"redaction must be a pure map stage before the sort:\n$p")
    // the native byte-scanner kernel, not the 6-pass java.util.regex chain
    assert(p.contains("pii_redact"), s"native redaction kernel missing:\n$p")
    assert(!p.contains("regexp_extract_all"),
      s"regex reference impl leaked into the production plan:\n$p")
  }

  test("q_semi_anti: semi/anti joins are broadcast at this scale") {
    val p = plan("q_semi_anti")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), s"join types missing:\n$p")
  }

  test("q_kmer_explode: one narrow-side exchange, kernel+explode above it") {
    val p = plan("q_kmer_explode")
    // ONE exchange: the range repartition of the narrow (doc_id, text)
    // side. The window_counts_total kernel, the explode, and the local
    // (doc_id, gram) sort all run ABOVE it, so range sampling never
    // re-evaluates the kernel and the total needs no interpreted HOF.
    val exchanges = p.split("Exchange ").length - 1
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$p")
    assert(p.contains("window_counts_total"), s"native counts expr missing:\n$p")
    assert(!p.contains("aggregate("), s"interpreted total fold survived:\n$p")
    assert(p.indexOf("window_counts_total") < p.indexOf("Exchange range"),
      s"kernel must sit above the exchange (sampling double-eval):\n$p")
  }

  test("q_kmer_map: shuffle-free count map — only the output sort exchanges") {
    val p = plan("q_kmer_map")
    val exchanges = p.split("Exchange ").length - 1
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$p")
    // r9: count + sort + encode fused into the single kmer_enc kernel —
    // no CodegenFallback HOFs (aggregate/transform) left in the plan
    assert(p.contains("kmer_enc"), s"native kmer_enc kernel missing:\n$p")
    assert(!p.contains("aggregate(") && !p.contains("transform("),
      s"interpreted HOF survived the kernel fusion:\n$p")
    // projection ABOVE the sort: range sampling must not run the kernel
    assert(p.indexOf("kmer_enc") < p.indexOf("Sort "),
      s"kernel below the sort re-evaluates it during sampling:\n$p")
  }

  test("q_curation_pipeline: filters fused into the scan, no cartesian join") {
    val p = plan("q_curation_pipeline")
    // the quality+lang gate must run AT the parquet scan (fused DataFilters),
    // not in a separate post-shuffle stage
    assert(p.contains("DataFilters: [isnotnull(text"), s"scan filter fusion lost:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in pipeline:\n$p")
    assert(p.split("BroadcastHashJoin").length >= 3,
      s"dedup winner/verify joins should broadcast at this scale:\n$p")
  }

  test("q_embed_neardup_rh: bucket equi-join, not an all-pairs cross join") {
    val p = plan("q_embed_neardup_rh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in LSH query:\n$p")
  }

  test("q_semdedup: within-cell equi-join, never all-pairs") {
    val p = plan("q_semdedup")
    try {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join in semantic dedup:\n$p")
      // the self-joined member table reads the one cached build
      assert(p.split("InMemoryTableScan").length - 1 >= 2,
        s"member cache not reused by both join sides:\n$p")
    } finally CacheScope.release()
  }

  test("q_semdedup_incremental: probe-side-only cell equi-join, never all-pairs") {
    val p = plan("q_semdedup_incremental")
    try {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join in incremental semantic dedup:\n$p")
      // probe-side-only: the pairing join's probe relation is the CACHED
      // batch side (read again by the status join) — the standing corpus
      // must never self-join (it appears exactly once under the pair join)
      assert(p.split("InMemoryTableScan").length - 1 >= 2,
        s"batch cache not reused as probe side + status join:\n$p")
      // the md5 admission gate is row-local on the id
      assert(p.contains("md5_prefix"), s"row-local gate missing:\n$p")
    } finally CacheScope.release()
  }

  test("q_ann_batch: probe routing broadcasts, per-probe top-k is the bounded heap aggregate") {
    val p = plan("q_ann_batch")
    assert(p.contains("BroadcastHashJoin"),
      s"(probe, cell) routing table must broadcast:\n$p")
    // r16: the bounded top-k aggregate replaces the rank-filtered window
    // — k pairs of state per probe, no sort of the candidate stream
    assert(p.contains("top_k_by_score"),
      s"per-probe top-k must be the bounded heap aggregate:\n$p")
    assert(!p.contains("WindowGroupLimit"),
      s"candidate stream must not be window-sorted:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in batch ANN:\n$p")
  }

  test("q_dsir: bucket model broadcasts back onto per-doc counts") {
    val p = plan("q_dsir")
    try {
      assert(p.contains("BroadcastHashJoin"),
        s"log-ratio table (≤ nBuckets rows) must broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"cartesian in dsir:\n$p")
      assert(p.contains("partial_"), s"per-doc aggregation must be two-phase:\n$p")
    } finally CacheScope.release()
  }

  test("q_dsir_bigram: row-local n-gram features — broadcast model, two-phase, no window shuffle") {
    val p = plan("q_dsir_bigram")
    try {
      assert(p.contains("all_shingles"),
        s"bigrams must come from the row-local kernel, not a window lead:\n$p")
      assert(!p.contains("Window"), s"a window shuffle leaked into the feature stream:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"log-ratio table (<= nBuckets rows) must broadcast:\n$p")
      assert(p.contains("partial_"), s"per-doc aggregation must be two-phase:\n$p")
    } finally CacheScope.release()
  }

  test("q_bpe_train: histogram is two-phase + bounded TakeOrdered, never a global sort") {
    // the distributed part of training: the word-type count feeding the
    // driver-side merge loop must be map-side-combined and top-k'd, not
    // globally sorted (the corpus is scanned exactly once). Asserts on
    // the REAL query's histogram stage (the shared builder), not a
    // hand-copied replica (review r11).
    val docs = Tables.t(spark, TestSpark.Sf0001, "documents")
    val hist = graft.queries.TextQueries.bpeWordHistogram(docs, "text", 256)
    val p = hist.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k must be distributed:\n$p")
    assert(p.contains("partial_"), s"histogram must be two-phase:\n$p")
  }

  test("q_embed_clusters: the pair-generation stage is a bucket equi-join, no all-pairs") {
    // the CC star rounds run behind localCheckpoint during construction,
    // so the FINAL plan cannot witness them (review r11) — gate the pair
    // build, the stage where an all-pairs regression is possible; the CC
    // rounds' join shapes are pinned by OperatorsSpec's star≡propagation
    // equivalence on the same operator
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry.queries("q_embed_neardup")(spark, TestSpark.Sf0001)
      .select(col("v1").as("d1"), col("v2").as("d2"))
    try {
      val p = pairs.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join in embedding pair generation:\n$p")
      assert(p.contains("InMemoryTableScan") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"),
        s"expected a keyed bucket join:\n$p")
    } finally CacheScope.release()
  }

  test("q_jaccard_pairs: inverted-index self-join is hash, not sort-merge (r11)") {
    val p = plan("q_jaccard_pairs")
    try {
      assert(p.contains("ShuffledHashJoin"),
        s"the index self-join must hash-probe, not sort (1000x sort spilled both ~0.9B-row sides):\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join in jaccard:\n$p")
    } finally CacheScope.release()
  }

  test("q_range_join: binned equi-join, never a nested-loop band join") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"band predicate fell back to a nested loop:\n$p")
  }

  test("ivf seeding: distributed top-k, no single-partition window or global sort") {
    val emb = Tables.t(spark, TestSpark.Sf0001, "embeddings")
    val p = operators.Similarity.seedRows(emb, "vec_id", "embedding", 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k seeding plan:\n$p")
    assert(!p.contains("Window"), s"seeding must not use a global window:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"single-partition exchange:\n$p")
  }

  test("q_tfidf: corpus scanned once — df branch reuses the cached tf aggregate") {
    val p = plan("q_tfidf")
    try {
      // both the tf consumer and the df branch must read the cached tf
      // aggregate (each InMemoryTableScan also PRINTS the cache-build plan,
      // so counting FileScan occurrences would overcount — count cache reads)
      assert(p.split("InMemoryTableScan").length - 1 >= 2,
        s"tf cache not reused by both branches:\n$p")
      assert(p.contains("WindowGroupLimit"), s"top-k not pushed before the shuffle:\n$p")
    } finally CacheScope.release()
  }

  test("sampling queries: single scan, membership folded into the aggregate") {
    for (q <- Seq("q_sample_deterministic", "q_sample_stratified")) {
      val p = plan(q)
      assert(p.split("FileScan parquet").length - 1 == 1, s"$q scans more than once:\n$p")
      assert(!p.contains("Join"), s"$q should not join:\n$p")
      val exchanges = p.split("Exchange").length - 1
      assert(exchanges <= 2, s"$q: expected agg + sort exchanges only:\n$p")
    }
  }

  test("q_corr_subquery: decorrelated to aggregate + join, nothing per-row") {
    val p = plan("q_corr_subquery")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"decorrelation failed:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"expected two-phase aggregate for the per-nation average:\n$p")
  }

  test("q_pivot/q_unpivot: no values-discovery scan; narrow expand") {
    val pv = plan("q_pivot")
    assert(pv.split("FileScan parquet").length - 1 == 1,
      s"pivot should scan once (explicit values):\n$pv")
    val up = plan("q_unpivot")
    assert(up.split("Exchange").length - 1 <= 1,
      s"unpivot should only exchange for the output sort:\n$up")
  }

  test("q_partition_prune: month filter prunes partitions at metadata time") {
    val p = plan("q_partition_prune")
    assert(p.contains("PartitionFilters: [ship_month") &&
      p.contains("IN (1995-03,1995-04,1995-05"),
      s"partition filter not applied at the scan:\n$p")
    // the predicate must NOT degrade to a post-scan data filter
    assert(!p.contains("PushedFilters: [In(ship_month"),
      s"partition predicate pushed as a data filter instead:\n$p")
  }

  test("q_orc_roundtrip: ORC read-back prunes to the matching partition dir") {
    val p = plan("q_orc_roundtrip")
    assert(p.contains("PartitionFilters: ") && p.contains("l_returnflag"),
      s"partition filter not applied at the ORC scan:\n$p")
    // the flag predicate must prune directories, not filter rows post-scan
    assert(!p.contains("PushedFilters: [IsNotNull(l_returnflag"),
      s"partition predicate degraded to a data filter:\n$p")
  }

  test("q_cms_merge: sketch broadcasts into the estimate join, aggs are two-phase") {
    val p = plan("q_cms_merge")
    assert(p.contains("BroadcastHashJoin"),
      s"merged sketch (d×w rows) should broadcast, not shuffle the key side:\n$p")
    assert(p.split("HashAggregate").length - 1 >= 4,
      s"expected partial+final aggregate pairs:\n$p")
  }

  test("q_window_stats: six window functions share one Window operator") {
    val p = plan("q_window_stats")
    assert(p.split("Window ").length - 1 <= 2, // Window + WindowGroupLimit-free sort
      s"same-spec window functions not collapsed:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2, s"expected partition + output-sort exchanges only:\n$p")
  }

  test("q_stats_moments: two-phase aggregate of long partials, single scan") {
    val p = plan("q_stats_moments")
    assert(p.split("FileScan parquet").length - 1 == 1, s"moments scan once:\n$p")
    assert(p.split("HashAggregate").length >= 3, s"expected map-side partials:\n$p")
  }

  test("q_window_ranks: three rank functions share one Window operator") {
    val p = plan("q_window_ranks")
    assert(p.split("Window ").length - 1 <= 1,
      s"same-spec rank functions not collapsed:\n$p")
  }

  test("q_resample: daily aggregate cached (events scanned once), equi-join grid") {
    val p = plan("q_resample")
    assert(p.split("InMemoryTableScan").length - 1 >= 2,
      s"daily aggregate not reused via cache:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"grid join must be an equi-join:\n$p")
  }

  test("q_regex_array: row-local arrays — only the output sort exchanges") {
    val p = plan("q_regex_array")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"regex/array pipeline should not shuffle:\n$p")
  }

  test("q_chunk_dedup: equi-joins only; rebuild is an aggregation, not a global sort") {
    val p = plan("q_chunk_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chunk dedup must stay on equi-joins:\n$p")
    // one Window (first-occurrence) + the output sort — the rebuild must be
    // a hash aggregate on doc_id, not a second windowed sort
    assert(p.split("Window ").length - 1 == 1, s"expected one window:\n$p")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"),
      s"rebuild should aggregate:\n$p")
  }

  test("q_bucketed_join: bucket-aligned scans feed the join — no join-side exchange") {
    val p = plan("q_bucketed_join")
    assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
    assert(p.split("Bucketed: true").length - 1 == 2,
      s"both scans must read bucket-aligned:\n$p")
    // agg + output sort only: the join-side exchanges are elided by bucketing
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2, s"bucketed join should not shuffle its inputs:\n$p")
  }

  test("q_feature_hash: doc-local histogram kernel — no aggregation at all") {
    val p = plan("q_feature_hash")
    assert(p.split("FileScan parquet").length - 1 == 1, s"one corpus scan:\n$p")
    // r9: per-(doc, bucket) counts are doc-local, so the feature_hist
    // kernel replaced explode+two-phase agg entirely; the only exchange
    // is the narrow-side range repartition below the kernel
    assert(p.contains("feature_hist"), s"histogram kernel missing:\n$p")
    assert(!p.contains("HashAggregate"), s"agg should be fused into the kernel:\n$p")
    assert(p.split("Exchange").length - 1 == 1, s"one narrow exchange only:\n$p")
  }

  test("q_quality_classify: row-local inference — one map pass, only the funnel agg exchanges") {
    val p = plan("q_quality_classify")
    // feature extraction + scoring must be the native kernels in one map
    // stage (no token explode, no vocabulary join)
    assert(p.contains("feature_hist") && p.contains("long_dot"),
      s"native inference kernels missing:\n$p")
    assert(!p.contains("Generate"), s"inference must not explode tokens:\n$p")
    assert(!p.toLowerCase.contains("join"), s"model must ride in the plan, not a join:\n$p")
    // exchanges: the two-phase funnel aggregate + the 5-row output sort
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2, s"expected agg+sort exchanges only:\n$p")
    assert(p.split("HashAggregate").length >= 3, s"funnel agg must be two-phase:\n$p")
  }

  test("q_edit_distance: candidates only — no cartesian, texts join on ids") {
    val p = plan("q_edit_distance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit distance must run on LSH candidates, not all pairs:\n$p")
  }

  test("q_winsorize: percentile bounds broadcast back — fact table never shuffles for the join") {
    val p = plan("q_winsorize")
    assert(p.contains("BroadcastHashJoin"), s"bounds must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact side shuffled for a tiny bounds join:\n$p")
  }

  test("q_retention/q_funnel: per-user joins are hash-based — no cartesian/nested-loop") {
    // The join strategy is deliberately AQE's choice: broadcast at test
    // scale, shuffle-hash once the per-user tables outgrow the broadcast
    // limit. The gate only forbids plans that are wrong at ANY scale.
    for (q <- Seq("q_retention", "q_funnel")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: per-user join degenerated to a non-equi plan:\n$p")
      assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
        || p.contains("SortMergeJoin"),
        s"$q: expected an equi hash/merge join:\n$p")
    }
  }

  test("q_anomaly_mad: med/mad stats broadcast back — fact never shuffles for the join") {
    val p = plan("q_anomaly_mad")
    assert(p.contains("BroadcastHashJoin"), s"stats must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"fact shuffled for a |groups|-row stats join:\n$p")
  }

  test("q_temperature_sample: rate table broadcasts — corpus never shuffles for the gate") {
    val p = plan("q_temperature_sample")
    assert(p.contains("BroadcastHashJoin"), s"rates must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled for a |sources|-row rate join:\n$p")
  }

  test("q_transition: one lead window, two-phase aggregation") {
    val p = plan("q_transition")
    assert(p.split("Window ").length - 1 == 1, s"expected one window:\n$p")
    assert(p.split("HashAggregate").length >= 3, s"expected map-side partials:\n$p")
  }

  test("q_histogram: two-phase aggregate, single scan") {
    val p = plan("q_histogram")
    assert(p.split("FileScan parquet").length - 1 == 1, s"histogram scans once:\n$p")
    assert(p.split("HashAggregate").length >= 3, s"expected map-side partials:\n$p")
  }

  test("q_decontaminate: benchmark n-gram set broadcasts; corpus never shuffles on the n-gram") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus shuffled on the n-gram key — broadcast lost:\n$p")
  }

  test("q_repetition: native per-doc stats kernel — no aggregation exchange at all") {
    val p = plan("q_repetition")
    // the token_rep_stats kernel collapsed explode + two 2-phase aggs
    // into a row-local projection: the only remaining operators are the
    // scan, the kernel projection, the filter, and the output sort
    assert(p.contains("token_rep_stats"), s"native kernel missing:\n$p")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"no aggregation should remain:\n$p")
    assert(!p.contains("Generate"), s"token explode should be gone:\n$p")
  }

  test("q_variant_extract: single parse_json feeds every path via CSE") {
    val p = plan("q_variant_extract")
    // the project stage must evaluate parse_json once (common subexpression
    // elimination), not once per variant_get path
    val parses = p.split("parse_json").length - 1
    assert(parses <= 2, s"parse_json evaluated per path:\n$p")
  }

  test("q_bigram_score: model join reuses the cached shingle set (one corpus scan)") {
    val p = plan("q_bigram_score")
    assert(p.split("InMemoryTableScan").length - 1 >= 2,
      s"shingle set not reused from cache:\n$p")
    CacheScope.release()
  }

  test("q_full_outer: both sides reduced before the outer join") {
    val p = plan("q_full_outer")
    assert(p.contains("FullOuter"), s"full outer join missing:\n$p")
    // pre-aggregation must sit under the join: 2 two-phase aggs (≥4) before it
    assert(p.split("HashAggregate").length >= 5,
      s"sides not pre-aggregated before the join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("q_embed_centroids: vector explode two-phase; tiny norm joins broadcast") {
    val p = plan("q_embed_centroids")
    assert(p.contains("BroadcastHashJoin"), s"norm joins not broadcast:\n$p")
    assert(p.split("InMemoryTableScan").length - 1 >= 2,
      s"centroid table not reused from cache:\n$p")
    CacheScope.release()
  }

  test("q_pack_sequences: packing window partitions by shard, never a global sort") {
    val p = plan("q_pack_sequences")
    assert(p.contains("hashpartitioning(shard"),
      s"running-offset window not sharded:\n$p")
    assert(!p.contains("SinglePartition"), s"single-partition stage in packing:\n$p")
  }

  test("q_session_window: sessionization is an aggregate, not a window sort") {
    val p = plan("q_session_window")
    assert(!p.contains("Window "), s"unexpected window operator:\n$p")
    assert(p.contains("session_window") || p.contains("UpdatingSessions"),
      s"session aggregate missing:\n$p")
  }

  test("q_changelog_compact: rank-1 filter becomes a map-side WindowGroupLimit") {
    val p = plan("q_changelog_compact")
    assert(p.contains("WindowGroupLimit"),
      s"latest-row filter not pushed to a group limit:\n$p")
  }

  test("q_chunk_dedup: first-occurrence filter is a map-side WindowGroupLimit") {
    // dedup input is duplicate-heavy by definition: a 10^6-duplicate hot
    // chunk must be cut to 1 row per partition BEFORE the chunk shuffle,
    // not piled into one window partition and ranked there
    val p = plan("q_chunk_dedup")
    assert(p.contains("WindowGroupLimit"),
      s"rank-1 first-occurrence filter not pushed to a group limit:\n$p")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the 100 TB feature: a selective dim-side predicate on a NON-broadcast
    // join injects a bloom filter into the fact scan, so most fact rows die
    // at the scan instead of crossing the shuffle. Thresholds are tuned for
    // test-scale data; at cluster scale the defaults (10M creation / 10G
    // application) trigger on real selective joins.
    import org.apache.spark.sql.functions._
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.t(spark, TestSpark.Sf0001, "lineitem")
      val sel = Tables.t(spark, TestSpark.Sf0001, "orders")
        .filter(col("o_totalprice") > 400000d)
      val j = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("zorder key is bijective on the 16-bit grid (no key collisions)") {
    import org.apache.spark.sql.functions._
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(23)
    val pairs = (0 until 2000).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)).distinct
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.queries.LayoutQueries.zorderKey(col("a"), col("b")).as("z"))
    val n = df.select("z").distinct().count()
    assert(n == pairs.size, s"zorder collision: $n distinct keys for ${pairs.size} pairs")
    // interleave of 16-bit inputs stays within 32 bits
    val mx = df.agg(max("z")).head.getLong(0)
    assert(mx < (1L << 32), s"zkey exceeded 32 bits: $mx")
  }

  test("fastx scan: column pruning reaches the reader") {
    val df = spark.read.format("fastx").load(FastxFixtures.path("tiny.fasta"))
      .select("header")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cols=header"), s"fastx pruning missing:\n$p")
  }

  test("q_bm25: tf/df/dl branches reuse one cached tf aggregate; top-k bounded") {
    val p = plan("q_bm25")
    try {
      // tf consumer + df branch + dl branch + corpus stats all read the
      // cached tf aggregate (counting cache reads, not FileScans — see the
      // q_tfidf gate note)
      assert(p.split("InMemoryTableScan").length - 1 >= 3,
        s"tf cache not reused across branches:\n$p")
      assert(p.contains("WindowGroupLimit"), s"top-k not pushed before the shuffle:\n$p")
      assert(p.contains("BroadcastExchange"), s"corpus stats not broadcast:\n$p")
    } finally CacheScope.release()
  }

  test("q_incremental_dedup: candidate join is equi-keyed, no cartesian") {
    val p = plan("q_incremental_dedup")
    try {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"unexpected non-equi join in the admission plan:\n$p")
    } finally CacheScope.release()
  }

  test("q_weighted_sample: top-k plans as TakeOrderedAndProject, no global sort") {
    val p = plan("q_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), s"top-k not heap-based:\n$p")
    assert(!p.contains("Exchange rangepartitioning") ||
      p.indexOf("Exchange rangepartitioning") > p.indexOf("TakeOrderedAndProject"),
      s"corpus globally sorted before the top-k:\n$p")
  }

  test("q_doc_chunk: row-local generate — only the output sort exchanges") {
    val p = plan("q_doc_chunk")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"chunking should not shuffle except for the sort:\n$p")
    assert(p.contains("Generate"), s"posexplode missing:\n$p")
  }

  test("q_subword_vocab: row-local gram enumeration, two-phase count, bounded top-k") {
    val p = plan("q_subword_vocab")
    // gram enumeration is the native per-doc map kernel (one row per
    // DISTINCT gram per doc), not the nested occurrence-explode
    assert(p.contains("subword_gram_counts"), s"native gram kernel missing:\n$p")
    assert(p.contains("Generate"), s"map explode missing:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-32 should be bounded, not a global sort:\n$p")
    assert(!p.contains("Join"), s"enumeration must not join:\n$p")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"gram count should partial-aggregate map-side:\n$p")
  }

  test("q_k_anonymity: one fact aggregation; ladder derives from the cached class table") {
    val p = plan("q_k_anonymity")
    try {
      assert(p.split("InMemoryTableScan").length - 1 >= 2,
        s"generalization levels must reuse the cached class table, not re-scan customer:\n$p")
      assert(!p.contains("Join"), s"ladder is union-of-aggregates, no join:\n$p")
    } finally CacheScope.release()
  }

  test("q_image_embed/q_audio_embed: codec map partition-local after the id fan-out") {
    for (q <- Seq("q_image_embed", "q_audio_embed")) {
      val p = plan(q)
      val exchanges = p.split("Exchange").length - 1
      // exactly two exchanges: the deliberate 8-byte-id fan-out BEFORE the
      // codec stage (parallelism must not be capped by the narrow id scan)
      // and the output sort; the encode→decode map itself never shuffles
      assert(exchanges <= 2, s"$q: unexpected extra shuffle:\n$p")
      assert(p.contains("RoundRobinPartitioning"), s"$q: codec fan-out missing:\n$p")
      assert(p.contains("Generate"), s"$q: posexplode missing:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: unexpected join:\n$p")
    }
  }

  test("q_substring_dup: window join is equi-keyed on the content hash") {
    val p = plan("q_substring_dup")
    try {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"unexpected non-equi join:\n$p")
      assert(p.contains("InMemoryTableScan"), s"window instances not cached:\n$p")
    } finally CacheScope.release()
  }

  test("q_vocab_oov: scoring pass is row-local — no explode, no token shuffle") {
    // the vocab build runs as its own bounded job at query-construction
    // time; the MEASURED plan (scoring) must mark OOV via the array
    // literal, never re-exploding tokens into a join
    val p = plan("q_vocab_oov")
    assert(!p.contains("Generate"), s"scoring pass must not explode tokens:\n$p")
    assert(!p.contains("Join"), s"scoring pass must not join token instances:\n$p")
    assert(p.contains("oov_stats"), s"native OOV kernel missing:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2, s"expected only the lang agg + sort exchanges:\n$p")
  }

  test("token-family plans run the native split_tokens kernel, not ArrayFilter") {
    Seq("q_lateral", "q_text_tokens").foreach { q =>
      val p = plan(q)
      assert(p.contains("split_tokens"), s"$q missing the tokenizer kernel:\n$p")
      assert(!p.contains("array_filter") && !p.contains("ArrayFilter"),
        s"$q fell back to the interpreted columnar tokenizer:\n$p")
    }
  }

  test("q_quality_gates: one scan, row-local gates, only the lang agg exchanges") {
    val p = plan("q_quality_gates")
    assert(!p.contains("Generate") && !p.contains("Join"),
      s"gates must stay row-local:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2, s"expected only the lang agg + sort exchanges:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"expected two-phase (partial+final) lang aggregation:\n$p")
  }

  test("q_scd2: all three window passes share one user_id exchange") {
    val p = plan("q_scd2")
    // change-detect lag, version row_number and interval lead all partition
    // by user_id — Catalyst must plan ONE hashpartitioning exchange plus
    // the final rangepartitioning sort, nothing else
    val hashEx = p.split("Exchange hashpartitioning").length - 1
    assert(hashEx == 1, s"expected one user_id exchange feeding stacked windows:\n$p")
  }

  test("q_compaction_plan: metadata-sized planning — window after one source shuffle") {
    val p = plan("q_compaction_plan")
    assert(p.contains("Window"), s"offset-packing window missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"planner must not cross-join:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"file-inventory agg must be two-phase:\n$p")
  }

  test("q_mixture_plan: single corpus scan, totals windowed over the tiny aggregate") {
    val p = plan("q_mixture_plan")
    assert(p.split("FileScan parquet").length - 1 == 1,
      s"corpus must be scanned exactly once:\n$p")
    assert(p.contains("Window"), s"totals window missing:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"per-source token agg must be two-phase:\n$p")
    // token budget is the native span kernel, inside codegen — not the
    // HOF fold (interpreted per word) and not a UDF
    assert(p.contains("bpe_token_count"), s"native BPE kernel missing:\n$p")
    assert(!p.contains("ScalaUDF") && !p.contains("aggregate(split"),
      s"token budget must be the native expression:\n$p")
  }

  test("q_bloom_prune: bloom prefilter reaches the probe scan before its exchange") {
    val p = plan("q_bloom_prune")
    assert(p.contains("might_contain"), s"bloom probe filter missing:\n$p")
    assert(p.contains("LeftSemi"), s"exact semi-join missing:\n$p")
    // the prefilter must sit directly on the probe scan (same stage): the
    // next operator below the might_contain filter is the lineitem
    // FileScan, with no exchange in between
    val tail = p.substring(p.indexOf("might_contain"))
    val scanAt = tail.indexOf("FileScan parquet")
    val exAt = tail.indexOf("Exchange")
    assert(scanAt >= 0 && (exAt < 0 || scanAt < exAt),
      s"bloom filter must be in the probe scan stage, before its exchange:\n$p")
  }

  test("q_revcomp: row-local revcomp — only the output sort exchanges") {
    val p = plan("q_revcomp")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"revcomp must be a pure map stage before the sort:\n$p")
    assert(p.contains("translate") && p.contains("reverse"),
      s"built-in translate/reverse pipeline missing:\n$p")
  }

  test("q_trajectory: one shuffle, per-group local sort (no global event sort)") {
    val p = plan("q_trajectory")
    val hashEx = p.split("Exchange hashpartitioning").length - 1
    assert(hashEx == 1, s"expected exactly one user_id exchange:\n$p")
    // the ONLY Sort is the output orderBy — per-group ordering happens via
    // sort_array inside the agg's result projection, never a global sort
    // of the event table (sort_array itself isn't printed: result
    // expressions don't appear in SparkPlan.toString)
    assert(p.split("Sort \\[").length - 1 == 1,
      s"events must not be globally sorted:\n$p")
    assert(p.split("ObjectHashAggregate").length - 1 == 2,
      s"expected two-phase collect_list agg:\n$p")
  }

  test("q_entity_match: deletion-variant blocking stays equi-keyed, DL verify in codegen") {
    val p = plan("q_entity_match")
    // name-vs-name comparison must stay behind the equi-keyed variant join;
    // the absolute df cap needs no corpus-count side input (the removed
    // relative trigram cap carried a 1-row broadcast nested-loop join)
    assert(!p.contains("CartesianProduct"),
      s"blocking must never compare all pairs:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"no nested-loop join anywhere in the match plan:\n$p")
    // variant generation is a row-local Generate (explode over the
    // deletion-variant array expression), never a join or UDF
    assert(p.contains("Generate explode"), s"variant explode missing:\n$p")
    assert(p.contains("damerau_levenshtein"), s"native DL expr missing:\n$p")
    // the DL verify filter must sit inside a codegen span, not a UDF
    assert(!p.contains("ScalaUDF"), s"DL must be the native expression:\n$p")
    // default at this SF: the bloom prune is data-size GATED off (the
    // eager build serializes the cascade, a measured net loss below
    // ~100 k canonical rows — OPTIMIZATION_r16 §3)
    assert(!p.contains("might_contain"),
      s"bloom prune must stay gated off below the canon-row threshold:\n$p")
    CacheScope.release()
  }

  test("q_entity_match: forced bloom gate prunes the canonical variant stream (r16)") {
    // r16: above the canon-row threshold (forced here via the conf
    // override) the canonical variant stream (~20-90× the canonical
    // table) is bloom-pruned against the probe residue's variant hashes
    // BEFORE its df-aggregate and the MERGE joins (guide §3.2; measured:
    // stage 2 keeps 4.6% of 1.59 M canonical variant rows at sf0.1)
    spark.conf.set("graft.entityBloomMinCanonRows", "0")
    try {
      val p = plan("q_entity_match")
      assert(p.contains("might_contain"),
        s"canonical variants must be bloom-pruned before the exchange:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"prune must not change the join shapes:\n$p")
    } finally {
      spark.conf.unset("graft.entityBloomMinCanonRows")
      CacheScope.release()
    }
  }

  test("q_audit_constraints: anti-join integrity checks equi-keyed, denominators broadcast") {
    val p = plan("q_audit_constraints")
    assert(p.contains("LeftAnti"), s"FK/referential checks must be anti-joins:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"audit must not cross-join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"3-row count table must broadcast:\n$p")
  }

  test("source-pagerank edge build: window self-join stays equi-keyed on the hash") {
    // the query itself materializes eagerly behind localCheckpoint, so gate
    // the edge-build join shape directly
    import org.apache.spark.sql.functions._
    val wins = Tables.t(spark, TestSpark.Sf0001, "documents")
      .select(col("source"),
        explode(graft.plans.WindowHashExpressions.windowHashes(
          col("text"), 16)).as("wh"))
      .distinct()
    val p = wins.as("a").join(wins.as("b"),
        col("a.wh") === col("b.wh") && col("a.source") < col("b.source"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edge build must join on the window hash:\n$p")
  }

  test("q_source_cap: rank filter becomes a map-side WindowGroupLimit") {
    val p = plan("q_source_cap")
    assert(p.contains("WindowGroupLimit"),
      s"per-source cap not pushed before the shuffle:\n$p")
  }

  test("q_shard_shuffle: head fingerprint rank bounded by WindowGroupLimit") {
    val p = plan("q_shard_shuffle")
    assert(p.contains("WindowGroupLimit"),
      s"head-K rank not pushed before the shuffle:\n$p")
    // the only join is the final 32-row totals-heads equi-join
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
  }

  test("q_bpe_encode: merge table constant-folded into a row-local encode, no join") {
    val p = plan("q_bpe_encode")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"BPE apply must not join against a merge table:\n$p")
    // the 16 merges ride the plan as literal replace() chains inside the
    // scan-side Generate — visible pre-shuffle, not after any Exchange
    val preShuffle = p.substring(p.indexOf("Exchange"))
    assert(preShuffle.contains("replace("), s"encode not row-local before the shuffle:\n$p")
    // scan prunes to the two used columns
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"projection not pruned:\n$p")
  }

  test("q_minhash_est: exact-intersection subtree is candidate-keyed (no shingle self-join)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, LessThan}
    // The only pair-enumerating (id < id) join in this query is the LSH
    // band join, which lives inside the cached candidate set; the outer
    // plan must contain NO id<id join — an uncapped co-shingle self-join
    // (the pre-r9 shape, quadratic in shingle DF) would reintroduce one.
    val df = SparkEntry.queries("q_minhash_est")(spark, TestSpark.Sf0001)
    val selfJoins = df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.exists {
        case LessThan(a: AttributeReference, b: AttributeReference) =>
          a.name == "id" && b.name == "id"
        case _ => false
      }) => j
    }
    assert(selfJoins.isEmpty,
      s"pair-enumerating id<id join outside the candidate set:\n${selfJoins.mkString("\n")}")
    graft.CacheScope.release()
  }

  test("q_translate: kernel in codegen, narrow pipeline — only the sort exchanges") {
    val p = plan("q_translate")
    assert(p.contains("dna_translate"), s"translate kernel not in plan:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), s"UDF fallback leaked in:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"row-local translate should not shuffle except the sort:\n$p")
  }

  test("q_phred_stats: phred kernel in codegen, no per-char explode") {
    val p = plan("q_phred_stats")
    assert(p.contains("phred_stats"), s"phred kernel not in plan:\n$p")
    assert(!p.contains("Generate"), s"per-char explode crept in:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"row-local stats should not shuffle except the sort:\n$p")
  }

  test("q_orf_scan: kernel in codegen, no explode, only the sort exchanges") {
    val p = plan("q_orf_scan")
    assert(p.contains("orf_scan"), s"orf kernel not in plan:\n$p")
    assert(!p.contains("Generate"), s"codon explode crept in:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"row-local scan should not shuffle except the sort:\n$p")
  }

  test("q_cpg_ratio: built-in composition, row-local, ≤1 exchange") {
    val p = plan("q_cpg_ratio")
    assert(p.contains("ascii_char_count"), s"char-count kernel not in plan:\n$p")
    assert(p.split("Exchange").length - 1 <= 1, s"row-local stats shuffled:\n$p")
  }

  test("q_dust_score: fused dust kernel, row-local, ≤1 exchange") {
    val p = plan("q_dust_score")
    assert(p.contains("window_dust_stats"), s"fused kernel not in plan:\n$p")
    assert(!p.contains("Generate"), s"count-map explode crept back:\n$p")
    assert(p.split("Exchange").length - 1 <= 1, s"row-local stats shuffled:\n$p")
  }

  test("q_homopolymer: kernel in codegen, no per-char explode, ≤1 exchange") {
    val p = plan("q_homopolymer")
    assert(p.contains("homopolymer"), s"kernel not in plan:\n$p")
    assert(!p.contains("Generate"), s"per-char explode crept in:\n$p")
    assert(p.split("Exchange").length - 1 <= 1, s"row-local scan shuffled:\n$p")
  }

  test("q_n50: one lang window exchange feeding both cum and total") {
    val p = plan("q_n50")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    // windows + final small joins; the big table is exchanged on lang once
    val exchanges =
      p.split(java.util.regex.Pattern.quote("hashpartitioning(lang")).length - 1
    assert(exchanges >= 1, s"expected lang partitioning:\n$p")
  }

  test("q_rolling_median: one user_id exchange, kernel in codegen") {
    val p = plan("q_rolling_median")
    assert(p.contains("exact_median"), s"median kernel not in plan:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 1, s"window + sort should share the user_id exchange... or at most add the sort's:\n$p")
  }

  test("q_skew_join: salt in the join key, shuffle join (salt load-bearing)") {
    val p = plan("q_skew_join")
    assert(p.contains("__salt"), s"salt not in the executed join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"dim broadcast — the salt is dead weight:\n$p")
  }

  test("q_cooccur_lift: row-local pair generation — no doc-keyed self-join") {
    val p = plan("q_cooccur_lift")
    // pairs must come from nested Generates over the bounded intersection
    // array, not a doc_id self-join of the token explosion
    assert(p.split("Generate").length - 1 >= 2, s"expected nested explodes:\n$p")
    assert(!p.contains("SortMergeJoin"), s"doc-keyed self-join crept in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    graft.CacheScope.release()
  }

  test("q_ann_pq: ADC tables broadcast, per-probe top-k group-limited, codes never shuffle") {
    val p = plan("q_ann_pq")
    try {
      // the probe-table cross IS the PQ serving contract (compressed
      // exhaustive scan) — but it must be the BROADCAST of the bounded
      // driver-built tables, never a shuffle of the code table
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"probe ADC tables must broadcast:\n$p")
      // r16: per-probe top-k is the bounded heap aggregate — no sort of
      // the scanned code table
      assert(p.contains("top_k_by_long_asc"),
        s"per-probe top-k must be the bounded heap aggregate:\n$p")
      assert(!p.contains("WindowGroupLimit"),
        s"code-table stream must not be window-sorted:\n$p")
      assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
      // (the recall-comparison join of the two k·|probes|-row top-k sets
      // may plan SMJ pre-AQE — both sides are output-sized, so no gate)
    } finally CacheScope.release()
  }

  test("q_ann_ivfpq: probed cells via broadcast equi-join — corpus never fully scanned per probe") {
    val p = plan("q_ann_ivfpq")
    try {
      // IVFADC contract: candidates come from an EQUI-join on the cell id
      // (broadcast of the bounded (probe, cell, tables) rows), so the scan
      // is restricted to probed cells — no cross of codes × probes
      assert(p.contains("BroadcastHashJoin"),
        s"(probe, cell) ADC routing must broadcast-equi-join:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"IVFADC must not cross-join the code table:\n$p")
      assert(p.contains("top_k_by_long_asc"),
        s"per-probe top-k must be the bounded heap aggregate (r16):\n$p")
      assert(!p.contains("WindowGroupLimit"),
        s"candidate stream must not be window-sorted:\n$p")
    } finally CacheScope.release()
  }

  test("q_image_neardup: banded bucket equi-join over the cached hash table, never all-pairs") {
    val p = plan("q_image_neardup")
    try {
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join in image near-dup:\n$p")
      // both sides of the band self-join read the one cached banded table
      assert(p.split("InMemoryTableScan").length - 1 >= 2,
        s"banded hash cache not reused by both join sides:\n$p")
    } finally CacheScope.release()
  }

  test("q_domain_cap: quota rank group-limited map-side; per-domain tables join small") {
    val p = plan("q_domain_cap")
    // the kept branch filters rank <= k, so the mega-domain skew case
    // ships at most k rows per map task into the domain exchange
    assert(p.contains("WindowGroupLimit"),
      s"per-domain quota must run map-side k-heaps:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel join degenerated:\n$p")
  }

  test("q_pair_mining: IVF routing broadcasts, top-k group-limited, no all-pairs stage") {
    val p = plan("q_pair_mining")
    try {
      assert(p.contains("BroadcastHashJoin"),
        s"(probe, cell) routing must broadcast:\n$p")
      assert(p.contains("WindowGroupLimit"),
        s"neighbor top-k must run map-side:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"all-pairs stage in pair mining:\n$p")
    } finally CacheScope.release()
  }

  test("q_audio_vad: row-local segmentation — no aggregate, codec fan-out + sort only") {
    val p = plan("q_audio_vad")
    // the whole VAD (quantize, clip total, island bounds) must stay in
    // the per-row projection: any HashAggregate/Window means the 16-row
    // envelope leaked into a shuffle
    assert(!p.contains("HashAggregate") && !p.contains("Window"),
      s"per-clip segmentation must not aggregate:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2, s"only the codec fan-out and output sort may shuffle:\n$p")
  }

  test("q_snapshot_diff: digests join full-outer on id, text never shuffles") {
    val p = plan("q_snapshot_diff")
    assert(p.contains("FullOuter"), s"diff must full-outer join the versions:\n$p")
    // both join inputs are (doc_id, md5, length) projections; the raw text
    // column must be projected away BELOW the join exchange
    val joinIdx = p.indexOf("FullOuter")
    assert(!p.substring(0, joinIdx).contains("text#"),
      s"raw text leaked above the version projections:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"diff join degenerated:\n$p")
  }

  test("q_phrase_search: one cached term-filtered postings scan feeds every intersection") {
    val p = plan("q_phrase_search")
    try {
      // 4 phrases / 10 posting streams (2+3+2+3 terms) — all must re-read
      // the ONE cached term-filtered postings table, not re-explode the
      // corpus
      assert(p.split("InMemoryTableScan").length - 1 >= 10,
        s"postings cache not reused across phrase streams:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"phrase intersection degenerated:\n$p")
    } finally CacheScope.release()
  }

  test("q_tok_fertility: one-pass kernels, two-phase agg, ≤2 exchanges") {
    val p = plan("q_tok_fertility")
    assert(p.contains("text_stats") && p.contains("bpe_token_count"),
      s"native counters missing:\n$p")
    assert(p.split("HashAggregate").length - 1 >= 2,
      s"expected partial+final agg:\n$p")
    val exchanges = p.split("Exchange").length - 1
    assert(exchanges <= 2, s"fertility rollup should shuffle only lang agg + sort:\n$p")
  }

  test("q_dedup_keep_best: winner via map-side argmin aggregate, no corpus window sort") {
    val p = plan("q_dedup_keep_best")
    try {
      assert(!p.contains("Window"),
        s"keep-best must use min(struct), never a window rank over the corpus:\n$p")
      assert(p.split("HashAggregate").length - 1 >= 2,
        s"winner aggregate must have a partial phase:\n$p")
    } finally CacheScope.release()
  }

  test("q_bootstrap_ci: replicate fan-out collapses map-side (partial agg above the explode)") {
    val p = plan("q_bootstrap_ci")
    // the ×32 explode must feed a two-phase agg — a missing partial
    // phase would shuffle 32 rows per doc instead of 32 per lang per task
    assert(p.split("HashAggregate").length - 1 >= 4,
      s"expected partial+final aggs for replicate and point arms:\n$p")
    assert(!p.contains("Window"), s"bootstrap must not window-sort:\n$p")
  }

  test("q_cross_source_dedup: collapse winner via aggregate; loser joins equi-keyed") {
    val p = plan("q_cross_source_dedup")
    try {
      assert(!p.contains("Window"),
        s"content-collapse winner must be min(struct), not a window rank:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"priority dedup join degenerated:\n$p")
    } finally CacheScope.release()
  }

  test("q_knn_graph: distributed routing — cell equi-join, map-side top-k, no cartesian (r13)") {
    val p = plan("q_knn_graph")
    // probe routing must be the exploded top_cells kernel joined on cell,
    // not a per-probe driver loop: no cartesian/nested-loop anywhere
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in knn graph:\n$p")
    assert(p.contains("top_cells"), s"top_cells kernel missing:\n$p")
    // r16: per-src top-k is the bounded heap aggregate (k pairs of state
    // per src, partial map-side under HashAggregate) — the r13 shape, a
    // rank-filtered window planned as WindowGroupLimit, still SORTED the
    // full n·nProbe·~312-row candidate stream on both sides of the src
    // shuffle (52 GB memory spill at the 2 M-vector fixture, guide §5)
    assert(p.contains("top_k_by_score"), s"bounded top-k aggregate missing:\n$p")
    assert(!p.contains("WindowGroupLimit"),
      s"candidate stream must not be window-sorted:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"expected partial+final hash aggregation for the top-k:\n$p")
    graft.CacheScope.release()
  }

  test("q_html_extract: extraction fuses into the scan — no kernel fallback (r13)") {
    val p = plan("q_html_extract")
    // the whole fixture+extract+classify pipeline is row-local: exchanges
    // are the lang aggregate + the output sort only
    val exchanges = p.split("Exchange ").length - 1
    assert(exchanges <= 2, s"extraction pipeline shuffled:\n$p")
    assert(p.contains("text_stats"), s"stopword diagnostic not the native kernel:\n$p")
  }

  test("q_warc_ingest: response filter + column prune pushed into the warc scan (r14)") {
    val p = plan("q_warc_ingest")
    assert(p.contains("PushedFilters") && p.contains("record_type"),
      s"record_type filter not pushed into the reader:\n$p")
    // record_type rides along for the post-scan re-application of the
    // pushed filter (the best-effort contract); the other 4 columns prune
    assert(p.contains("cols=record_type,target_uri,payload"),
      s"scan reads more than the 3 needed columns:\n$p")
    assert(p.contains("html_extract"), s"extraction not the native kernel:\n$p")
    // container scan → extract is row-local; exchanges = the lang
    // repartition boundary + agg + output sort
    val exchanges = p.split("Exchange ").length - 1
    assert(exchanges <= 3, s"ingest pipeline shuffled beyond agg+sort:\n$p")
  }

  test("q_url_filter: gate is row-local — funnel agg + union cap only (r14)") {
    val p = plan("q_url_filter")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"the rule table must be compile-time InSets, not a join:\n$p")
    // kept-side cap plans as WindowGroupLimit (map-side per-domain k-heaps)
    assert(p.contains("WindowGroupLimit"), s"cap not group-limited map-side:\n$p")
  }

  test("q_url_canon: canonicalization in codegen, one hash-agg collapse (r14)") {
    val p = plan("q_url_canon")
    assert(p.contains("url_canon"), s"not the native kernel:\n$p")
    // canon is row-local: exchanges = the countDistinct expansion's
    // (curl, url) pre-agg + the curl collapse + the output sort
    val exchanges = p.split("Exchange ").length - 1
    assert(exchanges <= 3, s"canonicalization shuffled:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"alias collapse must be two-phase:\n$p")
  }

  test("q_crossmodal_knn: broadcast probe routing, group-limited top-k, no cartesian (r14)") {
    val p = plan("q_crossmodal_knn")
    assert(p.contains("BroadcastHashJoin"),
      s"(probe, cell) routing table must broadcast:\n$p")
    // r16: per-probe top-k is the bounded heap aggregate (k pairs of
    // state per probe), not a window sort of the candidate stream
    assert(p.contains("top_k_by_score"),
      s"per-probe top-k must be the bounded heap aggregate:\n$p")
    assert(!p.contains("WindowGroupLimit"),
      s"candidate stream must not be window-sorted:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in cross-modal ANN:\n$p")
  }

  test("q_cdx_fetch: index lookup pushes the key filter into the parquet scan (r15)") {
    // run the query once so the index artifacts exist, and pin the final
    // plan's serving shape: the 48-row probe table broadcasts onto the
    // fetched rows, nothing cartesian
    val p = plan("q_cdx_fetch")
    assert(p.contains("BroadcastHashJoin"), s"probe attach must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in cdx serve:\n$p")
    // the point-lookup scan itself feeds the fetch RDD (not visible in the
    // readout plan) — rebuild it as the query does and pin the pushdown:
    // the 48-key In filter must reach the parquet index scan, where the
    // key-sorted layout's row-group zone maps make it selective
    val idxPq = "/root/repo/target/cdx_fetch/sf0.001-cdxpq"
    val lookup = spark.read.parquet(idxPq)
      .filter(org.apache.spark.sql.functions.col("surt")
        .isInCollection(Seq("test,fixture)/en/7", "test,fixture)/fr/11")))
    val lp = lookup.queryExecution.executedPlan.toString
    assert(lp.contains("PushedFilters: [In(surt"),
      s"lookup key filter not pushed to the index scan:\n$lp")
    graft.CacheScope.release()
  }

  test("q_robots_gate: rule table broadcasts onto the URL stream, no cartesian (r15)") {
    val p = plan("q_robots_gate")
    // the prefix-probe join is equi-keyed on host with the startswith
    // residual — a broadcast hash join, never a cartesian over the URLs
    assert(p.contains("BroadcastHashJoin"),
      s"robots rules must broadcast onto the URL stream:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the robots gate:\n$p")
    graft.CacheScope.release()
  }

  test("q_lm_perplexity: bigram kernel in codegen, two-phase model aggregates (r15)") {
    val p = plan("q_lm_perplexity")
    assert(p.contains("all_shingles"), s"bigram stream not the native kernel:\n$p")
    // c12 / c1 / per-doc score aggregates all combine map-side
    assert(p.split("HashAggregate").length >= 5,
      s"model aggregates must be two-phase:\n$p")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      s"unexpected cartesian beyond the scalar vocab/cuts attaches:\n$p")
    graft.CacheScope.release()
  }

  test("q_boilerplate: line-frequency join equi-keyed, rebuild is one doc-local agg (r15)") {
    val p = plan("q_boilerplate")
    assert(!p.contains("CartesianProduct"), s"cartesian in boilerplate removal:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"line-frequency join must be keyed:\n$p")
    // the distinct-doc frequency and the rebuild both combine two-phase
    assert(p.split("HashAggregate").length >= 3,
      s"frequency aggregate must be two-phase:\n$p")
    graft.CacheScope.release()
  }

  test("q_ann_sq8: encode/decode kernels in codegen, broadcast probes, map-side top-k (r15)") {
    val p = plan("q_ann_sq8")
    assert(p.contains("sq8_decode"), s"reconstruction not the native kernel:\n$p")
    assert(p.contains("long_dist2"), s"distance not the fused kernel:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe batch must broadcast:\n$p")
    assert(p.contains("top_k_by_long_asc"),
      s"per-probe top-k must be the bounded heap aggregate (r16):\n$p")
    assert(!p.contains("WindowGroupLimit"),
      s"candidate stream must not be window-sorted:\n$p")
    graft.CacheScope.release()
  }

  test("q_crawl_frontier: keyed anti join, map-side host cap, bounded batch (r15)") {
    val p = plan("q_crawl_frontier")
    assert(p.contains("url_canon"), s"canonicalization not the native kernel:\n$p")
    assert(p.contains("LeftAnti"), s"crawled-set drop must be an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the frontier:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"host cap must run map-side:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"batch budget must be a bounded top-N, not a global sort:\n$p")
    graft.CacheScope.release()
  }

  test("q_badwords_gate: one automaton pass, no per-term scan, no join (r15)") {
    val df = SparkEntry.queries("q_badwords_gate")(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    // the dictionary rides the plan as the automaton reference object —
    // the corpus never joins a term table and never cross-products
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"per-term join leaked into the blocklist gate:\n$p")
    // the single kernel scan is shared by both readouts through the cache
    val cached = df.queryExecution.withCachedData.toString
    assert(cached.contains("badword_counts"),
      s"native automaton kernel missing:\n$cached")
    assert(p.split("HashAggregate").length >= 5,
      s"term and lang readouts must both combine map-side:\n$p")
    graft.CacheScope.release()
  }

  test("q_containment: hash-keyed inverted-index join, no sort of the index (r15)") {
    val p = plan("q_containment")
    // the co-shingle self-join must be SHUFFLE_HASH on the shingle hash
    // (the jaccardPairs lesson: SMJ sorts the multi-billion-row index)
    assert(p.contains("ShuffledHashJoin"),
      s"pair join must be hash, not sort-merge:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs leak:\n$p")
    // both directed scores come from ONE aggregate — a second pair join
    // would double the Ω(Σf²) work
    assert(p.split("ShuffledHashJoin").length == 2,
      s"exactly one pair join expected:\n$p")
    graft.CacheScope.release()
  }

  test("q_dataset_card: one keyed two-phase aggregate over a narrow scan (r15)") {
    val p = plan("q_dataset_card")
    assert(!p.contains("Join"), s"the card is one aggregate, never a join:\n$p")
    assert(p.split("HashAggregate").length >= 3 ||
      p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"card aggregate must combine map-side where the functions allow:\n$p")
    assert(p.contains("ReadSchema: struct<text:string,lang:string,source:string"),
      s"scan must prune to exactly (text, lang, source):\n$p")
    graft.CacheScope.release()
  }

  test("q_ann_persist: cell filter pushed into the reloaded assignment scan (r15)") {
    val p = plan("q_ann_persist")
    // serving touches only the nProbe candidate cells: the In(cell, …)
    // predicate must reach the assignment artifact's parquet scan
    assert(p.contains("PushedFilters: [In(cell"),
      s"cell routing not pushed into the artifact scan:\n$p")
    assert(p.contains("LeftSemi"), s"candidate set must semi-join the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in persisted serving:\n$p")
    graft.CacheScope.release()
  }

  test("q_tok_align: offsets kernel in codegen, no model join, two-phase readout (r15)") {
    val p = plan("q_tok_align")
    assert(p.contains("wordpiece_offsets"), s"native offsets kernel missing:\n$p")
    assert(!p.contains("Join"), s"model must ride the plan, not a join:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"per-lang readout must combine map-side:\n$p")
    graft.CacheScope.release()
  }

  test("q_ann_jl: projection fused into the scan, broadcast probes, map-side top-k (r15)") {
    val p = plan("q_ann_jl")
    assert(p.contains("long_dot"), s"projection not the fused kernel:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe batch must broadcast:\n$p")
    assert(p.contains("top_k_by_long_asc"),
      s"per-probe top-k must be the bounded heap aggregate (r16):\n$p")
    assert(!p.contains("WindowGroupLimit"),
      s"candidate stream must not be window-sorted:\n$p")
    // (the jl↔brute recall join of two ~50-row aggregates may plan as SMJ
    // pre-AQE — only the corpus-side scan shape is gated here)
    assert(!p.contains("CartesianProduct"), s"cartesian in the recall join:\n$p")
    graft.CacheScope.release()
  }

  test("q_takedown_purge: takedown list broadcasts, container side never shuffles (r15)") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_takedown_purge")(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    // the READOUT joins two tiny per-lang aggregates — keyed, no cartesian
    assert(!p.contains("CartesianProduct"), s"cartesian in the audit readout:\n$p")
    // the purge/tombstone scans already ran at construction; re-derive the
    // anti-join plan to assert the broadcast shape the purge itself uses
    val base = "/root/repo/target/takedown/sf0.001"
    val docs = Tables.t(spark, TestSpark.Sf0001, "documents")
    val takedown = docs.filter(col("doc_id") % 17 === 5)
      .select(concat(lit("https://fixture.test/"), col("lang"), lit("/"),
        col("doc_id").cast("string")).as("target_uri"))
    val anti = spark.read.format("warc").option("recordGzipSplit", "true")
      .load(base + "/orig")
      .join(broadcast(takedown), Seq("target_uri"), "left_anti")
      .queryExecution.executedPlan.toString
    assert(anti.contains("BroadcastHashJoin") && anti.contains("LeftAnti"),
      s"takedown anti-join must broadcast the list:\n$anti")
    assert(!anti.contains("SortMergeJoin"),
      s"container side must never shuffle for the purge:\n$anti")
    graft.CacheScope.release()
  }

  test("q_anchor_text: kernels fused, one target shuffle, bounded top-N (r15)") {
    val df = SparkEntry.queries("q_anchor_text")(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    val cached = df.queryExecution.withCachedData.toString
    assert(cached.contains("html_anchors"), s"native anchor scanner missing:\n$cached")
    assert(cached.contains("url_canon"), s"canonicalization not the kernel:\n$cached")
    assert(!p.contains("CartesianProduct"), s"cartesian in the anchor corpus:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-40 must be a bounded top-N, not a global sort:\n$p")
    graft.CacheScope.release()
  }

  test("q_html_tables: one-pass native scanner fused into the scan, no join (r15)") {
    val p = plan("q_html_tables")
    assert(p.contains("html_tables"), s"native table scanner missing:\n$p")
    assert(!p.contains("Join"), s"table mining must not join:\n$p")
    assert(p.split("HashAggregate").length >= 3,
      s"per-lang readout must combine map-side:\n$p")
    graft.CacheScope.release()
  }

  test("q_maxsim_rerank: broadcast inverted-index probe, map-side caps, kernel dots (r15)") {
    val p = plan("q_maxsim_rerank")
    // query bigrams and the bounded candidate set broadcast — the corpus
    // token stream never shuffles against either
    assert(p.contains("BroadcastHashJoin"),
      s"query/candidate sides must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the rerank:\n$p")
    // the per-doc token caps and the final top-5 lower to WindowGroupLimit
    assert(p.contains("WindowGroupLimit"),
      s"rank caps must run map-side:\n$p")
    // dots are the native kernel, not an exploded per-dimension join
    assert(p.contains("long_dot"), s"dot product not the fused kernel:\n$p")
    graft.CacheScope.release()
  }

  test("q_wordpiece_encode: vocab rides the plan, kernel in codegen, no join (r15)") {
    val p = plan("q_wordpiece_encode")
    // the trained vocabulary is a reference object on the encode kernel —
    // the corpus stream never joins a model table
    assert(p.contains("wordpiece_encode"), s"native greedy encoder missing:\n$p")
    assert(!p.contains("Join"), s"model must not be a join at serve time:\n$p")
    // word histogram + piece histogram both combine map-side; readout is
    // a bounded top-N
    assert(p.split("HashAggregate").length >= 3,
      s"piece histogram must be two-phase:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-40 readout must be a bounded top-N:\n$p")
    graft.CacheScope.release()
  }

  test("q_triangle_count: wedge and closing joins equi-keyed, no cartesian") {
    val p = plan("q_triangle_count")
    assert(!p.contains("CartesianProduct"), s"cartesian in triangle census:\n$p")
    // exactly ONE nested-loop join: the deliberate 1-row scalar-total
    // attach (broadcast of a single aggregate row). The graph joins —
    // degree attach, wedge self-join, closing edge — must all be
    // equi-keyed hash/sort-merge joins.
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1,
      s"non-equi join beyond the scalar attach:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"expected keyed graph joins:\n$p")
    graft.CacheScope.release()
  }
}
