package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-analysis operators over derived document/source graphs. The
  * reference engine has nothing comparable (its 15-op surface is
  * sequence-local); this is north-star scope for crawl curation — ranking
  * domains/documents by their position in a similarity or duplication
  * graph.
  */
object LinkAnalysis {

  /** Fixed-point integer PageRank: damping 17/20, total mass 2^40, every
    * step 64-bit INTEGER arithmetic (`div` truncation included) — so any
    * engine that mirrors the formula reproduces every bit. No float sum
    * order, no libm, nothing to quantize: the textbook double-precision
    * PageRank is unverifiable across engines because neighbor sums
    * accumulate in engine-specific order, while the integer formulation
    * makes the oracle comparison exact.
    *
    * Per iteration, with N = |nodes|, T = (3·2^40) div 20 div N:
    * {{{
    *   contrib(u) = pr(u) div deg(u)                      (deg > 0)
    *   dangShare  = (Σ pr over deg-0 nodes) div N         (one scalar)
    *   pr'(v)     = T + (17 · (Σ_{u→v} contrib(u) + dangShare)) div 20
    * }}}
    *
    * `nodes` is the full vertex universe (isolated vertices keep
    * teleport-only rank and shed their mass through the dangling term);
    * `edges` must be directed (symmetrize an undirected graph before the
    * call) and duplicate-free.
    *
    * Scale shape: each iteration is one equi-join of the rank table onto
    * `edges.src` plus one map-side-combinable `groupBy(dst)` sum — the
    * co-partitioned shape that scales to a 100 TB edge list. The dangling
    * mass is a ONE-ROW aggregate folded into the iteration's plan as a
    * broadcast (r16; it was previously a driver-blocking `.first()` per
    * iteration — an extra serialized job scanning the full rank table,
    * VERDICT r15 item 5). `localCheckpoint` truncates the
    * self-referential lineage each round. Returns (id, deg, pr). */
  def pagerank(nodes: DataFrame, edges: DataFrame, idCol: String,
               srcCol: String = "src", dstCol: String = "dst",
               iters: Int = 3): DataFrame = {
    val n = nodes.select(col(idCol)).distinct().count()
    require(n > 0, "pagerank needs a non-empty vertex set")
    val massTotal = 1L << 40
    val init = massTotal / n
    val teleport = 3L * massTotal / 20L / n
    val e = graft.CacheScope.cached(
      edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst")))
    val deg = graft.CacheScope.cached(
      nodes.select(col(idCol).as("id")).distinct()
        .join(e.groupBy(col("__src").as("id")).agg(count(lit(1)).as("deg")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg")))
    var pr = deg.select(col("id"), col("deg"), lit(init).as("pr")).localCheckpoint()
    // Scale-adaptive iteration partitioning (r15 opt, the
    // Dedup.ccStarWithRounds pattern): every iteration pays 2-3 shuffles
    // whose reduce side AQE floors at the session parallelism even when
    // the rank/edge tables are a few thousand rows — fixed task overhead
    // × iters. Size the loop's shuffles from the measured graph instead:
    // ~2 M rows (~64 MB at rank-row width) per partition, floor 2, cap
    // 16384. e.count() materializes the edge cache the first iteration
    // would materialize anyway, so the sizing costs no extra pass.
    val sess = nodes.sparkSession
    val prevParts = sess.conf.get("spark.sql.shuffle.partitions")
    val rows = n + e.count()
    val loopParts = math.max(2L, math.min(16384L, rows / 2000000L + 1L)).toInt
    sess.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    try {
      (1 to iters).foreach { _ =>
        // dangling mass: sum of deg-0 rank div N — SAME integer math as
        // the former driver-side scalar (both operands non-negative, so
        // SQL `div` truncation ≡ the Scala `/` it replaces; the global
        // agg is exactly one row), but now a broadcast 1-row side input:
        // the iteration is ONE job (the localCheckpoint) instead of two
        // serialized ones, and the full-rank-table dangling scan rides
        // the same job instead of blocking the driver first
        val dangShare = pr.filter(col("deg") === 0L)
          .agg(call_function("div",
            coalesce(sum(col("pr")), lit(0L)), lit(n)).as("__dang"))
        val inflow = pr.filter(col("deg") > 0L)
          .withColumn("__c", call_function("div", col("pr"), col("deg")))
          .join(e, col("id") === col("__src"))
          .groupBy(col("__dst").as("id"))
          .agg(sum(col("__c")).as("__in"))
        pr = deg.join(inflow, Seq("id"), "left")
          .crossJoin(broadcast(dangShare))
          .select(col("id"), col("deg"),
            (lit(teleport) + call_function("div",
              lit(17L) * (coalesce(col("__in"), lit(0L)) + col("__dang")),
              lit(20L))).as("pr"))
          .localCheckpoint()
      }
    } finally sess.conf.set("spark.sql.shuffle.partitions", prevParts)
    pr
  }

  /** Exact triangle enumeration with DEGREE-ORDERED orientation — the
    * standard trick that makes distributed triangle counting survive
    * power-law graphs. `edges` must be undirected-canonical: one row per
    * unordered pair, `a < b`, duplicate-free.
    *
    * Naive wedge enumeration (per-node neighbor pairs) is Σ deg(v)² —
    * quadratic in the max degree, a scale-killer on any graph with hubs.
    * Orienting every edge from its lower-(deg, id) endpoint to the higher
    * caps every node's OUT-degree at O(√m) (a node with out-degree d has
    * d neighbors of degree ≥ its own ≥ d, so d² ≤ 2m), which bounds the
    * wedge stage at O(m^1.5) regardless of the degree distribution —
    * each triangle is produced exactly once, as the wedge at its
    * (deg, id)-smallest vertex closed by its (deg, id)-largest edge.
    *
    * Every stage is an equi-join or map-side-combinable aggregation:
    * degree count, two broadcast-or-shuffle joins to attach endpoint
    * degrees, the self-join of the oriented list on its source, and the
    * closing equi-join on (v, w). Nothing collects; nothing is quadratic
    * in a degree. Returns triangles as (x, y, z) in ID order (x < y < z
    * — the orientation is internal; output is canonical so callers and
    * oracles are orientation-independent).
    *
    * `bloomBitsPerKey` > 0 inserts a bloom semi-join reduction on the
    * wedge stream before its shuffle (the q_bloom_prune pattern scaled
    * up: ~bitsPerKey·m bits built over the oriented edges, probed
    * map-side). MEASURED OFF by default: at the 100× co-purchase graph
    * (4.1 B wedges, 120 MB bloom) the probe is DRAM-random-access-bound
    * and cost 1626 s vs 396 s for shuffling everything — lz4 sequential
    * shuffle IO beats ~5 cache-missing bit reads per wedge on one box.
    * On a network-constrained cluster the trade can flip (the filter
    * ships once per executor, the stream it prunes is O(m^1.5)); it's a
    * knob, with the local numbers recorded so nobody re-learns them. */
  def triangles(edges: DataFrame, aCol: String = "a", bCol: String = "b",
                bloomBitsPerKey: Int = 0): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val deg = e.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // orient a→b iff (deg_a, a) < (deg_b, b); else b→a
    val oriented = graft.CacheScope.cached(
      e.join(deg.withColumnRenamed("id", "a").withColumnRenamed("deg", "da"), Seq("a"))
        .join(deg.withColumnRenamed("id", "b").withColumnRenamed("deg", "db"), Seq("b"))
        .select(
          when(col("da") < col("db") ||
               (col("da") === col("db") && col("a") < col("b")), col("a"))
            .otherwise(col("b")).as("src"),
          when(col("da") < col("db") ||
               (col("da") === col("db") && col("a") < col("b")), col("b"))
            .otherwise(col("a")).as("dst"),
          when(col("da") < col("db") ||
               (col("da") === col("db") && col("a") < col("b")), col("db"))
            .otherwise(col("da")).as("ddst")))
    // wedges at the orientation-smallest vertex: unordered out-pairs,
    // each counted once via the (deg, id) order on the two endpoints
    val w = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") &&
          (col("x.ddst") < col("y.ddst") ||
            (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))))
      .select(col("x.src").as("u"), col("x.dst").as("v"), col("y.dst").as("w"))
    // Optional bloom semi-join reduction BEFORE the wedge stream's
    // shuffle (no false negatives; the exact closing join removes false
    // positives, so the result is bloom-independent). See the scaladoc
    // for the measured local trade — default off.
    val probable = if (bloomBitsPerKey <= 0) w else {
      val m = oriented.count() // oriented is cached — this is the same pass
      val bits = math.max(64L * 1024,
        math.min(bloomBitsPerKey.toLong * m, 2L * Integer.MAX_VALUE))
      val spark = edges.sparkSession
      val maxBitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      // raise the analyzer cap only for the build, then RESTORE it —
      // .head() materializes the bloom eagerly, so nothing later in the
      // session depends on the raised value (the might_contain probe
      // doesn't consult it); leaving it raised would silently change
      // every subsequent query's runtime-filter sizing
      val prevMaxBits = spark.conf.get(maxBitsKey)
      val bf =
        try {
          if (prevMaxBits.toLong < bits) spark.conf.set(maxBitsKey, bits.toString)
          oriented
            .agg(graft.plans.BloomExpressions
              .bloomFilterAgg(xxhash64(col("src"), col("dst")), m, bits).as("bf"))
            .head().getAs[Array[Byte]]("bf")
        } finally spark.conf.set(maxBitsKey, prevMaxBits)
      w.filter(graft.plans.BloomExpressions
        .mightContain(lit(bf), xxhash64(col("v"), col("w"))))
    }
    // close the wedge: the third edge is oriented v→w by construction.
    // SHUFFLE_HASH, not sort-merge: even bloom-reduced, the wedge stream
    // must never be SORTED — a sort materializes it to disk; a shuffled
    // hash join streams it through per-partition probes of the m-row
    // edge side (pre-bloom, the SMJ sort of 4.1 B wedges exhausted local
    // spill space at the 100× fixture).
    val tri = probable.join(
      oriented.select(col("src").as("v"), col("dst").as("w")).hint("shuffle_hash"),
      Seq("v", "w"))
    // canonical id order; middle = sum − min − max (exact long arithmetic
    // — an array_sort HOF here would run interpreted per triangle)
    tri.select(
      least(col("u"), col("v"), col("w")).as("x"),
      (col("u") + col("v") + col("w")
        - least(col("u"), col("v"), col("w"))
        - greatest(col("u"), col("v"), col("w"))).as("y"),
      greatest(col("u"), col("v"), col("w")).as("z"))
  }
}
