package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity-search operators over ARRAY<FLOAT> embedding columns:
  * brute-force cosine top-k (the exact baseline), sign-LSH bucketed
  * near-dup, and an IVF (inverted-file) index — the three standard rungs
  * of the ANN ladder. Dot products run as `zip_with`+`aggregate` HOFs in
  * whole-stage codegen; nothing leaves the JVM and nothing but the tiny
  * centroid table ever reaches the driver.
  */
object Similarity {

  /** Fixed-point quantization of a float vector: vq = floor(v·2^20) as
    * BIGINT per component. Multiplying a double by a power of two is exact
    * and floor is engine-identical, so Spark and DuckDB derive the same
    * integer vectors; all downstream dot/norm/distance math is then exact
    * integer arithmetic in ANY order (see SimilarityQueries scaladoc for
    * the bound chain). Production body is the fused
    * [[graft.plans.VectorOps.quantizeVec]] kernel — the `transform` HOF
    * form it replaces is CodegenFallback, which interprets the whole
    * enclosing projection per row (kernel ≡ HOF pinned in OperatorsSpec). */
  def quantize(vec: Column): Column =
    graft.plans.VectorExpressions.quantizeVec(vec)

  /** The HOF reference form of [[quantize]], kept for the equivalence pin. */
  private[graft] def quantizeColumnar(vec: Column): Column =
    transform(vec, v => floor(v.cast("double") * 1048576d).cast("long"))

  /** Sequential-fold double dot product of two float arrays (HOF — exact
    * left-to-right IEEE, codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact cosine top-k neighbors of one probe vector: the
    * probe row is broadcast, the scan is embarrassingly parallel.
    *
    * `quantized = true` (default) runs the 2^20 fixed-point pipeline —
    * quantize both sides, fused native integer dot/norm kernels
    * ([[graft.plans.VectorExpressions.longDot]]), one double sqrt+divide
    * chain — which is partition-order independent (integer sums are
    * associative), hence oracle-checkable AND the faster path (the fused
    * long kernels beat the float HOF fold). `quantized = false` keeps the
    * IEEE left-to-right double fold as a reference for quantization-error
    * pins in tests. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 probeId: Long, k: Int, quantized: Boolean = true): DataFrame = {
    if (quantized) {
      val qdot = graft.plans.VectorExpressions.longDot _
      val probe = broadcast(emb.filter(col(idCol) === probeId)
        .select(quantize(col(vecCol)).as("__q")))
      emb.filter(col(idCol) =!= probeId)
        .select(col(idCol), quantize(col(vecCol)).as("__v"))
        .crossJoin(probe)
        .select(col(idCol),
          (qdot(col("__v"), col("__q")).cast("double") /
            (sqrt(qdot(col("__v"), col("__v")).cast("double")) *
              sqrt(qdot(col("__q"), col("__q")).cast("double")))).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol).asc)
        .limit(k)
    } else {
      val probe = broadcast(emb.filter(col(idCol) === probeId)
        .select(col(vecCol).as("__q")))
      emb.filter(col(idCol) =!= probeId)
        .crossJoin(probe)
        .select(col(idCol), cosine(col(vecCol), col("__q")).as("cosine"))
        .orderBy(col("cosine").desc, col(idCol).asc)
        .limit(k)
    }
  }

  /** '+'/'-' signs of dims (`from`, `until`] — the composable unit behind
    * [[signBucket]] and the adaptive deepening extension. */
  def signBits(vecCol: Column, from: Int, until: Int): Column =
    concat((from + 1 to until).map(i =>
      when(element_at(vecCol, i) >= 0f, lit("+")).otherwise(lit("-"))): _*)

  /** Deterministic sign-LSH bucket key from the leading `bits` dims. */
  def signBucket(vecCol: Column, bits: Int = 8): Column = signBits(vecCol, 0, bits)

  /** Default per-bucket membership bound before [[deepenBuckets]] splits a
    * bucket further. A bucket of B members emits B²/2 candidate pairs, so
    * a FIXED bit width turns 10× corpus growth into 100× candidate growth
    * (measured: 7.9 k → 781 k pairs for 2 k → 20 k vectors at 8 bits).
    * The default sits above every bucket size at the oracle SFs (max 16
    * at sf0.1), so capped and uncapped results agree there. */
  val DefaultMaxVecBucket: Int = 64

  /** Adaptive-depth LSH bucketing: any bucket whose membership exceeds
    * `maxBucketSize` has its key EXTENDED by `extend(level)` (more sign
    * bits / more hyperplanes), recursively up to `maxLevels`. Dense
    * regions get deeper keys, sparse regions keep cheap short ones — the
    * relational analog of a variable-depth prefix tree (FAISS-style index
    * refinement), and the property that keeps candidate generation
    * near-linear as the corpus grows: bucket population is bounded by a
    * CONSTANT, not by corpus density.
    *
    * Recall note: deepening narrows candidates exactly like choosing a
    * wider fixed key would, but only where density demands it. At the
    * oracle SFs no bucket exceeds the default cap, so deepened and flat
    * results are identical (oracle-checked).
    *
    * Cost: one linear `groupBy(count)` + broadcast anti/semi joins per
    * level (the hot-bucket set is tiny by definition); level keys of
    * different depths cannot collide (strictly longer strings). */
  def deepenBuckets(df: DataFrame, bucketCol: String,
                    maxBucketSize: Int = DefaultMaxVecBucket,
                    maxLevels: Int = 6)
                   (extend: Int => Column): DataFrame = {
    if (maxBucketSize <= 0) return df
    var open = graft.CacheScope.cached(df)
    val finished = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var level = 1
    var break = false
    while (!break && level <= maxLevels) {
      // cached: the hot-bucket set feeds the emptiness check plus both
      // join branches — one count aggregation per level, not three
      val hot = graft.CacheScope.cached(open.groupBy(col(bucketCol))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucketSize).select(col(bucketCol)))
      if (hot.isEmpty) break = true
      else {
        finished += open.join(broadcast(hot), Seq(bucketCol), "left_anti")
        open = graft.CacheScope.cached(
          open.join(broadcast(hot), Seq(bucketCol), "left_semi")
            .withColumn(bucketCol, concat(col(bucketCol), extend(level))))
        level += 1
      }
    }
    finished.foldLeft(open)(_ unionByName _)
  }

  /** Seeded random-hyperplane LSH bucket key: `bits` hyperplanes drawn
    * deterministically from `seed` (fixed at plan-build time, so every
    * executor and every run sees the same planes — no RNG at runtime).
    * Proper SimHash-for-vectors family: P(bit agrees) = 1 - θ/π, strictly
    * better-distributed than the axis-aligned `signBucket` when vector
    * components are correlated. */
  def randomHyperplaneBucket(vecCol: Column, dim: Int, bits: Int = 8,
                             seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
    concat(planes.toIndexedSeq.map { p =>
      val pArr = array(p.toIndexedSeq.map(lit): _*)
      val proj = aggregate(zip_with(vecCol, pArr, (x, w) => x.cast("double") * w),
        lit(0d), (acc, x) => acc + x)
      when(proj >= 0d, lit("+")).otherwise(lit("-"))
    }: _*)
  }

  /** Near-dup pairs: same sign-LSH bucket AND exact cosine ≥ minCosine.
    * The bucket equi-join shrinks the pair space ~2^bits before any exact
    * math; buckets denser than `maxBucketSize` are adaptively deepened
    * ([[deepenBuckets]]; `extendFn(level)` supplies the extra key bits —
    * defaults to the next sign dims; pass 0 to disable). */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                      bits: Int = 8, minCosine: Double = 0.3,
                      bucketFn: Column => Column = null,
                      maxBucketSize: Int = DefaultMaxVecBucket,
                      extendFn: (Column, Int) => Column = null): DataFrame = {
    val mkBucket = Option(bucketFn).getOrElse((v: Column) => signBucket(v, bits))
    val mkExtend = Option(extendFn).getOrElse((v: Column, level: Int) =>
      signBits(v, bits + (level - 1) * 4, bits + level * 4))
    val b0 = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      mkBucket(col(vecCol)).as("bucket"))
    // norm once per row: each vector appears in ~bucket-size pairs, so the
    // per-pair formulation recomputes 2 of its 3 array folds bucket-size
    // times over
    val b = deepenBuckets(b0, "bucket", maxBucketSize)(l => mkExtend(col("v"), l))
      .withColumn("nrm", norm(col("v")))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("v1"), col("b.id").as("v2"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Embedding-space near-dedup: drop the higher-id member of every
    * sign-LSH-verified pair with cosine ≥ minCosine (the embedding analog
    * of Dedup.dedupeNear). Returns the surviving rows of `emb`. */
  def dedupeByEmbedding(emb: DataFrame, idCol: String, vecCol: String,
                        bits: Int = 8, minCosine: Double = 0.9): DataFrame = {
    val losers = lshNearDupPairs(emb, idCol, vecCol, bits, minCosine)
      .select(col("v2").as(idCol)).distinct()
    emb.join(losers, Seq(idCol), "left_anti")
  }

  /** Seed-row selection for [[ivfIndex]], exposed for plan-shape tests:
    * must stay a TakeOrderedAndProject (distributed top-k), never a global
    * window/sort. */
  def seedRows(emb: DataFrame, idCol: String, vecCol: String, nCells: Int): DataFrame =
    emb.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
      .limit(nCells)

  /** IVF coarse index: `nCells` centroids refined by `iters` Lloyd steps
    * from a deterministic hash-sampled seed. Centroids are tiny — they
    * live broadcast; assignments are one narrow pass.
    * Returns (centroids, assignments(id, cell)). */
  def ivfIndex(emb: DataFrame, idCol: String, vecCol: String,
               nCells: Int = 16, iters: Int = 2): (Array[(Int, Array[Double])], DataFrame) = {
    // Deterministic seeding: the nCells lowest xxhash64(id) rows — a
    // pseudo-random uniform sample with a fixed outcome. orderBy+limit
    // plans as TakeOrderedAndProject (per-partition top-k, merge of nCells
    // rows at the driver) — no global sort, no single-partition window,
    // no extra count job; survives any input size.
    var centroids: Array[(Int, Array[Double])] = seedRows(emb, idCol, vecCol, nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) =>
        i -> r.getSeq[Float](1).map(_.toDouble).toArray
      }

    // argmin over squared L2 distance to each centroid, tie → lowest cell.
    // One k·d kernel loop with the matrix as a codegen reference object —
    // the k-branch array_min(struct…) literal tree this replaces breaks
    // codegen past a few hundred cells (method-size limit) and pays
    // per-branch dispatch; SemDeDup-scale k needs thousands of cells.
    // Identical semantics (same IEEE fold, same tie rule) pinned in
    // OperatorsSpec.
    def assignExpr(cs: Array[(Int, Array[Double])]): Column = {
      val sorted = cs.sortBy(_._1)
      graft.plans.VectorExpressions.argminCellD(
        col(vecCol), sorted.map(_._1), sorted.map(_._2))
    }

    // Lloyd mean step via the vector-sum UDAF: one Double-array buffer per
    // cell per partition — rows never explode, the shuffle carries
    // nCells × dim doubles (vs rows × dim exploded rows with the
    // avg-per-position formulation)
    val vsum = udaf(graft.functions.DoubleVectorSumAggregator)
    for (_ <- 0 until iters) {
      val assigned = emb.select(col(idCol), col(vecCol),
        assignExpr(centroids).as("cell"))
      val means = assigned
        .select(col("cell"), transform(col(vecCol), _.cast("double")).as("v"))
        .groupBy("cell").agg(vsum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val n = r.getLong(2).toDouble
          r.getInt(0) -> r.getSeq[Double](1).map(_ / n).toArray
        }
      if (means.nonEmpty) centroids = means.sortBy(_._1)
    }

    val assignments = emb.select(col(idCol).as("id"),
      assignExpr(centroids).as("cell"))
    (centroids, assignments)
  }

  /** Quantized-exact IVF index (the oracle-checkable twin of [[ivfIndex]]):
    * every arithmetic step is integer (or one exactly-rounded double
    * division), so centroids, assignments and probe results are
    * bit-identical across engines and partitionings — a DuckDB oracle can
    * replay the whole index build in SQL.
    *
    *  - Seeding: the `nCells` rows with lowest
    *    `((id mod 2^31)·2654435761) mod 2^32` (Knuth multiplicative hash —
    *    unlike xxhash64, both engines can evaluate it; the mod-2^31
    *    pre-reduction keeps the product < 2^63 for ANY id — the bare
    *    product ANSI-overflowed at the 1000× fixture's 10-digit ids, and
    *    is a no-op below 2^31, so oracle-SF results are unchanged). Plans
    *    as TakeOrderedAndProject — distributed per-partition top-k, no
    *    global sort (same shape contract as [[seedRows]]).
    *  - Lloyd step: assign to argmin integer squared L2 distance (tie →
    *    lowest cell; |vq−cq| ≤ 2^21 ⇒ 64-dim sums ≤ 2^48, long-exact);
    *    new centroid component = floor(sum/n) back on the integer grid —
    *    the same exact-mean trick qEmbedCentroids proves out (sum ≤ n·2^20
    *    < 2^53 ⇒ the double division is correctly rounded once). Cells
    *    that lose all members drop out — identically in both engines.
    *
    * Scale shape: centroids stay tiny and broadcast as literals; each
    * iteration is one narrow assignment pass + one vector-sum UDAF
    * aggregation whose shuffle carries nCells × dim longs, not rows × dim.
    *
    * `trainSample > 0` trains the Lloyd loop on a bounded hash-sample —
    * the `trainSample` rows with the LOWEST Knuth hash (the same ordering
    * the seeding uses, so the seed set is a prefix of the sample and
    * seeding is unchanged) — and assigns the full corpus once at the end.
    * This is the FAISS-style shortcut (train on ~64·k points, assign n):
    * each Lloyd pass costs sample·k·d instead of n·k·d, turning the
    * 3-full-pass build into ~1 full pass + ε (measured numbers in
    * BASELINE.md round 11). Deterministic and oracle-
    * replayable: the sample is a pure function of the ids. A sample ≥ the
    * corpus size degenerates to exact full-corpus training (the limit is
    * a no-op), which is what keeps small-fixture oracles bit-identical.
    * Returns (centroids(cell → quantized vector), assignments(id, cell)).
    */
  def ivfIndexQ(emb: DataFrame, idCol: String, vecCol: String,
                nCells: Int = 16, iters: Int = 2,
                trainSample: Int = 0): (Array[(Int, Array[Long])], DataFrame) = {
    val q = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("vq"))
    val centroids = lloydTrainQ(q, nCells, iters, trainSample)
    val sorted = centroids.sortBy(_._1)
    (centroids, q.select(col("id"), graft.plans.VectorExpressions.argminCell(
      col("vq"), sorted.map(_._1), sorted.map(_._2)).as("cell")))
  }

  /** The quantized-integer Lloyd loop over an already-quantized frame with
    * columns exactly (id: LONG, vq: ARRAY<BIGINT>) — extracted from
    * [[ivfIndexQ]] (round 12) so PQ codebook training ([[pqIndexQ]]) can
    * run it per subspace. Semantics are UNCHANGED from the r8–r11
    * ivfIndexQ body (the q_ann_ivf / q_semdedup oracles hash-pin it):
    * Knuth-hash seeding (lowest `nCells`), `iters` rounds of integer
    * argmin assignment + floor-mean update, optional bounded-sample
    * training (the seed set is a prefix of the sample). Returns the
    * trained centroids; assignment is the caller's one extra kernel pass. */
  private[graft] def lloydTrainQ(q: DataFrame, nCells: Int, iters: Int,
                                 trainSample: Int): Array[(Int, Array[Long])] = {
    require(trainSample <= 0 || trainSample >= nCells,
      s"trainSample ($trainSample) must cover the $nCells seed rows")
    val knuth = pmod(pmod(col("id"), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
    // orderBy+limit plans as TakeOrderedAndProject (distributed top-k); the
    // single-partition limit result is re-spread so the Lloyd passes keep
    // their parallelism, and cached because each iteration re-reads it
    val train = if (trainSample > 0)
      graft.CacheScope.cached(q.orderBy(knuth, col("id")).limit(trainSample)
        .repartition(q.sparkSession.sparkContext.defaultParallelism))
    else q
    var centroids: Array[(Int, Array[Long])] = train
      .orderBy(knuth, col("id"))
      .limit(nCells)
      .collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](1).toArray }

    // integer argmin assignment as ONE k·d kernel loop (see the float
    // variant's comment) — exact integer distances, tie → lowest cell,
    // bit-identical to the replaced array_min(struct(long_dist2…)) tree
    def assignExpr(cs: Array[(Int, Array[Long])]): Column = {
      val sorted = cs.sortBy(_._1)
      graft.plans.VectorExpressions.argminCell(
        col("vq"), sorted.map(_._1), sorted.map(_._2))
    }

    val vsum = udaf(graft.functions.VectorSumAggregator)
    for (_ <- 0 until iters) {
      val means = train.select(col("vq"), assignExpr(centroids).as("cell"))
        .groupBy("cell").agg(vsum(col("vq")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map { r =>
          val n = r.getLong(2)
          r.getInt(0) -> r.getSeq[Long](1).map(s => math.floor(s.toDouble / n).toLong).toArray
        }
      if (means.nonEmpty) centroids = means.sortBy(_._1)
    }
    centroids
  }

  /** Product-quantization index (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011 — public literature; the
    * FAISS-standard compressed-storage path): the `dim`-dim quantized
    * vector splits into `m` contiguous subspaces of dim/m dims, each
    * subspace trains its own `ksub`-centroid codebook with the SAME
    * quantized-integer Lloyd loop the IVF index uses ([[lloydTrainQ]] —
    * Knuth seeding over the shared id order, so all `m` codebooks seed
    * from the same rows' sub-slices), and every vector is ENCODED as `m`
    * small codes — m·log2(ksub) bits instead of dim·32 (64-dim float → 8
    * bytes at m=8/ksub=16·…·256), which is what lets a 10⁹-vector corpus
    * fit an ANN serving memory budget.
    *
    * Returns (codebooks(subspace)(cell → sub-centroid), codes(id, c0…c{m-1})).
    *
    * Scale shape: training cost is m bounded Lloyd loops over sub-slices
    * (each shuffle carries ksub × dim/m longs — sample-bound it with
    * `trainSample` exactly like the IVF build); encoding is ONE row-local
    * pass of m `argmin_cell` kernels (same total work as one full-dim
    * argmin over ksub cells); nothing but the m·ksub·(dim/m) codebook
    * matrix reaches the driver. Integer-exact end to end, hence
    * oracle-replayable (q_ann_pq). */
  def pqIndexQ(emb: DataFrame, idCol: String, vecCol: String,
               m: Int = 8, ksub: Int = 16, iters: Int = 2,
               trainSample: Int = 0)
      : (Array[Array[(Int, Array[Long])]], DataFrame) = {
    // cached: feeds m training loops + the encode pass
    val q = graft.CacheScope.cached(
      emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("vq")))
    val dim = q.select(size(col("vq"))).limit(1).collect()(0).getInt(0)
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val dsub = dim / m
    // The m subspace codebooks are INDEPENDENT Lloyd loops over slices of
    // the same cached frame, but each loop is a chain of small driver
    // actions (seed top-k + one bounded collect per iteration) — run
    // sequentially that is m·(iters+1) back-to-back jobs of mostly
    // scheduling latency. Submit them from a small driver thread pool so
    // the jobs overlap (opt guide §2.6 — Spark's scheduler runs concurrent
    // jobs; FIFO back-fill is exactly what we want). 4 in flight bounds
    // driver/mem pressure; results land by index so `books` ordering (and
    // every downstream code/oracle) is unchanged. Measured r15 (same-window
    // A/B, min-of-4): q_ann_pq 2.76 -> 1.37 s at sf0.1.
    val books: Array[Array[(Int, Array[Long])]] = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(m, 4))
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      try {
        val futs = (0 until m).map { j =>
          scala.concurrent.Future {
            lloydTrainQ(
              q.select(col("id"), slice(col("vq"), j * dsub + 1, dsub).as("vq")),
              ksub, iters, trainSample)
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futs),
          scala.concurrent.duration.Duration.Inf).toArray
      } finally pool.shutdown()
    }
    val codeCols = (0 until m).map { j =>
      val sorted = books(j).sortBy(_._1)
      graft.plans.VectorExpressions.argminCell(
        slice(col("vq"), j * dsub + 1, dsub),
        sorted.map(_._1), sorted.map(_._2)).as(s"c$j")
    }
    (books, q.select(col("id") +: codeCols: _*))
  }

  /** Batch PQ search with asymmetric distance computation (ADC): per probe
    * the m × ksub table of exact integer squared distances from the
    * probe's sub-vectors to every codebook centroid is built DRIVER-SIDE
    * (bounded: m·ksub longs per probe) and broadcast; each corpus row's
    * approximate distance is then m table lookups + m−1 adds — never a
    * full-dim scan of the original vectors, which is the PQ serving
    * contract (the corpus is represented by its codes alone). Per-probe
    * top-k is the bounded heap aggregate ([[graft.plans.TopKByLongAsc]],
    * r16). Ties break by vec_id, so results are total-ordered and
    * oracle-replayable. Returns (probe_id, rnk, vec_id, adist).
    *
    * NOTE: this scans the FULL code table per probe (broadcast probes ×
    * corpus codes) — it is the PQ-without-IVF measurement arm and the
    * recall baseline for IVFADC. In production use [[ivfPqTopKBatchQ]],
    * which restricts each probe to its nProbe nearest cells. */
  def pqTopKBatchQ(emb: DataFrame, idCol: String, vecCol: String,
                   probeIds: Seq[Long], k: Int,
                   m: Int = 8, ksub: Int = 16, iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pids = probeIds.distinct
    val (books, codes) = pqIndexQ(emb, idCol, vecCol, m, ksub, iters)
    val probeVecRows = emb.filter(col(idCol).isInCollection(pids))
      .select(col(idCol), quantize(col(vecCol)))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val probeVecs: Map[Long, Array[Long]] = probeVecRows.toMap
    require(probeVecs.keySet == pids.toSet,
      s"probe ids not in the corpus: ${pids.filterNot(probeVecs.contains).mkString(", ")}")
    require(probeVecRows.length == pids.length,
      s"duplicate corpus rows for probe ids: ${probeVecRows.map(_._1).groupBy(identity).collect { case (id, g) if g.length > 1 => id }.mkString(", ")}")
    // ADC tables: dts(j)(cell) = |probe_sub_j − centroid|²; cells that lost
    // all members leave 0-filled holes no code can reference (argmin only
    // ever returns surviving cell ids)
    val probeRows: Seq[(Long, Seq[Seq[Long]])] = pids.map { pid =>
      val pv = probeVecs(pid)
      val dsub = pv.length / m
      val dts: Seq[Seq[Long]] = (0 until m).map { j =>
        val dt = new Array[Long](books(j).map(_._1).max + 1)
        books(j).foreach { case (cid, c) =>
          var d = 0L; var i = 0
          while (i < c.length) { val t = c(i) - pv(j * dsub + i); d += t * t; i += 1 }
          dt(cid) = d
        }
        dt.toSeq
      }
      (pid, dts)
    }
    val probeTbl = probeRows.toDF("probe_id", "dts")
    val adist = (0 until m)
      .map(j => element_at(element_at(col("dts"), j + 1), col(s"c$j") + 1))
      .reduce(_ + _)
    // per-probe top-k via the bounded heap aggregate (r16, guide §5 —
    // the replaced rank-filtered window sorted the full code-table scan)
    codes.withColumnRenamed("id", "vec_id")
      .crossJoin(broadcast(probeTbl))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adist", adist)
      .groupBy("probe_id")
      .agg(graft.plans.TopKExpressions
        .topKByLongAsc(col("adist"), col("vec_id"), k).as("__nbrs"))
      .select(col("probe_id"), posexplode(col("__nbrs")).as(Seq("__pos", "__nbr")))
      .select(col("probe_id"), (col("__pos") + 1).cast("long").as("rnk"),
        col("__nbr.id").as("vec_id"), col("__nbr.dist").as("adist"))
  }

  /** The deterministic ±1 sign matrix for [[jlTopKBatchQ]] — sign(d, j)
    * from the md5 parity of "d#j" (j 0-based input dim), so the oracle
    * recomputes every entry with SQL md5. Signed random projection is
    * the Johnson–Lindenstrauss / Achlioptas-2003 construction (public
    * literature): a dense ±1 matrix preserves pairwise L2 up to
    * 1 ± ε with out-dims = O(log n / ε²), and costs only adds. */
  private[graft] def jlSigns(outDims: Int, inDims: Int): Array[Array[Long]] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Array.tabulate(outDims, inDims) { (d, j) =>
      if (java.lang.Long.parseLong(md5hex(s"$d#$j").substring(0, 6), 16) % 2 == 0)
        1L
      else -1L
    }
  }

  /** Batch top-k in the Johnson–Lindenstrauss projected space: quantized
    * vectors project through the deterministic ±1 matrix (each output
    * dim is ONE `long_dot` against a literal sign vector — adds only, no
    * multiplies at ±1, fully codegen'd), then exact squared-L2 ranking
    * in the 16-d space. The scale point: the projection is a narrow
    * per-row map fused into the scan, and every downstream distance
    * costs outDims instead of dim multiply-adds — the cheap-serving
    * sibling of SQ8 (which compresses STORAGE; JL compresses COMPUTE). */
  def jlTopKBatchQ(emb: DataFrame, idCol: String, vecCol: String,
                   probeIds: Seq[Long], k: Int, outDims: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val inDims = emb.select(size(col(vecCol))).head().getInt(0)
    val signs = jlSigns(outDims, inDims)
    def project(vq: Column): Column = array((0 until outDims).map { d =>
      graft.plans.VectorExpressions.longDot(vq, typedLit(signs(d).toSeq))
    }: _*)
    val pids = probeIds.distinct
    val probeVecRows = emb.filter(col(idCol).isInCollection(pids))
      .select(col(idCol), project(quantize(col(vecCol))))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
    // fail loudly (the bruteL2TopKBatchQ convention): a missing probe id
    // would silently drop its result group, a duplicate corpus row would
    // silently double-count every candidate
    require(probeVecRows.map(_._1).toSet == pids.toSet,
      s"probe ids not in the corpus: ${pids.filterNot(probeVecRows.map(_._1).toSet).mkString(", ")}")
    require(probeVecRows.length == pids.length,
      s"duplicate corpus rows for probe ids: ${probeVecRows.map(_._1).groupBy(identity).collect { case (id, g) if g.length > 1 => id }.mkString(", ")}")
    val probeTbl = probeVecRows.toSeq.toDF("probe_id", "pjv")
    emb.select(col(idCol).as("vec_id"), project(quantize(col(vecCol))).as("jv"))
      .crossJoin(broadcast(probeTbl))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("dist", graft.plans.VectorExpressions.longDist2(col("jv"), col("pjv")))
      .groupBy("probe_id")
      .agg(graft.plans.TopKExpressions
        .topKByLongAsc(col("dist"), col("vec_id"), k).as("__nbrs"))
      .select(col("probe_id"), posexplode(col("__nbrs")).as(Seq("__pos", "__nbr")))
      .select(col("probe_id"), (col("__pos") + 1).cast("long").as("rnk"),
        col("__nbr.id").as("vec_id"), col("__nbr.dist").as("dist"))
  }

  /** Batch brute-force EXACT squared-L2 top-k — the uncompressed baseline
    * [[pqTopKBatchQ]]'s recall is measured against (PQ approximates
    * squared L2, so the baseline must rank by the same metric; the cosine
    * twin is [[bruteTopKBatchQ]]). Integer-exact, total-ordered. */
  def bruteL2TopKBatchQ(emb: DataFrame, idCol: String, vecCol: String,
                        probeIds: Seq[Long], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pids = probeIds.distinct
    val probeVecRows = emb.filter(col(idCol).isInCollection(pids))
      .select(col(idCol), quantize(col(vecCol)))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
    require(probeVecRows.map(_._1).toSet == pids.toSet,
      s"probe ids not in the corpus: ${pids.filterNot(probeVecRows.map(_._1).toSet).mkString(", ")}")
    require(probeVecRows.length == pids.length,
      s"duplicate corpus rows for probe ids: ${probeVecRows.map(_._1).groupBy(identity).collect { case (id, g) if g.length > 1 => id }.mkString(", ")}")
    val probeTbl = probeVecRows.toSeq.toDF("probe_id", "pvq")
    emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("vq"))
      .crossJoin(broadcast(probeTbl))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("dist", graft.plans.VectorExpressions.longDist2(col("vq"), col("pvq")))
      .groupBy("probe_id")
      .agg(graft.plans.TopKExpressions
        .topKByLongAsc(col("dist"), col("vec_id"), k).as("__nbrs"))
      .select(col("probe_id"), posexplode(col("__nbrs")).as(Seq("__pos", "__nbr")))
      .select(col("probe_id"), (col("__pos") + 1).cast("long").as("rnk"),
        col("__nbr.id").as("vec_id"), col("__nbr.dist").as("dist"))
  }

  /** Per-dimension SQ8 stats over the quantized corpus: (mins, ranges),
    * each `dim` longs. One narrow posexplode + a map-side-combinable
    * aggregate on the DIMENSION key (≤ a few hundred groups) — the
    * driver holds 2·dim longs, the bounded-model-state pattern. */
  private[graft] def sq8StatsQ(q: DataFrame): (Array[Long], Array[Long]) = {
    val rows = q
      .select(posexplode(col("vq")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy("pos")
      .collect()
    val mins = rows.map(_.getLong(1))
    val ranges = rows.zip(mins).map { case (r, mn) => r.getLong(2) - mn }
    (mins, ranges)
  }

  /** Batch SQ8 search (FAISS ScalarQuantizer QT_8bit shape): the corpus
    * is stored as per-dimension uint8 codes against global (min, range)
    * stats — 8 bits/dim, the standard 4× memory cut before PQ — and
    * distances run on the integer RECONSTRUCTION dq = min + code·range/255
    * (decode is one fused kernel pass per corpus row, then the standard
    * exact integer L2 against the broadcast probe batch; never the
    * original vectors — the SQ serving contract). Per-probe top-k is the
    * bounded heap aggregate ([[graft.plans.TopKByLongAsc]], r16); ties
    * break by vec_id. Integer-exact end to end: stats, encode (floor div on
    * non-negative operands), decode, distance — the oracle replays all
    * four stages relationally. Returns (probe_id, rnk, vec_id, adist).
    *
    * Scale shape: stats are one dim-keyed aggregate (bounded driver
    * state: 2·dim longs riding into the encode/decode kernels as codegen
    * reference objects); encode+decode are row-local; the scan is
    * corpus × |probes ≤ 64| with nothing quadratic in the corpus. */
  def sq8TopKBatchQ(emb: DataFrame, idCol: String, vecCol: String,
                    probeIds: Seq[Long], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pids = probeIds.distinct
    val q = graft.CacheScope.cached(
      emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("vq")))
    val (mins, ranges) = sq8StatsQ(q)
    val codes = q.select(col("vec_id"),
      graft.plans.VectorExpressions.sq8Encode(col("vq"), mins, ranges).as("codes"))
    val probeVecRows = q.filter(col("vec_id").isInCollection(pids))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
    require(probeVecRows.map(_._1).toSet == pids.toSet,
      s"probe ids not in the corpus: ${pids.filterNot(probeVecRows.map(_._1).toSet).mkString(", ")}")
    val probeTbl = probeVecRows.toSeq.toDF("probe_id", "pvq")
    codes
      .select(col("vec_id"),
        graft.plans.VectorExpressions.sq8Decode(col("codes"), mins, ranges).as("dq"))
      .crossJoin(broadcast(probeTbl))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adist",
        graft.plans.VectorExpressions.longDist2(col("dq"), col("pvq")))
      .groupBy("probe_id")
      .agg(graft.plans.TopKExpressions
        .topKByLongAsc(col("adist"), col("vec_id"), k).as("__nbrs"))
      .select(col("probe_id"), posexplode(col("__nbrs")).as(Seq("__pos", "__nbr")))
      .select(col("probe_id"), (col("__pos") + 1).cast("long").as("rnk"),
        col("__nbr.id").as("vec_id"), col("__nbr.dist").as("adist"))
  }

  /** IVF-PQ index (FAISS IVFADC — Jégou et al. TPAMI 2011 §IV, the
    * production structure): a coarse IVF quantizer partitions the corpus
    * into `nCells` cells, and ONE global product quantizer (trained on
    * coarse RESIDUALS vq − centroid(cell), which are far more isotropic
    * than raw vectors — the paper's key accuracy insight) encodes every
    * vector as `m` sub-codes. Storage per vector = cell id + m codes; at
    * search time only probed cells are scanned and distances come from
    * per-(probe, cell) ADC tables over the probe's residual.
    *
    * Build shape: ONE fused `argmin_residual` kernel pass does coarse
    * assignment + residual subtraction (no second corpus scan), then m
    * bounded [[lloydTrainQ]] loops train the codebooks on residual
    * sub-slices and one more row-local pass encodes. Bounded driver
    * state: nCells·dim + m·ksub·(dim/m) longs. Integer-exact end to end
    * (oracle-replayable, q_ann_ivfpq).
    *
    * Returns (coarseCentroids, codebooks, codes(id, cell, c0…c{m-1})). */
  def ivfPqIndexQ(emb: DataFrame, idCol: String, vecCol: String,
                  nCells: Int = 16, m: Int = 8, ksub: Int = 16,
                  iters: Int = 2, trainSample: Int = 0)
      : (Array[(Int, Array[Long])], Array[Array[(Int, Array[Long])]], DataFrame) = {
    val q = graft.CacheScope.cached(
      emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("vq")))
    val dim = q.select(size(col("vq"))).limit(1).collect()(0).getInt(0)
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val dsub = dim / m
    val coarse = lloydTrainQ(q, nCells, iters, trainSample)
    val sortedC = coarse.sortBy(_._1)
    // fused assign+residual; cached — feeds m codebook trainings + encode
    val ar = graft.CacheScope.cached(
      q.select(col("id"), graft.plans.VectorExpressions.argminResidual(
          col("vq"), sortedC.map(_._1), sortedC.map(_._2)).as("ar"))
        .select(col("id"), col("ar.cell").as("cell"), col("ar.res").as("res")))
    val books: Array[Array[(Int, Array[Long])]] = (0 until m).map { j =>
      lloydTrainQ(
        ar.select(col("id"), slice(col("res"), j * dsub + 1, dsub).as("vq")),
        ksub, iters, trainSample)
    }.toArray
    val codeCols = (0 until m).map { j =>
      val sorted = books(j).sortBy(_._1)
      graft.plans.VectorExpressions.argminCell(
        slice(col("res"), j * dsub + 1, dsub),
        sorted.map(_._1), sorted.map(_._2)).as(s"c$j")
    }
    (coarse, books, ar.select(col("id") +: col("cell") +: codeCols: _*))
  }

  /** Batch IVF-PQ search (IVFADC): per probe the top-`nProbe` coarse cells
    * are ranked DRIVER-SIDE against the bounded centroid matrix, and for
    * each probed cell an ADC table over the probe's residual w.r.t. THAT
    * cell's centroid is built and broadcast (nProbe·m·ksub longs per
    * probe). Candidates come from an EQUI-JOIN of the code table on the
    * cell id — only probed cells are ever scanned, the IVF contract —
    * and each candidate's distance is m table lookups. Per-probe top-k is
    * the rank-filtered window (map-side k-heap); ties break by vec_id.
    * Returns (probe_id, rnk, vec_id, adist), integer-exact. */
  def ivfPqTopKBatchQ(emb: DataFrame, idCol: String, vecCol: String,
                      probeIds: Seq[Long], k: Int,
                      nCells: Int = 16, m: Int = 8, ksub: Int = 16,
                      iters: Int = 2, nProbe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pids = probeIds.distinct
    val (coarse, books, codes) = ivfPqIndexQ(emb, idCol, vecCol, nCells, m, ksub, iters)
    val probeVecRows = emb.filter(col(idCol).isInCollection(pids))
      .select(col(idCol), quantize(col(vecCol)))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val probeVecs: Map[Long, Array[Long]] = probeVecRows.toMap
    require(probeVecs.keySet == pids.toSet,
      s"probe ids not in the corpus: ${pids.filterNot(probeVecs.contains).mkString(", ")}")
    require(probeVecRows.length == pids.length,
      s"duplicate corpus rows for probe ids: ${probeVecRows.map(_._1).groupBy(identity).collect { case (id, g) if g.length > 1 => id }.mkString(", ")}")
    def dist2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    // per (probe, probed cell): ADC tables over the probe's residual
    val probeRows: Seq[(Long, Int, Seq[Seq[Long]])] = pids.flatMap { pid =>
      val pv = probeVecs(pid)
      val dsub = pv.length / m
      val probed = coarse.map { case (cid, c) => (dist2(pv, c), cid, c) }
        .sortBy(t => (t._1, t._2)).take(nProbe)
      probed.map { case (_, cid, c) =>
        val rp = Array.tabulate(pv.length)(i => pv(i) - c(i))
        val dts: Seq[Seq[Long]] = (0 until m).map { j =>
          val dt = new Array[Long](books(j).map(_._1).max + 1)
          books(j).foreach { case (code, bc) =>
            var d = 0L; var i = 0
            while (i < bc.length) { val t = bc(i) - rp(j * dsub + i); d += t * t; i += 1 }
            dt(code) = d
          }
          dt.toSeq
        }
        (pid, cid, dts)
      }
    }
    val probeTbl = probeRows.toDF("probe_id", "cell", "dts")
    val adist = (0 until m)
      .map(j => element_at(element_at(col("dts"), j + 1), col(s"c$j") + 1))
      .reduce(_ + _)
    codes.withColumnRenamed("id", "vec_id")
      .join(broadcast(probeTbl), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adist", adist)
      .groupBy("probe_id")
      .agg(graft.plans.TopKExpressions
        .topKByLongAsc(col("adist"), col("vec_id"), k).as("__nbrs"))
      .select(col("probe_id"), posexplode(col("__nbrs")).as(Seq("__pos", "__nbr")))
      .select(col("probe_id"), (col("__pos") + 1).cast("long").as("rnk"),
        col("__nbr.id").as("vec_id"), col("__nbr.dist").as("adist"))
  }

  /** Quantized IVF probe: rank cells by integer distance from the quantized
    * probe (tie → lowest cell), semi-join the `nProbe` nearest cells'
    * members, re-rank by quantized-exact cosine. Deterministic and
    * oracle-replayable end to end. */
  def ivfTopKQ(emb: DataFrame, idCol: String, vecCol: String,
               centroids: Array[(Int, Array[Long])], assignments: DataFrame,
               probeId: Long, k: Int, nProbe: Int = 4): DataFrame = {
    val probeVec: Array[Long] = emb.filter(col(idCol) === probeId)
      .select(quantize(col(vecCol))).collect()(0).getSeq[Long](0).toArray
    val cells = centroids
      .map { case (cid, c) =>
        var d = 0L; var i = 0
        while (i < c.length) { val t = c(i) - probeVec(i); d += t * t; i += 1 }
        (d, cid)
      }
      .sortBy(identity).take(nProbe).map(_._2).toSeq
    val candidates = assignments.filter(col("cell").isInCollection(cells))
      .select(col("id").as("__cand"))
    val pArr = array(probeVec.toIndexedSeq.map(lit): _*)
    val pNorm = math.sqrt(probeVec.foldLeft(0L)((acc, x) => acc + x * x).toDouble)
    emb.join(candidates, col(idCol) === col("__cand"), "left_semi")
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), quantize(col(vecCol)).as("vq"))
      .select(col(idCol),
        (graft.plans.VectorExpressions.longDot(col("vq"), pArr).cast("double") /
          (sqrt(graft.plans.VectorExpressions.longDot(col("vq"), col("vq"))
            .cast("double")) * pNorm)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch IVF search — the SERVING shape: a whole probe SET retrieves
    * top-k neighbors through one shared index scan, instead of one job
    * per probe. Per probe the `nProbe` nearest cells are picked
    * driver-side from the (bounded, already-collected) centroid matrix;
    * the (probe, cell) table — |probes|·nProbe rows — broadcasts onto the
    * cell-assigned corpus, so each corpus row is touched once per probe
    * cell-hit, never per probe. The per-probe top-k is the bounded heap
    * aggregate ([[graft.plans.TopKByScore]], k pairs of state per probe,
    * partial map-side — r16; the rank-filtered window it replaces sorted
    * the full candidate stream). Quantized-exact end to end, same
    * conventions as [[ivfTopKQ]].
    *
    * Returns (probe_id, rnk, vec_id, cosine), k rows per probe. */
  def ivfTopKBatchQ(emb: DataFrame, idCol: String, vecCol: String,
                    probeIds: Seq[Long], k: Int,
                    nCells: Int = 16, iters: Int = 2,
                    nProbe: Int = 4): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pids = probeIds.distinct // a repeated id would duplicate routing rows
    // NOTE: the index is trained exactly once, inside ivfTopKBatchVecsQ —
    // this wrapper only resolves probe ids to corpus vectors (an r14
    // refactor briefly left a second, dead ivfIndexQ call here, doubling
    // the Lloyd training jobs for q_ann_batch/q_crossmodal_knn)
    val probeVecRows =
      emb.filter(col(idCol).isInCollection(pids))
        .select(col(idCol), quantize(col(vecCol)))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val probeVecs: Map[Long, Array[Long]] = probeVecRows.toMap
    require(probeVecs.keySet == pids.toSet,
      s"probe ids not in the corpus: ${pids.filterNot(probeVecs.contains).mkString(", ")}")
    // duplicated corpus ids would silently pick one of several vectors per
    // probe via toMap — fail loudly instead (review r11, bruteTopKBatchQ twin)
    require(probeVecRows.length == pids.length,
      s"duplicate corpus rows for probe ids: ${probeVecRows.map(_._1).groupBy(identity).collect { case (id, g) if g.length > 1 => id }.mkString(", ")}")
    ivfTopKBatchVecsQ(emb, idCol, vecCol,
      pids.map(pid => pid -> probeVecs(pid)), k, nCells, iters, nProbe,
      excludeProbeId = true)
  }

  /** [[ivfTopKBatchQ]] with EXTERNAL probe vectors (already quantized) —
    * the cross-modal retrieval shape (round 14): probes that are not
    * corpus rows (e.g. image block-luminance embeddings projected into
    * the text-embedding space) search the same shared IVF index through
    * the identical routing/re-rank plan. `excludeProbeId = false` is the
    * cross-modal setting: probe ids live in a DIFFERENT id space, so an
    * accidental id collision with a corpus row must not drop that row. */
  def ivfTopKBatchVecsQ(emb: DataFrame, idCol: String, vecCol: String,
                        probes: Seq[(Long, Array[Long])], k: Int,
                        nCells: Int = 16, iters: Int = 2,
                        nProbe: Int = 4,
                        excludeProbeId: Boolean = true): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(probes.map(_._1).distinct.length == probes.length,
      "duplicate probe ids")
    val (cents, _) = ivfIndexQ(emb, idCol, vecCol, nCells, iters)
    val sorted = cents.sortBy(_._1)
    // nearest nProbe cells per probe — |probes|·nCells·d driver-side integer
    // ops over data already on the driver; tie → lowest cell id
    val probeRows: Seq[(Long, Int, Seq[Long], Double)] = probes.flatMap {
      case (pid, pv) =>
        val pn = math.sqrt(pv.foldLeft(0L)((acc, x) => acc + x * x).toDouble)
        sorted.map { case (cid, c) =>
          var d = 0L; var i = 0
          while (i < c.length) { val t = c(i) - pv(i); d += t * t; i += 1 }
          (d, cid)
        }.sortBy(identity).take(nProbe)
          .map { case (_, cid) => (pid, cid, pv.toSeq, pn) }
    }
    val probeTbl = probeRows.toDF("probe_id", "cell", "pvq", "pnrm")
    val members = emb
      .select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("vq"))
      .withColumn("cell", graft.plans.VectorExpressions
        .argminCell(col("vq"), sorted.map(_._1), sorted.map(_._2)))
    // nrm/pnrm > 0 guards: a vector whose components all quantize to 0
    // would score 0/0 = NaN, and NaN sorts ABOVE every real cosine in
    // both engines — a degenerate vector must not displace real
    // neighbors (same guard as semanticDedup; mirrored in the oracle).
    // Per-probe top-k is the bounded heap aggregate (r16, guide §5) —
    // the rank-filtered window it replaces (WindowGroupLimit) sorted the
    // full |probes|·nProbe·(n/nCells)-row candidate stream; the aggregate
    // holds k pairs per probe and never sorts candidates. Identical rows:
    // same (cosine DESC, vec_id ASC) order, pinned in OperatorsSpec.
    members.join(broadcast(probeTbl), Seq("cell"))
      .filter(
        (if (excludeProbeId) col("vec_id") =!= col("probe_id") else lit(true))
          && col("pnrm") > 0d)
      .withColumn("nrm", sqrt(graft.plans.VectorExpressions
        .longDot(col("vq"), col("vq")).cast("double")))
      .filter(col("nrm") > 0d)
      .withColumn("cosine",
        graft.plans.VectorExpressions.longDot(col("vq"), col("pvq")).cast("double") /
          (col("nrm") * col("pnrm")))
      .groupBy("probe_id")
      .agg(graft.plans.TopKExpressions
        .topKByScore(col("cosine"), col("vec_id"), k).as("__nbrs"))
      .select(col("probe_id"), posexplode(col("__nbrs")).as(Seq("__pos", "__nbr")))
      .select(col("probe_id"), (col("__pos") + 1).cast("long").as("rnk"),
        col("__nbr.id").as("vec_id"), col("__nbr.score").as("cosine"))
  }

  /** Batch BRUTE-FORCE top-k — the exact baseline [[ivfTopKBatchQ]] is
    * measured against (recall@k = overlap of the two result sets). Same
    * conventions as the IVF batch: quantized-exact scoring, zero-norm
    * guards, (probe_id, rnk, vec_id, cosine) output, per-probe top-k via
    * the bounded heap aggregate ([[graft.plans.TopKByScore]], r16).
    * The probe table broadcasts; each corpus row is scored against every
    * probe (that is the point of the baseline), so keep the probe set
    * bounded. */
  def bruteTopKBatchQ(emb: DataFrame, idCol: String, vecCol: String,
                      probeIds: Seq[Long], k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val pids = probeIds.distinct
    val probeRows: Seq[(Long, Seq[Long], Double)] =
      emb.filter(col(idCol).isInCollection(pids))
        .select(col(idCol), quantize(col(vecCol)))
        .collect()
        .map { r =>
          val pv = r.getSeq[Long](1)
          val pn = math.sqrt(pv.foldLeft(0L)((acc, x) => acc + x * x).toDouble)
          (r.getLong(0), pv, pn)
        }.toSeq
    require(probeRows.map(_._1).toSet == pids.toSet,
      s"probe ids not in the corpus: ${pids.filterNot(probeRows.map(_._1).toSet).mkString(", ")}")
    // fail loudly on duplicated corpus ids among the probes (review r11):
    // a duplicated vec_id passes the set check but yields duplicate probe
    // rows, which would silently duplicate candidates in the top-k
    require(probeRows.length == pids.length,
      s"duplicate corpus rows for probe ids: ${probeRows.map(_._1).groupBy(identity).collect { case (id, g) if g.length > 1 => id }.mkString(", ")}")
    val probeTbl = probeRows.toDF("probe_id", "pvq", "pnrm")
    // per-probe top-k via the bounded heap aggregate (r16, guide §5) —
    // see ivfTopKBatchVecsQ; the brute baseline scores n·|probes| rows,
    // which the replaced WindowGroupLimit sorted in full
    emb.select(col(idCol).as("vec_id"), quantize(col(vecCol)).as("vq"))
      .crossJoin(broadcast(probeTbl))
      .filter(col("vec_id") =!= col("probe_id") && col("pnrm") > 0d)
      .withColumn("nrm", sqrt(graft.plans.VectorExpressions
        .longDot(col("vq"), col("vq")).cast("double")))
      .filter(col("nrm") > 0d)
      .withColumn("cosine",
        graft.plans.VectorExpressions.longDot(col("vq"), col("pvq")).cast("double") /
          (col("nrm") * col("pnrm")))
      .groupBy("probe_id")
      .agg(graft.plans.TopKExpressions
        .topKByScore(col("cosine"), col("vec_id"), k).as("__nbrs"))
      .select(col("probe_id"), posexplode(col("__nbrs")).as(Seq("__pos", "__nbr")))
      .select(col("probe_id"), (col("__pos") + 1).cast("long").as("rnk"),
        col("__nbr.id").as("vec_id"), col("__nbr.score").as("cosine"))
  }

  /** Corpus-wide self-kNN graph (round 13) — every row's top-`k`
    * approximate neighbors, with NO driver-side probe routing: unlike the
    * serving-shaped batch APIs ([[ivfTopKBatchQ]] and friends route a
    * BOUNDED probe batch driver-side, the right contract for query
    * serving), here the probe set IS the corpus, so cell routing must
    * itself be distributed. This is the input to graph-based semantic
    * dedup and kNN-graph construction at scale.
    *
    * Shape:
    *   1. centroids from the shared quantized Lloyd loop ([[lloydTrainQ]]
    *      — the ONLY driver-side state, nCells rows);
    *   2. ONE cached kernel pass assigns each row its `nProbe` nearest
    *      cells via [[graft.plans.VectorExpressions.topCells]] (the
    *      argmin_cell kernel extended to top-p; element 0 is exactly the
    *      member-side argmin assignment, so the same pass yields both
    *      sides);
    *   3. probe side explodes the cell array (|n|·nProbe rows), member
    *      side keeps cells[0]; the candidate set is their EQUI-JOIN on
    *      cell — per-cell-bucketed, never all-pairs (the shuffle carries
    *      each side hashed by cell; AQE's skew split handles a hot cell);
    *   4. quantized-exact cosine re-rank; per-src top-k is a BOUNDED
    *      HEAP AGGREGATE ([[graft.plans.TopKByScore]], k pairs of state
    *      per src, partial map-side) + posexplode. The r15-measured
    *      alternative — rank-filtered window, planned as
    *      WindowGroupLimit — still SORTS the full candidate stream on
    *      both sides of the src shuffle: 52 GB memory + 22 GB disk spill
    *      at the 2 M-vector fixture for state that is only ever k rows
    *      per src (opt guide §5). Row-for-row identical output: the heap
    *      order replays (cosine DESC, dst ASC) with
    *      java.lang.Double.compare ties, pinned in OperatorsSpec.
    *
    * Candidate volume is n·nProbe·(n/nCells) rows — nCells is the knob
    * that holds per-cell population (and so per-row candidate cost)
    * constant as the corpus grows, exactly like [[semanticDedup]]'s k.
    * At 100 TB the vq payload on both join sides is the dominant shuffle
    * mass; the PQ-code variant (join codes, ADC re-rank — compose with
    * [[pqIndexQ]]) trades exactness for ~16× less shuffle when that
    * matters. Returns (src, rnk, dst, cosine), ≤ k rows per src
    * (zero-norm rows score no edges — same NaN guard as the batch APIs).
    *
    * Reference for the operator inventory: the reference engine exposes
    * no ANN surface at all (`fastx_parsers.py` is records+expressions);
    * this is extension territory per the round-11/12 verdicts. */
  /** Adaptive cell count for [[knnGraphQ]]: per-cell population ≈ 312, so
    * the candidate join output is n·nProbe·312 rows — LINEAR in n (at
    * fixed nCells it is n²·nProbe/nCells, which was measured unrunnable
    * at 200 k vectors: 2.5 B candidate rows ≈ 100 GB of window-sort
    * spill, BASELINE 13b). Floor 32 keeps every corpus ≤ 9 984 rows on
    * the fixed, oracle-replayable k — both verification SFs (500 / 5 000
    * embeddings) resolve to exactly 32, so the adaptive rule changes no
    * oracle hash. The same regime-vs-oracle split as [[semanticDedup]]'s
    * adaptive k. */
  def knnCellsFor(n: Long): Int = math.max(32L, n / 312L).toInt

  def knnGraphQ(emb: DataFrame, idCol: String, vecCol: String,
                k: Int, nCells: Int = 0, iters: Int = 2,
                nProbe: Int = 2, nRows: Long = -1L): DataFrame = {
    require(k >= 1 && nProbe >= 1, s"k ($k) and nProbe ($nProbe) must be >= 1")
    // nCells <= 0 (the DEFAULT) derives the cell count adaptively from the
    // corpus size — the fixed-32 default was the measured scale trap
    // (BASELINE 13b: 32 cells at 200 k vectors = 2.5 B candidate rows,
    // ~100 GB window-sort spill, unrunnable). Same sentinel contract as
    // [[semanticDedup]]: callers that already know n pass `nRows` to keep
    // construction free of the extra count() action.
    val cells =
      if (nCells > 0) nCells
      else knnCellsFor(if (nRows >= 0L) nRows else emb.count())
    val q = emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("vq"))
    // trainSample deliberately stays 0 (full-corpus Lloyd): the r15
    // optimization round A/B'd semanticDedup's sample-bounded derivation
    // here and measured NO win at any scale — oracle SFs are below the
    // sample floor by construction (wash), and at the 1000×
    // embeddings-only fixture the cost is the candidate join + re-rank
    // (52 GB spill), not the training passes. Sampling would only add
    // the TakeOrdered machinery. Revisit if a future fixture makes
    // training dominant.
    val cents = lloydTrainQ(q, cells, iters, trainSample = 0)
    val sorted = cents.sortBy(_._1)
    // one kernel pass feeds BOTH the probe and member branches
    val assigned = graft.CacheScope.cached(q.select(col("id"), col("vq"),
      graft.plans.VectorExpressions.topCells(
        col("vq"), sorted.map(_._1), sorted.map(_._2), nProbe).as("cells")))
    val members = assigned.select(col("id").as("dst"), col("vq").as("dvq"),
      element_at(col("cells"), 1).as("cell"))
    val probes = assigned.select(col("id").as("src"), col("vq").as("svq"),
      explode(col("cells")).as("cell"))
    members.join(probes, Seq("cell"))
      .filter(col("src") =!= col("dst"))
      .withColumn("snrm", sqrt(graft.plans.VectorExpressions
        .longDot(col("svq"), col("svq")).cast("double")))
      .withColumn("dnrm", sqrt(graft.plans.VectorExpressions
        .longDot(col("dvq"), col("dvq")).cast("double")))
      .filter(col("snrm") > 0d && col("dnrm") > 0d)
      .withColumn("cosine",
        graft.plans.VectorExpressions.longDot(col("svq"), col("dvq"))
          .cast("double") / (col("snrm") * col("dnrm")))
      .groupBy("src")
      .agg(graft.plans.TopKExpressions
        .topKByScore(col("cosine"), col("dst"), k).as("__nbrs"))
      .select(col("src"), posexplode(col("__nbrs")).as(Seq("__pos", "__nbr")))
      .select(col("src"), (col("__pos") + 1).cast("long").as("rnk"),
        col("__nbr.id").as("dst"), col("__nbr.score").as("cosine"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — public literature): k-means-cluster the embedding
    * corpus; within each cluster, for every pair with quantized cosine ≥
    * `minCosine`, drop the member CLOSER to the cluster centroid — the
    * paper's keep-rule (it keeps low-centroid-similarity examples; here
    * "similarity to centroid" is the exact integer squared L2 distance the
    * assignment already computes, larger distance = kept). Distance ties
    * drop the larger id, so the rule is a deterministic total order and
    * the whole operator stays oracle-replayable. Returns one row per
    * vector: (id, cell, kept) with kept ∈ {0, 1}.
    *
    * Scale shape: candidate generation is the cluster equi-join, NEVER
    * all-pairs — `nCells` is the knob that bounds cell population (the
    * paper runs k = 50 000 on 1.1e9 embeddings, ~20 k per cell).
    * `nCells <= 0` (the default) derives it from the corpus:
    * k = max(16, ceil(n / 20000)) — the paper's ~20 k-per-cell ratio with
    * a floor that keeps small fixtures on a fixed, oracle-replayable k —
    * so the per-cell pair count stays constant BY DEFAULT as the corpus
    * grows, instead of by operator knob. (The ratio is the PAPER's
    * quality choice — large cells catch more cross-pair near-dups. Pure
    * wall time minimizes k·n·d assignment + n·(n/k)·d pairing at
    * k ≈ √n, i.e. smaller cells; pass nCells explicitly when optimizing
    * for time over recall — both regimes measured in BASELINE.md.) `trainSample < 0` (the default)
    * likewise derives the Lloyd training sample as max(64·k, 131072)
    * (FAISS-recommended ≥ 64 points per centroid; the floor keeps every
    * corpus ≤ 131072 rows on exact full-corpus training, which is what
    * keeps the oracle-SF fixtures bit-identical to the unsampled build);
    * `trainSample = 0` forces full-corpus training. The pairwise stage is
    * quadratic only within a cell; per-row norms are computed once BEFORE
    * the self-join (a B-member cell reuses each norm ~B times). Centroids
    * are the one driver-side collect — nCells rows, bounded by
    * construction (same as [[ivfIndexQ]]). The clustering is the
    * quantized integer Lloyd loop, so the whole operator is
    * hash-oracle-checkable end to end (the sampled-training path has its
    * own oracle replay in q_semdedup_sampled). */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
                    nCells: Int = 0, iters: Int = 2,
                    minCosine: Double = 0.3,
                    trainSample: Int = -1,
                    nRows: Long = -1L): DataFrame = {
    // adaptive k needs the corpus size: callers that already know n pass
    // it via nRows so construction stays action-free (review r11 — the
    // default nCells=0 path otherwise runs one eager count() here)
    val k =
      if (nCells > 0) nCells
      else {
        val n = if (nRows >= 0L) nRows else emb.count()
        math.max(16L, (n + 19999L) / 20000L).toInt
      }
    val sample =
      if (trainSample >= 0) trainSample
      else math.min(math.max(64L * k, 131072L), Int.MaxValue.toLong).toInt
    val (cents, _) = ivfIndexQ(emb, idCol, vecCol, k, iters, sample)
    // the centroid matrix is already in hand — assign cells row-locally
    // with the argmin kernel instead of shuffle-joining the corpus against
    // the assignments plan (one narrow pass, zero join; bit-identical by
    // construction, it IS ivfIndexQ's assignment expression)
    val sorted = cents.sortBy(_._1)
    val members = graft.CacheScope.cached(
      emb.select(col(idCol).as("id"), quantize(col(vecCol)).as("vq"))
        .withColumn("ac", graft.plans.VectorExpressions
          .argminCellDist(col("vq"), sorted.map(_._1), sorted.map(_._2)))
        .select(col("id"), col("vq"),
          col("ac.cell").as("cell"), col("ac.d").as("cdist"))
        .withColumn("nrm", sqrt(graft.plans.VectorExpressions
          .longDot(col("vq"), col("vq")).cast("double"))))
    // nrm > 0 guard: a vector whose components all quantize to 0 has
    // cosine 0/0 = NaN to every mate, and NaN orders above minCosine in
    // BOTH engines — without the guard a degenerate vector would silently
    // drop its whole cell (mirrored in the oracle)
    val dropped = members.as("a").join(members.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id") &&
          col("a.nrm") > 0d && col("b.nrm") > 0d)
      .filter(graft.plans.VectorExpressions.longDot(col("a.vq"), col("b.vq"))
        .cast("double") / (col("a.nrm") * col("b.nrm")) >= minCosine)
      // drop the pair-member closer to the centroid; equal distance →
      // drop the larger id (a.id < b.id here, so 'otherwise' covers ties)
      .select(when(col("a.cdist") < col("b.cdist"), col("a.id"))
        .otherwise(col("b.id")).as("id"))
      .distinct()
    members.join(dropped.withColumn("__drop", lit(1L)), Seq("id"), "left")
      .select(col("id"), col("cell"),
        when(col("__drop").isNotNull, lit(0L)).otherwise(lit(1L)).as("kept"))
  }

  /** Incremental SEMANTIC dedup (round 12) — the embedding-space analog of
    * [[Dedup.incrementalStatus]], and the continuous-ingestion shape of
    * [[semanticDedup]]: a new `batch` arrives against a `standing` corpus;
    * every batch vector is labeled `near_dup` (quantized cosine ≥
    * `minCosine` vs SOME standing member of its cell, or vs a smaller-id
    * batch member of its cell — the asymmetric admission ordering) or
    * `admitted`. Standing vectors are NEVER paired against each other:
    * that work was done when the corpus was built.
    *
    * The cell structure is the frozen quantized-Lloyd index
    * ([[ivfIndexQ]], optionally sample-trained) built over
    * corpus ∪ batch — at real scale the index pre-exists and only the
    * batch assignment is computed fresh; training here keeps the operator
    * self-contained AND oracle-replayable through the shared Lloyd chain.
    *
    * Returns (id, status) for every batch row; status ∈
    * {near_dup, admitted}.
    *
    * Scale shape: both assignments are row-local `argmin_cell` kernel
    * passes over the broadcast centroid matrix (no join against an
    * assignments plan); the pairing join is PROBE-SIDE-ONLY — the cached
    * batch side is the join's probe relation, so candidate fan-out is
    * |batch cell rows| × cell density, never corpus². Norms are computed
    * once per row before the join; zero-norm rows are excluded on both
    * sides (the NaN-orders-above-threshold guard shared with
    * [[semanticDedup]]). */
  def semanticIncrementalStatus(standing: DataFrame, batch: DataFrame,
                                idCol: String, vecCol: String,
                                nCells: Int = 0, iters: Int = 2,
                                minCosine: Double = 0.3,
                                trainSample: Int = 0,
                                nRows: Long = -1L): DataFrame = {
    val uni = standing.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .unionByName(batch.select(col(idCol).as("id"), col(vecCol).as("__v")))
    // nCells <= 0: derive k from the union size with the SemDeDup paper's
    // ~20k/cell ratio, floored at the legacy 32 — the same scale-adaptive
    // defaulting semanticDedup got in r11. Within-cell pairing is n²/k by
    // shape, so a FIXED k degenerates as the corpus grows (the r11
    // q_semdedup_sampled k=8 lesson, re-hit by the 1000× sweep at k=32:
    // 62.5k-member cells). At the oracle SFs (≤ 5k vectors) the formula
    // resolves to exactly 32, so oracle literals are unchanged. Callers
    // that already know |standing ∪ batch| pass it via nRows (the footer-
    // metadata pattern — Tables.parquetRowCount) so construction stays
    // action-free; the count() is only the self-contained fallback.
    val k =
      if (nCells > 0) nCells
      else math.max(32,
        math.ceil((if (nRows >= 0L) nRows else uni.count()) / 20000.0).toInt)
    // a bounded training sample must still cover the (possibly adaptive)
    // seed set — scale it to 3 points per centroid when k outgrows it
    // (at the oracle SFs k = 32 ⇒ 3k = 96, the query's literal, so
    // oracle replays are unchanged)
    val ts = if (trainSample > 0) math.max(trainSample, 3 * k) else trainSample
    val (cents, _) = ivfIndexQ(uni, "id", "__v", k, iters, ts)
    val sorted = cents.sortBy(_._1)
    def prep(df: DataFrame): DataFrame =
      df.select(col(idCol).as("id"), quantize(col(vecCol)).as("vq"))
        .withColumn("cell", graft.plans.VectorExpressions
          .argminCell(col("vq"), sorted.map(_._1), sorted.map(_._2)))
        .withColumn("nrm", sqrt(graft.plans.VectorExpressions
          .longDot(col("vq"), col("vq")).cast("double")))
    // the batch side feeds the pair join (as probes), the mate union, and
    // the final status join — cache so quantize+assign runs once
    val probes = graft.CacheScope.cached(prep(batch))
    val mates = prep(standing).withColumn("__corp", lit(true))
      .unionByName(probes.withColumn("__corp", lit(false)))
    val qdot = graft.plans.VectorExpressions.longDot _
    val dropped = mates.as("a").join(probes.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") =!= col("b.id") &&
          (col("a.__corp") || col("a.id") < col("b.id")) &&
          col("a.nrm") > 0d && col("b.nrm") > 0d)
      .filter(qdot(col("a.vq"), col("b.vq")).cast("double") /
        (col("a.nrm") * col("b.nrm")) >= minCosine)
      .select(col("b.id").as("id")).distinct()
    probes.select(col("id"))
      .join(dropped.withColumn("__drop", lit(1L)), Seq("id"), "left")
      .select(col("id"),
        when(col("__drop").isNotNull, lit("near_dup"))
          .otherwise(lit("admitted")).as("status"))
  }

  /** IVF search: probe the `nProbe` nearest cells only, exact cosine
    * re-rank inside them — the scale path when brute force is too wide. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              centroids: Array[(Int, Array[Double])], assignments: DataFrame,
              probeId: Long, k: Int, nProbe: Int = 4): DataFrame = {
    val probeVec = emb.filter(col(idCol) === probeId)
      .select(col(vecCol)).collect()(0).getSeq[Float](0).map(_.toDouble).toArray
    val cells = centroids
      .map { case (cid, c) =>
        val d = c.zip(probeVec).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, cid)
      }
      .sortBy(identity).take(nProbe).map(_._2).toSeq
    val candidates = assignments.filter(col("cell").isInCollection(cells))
      .select(col("id").as(idCol + "__c"))
    val probe = broadcast(emb.filter(col(idCol) === probeId)
      .select(col(vecCol).as("__q")))
    emb.join(candidates, col(idCol) === col(idCol + "__c"), "left_semi")
      .filter(col(idCol) =!= probeId)
      .crossJoin(probe)
      .select(col(idCol), cosine(col(vecCol), col("__q")).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
