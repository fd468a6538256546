package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Similarity search over `embeddings.embedding` (ARRAY<FLOAT>, 64-dim).
  *
  * Exactness strategy — fixed-point quantization: vq = floor(v · 2^20) as
  * BIGINT. Multiplying a double by a power of two is exact (exponent shift)
  * and floor of an exact double is engine-identical, so both engines derive
  * the same integer vectors. All dot products / norms are then integer sums
  * (|vq| ≤ 2^20 ⇒ products ≤ 2^40, 64-dim sums ≤ 2^46 < 2^53), which are
  * exact in ANY summation order and convert exactly to DOUBLE. The final
  * cosine is one sqrt+divide chain on identical doubles. Quantization error
  * vs true float cosine < 2^-19 — well inside ANN tolerance, and the
  * integer pipeline is also faster than decimal/float at scale (packs into
  * codegen'd long arithmetic).
  *
  * Scale strategy: q_simsearch is probe-vs-all (O(n·d) with a broadcast
  * single-row probe — the brute-force ANN baseline). q_embed_neardup uses
  * deterministic sign-LSH bucketing (sign bits of the 8 leading dims) so
  * the candidate space shrinks ~2^8× before any exact math — the bucket
  * equi-join IS the 100 TB path; swap the hash family for seeded random
  * hyperplanes in production.
  */
object SimilarityQueries {

  /** DuckDB mirror of the quantization (exploded formulation — equivalent
    * to the Spark side's array folds because integer addition is
    * associative). */
  private[queries] val FlatSqlCte: String =
    """flat AS (
      |  SELECT vec_id, i AS pos,
      |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS vq
      |  FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i))""".stripMargin

  /** Quantized vector as a BIGINT array: vq = floor(v·2^20) — the fused
    * kernel (the `transform` HOF is CodegenFallback; see
    * [[graft.operators.Similarity.quantize]]). */
  private def quantArr(emb: Column): Column =
    graft.plans.VectorExpressions.quantizeVec(emb)

  /** Exact integer dot of two quantized arrays — the fused native kernel
    * ([[graft.plans.VectorExpressions.longDot]]; no intermediate zip_with
    * array). Integer addition is associative, so this equals the oracle's
    * explode+SUM bit-for-bit (HOF-equivalence pinned in OperatorsSpec). */
  private def qdot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.longDot(a, b)

  /** Top-5 cosine neighbors of vec_id 0 (quantized-exact): ONE narrow pass —
    * quantize, fold dot/norms per row against the broadcast probe, top-k.
    * No explode, no aggregation shuffle; the only wide op is the top-k sort. */
  def qSimsearch(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val probe = broadcast(
      emb.filter(col("vec_id") === 0).select(quantArr(col("embedding")).as("q")))
    emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), quantArr(col("embedding")).as("vq"))
      .crossJoin(probe)
      .select(col("vec_id"),
        (qdot(col("vq"), col("q")).cast("double") /
          (sqrt(qdot(col("vq"), col("vq")).cast("double")) *
            sqrt(qdot(col("q"), col("q")).cast("double"))))
          .as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(5)
  }

  /** Probe-vs-all quantized cosine top-k as DuckDB SQL, parameterized on
    * (probeId, k) — shared by q_simsearch and the operator-API twin
    * q_simsearch_brute. */
  private def simsearchSql(probeId: Long, k: Int): String =
    s"""WITH $FlatSqlCte,
       |q AS (SELECT pos, vq AS qv FROM flat WHERE vec_id = $probeId),
       |dots AS (
       |  SELECT vec_id, CAST(sum(vq * qv) AS BIGINT) AS dot
       |  FROM flat JOIN q USING (pos) WHERE vec_id <> $probeId GROUP BY vec_id),
       |norms AS (
       |  SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2
       |  FROM flat GROUP BY vec_id)
       |SELECT d.vec_id,
       |       CAST(d.dot AS DOUBLE)
       |         / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(qn.qnorm2 AS DOUBLE))) AS cosine
       |FROM dots d
       |JOIN norms n ON d.vec_id = n.vec_id
       |CROSS JOIN (SELECT norm2 AS qnorm2 FROM norms WHERE vec_id = $probeId) qn
       |ORDER BY cosine DESC, d.vec_id
       |LIMIT $k""".stripMargin

  val qSimsearchSql: String = simsearchSql(0L, 5)

  /** Deterministic sign-LSH bucket key: '+'/'-' of the first 8 dims.
    * Float sign compare is exact — no rounding hazard. */
  private def signBucket(emb: Column): Column =
    concat((1 to 8).map(i =>
      when(element_at(emb, i) >= 0f, lit("+")).otherwise(lit("-"))): _*)

  /** Sign bits of quantized dims (`from`, `until`] for adaptive bucket
    * deepening: floor(x·2^20) ≥ 0 ⟺ x ≥ 0, so quantized signs equal the
    * float signs the base bucket (and the oracle) uses. */
  private def signExtQ(vq: Column, from: Int, until: Int): Column =
    concat((from + 1 to until).map(i =>
      when(element_at(vq, i) >= 0L, lit("+")).otherwise(lit("-"))): _*)

  /** Embedding near-dup pairs: same sign-LSH bucket AND quantized cosine
    * ≥ 0.3 — the verified pair set (v1, v2, cosine) shared by
    * q_embed_neardup (pair view) and q_embed_clusters (component view).
    * Bucket equi-join replaces the O(n²) cross join; exact integer
    * cosine re-ranks inside buckets only. Buckets denser than
    * `Similarity.DefaultMaxVecBucket` deepen adaptively (4 more sign dims
    * per level) — a FIXED 8-bit key turns 10× corpus growth into 100×
    * candidate growth (measured 7.9 k → 781 k pairs); deepening bounds
    * bucket population by a constant. No oracle-SF bucket exceeds the cap
    * (max 16 at sf0.1), so the static-bucket oracle stays bit-identical. */
  private def embedNeardupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // norm once per ROW before the self-join: a vector in a B-member
    // bucket appears in ~B pairs, so per-pair norm recompute costs B× the
    // work (and 2 of the 3 dot folds per pair) for the same integers
    val emb = graft.operators.Similarity.deepenBuckets(
      t(spark, sfDir, "embeddings")
        .select(col("vec_id"), quantArr(col("embedding")).as("vq"),
          signBucket(col("embedding")).as("bucket")),
      "bucket")(l => signExtQ(col("vq"), 8 + (l - 1) * 4, 8 + l * 4))
      .withColumn("nrm", sqrt(qdot(col("vq"), col("vq")).cast("double")))
    emb.as("a").join(emb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        (qdot(col("a.vq"), col("b.vq")).cast("double") /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= 0.3)
  }

  def qEmbedNeardup(spark: SparkSession, sfDir: String): DataFrame =
    embedNeardupPairs(spark, sfDir).orderBy("v1", "v2")

  /** CTE chain producing the verified pair set, plus its SELECT — shared
    * by the pair-view and cluster-view oracles. */
  private val EmbedPairCtes: String =
    s"""emb AS (
       |  SELECT vec_id, embedding,
       |         concat(
       |           CASE WHEN embedding[1] >= 0 THEN '+' ELSE '-' END,
       |           CASE WHEN embedding[2] >= 0 THEN '+' ELSE '-' END,
       |           CASE WHEN embedding[3] >= 0 THEN '+' ELSE '-' END,
       |           CASE WHEN embedding[4] >= 0 THEN '+' ELSE '-' END,
       |           CASE WHEN embedding[5] >= 0 THEN '+' ELSE '-' END,
       |           CASE WHEN embedding[6] >= 0 THEN '+' ELSE '-' END,
       |           CASE WHEN embedding[7] >= 0 THEN '+' ELSE '-' END,
       |           CASE WHEN embedding[8] >= 0 THEN '+' ELSE '-' END) AS bucket
       |  FROM embeddings),
       |$FlatSqlCte,
       |norms AS (
       |  SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2
       |  FROM flat GROUP BY vec_id),
       |pairs AS (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2, a.embedding AS e1, b.embedding AS e2
       |  FROM emb a JOIN emb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |dots AS (
       |  SELECT v1, v2,
       |         CAST(sum(CAST(floor(CAST(e1[i] AS DOUBLE) * 1048576) AS BIGINT)
       |                  * CAST(floor(CAST(e2[i] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS dot
       |  FROM pairs, LATERAL unnest(generate_series(1, len(e1))) AS t(i)
       |  GROUP BY v1, v2)""".stripMargin

  private val EmbedVPairSelect: String =
    """SELECT v1, v2,
      |       CAST(dot AS DOUBLE)
      |         / (sqrt(CAST(n1.norm2 AS DOUBLE)) * sqrt(CAST(n2.norm2 AS DOUBLE))) AS cosine
      |FROM dots
      |JOIN norms n1 ON n1.vec_id = v1
      |JOIN norms n2 ON n2.vec_id = v2
      |WHERE CAST(dot AS DOUBLE)
      |         / (sqrt(CAST(n1.norm2 AS DOUBLE)) * sqrt(CAST(n2.norm2 AS DOUBLE))) >= 0.3""".stripMargin

  val qEmbedNeardupSql: String =
    s"""WITH $EmbedPairCtes
       |$EmbedVPairSelect
       |ORDER BY v1, v2""".stripMargin

  /** Embedding near-dup CLUSTERS (round 11): connected components over
    * the sign-LSH verified pair graph — the embedding-modality analog of
    * q_dedup_clusters (transitive chains a–b–c make the component view
    * genuinely different from the pairwise view; "keep one survivor per
    * component" is the production dedup contract). Runs the same
    * large-star/small-star CC ([[graft.operators.Dedup.connectedComponents]],
    * O(log diameter) rounds, map-side-combinable groupBys). The oracle is
    * a recursive-CTE transitive closure over the identical pair set. */
  def qEmbedClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = embedNeardupPairs(spark, sfDir)
      .select(col("v1").as("d1"), col("v2").as("d2"))
    graft.operators.Dedup.connectedComponents(pairs)
      .groupBy(col("cluster").as("cluster_id"))
      .agg(count(lit(1)).as("n_vecs"),
        concat_ws(",",
          transform(sort_array(collect_list(col("id"))), _.cast("string"))).as("members"))
      .orderBy("cluster_id")
  }

  val qEmbedClustersSql: String =
    s"""WITH RECURSIVE $EmbedPairCtes,
       |vpairs AS (
       |$EmbedVPairSelect),
       |edges AS (
       |  SELECT v1 AS src, v2 AS dst FROM vpairs
       |  UNION SELECT v2, v1 FROM vpairs),
       |walk AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.dst),
       |labels AS (
       |  SELECT src AS id, least(src, min(dst)) AS cluster
       |  FROM walk GROUP BY src)
       |SELECT cluster AS cluster_id, count(*) AS n_vecs,
       |       string_agg(id, ',' ORDER BY id) AS members
       |FROM labels GROUP BY cluster ORDER BY cluster_id""".stripMargin

  /** Random-hyperplane LSH (the production bucket family — axis signs in
    * qEmbedNeardup degrade when leading components correlate): `RhBits`
    * Gaussian hyperplanes drawn once from a fixed seed at plan-build time,
    * QUANTIZED to integers (floor(w·2^20)) exactly like the vectors, so the
    * projection sign is a pure BIGINT sum both engines compute identically
    * — the whole query stays oracle-exact. |vq|≤2^20, |wq|≤~2^23, 64 terms
    * ⇒ |proj|≤2^49 — long-exact in any summation order. Bits scale with
    * corpus size (bucket count 2^bits should track n/avg-bucket-target);
    * 8 bits fits the test corpus. */
  private val RhBits = 8
  private val RhDim = 64
  /** 24 planes drawn from one seed stream: [0,8) are the base bucket (and
    * the oracle's VALUES table — the stream prefix is unchanged); [8,24)
    * feed adaptive deepening only, which never fires at oracle SFs. */
  private[queries] lazy val rhPlanesAllQ: Array[Array[Long]] = {
    val rnd = new scala.util.Random(20250812L)
    Array.fill(24)(Array.fill(RhDim)(math.floor(rnd.nextGaussian() * 1048576d).toLong))
  }
  private[queries] lazy val rhPlanesQ: Array[Array[Long]] = rhPlanesAllQ.take(RhBits)

  private def rhSigns(vq: Column, planes: Seq[Array[Long]]): Column =
    concat(planes.map { p =>
      val pArr = array(p.toIndexedSeq.map(lit): _*)
      when(qdot(vq, pArr) >= 0L, lit("+")).otherwise(lit("-"))
    }: _*)

  private def rhBucket(vq: Column): Column = rhSigns(vq, rhPlanesQ.toIndexedSeq)

  /** Embedding near-dup pairs under the hyperplane family: same bucket AND
    * quantized cosine ≥ 0.3 — identical verify math to qEmbedNeardup, only
    * the candidate-generation family differs. Dense buckets deepen with 4
    * more hyperplanes per level (planes [8,24) of the same seed stream) —
    * see qEmbedNeardup for why; never fires at oracle SFs. */
  def qEmbedNeardupRh(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = graft.operators.Similarity.deepenBuckets(
      t(spark, sfDir, "embeddings")
        .select(col("vec_id"), quantArr(col("embedding")).as("vq"))
        .withColumn("bucket", rhBucket(col("vq"))),
      "bucket", maxLevels = 4)(l =>
      rhSigns(col("vq"), rhPlanesAllQ.slice(8 + (l - 1) * 4, 8 + l * 4).toIndexedSeq))
      .withColumn("nrm", sqrt(qdot(col("vq"), col("vq")).cast("double")))
    emb.as("a").join(emb.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        (qdot(col("a.vq"), col("b.vq")).cast("double") /
          (col("a.nrm") * col("b.nrm"))).as("cosine"))
      .filter(col("cosine") >= 0.3)
      .orderBy("v1", "v2")
  }

  /** Oracle: the same quantized planes rendered as a VALUES table. */
  lazy val qEmbedNeardupRhSql: String = {
    val planeRows = rhPlanesQ.zipWithIndex.flatMap { case (p, j) =>
      p.zipWithIndex.map { case (w, i) => s"($j, ${i + 1}, $w)" }
    }.mkString(", ")
    s"""WITH $FlatSqlCte,
       |planes(j, pos, w) AS (VALUES $planeRows),
       |proj AS (
       |  SELECT f.vec_id, p.j, CAST(sum(f.vq * p.w) AS BIGINT) AS pr
       |  FROM flat f JOIN planes p ON f.pos = p.pos
       |  GROUP BY f.vec_id, p.j),
       |buckets AS (
       |  SELECT vec_id,
       |         string_agg(CASE WHEN pr >= 0 THEN '+' ELSE '-' END, '' ORDER BY j) AS bucket
       |  FROM proj GROUP BY vec_id),
       |norms AS (
       |  SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2
       |  FROM flat GROUP BY vec_id),
       |pairs AS (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2
       |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |dots AS (
       |  SELECT p.v1, p.v2, CAST(sum(f1.vq * f2.vq) AS BIGINT) AS dot
       |  FROM pairs p
       |  JOIN flat f1 ON f1.vec_id = p.v1
       |  JOIN flat f2 ON f2.vec_id = p.v2 AND f2.pos = f1.pos
       |  GROUP BY p.v1, p.v2)
       |SELECT v1, v2,
       |       CAST(dot AS DOUBLE)
       |         / (sqrt(CAST(n1.norm2 AS DOUBLE)) * sqrt(CAST(n2.norm2 AS DOUBLE))) AS cosine
       |FROM dots
       |JOIN norms n1 ON n1.vec_id = v1
       |JOIN norms n2 ON n2.vec_id = v2
       |WHERE CAST(dot AS DOUBLE)
       |         / (sqrt(CAST(n1.norm2 AS DOUBLE)) * sqrt(CAST(n2.norm2 AS DOUBLE))) >= 0.3
       |ORDER BY v1, v2""".stripMargin
  }

  /** The generic [[graft.operators.Similarity.cosineTopK]] OPERATOR under
    * the oracle gate (graduated from no-oracle in round 9, VERDICT r8
    * item 8): since the operator's production path is now the 2^20
    * fixed-point kernel, its ranking is partition-order independent and
    * hash-checkable — run here at different parameters (probe 7, k = 8)
    * than the handwritten q_simsearch plan (probe 0, k = 5) so both the
    * operator API and the inline formulation stay independently covered
    * by the SAME parameterized oracle SQL. The float reference path
    * (`quantized = false`) stays pinned against this in OperatorsSpec. */
  def qSimsearchBrute(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Similarity
      .cosineTopK(t(spark, sfDir, "embeddings"), "vec_id", "embedding", probeId = 7L, k = 8)

  val qSimsearchBruteSql: String = simsearchSql(7L, 8)

  /** IVF index + probe search, quantized-exact end to end (graduated from
    * recall-pinned to hash-oracled in round 8, VERDICT r7 item 8): the
    * whole index build — multiplicative-hash seeding, 2 integer Lloyd
    * steps, argmin cell assignment, 4-cell probe, quantized-cosine top-5 —
    * is replayed by the DuckDB oracle as unrolled CTEs. The float-mean
    * variant ([[graft.operators.Similarity.ivfIndex]]) remains the
    * production default; recall equivalence of the two is pinned in
    * OperatorsSpec. */
  def qAnnIvf(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val (centroids, assignments) =
      graft.operators.Similarity.ivfIndexQ(emb, "vec_id", "embedding", nCells = 16, iters = 2)
    // assignments is consumed exactly once by the probe-cell semi-join —
    // caching it would only leak executor memory (VERDICT r2 #5)
    graft.operators.Similarity
      .ivfTopKQ(emb, "vec_id", "embedding", centroids, assignments,
        probeId = 0L, k = 5, nProbe = 4)
  }

  /** Oracle: the full quantized IVF build unrolled as CTEs — seeds by
    * Knuth hash, `IvfIters` Lloyd (assign, floor-mean) rounds, final
    * assignment, probe-cell top-`IvfNProbe`, quantized cosine top-5.
    * Every CTE is integer-exact, so this replays ivfIndexQ/ivfTopKQ
    * bit for bit. */
  /** The quantized-IVF index build unrolled as CTEs (requires `flat` in
    * scope): Knuth-hash seeding, `iters` integer Lloyd rounds, final
    * assignment `afin(vec_id, cell)` — shared by every oracle that replays
    * [[graft.operators.Similarity.ivfIndexQ]] (q_ann_ivf, q_semdedup,
    * q_ann_batch, q_ann_recall). `trainSample > 0` restricts the Lloyd
    * ROUNDS to the `trainSample` lowest-Knuth-hash rows — the operator's
    * sample-trained path — while the final assignment stays full-corpus;
    * the seed set is a prefix of the sample by construction, so the seed
    * CTE is shared. */
  private[queries] def lloydSqlCtes(nCells: Int, iters: Int, trainSample: Int = 0): String = {
    val sampJoin =
      if (trainSample > 0) " JOIN samp s ON s.vec_id = f.vec_id" else ""
    val sampCte =
      if (trainSample > 0)
        s"""samp AS (
           |  SELECT vec_id FROM embeddings
           |  QUALIFY row_number() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) <= $trainSample),
           |""".stripMargin
      else ""
    val lloyd = (1 to iters).map { i =>
      s"""d$i AS (
         |  SELECT f.vec_id, c.cell, CAST(sum((f.vq - c.cq) * (f.vq - c.cq)) AS BIGINT) AS d
         |  FROM flat f$sampJoin JOIN cent${i - 1} c ON f.pos = c.pos GROUP BY 1, 2),
         |a$i AS (
         |  SELECT vec_id, cell FROM d$i
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
         |cent$i AS (
         |  SELECT a.cell, f.pos,
         |         CAST(floor(CAST(sum(f.vq) AS DOUBLE) / count(*)) AS BIGINT) AS cq
         |  FROM a$i a JOIN flat f ON f.vec_id = a.vec_id GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""${sampCte}seeds AS (
       |  SELECT vec_id,
       |         CAST(row_number() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) - 1 AS INT) AS cell
       |  FROM embeddings
       |  QUALIFY row_number() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) <= $nCells),
       |cent0 AS (SELECT s.cell, f.pos, f.vq AS cq FROM seeds s JOIN flat f ON f.vec_id = s.vec_id),
       |$lloyd,
       |dfin AS (
       |  SELECT f.vec_id, c.cell, CAST(sum((f.vq - c.cq) * (f.vq - c.cq)) AS BIGINT) AS d
       |  FROM flat f JOIN cent$iters c ON f.pos = c.pos GROUP BY 1, 2),
       |afin AS (
       |  SELECT vec_id, cell FROM dfin
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1)""".stripMargin
  }

  lazy val qAnnIvfSql: String = {
    val iters = 2
    s"""WITH $FlatSqlCte,
       |${lloydSqlCtes(nCells = 16, iters = iters)},
       |probq AS (SELECT pos, vq FROM flat WHERE vec_id = 0),
       |pcells AS (
       |  SELECT c.cell, CAST(sum((q.vq - c.cq) * (q.vq - c.cq)) AS BIGINT) AS d
       |  FROM cent$iters c JOIN probq q ON q.pos = c.pos GROUP BY 1
       |  ORDER BY d, cell LIMIT 4),
       |cand AS (
       |  SELECT a.vec_id FROM afin a JOIN pcells p ON a.cell = p.cell
       |  WHERE a.vec_id <> 0),
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |dots AS (
       |  SELECT f.vec_id, CAST(sum(f.vq * q.vq) AS BIGINT) AS dot
       |  FROM flat f JOIN probq q ON f.pos = q.pos
       |  JOIN cand c ON c.vec_id = f.vec_id GROUP BY 1)
       |SELECT d.vec_id,
       |       CAST(d.dot AS DOUBLE)
       |         / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(qn.qnorm2 AS DOUBLE))) AS cosine
       |FROM dots d
       |JOIN norms n ON n.vec_id = d.vec_id
       |CROSS JOIN (SELECT norm2 AS qnorm2 FROM norms WHERE vec_id = 0) qn
       |ORDER BY cosine DESC, d.vec_id
       |LIMIT 5""".stripMargin
  }

  /** Batch IVF search ([[graft.operators.Similarity.ivfTopKBatchQ]]): five
    * probes retrieve their top-5 through ONE shared index scan — the
    * batch-serving shape (per-probe jobs don't amortize the corpus scan).
    * The (probe, cell) routing table broadcasts; the per-probe top-k is
    * the bounded heap aggregate (r16 — k pairs of state per probe,
    * partial map-side; the window it replaces sorted the candidate
    * stream). The oracle replays the index via [[lloydSqlCtes]]
    * and the per-probe cell ranking / scoring as integer-exact CTEs. */
  def qAnnBatch(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Similarity.ivfTopKBatchQ(
        t(spark, sfDir, "embeddings"), "vec_id", "embedding",
        probeIds = Seq(0L, 1L, 2L, 3L, 4L), k = 5,
        nCells = 16, iters = 2, nProbe = 4)
      .orderBy("probe_id", "rnk")

  lazy val qAnnBatchSql: String =
    s"""WITH $FlatSqlCte,
       |${lloydSqlCtes(nCells = 16, iters = 2)},
       |probes AS (
       |  SELECT CAST(x AS BIGINT) AS probe_id
       |  FROM (VALUES (0), (1), (2), (3), (4)) t(x)),
       |probq AS (
       |  SELECT p.probe_id, f.pos, f.vq
       |  FROM probes p JOIN flat f ON f.vec_id = p.probe_id),
       |pcells AS (
       |  SELECT probe_id, cell FROM (
       |    SELECT q.probe_id, c.cell,
       |           CAST(sum((q.vq - c.cq) * (q.vq - c.cq)) AS BIGINT) AS d
       |    FROM cent2 c JOIN probq q ON q.pos = c.pos GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d, cell) <= 4),
       |cand AS (
       |  SELECT p.probe_id, a.vec_id
       |  FROM afin a JOIN pcells p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.probe_id),
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |dots AS (
       |  SELECT c.probe_id, c.vec_id, CAST(sum(f.vq * q.vq) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN flat f ON f.vec_id = c.vec_id
       |  JOIN probq q ON q.probe_id = c.probe_id AND q.pos = f.pos
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.probe_id, d.vec_id,
       |         CAST(d.dot AS DOUBLE)
       |           / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(np.norm2 AS DOUBLE))) AS cosine
       |  FROM dots d
       |  JOIN norms n ON n.vec_id = d.vec_id
       |  JOIN norms np ON np.vec_id = d.probe_id
       |  WHERE n.norm2 > 0 AND np.norm2 > 0)
       |SELECT probe_id,
       |       CAST(row_number() OVER (PARTITION BY probe_id
       |                               ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk,
       |       vec_id, cosine
       |FROM scored
       |QUALIFY rnk <= 5
       |ORDER BY probe_id, rnk""".stripMargin

  /** Cross-modal retrieval (round 14) — image-derived probes searching
    * the TEXT embedding corpus through the shared IVF machinery, with
    * ZERO new index code ([[graft.operators.Similarity.ivfTopKBatchVecsQ]]
    * is [[graft.operators.Similarity.ivfTopKBatchQ]]'s routing/re-rank
    * body taking external probe vectors): 12 documents are rendered as
    * real PNGs (the q_image_embed generator), decoded through the REAL
    * javax.imageio codec, their 16-dim block-luminance embeddings tiled
    * ×4 into the corpus's 64-dim space, quantized with the engine's
    * floor(v·2^20) convention, and batched through the IVF index
    * (nCells=16, iters=2, nProbe=4, k=5). `excludeProbeId=false`: probe
    * ids are doc ids — a DIFFERENT id space from vec_ids, so an id
    * collision must not drop a corpus row.
    *
    * The oracle replays BOTH modalities end to end: the pixel-generator
    * arithmetic → block luminance → tiling → quantization for the probe
    * side (no codec — PNG is lossless, the q_image_embed bit-exactness
    * argument), and the full Lloyd chain + cell routing + cosine re-rank
    * for the index side. Scale shape: the serving contract — a BOUNDED
    * probe batch routes driver-side, the corpus is touched once per
    * probe cell-hit via the broadcast (probe, cell) table, per-probe
    * top-k is the bounded heap aggregate (r16). */
  val CrossmodalProbes = 12
  def qCrossmodalKnn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ids = t(spark, sfDir, "documents").select(col("doc_id"))
      .filter(col("doc_id") < CrossmodalProbes).as[Long]
    val media = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(id => graft.multimodal.Multimodal.MediaRecord(id, "image/png",
        graft.multimodal.Multimodal.synthPng(id, 48, 32)))
    }
    val feats = graft.multimodal.Multimodal
      .extractFeatures(media, graft.multimodal.Multimodal.ImageIoDecoder)
      .collect().sortBy(_.media_id) // bounded probe batch — the serving contract
    val probes: Seq[(Long, Array[Long])] = feats.toIndexedSeq.map { f =>
      f.media_id -> Array.tabulate(64)(p =>
        math.floor(f.embedding(p % 16).toDouble * 1048576d).toLong)
    }
    graft.operators.Similarity.ivfTopKBatchVecsQ(
        t(spark, sfDir, "embeddings"), "vec_id", "embedding",
        probes, k = 5, nCells = 16, iters = 2, nProbe = 4,
        excludeProbeId = false)
      .orderBy("probe_id", "rnk")
  }

  /** Oracle: probe vectors rebuilt from the pixel arithmetic (block
    * luminance → zero-center → float narrow → tile → floor·2^20), then
    * the q_ann_batch routing/re-rank chain with probe norms from the
    * probe table itself. */
  lazy val qCrossmodalKnnSql: String =
    s"""WITH $FlatSqlCte,
       |${lloydSqlCtes(nCells = 16, iters = 2)},
       |ipx AS (
       |  SELECT d.doc_id, g.i,
       |         ((d.doc_id * 31 + g.i * 7) % 256) AS v,
       |         ((g.i // 48) // 8) * 4 + ((g.i % 48) // 12) AS b
       |  FROM documents d, generate_series(0, 1535) AS g(i)
       |  WHERE d.doc_id < $CrossmodalProbes),
       |iterms AS (
       |  SELECT doc_id, b, i, (0.299 * v + 0.587 * v + 0.114 * v) / 255.0 AS t
       |  FROM ipx),
       |isums AS (
       |  SELECT doc_id, b, list_reduce(list(t ORDER BY i), (a, x) -> a + x) AS s
       |  FROM iterms GROUP BY doc_id, b),
       |imeans AS (SELECT doc_id, b, s / 96 AS m FROM isums),
       |iov AS (
       |  SELECT doc_id, list_reduce(list(m ORDER BY b), (a, x) -> a + x) / 16.0 AS o
       |  FROM imeans GROUP BY doc_id),
       |probq AS (
       |  SELECT m.doc_id AS probe_id, g.p AS pos,
       |         CAST(floor(CAST(CAST(m.m - ov.o AS REAL) AS DOUBLE) * 1048576) AS BIGINT) AS vq
       |  FROM imeans m JOIN iov ov USING (doc_id), generate_series(1, 64) AS g(p)
       |  WHERE m.b = (g.p - 1) % 16),
       |pcells AS (
       |  SELECT probe_id, cell FROM (
       |    SELECT q.probe_id, c.cell,
       |           CAST(sum((q.vq - c.cq) * (q.vq - c.cq)) AS BIGINT) AS d
       |    FROM cent2 c JOIN probq q ON q.pos = c.pos GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d, cell) <= 4),
       |cand AS (
       |  SELECT p.probe_id, a.vec_id
       |  FROM afin a JOIN pcells p ON a.cell = p.cell),
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |pnorms AS (SELECT probe_id, CAST(sum(vq * vq) AS BIGINT) AS pnorm2 FROM probq GROUP BY 1),
       |dots AS (
       |  SELECT c.probe_id, c.vec_id, CAST(sum(f.vq * q.vq) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN flat f ON f.vec_id = c.vec_id
       |  JOIN probq q ON q.probe_id = c.probe_id AND q.pos = f.pos
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.probe_id, d.vec_id,
       |         CAST(d.dot AS DOUBLE)
       |           / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(p.pnorm2 AS DOUBLE))) AS cosine
       |  FROM dots d
       |  JOIN norms n ON n.vec_id = d.vec_id
       |  JOIN pnorms p ON p.probe_id = d.probe_id
       |  WHERE n.norm2 > 0 AND p.pnorm2 > 0)
       |SELECT probe_id,
       |       CAST(row_number() OVER (PARTITION BY probe_id
       |                               ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk,
       |       vec_id, cosine
       |FROM scored
       |QUALIFY rnk <= 5
       |ORDER BY probe_id, rnk""".stripMargin

  /** SemDeDup — semantic dedup over the embedding corpus
    * ([[graft.operators.Similarity.semanticDedup]]): quantized-Lloyd
    * k-means cells, within-cell quantized-cosine pruning; of each
    * too-similar pair the member FARTHEST from its cell centroid is kept
    * (the paper's keep-rule; distance ties drop the larger id). Output:
    * (vec_id, cell, kept) for every vector. The oracle replays the ENTIRE
    * operator — seeding, both Lloyd rounds, final assignment, within-cell
    * pair cosine, drop set — as integer-exact CTEs (the same
    * [[lloydSqlCtes]] chain as q_ann_ivf).
    *
    * Scale: candidates come from the cell equi-join (never all-pairs),
    * and since round 11 the query runs the operator's ADAPTIVE defaults —
    * nCells = max(16, ceil(n/20000)) and Lloyd training on a
    * max(64·nCells, 131072)-row hash-sample — so cell population (and the
    * per-cell quadratic) is bounded by construction at ANY corpus size,
    * not by a hand-pinned knob. The oracle literals (nCells = 16, full
    * training) equal what the adaptive formula resolves to for every
    * corpus ≤ 131072 rows, which covers all oracle SFs (500 / 2000 rows);
    * the sampled-training path itself is oracle-gated separately by
    * q_semdedup_sampled. */
  def qSemdedup(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Similarity.semanticDedup(
        t(spark, sfDir, "embeddings"), "vec_id", "embedding",
        iters = 2, minCosine = 0.3,
        // corpus size from parquet footer metadata — no count() action at
        // construction (the knn-family pattern, threaded here in r15)
        nRows = graft.Tables.parquetRowCount(spark, sfDir, "embeddings"))
      .select(col("id").as("vec_id"), col("cell"), col("kept"))
      .orderBy("vec_id")

  lazy val qSemdedupSql: String =
    s"""WITH $FlatSqlCte,
       |${lloydSqlCtes(nCells = 16, iters = 2)},
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |adist AS (
       |  SELECT a.vec_id, a.cell, f.d
       |  FROM afin a JOIN dfin f ON f.vec_id = a.vec_id AND f.cell = a.cell),
       |cpairs AS (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2
       |  FROM afin a JOIN afin b ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |cdots AS (
       |  SELECT p.v1, p.v2, CAST(sum(f1.vq * f2.vq) AS BIGINT) AS dot
       |  FROM cpairs p
       |  JOIN flat f1 ON f1.vec_id = p.v1
       |  JOIN flat f2 ON f2.vec_id = p.v2 AND f2.pos = f1.pos
       |  GROUP BY 1, 2),
       |dropped AS (
       |  SELECT DISTINCT CASE WHEN a1.d < a2.d THEN d.v1 ELSE d.v2 END AS vec_id
       |  FROM cdots d
       |  JOIN norms n1 ON n1.vec_id = d.v1
       |  JOIN norms n2 ON n2.vec_id = d.v2
       |  JOIN adist a1 ON a1.vec_id = d.v1
       |  JOIN adist a2 ON a2.vec_id = d.v2
       |  WHERE n1.norm2 > 0 AND n2.norm2 > 0
       |    AND CAST(d.dot AS DOUBLE)
       |          / (sqrt(CAST(n1.norm2 AS DOUBLE)) * sqrt(CAST(n2.norm2 AS DOUBLE))) >= 0.3)
       |SELECT a.vec_id, a.cell,
       |       CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM afin a LEFT JOIN dropped dr ON dr.vec_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  /** The SAMPLE-TRAINED SemDeDup path under its own oracle gate: nCells=32
    * with the Lloyd rounds trained on only the 96 lowest-Knuth-hash rows
    * (96 < 500 corpus rows at sf0.01, so the sampling genuinely restricts
    * training), full-corpus final assignment. The oracle replays the
    * sample restriction via [[lloydSqlCtes]]' `samp` CTE — hash-exact
    * coverage of the round-11 FAISS-style shortcut that q_semdedup's
    * adaptive defaults only reach above 131072 rows. (nCells=32, not a
    * tiny 8: the twin also rides the 100x sweeps, and within-cell pairing
    * is quadratic in cell population — k=8 measured 191.5 s at 200 k
    * vectors vs ~40 s for k=16; 32 keeps cells meaningful at sf0.01,
    * ~15 rows/cell, while staying sweep-affordable.) */
  def qSemdedupSampled(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Similarity.semanticDedup(
        t(spark, sfDir, "embeddings"), "vec_id", "embedding",
        nCells = 32, iters = 2, minCosine = 0.3, trainSample = 96)
      .select(col("id").as("vec_id"), col("cell"), col("kept"))
      .orderBy("vec_id")

  lazy val qSemdedupSampledSql: String =
    s"""WITH $FlatSqlCte,
       |${lloydSqlCtes(nCells = 32, iters = 2, trainSample = 96)},
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |adist AS (
       |  SELECT a.vec_id, a.cell, f.d
       |  FROM afin a JOIN dfin f ON f.vec_id = a.vec_id AND f.cell = a.cell),
       |cpairs AS (
       |  SELECT a.vec_id AS v1, b.vec_id AS v2
       |  FROM afin a JOIN afin b ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |cdots AS (
       |  SELECT p.v1, p.v2, CAST(sum(f1.vq * f2.vq) AS BIGINT) AS dot
       |  FROM cpairs p
       |  JOIN flat f1 ON f1.vec_id = p.v1
       |  JOIN flat f2 ON f2.vec_id = p.v2 AND f2.pos = f1.pos
       |  GROUP BY 1, 2),
       |dropped AS (
       |  SELECT DISTINCT CASE WHEN a1.d < a2.d THEN d.v1 ELSE d.v2 END AS vec_id
       |  FROM cdots d
       |  JOIN norms n1 ON n1.vec_id = d.v1
       |  JOIN norms n2 ON n2.vec_id = d.v2
       |  JOIN adist a1 ON a1.vec_id = d.v1
       |  JOIN adist a2 ON a2.vec_id = d.v2
       |  WHERE n1.norm2 > 0 AND n2.norm2 > 0
       |    AND CAST(d.dot AS DOUBLE)
       |          / (sqrt(CAST(n1.norm2 AS DOUBLE)) * sqrt(CAST(n2.norm2 AS DOUBLE))) >= 0.3)
       |SELECT a.vec_id, a.cell,
       |       CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM afin a LEFT JOIN dropped dr ON dr.vec_id = a.vec_id
       |ORDER BY a.vec_id""".stripMargin

  /** Incremental SEMANTIC dedup (round 12,
    * [[graft.operators.Similarity.semanticIncrementalStatus]]) — the
    * embedding-space twin of q_incremental_dedup: the corpus/batch split
    * is the same deterministic 75/25 md5 gate on vec_id, both sides are
    * assigned to frozen SAMPLE-TRAINED cells (nCells = 32, Lloyd on the 96
    * lowest-Knuth-hash rows — the q_semdedup_sampled configuration, so the
    * oracle replays training through the shared [[lloydSqlCtes]] chain),
    * and every batch vector is labeled near_dup/admitted against standing
    * cell members and smaller-id batch members ONLY — the corpus never
    * re-pairs against itself. Readout: per-label admission funnel.
    *
    * Scale shape notes live on the operator (probe-side-only pairing;
    * row-local assignment; the gate is row-local on the id). */
  def qSemdedupIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings").select("vec_id", "label", "embedding")
    val gate = graft.operators.Sampling.gateBelow(col("vec_id").cast("string"), "4")
    val batch = emb.filter(gate)
    val standing = emb.filter(!gate)
    // nCells = 0 → adaptive max(32, ⌈n/20000⌉): resolves to the oracle's
    // literal 32 at every oracle SF and to 100 at the 1000× fixture (2 M
    // vectors), keeping the within-cell pairing sweep-affordable
    graft.operators.Similarity
      .semanticIncrementalStatus(standing, batch, "vec_id", "embedding",
        nCells = 0, iters = 2, minCosine = 0.3, trainSample = 96,
        // standing ∪ batch partition the embeddings table exactly, so the
        // union size is the footer row count — no count() at construction
        nRows = graft.Tables.parquetRowCount(spark, sfDir, "embeddings"))
      .join(batch.select(col("vec_id").as("id"), col("label")), Seq("id"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_batch"),
        count_if(col("status") === "near_dup").as("n_near_dup"),
        count_if(col("status") === "admitted").as("n_admitted"))
      .orderBy("label")
  }

  lazy val qSemdedupIncrementalSql: String =
    s"""WITH $FlatSqlCte,
       |${lloydSqlCtes(nCells = 32, iters = 2, trainSample = 96)},
       |bx AS (
       |  SELECT vec_id FROM embeddings
       |  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '4'),
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |cpairs AS (
       |  SELECT a.vec_id AS other, b.vec_id AS probe
       |  FROM afin a JOIN afin b ON a.cell = b.cell AND a.vec_id <> b.vec_id
       |  WHERE b.vec_id IN (SELECT vec_id FROM bx)
       |    AND (a.vec_id NOT IN (SELECT vec_id FROM bx) OR a.vec_id < b.vec_id)),
       |cdots AS (
       |  SELECT p.other, p.probe, CAST(sum(f1.vq * f2.vq) AS BIGINT) AS dot
       |  FROM cpairs p
       |  JOIN flat f1 ON f1.vec_id = p.other
       |  JOIN flat f2 ON f2.vec_id = p.probe AND f2.pos = f1.pos
       |  GROUP BY 1, 2),
       |dropped AS (
       |  SELECT DISTINCT d.probe
       |  FROM cdots d
       |  JOIN norms n1 ON n1.vec_id = d.other
       |  JOIN norms n2 ON n2.vec_id = d.probe
       |  WHERE n1.norm2 > 0 AND n2.norm2 > 0
       |    AND CAST(d.dot AS DOUBLE)
       |          / (sqrt(CAST(n1.norm2 AS DOUBLE)) * sqrt(CAST(n2.norm2 AS DOUBLE))) >= 0.3)
       |SELECT e.label, count(*) AS n_batch,
       |       CAST(sum(CASE WHEN dr.probe IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       |       CAST(sum(CASE WHEN dr.probe IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
       |FROM embeddings e
       |JOIN bx ON bx.vec_id = e.vec_id
       |LEFT JOIN dropped dr ON dr.probe = e.vec_id
       |GROUP BY e.label
       |ORDER BY e.label""".stripMargin

  /** ANN recall@10 — the IVF quality surface the index has lacked a
    * declared query for (VERDICT r10 item 3): for each of 5 probes, how
    * many of the IVF top-10 ([[graft.operators.Similarity.ivfTopKBatchQ]],
    * nProbe = 2 of 16 cells — deliberately narrow so recall is a real
    * measurement, not a tautology) appear in the BRUTE-FORCE top-10
    * ([[graft.operators.Similarity.bruteTopKBatchQ]]). Both sides are
    * quantized-exact with identical tie rules, so recall@k is an exact
    * integer the DuckDB oracle reproduces by replaying both searches.
    * Output: (probe_id, n_ivf, recall_at_10) — n_ivf < 10 is possible when
    * the probed cells hold fewer than 10 candidates, which is itself part
    * of the recall story. */
  def qAnnRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val ivf = graft.operators.Similarity.ivfTopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10,
      nCells = 16, iters = 2, nProbe = 2)
      .select(col("probe_id"), col("vec_id"))
    val brute = graft.operators.Similarity.bruteTopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10)
      .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
    ivf.join(brute, Seq("probe_id", "vec_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_ivf"),
        sum(coalesce(col("__hit"), lit(0L))).as("recall_at_10"))
      .orderBy("probe_id")
  }

  /** The shared ANN-measurement CTE chain (IVF nProbe=2/16 `ivf` + exact
    * `brute`, both ranked top-10 for probes 0–4) — the replayed search
    * both [[qAnnRecall]] and [[qAnnMrr]] grade. `ivf` carries its rank so
    * order-sensitive metrics (MRR/AP) read it directly. */
  private lazy val annIvfBruteSqlCtes: String =
    s"""$FlatSqlCte,
       |${lloydSqlCtes(nCells = 16, iters = 2)},
       |probes AS (
       |  SELECT CAST(x AS BIGINT) AS probe_id
       |  FROM (VALUES (0), (1), (2), (3), (4)) t(x)),
       |probq AS (
       |  SELECT p.probe_id, f.pos, f.vq
       |  FROM probes p JOIN flat f ON f.vec_id = p.probe_id),
       |pcells AS (
       |  SELECT probe_id, cell FROM (
       |    SELECT q.probe_id, c.cell,
       |           CAST(sum((q.vq - c.cq) * (q.vq - c.cq)) AS BIGINT) AS d
       |    FROM cent2 c JOIN probq q ON q.pos = c.pos GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d, cell) <= 2),
       |cand AS (
       |  SELECT p.probe_id, a.vec_id
       |  FROM afin a JOIN pcells p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.probe_id),
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |idots AS (
       |  SELECT c.probe_id, c.vec_id, CAST(sum(f.vq * q.vq) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN flat f ON f.vec_id = c.vec_id
       |  JOIN probq q ON q.probe_id = c.probe_id AND q.pos = f.pos
       |  GROUP BY 1, 2),
       |ivf AS (
       |  SELECT probe_id, vec_id,
       |         row_number() OVER (PARTITION BY probe_id
       |                            ORDER BY cosine DESC, vec_id) AS rnk
       |  FROM (
       |    SELECT d.probe_id, d.vec_id,
       |           CAST(d.dot AS DOUBLE)
       |             / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(np.norm2 AS DOUBLE))) AS cosine
       |    FROM idots d
       |    JOIN norms n ON n.vec_id = d.vec_id
       |    JOIN norms np ON np.vec_id = d.probe_id
       |    WHERE n.norm2 > 0 AND np.norm2 > 0)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= 10),
       |bdots AS (
       |  SELECT q.probe_id, f.vec_id, CAST(sum(f.vq * q.vq) AS BIGINT) AS dot
       |  FROM flat f
       |  JOIN probq q ON q.pos = f.pos
       |  WHERE f.vec_id <> q.probe_id
       |  GROUP BY 1, 2),
       |brute AS (
       |  SELECT probe_id, vec_id FROM (
       |    SELECT d.probe_id, d.vec_id,
       |           CAST(d.dot AS DOUBLE)
       |             / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(np.norm2 AS DOUBLE))) AS cosine
       |    FROM bdots d
       |    JOIN norms n ON n.vec_id = d.vec_id
       |    JOIN norms np ON np.vec_id = d.probe_id
       |    WHERE n.norm2 > 0 AND np.norm2 > 0)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= 10)""".stripMargin

  lazy val qAnnRecallSql: String =
    s"""WITH $annIvfBruteSqlCtes
       |SELECT i.probe_id, count(*) AS n_ivf,
       |       CAST(sum(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS recall_at_10
       |FROM ivf i
       |LEFT JOIN brute b ON b.probe_id = i.probe_id AND b.vec_id = i.vec_id
       |GROUP BY i.probe_id
       |ORDER BY i.probe_id""".stripMargin

  /** Order-sensitive retrieval-eval metrics over the SAME replayed search
    * as [[qAnnRecall]] (recall says how many true neighbors the index
    * returns; ranking metrics say how early): per probe — hits (n_rel),
    * rank of the first true neighbor, MRR contribution, AP@10 and P@5,
    * with brute-force top-10 as relevance. Every metric is EXACT INTEGER
    * arithmetic: rr_q = 2^20 // first_rank; AP's rational partial sums
    * clear denominators with lcm(1..10) = 2520 — ap_q =
    * (Σ_{hits} cum_hits·(2520//rank))·2^20 // (2520·n_rel) — so the oracle
    * replays both searches AND the metric arithmetic bit-for-bit (the
    * log-discounted NDCG is deliberately absent: transcendental discounts
    * are not cross-engine replayable; AP carries the same signal
    * rationally).
    *
    * Scale shape: both search arms are the measured q_ann_recall plans;
    * the metric pass is a window + agg over ≤ k rows per probe. */
  def qAnnMrr(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val ivf = graft.operators.Similarity.ivfTopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10,
      nCells = 16, iters = 2, nProbe = 2)
      .select(col("probe_id"), col("rnk"), col("vec_id"))
    val brute = graft.operators.Similarity.bruteTopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10)
      .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy("rnk")
    ivf.join(brute, Seq("probe_id", "vec_id"), "left")
      .withColumn("rel", coalesce(col("__hit"), lit(0L)))
      .withColumn("cum", sum(col("rel")).over(w))
      .groupBy("probe_id")
      .agg(sum(col("rel")).as("n_rel"),
        min(when(col("rel") === 1L, col("rnk"))).as("fr"),
        sum(when(col("rel") === 1L,
          col("cum") * expr("2520 div rnk"))).as("apn"),
        sum(when(col("rel") === 1L && col("rnk") <= 5L, 1L).otherwise(0L))
          .as("p_at_5"))
      .select(col("probe_id"), col("n_rel"),
        coalesce(col("fr"), lit(0L)).as("first_hit_rank"),
        coalesce(expr("1048576 div fr"), lit(0L)).as("rr_q"),
        when(col("n_rel") > 0L, expr("(apn * 1048576) div (2520 * n_rel)"))
          .otherwise(0L).as("ap_q"),
        col("p_at_5"))
      .orderBy("probe_id")
  }

  /** Truncated-dimension retrieval quality (the Matryoshka/MRL question:
    * how much of the 64-dim ranking survives if the index stores only the
    * first 16 or 32 dimensions?): exact brute top-10 per probe at dim 16
    * and 32 vs the full-dim brute top-10 as ground truth, overlap counted
    * per (probe, dim). The answer decides whether a 4× cheaper
    * coarse-filter stage is safe — the standard two-stage retrieval
    * design (truncated scan → full-dim re-rank of survivors).
    *
    * All three arms are the quantized-exact [[bruteTopKBatchQ]] machinery
    * over prefix slices, so every overlap is an exact integer the oracle
    * replays (truncation in SQL = `pos <= d` on the flat CTE). Scale
    * shape: three deliberate brute scans — this is a measurement query
    * like q_ann_recall, not a serving path; each arm is one broadcast
    * probe table against an embarrassingly parallel scan. */
  def qAnnDimTradeoff(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val full = graft.operators.Similarity.bruteTopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10)
      .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
    Seq(16, 32).map { d =>
      val sub = emb.select(col("vec_id"),
        slice(col("embedding"), 1, d).as("sub"))
      graft.operators.Similarity.bruteTopKBatchQ(sub, "vec_id", "sub", probes, k = 10)
        .select(col("probe_id"), col("vec_id"))
        .join(full, Seq("probe_id", "vec_id"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("n_trunc"),
          sum(coalesce(col("__hit"), lit(0L))).as("overlap_at_10"))
        .withColumn("dim", lit(d.toLong))
    }.reduce(_ unionByName _)
      .select(col("probe_id"), col("dim"), col("n_trunc"), col("overlap_at_10"))
      .orderBy("probe_id", "dim")
  }

  lazy val qAnnDimTradeoffSql: String = {
    def arm(d: Int, tag: String): String =
      s"""n$tag AS (
         |  SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2
         |  FROM flat WHERE pos <= $d GROUP BY 1),
         |bd$tag AS (
         |  SELECT p.probe_id, f.vec_id, CAST(sum(f.vq * q.vq) AS BIGINT) AS dot
         |  FROM flat f
         |  JOIN probes p ON TRUE
         |  JOIN flat q ON q.vec_id = p.probe_id AND q.pos = f.pos
         |  WHERE f.pos <= $d AND f.vec_id <> p.probe_id
         |  GROUP BY 1, 2),
         |b$tag AS (
         |  SELECT probe_id, vec_id FROM (
         |    SELECT d.probe_id, d.vec_id,
         |           CAST(d.dot AS DOUBLE)
         |             / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(np.norm2 AS DOUBLE))) AS cosine
         |    FROM bd$tag d
         |    JOIN n$tag n ON n.vec_id = d.vec_id
         |    JOIN n$tag np ON np.vec_id = d.probe_id
         |    WHERE n.norm2 > 0 AND np.norm2 > 0)
         |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) <= 10)""".stripMargin
    s"""WITH $FlatSqlCte,
       |probes AS (
       |  SELECT CAST(x AS BIGINT) AS probe_id
       |  FROM (VALUES (0), (1), (2), (3), (4)) t(x)),
       |${arm(64, "full")},
       |${arm(16, "16")},
       |${arm(32, "32")},
       |ovl AS (
       |  SELECT t.probe_id, CAST(16 AS BIGINT) AS dim, count(*) AS n_trunc,
       |         CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |           AS overlap_at_10
       |  FROM b16 t LEFT JOIN bfull f
       |    ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
       |  GROUP BY 1
       |  UNION ALL
       |  SELECT t.probe_id, CAST(32 AS BIGINT), count(*),
       |         CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |  FROM b32 t LEFT JOIN bfull f
       |    ON f.probe_id = t.probe_id AND f.vec_id = t.vec_id
       |  GROUP BY 1)
       |SELECT probe_id, dim, n_trunc, overlap_at_10
       |FROM ovl ORDER BY probe_id, dim""".stripMargin
  }

  lazy val qAnnMrrSql: String =
    s"""WITH $annIvfBruteSqlCtes,
       |scoredm AS (
       |  SELECT i.probe_id, i.rnk,
       |         CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
       |  FROM ivf i
       |  LEFT JOIN brute b ON b.probe_id = i.probe_id AND b.vec_id = i.vec_id),
       |cums AS (
       |  SELECT probe_id, rnk, rel,
       |         sum(rel) OVER (PARTITION BY probe_id ORDER BY rnk) AS cum
       |  FROM scoredm),
       |aggm AS (
       |  SELECT probe_id,
       |         CAST(sum(rel) AS BIGINT) AS n_rel,
       |         min(CASE WHEN rel = 1 THEN rnk END) AS fr,
       |         CAST(sum(CASE WHEN rel = 1 THEN cum * (2520 // rnk) END) AS BIGINT) AS apn,
       |         CAST(sum(CASE WHEN rel = 1 AND rnk <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS p_at_5
       |  FROM cums GROUP BY probe_id)
       |SELECT probe_id, n_rel,
       |       CAST(COALESCE(fr, 0) AS BIGINT) AS first_hit_rank,
       |       CAST(COALESCE(1048576 // fr, 0) AS BIGINT) AS rr_q,
       |       CAST(CASE WHEN n_rel > 0 THEN (apn * 1048576) // (2520 * n_rel)
       |                 ELSE 0 END AS BIGINT) AS ap_q,
       |       p_at_5
       |FROM aggm ORDER BY probe_id""".stripMargin

  /** One PQ subspace's Lloyd chain as CTEs (requires `pqseeds` and the
    * `src` table — `flat` for flat PQ, the residual table for IVF-PQ —
    * in scope): cent0_j from the shared seeds' sub-slices (positions
    * (lo, hi]), `iters` integer Lloyd rounds restricted to those
    * positions, final code assignment `code_j(vec_id, cell)`. The same
    * integer-exact discipline as [[lloydSqlCtes]], replayed per subspace. */
  private def pqSubCtes(j: Int, lo: Int, hi: Int, iters: Int,
                        src: String = "flat"): String = {
    val lloyd = (1 to iters).map { i =>
      s"""d${i}_$j AS (
         |  SELECT f.vec_id, c.cell, CAST(sum((f.vq - c.cq) * (f.vq - c.cq)) AS BIGINT) AS d
         |  FROM $src f JOIN cent${i - 1}_$j c ON f.pos = c.pos GROUP BY 1, 2),
         |a${i}_$j AS (
         |  SELECT vec_id, cell FROM d${i}_$j
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
         |cent${i}_$j AS (
         |  SELECT a.cell, f.pos,
         |         CAST(floor(CAST(sum(f.vq) AS DOUBLE) / count(*)) AS BIGINT) AS cq
         |  FROM a${i}_$j a JOIN $src f ON f.vec_id = a.vec_id
         |  WHERE f.pos > $lo AND f.pos <= $hi
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""cent0_$j AS (
       |  SELECT s.cell, f.pos, f.vq AS cq FROM pqseeds s
       |  JOIN $src f ON f.vec_id = s.vec_id WHERE f.pos > $lo AND f.pos <= $hi),
       |$lloyd,
       |dcode_$j AS (
       |  SELECT f.vec_id, c.cell, CAST(sum((f.vq - c.cq) * (f.vq - c.cq)) AS BIGINT) AS d
       |  FROM $src f JOIN cent${iters}_$j c ON f.pos = c.pos GROUP BY 1, 2),
       |code_$j AS (
       |  SELECT vec_id, cell FROM dcode_$j
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1)""".stripMargin
  }

  /** IVF-PQ with asymmetric distance (round 12,
    * [[graft.operators.Similarity.pqIndexQ]] /
    * [[graft.operators.Similarity.pqTopKBatchQ]]): m = 8 subspaces × 8
    * dims, ksub = 16 codes each — every vector stored as 8 small codes —
    * probed by 5 probes at k = 10 through driver-built ADC tables, recall
    * measured against the EXACT squared-L2 brute top-10
    * ([[graft.operators.Similarity.bruteL2TopKBatchQ]] — same metric PQ
    * approximates). Output (probe_id, n_pq, recall_at_10), all exact
    * integers: the oracle replays all 8 codebook trainings (shared Knuth
    * seeds, per-subspace Lloyd rounds), the encoding, the ADC tables, and
    * both top-10s as integer CTEs. The brute arm is deliberately O(n·probes)
    * — it exists to measure the PQ arm (the q_ann_recall convention). */
  def qAnnSq8(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val sq8 = graft.operators.Similarity.sq8TopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10)
      .select(col("probe_id"), col("vec_id"))
    val brute = graft.operators.Similarity.bruteL2TopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10)
      .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
    sq8.join(brute, Seq("probe_id", "vec_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_sq8"),
        sum(coalesce(col("__hit"), lit(0L))).as("recall_at_10"))
      .orderBy("probe_id")
  }

  /** Oracle for [[qAnnSq8]]: per-dim min/range stats, the clamped
    * encode, the reconstruction, both distance rankings, the recall
    * join — all integer CTEs over the shared `flat` quantization. */
  lazy val qAnnSq8Sql: String =
    s"""WITH $FlatSqlCte,
       |st AS (
       |  SELECT pos, CAST(min(vq) AS BIGINT) AS mn,
       |         CAST(max(vq) - min(vq) AS BIGINT) AS rng
       |  FROM flat GROUP BY 1),
       |dqv AS (
       |  SELECT f.vec_id, f.pos,
       |         st.mn + (greatest(least(
       |             (f.vq - st.mn) * 255 // greatest(st.rng, 1), 255), 0)
       |           * st.rng) // 255 AS dq
       |  FROM flat f JOIN st USING (pos)),
       |pr AS (SELECT vec_id AS probe_id, pos, vq AS pv
       |       FROM flat WHERE vec_id IN (0, 1, 2, 3, 4)),
       |ad AS (
       |  SELECT p.probe_id, d.vec_id,
       |         CAST(sum((d.dq - p.pv) * (d.dq - p.pv)) AS BIGINT) AS adist
       |  FROM dqv d JOIN pr p ON p.pos = d.pos
       |  WHERE d.vec_id <> p.probe_id GROUP BY 1, 2),
       |sq8 AS (
       |  SELECT probe_id, vec_id FROM ad
       |  QUALIFY row_number() OVER (PARTITION BY probe_id
       |                             ORDER BY adist, vec_id) <= 10),
       |bdist AS (
       |  SELECT p.probe_id, f.vec_id,
       |         CAST(sum((f.vq - p.pv) * (f.vq - p.pv)) AS BIGINT) AS d
       |  FROM flat f JOIN pr p ON p.pos = f.pos
       |  WHERE f.vec_id <> p.probe_id GROUP BY 1, 2),
       |brute AS (
       |  SELECT probe_id, vec_id FROM bdist
       |  QUALIFY row_number() OVER (PARTITION BY probe_id
       |                             ORDER BY d, vec_id) <= 10)
       |SELECT s.probe_id, count(*) AS n_sq8,
       |       CAST(sum(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS recall_at_10
       |FROM sq8 s
       |LEFT JOIN brute b ON b.probe_id = s.probe_id AND b.vec_id = s.vec_id
       |GROUP BY s.probe_id ORDER BY s.probe_id""".stripMargin

  /** Johnson–Lindenstrauss signed-projection ANN (round 15) — the fourth
    * member of the compression family (dim-truncation / PQ / SQ8 / JL):
    * Achlioptas-2003 dense ±1 projection 64→16 dims (public literature),
    * deterministic sign matrix from md5 parity so the oracle recomputes
    * it entry for entry, exact integer L2 ranking in the projected
    * space, recall@10 against the shared brute baseline. SQ8 compresses
    * STORAGE (4 bytes→1 per component at full dim); JL compresses
    * COMPUTE (distances cost 16 adds-squares instead of 64) — the
    * readout quantifies what that buys in recall on the same probes. */
  def qAnnJl(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val brute = graft.operators.Similarity.bruteL2TopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10)
      .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
    // the readout is the dimension-tradeoff CURVE (the q_ann_dim_tradeoff
    // posture): the fixture's random high-d embeddings have concentrated
    // pairwise distances, so recall is weak at ANY compression — the
    // measured curve is the honest fact a serving team would tune on
    Seq(16, 32, 48).map { dims =>
      graft.operators.Similarity.jlTopKBatchQ(
          emb, "vec_id", "embedding", probes, k = 10, outDims = dims)
        .select(col("probe_id"), col("vec_id"))
        .join(brute, Seq("probe_id", "vec_id"), "left")
        .groupBy("probe_id")
        .agg(count(lit(1)).as("n_jl"),
          sum(coalesce(col("__hit"), lit(0L))).as("recall_at_10"))
        .select(lit(dims.toLong).as("out_dims"), col("probe_id"),
          col("n_jl"), col("recall_at_10"))
    }.reduce(_ unionAll _)
      .orderBy("out_dims", "probe_id")
  }

  /** Oracle for [[qAnnJl]]: the sign matrix from md5 parity (j = pos−1,
    * matching the 0-based Scala input dim), the projection as a
    * sign-weighted sum per output dim, both rankings, the recall join —
    * all integer CTEs over the shared `flat` quantization. */
  lazy val qAnnJlSql: String = {
    def block(dims: Int): String = {
      val p = s"j$dims"
      s"""${p}sign AS MATERIALIZED (
         |  SELECT dd.d, pp.pos,
         |         CASE WHEN CAST('0x' || substr(md5(dd.d || '#' || (pp.pos - 1)), 1, 6) AS BIGINT) % 2 = 0
         |              THEN 1 ELSE -1 END AS sgn
         |  FROM (SELECT unnest(generate_series(0, ${dims - 1})) AS d) dd,
         |       (SELECT DISTINCT pos FROM flat) pp),
         |${p}proj AS MATERIALIZED (
         |  SELECT f.vec_id, s.d, CAST(sum(s.sgn * f.vq) AS BIGINT) AS jv
         |  FROM flat f JOIN ${p}sign s ON s.pos = f.pos
         |  GROUP BY 1, 2),
         |${p}pr AS (SELECT vec_id AS probe_id, d, jv AS pj
         |        FROM ${p}proj WHERE vec_id IN (0, 1, 2, 3, 4)),
         |${p}dist AS (
         |  SELECT p.probe_id, x.vec_id,
         |         CAST(sum((x.jv - p.pj) * (x.jv - p.pj)) AS BIGINT) AS jd
         |  FROM ${p}proj x JOIN ${p}pr p ON p.d = x.d
         |  WHERE x.vec_id <> p.probe_id GROUP BY 1, 2),
         |${p}top AS (
         |  SELECT probe_id, vec_id FROM ${p}dist
         |  QUALIFY row_number() OVER (PARTITION BY probe_id
         |                             ORDER BY jd, vec_id) <= 10)""".stripMargin
    }
    val selects = Seq(16, 32, 48).map { dims =>
      s"""SELECT CAST($dims AS BIGINT) AS out_dims, s.probe_id,
         |       count(*) AS n_jl,
         |       CAST(sum(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS recall_at_10
         |FROM j${dims}top s
         |LEFT JOIN jbrute b ON b.probe_id = s.probe_id AND b.vec_id = s.vec_id
         |GROUP BY s.probe_id""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $FlatSqlCte,
       |${Seq(16, 32, 48).map(block).mkString(",\n")},
       |jbpr AS (SELECT vec_id AS probe_id, pos, vq AS pv
       |         FROM flat WHERE vec_id IN (0, 1, 2, 3, 4)),
       |jbdist AS (
       |  SELECT p.probe_id, f.vec_id,
       |         CAST(sum((f.vq - p.pv) * (f.vq - p.pv)) AS BIGINT) AS d
       |  FROM flat f JOIN jbpr p ON p.pos = f.pos
       |  WHERE f.vec_id <> p.probe_id GROUP BY 1, 2),
       |jbrute AS MATERIALIZED (
       |  SELECT probe_id, vec_id FROM jbdist
       |  QUALIFY row_number() OVER (PARTITION BY probe_id
       |                             ORDER BY d, vec_id) <= 10)
       |$selects
       |ORDER BY out_dims, probe_id""".stripMargin
  }

  /** PERSISTED-index serving (round 15) — the production lifecycle every
    * vector store runs and every other ANN query here elides: the index
    * is built ONCE, written as durable artifacts, and SERVING loads the
    * artifacts — it never re-trains. Pipeline: ivfIndexQ (the q_ann_ivf
    * build verbatim) → centroids (the bounded model matrix) and the
    * corpus-sized cell-assignment table both written to parquet → a
    * FRESH read of both artifacts serves the probe through
    * [[graft.operators.Similarity.ivfTopKQ]]. The oracle is qAnnIvfSql
    * VERBATIM — persistence must be byte-invisible to the result, which
    * is precisely the property an index snapshot must guarantee
    * (a serving fleet and the build job only share the artifacts).
    *
    * Scale shape: the assignment write/read is partition-parallel and
    * the serving probe touches only the nProbe candidate cells through
    * the reloaded assignment table (filter pushed to its parquet scan);
    * the centroid artifact is |cells|·dim longs — driver-bounded on
    * reload exactly as in memory. */
  def qAnnPersist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, sfDir, "embeddings")
    val base = "/root/repo/target/ann_index/" + new java.io.File(sfDir).getName
    val (centroids, assignments) = graft.operators.Similarity
      .ivfIndexQ(emb, "vec_id", "embedding", nCells = 16, iters = 2)
    centroids.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cvq")
      .coalesce(1).write.mode("overwrite").parquet(base + "/centroids")
    assignments.write.mode("overwrite").parquet(base + "/assignments")
    val cents2: Array[(Int, Array[Long])] = spark.read
      .parquet(base + "/centroids")
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1)
    val asg2 = spark.read.parquet(base + "/assignments")
    graft.operators.Similarity.ivfTopKQ(emb, "vec_id", "embedding",
      cents2, asg2, probeId = 0L, k = 5, nProbe = 4)
  }

  def qAnnPq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val probes = Seq(0L, 1L, 2L, 3L, 4L)
    val pq = graft.operators.Similarity.pqTopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10, m = 8, ksub = 16, iters = 2)
      .select(col("probe_id"), col("vec_id"))
    val brute = graft.operators.Similarity.bruteL2TopKBatchQ(
      emb, "vec_id", "embedding", probes, k = 10)
      .select(col("probe_id"), col("vec_id"), lit(1L).as("__hit"))
    pq.join(brute, Seq("probe_id", "vec_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_pq"),
        sum(coalesce(col("__hit"), lit(0L))).as("recall_at_10"))
      .orderBy("probe_id")
  }

  lazy val qAnnPqSql: String = {
    val M = 8; val Dsub = 8; val Ksub = 16; val Iters = 2
    val subs = (0 until M).map(j => pqSubCtes(j, j * Dsub, (j + 1) * Dsub, Iters))
      .mkString(",\n")
    val dts = (0 until M).map { j =>
      s"""dt_$j AS (
         |  SELECT q.probe_id, c.cell, CAST(sum((q.vq - c.cq) * (q.vq - c.cq)) AS BIGINT) AS d
         |  FROM cent${Iters}_$j c JOIN probq q ON q.pos = c.pos GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val contribs = (0 until M).map { j =>
      s"SELECT dt.probe_id, a.vec_id, dt.d FROM code_$j a JOIN dt_$j dt ON dt.cell = a.cell"
    }.mkString("\n  UNION ALL ")
    s"""WITH $FlatSqlCte,
       |pqseeds AS (
       |  SELECT vec_id,
       |         CAST(row_number() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) - 1 AS INT) AS cell
       |  FROM embeddings
       |  QUALIFY row_number() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) <= $Ksub),
       |$subs,
       |probes AS (
       |  SELECT CAST(x AS BIGINT) AS probe_id
       |  FROM (VALUES (0), (1), (2), (3), (4)) t(x)),
       |probq AS (
       |  SELECT p.probe_id, f.pos, f.vq
       |  FROM probes p JOIN flat f ON f.vec_id = p.probe_id),
       |$dts,
       |approx AS (
       |  SELECT probe_id, vec_id, CAST(sum(d) AS BIGINT) AS adist
       |  FROM ($contribs)
       |  GROUP BY 1, 2),
       |pqtop AS (
       |  SELECT probe_id, vec_id FROM approx
       |  WHERE vec_id <> probe_id
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) <= 10),
       |bdist AS (
       |  SELECT q.probe_id, f.vec_id, CAST(sum((f.vq - q.vq) * (f.vq - q.vq)) AS BIGINT) AS d
       |  FROM flat f JOIN probq q ON q.pos = f.pos
       |  WHERE f.vec_id <> q.probe_id
       |  GROUP BY 1, 2),
       |brute AS (
       |  SELECT probe_id, vec_id FROM bdist
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d, vec_id) <= 10)
       |SELECT p.probe_id, count(*) AS n_pq,
       |       CAST(sum(CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS recall_at_10
       |FROM pqtop p
       |LEFT JOIN brute b ON b.probe_id = p.probe_id AND b.vec_id = p.vec_id
       |GROUP BY p.probe_id
       |ORDER BY p.probe_id""".stripMargin
  }

  /** IVF-PQ search, the full FAISS IVFADC composition (round 12,
    * [[graft.operators.Similarity.ivfPqIndexQ]] /
    * [[graft.operators.Similarity.ivfPqTopKBatchQ]]): 16-cell coarse
    * quantizer (the q_ann_ivf Lloyd build), ONE global 8×16 product
    * quantizer trained on coarse RESIDUALS (the paper's accuracy insight —
    * fused `argmin_residual` kernel pass), 5 probes × top-10 through
    * per-(probe, probed-cell) ADC tables with nProbe = 4 — only probed
    * cells are scanned (equi-join on the cell id), never the corpus.
    * Output (probe_id, rnk, vec_id, adist), all exact integers: the
    * oracle replays the coarse Lloyd chain, the residual computation, all
    * 8 residual codebook trainings, the encoding, the per-cell probe
    * residuals and ADC tables, and the top-10 — ~95 integer CTEs. */
  def qAnnIvfpq(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Similarity.ivfPqTopKBatchQ(
        t(spark, sfDir, "embeddings"), "vec_id", "embedding",
        probeIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10,
        nCells = 16, m = 8, ksub = 16, iters = 2, nProbe = 4)
      .orderBy("probe_id", "rnk")

  lazy val qAnnIvfpqSql: String = {
    val M = 8; val Dsub = 8; val Ksub = 16; val Iters = 2
    val NProbe = 4; val K = 10
    val subs = (0 until M)
      .map(j => pqSubCtes(j, j * Dsub, (j + 1) * Dsub, Iters, src = "rflat"))
      .mkString(",\n")
    val dts = (0 until M).map { j =>
      s"""dt_$j AS (
         |  SELECT r.probe_id, r.cell AS pcell, c.cell AS code,
         |         CAST(sum((r.vq - c.cq) * (r.vq - c.cq)) AS BIGINT) AS d
         |  FROM cent${Iters}_$j c JOIN prflat r ON r.pos = c.pos
         |  GROUP BY 1, 2, 3)""".stripMargin
    }.mkString(",\n")
    val contribs = (0 until M).map { j =>
      s"SELECT dt.probe_id, k.vec_id, dt.d FROM code_$j k " +
        s"JOIN afin a ON a.vec_id = k.vec_id " +
        s"JOIN dt_$j dt ON dt.pcell = a.cell AND dt.code = k.cell"
    }.mkString("\n  UNION ALL ")
    s"""WITH $FlatSqlCte,
       |${lloydSqlCtes(nCells = 16, iters = Iters)},
       |rflat AS MATERIALIZED (
       |  SELECT f.vec_id, f.pos, f.vq - c.cq AS vq
       |  FROM flat f JOIN afin a ON a.vec_id = f.vec_id
       |  JOIN cent$Iters c ON c.cell = a.cell AND c.pos = f.pos),
       |pqseeds AS (
       |  SELECT vec_id,
       |         CAST(row_number() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) - 1 AS INT) AS cell
       |  FROM embeddings
       |  QUALIFY row_number() OVER (ORDER BY ((vec_id % 2147483648) * 2654435761) % 4294967296, vec_id) <= $Ksub),
       |$subs,
       |probes AS (
       |  SELECT CAST(x AS BIGINT) AS probe_id
       |  FROM (VALUES (0), (1), (2), (3), (4)) t(x)),
       |probq AS (
       |  SELECT p.probe_id, f.pos, f.vq
       |  FROM probes p JOIN flat f ON f.vec_id = p.probe_id),
       |pcells AS (
       |  SELECT probe_id, cell FROM (
       |    SELECT q.probe_id, c.cell,
       |           CAST(sum((q.vq - c.cq) * (q.vq - c.cq)) AS BIGINT) AS d
       |    FROM cent$Iters c JOIN probq q ON q.pos = c.pos GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d, cell) <= $NProbe),
       |prflat AS MATERIALIZED (
       |  SELECT q.probe_id, p.cell, q.pos, q.vq - c.cq AS vq
       |  FROM probq q JOIN pcells p ON p.probe_id = q.probe_id
       |  JOIN cent$Iters c ON c.cell = p.cell AND c.pos = q.pos),
       |$dts,
       |approx AS (
       |  SELECT probe_id, vec_id, CAST(sum(d) AS BIGINT) AS adist
       |  FROM ($contribs)
       |  GROUP BY 1, 2)
       |SELECT probe_id,
       |       row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rnk,
       |       vec_id, adist
       |FROM approx
       |WHERE vec_id <> probe_id
       |QUALIFY rnk <= $K
       |ORDER BY probe_id, rnk""".stripMargin
  }

  /** Contrastive training-pair mining (round 12) — the stage that turns a
    * curated corpus into retrieval/embedding-model training data (the
    * DPR/SimCSE-style recipe, public literature): POSITIVES are lexical
    * near-dup pairs (n-gram Jaccard ≥ 0.5 — each anchor keeps its best
    * mate by (jaccard desc, id)), HARD NEGATIVES are mined in EMBEDDING
    * space — the anchor's best IVF cosine neighbor that is NOT one of its
    * near-dup mates (semantically close but not a duplicate, exactly what
    * contrastive training wants). Output one triplet row per anchor:
    * (anchor, pos_id, pos_jaccard, neg_id, neg_cosine), neg NULL when all
    * k retrieved neighbors were mates.
    *
    * Scale shape: positives ride the banded jaccard machinery (never
    * all-pairs); the anchor set is a DETERMINISTIC BOUNDED batch — the 64
    * lowest-md5 anchors with embeddings (mining runs in anchor batches in
    * production; the collect is ≤ 64 ids by construction); negatives come
    * from ONE shared IVF index scan for the whole batch
    * ([[graft.operators.Similarity.ivfTopKBatchQ]] — broadcast routing,
    * bounded-heap top-k). The oracle replays the jaccard pairs, the
    * md5 anchor cap, the full Lloyd chain, the probe routing, the cosine
    * scoring, the mate exclusion and both picks. */
  def qPairMining(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, sfDir, "documents")
    val emb = t(spark, sfDir, "embeddings")
    val pairs = graft.operators.Dedup
      .jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
    // NOT cached: on a corpus with large near-dup cliques the full
    // symmetric pair table is Ω(clique²) — caching it blew the host's
    // 30 GB spill budget at the 1000× replicated fixture. The anchor
    // derivation streams it once; everything downstream only ever needs
    // the ANCHOR-RESTRICTED subset (bounded: ≤ 64 anchors × their
    // mates), which is what gets cached below. The second pass over the
    // pair join reuses the operator's cached shingle tables (Spark's
    // CacheManager matches the canonicalized plans), so shingling is
    // still paid once.
    val sym =
      pairs.select(col("d1").as("anchor"), col("d2").as("mate"), col("jaccard"))
        .unionByName(
          pairs.select(col("d2").as("anchor"), col("d1").as("mate"), col("jaccard")))
    // bounded anchor batch: lowest-md5 64 anchors that have an embedding
    // (orderBy+limit plans as TakeOrderedAndProject; collect ≤ 64 rows)
    val anchorIds = sym.select(col("anchor")).distinct()
      .join(emb.select(col("vec_id").as("anchor")), Seq("anchor"), "left_semi")
      .orderBy(graft.plans.HashExpressions.md5Prefix(col("anchor").cast("string"), 8),
        col("anchor"))
      .limit(64)
      .as[Long].collect().toSeq
    val symA = graft.CacheScope.cached(
      sym.filter(col("anchor").isInCollection(anchorIds)))
    val w = org.apache.spark.sql.expressions.Window
    val bestPos = symA
      .withColumn("rn", row_number().over(
        w.partitionBy("anchor").orderBy(col("jaccard").desc, col("mate").asc)))
      .filter(col("rn") === 1)
      .select(col("anchor"), col("mate").as("pos_id"),
        col("jaccard").as("pos_jaccard"))
    val neigh = graft.operators.Similarity.ivfTopKBatchQ(
      emb, "vec_id", "embedding", anchorIds, k = 5,
      nCells = 16, iters = 2, nProbe = 4)
    val negs = neigh
      .join(symA.select(col("anchor").as("probe_id"), col("mate").as("vec_id")),
        Seq("probe_id", "vec_id"), "left_anti")
      .withColumn("rn", row_number().over(
        w.partitionBy("probe_id").orderBy(col("rnk").asc)))
      .filter(col("rn") === 1)
      .select(col("probe_id").as("anchor"), col("vec_id").as("neg_id"),
        col("cosine").as("neg_cosine"))
    bestPos.join(negs, Seq("anchor"), "left")
      .select(col("anchor"), col("pos_id"), col("pos_jaccard"),
        col("neg_id"), col("neg_cosine"))
      .orderBy("anchor")
  }

  lazy val qPairMiningSql: String =
    s"""WITH ${DedupQueries.shinglesSqlCte("documents")},
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jp AS (
       |  SELECT d1, d2,
       |         CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS j
       |  FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.5),
       |sym AS (
       |  SELECT d1 AS anchor, d2 AS mate, j FROM jp
       |  UNION ALL SELECT d2, d1, j FROM jp),
       |$FlatSqlCte,
       |anchors AS (
       |  SELECT anchor FROM (
       |    SELECT DISTINCT s.anchor FROM sym s
       |    JOIN embeddings e ON e.vec_id = s.anchor)
       |  QUALIFY row_number() OVER (
       |    ORDER BY substr(md5(CAST(anchor AS VARCHAR)), 1, 8), anchor) <= 64),
       |bestpos AS (
       |  SELECT s.anchor, s.mate AS pos_id, s.j AS pos_jaccard
       |  FROM sym s JOIN anchors a ON a.anchor = s.anchor
       |  QUALIFY row_number() OVER (PARTITION BY s.anchor
       |                             ORDER BY s.j DESC, s.mate) = 1),
       |${lloydSqlCtes(nCells = 16, iters = 2)},
       |probq AS (
       |  SELECT a.anchor AS probe_id, f.pos, f.vq
       |  FROM anchors a JOIN flat f ON f.vec_id = a.anchor),
       |pcells AS (
       |  SELECT probe_id, cell FROM (
       |    SELECT q.probe_id, c.cell,
       |           CAST(sum((q.vq - c.cq) * (q.vq - c.cq)) AS BIGINT) AS d
       |    FROM cent2 c JOIN probq q ON q.pos = c.pos GROUP BY 1, 2)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY d, cell) <= 4),
       |cand AS (
       |  SELECT p.probe_id, a.vec_id
       |  FROM afin a JOIN pcells p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.probe_id),
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |dots AS (
       |  SELECT c.probe_id, c.vec_id, CAST(sum(f.vq * q.vq) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN flat f ON f.vec_id = c.vec_id
       |  JOIN probq q ON q.probe_id = c.probe_id AND q.pos = f.pos
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.probe_id, d.vec_id,
       |         CAST(d.dot AS DOUBLE)
       |           / (sqrt(CAST(n.norm2 AS DOUBLE)) * sqrt(CAST(np.norm2 AS DOUBLE))) AS cosine
       |  FROM dots d
       |  JOIN norms n ON n.vec_id = d.vec_id
       |  JOIN norms np ON np.vec_id = d.probe_id
       |  WHERE n.norm2 > 0 AND np.norm2 > 0),
       |nb AS (
       |  SELECT probe_id, vec_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY probe_id
       |                                 ORDER BY cosine DESC, vec_id) AS BIGINT) AS rnk
       |  FROM scored
       |  QUALIFY rnk <= 5),
       |negs AS (
       |  SELECT probe_id AS anchor, vec_id AS neg_id, cosine AS neg_cosine
       |  FROM nb
       |  WHERE NOT EXISTS (SELECT 1 FROM sym s
       |                    WHERE s.anchor = nb.probe_id AND s.mate = nb.vec_id)
       |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY rnk) = 1)
       |SELECT b.anchor, b.pos_id, b.pos_jaccard, n.neg_id, n.neg_cosine
       |FROM bestpos b LEFT JOIN negs n ON n.anchor = b.anchor
       |ORDER BY b.anchor""".stripMargin

  /** Embedding-space decontamination (round 11) — the SEMANTIC sibling of
    * the n-gram q_decontaminate: corpus vectors too close (quantized
    * cosine ≥ 0.3, the family's verification threshold) to ANY held-out
    * eval vector are dropped before
    * training, catching paraphrased/reworded eval leakage that n-gram
    * overlap misses (the reasoning behind embedding-level decontamination
    * in recent data-curation work — public literature). Eval set =
    * vec_id < 25 (the fixture's held-out slice); output per label:
    * (n_total, n_dropped) over the candidate corpus.
    *
    * Scale shape: the eval set is SMALL by definition, so it broadcasts
    * quantized+normed and the scan is one row-local pass per corpus
    * vector — O(n·|eval|·d) with NO shuffle of the corpus before the
    * per-label aggregate (the same broadcast-probe shape as
    * bruteTopKBatchQ); norms computed once per side. Quantized-exact end
    * to end, so the whole operator is hash-oracled. */
  def qEmbedDecontam(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val evalVecs = broadcast(
      emb.filter(col("vec_id") < 25)
        .select(col("vec_id").as("eval_id"), quantArr(col("embedding")).as("evq"))
        .withColumn("enrm", sqrt(qdot(col("evq"), col("evq")).cast("double")))
        .filter(col("enrm") > 0d))
    val corpus = emb.filter(col("vec_id") >= 25)
      .select(col("vec_id"), col("label"), quantArr(col("embedding")).as("vq"))
      .withColumn("nrm", sqrt(qdot(col("vq"), col("vq")).cast("double")))
    val dropped = corpus.filter(col("nrm") > 0d)
      .crossJoin(evalVecs)
      .filter(qdot(col("vq"), col("evq")).cast("double") /
        (col("nrm") * col("enrm")) >= 0.3)
      .select(col("vec_id")).distinct()
    corpus.join(dropped.withColumn("__d", lit(1L)), Seq("vec_id"), "left")
      .groupBy("label")
      .agg(count(lit(1)).as("n_total"),
        sum(coalesce(col("__d"), lit(0L))).as("n_dropped"))
      .orderBy("label")
  }

  val qEmbedDecontamSql: String =
    s"""WITH $FlatSqlCte,
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |dots AS (
       |  SELECT c.vec_id, e.vec_id AS eval_id, CAST(sum(c.vq * e.vq) AS BIGINT) AS dot
       |  FROM flat c JOIN flat e ON e.pos = c.pos AND e.vec_id < 25 AND c.vec_id >= 25
       |  GROUP BY 1, 2),
       |dropped AS (
       |  SELECT DISTINCT d.vec_id
       |  FROM dots d
       |  JOIN norms nc ON nc.vec_id = d.vec_id
       |  JOIN norms ne ON ne.vec_id = d.eval_id
       |  WHERE nc.norm2 > 0 AND ne.norm2 > 0
       |    AND CAST(d.dot AS DOUBLE)
       |          / (sqrt(CAST(nc.norm2 AS DOUBLE)) * sqrt(CAST(ne.norm2 AS DOUBLE))) >= 0.3)
       |SELECT em.label, count(*) AS n_total,
       |       CAST(sum(CASE WHEN dr.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
       |FROM embeddings em
       |LEFT JOIN dropped dr ON dr.vec_id = em.vec_id
       |WHERE em.vec_id >= 25
       |GROUP BY em.label
       |ORDER BY em.label""".stripMargin

  /** Per-label centroids + pairwise label cosine — the cluster-summary op
    * for an embedding pipeline (label drift, near-duplicate classes).
    * Exactness: quantize components (floor(v·2^20)), sum as integers
    * (order-free), centroid component = floor(s/n) back on the integer
    * grid, then integer dot/norms; one final sqrt+divide chain on
    * identical doubles, quantized. |s| ≤ n·2^20 < 2^53 ⇒ every integer
    * step is exact in both engines.
    *
    * Scale shape: the exploded (label, pos) aggregate is two-phase (the
    * shuffle carries labels×dims rows, not vectors); the centroid table is
    * labels×dims — tiny — so the pairwise stage is driver-free and the
    * pos-keyed self-join broadcasts. Linear in corpus size, quadratic only
    * in #labels. */
  def qEmbedCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    // vector-sum UDAF: one Long-array state per label per partition — the
    // scan never explodes; rows × dims stays inside the aggregate buffer
    // and the shuffle carries #labels × d longs (bit-identical to the
    // exploded oracle form, integer addition being order-free)
    val vsum = udaf(graft.functions.VectorSumAggregator)
    val comp = t(spark, sfDir, "embeddings")
      .select(col("label"), quantArr(col("embedding")).as("vq"))
      .groupBy(col("label"))
      .agg(vsum(col("vq")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("n"), posexplode(col("s")).as(Seq("pos", "sv")))
      .select(col("label"), col("pos"),
        floor(col("sv").cast("double") / col("n").cast("double")).cast("long").as("cq"))
    val cent = graft.CacheScope.cached(comp)
    val norms = cent.groupBy(col("label")).agg(sum(col("cq") * col("cq")).as("nq"))
    val dots = cent.select(col("label").as("l1"), col("pos"), col("cq").as("cq1"))
      .join(cent.select(col("label").as("l2"), col("pos"), col("cq").as("cq2")), Seq("pos"))
      .filter(col("l1") < col("l2"))
      .groupBy("l1", "l2").agg(sum(col("cq1") * col("cq2")).as("dot"))
    dots
      .join(broadcast(norms.select(col("label").as("l1"), col("nq").as("nq1"))), Seq("l1"))
      .join(broadcast(norms.select(col("label").as("l2"), col("nq").as("nq2"))), Seq("l2"))
      .select(col("l1"), col("l2"),
        floor(col("dot").cast("double") /
          sqrt(col("nq1").cast("double") * col("nq2").cast("double")) * 1048576d)
          .cast("long").as("cos_q"))
      .orderBy("l1", "l2")
  }

  val qEmbedCentroidsSql: String =
    """WITH comp AS (
      |  SELECT label, i - 1 AS pos,
      |         CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS s,
      |         count(*) AS n
      |  FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS t(i)
      |  GROUP BY 1, 2),
      |cent AS (SELECT label, pos,
      |                CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS cq
      |         FROM comp),
      |norms AS (SELECT label, CAST(sum(cq * cq) AS BIGINT) AS nq FROM cent GROUP BY label),
      |dots AS (SELECT a.label AS l1, b.label AS l2, CAST(sum(a.cq * b.cq) AS BIGINT) AS dot
      |         FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
      |         GROUP BY 1, 2)
      |SELECT l1, l2,
      |       CAST(floor(CAST(dot AS DOUBLE) / sqrt(CAST(na.nq AS DOUBLE) * CAST(nb.nq AS DOUBLE)) * 1048576) AS BIGINT) AS cos_q
      |FROM dots
      |JOIN norms na ON na.label = dots.l1
      |JOIN norms nb ON nb.label = dots.l2
      |ORDER BY l1, l2""".stripMargin

  /** Int8 scalar quantization error profile — the storage-compression
    * prep every large vector corpus runs before ANN indexing (4× smaller
    * than float32; recall cost measured by exactly this error profile).
    * Per vector: L1 and max reconstruction error of `floor(x·127)`
    * clamped to int8 range. Every arithmetic step is double-typed and
    * written identically in the oracle, and the L1 sum folds the array
    * SEQUENTIALLY (`aggregate` HOF ≙ DuckDB `list_reduce`) so even the
    * order-dependent double addition is bit-identical — no output
    * quantization needed. Row-local, shuffle-free except the output
    * sort. */
  def qVectorQuantize(spark: SparkSession, sfDir: String): DataFrame =
    // fused quant_err_stats kernel (one primitive pass) replaces the three
    // CodegenFallback HOFs; narrow sort first so range sampling never runs
    // the kernel (VectorKernel spec pins kernel ≡ the HOF derivation)
    t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .orderBy("vec_id")
      .select(col("vec_id"),
        graft.plans.VectorExpressions.quantErrStats(col("embedding")).as("st"))
      .select(col("vec_id"), col("st.n_dims").as("n_dims"),
        col("st.l1_err").as("l1_err"), col("st.max_err").as("max_err"))

  val qVectorQuantizeSql: String =
    """WITH e AS (
      |  SELECT vec_id, len(embedding) AS n_dims,
      |         list_transform(embedding, x -> abs(CAST(x AS DOUBLE) -
      |           CAST(greatest(-127, least(127, CAST(floor(CAST(x AS DOUBLE) * 127) AS BIGINT))) AS DOUBLE) / 127.0)) AS errs
      |  FROM embeddings)
      |SELECT vec_id, n_dims,
      |       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), errs), (acc, x) -> acc + x) AS l1_err,
      |       list_max(errs) AS max_err
      |FROM e ORDER BY vec_id""".stripMargin

  /** Corpus-wide self-kNN graph
    * ([[graft.operators.Similarity.knnGraphQ]]): EVERY embedding's top-3
    * approximate neighbors through the shared IVF index, with fully
    * distributed probe routing — the composition the bounded-batch ANN
    * APIs can't express (their probe routing is driver-side, the serving
    * contract; a corpus-sized probe set must route via the top_cells
    * kernel + equi-join instead). Oracle replays Lloyd through the shared
    * [[lloydSqlCtes]] chain, probe-side cell ranking as the (d, cell)
    * window over all rows, and the cell-join + cosine re-rank exactly.
    *
    * nCells=32 / nProbe=2 keeps the oracle's candidate CTE ~1.5 M pairs
    * at sf0.01 while still probing beyond the home cell (recall > the
    * nProbe=1 degenerate graph). Output 3 rows per non-degenerate src. */
  def qKnnGraph(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    // adaptive cells (≈312/cell): 32 at both verification SFs — the
    // oracle below replays exactly that — and linear candidate volume at
    // the scale fixtures (BASELINE 13b: fixed 32 at 200 k vectors was a
    // 2.5 B-row window sort). nRows comes from the parquet footers
    // (driver-side metadata, memoized) — NOT an eager count() action
    // (review r13 nit); the operator's nCells=0 sentinel resolves it to
    // knnCellsFor(nRows).
    graft.operators.Similarity.knnGraphQ(emb, "vec_id", "embedding",
        k = 3, iters = 2, nProbe = 2,
        nRows = graft.Tables.parquetRowCount(spark, sfDir, "embeddings"))
      .orderBy("src", "rnk")
  }

  /** The self-kNN-graph CTE chain (flat + Lloyd + distributed probe-cell
    * ranking + cell join + cosine re-rank), ending in `knng(src, rnk,
    * dst, cosine)` — shared by the q_knn_graph oracle and the
    * q_margin_mining oracle (which consumes the graph). */
  private def knnGraphSqlCtes(nCells: Int, iters: Int, nProbe: Int,
                              k: Int): String =
    s"""$FlatSqlCte,
       |${lloydSqlCtes(nCells = nCells, iters = iters)},
       |pd AS (
       |  SELECT f.vec_id AS src, c.cell,
       |         CAST(sum((f.vq - c.cq) * (f.vq - c.cq)) AS BIGINT) AS d
       |  FROM flat f JOIN cent$iters c ON f.pos = c.pos GROUP BY 1, 2),
       |pcells AS (
       |  SELECT src, cell FROM pd
       |  QUALIFY row_number() OVER (PARTITION BY src ORDER BY d, cell) <= $nProbe),
       |cand AS (
       |  SELECT p.src, a.vec_id AS dst
       |  FROM afin a JOIN pcells p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.src),
       |norms AS (SELECT vec_id, CAST(sum(vq * vq) AS BIGINT) AS norm2 FROM flat GROUP BY 1),
       |dots AS (
       |  SELECT c.src, c.dst, CAST(sum(fs.vq * fd.vq) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN flat fd ON fd.vec_id = c.dst
       |  JOIN flat fs ON fs.vec_id = c.src AND fs.pos = fd.pos
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.src, d.dst,
       |         CAST(d.dot AS DOUBLE)
       |           / (sqrt(CAST(ns.norm2 AS DOUBLE)) * sqrt(CAST(nd.norm2 AS DOUBLE))) AS cosine
       |  FROM dots d
       |  JOIN norms ns ON ns.vec_id = d.src
       |  JOIN norms nd ON nd.vec_id = d.dst
       |  WHERE ns.norm2 > 0 AND nd.norm2 > 0),
       |knng AS (
       |  SELECT src, rnk, dst, cosine FROM (
       |    SELECT src, dst, cosine,
       |           CAST(row_number() OVER (PARTITION BY src
       |                                   ORDER BY cosine DESC, dst) AS BIGINT) AS rnk
       |    FROM scored)
       |  WHERE rnk <= $k)""".stripMargin

  lazy val qKnnGraphSql: String =
    s"""WITH ${knnGraphSqlCtes(nCells = 32, iters = 2, nProbe = 2, k = 3)}
       |SELECT src, rnk, dst, cosine FROM knng ORDER BY src, rnk""".stripMargin

  /** Hard-negative mining (round 14) — the contrastive-training staple
    * (DPR/SimCSE practice, public literature): for every anchor, the
    * most-similar candidates that are NOT near-duplicates — the
    * similarity BAND τ_low ≤ cos < τ_high carved out of the self-kNN
    * graph (above τ_high is a duplicate and would poison the negatives;
    * below τ_low is an easy negative the model learns nothing from).
    * Zero new index code: one [[graft.operators.Similarity.knnGraphQ]]
    * pass (k = 8, adaptive cells, nRows from footer metadata), an
    * integer-quantized band filter (floor(cos·2^20) so the boundary is
    * engine-exact), and a per-anchor top-2 rank — a rank-filtered window
    * (WindowGroupLimit) over the graph's ≤ k rows per src, already
    * bounded so the window sort never sees more than k candidates (the
    * graph itself uses the r16 bounded heap aggregate). Output: (src, rnk,
    * dst, cos_q), ≤ 2 rows per anchor with in-band neighbors. */
  val HardNegLowQ = 209715L   // ≈ 0.2·2^20
  val HardNegHighQ = 734003L  // ≈ 0.7·2^20
  def qHardNegatives(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val g = graft.operators.Similarity.knnGraphQ(emb, "vec_id", "embedding",
        k = 8, iters = 2, nProbe = 2,
        nRows = graft.Tables.parquetRowCount(spark, sfDir, "embeddings"))
      .withColumn("cos_q", floor(col("cosine") * 1048576).cast("long"))
      .filter(col("cos_q") >= HardNegLowQ && col("cos_q") < HardNegHighQ)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("cos_q").desc, col("dst").asc)
    g.withColumn("neg_rnk", row_number().over(w).cast("long"))
      .filter(col("neg_rnk") <= 2)
      .select(col("src"), col("neg_rnk"), col("dst"), col("cos_q"))
      .orderBy("src", "neg_rnk")
  }

  /** Oracle: the shared kNN chain at k = 8 + the identical quantized band
    * and per-anchor re-rank. */
  lazy val qHardNegativesSql: String =
    s"""WITH ${knnGraphSqlCtes(nCells = 32, iters = 2, nProbe = 2, k = 8)},
       |band AS (
       |  SELECT src, dst,
       |         CAST(floor(cosine * 1048576) AS BIGINT) AS cos_q
       |  FROM knng
       |  WHERE CAST(floor(cosine * 1048576) AS BIGINT) >= $HardNegLowQ
       |    AND CAST(floor(cosine * 1048576) AS BIGINT) < $HardNegHighQ)
       |SELECT src,
       |       CAST(row_number() OVER (PARTITION BY src
       |                               ORDER BY cos_q DESC, dst) AS BIGINT) AS neg_rnk,
       |       dst, cos_q
       |FROM band
       |QUALIFY neg_rnk <= 2
       |ORDER BY src, neg_rnk""".stripMargin

  /** Margin-based bitext mining (round 13) — the CCMatrix/LASER scoring
    * rule (Artetxe & Schwenk 2019, arXiv:1811.01136 — the RATIO margin:
    * a candidate pair is strong when its cosine stands out from BOTH
    * members' neighborhood cosines, killing hub vectors that are
    * "close to everything"):
    *
    *   margin(x,y) = cos(x,y) / ((mean_kNN(x) + mean_kNN(y)) / 2)
    *
    * Composition: BOTH the candidate pairs and the two neighborhood
    * means come from ONE shared [[graft.operators.Similarity.knnGraphQ]]
    * scan (cached) — the plan-gate contract: no second index build, no
    * per-side rescans. Sides are simulated from the fixture's `label`
    * parity (even = source language, odd = target); mined pairs are the
    * cross-side graph edges.
    *
    * Exactness: cosines quantized to cq = floor(cos·2^20); the margin is
    * then pure integer arithmetic, margin_q = (cq·2·nx·ny·4096) div
    * (sx·ny + sy·nx) with positive-cq and positive-denominator guards so
    * Spark's `div` (truncate) and DuckDB's `//` (floor) agree. Readout:
    * global top-50 pairs by (margin_q, src, dst) — TakeOrdered, the
    * distributed top-k. */
  def qMarginMining(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = t(spark, sfDir, "embeddings")
    val g = graft.CacheScope.cached(
      graft.operators.Similarity.knnGraphQ(emb, "vec_id", "embedding",
          k = 4, iters = 2, nProbe = 2,
          nRows = graft.Tables.parquetRowCount(spark, sfDir, "embeddings"))
        .withColumn("cq", floor(col("cosine") * 1048576).cast("long")))
    val nodes = g.groupBy(col("src").as("node"))
      .agg(sum("cq").as("s"), count(lit(1)).as("n"))
    val sides = emb.select(col("vec_id"), (col("label") % 2).as("side"))
    g.filter(col("cq") > 0)
      .join(sides.select(col("vec_id").as("src"), col("side").as("sside")), Seq("src"))
      .join(sides.select(col("vec_id").as("dst"), col("side").as("dside")), Seq("dst"))
      .filter(col("sside") === 0 && col("dside") === 1)
      .join(nodes.select(col("node").as("src"), col("s").as("sx"), col("n").as("nx")), Seq("src"))
      .join(nodes.select(col("node").as("dst"), col("s").as("sy"), col("n").as("ny")), Seq("dst"))
      .filter(col("sx") * col("ny") + col("sy") * col("nx") > 0)
      .withColumn("margin_q", expr("(cq * 2 * nx * ny * 4096) div (sx * ny + sy * nx)"))
      .orderBy(col("margin_q").desc, col("src").asc, col("dst").asc)
      .limit(50)
      .select(col("src"), col("dst"), col("cq").as("cos_q"), col("margin_q"))
  }

  lazy val qMarginMiningSql: String =
    s"""WITH ${knnGraphSqlCtes(nCells = 32, iters = 2, nProbe = 2, k = 4)},
       |gq AS (
       |  SELECT src, dst, CAST(floor(cosine * 1048576) AS BIGINT) AS cq
       |  FROM knng),
       |gnodes AS (
       |  SELECT src AS node, CAST(sum(cq) AS BIGINT) AS s,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM gq GROUP BY 1),
       |gsides AS (SELECT vec_id, label % 2 AS side FROM embeddings),
       |gpairs AS (
       |  SELECT g.src, g.dst, g.cq,
       |         (g.cq * 2 * nx.n * ny.n * 4096) // (nx.s * ny.n + ny.s * nx.n) AS margin_q
       |  FROM gq g
       |  JOIN gsides ss ON ss.vec_id = g.src AND ss.side = 0
       |  JOIN gsides sd ON sd.vec_id = g.dst AND sd.side = 1
       |  JOIN gnodes nx ON nx.node = g.src
       |  JOIN gnodes ny ON ny.node = g.dst
       |  WHERE g.cq > 0 AND nx.s * ny.n + ny.s * nx.n > 0)
       |SELECT src, dst, cq AS cos_q, CAST(margin_q AS BIGINT) AS margin_q
       |FROM gpairs
       |ORDER BY margin_q DESC, src, dst LIMIT 50""".stripMargin

  /** Graph-based semantic dedup (round 13) — the CONSUMER the self-kNN
    * graph exists for: strong-edge subgraph (quantized cosine ≥ τ, the
    * SemDeDup-family threshold 0.3) → connected components → one kept
    * representative (the component-minimum id) per cluster. Unlike the
    * cell-local [[graft.operators.Similarity.semanticDedup]], components
    * CHAIN across cells (a→b→c dedups even when cos(a,c) < τ and a, c sit
    * in different cells) — the transitive semantics cluster-dedup papers
    * assume at corpus scale.
    *
    * Scale shape: candidate edges are the banded kNN graph (never
    * all-pairs); components run the O(log diameter) large-star/small-star
    * loop ([[graft.operators.Dedup.connectedComponents]]); the readout is
    * one map-side-combinable aggregate per cluster. Oracle: the shared
    * knn-graph CTE chain + a recursive min-label walk. */
  def qGraphSemdedup(spark: SparkSession, sfDir: String): DataFrame = {
    val TauQ = 314573L // ≈ 0.3·2^20, exclusive floor boundary
    val emb = t(spark, sfDir, "embeddings")
    val edges = graft.operators.Similarity.knnGraphQ(emb, "vec_id", "embedding",
        k = 4, iters = 2, nProbe = 2,
        nRows = graft.Tables.parquetRowCount(spark, sfDir, "embeddings"))
      .filter(floor(col("cosine") * 1048576).cast("long") >= TauQ)
      .select(col("src").as("d1"), col("dst").as("d2"))
    graft.operators.Dedup.connectedComponents(edges)
      .groupBy(col("cluster").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("id")).as("member_id_sum"))
      .orderBy("cluster_id")
  }

  lazy val qGraphSemdedupSql: String =
    s"""WITH RECURSIVE ${knnGraphSqlCtes(nCells = 32, iters = 2, nProbe = 2, k = 4)},
       |gedges AS (
       |  SELECT src, dst FROM knng
       |  WHERE CAST(floor(cosine * 1048576) AS BIGINT) >= 314573
       |  UNION
       |  SELECT dst, src FROM knng
       |  WHERE CAST(floor(cosine * 1048576) AS BIGINT) >= 314573),
       |gwalk AS (
       |  SELECT src, dst FROM gedges
       |  UNION
       |  SELECT w.src, e.dst FROM gwalk w JOIN gedges e ON e.src = w.dst),
       |glabels AS (
       |  SELECT src AS id, least(src, min(dst)) AS cluster
       |  FROM gwalk GROUP BY src)
       |SELECT cluster AS cluster_id, count(*) AS n_members,
       |       CAST(sum(id) AS BIGINT) AS member_id_sum
       |FROM glabels GROUP BY cluster ORDER BY cluster""".stripMargin

  /** Late-interaction retrieve-and-rerank (round 15) — the ColBERT
    * architecture (Khattab & Zaharia 2020, arXiv:2004.12832 — public
    * literature): a cheap first-stage retriever produces a bounded
    * candidate set per query, then the EXPENSIVE MaxSim score — for each
    * query token, the max dot product over the candidate's token
    * embeddings, summed over query tokens — reranks only those
    * candidates. This is the serving shape every production late-
    * interaction system runs: MaxSim over the full corpus would be
    * O(corpus·|q|·|d|·dim); retrieval bounds it to O(candidates).
    *
    *  - ColBERT's token embeddings are CONTEXTUAL — the same word embeds
    *    differently in different surroundings. The deterministic stand-in
    *    here is a bigram unit: each token is embedded as
    *    (previous-token, token) via an md5-prefix hash per dimension
    *    (16 dims in −8..8 — the q_feature_hash convention), so the
    *    oracle recomputes every vector bit-exactly AND the fixture's
    *    30-word vocabulary still yields document-specific token sets
    *    (~900 bigrams vs 30 unigrams — unigram sets are near-identical
    *    across docs and the readout would tie degenerate); real
    *    pipelines would read a trained embedding table — the dataflow
    *    is identical (unit → vector lookup);
    *  - per doc the first 24 distinct bigrams in document order (first
    *    8 for the query docs) — the token-cap every late-interaction
    *    index applies (rank filters lower to WindowGroupLimit, so the
    *    caps run map-side);
    *  - stage 1: the 32 query bigrams BROADCAST into the corpus bigram
    *    stream (inverted-index equi-join — the corpus never shuffles
    *    against a token table), overlap count, top-16 candidates per
    *    probe;
    *  - stage 2: candidates (bounded) broadcast back onto their token
    *    rows, dots via the native `long_dot` kernel, max-per-query-token
    *    then sum — two map-side-combinable aggregates; top-5 per probe.
    *
    * The probe docs retrieve themselves with full overlap 8 (their 8
    * query bigrams are a prefix-subset of their 24 doc bigrams) and the
    * spec pins self-retrieval plus readout non-degeneracy on the real
    * fixture. */
  def qMaxsimRerank(spark: SparkSession, sfDir: String): DataFrame =
    maxsimRerankCore(t(spark, sfDir, "documents"), Seq(3L, 57L, 91L, 142L))

  private[graft] def maxsimRerankCore(docs: DataFrame,
                                      probes: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dims = 16

    def tokenVec(tok: Column): Column = array((0 until dims).map { d =>
      (conv(graft.plans.HashExpressions.md5Prefix(
          concat(tok, lit("#"), lit(d.toString)), 6), 16, 10)
        .cast("long") % 17) - 8
    }: _*)

    def docBigrams(in: DataFrame): DataFrame = in
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), "\\s+")).as(Seq("p", "tok")))
      .filter(col("tok").rlike("^[a-z]+$"))
      .withColumn("bg", concat(
        lag("tok", 1, "^").over(Window.partitionBy("doc_id").orderBy("p")),
        lit(" "), col("tok")))
      .groupBy("doc_id", "bg").agg(min("p").as("p0"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy("p0", "bg")))
      .withColumnRenamed("bg", "tok")

    val qtok = docBigrams(docs.filter(col("doc_id").isin(probes: _*)))
      .filter(col("rk") <= 8)
      .select(col("doc_id").as("probe_id"), col("tok"))
    // cached: the corpus-wide bigram build (tokenize + dedup aggregate +
    // window cap) feeds BOTH the stage-1 candidate join and the stage-2
    // token-vector join — uncached it would execute twice
    val dtok = graft.CacheScope.cached(
      docBigrams(docs).filter(col("rk") <= 24).select("doc_id", "tok"))

    val cands = dtok.join(broadcast(qtok), "tok")
      .groupBy("probe_id", "doc_id").agg(count(lit(1)).as("overlap"))
      .withColumn("r1", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("overlap").desc, col("doc_id"))))
      .filter(col("r1") <= 16)
      .select("probe_id", "doc_id", "overlap")

    val qvec = qtok.select(col("probe_id"), col("tok").as("qt"),
      tokenVec(col("tok")).as("qv"))
    val dvec = dtok.join(broadcast(cands), "doc_id")
      .select(col("probe_id"), col("doc_id"), col("overlap"),
        tokenVec(col("tok")).as("dv"))

    dvec.join(broadcast(qvec), "probe_id")
      .select(col("probe_id"), col("doc_id"), col("overlap"), col("qt"),
        graft.plans.VectorExpressions.longDot(col("qv"), col("dv")).as("dot"))
      .groupBy("probe_id", "doc_id", "overlap", "qt").agg(max("dot").as("md"))
      .groupBy("probe_id", "doc_id", "overlap").agg(sum("md").as("maxsim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("probe_id").orderBy(col("maxsim").desc, col("doc_id")))
        .cast("long"))
      .filter(col("rank") <= 5)
      .select("probe_id", "rank", "doc_id", "overlap", "maxsim")
      .orderBy("probe_id", "rank")
  }

  lazy val qMaxsimRerankSql: String =
    """WITH mtokp AS MATERIALIZED (
      |  SELECT doc_id, t.w[i.i] AS tok, i.i AS p
      |  FROM (SELECT doc_id,
      |               string_split_regex(lower(text), '\s+') AS w
      |        FROM documents) t,
      |       LATERAL unnest(generate_series(1, len(t.w))) AS i(i)
      |  WHERE regexp_matches(t.w[i.i], '^[a-z]+$')),
      |mbgp AS MATERIALIZED (
      |  SELECT doc_id,
      |         coalesce(lag(tok) OVER (PARTITION BY doc_id ORDER BY p), '^')
      |           || ' ' || tok AS tok,
      |         p
      |  FROM mtokp),
      |mtok AS MATERIALIZED (
      |  SELECT doc_id, tok,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY p0, tok) AS rk
      |  FROM (SELECT doc_id, tok, min(p) AS p0 FROM mbgp GROUP BY 1, 2)),
      |mdt AS MATERIALIZED (SELECT doc_id, tok FROM mtok WHERE rk <= 24),
      |mqt AS MATERIALIZED (
      |  SELECT doc_id AS probe_id, tok FROM mtok
      |  WHERE rk <= 8 AND doc_id IN (3, 57, 91, 142)),
      |mcand AS MATERIALIZED (
      |  SELECT probe_id, doc_id, overlap FROM (
      |    SELECT q.probe_id, d.doc_id, CAST(count(*) AS BIGINT) AS overlap
      |    FROM mdt d JOIN mqt q ON q.tok = d.tok GROUP BY 1, 2)
      |  QUALIFY row_number() OVER (PARTITION BY probe_id ORDER BY overlap DESC, doc_id) <= 16),
      |mdims AS (SELECT CAST(u.d AS INT) AS d FROM unnest(generate_series(0, 15)) AS u(d)),
      |mvq AS MATERIALIZED (
      |  SELECT probe_id, tok AS qt, d,
      |         (CAST('0x' || substr(md5(tok || '#' || d), 1, 6) AS BIGINT) % 17) - 8 AS v
      |  FROM mqt, mdims),
      |mvd AS MATERIALIZED (
      |  SELECT c.probe_id, c.doc_id, c.overlap, t.tok AS dt, m.d,
      |         (CAST('0x' || substr(md5(t.tok || '#' || m.d), 1, 6) AS BIGINT) % 17) - 8 AS v
      |  FROM mcand c JOIN mdt t ON t.doc_id = c.doc_id, mdims m),
      |mdots AS MATERIALIZED (
      |  SELECT q.probe_id, dv.doc_id, dv.overlap, q.qt, dv.dt,
      |         CAST(sum(q.v * dv.v) AS BIGINT) AS dot
      |  FROM mvq q
      |  JOIN mvd dv ON dv.probe_id = q.probe_id AND dv.d = q.d
      |  GROUP BY 1, 2, 3, 4, 5),
      |mmax AS (
      |  SELECT probe_id, doc_id, overlap, qt, max(dot) AS md
      |  FROM mdots GROUP BY 1, 2, 3, 4),
      |msim AS (
      |  SELECT probe_id, doc_id, overlap, CAST(sum(md) AS BIGINT) AS maxsim
      |  FROM mmax GROUP BY 1, 2, 3)
      |SELECT probe_id, rank, doc_id, overlap, maxsim FROM (
      |  SELECT probe_id, doc_id, overlap, maxsim,
      |         CAST(row_number() OVER (PARTITION BY probe_id ORDER BY maxsim DESC, doc_id) AS BIGINT) AS rank
      |  FROM msim)
      |WHERE rank <= 5
      |ORDER BY probe_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_graph" -> (qKnnGraph _),
    "q_hard_negatives" -> (qHardNegatives _),
    "q_graph_semdedup" -> (qGraphSemdedup _),
    "q_margin_mining" -> (qMarginMining _),
    "q_vector_quantize" -> (qVectorQuantize _),
    "q_simsearch" -> (qSimsearch _),
    "q_embed_centroids" -> (qEmbedCentroids _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_embed_clusters" -> (qEmbedClusters _),
    "q_embed_decontam" -> (qEmbedDecontam _),
    "q_embed_neardup_rh" -> (qEmbedNeardupRh _),
    "q_simsearch_brute" -> (qSimsearchBrute _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_ann_batch" -> (qAnnBatch _),
    "q_crossmodal_knn" -> (qCrossmodalKnn _),
    "q_maxsim_rerank" -> (qMaxsimRerank _),
    "q_ann_jl" -> (qAnnJl _),
    "q_ann_persist" -> (qAnnPersist _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_ann_pq" -> (qAnnPq _),
    "q_ann_sq8" -> (qAnnSq8 _),
    "q_ann_ivfpq" -> (qAnnIvfpq _),
    "q_pair_mining" -> (qPairMining _),
    "q_semdedup" -> (qSemdedup _),
    "q_semdedup_sampled" -> (qSemdedupSampled _),
    "q_semdedup_incremental" -> (qSemdedupIncremental _),
    "q_ann_mrr" -> (qAnnMrr _),
    "q_ann_dim_tradeoff" -> (qAnnDimTradeoff _))

  val oracles: Map[String, String] = Map(
    "q_knn_graph" -> qKnnGraphSql,
    "q_hard_negatives" -> qHardNegativesSql,
    "q_graph_semdedup" -> qGraphSemdedupSql,
    "q_margin_mining" -> qMarginMiningSql,
    "q_vector_quantize" -> qVectorQuantizeSql,
    "q_simsearch" -> qSimsearchSql,
    "q_simsearch_brute" -> qSimsearchBruteSql,
    "q_embed_centroids" -> qEmbedCentroidsSql,
    "q_embed_neardup" -> qEmbedNeardupSql,
    "q_embed_clusters" -> qEmbedClustersSql,
    "q_embed_decontam" -> qEmbedDecontamSql,
    "q_embed_neardup_rh" -> qEmbedNeardupRhSql,
    "q_ann_ivf" -> qAnnIvfSql,
    "q_ann_batch" -> qAnnBatchSql,
    "q_crossmodal_knn" -> qCrossmodalKnnSql,
    "q_maxsim_rerank" -> qMaxsimRerankSql,
    "q_ann_jl" -> qAnnJlSql,
    "q_ann_persist" -> qAnnIvfSql,
    "q_ann_recall" -> qAnnRecallSql,
    "q_ann_pq" -> qAnnPqSql,
    "q_ann_sq8" -> qAnnSq8Sql,
    "q_ann_ivfpq" -> qAnnIvfpqSql,
    "q_pair_mining" -> qPairMiningSql,
    "q_semdedup" -> qSemdedupSql,
    "q_semdedup_sampled" -> qSemdedupSampledSql,
    "q_semdedup_incremental" -> qSemdedupIncrementalSql,
    "q_ann_mrr" -> qAnnMrrSql,
    "q_ann_dim_tradeoff" -> qAnnDimTradeoffSql)
}
