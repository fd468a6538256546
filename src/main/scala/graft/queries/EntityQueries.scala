package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.plans.StringDistanceExpressions.damerauLevenshtein

/** Entity resolution (record linkage): match dirty incoming records to a
  * canonical table by STAGED radius escalation — exact match first, then
  * symmetric-delete (deletion-neighborhood) blocking at radius 1, then
  * radius 2, each stage probing only the previous stage's unmatched
  * residue — with edit-distance verification inside each stage.
  *
  * The "dirty" side is derived deterministically from `customer` (so both
  * engines build the identical fixture in-query): per custkey mod 4 the
  * name is kept exact, one digit is substituted with 'X', an adjacent
  * digit pair is transposed, or two digits are substituted ('X' and 'Y')
  * — the four typo classes (distance 0, 1, 1, 2), so every escalation
  * stage is exercised under the oracle.
  *
  * WHY staged: round 9's 100× sweep first exposed the r7 trigram
  * blocking as quadratic (digit-gram df grows ~n·7/1000 while the
  * relative cap grows n/25, so every digit trigram survives and the
  * candidate join emits Σ df² ≈ n²/2250 pairs — 10¹¹ rows at 1.5 M
  * customers, AQE-coalesced into one task). Replacing it with one-shot
  * radius-2 symmetric-delete blocking fixed the blocking-key df but
  * exposed a deeper truth: zero-padded SEQUENTIAL keys are a dense
  * metric space — at 1.5 M rows every record has ~2 000 canonical names
  * within DL ≤ 2 (any 1-2 digit edit lands on another live key), so any
  * algorithm whose contract is "count ALL in-distance candidates" owns
  * an Ω(3×10⁹)-row verified set. No blocking beats the size of the
  * answer; the CONTRACT has to bound the answer. Staged escalation is
  * how production matchers do it: most records match exactly or
  * near-exactly, so the expensive wide radius runs only on the tiny
  * residue, and `n_candidates` reports the ambiguity AT THE WINNING
  * RADIUS (how contested the match was), which is bounded by the local
  * neighborhood size, not the full radius-2 ball. `best_custkey` is
  * unchanged from the flat contract: min (dl, custkey) over the full
  * ball is always attained at the minimal dl, i.e. in the first
  * non-empty stage.
  *
  * Symmetric-delete blocking (per stage, radius τ): each side emits
  * every string obtainable by deleting ≤ τ characters (≤ 1 + L + C(L,2)
  * variants per L-char name — quadratic in NAME LENGTH, constant in
  * corpus size). Completeness: every unit edit (insert / delete /
  * substitute / adjacent transposition) is repaired by deleting at most
  * one character from each string, so dl(a,b) ≤ τ ⇒ a and b share a
  * ≤τ-deletion variant — blocking has NO false negatives, and
  * `n_candidates` genuinely counts every canonical record within the
  * stage radius. A variant pins ≥ (L−τ) exact characters, so its df is
  * bounded by near-duplicate density, not corpus size; mass
  * exact-duplicate names (the one pathology — a job for the dedup pass)
  * are guarded by the absolute `MaxVariantDF` cap, replayed identically
  * in the oracle.
  *
  * Verification scores candidates with the native codegen
  * Damerau–Levenshtein expression (`plans/StringDistanceExpressions
  * .scala`), keeps matches with distance ≤ τ, and folds best match
  * (`min(struct(dl, custkey))` — the (distance, key) lexicographic
  * tie-break) and candidate count into ONE map-side-combinable
  * aggregation.
  *
  * Scale shape: variant generation is a row-local codegen'd array
  * expression exploded AFTER an explicit base-row repartition (the
  * ~20-90× fan-out must not inherit the scan's split count); blocking
  * joins carry only (id, xxhash64(variant)) — fixed-width rows, MERGE
  * hints because Catalyst's Generate stats ignore explode fan-out and
  * would otherwise broadcast a corpus-sized relation (1.27 GB of task
  * results at 100×, killed by maxResultSize; shuffle-hash builds OOMed
  * the same fixture — sort-merge spills instead of dying). Unmatched
  * records surface with NULL match columns (left join) — silent drops
  * are how entity pipelines lose records.
  */
object EntityQueries {

  /** Absolute hot-variant cap. A deletion variant pins ≥ (L−τ) exact
    * characters, so for a distinct-keyed corpus its df is O(1) in corpus
    * size; only mass exact-duplicate names push past this, and those
    * pairs are the exact dedup pass's job. Absolute — unlike the removed
    * relative trigram cap — so the blocked-pair bound Σ df² stays linear
    * in corpus size. */
  val MaxVariantDF = 1000L
  val MaxDistance = 2

  /** All strings obtainable from `name` by deleting at most `tau` (≤ 2)
    * characters, as a row-local deduplicated array: the name itself, L
    * single deletions, and (τ = 2) C(L,2) double deletions.
    * `array_distinct` matters on repeated characters (a run of k equal
    * chars yields one distinct variant, not k) — zero-padded names
    * collapse 172 raw variants to ~60–100 distinct ones. Guards keep
    * `sequence()` ascending-only (sequence(2,1) would run DESCENDING,
    * not empty). */
  private def deletionVariants(name: Column, tau: Int): Column = {
    val L = length(name)
    val del1 = transform(sequence(lit(1), L),
      i => concat(name.substr(lit(1), i - 1), name.substr(i + 1, lit(10000))))
    val del2 = flatten(transform(sequence(lit(1), L - 1),
      i => transform(sequence(i + 1, L),
        j => concat(name.substr(lit(1), i - 1),
          name.substr(i + 1, j - i - 1),
          name.substr(j + 1, lit(10000))))))
    val empty = array().cast("array<string>")
    val parts = Seq(array(name), when(L >= 1, del1).otherwise(empty)) ++
      (if (tau >= 2) Seq(when(L >= 2, del2).otherwise(empty)) else Nil)
    array_distinct(concat(parts: _*))
  }

  /** (key, xxhash64(variant)) pairs — the blocking relation for one side
    * at radius `tau`.
    *
    * Explode fan-out is ~20× (τ=1) to ~90× (τ=2), so partition sizing
    * happens on the BASE rows, before the Generate: the scan's file
    * splits would otherwise carry the fan-out multiple of their bytes
    * into the variant agg/join (measured: 2.6×10⁸ canon variants
    * funneled through the scan's 5 splits at 100×). The explicit
    * numPartitions pins the spread — AQE would coalesce a bare
    * repartition(col) back down to the BASE data's ~64 MB target,
    * recreating the fat-partition problem. The variant STRING never
    * leaves the Generate's projection: joins carry its xxhash64 (the
    * `Dedup.jaccardPairs` inverted-index precedent) — fixed 8 bytes and
    * long-vs-long sort compares. Output-identical to string keys:
    * completeness means every true in-radius pair already shares a real
    * variant, so a hash-collision candidate either fails the DL verify
    * or duplicates a pair string blocking also finds; only the df cap
    * could shift under a 64-bit collision between hot variants
    * (P ≈ 10⁻⁷ corpus-wide at 10⁹ variants). */
  private def variants(df: DataFrame, keyCol: String, nameCol: String,
                       tau: Int): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    df.select(col(keyCol), col(nameCol))
      .repartition(n, col(keyCol))
      .select(col(keyCol),
        explode(deletionVariants(col(nameCol), tau)).as("__v"))
      .select(col(keyCol), xxhash64(col("__v")).as("v"))
  }

  /** One escalation stage: for every probe record, its canonical
    * candidates within DL ≤ `tau` (complete via ≤τ-deletion variant
    * blocking), folded to (src_key, n_candidates, best-(dl,custkey)).
    *
    * r16 (opt guide §3.2): the CANONICAL variant relation is the stage's
    * dominant mass — ~20× (τ=1) to ~90× (τ=2) the full canonical table,
    * while the probe side is only the previous stages' unmatched residue.
    * Above `BloomPruneMinCanonRows` canonical rows a Bloom filter over
    * the probe-side variant hashes prunes canonical variants BEFORE
    * their df-aggregate and the MERGE joins (measured at sf0.1 in
    * DuckDB: stage 2 keeps 4.6% of 1.59 M canonical variant rows,
    * stage 1 keeps 42%). Output-identical by construction: the prune
    * drops whole variant GROUPS (filter and groupBy share the key `v`),
    * so the df of every surviving variant is unchanged, bloom false
    * positives only keep extra groups the pv-join discards anyway, and
    * bloom has no false negatives — same guarantee as q_bloom_prune and
    * the triangle wedge prune (LinkAnalysis). The oracle replays the
    * UNPRUNED formulation and hash-pins the equivalence (replayed with
    * the gate FORCED ON at the verification SFs — see OPTIMIZATION_r16).
    *
    * MEASURED OFF BY DEFAULT (r16) — the LinkAnalysis.triangles
    * bloomBitsPerKey adjudication repeats here: on one box, lz4
    * sequential shuffle of the narrow (key, hash) variant rows beats
    * paying for the filter. sf0.1 A/B (always-on prototype): shuffle
    * 54.8 → 18.9 MB but wall 6.05 → 10.03 s (the per-stage eager bloom
    * build serializes the stage cascade). 100× fixture A/B: unpruned
    * 258.9 s / 5 910 MB shuffle / 5.7 GB spill; pruned 362.3 s /
    * 3 535 MB / zero spill (cached-pv variant; 512 s for an uncached
    * coalesced-build variant — the build passes cost more than the
    * saved shuffle locally, in every configuration tried). On a
    * network-constrained cluster the trade flips exactly as in the
    * triangles knob — the filter ships once per executor while the
    * pruned stream is the dominant shuffle mass — so the machinery
    * stays available via `graft.entityBloomMinCanonRows` (canonical-row
    * threshold; 0 forces the prune everywhere, which is how the oracle
    * gate pins the pruned path's equivalence at both verification SFs).
    * All numbers in OPTIMIZATION_r16.md §3. */
  val BloomPruneMinCanonRows = Long.MaxValue

  private def stageMatch(probe: DataFrame, canon: DataFrame,
                         tau: Int, canonRows: Long): DataFrame = {
    val spark = probe.sparkSession
    val minRows = spark.conf.getOption("graft.entityBloomMinCanonRows")
      .map(_.toLong).getOrElse(BloomPruneMinCanonRows)
    val prune = canonRows >= minRows
    // NOT cached even under the prune: the hashed variants are a cheap
    // row-local explode over the (already cached) residue, and a 64 M-row
    // cache was measured to evict the query's other CacheScope
    // intermediates at 100×
    val pv = variants(probe, "src_key", "dirty_name", tau)
    val cvAll = variants(canon, "c_custkey", "c_name", tau)
    val cv = if (!prune) cvAll else {
      // size the filter from the ACTUAL probe-variant count (one explode
      // pass — trivial next to the stage it prunes, and only paid when
      // the gate is on; it sets numHashFunctions, worth ~5× in fpp over
      // the static canonRows×fanout bound). ~10 bits/key ≈ 1% fpp,
      // capped at 2^29 bits (64 MB shipped to probe tasks;
      // `graft.entityBloomMaxBits` overrides) — sizing from the static
      // bound was measured fatal at 100× (a 2^31-bit / 256 MB literal
      // OOMed driver-side task serialization); past the cap the fpp
      // degrades gracefully toward keep-everything, and bloom false
      // positives are never wrong, just unpruned.
      val items = math.max(1L, pv.count())
      val maxBits = spark.conf.getOption("graft.entityBloomMaxBits")
        .map(_.toLong).getOrElse(1L << 29)
      val bits = math.max(64L * 1024, math.min(10L * items, maxBits))
      val maxBitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
      val maxItemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
      val prevBits = spark.conf.get(maxBitsKey)
      val prevItems = spark.conf.get(maxItemsKey)
      // raise the analyzer caps only for the eager build, then RESTORE
      // (same discipline as LinkAnalysis.triangles — .head() materializes
      // the bloom, nothing later consults the raised values)
      val bf = try {
        if (prevBits.toLong < bits) spark.conf.set(maxBitsKey, bits.toString)
        if (prevItems.toLong < items) spark.conf.set(maxItemsKey, items.toString)
        // coalesce: a partial aggregation buffer is the WHOLE bits/8-byte
        // filter per map task — 8 build tasks bound the partial shuffle
        // at 8 × the filter size while still parallelizing the inserts
        pv.coalesce(8).agg(graft.plans.BloomExpressions
          .bloomFilterAgg(col("v"), items, bits).as("bf"))
          .head().getAs[Array[Byte]]("bf")
      } finally {
        spark.conf.set(maxBitsKey, prevBits)
        spark.conf.set(maxItemsKey, prevItems)
      }
      // an empty residue aggregates to a NULL bloom; the stage's answer
      // is empty either way, so skip the filter rather than probe null
      if (bf == null) cvAll
      else cvAll.filter(graft.plans.BloomExpressions.mightContain(lit(bf), col("v")))
    }
    // per-row array_distinct makes count(*) per variant = distinct custkeys
    val cold = cv.groupBy("v").agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxVariantDF)
      .select("v")
    val cand = pv.hint("merge")
      .join(cv.hint("merge").join(cold.hint("merge"), "v"), "v")
      .select("src_key", "c_custkey").distinct()
    cand.join(probe, "src_key")
      .join(canon, "c_custkey")
      .withColumn("dl", damerauLevenshtein(col("dirty_name"), col("c_name")))
      .filter(col("dl") <= tau)
      .groupBy("src_key")
      .agg(count(lit(1)).as("n_candidates"),
        min(struct(col("dl"), col("c_custkey"))).as("b"))
  }

  /** Deterministic typo fixture, custkey mod 4: exact / one digit → 'X' /
    * adjacent digit transposition / two digits → 'X','Y'. Positions
    * 10..17 inside the 18-char name, driven by custkey so both engines
    * derive byte-identical dirty names. */
  private def dirtyNames(customer: DataFrame): DataFrame = {
    val name = col("c_name")
    val p = (col("c_custkey") % 8 + 10).cast("int")
    // second substitution position: derived from custkey/8, bumped one
    // slot (mod 8) when it collides with p so the two edits are distinct
    val q0 = (expr("c_custkey div 8") % 8 + 10).cast("int")
    val q = when(q0 === p, ((q0 - lit(10) + 1) % 8 + 10).cast("int"))
      .otherwise(q0)
    def subst(s: Column, pos: Column, c: String): Column =
      concat(s.substr(lit(1), pos - 1), lit(c), s.substr(pos + 1, lit(100)))
    val transp = concat(name.substr(lit(1), p - 1),
      name.substr(p + 1, lit(1)), name.substr(p, lit(1)),
      name.substr(p + 2, lit(100)))
    customer.select(col("c_custkey").as("src_key"),
      when(col("c_custkey") % 4 === 0, name)
        .when(col("c_custkey") % 4 === 1, subst(name, p, "X"))
        .when(col("c_custkey") % 4 === 2, transp)
        .otherwise(subst(subst(name, p, "X"), q, "Y")).as("dirty_name"))
  }

  def qEntityMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer")
    // canonical row count from the parquet footer (driver-side metadata,
    // memoized — not an eager count() action): sizes the per-stage bloom
    // prune and gates it on data volume
    val canonRows = graft.Tables.parquetRowCount(spark, sfDir, "customer")
    val canon = customer.select("c_custkey", "c_name")
    // the dirty side feeds five consumers (stage-0 join, two residue
    // anti-joins, stage probes, final output join) — cache it
    val dirty = graft.CacheScope.cached(dirtyNames(customer))

    // stage 0: exact name equality — no variants, no DL
    val m0 = graft.CacheScope.cached(
      dirty.join(canon, col("dirty_name") === col("c_name"))
        .groupBy("src_key")
        .agg(count(lit(1)).as("n_candidates"),
          min(struct(lit(0).as("dl"), col("c_custkey"))).as("b")))
    val r1 = graft.CacheScope.cached(
      dirty.join(m0.select("src_key"), Seq("src_key"), "left_anti"))

    // stage 1: radius-1 deletion variants over the stage-0 residue
    val m1 = graft.CacheScope.cached(stageMatch(r1, canon, 1, canonRows))
    val r2 = r1.join(m1.select("src_key"), Seq("src_key"), "left_anti")

    // stage 2: full radius over what's still unmatched (the rare tail)
    val m2 = stageMatch(r2, canon, MaxDistance, canonRows)

    val m = m0.unionByName(m1).unionByName(m2)
    dirty.join(m, Seq("src_key"), "left")
      .select(col("src_key"), col("dirty_name"),
        col("b.c_custkey").as("best_custkey"),
        col("b.dl").cast("long").as("best_dl"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        (col("b.c_custkey") === col("src_key")).as("self_match"))
      .orderBy("src_key")
  }

  /** The oracle replays the identical staged pipeline: same dirty
    * fixture, same exact-first stage, same ≤τ-deletion variant sets per
    * stage (DISTINCT collapses repeated-character dupes exactly like
    * `array_distinct`; exact strings here — xxhash keying on the Spark
    * side is output-equivalent by blocking completeness), same absolute
    * df cap, same DL ≤ τ verify and (dl, custkey) tie-break. */
  val qEntityMatchSql: String = {
    def del1(src: String, keyCol: String, nameCol: String): String =
      s"""  SELECT DISTINCT $keyCol, $nameCol AS v FROM $src
         |  UNION
         |  SELECT DISTINCT $keyCol,
         |         substr($nameCol, 1, CAST(i - 1 AS INT)) ||
         |         substr($nameCol, CAST(i + 1 AS INT), 10000) AS v
         |  FROM $src, unnest(range(1, len($nameCol) + 1)) AS t(i)""".stripMargin
    def del2(src: String, keyCol: String, nameCol: String): String =
      s"""${del1(src, keyCol, nameCol)}
         |  UNION
         |  SELECT DISTINCT $keyCol,
         |         substr($nameCol, 1, CAST(i - 1 AS INT)) ||
         |         substr($nameCol, CAST(i + 1 AS INT), CAST(j - i - 1 AS INT)) ||
         |         substr($nameCol, CAST(j + 1 AS INT), 10000) AS v
         |  FROM $src,
         |       unnest(range(1, len($nameCol) + 1)) AS t(i),
         |       unnest(range(1, len($nameCol) + 1)) AS u(j)
         |  WHERE j > i""".stripMargin
    def stage(k: Int, probe: String, vars: String => String): String =
      s"""pv$k AS (
         |${vars(probe)}),
         |cv$k AS (
         |${vars("customer").replace("src_key", "c_custkey")
             .replace("dirty_name", "c_name")}),
         |cold$k AS (
         |  SELECT v FROM cv$k GROUP BY v HAVING count(*) <= $MaxVariantDF),
         |cand$k AS (
         |  SELECT DISTINCT pv.src_key, cv.c_custkey
         |  FROM pv$k pv
         |  JOIN cold$k cd ON cd.v = pv.v
         |  JOIN cv$k cv ON cv.v = pv.v),
         |ver$k AS (
         |  SELECT ca.src_key, ca.c_custkey,
         |         damerau_levenshtein(d.dirty_name, c.c_name) AS dl
         |  FROM cand$k ca
         |  JOIN $probe d ON d.src_key = ca.src_key
         |  JOIN customer c ON c.c_custkey = ca.c_custkey
         |  WHERE damerau_levenshtein(d.dirty_name, c.c_name) <= $k),
         |m$k AS (
         |  SELECT v.src_key, b.best_custkey, b.best_dl, v.n_candidates
         |  FROM (SELECT src_key, count(*) AS n_candidates
         |        FROM ver$k GROUP BY src_key) v
         |  JOIN (SELECT src_key, c_custkey AS best_custkey,
         |               CAST(dl AS BIGINT) AS best_dl
         |        FROM (SELECT *, row_number() OVER
         |                (PARTITION BY src_key ORDER BY dl, c_custkey) AS rn
         |              FROM ver$k)
         |        WHERE rn = 1) b ON b.src_key = v.src_key)""".stripMargin
    s"""WITH dirty AS (
       |  SELECT c_custkey AS src_key,
       |         CASE
       |           WHEN c_custkey % 4 = 0 THEN c_name
       |           WHEN c_custkey % 4 = 1 THEN
       |             substr(c_name, 1, p - 1) || 'X' || substr(c_name, p + 1, 100)
       |           WHEN c_custkey % 4 = 2 THEN
       |             substr(c_name, 1, p - 1) || substr(c_name, p + 1, 1) ||
       |             substr(c_name, p, 1) || substr(c_name, p + 2, 100)
       |           ELSE
       |             substr(substr(c_name, 1, p - 1) || 'X' ||
       |                    substr(c_name, p + 1, 100), 1, q - 1) || 'Y' ||
       |             substr(substr(c_name, 1, p - 1) || 'X' ||
       |                    substr(c_name, p + 1, 100), q + 1, 100)
       |         END AS dirty_name
       |  FROM (SELECT c_custkey, c_name,
       |               CAST(c_custkey % 8 + 10 AS INT) AS p,
       |               CASE WHEN CAST((c_custkey // 8) % 8 + 10 AS INT) =
       |                         CAST(c_custkey % 8 + 10 AS INT)
       |                    THEN CAST(((c_custkey // 8) % 8 + 10 - 10 + 1) % 8 + 10 AS INT)
       |                    ELSE CAST((c_custkey // 8) % 8 + 10 AS INT)
       |               END AS q
       |        FROM customer)),
       |m0 AS (
       |  SELECT d.src_key, min(c.c_custkey) AS best_custkey,
       |         CAST(0 AS BIGINT) AS best_dl, count(*) AS n_candidates
       |  FROM dirty d JOIN customer c ON c.c_name = d.dirty_name
       |  GROUP BY d.src_key),
       |r1 AS (
       |  SELECT * FROM dirty
       |  WHERE src_key NOT IN (SELECT src_key FROM m0)),
       |${stage(1, "r1", s => del1(s, "src_key", "dirty_name"))},
       |r2 AS (
       |  SELECT * FROM r1
       |  WHERE src_key NOT IN (SELECT src_key FROM m1)),
       |${stage(2, "r2", s => del2(s, "src_key", "dirty_name"))},
       |res AS (
       |  SELECT src_key, best_custkey, best_dl, n_candidates FROM m0
       |  UNION ALL SELECT src_key, best_custkey, best_dl, n_candidates FROM m1
       |  UNION ALL SELECT src_key, best_custkey, best_dl, n_candidates FROM m2)
       |SELECT d.src_key, d.dirty_name, r.best_custkey, r.best_dl,
       |       coalesce(r.n_candidates, 0) AS n_candidates,
       |       r.best_custkey = d.src_key AS self_match
       |FROM dirty d
       |LEFT JOIN res r ON r.src_key = d.src_key
       |ORDER BY d.src_key""".stripMargin
  }

  /** Exact triangle census of the co-purchase graph (parts linked when
    * they share an order) via [[graft.operators.LinkAnalysis.triangles]]
    * — the third graph-analytics primitive next to PageRank and
    * connected components, and the classic one that DIES at scale
    * without degree-ordered orientation (naive wedge enumeration is
    * Σ deg² — quadratic in hub degree; orientation bounds the wedge
    * stage at O(m^1.5) for any degree distribution; see the operator
    * scaladoc for the √m argument).
    *
    * Scale shape of the graph build: per-order pair generation is k² in
    * basket size — bounded by the data model (max 17 at sf0.1), and
    * belt-and-braces capped at the 256 lowest partkeys per order
    * (deterministic, never binding on fixtures, so the oracle is
    * unaffected; the cap is the same honest-degenerate-input guard as
    * the band-bucket caps in the dedup family). Output: top-10 parts by
    * triangle participation plus the global census — orientation-free
    * quantities the oracle reproduces from the definitional triple
    * join. */
  def qTriangleCount(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val items = t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val capped = items
      .withColumn("__rn", row_number().over(
        Window.partitionBy("l_orderkey").orderBy("l_partkey")))
      .filter(col("__rn") <= 256).drop("__rn")
    val edges = capped.as("x").join(capped.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
    // ONE pass over the triangle stream: explode to per-node counts
    // (map-side combinable, |nodes|-bounded), and derive the global
    // census as Σ per-node / 3 (each triangle hits exactly 3 nodes —
    // exact integer identity) instead of a second count over the big
    // stream. Only the SMALL per-node table is cached; the O(m^1.5)
    // wedge/triangle stream is never materialized, cached, or sorted.
    val perNode = graft.CacheScope.cached(
      graft.operators.LinkAnalysis.triangles(edges)
        .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("tri_cnt")))
    val total = perNode.agg(
      call_function("div", coalesce(sum(col("tri_cnt")), lit(0L)), lit(3L))
        .as("total_triangles"))
    perNode.crossJoin(broadcast(total))
      .orderBy(col("tri_cnt").desc, col("node"))
      .limit(10)
  }

  val qTriangleCountSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |capped AS (
      |  SELECT l_orderkey, l_partkey FROM (
      |    SELECT l_orderkey, l_partkey,
      |           row_number() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
      |    FROM items) WHERE rn <= 256),
      |edges AS (
      |  SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      |  FROM capped x JOIN capped y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
      |tri AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM edges e1
      |  JOIN edges e2 ON e2.a = e1.b
      |  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
      |pernode AS (
      |  SELECT node, count(*) AS tri_cnt FROM (
      |    SELECT x AS node FROM tri
      |    UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri) GROUP BY node)
      |SELECT node, tri_cnt, (SELECT count(*) FROM tri) AS total_triangles
      |FROM pernode
      |ORDER BY tri_cnt DESC, node
      |LIMIT 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_entity_match" -> (qEntityMatch _),
    "q_triangle_count" -> (qTriangleCount _))

  val oracles: Map[String, String] = Map(
    "q_entity_match" -> qEntityMatchSql,
    "q_triangle_count" -> qTriangleCountSql)
}
