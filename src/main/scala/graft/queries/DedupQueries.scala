package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_join, col, slice}
import graft.Tables._

/** Near-duplicate detection over `documents` ([ext] dedup rows of SURVEY
  * §2.2): word-shingle Jaccard with a shingle-inverted-index join, and a
  * full MinHash+LSH pipeline (shingle → minhash signature → band → bucket
  * join) in pure relational ops.
  *
  * Scale shape: both queries are the canonical 100 TB near-dup plans —
  * candidate generation is an equi-join on a hash key (shingle or LSH band
  * bucket), never an O(n²) cross join; exact similarity is computed only on
  * candidates. MinHash hashes are md5 strings and the "min" is a string
  * min — deterministic, engine-portable, and uniform. The signature uses 16
  * hash functions in 4 bands of 4 rows.
  */
object DedupQueries {

  /** DuckDB mirror of [[graft.operators.Dedup.shingleSets]] over any
    * source relation exposing (doc_id, text). */
  private[queries] def shinglesSqlCte(src: String): String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM $src),
       |sh AS (
       |  SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
       |  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 2)) AS t(i))""".stripMargin

  private val ShinglesSqlCte: String = shinglesSqlCte("documents")

  /** Exact n-gram Jaccard near-dup pairs via the shingle inverted index —
    * thin wrapper over [[graft.operators.Dedup.jaccardPairs]] (xxhash64
    * long join keys, cached hashed set; see the operator's scale notes). */
  def qJaccardPairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup
      .jaccardPairs(t(spark, sfDir, "documents"), "doc_id", "text", n = 3, minJaccard = 0.2)
      .orderBy("d1", "d2")

  val qJaccardPairsSql: String =
    s"""WITH $ShinglesSqlCte,
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2, inter,
       |       CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
       |FROM inter
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.2
       |ORDER BY d1, d2""".stripMargin

  /** Containment near-dup detection (round 15) — Broder 1997's
    * asymmetric measure on a corpus with PLANTED EXCERPTS: for every
    * doc_id % 13 == 4 the fixture adds a 20-token excerpt (tokens 5–24,
    * id = parent + 1 000 000) whose shingle set is a strict subset of
    * its parent's, so containment(excerpt → parent) is EXACTLY 2^20
    * while the symmetric jaccard_q sits at inter/|parent| — the
    * quote-inside-a-page pattern symmetric near-dedup misses by
    * construction. Thin wrapper over
    * [[graft.operators.Dedup.containmentPairs]] (threshold 0.9 Q20);
    * the oracle replays shingling, the undirected intersection, and
    * both directed integer scores over the same excerpt-augmented
    * corpus CTE. */
  def qContainment(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents").select("doc_id", "text")
    val excerpts = docs.filter(col("doc_id") % 13 === 4)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(graft.functions.TextFunctions.tokens(col("text")),
          5, 20), " ").as("text"))
    graft.operators.Dedup
      .containmentPairs(docs.unionAll(excerpts), "doc_id", "text",
        n = 3, minContainmentQ = 943718L)
      .orderBy("src", "dst")
  }

  val qContainmentSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000,
       |         array_to_string(list_filter(string_split(text, ' '), t -> t <> '')[5:24], ' ')
       |  FROM documents WHERE doc_id % 13 = 4),
       |${shinglesSqlCte("corpus")},
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |joined AS (
       |  SELECT d1, d2, inter, s1.sz AS sz1, s2.sz AS sz2
       |  FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2),
       |directed AS (
       |  SELECT d1 AS src, d2 AS dst,
       |         (inter * 1048576) // sz1 AS containment_q,
       |         (inter * 1048576) // (sz1 + sz2 - inter) AS jaccard_q,
       |         inter
       |  FROM joined
       |  UNION ALL
       |  SELECT d2 AS src, d1 AS dst,
       |         (inter * 1048576) // sz2 AS containment_q,
       |         (inter * 1048576) // (sz1 + sz2 - inter) AS jaccard_q,
       |         inter
       |  FROM joined)
       |SELECT src, dst, containment_q, jaccard_q, CAST(inter AS BIGINT) AS inter
       |FROM directed
       |WHERE containment_q >= 943718
       |ORDER BY src, dst""".stripMargin

  /** MinHash(16) + LSH(4 bands × 4 rows) candidate pairs.
    *
    * Hash family: the j-th hash of a shingle is the j-th 4-hex-digit window
    * of md5("a:"+sh) (j<8) or md5("b:"+sh) (j≥8) — 16 independent 16-bit
    * hashes from TWO md5 evaluations per shingle, compared as fixed-width
    * hex strings (string min ≡ numeric min). md5 is the hash both engines
    * share bit-exactly, which makes the whole LSH pipeline oracle-checkable.
    *
    * Shape: NO per-hash explode — one groupBy(doc_id) computes all 16
    * signature mins as parallel aggregates (map-side combine collapses each
    * partition to one row per doc before the shuffle); bands then unpivot
    * 4 rows/doc for the bucket self-join. This is the canonical
    * shingle→minhash→band→bucket-join dedup at any scale. */
  def qMinhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup
      .minhashLshPairs(t(spark, sfDir, "documents"), "doc_id", "text",
        n = 3, bands = 4, rowsPerBand = 4)
      .orderBy("d1", "d2")

  /** SimHash near-dup pairs — 60-bit md5-family SimHash ([[graft.operators.Dedup.simhash60]]),
    * 4×15-bit block LSH, exact Hamming ≤ 3 (r6: oracle-checked; the token
    * hash is the first 15 hex digits of md5(token) read as an integer, an
    * idiom both engines evaluate bit-identically, so the whole vote/pack/
    * bucket/verify pipeline is reproducible in DuckDB SQL).
    *
    * Scale shape: simhash is one codegen'd row-local HOF pass; candidates
    * come from a 4-block bucket equi-join (pigeonhole-complete for
    * Hamming ≤ 3), never all-pairs. */
  def qSimhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup
      .simhashPairs(t(spark, sfDir, "documents"), "doc_id", "text", maxHamming = 3)
      .orderBy("d1", "d2")

  /** DuckDB mirror of the portable SimHash pipeline: per-token 60-bit
    * md5-derived hash → ±1 votes per bit (token multiplicity kept, exactly
    * like the Spark HOF over the raw token array) → sign pack → 4×15-bit
    * block buckets → exact Hamming via bit_count(xor). */
  val qSimhashPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
       |  FROM documents),
       |hx AS (
       |  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h FROM toks),
       |votes AS (
       |  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM hx CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) bs
       |  GROUP BY doc_id, b),
       |sh AS (
       |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS s
       |  FROM votes GROUP BY doc_id),
       |blocks AS (
       |  SELECT doc_id, s, blk, (s >> (15 * blk)) & 32767 AS key
       |  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS blk) bl),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |         CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
       |  FROM blocks a
       |  JOIN blocks b ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id)
       |SELECT d1, d2, hamming FROM pairs WHERE hamming <= 3
       |ORDER BY d1, d2""".stripMargin

  /** Incremental corpus admission ([[graft.operators.Dedup.incrementalStatus]]):
    * the corpus/batch split is a deterministic 75/25 md5 gate on doc_id, and
    * every batch doc is labeled exact_dup / near_dup / admitted — exact
    * dupes by content-hash anti-join against corpus ∪ earlier batch
    * winners, near dupes by probe-side-only LSH candidates (corpus never
    * pairs against itself) verified with exact shingle Jaccard ≥ 0.5.
    * Output: per-lang admission funnel counts + admitted char mass. */
  def qIncrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = t(spark, sfDir, "documents").select("doc_id", "lang", "text")
    val gate = graft.operators.Sampling.gateBelow(col("doc_id").cast("string"), "4")
    val batch = docs.filter(gate)
    val corpus = docs.filter(!gate)
    graft.operators.Dedup
      .incrementalStatus(corpus, batch, "doc_id", "text", n = 3, minJaccard = 0.5)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_batch"),
        count_if(col("status") === "exact_dup").as("n_exact_dup"),
        count_if(col("status") === "near_dup").as("n_near_dup"),
        count_if(col("status") === "admitted").as("n_admitted"),
        coalesce(sum(when(col("status") === "admitted",
          length(col("text")).cast("long"))), lit(0L)).as("admitted_chars"))
      .orderBy("lang")
  }

  lazy val qIncrementalDedupSql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, lang, text FROM documents
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '4'),
       |batch AS (
       |  SELECT doc_id, lang, text FROM documents
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'),
       |bwin AS (SELECT min(doc_id) AS doc_id FROM batch GROUP BY md5(text)),
       |bx AS (
       |  SELECT b.* FROM batch b
       |  JOIN bwin w ON w.doc_id = b.doc_id
       |  WHERE md5(b.text) NOT IN (SELECT md5(text) FROM corpus)),
       |uni AS (SELECT doc_id, text FROM corpus UNION ALL SELECT doc_id, text FROM bx),
       |${minhashSqlCtes("uni")},
       |cpairs AS (
       |  SELECT a.doc_id AS other, b.doc_id AS probe
       |  FROM bands a
       |  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
       |              AND a.doc_id <> b.doc_id
       |  WHERE b.doc_id IN (SELECT doc_id FROM bx)
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |cinter AS (
       |  SELECT p.other, p.probe, count(*) AS inter
       |  FROM cpairs p
       |  JOIN sh a ON a.doc_id = p.other
       |  JOIN sh b ON b.doc_id = p.probe AND b.sh = a.sh
       |  GROUP BY 1, 2),
       |vx AS (
       |  SELECT c.other, c.probe FROM cinter c
       |  JOIN sizes s1 ON s1.doc_id = c.other
       |  JOIN sizes s2 ON s2.doc_id = c.probe
       |  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.5),
       |rejects AS (
       |  SELECT DISTINCT probe FROM vx
       |  WHERE other NOT IN (SELECT doc_id FROM bx) OR other < probe),
       |adm AS (
       |  SELECT lang, count(*) AS n_adm, CAST(sum(length(text)) AS BIGINT) AS chars
       |  FROM bx WHERE doc_id NOT IN (SELECT probe FROM rejects)
       |  GROUP BY lang),
       |xs AS (SELECT lang, count(*) AS n_x FROM bx GROUP BY lang),
       |tb AS (SELECT lang, count(*) AS n_batch FROM batch GROUP BY lang)
       |SELECT tb.lang, tb.n_batch,
       |       CAST(tb.n_batch - COALESCE(xs.n_x, 0) AS BIGINT) AS n_exact_dup,
       |       CAST(COALESCE(xs.n_x, 0) - COALESCE(adm.n_adm, 0) AS BIGINT) AS n_near_dup,
       |       CAST(COALESCE(adm.n_adm, 0) AS BIGINT) AS n_admitted,
       |       CAST(COALESCE(adm.chars, 0) AS BIGINT) AS admitted_chars
       |FROM tb
       |LEFT JOIN xs ON xs.lang = tb.lang
       |LEFT JOIN adm ON adm.lang = tb.lang
       |ORDER BY tb.lang""".stripMargin

  /** All CTEs from token shingles to LSH candidate `pairs`, over any
    * (doc_id, text) source — the reusable half of the minhash oracle. */
  private[queries] def minhashSqlCtes(src: String): String = {
    val minExprs = (0 until 16).map { j =>
      val h = if (j < 8) "m1" else "m2"
      s"min(substr($h, ${(j % 8) * 4 + 1}, 4)) AS h$j"
    }.mkString(",\n  ")
    val bandSelects = (0 until 4).map { b =>
      val key = (0 until 4).map(r => s"h${b * 4 + r}").mkString(" || ")
      s"SELECT doc_id, CAST($b AS BIGINT) AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""${shinglesSqlCte(src)},
       |hx AS (
       |  SELECT doc_id, md5('a:' || sh) AS m1, md5('b:' || sh) AS m2 FROM sh),
       |sig AS (
       |  SELECT doc_id,
       |  $minExprs
       |  FROM hx GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_bands
       |  FROM bands a
       |  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
       |              AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** Jaccard verification of the LSH `pairs` → `vpairs` (verified near-dup
    * pairs, d1 < d2); reads the `sh` and `pairs` CTEs. */
  private[queries] def vpairsSqlCtes(minJaccard: Double): String =
    s"""sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |cinter AS (
       |  SELECT p.d1, p.d2, count(*) AS inter
       |  FROM pairs p
       |  JOIN sh a ON a.doc_id = p.d1
       |  JOIN sh b ON b.doc_id = p.d2 AND b.sh = a.sh
       |  GROUP BY p.d1, p.d2),
       |vpairs AS (
       |  SELECT d1, d2 FROM cinter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= $minJaccard)""".stripMargin

  /** `vpairs` + the higher-id members of verified pairs as `losers`. */
  private[queries] def losersSqlCtes(minJaccard: Double): String =
    s"""${vpairsSqlCtes(minJaccard)},
       |losers AS (SELECT DISTINCT d2 FROM vpairs)""".stripMargin

  val qMinhashLshSql: String =
    s"""WITH ${minhashSqlCtes("documents")}
       |SELECT d1, d2, n_bands FROM pairs ORDER BY d1, d2""".stripMargin

  /** MinHash estimator calibration: for every LSH candidate pair, the
    * integer count of matching signature components (estimate ≈ n_match/16)
    * beside the exact quantized Jaccard — the measurement a dedup pipeline
    * runs to pick bands×rows before committing a corpus pass. All outputs
    * integer/quantized, so the whole calibration table is oracle-exact.
    *
    * Scale shape: signatures and candidates reuse ONE cached shingle set;
    * the exact-intersection count is CANDIDATE-RESTRICTED — the cached LSH
    * pair set joins through the shingle inverted index on (doc, shingle),
    * the same shape as `Dedup.verifiedNearDupPairs` and this query's own
    * oracle `cinter` CTE — never an all-co-shingle self-join. */
  def qMinhashEst(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val Dedup = graft.operators.Dedup
    val sh = graft.CacheScope.cached(Dedup.shingleSets(
      t(spark, sfDir, "documents"), "doc_id", "text", n = 3))
    // ONE cached signature table feeds both the banding join and the
    // per-position match count — the 16-way min aggregation runs once
    val sig = graft.CacheScope.cached(Dedup.minhashSignatures(sh))
    // cached: the candidate pair set feeds both the intersection count
    // and the final calibration join
    val cand = graft.CacheScope.cached(Dedup.minhashFromSignatures(sig))
    val sa = sig.toDF(sig.columns.map(c => if (c == "id") "d1" else s"a_$c").toIndexedSeq: _*)
    val sb = sig.toDF(sig.columns.map(c => if (c == "id") "d2" else s"b_$c").toIndexedSeq: _*)
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val hashed = sh.select(col("id"), xxhash64(col("sh")).as("h"))
    val inter = cand.select(col("d1"), col("d2"))
      .join(hashed.select(col("id").as("d1"), col("h")), "d1")
      .join(hashed.select(col("id").as("d2"), col("h")), Seq("d2", "h"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("inter"))
    val nMatch = (0 until 16)
      .map(j => when(col(s"a_h$j") === col(s"b_h$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "d1").join(sb, "d2")
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
      .join(inter, Seq("d1", "d2"), "left")
      .withColumn("i", coalesce(col("inter"), lit(0L)))
      .select(col("d1"), col("d2"), col("n_bands"), nMatch.as("n_match"),
        floor(col("i").cast("double") /
          (col("sz1") + col("sz2") - col("i")) * 1048576d).cast("long").as("jacc_q"))
      .orderBy("d1", "d2")
  }

  val qMinhashEstSql: String = {
    val matchSum = (0 until 16)
      .map(j => s"CASE WHEN sa.h$j = sb.h$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${minhashSqlCtes("documents")},
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |cinter AS (
       |  SELECT p.d1, p.d2, count(*) AS inter
       |  FROM pairs p
       |  JOIN sh a ON a.doc_id = p.d1
       |  JOIN sh b ON b.doc_id = p.d2 AND b.sh = a.sh
       |  GROUP BY p.d1, p.d2)
       |SELECT p.d1, p.d2, p.n_bands,
       |       $matchSum AS n_match,
       |       CAST(floor(CAST(COALESCE(ci.inter, 0) AS DOUBLE)
       |            / (s1.sz + s2.sz - COALESCE(ci.inter, 0)) * 1048576) AS BIGINT) AS jacc_q
       |FROM pairs p
       |JOIN sig sa ON sa.doc_id = p.d1
       |JOIN sig sb ON sb.doc_id = p.d2
       |JOIN sizes s1 ON s1.doc_id = p.d1
       |JOIN sizes s2 ON s2.doc_id = p.d2
       |LEFT JOIN cinter ci ON ci.d1 = p.d1 AND ci.d2 = p.d2
       |ORDER BY p.d1, p.d2""".stripMargin
  }

  /** The full dedup cascade under the oracle gate: exact-dup collapse (r6,
    * inside [[graft.operators.Dedup.dedupeNear]] — output-identical, see
    * its scaladoc) → MinHash-LSH candidates → exact-Jaccard verification
    * ≥ 0.5 → higher-id members dropped → survivors counted per language.
    * The oracle below stays the UNCOLLAPSED losers CTE, hash-proving the
    * collapse equivalence. */
  def qDedupCascade(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Dedup
      .dedupeNear(t(spark, sfDir, "documents"), "doc_id", "text", n = 3, minJaccard = 0.5)
      .groupBy("lang")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_kept"))
      .orderBy("lang")

  val qDedupCascadeSql: String =
    s"""WITH ${minhashSqlCtes("documents")},
       |${losersSqlCtes(0.5)}
       |SELECT lang, count(*) AS n_kept
       |FROM documents
       |WHERE doc_id NOT IN (SELECT d2 FROM losers)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Near-dup CLUSTERS: verified pairs → connected components
    * (large-star/small-star, [[graft.operators.Dedup.connectedComponents]]) →
    * one row per component with its canonical (min) doc id, size, and the
    * full sorted member list. The cluster view is what a real corpus dedup
    * keeps ("one survivor per component"), and transitive chains a–b–c make
    * it genuinely different from the pairwise drop. Oracle: DuckDB
    * `WITH RECURSIVE` transitive closure over the same verified pairs. */
  def qDedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // exact-collapse composition ([[graft.operators.Dedup.collapsedClusterLabels]]):
    // cluster one representative per md5(text), re-expand membership — linear
    // in duplicate count where clustering the raw corpus is quadratic per
    // clique. Labels are provably identical (see the operator's scaladoc);
    // the UNCOLLAPSED recursive-CTE oracle below hash-checks that claim.
    // Expanded singleton clusters (size 1 ⟺ the doc had no exact or near
    // dup ⟺ it was absent from the raw pair graph) are filtered to match.
    graft.operators.Dedup
      .collapsedClusterLabels(t(spark, sfDir, "documents"), "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .groupBy(col("cluster").as("cluster_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        concat_ws(",",
          transform(sort_array(collect_list(col("id"))), _.cast("string"))).as("members"))
      .filter(col("n_docs") >= 2)
      .orderBy("cluster_id")
  }

  val qDedupClustersSql: String =
    s"""WITH RECURSIVE ${minhashSqlCtes("documents")},
       |${vpairsSqlCtes(0.5)},
       |edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM vpairs
       |  UNION SELECT d2, d1 FROM vpairs),
       |walk AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.dst),
       |labels AS (
       |  SELECT src AS id, least(src, min(dst)) AS cluster
       |  FROM walk GROUP BY src)
       |SELECT cluster AS cluster_id, count(*) AS n_docs,
       |       string_agg(id, ',' ORDER BY id) AS members
       |FROM labels GROUP BY cluster ORDER BY cluster_id""".stripMargin

  /** Canonical-representative selection per near-dup cluster (the CCNet /
    * RefinedWeb policy: when a duplicate cluster collapses, keep its
    * HIGHEST-QUALITY member, not its lowest id): cluster labels from
    * [[graft.operators.Dedup.collapsedClusterLabels]], each member scored
    * with the [[TextQueries.qualityCol]] mix (length saturation + alpha
    * ratio + stopword ratio — the exact tree q_quality_score hash-proves
    * against DuckDB), quantized to 2^20 so the ranking key is an exact
    * integer, winner = max quality with min-id tie-break. One row per
    * ≥2-member cluster: (cluster_id, n_docs, kept_id, kept_q20).
    *
    * Scale shape: scoring is one row-local `text_stats` kernel pass; the
    * winner is a map-side-combinable `min(struct(-q20, id))` aggregate on
    * the cluster key — never a window sort over the corpus. Cluster labels
    * come from the exact-collapsed component machinery (linear in
    * duplicate count, see [[qDedupClusters]]); singleton clusters drop
    * AFTER the agg, so untouched docs cost one combiner row each. */
  def qDedupKeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = t(spark, sfDir, "documents")
    val labels = graft.operators.Dedup
      .collapsedClusterLabels(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .withColumnRenamed("id", "doc_id")
    val scored = docs
      .select(col("doc_id"), graft.plans.TextStatsExpressions
        .textStats(col("text"),
          graft.functions.TextFunctions.StopwordLists.map(_._2)).as("st"))
      .select(col("doc_id"),
        floor(TextQueries.qualityCol(col("st")) * 1048576).cast("long").as("q20"))
    // labels is one row per doc — join strategy left to AQE (q_retention note)
    scored.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .groupBy(col("cluster").as("cluster_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(struct((-col("q20")).as("nq"), col("doc_id").as("id"))).as("w"))
      .filter(col("n_docs") >= 2)
      .select(col("cluster_id"), col("n_docs"),
        col("w.id").as("kept_id"), (-col("w.nq")).as("kept_q20"))
      .orderBy("cluster_id")
  }

  val qDedupKeepBestSql: String =
    s"""WITH RECURSIVE ${minhashSqlCtes("documents")},
       |${vpairsSqlCtes(0.5)},
       |xpairs AS (
       |  -- exact-duplicate edges by content hash: identical texts with
       |  -- ZERO shingles (< n tokens, or all shingles DF-capped) never
       |  -- reach vpairs, but the Spark side's md5 exact-collapse still
       |  -- clusters them — the same robustness CTE qCrossSourceDedupSql
       |  -- carries (no-op on the current fixtures, which plant no exact
       |  -- dups, so hashes are unchanged). FIXTURE CONSTRAINT: unlike
       |  -- qCrossSourceDedupSql, the minhash CTEs here run over ALL
       |  -- documents while the Spark side computes the maxShingleDF cap
       |  -- over exact-collapse representatives only — if a future fixture
       |  -- plants exact dups, shingle DF counts diverge near the cap and
       |  -- this oracle must be rebuilt over a reps CTE first.
       |  SELECT a.doc_id AS d1, b.doc_id AS d2
       |  FROM documents a JOIN documents b
       |    ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
       |edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM vpairs
       |  UNION SELECT d2, d1 FROM vpairs
       |  UNION SELECT d1, d2 FROM xpairs
       |  UNION SELECT d2, d1 FROM xpairs),
       |walk AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.dst),
       |labels AS (
       |  SELECT src AS id, least(src, min(dst)) AS cluster
       |  FROM walk GROUP BY src),
       |q AS (
       |  SELECT doc_id,
       |         CAST(floor((${TextQueries.qualitySqlExpr}) * 1048576) AS BIGINT) AS q20
       |  FROM documents),
       |ranked AS (
       |  SELECT l.cluster, l.id, q.q20,
       |         row_number() OVER (PARTITION BY l.cluster
       |                            ORDER BY q.q20 DESC, l.id ASC) AS rn,
       |         count(*) OVER (PARTITION BY l.cluster) AS n_docs
       |  FROM labels l JOIN q ON q.doc_id = l.id)
       |SELECT cluster AS cluster_id, n_docs, id AS kept_id, q20 AS kept_q20
       |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin

  /** [[graft.operators.Dedup.chunkDedup]] (C4-style 10-word chunk dedup)
    * under the oracle gate: per doc, chunk counts and the md5 of the
    * rebuilt text — proves the reconstruction bit-exact without dumping
    * full text. Scale notes live on the operator. */
  def qChunkDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.operators.Dedup
      .chunkDedup(t(spark, sfDir, "documents"), "doc_id", "text", chunkWords = 10)
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        md5(col("kept_text").cast("binary")).as("kept_md5"))
      .orderBy("doc_id")
  }

  val qChunkDedupSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |chunks AS (
      |  SELECT doc_id, i AS pos, array_to_string(w[(i*10+1):(i*10+10)], ' ') AS chunk
      |  FROM toks, LATERAL unnest(generate_series(0, CAST(ceil(len(w)/10.0) AS BIGINT) - 1)) AS t(i)),
      |ranked AS (
      |  SELECT doc_id, pos, chunk,
      |         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
      |  FROM chunks),
      |kept AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |         md5(string_agg(chunk, ' ' ORDER BY pos)) AS kept_md5
      |  FROM ranked WHERE rn = 1 GROUP BY doc_id),
      |totals AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id)
      |SELECT t.doc_id AS doc_id, t.n_chunks, coalesce(k.n_kept, 0) AS n_kept, k.kept_md5
      |FROM totals t LEFT JOIN kept k ON k.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** [[graft.operators.Dedup.windowDupStats]] (Lee-et-al-style exact
    * substring dedup diagnostic) under the oracle gate: per doc, how many
    * of its overlapping 16-token windows occur in ≥2 distinct documents,
    * aggregated per language with the affected-doc count. Scale notes live
    * on the operator (groupBy window hash — the shuffle-native suffix-array
    * replacement). */
  def qSubstringDup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = t(spark, sfDir, "documents")
    graft.operators.Dedup.windowDupStats(docs, "doc_id", "text", windowWords = 16)
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_windows")).as("n_windows"),
        sum(col("n_dup_windows")).as("n_dup_windows"),
        sum(when(col("n_dup_windows") > 0, 1L).otherwise(0L)).as("n_docs_hit"))
      .orderBy("lang")
  }

  val qSubstringDupSql: String =
    """WITH toked AS (
      |  SELECT doc_id, lang, list_filter(string_split(text, ' '), t -> t <> '') AS tk
      |  FROM documents),
      |sized AS (SELECT doc_id, lang, tk, len(tk) AS n FROM toked WHERE len(tk) >= 16),
      |wins AS (
      |  SELECT doc_id, lang,
      |         md5(array_to_string(list_slice(tk, i + 1, i + 16), ' ')) AS wh
      |  FROM sized, LATERAL unnest(generate_series(0, n - 16)) AS g(i)),
      |dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(DISTINCT doc_id) > 1),
      |per_doc AS (
      |  SELECT w.doc_id, w.lang, count(*) AS n_windows,
      |         sum(CASE WHEN d.wh IS NOT NULL THEN 1 ELSE 0 END) AS n_dup_windows
      |  FROM wins w LEFT JOIN dup d ON d.wh = w.wh
      |  GROUP BY w.doc_id, w.lang)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(n_windows) AS BIGINT) AS n_windows,
      |       CAST(sum(n_dup_windows) AS BIGINT) AS n_dup_windows,
      |       CAST(sum(CASE WHEN n_dup_windows > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit
      |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin

  /** Cross-source priority dedup ([[graft.operators.Dedup.priorityDedup]])
    * under the oracle gate: sources tier into 3 priority classes
    * (srcN → N % 3; 0 = curated, 2 = web — lower wins), and every exact
    * or verified near-duplicate keeps its best-(priority, id) member —
    * the multi-source corpus rule RedPajama/Dolma-style assemblies apply
    * so the curated copy survives and the web mirror drops. Readout: per
    * (priority, lang) doc totals, kept counts and kept char mass. Scale
    * notes live on the operator (exact-collapse by key first; the
    * priority rides existing shuffles). */
  def qCrossSourceDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = t(spark, sfDir, "documents")
      // 2-arg substring (to end of string), matching the oracle's
      // substr(source, 4) — a fixed-length 3rd arg would silently
      // truncate a >10-digit source id where DuckDB would not
      .withColumn("priority", expr("CAST(substring(source, 4) AS BIGINT) % 3"))
    graft.operators.Dedup
      .priorityDedup(docs, "doc_id", "text", "priority", n = 3, minJaccard = 0.5)
      .withColumnRenamed("id", "doc_id")
      .join(docs.select(col("doc_id"), col("priority"), col("lang"), col("n_chars")),
        Seq("doc_id"))
      .groupBy("priority", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        sum(col("kept") * col("n_chars")).as("kept_chars"))
      .orderBy("priority", "lang")
  }

  val qCrossSourceDedupSql: String =
    s"""WITH pbase AS (
       |  SELECT doc_id, text, lang, n_chars,
       |         CAST(substr(source, 4) AS BIGINT) % 3 AS priority
       |  FROM documents),
       |pwin AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, row_number() OVER (PARTITION BY md5(text)
       |                                      ORDER BY priority, doc_id) AS rn
       |    FROM pbase) WHERE rn = 1),
       |reps AS (SELECT b.* FROM pbase b JOIN pwin w ON w.doc_id = b.doc_id),
       |${minhashSqlCtes("reps")},
       |${vpairsSqlCtes(0.5)},
       |losers AS (
       |  SELECT DISTINCT CASE WHEN (b1.priority, v.d1) < (b2.priority, v.d2)
       |                       THEN v.d2 ELSE v.d1 END AS doc_id
       |  FROM vpairs v
       |  JOIN pbase b1 ON b1.doc_id = v.d1
       |  JOIN pbase b2 ON b2.doc_id = v.d2),
       |kept AS (
       |  SELECT b.doc_id,
       |         CASE WHEN w.doc_id IS NOT NULL AND l.doc_id IS NULL
       |              THEN 1 ELSE 0 END AS kept
       |  FROM pbase b
       |  LEFT JOIN pwin w ON w.doc_id = b.doc_id
       |  LEFT JOIN losers l ON l.doc_id = b.doc_id)
       |SELECT b.priority, b.lang, count(*) AS n_docs,
       |       CAST(sum(k.kept) AS BIGINT) AS n_kept,
       |       CAST(sum(k.kept * b.n_chars) AS BIGINT) AS kept_chars
       |FROM pbase b JOIN kept k ON k.doc_id = b.doc_id
       |GROUP BY b.priority, b.lang
       |ORDER BY b.priority, b.lang""".stripMargin

  /** Substring dedup REMOVAL ([[graft.operators.Dedup.substringRewrite]],
    * round 12 — the production operator behind the [[qSubstringDup]]
    * diagnostic): per doc, token counts before/after cutting every
    * non-first occurrence of a duplicated 16-token window, and the md5 of
    * the rewritten text — proving the reconstruction bit-exact without
    * dumping full text (the q_chunk_dedup readout convention). Scale notes
    * live on the operator (arg-min per window hash + loser-only fan-out —
    * the shuffle-native suffix-array replacement Lee et al. describe). */
  def qSubstringRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.operators.Dedup
      .substringRewrite(t(spark, sfDir, "documents"), "doc_id", "text", windowWords = 16)
      .select(col("id").as("doc_id"), col("n_tokens"), col("n_kept"),
        md5(col("kept_text").cast("binary")).as("kept_md5"))
      .orderBy("doc_id")
  }

  val qSubstringRewriteSql: String =
    """WITH toked AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
      |  FROM documents),
      |sized AS (SELECT doc_id, tk, len(tk) AS n FROM toked),
      |wins AS (
      |  SELECT doc_id, i AS pos,
      |         md5(array_to_string(list_slice(tk, i + 1, i + 16), ' ')) AS wh
      |  FROM sized, LATERAL unnest(generate_series(0, n - 16)) AS g(i)
      |  WHERE n >= 16),
      |ranked AS (
      |  SELECT doc_id, pos,
      |         row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn
      |  FROM wins),
      |cover AS (
      |  SELECT DISTINCT doc_id, pos + j AS ti
      |  FROM ranked, LATERAL unnest(generate_series(0, 15)) AS t(j)
      |  WHERE rn > 1),
      |toks AS (
      |  SELECT doc_id, i - 1 AS ti, tk[i] AS tok
      |  FROM sized, LATERAL unnest(generate_series(1, n)) AS t(i)),
      |kept AS (
      |  SELECT t.doc_id, count(*) AS n_kept,
      |         md5(string_agg(t.tok, ' ' ORDER BY t.ti)) AS kept_md5
      |  FROM toks t LEFT JOIN cover c ON c.doc_id = t.doc_id AND c.ti = t.ti
      |  WHERE c.ti IS NULL
      |  GROUP BY t.doc_id)
      |SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_tokens,
      |       coalesce(k.n_kept, 0) AS n_kept, k.kept_md5
      |FROM sized s LEFT JOIN kept k ON k.doc_id = s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** PageRank over the cross-source duplication graph
    * ([[graft.operators.LinkAnalysis.pagerank]]): two sources are linked
    * iff they share a duplicated 16-token window (the
    * [[graft.operators.Dedup.windowHashes]] key — a window in two distinct
    * sources is cross-doc duplicated by construction), and fixed-point
    * integer PageRank (damping 17/20, mass 2^40, 3 iterations) ranks each
    * source's duplication centrality — the crawl-curation signal for
    * "which domains syndicate content". Isolated sources keep
    * teleport-only rank and exercise the dangling-mass path.
    *
    * Scale shape: window generation is row-local; the edge build is one
    * distinct on (source, window-hash) plus a self-equi-join on the hash
    * (an f-source window emits ≤ f² SOURCE pairs — f is bounded by the
    * domain count per window, and at web scale a hot-window DF cap
    * mirrors [[graft.operators.Dedup.DefaultMaxShingleDF]]); iterations
    * run on the |sources|-node graph. All arithmetic is 64-bit integer,
    * so the DuckDB twin (unrolled iterations) matches bit-for-bit. */
  def qSourcePagerank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = t(spark, sfDir, "documents")
    // native window-hash kernel, RAW 16-byte digests: bijective to the
    // hex form (identical distinct/join/edge results) at half the key
    // bytes and no hex encode — wh is identity-only here, never output.
    // NOT cached: both sides of the self-join share one distinct plan, so
    // ReusedExchange materializes the big shuffle once (measured faster
    // than paying the 600M-row cache write; a shared-window count
    // pre-filter was also measured SLOWER — the agg costs what it saves)
    val wins = docs
      .select(col("source"),
        explode(graft.plans.WindowHashExpressions.windowHashesRaw(
          col("text"), 16)).as("wh"))
      .distinct()
    val e0 = wins.as("a").join(wins.as("b"),
        col("a.wh") === col("b.wh") && col("a.source") < col("b.source"))
      .select(col("a.source").as("src"), col("b.source").as("dst"))
      .distinct()
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = docs.select(col("source")).distinct()
    try {
      graft.operators.LinkAnalysis.pagerank(nodes, edges, "source", iters = 3)
        .select(col("id").as("source"), col("deg"), col("pr"))
        .orderBy("source")
    } finally graft.CacheScope.release()
  }

  /** One unrolled integer-PageRank iteration as a CTE — references the
    * caller's `edges`/`deg`/`tconst`/`nconst` CTEs by name (shared by the
    * q_source_pagerank and q_link_graph oracles). */
  private[queries] def pagerankIterSql(prev: String, it: String): String =
    s"""$it AS (
       |  SELECT d.id, d.deg,
       |         CAST(tc.t + (17 * (COALESCE(inf.s, 0)
       |           + (SELECT COALESCE(sum(pr), 0) FROM $prev WHERE deg = 0) // nc.n)) // 20 AS BIGINT) AS pr
       |  FROM deg d CROSS JOIN tconst tc CROSS JOIN nconst nc
       |  LEFT JOIN (
       |    SELECT e.dst AS id, sum(p.pr // p.deg) AS s
       |    FROM $prev p JOIN edges e ON e.src = p.id
       |    WHERE p.deg > 0 GROUP BY e.dst) inf ON inf.id = d.id)""".stripMargin

  val qSourcePagerankSql: String =
    s"""WITH toked AS (
       |  SELECT source, list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM documents),
       |sized AS (SELECT source, tk, len(tk) AS n FROM toked WHERE len(tk) >= 16),
       |wins AS (
       |  SELECT DISTINCT source,
       |         md5(array_to_string(list_slice(tk, i + 1, i + 16), ' ')) AS wh
       |  FROM sized, LATERAL unnest(generate_series(0, n - 16)) AS g(i)),
       |e0 AS (
       |  SELECT a.source AS s1, b.source AS s2
       |  FROM wins a JOIN wins b ON a.wh = b.wh AND a.source < b.source
       |  GROUP BY 1, 2),
       |edges AS (SELECT s1 AS src, s2 AS dst FROM e0
       |          UNION ALL SELECT s2, s1 FROM e0),
       |nodes AS (SELECT DISTINCT source AS id FROM documents),
       |nconst AS (SELECT count(*) AS n FROM nodes),
       |tconst AS (SELECT 3 * 1099511627776 // 20 // n AS t FROM nconst),
       |deg AS (
       |  SELECT n.id, CAST(count(e.src) AS BIGINT) AS deg
       |  FROM nodes n LEFT JOIN edges e ON e.src = n.id GROUP BY n.id),
       |pr0 AS (SELECT id, deg, 1099511627776 // (SELECT n FROM nconst) AS pr FROM deg),
       |${pagerankIterSql("pr0", "pr1")},
       |${pagerankIterSql("pr1", "pr2")},
       |${pagerankIterSql("pr2", "pr3")}
       |SELECT id AS source, deg, pr FROM pr3 ORDER BY source""".stripMargin

  /** Edit-distance verification over LSH candidates: Levenshtein distance
    * between the (truncated) texts of each MinHash-LSH candidate pair —
    * the character-level near-dup verifier that complements set-based
    * Jaccard (catches reorderings Jaccard forgives, and vice versa).
    * Distance runs ONLY on candidate pairs from banding (never all pairs)
    * and on 80-char prefixes, so the O(n·m) DP cost per pair is bounded —
    * the two properties that make edit-distance dedup feasible at corpus
    * scale. Both engines implement unit-cost Levenshtein, so the distance
    * is integer-exact. */
  def qEditDistance(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = t(spark, sfDir, "documents")
    val sh = graft.CacheScope.cached(graft.operators.Dedup
      .shingleSets(docs, "doc_id", "text", n = 3))
    val cand = graft.operators.Dedup.minhashFromShingles(sh)
    val ta = docs.select(col("doc_id").as("d1"), substring(col("text"), 1, 80).as("t1"))
    val tb = docs.select(col("doc_id").as("d2"), substring(col("text"), 1, 80).as("t2"))
    cand.join(ta, "d1").join(tb, "d2")
      .select(col("d1"), col("d2"), col("n_bands"),
        levenshtein(col("t1"), col("t2")).as("edit_dist"))
      .orderBy("d1", "d2")
  }

  val qEditDistanceSql: String =
    s"""WITH ${minhashSqlCtes("documents")}
       |SELECT p.d1, p.d2, p.n_bands,
       |       levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80)) AS edit_dist
       |FROM pairs p
       |JOIN documents a ON a.doc_id = p.d1
       |JOIN documents b ON b.doc_id = p.d2
       |ORDER BY p.d1, p.d2""".stripMargin

  /** Leakage-safe train/holdout split — the eval-contamination guard: a
    * near-duplicate of a holdout document must NOT land in train, or the
    * eval set leaks. Composition of three verified blocks: LSH candidates
    * → exact-Jaccard verification → connected components (near-dup
    * clusters), then the split is decided by a content-hash gate on the
    * CLUSTER label (singletons = own doc_id), so an entire duplicate
    * cluster moves to one side atomically — by construction, not by
    * post-hoc filtering. Readout is per-side doc/cluster/char-mass
    * counts; the oracle reproduces the clusters via recursive CTE and the
    * same md5 gate, so the exact membership is hash-checked.
    *
    * Scale shape: everything up to labels is the verified-cascade shape
    * (bucketed candidates, no all-pairs) run over EXACT-DUP-COLLAPSED
    * representatives ([[graft.operators.Dedup.collapsedClusterLabels]]) —
    * a k-member exact-dup clique costs k map rows, not k² pair rows, which
    * is the difference between ~80 s and linear on a 10×-duplicated
    * fixture; the gate is row-local on the joined label; the corpus
    * shuffles once for the label join. The oracle deliberately stays the
    * UNCOLLAPSED direct formulation, so hash-green here proves the
    * collapse-recompose is semantics-preserving. */
  def qLeakageSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = t(spark, sfDir, "documents")
    val labels = graft.operators.Dedup
      .collapsedClusterLabels(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .withColumnRenamed("id", "doc_id")
    // join strategy left to AQE: labels is one row per doc (the id→cluster
    // map), so a forced broadcast would be the q_retention hazard again
    docs.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("side",
        when(graft.operators.Sampling.gateBelow(col("cluster").cast("string"), "4"),
          "holdout").otherwise("train"))
      .groupBy("side")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster")).as("n_clusters"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("side")
  }

  val qLeakageSplitSql: String =
    s"""WITH RECURSIVE ${minhashSqlCtes("documents")},
       |${vpairsSqlCtes(0.5)},
       |edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM vpairs
       |  UNION SELECT d2, d1 FROM vpairs),
       |walk AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT w.src, e.dst FROM walk w JOIN edges e ON e.src = w.dst),
       |labels AS (
       |  SELECT src AS id, least(src, min(dst)) AS cluster
       |  FROM walk GROUP BY src),
       |sided AS (
       |  SELECT d.doc_id, d.n_chars, coalesce(l.cluster, d.doc_id) AS cluster,
       |         CASE WHEN substr(md5(CAST(coalesce(l.cluster, d.doc_id) AS VARCHAR)), 1, 1) < '4'
       |              THEN 'holdout' ELSE 'train' END AS side
       |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
       |SELECT side, count(*) AS n_docs, count(DISTINCT cluster) AS n_clusters,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM sided GROUP BY side ORDER BY side""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_leakage_split" -> (qLeakageSplit _),
    "q_edit_distance" -> (qEditDistance _),
    "q_chunk_dedup" -> (qChunkDedup _),
    "q_substring_dup" -> (qSubstringDup _),
    "q_substring_rewrite" -> (qSubstringRewrite _),
    "q_source_pagerank" -> (qSourcePagerank _),
    "q_jaccard_pairs" -> (qJaccardPairs _),
    "q_containment" -> (qContainment _),
    "q_minhash_lsh" -> (qMinhashLsh _),
    "q_minhash_est" -> (qMinhashEst _),
    "q_simhash_pairs" -> (qSimhashPairs _),
    "q_incremental_dedup" -> (qIncrementalDedup _),
    "q_dedup_cascade" -> (qDedupCascade _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_cross_source_dedup" -> (qCrossSourceDedup _))

  val oracles: Map[String, String] = Map(
    "q_leakage_split" -> qLeakageSplitSql,
    "q_edit_distance" -> qEditDistanceSql,
    "q_chunk_dedup" -> qChunkDedupSql,
    "q_substring_dup" -> qSubstringDupSql,
    "q_substring_rewrite" -> qSubstringRewriteSql,
    "q_source_pagerank" -> qSourcePagerankSql,
    "q_jaccard_pairs" -> qJaccardPairsSql,
    "q_containment" -> qContainmentSql,
    "q_minhash_lsh" -> qMinhashLshSql,
    "q_minhash_est" -> qMinhashEstSql,
    "q_simhash_pairs" -> qSimhashPairsSql,
    "q_incremental_dedup" -> qIncrementalDedupSql,
    "q_dedup_cascade" -> qDedupCascadeSql,
    "q_dedup_clusters" -> qDedupClustersSql,
    "q_dedup_keep_best" -> qDedupKeepBestSql,
    "q_cross_source_dedup" -> qCrossSourceDedupSql)
}
