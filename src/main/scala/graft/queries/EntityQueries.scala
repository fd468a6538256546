package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.plans.StringDistanceExpressions.damerauLevenshtein

/** Entity resolution (record linkage): match dirty incoming records to a
  * canonical table by trigram blocking + edit-distance verification — the
  * pg_trgm-style pipeline every master-data / customer-360 system runs.
  *
  * The "dirty" side is derived deterministically from `customer` (so both
  * engines build the identical fixture in-query): per custkey mod 3 the
  * name is kept exact, one digit is substituted with 'X', or an adjacent
  * digit pair is transposed — the three typo classes the matcher must
  * handle (distance 0, substitution 1, transposition 1).
  *
  * Candidate generation NEVER compares all pairs: names explode into
  * character trigrams, trigrams whose canonical document frequency exceeds
  * `MaxTrigramDF` are dropped (the 'Customer#'-prefix and all-zero trigrams
  * carry no signal — the classic hot-token cap, same shape as the
  * shingle-DF cap in `Dedup.jaccardPairs`), and candidates must share
  * ≥ `MinSharedTrigrams` surviving trigrams. Verification then scores the
  * bounded candidate set with the native codegen Damerau–Levenshtein
  * expression (`plans/StringDistanceExpressions.scala`) and keeps matches
  * with distance ≤ `MaxDistance`, picking per record the (distance,
  * custkey)-minimal match via `min(struct(dl, custkey))` — best match and
  * candidate count in one map-side-combinable aggregation.
  *
  * Scale shape: blocking is equi-joins on the trigram key with a bounded
  * per-trigram fan-out (≤ MaxTrigramDF² pairs per trigram); the DP kernel
  * runs only on blocked candidates, inside whole-stage codegen. Unmatched
  * records surface with NULL match columns (left join) — silent drops are
  * how entity pipelines lose records.
  */
object EntityQueries {

  /** DF cap floor; the effective cap is `max(40, |customer| / 25)` — a
    * RELATIVE cap, because absolute trigram frequencies grow linearly with
    * the table while their discriminative value depends on the ratio: a
    * fixed cap measured 42% unmatched at 10× the rows (blocking starved),
    * the relative cap holds recall flat across SFs. */
  val MaxTrigramDFFloor = 40L
  val MaxTrigramDFRatio = 25L
  /** 1, not 2: the zero-padded fixture names are low-entropy (a short key
    * drowns in '000' trigrams, all DF-capped away), so requiring two shared
    * rare trigrams starves them. One shared rare trigram keeps the
    * per-record candidate set ≤ |trigrams/name| × cap — still bounded. */
  val MinSharedTrigrams = 1L
  val MaxDistance = 2

  private def trigrams(df: DataFrame, keyCol: String, nameCol: String): DataFrame =
    df.filter(length(col(nameCol)) >= 3) // Spark sequence(1, n<1) would run descending
      .select(col(keyCol), col(nameCol),
        explode(sequence(lit(1), length(col(nameCol)) - 2)).as("pos"))
      .select(col(keyCol), col(nameCol).substr(col("pos"), lit(3)).as("tg"))
      .distinct()

  /** Deterministic typo fixture: position 10..17 inside the 18-char name,
    * driven by custkey so both engines derive byte-identical dirty names. */
  private def dirtyNames(customer: DataFrame): DataFrame = {
    val p = (col("c_custkey") % 8 + 10).cast("int")
    val name = col("c_name")
    val subst = concat(name.substr(lit(1), p - 1), lit("X"),
      name.substr(p + 1, lit(100)))
    val transp = concat(name.substr(lit(1), p - 1),
      name.substr(p + 1, lit(1)), name.substr(p, lit(1)),
      name.substr(p + 2, lit(100)))
    customer.select(col("c_custkey").as("src_key"),
      when(col("c_custkey") % 3 === 0, name)
        .when(col("c_custkey") % 3 === 1, subst)
        .otherwise(transp).as("dirty_name"))
  }

  def qEntityMatch(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer")
    val dirty = dirtyNames(customer)

    val canonTg = trigrams(customer, "c_custkey", "c_name")
    val nCust = customer.agg(count(lit(1)).as("n_cust"))
    val coldTg = canonTg.groupBy("tg")
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nCust))
      .filter(col("df") <=
        greatest(lit(MaxTrigramDFFloor), expr(s"n_cust div $MaxTrigramDFRatio")))
      .select("tg")
    val canonCold = canonTg.join(coldTg, "tg")
    // the dirty side needs no separate cap join: joining canonCold already
    // restricts to cold trigrams (one execution of the cap subtree, not two)
    val dirtyTg = trigrams(dirty, "src_key", "dirty_name")

    val candidates = dirtyTg.join(canonCold, "tg")
      .groupBy("src_key", "c_custkey")
      .agg(count(lit(1)).as("shared_tg"))
      .filter(col("shared_tg") >= MinSharedTrigrams)

    val verified = candidates
      .join(dirty, "src_key")
      .join(customer.select("c_custkey", "c_name"), "c_custkey")
      .withColumn("dl", damerauLevenshtein(col("dirty_name"), col("c_name")))
      .filter(col("dl") <= MaxDistance)
    // best match AND candidate count in ONE aggregation pass:
    // min(struct(dl, custkey)) is exactly the (distance, key) lexicographic
    // tie-break, and fusing the count avoids a second execution of the
    // whole blocking+verify subtree (Spark reuses exchanges, not arbitrary
    // common subplans).
    val best = verified.groupBy("src_key")
      .agg(count(lit(1)).as("n_candidates"),
        min(struct(col("dl"), col("c_custkey"))).as("b"))
      .select(col("src_key"), col("b.c_custkey").as("best_custkey"),
        col("b.dl").cast("long").as("best_dl"), col("n_candidates"))

    dirty.join(best, Seq("src_key"), "left")
      .select(col("src_key"), col("dirty_name"), col("best_custkey"),
        col("best_dl"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        (col("best_custkey") === col("src_key")).as("self_match"))
      .orderBy("src_key")
  }

  val qEntityMatchSql: String =
    s"""WITH dirty AS (
       |  SELECT c_custkey AS src_key,
       |         CASE
       |           WHEN c_custkey % 3 = 0 THEN c_name
       |           WHEN c_custkey % 3 = 1 THEN
       |             substr(c_name, 1, CAST(c_custkey % 8 + 10 AS INT) - 1) || 'X' ||
       |             substr(c_name, CAST(c_custkey % 8 + 10 AS INT) + 1, 100)
       |           ELSE
       |             substr(c_name, 1, CAST(c_custkey % 8 + 10 AS INT) - 1) ||
       |             substr(c_name, CAST(c_custkey % 8 + 10 AS INT) + 1, 1) ||
       |             substr(c_name, CAST(c_custkey % 8 + 10 AS INT), 1) ||
       |             substr(c_name, CAST(c_custkey % 8 + 10 AS INT) + 2, 100)
       |         END AS dirty_name
       |  FROM customer),
       |canon_tg AS (
       |  SELECT DISTINCT c_custkey, substr(c_name, CAST(i AS INT), 3) AS tg
       |  FROM customer, unnest(range(1, len(c_name) - 1)) AS t(i)),
       |cold_tg AS (
       |  SELECT tg FROM canon_tg GROUP BY tg
       |  HAVING count(*) <= greatest($MaxTrigramDFFloor,
       |           (SELECT count(*) FROM customer) // $MaxTrigramDFRatio)),
       |dirty_tg AS (
       |  SELECT DISTINCT d.src_key, substr(d.dirty_name, CAST(i AS INT), 3) AS tg
       |  FROM dirty d, unnest(range(1, len(d.dirty_name) - 1)) AS t(i)),
       |candidates AS (
       |  SELECT dt.src_key, ct.c_custkey, count(*) AS shared_tg
       |  FROM dirty_tg dt
       |  JOIN cold_tg cd ON cd.tg = dt.tg
       |  JOIN canon_tg ct ON ct.tg = dt.tg
       |  GROUP BY dt.src_key, ct.c_custkey
       |  HAVING count(*) >= $MinSharedTrigrams),
       |verified AS (
       |  SELECT ca.src_key, ca.c_custkey,
       |         damerau_levenshtein(d.dirty_name, c.c_name) AS dl
       |  FROM candidates ca
       |  JOIN dirty d ON d.src_key = ca.src_key
       |  JOIN customer c ON c.c_custkey = ca.c_custkey
       |  WHERE damerau_levenshtein(d.dirty_name, c.c_name) <= $MaxDistance),
       |best AS (
       |  SELECT src_key, c_custkey AS best_custkey, CAST(dl AS BIGINT) AS best_dl
       |  FROM (SELECT *, row_number() OVER
       |          (PARTITION BY src_key ORDER BY dl, c_custkey) AS rn
       |        FROM verified)
       |  WHERE rn = 1),
       |ncand AS (
       |  SELECT src_key, count(*) AS n_candidates FROM verified GROUP BY src_key)
       |SELECT d.src_key, d.dirty_name, b.best_custkey, b.best_dl,
       |       coalesce(n.n_candidates, 0) AS n_candidates,
       |       b.best_custkey = d.src_key AS self_match
       |FROM dirty d
       |LEFT JOIN best b ON b.src_key = d.src_key
       |LEFT JOIN ncand n ON n.src_key = d.src_key
       |ORDER BY d.src_key""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_entity_match" -> (qEntityMatch _))

  val oracles: Map[String, String] = Map(
    "q_entity_match" -> qEntityMatchSql)
}
