package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.plans.StringDistanceExpressions.damerauLevenshtein

/** Entity resolution (record linkage): match dirty incoming records to a
  * canonical table by symmetric-delete (deletion-neighborhood) blocking +
  * edit-distance verification.
  *
  * The "dirty" side is derived deterministically from `customer` (so both
  * engines build the identical fixture in-query): per custkey mod 3 the
  * name is kept exact, one digit is substituted with 'X', or an adjacent
  * digit pair is transposed — the three typo classes the matcher must
  * handle (distance 0, substitution 1, transposition 1).
  *
  * Candidate generation NEVER compares all pairs — and, since round 9,
  * never joins on a key whose document frequency grows with the corpus.
  * The first cut used character-trigram blocking with a RELATIVE hot-gram
  * cap (`df ≤ max(40, n/25)`); the 100× scale sweep exposed that as
  * quadratic: over a low-entropy key space (`Customer#` + zero-padded
  * digits) every digit trigram's df grows ~n·7/1000 while the cap grows
  * n/25, so every digit trigram survives forever and the candidate join
  * emits Σ df² ≈ n²/2250 pairs — 10¹¹ rows at 1.5 M customers, which AQE
  * then coalesced into one task (small pre-join inputs, exploding join).
  * No partitioning fixes that; the blocking key itself must have bounded
  * df.
  *
  * Symmetric delete does: each side emits every string obtainable by
  * deleting ≤ `MaxDistance` characters (1 + L + C(L,2) variants per
  * L-char name — quadratic in NAME LENGTH, constant in corpus size), and
  * candidates are pairs sharing a variant. Completeness: every unit edit
  * (insert / delete / substitute / adjacent transposition) is repaired by
  * deleting at most one character from each string, so
  * `dl(a,b) ≤ τ` ⇒ a and b share a ≤τ-deletion variant. Blocking thus
  * has NO false negatives and drops out of the output contract:
  * `n_candidates` counts EVERY canonical record within `MaxDistance`
  * (under the trigram scheme it counted only co-blocked ones). A variant
  * key is ≥ (L−τ) exact characters, so its df is bounded by the corpus's
  * near-duplicate density, not its size — mass exact-duplicate names (the
  * one pathology, which belongs to the dedup pass, not the matcher) are
  * guarded by the absolute `MaxVariantDF` cap, replayed identically in
  * the oracle.
  *
  * Verification then scores the candidate set with the native codegen
  * Damerau–Levenshtein expression (`plans/StringDistanceExpressions
  * .scala`) and keeps matches with distance ≤ `MaxDistance`, picking per
  * record the (distance, custkey)-minimal match via
  * `min(struct(dl, custkey))` — best match and candidate count in one
  * map-side-combinable aggregation.
  *
  * Scale shape: variant generation is a row-local codegen'd array
  * expression (no UDF, no join); blocking is one equi-join on the variant
  * string; everything downstream runs on the (sparse) candidate set.
  * Unmatched records surface with NULL match columns (left join) — silent
  * drops are how entity pipelines lose records.
  */
object EntityQueries {

  /** Absolute hot-variant cap. A deletion variant pins ≥ (L−τ) exact
    * characters, so for a distinct-keyed corpus its df is O(1) in corpus
    * size (measured ≤ ~36 at the 100× fixture's 1.5 M names); only mass
    * exact-duplicate names push past this, and those pairs are the exact
    * dedup pass's job. Absolute — unlike the removed relative trigram cap
    * — so the blocked-pair bound Σ df² stays linear in corpus size. */
  val MaxVariantDF = 1000L
  val MaxDistance = 2

  /** All strings obtainable from `name` by deleting at most [[MaxDistance]]
    * (= 2) characters, as a row-local deduplicated array: the name itself,
    * L single deletions, C(L,2) double deletions. `array_distinct` matters
    * on repeated characters (a run of k equal chars yields one distinct
    * variant, not k) — zero-padded names collapse 172 raw variants to
    * ~60–100 distinct ones. Guards keep `sequence()` ascending-only
    * (sequence(2,1) would run DESCENDING, not empty). */
  private def deletionVariants(name: Column): Column = {
    val L = length(name)
    val del1 = transform(sequence(lit(1), L),
      i => concat(name.substr(lit(1), i - 1), name.substr(i + 1, lit(10000))))
    val del2 = flatten(transform(sequence(lit(1), L - 1),
      i => transform(sequence(i + 1, L),
        j => concat(name.substr(lit(1), i - 1),
          name.substr(i + 1, j - i - 1),
          name.substr(j + 1, lit(10000))))))
    val empty = array().cast("array<string>")
    array_distinct(concat(
      array(name),
      when(L >= 1, del1).otherwise(empty),
      when(L >= 2, del2).otherwise(empty)))
  }

  private def variants(df: DataFrame, keyCol: String, nameCol: String): DataFrame =
    df.select(col(keyCol), explode(deletionVariants(col(nameCol))).as("v"))

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

    val canonVar = variants(customer, "c_custkey", "c_name")
    // per-row array_distinct makes count(*) per variant = distinct custkeys
    val coldVar = canonVar.groupBy("v")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxVariantDF)
      .select("v")
    val dirtyVar = variants(dirty, "src_key", "dirty_name")

    val candidates = dirtyVar
      .join(canonVar.join(coldVar, "v"), "v")
      .select("src_key", "c_custkey").distinct()

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

  /** The oracle replays the identical pipeline: same dirty fixture, same
    * ≤2-deletion variant sets (DISTINCT collapses repeated-character
    * dupes exactly like `array_distinct`), same absolute df cap, same
    * DL ≤ 2 verify and (dl, custkey) tie-break. */
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
       |canon_var AS (
       |  SELECT DISTINCT c_custkey, c_name AS v FROM customer
       |  UNION
       |  SELECT DISTINCT c_custkey,
       |         substr(c_name, 1, CAST(i - 1 AS INT)) ||
       |         substr(c_name, CAST(i + 1 AS INT), 10000) AS v
       |  FROM customer, unnest(range(1, len(c_name) + 1)) AS t(i)
       |  UNION
       |  SELECT DISTINCT c_custkey,
       |         substr(c_name, 1, CAST(i - 1 AS INT)) ||
       |         substr(c_name, CAST(i + 1 AS INT), CAST(j - i - 1 AS INT)) ||
       |         substr(c_name, CAST(j + 1 AS INT), 10000) AS v
       |  FROM customer,
       |       unnest(range(1, len(c_name) + 1)) AS t(i),
       |       unnest(range(1, len(c_name) + 1)) AS u(j)
       |  WHERE j > i),
       |cold_var AS (
       |  SELECT v FROM canon_var GROUP BY v HAVING count(*) <= $MaxVariantDF),
       |dirty_var AS (
       |  SELECT DISTINCT src_key, dirty_name AS v FROM dirty
       |  UNION
       |  SELECT DISTINCT src_key,
       |         substr(dirty_name, 1, CAST(i - 1 AS INT)) ||
       |         substr(dirty_name, CAST(i + 1 AS INT), 10000) AS v
       |  FROM dirty, unnest(range(1, len(dirty_name) + 1)) AS t(i)
       |  UNION
       |  SELECT DISTINCT src_key,
       |         substr(dirty_name, 1, CAST(i - 1 AS INT)) ||
       |         substr(dirty_name, CAST(i + 1 AS INT), CAST(j - i - 1 AS INT)) ||
       |         substr(dirty_name, CAST(j + 1 AS INT), 10000) AS v
       |  FROM dirty,
       |       unnest(range(1, len(dirty_name) + 1)) AS t(i),
       |       unnest(range(1, len(dirty_name) + 1)) AS u(j)
       |  WHERE j > i),
       |candidates AS (
       |  SELECT DISTINCT dv.src_key, cv.c_custkey
       |  FROM dirty_var dv
       |  JOIN cold_var cd ON cd.v = dv.v
       |  JOIN canon_var cv ON cv.v = dv.v),
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
