package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFunctions.tokens

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

  /** Distinct word-3-shingles per doc (order-preserving windows over the
    * token stream). Empty when < 3 tokens. */
  private def shingleArr(tk: Column): Column =
    when(size(tk) >= 3,
      array_distinct(transform(sequence(lit(0), size(tk) - 3, lit(1)), i =>
        concat_ws(" ", element_at(tk, i + 1), element_at(tk, i + 2), element_at(tk, i + 3)))))
      .otherwise(array().cast("array<string>"))

  private def docShingles(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(shingleArr(tokens(col("text")))).as("sh"))

  private val ShinglesSqlCte: String =
    """toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS sh
      |  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 2)) AS t(i))""".stripMargin

  /** Exact n-gram Jaccard near-dup pairs via the shingle inverted index:
    * docs sharing ≥1 shingle → |∩| by join-count, |∪| from set sizes. */
  def qJaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = docShingles(spark, sfDir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= 0.2)
      .select("d1", "d2", "inter", "jaccard")
      .orderBy("d1", "d2")
  }

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

  /** MinHash(16) + LSH(4 bands × 4 rows) candidate pairs. */
  def qMinhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = docShingles(spark, sfDir)
    val sig = sh
      .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("j"), col("sh"))
      .select(col("doc_id"), col("j"),
        md5(concat(col("j").cast("string"), lit(":"), col("sh")).cast("binary")).as("h"))
      .groupBy("doc_id", "j")
      .agg(min(col("h")).as("mh"))
    val bandKeys = sig
      .withColumn("band", floor(col("j") / 4).cast("long"))
      .groupBy("doc_id", "band")
      .agg(md5(array_join(
        transform(array_sort(collect_list(struct(col("j"), col("mh")))), x => x.getField("mh")),
        ",").cast("binary")).as("band_key"))
    bandKeys.as("a").join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("d1", "d2")
  }

  val qMinhashLshSql: String =
    s"""WITH $ShinglesSqlCte,
       |sig AS (
       |  SELECT doc_id, j, min(md5(CAST(j AS VARCHAR) || ':' || sh)) AS mh
       |  FROM sh, LATERAL unnest(generate_series(0, 15)) AS t(j)
       |  GROUP BY doc_id, j),
       |bands AS (
       |  SELECT doc_id, CAST(floor(j / 4.0) AS BIGINT) AS band,
       |         md5(string_agg(mh, ',' ORDER BY j)) AS band_key
       |  FROM sig
       |  GROUP BY doc_id, band),
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_bands
       |  FROM bands a
       |  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
       |              AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2, n_bands FROM pairs ORDER BY d1, d2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jaccard_pairs" -> (qJaccardPairs _),
    "q_minhash_lsh" -> (qMinhashLsh _))

  val oracles: Map[String, String] = Map(
    "q_jaccard_pairs" -> qJaccardPairsSql,
    "q_minhash_lsh" -> qMinhashLshSql)
}
