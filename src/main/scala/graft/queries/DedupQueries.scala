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
    * docs sharing ≥1 shingle → |∩| by join-count, |∪| from set sizes.
    *
    * Scale shape: shingles are joined as xxhash64 LONG keys, not strings —
    * an 8-byte shuffle key instead of ~20+ byte text (collision odds at
    * 100 TB shingle cardinality ~2^40 keys are ~2^-a lot; any collision
    * only perturbs one `inter` count). The hashed shingle set is cached:
    * it feeds the set-size aggregate and both sides of the self-join. */
  def qJaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = docShingles(spark, sfDir)
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
      .cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
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
  def qMinhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val hx = docShingles(spark, sfDir)
      .select(col("doc_id"),
        md5(concat(lit("a:"), col("sh")).cast("binary")).as("m1"),
        md5(concat(lit("b:"), col("sh")).cast("binary")).as("m2"))
    val mins = (0 until 16).map { j =>
      val src = if (j < 8) col("m1") else col("m2")
      min(substring(src, (j % 8) * 4 + 1, 4)).as(s"h$j")
    }
    val sig = hx.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).cast("long").as("band"),
        concat((0 until 4).map(r => col(s"h${b * 4 + r}")): _*).as("band_key"))
    }
    val bandKeys = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
      .cache()
    bandKeys.as("a").join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("d1", "d2")
  }

  val qMinhashLshSql: String = {
    val minExprs = (0 until 16).map { j =>
      val src = if (j < 8) "m1" else "m2"
      s"min(substr($src, ${(j % 8) * 4 + 1}, 4)) AS h$j"
    }.mkString(",\n       |  ")
    val bandSelects = (0 until 4).map { b =>
      val key = (0 until 4).map(r => s"h${b * 4 + r}").mkString(" || ")
      s"SELECT doc_id, CAST($b AS BIGINT) AS band, $key AS band_key FROM sig"
    }.mkString("\n       |  UNION ALL ")
    s"""WITH $ShinglesSqlCte,
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
       |  GROUP BY 1, 2)
       |SELECT d1, d2, n_bands FROM pairs ORDER BY d1, d2""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jaccard_pairs" -> (qJaccardPairs _),
    "q_minhash_lsh" -> (qMinhashLsh _))

  val oracles: Map[String, String] = Map(
    "q_jaccard_pairs" -> qJaccardPairsSql,
    "q_minhash_lsh" -> qMinhashLshSql)
}
