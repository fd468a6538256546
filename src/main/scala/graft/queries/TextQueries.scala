package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.TextFunctions._

/** Text-analysis + exact-dedup queries over `documents` ([ext] rows of
  * SURVEY §2.2): token frequencies, exact dedup, language-ID heuristic,
  * quality scoring, token counting, rolling fingerprints, binary metadata.
  * All narrow per-row pipelines + keyed aggregations — linear at 100 TB.
  */
object TextQueries {

  /** Top-20 token frequencies; the tie-break on token makes the LIMIT a
    * deterministic total order. */
  def qTextTokens(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(20)

  val qTextTokensSql: String =
    """SELECT token, count(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token
      |ORDER BY cnt DESC, token ASC
      |LIMIT 20""".stripMargin

  /** Exact dedup accounting: distinct md5(text) survivors per language. */
  def qDedupExact(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text").cast("binary"))).as("n_unique"))
      .withColumn("n_dups", col("n_docs") - col("n_unique"))
      .orderBy("lang")

  val qDedupExactSql: String =
    """SELECT lang, count(*) AS n_docs,
      |       count(DISTINCT md5(text)) AS n_unique,
      |       count(*) - count(DISTINCT md5(text)) AS n_dups
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** Adds a `hits_<lang>` column per stopword list; expects a `toks`
    * column. Shared by qLangId and the curation pipeline. */
  /** Attach `hits_<lang>` stopword-count columns from the native
    * [[graft.plans.TextStats]] kernel (one byte pass for all five lists;
    * the previous shape re-ran an interpreted ArrayFilter over the token
    * array per list). `df` must expose `text`. */
  private[queries] def withLangScores(df: DataFrame): DataFrame = {
    val withSt = df.withColumn("__st", graft.plans.TextStatsExpressions
      .textStats(col("text"), StopwordLists.map(_._2)))
    StopwordLists.zipWithIndex.foldLeft(withSt) {
      case (d, ((lang, _), i)) =>
        d.withColumn(s"hits_$lang", col("__st").getField("hits").getItem(i))
    }.drop("__st")
  }

  /** Argmax over the `hits_*` columns via greatest + chained when;
    * foldRight puts the FIRST list entry outermost → first wins ties. */
  private[queries] def predLangCol: org.apache.spark.sql.Column = {
    val hitCols = StopwordLists.map { case (l, _) => col(s"hits_$l") }
    val best = greatest(hitCols: _*)
    StopwordLists.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Stopword-hit language-ID heuristic: score each language's tiny
    * stopword list, argmax with a fixed tie order (list order). */
  def qLangId(spark: SparkSession, sfDir: String): DataFrame = {
    // narrow sort FIRST: range sampling evaluates the exchange child, so
    // a sort above the kernel projection would run text_stats twice
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy("doc_id")
    withLangScores(docs)
      .withColumn("pred_lang", predLangCol)
      .select((Seq(col("doc_id"), col("lang"), col("pred_lang")) ++
        StopwordLists.map { case (l, _) => col(s"hits_$l") }): _*)
  }

  /** `scored` CTE over `src` (which must expose `text`): every source
    * column plus the hits_* counts. */
  private[queries] def langScoredSqlCte(src: String): String = {
    def hits(words: Seq[String]): String = {
      val inList = words.map(w => s"'$w'").mkString(", ")
      s"(SELECT count(*) FROM unnest(string_split(text,' ')) AS u(tok) WHERE tok IN ($inList))"
    }
    val hitExprs = StopwordLists
      .map { case (l, ws) => s"  ${hits(ws)} AS hits_$l" }.mkString(",\n")
    s"""scored AS (
       |SELECT *,
       |$hitExprs
       |FROM $src)""".stripMargin
  }

  /** SQL twin of [[predLangCol]] — references the hits_* columns. */
  private[queries] val predLangSqlExpr: String = {
    val bestExpr = StopwordLists.map { case (l, _) => s"hits_$l" }
      .mkString("greatest(", ", ", ")")
    val caseArms = StopwordLists
      .map { case (l, _) => s"WHEN hits_$l = $bestExpr AND $bestExpr > 0 THEN '$l'" }
      .mkString(" ")
    s"CASE $caseArms ELSE 'und' END"
  }

  val qLangIdSql: String =
    s"""WITH ${langScoredSqlCte("documents")}
       |SELECT doc_id, lang,
       |       $predLangSqlExpr AS pred_lang,
       |       ${StopwordLists.map { case (l, _) => s"hits_$l" }.mkString(", ")}
       |FROM scored ORDER BY doc_id""".stripMargin

  /** TRAINED language ID (round 15) — the in-engine upgrade of the
    * stopword heuristic: a one-vs-rest multinomial scorer over hashed
    * char-n-gram features, trained and applied ENTIRELY relationally (no
    * driver-side model at all — the weight table is a |langs|×64-row
    * DataFrame that broadcasts into inference):
    *
    *  - features: char 2-/3-grams of lowercased whitespace tokens via the
    *    native `subword_gram_counts` kernel, hashed into 64 buckets by
    *    the md5 gate discipline (engine-portable — DuckDB computes the
    *    identical bucket), summed per (doc, bucket);
    *  - split: the deterministic 50% md5 gate on doc_id (train < '8');
    *  - training: per (lang, bucket) gram mass over the train split,
    *    integer-quantized to the LIKELIHOOD RATIO against the global
    *    profile — w = (p_lang·2^20)·2^20 div max(p_global·2^20, 1), with
    *    p = mass div total — so shared buckets score ≈ 2^20 for every
    *    language and only buckets OVER-represented in a language
    *    discriminate (a raw multinomial-mass dot was measured to collapse
    *    onto the densest language on this fixture; the ratio form is the
    *    TF-ratio centroid classifier, integer-exact end to end);
    *  - inference: test-doc bucket histograms ⋈ broadcast weights on
    *    bucket, score = Σ cnt·w per (doc, lang), argmax as a
    *    rank-filtered window (tie → lexicographically first lang;
    *    WindowGroupLimit runs the heap map-side);
    *  - readout: the (true lang × predicted lang) confusion matrix over
    *    the HELD-OUT split with id sums, plus per-cell agreement with the
    *    standing stopword heuristic ([[predLangCol]]) — the verdict's
    *    "swap beside the heuristic and report agreement".
    *
    * The oracle replays the whole thing — gram generation, bucket hash,
    * split, quantized training, scoring, argmax — as integer-exact CTEs.
    *
    * Scale shape: feature extraction is one kernel pass; the (doc,
    * bucket) aggregate is map-side-combinable; training reduces to a
    * 320-row table (broadcast); inference adds one broadcast join + one
    * map-side-combinable aggregate + WindowGroupLimit. At 100 TB nothing
    * collects and nothing is quadratic. */
  def qLangidTrain(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val gate = graft.operators.Sampling.gateBelow(col("doc_id").cast("string"), "8")
    val pred = langidPredict(docs.filter(gate), docs.filter(!gate))
    val heur = withLangScores(docs.filter(!gate))
      .withColumn("heur_lang", predLangCol)
      .select(col("doc_id"), col("lang"), col("heur_lang"))
    try {
      heur.join(pred, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
          col("heur_lang"))
        .groupBy("lang", "pred_lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          count_if(col("pred_lang") === col("heur_lang")).as("n_heur_agree"))
        .orderBy("lang", "pred_lang")
    } finally graft.CacheScope.release()
  }

  /** The langid train/predict core — train a TF-ratio centroid model on
    * `train` and label every `test` row; both frames expose (doc_id,
    * lang, text). Returns (doc_id, pred_lang) for every test doc that has
    * at least one feature bucket (callers coalesce the rest to 'und').
    * Factored out so LangidSpec can prove DISCRIMINATION on a crafted
    * multilingual corpus — the driver fixture's documents share one
    * synthetic vocabulary with no real language signal, so accuracy there
    * is chance-level by construction and the oracle verifies machinery,
    * not fixture accuracy. */
  private[graft] def langidPredict(train: DataFrame, test: DataFrame): DataFrame = {
    def feat(df: DataFrame): DataFrame = df
      .select(col("doc_id"), col("lang"),
        explode(graft.plans.SubwordExpressions
          .subwordGramCounts(lower(col("text")), 2, 3)).as(Seq("gram", "gcnt")))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("gram")), 1, 6), 16, 10).cast("long") % 64)
          .as("bucket"),
        col("gcnt"))
      .groupBy("doc_id", "lang", "bucket")
      .agg(sum(col("gcnt")).as("cnt"))
    val byLang = graft.CacheScope.cached(
      feat(train).groupBy("lang", "bucket").agg(sum(col("cnt")).as("bc")))
    val totals = byLang.groupBy("lang").agg(sum(col("bc")).as("t"))
    val gtot = totals.agg(sum(col("t")).as("gt")) // one scalar row
    val gw = byLang.groupBy("bucket").agg(sum(col("bc")).as("gb"))
      .crossJoin(broadcast(gtot))
      .select(col("bucket"),
        greatest(call_function("div", col("gb") * lit(1048576L), col("gt")),
          lit(1L)).as("gw"))
    val weights = byLang.join(totals, Seq("lang")).join(gw, Seq("bucket"))
      .select(col("lang").as("wlang"), col("bucket"),
        call_function("div",
          call_function("div", col("bc") * lit(1048576L), col("t")) * lit(1048576L),
          col("gw")).as("w"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("wlang").asc)
    feat(test).join(broadcast(weights), Seq("bucket"))
      .groupBy("doc_id", "wlang")
      .agg(sum(col("cnt") * col("w")).as("score"))
      .withColumn("rnk", row_number().over(wnd))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("wlang").as("pred_lang"))
  }

  /** Oracle: gram generation (the q_subword_vocab CTE pattern), bucket
    * hash, md5 split, quantized training, broadcast-join scoring, window
    * argmax, and the stopword heuristic — all replayed relationally. */
  lazy val qLangidTrainSql: String =
    s"""WITH ltok AS (
       |  SELECT d.doc_id, d.lang, lower(t.w) AS w
       |  FROM documents d,
       |       unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE length(t.w) >= 2),
       |lgrams AS (
       |  SELECT doc_id, lang, substring(w, s.s, l.l) AS gram
       |  FROM ltok, generate_series(1, 4096) AS s(s), generate_series(2, 3) AS l(l)
       |  WHERE s.s + l.l - 1 <= length(w)),
       |feat AS (
       |  SELECT doc_id, lang,
       |         CAST('0x' || substr(md5(gram), 1, 6) AS BIGINT) % 64 AS bucket,
       |         count(*) AS cnt
       |  FROM lgrams GROUP BY 1, 2, 3),
       |bl AS (
       |  SELECT lang, bucket, CAST(sum(cnt) AS BIGINT) AS bc
       |  FROM feat WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
       |  GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(sum(bc) AS BIGINT) AS t FROM bl GROUP BY 1),
       |gtot AS (SELECT CAST(sum(bc) AS BIGINT) AS gt FROM bl),
       |gwt AS (
       |  SELECT bucket,
       |         greatest(CAST(sum(bc) AS BIGINT) * 1048576 // (SELECT gt FROM gtot), 1) AS gw
       |  FROM bl GROUP BY 1),
       |wts AS (
       |  SELECT bl.lang AS wlang, bl.bucket,
       |         (bl.bc * 1048576 // tot.t) * 1048576 // gwt.gw AS w
       |  FROM bl JOIN tot ON tot.lang = bl.lang
       |  JOIN gwt ON gwt.bucket = bl.bucket),
       |sc AS (
       |  SELECT f.doc_id, w.wlang, CAST(sum(f.cnt * w.w) AS BIGINT) AS score
       |  FROM feat f JOIN wts w ON w.bucket = f.bucket
       |  WHERE NOT substr(md5(CAST(f.doc_id AS VARCHAR)), 1, 1) < '8'
       |  GROUP BY 1, 2),
       |lpred AS (
       |  SELECT doc_id, wlang AS pred_lang FROM sc
       |  QUALIFY row_number() OVER (PARTITION BY doc_id
       |                             ORDER BY score DESC, wlang ASC) = 1),
       |tdocs AS (
       |  SELECT * FROM documents
       |  WHERE NOT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
       |${langScoredSqlCte("tdocs")}
       |SELECT s.lang, coalesce(p.pred_lang, 'und') AS pred_lang,
       |       count(*) AS n_docs, CAST(sum(s.doc_id) AS BIGINT) AS id_sum,
       |       CAST(sum(CASE WHEN coalesce(p.pred_lang, 'und')
       |                       = $predLangSqlExpr THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_heur_agree
       |FROM scored s LEFT JOIN lpred p ON p.doc_id = s.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The quality mix over a `text_stats` struct column — the exact IEEE
    * expression tree of TextFunctions.qualityScore reassembled from the
    * kernel's integer fields (TextStatsSpec pins kernel ≡ columnar
    * field-by-field). Shared by [[qQualityScore]] and the keep-best
    * canonical selection in [[DedupQueries]]; [[qualitySqlExpr]] is the
    * DuckDB twin of this tree. */
  private[graft] def qualityCol(st: Column): Column =
    lit(0.4) * least(st.getField("n_chars").cast("double") / 500d, lit(1d)) +
      lit(0.4) * (st.getField("n_alpha").cast("double") /
        st.getField("n_chars")) +
      lit(0.2) * least(st.getField("hits").getItem(0).cast("double") /
        st.getField("n_tokens").cast("double") * 5d, lit(1d))

  /** Quality scoring: length saturation, alpha ratio, stopword ratio. */
  def qQualityScore(spark: SparkSession, sfDir: String): DataFrame =
    // all four outputs from ONE text_stats kernel pass
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow sort first — see qLangId note
      .select(col("doc_id"), graft.plans.TextStatsExpressions
        .textStats(col("text"), StopwordLists.map(_._2)).as("st"))
      .select(col("doc_id"),
        col("st").getField("n_tokens").as("n_tokens"),
        col("st").getField("n_bpeish").as("n_bpeish_tokens"),
        qualityCol(col("st")).as("quality"))

  /** SQL twin of [[graft.functions.TextFunctions.qualityScore]] —
    * references a `text` column; identical IEEE expression tree. */
  private[queries] val qualitySqlExpr: String = {
    val stop = StopwordLists.head._2.map(w => s"'$w'").mkString(", ")
    s"""0.4 * least(CAST(length(text) AS DOUBLE) / 500, 1.0)
       |  + 0.4 * (CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
       |           / length(text))
       |  + 0.2 * least(CAST((SELECT count(*) FROM unnest(string_split(text,' ')) AS u(tok)
       |                      WHERE tok IN ($stop)) AS DOUBLE)
       |                / len(list_filter(string_split(text,' '), t -> t <> '')) * 5, 1.0)""".stripMargin
  }

  val qQualityScoreSql: String =
    s"""SELECT doc_id,
       |  len(list_filter(string_split(text,' '), t -> t <> '')) AS n_tokens,
       |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpeish_tokens,
       |  $qualitySqlExpr
       |    AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Order-sensitive rolling fingerprint + exact-dup key per doc.
    * Production path is the native `rolling_fingerprint` kernel (one byte
    * pass); `TextFunctions.rollingFingerprint` keeps the columnar HOF fold
    * as the spec-pinned reference (the `aggregate` HOF evaluates its
    * per-token hash chain interpreted — 43.3 s vs 6.8 s at 100×). */
  def qFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow sort first — see qLangId note
      .select(col("doc_id"),
        graft.plans.TextStatsExpressions.rollingFingerprint(col("text"))
          .as("rolling_fp"),
        graft.plans.HashExpressions.md5Hex(col("text")).as("md5_fp"))

  val qFingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_filter(string_split(text,' '), t -> t <> ''),
      |        t -> (length(t) * 1009 + ascii(t) * 31 + ascii(reverse(t))) % 1000000007)),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_fp,
      |  md5(text) AS md5_fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Multimodal plumbing surrogate: opaque binary payload + typed metadata
    * (byte length, content hash) — the schema/partitioning pattern for
    * image/audio columns; real decode lives in graft.multimodal. */
  def qBinaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow sort first — see qLangId note
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"),
        // length() on BinaryType counts bytes (octet_length equivalent)
        length(col("payload")).cast("long").as("n_bytes"),
        graft.plans.HashExpressions.md5Hex(col("payload")).as("content_md5"))

  val qBinaryMetaSql: String =
    """SELECT doc_id,
      |       octet_length(CAST(text AS BLOB)) AS n_bytes,
      |       md5(text) AS content_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TF-IDF top-5 terms per document. Plan shape for corpus scale:
    * tf = one hash agg on (doc, token), CACHED so the df aggregation
    * reads tf's deduplicated keys instead of re-exploding the corpus
    * (Spark has no automatic subplan reuse — without the cache the
    * explode+agg runs twice); the tf⋈df join shuffles on token
    * (vocabulary-sized, not corpus-sized; Spark picks broadcast here,
    * AQE would demote to sort-merge when the vocabulary outgrows it);
    * the per-doc top-k is a WindowGroupLimit — top-5 applied map-side
    * BEFORE the doc_id shuffle. N (corpus size) is a 1-row scalar
    * aggregate over the cached tf, broadcast-cross-joined into the plan —
    * no separate count() action, no extra corpus scan. (N counts docs
    * with ≥1 token — the indexed corpus, matching the oracle's tf-derived
    * count.)
    *
    * Exactness: ranking and output use score_q = floor(tf·idf·2^20)
    * (the repo's fixed-point convention) because ln() is not bit-stable
    * across engines; a 1-ulp idf wobble only flips a floor at a 2^-32
    * boundary coincidence. */
  def qTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val tf = graft.CacheScope.cached(docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf")))
    val nDf = tf.agg(countDistinct(col("doc_id")).as("__n"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_q").desc, col("token").asc)
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDf))
      .withColumn("score_q",
        floor(col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0)
          * 1048576d).cast("long"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("doc_id", "rnk", "token", "tf", "df", "score_q")
      .orderBy("doc_id", "rnk")
  }

  val qTfidfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (
      |  SELECT doc_id, token, count(*) AS tf FROM toks
      |  WHERE token <> '' GROUP BY doc_id, token),
      |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
      |scored AS (
      |  SELECT doc_id, tf.token, tf, df,
      |         CAST(floor(tf * (ln((n + 1.0) / (df + 1.0)) + 1.0) * 1048576) AS BIGINT) AS score_q
      |  FROM tf JOIN dfreq USING (token) CROSS JOIN n),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY score_q DESC, token) AS rnk
      |  FROM scored)
      |SELECT doc_id, rnk, token, tf, df, score_q
      |FROM ranked WHERE rnk <= 5
      |ORDER BY doc_id, rnk""".stripMargin

  /** BM25 term scoring (k1 = 1.2, b = 0.75) — the ranked-retrieval
    * primitive beside [[qTfidf]]: idf damped by document frequency,
    * term frequency saturated by k1, and the doc-length normalization
    * (dl / avgdl) tf-idf lacks. Top-5 terms per doc.
    *
    * Scale shape: identical to tf-idf — ONE cached tf aggregate feeds the
    * df join, the per-doc length aggregate, and the 1-row corpus stats
    * (broadcast); the rank filter plans as WindowGroupLimit. Exactness:
    * both engines evaluate the IDENTICAL expression tree over the same
    * integer inputs; +-*-/ are correctly-rounded IEEE so only ln() can
    * wobble, and the floor(·2^20) quantization absorbs it (the qTfidf
    * convention). */
  def qBm25(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val tf = graft.CacheScope.cached(docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf")))
    val stats = tf.agg(countDistinct(col("doc_id")).as("__n"),
      sum(col("tf")).as("__sumdl"))
    val dls = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_q").desc, col("token").asc)
    tf.join(dfreq, "token")
      .join(dls, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score_q",
        floor(log((col("__n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / (col("__sumdl") / col("__n"))))
          * 1048576d).cast("long"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select("doc_id", "rnk", "token", "tf", "df", "dl", "score_q")
      .orderBy("doc_id", "rnk")
  }

  val qBm25Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
      |tf AS (
      |  SELECT doc_id, token, count(*) AS tf FROM toks
      |  WHERE token <> '' GROUP BY doc_id, token),
      |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
      |stats AS (SELECT count(DISTINCT doc_id) AS n, sum(tf) AS sumdl FROM tf),
      |dls AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
      |scored AS (
      |  SELECT tf.doc_id, tf.token, tf, df, dl,
      |         CAST(floor(ln((n - df + 0.5) / (df + 0.5) + 1.0)
      |                    * (tf * 2.2)
      |                    / (tf + 1.2 * (0.25 + 0.75 * dl / (sumdl / n)))
      |                    * 1048576) AS BIGINT) AS score_q
      |  FROM tf
      |  JOIN dfreq USING (token)
      |  JOIN dls ON dls.doc_id = tf.doc_id
      |  CROSS JOIN stats),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |                               ORDER BY score_q DESC, token) AS rnk
      |  FROM scored)
      |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token, tf, df, dl, score_q
      |FROM ranked WHERE rnk <= 5
      |ORDER BY doc_id, rnk""".stripMargin

  /** Bigram-model corpus scoring — the n-gram-LM quality-filter shape
    * (KenLM-style) every training-data pipeline runs: TRAIN a model over
    * the corpus (bigram → document frequency), then SCORE each document by
    * joining its bigrams back to the model. familiarity = Σ df over the
    * doc's distinct bigrams; n_unique = bigrams seen nowhere else. All
    * counts are integers, so the oracle is exact — no transcendental
    * log-prob needed to pin the plan shape.
    *
    * Scale shape: the model is vocabulary-sized (≪ corpus, Heaps' law), so
    * at 100 TB the score join broadcasts or bucket-joins the model while
    * the corpus-side bigram explode stays narrow; the bigram set is cached
    * because it feeds both the model aggregate and the score join. */
  def qBigramScore(spark: SparkSession, sfDir: String): DataFrame = {
    val bgs = graft.CacheScope.cached(
      graft.operators.Dedup.shingleSets(
        t(spark, sfDir, "documents"), "doc_id", "text", n = 2))
    val model = bgs.groupBy("sh").agg(count(lit(1)).as("df"))
    bgs.join(model, "sh")
      .groupBy(col("id").as("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("df")).as("familiarity"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .orderBy("doc_id")
  }

  val qBigramScoreSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
      |  FROM documents),
      |bgs AS (
      |  SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS bg
      |  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) AS t(i)),
      |model AS (SELECT bg, count(*) AS df FROM bgs GROUP BY bg)
      |SELECT doc_id, count(*) AS n_bigrams,
      |       CAST(sum(df) AS BIGINT) AS familiarity,
      |       CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
      |FROM bgs JOIN model USING (bg)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** LM perplexity quality bucketing (round 15) — the CCNet shape every
    * crawl-curation pipeline runs: TRAIN a smoothed n-gram LM on a
    * reference split, score every held-out document by its per-token
    * surprisal under the model, and bucket the corpus into
    * head/middle/tail at the score tertiles (head = most reference-like).
    * [[qBigramScore]] pins the document-frequency familiarity shape; this
    * query adds the actual conditional-probability LM:
    *
    *  - model: add-one-smoothed bigram conditionals over the md5-gate
    *    train split — c12(w1,w2) bigram counts, c1(w1) = Σ_w2 c12 context
    *    counts, V = distinct continuation types;
    *  - probability, integer-quantized: p_q = ((c12+1)·2^20) div (c1+V),
    *    clamped to ≥ 1 (an unseen context at V > 2^20 would floor to 0);
    *    c12 ≤ c1 and V ≥ 1 bound p_q ≤ 2^20, so p_q ∈ [1, 2^20];
    *  - surprisal in BITS, integer-exact across engines: ⌊log2(p_q)⌋ =
    *    length(bin(p_q)) − 1 — `bin` renders the same no-leading-zeros
    *    binary string in Spark and DuckDB — so s = 21 − length(bin(p_q))
    *    ∈ [0, 20] is −⌈log2(p)⌉ at 1-bit granularity: a monotone integer
    *    proxy of log-perplexity (the bucketing signal; no transcendental
    *    float log enters the hash);
    *  - per-doc score: ppl_q = (Σ s · 2^20) div n_bigrams — mean
    *    bits/bigram in Q20; docs with < 2 tokens have no bigrams and drop
    *    out on both sides;
    *  - buckets: head/middle/tail by the exact 1/3 and 2/3 percentiles of
    *    ppl_q (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    *    q_percentile pin). The exact percentile is the oracle pin; at
    *    100 TB the cutoffs come from `approx_percentile` on a gated
    *    sample — CCNet itself applies cutoffs computed ONCE on a
    *    reference corpus as constants, so the serving plan is a pure
    *    row-local CASE over broadcast thresholds either way.
    *
    * Scale shape: bigram extraction is the narrow all_shingles kernel (no
    * per-doc window shuffle); c12/c1/V are map-side-combinable aggregates
    * over the train stream; scoring is one equi-join on the bigram key
    * (the model shuffles with the corpus — never broadcast; Heaps' law
    * keeps it sublinear in corpus size) plus one on the context key; the
    * threshold row broadcasts. Nothing quadratic, nothing driver-side. */
  def qLmPerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    val Q = 1048576L
    val gate = graft.operators.Sampling
      .gateBelow(col("doc_id").cast("string"), "8")
    val docs = t(spark, sfDir, "documents").select("doc_id", "text")
    val scored = graft.CacheScope.cached(
      lmPerplexityScores(docs.filter(gate), docs.filter(!gate)))
    val cuts = scored.agg(expr(
      "percentile(ppl_q, array(CAST(1 AS DOUBLE)/3, CAST(2 AS DOUBLE)/3))")
      .as("t"))
      .select(col("t").getItem(0).as("t1"), col("t").getItem(1).as("t2"))
    try {
      scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("n_bg"), col("bits"), col("ppl_q"),
          when(col("ppl_q") <= col("t1"), lit("head"))
            .when(col("ppl_q") <= col("t2"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("doc_id")).as("id_sum"),
          min(col("ppl_q")).as("min_ppl_q"),
          max(col("ppl_q")).as("max_ppl_q"),
          sum(col("bits")).as("bits_sum"))
        .orderBy("bucket")
    } finally graft.CacheScope.release()
  }

  /** The LM train/score core — add-one-smoothed quantized bigram
    * conditionals trained on `train`, bit-surprisal scores for every
    * `test` doc with ≥ 1 bigram; both frames expose (doc_id, text).
    * Returns (doc_id, n_bg, bits, ppl_q). Factored out so LmSpec can pin
    * DISCRIMINATION on a crafted corpus (in-model text must score lower
    * surprisal than gibberish) and the hand-computed add-one arithmetic —
    * the driver fixture's oracle verifies machinery, not signal. */
  private[graft] def lmPerplexityScores(train0: DataFrame, test: DataFrame): DataFrame = {
    val Q = 1048576L
    def bigrams(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        explode(graft.plans.ShingleExpressions.allShingles(col("text"), 2))
          .as("bg"))
      .select(col("doc_id"), col("bg"),
        substring_index(col("bg"), " ", 1).as("w1"))
    val train = graft.CacheScope.cached(bigrams(train0))
    val c12 = train.groupBy("bg").agg(count(lit(1)).as("c12"))
    val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = train.select(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(countDistinct(col("w2")).as("v")) // one scalar row
    val pq = greatest(
      call_function("div",
        (coalesce(col("c12"), lit(0L)) + 1L) * lit(Q),
        coalesce(col("c1"), lit(0L)) + col("v")),
      lit(1L))
    bigrams(test)
      .join(c12, Seq("bg"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), (lit(21) - length(bin(pq))).as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bg"), sum(col("s")).as("bits"))
      .select(col("doc_id"), col("n_bg"), col("bits"),
        call_function("div", col("bits") * lit(Q), col("n_bg")).as("ppl_q"))
  }

  /** Oracle: bigram stream, md5 split, add-one-quantized conditionals,
    * bin()-length surprisal, Q20 mean, quantile_cont tertile cutoffs,
    * bucket rollup — all integer-exact except the interpolated cutoffs,
    * which are the q_percentile bit-identical pin. */
  val qLmPerplexitySql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
      |  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 1)) AS g(i)),
      |tr AS (SELECT * FROM bg
      |       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'),
      |c12 AS (SELECT w1, w2, count(*) AS c12 FROM tr GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
      |vv AS (SELECT count(DISTINCT w2) AS v FROM tr),
      |sc AS (
      |  SELECT te.doc_id,
      |         21 - length(bin(greatest(
      |           (coalesce(c12.c12, 0) + 1) * 1048576
      |             // (coalesce(c1.c1, 0) + (SELECT v FROM vv)), 1))) AS s
      |  FROM bg te
      |  LEFT JOIN c12 ON c12.w1 = te.w1 AND c12.w2 = te.w2
      |  LEFT JOIN c1 ON c1.w1 = te.w1
      |  WHERE NOT substr(md5(CAST(te.doc_id AS VARCHAR)), 1, 1) < '8'),
      |doc AS (
      |  SELECT doc_id, count(*) AS n_bg, CAST(sum(s) AS BIGINT) AS bits
      |  FROM sc GROUP BY 1),
      |scored AS (
      |  SELECT doc_id, n_bg, bits, bits * 1048576 // n_bg AS ppl_q FROM doc),
      |th AS (SELECT quantile_cont(ppl_q, CAST(1 AS DOUBLE)/3) AS t1,
      |              quantile_cont(ppl_q, CAST(2 AS DOUBLE)/3) AS t2
      |       FROM scored)
      |SELECT CASE WHEN ppl_q <= (SELECT t1 FROM th) THEN 'head'
      |            WHEN ppl_q <= (SELECT t2 FROM th) THEN 'middle'
      |            ELSE 'tail' END AS bucket,
      |       count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |       CAST(min(ppl_q) AS BIGINT) AS min_ppl_q,
      |       CAST(max(ppl_q) AS BIGINT) AS max_ppl_q,
      |       CAST(sum(bits) AS BIGINT) AS bits_sum
      |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin

  /** Line-level boilerplate removal (round 15) — the C4/RefinedWeb step
    * between extraction and document dedup: a LINE that recurs across
    * many documents (nav menus, cookie banners, copyright footers) is
    * template chrome, not content; drop every line appearing in ≥ K
    * distinct documents and rebuild the page from the survivors in
    * original order. Fixture: multi-line pages synthesized from
    * `documents` with a planted arm per frequency class — a per-site nav
    * header (site = doc_id%40; df ≫ K, removed), a global cookie banner
    * on 2/3 of docs (df ≫ K, removed), the doc's own text (unique,
    * kept), a `promo block` line shared by exactly 2 docs (df = 2 < K,
    * kept — the threshold is two-sided), and a per-site copyright footer
    * on even docs only (df ≈ n/80 ≥ K at every SF, removed). Readout per
    * doc_id%10 bucket: doc count, kept/removed line sums, and the 40-bit
    * md5 checksum of every REBUILT page — the rebuild order (not just
    * the partition) is what hashes.
    *
    * Scale shape: the line explode is narrow; the frequency table is one
    * map-side-combinable aggregate on the line key (at 100 TB the join
    * back is a standard shuffle equi-join on that key — the frequency
    * side is distinct-lines-sized, Heaps-sublinear; never broadcast);
    * the rebuild is a doc-local sort inside one aggregation, bounded by
    * page size. Nothing quadratic, nothing driver-side. */
  def qBoilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val K = 5
    val site = (col("doc_id") % 40).cast("string")
    val page = concat_ws("\n",
      concat(lit("Home | About | Contact site"), site),
      when(col("doc_id") % 3 =!= 2, lit("This website uses cookies")),
      col("text"),
      concat(lit("promo block "), expr("doc_id div 2").cast("string")),
      when(col("doc_id") % 2 === 0, concat(lit("Copyright site"), site)))
    removeBoilerplate(
        t(spark, sfDir, "documents").select(col("doc_id"), page.as("page")), K)
      .groupBy((col("doc_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_kept")).as("kept_lines"),
        sum(col("n_removed")).as("removed_lines"),
        sum(conv(substring(md5(col("clean")), 1, 10), 16, 10).cast("long"))
          .as("checksum"))
      .orderBy("bucket")
  }

  /** The boilerplate-removal core — (doc_id, page) in, per-doc
    * (n_kept, n_removed, clean) out, where `clean` is the page rebuilt
    * from lines appearing in < `k` distinct documents, original order.
    * Factored from [[qBoilerplate]] so BoilerplateSpec can pin the
    * removal decisions and rebuild order on a crafted corpus. */
  private[graft] def removeBoilerplate(pages: DataFrame, k: Int): DataFrame = {
    val lines = graft.CacheScope.cached(
      pages.select(col("doc_id"),
        posexplode(split(col("page"), "\n")).as(Seq("pos", "line"))))
    val freq = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("df"))
    lines.join(freq, "line")
      .withColumn("rm", col("df") >= k)
      .groupBy("doc_id")
      .agg(
        sum(when(!col("rm"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rm"), 1L).otherwise(0L)).as("n_removed"),
        array_join(
          transform(
            array_sort(collect_list(
              when(!col("rm"), struct(col("pos"), col("line"))))),
            x => x.getField("line")), "\n").as("clean"))
  }

  /** Oracle: page synthesis (concat_ws skips the NULL conditional lines
    * in both engines), line explode, distinct-doc frequency, ≥K removal,
    * ordered string_agg rebuild, bucket rollup with rebuilt checksums. */
  val qBoilerplateSql: String =
    """WITH pages AS (
      |  SELECT doc_id, concat_ws(chr(10),
      |    'Home | About | Contact site' || CAST(doc_id % 40 AS VARCHAR),
      |    CASE WHEN doc_id % 3 <> 2 THEN 'This website uses cookies' END,
      |    text,
      |    'promo block ' || CAST(doc_id // 2 AS VARCHAR),
      |    CASE WHEN doc_id % 2 = 0
      |         THEN 'Copyright site' || CAST(doc_id % 40 AS VARCHAR) END) AS page
      |  FROM documents),
      |arr AS (SELECT doc_id, string_split(page, chr(10)) AS a FROM pages),
      |lines AS (
      |  SELECT doc_id, i AS pos, a[i] AS line
      |  FROM arr, LATERAL unnest(generate_series(1, len(a))) AS g(i)),
      |freq AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1),
      |reb AS (
      |  SELECT doc_id,
      |         CAST(sum(CASE WHEN df < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |         CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      |         coalesce(string_agg(line, chr(10) ORDER BY pos)
      |           FILTER (WHERE df < 5), '') AS clean
      |  FROM lines JOIN freq USING (line) GROUP BY 1)
      |SELECT doc_id % 10 AS bucket, count(*) AS n_docs,
      |       CAST(sum(n_kept) AS BIGINT) AS kept_lines,
      |       CAST(sum(n_removed) AS BIGINT) AS removed_lines,
      |       CAST(sum(CAST('0x' || substr(md5(clean), 1, 10) AS BIGINT)) AS BIGINT)
      |         AS checksum
      |FROM reb GROUP BY 1 ORDER BY 1""".stripMargin

  /** Gopher-style repetition filter: per-document duplicate-token stats.
    * Flags documents where more than half the tokens are repeats — the
    * intra-document repetition signal (looping generations, boilerplate)
    * every curation pipeline screens for. All outputs are integers
    * (counts and an integer flag), so the oracle is exact.
    *
    * Scale shape: one narrow explode + two keyed aggregations, both on
    * doc-local keys — the (doc_id, token) partial aggregate combines
    * map-side, so the shuffle carries distinct (doc, token) pairs, not
    * raw tokens. Linear at 100 TB; no global state. */
  def qRepetition(spark: SparkSession, sfDir: String): DataFrame =
    // per-doc stats from the native token_rep_stats kernel — no explode,
    // no aggregation exchange; the n_tokens > 0 filter reproduces the
    // explode shape's drop of zero-token docs (TokenRepStats scaladoc)
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow sort first — see qLangId note
      .select(col("doc_id"),
        graft.plans.TextStatsExpressions.tokenRepStats(col("text")).as("st"))
      .select(col("doc_id"),
        col("st").getField("n_tokens").as("n_tokens"),
        col("st").getField("n_distinct").as("n_distinct"),
        col("st").getField("top_tf").as("top_tf"))
      .filter(col("n_tokens") > 0)
      .withColumn("dup_tokens", col("n_tokens") - col("n_distinct"))
      .withColumn("flagged",
        (col("dup_tokens") * 2 > col("n_tokens")).cast("int"))

  val qRepetitionSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      |  FROM documents),
      |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |       count(*) AS n_distinct, CAST(max(tf) AS BIGINT) AS top_tf,
      |       CAST(sum(tf) - count(*) AS BIGINT) AS dup_tokens,
      |       CAST(CASE WHEN (sum(tf) - count(*)) * 2 > sum(tf) THEN 1 ELSE 0 END AS INT) AS flagged
      |FROM tf GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Benchmark decontamination: flag corpus documents sharing any word
    * 5-gram with a held-out "benchmark" set (docs with doc_id % 7 == 0
    * stand in for an eval suite). This is the n-gram-overlap decontam
    * pass (GPT-3/LLaMA-style, 13-grams in production; 5 here to suit the
    * synthetic vocabulary) that must run over every training corpus.
    *
    * Scale shape: the benchmark n-gram set is eval-suite-sized — tiny
    * relative to the corpus — so it BROADCASTS and the corpus side is one
    * narrow explode + hash-join + per-doc aggregate; the corpus is never
    * shuffled on the n-gram key. Reuses [[graft.operators.Dedup.shingleSets]]
    * so the n-gram definition is shared with the dedup family. */
  def qDecontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = graft.CacheScope.cached(graft.operators.Dedup.shingleSets(
      t(spark, sfDir, "documents"), "doc_id", "text", n = 5))
    val bench = sh.filter(pmod(col("id"), lit(7L)) === 0)
      .select(col("sh")).distinct().withColumn("__hit", lit(1L))
    sh.filter(pmod(col("id"), lit(7L)) =!= 0)
      .join(broadcast(bench), Seq("sh"), "left")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_contaminated"))
      .filter(col("n_contaminated") > 0)
      .orderBy("doc_id")
  }

  val qDecontaminateSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
      |  FROM documents),
      |shg AS (
      |  SELECT DISTINCT doc_id,
      |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4] AS sh
      |  FROM toks, LATERAL unnest(generate_series(1, len(tk) - 4)) AS t(i)),
      |bench AS (SELECT DISTINCT sh FROM shg WHERE doc_id % 7 = 0)
      |SELECT doc_id, count(*) AS n_shingles,
      |       CAST(sum(CASE WHEN sh IN (SELECT sh FROM bench) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      |FROM shg WHERE doc_id % 7 <> 0
      |GROUP BY doc_id HAVING n_contaminated > 0 ORDER BY doc_id""".stripMargin

  /** Sequence packing — the pre-training batch-prep op: concatenate
    * documents in a fixed order and cut into fixed token-capacity packs
    * (capacity 2048 here), reporting per-pack document count, token sum,
    * and id range. A pack's id is the capacity-quotient of its starting
    * token offset, i.e. greedy concat-and-cut, the packing LLM data loaders
    * actually use (not NP-hard bin packing).
    *
    * Token budget is the REAL tokenizer count ([[bpeTokenCount]] under the
    * frozen [[BpeMerges]] table, row-local), not a whitespace proxy — the
    * packer sees the same counts the training loader will.
    *
    * Scale shape: GLOBAL sequential packing is inherently serial, so the
    * corpus is sharded (doc_id % 32 — deterministic, engine-portable) and
    * packed WITHIN shards: the running-offset window partitions by shard,
    * so every shard packs in parallel and state per task is one counter.
    * At 100 TB: more shards, same plan; pack ids are (shard, local pack). */
  def qPackSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val capacity = 2048L
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"),
        bpeTokenCount(col("text")).as("n_tokens"),
        pmod(col("doc_id"), lit(32L)).as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", (col("start_offset") / lit(capacity)).cast("long"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("shard", "pack_id")
  }

  val qPackSequencesSql: String =
    s"""WITH sized AS (
      |  SELECT doc_id,
      |         CAST(${bpeTokenCountSql("text")} AS BIGINT) AS n_tokens,
      |         doc_id % 32 AS shard
      |  FROM documents),
      |offs AS (
      |  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |                                ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
      |  FROM sized)
      |SELECT shard, CAST(start_offset // 2048 AS BIGINT) AS pack_id,
      |       count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM offs
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Context-window chunking — the complement of [[qPackSequences]]: long
    * documents are SPLIT into training-context chunks of 32 tokens with
    * stride 24 (8-token overlap so no boundary context is lost), the
    * standard pre-tokenization pass before sequence packing. Chunk starts
    * are 0, 24, 48, … while they fall inside the doc, so the final chunk
    * may be short but is never empty. Per chunk: token count and the md5
    * of the space-joined chunk text, proving the exact split without
    * dumping text.
    *
    * Scale shape: entirely row-local — the native `chunk_texts` kernel
    * builds each chunk string by byte copy in the scan stage and the
    * posexplode never shuffles; the only exchange is the output sort.
    * The start arithmetic is integer, exact in both engines. */
  def qDocChunk(spark: SparkSession, sfDir: String): DataFrame = {
    val C = 32
    val S = 24
    // chunk strings from the native chunk_texts kernel (token spans
    // collected once, each chunk built by direct byte copy) — the
    // previous transform(sequence, start → concat_ws(slice(...))) shape
    // sliced and re-joined the token array interpreted, once per chunk
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      // range-partition the narrow side, local-sort the exploded rows on
      // the full key: equal doc_ids share a partition, so the order is
      // total and range sampling never re-runs kernel+explode
      .repartitionByRange(col("doc_id"))
      .select(col("doc_id"), graft.plans.TextStatsExpressions
        .chunkTexts(col("text"), C, S).as("st"))
      .filter(col("st").getField("n_tokens") > 0)
      .select(col("doc_id"), col("st").getField("n_tokens").as("n"),
        posexplode(col("st").getField("chunks")).as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        least(col("n") - col("chunk_id") * S, lit(C.toLong)).as("chunk_tokens"),
        graft.plans.HashExpressions.md5Hex(col("chunk_text")).as("chunk_md5"))
      .sortWithinPartitions("doc_id", "chunk_id")
  }

  val qDocChunkSql: String =
    """WITH toked AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents),
      |sized AS (SELECT doc_id, toks, len(toks) AS n FROM toked WHERE len(toks) > 0)
      |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
      |       CAST(least(n - i * 24, 32) AS BIGINT) AS chunk_tokens,
      |       md5(array_to_string(list_slice(toks, i * 24 + 1, least(i * 24 + 32, n)), ' ')) AS chunk_md5
      |FROM sized, LATERAL unnest(generate_series(0, (n - 1) // 24)) AS g(i)
      |ORDER BY doc_id, chunk_id""".stripMargin

  /** Weighted sampling without replacement via deterministic priority
    * sampling ([[graft.operators.Sampling.priorityKey]]): the 100 docs
    * with the highest hash-priority w/u, w = n_chars — i.e. a
    * length-weighted reproducible subsample (longer docs
    * proportionally likelier, every engine picks the IDENTICAL set).
    * Output is the selected docs with their exact integer sort key.
    *
    * Scale shape: the key is row-local; the selection is a top-k
    * (TakeOrderedAndProject: per-partition heaps, k·p driver merge — no
    * corpus shuffle, no global sort). */
  def qWeightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 100
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.operators.Sampling
          .priorityKey(col("doc_id").cast("string"), col("n_chars")).as("skey"))
      .orderBy(col("skey").asc, col("doc_id").asc)
      .limit(k)
      .orderBy("doc_id")
  }

  val qWeightedSampleSql: String =
    """WITH keyed AS (
      |  SELECT doc_id, lang, n_chars,
      |         ((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 10) AS BIGINT) + 1)
      |          * 1048576) // greatest(n_chars, 1) AS skey
      |  FROM documents),
      |sel AS (SELECT * FROM keyed ORDER BY skey ASC, doc_id ASC LIMIT 100)
      |SELECT doc_id, lang, n_chars, skey FROM sel ORDER BY doc_id""".stripMargin

  /** Vocabulary coverage / out-of-vocabulary audit — the tokenizer-prep
    * op: build the top-16 corpus vocabulary (count desc, token asc — a
    * deterministic total order), then score every document's OOV token
    * rate and roll the funnel up per language. (16 < the corpus's 31
    * distinct tokens, so the OOV rate is genuinely exercised.)
    *
    * Scale shape: the vocabulary build is a two-phase token count + bounded
    * top-k (TakeOrderedAndProject); the 16 tokens collect to the driver
    * (constant-size by construction — the IVF-centroid precedent) and
    * return to the scoring scan as an array literal, so OOV marking is
    * row-local: the corpus is scanned twice but token instances are never
    * exploded-and-reshuffled for the join. The final agg is |langs| rows;
    * the rate is quantized floor(·2^20) over an IEEE-exact double division
    * of two BIGINTs. */
  def qVocabOov(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val vocab: Array[String] = docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(16)
      .collect().map(_.getString(0))
    // native oov_stats kernel: token count + vocab miss count in one byte
    // pass, the 16-token vocabulary bound at plan time
    docs.select(col("lang"),
        graft.plans.TextStatsExpressions.oovStats(col("text"), vocab.toSeq).as("st"))
      .select(col("lang"), col("st.n_tokens").as("n_tokens"),
        col("st.n_oov").as("n_oov"))
      .filter(col("n_tokens") > 0)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_oov").as("n_oov"),
        floor(sum("n_oov").cast("double") / sum("n_tokens").cast("double")
          * (1L << 20)).cast("long").as("oov_rate_q20"))
      .orderBy("lang")
  }

  val qVocabOovSql: String =
    """WITH vocab AS (
      |  SELECT token FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> ''
      |  GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 16),
      |toked AS (
      |  SELECT doc_id, lang, list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents),
      |inst AS (
      |  SELECT doc_id, lang, unnest(toks) AS tok FROM toked WHERE len(toks) > 0),
      |per_doc AS (
      |  SELECT doc_id, lang, count(*) AS n_tokens,
      |         sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
      |  FROM inst LEFT JOIN vocab v ON v.token = inst.tok
      |  GROUP BY doc_id, lang)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_oov) AS BIGINT) AS n_oov,
      |       CAST(floor(CAST(sum(n_oov) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE) * 1048576) AS BIGINT) AS oov_rate_q20
      |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin

  /** Gopher-style quality-rule funnel
    * ([[graft.functions.TextFunctions.qualityGates]]): five exact
    * integer/boolean gates (length range, mean word length, alpha-token
    * fraction, stopword floor, type-token ratio) applied CUMULATIVELY, with
    * per-language counts of documents surviving each prefix — the standard
    * rule-based curation report. No floats anywhere (ratios are
    * cross-multiplied), so the funnel is bit-exact in any engine.
    * Thresholds (25 ≤ n ≤ 80, mean word length ∈ [4.3, 4.7]) sit inside
    * the fixture's distribution so every gate genuinely discriminates.
    *
    * Scale shape: every gate is row-local (one scan, no explode); the only
    * exchange is the |langs|-row final aggregate. */
  def qQualityGates(spark: SparkSession, sfDir: String): DataFrame = {
    val gates = graft.functions.TextFunctions.qualityGates(col("toks"),
      minTok = 25L, maxTok = 80L, meanLen10Lo = 43L, meanLen10Hi = 47L)
    val cum = gates.scanLeft(("", lit(true))) { case ((_, acc), (name, g)) =>
      (name.replaceFirst("^g_", "pass_"), acc && g)
    }.tail
    t(spark, sfDir, "documents")
      .select(col("lang"), tokens(col("text")).as("toks"))
      .select(col("lang") +: cum.map { case (n, c) => c.as(n) }: _*)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        cum.map { case (n, _) =>
          sum(when(col(n), 1L).otherwise(0L)).as(n) }: _*)
      .orderBy("lang")
  }

  val qQualityGatesSql: String = {
    val stop = StopwordLists.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
    s"""WITH toked AS (
       |  SELECT lang, list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM documents),
       |ing AS (
       |  SELECT lang, len(tk) AS n,
       |         list_aggregate(list_transform(tk, t -> length(t)), 'sum') AS char_sum,
       |         len(list_filter(tk, t -> regexp_matches(t, '^[a-z]+$$'))) AS alpha_n,
       |         len(list_filter(tk, t -> t IN ($stop))) AS stop_n,
       |         len(list_distinct(tk)) AS distinct_n
       |  FROM toked),
       |gated AS (
       |  SELECT lang,
       |         (n BETWEEN 25 AND 80) AS c1,
       |         (n BETWEEN 25 AND 80) AND (char_sum * 10 >= n * 43 AND char_sum * 10 <= n * 47) AS c2,
       |         (n BETWEEN 25 AND 80) AND (char_sum * 10 >= n * 43 AND char_sum * 10 <= n * 47)
       |           AND (alpha_n * 2 >= n) AS c3,
       |         (n BETWEEN 25 AND 80) AND (char_sum * 10 >= n * 43 AND char_sum * 10 <= n * 47)
       |           AND (alpha_n * 2 >= n) AND (stop_n >= 2) AS c4,
       |         (n BETWEEN 25 AND 80) AND (char_sum * 10 >= n * 43 AND char_sum * 10 <= n * 47)
       |           AND (alpha_n * 2 >= n) AND (stop_n >= 2) AND (distinct_n * 3 >= n) AS c5
       |  FROM ing)
       |SELECT lang, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
       |       CAST(sum(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_wordlen,
       |       CAST(sum(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS pass_alpha,
       |       CAST(sum(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS pass_stop,
       |       CAST(sum(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT) AS pass_ttr
       |FROM gated GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Lateral explode with ordinal position (the UDTF/LATERAL VIEW shape):
    * posexplode keeps each token's offset in the filtered token array.
    * Narrow generate inside the scan stage — row expansion never
    * shuffles; the only exchange is the output sort. */
  def qLateral(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      // range-partition BEFORE the explode: sampling a sort above the
      // Generate would materialize the full token stream twice
      .repartitionByRange(col("doc_id"))
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "token")))
      .withColumn("pos", col("pos").cast("long"))
      .select("doc_id", "pos", "token")
      .sortWithinPartitions("doc_id", "pos")

  val qLateralSql: String =
    """WITH s AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS parts
      |  FROM documents),
      |e AS (SELECT doc_id, parts, unnest(range(len(parts))) AS pos FROM s)
      |SELECT doc_id, pos, parts[pos + 1] AS token
      |FROM e ORDER BY doc_id, pos""".stripMargin

  /** Regex extraction + array-function breadth: all ≥5-letter words per
    * doc via `regexp_extract_all`, then pure array combinators (size /
    * array_distinct / array_sort / slice / concat_ws). Stays narrow — the
    * array never leaves its row, no explode, no shuffle until the output
    * sort. The sort-after-distinct ordering is pinned on both sides
    * because Spark's array_distinct keeps first-occurrence order while
    * DuckDB's list_distinct does not guarantee one. */
  def qRegexArray(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id") // narrow sort first — the regex pass runs once
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("[a-z]{5,}"), lit(0)).as("m"))
      .select(col("doc_id"),
        size(col("m")).as("n_matches"),
        size(array_distinct(col("m"))).as("n_uniq"),
        concat_ws(",", slice(array_sort(array_distinct(col("m"))), 1, 3))
          .as("top3"))

  val qRegexArraySql: String =
    """SELECT doc_id,
      |       len(m) AS n_matches,
      |       len(list_distinct(m)) AS n_uniq,
      |       array_to_string(list_sort(list_distinct(m))[1:3], ',') AS top3
      |FROM (SELECT doc_id, regexp_extract_all(text, '[a-z]{5,}') AS m
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Feature hashing (the hashing trick, HashingTF shape): every token is
    * hashed into one of 32 buckets with the engine-portable polynomial
    * token hash (same family as [[qFingerprint]]), and per-(doc, bucket)
    * counts form the fixed-width sparse feature vector rows ML training
    * consumes. Collisions are the accepted trade — the vector width is
    * constant regardless of vocabulary size, so the op needs no
    * vocabulary build, no dictionary broadcast, and one two-phase
    * aggregation on doc-local keys. */
  def qFeatureHash(spark: SparkSession, sfDir: String): DataFrame =
    // per-(doc, bucket) counts are doc-local: the feature_hist kernel
    // emits each doc's 32-slot histogram in one byte pass (same token
    // hash as the explode form — FeatureHist scaladoc), removing the
    // token explode and both aggregation exchanges; range-partition the
    // narrow side, local-sort the full key (see windowFreqs note)
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .repartitionByRange(col("doc_id"))
      .select(col("doc_id"),
        posexplode(graft.plans.TextStatsExpressions.featureHist(col("text"), 32))
          .as(Seq("bucket", "cnt")))
      .filter(col("cnt") > 0)
      .select(col("doc_id"), col("bucket").cast("long").as("bucket"), col("cnt"))
      .sortWithinPartitions("doc_id", "bucket")

  val qFeatureHashSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
      |  FROM documents)
      |SELECT doc_id,
      |       ((length(t) * 1009 + ascii(t) * 31 + ascii(reverse(t))) % 1000000007) % 32 AS bucket,
      |       count(*) AS cnt
      |FROM toks GROUP BY 1, 2
      |ORDER BY doc_id, bucket""".stripMargin

  /** Fixed integer-quantized weights of the linear quality classifier —
    * drawn once from a pinned seed at plan-build time (the rhPlanesQ
    * convention), so Spark embeds them as literals and the oracle as a
    * VALUES table. In production these are the trained fastText/CCNet
    * coefficients shipped with the pipeline; the INFERENCE shape is
    * identical. */
  private lazy val QcWeights: Array[Long] = {
    val rnd = new scala.util.Random(20250815L)
    Array.fill(64)(math.floor(rnd.nextGaussian() * 1024d).toLong)
  }

  /** Model-based quality filtering (round 12) — the CCNet/fastText-shape
    * LINEAR CLASSIFIER inference stage (Wenzek et al., CCNet; Joulin et
    * al., fastText — public literature): per doc, hashed-ngram features
    * (the [[qFeatureHash]] 64-bucket histogram via the row-local
    * `feature_hist` kernel) dotted with a broadcast integer-quantized
    * weight vector; docs with positive score pass the filter. Readout is
    * the per-lang keep funnel (n_docs, n_kept, exact integer Σscore, kept
    * char mass) — what a pipeline operator watches when tuning the gate.
    *
    * Exactness: features are integer counts, weights are integer literals,
    * so every score is one exact integer dot product — the whole query is
    * hash-oracle-checkable with zero float hazards.
    *
    * Scale shape: feature extraction AND scoring are row-local (one
    * `feature_hist` byte pass + one 64-term integer dot in whole-stage
    * codegen — no token explode, no per-doc aggregation exchange, no
    * vocabulary join); the ONLY shuffle is the |langs|-row funnel
    * aggregate. This is the optimal 100 TB inference shape: a model small
    * enough to ride in the plan scores the corpus in a single map pass. */
  def qQualityClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val w = array(QcWeights.toIndexedSeq.map(lit): _*)
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("n_chars"),
        graft.plans.VectorExpressions.longDot(
          graft.plans.TextStatsExpressions.featureHist(col("text"), 64), w)
          .as("score"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_kept"),
        sum(col("score")).as("sum_score"),
        sum(when(col("score") > 0, col("n_chars").cast("long")).otherwise(0L))
          .as("kept_chars"))
      .orderBy("lang")
  }

  /** Oracle: explode-form feature hashing (the qFeatureHash hash family)
    * joined against the same weights as a VALUES table. */
  lazy val qQualityClassifySql: String = {
    val wRows = QcWeights.zipWithIndex
      .map { case (w, b) => s"($b, $w)" }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
       |  FROM documents),
       |bc AS (
       |  SELECT doc_id,
       |         ((length(t) * 1009 + ascii(t) * 31 + ascii(reverse(t))) % 1000000007) % 64 AS b,
       |         count(*) AS cnt
       |  FROM toks GROUP BY 1, 2),
       |wts(b, w) AS (VALUES $wRows),
       |scores AS (
       |  SELECT doc_id, CAST(sum(cnt * w) AS BIGINT) AS score
       |  FROM bc JOIN wts USING (b) GROUP BY doc_id)
       |SELECT d.lang, count(*) AS n_docs,
       |       CAST(sum(CASE WHEN coalesce(s.score, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(coalesce(s.score, 0)) AS BIGINT) AS sum_score,
       |       CAST(sum(CASE WHEN coalesce(s.score, 0) > 0 THEN d.n_chars ELSE 0 END) AS BIGINT) AS kept_chars
       |FROM documents d LEFT JOIN scores s ON s.doc_id = d.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  /** One exhaustively-optimal decision stump over the 64-bucket hashed
    * features of `sub` (rows must expose y ∈ {1,-1} and `x`): candidates =
    * 64 buckets × thresholds {1,2,3} × polarities, winner = min
    * (train_err, bucket, tau, polOrd). The search is TWO bounded
    * aggregates — one 2-value total, one 64-row per-bucket ge-count
    * table — exactly the histogram-aggregation shape distributed tree
    * trainers (XGBoost/LightGBM) use: candidate stats shuffle, never
    * rows. Returns (bucket, tau, pol, err, n, nPos). */
  private def bestStump64(sub: DataFrame,
                          allowConstant: Boolean): (Int, Int, Int, Long, Long, Long) = {
    val tot = sub.agg(sum(when(col("y") === 1L, 1L).otherwise(0L)).as("np"),
      count(lit(1)).as("n")).collect()(0)
    // read n FIRST: np is a sum, NULL over an empty branch — the count is
    // the well-defined emptiness signal and the require must fire loudly
    // before any NULL unboxing
    val n = tot.getLong(1)
    require(n > 0, "tree branch received no training rows")
    val nPos = tot.getLong(0); val nNeg = n - nPos
    val aggCols = (1 to 3).flatMap { tau => Seq(
      sum(when(col("y") === 1L && col("c") >= tau, 1L).otherwise(0L)).as(s"pg$tau"),
      sum(when(col("y") === -1L && col("c") >= tau, 1L).otherwise(0L)).as(s"ng$tau")) }
    val per = sub.select(col("y"), posexplode(col("x")).as(Seq("b", "c")))
      .filter(col("c") > 0)
      .groupBy("b").agg(aggCols.head, aggCols.tail: _*)
      .collect().map(r => r.getInt(0) ->
        (1 to 3).map(t => (r.getLong((t - 1) * 2 + 1), r.getLong((t - 1) * 2 + 2))).toArray)
      .toMap
    val ord = Ordering.Tuple4(Ordering.Long, Ordering.Int, Ordering.Int, Ordering.Int)
    var best: (Long, Int, Int, Int) = null
    for (b <- 0 until 64; tau <- 1 to 3; polOrd <- 0 to 1) {
      val (pg, ng) = per.get(b).map(_(tau - 1)).getOrElse((0L, 0L))
      // DEGENERATE splits (every row routed one way) are excluded: picking
      // one as the ROOT would starve a branch (the loud require above);
      // as a LEAF verdict they are the constant candidates below
      val nge = pg + ng
      if (nge > 0 && nge < n) {
        val err = if (polOrd == 0) ng + (nPos - pg) else pg + (nNeg - ng)
        val k = (err, b, tau, polOrd)
        if (best == null || ord.lt(k, best)) best = k
      }
    }
    if (allowConstant) {
      // constant verdicts (always-positive / always-negative), encoded as
      // tau = 0 with a b = 64 sentinel so they LOSE error ties to any
      // real split; they make leaf search total even on a pure branch
      for ((polOrd, err) <- Seq((0, nNeg), (1, nPos))) {
        val k = (err, 64, 0, polOrd)
        if (best == null || ord.lt(k, best)) best = k
      }
    }
    require(best != null, "no informative split exists on this corpus")
    (best._2, best._3, if (best._4 == 0) 1 else -1, best._1, n, nPos)
  }

  /** In-engine decision-tree TRAINING (round 12 — the trained-model
    * counterpart of the fixed-weight [[qQualityClassify]] gate): a
    * depth-2 tree is induced by exhaustive greedy search over hashed-
    * feature stumps (bucket, threshold ≤ 3, polarity) to predict a scarce
    * boolean label — "doc mentions the token `spark`" stands in for any
    * human-supplied filter label — on a 75% md5-gated train split, scored
    * on the 25% holdout. The root stump discovers the bucket `spark`
    * hashes into entirely from counts (its residual error IS the hash
    * collision with `merge` — the real-world feature-hashing lesson,
    * measured); leaf stumps refine each branch.
    *
    * Everything is exact integer counting, so the oracle replays the
    * ENTIRE search: candidate error tables, argmin tie rules
    * (err, bucket, tau, polarity), branch routing, and both accuracies.
    *
    * Scale shape: this is the histogram-aggregation trainer — each stump
    * search is one 64-row ge-count aggregate (map-side combined) + a
    * 2-value total; the driver holds three (bucket, tau, pol) triples —
    * bounded model state, the XGBoost/LightGBM split-finding shape. The
    * corpus is never sorted, sampled, or sequentially scanned. */
  def qTreeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val feats = graft.CacheScope.cached(
      graft.Tables.t(spark, sfDir, "documents").select(col("doc_id"),
        // prefix membership, not exact equality: the ScaleUp perturbed
        // fixtures rename every token with a per-replica suffix
        // (spark → spark~3), and the label must stay meaningful there
        when(exists(tokens(col("text")), t => t.startsWith("spark")), 1L)
          .otherwise(-1L).as("y"),
        graft.plans.TextStatsExpressions.featureHist(col("text"), 64).as("x"),
        graft.operators.Sampling.gateBelow(col("doc_id").cast("string"), "c")
          .as("is_train")))
    val train = feats.filter(col("is_train"))
    def ge(b: Int, tau: Int) = element_at(col("x"), b + 1) >= tau.toLong
    // the root must be a REAL split (degenerate candidates excluded), so
    // both branches are guaranteed non-empty; leaves may fall back to a
    // constant verdict (tau = 0) on a pure branch
    val root = bestStump64(train, allowConstant = false)
    val rootCond = ge(root._1, root._2)
    val ls = bestStump64(train.filter(rootCond), allowConstant = true)
    val rs = bestStump64(train.filter(!rootCond), allowConstant = true)
    def leafPred(s: (Int, Int, Int, Long, Long, Long)) =
      if (s._2 == 0) lit(s._3 == 1)
      else if (s._3 == 1) ge(s._1, s._2) else !ge(s._1, s._2)
    val pred = when(rootCond, leafPred(ls)).otherwise(leafPred(rs))
    val acc = feats.groupBy("is_train")
      .agg(count(lit(1)).as("n"),
        sum(when(pred === (col("y") === 1L), 1L).otherwise(0L)).as("ok"))
      .collect().map(r => r.getBoolean(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (trainN, trainOk) = acc(true)
    val (holdN, holdOk) = acc.getOrElse(false, (0L, 0L))
    Seq(("left", ls), ("right", rs), ("root", root)).map { case (node, s) =>
      (node, s._1.toLong, s._2.toLong, s._3.toLong, s._4, s._5, s._6,
        trainN, trainOk, holdN, holdOk)
    }.toDF("node", "bucket", "tau", "pol", "sub_err", "sub_n", "sub_pos",
      "train_n", "train_correct", "holdout_n", "holdout_correct")
      .orderBy("node")
  }

  /** Oracle: the full greedy search replayed — per-branch candidate error
    * tables over (bucket, tau, polarity), argmin by the same total order,
    * branch routing via scalar subqueries on the chosen root, both
    * accuracies. */
  lazy val qTreeTrainSql: String = {
    // candidate-search CTE block over train-subset `src` (doc_id, y),
    // emitting best$sfx (b, tau, pol, err) + tot$sfx (n, np); real
    // candidates exclude degenerate splits (all rows one way), and leaf
    // searches add the two constant verdicts (tau = 0, b = 64 sentinel —
    // loses error ties to any real split), mirroring bestStump64
    def search(sfx: String, src: String, allowConstant: Boolean): String = {
      val constants =
        if (!allowConstant) ""
        else s"""
         |  UNION ALL
         |  SELECT 64 AS b, 0 AS tau, 1 AS pol, (n - np) AS err FROM tot$sfx
         |  UNION ALL
         |  SELECT 64, 0, -1, np FROM tot$sfx""".stripMargin
      s"""tot$sfx AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np
         |  FROM $src),
         |g$sfx AS (
         |  SELECT bc.b,
         |         ${(1 to 3).map(t =>
               s"CAST(sum(CASE WHEN l.y = 1 AND bc.cnt >= $t THEN 1 ELSE 0 END) AS BIGINT) AS pg$t, " +
               s"CAST(sum(CASE WHEN l.y = -1 AND bc.cnt >= $t THEN 1 ELSE 0 END) AS BIGINT) AS ng$t")
             .mkString(",\n         ")}
         |  FROM bc JOIN $src l ON l.doc_id = bc.doc_id
         |  GROUP BY bc.b),
         |cand$sfx AS (
         |  SELECT b, tau, pol, err FROM (
         |    SELECT bb.b, tt.tau, pp.pol,
         |           coalesce(CASE tt.tau WHEN 1 THEN g$sfx.pg1 WHEN 2 THEN g$sfx.pg2 ELSE g$sfx.pg3 END, 0) AS pg,
         |           coalesce(CASE tt.tau WHEN 1 THEN g$sfx.ng1 WHEN 2 THEN g$sfx.ng2 ELSE g$sfx.ng3 END, 0) AS ng,
         |           CASE WHEN pp.pol = 1
         |                THEN coalesce(CASE tt.tau WHEN 1 THEN g$sfx.ng1 WHEN 2 THEN g$sfx.ng2 ELSE g$sfx.ng3 END, 0)
         |                     + (tot$sfx.np - coalesce(CASE tt.tau WHEN 1 THEN g$sfx.pg1 WHEN 2 THEN g$sfx.pg2 ELSE g$sfx.pg3 END, 0))
         |                ELSE coalesce(CASE tt.tau WHEN 1 THEN g$sfx.pg1 WHEN 2 THEN g$sfx.pg2 ELSE g$sfx.pg3 END, 0)
         |                     + ((tot$sfx.n - tot$sfx.np) - coalesce(CASE tt.tau WHEN 1 THEN g$sfx.ng1 WHEN 2 THEN g$sfx.ng2 ELSE g$sfx.ng3 END, 0))
         |           END AS err,
         |           tot$sfx.n AS tot_n
         |    FROM range(0, 64) bb(b)
         |    CROSS JOIN (VALUES (1), (2), (3)) tt(tau)
         |    CROSS JOIN (VALUES (1), (-1)) pp(pol)
         |    LEFT JOIN g$sfx ON g$sfx.b = bb.b
         |    CROSS JOIN tot$sfx)
         |  WHERE pg + ng > 0 AND pg + ng < tot_n$constants),
         |best$sfx AS (
         |  SELECT b, tau, pol, err FROM cand$sfx
         |  ORDER BY err, b, tau, CASE WHEN pol = 1 THEN 0 ELSE 1 END
         |  LIMIT 1)""".stripMargin
    }
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
       |  FROM documents),
       |bc AS (
       |  SELECT doc_id,
       |         ((length(t) * 1009 + ascii(t) * 31 + ascii(reverse(t))) % 1000000007) % 64 AS b,
       |         count(*) AS cnt
       |  FROM toks GROUP BY 1, 2),
       |lab AS (
       |  SELECT d.doc_id,
       |         CASE WHEN EXISTS (SELECT 1 FROM toks
       |                           WHERE toks.doc_id = d.doc_id
       |                           AND toks.t LIKE 'spark%')
       |              THEN 1 ELSE -1 END AS y,
       |         substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) < 'c' AS is_train
       |  FROM documents d),
       |trn AS (SELECT doc_id, y FROM lab WHERE is_train),
       |${search("R", "trn", allowConstant = false)},
       |rv AS (
       |  SELECT l.doc_id, l.y, l.is_train,
       |         coalesce((SELECT cnt FROM bc WHERE bc.doc_id = l.doc_id
       |                   AND bc.b = (SELECT b FROM bestR)), 0) AS xr
       |  FROM lab l),
       |trnL AS (SELECT doc_id, y FROM rv WHERE is_train AND xr >= (SELECT tau FROM bestR)),
       |trnG AS (SELECT doc_id, y FROM rv WHERE is_train AND xr < (SELECT tau FROM bestR)),
       |${search("L", "trnL", allowConstant = true)},
       |${search("G", "trnG", allowConstant = true)},
       |pv AS (
       |  SELECT rv.doc_id, rv.y, rv.is_train, rv.xr,
       |         coalesce((SELECT cnt FROM bc WHERE bc.doc_id = rv.doc_id
       |                   AND bc.b = (SELECT b FROM bestL)), 0) AS xl,
       |         coalesce((SELECT cnt FROM bc WHERE bc.doc_id = rv.doc_id
       |                   AND bc.b = (SELECT b FROM bestG)), 0) AS xg
       |  FROM rv),
       |pred AS (
       |  SELECT doc_id, y, is_train,
       |         CASE WHEN xr >= (SELECT tau FROM bestR)
       |              THEN CASE WHEN (SELECT tau FROM bestL) = 0
       |                        THEN (SELECT pol FROM bestL) = 1
       |                        WHEN (SELECT pol FROM bestL) = 1
       |                        THEN xl >= (SELECT tau FROM bestL)
       |                        ELSE xl < (SELECT tau FROM bestL) END
       |              ELSE CASE WHEN (SELECT tau FROM bestG) = 0
       |                        THEN (SELECT pol FROM bestG) = 1
       |                        WHEN (SELECT pol FROM bestG) = 1
       |                        THEN xg >= (SELECT tau FROM bestG)
       |                        ELSE xg < (SELECT tau FROM bestG) END
       |         END AS p
       |  FROM pv),
       |acc AS (
       |  SELECT CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT) AS train_n,
       |         CAST(sum(CASE WHEN is_train AND p = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS train_correct,
       |         CAST(sum(CASE WHEN NOT is_train THEN 1 ELSE 0 END) AS BIGINT) AS holdout_n,
       |         CAST(sum(CASE WHEN NOT is_train AND p = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS holdout_correct
       |  FROM pred),
       |nodes AS (
       |  SELECT 'root' AS node, CAST(b AS BIGINT) AS bucket, CAST(tau AS BIGINT) AS tau,
       |         CAST(pol AS BIGINT) AS pol, CAST(err AS BIGINT) AS sub_err,
       |         (SELECT CAST(n AS BIGINT) FROM totR) AS sub_n,
       |         (SELECT np FROM totR) AS sub_pos
       |  FROM bestR
       |  UNION ALL
       |  SELECT 'left', CAST(b AS BIGINT), CAST(tau AS BIGINT), CAST(pol AS BIGINT),
       |         CAST(err AS BIGINT),
       |         (SELECT CAST(n AS BIGINT) FROM totL), (SELECT np FROM totL)
       |  FROM bestL
       |  UNION ALL
       |  SELECT 'right', CAST(b AS BIGINT), CAST(tau AS BIGINT), CAST(pol AS BIGINT),
       |         CAST(err AS BIGINT),
       |         (SELECT CAST(n AS BIGINT) FROM totG), (SELECT np FROM totG)
       |  FROM bestG)
       |SELECT n.node, n.bucket, n.tau, n.pol, n.sub_err, n.sub_n, n.sub_pos,
       |       a.train_n, a.train_correct, a.holdout_n, a.holdout_correct
       |FROM nodes n CROSS JOIN acc a
       |ORDER BY n.node""".stripMargin
  }

  /** Deterministic 5-fold assignment ([[graft.operators.Sampling
    * .foldAssign]]) with per-(fold, lang) balance stats — the
    * cross-validation / sharded-eval split where membership is decided by
    * content hash, never by row order, so every engine and every rerun
    * produces the same folds. The balance table is what a pipeline checks
    * before trusting a split. */
  def qKfold(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("n_chars"),
        graft.operators.Sampling
          .foldAssign(col("doc_id").cast("string"), 5).as("fold"))
      .groupBy("fold", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("fold", "lang")

  val qKfoldSql: String =
    """SELECT CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS fold,
      |       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents GROUP BY 1, 2
      |ORDER BY fold, lang""".stripMargin

  /** Temperature (α=0.5) source rebalancing — the multilingual corpus-mix
    * op: over-represented sources are down-sampled toward the rarest
    * source at rate sqrt(n_min/n_s), membership decided per row by a
    * 20-bit content-hash uniform against the quantized rate. Readout is
    * per-source (n_docs, rate_q, n_kept, kept_chars), proving the exact
    * sampled SUBSET matches (kept counts + kept char mass), not just the
    * rates. Bit-exact across engines: the rate is one correctly-rounded
    * division + one correctly-rounded sqrt + an exact 2^20 scale (why α
    * is pinned to 0.5 — see `Sampling.temperatureRates`).
    *
    * Scale shape: tiny counts agg (|sources| rows) broadcast back; gate
    * is row-local; one corpus scan for counts + one for the readout. */
  def qTemperatureSample(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val rates = graft.operators.Sampling.temperatureRates(docs, "source")
    val kept = graft.operators.Sampling
      .hashUniform20(col("doc_id").cast("string")) < col("rate_q")
    docs.join(broadcast(rates.withColumnRenamed("n_rows", "n_docs")), "source")
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"), max(col("rate_q")).as("rate_q"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        sum(when(kept, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy("source")
  }

  val qTemperatureSampleSql: String =
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
      |m AS (SELECT min(n_docs) AS n_min FROM c),
      |r AS (SELECT source, n_docs,
      |        CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs) * 1048576) AS BIGINT) AS rate_q
      |      FROM c CROSS JOIN m)
      |SELECT r.source, r.n_docs, r.rate_q,
      |       CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5)) AS BIGINT) < rate_q
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5)) AS BIGINT) < rate_q
      |                     THEN d.n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM documents d JOIN r ON d.source = r.source
      |GROUP BY r.source, r.n_docs, r.rate_q
      |ORDER BY r.source""".stripMargin

  /** Deterministic frame-window sampling over opaque binary payloads —
    * the second multimodal plumbing query beside [[qBinaryMeta]]: the
    * payload is cut into 256-byte frames, the first 16 bytes of up to 8
    * evenly-placed frames concatenate into a sample whose md5 the oracle
    * reproduces. This is the video/audio "sample k frames, fingerprint
    * them" access pattern with the codec abstracted away: all byte
    * slicing happens ON BinaryType row-locally (no decode, no explode,
    * no shuffle); `graft.multimodal.Multimodal` owns the real decoder
    * shape. The oracle slices the same bytes as VARCHAR (ASCII payloads
    * make the byte sequences identical). */
  def qFrameSample(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("n_frames", greatest(lit(1L), expr("n_bytes DIV 256")))
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        md5(expr(
          """aggregate(
            |  transform(sequence(0L, least(n_frames - 1, 7L)),
            |            i -> substring(payload, int(i * 256 + 1), 16)),
            |  cast('' as binary),
            |  (acc, x) -> concat(acc, x))""".stripMargin)).as("sample_md5"))
      .orderBy("doc_id")

  val qFrameSampleSql: String =
    """WITH f AS (
      |  SELECT doc_id, length(text) AS n_bytes,
      |         greatest(1, length(text) // 256) AS n_frames, text
      |  FROM documents)
      |SELECT doc_id, n_bytes, n_frames,
      |       md5(list_reduce(
      |         list_prepend('', list_transform(
      |           generate_series(0, CAST(least(n_frames - 1, 7) AS BIGINT)),
      |           i -> substring(text, CAST(i * 256 + 1 AS INTEGER), 16))),
      |         (a, b) -> a || b)) AS sample_md5
      |FROM f ORDER BY doc_id""".stripMargin

  /** Mojibake suffixes planted by [[qFixEncoding]] and their repaired
    * forms — each arm a distinct corruption class of the classic
    * UTF-8-decoded-as-Windows-1252 failure. Written with unicode escapes
    * so the source file stays ASCII-stable. */
  private val MojiArms: Seq[(String, String, Long)] = Seq(
    // (raw suffix, fixed suffix, repaired runs)
    ("", "", 0L),                                       // arm 0: clean
    (" cafÃ© menu", " café menu", 1L),   // Ã© → é
    (" â€œsmartâ€ quotes",
      " “smart” quotes", 2L),                 // â€œ/â€(9D) → “ ”
    (" naÃ¯ve rÃ©sumÃ© â€” ok",
      " naïve résumé — ok", 4L))    // ï é é + em dash

  /** Encoding repair (round 14) — the ftfy-shape mojibake fix
    * ([[graft.plans.FixEncoding]]): crawl text frequently arrives as
    * UTF-8 that was decoded with Windows-1252 and re-encoded (`é` →
    * `Ã©`, `—` → `â€”`); the kernel inverse-maps sloppy-CP1252 runs and
    * rewrites only runs whose bytes are strictly valid multi-byte UTF-8,
    * so genuine accented text is untouched (a lone `é` is an invalid
    * UTF-8 lead on its own). Fixture: the ASCII corpus plus a planted
    * corruption arm per doc_id%4 ([[MojiArms]] — Latin-1-block pairs,
    * CP1252-remapped quotes incl. the unmapped 0x9D control, and a mixed
    * accents+em-dash arm). Readout per lang: docs, repaired docs, run
    * count, char shrinkage, md5 checksum of the REPAIRED text — the
    * oracle builds raw and fixed forms from the same literals, so the
    * checksum pins the exact rewrite. Row-local one-pass kernel; only
    * the lang aggregate exchanges. */
  def qFixEncoding(spark: SparkSession, sfDir: String): DataFrame = {
    val arm = (col("doc_id") % 4).cast("int")
    val sfx = MojiArms.zipWithIndex.tail.foldLeft(lit(MojiArms.head._1)) {
      case (acc, ((raw, _, _), i)) => when(arm === i, lit(raw)).otherwise(acc)
    }
    val fixed = graft.plans.EncodingExpressions.fixEncoding(
      concat(col("text"), sfx))
    t(spark, sfDir, "documents")
      .select(col("lang"), col("doc_id"), col("text"))
      .withColumn("raw_len", length(concat(col("text"), sfx)).cast("long"))
      .withColumn("f", fixed)
      .select(col("lang"),
        col("f.fixed").as("fixed"), col("f.n_runs").as("n_runs"),
        (col("raw_len") - length(col("f.fixed"))).as("delta"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_runs") > 0L, 1L).otherwise(0L)).as("repaired_docs"),
        sum(col("n_runs")).as("n_runs"),
        sum(col("delta")).as("char_delta"),
        sum(conv(graft.plans.HashExpressions.md5Prefix(col("fixed"), 10), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("lang")
  }

  /** Oracle: raw/fixed suffixes as SQL literals (non-ASCII and control
    * chars via chr()), counts and checksums recomputed from the fixed
    * form directly. */
  lazy val qFixEncodingSql: String = {
    def sqlLit(s: String): String =
      if (s.isEmpty) "''"
      else s.map { c =>
        if (c >= ' ' && c <= '~' && c != '\'') s"'$c'" else s"chr(${c.toInt})"
      }.reduce((a, b) => a + " || " + b) match {
        case e => s"($e)"
      }
    val rawCase = MojiArms.zipWithIndex.map { case ((raw, _, _), i) =>
      s"WHEN ${i} THEN ${sqlLit(raw)}"
    }.mkString(" ")
    val fixCase = MojiArms.zipWithIndex.map { case ((_, fx, _), i) =>
      s"WHEN ${i} THEN ${sqlLit(fx)}"
    }.mkString(" ")
    val runCase = MojiArms.zipWithIndex.map { case ((_, _, r), i) =>
      s"WHEN ${i} THEN $r"
    }.mkString(" ")
    s"""WITH m AS (
       |  SELECT lang,
       |         text || CASE CAST(doc_id % 4 AS INTEGER) $rawCase END AS raw,
       |         text || CASE CAST(doc_id % 4 AS INTEGER) $fixCase END AS fixed,
       |         CAST(CASE CAST(doc_id % 4 AS INTEGER) $runCase END AS BIGINT) AS n_runs
       |  FROM documents)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN n_runs > 0 THEN 1 ELSE 0 END) AS BIGINT) AS repaired_docs,
       |  CAST(sum(n_runs) AS BIGINT) AS n_runs,
       |  CAST(sum(length(raw) - length(fixed)) AS BIGINT) AS char_delta,
       |  CAST(sum(CAST('0x' || substr(md5(fixed), 1, 10) AS BIGINT)) AS BIGINT) AS checksum
       |FROM m GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Decomposed-suffix arms planted by [[qUnicodeNfc]]: combining-mark
    * sequences (NOT in NFC) that canonical composition must collapse. */
  private val NfcArms: Seq[String] = Seq(
    "",                                   // arm 0: clean ASCII (already NFC)
    " café plan",                   // e + COMBINING ACUTE → é
    " Ångström units")        // A + RING → Å, o + DIAERESIS → ö

  /** Unicode NFC normalization (round 14) — the canonical-composition
    * pass every tokenizer-bound corpus runs ([[graft.plans.NfcNormalize]]):
    * `e`+COMBINING ACUTE and `é` are different byte sequences for the
    * same text, fragmenting vocab statistics, dedup keys and exact-match
    * decontamination. The kernel normalizes via the JDK's UAX #15
    * implementation with an isNormalized fast path; DuckDB's
    * `nfc_normalize` implements the same standard, so the oracle replays
    * the normalization itself — a genuine two-engine pin of the Unicode
    * algorithm, not a literal replay. Readout per lang: docs, changed
    * docs (corpus-health metric), char shrinkage, checksum of the
    * normalized text. Row-local one pass; only the lang agg exchanges. */
  def qUnicodeNfc(spark: SparkSession, sfDir: String): DataFrame = {
    val arm = (col("doc_id") % 3).cast("int")
    val sfx = NfcArms.zipWithIndex.tail.foldLeft(lit(NfcArms.head)) {
      case (acc, (raw, i)) => when(arm === i, lit(raw)).otherwise(acc)
    }
    val raw = concat(col("text"), sfx)
    t(spark, sfDir, "documents")
      .select(col("lang"), length(raw).cast("long").as("raw_len"),
        graft.plans.NormalizeExpressions.nfcNormalize(raw).as("n"))
      .select(col("lang"), col("raw_len"),
        col("n.normalized").as("norm"), col("n.changed").as("changed"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("changed")).as("changed_docs"),
        sum(col("raw_len") - length(col("norm"))).as("char_delta"),
        sum(conv(graft.plans.HashExpressions.md5Prefix(col("norm"), 10), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("lang")
  }

  /** Oracle: the raw suffixes as chr() literals, normalization via
    * DuckDB's own nfc_normalize, changed derived as raw <> normalized. */
  lazy val qUnicodeNfcSql: String = {
    def sqlLit(s: String): String =
      if (s.isEmpty) "''"
      else "(" + s.map { c =>
        if (c >= ' ' && c <= '~' && c != '\'') s"'$c'" else s"chr(${c.toInt})"
      }.reduce((a, b) => a + " || " + b) + ")"
    val rawCase = NfcArms.zipWithIndex.map { case (raw, i) =>
      s"WHEN $i THEN ${sqlLit(raw)}"
    }.mkString(" ")
    s"""WITH m AS (
       |  SELECT lang,
       |         text || CASE CAST(doc_id % 3 AS INTEGER) $rawCase END AS raw
       |  FROM documents),
       |n AS (SELECT lang, raw, nfc_normalize(raw) AS norm FROM m)
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN norm <> raw THEN 1 ELSE 0 END) AS BIGINT) AS changed_docs,
       |  CAST(sum(length(raw) - length(norm)) AS BIGINT) AS char_delta,
       |  CAST(sum(CAST('0x' || substr(md5(norm), 1, 10) AS BIGINT)) AS BIGINT) AS checksum
       |FROM n GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Sentence segmentation (round 14) — the alignment/bitext prep step
    * ([[graft.functions.TextFunctions.sentences]]): boundaries at
    * `[.!?]` + space with abbreviation guarding (mask → mark → split →
    * unmask, every step a codegen'd built-in both engines replay). The
    * corpus has no sentence structure, so the fixture BUILDS it
    * deterministically: every 6th token gets a terminator cycling
    * `. / ! / ?`, and a `Dr. final check done.` tail plants the
    * abbreviation hazard — `Dr.` must NOT split even though `. ` is the
    * boundary pattern. Readout per lang: docs, sentences, sentence char
    * mass, and the md5 checksum of the `|`-joined sentence list (order
    * and content both pinned).
    *
    * Scale shape: construction + segmentation are one row-local pass
    * (regexp_replace is natively code-generated); no explode — the
    * sentence array is aggregated per row; only the lang aggregate
    * exchanges. */
  def qSentenceSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions
    val toks = TextFunctions.tokens(col("text"))
    val pieces = transform(toks, (t, i0) => {
      val p = i0 + 1
      concat(t, when(p % 6 === 0,
        element_at(array(lit(". "), lit("! "), lit("? ")),
          ((p / 6 - 1) % 3 + 1).cast("int")))
        .otherwise(lit(" ")))
    })
    val built = concat(array_join(pieces, ""), lit("Dr. final check done."))
    val sents = TextFunctions.sentences(built)
    t(spark, sfDir, "documents")
      .select(col("lang"), sents.as("s"))
      .select(col("lang"),
        size(col("s")).cast("long").as("n_sent"),
        aggregate(transform(col("s"), x => length(x).cast("long")),
          lit(0L), (a, x) => a + x).as("sent_chars"),
        conv(graft.plans.HashExpressions.md5Prefix(
          array_join(col("s"), "|"), 10), 16, 10).cast("long").as("ck"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sent")).as("n_sentences"),
        sum(col("sent_chars")).as("sent_chars"),
        sum(col("ck")).as("checksum"))
      .orderBy("lang")
  }

  /** Oracle: sentence construction via ordered string_agg over the token
    * index, then the identical mask → mark → split → unmask chain (the
    * fixture can only contain the `Dr. ` abbreviation — tokens are
    * lowercase alpha — so the guard replay is that one literal; the full
    * guard list is unit-pinned in TextFunctionsSpec). */
  val qSentenceSplitSql: String =
    """WITH dt AS (
      |  SELECT doc_id, lang,
      |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
      |  FROM documents),
      |stoks AS (
      |  SELECT doc_id, lang, i, toks[i] AS tok
      |  FROM dt, LATERAL unnest(generate_series(1, len(toks))) AS t(i)),
      |pieces AS (
      |  SELECT doc_id, lang, i,
      |         tok || CASE WHEN i % 6 = 0
      |                     THEN CASE ((i // 6 - 1) % 3)
      |                          WHEN 0 THEN '. ' WHEN 1 THEN '! ' ELSE '? ' END
      |                     ELSE ' ' END AS piece
      |  FROM stoks),
      |built AS (
      |  SELECT doc_id, lang,
      |         string_agg(piece, '' ORDER BY i) || 'Dr. final check done.' AS whole
      |  FROM pieces GROUP BY doc_id, lang),
      |seg AS (
      |  SELECT doc_id, lang,
      |         list_transform(
      |           string_split(
      |             regexp_replace(
      |               replace(whole, 'Dr. ', 'Dr' || chr(2) || ' '),
      |               '([.!?]) ', '\1' || chr(1), 'g'),
      |             chr(1)),
      |           s -> replace(s, chr(2), '.')) AS sents
      |  FROM built),
      |per AS (
      |  SELECT doc_id, lang,
      |         len(sents) AS n_sent,
      |         coalesce(list_aggregate(list_transform(sents, s -> length(s)), 'sum'), 0) AS sent_chars,
      |         CAST('0x' || substr(md5(array_to_string(sents, '|')), 1, 10) AS BIGINT) AS ck
      |  FROM seg)
      |SELECT lang, count(*) AS n_docs,
      |       CAST(sum(n_sent) AS BIGINT) AS n_sentences,
      |       CAST(sum(sent_chars) AS BIGINT) AS sent_chars,
      |       CAST(sum(ck) AS BIGINT) AS checksum
      |FROM per GROUP BY lang ORDER BY lang""".stripMargin

  /** PII redaction under the oracle gate, via the native
    * [[graft.plans.PiiRedact]] kernel (the regex reference implementation
    * is [[graft.operators.Redact.scrub]]; RedactKernelSpec pins the two
    * equal). The synthetic corpus carries no organic PII, so the fixture
    * injects it deterministically from doc_id — every third doc an email,
    * every fourth a phone, every fifth a 9-digit account number — making
    * all three class counts and the rewritten bytes non-trivial. The
    * md5 of the redacted text proves the EXACT rewrite (replacement
    * order, token spelling, untouched surroundings) byte-for-byte against
    * DuckDB's RE2 — see the operator scaladoc for why the pattern subset
    * is engine-portable. Row-local throughout: one scan, no shuffle
    * before the output sort. */
  def qPiiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val id = col("doc_id")
    val withPii = t(spark, sfDir, "documents").withColumn("text",
      concat(col("text"),
        when(id % 3 === 0,
          concat(lit(" contact user"), id.cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(id % 4 === 0,
          concat(lit(" call 555-"), lpad((id % 1000).cast("string"), 3, "0"),
            lit("-"), lpad((id % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(id % 5 === 0,
          // (id%1e9)² ≡ id² (mod 1e9) and stays < 2^60 — raw id² ANSI-
          // overflows long at the 10-digit ids of the 1000× fixture (the
          // q_ann_ivf seeding-hash precedent); a no-op at oracle SFs
          concat(lit(" acct "), lpad((((id % 1000000000L) * (id % 1000000000L))
            % 1000000000L).cast("string"), 9, "0")))
          .otherwise(lit(""))))
    withPii
      .select(id, col("text"))
      .orderBy("doc_id") // sort the injected-but-unredacted rows first
      .withColumn("r", graft.plans.RedactExpressions.piiRedact(col("text")))
      .select(id, col("r.n_emails").as("n_emails"),
        col("r.n_phones").as("n_phones"), col("r.n_ids").as("n_ids"),
        length(col("r.redacted")).as("red_len"),
        graft.plans.HashExpressions.md5Hex(col("r.redacted")).as("red_md5"))
  }

  val qPiiRedactSql: String =
    """WITH pii AS (
      |  SELECT doc_id,
      |    text
      |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
      |    || CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
      |            || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN ' acct ' || lpad(CAST(((doc_id % 1000000000) * (doc_id % 1000000000)) % 1000000000 AS VARCHAR), 9, '0') ELSE '' END AS t
      |  FROM documents),
      |s1 AS (
      |  SELECT doc_id, len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
      |         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
      |  FROM pii),
      |s2 AS (
      |  SELECT doc_id, n_emails,
      |         len(regexp_extract_all(t, '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phones,
      |         regexp_replace(t, '\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS t
      |  FROM s1),
      |s3 AS (
      |  SELECT doc_id, n_emails, n_phones,
      |         len(regexp_extract_all(t, '[0-9]{9,}')) AS n_ids,
      |         regexp_replace(t, '[0-9]{9,}', '<ID>', 'g') AS t
      |  FROM s2)
      |SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
      |       CAST(n_phones AS BIGINT) AS n_phones, CAST(n_ids AS BIGINT) AS n_ids,
      |       length(t) AS red_len, md5(t) AS red_md5
      |FROM s3 ORDER BY doc_id""".stripMargin

  /** The REAL image codec under the oracle: for each document a 48×32
    * grayscale PNG is generated in-executor (pixel v = (doc_id·31 + i·7)
    * mod 256 — pure integer arithmetic, so DuckDB can rebuild the exact
    * pixel grid), ENCODED with javax.imageio, then DECODED back through
    * [[graft.multimodal.Multimodal.ImageIoDecoder]] — dims off the real
    * raster, 16-dim block-luminance embedding off the real pixels. PNG
    * truecolor is lossless, so the oracle recomputes the embedding
    * directly from the generator arithmetic: any codec bug (chroma shift,
    * row padding, color management) breaks the hash.
    *
    * Bit-exactness: the luminance expression, the /255 per-term division,
    * and both sequential accumulation orders (pixel order within a block,
    * block order for the overall mean) are written identically in the
    * oracle via ordered `list_reduce`; the double→float narrowing is
    * CAST(… AS REAL); the final ·2^20 quantization is an EXACT power-of-
    * two scaling of a float value, so floor never sits on a rounding
    * boundary. Scale shape: one narrow `mapPartitions` encode→decode pass
    * (decoder init amortized per partition, payloads never touch the
    * driver) + a row-local posexplode — only the output sort exchanges. */
  def qImageEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val W = 48; val H = 32
    // the id scan is a narrow single-column read — 1-2 partitions at small
    // SFs — but the codec stage downstream is the expensive part, so fan
    // the (8-byte) ids out to full parallelism BEFORE encode/decode;
    // at 100 TB the media scan itself supplies the partitions and this
    // becomes a no-op-sized shuffle
    val ids = t(spark, sfDir, "documents").select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
    val media = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        graft.multimodal.Multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Multimodal.synthPng(id, W, H))
      }
    }
    graft.multimodal.Multimodal
      .extractFeatures(media, graft.multimodal.Multimodal.ImageIoDecoder)
      .toDF()
      .select(col("media_id").as("doc_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        posexplode(col("embedding")).as(Seq("block", "e")))
      .select(col("doc_id"), col("width"), col("height"),
        col("block").cast("long").as("block"),
        floor(col("e").cast("double") * 1048576).cast("long").as("q_lum"))
      .orderBy("doc_id", "block")
  }

  /** Oracle: the embedding recomputed from the pixel-generator arithmetic
    * (no codec) — block sums folded in pixel order, block means folded in
    * block order, float narrowing and exact 2^20 quantization mirrored. */
  val qImageEmbedSql: String =
    """WITH px AS (
      |  SELECT d.doc_id, g.i,
      |         ((d.doc_id * 31 + g.i * 7) % 256) AS v,
      |         ((g.i // 48) // 8) * 4 + ((g.i % 48) // 12) AS b
      |  FROM documents d, generate_series(0, 1535) AS g(i)),
      |terms AS (
      |  SELECT doc_id, b, i,
      |         (0.299 * v + 0.587 * v + 0.114 * v) / 255.0 AS t
      |  FROM px),
      |sums AS (
      |  SELECT doc_id, b,
      |         list_reduce(list(t ORDER BY i), (a, x) -> a + x) AS s
      |  FROM terms GROUP BY doc_id, b),
      |means AS (
      |  SELECT doc_id, b, s / 96 AS m FROM sums),
      |ov AS (
      |  SELECT doc_id,
      |         list_reduce(list(m ORDER BY b), (a, x) -> a + x) / 16.0 AS o
      |  FROM means GROUP BY doc_id)
      |SELECT m.doc_id,
      |       CAST(48 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height,
      |       CAST(m.b AS BIGINT) AS block,
      |       CAST(floor(CAST(CAST(m.m - ov.o AS REAL) AS DOUBLE) * 1048576) AS BIGINT) AS q_lum
      |FROM means m JOIN ov USING (doc_id)
      |ORDER BY doc_id, block""".stripMargin

  /** Perceptual image near-dup pairs (round 12, VERDICT r11 item 5) — the
    * multimodal dedup composition end to end: a REAL PNG encode→decode
    * round-trip per document, a 56-bit perceptual dHash off the decoded
    * raster ([[graft.multimodal.Multimodal.dhash56Raster]]), and the SAME
    * Hamming-banded LSH pair machinery text SimHash uses
    * ([[graft.operators.Dedup.hammingPairsFromHashes]], 4×14-bit bands +
    * exact `bit_count(xor)` ≤ 4).
    *
    * The fixture PLANTS near-dup structure the q_image_embed way (pure
    * integer pixel arithmetic, so DuckDB rebuilds the exact grid): 100
    * groups of visually distinct base images (per-group stride/quadratic
    * coefficients), each document perturbing 3 pixels of its group's base
    * — same-group images sit within Hamming 0–5 of each other, the 4
    * distance-5 outliers drop at the ≤4 filter, and NO cross-group pair
    * ever shares a band (verified empirically at this corpus; the oracle
    * replays the banding, so even a collision would hash-match). Scale
    * shape: encode/decode/hash is one narrow partition-parallel pass
    * (payloads never reach the driver), candidates come from the banded
    * equi-join with the hot-bucket cap — never all-pairs.
    *
    * Oracle: rebuilds every pixel from the generator arithmetic, the
    * block-intensity sums, all 56 cross-multiplied comparisons, packs the
    * hash with `bit_or(1 << bit)` (56 bits keeps it sign-free in both
    * engines), replays the 4-band candidate join and the Hamming filter —
    * any codec bug (row padding, chroma, color management) or any banding
    * drift breaks the hash. */
  def qImageNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val W = 48; val H = 32; val N = W * H
    val ids = t(spark, sfDir, "documents").select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
    val media = ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val g = id % 100
        val img = new java.awt.image.BufferedImage(
          W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val px = new Array[Int](N)
        var i = 0
        while (i < N) {
          val v = ((g * 37 + i * (3 + g % 11) +
            (i.toLong * i % 251) * (1 + g % 7)) % 256).toInt
          px(i) = (v << 16) | (v << 8) | v
          i += 1
        }
        // 3 perturbed pixels at distinct positions (607·j mod 1536 spacing)
        var j = 0
        while (j < 3) {
          val p = ((id * 131 + j * 607) % N).toInt
          val v = (((px(p) & 0xff) + 96 + id % 64) % 256).toInt
          px(p) = (v << 16) | (v << 8) | v
          j += 1
        }
        img.setRGB(0, 0, W, H, px, 0, W)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        graft.multimodal.Multimodal.MediaRecord(id, "image/png", bos.toByteArray)
      }
    }
    val hashes = graft.multimodal.Multimodal.perceptualHashes(media)
      .select(col("media_id").as("id"), col("dhash").as("sh"))
    // maxBucketSize = 64: far above this corpus's densities (max band
    // bucket 9 at the oracle SFs, so the oracle never models the cap —
    // the DefaultMaxShingleDF convention) but it FIRES on the 100×/1000×
    // replicated fixtures, where every base-image group becomes one
    // giant near-dup clique (group size ~100/~50000) — the image analog
    // of boilerplate text, and exactly what the hot-bucket cap exists
    // for: without it the pair join emits Ω(clique²) rows (≈25 M at
    // 100×, ≈1.25 B at 1000×) that carry no dedup signal a sane
    // pipeline would enumerate pair-by-pair.
    graft.operators.Dedup
      .hammingPairsFromHashes(hashes, blockBits = 14, maxHamming = 4,
        maxBucketSize = 64)
      .orderBy("d1", "d2")
  }

  /** Oracle: the dHash recomputed from the pixel-generator arithmetic (no
    * codec — PNG truecolor is lossless), then the band join + Hamming
    * filter replayed. Intensity 299R+587G+114B = 1000·v on gray pixels. */
  val qImageNearDupSql: String =
    """WITH px AS (
      |  SELECT d.doc_id, s.i,
      |         ((d.doc_id % 100) * 37 + s.i * (3 + (d.doc_id % 100) % 11)
      |          + ((s.i * s.i) % 251) * (1 + (d.doc_id % 100) % 7)) % 256 AS vb
      |  FROM documents d, generate_series(0, 1535) AS s(i)),
      |pert AS (
      |  SELECT doc_id, i,
      |         CASE WHEN i IN ((doc_id * 131) % 1536,
      |                         (doc_id * 131 + 607) % 1536,
      |                         (doc_id * 131 + 1214) % 1536)
      |              THEN (vb + 96 + doc_id % 64) % 256 ELSE vb END AS v,
      |         ((i // 48) // 4) * 8 + ((i % 48) // 6) AS b
      |  FROM px),
      |bsums AS (
      |  SELECT doc_id, b, CAST(sum(1000 * v) AS BIGINT) AS s,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM pert GROUP BY 1, 2),
      |bits AS (
      |  SELECT l.doc_id, (l.b // 8) * 7 + (l.b % 8) AS bit
      |  FROM bsums l JOIN bsums r ON r.doc_id = l.doc_id AND r.b = l.b + 1
      |  WHERE l.b % 8 < 7 AND l.s * r.n > r.s * l.n),
      |hashes AS (
      |  SELECT d.doc_id, COALESCE(bit_or(CAST(1 AS BIGINT) << b.bit), 0) AS sh
      |  FROM documents d LEFT JOIN bits b USING (doc_id)
      |  GROUP BY d.doc_id),
      |bands AS (
      |  SELECT doc_id, sh, t.blk, (sh >> (t.blk * 14)) & 16383 AS key
      |  FROM hashes, (VALUES (0), (1), (2), (3)) t(blk)),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
      |         CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
      |  FROM bands a JOIN bands b
      |    ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id)
      |SELECT d1, d2, hamming FROM pairs WHERE hamming <= 4
      |ORDER BY d1, d2""".stripMargin

  /** The REAL audio codec under the oracle — the WAV analog of
    * [[qImageEmbed]]: per document a 1600-sample PCM16 clip is generated
    * from pure integer arithmetic (s_i = (doc_id·7 + i·13) mod 2^16 −
    * 2^15), ENCODED as a WAV container and DECODED back through
    * [[graft.multimodal.Multimodal.WavDecoder]] (`javax.sound.sampled`) —
    * sample rate and count off the real container, 16-segment
    * mean-|amplitude| envelope off the real samples. PCM is lossless, so
    * the oracle recomputes the envelope from the generator arithmetic:
    * any container/codec bug (header misparse, endianness, sign
    * extension) breaks the hash. Same exactness discipline as
    * q_image_embed: ordered `list_reduce` folds, CAST(… AS REAL)
    * narrowing, exact 2^20 scaling. Same scale shape: one narrow
    * `mapPartitions` encode→decode pass + row-local posexplode. */
  def qAudioEmbed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val N = 1600
    // same codec-stage fan-out as qImageEmbed
    val ids = t(spark, sfDir, "documents").select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
    val media = ids.mapPartitions { it =>
      it.map { id =>
        val samples = Array.tabulate(N)(i =>
          (((id * 7 + i.toLong * 13) % 65536) - 32768).toShort)
        graft.multimodal.Multimodal.MediaRecord(
          id, "audio/wav", graft.multimodal.Multimodal.pcm16Wav(samples))
      }
    }
    graft.multimodal.Multimodal
      .extractFeatures(media, graft.multimodal.Multimodal.WavDecoder)
      .toDF()
      .select(col("media_id").as("doc_id"),
        col("width").cast("long").as("sample_rate"),
        col("height").cast("long").as("n_samples"),
        posexplode(col("embedding")).as(Seq("seg", "e")))
      .select(col("doc_id"), col("sample_rate"), col("n_samples"),
        col("seg").cast("long").as("seg"),
        floor(col("e").cast("double") * 1048576).cast("long").as("q_amp"))
      .orderBy("doc_id", "seg")
  }

  /** Oracle: the envelope recomputed from the sample-generator arithmetic
    * (no container round-trip) — segment folds in sample order, float
    * narrowing and exact 2^20 quantization mirrored. */
  val qAudioEmbedSql: String =
    """WITH sm AS (
      |  SELECT d.doc_id, g.i,
      |         abs(((d.doc_id * 7 + g.i * 13) % 65536) - 32768) / 32768.0 AS t,
      |         g.i // 100 AS seg
      |  FROM documents d, generate_series(0, 1599) AS g(i)),
      |sums AS (
      |  SELECT doc_id, seg,
      |         list_reduce(list(t ORDER BY i), (a, x) -> a + x) AS s
      |  FROM sm GROUP BY doc_id, seg)
      |SELECT doc_id,
      |       CAST(8000 AS BIGINT) AS sample_rate, CAST(1600 AS BIGINT) AS n_samples,
      |       CAST(seg AS BIGINT) AS seg,
      |       CAST(floor(CAST(CAST(s / 100 AS REAL) AS DOUBLE) * 1048576) AS BIGINT) AS q_amp
      |FROM sums ORDER BY doc_id, seg""".stripMargin

  /** Energy-based voice-activity segmentation (VAD) over the REAL WAV
    * codec — the speech-curation pass that decides which clip regions
    * carry signal before a corpus pays for transcription: the same
    * encode→decode fan-out as [[qAudioEmbed]] produces the 16-segment
    * mean-|amplitude| envelope off real decoded PCM; each segment
    * quantizes to the oracle-exact integer q = floor(env·2^20)
    * (q_audio_embed's q_amp), a segment is ACTIVE iff its energy is
    * strictly above the clip mean (q·16 > Σq — pure integer arithmetic),
    * and consecutive active segments merge into islands. One row per
    * island: (doc_id, seg_start, seg_end, n_segs).
    *
    * Scale shape: the entire segmentation is ROW-LOCAL — quantization,
    * the clip total, the island start/end detection all run as array ops
    * over the 16-element envelope inside one narrow projection (the
    * boundary tests are HOF filters over a materialized `q` attribute;
    * 16 interpreted elements per row is noise next to the codec). No
    * shuffle exists until the output sort; a 100 TB audio corpus VADs at
    * scan speed. The gaps-and-islands window form (partition by doc,
    * seg − row_number) is what the ORACLE replays — the row-local array
    * form avoids shuffling 16 rows per clip through a window sort. */
  def qAudioVad(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val N = 1600
    val ids = t(spark, sfDir, "documents").select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
    // clip generator distinct from q_audio_embed's linear ramp (whose
    // segment means are constant-ordered — every clip would yield the
    // same single island): the multiplicative mix below produces 0-8
    // islands per clip (129 distinct patterns over 200 ids). Folded
    // mod 65536 stepwise so the arithmetic never exceeds 2^63 at any
    // corpus size — the oracle replays the identical folded form.
    val media = ids.mapPartitions { it =>
      it.map { id =>
        val samples = Array.tabulate(N)(i =>
          ((((id + 3) * (i + 11L)) % 65536) * 31153 % 65536 - 32768).toShort)
        graft.multimodal.Multimodal.MediaRecord(
          id, "audio/wav", graft.multimodal.Multimodal.pcm16Wav(samples))
      }
    }
    val active = (q: Column, tot: Column, i: Column) =>
      element_at(q, i + 1) * 16 > tot
    graft.multimodal.Multimodal
      .extractFeatures(media, graft.multimodal.Multimodal.WavDecoder)
      .toDF()
      .select(col("media_id").as("doc_id"),
        transform(col("embedding"),
          e => floor(e.cast("double") * 1048576).cast("long")).as("q"))
      .select(col("doc_id"), col("q"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("tot"))
      // boundary tests keep the lit check FIRST in the Or — it
      // short-circuits before element_at would see index 0 / 17 (ANSI)
      .select(col("doc_id"),
        filter(sequence(lit(0), lit(15)), i =>
          active(col("q"), col("tot"), i) &&
            ((i === 0) || !active(col("q"), col("tot"), i - 1))).as("starts"),
        filter(sequence(lit(0), lit(15)), i =>
          active(col("q"), col("tot"), i) &&
            ((i === 15) || !active(col("q"), col("tot"), i + 1))).as("ends"))
      .select(col("doc_id"), explode(arrays_zip(col("starts"), col("ends"))).as("isl"))
      .select(col("doc_id"),
        col("isl.starts").cast("long").as("seg_start"),
        col("isl.ends").cast("long").as("seg_end"))
      .withColumn("n_segs", col("seg_end") - col("seg_start") + 1)
      .orderBy("doc_id", "seg_start")
  }

  /** Oracle: envelope replayed from the sample-generator arithmetic (the
    * [[qAudioEmbedSql]] CTEs), islands via the classic window form. */
  val qAudioVadSql: String =
    """WITH sm AS (
      |  SELECT d.doc_id, g.i,
      |         abs((((d.doc_id + 3) * (g.i + 11)) % 65536) * 31153 % 65536
      |             - 32768) / 32768.0 AS t,
      |         g.i // 100 AS seg
      |  FROM documents d, generate_series(0, 1599) AS g(i)),
      |sums AS (
      |  SELECT doc_id, seg,
      |         list_reduce(list(t ORDER BY i), (a, x) -> a + x) AS s
      |  FROM sm GROUP BY doc_id, seg),
      |env AS (
      |  SELECT doc_id, seg,
      |         CAST(floor(CAST(CAST(s / 100 AS REAL) AS DOUBLE) * 1048576) AS BIGINT) AS q
      |  FROM sums),
      |tot AS (SELECT doc_id, sum(q) AS tot FROM env GROUP BY doc_id),
      |act AS (
      |  SELECT e.doc_id, e.seg FROM env e JOIN tot t USING (doc_id)
      |  WHERE e.q * 16 > t.tot),
      |grp AS (
      |  SELECT doc_id, seg,
      |         seg - row_number() OVER (PARTITION BY doc_id ORDER BY seg) AS g
      |  FROM act)
      |SELECT doc_id, min(seg) AS seg_start, max(seg) AS seg_end,
      |       count(*) AS n_segs
      |FROM grp GROUP BY doc_id, g ORDER BY doc_id, seg_start""".stripMargin

  /** Subword-vocabulary induction — the candidate-generation step BPE /
    * WordPiece tokenizer training starts from: enumerate every character
    * n-gram (len 2..4) of every corpus token, count corpus-wide
    * occurrences, keep the top-32 by (count desc, gram asc — a total
    * deterministic order). The iterative merge loop that follows in full
    * BPE is sequential by nature; the candidate statistics here are the
    * data-parallel 99% of the work.
    *
    * Scale shape: gram enumeration is ROW-LOCAL via the native
    * `subword_gram_counts` kernel ([[graft.plans.SubwordGrams]]) — one
    * {gram → count} map per document built in a single byte pass, so the
    * explode emits one row per DISTINCT gram per doc instead of one per
    * occurrence (the earlier nested-Generate shape emitted ~3 rows per
    * corpus character plus a null slot per out-of-range pair: 256.8 s at
    * the 100× fixture vs 29.3 s for the kernel; SubwordGramsSpec pins the
    * two shapes equal). Counting is a two-phase agg on gram keys; top-32
    * is a bounded TakeOrdered, not a global sort. At 100 TB the gram key
    * space is vocabulary-bounded (≤ |alphabet|^4), so the shuffle carries
    * grams, not the corpus. */
  def qSubwordVocab(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(explode(graft.plans.SubwordExpressions
        .subwordGramCounts(lower(col("text")))).as(Seq("gram", "c")))
      .groupBy("gram").agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(32)

  val qSubwordVocabSql: String =
    """WITH toks AS (
      |  SELECT lower(t.w) AS w
      |  FROM documents d,
      |       unnest(string_split_regex(d.text, '\s+')) AS t(w)
      |  WHERE length(t.w) >= 2),
      |grams AS (
      |  SELECT substring(w, s.s, l.l) AS gram
      |  FROM toks, generate_series(1, 4096) AS s(s), generate_series(2, 4) AS l(l)
      |  WHERE s.s + l.l - 1 <= length(w))
      |SELECT gram, count(*) AS cnt
      |FROM grams GROUP BY gram
      |ORDER BY cnt DESC, gram ASC
      |LIMIT 32""".stripMargin

  /** The 16-merge BPE table trained offline on the sf0.01 `documents`
    * corpus (classic pair-frequency loop, ties broken lexicographically) —
    * the "train once, freeze, apply everywhere" artifact a real pipeline
    * ships. Rank order is load-bearing: each merge's parts are single
    * chars or outputs of strictly earlier merges (the training invariant),
    * which is what makes sequential in-order application equivalent to
    * greedy lowest-rank BPE apply. */
  // lazy: earlier-declared oracle vals (qPackSequencesSql) splice the
  // merge table during object init, before this declaration is reached
  private[queries] lazy val BpeMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "i" -> "n", "o" -> "w", "o" -> "r",
    "s" -> "t", "m" -> "er", "a" -> "t", "l" -> "u",
    "a" -> "r", "p" -> "ar", "j" -> "o", "jo" -> "in",
    "a" -> "s", "as" -> "h", "h" -> "ash", "r" -> "ow")

  /** BPE-apply over the corpus: the data-parallel tokenizer pass a
    * training pipeline runs per document once a merge table is frozen —
    * the step [[qSubwordVocab]]'s candidate statistics feed. Each word is
    * exploded to boundary-delimited characters (`|a|b|c|`) and the fixed
    * merge table is applied IN RANK ORDER as plain string replaces:
    * `replace(s, "|a|b|", "|ab|")` merges every adjacent (a,b) token pair
    * left-to-right non-overlapping — exactly BPE's leftmost-first merge —
    * and the explicit `|` boundaries make a token-prefix collision with a
    * neighbouring token impossible. Output: per-token corpus count and
    * document frequency, the real token-count table that replaces the
    * whitespace proxy in packing/mixture planning.
    *
    * Scale shape: the merge table rides in the plan as 16 literal replace
    * nodes (constant-folded, smaller than any broadcast; the broadcast
    * degenerates to codegen constants) so the whole encode is ROW-LOCAL
    * inside the scan's codegen span — no join, no UDF; the only shuffles
    * are the two-phase count + distinct-doc aggregation on a token key
    * space bounded by |alphabet| + 16 merges. */
  /** BPE token array of one lowercase word under [[BpeMerges]] — pure
    * Column expression (string replaces on a boundary-delimited char
    * string), row-local, no UDF. */
  private[graft] def bpeTokens(w: Column): Column = {
    val sepd = concat(lit("|"), array_join(split(w, ""), "|"), lit("|"))
    val encoded = BpeMerges.foldLeft(sepd) { case (s, (a, b)) =>
      replace(s, lit(s"|$a|$b|"), lit(s"|$a$b|"))
    }
    filter(split(encoded, "\\|"), tk => tk =!= "")
  }

  /** Per-document BPE token budget under the frozen [[BpeMerges]] table —
    * the REAL count a packer/mixture planner needs instead of the
    * whitespace proxy. Counts every non-empty whitespace word (no
    * alphabetic filter: a non-alpha word still tokenizes, its chars just
    * never merge).
    *
    * Computed as ONE codegen'd string expression over the whole document,
    * by length arithmetic instead of materializing tokens:
    *
    *   - pipe-separate every char of lower(text): `|c|h|a|r| |…|`; its
    *     length is exactly 2·L+1. Whitespace chars become segments no
    *     letter-pair merge can touch or cross, so running the merge chain
    *     over the whole doc applies exactly the per-word replacements.
    *   - every merge replaces `|a|b|` by `|ab|` — shrinking the string by
    *     EXACTLY one char, so merges_applied = len(sepd) − len(encoded).
    *   - tokens = (non-pipe, non-whitespace chars) − merges_applied
    *     = len(encoded) − 2·L + len(text without '|') − n_ws − 1.
    *
    * Production path: the [[graft.plans.BpeKernel]] native expression —
    * the same merge-chain semantics simulated on symbol spans in one
    * allocation-free pass over the bytes. [[bpeTokenCountColumnar]] below
    * is the pure-`functions._` derivation of the identical arithmetic,
    * kept as the cross-checked reference implementation (TextKernelSpec
    * pins native ≡ columnar on crafted and generated inputs; the DuckDB
    * oracle hash pins both).
    *
    * Three slower shapes were measured at the 100× fixture and must not
    * come back: folding [[bpeTokens]] per word inside an `aggregate` HOF
    * (the whole chain evaluates INTERPRETED per word — HOFs are
    * CodegenFallback; 68-74 s/query); explode-words + `size(bpeTokens)` +
    * regroup (a fallback expression interprets its ENTIRE subtree,
    * including the codegen-capable replace chain below it; 65 s); and the
    * columnar length arithmetic (48 s — its 16 codegen'd `replace` passes
    * each copy + reallocate the 2·L-char separated string). */
  private[graft] def bpeTokenCount(text: Column): Column =
    graft.plans.BpeExpressions.bpeTokenCount(lower(text), BpeMerges)

  /** Columnar reference derivation of [[bpeTokenCount]] — see its doc. */
  private[graft] def bpeTokenCountColumnar(text: Column): Column = {
    val lt = lower(text)
    val sepd = concat(lit("|"), array_join(split(lt, ""), "|"), lit("|"))
    val encoded = BpeMerges.foldLeft(sepd) { case (s, (a, b)) =>
      replace(s, lit(s"|$a|$b|"), lit(s"|$a$b|"))
    }
    val nWs = length(lt) - length(regexp_replace(lt, "\\s", ""))
    val noPipe = length(replace(lt, lit("|"), lit("")))
    when(coalesce(length(lt), lit(0)) === 0, lit(0L))
      .otherwise(
        (length(encoded) - lit(2) * length(lt) + noPipe - nWs - lit(1))
          .cast("long"))
  }

  /** DuckDB replay of [[bpeTokenCount]] over a text expression. */
  private[queries] def bpeTokenCountSql(textExpr: String): String = {
    val enc = BpeMerges.foldLeft(
      "'|' || array_to_string(string_split(w, ''), '|') || '|'") {
      case (e, (a, b)) => s"replace($e, '|$a|$b|', '|$a$b|')"
    }
    s"COALESCE(list_sum(list_transform(" +
      s"list_filter(string_split_regex(lower($textExpr), '\\s+'), w -> w <> ''), " +
      s"w -> len(list_filter(string_split($enc, '|'), t -> t <> '')))), 0)"
  }

  def qBpeEncode(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .select(col("doc_id"), explode(bpeTokens(col("w"))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("cnt").desc, col("tok").asc)

  val qBpeEncodeSql: String = {
    val enc = BpeMerges.foldLeft("s") { case (e, (a, b)) =>
      s"replace($e, '|$a|$b|', '|$a$b|')"
    }
    s"""WITH words AS MATERIALIZED (
       |  SELECT d.doc_id, lower(t.w) AS w
       |  FROM documents d,
       |       unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE regexp_matches(lower(t.w), '^[a-z]+$$')),
       |sepd AS (
       |  SELECT doc_id,
       |         '|' || array_to_string(string_split(w, ''), '|') || '|' AS s
       |  FROM words),
       |toks AS (
       |  SELECT sepd.doc_id, t.tok
       |  FROM sepd, unnest(string_split($enc, '|')) AS t(tok)
       |  WHERE t.tok <> '')
       |SELECT tok, count(*) AS cnt, count(DISTINCT doc_id) AS df
       |FROM toks GROUP BY tok
       |ORDER BY cnt DESC, tok ASC""".stripMargin
  }

  /** BPE merge-table TRAINING in-engine (round 11) — the step that
    * produced the frozen [[BpeMerges]] table offline now runs as a
    * declared, oracle-replayed operator: the classic pair-frequency loop
    * (Sennrich et al. 2016, arXiv:1508.07909 — public literature) over
    * the corpus word-type histogram. Output: one row per learned merge,
    * (step, lhs, rhs, pair_cnt), in training order.
    *
    * Conventions (each load-bearing for engine-portability):
    *  - the model trains on the TOP-`topWords` word types by
    *    (count desc, word asc) — bounded model state, the same pattern as
    *    centroids/vocab: the corpus is scanned ONCE (distributed word
    *    count + TakeOrdered); the merge loop then runs driver-side over a
    *    fixed-size table, which is how production tokenizer trainers work
    *    too (SentencePiece/HF train on a capped type histogram);
    *  - word states use the repo's boundary-delimited char convention
    *    (`|a|b|c|`) and merges apply as plain leftmost-non-overlapping
    *    string replace — EXACTLY [[bpeTokens]]' apply semantics, and
    *    Java String.replace ≡ Spark replace ≡ DuckDB replace, so the
    *    trained table is what the repo's encode path would consume;
    *  - pair counts sum word-type frequency over ALL adjacent symbol
    *    positions; the winning pair is max by (count desc, lhs asc,
    *    rhs asc) — a total deterministic order (lowercase-ASCII symbols
    *    compare identically in both engines).
    *
    * The DuckDB oracle replays the ENTIRE training run — histogram,
    * every pair-count round, every argmax, every merge application — as
    * `nMerges` unrolled CTE blocks. */
  /** The distributed stage of BPE training: the top-`topWords` word-type
    * histogram (one corpus scan, two-phase count, bounded TakeOrdered).
    * Factored out so PlanQualitySpec gates the REAL query's plan, not a
    * hand-copied replica (review r11). */
  private[graft] def bpeWordHistogram(docs: DataFrame, textCol: String,
                                      topWords: Int): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(topWords)

  private[graft] def bpeTrainMerges(docs: DataFrame, textCol: String,
                                    topWords: Int, nMerges: Int): Seq[(Int, String, String, Long)] = {
    val wc: Array[(String, Long)] = bpeWordHistogram(docs, textCol, topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var states: Array[(String, Long)] = wc.map { case (w, c) =>
      ("|" + w.split("").mkString("|") + "|", c)
    }
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      states.foreach { case (s, c) =>
        val syms = s.split("\\|").filter(_.nonEmpty)
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((a, b), cnt) = pc.minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((step, a, b, cnt))
        states = states.map { case (s, c) => (s.replace(s"|$a|$b|", s"|$a$b|"), c) }
        step += 1
      }
    }
    merges.toSeq
  }

  def qBpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bpeTrainMerges(t(spark, sfDir, "documents"), "text",
        topWords = 256, nMerges = 12)
      .toDF("step", "lhs", "rhs", "pair_cnt")
      .select(col("step").cast("long"), col("lhs"), col("rhs"), col("pair_cnt"))
      .orderBy("step")
  }

  /** The full training run as a CTE chain (words/wc/st0 + `nMerges`
    * rounds of p_i/m_i/st_i) — shared by the q_bpe_train oracle and the
    * q_bpe_train_apply oracle. Every CTE is MATERIALIZED: the chain
    * references each st_i twice, and DuckDB's default inlining would
    * re-expand the parquet scan exponentially (the first non-materialized
    * attempt died on file-handle exhaustion). */
  private def bpeTrainSqlCtes(topWords: Int, nMerges: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT syms[u.i] AS lhs, syms[u.i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_cnt
         |  FROM (SELECT list_filter(string_split(s, '|'), x -> x <> '') AS syms, cnt
         |        FROM st${i - 1}) t,
         |       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT lhs, rhs, pair_cnt FROM p$i ORDER BY pair_cnt DESC, lhs, rhs LIMIT 1),
         |st$i AS MATERIALIZED (
         |  SELECT replace(s,
         |           coalesce('|' || (SELECT lhs FROM m$i) || '|' || (SELECT rhs FROM m$i) || '|', '~~'),
         |           coalesce('|' || (SELECT lhs FROM m$i) || (SELECT rhs FROM m$i) || '|', '~~')) AS s,
         |         cnt
         |  FROM st${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""words AS MATERIALIZED (
       |  SELECT lower(t.w) AS w
       |  FROM documents d,
       |       unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE regexp_matches(lower(t.w), '^[a-z]+$$')),
       |wc AS MATERIALIZED (
       |  SELECT w, count(*) AS cnt FROM words GROUP BY w
       |  ORDER BY cnt DESC, w LIMIT $topWords),
       |st0 AS MATERIALIZED (
       |  SELECT '|' || array_to_string(string_split(w, ''), '|') || '|' AS s, cnt
       |  FROM wc),
       |$rounds""".stripMargin
  }

  val qBpeTrainSql: String = {
    val nMerges = 12
    val unions = (1 to nMerges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, lhs, rhs, pair_cnt FROM m$i").mkString("\nUNION ALL\n")
    s"""WITH ${bpeTrainSqlCtes(topWords = 256, nMerges = nMerges)}
       |$unions
       |ORDER BY step""".stripMargin
  }

  /** Train → APPLY composition (round 11): encode the WHOLE corpus (every
    * alpha word occurrence, not just the capped training histogram) with
    * the merge table [[qBpeTrain]] just learned, and report the top-40
    * resulting tokens — the end-to-end loop a tokenizer pipeline actually
    * runs (learn on the type histogram, apply everywhere). Spark side:
    * the learned merges come back from the bounded driver-side loop and
    * constant-fold into the same boundary-delimited replace chain the
    * frozen-table encode uses; the oracle re-learns the merges via the
    * shared training CTEs and applies them as scalar-subquery replaces. */
  def qBpeTrainApply(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val learned = bpeTrainMerges(docs, "text", topWords = 256, nMerges = 12)
      .map { case (_, a, b, _) => (a, b) }
    val sepd = concat(lit("|"), array_join(split(col("w"), ""), "|"), lit("|"))
    val encoded = learned.foldLeft(sepd) { case (s, (a, b)) =>
      replace(s, lit(s"|$a|$b|"), lit(s"|$a$b|"))
    }
    docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .select(explode(filter(split(encoded, "\\|"), tk => tk =!= "")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(40)
  }

  val qBpeTrainApplySql: String = {
    val nMerges = 12
    // each round guards against an exhausted training run (m$i empty): the
    // scalar subqueries go NULL and a bare replace(s, NULL, NULL) would
    // NULL-poison the whole chain and return zero rows (review r11);
    // COALESCE substitutes a pattern that can never match a word state
    // (states are [a-z|] only), making the round a no-op — exactly the
    // Scala loop's graceful stop
    val enc = (1 to nMerges).foldLeft("s") { (e, i) =>
      s"""replace($e,
         |  coalesce('|' || (SELECT lhs FROM m$i) || '|' || (SELECT rhs FROM m$i) || '|', '~~'),
         |  coalesce('|' || (SELECT lhs FROM m$i) || (SELECT rhs FROM m$i) || '|', '~~'))""".stripMargin
    }
    s"""WITH ${bpeTrainSqlCtes(topWords = 256, nMerges = nMerges)},
       |sepd AS MATERIALIZED (
       |  SELECT '|' || array_to_string(string_split(w, ''), '|') || '|' AS s
       |  FROM words),
       |toks AS (
       |  SELECT t.tok
       |  FROM sepd, unnest(string_split($enc, '|')) AS t(tok)
       |  WHERE t.tok <> '')
       |SELECT tok, count(*) AS cnt
       |FROM toks GROUP BY tok
       |ORDER BY cnt DESC, tok
       |LIMIT 40""".stripMargin
  }

  /** Unigram-LM tokenizer training (round 13) — the SentencePiece family
    * (Kudo 2018, arXiv:1804.10959 — public literature), the other
    * production tokenizer beside BPE. Same distributed-histogram +
    * driver-bounded-model shape as [[bpeTrainMerges]]:
    *
    *  - ONE corpus scan builds the capped word-type histogram (length ≤
    *    `maxWordLen` so the DP unroll below is bounded);
    *  - the candidate vocabulary is every substring of length ≤
    *    `pieceMax` of the histogram types, weighted by type count — all
    *    single chars (segmentability floor) plus the top-`topPieces`
    *    multi-char pieces;
    *  - `emRounds` of EM over the bounded table: the E-step is VITERBI
    *    (hard-EM — the standard deterministic simplification of Kudo's
    *    forward-backward; counts come from each type's single best
    *    segmentation, weighted by type frequency), the M-step re-derives
    *    piece costs with add-1 smoothing so pruned-out pieces stay
    *    finite and can re-enter.
    *
    * Exactness discipline: piece costs are QUANTIZED negative log-probs
    * (−floor(2^20·ln p) — the q_tfidf/q_dsir convention; ln is the one
    * 1-ulp-wobble risk), so the Viterbi DP is pure INTEGER addition/min —
    * order-free, tie-exact, and replayable: the oracle unrolls the DP
    * over positions 1..maxWordLen and the backtrack (smallest piece
    * length achieving dp equality — the pinned tie rule) as CTE chains,
    * one block per EM round, over the same quantized cost tables.
    *
    * Scale shape: the corpus cost is one word-count aggregate; everything
    * after is O(topWords·maxWordLen·pieceMax) driver arithmetic on a
    * bounded table — exactly how production trainers behave (SentencePiece
    * trains on a capped type histogram, not the raw corpus). */
  private[graft] def unigramTrainTable(docs: DataFrame, textCol: String,
      topWords: Int, maxWordLen: Int, pieceMax: Int, topPieces: Int,
      emRounds: Int, outRows: Int): Seq[(String, Long, Long)] =
    unigramTrainModel(docs, textCol, topWords, maxWordLen, pieceMax,
      topPieces, emRounds)
      .sortBy { case (p, u, _) => (-u, p) }
      .take(outRows)

  /** The FULL trained model (every vocab piece with final usage and
    * cost) — [[unigramTrainTable]] is its top-slice readout; the encode
    * path ([[qUnigramEncode]]) consumes the whole cost table. */
  private[graft] def unigramTrainModel(docs: DataFrame, textCol: String,
      topWords: Int, maxWordLen: Int, pieceMax: Int, topPieces: Int,
      emRounds: Int): Seq[(String, Long, Long)] = {
    val wc: Array[(String, Long)] = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    val subFreq = scala.collection.mutable.HashMap.empty[String, Long]
    wc.foreach { case (w, c) =>
      var l = 1
      while (l <= pieceMax) {
        var i = 0
        while (i + l <= w.length) {
          val p = w.substring(i, i + l)
          subFreq.update(p, subFreq.getOrElse(p, 0L) + c)
          i += 1
        }
        l += 1
      }
    }
    val singles = subFreq.iterator.filter(_._1.length == 1).toSeq
    val multis = subFreq.iterator.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(topPieces)
    val vocab: Seq[(String, Long)] = (singles ++ multis).sortBy(_._1)
    val nVocab = vocab.size
    val totF = vocab.map(_._2).sum.toDouble
    var cost: Map[String, Long] = vocab.map { case (p, f) =>
      p -> -math.floor(math.log(f.toDouble / totF) * 1048576).toLong
    }.toMap

    var usage: Map[String, Long] = Map.empty
    for (_ <- 1 to emRounds) {
      val u = scala.collection.mutable.HashMap.empty[String, Long]
      wc.foreach { case (w, c) =>
        val n = w.length
        val INF = Long.MaxValue / 4
        val dp = Array.fill(n + 1)(INF)
        dp(0) = 0L
        var k = 1
        while (k <= n) {
          var l = 1
          val lMax = math.min(pieceMax, k)
          while (l <= lMax) {
            cost.get(w.substring(k - l, k)) match {
              case Some(cq) if dp(k - l) != INF && dp(k - l) + cq < dp(k) =>
                dp(k) = dp(k - l) + cq
              case _ =>
            }
            l += 1
          }
          k += 1
        }
        // backtrack: smallest l whose transition achieves dp equality —
        // guaranteed to terminate (singles cover every char, and dp(pos)
        // was produced by SOME transition)
        var pos = n
        while (pos > 0) {
          var l = 1
          var done = false
          while (!done) {
            val p = w.substring(pos - l, pos)
            if (cost.contains(p) && dp(pos - l) != INF &&
                dp(pos - l) + cost(p) == dp(pos)) {
              u.update(p, u.getOrElse(p, 0L) + c)
              pos -= l
              done = true
            } else l += 1
          }
        }
      }
      usage = u.toMap
      val uTot = usage.values.sum
      cost = vocab.map { case (p, _) =>
        p -> -math.floor(math.log((usage.getOrElse(p, 0L) + 1).toDouble /
          (uTot + nVocab).toDouble) * 1048576).toLong
      }.toMap
    }
    vocab.map { case (p, _) => (p, usage.getOrElse(p, 0L), cost(p)) }
  }

  def qUnigramTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    unigramTrainTable(t(spark, sfDir, "documents"), "text",
        topWords = 192, maxWordLen = 16, pieceMax = 4, topPieces = 48,
        emRounds = 2, outRows = 32)
      .toDF("piece", "cnt", "cost_q")
      .orderBy(col("cnt").desc, col("piece").asc)
  }

  /** Oracle: the ENTIRE training run replayed — histogram, weighted
    * substring candidates, quantized initial costs, and per EM round the
    * integer Viterbi DP unrolled over positions 1..maxWordLen, the
    * smallest-l backtrack unrolled over ≤ maxWordLen steps, the weighted
    * usage aggregation, and the smoothed cost update. All tables are
    * bounded (≤ topWords rows), so the ~80 CTEs are each trivial. */
  /** The training-run CTE body (uwc/usubs/uvocab/ucost0 + per-round DP,
    * backtrack, usage, cost chains) — shared by the q_unigram_train and
    * q_unigram_encode oracles. */
  private def unigramTrainSqlCtes(topWords: Int, maxWordLen: Int,
      pieceMax: Int, topPieces: Int, emRounds: Int): String = {
    def costTbl(r: Int) = if (r == 0) "ucost0" else s"ucost$r"
    val rounds = (1 to emRounds).map { r =>
      val prevCost = costTbl(r - 1)
      val dps = (1 to maxWordLen).map { k =>
        val branches = (1 to math.min(pieceMax, k)).map { l =>
          val prev =
            if (k - l == 0) s"(SELECT w, CAST(0 AS BIGINT) AS c FROM uwc)"
            else s"udp${r}_${k - l}"
          s"""    SELECT d.w, d.c + v.cq AS cand
             |    FROM $prev d JOIN $prevCost v
             |      ON v.piece = substr(d.w, ${k - l + 1}, $l)
             |    WHERE length(d.w) >= $k""".stripMargin
        }.mkString("\n    UNION ALL\n")
        s"""udp${r}_$k AS MATERIALIZED (
           |  SELECT w, min(cand) AS c FROM (
           |$branches) GROUP BY w)""".stripMargin
      }.mkString(",\n")
      val dpall = s"""udpall$r AS MATERIALIZED (
         |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS c FROM uwc
         |${(1 to maxWordLen).map(k => s"  UNION ALL SELECT w, $k, c FROM udp${r}_$k").mkString("\n")})""".stripMargin
      val bts = (1 to maxWordLen).map { s =>
        val prev = if (s == 1) s"(SELECT w, length(w) AS pos, NULL AS piece FROM uwc)"
        else s"ubt${r}_${s - 1}"
        s"""ubt${r}_$s AS MATERIALIZED (
           |  SELECT b.w, CAST(b.pos - t.l AS INT) AS pos, t.piece
           |  FROM $prev b, LATERAL (
           |    SELECT c.l, c.piece FROM (
           |      SELECT u.l, substr(b.w, b.pos - u.l + 1, u.l) AS piece
           |      FROM unnest([${(1 to pieceMax).mkString(", ")}]) AS u(l)
           |      WHERE u.l <= b.pos) c
           |    JOIN $prevCost v ON v.piece = c.piece
           |    JOIN udpall$r dp ON dp.w = b.w AND dp.pos = b.pos - c.l
           |    JOIN udpall$r dc ON dc.w = b.w AND dc.pos = b.pos
           |    WHERE dp.c + v.cq = dc.c
           |    ORDER BY c.l LIMIT 1) t
           |  WHERE b.pos > 0)""".stripMargin
      }.mkString(",\n")
      val usage = s"""uusage$r AS MATERIALIZED (
         |  SELECT t.piece, CAST(sum(w.cnt) AS BIGINT) AS u
         |  FROM (${(1 to maxWordLen).map(s => s"SELECT w, piece FROM ubt${r}_$s").mkString("\n        UNION ALL ")}) t
         |  JOIN uwc w ON w.w = t.w
         |  GROUP BY 1)""".stripMargin
      val newCost = s"""ucost$r AS MATERIALIZED (
         |  SELECT vv.piece,
         |         -CAST(floor(ln(CAST(coalesce(u.u, 0) + 1 AS DOUBLE)
         |             / CAST((SELECT sum(u) FROM uusage$r) + (SELECT count(*) FROM uvocab) AS DOUBLE))
         |           * 1048576) AS BIGINT) AS cq
         |  FROM uvocab vv LEFT JOIN uusage$r u ON u.piece = vv.piece)""".stripMargin
      s"$dps,\n$dpall,\n$bts,\n$usage,\n$newCost"
    }.mkString(",\n")
    s"""uwc AS MATERIALIZED (
       |  SELECT lower(t.w) AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents d,
       |       unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE regexp_matches(lower(t.w), '^[a-z]+$$')
       |    AND length(t.w) <= $maxWordLen
       |  GROUP BY 1 ORDER BY cnt DESC, w LIMIT $topWords),
       |usubs AS MATERIALIZED (
       |  SELECT substr(w.w, s.i, l.l) AS piece, CAST(sum(w.cnt) AS BIGINT) AS f
       |  FROM uwc w,
       |       unnest([${(1 to pieceMax).mkString(", ")}]) AS l(l),
       |       LATERAL unnest(generate_series(1, length(w.w) - l.l + 1)) AS s(i)
       |  GROUP BY 1),
       |uvocab AS MATERIALIZED (
       |  SELECT piece, f FROM usubs WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, f FROM (
       |    SELECT piece, f FROM usubs WHERE length(piece) >= 2
       |    ORDER BY f DESC, piece LIMIT $topPieces)),
       |ucost0 AS MATERIALIZED (
       |  SELECT piece,
       |         -CAST(floor(ln(CAST(f AS DOUBLE)
       |             / (SELECT CAST(sum(f) AS DOUBLE) FROM uvocab)) * 1048576) AS BIGINT) AS cq
       |  FROM uvocab),
       |$rounds""".stripMargin
  }

  val qUnigramTrainSql: String = {
    val emRounds = 2
    s"""WITH ${unigramTrainSqlCtes(topWords = 192, maxWordLen = 16,
          pieceMax = 4, topPieces = 48, emRounds = emRounds)}
       |SELECT piece, cnt, cost_q FROM (
       |  SELECT vv.piece, coalesce(u.u, 0) AS cnt, c.cq AS cost_q
       |  FROM uvocab vv
       |  LEFT JOIN uusage$emRounds u ON u.piece = vv.piece
       |  JOIN ucost$emRounds c ON c.piece = vv.piece)
       |ORDER BY cnt DESC, piece LIMIT 32""".stripMargin
  }

  /** Unigram train → APPLY (round 13) — the SentencePiece serving loop:
    * learn the model on the capped type histogram, then Viterbi-encode
    * the WHOLE corpus word stream with the frozen cost table and report
    * the top-40 resulting pieces. The encoder is the native codegen
    * [[graft.plans.UnigramOps.encode]] kernel — the bounded cost table
    * rides the plan as a reference object (the BPE-merge-chain / centroid
    * discipline), the per-word DP is O(len·pieceMax) integer arithmetic,
    * and out-of-vocab characters price at the fixed UNK cost so encoding
    * is total. The oracle re-learns through the shared training CTEs,
    * then replays the DP + smallest-l backtrack over the corpus word
    * TYPES (occurrences of a type share an encoding, so type-weighted
    * counts equal the per-occurrence stream). */
  def qUnigramEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val costs = unigramTrainModel(docs, "text", topWords = 192,
      maxWordLen = 16, pieceMax = 4, topPieces = 48, emRounds = 2)
      .map { case (p, _, c) => (p, c) }
    docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 16)
      .select(explode(graft.plans.UnigramExpressions
        .unigramEncode(col("w"), costs, pieceMax = 4)).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(40)
  }

  /** The corpus-encode CTE chain (DP positions, dpall union, smallest-l
    * backtrack) over a word-type table `awc(w, cnt)` with the trained
    * cost table — shared by the q_unigram_encode and q_tokenizer_compare
    * oracles. */
  private def unigramApplyChainSql(maxWordLen: Int, pieceMax: Int,
                                   emRounds: Int): String = {
    val unk = graft.plans.UnigramOps.UnkCost
    val cost = s"ucost$emRounds"
    val dps = (1 to maxWordLen).map { k =>
      val branches = (1 to math.min(pieceMax, k)).map { l =>
        val prev =
          if (k - l == 0) s"(SELECT w, CAST(0 AS BIGINT) AS c FROM awc)"
          else s"adp_${k - l}"
        if (l == 1)
          s"""    SELECT d.w, d.c + coalesce(v.cq, $unk) AS cand
             |    FROM $prev d LEFT JOIN $cost v
             |      ON v.piece = substr(d.w, $k, 1)
             |    WHERE length(d.w) >= $k""".stripMargin
        else
          s"""    SELECT d.w, d.c + v.cq AS cand
             |    FROM $prev d JOIN $cost v
             |      ON v.piece = substr(d.w, ${k - l + 1}, $l)
             |    WHERE length(d.w) >= $k""".stripMargin
      }.mkString("\n    UNION ALL\n")
      s"""adp_$k AS MATERIALIZED (
         |  SELECT w, min(cand) AS c FROM (
         |$branches) GROUP BY w)""".stripMargin
    }.mkString(",\n")
    val dpall = s"""adpall AS MATERIALIZED (
       |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS c FROM awc
       |${(1 to maxWordLen).map(k => s"  UNION ALL SELECT w, $k, c FROM adp_$k").mkString("\n")})""".stripMargin
    val bts = (1 to maxWordLen).map { s =>
      val prev = if (s == 1) s"(SELECT w, length(w) AS pos, NULL AS piece FROM awc)"
      else s"abt_${s - 1}"
      s"""abt_$s AS MATERIALIZED (
         |  SELECT b.w, CAST(b.pos - t.l AS INT) AS pos, t.piece
         |  FROM $prev b, LATERAL (
         |    SELECT c.l, c.piece FROM (
         |      SELECT u.l, substr(b.w, b.pos - u.l + 1, u.l) AS piece
         |      FROM unnest([${(1 to pieceMax).mkString(", ")}]) AS u(l)
         |      WHERE u.l <= b.pos) c
         |    LEFT JOIN $cost v ON v.piece = c.piece
         |    JOIN adpall dp ON dp.w = b.w AND dp.pos = b.pos - c.l
         |    JOIN adpall dc ON dc.w = b.w AND dc.pos = b.pos
         |    WHERE (c.l = 1 OR v.cq IS NOT NULL)
         |      AND dp.c + (CASE WHEN c.l = 1 THEN coalesce(v.cq, $unk) ELSE v.cq END) = dc.c
         |    ORDER BY c.l LIMIT 1) t
         |  WHERE b.pos > 0)""".stripMargin
    }.mkString(",\n")
    s"$dps,\n$dpall,\n$bts"
  }

  /** The alpha ≤16-char word-type histogram CTE both apply oracles start
    * from (kept separate from uwc: that one is LIMIT-capped for training,
    * this one is the WHOLE corpus stream). */
  private def awcSqlCte(maxWordLen: Int): String =
    s"""awc AS MATERIALIZED (
       |  SELECT lower(t.w) AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents d,
       |       unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE regexp_matches(lower(t.w), '^[a-z]+$$')
       |    AND length(t.w) <= $maxWordLen
       |  GROUP BY 1)""".stripMargin

  val qUnigramEncodeSql: String = {
    val maxWordLen = 16
    s"""WITH ${unigramTrainSqlCtes(topWords = 192, maxWordLen = maxWordLen,
          pieceMax = 4, topPieces = 48, emRounds = 2)},
       |${awcSqlCte(maxWordLen)},
       |${unigramApplyChainSql(maxWordLen, pieceMax = 4, emRounds = 2)}
       |SELECT piece, cnt FROM (
       |  SELECT t.piece, CAST(sum(w.cnt) AS BIGINT) AS cnt
       |  FROM (${(1 to maxWordLen).map(s => s"SELECT w, piece FROM abt_$s").mkString("\n        UNION ALL ")}) t
       |  JOIN awc w ON w.w = t.w
       |  GROUP BY 1)
       |ORDER BY cnt DESC, piece LIMIT 40""".stripMargin
  }

  /** Tokenizer COMPARISON report (round 13) — the model-selection readout
    * a multilingual pipeline runs before committing to a tokenizer: the
    * frozen-BPE and the just-trained unigram-LM models encode the SAME
    * alpha word stream, and per language the report gives both token
    * masses and quantized fertilities (tokens per word). Both encoders
    * are the native kernels ([[graft.plans.BpeTokenCountExpr]]-family and
    * [[graft.plans.UnigramOps.encode]]); the oracle replays BPE with the
    * frozen-table replace chain per word TYPE and unigram through the
    * shared train + apply CTE chains (per-type counts × per-lang type
    * frequencies ≡ the per-occurrence stream). */
  def qTokenizerCompare(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val costs = unigramTrainModel(docs, "text", topWords = 192,
      maxWordLen = 16, pieceMax = 4, topPieces = 48, emRounds = 2)
      .map { case (p, _, c) => (p, c) }
    docs.select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 16)
      .select(col("lang"),
        bpeTokenCount(col("w")).as("bpe"),
        size(graft.plans.UnigramExpressions.unigramEncode(col("w"), costs,
          pieceMax = 4)).cast("long").as("uni"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("bpe").as("bpe_tokens"),
        sum("uni").as("uni_pieces"))
      .select(col("lang"), col("n_words"), col("bpe_tokens"), col("uni_pieces"),
        floor(col("bpe_tokens").cast("double") / col("n_words").cast("double")
          * 1048576).cast("long").as("fert_bpe_q"),
        floor(col("uni_pieces").cast("double") / col("n_words").cast("double")
          * 1048576).cast("long").as("fert_uni_q"))
      .orderBy("lang")
  }

  val qTokenizerCompareSql: String = {
    val maxWordLen = 16
    s"""WITH ${unigramTrainSqlCtes(topWords = 192, maxWordLen = maxWordLen,
          pieceMax = 4, topPieces = 48, emRounds = 2)},
       |awcl AS MATERIALIZED (
       |  SELECT lang, lower(t.w) AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents d,
       |       unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE regexp_matches(lower(t.w), '^[a-z]+$$')
       |    AND length(t.w) <= $maxWordLen
       |  GROUP BY 1, 2),
       |awc AS MATERIALIZED (
       |  SELECT w, CAST(sum(cnt) AS BIGINT) AS cnt FROM awcl GROUP BY 1),
       |${unigramApplyChainSql(maxWordLen, pieceMax = 4, emRounds = 2)},
       |aupw AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS uni
       |  FROM (${(1 to maxWordLen).map(s => s"SELECT w FROM abt_$s").mkString("\n        UNION ALL ")})
       |  GROUP BY 1),
       |abpw AS MATERIALIZED (
       |  SELECT w, CAST(${bpeTokenCountSql("w")} AS BIGINT) AS bpe FROM awc),
       |aagg AS (
       |  SELECT l.lang, CAST(sum(l.cnt) AS BIGINT) AS n_words,
       |         CAST(sum(l.cnt * b.bpe) AS BIGINT) AS bpe_tokens,
       |         CAST(sum(l.cnt * u.uni) AS BIGINT) AS uni_pieces
       |  FROM awcl l
       |  JOIN abpw b ON b.w = l.w
       |  JOIN aupw u ON u.w = l.w
       |  GROUP BY 1)
       |SELECT lang, n_words, bpe_tokens, uni_pieces,
       |       CAST(floor(CAST(bpe_tokens AS DOUBLE) / CAST(n_words AS DOUBLE)
       |            * 1048576) AS BIGINT) AS fert_bpe_q,
       |       CAST(floor(CAST(uni_pieces AS DOUBLE) / CAST(n_words AS DOUBLE)
       |            * 1048576) AS BIGINT) AS fert_uni_q
       |FROM aagg ORDER BY lang""".stripMargin
  }

  /** WordPiece tokenizer training (round 15) — the THIRD production
    * tokenizer family beside BPE and unigram-LM (Schuster & Nakajima
    * 2012; the BERT tokenizer — public literature and the HuggingFace
    * tokenizers documentation). Same distributed-histogram +
    * driver-bounded-model shape as [[bpeTrainMerges]], with the two
    * WordPiece-specific twists:
    *
    *  - symbols are POSITIONAL: the word-initial character is plain,
    *    every continuation character carries the `##` prefix, and a
    *    merge concatenates the left symbol with the right symbol's
    *    `##`-stripped text (so merged continuations stay `##`-marked);
    *  - the merge objective is the LIKELIHOOD score, not the raw pair
    *    count: score(a,b) = count(ab) / (count(a)·count(b)) — quantized
    *    to score_q = count(ab)·2^20 div (count(a)·count(b)) so the
    *    argmax is pure integer arithmetic, order-free and replayable
    *    (ties broken (score desc, lhs, rhs) in both engines).
    *
    * Scale shape: the corpus cost is ONE word-count aggregate (map-side
    * combinable); the merge loop is O(topWords·maxWordLen·nMerges)
    * driver arithmetic on a bounded table — production WordPiece
    * trainers run on a capped word-type histogram the same way.
    * Returns (sorted final vocabulary, merge log). */
  private[graft] def wordpieceTrainModel(docs: DataFrame, textCol: String,
      topWords: Int, maxWordLen: Int, nMerges: Int)
      : (Seq[String], Seq[(Int, String, String, Long)]) = {
    val wc: Array[(String, Long)] = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(topWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    var states: Array[(String, Long)] = wc.map { case (w, c) =>
      val syms = w.substring(0, 1) +:
        w.substring(1).split("").filter(_.nonEmpty).map("##" + _)
      (syms.mkString("|", "|", "|"), c)
    }
    val vocab = scala.collection.mutable.HashSet.empty[String]
    states.foreach { case (s, _) =>
      s.split("\\|").filter(_.nonEmpty).foreach(vocab += _)
    }
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val fc = scala.collection.mutable.HashMap.empty[String, Long]
      states.foreach { case (s, c) =>
        val syms = s.split("\\|").filter(_.nonEmpty)
        syms.foreach(sym => fc.update(sym, fc.getOrElse(sym, 0L) + c))
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pc.update(k, pc.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val ((a, b), sq) = pc.iterator
          .map { case ((x, y), n) => ((x, y), n * 1048576L / (fc(x) * fc(y))) }
          .minBy { case ((x, y), s) => (-s, x, y) }
        val merged = a + (if (b.startsWith("##")) b.substring(2) else b)
        merges += ((step, a, b, sq))
        vocab += merged
        states = states.map { case (s, c) => (s.replace(s"|$a|$b|", s"|$merged|"), c) }
        step += 1
      }
    }
    (vocab.toSeq.sorted, merges.toSeq)
  }

  def qWordpieceTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    wordpieceTrainModel(t(spark, sfDir, "documents"), "text",
        topWords = 192, maxWordLen = 16, nMerges = 12)._2
      .toDF("step", "lhs", "rhs", "score_q")
      .select(col("step").cast("long"), col("lhs"), col("rhs"), col("score_q"))
      .orderBy("step")
  }

  /** The full WordPiece training run as a CTE chain (wpwc/wpst0 + per
    * round wpf_i symbol frequencies, wpp_i pair counts, wpm_i likelihood
    * argmax, wpst_i replace) — shared by the q_wordpiece_train and
    * q_wordpiece_encode oracles. MATERIALIZED for the same reason as the
    * BPE chain (each st_i is referenced multiple times). */
  private def wordpieceTrainSqlCtes(topWords: Int, maxWordLen: Int,
                                    nMerges: Int): String = {
    val rounds = (1 to nMerges).map { i =>
      s"""wpf$i AS MATERIALIZED (
         |  SELECT sym, CAST(sum(cnt) AS BIGINT) AS f FROM (
         |    SELECT unnest(list_filter(string_split(s, '|'), x -> x <> '')) AS sym, cnt
         |    FROM wpst${i - 1})
         |  GROUP BY 1),
         |wpp$i AS MATERIALIZED (
         |  SELECT syms[u.i] AS lhs, syms[u.i + 1] AS rhs, CAST(sum(cnt) AS BIGINT) AS pair_cnt
         |  FROM (SELECT list_filter(string_split(s, '|'), x -> x <> '') AS syms, cnt
         |        FROM wpst${i - 1}) t,
         |       LATERAL unnest(generate_series(1, len(syms) - 1)) AS u(i)
         |  GROUP BY 1, 2),
         |wpm$i AS MATERIALIZED (
         |  SELECT p.lhs, p.rhs,
         |         p.lhs || CASE WHEN p.rhs LIKE '##%' THEN substr(p.rhs, 3) ELSE p.rhs END AS merged,
         |         p.pair_cnt * 1048576 // (fa.f * fb.f) AS score_q
         |  FROM wpp$i p
         |  JOIN wpf$i fa ON fa.sym = p.lhs
         |  JOIN wpf$i fb ON fb.sym = p.rhs
         |  ORDER BY score_q DESC, p.lhs, p.rhs LIMIT 1),
         |wpst$i AS MATERIALIZED (
         |  SELECT replace(s,
         |           coalesce('|' || (SELECT lhs FROM wpm$i) || '|' || (SELECT rhs FROM wpm$i) || '|', '~~'),
         |           coalesce('|' || (SELECT merged FROM wpm$i) || '|', '~~')) AS s,
         |         cnt
         |  FROM wpst${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""wpwc AS MATERIALIZED (
       |  SELECT lower(t.w) AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents d,
       |       unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE regexp_matches(lower(t.w), '^[a-z]+$$')
       |    AND length(t.w) <= $maxWordLen
       |  GROUP BY 1 ORDER BY cnt DESC, w LIMIT $topWords),
       |wpst0 AS MATERIALIZED (
       |  SELECT '|' || substr(w, 1, 1) ||
       |         CASE WHEN length(w) > 1
       |              THEN '|##' || array_to_string(string_split(substr(w, 2), ''), '|##')
       |              ELSE '' END || '|' AS s,
       |         cnt
       |  FROM wpwc),
       |$rounds""".stripMargin
  }

  val qWordpieceTrainSql: String = {
    val nMerges = 12
    val unions = (1 to nMerges).map(i =>
      s"SELECT CAST($i AS BIGINT) AS step, lhs, rhs, score_q FROM wpm$i").mkString("\nUNION ALL\n")
    s"""WITH ${wordpieceTrainSqlCtes(topWords = 192, maxWordLen = 16,
          nMerges = nMerges)}
       |$unions
       |ORDER BY step""".stripMargin
  }

  /** WordPiece train → APPLY (round 15) — the BERT serving loop: learn
    * the vocabulary on the capped type histogram, then greedy-encode the
    * WHOLE corpus word stream (longest-match-first, `##` continuations,
    * unsegmentable words collapsing wholesale to `[UNK]`) and report the
    * top-40 resulting pieces. The encoder is the native codegen
    * [[graft.plans.WordPieceOps.encode]] kernel — the bounded vocabulary
    * rides the plan as a reference object. The `[UNK]` arm is REAL on
    * the corpus stream: a character that only ever appears word-initially
    * in the training histogram has no `##` form in the vocabulary, so a
    * corpus word using it mid-word cannot be segmented. The oracle
    * re-learns through the shared training CTEs, then replays the greedy
    * scan as an unrolled max-length chain over the word TYPES (occurrences
    * of a type share an encoding, so type-weighted counts equal the
    * per-occurrence stream). */
  def qWordpieceEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val vocab = wordpieceTrainModel(docs, "text", topWords = 192,
      maxWordLen = 16, nMerges = 12)._1
    docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 16)
      .select(explode(graft.plans.WordPieceExpressions
        .wordpieceEncode(col("w"), vocab)).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(40)
  }

  /** The greedy corpus-encode chain over a word-type table `awc(w, cnt)`
    * with the trained vocabulary: wpvocab (st0 alphabet + merge results),
    * the unrolled max-length steps `wpe_s(w, pos, piece, bad)` (pos =
    * offset AFTER the step — so each emitted piece spans
    * [pos − rawlen(piece), pos)), `wpeall`, and the `wpbad` wholesale-UNK
    * set — shared by the q_wordpiece_encode and q_tok_align oracles. */
  private def wordpieceApplyChainSql(maxWordLen: Int, nMerges: Int): String = {
    val vocabUnions = (1 to nMerges).map(i =>
      s"  SELECT merged AS piece FROM wpm$i").mkString("\n  UNION\n")
    val steps = (1 to maxWordLen).map { s =>
      val prev =
        if (s == 1) "(SELECT w, 0 AS pos, CAST(NULL AS VARCHAR) AS piece, false AS bad FROM awc)"
        else s"wpe_${s - 1}"
      s"""wpe_$s AS MATERIALIZED (
         |  SELECT b.w,
         |         CASE WHEN t.bl IS NULL THEN CAST(length(b.w) AS INT)
         |              ELSE CAST(b.pos + t.bl AS INT) END AS pos,
         |         CASE WHEN t.bl IS NULL THEN NULL
         |              WHEN b.pos = 0 THEN substr(b.w, 1, t.bl)
         |              ELSE '##' || substr(b.w, b.pos + 1, t.bl) END AS piece,
         |         t.bl IS NULL AS bad
         |  FROM $prev b, LATERAL (
         |    SELECT max(u.l) AS bl
         |    FROM unnest(generate_series(1, $maxWordLen)) AS u(l)
         |    WHERE b.pos + u.l <= length(b.w)
         |      AND EXISTS (SELECT 1 FROM wpvocab v WHERE v.piece =
         |            CASE WHEN b.pos = 0 THEN substr(b.w, 1, u.l)
         |                 ELSE '##' || substr(b.w, b.pos + 1, u.l) END)) t
         |  WHERE b.pos < length(b.w) AND NOT b.bad)""".stripMargin
    }.mkString(",\n")
    s"""wpvocab AS MATERIALIZED (
       |  SELECT DISTINCT piece FROM (
       |  SELECT unnest(list_filter(string_split(s, '|'), x -> x <> '')) AS piece FROM wpst0
       |  UNION
       |$vocabUnions)),
       |$steps,
       |wpeall AS MATERIALIZED (
       |  ${(1 to maxWordLen).map(s => s"SELECT w, pos, piece, bad FROM wpe_$s").mkString("\n  UNION ALL ")}),
       |wpbad AS MATERIALIZED (SELECT DISTINCT w FROM wpeall WHERE bad)""".stripMargin
  }

  val qWordpieceEncodeSql: String = {
    val maxWordLen = 16
    val nMerges = 12
    s"""WITH ${wordpieceTrainSqlCtes(topWords = 192, maxWordLen = maxWordLen,
          nMerges = nMerges)},
       |${awcSqlCte(maxWordLen)},
       |${wordpieceApplyChainSql(maxWordLen, nMerges)}
       |SELECT piece, cnt FROM (
       |  SELECT e.piece, CAST(sum(c.cnt) AS BIGINT) AS cnt
       |  FROM wpeall e JOIN awc c ON c.w = e.w
       |  WHERE e.piece IS NOT NULL AND e.w NOT IN (SELECT w FROM wpbad)
       |  GROUP BY 1
       |  UNION ALL
       |  SELECT '[UNK]' AS piece, CAST(sum(cnt) AS BIGINT) AS cnt
       |  FROM awc WHERE w IN (SELECT w FROM wpbad)
       |  HAVING sum(cnt) IS NOT NULL)
       |ORDER BY cnt DESC, piece LIMIT 40""".stripMargin
  }

  /** Tokenizer offset mapping (round 15) — the `offset_mapping` feature
    * every production tokenizer serves (HuggingFace tokenizers'
    * `Encoding.offsets`): span-labeling pipelines (NER, extractive QA)
    * must map token indices BACK to character spans after tokenization,
    * so the encoder emits (piece, start, end) per token. The kernel is
    * [[graft.plans.WordPieceOffsetOps]] — the greedy WordPiece encoder
    * with spans; a wholesale-`[UNK]` word maps to the single whole-word
    * span (0, len), exactly what an aligner needs to know it lost
    * sub-word resolution.
    *
    * Readout per lang (type-weighted, ≡ the occurrence stream): word and
    * piece counts, covered chars (must equal the word-char mass — spans
    * tile every word exactly, the alignment invariant), wholesale-UNK
    * words, and an offset checksum Σ(start·31 + end·7 + |piece|) that
    * breaks if any span drifts by one. The oracle re-learns the vocab
    * through the shared training CTEs and derives each span from the
    * shared greedy chain's (piece, pos) — start = pos − rawlen(piece). */
  def qTokAlign(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val vocab = wordpieceTrainModel(docs, "text", topWords = 192,
      maxWordLen = 16, nMerges = 12)._1
    val ps = graft.plans.WordPieceExpressions.wordpieceOffsets(col("w"), vocab)
    docs.select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) <= 16)
      .select(col("lang"), ps.as("ps"))
      .select(col("lang"),
        size(col("ps")).cast("long").as("np"),
        aggregate(col("ps"), lit(0L), (a, x) =>
          a + (x.getField("end") - x.getField("start")).cast("long")).as("cov"),
        when(element_at(col("ps"), 1).getField("piece") === "[UNK]", 1L)
          .otherwise(0L).as("unk"),
        aggregate(col("ps"), lit(0L), (a, x) =>
          a + x.getField("start").cast("long") * 31L
            + x.getField("end").cast("long") * 7L
            + length(x.getField("piece")).cast("long")).as("ck"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("np").as("n_pieces"),
        sum("cov").as("covered_chars"),
        sum("unk").as("n_unk_words"),
        sum("ck").as("offset_checksum"))
      .orderBy("lang")
  }

  val qTokAlignSql: String = {
    val maxWordLen = 16
    val nMerges = 12
    s"""WITH ${wordpieceTrainSqlCtes(topWords = 192, maxWordLen = maxWordLen,
          nMerges = nMerges)},
       |awcl AS MATERIALIZED (
       |  SELECT lang, lower(t.w) AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents d,
       |       unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE regexp_matches(lower(t.w), '^[a-z]+$$')
       |    AND length(t.w) <= $maxWordLen
       |  GROUP BY 1, 2),
       |awc AS MATERIALIZED (
       |  SELECT w, CAST(sum(cnt) AS BIGINT) AS cnt FROM awcl GROUP BY 1),
       |${wordpieceApplyChainSql(maxWordLen, nMerges)},
       |taspans AS MATERIALIZED (
       |  SELECT w, piece,
       |         CASE WHEN piece LIKE '##%' THEN pos - (length(piece) - 2)
       |              ELSE pos - length(piece) END AS s,
       |         pos AS e
       |  FROM wpeall
       |  WHERE piece IS NOT NULL AND w NOT IN (SELECT w FROM wpbad)
       |  UNION ALL
       |  SELECT w, '[UNK]', 0, CAST(length(w) AS INT) FROM wpbad),
       |tawagg AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS np,
       |         CAST(sum(e - s) AS BIGINT) AS cov,
       |         CAST(max(CASE WHEN piece = '[UNK]' THEN 1 ELSE 0 END) AS BIGINT) AS unk,
       |         CAST(sum(s * 31 + e * 7 + length(piece)) AS BIGINT) AS ck
       |  FROM taspans GROUP BY w)
       |SELECT l.lang,
       |       CAST(sum(l.cnt) AS BIGINT) AS n_words,
       |       CAST(sum(l.cnt * a.np) AS BIGINT) AS n_pieces,
       |       CAST(sum(l.cnt * a.cov) AS BIGINT) AS covered_chars,
       |       CAST(sum(l.cnt * a.unk) AS BIGINT) AS n_unk_words,
       |       CAST(sum(l.cnt * a.ck) AS BIGINT) AS offset_checksum
       |FROM awcl l JOIN tawagg a ON a.w = l.w
       |GROUP BY l.lang ORDER BY l.lang""".stripMargin
  }

  /** Dataset card (round 15) — the datasheet table every corpus RELEASE
    * ships (Datasheets for Datasets, Gebru et al. 2018; the composition
    * tables in the Pile/ROOTS/Dolma papers — public literature): one row
    * per (source, lang) cell with volume (docs, tokens, chars),
    * duplication (distinct text digests + the quantized dup rate), the
    * token-length DISTRIBUTION (exact p50/p90 under the q_percentile ≡
    * quantile_cont convention, Q20-quantized), and the content checksum
    * that makes the card verifiable against the corpus it describes.
    *
    * Scale shape: one narrow per-row projection into a (source, lang)
    * keyed two-phase aggregate — ~|sources|·|langs| output rows; the
    * exact percentiles are per-group sorted buffers over one group's
    * token counts (at 100 TB swap in approx_percentile: the card's
    * published numbers are the only consumers). */
  def qDatasetCard(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("source"), col("lang"),
        size(tokens(col("text"))).cast("long").as("ntok"),
        length(col("text")).cast("long").as("nchar"),
        md5(col("text").cast("binary")).as("tmd5"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("tmd5")).as("n_unique"),
        sum("ntok").as("token_mass"),
        sum("nchar").as("char_mass"),
        expr("percentile(ntok, array(0.5D, 0.9D))").as("tp"),
        sum(conv(substring(col("tmd5"), 1, 10), 16, 10).cast("long"))
          .as("text_checksum"))
      .select(col("source"), col("lang"), col("n_docs"), col("n_unique"),
        expr("((n_docs - n_unique) * 1048576L) div n_docs").as("dup_pct_q"),
        col("token_mass"), col("char_mass"),
        floor(col("tp").getItem(0) * 1048576).cast("long").as("p50_tokens_q"),
        floor(col("tp").getItem(1) * 1048576).cast("long").as("p90_tokens_q"),
        col("text_checksum"))
      .orderBy("source", "lang")

  val qDatasetCardSql: String =
    """WITH dcard AS (
      |  SELECT source, lang,
      |         len(list_filter(string_split(text, ' '), t -> t <> '')) AS ntok,
      |         length(text) AS nchar,
      |         md5(text) AS tmd5
      |  FROM documents)
      |SELECT source, lang,
      |       count(*) AS n_docs,
      |       CAST(count(DISTINCT tmd5) AS BIGINT) AS n_unique,
      |       ((count(*) - count(DISTINCT tmd5)) * 1048576) // count(*) AS dup_pct_q,
      |       CAST(sum(ntok) AS BIGINT) AS token_mass,
      |       CAST(sum(nchar) AS BIGINT) AS char_mass,
      |       CAST(floor(quantile_cont(ntok, 0.5) * 1048576) AS BIGINT) AS p50_tokens_q,
      |       CAST(floor(quantile_cont(ntok, 0.9) * 1048576) AS BIGINT) AS p90_tokens_q,
      |       CAST(sum(CAST('0x' || substr(tmd5, 1, 10) AS BIGINT)) AS BIGINT) AS text_checksum
      |FROM dcard GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The fixed blocklist for [[qBadwordsGate]] — sorted, distinct,
    * border-free (the [[graft.plans.AhoCorasick]] dictionary contract).
    * The oracle SQL is GENERATED from this list (the qUrlFilterSql
    * lesson: hand-copied literals silently desynchronize). The planted
    * arms: a common word (`slow`), a rare word (`dup`), two multi-word
    * phrases (`customer query`, `the line`), a nested chain
    * (`slow scan` fires `slow` and `scan` on the same span — the
    * output-link walk), and a boundary trap (`tab` occurs ONLY inside
    * `table`, so its boundary-checked count must be zero where a naive
    * substring count would be in the thousands). */
  private[graft] val BadwordTerms: Seq[String] = Seq(
    "customer query", "dup", "scan", "slow", "slow scan", "tab",
    "the line", "vector")

  /** Badword / gazetteer gate (round 15) — the C4 blocklist step
    * (Raffel et al. 2020 dropped any page containing a term from a fixed
    * public word list). ONE [[graft.plans.AhoCorasick]] automaton pass
    * per document counts every dictionary term simultaneously at word
    * boundaries — at 100 TB the scan cost is independent of dictionary
    * size, where the naive per-term regex plan multiplies the corpus
    * scan by |dict| (real blocklists run to thousands of terms).
    *
    * Readout, two row kinds under one schema (kind, key, n_matches,
    * n_docs): per TERM the corpus-wide match count and the number of
    * documents hit; per LANG the total matches and the number of
    * documents the gate would DROP (≥1 match — the C4 verdict). The
    * oracle replays every term as an independent `\b(term)\b` RE2 scan
    * over the same lowered text (exact by the border-free dictionary
    * contract — see the automaton scaladoc). */
  def qBadwordsGate(spark: SparkSession, sfDir: String): DataFrame =
    badwordsReadout(graft.CacheScope.cached(
      t(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"),
          graft.plans.AhoCorasickExpressions
            .badwordCounts(lower(col("text")), BadwordTerms).as("c"))))

  /** The (kind, key, n_matches, n_docs) readout over per-doc count rows
    * (doc_id, lang, c) — shared by the batch gate and the streaming twin
    * (whose per-doc rows arrive through a checkpointed stream). */
  private[graft] def badwordsReadout(perDoc: DataFrame): DataFrame = {
    val terms = BadwordTerms
    val termArr = array(terms.map(t => lit(t).as("term")): _*)
    val termRows = perDoc
      .select(explode(arrays_zip(termArr.as("term"), col("c").as("n"))).as("z"))
      .select(col("z.term").as("term"), col("z.n").as("n"))
      .groupBy("term")
      .agg(sum("n").as("n_matches"),
        sum(when(col("n") > 0, 1L).otherwise(0L)).as("n_docs"))
      .select(lit("term").as("kind"), col("term").as("key"),
        col("n_matches"), col("n_docs"))
    val langRows = perDoc
      .select(col("lang"),
        aggregate(col("c"), lit(0L), (a, x) => a + x).as("tot"))
      .groupBy("lang")
      .agg(sum("tot").as("n_matches"),
        sum(when(col("tot") > 0, 1L).otherwise(0L)).as("n_docs"))
      .select(lit("lang").as("kind"), col("lang").as("key"),
        col("n_matches"), col("n_docs"))
    termRows.unionAll(langRows).orderBy("kind", "key")
  }

  val qBadwordsGateSql: String = {
    val termValues = BadwordTerms.map(t => s"('$t')").mkString(", ")
    s"""WITH terms(term) AS (VALUES $termValues),
       |bw_hits AS MATERIALIZED (
       |  SELECT d.doc_id, d.lang, t.term,
       |         CAST(len(regexp_extract_all(lower(d.text), '\\b' || t.term || '\\b')) AS BIGINT) AS c
       |  FROM documents d CROSS JOIN terms t),
       |bw_term_rows AS (
       |  SELECT 'term' AS kind, term AS key, CAST(sum(c) AS BIGINT) AS n_matches,
       |         CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_docs
       |  FROM bw_hits GROUP BY term),
       |bw_perdoc AS (
       |  SELECT doc_id, lang, sum(c) AS tot FROM bw_hits GROUP BY 1, 2),
       |bw_lang_rows AS (
       |  SELECT 'lang' AS kind, lang AS key, CAST(sum(tot) AS BIGINT) AS n_matches,
       |         CAST(count(*) FILTER (WHERE tot > 0) AS BIGINT) AS n_docs
       |  FROM bw_perdoc GROUP BY lang)
       |SELECT * FROM bw_term_rows
       |UNION ALL SELECT * FROM bw_lang_rows
       |ORDER BY kind, key""".stripMargin
  }

  /** JSONL ingestion with poison-line quarantine — the crawl-dump format
    * every large text corpus actually arrives in, where some fraction of
    * lines is always malformed and a single bad line must cost a ROW, not
    * a job (the ingestion analog of the media decoders' poison policy).
    * The fixture round-trips `documents` through a real JSONL file and
    * plants one truncated-JSON line per 50 docs; the read uses PERMISSIVE
    * mode with an explicit `columnNameOfCorruptRecord`, so good rows parse
    * against the declared schema and bad lines land whole in the corrupt
    * column. Output: per-lang survivor count + char mass (proving the
    * JSON string round-trip lossless) and a `__corrupt__` row counting
    * the quarantined lines (proving none were silently dropped OR
    * silently parsed).
    *
    * Scale shape: text write and JSON scan are both partition-parallel,
    * schema projection reaches the JSON parser (no whole-record
    * materialization for unused fields), and the two aggregations are
    * two-phase over lang/constant keys. */
  /** CSV round-trip under HAZARD: per doc_id residue the text field is
    * salted with the four classic CSV killers — embedded delimiters,
    * embedded double-quotes, embedded NEWLINES (the one that breaks
    * naive line-splittable readers), and leading tabs / trailing commas —
    * written through Spark's real CSV writer (RFC-4180 quote doubling
    * via escape='"') and read back with `multiLine` + explicit schema.
    * Readout per lang: row count, char mass, and an exact integer
    * md5-prefix checksum of every field — the round-trip must be
    * byte-lossless, and the oracle recomputes all three straight from
    * `documents` (no file in the oracle's path, so any writer/reader
    * quoting bug breaks the hash).
    *
    * Scale shape: the hazard injection and checksum are row-local; the
    * write and read are embarrassingly parallel file IO. NOTE the real
    * 100 TB lesson this query pins: `multiLine` CSV is NOT splittable
    * (a quoted newline makes byte-range starts ambiguous), so each file
    * is one read task — the writer side controls parallelism via file
    * count, exactly how this query's write stage lays it out. */
  def qCsvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = new java.io.File(
      spark.conf.getOption("graft.streamWorkDir")
        .getOrElse(new java.io.File(sys.props("user.dir"), "target/csv_roundtrip").getAbsolutePath),
      new java.io.File(sfDir).getName + "_csv")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete()
    }
    rm(base)
    val dir = base.getAbsolutePath

    val hazard = t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        when(col("doc_id") % 5 === 1, concat(lit("a,b \"c\" "), col("text")))
          .when(col("doc_id") % 5 === 2, concat(lit("line1\n"), col("text")))
          .when(col("doc_id") % 5 === 3, concat(col("text"), lit(" trailing \"q\"")))
          .when(col("doc_id") % 5 === 4, concat(lit("\t"), col("text"), lit(",")))
          .otherwise(col("text")).as("t2"))
    // ignoreLeading/TrailingWhiteSpace default TRUE on the WRITER and
    // silently trim field edges — the leading-tab arm loses its first
    // char unless both are disabled (found by this query's own checksum)
    hazard.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    spark.read
      .schema("doc_id LONG, lang STRING, t2 STRING")
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      .csv(dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(length(col("t2"))).cast("long").as("char_mass"),
        // 10 hex digits (40 bits): a 5 M-doc lang sums to < 2^60 — the
        // 12-digit form would ANSI-overflow at the 1000× fixture
        sum(conv(graft.plans.HashExpressions.md5Prefix(col("t2"), 10), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("lang")
  }

  /** Oracle: hazards + checksum recomputed straight from `documents` —
    * lossless round-trip is the claim being hashed. */
  val qCsvRoundtripSql: String =
    """WITH hz AS (
      |  SELECT lang,
      |         CASE doc_id % 5
      |           WHEN 1 THEN 'a,b "c" ' || text
      |           WHEN 2 THEN 'line1' || chr(10) || text
      |           WHEN 3 THEN text || ' trailing "q"'
      |           WHEN 4 THEN chr(9) || text || ','
      |           ELSE text END AS t2
      |  FROM documents)
      |SELECT lang, count(*) AS n,
      |       CAST(sum(length(t2)) AS BIGINT) AS char_mass,
      |       CAST(sum(CAST('0x' || substr(md5(t2), 1, 10) AS BIGINT)) AS BIGINT) AS checksum
      |FROM hz GROUP BY lang ORDER BY lang""".stripMargin

  def qJsonlIngest(spark: SparkSession, sfDir: String): DataFrame = {
    val base = new java.io.File(
      spark.conf.getOption("graft.streamWorkDir")
        .getOrElse(new java.io.File(sys.props("user.dir"), "target/jsonl_ingest").getAbsolutePath),
      new java.io.File(sfDir).getName + "_jsonl")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete()
    }
    rm(base)
    val dir = base.getAbsolutePath

    val docs = t(spark, sfDir, "documents").select(col("doc_id"), col("lang"), col("text"))
    val good = docs.select(
      to_json(struct(col("doc_id"), col("lang"), col("text"))).as("line"))
    val bad = docs.filter(col("doc_id") % 50 === 0)
      .select(concat(lit("{\"doc_id\": "), col("doc_id"), lit(", \"lang\": ")).as("line"))
    good.unionByName(bad).write.mode("overwrite").text(dir)

    // Spark refuses to query ONLY the corrupt column off a raw JSON scan
    // (the parser would need the whole record anyway); caching the parsed
    // result is both the required form and the better plan — one parse
    // feeds the survivor and quarantine branches
    val parsed = graft.CacheScope.cached(spark.read
      .schema("doc_id LONG, lang STRING, text STRING, _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir))
    val goodAgg = parsed.filter(col("_corrupt").isNull)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(length(col("text"))).cast("long").as("char_mass"))
    val corrupt = parsed.filter(col("_corrupt").isNotNull)
      .agg(count(lit(1)).as("n"))
      .select(lit("__corrupt__").as("lang"), col("n"), lit(0L).as("char_mass"))
    goodAgg.unionByName(corrupt).orderBy("lang")
  }

  /** Oracle: the per-lang stats straight off `documents` (round-trip must
    * be lossless) plus the planted bad-line count. */
  val qJsonlIngestSql: String =
    """SELECT lang, count(*) AS n, CAST(sum(length(text)) AS BIGINT) AS char_mass
      |FROM documents GROUP BY lang
      |UNION ALL
      |SELECT '__corrupt__',
      |       (SELECT count(*) FROM documents WHERE doc_id % 50 = 0),
      |       CAST(0 AS BIGINT)
      |ORDER BY lang""".stripMargin

  /** Word-association mining: document-level co-occurrence lift
    * (normalized PMI without the log — `n·c(a,b) / (c(a)·c(b))`, a single
    * IEEE division of exact longs, so cross-engine bit-equal where log-PMI
    * would be libm-dependent) over the corpus top-32 vocabulary.
    *
    * Scale shape: the vocabulary restriction is what makes co-occurrence
    * mining survive 100 TB — unrestricted distinct-pair generation is
    * quadratic in document vocabulary; restricting to a K-token target
    * vocabulary bounds the pair fan-out at C(K,2) per doc and the
    * aggregation keyspace at C(K,2) total. Pairs are generated ROW-LOCALLY
    * (two nested Generates over the ≤K-element intersection array — no
    * doc-keyed self-join shuffle); the only exchanges are the two
    * vocabulary-bounded aggregations. The K-row vocab collect is the
    * bounded-driver-set pattern of q_vocab_oov/IVF. */
  def qCooccurLift(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val vocab: Array[String] = docs
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(32)
      .collect().map(_.getString(0))
    // corpus size from parquet footer metadata (the knn-family r14
    // pattern) — not a full-scan count() action at construction
    val nDocs = graft.Tables.parquetRowCount(spark, sfDir, "documents")
    val present = graft.CacheScope.cached(
      docs.select(col("doc_id"),
          array_intersect(array_distinct(tokens(col("text"))),
            lit(vocab)).as("vt"))
        .filter(size(col("vt")) > 0))
    val singles = present
      .select(explode(col("vt")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val pairs = present
      .select(explode(col("vt")).as("a"), col("vt"))
      .select(col("a"), explode(col("vt")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    pairs
      .join(singles.select(col("tok").as("a"), col("c").as("c_a")), Seq("a"))
      .join(singles.select(col("tok").as("b"), col("c").as("c_b")), Seq("b"))
      .select(col("a"), col("b"), col("c_ab"), col("c_a"), col("c_b"),
        ((lit(nDocs) * col("c_ab")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(20)
  }

  val qCooccurLiftSql: String =
    """WITH vocab AS (
      |  SELECT token FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE token <> ''
      |  GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 32),
      |inst AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
      |    FROM documents)),
      |vinst AS (SELECT i.doc_id, i.tok FROM inst i JOIN vocab v ON v.token = i.tok),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |ca AS (SELECT tok, count(*) AS c FROM vinst GROUP BY tok),
      |pairs AS (
      |  SELECT x.tok AS a, y.tok AS b, count(*) AS c_ab
      |  FROM vinst x JOIN vinst y ON x.doc_id = y.doc_id AND x.tok < y.tok
      |  GROUP BY 1, 2)
      |SELECT p.a, p.b, p.c_ab, ca.c AS c_a, cb.c AS c_b,
      |       CAST(n.n_docs * p.c_ab AS DOUBLE)
      |         / CAST(ca.c * cb.c AS DOUBLE) AS lift
      |FROM pairs p
      |JOIN ca ON ca.tok = p.a
      |JOIN ca cb ON cb.tok = p.b
      |CROSS JOIN n
      |ORDER BY lift DESC, p.a, p.b
      |LIMIT 20""".stripMargin

  /** Tokenizer fertility per language — the measurement a multilingual
    * corpus runs before committing a tokenizer: real BPE token count
    * (the frozen 16-merge table, [[bpeTokenCount]] kernel) against
    * whitespace words and raw chars, aggregated per language, with the
    * two ratios every fertility report quotes — BPE tokens per word and
    * chars per BPE token — quantized at 2^20 (the sums stay < 2^53, so
    * the DOUBLE divisions are IEEE-exact and the oracle replays them
    * bit-for-bit).
    *
    * Scale shape: both counters are one-pass row-local kernels
    * (`text_stats` + `bpe_token_count` — no tokenization materializes);
    * the rollup is a two-phase agg on the 5-value lang key. Scan-bound at
    * 100 TB. */
  def qTokFertility(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("lang"),
        graft.plans.TextStatsExpressions
          .textStats(col("text"), StopwordLists.map(_._2)).as("st"),
        bpeTokenCount(col("text")).as("bpe"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("st").getField("n_tokens")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"),
        sum(col("st").getField("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"),
        col("n_chars"),
        floor(col("bpe_tokens").cast("double") / col("ws_tokens").cast("double")
          * 1048576).cast("long").as("fertility_q"),
        floor(col("n_chars").cast("double") / col("bpe_tokens").cast("double")
          * 1048576).cast("long").as("chars_per_tok_q"))
      .orderBy("lang")

  val qTokFertilitySql: String =
    s"""WITH per AS (
       |  SELECT lang,
       |         len(list_filter(string_split(text, ' '), t -> t <> '')) AS ws,
       |         ${bpeTokenCountSql("text")} AS bpe,
       |         length(text) AS ch
       |  FROM documents),
       |agg AS (
       |  SELECT lang, count(*) AS n_docs,
       |         CAST(sum(ws) AS BIGINT) AS ws_tokens,
       |         CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
       |         CAST(sum(ch) AS BIGINT) AS n_chars
       |  FROM per GROUP BY lang)
       |SELECT lang, n_docs, ws_tokens, bpe_tokens, n_chars,
       |       CAST(floor(CAST(bpe_tokens AS DOUBLE) / CAST(ws_tokens AS DOUBLE)
       |            * 1048576) AS BIGINT) AS fertility_q,
       |       CAST(floor(CAST(n_chars AS DOUBLE) / CAST(bpe_tokens AS DOUBLE)
       |            * 1048576) AS BIGINT) AS chars_per_tok_q
       |FROM agg ORDER BY lang""".stripMargin

  /** The phrase set q_phrase_search probes — drawn from the fixture's
    * synthetic vocabulary so each phrase has a nontrivial hit count. */
  private val SearchPhrases: Seq[String] =
    Seq("big query", "slow hash batch", "table part", "value fast merge")

  /** Positional inverted-index phrase search: postings (doc_id, pos, term)
    * from one corpus explode, restricted up front to the terms of the
    * probe phrases; a k-term phrase matches where the k postings streams
    * equi-join on (doc_id, start) after each term's positions are shifted
    * back by its offset — the classic positional-index intersection,
    * expressed as joins so Catalyst picks the physical strategy. One row
    * per phrase: (phrase, n_docs, n_hits), with n_hits counting start
    * positions (overlapping occurrences included — the regex-count form
    * undercounts those).
    *
    * Scale shape: the corpus is scanned ONCE (the postings projection is
    * cached after the `term IN (phrase terms)` filter, so only matching
    * postings materialize — at 100 TB that filter is the whole game: a
    * 3-phrase probe retains a vocabulary-bounded sliver of the index);
    * each phrase's intersection then equi-joins on (doc_id, pos), which
    * co-partitions across all k streams, and the per-phrase rollup is a
    * two-row global agg. A standing index would bucket postings by term;
    * this query builds the same shape inline. */
  def qPhraseSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val allTerms = SearchPhrases.flatMap(_.split(' ')).distinct
    val postings = graft.CacheScope.cached(
      t(spark, sfDir, "documents")
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
        .filter(col("term").isin(allTerms: _*)))
    SearchPhrases.map { p =>
      val ts = p.split(' ')
      val start = postings.filter(col("term") === ts(0))
        .select(col("doc_id"), col("pos"))
      val matched = ts.zipWithIndex.drop(1).foldLeft(start) { case (cur, (term, i)) =>
        cur.join(postings.filter(col("term") === term)
          .select(col("doc_id"), (col("pos") - i).as("pos")), Seq("doc_id", "pos"))
      }
      matched.agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_hits"))
        .select(lit(p).as("phrase"), col("n_docs"), col("n_hits"))
    }.reduce(_ unionByName _).orderBy("phrase")
  }

  /** Oracle: the same positional intersection in DuckDB — 1-based list
    * positions over the identical empties-dropped token array. */
  val qPhraseSearchSql: String = {
    val arms = SearchPhrases.map { p =>
      val ts = p.split(' ')
      val joins = ts.zipWithIndex.drop(1).map { case (_, i) =>
        s"JOIN pos t$i ON t$i.doc_id = t0.doc_id AND t$i.p = t0.p + $i"
      }.mkString("\n  ")
      val conds = ts.zipWithIndex
        .map { case (term, i) => s"t$i.term = '$term'" }.mkString(" AND ")
      s"""SELECT '$p' AS phrase,
         |       count(DISTINCT t0.doc_id) AS n_docs, count(*) AS n_hits
         |FROM pos t0
         |  $joins
         |WHERE $conds""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS w
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, i AS p, w[i] AS term
       |  FROM toks, LATERAL unnest(generate_series(1, len(w))) AS g(i))
       |$arms
       |ORDER BY phrase""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_phrase_search" -> (qPhraseSearch _),
    "q_tok_fertility" -> (qTokFertility _),
    "q_cooccur_lift" -> (qCooccurLift _),
    "q_image_embed" -> (qImageEmbed _),
    "q_audio_embed" -> (qAudioEmbed _),
    "q_audio_vad" -> (qAudioVad _),
    "q_subword_vocab" -> (qSubwordVocab _),
    "q_bpe_encode" -> (qBpeEncode _),
    "q_bpe_train" -> (qBpeTrain _),
    "q_bpe_train_apply" -> (qBpeTrainApply _),
    "q_unigram_train" -> (qUnigramTrain _),
    "q_unigram_encode" -> (qUnigramEncode _),
    "q_wordpiece_train" -> (qWordpieceTrain _),
    "q_wordpiece_encode" -> (qWordpieceEncode _),
    "q_badwords_gate" -> (qBadwordsGate _),
    "q_tok_align" -> (qTokAlign _),
    "q_dataset_card" -> (qDatasetCard _),
    "q_tokenizer_compare" -> (qTokenizerCompare _),
    "q_jsonl_ingest" -> (qJsonlIngest _),
    "q_csv_roundtrip" -> (qCsvRoundtrip _),
    "q_pii_redact" -> (qPiiRedact _),
    "q_fix_encoding" -> (qFixEncoding _),
    "q_unicode_nfc" -> (qUnicodeNfc _),
    "q_sentence_split" -> (qSentenceSplit _),
    "q_frame_sample" -> (qFrameSample _),
    "q_image_neardup" -> (qImageNearDup _),
    "q_temperature_sample" -> (qTemperatureSample _),
    "q_kfold" -> (qKfold _),
    "q_feature_hash" -> (qFeatureHash _),
    "q_quality_classify" -> (qQualityClassify _),
    "q_tree_train" -> (qTreeTrain _),
    "q_regex_array" -> (qRegexArray _),
    "q_tfidf" -> (qTfidf _),
    "q_bm25" -> (qBm25 _),
    "q_bigram_score" -> (qBigramScore _),
    "q_lm_perplexity" -> (qLmPerplexity _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_repetition" -> (qRepetition _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_doc_chunk" -> (qDocChunk _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_vocab_oov" -> (qVocabOov _),
    "q_quality_gates" -> (qQualityGates _),
    "q_lateral" -> (qLateral _),
    "q_text_tokens" -> (qTextTokens _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_lang_id" -> (qLangId _),
    "q_langid_train" -> (qLangidTrain _),
    "q_quality_score" -> (qQualityScore _),
    "q_fingerprint" -> (qFingerprint _),
    "q_binary_meta" -> (qBinaryMeta _))

  val oracles: Map[String, String] = Map(
    "q_phrase_search" -> qPhraseSearchSql,
    "q_tok_fertility" -> qTokFertilitySql,
    "q_cooccur_lift" -> qCooccurLiftSql,
    "q_image_embed" -> qImageEmbedSql,
    "q_audio_embed" -> qAudioEmbedSql,
    "q_audio_vad" -> qAudioVadSql,
    "q_subword_vocab" -> qSubwordVocabSql,
    "q_bpe_encode" -> qBpeEncodeSql,
    "q_bpe_train" -> qBpeTrainSql,
    "q_bpe_train_apply" -> qBpeTrainApplySql,
    "q_unigram_train" -> qUnigramTrainSql,
    "q_unigram_encode" -> qUnigramEncodeSql,
    "q_wordpiece_train" -> qWordpieceTrainSql,
    "q_wordpiece_encode" -> qWordpieceEncodeSql,
    "q_badwords_gate" -> qBadwordsGateSql,
    "q_tok_align" -> qTokAlignSql,
    "q_dataset_card" -> qDatasetCardSql,
    "q_tokenizer_compare" -> qTokenizerCompareSql,
    "q_jsonl_ingest" -> qJsonlIngestSql,
    "q_csv_roundtrip" -> qCsvRoundtripSql,
    "q_pii_redact" -> qPiiRedactSql,
    "q_fix_encoding" -> qFixEncodingSql,
    "q_unicode_nfc" -> qUnicodeNfcSql,
    "q_sentence_split" -> qSentenceSplitSql,
    "q_frame_sample" -> qFrameSampleSql,
    "q_image_neardup" -> qImageNearDupSql,
    "q_temperature_sample" -> qTemperatureSampleSql,
    "q_kfold" -> qKfoldSql,
    "q_feature_hash" -> qFeatureHashSql,
    "q_quality_classify" -> qQualityClassifySql,
    "q_tree_train" -> qTreeTrainSql,
    "q_regex_array" -> qRegexArraySql,
    "q_tfidf" -> qTfidfSql,
    "q_bm25" -> qBm25Sql,
    "q_bigram_score" -> qBigramScoreSql,
    "q_lm_perplexity" -> qLmPerplexitySql,
    "q_boilerplate" -> qBoilerplateSql,
    "q_repetition" -> qRepetitionSql,
    "q_decontaminate" -> qDecontaminateSql,
    "q_pack_sequences" -> qPackSequencesSql,
    "q_doc_chunk" -> qDocChunkSql,
    "q_weighted_sample" -> qWeightedSampleSql,
    "q_vocab_oov" -> qVocabOovSql,
    "q_quality_gates" -> qQualityGatesSql,
    "q_lateral" -> qLateralSql,
    "q_text_tokens" -> qTextTokensSql,
    "q_dedup_exact" -> qDedupExactSql,
    "q_lang_id" -> qLangIdSql,
    "q_langid_train" -> qLangidTrainSql,
    "q_quality_score" -> qQualityScoreSql,
    "q_fingerprint" -> qFingerprintSql,
    "q_binary_meta" -> qBinaryMetaSql)
}
