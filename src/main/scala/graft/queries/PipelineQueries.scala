package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** The end-to-end training-data curation cascade — the composition every
  * 100 TB corpus pipeline runs, here as ONE oracle-checked query:
  *
  *   language-ID → quality filter → exact dedup → MinHash-LSH near-dedup
  *   → per-language corpus stats
  *
  * Each stage is an already-verified building block (q_lang_id,
  * q_quality_score, q_dedup_exact, q_dedup_cascade); the pipeline query
  * pins their COMPOSITION — filters applied before dedup, winners chosen
  * deterministically (min doc_id), near-dup candidates generated only
  * within the filtered survivor set — against a DuckDB oracle built from
  * the same SQL fragments.
  *
  * Scale shape: stages 1–2 are narrow per-row expressions fused into the
  * scan; exact dedup is one hash aggregation; near-dedup is the bucketed
  * candidates-then-verify cascade (never all-pairs); the final stats are
  * one map-side-combinable aggregation. Nothing touches the driver.
  */
object PipelineQueries {

  val QualityMin = 0.45
  val JaccardMin = 0.5

  def qCurationPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("toks"))
    // language-identifiability + quality gate (docs whose language the
    // heuristic cannot place at all are dropped, like a real cleaning run);
    // stats are reported per LABELED lang so the breakdown stays multi-row
    // even though the synthetic text skews the heuristic toward 'en'
    val filtered = TextQueries.withLangScores(docs)
      .withColumn("pred_lang", TextQueries.predLangCol)
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("quality") >= QualityMin && col("pred_lang") =!= "und")
      .select("doc_id", "lang", "text", "quality")
    // exact dedup IS dedupeNear's internal exact-collapse (min-id winner
    // per md5(text) — the identical rule exactByContent applies), so the
    // cascade feeds `filtered` straight in: a separate exactByContent
    // stage re-hashed and re-shuffled the corpus to collapse groups the
    // collapse step inside dedupeNear collapses anyway (r15 opt round;
    // oracle hash unchanged — the winners CTE replays the same rule).
    val kept = Dedup.dedupeNear(filtered, "doc_id", "text", n = 3, minJaccard = JaccardMin)
    kept
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), dsum(col("quality")).as("sum_quality"))
      .orderBy("lang")
  }

  /** Oracle: identical stages from the shared SQL fragments. */
  lazy val qCurationPipelineSql: String =
    s"""WITH ${TextQueries.langScoredSqlCte("documents")},
       |enriched AS (
       |  SELECT doc_id, lang, text,
       |         ${TextQueries.predLangSqlExpr} AS pred_lang,
       |         ${TextQueries.qualitySqlExpr} AS quality
       |  FROM scored),
       |filtered AS (
       |  SELECT * FROM enriched
       |  WHERE quality >= $QualityMin AND pred_lang <> 'und'),
       |winners AS (
       |  SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)),
       |fdocs AS (
       |  SELECT f.* FROM filtered f JOIN winners w ON w.doc_id = f.doc_id),
       |${DedupQueries.minhashSqlCtes("fdocs")},
       |${DedupQueries.losersSqlCtes(JaccardMin)}
       |SELECT lang, count(*) AS n_kept,
       |       CAST(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_quality
       |FROM fdocs
       |WHERE doc_id NOT IN (SELECT d2 FROM losers)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Deterministic 25% corpus sample (md5 gate < '4'): per-lang totals,
    * sampled counts, and the sampled text length — the reproducible-split
    * primitive every training pipeline needs, with the subset itself
    * oracle-checked (both engines gate on the same md5). Membership is
    * folded into conditional aggregates, so totals AND sampled stats come
    * from ONE scan + one shuffle on lang — not scan + scan + join. */
  def qSampleDeterministic(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val gate = graft.operators.Sampling.gateBelow(col("text"), "4")
    docs.groupBy("lang").agg(
        count(lit(1)).as("n_total"),
        count_if(gate).as("n_sampled"),
        coalesce(sum(when(gate, length(col("text")).cast("long"))), lit(0L))
          .as("sampled_chars"))
      .orderBy("lang")
  }

  val qSampleDeterministicSql: String =
    """WITH s AS (
      |  SELECT lang, count(*) AS n_sampled,
      |         CAST(sum(length(text)) AS BIGINT) AS sampled_chars
      |  FROM documents WHERE substr(md5(text), 1, 1) < '4'
      |  GROUP BY lang)
      |SELECT d.lang, count(*) AS n_total,
      |       CAST(COALESCE(any_value(s.n_sampled), 0) AS BIGINT) AS n_sampled,
      |       CAST(COALESCE(any_value(s.sampled_chars), 0) AS BIGINT) AS sampled_chars
      |FROM documents d LEFT JOIN s ON d.lang = s.lang
      |GROUP BY d.lang ORDER BY d.lang""".stripMargin

  /** Per-language sampling rates for the stratified split: downsample the
    * over-represented `en` stratum hard, keep mid-size languages at 50%,
    * `zh` at 25%. Hex-prefix thresholds, rate = value/16. */
  private val StratThresholds: Map[String, String] = Map(
    "en" -> "2", "de" -> "8", "es" -> "8", "fr" -> "8", "zh" -> "4")

  /** Stratified deterministic sample: a per-language md5-gate threshold
    * (rebalancing the corpus toward rare languages) applied as ONE
    * row-local CASE gate folded into conditional aggregates — single
    * scan, one shuffle on lang, engine-portable, stable under
    * repartitioning. Reports per-lang totals vs sampled. */
  def qSampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val gate = graft.operators.Sampling.stratifiedGate(
      col("text"), col("lang"), StratThresholds)
    docs.groupBy("lang").agg(
        count(lit(1)).as("n_total"),
        count_if(gate).as("n_sampled"),
        coalesce(sum(when(gate, length(col("text")).cast("long"))), lit(0L))
          .as("sampled_chars"))
      .orderBy("lang")
  }

  val qSampleStratifiedSql: String = {
    val arms = StratThresholds.toSeq.sortBy(_._1)
      .map { case (l, thr) =>
        s"WHEN lang = '$l' THEN substr(md5(text), 1, ${thr.length}) < '$thr'" }
      .mkString(" ")
    s"""WITH s AS (
       |  SELECT lang, count(*) AS n_sampled,
       |         CAST(sum(length(text)) AS BIGINT) AS sampled_chars
       |  FROM documents WHERE CASE $arms ELSE FALSE END
       |  GROUP BY lang)
       |SELECT d.lang, count(*) AS n_total,
       |       CAST(COALESCE(any_value(s.n_sampled), 0) AS BIGINT) AS n_sampled,
       |       CAST(COALESCE(any_value(s.sampled_chars), 0) AS BIGINT) AS sampled_chars
       |FROM documents d LEFT JOIN s ON d.lang = s.lang
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  /** The FULL training-data prep line, curation through batch prep, as one
    * oracle-checked query:
    *
    *   lang/quality gate → exact dedup → benchmark decontamination
    *   (drop eval docs and anything sharing a 5-gram with them) →
    *   sharded 2048-token sequence packing → per-shard pack stats
    *
    * Every stage is an individually-verified block (q_curation_pipeline,
    * q_dedup_exact, q_decontaminate, q_pack_sequences); this pins the
    * composition: dedup before decontamination (winners only), the
    * benchmark set built from the FULL corpus (an eval doc that was
    * quality-filtered still contaminates), packing only over clean
    * survivors.
    *
    * Scale shape: narrow gates fused into the scan → one hash agg → one
    * broadcast semi/anti pair on the benchmark n-grams → per-shard
    * running-offset window. No stage is quadratic; nothing is
    * driver-side. */
  def qPrepPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"), tokens(col("text")).as("toks"))
    val filtered = TextQueries.withLangScores(docs)
      .withColumn("pred_lang", TextQueries.predLangCol)
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("quality") >= QualityMin && col("pred_lang") =!= "und")
      .select("doc_id", "text")
    val exact = Dedup.exactByContent(filtered, "doc_id", "text")
    // benchmark 5-grams from the FULL corpus — contamination does not care
    // whether the eval doc itself survived the quality gate
    val shAll = graft.CacheScope.cached(Dedup.shingleSets(
      t(spark, sfDir, "documents"), "doc_id", "text", n = 5))
    val bench = shAll.filter(pmod(col("id"), lit(7L)) === 0)
      .select(col("sh")).distinct()
    val contaminated = shAll.join(broadcast(bench), Seq("sh"), "left_semi")
      .select(col("id").as("doc_id")).distinct()
    val clean = exact.filter(pmod(col("doc_id"), lit(7L)) =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    clean
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tokens"),
        pmod(col("doc_id"), lit(32L)).as("shard"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", (col("start_offset") / lit(2048L)).cast("long"))
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .orderBy("shard", "pack_id")
  }

  lazy val qPrepPipelineSql: String =
    s"""WITH ${TextQueries.langScoredSqlCte("documents")},
       |enriched AS (
       |  SELECT doc_id, text,
       |         ${TextQueries.predLangSqlExpr} AS pred_lang,
       |         ${TextQueries.qualitySqlExpr} AS quality
       |  FROM scored),
       |filtered AS (
       |  SELECT doc_id, text FROM enriched
       |  WHERE quality >= $QualityMin AND pred_lang <> 'und'),
       |winners AS (
       |  SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)),
       |fdocs AS (
       |  SELECT f.* FROM filtered f JOIN winners w ON w.doc_id = f.doc_id),
       |toks5 AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM documents),
       |shg AS (
       |  SELECT DISTINCT doc_id,
       |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4] AS sh
       |  FROM toks5, LATERAL unnest(generate_series(1, len(tk) - 4)) AS t(i)),
       |bench AS (SELECT DISTINCT sh FROM shg WHERE doc_id % 7 = 0),
       |contaminated AS (
       |  SELECT DISTINCT doc_id FROM shg WHERE sh IN (SELECT sh FROM bench)),
       |clean AS (
       |  SELECT * FROM fdocs
       |  WHERE doc_id % 7 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
       |sized AS (
       |  SELECT doc_id,
       |         len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       |         doc_id % 32 AS shard
       |  FROM clean),
       |offs AS (
       |  SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |                                ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
       |  FROM sized)
       |SELECT shard, CAST(start_offset // 2048 AS BIGINT) AS pack_id,
       |       count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
       |FROM offs
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Per-source document cap — the "domain cap" every web-corpus recipe
    * applies (bound any single domain's share of the training mix). Keeps
    * the `SourceCap` deterministically-first docs per source, ranked by
    * md5(doc_id) (a content-independent pseudo-random order, rerun-stable
    * on any engine), and reports per-source totals vs kept mass.
    *
    * Scale shape: the rank-filter branch plans as WindowGroupLimit
    * (Spark 3.5+) — each map task keeps only its local top-`SourceCap`
    * rows per source BEFORE the shuffle, so the exchange carries
    * ≤ tasks×sources×cap rows no matter how hot a source is. Totals come
    * from a separate map-side-combinable count; both aggregates are
    * |sources| rows, joined tiny-to-tiny. */
  val SourceCap = 50

  def qSourceCap(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), length(col("text")).cast("long").as("n_chars"))
    val key = md5(col("doc_id").cast("string").cast("binary"))
    val w = Window.partitionBy(col("source")).orderBy(key, col("doc_id"))
    val kept = docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= SourceCap)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
    val totals = docs.groupBy("source").agg(count(lit(1)).as("n_total"))
    totals.join(kept, Seq("source"))
      .select("source", "n_total", "n_kept", "kept_chars")
      .orderBy("source")
  }

  val qSourceCapSql: String =
    s"""WITH ranked AS (
       |  SELECT source, length(text) AS n_chars,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM documents),
       |kept AS (
       |  SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS kept_chars
       |  FROM ranked WHERE rn <= $SourceCap GROUP BY source),
       |tot AS (SELECT source, count(*) AS n_total FROM documents GROUP BY source)
       |SELECT t.source, t.n_total, k.n_kept, k.kept_chars
       |FROM tot t JOIN kept k ON k.source = t.source
       |ORDER BY t.source""".stripMargin

  /** Per-DOMAIN quota capping over NORMALIZED URLs (round 12) — the web
    * half of the quota family ([[qSourceCap]] caps by source label; real
    * crawl pipelines cap by registrable domain so boilerplate-heavy sites
    * can't dominate): deterministic URLs are injected from doc_id (the
    * PII-injection convention) with a PLANTED skew — site index
    * floor(sqrt(doc_id % 961)) gives site s density ∝ 2s+1, so big sites
    * genuinely overflow the cap while small ones don't — and three
    * rotating subdomains that must COLLAPSE under
    * [[graft.operators.Sampling.registrableDomain]] normalization
    * (w0.siteN.com ≡ w2.siteN.com). Keep rule: the
    * [[graft.operators.Sampling.domainCap]] lowest-content-hash quota
    * (deterministic, engine-portable). Readout per domain: total docs,
    * distinct hosts (proves the collapse), kept count, and the exact SUM
    * of kept doc_ids — pinning the exact kept SET, not just its size.
    *
    * Scale shape: the kept branch's rank ≤ k plans as WindowGroupLimit
    * (map-side per-domain k-heaps — a mega-domain ships ≤ k rows per map
    * task); the totals branch is one two-phase aggregate. Both branches
    * are narrow column scans; only |domains|-sized tables join. */
  val DomainCap = 8
  def qDomainCap(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sampling
    // r13: a third of the sites live under MULTI-LABEL public suffixes —
    // the PSL arm. Under the old two-label rule every *.co.uk host would
    // collapse into ONE "co.uk" domain (capping a whole country registry
    // as a single site); the PSL-backed rule keeps siteN.co.uk distinct.
    // r14: the fixture plants EVERY PSL rule class (the r13 semantics
    // gap), each with a distinct normalization shape the readout proves:
    //   .co.uk / .com.au   normal 2-label  → siteN.co.uk     (w* collapse)
    //   .kawasaki.jp       wildcard *.x.jp → wM.siteN.…      (NO collapse:
    //                      each child of the base is its own suffix)
    //   .www.ck            exception !www.ck → ONE domain "www.ck" for
    //                      the whole arm (registrable despite *.ck)
    //   .ck                wildcard *.ck   → wM.siteN.ck     (no collapse)
    //   .github.io         PRIVATE section → siteN.github.io (w* collapse
    //                      — without it ALL of GitHub Pages is 1 domain)
    //   .k12.ca.us         normal 3-label  → siteN.k12.ca.us (w* collapse)
    val tld = when(col("doc_id") % 9 === 2, lit(".co.uk"))
      .when(col("doc_id") % 9 === 3, lit(".com.au"))
      .when(col("doc_id") % 9 === 4, lit(".kawasaki.jp"))
      .when(col("doc_id") % 9 === 5, lit(".www.ck"))
      .when(col("doc_id") % 9 === 6, lit(".ck"))
      .when(col("doc_id") % 9 === 7, lit(".github.io"))
      .when(col("doc_id") % 9 === 8, lit(".k12.ca.us"))
      .otherwise(lit(".com"))
    val url = concat(lit("https://w"), (col("doc_id") % 3).cast("string"),
      lit(".site"),
      floor(sqrt((col("doc_id") % 961).cast("double"))).cast("long").cast("string"),
      tld, lit("/p/"), col("doc_id").cast("string"))
    val withUrl = t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), url.as("url"))
    val kept = Sampling.domainCap(withUrl, "doc_id", "url", "text", DomainCap)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_kept"), sum(col("id")).as("kept_id_sum"))
    val host = Sampling.urlHost(col("url"))
    val totals = withUrl
      .select(host.as("host"), Sampling.registrableDomain(host).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("host")).as("n_hosts"))
    totals.join(kept, Seq("domain"))
      .select(col("domain"), col("n_docs"), col("n_hosts"),
        col("n_kept"), col("kept_id_sum"))
      .orderBy("domain")
  }

  /** Oracle: URL build, host split, PSL eTLD+1 normalization — the ENTIRE
    * precedence-ordered rule chain (exceptions, wildcards, 3/2-label
    * normal rules) replayed as a CASE generated from the same
    * [[graft.operators.PublicSuffixes.RuleChain]] the engine evaluates —
    * hash-priority rank and both funnels replayed relationally. */
  val qDomainCapSql: String =
    s"""WITH u AS (
       |  SELECT doc_id, text,
       |         'https://w' || CAST(doc_id % 3 AS VARCHAR) || '.site'
       |           || CAST(CAST(floor(sqrt(CAST(doc_id % 961 AS DOUBLE))) AS BIGINT) AS VARCHAR)
       |           || CASE WHEN doc_id % 9 = 2 THEN '.co.uk'
       |                   WHEN doc_id % 9 = 3 THEN '.com.au'
       |                   WHEN doc_id % 9 = 4 THEN '.kawasaki.jp'
       |                   WHEN doc_id % 9 = 5 THEN '.www.ck'
       |                   WHEN doc_id % 9 = 6 THEN '.ck'
       |                   WHEN doc_id % 9 = 7 THEN '.github.io'
       |                   WHEN doc_id % 9 = 8 THEN '.k12.ca.us'
       |                   ELSE '.com' END
       |           || '/p/' || CAST(doc_id AS VARCHAR) AS url
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, text,
       |         string_split(string_split(url, '://')[2], '/')[1] AS host
       |  FROM u),
       |hp AS (
       |  SELECT doc_id, text, host, string_split(host, '.') AS p FROM h),
       |d AS (
       |  SELECT doc_id, text, host,
       |         ${graft.operators.PublicSuffixes.sqlDomainCase(k =>
                   s"array_to_string(list_slice(p, greatest(len(p) - ${k - 1}, 1), len(p)), '.')")} AS domain
       |  FROM hp),
       |r AS (
       |  SELECT doc_id, domain,
       |         row_number() OVER (PARTITION BY domain
       |                            ORDER BY substr(md5(text), 1, 15), doc_id) AS rnk
       |  FROM d),
       |kept AS (
       |  SELECT domain, count(*) AS n_kept,
       |         CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
       |  FROM r WHERE rnk <= $DomainCap GROUP BY domain),
       |tot AS (
       |  SELECT domain, count(*) AS n_docs,
       |         CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
       |  FROM d GROUP BY domain)
       |SELECT t.domain, t.n_docs, t.n_hosts, k.n_kept, k.kept_id_sum
       |FROM tot t JOIN kept k ON k.domain = t.domain
       |ORDER BY t.domain""".stripMargin

  /** Crawl-curation URL gate (round 14) — the UT1-blocklist-shaped filter
    * every web pipeline runs BEFORE content filters
    * ([[graft.operators.Sampling.urlVerdict]]): scheme/port sanity, then
    * blocklists by PSL registrable domain (one entry kills every host
    * under the domain — the gate is PSL-backed for exactly this reason),
    * host substring, and path substring, first-match precedence. URLs are
    * the deterministic doc_id generator with a planted arm per rule
    * class: `ftp://` schemes (%11), `:8080` ports (%13=5) plus ALLOWED
    * `:443` ports that must pass (%13=6), the full PSL tld rotation (%9 —
    * so blocking `www.ck` exercises the exception rule), `ads.`
    * subdomains (%17), and `/ads/` paths (%7). Readout: the funnel —
    * (stage, n_urls, id_sum) for each reject class + kept — AND a
    * `kept_capped` row composing the kept side straight into
    * [[graft.operators.Sampling.domainCap]] (the gate's production
    * position in front of the quota cap); id sums pin the exact
    * partition, not just its sizes.
    *
    * Scale shape: the verdict is pure string ops + InSet probes inside
    * whole-stage codegen — row-local, zero shuffle, a free rider on the
    * ingest scan; the funnel is one map-side-combinable aggregate over a
    * 7-value key; the cap branch inherits q_domain_cap's WindowGroupLimit
    * shape (≤ cap rows per domain per map task reach the exchange). A
    * multi-million-entry UT1 snapshot swaps the InSet for a broadcast
    * semi-join at the documented seam in [[graft.operators.Sampling.UrlRules]]. */
  val UrlFilterRules = graft.operators.Sampling.UrlRules(
    blockedDomains = Seq("site3.com", "site5.co.uk", "www.ck"),
    blockedHostTokens = Seq("ads."),
    blockedPathTokens = Seq("/ads/"))

  def qUrlFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sampling
    val site = floor(sqrt((col("doc_id") % 961).cast("double"))).cast("long").cast("string")
    val tld = when(col("doc_id") % 9 === 2, lit(".co.uk"))
      .when(col("doc_id") % 9 === 3, lit(".com.au"))
      .when(col("doc_id") % 9 === 4, lit(".kawasaki.jp"))
      .when(col("doc_id") % 9 === 5, lit(".www.ck"))
      .when(col("doc_id") % 9 === 6, lit(".ck"))
      .when(col("doc_id") % 9 === 7, lit(".github.io"))
      .when(col("doc_id") % 9 === 8, lit(".k12.ca.us"))
      .otherwise(lit(".com"))
    val scheme = when(col("doc_id") % 11 === 4, lit("ftp")).otherwise(lit("https"))
    val sub = when(col("doc_id") % 17 === 6, lit("ads.w")).otherwise(lit("w"))
    val port = when(col("doc_id") % 13 === 5, lit(":8080"))
      .when(col("doc_id") % 13 === 6, lit(":443"))
      .otherwise(lit(""))
    val pathc = when(col("doc_id") % 7 === 3,
        concat(lit("/ads/track/"), col("doc_id").cast("string")))
      .otherwise(concat(lit("/p/"), col("doc_id").cast("string")))
    val url = concat(scheme, lit("://"), sub, (col("doc_id") % 3).cast("string"),
      lit(".site"), site, tld, port, pathc)
    val judged = graft.CacheScope.cached(
      t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), url.as("url"))
        .withColumn("stage", Sampling.urlVerdict(col("url"), UrlFilterRules)))
    val funnel = judged.groupBy("stage")
      .agg(count(lit(1)).as("n_urls"), sum(col("doc_id")).as("id_sum"))
    val capped = Sampling.domainCap(
        judged.filter(col("stage") === "kept"), "doc_id", "url", "text", DomainCap)
      .agg(count(lit(1)).as("n_urls"), sum(col("id")).as("id_sum"))
      .select(lit("kept_capped").as("stage"), col("n_urls"), col("id_sum"))
    funnel.union(capped).orderBy("stage")
  }

  /** Oracle: URL build, the split discipline (scheme/hostport/host/port/
    * path), the PSL CASE generated from the engine's own rule chain, the
    * first-match verdict CASE, both funnels. */
  val qUrlFilterSql: String = {
    def sqlSet(s: Seq[String]) = s.sorted.map(x => s"'$x'").mkString(", ")
    // token arms GENERATED from the engine's rule object, like sqlSet for
    // the set-valued rules — editing UrlFilterRules can never silently
    // desynchronize the oracle (r14 advice: the host/path tokens were
    // hardcoded literals here)
    def anyContains(sqlExpr: String, ts: Seq[String]) =
      if (ts.isEmpty) "FALSE"
      else ts.sorted.map(t => s"contains($sqlExpr, '$t')").mkString(" OR ")
    val hostArm = anyContains("host", UrlFilterRules.blockedHostTokens)
    val pathArm = anyContains(
      "substr(string_split(url, '://')[2], " +
        "length(string_split(string_split(url, '://')[2], '/')[1]) + 1)",
      UrlFilterRules.blockedPathTokens)
    s"""WITH u AS (
       |  SELECT doc_id, text,
       |         (CASE WHEN doc_id % 11 = 4 THEN 'ftp' ELSE 'https' END)
       |           || '://'
       |           || (CASE WHEN doc_id % 17 = 6 THEN 'ads.w' ELSE 'w' END)
       |           || CAST(doc_id % 3 AS VARCHAR) || '.site'
       |           || CAST(CAST(floor(sqrt(CAST(doc_id % 961 AS DOUBLE))) AS BIGINT) AS VARCHAR)
       |           || CASE WHEN doc_id % 9 = 2 THEN '.co.uk'
       |                   WHEN doc_id % 9 = 3 THEN '.com.au'
       |                   WHEN doc_id % 9 = 4 THEN '.kawasaki.jp'
       |                   WHEN doc_id % 9 = 5 THEN '.www.ck'
       |                   WHEN doc_id % 9 = 6 THEN '.ck'
       |                   WHEN doc_id % 9 = 7 THEN '.github.io'
       |                   WHEN doc_id % 9 = 8 THEN '.k12.ca.us'
       |                   ELSE '.com' END
       |           || CASE WHEN doc_id % 13 = 5 THEN ':8080'
       |                   WHEN doc_id % 13 = 6 THEN ':443' ELSE '' END
       |           || CASE WHEN doc_id % 7 = 3 THEN '/ads/track/' || CAST(doc_id AS VARCHAR)
       |                   ELSE '/p/' || CAST(doc_id AS VARCHAR) END AS url
       |  FROM documents),
       |parts AS (
       |  SELECT doc_id, text, url,
       |         string_split(url, '://')[1] AS scheme,
       |         string_split(string_split(url, '://')[2], '/')[1] AS hostport,
       |         string_split(url, '://')[2] AS rest
       |  FROM u),
       |parts2 AS (
       |  SELECT doc_id, text, url, scheme, hostport,
       |         string_split(hostport, ':')[1] AS host,
       |         string_split(hostport, ':')[-1] AS port,
       |         substr(rest, length(hostport) + 1) AS path
       |  FROM parts),
       |judged AS (
       |  SELECT doc_id, text, url, host,
       |         ${graft.operators.PublicSuffixes.sqlDomainCase(k =>
                   s"array_to_string(list_slice(string_split(host, '.'), " +
                   s"greatest(len(string_split(host, '.')) - ${k - 1}, 1), " +
                   s"len(string_split(host, '.'))), '.')")} AS domain,
       |         CASE WHEN scheme NOT IN (${sqlSet(UrlFilterRules.allowedSchemes)}) THEN 'scheme'
       |              WHEN contains(hostport, ':')
       |                   AND string_split(hostport, ':')[-1] NOT IN (${sqlSet(UrlFilterRules.allowedPorts)}) THEN 'port'
       |              ELSE NULL END AS hard
       |  FROM parts2),
       |staged AS (
       |  SELECT doc_id, text, url, host, domain,
       |         CASE WHEN hard IS NOT NULL THEN hard
       |              WHEN domain IN (${sqlSet(UrlFilterRules.blockedDomains)}) THEN 'domain'
       |              WHEN $hostArm THEN 'host'
       |              WHEN $pathArm THEN 'path'
       |              ELSE 'kept' END AS stage
       |  FROM judged),
       |fun AS (
       |  SELECT stage, count(*) AS n_urls, CAST(sum(doc_id) AS BIGINT) AS id_sum
       |  FROM staged GROUP BY stage),
       |r AS (
       |  SELECT doc_id, domain,
       |         row_number() OVER (PARTITION BY domain
       |                            ORDER BY substr(md5(text), 1, 15), doc_id) AS rnk
       |  FROM staged WHERE stage = 'kept'),
       |cap AS (
       |  SELECT 'kept_capped' AS stage, count(*) AS n_urls,
       |         CAST(sum(doc_id) AS BIGINT) AS id_sum
       |  FROM r WHERE rnk <= $DomainCap)
       |SELECT * FROM fun UNION ALL SELECT * FROM cap ORDER BY stage""".stripMargin
  }

  /** The user-agent q_robots_gate crawls as (lowercased for the match,
    * per RFC 9309 §2.2.1 case-insensitive product tokens). */
  val RobotsAgent = "graftbot"

  /** robots.txt gate (round 15) — the politeness filter every crawler
    * runs BEFORE fetching: parse each host's robots.txt, select the rule
    * group for OUR agent, and gate URLs by RFC 9309 longest-path-match.
    * The semantics under test, each with a planted fixture arm:
    *
    *  - GROUP STRUCTURE: a group is a run of `User-agent` lines followed
    *    by rules until the next run; rules BEFORE any user-agent line are
    *    orphans and bind nothing (hosts h%2=0 plant `Disallow: /orphan/`
    *    above the first group — it must not fire);
    *  - GROUP SELECTION: if any group names our agent, ONLY those groups
    *    apply; else the `*` groups (hosts h%4=2 plant a `GraftBot` group
    *    disallowing /tmp/ — on those hosts the `*` group's /private/
    *    rules must STOP applying, so their /private/ URLs fall through to
    *    default-allow); a `badbot` group disallowing everything (h%3=1)
    *    must be ignored wholesale; field names and agent tokens match
    *    case-insensitively (`user-AGENT: GraftBot`);
    *  - RULE MATCH: literal path-prefix (wildcard-free rules — the
    *    pre-1996 core every implementation agrees on; RFC 9309 `*`/`$`
    *    patterns are out of contract here), empty-value `Disallow:`
    *    matches nothing (h%5=0), unknown fields (`Crawl-delay`) ignored,
    *    comments and blank lines skipped;
    *  - PRECEDENCE: longest matching path wins; equal length → Allow wins
    *    (`Allow: /dual/` + `Disallow: /dual/` both match the %13=7 arm —
    *    must land allow); `Allow: /private/ok/` out-lengths
    *    `Disallow: /private/` (the %7=5 arm); no match → default-allow.
    *
    * Readout: (verdict, n_urls, id_sum, n_hosts) where verdict is the
    * winning `typ:path` or `default-allow` — id sums pin the exact
    * partition per winning rule.
    *
    * Scale shape: robots parsing windows partition by HOST (robots files
    * are ≤ 500 KiB by the RFC's own cap — bounded partitions); the
    * derived rule table is hosts×rules (tiny vs the URL stream) and
    * BROADCASTS into a prefix-probe join; the verdict window partitions
    * by doc_id over ≤ a handful of matched rules per URL. At 100 TB the
    * URL side never shuffles — gate first, fetch second. */
  /** RFC 9309 robots.txt parse + group selection — (host, robots) in,
    * the applicable (host, typ, rpath) rule rows for `agent` out.
    * Factored from [[qRobotsGate]] so RobotsSpec can pin group-structure
    * semantics on crafted files; see the query scaladoc for the rules. */
  private[graft] def robotsRules(robots: DataFrame, agent: String): DataFrame = {
    val nl = "\n"
    val lines = robots
      .select(col("host"), posexplode(split(col("robots"), nl)).as(Seq("pos", "raw")))
      .select(col("host"), col("pos"), trim(col("raw")).as("line"))
      .filter(col("line") =!= "" && !col("line").startsWith("#"))
      .select(col("host"), col("pos"),
        lower(trim(split_part(col("line"), lit(":"), lit(1)))).as("field"),
        trim(col("line").substr(
          length(split_part(col("line"), lit(":"), lit(1))) + 2,
          length(col("line")))).as("value"))
      .filter(col("field").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy("host").orderBy("pos")
    val parsed = lines
      .withColumn("is_ua", col("field") === "user-agent")
      .withColumn("grp", sum(
        when(col("is_ua") &&
          !coalesce(lag(col("is_ua"), 1).over(w), lit(false)), 1L)
          .otherwise(0L)).over(w))
    val agents = parsed.filter(col("is_ua"))
      .select(col("host"), col("grp"), lower(col("value")).as("agent"))
    val rules = parsed.filter(!col("is_ua") && col("value") =!= "")
      .select(col("host"), col("grp"), col("field").as("typ"),
        col("value").as("rpath"))
    val grpSel = agents.groupBy("host", "grp").agg(
      max(when(col("agent") === agent, 1).otherwise(0)).as("has_specific"),
      max(when(col("agent") === "*", 1).otherwise(0)).as("has_star"))
    val selected = grpSel
      .join(grpSel.groupBy("host")
        .agg(max(col("has_specific")).as("any_specific")), "host")
      .filter(when(col("any_specific") === 1, col("has_specific") === 1)
        .otherwise(col("has_star") === 1))
      .select("host", "grp")
    rules.join(selected, Seq("host", "grp")).select("host", "typ", "rpath")
  }

  /** Longest-path-match / allow-wins-tie verdict of (doc_id, host, path)
    * URLs against [[robotsRules]] output; the rule table broadcasts. */
  private[graft] def robotsVerdict(urls: DataFrame, rules: DataFrame): DataFrame = {
    val wv = Window.partitionBy("doc_id")
      .orderBy(length(col("rpath")).desc, col("typ").asc, col("rpath").asc)
    urls.join(
        broadcast(rules.select(col("host").as("rhost"), col("typ"), col("rpath"))),
        col("host") === col("rhost") && startswith(col("path"), col("rpath")),
        "left")
      .withColumn("rnk", row_number().over(wv))
      .filter(col("rnk") === 1)
      .select(col("doc_id"), col("host"),
        when(col("rpath").isNull, lit("default-allow"))
          .otherwise(concat(col("typ"), lit(":"), col("rpath"))).as("verdict"))
  }

  def qRobotsGate(spark: SparkSession, sfDir: String): DataFrame = {
    val nl = "\n"
    val hosts = spark.range(16).select(
      col("id").as("h"),
      concat(lit("h"), col("id").cast("string"), lit(".example.com")).as("host"))
    val robots = hosts.select(col("host"), concat_ws(nl,
      lit("# synthetic robots fixture"),
      when(col("h") % 2 === 0, lit("Disallow: /orphan/")).otherwise(lit("")),
      when(col("h") % 3 === 1, lit("User-agent: badbot" + nl + "Disallow: /"))
        .otherwise(lit("")),
      lit("User-agent: *"),
      lit("Disallow: /private/"),
      lit("Allow: /private/ok/"),
      lit("Allow: /dual/"),
      lit("Disallow: /dual/"),
      when(col("h") % 5 === 0, lit("Disallow:")).otherwise(lit("Crawl-delay: 2")),
      when(col("h") % 4 === 2, lit("user-AGENT: GraftBot" + nl + "disallow: /tmp/"))
        .otherwise(lit(""))).as("robots"))
    val applicable = robotsRules(robots, RobotsAgent)
    val path = when(col("doc_id") % 7 === 3,
        concat(lit("/private/p/"), col("doc_id").cast("string")))
      .when(col("doc_id") % 7 === 5,
        concat(lit("/private/ok/"), col("doc_id").cast("string")))
      .when(col("doc_id") % 11 === 4,
        concat(lit("/tmp/"), col("doc_id").cast("string")))
      .when(col("doc_id") % 13 === 7,
        concat(lit("/dual/"), col("doc_id").cast("string")))
      .otherwise(concat(lit("/p/"), col("doc_id").cast("string")))
    val urls = t(spark, sfDir, "documents").select(
      col("doc_id"),
      concat(lit("h"), (col("doc_id") % 16).cast("string"),
        lit(".example.com")).as("host"),
      path.as("path"))
    robotsVerdict(urls, applicable)
      .groupBy("verdict")
      .agg(count(lit(1)).as("n_urls"), sum(col("doc_id")).as("id_sum"),
        countDistinct(col("host")).as("n_hosts"))
      .orderBy("verdict")
  }

  /** Oracle: robots text build, line split + trim + comment skip,
    * field/value split on the first ':', UA-run group numbering (lag +
    * running sum), group selection with the specific-beats-star rule,
    * prefix match, longest-path/allow-wins window, funnel. */
  val qRobotsGateSql: String =
    s"""WITH hosts AS (
       |  SELECT h, 'h' || CAST(h AS VARCHAR) || '.example.com' AS host
       |  FROM generate_series(0, 15) AS g(h)),
       |rtxt AS (
       |  SELECT host, concat_ws(chr(10),
       |    '# synthetic robots fixture',
       |    CASE WHEN h % 2 = 0 THEN 'Disallow: /orphan/' ELSE '' END,
       |    CASE WHEN h % 3 = 1 THEN 'User-agent: badbot' || chr(10) || 'Disallow: /'
       |         ELSE '' END,
       |    'User-agent: *',
       |    'Disallow: /private/',
       |    'Allow: /private/ok/',
       |    'Allow: /dual/',
       |    'Disallow: /dual/',
       |    CASE WHEN h % 5 = 0 THEN 'Disallow:' ELSE 'Crawl-delay: 2' END,
       |    CASE WHEN h % 4 = 2 THEN 'user-AGENT: GraftBot' || chr(10) || 'disallow: /tmp/'
       |         ELSE '' END) AS robots
       |  FROM hosts),
       |ls AS (SELECT host, string_split(robots, chr(10)) AS arr FROM rtxt),
       |rawlines AS (
       |  SELECT host, i AS pos, trim(arr[i]) AS line
       |  FROM ls, LATERAL unnest(generate_series(1, len(arr))) AS g(i)),
       |fields AS (
       |  SELECT host, pos,
       |         lower(trim(split_part(line, ':', 1))) AS field,
       |         trim(substr(line, length(split_part(line, ':', 1)) + 2)) AS value
       |  FROM rawlines
       |  WHERE line <> '' AND NOT starts_with(line, '#')),
       |marked AS (
       |  SELECT host, pos, field, value,
       |         field = 'user-agent' AS is_ua,
       |         CASE WHEN field = 'user-agent' AND NOT
       |                coalesce(lag(field = 'user-agent') OVER
       |                  (PARTITION BY host ORDER BY pos), FALSE)
       |              THEN 1 ELSE 0 END AS newgrp
       |  FROM fields
       |  WHERE field IN ('user-agent', 'allow', 'disallow')),
       |parsed AS (
       |  SELECT host, pos, field, value, is_ua,
       |         CAST(sum(newgrp) OVER
       |           (PARTITION BY host ORDER BY pos) AS BIGINT) AS grp
       |  FROM marked),
       |grpsel AS (
       |  SELECT host, grp,
       |         max(CASE WHEN lower(value) = '$RobotsAgent' THEN 1 ELSE 0 END)
       |           AS has_specific,
       |         max(CASE WHEN value = '*' THEN 1 ELSE 0 END) AS has_star
       |  FROM parsed WHERE is_ua GROUP BY 1, 2),
       |sel AS (
       |  SELECT g.host, g.grp FROM grpsel g
       |  JOIN (SELECT host, max(has_specific) AS any_specific
       |        FROM grpsel GROUP BY 1) a ON a.host = g.host
       |  WHERE CASE WHEN a.any_specific = 1 THEN g.has_specific = 1
       |             ELSE g.has_star = 1 END),
       |rules AS (
       |  SELECT p.host, p.field AS typ, p.value AS rpath
       |  FROM parsed p JOIN sel s ON s.host = p.host AND s.grp = p.grp
       |  WHERE NOT p.is_ua AND p.value <> ''),
       |urls AS (
       |  SELECT doc_id,
       |         'h' || CAST(doc_id % 16 AS VARCHAR) || '.example.com' AS host,
       |         CASE WHEN doc_id % 7 = 3 THEN '/private/p/' || CAST(doc_id AS VARCHAR)
       |              WHEN doc_id % 7 = 5 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
       |              WHEN doc_id % 11 = 4 THEN '/tmp/' || CAST(doc_id AS VARCHAR)
       |              WHEN doc_id % 13 = 7 THEN '/dual/' || CAST(doc_id AS VARCHAR)
       |              ELSE '/p/' || CAST(doc_id AS VARCHAR) END AS path
       |  FROM documents),
       |matched AS (
       |  SELECT u.doc_id, u.host, r.typ, r.rpath,
       |         row_number() OVER (PARTITION BY u.doc_id
       |           ORDER BY length(r.rpath) DESC, r.typ ASC, r.rpath ASC) AS rnk
       |  FROM urls u LEFT JOIN rules r
       |    ON r.host = u.host AND starts_with(u.path, r.rpath))
       |SELECT CASE WHEN rpath IS NULL THEN 'default-allow'
       |            ELSE typ || ':' || rpath END AS verdict,
       |       count(*) AS n_urls, CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       count(DISTINCT host) AS n_hosts
       |FROM matched WHERE rnk = 1
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Crawl frontier scheduling (round 15) — the step that turns
    * discovered outlinks into the next fetch batch, composing four
    * verified blocks in their production order:
    *
    *  1. CANONICALIZE every discovered raw URL (`url_canon` kernel — the
    *     qUrlCanon fixture's 4 planted variants per page, so tracker/case
    *     /port aliases collapse BEFORE frontier dedup, not after fetch);
    *  2. COLLAPSE to distinct canonical URLs (min doc_id = discovery
    *     order, min depth = shortest discovery path — the BFS rule);
    *  3. DROP already-fetched pages: anti join against the crawled set
    *     (canonical URLs whose md5 gate < '4' — any alias of a fetched
    *     page disqualifies the whole group);
    *  4. POLITENESS cap: ≤ `FrontierPerHost` URLs per host, priority
    *     (depth asc, curl asc) — shallow pages first within a host;
    *  5. GLOBAL batch budget: top `FrontierBatch` by (depth, curl) — a
    *     bounded TakeOrderedAndProject, never a full global sort spill.
    *
    * Readout: the batch itself — (curl, host, depth, disc_id) in batch
    * order, fully deterministic.
    *
    * Scale shape: canon + depth are row-local kernels; the collapse and
    * the crawled set are map-side-combinable aggregates on the canonical
    * key; the anti join is equi-keyed on that key (both sides shuffle
    * once — the crawled set is corpus-sized, never broadcast at 100 TB);
    * the host cap plans as WindowGroupLimit (map-side k-heaps); the
    * budget is a bounded top-N. */
  val FrontierPerHost = 3
  // below the ~102 rows the 37-host×3 cap passes at every SF, so BOTH
  // arms (politeness cap and batch budget) provably bind
  val FrontierBatch = 80

  def qCrawlFrontier(spark: SparkSession, sfDir: String): DataFrame = {
    val p = expr("doc_id div 4").cast("string")
    val s = expr("(doc_id div 4) % 37").cast("string")
    val url = when(col("doc_id") % 4 === 0,
        concat(lit("https://site"), s, lit(".com/page/"), p))
      .when(col("doc_id") % 4 === 1,
        concat(lit("HTTPS://SITE"), s, lit(".COM:443/page/"), p,
          lit("#sec"), col("doc_id").cast("string")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://site"), s, lit(".com/page/"), p,
          lit("/?utm_source=feed&fbclid=x"), col("doc_id").cast("string")))
      .otherwise(
        concat(lit("https://site"), s, lit(".com/page/"), p,
          lit("?b=2&a=1&utm_campaign=c")))
    val canon = graft.CacheScope.cached(
      t(spark, sfDir, "documents")
        .select(col("doc_id"),
          graft.plans.UrlExpressions.urlCanon(url).as("curl"),
          (expr("doc_id div 4") % 3).as("depth")))
    val disc = canon.groupBy("curl")
      .agg(min(col("doc_id")).as("disc_id"), min(col("depth")).as("depth"))
    val crawled = canon
      .filter(graft.operators.Sampling.gateBelow(col("doc_id").cast("string"), "4"))
      .select("curl").distinct()
    val host = substring_index(
      substring_index(col("curl"), "://", -1), "/", 1)
    val wh = Window.partitionBy("host").orderBy(col("depth").asc, col("curl").asc)
    disc.join(crawled, Seq("curl"), "left_anti")
      .withColumn("host", host)
      .withColumn("rnk", row_number().over(wh))
      .filter(col("rnk") <= FrontierPerHost)
      .select(col("curl"), col("host"), col("depth"), col("disc_id"))
      .orderBy(col("depth").asc, col("curl").asc)
      .limit(FrontierBatch)
  }

  /** Oracle: url build + the shared [[urlCanonSqlCtes]] replay, alias
    * collapse with BFS min rules, the crawled anti join (NOT EXISTS),
    * per-host cap window, bounded batch. */
  lazy val qCrawlFrontierSql: String =
    s"""WITH b AS (
       |  SELECT doc_id,
       |         CAST(doc_id // 4 AS VARCHAR) AS p,
       |         CAST((doc_id // 4) % 37 AS VARCHAR) AS s
       |  FROM documents),
       |u AS (
       |  SELECT doc_id,
       |         CASE CAST(doc_id % 4 AS INTEGER)
       |           WHEN 0 THEN 'https://site' || s || '.com/page/' || p
       |           WHEN 1 THEN 'HTTPS://SITE' || s || '.COM:443/page/' || p || '#sec' || CAST(doc_id AS VARCHAR)
       |           WHEN 2 THEN 'https://site' || s || '.com/page/' || p || '/?utm_source=feed&fbclid=x' || CAST(doc_id AS VARCHAR)
       |           ELSE 'https://site' || s || '.com/page/' || p || '?b=2&a=1&utm_campaign=c'
       |         END AS url
       |  FROM b),
       |$urlCanonSqlCtes,
       |cd AS (
       |  SELECT c.doc_id, c.curl, (c.doc_id // 4) % 3 AS depth FROM canon c),
       |disc AS (
       |  SELECT curl, CAST(min(doc_id) AS BIGINT) AS disc_id,
       |         CAST(min(depth) AS BIGINT) AS depth
       |  FROM cd GROUP BY 1),
       |crawled AS (
       |  SELECT DISTINCT curl FROM cd
       |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'),
       |fr AS (
       |  SELECT d.*,
       |         string_split(string_split(d.curl, '://')[2], '/')[1] AS host
       |  FROM disc d
       |  WHERE NOT EXISTS (SELECT 1 FROM crawled w WHERE w.curl = d.curl)),
       |capped AS (
       |  SELECT curl, host, depth, disc_id FROM fr
       |  QUALIFY row_number() OVER (PARTITION BY host
       |                             ORDER BY depth ASC, curl ASC)
       |          <= $FrontierPerHost)
       |SELECT curl, host, depth, disc_id FROM capped
       |ORDER BY depth ASC, curl ASC LIMIT $FrontierBatch""".stripMargin

  /** URL canonicalization + alias collapse (round 14) — the dedup-prep
    * step crawl pipelines run between the URL gate and per-domain
    * capping: one page is observed under many raw URLs (case variants,
    * default ports, fragments, tracking parameters, trailing slashes,
    * unsorted query params), and url-level dedup only works on the
    * canonical form. Fixture: each PAGE (doc_id div 4) appears under 4
    * planted raw variants — plain, SHOUTED-case + `:443` + fragment,
    * trailing-slash + utm/fbclid trackers, and unsorted `?b=2&a=1` query
    * (that one canonicalizes to its own URL with sorted params — proving
    * the sort without collapsing a genuinely distinct query). Readout
    * per canonical URL: alias count, distinct raw forms, id sum + min id
    * (the first-occurrence keep rule) — variants 0-2 MUST collapse to
    * one row with n_raw = 3.
    *
    * Runs the native `url_canon` kernel
    * ([[graft.plans.UrlExpressions.urlCanon]]); the Column reference is
    * pinned ≡ kernel in UrlKernelSpec. Scale shape: canonicalization is
    * row-local in codegen; the collapse is one hash aggregate on the
    * canonical key — at 100 TB this is the standard pre-shuffle for
    * url-keyed dedup. */
  def qUrlCanon(spark: SparkSession, sfDir: String): DataFrame = {
    val p = expr("doc_id div 4").cast("string")
    val s = expr("(doc_id div 4) % 37").cast("string")
    val url = when(col("doc_id") % 4 === 0,
        concat(lit("https://site"), s, lit(".com/page/"), p))
      .when(col("doc_id") % 4 === 1,
        concat(lit("HTTPS://SITE"), s, lit(".COM:443/page/"), p,
          lit("#sec"), col("doc_id").cast("string")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("https://site"), s, lit(".com/page/"), p,
          lit("/?utm_source=feed&fbclid=x"), col("doc_id").cast("string")))
      .otherwise(
        concat(lit("https://site"), s, lit(".com/page/"), p,
          lit("?b=2&a=1&utm_campaign=c")))
    t(spark, sfDir, "documents")
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"),
        graft.plans.UrlExpressions.urlCanon(col("url")).as("curl"))
      .groupBy("curl")
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_raw"),
        sum(col("doc_id")).as("id_sum"),
        min(col("doc_id")).as("keep_id"))
      .orderBy("curl")
  }

  /** Oracle: the URL build + the ENTIRE canonicalization algorithm
    * (scheme/host lowering, first-colon port split, default-port strip,
    * fragment strip, tracker filter, binary-collation param sort,
    * trailing-slash rule) replayed relationally. */
  /** The `url_canon` kernel's relational replay — the CTE chain from a
    * `u(doc_id, url)` CTE to `canon(doc_id, url, curl)`; shared by
    * [[qUrlCanonSql]] and [[qCrawlFrontierSql]] so the two oracles can
    * never drift apart. MARGIN-FORMATTED (no stripMargin here): callers
    * interpolate it before their own stripMargin, which would otherwise
    * eat one `|` of every line-leading `||` concat. */
  private def urlCanonSqlCtes: String = {
    val trackers = graft.operators.Sampling.TrackingParams.sorted
      .map(x => s"'$x'").mkString(", ")
    s"""c1 AS (
       |  SELECT doc_id, url,
       |         lower(string_split(url, '://')[1]) AS scheme,
       |         string_split(url, '://')[2] AS rest
       |  FROM u),
       |c2 AS (
       |  SELECT *, string_split(string_split(string_split(rest, '/')[1], '?')[1], '#')[1] AS auth
       |  FROM c1),
       |c3 AS (
       |  SELECT *, string_split(substr(rest, length(auth) + 1), '#')[1] AS tail2 FROM c2),
       |c4 AS (
       |  SELECT *, string_split(tail2, '?')[1] AS rawpath,
       |         CASE WHEN contains(tail2, '?')
       |              THEN substr(tail2, length(string_split(tail2, '?')[1]) + 2)
       |              ELSE '' END AS query
       |  FROM c3),
       |c5 AS (
       |  SELECT *,
       |         CASE WHEN rawpath = '' THEN '/'
       |              WHEN rawpath <> '/' AND rawpath LIKE '%/'
       |              THEN substr(rawpath, 1, length(rawpath) - 1)
       |              ELSE rawpath END AS path,
       |         lower(string_split(auth, ':')[1]) AS host,
       |         substr(auth, length(string_split(auth, ':')[1]) + 2) AS port
       |  FROM c4),
       |c6 AS (
       |  SELECT *,
       |         list_sort(list_filter(string_split(query, '&'),
       |           q -> q <> '' AND NOT starts_with(string_split(q, '=')[1], 'utm_')
       |                AND string_split(q, '=')[1] NOT IN ($trackers))) AS kept
       |  FROM c5),
       |canon AS (
       |  SELECT doc_id, url,
       |         scheme || '://' || host
       |           || CASE WHEN contains(auth, ':')
       |                    AND NOT ((scheme = 'http' AND port = '80')
       |                             OR (scheme = 'https' AND port = '443'))
       |                   THEN ':' || port ELSE '' END
       |           || path
       |           || CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&') ELSE '' END AS curl
       |  FROM c6)"""
  }

  val qUrlCanonSql: String = {
    s"""WITH b AS (
       |  SELECT doc_id,
       |         CAST(doc_id // 4 AS VARCHAR) AS p,
       |         CAST((doc_id // 4) % 37 AS VARCHAR) AS s
       |  FROM documents),
       |u AS (
       |  SELECT doc_id,
       |         CASE CAST(doc_id % 4 AS INTEGER)
       |           WHEN 0 THEN 'https://site' || s || '.com/page/' || p
       |           WHEN 1 THEN 'HTTPS://SITE' || s || '.COM:443/page/' || p || '#sec' || CAST(doc_id AS VARCHAR)
       |           WHEN 2 THEN 'https://site' || s || '.com/page/' || p || '/?utm_source=feed&fbclid=x' || CAST(doc_id AS VARCHAR)
       |           ELSE 'https://site' || s || '.com/page/' || p || '?b=2&a=1&utm_campaign=c'
       |         END AS url
       |  FROM b),
       |$urlCanonSqlCtes
       |SELECT curl, count(*) AS n_urls,
       |       CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
       |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       |       CAST(min(doc_id) AS BIGINT) AS keep_id
       |FROM canon GROUP BY curl ORDER BY curl""".stripMargin
  }

  /** Deterministic global shuffle + sharding — the batch-prep step that
    * turns a curated corpus into N training shards in a rerun-stable
    * pseudo-random order: shard = 32-bit md5 window of doc_id mod
    * `NShards` (row-local, the [[graft.operators.Sampling.foldAssign]]
    * idiom), intra-shard order = an INDEPENDENTLY-salted md5 key (so
    * position within a shard is uncorrelated with shard choice). Reports
    * per-shard doc counts, char mass, and an order-sensitive fingerprint —
    * md5 of the first `HeadK` doc_ids in shard order — proving both the
    * membership and the ordering are engine-identical.
    *
    * Scale shape: shard/key assignment is narrow; totals are one
    * map-side-combinable aggregate; the fingerprint's rank filter plans as
    * WindowGroupLimit, keeping ≤ `HeadK` rows per shard map-side before
    * any shuffle, and the ordered concat is bounded at `HeadK` ids — no
    * unbounded per-shard state. The production write path is the same
    * plan minus the fingerprint: repartition(shard).sortWithinPartitions
    * (key).write. */
  val NShards = 32
  val HeadK = 64

  def qShardShuffle(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
      .withColumn("shard", graft.operators.Sampling.foldAssign(
        col("doc_id").cast("string"), NShards))
      .withColumn("k", md5(concat(lit("shuffle:"), col("doc_id").cast("string")).cast("binary")))
    val totals = docs.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val w = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    val heads = docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= HeadK)
      .groupBy("shard")
      .agg(md5(array_join(transform(
          array_sort(collect_list(struct(col("k"), col("doc_id")))),
          s => s.getField("doc_id").cast("string")), ",").cast("binary"))
        .as("head_fp"))
    totals.join(heads, Seq("shard"))
      .select("shard", "n_docs", "sum_chars", "head_fp")
      .orderBy("shard")
  }

  val qShardShuffleSql: String =
    s"""WITH assigned AS (
       |  SELECT doc_id, length(text) AS n_chars,
       |         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % $NShards AS shard,
       |         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS k
       |  FROM documents),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS rn
       |  FROM assigned),
       |heads AS (
       |  SELECT shard,
       |         md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY k, doc_id)) AS head_fp
       |  FROM ranked WHERE rn <= $HeadK GROUP BY shard),
       |tot AS (
       |  SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |  FROM assigned GROUP BY shard)
       |SELECT t.shard, t.n_docs, t.sum_chars, h.head_fp
       |FROM tot t JOIN heads h ON h.shard = t.shard
       |ORDER BY t.shard""".stripMargin

  /** DSIR importance-resampling selection
    * ([[graft.operators.Sampling.dsirWeights]]): hashed-unigram importance
    * weights of every document against the English-target distribution,
    * top 50 by (w_q desc, doc_id) — the data-selection pass that
    * up-samples target-domain-like documents from a raw crawl. Since
    * round 11 the raw model is the NON-target rows (the paper's p_raw;
    * ADVICE r10 — previously the full corpus). The oracle replays the
    * full model fit: md5 feature hashing, per-bucket add-1 log-ratios
    * quantized to the 2^20 grid, integer per-doc sums. */
  def qDsir(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Sampling.dsirWeights(
        t(spark, sfDir, "documents"), "doc_id", "text",
        isTarget = col("lang") === "en", nBuckets = 4096)
      .select(col("id").as("doc_id"), col("n_tokens"), col("w_q"))
      .orderBy(col("w_q").desc, col("doc_id"))
      .limit(50)

  /** Shared oracle tail: bucket the feature stream `feats(doc_id, t,
    * feat)`, fit the add-1 log-ratio model (raw = non-target), score. */
  private def dsirModelSql(featsCte: String): String =
    s"""$featsCte,
       |tok2 AS (
       |  SELECT doc_id, t,
       |         CAST('0x' || substr(md5(feat), 1, 8) AS BIGINT) % 4096 AS bucket
       |  FROM feats),
       |perdoc AS (
       |  SELECT doc_id, t, bucket, count(*) AS c FROM tok2 GROUP BY 1, 2, 3),
       |bstats AS (
       |  SELECT bucket, CAST(sum(CASE WHEN NOT t THEN c ELSE 0 END) AS BIGINT) AS rcnt,
       |         CAST(sum(CASE WHEN t THEN c ELSE 0 END) AS BIGINT) AS tcnt
       |  FROM perdoc GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(rcnt) AS BIGINT) AS nr, CAST(sum(tcnt) AS BIGINT) AS nt
       |  FROM bstats),
       |lr AS (
       |  SELECT bucket,
       |         CAST(floor(ln(((tcnt + 1.0) * (nr + 4096.0))
       |                       / ((rcnt + 1.0) * (nt + 4096.0))) * 1048576) AS BIGINT) AS lr_q
       |  FROM bstats CROSS JOIN tot)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       |       CAST(sum(c * lr_q) AS BIGINT) AS w_q
       |FROM perdoc JOIN lr USING (bucket)
       |GROUP BY doc_id
       |ORDER BY w_q DESC, doc_id
       |LIMIT 50""".stripMargin

  val qDsirSql: String = dsirModelSql(
    """WITH feats AS (
      |  SELECT doc_id, (lang = 'en') AS t, token AS feat
      |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |        FROM documents)
      |  WHERE token <> '')""".stripMargin)

  /** The paper's unigram+bigram feature set ([[qDsir]] with maxNgram = 2,
    * VERDICT r10 item 6): word bigrams come from the row-local
    * multiplicity-preserving [[graft.plans.AllShingles]] kernel — NO
    * window shuffle — hashed into the same fixed 4096-bucket space as the
    * unigrams. The oracle builds the identical feature stream by
    * unioning unigrams with adjacency-joined token pairs over the
    * empty-filtered token list. */
  def qDsirBigram(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Sampling.dsirWeights(
        t(spark, sfDir, "documents"), "doc_id", "text",
        isTarget = col("lang") === "en", nBuckets = 4096, maxNgram = 2)
      .select(col("id").as("doc_id"), col("n_tokens"), col("w_q"))
      .orderBy(col("w_q").desc, col("doc_id"))
      .limit(50)

  val qDsirBigramSql: String = dsirModelSql(
    """WITH toklist AS (
      |  SELECT doc_id, (lang = 'en') AS t,
      |         list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, t, tk[i] AS feat
      |  FROM toklist, LATERAL unnest(generate_series(1, len(tk))) AS u(i)
      |  UNION ALL
      |  SELECT doc_id, t, tk[i] || ' ' || tk[i + 1] AS feat
      |  FROM toklist, LATERAL unnest(generate_series(1, len(tk) - 1)) AS u(i))""".stripMargin)

  /** Training-mixture planner — given per-source token counts and target
    * mixture weights, compute how many tokens each source must contribute
    * to hit the mixture at a constant total budget, and the repeat factor
    * (epochs) that requires. This is the data-mixing arithmetic every
    * multi-source pretraining run does (cf. temperature sampling,
    * `q_temperature_sample`, which rebalances by a power law — this one
    * hits EXPLICIT weights). Weights here are a deterministic function of
    * the source index (20 + 8·idx per-mille, unnormalized — the planner
    * normalizes by their sum in-query).
    *
    * All-integer arithmetic: need = ⌊T·w/W⌋, epochs = ⌈need/n_tokens⌉ by
    * integer ceil-div — bit-exact in both engines. Scale shape: one
    * map-side-combinable scan agg to |sources| rows (the corpus is scanned
    * exactly once and never shuffled); the W/T totals come from an
    * unpartitioned window over those |sources| rows — a SinglePartition
    * exchange of the tiny aggregate, never of the data. */
  def qMixturePlan(spark: SparkSession, sfDir: String): DataFrame = {
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(sum(TextQueries.bpeTokenCount(col("text"))).cast("long").as("n_tokens"))
      .withColumn("w_pm",
        lit(20L) + lit(8L) * substring(col("source"), 4, 10).cast("long"))
      .withColumn("w_total", sum(col("w_pm")).over(wAll))
      .withColumn("t_total", sum(col("n_tokens")).over(wAll))
      .withColumn("need_tokens",
        expr("(t_total * w_pm) div w_total").cast("long"))
      .withColumn("epochs",
        expr("(need_tokens + n_tokens - 1) div n_tokens").cast("long"))
      .select(col("source"), col("n_tokens"), col("w_pm"), col("need_tokens"),
        col("epochs"), (col("need_tokens") > col("n_tokens")).as("upsampled"))
      .orderBy("source")
  }

  val qMixturePlanSql: String =
    s"""WITH src AS (
      |  SELECT source,
      |         CAST(sum(${TextQueries.bpeTokenCountSql("text")}) AS BIGINT) AS n_tokens,
      |         20 + 8 * CAST(substr(source, 4) AS BIGINT) AS w_pm
      |  FROM documents GROUP BY source),
      |tot AS (
      |  SELECT *, sum(w_pm) OVER () AS w_total, sum(n_tokens) OVER () AS t_total
      |  FROM src)
      |SELECT source, n_tokens, w_pm,
      |       CAST((t_total * w_pm) // w_total AS BIGINT) AS need_tokens,
      |       CAST(((t_total * w_pm) // w_total + n_tokens - 1) // n_tokens AS BIGINT) AS epochs,
      |       (t_total * w_pm) // w_total > n_tokens AS upsampled
      |FROM tot
      |ORDER BY source""".stripMargin

  /** Snapshot diff between two corpus versions (incremental-recrawl
    * accounting — the first question a pipeline asks before reprocessing:
    * what actually changed?): version 1 and version 2 are deterministic
    * slices of `documents` (v1 drops doc_id % 11 = 3; v2 drops
    * doc_id % 13 = 5 and revises the text of doc_id % 7 = 2), each
    * projected to (doc_id, content digest, length) and full-outer-joined
    * on doc_id; every doc classifies as added / removed / changed /
    * unchanged by digest comparison, aggregated to per-status counts and
    * char volumes.
    *
    * Scale shape: the ONLY wide op is one co-partitioned full-outer join
    * keyed on doc_id, and both sides are pre-projected to ~50-byte
    * (id, md5, length) rows — diffing two 100 TB snapshots moves digests,
    * never text. Bucketing both snapshots on doc_id at write time would
    * remove even that exchange; the md5 narrowing is what makes either
    * plan feasible. */
  def qSnapshotDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val v1 = docs.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"),
        md5(col("text").cast("binary")).as("h1"),
        length(col("text")).cast("long").as("c1"))
    val v2 = docs.filter(col("doc_id") % 13 =!= 5)
      .withColumn("t2",
        when(col("doc_id") % 7 === 2, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .select(col("doc_id"),
        md5(col("t2").cast("binary")).as("h2"),
        length(col("t2")).cast("long").as("c2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("c1"), lit(0L))).as("chars_v1"),
        sum(coalesce(col("c2"), lit(0L))).as("chars_v2"))
      .orderBy("status")
  }

  val qSnapshotDiffSql: String =
    """WITH v1 AS (
      |  SELECT doc_id, md5(text) AS h1, length(text) AS c1
      |  FROM documents WHERE doc_id % 11 <> 3),
      |v2x AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END AS t2
      |  FROM documents WHERE doc_id % 13 <> 5),
      |v2 AS (SELECT doc_id, md5(t2) AS h2, length(t2) AS c2 FROM v2x),
      |j AS (
      |  SELECT h1, h2, c1, c2
      |  FROM v1 FULL OUTER JOIN v2 ON v2.doc_id = v1.doc_id)
      |SELECT CASE WHEN h1 IS NULL THEN 'added'
      |            WHEN h2 IS NULL THEN 'removed'
      |            WHEN h1 = h2 THEN 'unchanged'
      |            ELSE 'changed' END AS status,
      |       count(*) AS n_docs,
      |       CAST(sum(coalesce(c1, 0)) AS BIGINT) AS chars_v1,
      |       CAST(sum(coalesce(c2, 0)) AS BIGINT) AS chars_v2
      |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** Deterministic Poisson-bootstrap confidence spread for a corpus
    * metric (per-language mean quality) — the error bar a curation report
    * should carry before anyone compares two pipeline variants
    * (Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
    * the standard one-pass bootstrap at data-parallel scale): B = 32
    * replicates, each doc's multiplicity in replicate b drawn from a
    * QUANTIZED Poisson(1) — u = first 2 md5 hex digits of "doc_id:b"
    * (256 buckets), m = 0/1/2/3/4 at thresholds 94/188/235/251 (bucket
    * masses 94+94+47+16+5 = 256 with Σ m·mass = 256, so E[m] = 1
    * EXACTLY); replicate mean = Σ m·q20 // Σ m in exact integers. Readout
    * per lang: point estimate + min/max/spread of the 32 replicate means.
    *
    * Scale shape: the ×32 fan-out is a row-local explode whose rows
    * collapse map-side into 32·|langs| partial aggregates — the shuffle
    * carries 160 rows regardless of corpus size; the quality kernel runs
    * ONCE per doc before the fan-out. This is why Poisson bootstrap (and
    * not resample-by-index) is the 100 TB formulation: no replicate ever
    * materializes. */
  def qBootstrapCi(spark: SparkSession, sfDir: String): DataFrame = {
    val B = 32
    // cached: the quality kernel pass feeds both the point-estimate arm
    // and the ×32 replicate arm — without the cache the corpus scan +
    // text_stats (the dominant cost) runs twice
    val scored = graft.CacheScope.cached(t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        floor(TextQueries.qualityCol(graft.plans.TextStatsExpressions
          .textStats(col("text"), StopwordLists.map(_._2))) * 1048576)
          .cast("long").as("q20")))
    val point = scored.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), expr("sum(q20) div count(1)").as("point_q20"))
    val rep = scored
      .select(col("lang"), col("q20"),
        explode(sequence(lit(0), lit(B - 1))).as("b"),
        col("doc_id"))
      .withColumn("u", conv(graft.plans.HashExpressions.md5Prefix(
        concat(col("doc_id").cast("string"), lit(":"), col("b").cast("string")), 2),
        16, 10).cast("long"))
      .withColumn("m",
        when(col("u") < 94, 0L).when(col("u") < 188, 1L)
          .when(col("u") < 235, 2L).when(col("u") < 251, 3L).otherwise(4L))
      .groupBy("lang", "b")
      .agg(sum(col("m") * col("q20")).as("num"), sum(col("m")).as("den"))
      .filter(col("den") > 0L)
      .select(col("lang"), expr("num div den").as("mean_q20"))
    point.join(
      rep.groupBy("lang")
        .agg(min(col("mean_q20")).as("boot_min_q20"),
          max(col("mean_q20")).as("boot_max_q20"),
          count(lit(1)).as("n_reps")),
      Seq("lang"))
      .select(col("lang"), col("n_docs"), col("point_q20"),
        col("boot_min_q20"), col("boot_max_q20"),
        (col("boot_max_q20") - col("boot_min_q20")).as("spread_q20"),
        col("n_reps"))
      .orderBy("lang")
  }

  val qBootstrapCiSql: String =
    s"""WITH bscored AS (
       |  SELECT doc_id, lang,
       |         CAST(floor((${TextQueries.qualitySqlExpr}) * 1048576) AS BIGINT) AS q20
       |  FROM documents),
       |bpoint AS (
       |  SELECT lang, count(*) AS n_docs,
       |         CAST(sum(q20) // count(*) AS BIGINT) AS point_q20
       |  FROM bscored GROUP BY lang),
       |fan AS (
       |  SELECT s.lang, s.q20, g.b,
       |         CAST(('0x' || substr(md5(CAST(s.doc_id AS VARCHAR) || ':'
       |               || CAST(g.b AS VARCHAR)), 1, 2)) AS BIGINT) AS u
       |  FROM bscored s, generate_series(0, 31) AS g(b)),
       |repm AS (
       |  SELECT lang, b,
       |         CAST(sum((CASE WHEN u < 94 THEN 0 WHEN u < 188 THEN 1
       |                        WHEN u < 235 THEN 2 WHEN u < 251 THEN 3
       |                        ELSE 4 END) * q20) AS BIGINT) AS num,
       |         CAST(sum(CASE WHEN u < 94 THEN 0 WHEN u < 188 THEN 1
       |                       WHEN u < 235 THEN 2 WHEN u < 251 THEN 3
       |                       ELSE 4 END) AS BIGINT) AS den
       |  FROM fan GROUP BY 1, 2),
       |brep AS (SELECT lang, num // den AS mean_q20 FROM repm WHERE den > 0)
       |SELECT p.lang, p.n_docs, p.point_q20,
       |       min(r.mean_q20) AS boot_min_q20,
       |       max(r.mean_q20) AS boot_max_q20,
       |       max(r.mean_q20) - min(r.mean_q20) AS spread_q20,
       |       count(*) AS n_reps
       |FROM bpoint p JOIN brep r ON r.lang = p.lang
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  /** HTML-wrapper fixture for [[qHtmlExtract]]: deterministic boilerplate
    * around `documents.text`, each block engineered to die by exactly one
    * rule (see the table in qHtmlExtract's scaladoc). Shared verbatim by
    * the Spark fixture builder and the DuckDB oracle. */
  object HtmlFixture {
    val Head = "<style>body{color:#333} .x>y{margin:0}</style>" +
      "<script>var s='</div>'; if(a<b){go()}</script></head><body>"
    val Nav = "<nav><a href=\"/\">home page</a> <a href=\"/about\">about this site</a> " +
      "<a href=\"/contact\">contact us here</a></nav>"
    val Farm = "<div class=\"farm\"><a href=\"/p1\">click here to win</a> " +
      "<a href=\"/p2\">read more articles</a> <a href=\"/p3\">sign up now free</a> " +
      "<a href=\"/p4\">best deals today</a></div>"
    val Aside = "<aside>ad: buy now</aside>"
    val Footer = "<footer><a href=\"/tos\">terms of use</a> © 2024 example</footer>"
    val EntSuffix = " &lt;b&gt; &amp; &quot;q&quot;"
    val RefSuffix = " <a href=\"/ref\">see reference notes</a>"
  }

  /** HTML → text extraction (q_html_extract) — the boilerplate-removal
    * stage that precedes every operator this engine already ships
    * ([[graft.operators.HtmlExtract]] has the algorithm; this query pins
    * it against a DuckDB replay of the identical string ops).
    *
    * Fixture hazards, each block dying by exactly one rule:
    *   - `<title>Doc N</title>` → too short (≤ 14 chars for any doc_id up
    *     to 10 digits);
    *   - nav / link farm → pure anchor text, killed by link density;
    *   - `<aside>ad: buy now</aside>` (doc_id%3=0) → 11 chars, length;
    *   - footer → MIXED line (12 anchor chars of 27): killed by density
    *     even though most text is outside anchors;
    *   - script containing a literal `'</div>'` and `a<b` → proves
    *     script removal runs before block segmentation;
    *   - `&lt;b&gt;` entity suffix (doc_id%7=3) → proves entities decode
    *     AFTER tag stripping (decoded `<b>` survives as text);
    *   - an inline `<a>` inside long content (doc_id%5=4, len ≥ 200) →
    *     content with a modest link stays content;
    *   - odd doc_ids split content into TWO `<p>` blocks at the token
    *     midpoint → multi-block content survives in order (half-paragraph
    *     min length at the shipped fixtures is 18 ≥ MinChars=15).
    *
    * Readout per lang: block counts, char masses both classes, count of
    * docs whose extracted text carries zero stopwords (the jusText
    * stopword-density diagnostic, via the text_stats kernel — reported,
    * not a drop rule, so the readout stays structural under the
    * token-perturbing scale fixtures), and the 40-bit md5 checksum of
    * extracted text (the round-trip claim).
    *
    * Scale shape: fixture build + extraction + classification are ONE
    * narrow whole-row pass (HOFs, no explode); the only exchange is the
    * |langs|-row aggregate. At 100 TB this fuses into the scan. */
  /** The HTML-wrapper fixture as a Column over (doc_id, text) — shared by
    * [[qHtmlExtract]] and [[qWebPipeline]]. */
  private[graft] def htmlFixtureCol: org.apache.spark.sql.Column = {
    import HtmlFixture._
    val toks = tokens(col("text"))
    val half = (size(toks) / lit(2)).cast("int")
    val p1 = array_join(slice(toks, lit(1), half), " ")
    val p2 = array_join(slice(toks, half + 1, size(toks) - half), " ")
    val ent = when(col("doc_id") % 7 === 3, lit(EntSuffix)).otherwise(lit(""))
    val ref = when(col("doc_id") % 5 === 4 && length(col("text")) >= 200,
      lit(RefSuffix)).otherwise(lit(""))
    val content = when(col("doc_id") % 2 === 0,
      concat(lit("<div class=\"main\"><p>"), col("text"), ent, ref, lit("</p></div>")))
      .otherwise(concat(lit("<div class=\"main\"><p>"), p1, lit("</p><p>"),
        p2, ent, ref, lit("</p></div>")))
    concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"), lit("</title>"),
      lit(Head), lit(Nav),
      when(col("doc_id") % 4 === 1, lit(Farm)).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, lit(Aside)).otherwise(lit("")),
      content, lit(Footer), lit("</body></html>"))
  }

  def qHtmlExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = t(spark, sfDir, "documents")
    val ex = graft.plans.HtmlExtractExpressions.htmlExtract(htmlFixtureCol)
    val lowstop = forall(
      graft.plans.TextStatsExpressions
        .textStats(col("ex.extracted"), StopwordLists.map(_._2))
        .getField("hits"), h => h === 0L)
    docs.select(col("lang"), ex.as("ex"))
      .select(col("lang"), col("ex.*"), when(lowstop, 1L).otherwise(0L).as("ls"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("kept_lines").as("kept_lines"),
        sum("dropped_lines").as("dropped_lines"),
        sum(length(col("extracted"))).cast("long").as("extracted_chars"),
        sum("boiler_chars").as("boiler_chars"),
        sum("ls").as("lowstop_docs"),
        sum(conv(graft.plans.HashExpressions.md5Prefix(col("extracted"), 10), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("lang")
  }

  /** The HTML fixture + extraction CTE chain, ending in
    * `hext(doc_id, lang, extracted, kl, dl, bc)` — shared by the
    * q_html_extract oracle and the q_web_pipeline oracle (which feeds
    * `extracted` into the curation cascade). */
  private[queries] val htmlExtractSqlCtes: String = {
    import HtmlFixture._
    def q(s: String) = s.replace("'", "''")
    s"""hparts AS (
       |  SELECT doc_id, lang, text,
       |         list_filter(string_split(text, ' '), t -> t <> '') AS toks
       |  FROM documents),
       |hsplit AS (
       |  SELECT doc_id, lang, text,
       |         array_to_string(toks[1:CAST(len(toks)//2 AS INT)], ' ') AS p1,
       |         array_to_string(toks[CAST(len(toks)//2 AS INT)+1:], ' ') AS p2
       |  FROM hparts),
       |hhtml AS (
       |  SELECT doc_id, lang,
       |    '<html><head><title>Doc ' || doc_id || '</title>' ||
       |    '${q(Head)}' || '${q(Nav)}' ||
       |    (CASE WHEN doc_id % 4 = 1 THEN '${q(Farm)}' ELSE '' END) ||
       |    (CASE WHEN doc_id % 3 = 0 THEN '${q(Aside)}' ELSE '' END) ||
       |    (CASE WHEN doc_id % 2 = 0
       |         THEN '<div class="main"><p>' || text
       |         ELSE '<div class="main"><p>' || p1 || '</p><p>' || p2 END) ||
       |    (CASE WHEN doc_id % 7 = 3 THEN '${q(EntSuffix)}' ELSE '' END) ||
       |    (CASE WHEN doc_id % 5 = 4 AND length(text) >= 200 THEN '${q(RefSuffix)}' ELSE '' END) ||
       |    '</p></div>' || '${q(Footer)}' || '</body></html>' AS html
       |  FROM hsplit),
       |hlines AS (
       |  SELECT doc_id, lang,
       |    string_split(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace(
       |            regexp_replace(html, '(?s)<script[^>]*>.*?</script>', '', 'g'),
       |            '(?s)<style[^>]*>.*?</style>', '', 'g'),
       |          '[ \t\r\n]+', ' ', 'g'),
       |        '</(title|nav|p|div|aside|footer|li|h[1-6]|tr|blockquote)>', chr(10), 'g'),
       |      chr(10)) AS lines
       |  FROM hhtml),
       |hstats AS (
       |  SELECT doc_id, lang,
       |    list_transform(lines, l -> struct_pack(
       |      clean := trim(regexp_replace(l, '<[^>]*>', '', 'g')),
       |      a := coalesce(list_aggregate(
       |        list_transform(regexp_extract_all(l, '(?s)<a [^>]*>(.*?)</a>', 1),
       |          s -> length(regexp_replace(s, '<[^>]*>', '', 'g'))), 'sum'), 0))) AS ls
       |  FROM hlines),
       |hclass AS (
       |  SELECT doc_id, lang,
       |    list_filter(ls, s -> length(s.clean) >= 15 AND s.a * 3 < length(s.clean)) AS kept,
       |    list_filter(ls, s -> s.clean <> ''
       |      AND NOT (length(s.clean) >= 15 AND s.a * 3 < length(s.clean))) AS dropped
       |  FROM hstats),
       |hext AS (
       |  SELECT doc_id, lang,
       |    replace(replace(replace(replace(replace(
       |      array_to_string(list_transform(kept, s -> s.clean), chr(10)),
       |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS extracted,
       |    len(kept) AS kl, len(dropped) AS dl,
       |    coalesce(list_aggregate(list_transform(dropped, s -> length(s.clean)), 'sum'), 0) AS bc
       |  FROM hclass)""".stripMargin
  }

  val qHtmlExtractSql: String = {
    val stop = StopwordLists.flatMap(_._2).distinct.map(w => s"'$w'").mkString(", ")
    s"""WITH $htmlExtractSqlCtes
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(kl) AS BIGINT) AS kept_lines,
       |  CAST(sum(dl) AS BIGINT) AS dropped_lines,
       |  CAST(sum(length(extracted)) AS BIGINT) AS extracted_chars,
       |  CAST(sum(bc) AS BIGINT) AS boiler_chars,
       |  CAST(sum(CASE WHEN len(list_filter(string_split(extracted, ' '),
       |        t -> t IN ($stop))) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS lowstop_docs,
       |  CAST(sum(CAST('0x' || substr(md5(extracted), 1, 10) AS BIGINT)) AS BIGINT) AS checksum
       |FROM hext GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** WARC ingestion (round 14) — the crawl container every public web
    * corpus actually ships in (Common Crawl is WARC files), under the
    * oracle gate end to end: documents are wrapped in the shared HTML
    * fixture ([[htmlFixtureCol]]), framed as HTTP responses, written as
    * ISO 28500 records by the distributed [[graft.WarcIO.writeWarc]] sink
    * (one file per partition, CRLF framing, exact Content-Length), read
    * back through `format("warc")` with FORCED SMALL SPLITS (the
    * version-line resync + Content-Length walk is exercised on every
    * run — the q_fastx_roundtrip discipline), composed straight into the
    * html_extract kernel's front, and reduced per lang. A `request`
    * record rides along for every doc so the scan proves the pushed
    * `record_type = 'response'` filter (requests never reach the rows).
    *
    * Byte-exactness: `payload_checksum` is the md5 of the FULL response
    * payload (HTTP headers + html) recomputed by the oracle straight
    * from `documents` — any framing slip in the container roundtrip
    * changes it. `checksum` pins the extracted text after the kernel.
    *
    * Scale shape: the WARC scan fans out as byte-range splits (128 MB
    * default — here forced small), the record_type filter and the
    * 2-column prune are pushed into the reader, extraction is the fused
    * kernel pass, and the only exchange is the |langs|-row aggregate.
    * At 100 TB this is exactly the Common-Crawl ingest plan: split →
    * resync → filter responses → extract → curate, one streaming pass. */
  def qWarcIngest(spark: SparkSession, sfDir: String): DataFrame =
    warcIngest(spark, sfDir, recordGzip = false)

  /** Record-gzipped twin (round 14): the SAME fixture and readout, but the
    * container is per-record-gzip (`.warc.gz`, the Common Crawl layout)
    * and the scan reads it with `recordGzipSplit` MEMBER splits — the
    * gzip-magic + header + `WARC/1.`-prefix resync and exact member
    * ownership under the oracle gate (the oracle is qWarcIngestSql
    * verbatim: the container must be invisible to the result). */
  def qWarcGz(spark: SparkSession, sfDir: String): DataFrame =
    warcIngest(spark, sfDir, recordGzip = true)

  /** Frame-per-record ZSTD twin (round 15): the SAME fixture and readout,
    * but the container is `.warc.zst` — one zstd frame per record
    * (content size in the frame header, frame checksum on) — and the scan
    * reads it with `recordZstdSplit` FRAME splits: zstd-magic resync +
    * frame-size walk + `WARC/1.` prefix validation + checksum-verified
    * decompression ([[graft.sources.warc.ZstdMembers]]), exact frame
    * ownership. The oracle is qWarcIngestSql verbatim: the codec must be
    * invisible to the result. (zstd is the codec real crawl archives are
    * migrating to; zstd-jni ships in the Spark classpath.) */
  def qWarcZst(spark: SparkSession, sfDir: String): DataFrame =
    warcIngest(spark, sfDir, recordGzip = false, recordZstd = true)

  /** The q_warc_ingest record set (a response + a request per document)
    * over any slice of `documents` — shared by the batch ingest queries
    * and the streaming landing waves. */
  private[queries] def warcRecordsFor(docs: DataFrame): DataFrame = {
    val uri = concat(lit("https://fixture.test/"), col("lang"),
      lit("/"), col("doc_id").cast("string"))
    val http = concat(lit(HttpHead), htmlFixtureCol)
    val responses = docs.select(
      lit("response").as("record_type"),
      concat(lit("<urn:uuid:doc-"), col("doc_id").cast("string"), lit(">")).as("record_id"),
      lit("2024-01-01T00:00:00Z").as("warc_date"),
      uri.as("target_uri"),
      lit("application/http; msgtype=response").as("content_type"),
      http.cast("binary").as("payload"))
    val requests = docs.select(
      lit("request").as("record_type"),
      concat(lit("<urn:uuid:req-"), col("doc_id").cast("string"), lit(">")).as("record_id"),
      lit("2024-01-01T00:00:00Z").as("warc_date"),
      uri.as("target_uri"),
      lit("application/http; msgtype=request").as("content_type"),
      concat(lit("GET /p/"), col("doc_id").cast("string"),
        lit(" HTTP/1.1\r\nHost: fixture.test\r\n\r\n")).cast("binary").as("payload"))
    responses.unionAll(requests)
  }

  private def warcIngest(spark: SparkSession, sfDir: String,
                         recordGzip: Boolean,
                         recordZstd: Boolean = false): DataFrame = {
    val dir = new java.io.File(
      "/root/repo/target/warc_ingest/" + new java.io.File(sfDir).getName +
        (if (recordGzip) "_gz" else if (recordZstd) "_zst" else ""))
    graft.WarcIO.writeWarc(warcRecordsFor(t(spark, sfDir, "documents")),
      dir.getAbsolutePath, recordGzip = recordGzip, recordZstd = recordZstd)
    val warc = spark.read.format("warc")
      .option("maxSplitBytes",
        FastxQueries.adaptiveSplitBytes(spark, dir.getAbsolutePath).toString)
      .option("recordGzipSplit", recordGzip.toString)
      .option("recordZstdSplit", recordZstd.toString)
      .load(dir.getAbsolutePath)
      .filter(col("record_type") === "response") // pushed into the reader
    val ex = graft.plans.HtmlExtractExpressions.htmlExtract(
      graft.WarcIO.httpBody(col("payload")))
    warc.select(
        regexp_extract(col("target_uri"), "^https://fixture\\.test/([a-z]+)/", 1).as("lang"),
        md5(col("payload")).as("pmd5"),
        ex.as("ex"))
      .select(col("lang"), col("pmd5"), col("ex.*"))
      // parse-once boundary before the sortable aggregate (the
      // q_fastq_roundtrip lesson: range sampling re-executes its child)
      .repartition(col("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("kept_lines").as("kept_lines"),
        sum(length(col("extracted"))).cast("long").as("extracted_chars"),
        sum(conv(substring(col("pmd5"), 1, 10), 16, 10).cast("long")).as("payload_checksum"),
        sum(conv(graft.plans.HashExpressions.md5Prefix(col("extracted"), 10), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("lang")
  }

  /** The anchor-TEXT fixture (round 15) — a link page per document whose
    * anchor texts come from the document's own tokens, so targets
    * accumulate VARIED descriptions. One anchor per downstream rule:
    *  - `a1` plain https → site((7d+3)%29)/page/(d%11), text = toks 1–2;
    *  - `a2` SHOUTED + `:443` → site((d div 29)%29)/page/(d%5), text =
    *    tok 3 + an inner `<b>` around tok 4 (strip arm) — must
    *    canonicalize onto the plain form of the same target;
    *  - `a3` (d%4==1) → the site0.com hub with a CONSTANT text (the
    *    consensus-anchor arm: one text dominates that target);
    *  - `a4` = a1's target + a utm tracker, text = tok 5 —
    *    canonicalizes ONTO a1's target (alias collapse before the
    *    target aggregation).
    * Kept separate from [[linkFixtureCol]] (its scaladoc pins why). */
  private[graft] def anchorFixtureCol: org.apache.spark.sql.Column = {
    val d = col("doc_id")
    val toks = tokens(col("text"))
    def tk(i: Int) = coalesce(element_at(toks, i), lit("x"))
    val t1 = ((d * 7 + 3) % 29).cast("string")
    val t2 = (expr("doc_id div 29") % 29).cast("string")
    val u1 = concat(lit("https://site"), t1, lit(".com/page/"),
      (d % 11).cast("string"))
    concat(
      lit("<html><body><p>See <a href=\""), u1, lit("\">"),
      tk(1), lit(" "), tk(2), lit("</a> and "),
      lit("<a href=\"HTTPS://SITE"), t2, lit(".COM:443/page/"),
      (d % 5).cast("string"), lit("\">"), tk(3), lit(" <b>"), tk(4),
      lit("</b></a>"),
      when(d % 4 === 1,
        lit(" <a href=\"https://site0.com/\">the hub page</a>"))
        .otherwise(lit("")),
      lit(" <a href=\""), u1, lit("?utm_source=x"), d.cast("string"),
      lit("\">"), tk(5), lit("</a></p></body></html>"))
  }

  /** Anchor-text corpus (round 15) — the classic crawl derivative: every
    * anchor's text is a human-written description of its TARGET page, so
    * aggregating texts BY TARGET yields a labeled signal used for
    * retrieval and training (anchor corpora ship beside WAT files).
    * Pipeline: the native `html_anchors` kernel (exact 2-group regex
    * contract, cell-style text cleanup) → `url_canon` kernel collapses
    * aliases (case/port/tracker arms) BEFORE the target key → the
    * graph-INVERTING shuffle (groupBy target — the one honest exchange:
    * at 100 TB anchor text only exists distributed this way) → per
    * target: anchor count, distinct texts, the CONSENSUS text (max
    * count, tie text asc), and the text checksum; top-40 targets.
    * The oracle replays extraction with the regex, cleanup with the
    * pinned chain, and canon via the shared `urlCanonSqlCtes`. */
  def qAnchorText(spark: SparkSession, sfDir: String): DataFrame = {
    val anchors = t(spark, sfDir, "documents")
      .select(explode(graft.plans.HtmlExtractExpressions
        .htmlAnchors(anchorFixtureCol)).as("a"))
      .select(graft.plans.UrlExpressions.urlCanon(col("a.href")).as("target"),
        col("a.text").as("atext"))
    val cnts = graft.CacheScope.cached(
      anchors.groupBy("target", "atext").agg(count(lit(1)).as("cnt")))
    val top = cnts
      .withColumn("rk", row_number().over(Window.partitionBy("target")
        .orderBy(col("cnt").desc, col("atext").asc)))
      .filter(col("rk") === 1)
      .select(col("target"), col("atext").as("top_text"),
        col("cnt").as("top_cnt"))
    val agg = cnts.groupBy("target")
      .agg(sum("cnt").as("n_anchors"),
        count(lit(1)).as("n_texts"),
        sum(col("cnt") *
          conv(graft.plans.HashExpressions.md5Prefix(col("atext"), 10), 16, 10)
            .cast("long")).as("text_checksum"))
    agg.join(top, Seq("target"))
      .orderBy(col("n_anchors").desc, col("target"))
      .limit(40)
      .select("target", "n_anchors", "n_texts", "top_text", "top_cnt",
        "text_checksum")
  }

  val qAnchorTextSql: String = {
    val cleanup = "trim(regexp_replace(" +
      "replace(replace(replace(replace(replace(" +
      "regexp_replace(texts[i.i], '<[^>]*>', '', 'g')," +
      " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"')," +
      " '&#39;', ''''), '&amp;', '&'), '\\s+', ' ', 'g'))"
    s"""WITH atoks AS MATERIALIZED (
       |  SELECT doc_id, lang, text,
       |         list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM documents),
       |afx AS MATERIALIZED (
       |  SELECT doc_id,
       |    '<html><body><p>See <a href="https://site' || CAST((doc_id * 7 + 3) % 29 AS VARCHAR)
       |      || '.com/page/' || CAST(doc_id % 11 AS VARCHAR) || '">'
       |      || coalesce(tk[1], 'x') || ' ' || coalesce(tk[2], 'x') || '</a> and '
       |      || '<a href="HTTPS://SITE' || CAST((doc_id // 29) % 29 AS VARCHAR)
       |      || '.COM:443/page/' || CAST(doc_id % 5 AS VARCHAR) || '">'
       |      || coalesce(tk[3], 'x') || ' <b>' || coalesce(tk[4], 'x') || '</b></a>'
       |      || (CASE WHEN doc_id % 4 = 1
       |               THEN ' <a href="https://site0.com/">the hub page</a>'
       |               ELSE '' END)
       |      || ' <a href="https://site' || CAST((doc_id * 7 + 3) % 29 AS VARCHAR)
       |      || '.com/page/' || CAST(doc_id % 11 AS VARCHAR)
       |      || '?utm_source=x' || CAST(doc_id AS VARCHAR) || '">'
       |      || coalesce(tk[5], 'x') || '</a></p></body></html>' AS html
       |  FROM atoks),
       |amatch AS MATERIALIZED (
       |  SELECT doc_id,
       |         regexp_extract_all(html, '<a href="([^"]*)">(.*?)</a>', 1) AS hrefs,
       |         regexp_extract_all(html, '<a href="([^"]*)">(.*?)</a>', 2) AS texts
       |  FROM afx),
       |aanch AS MATERIALIZED (
       |  SELECT doc_id, hrefs[i.i] AS url, $cleanup AS atext
       |  FROM amatch, LATERAL unnest(generate_series(1, len(hrefs))) AS i(i)),
       |u AS (SELECT DISTINCT doc_id, url FROM aanch),
       |$urlCanonSqlCtes,
       |aj AS MATERIALIZED (
       |  SELECT c.curl AS target, a.atext
       |  FROM aanch a JOIN canon c ON c.doc_id = a.doc_id AND c.url = a.url),
       |acnt AS MATERIALIZED (
       |  SELECT target, atext, CAST(count(*) AS BIGINT) AS cnt
       |  FROM aj GROUP BY 1, 2),
       |atop AS (
       |  SELECT target, atext AS top_text, cnt AS top_cnt FROM acnt
       |  QUALIFY row_number() OVER (PARTITION BY target
       |                             ORDER BY cnt DESC, atext) = 1),
       |aagg AS (
       |  SELECT target, CAST(sum(cnt) AS BIGINT) AS n_anchors,
       |         CAST(count(*) AS BIGINT) AS n_texts,
       |         CAST(sum(cnt * CAST('0x' || substr(md5(atext), 1, 10) AS BIGINT)) AS BIGINT) AS text_checksum
       |  FROM acnt GROUP BY 1)
       |SELECT g.target, g.n_anchors, g.n_texts, t.top_text, t.top_cnt,
       |       g.text_checksum
       |FROM aagg g JOIN atop t ON t.target = g.target
       |ORDER BY g.n_anchors DESC, g.target LIMIT 40""".stripMargin
  }

  /** The deterministic HTTP response head in front of every fixture
    * payload — shared verbatim with the oracle. */
  val HttpHead = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"

  /** Takedown purge (round 15) — the compliance operation every crawl
    * archive must run (GDPR erasure / DMCA notices): given a takedown
    * list of URLs, REWRITE the containers without the listed records,
    * write a metadata-only TOMBSTONE audit artifact (what was removed,
    * why, payload digest — the proof regulators ask for; never the
    * payload itself), and prove both mass conservation (kept + tombstoned
    * = original) and byte-losslessness of the survivors.
    *
    * Pipeline: original record-gzip container → takedown list BROADCAST
    * (lists are thousands of URLs; the container side never shuffles) →
    * anti-join survivors re-written through the distributed WARC sink →
    * semi-join tombstones (uri, record id, reason, digest) as parquet →
    * readout reads BOTH artifacts back: per lang the kept record count +
    * kept payload checksum (from the PURGED container — if the purge
    * didn't actually rewrite bytes, the checksum includes purged docs and
    * the oracle hash breaks) and the tombstone counts per reason + digest
    * checksum. The fixture takedown list is doc_id % 17 == 5 (≈6%),
    * reason copyright/privacy by parity; a takedown hits BOTH the
    * response and the request record of the URI.
    *
    * Scale shape: two container scans (purge write, tombstone write) +
    * one purged-container scan — each split-parallel with the broadcast
    * probe fused in; the readout aggregates are |langs|-row. At 100 TB
    * this is the only sound shape: a takedown never triggers a corpus
    * shuffle, and containers are rewritten once, sequentially, per
    * split. */
  def qTakedownPurge(spark: SparkSession, sfDir: String): DataFrame = {
    val base = "/root/repo/target/takedown/" + new java.io.File(sfDir).getName
    val docs = t(spark, sfDir, "documents")
    graft.WarcIO.writeWarc(warcRecordsFor(docs), base + "/orig",
      recordGzip = true)

    val takedown = docs.filter(col("doc_id") % 17 === 5)
      .select(
        concat(lit("https://fixture.test/"), col("lang"), lit("/"),
          col("doc_id").cast("string")).as("target_uri"),
        when(col("doc_id") % 2 === 0, "copyright").otherwise("privacy")
          .as("reason"))

    def orig = spark.read.format("warc")
      .option("maxSplitBytes",
        FastxQueries.adaptiveSplitBytes(spark, base + "/orig").toString)
      .option("recordGzipSplit", "true")
      .load(base + "/orig")

    graft.WarcIO.writeWarc(
      orig.join(broadcast(takedown), Seq("target_uri"), "left_anti")
        .select("record_type", "record_id", "warc_date", "target_uri",
          "content_type", "payload"),
      base + "/purged", recordGzip = true)

    orig.join(broadcast(takedown), Seq("target_uri"))
      .select(col("target_uri"), col("record_id"), col("reason"),
        md5(col("payload")).as("digest"))
      .write.mode("overwrite").parquet(base + "/tombstones")

    val langOf = (uri: org.apache.spark.sql.Column) =>
      regexp_extract(uri, "^https://fixture\\.test/([a-z]+)/", 1)
    val kept = spark.read.format("warc")
      .option("maxSplitBytes",
        FastxQueries.adaptiveSplitBytes(spark, base + "/purged").toString)
      .option("recordGzipSplit", "true")
      .load(base + "/purged")
      .select(langOf(col("target_uri")).as("lang"),
        conv(substring(md5(col("payload")), 1, 10), 16, 10).cast("long").as("pc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("kept_records"),
        sum("pc").as("kept_payload_checksum"))
    val tomb = spark.read.parquet(base + "/tombstones")
      .select(langOf(col("target_uri")).as("lang"), col("reason"),
        conv(substring(col("digest"), 1, 10), 16, 10).cast("long").as("dc"))
      .groupBy("lang")
      .agg(count(lit(1)).as("purged_records"),
        sum(when(col("reason") === "copyright", 1L).otherwise(0L))
          .as("purged_copyright"),
        sum(when(col("reason") === "privacy", 1L).otherwise(0L))
          .as("purged_privacy"),
        sum("dc").as("purged_digest_checksum"))
    kept.join(tomb, Seq("lang"), "left_outer")
      .select(col("lang"), col("kept_records"), col("kept_payload_checksum"),
        coalesce(col("purged_records"), lit(0L)).as("purged_records"),
        coalesce(col("purged_copyright"), lit(0L)).as("purged_copyright"),
        coalesce(col("purged_privacy"), lit(0L)).as("purged_privacy"),
        coalesce(col("purged_digest_checksum"), lit(0L))
          .as("purged_digest_checksum"))
      .orderBy("lang")
  }

  /** Oracle: kept/purged masses and checksums recomputed straight from
    * `documents` (response payload = HTTP head + the html fixture,
    * request payload = the deterministic GET) — the containers never
    * enter the oracle's path, so any purge or roundtrip slip breaks the
    * hash. */
  val qTakedownPurgeSql: String = {
    val head = "'HTTP/1.1 200 OK' || chr(13) || chr(10) || " +
      "'Content-Type: text/html' || chr(13) || chr(10) || chr(13) || chr(10)"
    val req = "'GET /p/' || h.doc_id || ' HTTP/1.1' || chr(13) || chr(10) || " +
      "'Host: fixture.test' || chr(13) || chr(10) || chr(13) || chr(10)"
    s"""WITH $htmlExtractSqlCtes,
       |tdk AS MATERIALIZED (
       |  SELECT h.doc_id, h.lang,
       |         CAST('0x' || substr(md5($head || h.html), 1, 10) AS BIGINT)
       |           + CAST('0x' || substr(md5($req), 1, 10) AS BIGINT) AS pc2,
       |         (h.doc_id % 17 = 5) AS takedown,
       |         CASE WHEN h.doc_id % 2 = 0 THEN 'copyright' ELSE 'privacy' END AS reason
       |  FROM hhtml h),
       |tdkept AS (
       |  SELECT lang, CAST(2 * count(*) AS BIGINT) AS kept_records,
       |         CAST(sum(pc2) AS BIGINT) AS kept_payload_checksum
       |  FROM tdk WHERE NOT takedown GROUP BY lang),
       |tdpurged AS (
       |  SELECT lang, CAST(2 * count(*) AS BIGINT) AS purged_records,
       |         CAST(2 * count(*) FILTER (WHERE reason = 'copyright') AS BIGINT) AS purged_copyright,
       |         CAST(2 * count(*) FILTER (WHERE reason = 'privacy') AS BIGINT) AS purged_privacy,
       |         CAST(sum(pc2) AS BIGINT) AS purged_digest_checksum
       |  FROM tdk WHERE takedown GROUP BY lang)
       |SELECT k.lang, k.kept_records, k.kept_payload_checksum,
       |       coalesce(p.purged_records, 0) AS purged_records,
       |       coalesce(p.purged_copyright, 0) AS purged_copyright,
       |       coalesce(p.purged_privacy, 0) AS purged_privacy,
       |       coalesce(p.purged_digest_checksum, 0) AS purged_digest_checksum
       |FROM tdkept k LEFT JOIN tdpurged p ON p.lang = k.lang
       |ORDER BY k.lang""".stripMargin
  }

  /** Oracle: the SAME html fixture chain ([[htmlExtractSqlCtes]]), payload
    * md5 over the HTTP head + html, extraction readout — all straight from
    * `documents`, never touching the container: a roundtrip slip anywhere
    * in write → split → resync → parse shows up as a hash mismatch. */
  val qWarcIngestSql: String = {
    val head = "'HTTP/1.1 200 OK' || chr(13) || chr(10) || " +
      "'Content-Type: text/html' || chr(13) || chr(10) || chr(13) || chr(10)"
    s"""WITH $htmlExtractSqlCtes
       |SELECT h.lang, count(*) AS n_docs,
       |  CAST(sum(x.kl) AS BIGINT) AS kept_lines,
       |  CAST(sum(length(x.extracted)) AS BIGINT) AS extracted_chars,
       |  CAST(sum(CAST('0x' || substr(md5($head || h.html), 1, 10) AS BIGINT)) AS BIGINT) AS payload_checksum,
       |  CAST(sum(CAST('0x' || substr(md5(x.extracted), 1, 10) AS BIGINT)) AS BIGINT) AS checksum
       |FROM hhtml h JOIN hext x ON x.doc_id = h.doc_id
       |GROUP BY h.lang ORDER BY h.lang""".stripMargin
  }

  /** The OUTLINK fixture (round 15) — a deterministic link page per
    * document, shared by [[qWatExport]] and [[qLinkGraph]]. Each page on
    * host `site(doc_id % 29).com` carries five planted hrefs, one per
    * downstream rule:
    *  - `u1` absolute https → site((7·doc_id+3) % 29) — the plain edge;
    *  - `u2` SHOUTED case + `:443` default port → site((doc_id div 29)
    *    % 29) — canonicalization must lower + strip before host edges;
    *  - `u3` (every 3rd doc) → site0 — the hub that gives the graph a
    *    high-rank node;
    *  - `u4` = u1 + a utm tracker — canonicalizes ONTO u1 (alias collapse
    *    before edge dedup);
    *  - `u5` relative `/local/…` — dropped by the absolute-scheme gate.
    * Kept separate from [[htmlFixtureCol]] on purpose: the extraction
    * fixture backs 14 standing oracles; link-graph evolution must not
    * perturb them. */
  private[graft] def linkFixtureCol: org.apache.spark.sql.Column = {
    val d = col("doc_id")
    val t1 = ((d * 7 + 3) % 29).cast("string")
    val t2 = (expr("doc_id div 29") % 29).cast("string")
    val u1 = concat(lit("https://site"), t1, lit(".com/a/"),
      (d % 7).cast("string"))
    concat(
      lit("<html><body><ul><li><a href=\""), u1, lit("\">a</a></li>"),
      lit("<li><a href=\"HTTPS://SITE"), t2, lit(".COM:443/b\">b</a></li>"),
      when(d % 3 === 0,
        lit("<li><a href=\"https://site0.com/\">hub</a></li>")).otherwise(lit("")),
      lit("<li><a href=\""), u1, lit("?utm_source=x"), d.cast("string"),
      lit("\">t</a></li>"),
      lit("<li><a href=\"/local/"), d.cast("string"), lit("\">rel</a></li>"),
      lit("</ul></body></html>"))
  }

  /** The link fixture as a DuckDB CTE `lhtml(doc_id, html)` — verbatim
    * replay of [[linkFixtureCol]]. */
  // NOTE: no line of this fragment may BEGIN with '||' — the fragment is
  // interpolated into oracles that run their own .stripMargin, which would
  // eat the first pipe of a leading '||' (the nested-stripMargin trap)
  private[queries] val linkFixtureSqlCte: String =
    """lhtml AS (
      |  SELECT doc_id,
      |    '<html><body><ul><li><a href="https://site' || ((doc_id*7+3)%29) ||
      |      '.com/a/' || (doc_id%7) || '">a</a></li>' ||
      |    '<li><a href="HTTPS://SITE' || ((doc_id//29)%29) || '.COM:443/b">b</a></li>' ||
      |    CASE WHEN doc_id%3=0 THEN '<li><a href="https://site0.com/">hub</a></li>' ELSE '' END ||
      |    '<li><a href="https://site' || ((doc_id*7+3)%29) || '.com/a/' || (doc_id%7) ||
      |      '?utm_source=x' || doc_id || '">t</a></li>' ||
      |    '<li><a href="/local/' || doc_id || '">rel</a></li>' ||
      |    '</ul></body></html>' AS html
      |  FROM documents)""".stripMargin

  /** WAT export (round 15) — the metadata artifact of the crawl family
    * (Common Crawl ships WARC + WET + WAT; a WAT record's payload is JSON
    * metadata — crucially the OUTLINKS — for one capture): the link
    * fixture runs through the native `html_outlinks` kernel, each page's
    * href list is framed as a JSON `metadata` record, written RECORD-
    * GZIPPED by the distributed sink, read back through gzip-member
    * splits, PARSED BACK from the JSON payload (`from_json` — the readout
    * counts outlinks from the parsed payload, so the JSON must survive
    * the container byte-exactly), and reduced per doc_id bucket with a
    * payload checksum the oracle recomputes straight from `documents`.
    *
    * Scale shape: extraction + JSON framing are row-local kernel passes;
    * the sink streams one .warc.gz per partition; the read fans out on
    * member splits with the `metadata` filter and column prune pushed;
    * the only exchange is the 7-row bucket aggregate. */
  def qWatExport(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = new java.io.File(
      "/root/repo/target/wat_export/" + new java.io.File(sfDir).getName)
    val docs = t(spark, sfDir, "documents")
    val pageUrl = concat(lit("https://site"), (col("doc_id") % 29).cast("string"),
      lit(".com/p/"), col("doc_id").cast("string"))
    val links = graft.plans.HtmlExtractExpressions.htmlOutlinks(linkFixtureCol)
    // JSON framed by explicit concat (NOT to_json) so the oracle can
    // rebuild the exact bytes; the read side still parses it as real JSON
    // a link-free page must frame [] — '["" ]' would parse as ONE empty
    // outlink and desynchronize n_out from the oracle's len(links)
    val payload = concat(lit("{\"url\":\""), pageUrl, lit("\",\"outlinks\":"),
      when(size(links) === 0, lit("[]"))
        .otherwise(concat(lit("[\""), array_join(links, "\",\""), lit("\"]"))),
      lit("}"))
    val recs = docs.select(
      lit("metadata").as("record_type"),
      concat(lit("<urn:uuid:wat-"), col("doc_id").cast("string"), lit(">")).as("record_id"),
      lit("2024-01-01T00:00:00Z").as("warc_date"),
      pageUrl.as("target_uri"),
      lit("application/json").as("content_type"),
      payload.cast("binary").as("payload"))
    graft.WarcIO.writeWarc(recs, dir.getAbsolutePath, recordGzip = true)
    val watSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("outlinks",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))))
    spark.read.format("warc")
      .option("maxSplitBytes",
        FastxQueries.adaptiveSplitBytes(spark, dir.getAbsolutePath).toString)
      .option("recordGzipSplit", "true")
      .load(dir.getAbsolutePath)
      .filter(col("record_type") === "metadata")
      .select(
        (regexp_extract(col("target_uri"), "/p/(\\d+)$", 1).cast("long") % 7).as("bucket"),
        col("payload").cast("string").as("pj"))
      .select(col("bucket"),
        size(from_json(col("pj"), watSchema).getField("outlinks")).cast("long").as("n_out"),
        col("pj"))
      .repartition(col("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_records"),
        sum(col("n_out")).as("n_outlinks"),
        sum(conv(graft.plans.HashExpressions.md5Prefix(col("pj"), 10), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("bucket")
  }

  /** Oracle: fixture + regex outlink extraction + JSON framing replayed
    * from `documents` — any drift in kernel extraction, JSON framing, the
    * gzip-member roundtrip, or the read-side JSON parse breaks counts or
    * the checksum. */
  val qWatExportSql: String =
    s"""WITH $linkFixtureSqlCte,
       |lnk AS (
       |  SELECT doc_id, regexp_extract_all(html, 'href="([^"]*)"', 1) AS links
       |  FROM lhtml),
       |wat AS (
       |  SELECT doc_id, len(links) AS n_out,
       |    '{"url":"https://site' || (doc_id%29) || '.com/p/' || doc_id
       |      || '","outlinks":'
       |      || CASE WHEN len(links) = 0 THEN '[]'
       |              ELSE '["' || array_to_string(links, '","') || '"]' END
       |      || '}' AS payload
       |  FROM lnk)
       |SELECT doc_id % 7 AS bucket, count(*) AS n_records,
       |  CAST(sum(n_out) AS BIGINT) AS n_outlinks,
       |  CAST(sum(CAST('0x' || substr(md5(payload), 1, 10) AS BIGINT)) AS BIGINT) AS checksum
       |FROM wat GROUP BY 1 ORDER BY 1""".stripMargin

  /** REAL link graph + PageRank (round 15) — host-level ranking on the
    * actual hyperlink graph (q_source_pagerank ranks a synthetic
    * duplication graph; a crawl ranks hosts on who links whom): the link
    * fixture → native `html_outlinks` kernel → absolute-scheme gate →
    * URL canonicalization kernel (the SHOUTED `:443` variant must land on
    * the same host; the tracker alias must collapse onto u1) → registrable
    * domain → distinct directed host edges (self-loops dropped) → the
    * fixed-point integer PageRank ([[graft.operators.LinkAnalysis
    * .pagerank]], damping 17/20, mass 2^40, 3 iterations) over the full
    * 29-host universe. Readout (domain, deg, pr) is bit-exact: the oracle
    * replays extraction by regex, host normalization relationally, and
    * all three iterations as unrolled integer CTEs.
    *
    * Scale shape: extraction/gate/canon are one row-local kernel pass;
    * the edge build is one distinct on (src, dst); each iteration is one
    * equi-join + map-side-combinable sum on a |hosts|-node table — the
    * co-partitioned shape that scales to a 100 TB edge list (the heavy
    * side, per-capture link rows, passes ONE distinct and never iterates). */
  def qLinkGraph(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = t(spark, sfDir, "documents")
    val src = concat(lit("site"), (col("doc_id") % 29).cast("string"), lit(".com"))
    val edges = docs
      .select(src.as("src"),
        explode(graft.plans.HtmlExtractExpressions.htmlOutlinks(linkFixtureCol))
          .as("href"))
      .filter(instr(col("href"), "://") > 0) // absolute links only
      .select(col("src"),
        Sampling.registrableDomain(Sampling.urlHost(
          graft.plans.UrlExpressions.urlCanon(col("href")))).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val nodes = docs.select(src.as("domain")).distinct()
    try {
      graft.operators.LinkAnalysis
        .pagerank(nodes, edges, "domain", iters = 3)
        .select(col("id").as("domain"), col("deg"), col("pr"))
        .orderBy("domain")
    } finally graft.CacheScope.release()
  }

  /** Oracle: fixture, regex extraction, host normalization (lower +
    * port strip — what canon contributes at host level), PSL-free
    * two-label domains (site hosts), edge distinct, and the three
    * integer-PageRank iterations unrolled
    * ([[DedupQueries.pagerankIterSql]]). */
  val qLinkGraphSql: String =
    s"""WITH $linkFixtureSqlCte,
       |raw AS (
       |  SELECT doc_id, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href
       |  FROM lhtml),
       |edges0 AS (
       |  SELECT DISTINCT 'site' || (doc_id % 29) || '.com' AS src,
       |    string_split(string_split(lower(string_split(href, '://')[2]), '/')[1], ':')[1] AS dst
       |  FROM raw WHERE contains(href, '://')),
       |edges AS (SELECT src, dst FROM edges0 WHERE src <> dst),
       |nodes AS (SELECT DISTINCT 'site' || (doc_id % 29) || '.com' AS id FROM documents),
       |nconst AS (SELECT count(*) AS n FROM nodes),
       |tconst AS (SELECT 3 * 1099511627776 // 20 // n AS t FROM nconst),
       |deg AS (
       |  SELECT n.id, CAST(count(e.src) AS BIGINT) AS deg
       |  FROM nodes n LEFT JOIN edges e ON e.src = n.id GROUP BY n.id),
       |pr0 AS (SELECT id, deg, 1099511627776 // (SELECT n FROM nconst) AS pr FROM deg),
       |${DedupQueries.pagerankIterSql("pr0", "pr1")},
       |${DedupQueries.pagerankIterSql("pr1", "pr2")},
       |${DedupQueries.pagerankIterSql("pr2", "pr3")}
       |SELECT id AS domain, deg, pr FROM pr3 ORDER BY domain""".stripMargin

  /** CDX index + random-access fetch (round 15) — the third leg of the
    * crawl story: ingest → INDEX → SERVE. Every public-crawl consumer
    * resolves URLs through a CDX index and seeks straight to one record;
    * this query builds the whole path and proves the served bytes against
    * the oracle:
    *
    *  1. the q_warc_gz container (response + request per document,
    *     per-record-gzip) is written by the distributed sink;
    *  2. ONE member-split scan (record_type filter + column prune pushed)
    *     derives the index rows — SURT key from the canonicalization
    *     kernel, capture date, `(record_file, record_offset)` address,
    *     payload digest — cached, then written as BOTH artifacts:
    *     globally-sorted CDXJ text shards (the interop format CDX servers
    *     binary-search) and the key-sorted parquet serving twin;
    *  3. a bounded probe batch (the 48 lowest-md5 doc_ids — the
    *     q_pair_mining bounded-serving discipline) looks up through the
    *     PARQUET twin with the 48-key `In` filter PUSHED to the scan
    *     (row groups pruned by the sorted layout's min/max zone maps —
    *     plan-gated in PlanQualitySpec);
    *  4. each hit seeks its gzip member at the indexed offset and
    *     inflates EXACTLY ONE record ([[graft.sources.warc.CdxIndex
    *     .fetchRecords]] — no resync, no container scan);
    *  5. readout per probe: SURT key, served content_length, served
    *     payload md5 — all recomputed by the oracle straight from
    *     `documents`, so any drift anywhere in sink → index → seek →
    *     inflate shows up as a hash mismatch.
    *
    * Scale shape: the index build is one pushed-down container scan + one
    * range shuffle of address rows (no payload bytes pass the shuffle);
    * the artifact is ~0.1% of corpus bytes; the lookup touches O(1) row
    * groups of the index and the fetch reads only the one member's bytes
    * per probe. At 100 TB this is exactly the CC-index serving plan. */
  def qCdxFetch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.sources.warc.CdxIndex
    val sfName = new java.io.File(sfDir).getName
    val dir = new java.io.File(s"/root/repo/target/cdx_fetch/$sfName")
    val idxTxt = new java.io.File(dir.getParentFile, s"$sfName-cdxj").getAbsolutePath
    val idxPq = new java.io.File(dir.getParentFile, s"$sfName-cdxpq").getAbsolutePath
    val docs = t(spark, sfDir, "documents")
    graft.WarcIO.writeWarc(warcRecordsFor(docs), dir.getAbsolutePath,
      recordGzip = true)
    val warc = spark.read.format("warc")
      .option("maxSplitBytes",
        FastxQueries.adaptiveSplitBytes(spark, dir.getAbsolutePath).toString)
      .option("recordGzipSplit", "true")
      .load(dir.getAbsolutePath)
    // index rows cached: both artifact writes share the single container
    // scan instead of re-scanning (the q_web_pipeline extraction lesson)
    val cdx = graft.CacheScope.cached(CdxIndex.cdxRecords(warc))
    CdxIndex.writeCdxj(cdx, idxTxt)
    CdxIndex.writeCdxParquet(cdx, idxPq)
    // bounded probe batch, collected once (48 rows — the ≤64-row serving
    // batch discipline): ids, langs, and the SURT keys to look up
    val probeRows = docs
      .select(col("doc_id"), col("lang"),
        CdxIndex.surtKey(concat(lit("https://fixture.test/"), col("lang"),
          lit("/"), col("doc_id").cast("string"))).as("surt"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .limit(48)
      .collect()
    val surts = probeRows.map(_.getString(2)).toSeq
    // point lookup: the 48-key In filter pushes into the parquet index
    // scan; the key-sorted layout makes row-group zone maps selective
    val hits = spark.read.parquet(idxPq)
      .filter(col("surt").isInCollection(surts))
      .select(col("surt"), col("record_file"), col("record_offset"))
    import spark.implicits._
    val probeInfo = probeRows.toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toDF("doc_id", "lang", "surt")
    val addrs = hits.join(broadcast(probeInfo), Seq("surt"))
      .select(col("doc_id").as("probe_id"), col("record_file"),
        col("record_offset"))
      .sortWithinPartitions("record_file", "record_offset")
    CdxIndex.fetchRecords(addrs, dir.getAbsolutePath, gzMembers = true)
      .join(broadcast(probeInfo), col("probe_id") === col("doc_id"))
      .select(col("doc_id"), col("lang"), col("surt"),
        col("content_length"),
        substring(md5(col("payload")), 1, 10).as("payload_md5"))
      .orderBy("doc_id")
  }

  /** Oracle: probe selection, SURT construction, served length and digest
    * all replayed from `documents` — the container, both index artifacts,
    * and the member seek must be collectively invisible to the result. */
  val qCdxFetchSql: String = {
    val head = "'HTTP/1.1 200 OK' || chr(13) || chr(10) || " +
      "'Content-Type: text/html' || chr(13) || chr(10) || chr(13) || chr(10)"
    s"""WITH $htmlExtractSqlCtes,
       |cprobes AS (
       |  SELECT doc_id, lang FROM documents
       |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 48)
       |SELECT h.doc_id, h.lang,
       |  'test,fixture)/' || h.lang || '/' || h.doc_id AS surt,
       |  CAST(strlen($head || h.html) AS BIGINT) AS content_length,
       |  substr(md5($head || h.html), 1, 10) AS payload_md5
       |FROM hhtml h JOIN cprobes p ON p.doc_id = h.doc_id
       |ORDER BY h.doc_id""".stripMargin
  }

  /** WET export (round 14) — the extracted-text artifact of the crawl
    * family (Common Crawl ships WARC + WET; WET files ARE WARC files of
    * `conversion` records whose payload is the extracted plain text):
    * documents → html fixture → the html_extract kernel → `conversion`
    * records written RECORD-GZIPPED by the distributed sink → read back
    * through gzip-MEMBER splits → per-lang readout with the extracted
    * text's checksum recomputed by the oracle straight from `documents`
    * (the shared hext chain). This is the WET PRODUCTION job every crawl
    * pipeline runs after extraction, and its read-back proves the
    * extracted corpus survives the compressed container byte-exactly.
    *
    * Scale shape: extraction is the fused kernel pass; the sink streams
    * one .warc.gz per partition; the read fans out on member splits with
    * the `conversion` filter and 2-column prune pushed; the only
    * exchanges are the lang boundary + aggregate. */
  def qWetExport(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = new java.io.File(
      "/root/repo/target/wet_export/" + new java.io.File(sfDir).getName)
    val docs = t(spark, sfDir, "documents")
    val ex = graft.plans.HtmlExtractExpressions.htmlExtract(htmlFixtureCol)
    val convRecs = docs.select(
      lit("conversion").as("record_type"),
      concat(lit("<urn:uuid:conv-"), col("doc_id").cast("string"), lit(">")).as("record_id"),
      lit("2024-01-01T00:00:00Z").as("warc_date"),
      concat(lit("https://fixture.test/"), col("lang"),
        lit("/"), col("doc_id").cast("string")).as("target_uri"),
      lit("text/plain").as("content_type"),
      ex.getField("extracted").cast("binary").as("payload"))
    graft.WarcIO.writeWarc(convRecs, dir.getAbsolutePath, recordGzip = true)
    spark.read.format("warc")
      .option("maxSplitBytes",
        FastxQueries.adaptiveSplitBytes(spark, dir.getAbsolutePath).toString)
      .option("recordGzipSplit", "true")
      .load(dir.getAbsolutePath)
      .filter(col("record_type") === "conversion")
      .select(
        regexp_extract(col("target_uri"), "^https://fixture\\.test/([a-z]+)/", 1).as("lang"),
        col("payload").cast("string").as("wet_text"))
      .repartition(col("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("wet_text"))).cast("long").as("text_chars"),
        sum(conv(graft.plans.HashExpressions.md5Prefix(col("wet_text"), 10), 16, 10)
          .cast("long")).as("checksum"))
      .orderBy("lang")
  }

  /** WARC `revisit` records (round 15) — the container-level dedup
    * convention real crawls ship: byte-identical payloads are stored ONCE
    * and later captures become tiny `revisit` records pointing at the
    * canonical capture. Fixture: a re-crawl corpus where every group of 3
    * doc_ids shares one payload (the representative `(doc_id div 3)·3`'s
    * html under its own unique URL) — so ~⅔ of the records deduplicate.
    * Pipeline: [[graft.WarcIO.revisitize]] (digest-keyed winner = min
    * record_id; losers → empty-payload revisit + `refers_to` +
    * identical-payload-digest profile header) → record-gzip sink →
    * member-split read-back → [[graft.WarcIO.resolveRevisits]] (each
    * revisit joins its target and recovers type + payload). Readout per
    * lang: record count, revisit count, and the md5 checksum over the
    * RESOLVED payloads — which the oracle computes straight from
    * `documents` as if no dedup had happened: resolution must be
    * byte-lossless.
    *
    * Scale shape: revisitize is one digest-keyed shuffle (the exact-dedup
    * shape) and the container then stores each payload once — the point
    * of the convention; resolution is one equi-join of the (payload-less)
    * revisit side onto canonical records. */
  def qWarcRevisit(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = new java.io.File(
      "/root/repo/target/warc_revisit/" + new java.io.File(sfDir).getName)
    val docs = t(spark, sfDir, "documents")
    // re-crawl fixture: each doc captures the REPRESENTATIVE's page
    val reps = docs
      .select((expr("doc_id div 3") * 3).as("__rep"),
        col("doc_id").as("orig_id"), col("lang").as("orig_lang"))
      .join(docs.select(col("doc_id"), col("text")),
        col("__rep") === col("doc_id"))
    val recs = reps.select(
      lit("response").as("record_type"),
      concat(lit("<urn:uuid:doc-"), col("orig_id").cast("string"), lit(">")).as("record_id"),
      lit("2024-01-01T00:00:00Z").as("warc_date"),
      concat(lit("https://fixture.test/"), col("orig_lang"),
        lit("/"), col("orig_id").cast("string")).as("target_uri"),
      lit("application/http; msgtype=response").as("content_type"),
      concat(lit(HttpHead), htmlFixtureCol).cast("binary").as("payload"))
    graft.WarcIO.writeWarc(graft.WarcIO.revisitize(recs), dir.getAbsolutePath,
      recordGzip = true)
    val back = spark.read.format("warc")
      .option("maxSplitBytes",
        FastxQueries.adaptiveSplitBytes(spark, dir.getAbsolutePath).toString)
      .option("recordGzipSplit", "true")
      .load(dir.getAbsolutePath)
    graft.WarcIO.resolveRevisits(back)
      .select(
        regexp_extract(col("target_uri"), "^https://fixture\\.test/([a-z]+)/", 1).as("lang"),
        col("was_revisit"),
        md5(col("payload")).as("pmd5"))
      .repartition(col("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_records"),
        count_if(col("was_revisit")).as("n_revisits"),
        sum(conv(substring(col("pmd5"), 1, 10), 16, 10).cast("long")).as("payload_checksum"))
      .orderBy("lang")
  }

  /** Oracle: the re-crawl fixture, winner selection (min record_id per
    * digest — string order, replayed verbatim), and the resolved payload
    * checksum recomputed from `documents` as if no dedup had happened. */
  val qWarcRevisitSql: String = {
    val head = "'HTTP/1.1 200 OK' || chr(13) || chr(10) || " +
      "'Content-Type: text/html' || chr(13) || chr(10) || chr(13) || chr(10)"
    s"""WITH $htmlExtractSqlCtes,
       |rrecs AS (
       |  SELECT d.doc_id, d.lang,
       |         '<urn:uuid:doc-' || d.doc_id || '>' AS rid,
       |         md5($head || h.html) AS pmd5
       |  FROM documents d JOIN hhtml h ON h.doc_id = (d.doc_id // 3) * 3),
       |rwin AS (SELECT pmd5, min(rid) AS wrid FROM rrecs GROUP BY 1)
       |SELECT r.lang, count(*) AS n_records,
       |  CAST(sum(CASE WHEN r.rid <> w.wrid THEN 1 ELSE 0 END) AS BIGINT) AS n_revisits,
       |  CAST(sum(CAST('0x' || substr(r.pmd5, 1, 10) AS BIGINT)) AS BIGINT) AS payload_checksum
       |FROM rrecs r JOIN rwin w ON w.pmd5 = r.pmd5
       |GROUP BY r.lang ORDER BY r.lang""".stripMargin
  }

  /** Oracle: extraction replayed from `documents` via the shared hext
    * chain — any slip in extract → gzip-member write → member-split read
    * breaks the checksum. */
  val qWetExportSql: String =
    s"""WITH $htmlExtractSqlCtes
       |SELECT lang, count(*) AS n_docs,
       |  CAST(sum(length(extracted)) AS BIGINT) AS text_chars,
       |  CAST(sum(CAST('0x' || substr(md5(extracted), 1, 10) AS BIGINT)) AS BIGINT) AS checksum
       |FROM hext GROUP BY lang ORDER BY lang""".stripMargin

  /** The WEB-corpus composition (round 13): HTML→text extraction feeding
    * the full curation cascade — extract → language-identifiability +
    * quality gate → exact dedup → MinHash-LSH near-dedup → per-lang
    * stats. [[qCurationPipeline]] pins the cascade on clean text; this
    * query pins that the web stage composes IN FRONT of it (real crawl
    * pipelines never see clean text), with every stage an
    * already-verified block and the whole chain replayed in DuckDB from
    * the same shared SQL fragments.
    *
    * Scale shape: extraction + gates fuse into ONE narrow scan pass
    * (extraction is row-local HOFs; the gates are row-local kernels);
    * exact dedup is one hash agg; near-dedup is the bucketed cascade;
    * final stats one aggregate. The kept-chars column proves boilerplate
    * mass never reaches the kept corpus. */
  def qWebPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    // cached: the dedup cascade downstream scans its input several times
    // (shingle DF, banding, pair verify), and without the cache every
    // rescan would REBUILD the HTML and re-run the full regex extraction
    // (measured: 14.6 s vs 3.4 s for the same cascade on clean text at
    // sf0.1). Real pipelines materialize extraction output for exactly
    // this reason — it is a separate corpus-rewrite stage, not a view.
    val web = graft.CacheScope.cached(t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.plans.HtmlExtractExpressions.htmlExtract(htmlFixtureCol)
          .getField("extracted").as("text")))
    val filtered = TextQueries.withLangScores(web)
      .withColumn("pred_lang", TextQueries.predLangCol)
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("quality") >= QualityMin && col("pred_lang") =!= "und")
      .select("doc_id", "lang", "text", "quality")
    // no separate exactByContent stage: dedupeNear's internal
    // exact-collapse applies the identical min-id-per-md5(text) winner
    // rule (see qCurationPipeline; oracle hash unchanged)
    val kept = Dedup.dedupeNear(filtered, "doc_id", "text", n = 3, minJaccard = JaccardMin)
    kept
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        sum(length(col("text"))).cast("long").as("kept_chars"),
        dsum(col("quality")).as("sum_quality"))
      .orderBy("lang")
  }

  lazy val qWebPipelineSql: String =
    s"""WITH $htmlExtractSqlCtes,
       |wdocs AS (SELECT doc_id, lang, extracted AS text FROM hext),
       |${TextQueries.langScoredSqlCte("wdocs")},
       |enriched AS (
       |  SELECT doc_id, lang, text,
       |         ${TextQueries.predLangSqlExpr} AS pred_lang,
       |         ${TextQueries.qualitySqlExpr} AS quality
       |  FROM scored),
       |filtered AS (
       |  SELECT * FROM enriched
       |  WHERE quality >= $QualityMin AND pred_lang <> 'und'),
       |winners AS (
       |  SELECT min(doc_id) AS doc_id FROM filtered GROUP BY md5(text)),
       |fdocs AS (
       |  SELECT f.* FROM filtered f JOIN winners w ON w.doc_id = f.doc_id),
       |${DedupQueries.minhashSqlCtes("fdocs")},
       |${DedupQueries.losersSqlCtes(JaccardMin)}
       |SELECT lang, count(*) AS n_kept,
       |       CAST(sum(length(text)) AS BIGINT) AS kept_chars,
       |       CAST(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_quality
       |FROM fdocs
       |WHERE doc_id NOT IN (SELECT d2 FROM losers)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Web-table mining (round 15) — the structured-data harvest step (the
    * WDC Web Table Corpus family: crawl HTML → relational rows; table
    * corpora feed KB construction and table-QA training sets). The
    * fixture wraps each document in a page carrying a key/value metadata
    * table, with one planted arm per contract rule:
    *
    *  - a `<th>` header row with padded whitespace (` value ` must trim);
    *  - an entity cell (`words &amp; toks` → `words & toks`);
    *  - a numeric cell (the char count — harvested as integer mass, the
    *    web-table numeric-column use case);
    *  - doc_id % 3 == 0 adds a SECOND table whose cell carries an inner
    *    `<b>` tag that must strip;
    *  - doc_id % 5 == 2 omits the metadata table entirely (a page can
    *    be table-free — those docs must vanish from the readout, not
    *    emit empty rows).
    *
    * Extraction is the ONE-pass native [[graft.plans.HtmlTables]]
    * byte-scanner whose contract is exactly the oracle's non-greedy RE2
    * replay (see its scaladoc). Readout per lang: cell-bearing docs,
    * table/row/cell counts (composite integer keys — rows are ≤ 9 per
    * table, tables ≤ 9 per doc, so doc_id·100 + tbl·10 + row is
    * collision-free), header-cell count, harvested numeric mass, and the
    * 40-bit md5 cell checksum (any cell-text drift breaks the hash).
    *
    * Scale shape: fixture build + scan + explode are one narrow per-row
    * pipeline fused into the parquet scan; the only exchange is the
    * |langs|-row two-phase aggregate. */
  private[graft] def htmlTablesFixtureCol: org.apache.spark.sql.Column = {
    val toks = tokens(col("text"))
    val meta = concat(
      lit("<table class=\"meta\"><tr><th>key</th><th> value </th></tr>"),
      lit("<tr><td>lang</td><td>"), col("lang"), lit("</td></tr>"),
      lit("<tr><td>chars</td><td>"), length(col("text")).cast("string"),
      lit("</td></tr>"),
      lit("<tr><td>words &amp; toks</td><td>"), size(toks).cast("string"),
      lit("</td></tr></table>"))
    val extra = when(col("doc_id") % 3 === 0, concat(
      lit("<table class=\"extra\"><tr><td>note</td><td><b>bold "), col("lang"),
      lit("</b> cell</td></tr></table>"))).otherwise(lit(""))
    concat(
      lit("<html><body><h1>Doc "), col("doc_id").cast("string"), lit("</h1>"),
      when(col("doc_id") % 5 === 2, lit("")).otherwise(meta),
      extra, lit("<p>"), col("text"), lit("</p></body></html>"))
  }

  def qHtmlTables(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(graft.plans.HtmlExtractExpressions
          .htmlTables(htmlTablesFixtureCol)).as("c"))
      .select(col("doc_id"), col("lang"), col("c.*"))
      .groupBy("lang")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("doc_id") * 10 + col("tbl")).as("n_tables"),
        countDistinct(col("doc_id") * 100 + col("tbl") * 10 + col("row"))
          .as("n_rows"),
        count(lit(1)).as("n_cells"),
        sum(when(col("is_header"), 1L).otherwise(0L)).as("header_cells"),
        sum(when(col("cell").rlike("^[0-9]+$"), col("cell").cast("long"))
          .otherwise(0L)).as("num_mass"),
        sum(conv(graft.plans.HashExpressions.md5Prefix(col("cell"), 10), 16, 10)
          .cast("long")).as("cell_checksum"))
      .orderBy("lang")

  val qHtmlTablesSql: String =
    """WITH wtfix AS MATERIALIZED (
      |  SELECT doc_id, lang,
      |    '<html><body><h1>Doc ' || doc_id || '</h1>' ||
      |    (CASE WHEN doc_id % 5 = 2 THEN '' ELSE
      |      '<table class="meta"><tr><th>key</th><th> value </th></tr>' ||
      |      '<tr><td>lang</td><td>' || lang || '</td></tr>' ||
      |      '<tr><td>chars</td><td>' || length(text) || '</td></tr>' ||
      |      '<tr><td>words &amp; toks</td><td>' ||
      |      len(list_filter(string_split(text, ' '), t -> t <> '')) ||
      |      '</td></tr></table>' END) ||
      |    (CASE WHEN doc_id % 3 = 0 THEN
      |      '<table class="extra"><tr><td>note</td><td><b>bold ' || lang ||
      |      '</b> cell</td></tr></table>' ELSE '' END) ||
      |    '<p>' || text || '</p></body></html>' AS html
      |  FROM documents),
      |wtt AS (
      |  SELECT doc_id, lang,
      |         regexp_extract_all(html, '<table[^>]*>(.*?)</table>', 1) AS tabs
      |  FROM wtfix),
      |wttab AS (
      |  SELECT doc_id, lang, CAST(ti.i AS INT) AS tbl, tabs[ti.i] AS tb
      |  FROM wtt, LATERAL unnest(generate_series(1, len(tabs))) AS ti(i)),
      |wtr AS (
      |  SELECT doc_id, lang, tbl,
      |         regexp_extract_all(tb, '<tr[^>]*>(.*?)</tr>', 1) AS rws
      |  FROM wttab),
      |wtrow AS (
      |  SELECT doc_id, lang, tbl, CAST(ri.i AS INT) AS rw, rws[ri.i] AS rb
      |  FROM wtr, LATERAL unnest(generate_series(1, len(rws))) AS ri(i)),
      |wtc AS (
      |  SELECT doc_id, lang, tbl, rw, (rb LIKE '%<th%') AS hdr,
      |         regexp_extract_all(rb, '<t[hd][^>]*>(.*?)</t[hd]>', 1) AS cs
      |  FROM wtrow),
      |wtcell AS (
      |  SELECT doc_id, lang, tbl, rw, hdr,
      |         trim(regexp_replace(
      |           replace(replace(replace(replace(replace(
      |             regexp_replace(cs[ci.i], '<[^>]*>', '', 'g'),
      |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
      |             '&#39;', ''''), '&amp;', '&'),
      |           '\s+', ' ', 'g')) AS cell
      |  FROM wtc, LATERAL unnest(generate_series(1, len(cs))) AS ci(i))
      |SELECT lang,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       CAST(count(DISTINCT doc_id * 10 + tbl) AS BIGINT) AS n_tables,
      |       CAST(count(DISTINCT doc_id * 100 + tbl * 10 + rw) AS BIGINT) AS n_rows,
      |       CAST(count(*) AS BIGINT) AS n_cells,
      |       CAST(count(*) FILTER (WHERE hdr) AS BIGINT) AS header_cells,
      |       CAST(sum(CASE WHEN regexp_matches(cell, '^[0-9]+$')
      |                     THEN CAST(cell AS BIGINT) ELSE 0 END) AS BIGINT) AS num_mass,
      |       CAST(sum(CAST('0x' || substr(md5(cell), 1, 10) AS BIGINT)) AS BIGINT) AS cell_checksum
      |FROM wtcell
      |GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_html_extract" -> (qHtmlExtract _),
    "q_html_tables" -> (qHtmlTables _),
    "q_takedown_purge" -> (qTakedownPurge _),
    "q_anchor_text" -> (qAnchorText _),
    "q_warc_ingest" -> (qWarcIngest _),
    "q_warc_gz" -> (qWarcGz _),
    "q_warc_zst" -> (qWarcZst _),
    "q_cdx_fetch" -> (qCdxFetch _),
    "q_wat_export" -> (qWatExport _),
    "q_link_graph" -> (qLinkGraph _),
    "q_wet_export" -> (qWetExport _),
    "q_warc_revisit" -> (qWarcRevisit _),
    "q_web_pipeline" -> (qWebPipeline _),
    "q_bootstrap_ci" -> (qBootstrapCi _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_dsir" -> (qDsir _),
    "q_dsir_bigram" -> (qDsirBigram _),
    "q_mixture_plan" -> (qMixturePlan _),
    "q_curation_pipeline" -> (qCurationPipeline _),
    "q_prep_pipeline" -> (qPrepPipeline _),
    "q_sample_deterministic" -> (qSampleDeterministic _),
    "q_sample_stratified" -> (qSampleStratified _),
    "q_source_cap" -> (qSourceCap _),
    "q_domain_cap" -> (qDomainCap _),
    "q_url_filter" -> (qUrlFilter _),
    "q_robots_gate" -> (qRobotsGate _),
    "q_crawl_frontier" -> (qCrawlFrontier _),
    "q_url_canon" -> (qUrlCanon _),
    "q_shard_shuffle" -> (qShardShuffle _))

  val oracles: Map[String, String] = Map(
    "q_html_extract" -> qHtmlExtractSql,
    "q_html_tables" -> qHtmlTablesSql,
    "q_takedown_purge" -> qTakedownPurgeSql,
    "q_anchor_text" -> qAnchorTextSql,
    "q_warc_ingest" -> qWarcIngestSql,
    "q_warc_gz" -> qWarcIngestSql,
    "q_warc_zst" -> qWarcIngestSql,
    "q_cdx_fetch" -> qCdxFetchSql,
    "q_wat_export" -> qWatExportSql,
    "q_link_graph" -> qLinkGraphSql,
    "q_wet_export" -> qWetExportSql,
    "q_warc_revisit" -> qWarcRevisitSql,
    "q_web_pipeline" -> qWebPipelineSql,
    "q_bootstrap_ci" -> qBootstrapCiSql,
    "q_snapshot_diff" -> qSnapshotDiffSql,
    "q_dsir" -> qDsirSql,
    "q_dsir_bigram" -> qDsirBigramSql,
    "q_mixture_plan" -> qMixturePlanSql,
    "q_curation_pipeline" -> qCurationPipelineSql,
    "q_prep_pipeline" -> qPrepPipelineSql,
    "q_sample_deterministic" -> qSampleDeterministicSql,
    "q_sample_stratified" -> qSampleStratifiedSql,
    "q_source_cap" -> qSourceCapSql,
    "q_domain_cap" -> qDomainCapSql,
    "q_url_filter" -> qUrlFilterSql,
    "q_robots_gate" -> qRobotsGateSql,
    "q_crawl_frontier" -> qCrawlFrontierSql,
    "q_url_canon" -> qUrlCanonSql,
    "q_shard_shuffle" -> qShardShuffleSql)
}
