package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for reproducible corpus
  * subsets. `df.sample(fraction, seed)` depends on the engine's RNG and
  * row order — two runs over different partitionings disagree, and no
  * other engine can reproduce the subset. Hash gating is the pipeline-
  * grade alternative: a row is kept iff a hex prefix of md5(key) is below
  * a threshold, which is (a) a pure row-local predicate (fused into the
  * scan, no shuffle), (b) identical on every engine with md5 (the DuckDB
  * oracle compares the same subset), and (c) stable under repartitioning,
  * retries, and incremental reruns — the properties a training-data split
  * actually needs. Sampling rate granularity is 1/16 per threshold hex
  * digit (16^-8 ≈ 2.3e-10 at 8 digits).
  */
object Sampling {

  /** The boolean gate itself — exposed so callers can fold membership into
    * a conditional aggregation (count_if/sum-when) and report totals and
    * sampled stats from ONE scan instead of scan + scan + join. */
  def gateBelow(key: Column, hexThreshold: String): Column = {
    require(hexThreshold.nonEmpty && hexThreshold.forall(c =>
      c.isDigit || ('a' to 'f').contains(c)), "threshold must be lowercase hex")
    graft.plans.HashExpressions.md5Prefix(key, hexThreshold.length) < hexThreshold
  }

  /** Keep rows whose md5(key) hex prefix sorts below `hexThreshold`
    * (lowercase hex, e.g. "4" ≈ 25%, "33333333" ≈ 20%). */
  def sampledBelow(df: DataFrame, key: Column, hexThreshold: String): DataFrame =
    df.filter(gateBelow(key, hexThreshold))

  /** Stratified variant: a different hash threshold per stratum value
    * (e.g. downsample over-represented languages, keep rare ones whole).
    * Still a pure row-local predicate — one CASE over the stratum column,
    * no shuffle, no per-stratum pass — so rebalancing a 100 TB corpus
    * costs exactly one scan. Strata absent from `thresholds` are dropped
    * (threshold "" keeps nothing; "g" keeps everything ≥ all hex). */
  def stratifiedBelow(df: DataFrame, key: Column, stratum: Column,
      thresholds: Map[String, String]): DataFrame =
    df.filter(stratifiedGate(key, stratum, thresholds))

  /** The stratified gate as a Column, for conditional-aggregation use. */
  def stratifiedGate(key: Column, stratum: Column,
      thresholds: Map[String, String]): Column = {
    thresholds.values.foreach(t => require(t.nonEmpty && t.forall(c =>
      c.isDigit || ('a' to 'g').contains(c)), "thresholds must be lowercase hex"))
    thresholds.foldLeft(lit(false)) { case (acc, (s, thr)) =>
      when(stratum === s,
        graft.plans.HashExpressions.md5Prefix(key, thr.length) < thr).otherwise(acc)
    }
  }

  /** Deterministic k-fold assignment: the first 8 md5 hex digits of the
    * key parsed as an integer, mod k — row-local, stable under
    * repartitioning and reruns, and engine-portable (the DuckDB oracle
    * reproduces it as `CAST('0x' || substr(md5(key),1,8) AS BIGINT) % k`).
    * Pass a string-typed key so both engines hash identical bytes. */
  def foldAssign(key: Column, k: Int): Column = {
    require(k > 0, "k must be positive")
    pmod(conv(graft.plans.HashExpressions.md5Prefix(key, 8), 16, 10).cast("long"),
      lit(k.toLong))
  }

  /** Disjoint train/holdout split on the same hash: rows below the
    * threshold are the holdout, the rest train — membership decided by
    * content, never by ordering. */
  def holdoutSplit(df: DataFrame, key: Column, hexThreshold: String): (DataFrame, DataFrame) = {
    val gate = graft.plans.HashExpressions.md5Prefix(key, hexThreshold.length) < hexThreshold
    (df.filter(!gate), df.filter(gate))
  }

  /** Quantized 20-bit hash-uniform for a row key: the first 5 md5 hex
    * digits as an integer in [0, 2^20) — the `u` of an acceptance test
    * `u < rate_q` against [[temperatureRates]]' quantized rates.
    * Engine-portable (DuckDB: `CAST('0x'||substr(md5(k),1,5) AS BIGINT)`). */
  def hashUniform20(key: Column): Column =
    conv(graft.plans.HashExpressions.md5Prefix(key, 5), 16, 10).cast("long")

  /** Temperature (α = 0.5) source-rebalancing rates — the multilingual
    * corpus-mix op (mBERT/XLM-style exponent sampling): source s with n_s
    * rows is kept at rate (n_min/n_s)^(1-α) = sqrt(n_min/n_s), so the
    * rarest source is kept whole (rate 1) and over-represented sources
    * are flattened toward it. Returns one row per source:
    * (sourceCol, n_rows, rate_q) with rate_q = floor(rate·2^20), to be
    * broadcast-joined back and tested against [[hashUniform20]].
    *
    * α is fixed at 0.5 deliberately: the rate is then one correctly-
    * rounded division, one correctly-rounded sqrt, and an EXACT
    * power-of-two scale — bit-identical in every IEEE-754 engine, so the
    * sampled subset is oracle-checkable. (A general α needs pow(), which
    * is only 1-ulp-accurate and could flip a floor at a coincidence
    * boundary.)
    *
    * Scale shape: one tiny counts aggregate (|sources| rows) + a 1-row
    * min cross-joined in; the gate is a broadcast join + row-local
    * predicate, so rebalancing a 100 TB corpus costs one scan. */
  def temperatureRates(df: DataFrame, sourceCol: String): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_rows"))
    val nMin = counts.agg(min(col("n_rows")).as("__n_min"))
    counts.crossJoin(broadcast(nMin))
      .select(col(sourceCol), col("n_rows"),
        floor(sqrt(col("__n_min").cast("double") / col("n_rows")) * (1L << 20))
          .cast("long").as("rate_q"))
  }

  /** The rebalanced subset: rows of `df` kept at their source's
    * temperature rate, decided by content hash — deterministic under
    * repartitioning, reruns, and engine changes. */
  def temperatureSample(df: DataFrame, key: Column, sourceCol: String): DataFrame =
    df.join(broadcast(temperatureRates(df, sourceCol)), sourceCol)
      .filter(hashUniform20(key) < col("rate_q"))

  /** Deterministic weight-proportional priority key (Duffield–Lund–Thorup
    * priority sampling): each row gets priority w/u for a hash-uniform u,
    * and the k HIGHEST priorities are the weighted-without-replacement
    * sample. We sort the reciprocal u/w ascending instead, computed as the
    * scaled INTEGER quotient (u·2^20) div w — every step (md5, hex parse,
    * shift, integer division) is exact and engine-portable, so unlike the
    * textbook u^(1/w) exponential key there is no libm call whose 1-ulp
    * variance could flip the selection at the k-boundary. u is 40 bits
    * (10 md5 hex digits) + 1 so the scaled numerator stays < 2^61 and u is
    * never 0; ties (possible after the div) break on the key column.
    *
    * Scale shape: row-local key + a top-k, which Spark plans as
    * TakeOrderedAndProject (per-partition heap + driver merge of k·p
    * rows) — no global sort, no shuffle of the corpus. */
  def priorityKey(key: Column, weight: Column): Column = {
    val u = conv(graft.plans.HashExpressions.md5Prefix(key, 10), 16, 10).cast("long") + lit(1L)
    call_function("div", u * lit(1L << 20), greatest(weight.cast("long"), lit(1L)))
  }

  /** DSIR-style data-selection weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", arXiv:2302.03169 —
    * public literature): estimate a hashed n-gram bag-of-words model of
    * the TARGET distribution (rows where `isTarget`) and of the RAW corpus
    * (the NON-target rows — since round 11 the raw model excludes target
    * rows, the paper's actual p_raw; through round 10 "raw" meant the full
    * corpus, which damped weights when the target fraction was large —
    * ADVICE r10), then score every document by its log importance ratio
    *   w(doc) = Σ_features log( p̂_target(bucket) / p̂_raw(bucket) )
    * with add-1 smoothing over `nBuckets` md5-hashed feature buckets.
    * `maxNgram = 2` uses the paper's unigram+bigram feature set (word
    * n-grams up to maxNgram, hashed into the same fixed bucket space);
    * the default 1 is unigrams only. The top-weighted raw documents are
    * the ones to keep when up-sampling toward the target domain.
    *
    * Returns one row per document: (id, n_tokens, w_q) where n_tokens
    * counts FEATURES (tokens for maxNgram=1) and w_q is the integer sum
    * of per-bucket quantized log-ratios (floor(lr·2^20) — the repo's
    * fixed-point convention, making the score order-free and
    * engine-exact; ln() itself is the one 1-ulp-wobble risk, same as
    * q_tfidf/q_bm25).
    *
    * Scale shape: one feature explode (the n-gram streams come from the
    * row-local [[graft.plans.AllShingles]] kernel — no window shuffle for
    * bigrams) → two-phase (id, bucket) count; bucket statistics aggregate
    * over a FIXED nBuckets keyspace (the point of feature hashing — the
    * model size is a constant independent of corpus vocabulary); the
    * per-bucket log-ratio table broadcasts back onto the per-doc counts;
    * final per-doc sum is two-phase. No driver-side data, no quadratic
    * stage; md5 bucketing is the engine-portable hash. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, nBuckets: Int = 4096,
                  maxNgram: Int = 1): DataFrame = {
    import graft.functions.TextFunctions.tokens
    require(maxNgram >= 1, "maxNgram must be >= 1")
    // n = 1 is the tokens kernel; higher n append the multiplicity-
    // preserving all_shingles stream — all row-local, one explode total
    val features =
      if (maxNgram == 1) tokens(col(textCol))
      else concat((tokens(col(textCol)) +: (2 to maxNgram).map(n =>
        graft.plans.ShingleExpressions.allShingles(col(textCol), n))): _*)
    val perDoc = graft.CacheScope.cached(
      docs.select(col(idCol).as("id"), isTarget.as("__t"),
          explode(features).as("token"))
        .withColumn("bucket", foldAssign(col("token"), nBuckets))
        .groupBy("id", "__t", "bucket").agg(count(lit(1)).as("c")))
    val bstats = perDoc.groupBy("bucket")
      .agg(sum(when(!col("__t"), col("c")).otherwise(0L)).as("rcnt"),
        sum(when(col("__t"), col("c")).otherwise(0L)).as("tcnt"))
    val totals = bstats.agg(sum(col("rcnt")).as("nr"), sum(col("tcnt")).as("nt"))
    val v = nBuckets.toDouble
    val lr = bstats.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(log(((col("tcnt") + 1.0) * (col("nr") + v)) /
          ((col("rcnt") + 1.0) * (col("nt") + v))) * 1048576d)
          .cast("long").as("lr_q"))
    perDoc.join(broadcast(lr), Seq("bucket"))
      .groupBy("id")
      .agg(sum(col("c")).as("n_tokens"), sum(col("c") * col("lr_q")).as("w_q"))
  }

  /** Host of a well-formed `scheme://host/path` URL via pure string ops
    * (codegen'd and engine-portable — DuckDB splits the same way).
    * Deliberately NOT `parse_url`: that expression is CodegenFallback and
    * its java.net edge semantics (userinfo, ports, IPv6 brackets) aren't
    * reproducible in other engines; a production crawler swaps in a full
    * parser at this seam. */
  def urlHost(url: Column): Column =
    substring_index(substring_index(url, "://", -1), "/", 1)

  /** Registrable-domain normalization (eTLD+1) under the full PSL rule
    * semantics — a host whose last labels match a public-suffix rule
    * keeps one label beyond the suffix (`w3.example.co.uk` →
    * `example.co.uk`), with all three PSL rule classes expressed since
    * r14: normal rules of any label count (`co.uk`, `github.io`,
    * `k12.ca.us`), wildcard rules (`*.ck`, `*.kawasaki.jp`,
    * `*.compute.amazonaws.com` — every child of the base is itself a
    * suffix), and exception rules (`!www.ck` — registrable despite the
    * wildcard). The matcher is generated from
    * [[PublicSuffixes.RuleChain]] (exceptions first, then longest rule —
    * the PSL precedence order), so this Column form, the
    * `registrable_domain` SQL function, and the DuckDB oracle CASE all
    * share one rule table.
    *
    * Plan shape: each `isInCollection` over a static set compiles to an
    * `InSet` hash probe inside whole-stage codegen — a few
    * substring_index calls and O(1) membership tests per row, no join,
    * no broadcast variable; rule-table size does not change the plan.
    * A bare public suffix (`host = "co.uk"`, or `foo.kawasaki.jp` under
    * the wildcard) maps to itself (substring_index past the label count
    * returns the whole string — the engine's convention for "host IS a
    * public suffix", where the PSL leaves eTLD+1 undefined). */
  def registrableDomain(host: Column): Column = {
    def lastK(k: Int) = substring_index(host, ".", -k)
    PublicSuffixes.RuleChain.foldRight(lastK(2)) {
      case ((m, set, keep), els) =>
        when(lastK(m).isInCollection(set), lastK(keep)).otherwise(els)
    }
  }

  /** The pre-r13 two-label rule — exact for single-label TLDs only; kept
    * as the explicit no-table fallback. */
  def registrableDomainTwoLabel(host: Column): Column =
    substring_index(host, ".", -2)

  /** Query parameters dropped by [[urlCanon]]: the click-tracking noise
    * (utm_* by prefix, plus the platform click ids) that makes one page
    * look like many URLs — the single biggest source of url-alias
    * duplicates in crawl data. Bounded, public knowledge (the parameters
    * are documented by their platforms). */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "igshid", "s_kwcid")

  /** URL canonicalization — the alias-collapse step crawl dedup runs on
    * (one page, many observed URLs): lowercase scheme and host, strip a
    * DEFAULT port (http:80 / https:443; any other explicit port is
    * meaningful and kept), strip the fragment, drop tracking parameters
    * ([[TrackingParams]] by name + the `utm_` name prefix), sort the
    * surviving parameters byte-lexicographically (both engines' binary
    * string order; duplicates kept, order made deterministic), strip ONE
    * trailing slash from a non-root path, and `"" → "/"`. Path and query
    * VALUES keep their case (only scheme/host are case-insensitive per
    * RFC 3986 §6.2.2.1). A string with no `://` passes through unchanged
    * (no structure to canonicalize — the gate upstream rejects it).
    *
    * This Column form is the pinned REFERENCE; the hot path is the
    * byte-scanner kernel ([[graft.plans.UrlExpressions.urlCanon]], the
    * pii_redact playbook), pinned ≡ this form on crafted + generated
    * corpora. Row-local, zero shuffle either way. */
  def urlCanonColumns(url: Column): Column = {
    val scheme = lower(substring_index(url, "://", 1))
    val rest = substring_index(url, "://", -1)
    // authority = up to the first '/', '?' or '#' of the rest
    val authority = substring_index(substring_index(
      substring_index(rest, "/", 1), "?", 1), "#", 1)
    val tail = rest.substr(length(authority) + 1, length(url)) // may be ""
    val tail2 = substring_index(tail, "#", 1)                  // fragment gone
    val rawPath = substring_index(tail2, "?", 1)
    val query = when(instr(tail2, "?") > 0,
      tail2.substr(length(rawPath) + 2, length(url))).otherwise(lit(""))
    val path = when(rawPath === "", lit("/"))
      .when(rawPath =!= "/" && rawPath.endsWith("/"),
        rawPath.substr(lit(1), length(rawPath) - 1))
      .otherwise(rawPath)
    // IPv6 bracket authorities split host/port at the closing ']' (RFC
    // 3986 §3.2.2); otherwise first-colon split (a second colon is part
    // of the malformed "port" and must round-trip). A bracket authority
    // with no ']:' — portless, or malformed trailing junk — is all-host.
    val bracket = authority.startsWith("[")
    val closeIdx = instr(authority, "]") // 1-based; 0 when absent
    val hasBracketPort = bracket && authority.substr(closeIdx + 1, lit(1)) === ":"
    val hostRaw = when(hasBracketPort, authority.substr(lit(1), closeIdx))
      .when(bracket, authority)
      .otherwise(substring_index(authority, ":", 1))
    val host = lower(hostRaw)
    val port = when(hasBracketPort, authority.substr(closeIdx + 2, length(url)))
      .when(bracket, lit(""))
      .otherwise(authority.substr(length(hostRaw) + 2, length(url)))
    val hasPort = when(bracket, hasBracketPort)
      .otherwise(instr(authority, ":") > 0)
    val keepPort = hasPort &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val kept = array_sort(filter(split(query, "&"), p => {
      val name = substring_index(p, "=", 1)
      p =!= "" && !name.startsWith("utm_") && !name.isInCollection(TrackingParams)
    }))
    val q = array_join(kept, "&")
    when(instr(url, "://") === 0, url).otherwise(concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(size(kept) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** Rule table for the crawl-curation URL gate ([[urlVerdict]]) — the
    * UT1-blocklist shape every web pipeline runs BEFORE content filters:
    * scheme/port sanity plus blocklists by registrable domain, host
    * substring, and path substring. Bounded by construction (a curated
    * blocklist, not data); at plan time every set is a compile-time
    * literal `InSet`/contains chain inside codegen — cheaper than a
    * broadcast join, which is the documented seam for a full
    * multi-million-entry UT1 snapshot (swap the InSet probe for a
    * broadcast LEFT SEMI on the domain column; the verdict CASE is
    * unchanged). */
  case class UrlRules(
      allowedSchemes: Seq[String] = Seq("http", "https"),
      allowedPorts: Seq[String] = Seq("80", "443"),
      blockedDomains: Seq[String] = Nil,
      blockedHostTokens: Seq[String] = Nil,
      blockedPathTokens: Seq[String] = Nil)

  /** Crawl URL gate: classifies a URL into the FIRST matching reject
    * class — `scheme` (not in the allowlist; a URL with no `://` fails
    * here too, since the whole string is then "the scheme"), `port`
    * (explicit port outside the allowlist), `domain` (PSL registrable
    * domain blocklisted — one blocklist entry kills every host under the
    * domain, the reason the gate is PSL-backed), `host` (substring
    * match), `path` (substring match) — or `kept`. First-match
    * precedence makes the funnel readout partition the corpus exactly.
    *
    * All pure string ops + InSet probes, row-local inside whole-stage
    * codegen, zero shuffle — at 100 TB the gate is a free rider on the
    * ingest scan. Empty token lists never match (lit(false) arm). */
  def urlVerdict(url: Column, rules: UrlRules): Column = {
    val scheme = substring_index(url, "://", 1)
    val hostport = substring_index(substring_index(url, "://", -1), "/", 1)
    // IPv6 bracket authorities: split host/port at ']' like urlCanon —
    // a colon inside the brackets is address syntax, not a port separator
    val bracket = hostport.startsWith("[")
    val closeIdx = instr(hostport, "]")
    val hasBracketPort = bracket && hostport.substr(closeIdx + 1, lit(1)) === ":"
    val host = when(hasBracketPort, hostport.substr(lit(1), closeIdx))
      .when(bracket, hostport)
      .otherwise(substring_index(hostport, ":", 1))
    val port = when(hasBracketPort, hostport.substr(closeIdx + 2, length(hostport)))
      .otherwise(substring_index(hostport, ":", -1))
    val hasPort = when(bracket, hasBracketPort).otherwise(hostport.contains(":"))
    def anyToken(c: Column, ts: Seq[String]): Column =
      if (ts.isEmpty) lit(false)
      else ts.map(t => c.contains(t)).reduce(_ || _)
    def inSet(c: Column, s: Seq[String]): Column =
      if (s.isEmpty) lit(false) else c.isInCollection(s)
    when(!inSet(scheme, rules.allowedSchemes), "scheme")
      .when(hasPort && !inSet(port, rules.allowedPorts), "port")
      .when(inSet(registrableDomain(host), rules.blockedDomains), "domain")
      .when(anyToken(host, rules.blockedHostTokens), "host")
      .when(anyToken(path(url, hostport), rules.blockedPathTokens), "path")
      .otherwise("kept")
  }

  /** Path (everything after the authority, leading `/` included) via the
    * same split discipline as [[urlHost]] — engine-portable. */
  private def path(url: Column, hostport: Column): Column =
    substring_index(url, "://", -1).substr(
      length(hostport) + 1, length(url))

  /** Per-domain quota cap — the web-curation staple (CCNet/C4-style
    * pipelines cap documents per registrable domain so boilerplate-heavy
    * sites can't dominate the corpus): keeps the `maxPerDomain` docs with
    * the LOWEST content-hash priority per domain (deterministic,
    * engine-portable, stable under repartitioning — the [[gateBelow]]
    * discipline, tie → smaller id). Returns ONLY the kept rows
    * (id, host, domain) — the rank ≤ k filter is what lets Spark plan
    * WindowGroupLimit: map-side per-domain k-heaps run BEFORE the domain
    * shuffle, so a mega-domain (the skew case this operator exists for)
    * contributes at most k rows per map task to the exchange instead of
    * its full document set. Callers wanting the keep/drop funnel aggregate
    * the full frame separately (two-phase, skew-safe) and join the two
    * per-domain tables — see `q_domain_cap`. */
  def domainCap(df: DataFrame, idCol: String, urlCol: String,
                textCol: String, maxPerDomain: Int): DataFrame = {
    require(maxPerDomain >= 1, s"maxPerDomain ($maxPerDomain) must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain")
      .orderBy(col("__pri").asc, col("id").asc)
    df.select(col(idCol).as("id"),
        urlHost(col(urlCol)).as("host"),
        registrableDomain(urlHost(col(urlCol))).as("domain"),
        graft.plans.HashExpressions.md5Prefix(col(textCol), 15).as("__pri"))
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= maxPerDomain)
      .select(col("id"), col("host"), col("domain"))
  }
}
