package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** Deduplication operators for a training-data pipeline ([ext] rows of
  * SURVEY §2.2): exact content dedup, shingle-Jaccard, MinHash+LSH and
  * SimHash near-dup — all expressed as relational plans whose candidate
  * generation is an equi-join on a hash key (never an O(n²) cross join),
  * which is the property that survives a 100 TB corpus.
  */
object Dedup {

  /** Exact dedup by content hash: first row per md5(text) wins
    * (deterministic winner via min id). */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.withColumn("__key", md5(col(textCol).cast("binary")))
    val winners = keyed.groupBy(col("__key"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__key")
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Chunk-level exact dedup (the C4 / "Deduplicating Training Data"
    * line-dedup shape on fixed word boundaries): each doc is cut into
    * consecutive `chunkWords`-word chunks, a chunk KEEPS only its globally
    * first occurrence (ordered by id, then position), and every doc is
    * rebuilt from its surviving chunks. Returns one row per input doc:
    * (id, n_chunks, n_kept, kept_text) — kept_text is null when every
    * chunk was seen earlier.
    *
    * Scale shape: chunking is row-local; the only wide ops are the
    * first-occurrence shuffle keyed on the chunk and the per-doc rebuild
    * aggregate. The rebuild's ordered concat is
    * `array_sort(collect_list(struct(pos, chunk)))` — deterministic under
    * any partitioning. At web scale, key the first-occurrence shuffle on
    * xxhash64(chunk) and verify collisions on the string; the raw string
    * keeps the DuckDB oracle byte-exact (`q_chunk_dedup`). */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkWords: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = df
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      // null text → 0 chunks (size() yields null or -1 depending on the
      // sizeOfNull setting; either would make sequence(0, -1) emit phantom
      // [0, -1] chunk indices — clamp to 0 and skip chunk generation)
      .withColumn("n_chunks",
        greatest(
          ceil(coalesce(size(col("__w")), lit(0)).cast("double") / chunkWords)
            .cast("long"),
          lit(0L)))
    val chunks = docs.filter(col("n_chunks") > 0).select(col(idCol),
      posexplode(transform(
        sequence(lit(0L), col("n_chunks") - 1),
        i => array_join(
          slice(col("__w"), (i * chunkWords + 1).cast("int"), lit(chunkWords)), " ")))
        .as(Seq("pos", "chunk")))
    val firstSeen = Window.partitionBy("chunk").orderBy(idCol, "pos")
    val kept = chunks
      .withColumn("__rn", row_number().over(firstSeen))
      .filter(col("__rn") === 1)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
            s => s.getField("chunk")), " ").as("kept_text"))
    docs.select(col(idCol), col("n_chunks"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("kept_text"))
  }

  /** Per-document duplicated-substring coverage (the "exact substring
    * dedup" diagnostic of Lee et al., Deduplicating Training Data Makes
    * Language Models Better): every overlapping `windowWords`-token window
    * is hashed, a window is DUPLICATED iff it occurs in ≥2 distinct
    * documents, and each doc reports how many of its windows are
    * duplicated. Suffix arrays are the single-node formulation; the
    * shuffle-native equivalent is a groupBy on the window hash — linear in
    * total window instances, never pairing docs.
    *
    * Returns one row per doc with ≥1 window:
    * (id, n_windows, n_dup_windows). Scale shape: window generation is
    * row-local (explode inside the scan stage); the wide ops are one
    * distinct-doc count per window hash and one equi-join of instances
    * against the duplicated-hash set (both keyed on the content hash, so
    * they co-partition); a window shared by f docs costs f join rows —
    * linear, unlike pair enumeration's f². At 100 TB, key on xxhash64 and
    * bound per-window fan-out with [[capShingleDF]]; md5 here keeps the
    * DuckDB oracle byte-exact. */
  /** md5 of every overlapping `windowWords`-token window of a token-array
    * column. COLUMNAR REFERENCE IMPLEMENTATION — production consumers
    * ([[windowDupStats]], `q_source_pagerank`) use the native
    * [[graft.plans.WindowHashes]] kernel, which WindowHashSpec pins equal
    * to this form; the HOF here is CodegenFallback (every window pays
    * `windowWords` interpreted `element_at`s + a concat buffer). Empty
    * array when the doc is shorter than one window.
    *
    * `toks` MUST be an already-materialized attribute (project the token
    * array in a prior select), never an inline expression: the window
    * hash references the array `windowWords`+1 times, so an inline
    * `tokens(text)` argument is recomputed per reference — measured 20×
    * slower than the attribute form at sf0.1. */
  def windowHashes(toks: Column, windowWords: Int): Column =
    when(size(toks) >= windowWords,
      transform(
        sequence(lit(0), size(toks) - windowWords, lit(1)),
        i => md5(concat_ws(" ",
          (0 until windowWords).map(d => element_at(toks, i + d + 1)): _*)
          .cast("binary"))))
      .otherwise(array())

  def windowDupStats(df: DataFrame, idCol: String, textCol: String,
                     windowWords: Int = 16): DataFrame = {
    // native kernel: tokenize + per-window streaming md5 in one byte pass;
    // docs shorter than one window return an empty array, which explode
    // drops — the size(__t) >= w filter of the columnar form. RAW 16-byte
    // digests: wh is identity-only here (grouped + joined, never output),
    // and the raw form is bijective to the hex one — identical counts at
    // half the shuffled key bytes
    val wins = df
      .select(col(idCol).as("id"),
        explode(graft.plans.WindowHashExpressions.windowHashesRaw(
          col(textCol), windowWords)).as("wh"))
    // instances feed both the per-hash distinct count and the flag join —
    // cache so tokenize+window+md5 runs once
    val cached = graft.CacheScope.cached(wins)
    val dup = cached.groupBy("wh")
      .agg(countDistinct(col("id")).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("wh"), lit(1L).as("__dup"))
    cached.join(dup, Seq("wh"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_dup_windows"))
  }

  /** Exact substring dedup REMOVAL (the production form of the Lee-et-al.
    * diagnostic [[windowDupStats]] measures): every overlapping
    * `windowWords`-token window keeps only its globally FIRST occurrence
    * (ordered by (id, position)); every other instance of a duplicated
    * window is a LOSING SPAN, and each document is rewritten with all
    * tokens covered by a losing span cut out. Suffix arrays are the
    * single-node formulation; the shuffle-native one is an arg-min per
    * window hash plus an instances-vs-winners equi-join.
    *
    * Returns one row per input doc: (id, n_tokens, n_kept, kept_text) —
    * kept_text is the surviving tokens re-joined by single spaces (the
    * tokenizer's normal form), null when no token survives (an exact
    * duplicate of an earlier doc loses every window) or when the doc had
    * no tokens at all. Overlapping losing spans union naturally (a token
    * is cut iff ≥1 losing window covers it), and a doc whose window lost
    * to an EARLIER position of the same doc self-deduplicates — both
    * exactly the Lee-et-al. cut semantics.
    *
    * Scale shape: window hashing is the row-local [[graft.plans.WindowHashes]]
    * kernel (raw 16-byte digests — identity-only keys); the global
    * first-occurrence is ONE map-side-combinable `min(struct(id, pos))`
    * aggregate on the window hash (never a sort), and losers come from the
    * instances⋈winners equi-join on the same hash key (co-partitioned, a
    * window shared f times costs f join rows). The 16× covered-index
    * fan-out runs over LOSERS ONLY (bounded by duplicated volume, not
    * corpus size), and only AFFECTED docs explode their tokens for the
    * rebuild — untouched docs pass through row-locally. The rebuild is the
    * [[chunkDedup]] `array_sort(collect_list(struct(pos, tok)))` aggregate
    * — deterministic under any partitioning. At 100 TB this is the same
    * key/shuffle family as [[windowDupStats]] plus one bounded rebuild. */
  def substringRewrite(df: DataFrame, idCol: String, textCol: String,
                       windowWords: Int = 16): DataFrame = {
    // docs feed the window pass, the affected-token explode, AND the
    // untouched passthrough — cache so the source scans once
    val docs = graft.CacheScope.cached(
      df.select(col(idCol).as("id"), col(textCol).as("__t")))
    // window instances with their start-token index; cached — consumed by
    // the winner aggregate and the loser join
    val wins = graft.CacheScope.cached(docs.select(col("id"),
      posexplode(graft.plans.WindowHashExpressions.windowHashesRaw(
        col("__t"), windowWords)).as(Seq("pos", "wh"))))
    // global first occurrence per window hash — only duplicated windows
    // (cnt > 1) can produce losers, so singletons drop before the join
    val winners = wins.groupBy(col("wh"))
      .agg(min(struct(col("id"), col("pos"))).as("w"), count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > 1)
      .select(col("wh"), col("w.id").as("__wid"), col("w.pos").as("__wpos"))
    val losers = wins.join(winners, Seq("wh"))
      .filter(col("id") =!= col("__wid") || col("pos") =!= col("__wpos"))
      .select(col("id"), col("pos"))
    // token indices covered by ≥1 losing span (distinct = interval union);
    // cached — feeds the affected-doc set and the rebuild anti-join
    val covered = graft.CacheScope.cached(losers
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(windowWords - 1))).as("ti"))
      .distinct())
    val affected = covered.select(col("id")).distinct()
    val toks = docs.join(affected, Seq("id"), "left_semi")
      .select(col("id"), posexplode(tokens(col("__t"))).as(Seq("ti", "tok")))
    val rebuilt = toks.join(covered, Seq("id", "ti"), "left_anti")
      .groupBy("id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("ti"), col("tok")))),
            s => s.getField("tok")), " ").as("kept_text"))
    val affectedOut = docs.join(affected, Seq("id"), "left_semi")
      .select(col("id"), size(tokens(col("__t"))).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("kept_text"))
    // token array as a materialized attribute — referenced 3× below, and
    // CollapseProject keeps multiply-referenced non-cheap expressions from
    // inlining back (the shingleSetsColumnar rule)
    val untouched = docs.join(affected, Seq("id"), "left_anti")
      .select(col("id"), tokens(col("__t")).as("__w"))
      .select(col("id"),
        size(col("__w")).cast("long").as("n_tokens"),
        size(col("__w")).cast("long").as("n_kept"),
        when(size(col("__w")) > 0, array_join(col("__w"), " "))
          .otherwise(lit(null).cast("string")).as("kept_text"))
    affectedOut.unionByName(untouched)
  }

  /** Default document-frequency cap: a shingle appearing in more documents
    * than this is dropped before any self-join. A shingle shared by f docs
    * emits f² join rows, so one boilerplate phrase ("all rights reserved")
    * in 1M docs would emit 10^12 pairs — while carrying no dedup signal.
    * Dropping hot shingles bounds worst-case fan-out at corpus scale
    * (standard MinHash practice). The default sits far above any document
    * frequency in the test corpora, so capped and uncapped results agree
    * there (oracle-checked); production corpora tune it down. */
  val DefaultMaxShingleDF: Int = 100000

  /** Distinct word n-shingles per row: (id, sh) — the fan-in point of the
    * whole shingle family (jaccard, minhash, cascade, leakage splits,
    * decontamination, bigram LM, pipelines). Since r9 this is the native
    * [[graft.plans.DistinctShingles]] kernel: one byte pass, distinct
    * shingles byte-copied straight from token spans. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
      explode(graft.plans.ShingleExpressions.distinctShingles(
        col(textCol), n)).as("sh"))

  /** COLUMNAR REFERENCE IMPLEMENTATION of [[shingleSets]] — the HOF form
    * the native [[graft.plans.DistinctShingles]] kernel is pinned against
    * (ShingleKernelSpec). Not on any production path: CodegenFallback
    * interprets every `element_at`, and the token array must stay a
    * materialized attribute (`__w`) — a lambda body referencing the raw
    * `tokens(text)` expression re-runs the full split/filter once per
    * `element_at` call, O(tokens²·n) per row (the r6 windowHashes
    * pathology; surfaced again as a 10-minute straggler on the r9 100×
    * sweep). CollapseProject keeps the multiply-referenced non-cheap
    * `__w` from being inlined back. */
  def shingleSetsColumnar(df: DataFrame, idCol: String, textCol: String,
                          n: Int = 3): DataFrame = {
    val w = col("__w")
    val arr = when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n, lit(1)), i =>
        concat_ws(" ", (0 until n).map(d => element_at(w, i + d + 1)): _*))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("__w"))
      .select(col("id"), explode(arr).as("sh"))
  }

  /** Drop shingles whose document frequency exceeds `maxDF` (≤0 disables).
    * One linear count per key; the hot-key set is tiny by definition, so
    * the removal is a broadcast anti-join — no extra shuffle of the big
    * side beyond the count. */
  def capShingleDF(sh: DataFrame, keyCol: String, maxDF: Int): DataFrame =
    if (maxDF <= 0) sh
    else {
      val hot = sh.groupBy(col(keyCol)).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > maxDF).select(col(keyCol))
      sh.join(broadcast(hot), Seq(keyCol), "left_anti")
    }

  /** Exact shingle-Jaccard pairs via the inverted index (xxhash64 join
    * keys; hashed set cached for the size aggregate + both join sides).
    * Jaccard is computed over the DF-capped shingle space — hot shingles
    * above `maxShingleDF` carry no signal and are excluded from both the
    * intersection and the set sizes.
    *
    * Physical shape of the self-join (round 11, VERDICT r10 item 4): the
    * capped index is cached ALREADY HASH-PARTITIONED on the shingle key
    * (partition count scaled to the scan, not the session's shuffle
    * default), so both self-join sides read co-located cache partitions
    * with no further exchange, and the join itself is hinted
    * SHUFFLE_HASH — no sort of the multi-billion-row index (the r9
    * triangle-census rule). Measured at 1000×: 360.9 → 332.5 s — i.e.
    * the join sort was NOT the dominant cost; the residual is the
    * groupBy(d1,d2) shuffle+spill of the candidate-pair stream, which is
    * Ω(Σ_h f_h²) by problem statement (same pairs arrive from different
    * shingle partitions, so map-side combine cannot collapse them). At
    * minJaccard = 0.2 the literature pruners don't pay: prefix filtering
    * indexes (1−t)|s|+1 ≈ 80% of each set, and the length filter needs
    * post-cap sizes joined onto the index first — an extra full
    * id-shuffle. Full write-up in BASELINE.md round 11c. Results are
    * value-identical (hints/partitioning change physics only). */
  /** Broder-1997 CONTAINMENT c(A,B) = |S(A) ∩ S(B)| / |S(A)| —
    * resemblance's asymmetric sibling (the same public paper that
    * defines resemblance defines containment): ≈1 when A is an EXCERPT
    * of B even when the symmetric Jaccard sits far below any near-dup
    * threshold, which is exactly the quote/syndication/boilerplate-page
    * duplication symmetric near-dedup misses. Same bucketed
    * inverted-index shape as [[jaccardPairs]] (equi-join on the shingle
    * hash, DF cap, never all-pairs); ONE undirected intersection
    * aggregate per co-shingled pair, then BOTH directed scores derive
    * row-locally (an explode, not a second pass over the pair join).
    * Scores are integer-exact Q20: containment_q = inter·2^20 div
    * |S(src)|. Returns (src, dst, containment_q, jaccard_q, inter)
    * filtered to containment_q ≥ `minContainmentQ`. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, minContainmentQ: Long = 943718L,
                       maxShingleDF: Int = DefaultMaxShingleDF): DataFrame = {
    val raw = graft.CacheScope.cached(
      shingleSets(df, idCol, textCol, n)
        .select(col("id"), xxhash64(col("sh")).as("h")))
    val sh = graft.CacheScope.cached(capShingleDF(raw, "h", maxShingleDF))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a").join(sh.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
    val jq = expr("(inter * 1048576) div (sz1 + sz2 - inter)")
    inter
      .select(explode(array(
        struct(col("d1").as("src"), col("d2").as("dst"),
          expr("(inter * 1048576) div sz1").as("containment_q"),
          jq.as("jaccard_q"), col("inter")),
        struct(col("d2").as("src"), col("d1").as("dst"),
          expr("(inter * 1048576) div sz2").as("containment_q"),
          jq.as("jaccard_q"), col("inter")))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.containment_q"),
        col("e.jaccard_q"), col("e.inter"))
      .filter(col("containment_q") >= minContainmentQ)
  }

  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, minJaccard: Double = 0.2,
                   maxShingleDF: Int = DefaultMaxShingleDF,
                   pairPartitions: Int = 0): DataFrame = {
    // cache the hashed set BEFORE deriving the DF cap: the hot-key count
    // and the anti-join then both read the cache instead of re-running the
    // tokenize/shingle pipeline (measured 2× otherwise)
    val raw = graft.CacheScope.cached(
      shingleSets(df, idCol, textCol, n)
        .select(col("id"), xxhash64(col("sh")).as("h")))
    // partition count tracks the input scan (×2 for the explode fan-out)
    // with the session setting as the floor: the per-partition hash-join
    // build must fit executor memory at ANY corpus size, and the session
    // default (sized for oracle SFs) is far too coarse at 1000×.
    // DELIBERATELY environment-sensitive (review r11): rdd.getNumPartitions
    // finalizes a plan for the cached frame and keys the count to input
    // splits (scan bytes / maxPartitionBytes), i.e. to pre-cap DATA VOLUME
    // — exactly the quantity the hash-join build memory scales with; the
    // cap's selectivity only ever makes partitions smaller than budgeted.
    // Values are unaffected either way — this knob is pure physics.
    // pairPartitions > 0 overrides (the VERDICT r11 item-6 experiment
    // knob: per-task partial-agg hash maps over the candidate-pair
    // stream shrink ∝ 1/p, trading spill for task count — measured
    // numbers in BASELINE round 12)
    val p = if (pairPartitions > 0) pairPartitions
    else math.max(
      df.sparkSession.sessionState.conf.numShufflePartitions,
      raw.rdd.getNumPartitions * 2)
    val sh = graft.CacheScope.cached(
      capShingleDF(raw, "h", maxShingleDF).repartition(p, col("h")))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    sh.as("a").join(sh.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz1") + col("sz2") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select("d1", "d2", "inter", "jaccard")
  }

  /** MinHash+LSH candidate pairs. Hash family: 4-hex-digit windows of
    * md5("a:"+sh) / md5("b:"+sh) — `bands`×`rowsPerBand` ≤ 16 signature
    * rows from two md5 evaluations per shingle, min-aggregated in ONE
    * groupBy (no per-hash explode), compared as fixed-width hex strings.
    * Engine-portable (md5-only), hence oracle-checkable. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): DataFrame =
    minhashFromShingles(shingleSets(df, idCol, textCol, n), bands, rowsPerBand)

  /** MinHash banding over a precomputed (id, sh) set — callers that also
    * need the shingles for verification pass a cached set so the tokenize/
    * shingle/md5 pipeline runs once, not per consumer. */
  /** MinHash signature table (id, h0..h{total-1}) from a (id, sh) set —
    * the 4-hex-window md5 family the banding uses, exposed for estimator
    * calibration (`matching components / total ≈ Jaccard`). */
  def minhashSignatures(shingles: DataFrame, total: Int = 16): DataFrame = {
    require(total <= 16, "hash family provides 16 independent 16-bit hashes")
    val hx = shingles
      .select(col("id"),
        graft.plans.HashExpressions.md5Hex(concat(lit("a:"), col("sh"))).as("m1"),
        graft.plans.HashExpressions.md5Hex(concat(lit("b:"), col("sh"))).as("m2"))
    val mins = (0 until total).map { j =>
      val src = if (j < 8) col("m1") else col("m2")
      min(substring(src, (j % 8) * 4 + 1, 4)).as(s"h$j")
    }
    hx.groupBy("id").agg(mins.head, mins.tail: _*)
  }

  def minhashFromShingles(shingles: DataFrame,
                          bands: Int = 4, rowsPerBand: Int = 4): DataFrame =
    minhashFromSignatures(minhashSignatures(shingles, bands * rowsPerBand),
      bands, rowsPerBand)

  /** Default LSH band-bucket size cap, mirroring [[DefaultMaxShingleDF]]:
    * a band bucket holding B docs emits B² candidate rows before
    * verification, so one degenerate bucket (templated boilerplate that
    * survives exact dedup) can dominate the whole corpus pass — while a
    * bucket that large carries no discriminative signal anyway (its
    * members are candidates of everything in it). Buckets above the cap
    * are dropped before the self-join; the default sits far above any
    * test-corpus bucket density (oracle-checked agreement), production
    * corpora tune it down. */
  val DefaultMaxBandBucket: Int = 100000

  /** Banding + bucket join over a PRECOMPUTED signature table — callers
    * that also consume the signatures directly (estimator calibration)
    * pass one cached `sig` so the 16-way min aggregation runs once, not
    * once per consumer. Buckets larger than `maxBucketSize` (≤0 disables)
    * are removed by count + broadcast anti-join — the hot-bucket set is
    * tiny by definition, so the removal costs one linear count and no
    * extra shuffle of the band table. */
  def minhashFromSignatures(sig: DataFrame,
                            bands: Int = 4, rowsPerBand: Int = 4,
                            maxBucketSize: Int = DefaultMaxBandBucket): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).cast("long").as("band"),
        concat((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*).as("band_key"))
    }
    val raw = graft.CacheScope.cached(sig
      .select(col("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key")))
    val bandKeys =
      if (maxBucketSize <= 0) raw
      else {
        val hot = raw.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize)
          .select(col("band"), col("band_key"))
        raw.join(broadcast(hot), Seq("band", "band_key"), "left_anti")
      }
    bandKeys.as("a").join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("d1"), col("b.id").as("d2"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** MinHash-LSH candidate pairs whose exact shingle Jaccard clears
    * `minJaccard` — the verified near-dup pair graph, as (d1, d2) with
    * d1 < d2. Candidates come from banding (cheap), similarity is computed
    * only on candidates, and Jaccard is measured over the DF-capped shingle
    * space (hot shingles carry no signal). */
  def verifiedNearDupPairs(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 3, minJaccard: Double = 0.5,
                           maxShingleDF: Int = DefaultMaxShingleDF): DataFrame = {
    // ONE shingle pass, cached, then DF-capped from the cache (the cap's
    // count branch and anti-join both read the cached set); the capped set
    // is cached too since it feeds minhash banding, both verification join
    // sides, and the set sizes (otherwise the tokenize/shingle pipeline
    // re-executes per consumer — measured 5× recompute)
    val raw = graft.CacheScope.cached(shingleSets(df, idCol, textCol, n))
    val shingles = graft.CacheScope.cached(capShingleDF(raw, "sh", maxShingleDF))
    val candidates = minhashFromShingles(shingles)
      .select(col("d1"), col("d2"))
    val sh = shingles.select(col("id"), xxhash64(col("sh")).as("h"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    candidates
      .join(sh.select(col("id").as("d1"), col("h")), "d1")
      .join(sh.select(col("id").as("d2"), col("h")), Seq("d2", "h"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("id").as("d2"), col("sz").as("sz2")), "d2")
      .filter(col("inter").cast("double") /
        (col("sz1") + col("sz2") - col("inter")) >= minJaccard)
      .select("d1", "d2")
  }

  /** id → content representative (min id sharing md5(text)), cached:
    * the exact-collapse map shared by [[dedupeNear]] and
    * [[collapsedClusterLabels]]. Columns (id, __rep). */
  private def contentRepMap(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = graft.CacheScope.cached(
      df.select(col(idCol).as("id"),
        graft.plans.HashExpressions.md5Hex(col(textCol)).as("__key")))
    graft.CacheScope.cached(
      keyed.join(keyed.groupBy(col("__key")).agg(min(col("id")).as("__rep")), "__key")
        .select(col("id"), col("__rep")))
  }

  /** Cross-source PRIORITY dedup — the multi-source corpus rule (curated
    * beats books beats web): every doc carries an integer priority (lower
    * = more trusted), and the drop key is (priority, id) instead of id —
    * a doc is dropped iff it is an exact or verified near-duplicate of a
    * doc with a smaller (priority, id) key. Same pairwise (non-closure)
    * semantics as [[dedupeNear]]; same exact-collapse-first composition,
    * with the collapse winner per md5(text) now the min (priority, id)
    * member. The dedupeNear equivalence argument carries over verbatim
    * with keys substituted: a non-representative always loses to its
    * better exact twin, and a representative loses a raw pair to some
    * better y iff it loses the rep pair to rep(y), whose key is ≤ y's.
    *
    * Returns one row per input doc: (id, kept ∈ {0,1}).
    *
    * Scale shape: identical to [[dedupeNear]] — one content-hash collapse,
    * banding + verification over representatives only, plus two
    * broadcast-friendly key joins of the O(pairs) loser table; the
    * priority column rides the existing shuffles for free. */
  def priorityDedup(df: DataFrame, idCol: String, textCol: String,
                    prioCol: String, n: Int = 3, minJaccard: Double = 0.5,
                    maxShingleDF: Int = DefaultMaxShingleDF): DataFrame = {
    // (id, text, prio) — feeds the collapse, the rep filter and the
    // final readout join; cache so the source scans once
    val base = graft.CacheScope.cached(
      df.select(col(idCol).as("id"), col(textCol).as("__t"),
        col(prioCol).cast("long").as("__p")))
    val reps = base
      .groupBy(graft.plans.HashExpressions.md5Hex(col("__t")).as("__key"))
      .agg(min(struct(col("__p"), col("id"))).as("w"))
      .select(col("w.id").as("id"))
    val repDocs = base.join(reps, Seq("id"), "left_semi")
    val keys = base.select(col("id"), struct(col("__p"), col("id")).as("__k"))
    val losers = verifiedNearDupPairs(repDocs, "id", "__t", n, minJaccard, maxShingleDF)
      .join(keys.select(col("id").as("d1"), col("__k").as("__k1")), "d1")
      .join(keys.select(col("id").as("d2"), col("__k").as("__k2")), "d2")
      .select(when(col("__k1") < col("__k2"), col("d2")).otherwise(col("d1")).as("id"))
      .distinct()
    base.select(col("id"))
      .join(reps.withColumn("__rep", lit(1L)), Seq("id"), "left")
      .join(losers.withColumn("__lose", lit(1L)), Seq("id"), "left")
      .select(col("id"),
        when(col("__rep").isNotNull && col("__lose").isNull, 1L)
          .otherwise(0L).as("kept"))
  }

  /** End-to-end near-dedup: drop the higher-id side of every verified
    * near-dup pair. Returns the surviving rows of `df`.
    *
    * Exact duplicates are collapsed FIRST (one min-id representative per
    * md5(text)) and pair verification runs over representatives only —
    * a k-member exact-dup clique costs k map rows instead of k²
    * candidate pairs. The output is provably identical to the
    * uncollapsed composition: a non-representative always loses (it
    * pairs with its smaller exact twin — LSH candidates with Jaccard
    * 1.0 by construction), and a representative loses a raw pair to
    * some y < x iff it loses the rep pair to rep(y) ≤ y (identical text
    * ⇒ identical shingles, bands, Jaccard). The unchanged DuckDB oracle
    * of `q_dedup_cascade` hash-checks that equivalence.
    *
    * Note the pairwise drop is NOT transitive closure: in a chain a–b–c
    * where a–c was never a candidate, c is dropped because of b even though
    * b itself is dropped. For cluster-accurate dedup (keep exactly one doc
    * per connected component) use [[nearDupClusters]]. */
  def dedupeNear(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, minJaccard: Double = 0.5,
                 maxShingleDF: Int = DefaultMaxShingleDF): DataFrame = {
    val repMap = contentRepMap(df, idCol, textCol)
    val repDocs = df.join(
      repMap.filter(col("id") === col("__rep")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
    val losers = verifiedNearDupPairs(repDocs, idCol, textCol, n, minJaccard, maxShingleDF)
      .select(col("d2").as(idCol)).distinct()
    repDocs.join(losers, Seq(idCol), "left_anti")
  }

  /** Connected components of the undirected pair graph (d1, d2) → one row
    * per vertex: (id, cluster) where cluster = the smallest id reachable
    * from the vertex (the canonical representative of its component).
    *
    * Algorithm: alternating large-star / small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * literature). Each round rewires every node's larger neighbors
    * (large-star) then its smaller neighbors (small-star) to the minimum
    * of its closed neighborhood; connectivity is invariant and component
    * heights roughly HALVE per round, so convergence is O(log diameter)
    * rounds instead of the O(diameter) of plain hash-min propagation —
    * the difference between ~10 and ~1000 joins on a 1000-link chain
    * (chain-shaped near-dup graphs arise from transitive edit chains,
    * not just cliques). Each half-round is one map-side-combinable
    * `groupBy(min)` plus one equi-join — the same per-round shuffle cost
    * as propagation, the 100 TB-safe shape. The only driver-side values
    * per round are two scalars (edge count + the exact decimal sum of
    * per-edge xxhash64 — collision-resistant over the edge multiset) for
    * the fixpoint check; `localCheckpoint` truncates lineage each round. Labels are the component minima either way, so results
    * are bit-identical to [[ccPropagateWithRounds]] (pinned in
    * OperatorsSpec). */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30): DataFrame =
    ccStarWithRounds(pairs, maxIter)._1

  /** Large-star/small-star loop, returning (labels, rounds-to-fixpoint).
    * Edges are kept as (big, sml) with big > sml after every half-round. */
  private[graft] def ccStarWithRounds(pairs: DataFrame,
                                      maxIter: Int = 30): (DataFrame, Int) = {
    val p = graft.CacheScope.cached(pairs.select(col("d1"), col("d2")))
    var e = p
      .select(greatest(col("d1"), col("d2")).as("big"),
        least(col("d1"), col("d2")).as("sml"))
      .filter(col("big") =!= col("sml")).distinct()
      .localCheckpoint()

    // large-star: per node u over its FULL neighborhood, m = min(N(u)∪{u});
    // emit (v, m) for the strictly larger neighbors v > u. (v > u ≥ m.)
    // The v > u rows of adj are exactly the (big, sml) rows of ed, so the
    // emit join probes ed keyed by sml (|E| rows) instead of re-deriving
    // them from the doubled adj (2|E|) — one less union through the
    // exchange. No output distinct: the emit is one row per edge (v > u
    // picks a unique orientation), duplicates are only (v, m) collisions,
    // and the consumer smallStar is duplicate-insensitive (min aggregate,
    // join fan-out cleaned by its own terminal distinct) — dropping the
    // intermediate exchange saves one of the round's shuffles (r15 opt;
    // labels pinned identical to ccPropagateWithRounds in OperatorsSpec).
    def largeStar(ed: DataFrame): DataFrame = {
      val adj = ed.select(col("big").as("u"), col("sml").as("v"))
        .union(ed.select(col("sml").as("u"), col("big").as("v")))
      val m = adj.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
      ed.join(m, ed("sml") === m("u"))
        .select(col("big"), col("m").as("sml"))
    }
    // small-star: per node u over its SMALLER neighbors (each (big, sml)
    // edge belongs to exactly its big endpoint's group), m = min(N<(u)∪{u});
    // emit (v, m) for every smaller neighbor plus (u, m), minus self-loops.
    def smallStar(ed: DataFrame): DataFrame = {
      val m = ed.groupBy(col("big").as("u")).agg(min(col("sml")).as("m"))
      val grouped = ed.join(m, ed("big") === m("u"))
      grouped.select(col("sml").as("big"), col("m").as("sml"))
        .union(grouped.select(col("u").as("big"), col("m").as("sml")))
        .filter(col("big") =!= col("sml")).distinct()
    }

    // fixpoint check: (count, exact decimal sum of per-edge xxhash64) —
    // cheap scalars, and the hash sum is collision-resistant over the
    // multiset of edges: two DIFFERENT successive edge sets sharing both
    // scalars would need a 64-bit-hash multiset-sum collision, unlike the
    // previous plain endpoint sums (which two distinct sets can share)
    def sig(ed: DataFrame): (Long, java.math.BigDecimal) = {
      val r = ed.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("big"), col("sml")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).first()
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = sig(e)
    var rounds = 0
    var converged = prev._1 == 0L
    // Scale-adaptive loop partitioning (opt guide §2.2): each star
    // half-round is 3 shuffles and the loop runs O(log diameter) rounds,
    // so the session's static shuffle-partition constant multiplies into
    // ~6·rounds reduce stages; with AQE's parallelism-first floor those
    // stay at 32 tasks even for a few hundred edges (measured: 3.6 s for
    // a 241-edge graph at sf0.1 — pure task overhead). The edge count is
    // already in hand from the fixpoint signature, so size the loop's
    // shuffles from it: ~2 M edge rows (~64 MB at 24 B/row) per
    // partition, floor 2 (keep the distributed path exercised), cap 16384
    // — at web-scale edge sets the derivation lands in the thousands,
    // exactly what a cluster run wants. Restored after the loop; label
    // content is partition-count independent (min aggregates + joins).
    val sess = pairs.sparkSession
    val prevParts = sess.conf.get("spark.sql.shuffle.partitions")
    def loopParts(edges: Long): Int =
      math.max(2L, math.min(16384L, edges / 2000000L + 1L)).toInt
    try {
      while (!converged && rounds < maxIter) {
        sess.conf.set("spark.sql.shuffle.partitions", loopParts(prev._1).toString)
        e = smallStar(largeStar(e)).localCheckpoint()
        val s = sig(e)
        converged = s == prev
        prev = s
        rounds += 1
      }
    } finally sess.conf.set("spark.sql.shuffle.partitions", prevParts)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter star rounds — " +
          "labels from a non-star-forest edge set would be silently wrong; " +
          "raise maxIter (rounds are O(log component diameter))")
    // converged state is a star forest: every edge is (member, componentMin)
    val starLabels = e.select(col("big").as("id"), col("sml").as("cluster"))
      .union(e.select(col("sml").as("id"), col("sml").as("cluster")))
    // vertices appearing ONLY in self-pairs (d1 == d2) have no star edge but
    // are still vertices of the pair graph: label them as their own
    // singleton component, preserving the propagation-era output contract
    val selfOnly = p.filter(col("d1") === col("d2"))
      .select(col("d1").as("id")).distinct()
      .join(starLabels.select(col("id")).distinct(), Seq("id"), "left_anti")
    val labels = starLabels.union(selfOnly.select(col("id"), col("id").as("cluster")))
      .distinct()
    (labels, rounds)
  }

  /** Reference hash-min label propagation (the pre-r9 implementation):
    * O(component diameter) rounds of edges⋈labels + groupBy(min). Kept for
    * the star/propagation equivalence pin and as the simpler-to-audit
    * formulation; [[connectedComponents]] runs the O(log) star loop. */
  private[graft] def ccPropagateWithRounds(pairs: DataFrame,
                                           maxIter: Int = 20): (DataFrame, Int) = {
    // cache the pair set first: the symmetrizing union reads it twice, and
    // callers hand us whole verification cascades as `pairs`
    val p = graft.CacheScope.cached(pairs.select(col("d1"), col("d2")))
    val edges = graft.CacheScope.cached(
      p.select(col("d1").as("src"), col("d2").as("dst"))
        .union(p.select(col("d2").as("src"), col("d1").as("dst")))
        .distinct())
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cluster"))
      .localCheckpoint()
    // decimal sum: exact, overflow-free under ANSI, null only when empty
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("cluster").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).first().getDecimal(0)
    var prev = labelSum(labels)
    var iter = 0
    var converged = labels.isEmpty
    while (!converged && iter < maxIter) {
      val next = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("cluster"))
        .union(labels)
        .groupBy("id").agg(min("cluster").as("cluster"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prev) == 0
      prev = s
      labels = next
      iter += 1
    }
    (labels, iter)
  }

  /** Cluster-accurate near-dedup labeling: every document that appears in a
    * verified near-dup pair, labeled with its connected component's
    * canonical (minimum) doc id. Docs in no pair are their own singleton
    * cluster and are simply absent from the output. */
  def nearDupClusters(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, minJaccard: Double = 0.5,
                      maxShingleDF: Int = DefaultMaxShingleDF): DataFrame =
    connectedComponents(
      verifiedNearDupPairs(df, idCol, textCol, n, minJaccard, maxShingleDF))

  /** Near-dup cluster label for EVERY document, with exact duplicates
    * collapsed before pair enumeration — the composition that makes
    * clustering linear in duplicate count on a duplicate-heavy corpus.
    * Returns (id, cluster); cluster = the doc's own id for docs with no
    * exact or near duplicate.
    *
    * Why: [[verifiedNearDupPairs]] over the raw corpus materializes every
    * intra-clique pair, so a k-member exact-duplicate clique costs O(k²)
    * candidate rows (measured ~45× wall for 10× duplicated data). Exact
    * duplicates are by construction LSH candidates with Jaccard 1.0, so
    * collapsing each md5(text) group to its min-id representative FIRST,
    * clustering only representatives, and re-expanding membership through
    * the content-hash map yields provably identical labels:
    *  - the min id of a full-graph component is always a representative
    *    (its exact twins are in the same component, so its content group's
    *    min is itself), and
    *  - any full-graph edge (x, y) projects to a representative edge
    *    (rep(x), rep(y)) — identical text means identical shingles, hence
    *    identical signatures, bands, and Jaccard — so rep-graph
    *    connectivity equals projected full-graph connectivity.
    * The driver's unchanged (uncollapsed) DuckDB oracles for
    * q_dedup_clusters / q_leakage_split hash-check this equivalence.
    *
    * Scale shape: the collapse is one linear groupBy on md5(text) plus a
    * semi-join; pair enumeration then runs on the deduplicated corpus
    * (web-scale corpora: typically 2–5× smaller, with cliques gone); the
    * re-expansion is one equi-join of the O(corpus) id→rep map against the
    * (small) rep label table, which AQE broadcasts when it fits. */
  def collapsedClusterLabels(df: DataFrame, idCol: String, textCol: String,
                             n: Int = 3, minJaccard: Double = 0.5,
                             maxShingleDF: Int = DefaultMaxShingleDF): DataFrame = {
    // cached (id, __rep) map — feeds the representative filter and the
    // final re-expansion join
    val repMap = contentRepMap(df, idCol, textCol)
    val repDocs = df.join(
      repMap.filter(col("id") === col("__rep")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
    val repLabels = connectedComponents(
        verifiedNearDupPairs(repDocs, idCol, textCol, n, minJaccard, maxShingleDF))
      .withColumnRenamed("id", "__rep")
    repMap.join(repLabels, Seq("__rep"), "left")
      .select(col("id"), coalesce(col("cluster"), col("__rep")).as("cluster"))
  }

  /** Banding bucket join where the candidate RECEIVER (probe) side is
    * restricted to `probeIds` — the incremental-dedup shape: when a new
    * batch arrives against a standing corpus, candidate generation must
    * never enumerate corpus×corpus pairs (that work was already done when
    * the corpus was built). Returns (other, probe, n_bands) with
    * probe ∈ probeIds and other ≠ probe; a batch–batch pair appears in
    * both orientations so the caller's drop rule can be asymmetric.
    * Same hot-bucket cap as [[minhashFromSignatures]]. */
  def minhashProbeCandidates(sig: DataFrame, probeIds: DataFrame,
                             bands: Int = 4, rowsPerBand: Int = 4,
                             maxBucketSize: Int = DefaultMaxBandBucket): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).cast("long").as("band"),
        concat((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*).as("band_key"))
    }
    val raw = graft.CacheScope.cached(sig
      .select(col("id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key")))
    val bandKeys =
      if (maxBucketSize <= 0) raw
      else {
        val hot = raw.groupBy(col("band"), col("band_key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize)
          .select(col("band"), col("band_key"))
        raw.join(broadcast(hot), Seq("band", "band_key"), "left_anti")
      }
    val probeBands = bandKeys.join(probeIds, Seq("id"))
    bandKeys.as("a").join(probeBands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("other"), col("b.id").as("probe"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Incremental corpus admission — the production shape for "a new crawl
    * batch arrives against a standing deduplicated corpus": annotate every
    * batch row with its admission status without ever re-pairing the
    * corpus against itself.
    *
    *   - `exact_dup`: not the min-id winner of its md5(text) group within
    *     the batch, or its content hash already exists in the corpus;
    *   - `near_dup`: survived exact, but its verified shingle Jaccard vs
    *     some corpus doc (any) or some smaller-id batch survivor clears
    *     `minJaccard`;
    *   - `admitted`: everything else — the rows that enter the corpus.
    *
    * Scale shape: the exact stage is one hash agg on the BATCH plus an
    * anti-join against the corpus content-hash set (at 100 TB that set is
    * a maintained table, not recomputed); the near stage shingles
    * corpus+survivors once, but the banding join probes only batch-side
    * buckets ([[minhashProbeCandidates]]) — candidate fan-out is
    * |batch-side bucket rows| × bucket density, never corpus². At real
    * scale the corpus signature table is likewise maintained incrementally
    * and only batch signatures are computed fresh. */
  def incrementalStatus(corpus: DataFrame, batch: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 3, minJaccard: Double = 0.5,
                        maxShingleDF: Int = DefaultMaxShingleDF): DataFrame = {
    val keyed = batch.withColumn("__key", graft.plans.HashExpressions.md5Hex(col(textCol)))
    val winners = keyed.groupBy(col("__key")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val corpusKeys = corpus
      .select(graft.plans.HashExpressions.md5Hex(col(textCol)).as("__key")).distinct()
    // the exact-stage survivor set feeds four consumers (shingle union,
    // probe ids, the corpus/batch side split of the drop rule, and the
    // final status join) — cache it so the batch scan + winner agg +
    // corpus anti-join run once, not per consumer
    val bx = graft.CacheScope.cached(keyed
      .join(winners, Seq(idCol), "left_semi")
      .join(corpusKeys, Seq("__key"), "left_anti")
      .drop("__key"))
    val bxIds = bx.select(col(idCol).as("id"))
    val uni = corpus.select(col(idCol).as("id"), col(textCol).as("__t"))
      .unionByName(bx.select(col(idCol).as("id"), col(textCol).as("__t")))
    val raw = graft.CacheScope.cached(shingleSets(uni, "id", "__t", n))
    val sh = graft.CacheScope.cached(capShingleDF(raw, "sh", maxShingleDF))
    val cand = minhashProbeCandidates(minhashSignatures(sh), bxIds)
      .select("other", "probe")
    val shh = sh.select(col("id"), xxhash64(col("sh")).as("h"))
    val sizes = shh.groupBy("id").agg(count(lit(1)).as("sz"))
    val verified = cand
      .join(shh.select(col("id").as("other"), col("h")), "other")
      .join(shh.select(col("id").as("probe"), col("h")), Seq("probe", "h"))
      .groupBy("other", "probe").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("other"), col("sz").as("sz1")), "other")
      .join(sizes.select(col("id").as("probe"), col("sz").as("sz2")), "probe")
      .filter(col("inter").cast("double") /
        (col("sz1") + col("sz2") - col("inter")) >= minJaccard)
      .select("other", "probe")
    val rejects = verified
      .join(bxIds.select(col("id").as("other"), lit(true).as("__ob")), Seq("other"), "left")
      .filter(col("__ob").isNull || col("other") < col("probe"))
      .select(col("probe")).distinct()
    batch
      .join(bxIds.select(col("id").as(idCol), lit(true).as("__x")), Seq(idCol), "left")
      .join(rejects.select(col("probe").as(idCol), lit(true).as("__r")), Seq(idCol), "left")
      .withColumn("status",
        when(col("__x").isNull, lit("exact_dup"))
          .when(col("__r").isNotNull, lit("near_dup"))
          .otherwise(lit("admitted")))
      .drop("__x", "__r")
  }

  /** Bit-mask literal arrays 1L<<0 … 1L<<(bits-1). */
  private def masks(bits: Int): Column = array((0 until bits).map(b => lit(1L << b)): _*)
  private val Masks64: Column = masks(64)
  private val Masks60: Column = masks(60)

  /** SimHash of the token stream as a pure Column expression (no UDF —
    * stays inside whole-stage codegen): per-token hash, ±1 votes per bit,
    * sign of the vote vector packed back into a Long. */
  private def simhashOf(textCol: Column, bits: Int, tokenHash: Column => Column): Column = {
    val mk = masks(bits)
    val hs = transform(tokens(textCol), tokenHash)
    val votes = aggregate(hs, array_repeat(lit(0L), bits), (acc, h) =>
      zip_with(acc, mk, (a, m) =>
        a + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(zip_with(votes, mk, (v, m) => when(v > 0L, m).otherwise(0L)),
      lit(0L), (a, x) => a.bitwiseOR(x))
  }

  /** 64-bit SimHash over xxhash64 token hashes — the cheap scale-path
    * variant (one 64-bit hash op per token). Not oracle-portable (DuckDB
    * has no xxhash64); pinned by OperatorsSpec. */
  def simhash64(textCol: Column): Column = simhashOf(textCol, 64, t => xxhash64(t))

  /** 60-bit SimHash over an md5-derived token hash — engine-portable, hence
    * oracle-checkable: token hash = first 15 hex digits of md5(token) read
    * as an integer (60 uniform bits; DuckDB reproduces it as
    * `CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT)`). Same vote/pack
    * construction as [[simhash64]]; ~3× the per-token hash cost, same
    * linear row-local shape. */
  def simhash60(textCol: Column): Column =
    simhashOf(textCol, 60,
      t => conv(graft.plans.HashExpressions.md5Prefix(t, 15), 16, 10).cast("long"))

  /** SimHash near-dup pairs: candidates share ≥1 of 4 exact bit blocks
    * (any pair within Hamming distance 3 must — pigeonhole), then exact
    * Hamming ≤ maxHamming via bit_count(xor). Bucket equi-join shape —
    * never all-pairs, the same candidate-generation scale story as MinHash
    * banding, including the same hot-bucket cap: a (blk, key) bucket with
    * more than `maxBucketSize` members (templated boilerplate surviving
    * exact dedup collapses to identical simhashes → degenerate buckets)
    * would emit B² pre-filter pairs, so such buckets are removed via one
    * linear count + broadcast anti-join, exactly the
    * [[minhashFromSignatures]] pattern. Default is far above test corpus
    * densities, so oracles are bit-identical.
    *
    * `portable = true` (default) uses the md5-family [[simhash60]] with
    * 4×15-bit blocks (DuckDB-oracle-checkable, `q_simhash_pairs`);
    * `portable = false` uses the cheaper xxhash64 [[simhash64]] with
    * 4×16-bit blocks for engine-internal corpus passes. Docs with no
    * tokens are excluded (an empty doc's simhash is 0, which would bucket
    * all empty docs together; the oracle's unnest drops them naturally). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, portable: Boolean = true,
                   maxBucketSize: Int = DefaultMaxBandBucket): DataFrame = {
    val (shCol, blockBits) =
      if (portable) (simhash60(col(textCol)), 15) else (simhash64(col(textCol)), 16)
    val sh = df.filter(size(tokens(col(textCol))) > 0)
      .select(col(idCol).as("id"), shCol.as("sh"))
    hammingPairsFromHashes(sh, blockBits, maxHamming, maxBucketSize)
  }

  /** The Hamming-banded pair core of [[simhashPairs]] over a PRECOMPUTED
    * non-negative integer hash column `(id, sh)` — factored out (round 12)
    * so perceptual image hashes
    * ([[graft.multimodal.Multimodal.perceptualHashes]]) ride the exact
    * same candidate-generation machinery as text SimHash: 4 exact
    * `blockBits`-bit bands (any pair within Hamming 3 shares one —
    * pigeonhole), the hot-bucket cap, the bucket equi-join, exact
    * `bit_count(xor)` verification. Never all-pairs; same scale story and
    * the same oracle-replayability (bands, cap and filter are all integer
    * arithmetic DuckDB reproduces). */
  def hammingPairsFromHashes(sh: DataFrame, blockBits: Int,
                             maxHamming: Int = 3,
                             maxBucketSize: Int = DefaultMaxBandBucket): DataFrame = {
    val blockMask = (1L << blockBits) - 1
    val raw = sh.select(col("id"), col("sh"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("blk"),
            shiftrightunsigned(col("sh"), b * blockBits).bitwiseAND(lit(blockMask)).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    graft.CacheScope.cached(raw)
    val blocks =
      if (maxBucketSize <= 0) raw
      else {
        val hot = raw.groupBy(col("blk"), col("key"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucketSize)
          .select(col("blk"), col("key"))
        raw.join(broadcast(hot), Seq("blk", "key"), "left_anti")
      }
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("d1"), col("b.id").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
