package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bench-scale fixture builder: replicates an sfDir N× with per-replica
  * key shifts, producing a dataset ~N× the rows with the same schema,
  * key-uniqueness, and join relationships (dimension tables nation/region
  * are copied unshifted; every fact/entity key moves by replica×OFFSET so
  * FK joins still land). Events keep `ts` in whatever encoding the source
  * fixture uses (nanos BIGINT under the legacy flag, or TIMESTAMP_NTZ for
  * micros files) so the copy reads back through Tables.t's
  * schema-conditional branch exactly like the driver's files.
  *
  * This exists to validate the two-phase/broadcast/split claims at a 10×
  * datapoint (BASELINE.md) — it is NOT an oracle input; correctness stays
  * pinned at the driver's SFs.
  *
  * Document text and replica mode: a bare key-shifted copy makes every
  * document an n-member EXACT-duplicate clique, which turns every
  * pair-output near-dup query quadratic BY CONSTRUCTION — a valid
  * adversarial fixture for the exact-collapse path, but a dishonest one
  * for measuring how the near-dup family scales on real (lightly
  * duplicated) corpora. Default mode `perturb` therefore renames every
  * token with a per-replica suffix (`the → the~3`): a BIJECTION on the
  * token vocabulary per replica, so each replica keeps the source
  * corpus's intra-replica shingle/Jaccard/LSH structure EXACTLY while
  * sharing zero shingles across replicas — the 10× fixture behaves as 10
  * independent sf0.1 corpora. (Merely appending one token, by contrast,
  * would leave replicas at Jaccard ≈ 0.94 — still near-dup cliques.)
  * Mode `dup` keeps byte-identical replica text as the adversarial
  * duplicate-heavy variant. `n_chars` is recomputed from the perturbed
  * text so the column stays consistent.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [n] [perturb|dup]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/target/sf1")
    val n = args.lift(2).map(_.toInt).getOrElse(10)
    val mode = args.lift(3).getOrElse("perturb")
    require(mode == "perturb" || mode == "dup", s"unknown mode $mode")
    require(n <= 17576, s"n ($n) exceeds the 3-letter base-26 suffix space")
    val Off = 10000000L

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts passes through in its source encoding: a NANOS file reads
    // as Long under this flag (and stays Long in the copy); a MICROS file
    // reads/writes as TIMESTAMP_NTZ. Either way the copy re-reads through
    // Tables.t's schema-conditional normalization.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def copy(name: String): Unit =
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")

    def rep(name: String, keys: Seq[String], perturbText: Boolean = false,
            perturbVec: Boolean = false): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      // replica key shifts must not collide with source keys: the stated
      // key-uniqueness/FK guarantee silently breaks once max(key) ≥ Off
      val maxes = df.agg(max(col(keys.head)), keys.tail.map(k => max(col(k))): _*)
        .first()
      keys.indices.foreach { i =>
        val mx = maxes.getLong(i)
        require(mx < Off,
          s"$name.${keys(i)} max $mx >= offset $Off — raise Off or shrink src")
      }
      val out = df.withColumn("__r", explode(sequence(lit(0), lit(n - 1))))
      val shifted = keys.foldLeft(out)((d, k) =>
        d.withColumn(k, col(k) + col("__r").cast("long") * Off))
      val bodied =
        if (perturbText && mode == "perturb")
          // r14: the suffix is a FIXED-LENGTH base-26 LETTER string, not
          // "~N" — `~` made every perturbed token fail `^[a-z]+$` word
          // filters, so the tokenizer/unigram family trained on an EMPTY
          // histogram at perturbed scale fixtures (BASELINE 13b
          // degeneracy). Fixed length is what keeps the rename collision-
          // free ACROSS replicas (token+sfx_r = token'+sfx_s with equal-
          // length suffixes forces r = s and token = token'), preserving
          // the zero-shared-shingles independence claim.
          shifted
            .withColumn("__sfx", expr(
              "concat(char(97 + (__r div 676) % 26), " +
                "char(97 + (__r div 26) % 26), char(97 + __r % 26))"))
            .withColumn("text", array_join(
              transform(split(col("text"), " "),
                t => concat(t, col("__sfx"))), " "))
            .withColumn("n_chars", length(col("text")))
            .drop("__sfx")
        else if (perturbVec && mode == "perturb")
          // per-replica diagonal ±1 sign flip (replica 0 = identity): norms
          // and INTRA-replica dot products are exactly preserved
          // (Σ sᵢ²xᵢyᵢ = Σ xᵢyᵢ), while cross-replica cosines randomize —
          // the embedding analog of the token-renaming bijection
          shifted.withColumn("embedding",
            transform(col("embedding"), (x, i) =>
              when(col("__r") === 0 ||
                pmod(xxhash64(col("__r"), i), lit(2L)) === 0L, x).otherwise(-x)))
        else shifted
      // r13: spread the write across `cpus` files. The explode-based
      // replication otherwise inherits the SOURCE file count (sf0.1 = one
      // file) and lands as ONE parquet file with ONE row group — and a row
      // group is the atomic scan split, so every narrow fused pass
      // (scan→compute→agg with no shuffle) measured on the fixture ran
      // effectively single-threaded (q_html_extract: 98 s at sf10, yet
      // 211 s at the 10×-bigger sf100 which happened to get 7 row
      // groups). Real 100 TB inputs arrive as thousands of files; the
      // fixture must too, or it benchmarks the pathological layout.
      bodied.drop("__r")
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name ×$n" + (if (perturbText && mode == "perturb") " (perturbed)" else ""))
    }

    copy("region"); copy("nation")
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rep("events", Seq("event_id", "user_id"))
    rep("documents", Seq("doc_id"), perturbText = true)
    rep("embeddings", Seq("vec_id"), perturbVec = true)
    println(s"[scaleup] wrote $dst")
    spark.stop()
  }
}
