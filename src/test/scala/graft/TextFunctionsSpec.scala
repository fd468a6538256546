package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Similarity

class TextFunctionsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("tokens drops empties from repeated separators") {
    val r = Seq("a  b   c ").toDF("t")
      .select(TextFunctions.tokens($"t")).collect()(0).getSeq[String](0)
    assert(r == Seq("a", "b", "c"))
  }

  test("approxTokenCount: letter runs, digit runs, single marks") {
    val r = Seq("hello world42, x=1!").toDF("t")
      .select(TextFunctions.approxTokenCount($"t")).collect()(0).getLong(0)
    // hello|world|42|,|x|=|1|! -> 8
    assert(r == 8L)
  }

  test("rollingFingerprint is order-sensitive; fingerprint64 whitespace-normalizing") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),   // same bag, different order
      (3L, "alpha  beta   gamma")) // same tokens, extra spaces
      .toDF("id", "t")
    val rows = df.select($"id",
      TextFunctions.rollingFingerprint($"t").as("roll"),
      TextFunctions.fingerprint64($"t").as("fp64"))
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2)))).toMap
    assert(rows(1L)._1 != rows(2L)._1, "rolling fp must be order-sensitive")
    assert(rows(1L)._2 != rows(2L)._2)
    // fingerprint64 normalizes runs of whitespace; rolling works on tokens
    assert(rows(1L)._2 == rows(3L)._2, "fp64 must normalize whitespace")
    assert(rows(1L)._1 == rows(3L)._1, "token-based rolling fp ignores extra spaces")
  }

  test("qualityScore lands in [0,1] on real documents") {
    val q = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(TextFunctions.qualityScore($"text").as("q"))
      .agg(min($"q"), max($"q")).collect()(0)
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("qualityGates: each gate trips on exactly its crafted violation") {
    // baseline passes all five gates with the defaults (n=10 four-char
    // alpha tokens incl. two stopwords, all distinct)
    val pass = "the and wxyz qrst alpha beta gama delt epsi zeta"
    val docs = Seq(
      1L -> pass,
      2L -> "too short",                                   // g_len (n=2 < 10)
      3L -> pass.split(" ").map(t => t * 4).mkString(" "), // g_wordlen (mean 16 > 12)
      4L -> "the and 11 22 33 44 55 66 77 88",             // g_alpha (8/10 digits)
      5L -> "wxyz qrst alpha beta gama delt epsi zeta etaa thet", // g_stop (0 hits)
      6L -> ("the and " + Seq.fill(8)("dup").mkString(" ")) // g_ttr (3 distinct / 10)
    ).toDF("id", "t")
    val gates = TextFunctions.qualityGates(TextFunctions.tokens($"t"))
    val out = docs.select($"id" +: gates.map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> gates.indices.map(i => r.getBoolean(i + 1))).toMap
    assert(out(1L).forall(identity), s"baseline must pass all: ${out(1L)}")
    // doc i+1 fails gate i and no EARLIER gate (later gates may also trip)
    Seq(2L, 3L, 4L, 5L, 6L).zipWithIndex.foreach { case (id, g) =>
      assert(!out(id)(g), s"doc $id should fail gate $g: ${out(id)}")
      assert(out(id).take(g).forall(identity),
        s"doc $id must pass gates before $g: ${out(id)}")
    }
  }

  test("randomHyperplaneBucket: deterministic, fixed width, splits the corpus") {
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    def buckets = emb.select($"vec_id",
      Similarity.randomHyperplaneBucket($"embedding", dim = 64, bits = 8).as("b"))
    val a = buckets.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val b = buckets.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
    val distinct = a.values.toSet.size
    assert(distinct > 50, s"hyperplanes should spread buckets, got $distinct")
  }

  test("lshNearDupPairs accepts the hyperplane family as a drop-in bucket") {
    val emb = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val pairs = Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
      minCosine = 0.3,
      bucketFn = v => Similarity.randomHyperplaneBucket(v, dim = 64, bits = 8))
      .select("v1", "v2").as[(Long, Long)].collect()
    // every returned pair genuinely clears the exact-cosine threshold
    pairs.take(3).foreach { case (v1, v2) =>
      val c = emb.as("a").join(emb.as("b"),
          col("a.vec_id") === v1 && col("b.vec_id") === v2)
        .select(Similarity.cosine(col("a.embedding"), col("b.embedding")))
        .as[Double].collect()(0)
      assert(c >= 0.3)
    }
  }

  test("bpeTokens applies the frozen merge table like greedy BPE") {
    val rows = Seq("join", "hash", "merger", "stream", "aaa", "q")
      .toDF("w")
      .select($"w", graft.queries.TextQueries.bpeTokens($"w").as("toks"))
      .as[(String, Seq[String])].collect().toMap
    // chains through multi-level merges: j+o, (jo)+in, a+s, (as)+h, h+(ash)
    assert(rows("join") == Seq("join"), rows("join"))
    assert(rows("hash") == Seq("hash"), rows("hash"))
    // er merges twice, then m+er — the trailing er stays an er token
    assert(rows("merger") == Seq("mer", "g", "er"), rows("merger"))
    assert(rows("stream") == Seq("st", "r", "e", "a", "m"), rows("stream"))
    // no (a,a) merge: unchanged chars; single char untouched
    assert(rows("aaa") == Seq("a", "a", "a"))
    assert(rows("q") == Seq("q"))
  }
  test("sentences: boundaries, abbreviation guard, fragments (r14)") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    def run(t: String): Seq[String] =
      Seq(t).toDF("t")
        .select(graft.functions.TextFunctions.sentences(col("t")))
        .head().getSeq[String](0)
    assert(run("one two. three four! five six? seven") ==
      Seq("one two.", "three four!", "five six?", "seven"))
    // every guarded abbreviation survives unsplit
    graft.functions.TextFunctions.SentenceAbbrevs.foreach { a =>
      assert(run(s"ask $a smith today. next one.") ==
        Seq(s"ask $a smith today.", "next one."),
        s"abbreviation $a split a sentence")
    }
    // unguarded dot still splits; no-terminator text is one sentence
    assert(run("end. start") == Seq("end.", "start"))
    assert(run("no terminator at all") == Seq("no terminator at all"))
    // terminator at very end: no trailing empty sentence beyond the split
    assert(run("a b.") == Seq("a b."))
    assert(run("") == Seq(""))
  }
}