package graft

import org.apache.spark.sql.functions._

/** The bigram-LM perplexity core ([[graft.queries.TextQueries
  * .lmPerplexityScores]]) on corpora where the signal EXISTS: the driver
  * fixture's documents share one synthetic vocabulary, so q_lm_perplexity's
  * oracle verifies the machinery (quantized add-one arithmetic, bucket
  * rollup) while THIS spec pins that the model actually separates
  * reference-like text from gibberish, plus the hand-computed probability
  * arithmetic on a corpus small enough to verify by hand. */
class LmSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("in-model text scores strictly lower surprisal than gibberish") {
    // train: a tight 6-word cycle — every in-cycle bigram is high-count
    val cycle = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val train = (0 until 40).map { id =>
      (id.toLong, (0 until 30).map(k => cycle((id + k) % 6)).mkString(" "))
    }.toDF("doc_id", "text")
    // test: one doc continuing the cycle, one of never-seen tokens
    val inModel = (0 until 20).map(k => cycle(k % 6)).mkString(" ")
    val gibberish = (0 until 20).map(k => s"zzq$k").mkString(" ")
    val test = Seq((1000L, inModel), (1001L, gibberish)).toDF("doc_id", "text")
    val got = graft.queries.TextQueries.lmPerplexityScores(train, test)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.length == 2, got.mkString(","))
    val (inPpl, gibPpl) = (got(0)._2, got(1)._2)
    assert(inPpl < gibPpl,
      s"in-model ppl_q=$inPpl must beat gibberish ppl_q=$gibPpl")
    // gibberish bigrams are all unseen contexts: p_q = 2^20 div V with
    // V = 6 continuation types → p_q = 174762, ⌊log2⌋ = 17, s = 3 bits
    assert(gibPpl == 3L * 1048576,
      s"unseen-context surprisal must be exactly 3 bits, got $gibPpl")
    CacheScope.release()
  }

  test("add-one arithmetic matches the hand computation") {
    // train corpus: exactly "a b a b a" ×1 → bigrams: (a,b)×2, (b,a)×2
    val train = Seq((0L, "a b a b a")).toDF("doc_id", "text")
    val test = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    // c12(a,b)=2, c1(a)=2, V=|{a,b}|=2:
    //   seen  (a,b): p_q = (2+1)*2^20 div (2+2) = 786432  → s = 21-20 = 1
    //   novel (a,c): p_q = (0+1)*2^20 div (2+2) = 262144  → s = 21-19 = 2
    val got = graft.queries.TextQueries.lmPerplexityScores(train, test)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 2L)), got.mkString(","))
    CacheScope.release()
  }

  test("single-token docs drop out (no bigrams)") {
    val train = Seq((0L, "a b c")).toDF("doc_id", "text")
    val test = Seq((1L, "a"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    val ids = graft.queries.TextQueries.lmPerplexityScores(train, test)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L), ids.mkString(","))
    CacheScope.release()
  }
}
