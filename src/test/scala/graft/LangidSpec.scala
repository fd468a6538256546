package graft

import org.apache.spark.sql.functions._

/** The trained language-ID core ([[graft.queries.TextQueries
  * .langidPredict]]) on a corpus where language signal EXISTS: the driver
  * fixture's documents share one synthetic vocabulary (chance-level by
  * construction — q_langid_train's oracle verifies the machinery), so this
  * spec is what pins that the TF-ratio centroid classifier actually
  * discriminates when character distributions differ. */
class LangidSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("TF-ratio centroid langid is perfect on disjoint character inventories") {
    val vocabA = Seq("karo", "mietu", "salo", "pirantu", "kesola", "nareti")
    val vocabB = Seq("wyzzx", "qwyrv", "zyxxq", "vwqzz", "xyzzy", "qqvwx")
    def mk(ids: Range, lang: String, vocab: Seq[String]) = ids.map { id =>
      val words = (0 until 30).map(k => vocab((id + k * 7) % vocab.size))
      (id.toLong, lang, words.mkString(" "))
    }
    val docs = (mk(0 until 40, "aa", vocabA) ++ mk(100 until 140, "bb", vocabB))
      .toDF("doc_id", "lang", "text")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val test = docs.filter(col("doc_id") % 2 === 1)
    val pred = graft.queries.TextQueries.langidPredict(train, test)
      .join(test.select(col("doc_id"), col("lang")), Seq("doc_id"))
    val rows = pred.select(col("lang"), col("pred_lang")).collect()
    assert(rows.length == test.count().toInt, "every test doc must be labeled")
    val wrong = rows.filter(r => r.getString(0) != r.getString(1))
    assert(wrong.isEmpty,
      s"crafted corpus must classify perfectly; wrong: ${wrong.take(5).mkString(",")}")
    CacheScope.release()
  }

  test("mixed-vocabulary docs go to the majority inventory") {
    val vocabA = Seq("karo", "mietu", "salo", "pirantu")
    val vocabB = Seq("wyzzx", "qwyrv", "zyxxq", "vwqzz")
    def pure(ids: Range, lang: String, vocab: Seq[String]) = ids.map { id =>
      (id.toLong, lang, (0 until 20).map(k => vocab((id + k) % vocab.size)).mkString(" "))
    }
    val train = (pure(0 until 20, "aa", vocabA) ++ pure(100 until 120, "bb", vocabB))
      .toDF("doc_id", "lang", "text")
    // 15 A-words + 5 B-words → must label "aa"; the reverse mix → "bb"
    val mixA = (0 until 15).map(k => vocabA(k % 4)) ++ (0 until 5).map(k => vocabB(k % 4))
    val mixB = (0 until 5).map(k => vocabA(k % 4)) ++ (0 until 15).map(k => vocabB(k % 4))
    val test = Seq((1000L, "aa", mixA.mkString(" ")), (1001L, "bb", mixB.mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val got = graft.queries.TextQueries.langidPredict(train, test)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(1000L -> "aa", 1001L -> "bb"), got.mkString(","))
    CacheScope.release()
  }
}
