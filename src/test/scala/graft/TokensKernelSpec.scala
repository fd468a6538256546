package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Pins the native `split_tokens` kernel to the columnar reference
  * `filter(split(text, " "), t ≠ "")` ([[TextFunctions.tokensColumnar]]):
  * identical token arrays (order included) on crafted spacing / multi-byte
  * corpora, generated strings, and sf0.001 documents; and pins the native
  * `oov_stats` kernel to its columnar derivation (size + ¬array_contains
  * filter) against assorted vocabularies. Every token-family oracle is the
  * mass cross-check.
  */
class TokensKernelSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private val crafted = Seq(
    "",
    " ",
    "    ",
    "one",
    " one ",
    "one two three",
    "  leading  double   spaces and trailing  ",
    "tab\tand\nnewline inside tokens stay whole",
    "ü ö 日本 語 mixed 字 bytes",
    "a" * 50 + " b",
    ("w " * 40).trim)

  private def gen(): Seq[String] = {
    var seed = 0x853c49e6748fea9bL
    (0 until 300).map { _ =>
      val n = ((seed >>> 40) % 60).toInt.abs
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append("abc xyz  q 字 ".charAt(((seed >>> 33) % 13).toInt))
      }
      sb.toString
    }
  }

  private def assertTokensAgree(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
      .select(col("text"),
        TextFunctions.tokens(col("text")).as("k"),
        TextFunctions.tokensColumnar(col("text")).as("r"))
    df.collect().foreach { r =>
      val tag = r.getString(0).take(60).replace("\n", "\\n").replace("\t", "\\t")
      assert(r.getSeq[String](1) === r.getSeq[String](2), s"tokens for '$tag'")
    }
  }

  private def assertOovAgree(texts: Seq[String], vocab: Seq[String]): Unit = {
    val vocabLit = array(vocab.map(lit): _*)
    val toks = TextFunctions.tokensColumnar(col("text"))
    val df = texts.toDF("text")
      .select(col("text"),
        graft.plans.TextStatsExpressions.oovStats(col("text"), vocab).as("st"),
        size(toks).cast("long").as("c_tokens"),
        size(filter(toks, t => !array_contains(vocabLit, t)))
          .cast("long").as("c_oov"))
    df.collect().foreach { r =>
      val st = r.getStruct(1)
      val tag = r.getString(0).take(60).replace("\n", "\\n")
      assert(st.getLong(0) === r.getAs[Long]("c_tokens"), s"n_tokens for '$tag'")
      assert(st.getLong(1) === r.getAs[Long]("c_oov"), s"n_oov for '$tag'")
    }
  }

  test("split_tokens: crafted and generated corpora agree") {
    assertTokensAgree(crafted)
    assertTokensAgree(gen())
  }

  test("split_tokens: sf0.001 documents agree end-to-end") {
    assertTokensAgree(Tables.t(ss, TestSpark.Sf0001, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq)
  }

  test("oov_stats: crafted, generated, and sf0.001 corpora agree") {
    val vocabs = Seq(
      Seq("one", "two", "the", "a", "字"),
      Seq.empty[String],
      Seq("abc", "xyz", "q"))
    vocabs.foreach { v =>
      assertOovAgree(crafted, v)
      assertOovAgree(gen(), v)
    }
    val docs = Tables.t(ss, TestSpark.Sf0001, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    assertOovAgree(docs, Seq("the", "of", "la", "und", "el"))
  }

  test("feature_hist ≡ the explode+hash+groupBy derivation") {
    def check(texts: Seq[String]): Unit = {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val kernel = df
        .select(col("doc_id"),
          posexplode(graft.plans.TextStatsExpressions.featureHist(col("text"), 32))
            .as(Seq("bucket", "cnt")))
        .filter(col("cnt") > 0)
        .select(col("doc_id"), col("bucket").cast("long").as("bucket"), col("cnt"))
      val tokenHash = (length(col("t")) * 1009 + ascii(col("t")) * 31 +
        ascii(reverse(col("t")))) % 1000000007
      val columnar = df
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("t"))
        .select(col("doc_id"), (tokenHash % 32).cast("long").as("bucket"))
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      assert(kernel.exceptAll(columnar).isEmpty && columnar.exceptAll(kernel).isEmpty,
        "feature_hist diverges from the explode derivation")
    }
    check(crafted)
    check(gen())
    check(Tables.t(ss, TestSpark.Sf0001, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq)
  }
}
