package graft

import org.apache.spark.sql.functions._

/** Pins the native `distinct_shingles` kernel to the columnar reference
  * [[graft.operators.Dedup.shingleSetsColumnar]]: identical (id, sh) row
  * multisets AND identical first-occurrence array order across shingle
  * widths on crafted spacing / multi-byte corpora, generated strings, and
  * sf0.001 documents. The shingle family's DuckDB oracles (jaccard,
  * minhash, cascade, decontaminate, bigram LM, pipelines) are the mass
  * cross-check at both SFs.
  */
class ShingleKernelSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def assertAgree(texts: Seq[String], n: Int): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val ker = graft.operators.Dedup.shingleSets(df, "doc_id", "text", n)
      .groupBy("id").agg(collect_list("sh").as("k"))
    val ref = graft.operators.Dedup.shingleSetsColumnar(df, "doc_id", "text", n)
      .groupBy("id").agg(collect_list("sh").as("r"))
    val joined = ker.join(ref, Seq("id"), "full_outer").collect()
    assert(joined.length === ker.count())
    joined.foreach { row =>
      assert(row.getSeq[String](1) === row.getSeq[String](2),
        s"n=$n doc=${row.getLong(0)}")
    }
    // docs below n tokens must vanish from BOTH forms identically
    val kIds = ker.select("id").as[Long].collect().toSet
    val rIds = ref.select("id").as[Long].collect().toSet
    assert(kIds === rIds, s"row-presence mismatch at n=$n")
  }

  test("crafted spacing and multi-byte corpora agree across widths") {
    val texts = Seq(
      "",
      " ",
      "one",
      "one two",
      "one two three",
      "a b a b a b",                       // repeated shingles: distinct collapses
      "x x x x x x x x",                   // all-identical tokens
      "  double  spaces   collapse and trailing  ",
      "ü ö 日本 語 mixed 字 tokens here",
      "tab\tinside token stays whole two three",
      ("w " * 30).trim)
    Seq(1, 2, 3, 5).foreach(n => assertAgree(texts, n))
  }

  test("generated corpus agrees at n=3 and n=5") {
    var seed = 0x6a09e667f3bcc909L
    val texts = (0 until 200).map { _ =>
      val n = ((seed >>> 40) % 30).toInt.abs
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append("w").append(((seed >>> 33) % 5).toInt)
        sb.append(if ((seed & 1) == 0) " " else "  ")
      }
      sb.toString
    }
    assertAgree(texts, 3)
    assertAgree(texts, 5)
  }

  test("sf0.001 documents agree end-to-end at n=3") {
    val docs = Tables.t(ss, TestSpark.Sf0001, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    assertAgree(docs, 3)
  }

  test("all_shingles: multiplicity-preserving twin ≡ naive sliding window; n=1 ≡ tokens") {
    def naive(t: String, n: Int): Seq[String] = {
      val tk = t.split(" ").filter(_.nonEmpty).toSeq
      if (tk.length < n) Seq.empty
      else (0 to tk.length - n).map(i => tk.slice(i, i + n).mkString(" "))
    }
    val texts = Seq(
      "", " ", "one", "one two", "a b a b a b", "x x x x x x x x",
      "  double  spaces   collapse and trailing  ",
      "ü ö 日本 語 mixed 字 tokens here",
      "rep rep rep distinct would collapse rep rep") ++ {
      var seed = 0x3c6ef372fe94f82aL
      (0 until 150).map { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        val n = ((seed >>> 40) % 25).toInt.abs
        val sb = new StringBuilder
        (0 until n).foreach { _ =>
          seed = seed * 6364136223846793005L + 1442695040888963407L
          sb.append("w").append(((seed >>> 33) % 4).toInt)
          sb.append(if ((seed & 1) == 0) " " else "  ")
        }
        sb.toString
      }
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val got = df.select(col("doc_id"),
          graft.plans.ShingleExpressions.allShingles(col("text"), n).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == naive(t, n), s"n=$n '$t'")
      }
    }
    // n = 1 must be exactly the tokens-kernel stream (dsirWeights relies on it)
    val viaTokens = df.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaAll = df.select(col("doc_id"),
        graft.plans.ShingleExpressions.allShingles(col("text"), 1).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaTokens == viaAll)
  }
}
