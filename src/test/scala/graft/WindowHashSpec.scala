package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens
import graft.plans.WindowHashExpressions

/** Pins the native `window_hashes` kernel to the columnar reference
  * [[graft.operators.Dedup.windowHashes]]`(tokens(text), w)`: identical
  * hash arrays (order included) on crafted spacing / multi-byte corpora,
  * generated strings, and sf0.001 documents, across window widths. The
  * q_substring_dup / q_source_pagerank oracles are the mass cross-check.
  */
class WindowHashSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def assertAgree(texts: Seq[String], w: Int): Unit = {
    val df = texts.toDF("text")
      .select(col("text"), tokens(col("text")).as("__t"))
      .select(col("text"),
        graft.operators.Dedup.windowHashes(col("__t"), w).as("ref"),
        WindowHashExpressions.windowHashes(col("text"), w).as("ker"))
    df.collect().foreach { r =>
      val tag = r.getString(0).take(60).replace("\n", "\\n")
      assert(r.getSeq[String](2) === r.getSeq[String](1), s"w=$w for '$tag'")
    }
  }

  test("crafted spacing and multi-byte corpora agree across widths") {
    val texts = Seq(
      "",
      " ",
      "one",
      "one two",
      "one two three",
      "one two three four five",
      "  leading  double   spaces and trailing  ",
      "a a a a a a a a",                    // repeated token: windows collide
      "ü ö 日本 語 mixed 字 tokens here",    // multi-byte tokens
      "tab\tinside token stays whole",      // only ' ' separates
      "x " * 20 + "y")
    Seq(1, 2, 3, 16).foreach(w => assertAgree(texts, w))
  }

  test("generated corpus agrees at w=16") {
    var seed = 0x2545f4914f6cdd1dL
    val texts = (0 until 200).map { _ =>
      val n = ((seed >>> 40) % 40).toInt.abs
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append("tok").append(((seed >>> 33) % 7).toInt)
        sb.append(if ((seed & 1) == 0) " " else "  ")
      }
      sb.toString
    }
    assertAgree(texts, 16)
    assertAgree(texts, 3)
  }

  test("sf0.001 documents agree end-to-end at w=16") {
    val docs = Tables.t(ss, TestSpark.Sf0001, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    assertAgree(docs, 16)
  }

  test("window_hashes_raw digests are exactly the hex form, decoded") {
    import org.apache.spark.sql.functions._
    import TestSpark.spark.implicits._
    val texts = Seq("", "one two three four", ("tok " * 40).trim,
      "a b c d e f g h i j k l m n o p q r s t")
    Seq(2, 16).foreach { w =>
      val df = texts.toDF("text").select(
        graft.plans.WindowHashExpressions.windowHashes(col("text"), w).as("hx"),
        graft.plans.WindowHashExpressions.windowHashesRaw(col("text"), w).as("rw"))
      df.collect().foreach { r =>
        val hx = r.getSeq[String](0)
        val rw = r.getSeq[Array[Byte]](1)
        assert(hx.length == rw.length)
        hx.zip(rw).foreach { case (h, b) =>
          assert(h === b.map("%02x".format(_)).mkString, s"w=$w")
        }
      }
    }
  }
}
