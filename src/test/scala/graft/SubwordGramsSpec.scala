package graft

import org.apache.spark.sql.functions._
import graft.plans.SubwordExpressions

/** Pins the native `subword_gram_counts` kernel to the nested-Generate
  * derivation it replaced (explode tokens → explode all (start, len 2..4)
  * substrings → count), on crafted inputs and the sf0.001 corpus. The
  * q_subword_vocab DuckDB oracle is the mass cross-check; these cases
  * target the boundaries: token-length filter, codepoint slicing,
  * whitespace classes, and gram multiplicity within one document.
  */
class SubwordGramsSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def viaKernel(df: org.apache.spark.sql.DataFrame) = df
    .select(explode(SubwordExpressions.subwordGramCounts(lower(col("text"))))
      .as(Seq("gram", "c")))
    .groupBy("gram").agg(sum("c").as("cnt"))

  private def viaGenerate(df: org.apache.spark.sql.DataFrame) = df
    .select(explode(split(lower(col("text")), "\\s+")).as("w"))
    .filter(length(col("w")) >= 2)
    .select(explode(expr(
      "flatten(transform(sequence(1, length(w)), s -> " +
        "transform(sequence(2, 4), l -> " +
        "CASE WHEN s + l - 1 <= length(w) THEN substring(w, s, l) END)))"))
      .as("gram"))
    .filter(col("gram").isNotNull)
    .groupBy("gram").agg(count(lit(1)).as("cnt"))

  private def assertAgree(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val a = viaKernel(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = viaGenerate(df).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("crafted inputs agree with the nested-Generate derivation") {
    assertAgree(Seq(
      "",
      "a",                       // 1-codepoint token dropped
      "ab",                      // minimal kept token
      "abcd",                    // every 2/3/4-gram of one token
      "abcde",                   // grams start at every position
      "aaaa",                    // gram multiplicity inside one token
      "aaaa aaaa",               // multiplicity across tokens
      "ab cd ab",                // repeated token
      "  leading   runs\tand\ntabs\r\nmixed  ",
      "x y z",                   // all tokens below the length filter
      "UPPER MiXeD lower",       // lower() applied before both paths
      "的是了 我不 的是",          // multi-byte codepoint slicing
      "naïve café déjà",
      "a的b c的d的e",
      "word" * 40))              // token longer than any gram window
  }

  test("generated corpus agrees") {
    val rnd = new scala.util.Random(99L)
    val alphabet = "abcde的 é\t"
    val texts = Seq.tabulate(300) { _ =>
      (0 until (1 + rnd.nextInt(40)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assertAgree(texts)
  }

  test("sf0.001 documents corpus agrees end-to-end") {
    val docs = Tables.t(spark, TestSpark.Sf0001, "documents").select("text")
    val a = viaKernel(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = viaGenerate(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
