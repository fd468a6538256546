package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Pins the native [[graft.plans.BpeKernel]] token-budget expression to
  * the columnar length-arithmetic reference ([[TextQueries.bpeTokenCountColumnar]],
  * itself DuckDB-hash-proven through q_pack_sequences / q_mixture_plan)
  * on the inputs where the two could plausibly diverge: the
  * shared-delimiter replace quirk, literal pipes in the text, whitespace
  * runs, multi-byte codepoints, merge-chain products, and a generated
  * random corpus over the merge alphabet.
  */
class TextKernelSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def both(texts: Seq[String]): Seq[(String, Long, Long)] = {
    val df = texts.toDF("text")
      .select(col("text"),
        TextQueries.bpeTokenCount(col("text")).as("native"),
        TextQueries.bpeTokenCountColumnar(col("text")).as("columnar"))
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def assertAgree(texts: Seq[String]): Unit =
    both(texts).foreach { case (t, n, c) =>
      assert(n === c, s"native=$n columnar=$c for ${t.take(80).inspect}")
    }

  private implicit class Inspectable(s: String) {
    def inspect: String = s.flatMap {
      case '\n' => "\\n"; case '\t' => "\\t"; case c => c.toString
    }
  }

  test("crafted merge-chain cases agree with the columnar reference") {
    assertAgree(Seq(
      "",                       // empty -> 0
      "   ",                    // all whitespace -> 0
      "\t\n\r\f",         // every Java \s class char
      "er",                     // single merge fires: 1 token
      "erer",                   // shared-delimiter: |e|r|e|r| -> |er|e|r|? both er merges have own pipes -> check agreement
      "ererer",                 // alternating-pair quirk at longer run
      "join",                   // chained merges j+o, jo+in via i+n
      "mer",                    // m + er (merge 6 consumes merge 1's product)
      "parar",                  // p+ar after a+r
      "hash rowhash",           // h+ash chain, r+ow
      "a|b",                    // literal pipe between letters blocks nothing extra
      "|||",                    // only pipes -> 0 tokens
      "|er|",                   // pipes flanking a mergeable pair
      "x||y",                   // pipe run inside a word
      "er|er",                  // pipe splits two merge sites
      "stop stop stop",         // s+t merge twice per word
      "STOP Stop sToP",         // lower() applied before both paths
      "的是了 我不",              // multi-byte codepoints, zh stopwords
      "naïve café",             // 2-byte latin accents
      "er的er",                 // multibyte separating merge sites
      "word\nnewline\ttabbed cr\rmix",
      " leading and trailing  ",
      "in" * 200,               // long i+n run: alternating-pair semantics at depth
      ("er " * 150).trim))
  }

  test("generated corpus over the merge alphabet agrees") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "erinowstmalupjh |~0123456789\t的"
    val texts = Seq.tabulate(400) { _ =>
      val len = 1 + rnd.nextInt(60)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    assertAgree(texts)
  }

  test("kernel matches bpeTokens segmentation count word by word") {
    // third witness: explicit token materialization via bpeTokens (the
    // q_bpe_encode path) on single words — no whitespace, no pipes
    val words = Seq("er", "join", "mer", "hash", "parar", "stop", "was",
      "minnow", "tomorrow", "juice", "xyzzy", "q", "ererererer")
    val df = words.toDF("w")
      .select(col("w"),
        size(TextQueries.bpeTokens(lower(col("w")))).cast("long").as("via_tokens"),
        TextQueries.bpeTokenCount(col("w")).as("native"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === r.getLong(1), s"word=${r.getString(0)}")
    }
  }
}
