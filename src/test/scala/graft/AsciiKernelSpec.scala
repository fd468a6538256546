package graft

import org.apache.spark.sql.functions._
import graft.plans.AsciiExpressions._

/** Pins [[graft.plans.AsciiKernels]] against the built-ins they replace:
  * `ascii_char_count` ≡ the `length − length(translate(…, cs, ""))` diff,
  * and `ascii_translate` ≡ `translate` for same-length ASCII from/to —
  * on crafted multi-byte corpora (ASCII-exactness must hold AROUND
  * multi-byte chars, not just on ASCII rows), generated strings, and the
  * fixture. */
class AsciiKernelSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def corpus: Seq[String] = {
    val crafted = Seq(
      "", " ", "G", "GCgc", "ACGTN" * 20, "NnNn",
      "naïve GCs — über N", "多GC字节N串", "G多C字N节",
      "𝄞GC🎵N", "AAGGCCTTNN", "no hits here!", "ACGT ACGT ACGT")
    var seed = 0x2545f4914f6cdd1dL
    val gen = (0 until 300).map { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val n = ((seed >>> 40) % 50).toInt.abs
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append("ACGTNacgtn 多字節é".charAt(((seed >>> 33) % 15).toInt))
      }
      sb.toString
    }
    val docs = Tables.t(TestSpark.spark, TestSpark.Sf0001, "documents")
      .select(col("text")).limit(200).collect().map(_.getString(0)).toSeq
    crafted ++ gen ++ docs
  }

  test("ascii_char_count ≡ translate-diff for GC / N / duplicate sets") {
    val df = corpus.toDF("s")
    Seq("GC", "N", "GGC", "ACGTN").foreach { cs =>
      val bad = df.select(
          asciiCharCount(col("s"), cs).as("k"),
          (length(col("s")) - length(translate(col("s"), cs, ""))).cast("long").as("c"))
        .where(col("k") =!= col("c")).count()
      assert(bad === 0, s"count divergence for set '$cs'")
    }
  }

  test("ascii_translate ≡ translate for same-length ASCII maps incl. dup keys") {
    val df = corpus.toDF("s")
    Seq(("ACGT", "TGCA"), ("AA", "XY"), ("NG", "GN")).foreach { case (f, t) =>
      val bad = df.select(
          asciiTranslate(col("s"), f, t).as("k"),
          translate(col("s"), f, t).as("c"))
        .where(col("k") =!= col("c")).count()
      assert(bad === 0, s"translate divergence for $f->$t")
    }
  }

  test("null passes through both kernels") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(asciiCharCount(col("s"), "GC"), asciiTranslate(col("s"), "A", "B"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("ascii_strip ≡ regexp_replace class delete for whitespace/control sets") {
    val df = (corpus ++ Seq("a\tb\rc\nd e", "\t\r\n ", "no-strip!")).toDF("s")
    val bad = df.select(
        graft.plans.AsciiExpressions.asciiStrip(col("s"), " \t\r\n").as("k"),
        regexp_replace(col("s"), "[ \\t\\r\\n]", "").as("c"))
      .where(col("k") =!= col("c")).count()
    assert(bad === 0)
    val bad2 = df.select(
        graft.plans.AsciiExpressions.asciiStrip(col("s"), "GCN").as("k"),
        translate(col("s"), "GCN", "").as("c"))
      .where(col("k") =!= col("c")).count()
    assert(bad2 === 0)
  }
}
