package graft

import org.apache.spark.sql.functions._
import graft.plans.BioExpressions._
import graft.plans.BioKernels

/** Pins [[graft.plans.BioKernels]] against independent columnar
  * derivations built from Spark built-ins only:
  *
  *  - `dna_translate` ≡ explode-to-codons (char-based `substring`, the
  *    oracle's frame convention) → 64-way CASE lookup → ordered
  *    re-concat — on crafted multi-byte corpora (frames count CODE
  *    POINTS, so a 'é' mid-codon must shift the frame exactly like the
  *    SQL `substr` does), generated ACGTN-ish strings, and the fixture;
  *  - `phred_stats` ≡ per-char explode + `ascii()`−33 aggregation.
  */
class BioKernelSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def corpus: Seq[String] = {
    val crafted = Seq(
      "", "A", "AC", "ACG", "ACGT", "ACGTT", "ACGTTG",
      "ATGAAATAG",           // M K *
      "NNNACG", "ACGNNN", "AANAAC",
      "acgACG",              // lowercase survives only via upper() upstream
      "éACGT", "ACéGT", "ACGé", "多ACG字",  // multi-byte mid-frame shifts
      "𝄞ACGTAA",            // supplementary (4-byte) code point
      "ACGT ACG",            // space inside a frame
      ("ACGT" * 30) + "NN",
      "TTTTTCTTATTGTAA")     // F F L L *
    var seed = 0x9e3779b97f4a7c15L
    val gen = (0 until 300).map { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val n = ((seed >>> 40) % 60).toInt.abs
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append("ACGTNacgtn é多X*".charAt(((seed >>> 33) % 15).toInt))
      }
      sb.toString
    }
    val docs = Tables.t(TestSpark.spark, TestSpark.Sf0001, "documents")
      .select(upper(replace(col("text"), lit(" "), lit(""))))
      .limit(200).collect().map(_.getString(0)).toSeq
    crafted ++ gen ++ docs
  }

  test("dna_translate ≡ char-based codon explode + table lookup") {
    val bases = "ACGT"
    val lookup: Map[String, String] = (0 until 64).map { i =>
      val codon = s"${bases(i >> 4)}${bases((i >> 2) & 3)}${bases(i & 3)}"
      codon -> BioKernels.CodonTable(i).toString
    }.toMap
    // driver-side reference on the collected corpus: code-point codons
    def ref(s: String): String = {
      val cps = s.codePoints().toArray
      cps.grouped(3).filter(_.length == 3).map { c =>
        val codon = new String(c, 0, 3)
        lookup.getOrElse(codon, "X")
      }.mkString
    }
    val rows = corpus.toDF("s")
      .select(col("s"), dnaTranslate(col("s")).as("k"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0); val k = r.getString(1)
      assert(k === ref(s), s"translate divergence on '$s'")
    }
  }

  test("dna_translate ≡ a Spark-built-in columnar derivation (map-literal lookup)") {
    // independent in-engine derivation mirroring the oracle's shape:
    // CHAR-based codon substrings via transform+substring over a
    // sequence of frame indices, mapped through a MapType literal,
    // concat in order — all built-ins, no kernel code
    val bases = "ACGT"
    val entries = (0 until 64).flatMap { i =>
      val codon = s"${bases(i >> 4)}${bases((i >> 2) & 3)}${bases(i & 3)}"
      Seq(lit(codon), lit(BioKernels.CodonTable(i).toString))
    }
    val codonMap = map(entries: _*)
    val u = col("u")
    // sequence(1, 0) is DESCENDING in Spark — guard the <3-char case
    val ref = when(length(u) < 3, lit("")).otherwise(concat_ws("",
      transform(
        sequence(lit(1), (length(u) / lit(3)).cast("int")),
        i => coalesce(element_at(codonMap, u.substr((i - lit(1)) * lit(3) + lit(1), lit(3))),
          lit("X")))))
    val bad = corpus.toDF("u")
      .select(dnaTranslate(u).as("k"), ref.as("c"))
      .where(col("k") =!= col("c")).count()
    assert(bad === 0)
  }

  test("phred_stats ≡ explode + ascii aggregation; empty and null handling") {
    val quals = Seq("!", "~", "!~", "IIII", "@+!~IJKLMNOP" * 5,
      "#$%&'()*+,-./0123456789:;<=>?") ++
      corpus.filter(_.nonEmpty).map(_.take(40)).filter(_.forall(c => c >= '!' && c <= '~'))
    val df = quals.toDF("q")
    val kernelRows = df.select(col("q"),
        phredStats(col("q")).as("ps"))
      .select(col("q"), col("ps.n_bases"), col("ps.sum_q"), col("ps.min_q"),
        col("ps.max_q"), col("ps.n_ge30"))
      .collect()
    kernelRows.foreach { r =>
      val s = r.getString(0)
      val ph = s.map(_.toInt - 33)
      assert(r.getLong(1) === ph.length.toLong, s"n on '$s'")
      assert(r.getLong(2) === ph.map(_.toLong).sum, s"sum on '$s'")
      assert(r.getInt(3) === ph.min, s"min on '$s'")
      assert(r.getInt(4) === ph.max, s"max on '$s'")
      assert(r.getLong(5) === ph.count(_ >= 30).toLong, s"ge30 on '$s'")
    }
    val empty = Seq("").toDF("q").select(phredStats(col("q")).as("ps"))
      .select(col("ps.n_bases"), col("ps.min_q"), col("ps.max_q")).head()
    assert(empty.getLong(0) === 0L && empty.isNullAt(1) && empty.isNullAt(2))
    val nul = Seq[Option[String]](None).toDF("q")
      .select(phredStats(col("q"))).head()
    assert(nul.isNullAt(0))
  }

  test("phred_stats decodes multi-byte code points like ord()") {
    // 'é' = U+00E9 (233) → q = 200; '多' = U+591A (22810) → q = 22777
    val r = Seq("é多!").toDF("q").select(phredStats(col("q")).as("ps"))
      .select(col("ps.n_bases"), col("ps.sum_q"), col("ps.min_q"), col("ps.max_q")).head()
    assert(r.getLong(0) === 3L)
    assert(r.getLong(1) === (233 - 33).toLong + (22810 - 33) + 0)
    assert(r.getInt(2) === 0)
    assert(r.getInt(3) === 22810 - 33)
  }
}
