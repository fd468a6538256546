package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SeqFunctions

/** Property-based invariants for the reference algorithms (SURVEY §5.2.4),
  * over 500 deterministic random ACGTN± strings. Pure-function checks — no
  * Spark session needed, so they run in milliseconds. */
class SeqPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val alphabet = "ACGTNacgtn"
  private val samples: Seq[String] =
    (0 until 500).map { _ =>
      val len = rnd.nextInt(30)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }

  test("kmer freqs sum to 1 when non-empty; keys are clean uppercase 3-mers") {
    for (s <- samples) {
      val m = SeqFunctions.kmerFrequenciesImpl(s, 3)
      if (m.nonEmpty) {
        assert(math.abs(m.values.sum - 1.0) < 1e-9, s"seq=$s")
        assert(m.keys.forall(k => k.length == 3 && !k.contains("N") && k == k.toUpperCase))
      }
    }
  }

  test("codon freqs sum to 1 when non-empty; keys clean; count bounded") {
    for (s <- samples) {
      val m = SeqFunctions.codonUsageImpl(s)
      if (m.nonEmpty) assert(math.abs(m.values.sum - 1.0) < 1e-9, s"seq=$s")
      assert(m.keys.forall(k => k.length == 3 && !k.contains("N")))
      assert(m.isEmpty || m.size <= s.length / 3)
    }
  }

  test("kmer map reconstructs integral window counts; empty iff no clean windows") {
    val k = 3
    for (s <- samples) {
      val m = SeqFunctions.kmerFrequenciesImpl(s, k)
      val windows =
        if (s.length < k) Seq.empty
        else (0 to s.length - k).map(i => s.substring(i, i + k).toUpperCase)
      val kept = windows.filterNot(_.contains("N"))
      if (kept.isEmpty) assert(m.isEmpty, s"seq=$s")
      else {
        assert(m.nonEmpty, s"seq=$s")
        val total = kept.size.toDouble
        m.foreach { case (gram, f) =>
          val c = f * total
          assert(math.abs(c - math.round(c)) < 1e-6)
          assert(math.round(c) == kept.count(_ == gram), s"seq=$s gram=$gram")
        }
      }
    }
  }

  test("gcContent/nCount literal-case invariants (via Spark expression)") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = samples.filter(_.nonEmpty).toDF("s")
      .select(col("s"),
        graft.functions.SeqFunctions.gcContent(col("s")).as("gc"),
        graft.functions.SeqFunctions.nCount(col("s")).as("n"))
      .collect()
    df.foreach { r =>
      val s = r.getString(0)
      val gc = r.get(1)
      val n = r.getLong(2)
      val expGc = s.count(c => c == 'G' || c == 'C').toDouble / s.length
      assert(gc == expGc, s"seq=$s")
      assert(n == s.count(_ == 'N').toLong, s"seq=$s")
      assert(expGc >= 0.0 && expGc <= 1.0)
    }
  }
}
