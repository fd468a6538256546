package graft

import org.apache.spark.sql.functions._
import graft.functions.SeqFunctions
import graft.functions.SeqFunctions._

/** Pins the reference expression semantics (fastx_parsers.py:16-67) with
  * hand-computed expectations: case asymmetry (E2/E3 literal counts vs
  * E5/E6 uppercase-then-count), N-window drops, stride rules, empty/short
  * inputs, and the null-not-NaN divergence decision (SURVEY §2.1).
  */
class SeqFunctionsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def one(seq: String, c: org.apache.spark.sql.Column): Any =
    Seq(seq).toDF("s").select(c.as("r")).collect()(0).get(0)

  test("E1 seqLength counts characters") {
    assert(one("ACGT", seqLength($"s")) == 4L)
    assert(one("", seqLength($"s")) == 0L)
  }

  test("E2 gcContent is case-sensitive over full length") {
    assert(one("GCGC", gcContent($"s")) == 1.0)
    assert(one("GCTA", gcContent($"s")) == 0.5)
    // lowercase g/c NOT counted (fastx_parsers.py:19)
    assert(one("gcgc", gcContent($"s")) == 0.0)
    // N in denominator even though E5/E6 would drop it
    assert(one("GCNN", gcContent($"s")) == 0.5)
  }

  test("E2 gcContent of empty string is NaN (IEEE 0/0 under Spark 4 ANSI) — matches Polars") {
    val r = one("", gcContent($"s"))
    assert(r.isInstanceOf[Double] && r.asInstanceOf[Double].isNaN)
  }

  test("E3 nCount counts only literal uppercase N") {
    assert(one("NNnA", nCount($"s")) == 2L)
    assert(one("ACGT", nCount($"s")) == 0L)
  }

  test("E4 seqHash = md5 hexdigest prefix") {
    // hashlib.md5(b"ACGT").hexdigest() == "f1f8f4bf413b16ad135722aa4591043e"
    assert(one("ACGT", seqHash($"s")) == "f1f8f4bf413b16ad135722aa4591043e")
    assert(one("ACGT", seqHash($"s", 8)) == "f1f8f4bf")
  }

  test("E5 codonUsage: stride-3 complete codons, uppercase, N-skip") {
    // "ACGACG" -> ACG x2 -> {ACG: 1.0}
    assert(SeqFunctions.codonUsageImpl("ACGACG") == Map("ACG" -> 1.0))
    // trailing incomplete codon dropped: "ACGAC" -> {ACG: 1.0}
    assert(SeqFunctions.codonUsageImpl("ACGAC") == Map("ACG" -> 1.0))
    // lowercase uppercased BEFORE counting (fastx_parsers.py:35)
    assert(SeqFunctions.codonUsageImpl("acgacg") == Map("ACG" -> 1.0))
    // codon containing N dropped from numerator AND denominator
    assert(SeqFunctions.codonUsageImpl("ACGANG") == Map("ACG" -> 1.0))
    // lowercase n also uppercased to N then dropped
    assert(SeqFunctions.codonUsageImpl("ACGAnG") == Map("ACG" -> 1.0))
    // all-N -> empty map
    assert(SeqFunctions.codonUsageImpl("NNNNNN") == Map.empty[String, Double])
    // len < 3 -> empty map
    assert(SeqFunctions.codonUsageImpl("AC") == Map.empty[String, Double])
    assert(SeqFunctions.codonUsageImpl("") == Map.empty[String, Double])
    // mixed: "ACGTTT" -> {ACG: 0.5, TTT: 0.5}
    assert(SeqFunctions.codonUsageImpl("ACGTTT") == Map("ACG" -> 0.5, "TTT" -> 0.5))
  }

  test("E6 kmerFrequencies: overlapping windows, uppercase, N-skip") {
    // "ACGT" k=3 -> ACG, CGT -> each 0.5
    assert(SeqFunctions.kmerFrequenciesImpl("ACGT", 3) ==
      Map("ACG" -> 0.5, "CGT" -> 0.5))
    // "AAAA" k=3 -> AAA x2 -> {AAA: 1.0}
    assert(SeqFunctions.kmerFrequenciesImpl("AAAA", 3) == Map("AAA" -> 1.0))
    // N windows dropped: "ACGNA" -> windows ACG, CGN, GNA -> {ACG: 1.0}
    assert(SeqFunctions.kmerFrequenciesImpl("ACGNA", 3) == Map("ACG" -> 1.0))
    // len < k -> {}
    assert(SeqFunctions.kmerFrequenciesImpl("AC", 3) == Map.empty[String, Double])
    assert(SeqFunctions.kmerFrequenciesImpl("", 3) == Map.empty[String, Double])
  }

  test("kmerArray/codonArray match the UDF window rules") {
    val r = Seq("ACGTACG").toDF("s")
      .select(kmerArray($"s", 3).as("k"), codonArray($"s").as("c"))
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("ACG", "CGT", "GTA", "TAC", "ACG"))
    assert(r.getSeq[String](1) == Seq("ACG", "TAC")) // stride 3, trailing G dropped
    val short = Seq("AC").toDF("s")
      .select(kmerArray($"s", 3).as("k"), codonArray($"s").as("c")).collect()(0)
    assert(short.getSeq[String](0).isEmpty && short.getSeq[String](1).isEmpty)
  }

  test("map UDF output equals exploded pure-builtin form (q_kmer equivalence)") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"doc_id", upper(regexp_replace($"text", " ", "")).as("s"))
      .limit(50)
    val fromUdf = docs.select($"doc_id", explode(kmerFrequencies($"s", 3)).as(Seq("gram", "freq")))
    val fromExplode = docs
      .select($"doc_id", explode(kmerArray($"s", 3)).as("gram"))
      .filter(!$"gram".contains("N"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("freq", $"cnt".cast("double") /
        sum("cnt").over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .select("doc_id", "gram", "freq")
    assert(fromUdf.exceptAll(fromExplode).isEmpty &&
      fromExplode.exceptAll(fromUdf).isEmpty)
  }

  test("GcAggregator: corpus GC as exact counters, matches per-row expectation") {
    import org.apache.spark.sql.functions.udaf
    val gcUdaf = udaf(graft.functions.GcAggregator)
    val df = Seq("GCGC", "gcgc", "GCTA", "NN").toDF("s")
    val got = df.select(gcUdaf($"s")).collect()(0).getDouble(0)
    // G/C (uppercase only): 4 + 0 + 2 + 0 = 6 over total length 14
    assert(got == 6.0 / 14.0)
    // grouped + distributed: same value regardless of partitioning
    val many = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(upper($"text").as("s"))
    val a = many.repartition(1).select(gcUdaf($"s")).collect()(0).getDouble(0)
    val b = many.repartition(7).select(gcUdaf($"s")).collect()(0).getDouble(0)
    assert(a == b && a > 0)
  }
}

