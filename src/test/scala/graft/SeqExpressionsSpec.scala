package graft

import org.apache.spark.sql.functions._
import graft.functions.SeqFunctions
import graft.plans.SeqExpressions

/** The native codegen expressions must agree exactly with the reference
  * UDF implementations on every input class, stay inside whole-stage
  * codegen, and be callable from SQL after registration.
  */
class SeqExpressionsSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private val cases = Seq(
    "", "A", "AC", "ACG", "ACGT", "ACGACG", "ACGAC", "acgacg", "ACGANG",
    "ACGAnG", "NNNNNN", "AAAA", "ACGNA", "ACGTACGT", "aCgTnNaCgT",
    "the quick brown fox", "ACGT" * 100)

  test("native kmer_frequencies equals UDF implementation on all cases") {
    val df = cases.toDF("s")
    val both = df.select(
      col("s"),
      SeqExpressions.kmerFrequenciesNative(col("s"), 3).as("native"),
      SeqFunctions.kmerFrequencies(col("s"), 3).as("udf"))
      .collect()
    both.foreach { r =>
      assert(r.getMap[String, Double](1) == r.getMap[String, Double](2),
        s"mismatch for '${r.getString(0)}'")
    }
  }

  test("native codon_usage equals UDF implementation on all cases") {
    val df = cases.toDF("s")
    val both = df.select(
      col("s"),
      SeqExpressions.codonUsageNative(col("s")).as("native"),
      SeqFunctions.codonUsage(col("s")).as("udf"))
      .collect()
    both.foreach { r =>
      assert(r.getMap[String, Double](1) == r.getMap[String, Double](2),
        s"mismatch for '${r.getString(0)}'")
    }
  }

  test("null input yields null") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(SeqExpressions.kmerFrequenciesNative(col("s"), 3)).collect()(0)
    assert(r.isNullAt(0))
  }

  test("native expression runs inside WholeStageCodegen (no UDF wrapper)") {
    // parquet-backed source so the projection isn't constant-folded away
    val df = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(SeqExpressions.kmerFrequenciesNative(upper(col("text")), 3).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators inside a WholeStageCodegen span
    assert(plan.contains("*(1) Project [kmer_frequencies"), s"no codegen span:\n$plan")
    assert(!plan.contains("UDF"), s"udf wrapper present:\n$plan")
    assert(df.count() == 500) // and it executes
  }

  test("SQL registration: kmer_frequencies/codon_usage callable from SQL") {
    SeqExpressions.register(spark)
    val m = spark.sql("SELECT kmer_frequencies('ACGT', 3) AS m, codon_usage('ACGTTT') AS c")
      .collect()(0)
    assert(m.getMap[String, Double](0) == Map("ACG" -> 0.5, "CGT" -> 0.5))
    assert(m.getMap[String, Double](1) == Map("ACG" -> 0.5, "TTT" -> 0.5))
  }

  test("wide-k (k > 8) path equals UDF implementation and is SQL-callable") {
    // the packed-Long kernel caps at 8 bytes; k=9 and genomics k=31 must
    // route to the String-keyed fallback with identical window semantics
    val wide = cases ++ Seq("ACGTACGTACGTACGTACGTACGTACGTACGTACGT",
      "acgtnACGTNacgtn" * 5, ("ACGT" * 10) + "N" + ("TGCA" * 10))
    Seq(9, 31).foreach { k =>
      val both = wide.toDF("s").select(
        col("s"),
        SeqExpressions.kmerFrequenciesNative(col("s"), k).as("native"),
        SeqFunctions.kmerFrequencies(col("s"), k).as("udf"))
        .collect()
      both.foreach { r =>
        assert(r.getMap[String, Double](1) == r.getMap[String, Double](2),
          s"k=$k mismatch for '${r.getString(0).take(40)}'")
      }
    }
    SeqExpressions.register(spark)
    val m = spark.sql("SELECT kmer_frequencies('AAAAAAAAAAC', 10) AS m").collect()(0)
    assert(m.getMap[String, Double](0) ==
      Map("AAAAAAAAAA" -> 0.5, "AAAAAAAAAC" -> 0.5))
    // k <= 0 matches the UDF reference: empty map, not n+1 empty windows
    val z = Seq("ACGT").toDF("s").select(
      SeqExpressions.kmerFrequenciesNative(col("s"), 0).as("n"),
      SeqFunctions.kmerFrequencies(col("s"), 0).as("u")).collect()(0)
    assert(z.getMap[String, Double](0).isEmpty && z.getMap[String, Double](1).isEmpty)
  }

  test("kmer_enc wide path equals the columnar derivation at k = 9") {
    val df = (cases :+ ("ACGT" * 25)).toDF("s").select(
      SeqExpressions.kmerEnc(col("s"), 9, 1).as("e"),
      SeqExpressions.windowCounts(col("s"), 9, 1).as("counts"))
      .select(col("e"),
        size(col("counts")).cast("long").as("c_n"),
        aggregate(map_values(col("counts")), lit(0L), (acc, x) => acc + x).as("c_total"),
        concat_ws(",", transform(array_sort(map_entries(col("counts"))),
          e => concat(e.getField("key"), lit("="), e.getField("value").cast("string"))))
          .as("c_enc"))
    df.collect().foreach { r =>
      val e = r.getStruct(0)
      assert(e.getLong(0) === r.getAs[Long]("c_n"))
      assert(e.getLong(1) === r.getAs[Long]("c_total"))
      assert(e.getString(2) === r.getAs[String]("c_enc"))
    }
  }

  test("packed sentinel key: a 0x80 00×7 window at k=8 counts correctly") {
    import org.apache.spark.unsafe.types.UTF8String
    // bytes [0x80, 0,0,0,0,0,0,0] pack exactly to Long.MinValue — the
    // PackedCounts slot sentinel; repeated occurrences must count, not
    // inflate size or vanish (pre-fix: inserted into "empty" slots forever)
    val hostile = Array.fill(2)(Array[Byte](0x80.toByte, 0, 0, 0, 0, 0, 0, 0)).flatten
    val s = UTF8String.fromBytes(hostile)
    def toMap(md: org.apache.spark.sql.catalyst.util.MapData): Map[Seq[Byte], Long] = {
      val ks = md.keyArray(); val vs = md.valueArray()
      (0 until md.numElements()).map(i =>
        ks.getUTF8String(i).getBytes.toSeq -> vs.getLong(i)).toMap
    }
    val packed = toMap(graft.plans.SeqWindowFreq.computeCounts(s, 8, 1))
    // wide fallback is sentinel-free: pin packed ≡ wide on the hostile bytes
    val (wideM, wideTotal) = graft.plans.SeqWindowFreq.scanWide(s, 8, 1)
    val wide = {
      val it = wideM.entrySet().iterator()
      val b = Map.newBuilder[Seq[Byte], Long]
      while (it.hasNext) { val e = it.next(); b += e.getKey.getBytes.toSeq -> e.getValue()(0) }
      b.result()
    }
    assert(packed == wide, s"packed=$packed wide=$wide")
    assert(packed(Array[Byte](0x80.toByte, 0, 0, 0, 0, 0, 0, 0).toSeq) === 2L)
    assert(packed.values.sum === wideTotal)
    assert(packed.size === 8) // MinValue window ×2 + 7 distinct shifts ×1
  }

  test("packed and wide scans agree for every k ≤ 8 on all cases") {
    import org.apache.spark.unsafe.types.UTF8String
    for (k <- 1 to 8; s <- cases; step <- Seq(1, k)) {
      val u = UTF8String.fromString(s)
      val packed = graft.plans.SeqWindowFreq.computeCounts(u, k, step)
      val pm = (0 until packed.numElements()).map(i =>
        packed.keyArray().getUTF8String(i).toString ->
          packed.valueArray().getLong(i)).toMap
      val (wm, _) = graft.plans.SeqWindowFreq.scanWide(u, k, step)
      val wmap = {
        val it = wm.entrySet().iterator()
        val b = Map.newBuilder[String, Long]
        while (it.hasNext) { val e = it.next(); b += e.getKey.toString -> e.getValue()(0) }
        b.result()
      }
      assert(pm == wmap, s"k=$k step=$step '$s'")
    }
  }

  test("minimizer_counts kernel ≡ an independent naive reference") {
    // naive O(P·w) char-level reference (the kernel is byte-level with a
    // monotonic deque; ASCII inputs make them comparable)
    def ref(s: String, k: Int, w: Int): Map[String, Long] = {
      val u = s.map(c => if (c >= 'a' && c <= 'z') (c - 32).toChar else c)
      val p = u.length - k + 1
      if (p < w) Map.empty
      else {
        val grams = (0 until p).map(i => u.substring(i, i + k))
        (0 to p - w).flatMap { j =>
          val cand = (j until j + w).map(grams).filterNot(_.contains('N'))
          if (cand.isEmpty) None else Some(cand.min)
        }.groupBy(identity).map { case (g, v) => g -> v.size.toLong }
      }
    }
    var seed = 0x9e3779b97f4a7c15L
    val gen = (0 until 300).map { _ =>
      // advance the PRNG OUTSIDE the char loop too: a zero-length draw
      // must not freeze the stream (review r10: 262/300 empty strings)
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val n = ((seed >>> 40) % 60).toInt.abs
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append("ACGTNacgtn AA".charAt(((seed >>> 33) % 13).toInt))
      }
      sb.toString
    }
    // k ≤ 8 rides the packed-Long deque; k = 15 / 31 (minimap2 and
    // assembler regimes, VERDICT r10 item 2) exercise the wide byte-compare
    // path — same naive reference for both
    for (s <- cases ++ gen;
         (k, w) <- Seq((5, 4), (3, 1), (2, 6), (8, 3),
           (15, 4), (15, 1), (31, 5), (12, 8))) {
      val got = {
        val md = graft.plans.MinimizerOps.computeCounts(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), k, w)
        (0 until md.numElements()).map(i =>
          md.keyArray().getUTF8String(i).toString ->
            md.valueArray().getLong(i)).toMap
      }
      assert(got == ref(s, k, w), s"k=$k w=$w '$s'")
    }
  }

  test("kmer_enc kernel equals the columnar sort+encode derivation") {
    // the chain q_kmer_map ran before the KmerEnc kernel: size + aggregate
    // total + concat_ws over array_sort'ed map entries
    def columnar(counts: org.apache.spark.sql.Column) = Seq(
      size(counts).cast("long").as("c_n"),
      aggregate(map_values(counts), lit(0L), (acc, x) => acc + x).as("c_total"),
      concat_ws(",", transform(array_sort(map_entries(counts)),
        e => concat(e.getField("key"), lit("="), e.getField("value").cast("string"))))
        .as("c_enc"))
    var seed = 0xd1b54a32d192ed03L
    val gen = (0 until 200).map { _ =>
      // advance OUTSIDE the char loop too (see the minimizer test note)
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val n = ((seed >>> 40) % 40).toInt.abs
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append("ACGTNacgtn x".charAt(((seed >>> 33) % 12).toInt))
      }
      sb.toString
    }
    val docs = Tables.t(TestSpark.spark, TestSpark.Sf0001, "documents")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    Seq((3, 1), (3, 3), (2, 1), (5, 1)).foreach { case (k, step) =>
      val df = (cases ++ gen ++ docs).toDF("s")
        .select(Seq(col("s"),
          SeqExpressions.kmerEnc(col("s"), k, step).as("e")) ++
          columnar(SeqExpressions.windowCounts(col("s"), k, step)): _*)
      df.collect().foreach { r =>
        val e = r.getStruct(1)
        val tag = s"k=$k step=$step '${r.getString(0).take(40)}'"
        assert(e.getLong(0) === r.getAs[Long]("c_n"), s"n_kmers $tag")
        assert(e.getLong(1) === r.getAs[Long]("c_total"), s"total $tag")
        assert(e.getString(2) === r.getAs[String]("c_enc"), s"enc $tag")
      }
    }
  }

  test("window_dust_stats ≡ exploded count-map Σ c(c−1)/2 derivation") {
    val docs = Tables.t(TestSpark.spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), upper(replace(col("text"), lit(" "), lit(""))).as("u"))
    val fused = docs.select(col("doc_id"),
        SeqExpressions.windowDustStats(col("u"), 3, 1).as("ds"))
      .select(col("doc_id"), col("ds.dust_num").as("num_k"), col("ds.total").as("tot_k"))
    val exploded = docs.select(col("doc_id"),
        SeqExpressions.windowCountsTotal(col("u"), 3, 1).as("ct"))
      .select(col("doc_id"), explode_outer(col("ct.counts")).as(Seq("gram", "cnt")),
        col("ct.total").as("total"))
      .groupBy("doc_id")
      .agg(coalesce(sum(expr("cnt * (cnt - 1) div 2")), lit(0L)).as("num_c"),
        coalesce(max(col("total")), lit(0L)).as("tot_c"))
    val bad = fused.join(exploded, Seq("doc_id"))
      .where(col("num_k") =!= col("num_c") || col("tot_k") =!= col("tot_c")).count()
    assert(bad === 0)
    // crafted: empty, all-N (nothing kept), single window, heavy repeat
    val crafted = Seq("", "NNNNN", "ACG", "AAAAAAA").toDF("u")
      .select(SeqExpressions.windowDustStats(col("u"), 3, 1).as("ds"))
      .select(col("ds.dust_num"), col("ds.total")).collect()
    assert(crafted(0).getLong(0) === 0L && crafted(0).getLong(1) === 0L)
    assert(crafted(1).getLong(0) === 0L && crafted(1).getLong(1) === 0L)
    assert(crafted(2).getLong(0) === 0L && crafted(2).getLong(1) === 1L)
    // "AAAAAAA": 5 windows of AAA → c=5 → 5*4/2 = 10
    assert(crafted(3).getLong(0) === 10L && crafted(3).getLong(1) === 5L)
  }

  test("GraftExtensions injects the native functions without error") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(exts)   // builder registration must not throw
  }
}
