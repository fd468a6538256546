package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.plans.TextStatsExpressions

/** Pins every field of the native `text_stats` kernel to the columnar
  * derivation it replaced: token count via `split(text, " ")` with
  * empties dropped, ASCII-letter count via regexp_replace length delta,
  * BPE-ish segment count via `regexp_count` of the pre-tokenizer regex,
  * and per-list case-sensitive whole-token stopword hits. The
  * q_quality_score / q_lang_id oracles are the mass cross-check.
  */
class TextStatsSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private val lists = StopwordLists.map(_._2)

  private def columnarRow = {
    val toks = tokens(col("text"))
    Seq(
      length(col("text")).cast("long").as("c_chars"),
      size(toks).cast("long").as("c_tokens"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[a-zA-Z]", ""))).cast("long").as("c_alpha"),
      approxTokenCount(col("text")).as("c_bpeish")) ++
      StopwordLists.zipWithIndex.map { case ((l, ws), i) =>
        stopwordHits(toks, ws).as(s"c_hit_$i")
      }
  }

  private def assertAgree(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
      .select(Seq(col("text"),
        TextStatsExpressions.textStats(col("text"), lists).as("st")) ++ columnarRow: _*)
    df.collect().foreach { r =>
      val st = r.getStruct(1)
      val hits = st.getSeq[Long](4)
      val tag = r.getString(0).take(60).replace("\n", "\\n").replace("\t", "\\t")
      assert(st.getLong(0) === r.getAs[Long]("c_chars"), s"n_chars for '$tag'")
      assert(st.getLong(1) === r.getAs[Long]("c_tokens"), s"n_tokens for '$tag'")
      assert(st.getLong(2) === r.getAs[Long]("c_alpha"), s"n_alpha for '$tag'")
      assert(st.getLong(3) === r.getAs[Long]("c_bpeish"), s"n_bpeish for '$tag'")
      StopwordLists.indices.foreach { i =>
        assert(hits(i) === r.getAs[Long](s"c_hit_$i"), s"hits($i) for '$tag'")
      }
    }
  }

  test("crafted boundary inputs agree field-by-field") {
    assertAgree(Seq(
      "",
      " ",
      "   ",
      "the",                       // exact stopword, one token
      "the the the",               // multiplicity
      "The THE tHe",               // case-sensitive: zero hits
      "the  a   of",               // multi-space runs -> empty tokens dropped
      " leading the trailing ",
      "a1b2c3",                    // letter/digit run alternation
      "abc123 456def",
      "!?;, .. a,b",               // punctuation: one bpeish match per mark
      "tab\tand\nnewline the",     // \t \n are NOT space-token separators
      "word\u000bvt\fff\rcr",      // remaining \s classes inside one token
      "的是了 我不 der und el la le et", // multi-byte stopwords + other languages
      "naïve café déjà vu",        // non-ASCII letters are not [a-zA-Z]
      "y et la le",                // fr/es overlap lists
      "a",
      "der die das und ist",       // full de list
      ("the and of to a " * 50).trim))
  }

  test("generated corpus agrees") {
    val rnd = new scala.util.Random(4242L)
    val frags = Vector("the", "a", "of", "und", "el", "的", "x1", "..", "ab",
      " ", "\t", "\n", "é", "9", "z")
    val texts = Seq.tabulate(400) { _ =>
      (0 until (1 + rnd.nextInt(30))).map(_ => frags(rnd.nextInt(frags.length))).mkString
    }
    assertAgree(texts)
  }

  test("rolling fingerprint kernel agrees with the HOF fold") {
    val texts = Seq(
      "", " ", "the quick brown fox", "a", "ab ba ab",
      "order matters here", "matters order here",   // order-sensitivity
      "x " + ("token " * 100).trim, "的是 了我 不的",
      "naïve é café", "mixed 的ascii tail的", "1 22 333 4444",
      "punct, and. stuff!", "  spaced   out  ")
    val df = texts.toDF("text").select(
      graft.plans.TextStatsExpressions.rollingFingerprint(col("text")).as("native"),
      rollingFingerprint(col("text")).as("columnar"), col("text"))
    df.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1), s"for '${r.getString(2).take(50)}'")
    }
    val docs = Tables.t(spark, TestSpark.Sf0001, "documents").select("text")
    val mism = docs.select(
      graft.plans.TextStatsExpressions.rollingFingerprint(col("text")).as("n"),
      rollingFingerprint(col("text")).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(mism === 0L)
  }

  test("token_rep_stats kernel agrees with the explode + double-agg shape") {
    val texts = Seq("", " ", "a", "a a", "a b a b a", "the the the x",
      "的 的 是", "one", "  double  spaced  dup  dup  ",
      ("rep " * 80).trim + " tail")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val viaKernel = df
      .select(col("doc_id"),
        graft.plans.TextStatsExpressions.tokenRepStats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_tokens"), col("st.n_distinct"), col("st.top_tf"))
      .filter(col("n_tokens") > 0)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val viaExplode = df
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"), count(lit(1)).as("n_distinct"), max("tf").as("top_tf"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(viaKernel === viaExplode)
    // zero-token docs are absent from BOTH shapes
    assert(!viaKernel.contains(0L) && !viaKernel.contains(1L))
  }

  test("chunk_texts kernel agrees with the slice + concat_ws shape") {
    val C = 32
    val S = 24
    val texts = Seq("", " ", "one", "a b", ("w" + " w" * 23),   // exactly S tokens
      ("t " * 32).trim, ("t " * 33).trim,                       // C and C+1 tokens
      ("x " * 100).trim, "的 是 了 " * 20,
      "  padded   with  runs  " + ("tok " * 60).trim)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def collectChunks(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val viaKernel = collectChunks(df
      .select(col("doc_id"), graft.plans.TextStatsExpressions
        .chunkTexts(col("text"), C, S).as("st"))
      .filter(col("st").getField("n_tokens") > 0)
      .select(col("doc_id"),
        posexplode(col("st").getField("chunks")).as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long"), col("chunk_text")))
    val viaSlice = collectChunks(df
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("last_start",
        call_function("div", col("n") - lit(1L), lit(S.toLong)) * lit(S.toLong))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), col("last_start"), lit(S.toLong)),
          start => concat_ws(" ", slice(col("toks"), (start + 1).cast("int"), lit(C)))))
          .as(Seq("chunk_id", "chunk_text")))
      .select(col("doc_id"), col("chunk_id").cast("long"), col("chunk_text")))
    assert(viaKernel === viaSlice)
  }

  test("sf0.001 documents corpus agrees end-to-end") {
    val docs = Tables.t(spark, TestSpark.Sf0001, "documents").select("text")
    val rows = docs
      .select(Seq(col("text"),
        TextStatsExpressions.textStats(col("text"), lists).as("st")) ++ columnarRow: _*)
      .collect()
    rows.foreach { r =>
      val st = r.getStruct(1)
      assert(st.getLong(0) === r.getAs[Long]("c_chars"))
      assert(st.getLong(1) === r.getAs[Long]("c_tokens"))
      assert(st.getLong(2) === r.getAs[Long]("c_alpha"))
      assert(st.getLong(3) === r.getAs[Long]("c_bpeish"))
      val hits = st.getSeq[Long](4)
      StopwordLists.indices.foreach(i => assert(hits(i) === r.getAs[Long](s"c_hit_$i")))
    }
  }
}
