package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick blocklist kernel pins (round 15): word-boundary
  * semantics, the output-link chain (nested terms firing on one span),
  * the border-free dictionary contract, and agreement with an
  * independent regex reference over generated text.
  */
class AhoCorasickSpec extends SparkSpec {
  import graft.plans.AhoCorasick

  private def counts(terms: Seq[String], text: String): Map[String, Long] = {
    val sorted = terms.sorted
    sorted.zip(new AhoCorasick(sorted.toArray)
      .countAll(UTF8String.fromString(text))).toMap
  }

  test("word boundaries: substrings inside longer words never match") {
    val c = counts(Seq("tab", "table"), "tab table tabs a_tab tab")
    assert(c("tab") == 2L)   // 'tabs' and 'a_tab' are boundary-blocked
    assert(c("table") == 1L)
    // digits and underscore are word chars; punctuation is a boundary
    assert(counts(Seq("x"), "x1 x_ x,x (x)")("x") == 3L)
  }

  test("output-link chain: nested terms all fire on one span") {
    val c = counts(Seq("scan", "slow", "slow scan"), "a slow scan here")
    assert(c == Map("scan" -> 1L, "slow" -> 1L, "slow scan" -> 1L))
    // a term that is a strict SUFFIX of another must fire via the chain
    // even when the longer term's match is boundary-blocked
    val c2 = counts(Seq("can", "scan"), "scan descant")
    assert(c2 == Map("can" -> 0L, "scan" -> 1L)) // 'can' inside both is mid-word
    val c3 = counts(Seq("can", "scan"), "s can scan")
    assert(c3 == Map("can" -> 1L, "scan" -> 1L))
  }

  test("phrases match across spaces; ends of text are boundaries") {
    val c = counts(Seq("the line"), "the line holds the lines the line")
    assert(c("the line") == 2L) // 'the lines' is right-boundary-blocked
  }

  test("bordered terms are rejected at build time") {
    intercept[IllegalArgumentException](new AhoCorasick(Array("aba")))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a a")))
    intercept[IllegalArgumentException](new AhoCorasick(Array("b", "dd")))
    // unsorted / duplicate dictionaries are alignment bugs, not data
    intercept[IllegalArgumentException](new AhoCorasick(Array("b", "a")))
    intercept[IllegalArgumentException](new AhoCorasick(Array("a", "a")))
  }

  test("agrees with an independent java.util.regex \\b reference on generated text") {
    val vocab = Array("slow", "scan", "table", "tab", "dup", "the", "line", "x1")
    val terms = graft.queries.TextQueries.BadwordTerms
    val rng = new scala.util.Random(42)
    val texts = (1 to 200).map { _ =>
      (1 to rng.nextInt(40)).map { _ =>
        if (rng.nextInt(10) == 0) "," + vocab(rng.nextInt(vocab.length))
        else vocab(rng.nextInt(vocab.length))
      }.mkString(" ")
    }
    val ac = new AhoCorasick(terms.sorted.toArray)
    texts.foreach { t =>
      val got = terms.sorted.zip(ac.countAll(UTF8String.fromString(t))).toMap
      terms.foreach { term =>
        val p = java.util.regex.Pattern.compile("\\b" + term + "\\b")
        val m = p.matcher(t)
        var n = 0L
        while (m.find()) n += 1
        assert(got(term) == n, s"term '$term' on '$t': ${got(term)} vs $n")
      }
    }
  }

  test("q_stream_blocklist: two-wave restart equals the batch gate exactly (r15)") {
    val streamed = SparkEntry.queries("q_stream_blocklist")(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_badwords_gate")(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSeq
    try {
      assert(streamed == batch,
        s"the stream must be invisible:\n$streamed\nvs\n$batch")
      // the restart is REAL: the checkpoint committed two micro-batches
      // (one per wave) — a single-wave run would hide the exactly-once
      // property the query exists to pin
      val commits = new java.io.File(
        "target/stream_oracle/sf0.001_blocklist/ckpt/commits").list()
      assert(commits != null && commits.count(!_.startsWith(".")) >= 2,
        s"expected two committed waves, saw: ${Option(commits).map(_.toSeq)}")
    } finally CacheScope.release()
  }

  test("q_badwords_gate: planted arms live on the real fixture") {
    val rows = SparkEntry.queries("q_badwords_gate")(spark, TestSpark.Sf0001)
      .collect()
    try {
      val byKey = rows.map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
      // the boundary trap: 'tab' occurs only inside 'table' → exactly 0
      assert(byKey(("term", "tab")) == ((0L, 0L)))
      // common words and the nested phrase all fire
      assert(byKey(("term", "slow"))._1 > 0L)
      assert(byKey(("term", "slow scan"))._1 > 0L)
      // the chain: every 'slow scan' span also fired 'slow' and 'scan'
      assert(byKey(("term", "slow"))._1 >= byKey(("term", "slow scan"))._1)
      assert(byKey(("term", "scan"))._1 >= byKey(("term", "slow scan"))._1)
      // lang rows: flagged-doc counts are bounded by doc counts and the
      // total match mass equals the term-row mass
      val langMass = rows.filter(_.getString(0) == "lang").map(_.getLong(2)).sum
      val termMass = rows.filter(_.getString(0) == "term").map(_.getLong(2)).sum
      assert(langMass == termMass)
    } finally CacheScope.release()
  }
}
