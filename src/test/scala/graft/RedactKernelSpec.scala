package graft

import org.apache.spark.sql.functions._
import graft.plans.RedactExpressions

/** Pins the native `pii_redact` byte-scanner kernel to the
  * java.util.regex reference implementation [[graft.operators.Redact]]:
  * identical per-class counts AND byte-identical redacted output on
  * corpora crafted to exercise every backtracking / resume-position
  * branch of the three patterns, plus generated pseudo-random strings
  * over a class-char-dense alphabet. The q_pii_redact DuckDB oracle is
  * the mass cross-check at both SFs.
  */
class RedactKernelSpec extends SparkSpec {
  private val ss = TestSpark.spark
  import ss.implicits._

  private def assertAgree(texts: Seq[String]): Unit = {
    val base = texts.toDF("text")
    val ref = graft.operators.Redact.scrub(base, "text")
      .select(col("text"), col("n_emails").as("r_emails"),
        col("n_phones").as("r_phones"), col("n_ids").as("r_ids"),
        col("redacted").as("r_red"))
    val out = ref.withColumn("k", RedactExpressions.piiRedact(col("text")))
    out.collect().foreach { r =>
      val k = r.getStruct(r.fieldIndex("k"))
      val tag = r.getString(0).take(70).replace("\n", "\\n")
      assert(k.getLong(0) === r.getAs[Long]("r_emails"), s"n_emails for '$tag'")
      assert(k.getLong(1) === r.getAs[Long]("r_phones"), s"n_phones for '$tag'")
      assert(k.getLong(2) === r.getAs[Long]("r_ids"), s"n_ids for '$tag'")
      assert(k.getString(3) === r.getAs[String]("r_red"), s"redacted for '$tag'")
    }
  }

  test("crafted email backtracking and resume-position cases") {
    assertAgree(Seq(
      "",
      "no pii here at all",
      "a@b.co",                          // minimal match
      "a@b.c",                           // 1-letter TLD: no match
      "a@b.",                            // dot, no TLD
      "a@b",                             // no dot
      "@a@b.co",                         // start at '@' fails, next start matches
      "a@@b.co",                         // empty domain, resume after '@'
      "x@b_c@d.com",                     // email starting inside a failed domain
      "a@b.c@d.com",                     // failed dot-TLD, email begins in domain run
      "a@b.com.",                        // trailing dot excluded (backtrack)
      "a@b.co1x",                        // TLD stops at the digit
      "a@b.co.uk extra",                 // multi-dot domain, largest dot wins
      "a@b-c.co",                        // hyphenated domain
      "a.b_c%d+e-f@g.com",               // full local class
      "prefix a@b.com suffix c@d.org",   // two matches, non-overlap
      "a@b.coma@c.com",                  // greedy TLD eats letters incl. next local
      "aaaa@",                           // local run, @ at end
      "....@....",                       // dots both sides, no letters
      "%@x.yz",                          // % only in local class
      "a@1.23 a@1.ab",                   // digit TLD fails; letter TLD matches
      "üser@b.com",                      // multi-byte prefix, email starts after
      "日本語a@b.com語"))                 // multi-byte both sides
  }

  test("crafted phone and long-digit cases") {
    assertAgree(Seq(
      "555-123-4567",
      "+555-123-4567",
      "++555-123-4567",                  // second '+' starts the match
      "5555-123-4567",                   // leading extra digit shifts the match
      "555-123-45678",                   // trailing digit is NOT part (fixed {4})
      "555-123-456",                     // too short
      "x555-123-4567y",
      "+a555-123-4567",                  // '+' then non-digit: fresh start inside
      "555-123-4567-890-1234",           // overlap: second candidate inside first
      "123456789",                       // exactly 9 digits
      "12345678",                        // 8: below threshold
      "1234567890123",                   // long run, one <ID>
      "12345678 123456789 1234567890",   // mixed runs
      "call 555-000-1111 acct 999888777",
      "id 123456789123456789123456789",
      "9.123456789.9"))                  // run delimited by dots
  }

  test("class cascade: earlier redactions change later classes") {
    assertAgree(Seq(
      // the email hides a phone and a digit run from later passes
      "555-123-4567@example.com",
      "123456789@example.com",
      // phone digits never reach the id pass
      "555-123-4567 and 4567-123-4567",
      // email replacement creates no phone/id (tokens are letter-only)
      "a@b.com555-123-4567",             // phone immediately after an email
      "a@b.com123456789"))               // 9 digits after the greedy TLD
  }

  test("generated class-char-dense corpus agrees end-to-end") {
    // deterministic LCG over an alphabet dense in class chars so emails,
    // phones and digit runs arise by chance in every shape
    val alphabet = "ab1@.-+_% 9@@..--cd23456789ABZ\tz"
    var seed = 0x9e3779b97f4a7c15L
    val texts = (0 until 400).map { _ =>
      val len = ((seed >>> 40) % 120).toInt.abs
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        seed = seed * 6364136223846793005L + 1442695040888963407L
        sb.append(alphabet(((seed >>> 33) % alphabet.length).toInt))
      }
      seed = seed * 6364136223846793005L + 1442695040888963407L
      sb.toString
    }
    assertAgree(texts)
  }

  test("sf0.001 documents with injected pii agree end-to-end") {
    val docs = Tables.t(ss, "/root/testdata/sf0.001", "documents")
      .select(concat(col("text"), lit(" u"), col("doc_id").cast("string"),
        lit("@ex.co call 555-123-4567 acct 987654321")).as("text"))
    assertAgree(docs.collect().map(_.getString(0)).toSeq)
  }
}
