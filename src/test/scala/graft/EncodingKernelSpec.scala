package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

/** Pins the fix_encoding mojibake kernel against an INDEPENDENT reference
  * implementation (inverse map built from Java's own windows-1252 charset
  * forward decode; UTF-8 validity checked by round-trip, not by the
  * kernel's hand-rolled validator) on crafted hazards and generated
  * corpora, plus per-rule value pins. Mojibake strings are constructed
  * FROM BYTES (`moji(...)` = how the corruption actually happens: these
  * bytes decoded with windows-1252) so the test source stays unambiguous.
  */
class EncodingKernelSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  /** The corruption generator itself: UTF-8 bytes read as SLOPPY
    * windows-1252 (Java's charset decodes the five undefined bytes
    * 0x81/8D/8F/90/9D to U+FFFD; sloppy decoders — what lenient
    * real-world readers and ftfy's model use — pass them through as C1
    * controls, which is the mojibake shape the kernel repairs). */
  private def moji(bytes: Int*): String =
    bytes.map { b =>
      val d = new String(Array(b.toByte), "windows-1252").charAt(0)
      if (d == '\uFFFD') b.toChar else d
    }.mkString

  /** Reference: independent construction of the same semantics. */
  private object Ref {
    // inverse sloppy-cp1252 from Java's forward decode, with the five
    // bytes Java maps to U+FFFD passed through as C1 controls (sloppy)
    private val inv: Map[Char, Int] =
      (0x80 to 0xff).map { b =>
        val d = new String(Array(b.toByte), "windows-1252").charAt(0)
        (if (d == '\uFFFD') b.toChar else d) -> b
      }.toMap

    private def validUtf8Multi(bytes: Array[Byte]): Boolean = {
      val d = new String(bytes, StandardCharsets.UTF_8)
      java.util.Arrays.equals(d.getBytes(StandardCharsets.UTF_8), bytes) &&
        d.exists(_ >= 0x80)
    }

    def fix(t: String): (String, Long) = {
      val out = new StringBuilder
      var runs = 0L
      var i = 0
      while (i < t.length) {
        if (t.charAt(i) < 0x80) { out.append(t.charAt(i)); i += 1 }
        else {
          val start = i
          val bytes = new scala.collection.mutable.ArrayBuffer[Byte]
          while (i < t.length && t.charAt(i) >= 0x80 && inv.contains(t.charAt(i))) {
            bytes += inv(t.charAt(i)).toByte
            i += 1
          }
          if (bytes.nonEmpty && validUtf8Multi(bytes.toArray)) {
            out.append(new String(bytes.toArray, StandardCharsets.UTF_8))
            runs += 1
          } else out.append(t.substring(start, i))
          if (i < t.length && t.charAt(i) >= 0x80 && !inv.contains(t.charAt(i))) {
            out.append(t.charAt(i)); i += 1
          }
        }
      }
      (out.toString, runs)
    }
  }

  private def kernel(t: String): (String, Long) = {
    val r = Seq(t).toDF("t")
      .select(graft.plans.EncodingExpressions.fixEncoding(col("t")).as("f"))
      .select("f.fixed", "f.n_runs").head()
    (r.getString(0), r.getLong(1))
  }

  test("value pins: each corruption class") {
    // é (C3 A9) through the corruption → repaired back
    assert(kernel("caf" + moji(0xC3, 0xA9)) == ("café", 1L))
    // real é untouched (a lone Latin-1 letter is not valid UTF-8)
    assert(kernel("aéb") == ("aéb", 0L))
    // curly quotes: E2 80 9C / E2 80 9D — the 9D arm exercises the
    // SLOPPY mapping (CP1252 leaves 0x9D unmapped → U+009D control)
    assert(kernel(moji(0xE2, 0x80, 0x9C) + "q" + moji(0xE2, 0x80, 0x9D)) ==
      ("“q”", 2L))
    // em dash E2 80 94
    assert(kernel("x " + moji(0xE2, 0x80, 0x94) + " y") == ("x — y", 1L))
    // 4-byte sequence: corrupted emoji F0 9F 98 80
    assert(kernel(moji(0xF0, 0x9F, 0x98, 0x80)) == ("😀", 1L))
    // truncated lead at run end: untouched
    assert(kernel("caf" + moji(0xC3)) == ("caf" + moji(0xC3), 0L))
    // lone continuation-range char (€ = byte 0x80): untouched
    assert(kernel("a€b") == ("a€b", 0L))
    // invalid interior (lead follows lead): whole run untouched
    assert(kernel(moji(0xC3, 0xC3, 0xA9)) == (moji(0xC3, 0xC3, 0xA9), 0L))
    // unmappable char (☃) breaks runs but passes through; both sides fix
    assert(kernel(moji(0xC3, 0xA9) + "☃" + moji(0xC3, 0xA9)) ==
      ("é☃é", 2L))
    // overlong encoding (C0 80) must NOT decode
    assert(kernel(moji(0xC0, 0x80)) == (moji(0xC0, 0x80), 0L))
    // CESU-8/surrogate bytes (ED A0 80) must NOT decode
    assert(kernel(moji(0xED, 0xA0, 0x80)) == (moji(0xED, 0xA0, 0x80), 0L))
    // double mojibake (é corrupted twice = C3 83 C2 A9): one pass peels
    // exactly one layer, leaving single mojibake
    assert(kernel(moji(0xC3, 0x83, 0xC2, 0xA9)) == (moji(0xC3, 0xA9), 1L))
    assert(kernel("") == ("", 0L))
    assert(kernel("all ascii") == ("all ascii", 0L))
  }

  test("kernel ≡ independent reference on crafted corpus") {
    val crafted = Seq(
      "caf" + moji(0xC3, 0xA9) + " menu", "aéb plain",
      moji(0xC3), moji(0xA9), moji(0x80), moji(0x9D),
      moji(0xE2, 0x80, 0x9C) + "x" + moji(0xE2, 0x80, 0x9D) + " and " +
        moji(0xE2, 0x80, 0x94),
      "na" + moji(0xC3, 0xAF) + "ve r" + moji(0xC3, 0xA9) + "sum" + moji(0xC3, 0xA9),
      moji(0xF0, 0x9F, 0x98, 0x80) + " emoji", "☃ snowman",
      "mixed " + moji(0xC3, 0xA9) + "☃" + moji(0xC3, 0xA9) + " ends",
      moji(0xC0, 0x80) + " overlong", moji(0xED, 0xA0, 0x80) + " surrogate",
      "run at end " + moji(0xC3, 0xA9), moji(0xC3, 0xA9) + " run at start",
      "all ascii stays byte identical", "",
      moji(0xC3, 0x83, 0xC2, 0xA9) + " double",
      moji(0xF4, 0x90, 0x80, 0x80) + " beyond max codepoint")
    crafted.foreach { t =>
      assert(kernel(t) == Ref.fix(t), s"diverged on: $t")
    }
  }

  test("kernel ≡ independent reference on generated corpus") {
    // pseudo-random char soup over the interesting ranges, deterministic
    val alphabet: IndexedSeq[Char] =
      (('a' to 'f') ++ (0x80 to 0xff).map(_.toChar) ++
        "€“”—œ☃Ÿ˜").toIndexedSeq
    var seed = 12345L
    def next(n: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % n).toInt + n) % n
    }
    val gen = (0 until 500).map { _ =>
      (0 until next(24)).map(_ => alphabet(next(alphabet.length))).mkString
    }
    val rows = gen.toDF("t")
      .select(col("t"), graft.plans.EncodingExpressions.fixEncoding(col("t")).as("f"))
      .select(col("t"), col("f.fixed"), col("f.n_runs"))
      .as[(String, String, Long)].collect()
    rows.foreach { case (t, fx, nr) =>
      val (rf, rr) = Ref.fix(t)
      assert(fx == rf && nr == rr,
        s"diverged on: ${t.map(c => f"\\u${c.toInt}%04X").mkString}")
    }
  }

  test("fix_encoding SQL function ≡ kernel Column API") {
    GraftExtensions.register(spark)
    Seq("caf" + moji(0xC3, 0xA9)).toDF("t").createOrReplaceTempView("enc_ext")
    val r = spark.sql("SELECT fix_encoding(t).fixed FROM enc_ext").head().getString(0)
    assert(r == "café")
  }
}
