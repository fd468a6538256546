package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.{StringDistance, StringDistanceExpressions}

/** Pins the unrestricted Damerau–Levenshtein kernel to values verified
  * against DuckDB's `damerau_levenshtein` (the oracle engine), plus the
  * algebraic properties a distance must satisfy. The q_entity_match oracle
  * run is the mass cross-check; these are the adversarial cases.
  */
class StringDistanceSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    StringDistance.damerau(UTF8String.fromString(a), UTF8String.fromString(b))

  test("unrestricted DL: DuckDB-verified pins") {
    // DL("CA","ABC") = 2 distinguishes unrestricted DL from the OSA
    // variant (which gives 3) — verified against DuckDB
    assert(dl("CA", "ABC") === 2)
    assert(dl("abcd", "acbd") === 1) // adjacent transposition
    assert(dl("ab", "ba") === 1)
    assert(dl("abc", "ca") === 2)
    assert(dl("abcdef", "") === 6)
    assert(dl("", "xyz") === 3)
    assert(dl("same", "same") === 0)
    assert(dl("kitten", "sitting") === 3) // classic Levenshtein case
    assert(dl("Customer#000000012", "Customer#000000021") === 1) // digit swap
  }

  test("metric properties on a sample grid") {
    val words = Seq("", "a", "ab", "ba", "abc", "acb", "bca", "abcd", "badc", "xyz")
    for (x <- words; y <- words) {
      assert(dl(x, y) === dl(y, x), s"symmetry failed for ($x,$y)")
      assert((dl(x, y) == 0) === (x == y), s"identity failed for ($x,$y)")
      for (z <- words)
        assert(dl(x, z) <= dl(x, y) + dl(y, z), s"triangle failed for ($x,$y,$z)")
    }
  }

  test("DL is bounded above by plain Levenshtein (transpositions only help)") {
    val spark2 = spark
    import spark2.implicits._
    val pairs = Seq(("abcdef", "abdcfe"), ("Customer#000000123", "Customer#00000012X"),
      ("hello world", "hella wolrd"), ("", "ab"), ("transpose", "trasnpoes"))
    val df = pairs.toDF("a", "b").select(
      StringDistanceExpressions.damerauLevenshtein(col("a"), col("b")).as("dl"),
      levenshtein(col("a"), col("b")).as("lev"))
    df.collect().foreach { r =>
      assert(r.getInt(0) <= r.getInt(1), s"DL ${r.getInt(0)} > Lev ${r.getInt(1)}")
    }
  }

  test("SQL registration + codegen path") {
    StringDistanceExpressions.register(spark)
    val spark2 = spark
    import spark2.implicits._
    Seq(("CA", "ABC")).toDF("a", "b").createOrReplaceTempView("sd_pairs")
    val out = spark.sql(
      "SELECT damerau_levenshtein(a, b) AS d FROM sd_pairs").collect()
    assert(out.head.getInt(0) === 2)
    // null propagation
    val nulls = spark.sql(
      "SELECT damerau_levenshtein(CAST(NULL AS STRING), 'x') AS d").collect()
    assert(nulls.head.isNullAt(0))
  }
}
