package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native string-distance expression for the entity-resolution surface.
  *
  * Unrestricted Damerau–Levenshtein (Lowrance–Wagner): edit distance with
  * insert / delete / substitute / adjacent-transposition, where a
  * transposed pair may be further edited between its two characters —
  * DL("CA","ABC") = 2, not the OSA variant's 3. This matches DuckDB's
  * `damerau_levenshtein`, which is what lets the entity-match query run
  * under the exact-integer oracle gate.
  *
  * Spark itself ships only plain `levenshtein`; transposition support is
  * what makes the distance usable for typo-class entity resolution (the
  * most common human keying error is an adjacent swap, which plain
  * Levenshtein charges 2 for).
  *
  * Byte-wise on UTF-8 (the corpus is ASCII; for multi-byte text the
  * distance is over bytes, not codepoints — documented, deterministic).
  * Codegen: the generated code calls the static kernel directly inside
  * whole-stage codegen — no ScalaUDF wrapper, no encoder round-trip.
  */
object StringDistance {

  /** Lowrance–Wagner full Damerau–Levenshtein over bytes. O(m·n) time,
    * O(m·n) space — intended for bounded-length keys (names, titles, IDs)
    * AFTER candidate blocking, never as an all-pairs primitive. */
  def damerau(a: UTF8String, b: UTF8String): Int = {
    val s = a.getBytes
    val t = b.getBytes
    val m = s.length
    val n = t.length
    if (m == 0) return n
    if (n == 0) return m
    // Flat (m+2)×(n+2) matrix, row-major — one allocation, no inner-array
    // pointer chasing: this kernel runs once per blocked candidate pair,
    // millions of times per partition.
    val w = n + 2
    val inf = m + n
    val d = new Array[Int]((m + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= m) { d((i + 1) * w + 1) = i; d((i + 1) * w) = inf; i += 1 }
    var j = 0
    while (j <= n) { d(w + j + 1) = j; d(j + 1) = inf; j += 1 }
    val da = new Array[Int](256) // last row index where each byte occurred in s
    i = 1
    while (i <= m) {
      val si = s(i - 1)
      val row = (i + 1) * w
      val prev = i * w
      var db = 0
      j = 1
      while (j <= n) {
        val tj = t(j - 1)
        val k = da(tj & 0xFF)
        val l = db
        var cost = 1
        if (si == tj) { cost = 0; db = j }
        val sub = d(prev + j) + cost
        val ins = d(row + j) + 1
        val del = d(prev + j + 1) + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (tra < best) best = tra
        d(row + j + 1) = best
        j += 1
      }
      da(si & 0xFF) = i
      i += 1
    }
    d((m + 1) * w + n + 1)
  }
}

/** `damerau_levenshtein(left, right)` as a codegen'd Catalyst expression. */
case class DamerauLevenshteinExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistance.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.StringDistance.damerau($a, $b)")
  override def prettyName: String = "damerau_levenshtein"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringDistanceExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def damerauLevenshtein(a: Column, b: Column): Column =
    column(DamerauLevenshteinExpr(expression(a), expression(b)))

  /** SQL registration: `SELECT damerau_levenshtein(a, b)`. */
  /** Delegates to the shared [[graft.GraftExtensions]] function table —
    * see the SeqExpressions.register note. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftExtensions.register(spark)
}
