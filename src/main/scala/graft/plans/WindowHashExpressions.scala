package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native overlapping-window fingerprint kernel — the one-pass collapse of
  * `transform(sequence(0, n−w), i → md5(concat_ws(" ", element_at×w)))`
  * ([[graft.operators.Dedup.windowHashes]]): md5-hex of every overlapping
  * `w`-token window (space-split tokens, empties dropped, windows re-joined
  * by single spaces — byte-identical to the columnar form on any spacing).
  *
  * The HOF form is CodegenFallback: every window evaluates 16 interpreted
  * `element_at` calls plus a fresh `concat_ws` buffer, and the md5 column
  * function allocates per call. Here token byte spans are collected once
  * per document and each window streams straight through one thread-local
  * `MessageDigest` (`update(bytes, start, len)` per span + a separator
  * byte) — no window string is ever materialized. The md5 calls themselves
  * (the irreducible cost, and what keeps the DuckDB oracle byte-exact)
  * are unchanged.
  *
  * Returns an empty array when the document has fewer than `w` tokens —
  * the `when(size ≥ w)…otherwise(array())` guard of the columnar form.
  * WindowHashSpec pins kernel ≡ the HOF derivation on crafted spacing /
  * multi-byte corpora and sf0.001; the q_substring_dup and
  * q_source_pagerank oracles are the mass cross-check.
  */
object WindowHashes {

  private val Md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".getBytes("US-ASCII")

  def compute(s: UTF8String, w: Int): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var m = 0
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val st = i
      while (i < n && b(i) != ' ') i += 1
      if (i > st) {
        if (m == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(m) = st
        ends(m) = i
        m += 1
      }
    }
    if (m < w) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m - w + 1)
    val dig = Md.get()
    var k = 0
    while (k <= m - w) {
      dig.reset()
      var t = k
      while (t < k + w) {
        if (t > k) dig.update(' '.toByte)
        dig.update(b, starts(t), ends(t) - starts(t))
        t += 1
      }
      val h = dig.digest()
      val hex = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = Hex((h(j) >> 4) & 0xf)
        hex(2 * j + 1) = Hex(h(j) & 0xf)
        j += 1
      }
      out(k) = UTF8String.fromBytes(hex)
      k += 1
    }
    new GenericArrayData(out)
  }
  /** Raw 16-byte digests — bijective to the hex form (no collision-profile
    * change), for consumers that only need window IDENTITY (distinct /
    * equi-join keys): halves the shuffled key bytes and skips the hex
    * encode. Never oracle-visible — any output column must use the hex
    * form. */
  def computeRaw(s: UTF8String, w: Int): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var m = 0
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val st = i
      while (i < n && b(i) != ' ') i += 1
      if (i > st) {
        if (m == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(m) = st
        ends(m) = i
        m += 1
      }
    }
    if (m < w) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m - w + 1)
    val dig = Md.get()
    var k = 0
    while (k <= m - w) {
      dig.reset()
      var t = k
      while (t < k + w) {
        if (t > k) dig.update(' '.toByte)
        dig.update(b, starts(t), ends(t) - starts(t))
        t += 1
      }
      out(k) = dig.digest()
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `window_hashes(text, w)` — [[WindowHashes]] as a codegen'd expression. */
case class WindowHashesExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WindowHashes.compute($c, $w)")
  override def prettyName: String = "window_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `window_hashes_raw(text, w)` — [[WindowHashes.computeRaw]]: raw digest
  * array for identity-only consumers. */
case class WindowHashesRawExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WindowHashes.computeRaw(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WindowHashes.computeRaw($c, $w)")
  override def prettyName: String = "window_hashes_raw"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHashExpressions {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def windowHashes(text: Column, w: Int): Column =
    column(WindowHashesExpr(expression(text), w))

  def windowHashesRaw(text: Column, w: Int): Column =
    column(WindowHashesRawExpr(expression(text), w))
}
