package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-exact ASCII specializations of two `StringTranslate`-family
  * built-ins the seq queries lean on. Spark's `translate` walks a boxed
  * `Character → Character` map per input char — ~8 s per call over the
  * 100× corpus — and the `length(s) − length(translate(s, cs, ""))`
  * count idiom pays it twice per query (E2 numerator + E3).
  *
  * Both kernels are EXACT, not approximations, by UTF-8 structure:
  * an ASCII byte (< 0x80) never occurs inside a multi-byte sequence, so
  *  - counting occurrences of ASCII chars is a pure byte count
  *    ([[AsciiCharCountExpr]] ≡ the translate-diff idiom for any input,
  *    ASCII or not), and
  *  - a byte→byte substitution whose domain and range are ASCII maps
  *    chars 1:1 and leaves multi-byte sequences untouched
  *    ([[AsciiTranslateExpr]] ≡ `translate(s, from, to)` whenever `from`
  *    and `to` are same-length ASCII — the no-deletion case; first-wins
  *    duplicate-key semantics replicated).
  * AsciiKernelSpec pins both against the built-ins on crafted multi-byte
  * + generated + fixture corpora.
  */
object AsciiKernels {

  def countIn(s: UTF8String, table: Array[Boolean]): Long = {
    val b = s.getBytes
    var n = 0L
    var i = 0
    while (i < b.length) {
      val v = b(i)
      if (v >= 0 && table(v)) n += 1
      i += 1
    }
    n
  }

  def strip(s: UTF8String, table: Array[Boolean]): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var m = 0
    var i = 0
    while (i < b.length) {
      val v = b(i)
      if (v < 0 || !table(v)) { out(m) = v; m += 1 }
      i += 1
    }
    if (m == b.length) s else UTF8String.fromBytes(java.util.Arrays.copyOf(out, m))
  }

  def translate(s: UTF8String, table: Array[Byte]): UTF8String = {
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var i = 0
    while (i < b.length) {
      val v = b(i)
      out(i) = if (v >= 0) table(v) else v
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `ascii_char_count(s, chars)` — occurrences of any of the ASCII `chars`
  * in `s`; ≡ `length(s) - length(translate(s, chars, ""))`. */
case class AsciiCharCountExpr(child: Expression, chars: String)
  extends UnaryExpression {
  require(chars.forall(_ < 128), s"non-ASCII count set: $chars")
  override def dataType: DataType = LongType
  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c) = true)
    t
  }
  override def nullSafeEval(input: Any): Any =
    AsciiKernels.countIn(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("countTable", table, "boolean[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.AsciiKernels.countIn($c, $tRef)")
  }
  override def prettyName: String = "ascii_char_count"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ascii_strip(s, chars)` — deletes every occurrence of the ASCII
  * `chars`; ≡ `regexp_replace(s, "[<chars>]", "")` for an ASCII class
  * (and ≡ `translate(s, chars, "")`), without the regex engine walk. */
case class AsciiStripExpr(child: Expression, chars: String)
  extends UnaryExpression {
  require(chars.forall(_ < 128), s"non-ASCII strip set: $chars")
  override def dataType: DataType = StringType
  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c) = true)
    t
  }
  override def nullSafeEval(input: Any): Any =
    AsciiKernels.strip(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("stripTable", table, "boolean[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.AsciiKernels.strip($c, $tRef)")
  }
  override def prettyName: String = "ascii_strip"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `ascii_translate(s, from, to)` — ≡ `translate(s, from, to)` for
  * same-length all-ASCII `from`/`to`. */
case class AsciiTranslateExpr(child: Expression, from: String, to: String)
  extends UnaryExpression {
  require(from.length == to.length, "deletion form not supported — use translate")
  require(from.forall(_ < 128) && to.forall(_ < 128),
    s"non-ASCII mapping: $from -> $to")
  override def dataType: DataType = StringType
  @transient private lazy val table: Array[Byte] = {
    val t = new Array[Byte](128)
    var i = 0
    while (i < 128) { t(i) = i.toByte; i += 1 }
    // first occurrence wins, matching StringTranslate's dict build
    val seen = new Array[Boolean](128)
    var j = 0
    while (j < from.length) {
      val f = from.charAt(j)
      if (!seen(f)) { seen(f) = true; t(f) = to.charAt(j).toByte }
      j += 1
    }
    t
  }
  override def nullSafeEval(input: Any): Any =
    AsciiKernels.translate(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("translateTable", table, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.AsciiKernels.translate($c, $tRef)")
  }
  override def prettyName: String = "ascii_translate"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def asciiCharCount(c: Column, chars: String): Column =
    column(AsciiCharCountExpr(expression(c), chars))

  def asciiTranslate(c: Column, from: String, to: String): Column =
    column(AsciiTranslateExpr(expression(c), from, to))

  def asciiStrip(c: Column, chars: String): Column =
    column(AsciiStripExpr(expression(c), chars))
}
