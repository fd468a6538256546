package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair kernel — the ftfy-shape encoding fix every web-corpus
  * pipeline runs on crawl text (the algorithm family is public: ftfy's
  * "fix UTF-8 decoded as Latin-1/Windows-1252"). The classic corruption:
  * UTF-8 bytes were decoded with Windows-1252 and re-encoded, turning
  * `é` (C3 A9) into `Ã©` and `—` (E2 80 94) into `â€”`.
  *
  * Repair rule, deliberately CONSERVATIVE so real text is never touched:
  *  1. scan maximal runs of non-ASCII chars that inverse-map to single
  *     bytes under SLOPPY Windows-1252 — the CP1252 table for the 0x80-
  *     0x9F remapped range (`€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ‘ ’ “ ” • – — ˜
  *     ™ š › œ ž Ÿ`), identity for U+0080-U+009F controls (CP1252 leaves
  *     0x81/8D/8F/90/9D unmapped; "sloppy" passes them through, exactly
  *     ftfy's sloppy-windows-1252 behavior), identity for the Latin-1
  *     block U+00A0-U+00FF;
  *  2. a run is repaired ONLY if its mapped bytes are ENTIRELY valid
  *     UTF-8 (well-formed multi-byte sequences — shortest-form, no
  *     surrogates, ≤ U+10FFFF) with at least one multi-byte sequence;
  *     anything else (a lone `é`, a truncated `Ã` at run end) stays
  *     byte-identical — genuine Latin-script text is never "repaired"
  *     because a lone Latin-1 letter is an invalid UTF-8 lead/continuation
  *     on its own.
  *
  * Output: (fixed, n_runs) — the repaired text and how many runs were
  * rewritten (the curation health metric: corpora with high repair rates
  * get routed to encoding triage). One char-level pass, row-local,
  * codegen'd. EncodingKernelSpec pins the kernel against an independent
  * reference implementation on crafted + generated corpora; the
  * q_fix_encoding oracle replays planted corruptions as literal replaces.
  */
object FixEncoding {

  /** Inverse sloppy-Windows-1252: char → byte (0-255), or -1 when the
    * char is not the CP1252 decoding of any byte. */
  private val Inverse: java.util.HashMap[Character, Integer] = {
    val m = new java.util.HashMap[Character, Integer]()
    // CP1252 0x80-0x9F remappings (public table)
    val cp = Seq(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    cp.foreach { case (b, c) => m.put(c, b) }
    // sloppy: unmapped 0x81/8D/8F/90/9D pass through as themselves
    Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D).foreach(b => m.put(b.toChar, b))
    // Latin-1 block identity
    (0xA0 to 0xFF).foreach(b => m.put(b.toChar, b))
    m
  }

  @inline private def byteFor(c: Char): Int = {
    val v = Inverse.get(c)
    if (v == null) -1 else v.intValue()
  }

  /** Strict UTF-8 validation of b[0, n): true iff every byte belongs to a
    * well-formed sequence AND at least one sequence is multi-byte
    * (shortest-form enforced; surrogates and > U+10FFFF rejected). */
  private def validMojibake(b: Array[Byte], n: Int): Boolean = {
    var i = 0
    var multi = false
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c >= 0xC2 && c <= 0xDF) {
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        multi = true; i += 2
      } else if (c == 0xE0) {
        if (i + 2 >= n || (b(i + 1) & 0xff) < 0xA0 || (b(i + 1) & 0xff) > 0xBF ||
          (b(i + 2) & 0xc0) != 0x80) return false
        multi = true; i += 3
      } else if (c >= 0xE1 && c <= 0xEC) {
        if (i + 2 >= n || (b(i + 1) & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80) return false
        multi = true; i += 3
      } else if (c == 0xED) { // no surrogates
        if (i + 2 >= n || (b(i + 1) & 0xff) < 0x80 || (b(i + 1) & 0xff) > 0x9F ||
          (b(i + 2) & 0xc0) != 0x80) return false
        multi = true; i += 3
      } else if (c >= 0xEE && c <= 0xEF) {
        if (i + 2 >= n || (b(i + 1) & 0xc0) != 0x80 || (b(i + 2) & 0xc0) != 0x80) return false
        multi = true; i += 3
      } else if (c == 0xF0) {
        if (i + 3 >= n || (b(i + 1) & 0xff) < 0x90 || (b(i + 1) & 0xff) > 0xBF ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        multi = true; i += 4
      } else if (c >= 0xF1 && c <= 0xF3) {
        if (i + 3 >= n || (b(i + 1) & 0xc0) != 0x80 ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        multi = true; i += 4
      } else if (c == 0xF4) {
        if (i + 3 >= n || (b(i + 1) & 0xff) < 0x80 || (b(i + 1) & 0xff) > 0x8F ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        multi = true; i += 4
      } else return false // C0/C1 overlong leads, stray continuations, F5+
    }
    multi
  }

  def compute(s: UTF8String): InternalRow = {
    val t = s.toString
    val n = t.length
    val out = new java.lang.StringBuilder(n)
    val runBytes = new Array[Byte](64)
    var runs = 0L
    var i = 0
    while (i < n) {
      val c = t.charAt(i)
      if (c < 0x80) { out.append(c); i += 1 }
      else {
        // maximal run of byte-mappable non-ASCII chars
        val start = i
        var bn = 0
        var bytes = runBytes
        var mappable = true
        while (i < n && t.charAt(i) >= 0x80 && mappable) {
          val b = byteFor(t.charAt(i))
          if (b < 0) mappable = false
          else {
            if (bn == bytes.length) bytes = java.util.Arrays.copyOf(bytes, bn * 2)
            bytes(bn) = b.toByte; bn += 1; i += 1
          }
        }
        if (bn > 0 && validMojibake(bytes, bn)) {
          out.append(new String(bytes, 0, bn, "UTF-8"))
          runs += 1L
        } else {
          out.append(t, start, i)
        }
        // an unmappable non-ASCII char ends the run; copy it through
        if (i < n && t.charAt(i) >= 0x80 && !mappable) { out.append(t.charAt(i)); i += 1 }
      }
    }
    InternalRow(UTF8String.fromString(out.toString), runs)
  }

  val schema: StructType = StructType(Seq(
    StructField("fixed", StringType, nullable = false),
    StructField("n_runs", LongType, nullable = false)))
}

/** `fix_encoding(text)` — [[FixEncoding]] as a codegen'd expression. */
case class FixEncodingExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = FixEncoding.schema
  override def nullSafeEval(input: Any): Any =
    FixEncoding.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FixEncoding.compute($c)")
  override def prettyName: String = "fix_encoding"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EncodingExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def fixEncoding(text: Column): Column = column(FixEncodingExpr(expression(text)))
}
