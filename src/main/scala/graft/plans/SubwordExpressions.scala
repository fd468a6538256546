package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document subword-gram counter — the codegen upgrade for the
  * tokenizer-vocabulary candidate statistics (`q_subword_vocab`).
  *
  * Replaces the nested-Generate shape (sequence × transform × flatten ×
  * explode = ~3 output rows per corpus character, plus a null slot per
  * out-of-range (start, len) pair) with ONE {gram → count} map per
  * document built in a single byte pass: the downstream aggregation then
  * sees one row per DISTINCT gram per document instead of one per gram
  * occurrence — the same shuffle-free-until-the-sort shape as the E5/E6
  * k-mer kernels ([[SeqWindowFreq]]).
  *
  * Semantics exactly match the query it replaces: whitespace tokens of
  * the (already lowercased) text via Java-regex `\s+` (ASCII class),
  * tokens shorter than 2 codepoints dropped, every codepoint-substring of
  * length [minLen, maxLen] counted. Gram boundaries are codepoints, not
  * bytes, so multi-byte text slices exactly like `substring()`.
  */
object SubwordGrams {

  def counts(s: UTF8String, minLen: Int, maxLen: Int): MapData = {
    val b = s.getBytes
    val n = b.length
    val acc = new java.util.HashMap[String, java.lang.Long]()
    val cp = new Array[Int](n + 1) // codepoint start offsets of one token
    var i = 0
    while (i < n) {
      while (i < n && isWs(b(i))) i += 1
      var m = 0
      while (i < n && !isWs(b(i))) {
        cp(m) = i
        var l = UTF8String.numBytesForFirstByte(b(i))
        if (l <= 0 || i + l > n) l = 1 // malformed byte: 1-byte codepoint
        m += 1
        i += l
      }
      cp(m) = i // end sentinel
      if (m >= 2) {
        var st = 0
        while (st < m) {
          var l = minLen
          while (l <= maxLen && st + l <= m) {
            val from = cp(st)
            val key = new String(b, from, cp(st + l) - from,
              java.nio.charset.StandardCharsets.UTF_8)
            val prev = acc.get(key)
            acc.put(key, if (prev == null) 1L else prev + 1L)
            l += 1
          }
          st += 1
        }
      }
    }
    val sz = acc.size
    val keys = new Array[Any](sz)
    val vals = new Array[Any](sz)
    val it = acc.entrySet().iterator()
    var idx = 0
    while (it.hasNext) {
      val e = it.next()
      keys(idx) = UTF8String.fromString(e.getKey)
      vals(idx) = e.getValue.longValue()
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  private def isWs(ch: Byte): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == 0x0b || ch == '\f' || ch == '\r'
}

/** `subword_gram_counts(text)` — [[SubwordGrams]] as a codegen'd Catalyst
  * expression. Input must already be lowercased (callers pass
  * `lower(text)` to keep Spark's lower-casing semantics). */
case class SubwordGramCountsExpr(child: Expression, minLen: Int, maxLen: Int)
  extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullSafeEval(input: Any): Any =
    SubwordGrams.counts(input.asInstanceOf[UTF8String], minLen, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SubwordGrams.counts($c, $minLen, $maxLen)")
  override def prettyName: String = "subword_gram_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def subwordGramCounts(loweredText: Column, minLen: Int = 2, maxLen: Int = 4): Column =
    column(SubwordGramCountsExpr(expression(loweredText), minLen, maxLen))
}
