package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE token-budget kernel.
  *
  * Semantics are EXACTLY the frozen-merge-table replace chain the oracle
  * replays (TextQueries.bpeTokenCountSql): pipe-separate every codepoint
  * of the (already lowercased) document, then for each merge rule (a, b)
  * in order run one leftmost non-overlapping global replace of `|a|b|`
  * with `|ab|`, and finally count the non-empty segments that are not a
  * lone whitespace char and not a lone `|` (text pipes dissolve into the
  * separators; whitespace chars are segments no letter-pair merge can
  * match or cross, which is what makes the whole-document pass identical
  * to the per-word chain).
  *
  * Simulated on symbol SPANS over the input bytes instead of strings:
  * merges only ever concatenate adjacent codepoints, so every symbol is a
  * contiguous byte range and a merge is two ints collapsing — zero
  * allocation per pass, no 2·L-char intermediate strings. The expression
  * form of the same chain (16 codegen'd `replace` calls) costs a full
  * copy + reallocation of the separated string per pass — measured 48 s
  * per query on the 100× documents fixture vs 13.8-14.8 s for this
  * kernel (q_mixture_plan / q_pack_sequences; 0.44/0.49 s at sf0.1 →
  * 30× wall for 100× data).
  *
  * The one subtle rule inherited from string replace: consecutive symbol
  * pairs share their middle delimiter, so after a match the immediately
  * following symbol cannot START the next match of the same pass (its
  * leading pipe was consumed) — `|a|b|a|b|` rewrites to `|ab|a|b|`, not
  * `|ab|ab|`. The kernel copies one symbol untested after every merge.
  */
object BpeKernel {

  def count(s: UTF8String,
            mergesA: Array[Array[Byte]],
            mergesB: Array[Array[Byte]]): Long = {
    val b = s.getBytes
    val n = b.length
    if (n == 0) return 0L
    // one symbol per UTF-8 codepoint: span offsets + lengths
    val start = new Array[Int](n)
    val len = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      var l = UTF8String.numBytesForFirstByte(b(i))
      if (l <= 0 || i + l > n) l = 1 // malformed byte: keep as 1-byte symbol
      start(m) = i
      len(m) = l
      m += 1
      i += l
    }
    var r = 0
    while (r < mergesA.length) {
      val a = mergesA(r)
      val bb = mergesB(r)
      var w = 0
      var p = 0
      while (p < m) {
        if (p + 1 < m && spanEq(b, start(p), len(p), a) &&
          spanEq(b, start(p + 1), len(p + 1), bb)) {
          start(w) = start(p)
          len(w) = len(p) + len(p + 1)
          w += 1
          p += 2
          // shared-delimiter rule: the next symbol cannot start a match
          if (p < m) { start(w) = start(p); len(w) = len(p); w += 1; p += 1 }
        } else {
          start(w) = start(p)
          len(w) = len(p)
          w += 1
          p += 1
        }
      }
      m = w
      r += 1
    }
    var c = 0L
    var k = 0
    while (k < m) {
      val isDropped = len(k) == 1 && {
        val ch = b(start(k))
        ch == '|' || ch == ' ' || ch == '\t' || ch == '\n' ||
          ch == 0x0b || ch == '\f' || ch == '\r'
      }
      if (!isDropped) c += 1
      k += 1
    }
    c
  }

  private def spanEq(b: Array[Byte], off: Int, l: Int, pat: Array[Byte]): Boolean = {
    if (l != pat.length) return false
    var i = 0
    while (i < l) {
      if (b(off + i) != pat(i)) return false
      i += 1
    }
    true
  }
}

/** `bpe_token_count(text)` — [[BpeKernel]] as a codegen'd Catalyst
  * expression; the merge table is bound at plan time and shipped to the
  * generated code as a reference object. Input must already be
  * lowercased (callers pass `lower(text)` so Spark's own lower-casing
  * semantics are preserved). */
case class BpeTokenCountExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {
  override def dataType: DataType = LongType
  @transient private lazy val mergesA: Array[Array[Byte]] =
    merges.map(_._1.getBytes("UTF-8")).toArray
  @transient private lazy val mergesB: Array[Array[Byte]] =
    merges.map(_._2.getBytes("UTF-8")).toArray
  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.count(input.asInstanceOf[UTF8String], mergesA, mergesB)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeMergesA", mergesA, "byte[][]")
    val bRef = ctx.addReferenceObj("bpeMergesB", mergesB, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.BpeKernel.count($c, $aRef, $bRef)")
  }
  override def prettyName: String = "bpe_token_count"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def bpeTokenCount(loweredText: Column, merges: Seq[(String, String)]): Column =
    column(BpeTokenCountExpr(expression(loweredText), merges))
}
