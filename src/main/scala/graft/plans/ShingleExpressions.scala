package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-shingle kernel — the one-pass collapse of
  * `array_distinct(transform(sequence(0, m−n), i → concat_ws(" ",
  * element_at×n)))` ([[graft.operators.Dedup.shingleSets]]'s columnar
  * form): the DISTINCT overlapping `n`-token shingles of a document, in
  * first-occurrence order (= `array_distinct` semantics), each built by
  * direct byte copy from the token spans and deduplicated through a
  * LinkedHashSet of UTF8Strings — no java.lang.String round-trip, no
  * interpreted `element_at` per window (the HOF is CodegenFallback), no
  * second `array_distinct` pass over the materialized array.
  *
  * This is the fan-in point of the whole shingle family: Jaccard pairs,
  * MinHash/LSH signatures, the dedup cascade, leakage-safe splits,
  * benchmark decontamination, the bigram LM, and both curation pipelines
  * all derive their n-gram space from this expression, so its per-byte
  * cost is corpus-hot. Returns an empty array when the document has fewer
  * than `n` tokens — the `when(size ≥ n)…otherwise(array())` guard of the
  * columnar form. ShingleKernelSpec pins kernel ≡ columnar (order
  * included) across widths; the family's DuckDB oracles are the mass
  * cross-check at both SFs.
  */
/** The token-span walk and shingle-byte assembly shared by
  * [[DistinctShingles]] and [[AllShingles]] — one definition of the
  * tokenization (single-space separators, empties skipped) so the
  * shingle family cannot silently diverge from itself (review r11). */
private[plans] object ShingleScan {

  /** (starts, ends, m): spans of the space-separated non-empty tokens. */
  def tokenSpans(b: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val len = b.length
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && b(i) == ' ') i += 1
      val st = i
      while (i < len && b(i) != ' ') i += 1
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
    (starts, ends, m)
  }

  /** Byte-copied single-space-joined window of `n` tokens starting at
    * span index `k` — no java.lang.String round-trip. */
  def window(b: Array[Byte], starts: Array[Int], ends: Array[Int],
             k: Int, n: Int): UTF8String = {
    var outLen = n - 1 // single-space separators
    var t = k
    while (t < k + n) { outLen += ends(t) - starts(t); t += 1 }
    val out = new Array[Byte](outLen)
    var pos = 0
    t = k
    while (t < k + n) {
      if (t > k) { out(pos) = ' '; pos += 1 }
      val l = ends(t) - starts(t)
      System.arraycopy(b, starts(t), out, pos, l)
      pos += l
      t += 1
    }
    UTF8String.fromBytes(out)
  }
}

object DistinctShingles {

  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val b = s.getBytes
    val (starts, ends, m) = ShingleScan.tokenSpans(b)
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val set = new java.util.LinkedHashSet[UTF8String]()
    var k = 0
    while (k <= m - n) {
      set.add(ShingleScan.window(b, starts, ends, k, n))
      k += 1
    }
    val arr = new Array[Any](set.size)
    val it = set.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    new GenericArrayData(arr)
  }
}

/** ALL overlapping word `n`-shingles, multiplicity preserved, document
  * order — the counting twin of [[DistinctShingles]] (same token-span
  * walk and byte-copy assembly, no dedup set). This is the feature
  * stream an n-gram MODEL needs (DSIR hashed bigrams, LM-style counts):
  * dedup would silently turn token counts into document frequencies.
  * n = 1 degenerates to the token array itself (space-split, empties
  * skipped — identical semantics to `TextFunctions.tokens`). */
object AllShingles {

  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val b = s.getBytes
    val (starts, ends, m) = ShingleScan.tokenSpans(b)
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val arr = new Array[Any](m - n + 1)
    var k = 0
    while (k <= m - n) {
      arr(k) = ShingleScan.window(b, starts, ends, k, n)
      k += 1
    }
    new GenericArrayData(arr)
  }
}

/** `distinct_shingles(text, n)` — [[DistinctShingles]] as a codegen'd
  * expression. */
case class DistinctShinglesExpr(child: Expression, n: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    DistinctShingles.compute(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DistinctShingles.compute($c, $n)")
  override def prettyName: String = "distinct_shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `all_shingles(text, n)` — [[AllShingles]] as a codegen'd expression. */
case class AllShinglesExpr(child: Expression, n: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    AllShingles.compute(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.AllShingles.compute($c, $n)")
  override def prettyName: String = "all_shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def distinctShingles(text: Column, n: Int): Column =
    column(DistinctShinglesExpr(expression(text), n))

  def allShingles(text: Column, n: Int): Column =
    column(AllShinglesExpr(expression(text), n))
}
