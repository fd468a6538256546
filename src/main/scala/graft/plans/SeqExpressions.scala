package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for E5/E6 (`fastx_parsers.py:30-41,52-67`) —
  * the codegen upgrade over the Scala-UDF path (SURVEY §7.5):
  *
  *  - no `ScalaUDF` wrapper: the generated code calls a static helper
  *    directly inside whole-stage codegen (no per-row closure dispatch,
  *    no encoder/`CatalystTypeConverters` round-trip of the Map — the
  *    helper builds `ArrayBasedMapData` straight from primitive arrays);
  *  - single UTF-8 pass: windows are compared byte-wise on the UTF8String
  *    (FASTX is ASCII), uppercasing per window without materializing an
  *    uppercase copy of the sequence.
  *
  * Exactly the reference algorithms: overlapping windows for k-mers,
  * stride-k complete windows for codons, uppercase-then-N-skip, count/total
  * over kept windows, empty map when nothing is kept.
  */
object SeqWindowFreq {

  /** Count map variant: {window → count} over kept windows (LongType
    * values). The explode queries build on this — per-doc counts need no
    * cross-row aggregation at all, so the whole pipeline is shuffle-free
    * until the output sort. */
  def computeCounts(seq: UTF8String, k: Int, step: Int): MapData = {
    val bytes = seq.getBytes
    val n = bytes.length
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i + k <= n) {
      var j = 0
      var hasN = false
      val win = new Array[Byte](k)
      while (j < k) {
        var b = bytes(i + j)
        if (b >= 'a' && b <= 'z') b = (b - 32).toByte
        if (b == 'N') hasN = true
        win(j) = b
        j += 1
      }
      if (!hasN)
        counts.merge(new String(win, java.nio.charset.StandardCharsets.UTF_8), 1, Integer.sum _)
      i += step
    }
    val m = counts.size
    val keys = new Array[Any](m)
    val vals = new Array[Any](m)
    val it = counts.entrySet().iterator()
    var idx = 0
    while (it.hasNext) {
      val e = it.next()
      keys(idx) = UTF8String.fromString(e.getKey)
      vals(idx) = e.getValue.toLong
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Shared window-frequency kernel. `step` = 1 (k-mers) or k (codons). */
  def compute(seq: UTF8String, k: Int, step: Int): MapData = {
    val bytes = seq.getBytes
    val n = bytes.length
    val counts = new java.util.HashMap[String, Int]()
    var total = 0
    var i = 0
    while (i + k <= n) {
      var j = 0
      var hasN = false
      val win = new Array[Byte](k)
      while (j < k) {
        var b = bytes(i + j)
        if (b >= 'a' && b <= 'z') b = (b - 32).toByte // ASCII uppercase
        if (b == 'N') hasN = true
        win(j) = b
        j += 1
      }
      if (!hasN) {
        total += 1
        val key = new String(win, java.nio.charset.StandardCharsets.UTF_8)
        counts.merge(key, 1, Integer.sum _)
      }
      i += step
    }
    val m = counts.size
    val keys = new Array[Any](m)
    val vals = new Array[Any](m)
    val it = counts.entrySet().iterator()
    var idx = 0
    val tot = total.toDouble
    while (it.hasNext) {
      val e = it.next()
      keys(idx) = UTF8String.fromString(e.getKey)
      vals(idx) = e.getValue.toDouble / tot
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

abstract class SeqWindowFreqExpression extends UnaryExpression {
  def k: Int
  def step: Int
  override def dataType: DataType = MapType(StringType, DoubleType, valueContainsNull = false)
  override def nullSafeEval(input: Any): Any =
    SeqWindowFreq.compute(input.asInstanceOf[UTF8String], k, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SeqWindowFreq.compute($c, $k, $step)")
}

/** E6 — overlapping k-mer frequencies, native. */
case class KmerFrequenciesExpr(child: Expression, k: Int) extends SeqWindowFreqExpression {
  override def step: Int = 1
  override def prettyName: String = "kmer_frequencies"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Window COUNT map (LongType values) — the shuffle-free building block
  * for the explode queries. */
case class SeqWindowCountsExpr(child: Expression, k: Int, step: Int)
  extends UnaryExpression {
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullSafeEval(input: Any): Any =
    SeqWindowFreq.computeCounts(input.asInstanceOf[UTF8String], k, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SeqWindowFreq.computeCounts($c, $k, $step)")
  override def prettyName: String = "seq_window_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** E5 — non-overlapping codon usage (k=3, stride 3), native. */
case class CodonUsageExpr(child: Expression) extends SeqWindowFreqExpression {
  override def k: Int = 3
  override def step: Int = 3
  override def prettyName: String = "codon_usage"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SeqExpressions {
  // Spark 4 moved Column off Expression; the bridge converts both ways
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def kmerFrequenciesNative(c: Column, k: Int = 3): Column =
    column(KmerFrequenciesExpr(expression(c), k))
  def codonUsageNative(c: Column): Column =
    column(CodonUsageExpr(expression(c)))

  /** {window → count} map (k-mers: step 1; codons: step k). */
  def windowCounts(c: Column, k: Int, step: Int): Column =
    column(SeqWindowCountsExpr(expression(c), k, step))

  /** SQL registration: `SELECT kmer_frequencies(seq, 3)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("kmer_frequencies",
      exprs => KmerFrequenciesExpr(exprs.head,
        exprs.lift(1).map(_.eval().asInstanceOf[Int]).getOrElse(3)), "built-in")
    registry.createOrReplaceTempFunction("codon_usage",
      exprs => CodonUsageExpr(exprs.head), "built-in")
  }
}
