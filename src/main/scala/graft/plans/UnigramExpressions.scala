package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM Viterbi encoder — the APPLY side of
  * `q_unigram_train`'s model (the SentencePiece serving path: the model
  * is a bounded (piece → quantized −log p) table; encoding a word is an
  * O(len·pieceMax) integer DP, no training-state access).
  *
  * Semantics pinned to the trainer ([[graft.queries.TextQueries]]
  * unigramTrainModel) and its oracle: integer cost minimization over
  * piece decompositions, distance ties resolved by the SMALLEST piece
  * length at each backtrack step, and characters absent from the vocab
  * priced at a fixed UNK cost (30·2^20 — a −log p far beyond any trained
  * piece) so every word stays encodable. ASCII-lowercase input contract
  * (the word streams feeding it are `^[a-z]+$`-filtered), so byte ==
  * codepoint and substrings are byte slices.
  */
object UnigramOps {

  val UnkCost: Long = 30L * 1048576L

  /** Viterbi-encode one word; returns the piece array. */
  def encode(w: UTF8String, costs: java.util.HashMap[String, java.lang.Long],
             pieceMax: Int): ArrayData = {
    val s = w.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val INF = Long.MaxValue / 4
    val dp = new Array[Long](n + 1)
    var i = 1
    while (i <= n) { dp(i) = INF; i += 1 }
    var k = 1
    while (k <= n) {
      var l = 1
      val lMax = math.min(pieceMax, k)
      while (l <= lMax) {
        if (dp(k - l) != INF) {
          val p = s.substring(k - l, k)
          val c = costs.get(p)
          val cq =
            if (c != null) c.longValue()
            else if (l == 1) UnkCost
            else -1L // multi-char pieces must be in-vocab
          if (cq >= 0L && dp(k - l) + cq < dp(k)) dp(k) = dp(k - l) + cq
        }
        l += 1
      }
      k += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var pos = n
    while (pos > 0) {
      var l = 1
      var done = false
      while (!done) {
        val p = s.substring(pos - l, pos)
        val c = costs.get(p)
        val cq =
          if (c != null) c.longValue()
          else if (l == 1) UnkCost
          else -1L
        if (cq >= 0L && dp(pos - l) != INF && dp(pos - l) + cq == dp(pos)) {
          out += UTF8String.fromString(p)
          pos -= l
          done = true
        } else l += 1
      }
    }
    new GenericArrayData(out.reverse.toArray[Any])
  }
}

/** `unigram_encode(word)` → ARRAY<STRING> pieces; the cost table is a
  * codegen reference object (bounded model state, broadcast with the
  * plan — the same discipline as the BPE merge chain and the centroid
  * matrices). Seq field for structural equality (see ArgminCellExpr). */
case class UnigramEncodeExpr(child: Expression,
                             costs: Seq[(String, Long)], pieceMax: Int)
  extends UnaryExpression {
  @transient private lazy val costMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](costs.size * 2)
    costs.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    UnigramOps.encode(input.asInstanceOf[UTF8String], costMap, pieceMax)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("unigramCosts", costMap, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.UnigramOps.encode($c, $mapRef, $pieceMax)")
  }
  override def prettyName: String = "unigram_encode"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def unigramEncode(word: Column, costs: Seq[(String, Long)],
                    pieceMax: Int): Column =
    column(UnigramEncodeExpr(expression(word), costs, pieceMax))
}
