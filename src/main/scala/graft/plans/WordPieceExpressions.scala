package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native WordPiece encoder — the APPLY side of `q_wordpiece_train`'s
  * model (the BERT serving path: greedy longest-match-first over a
  * bounded vocabulary, continuation pieces carrying the `##` prefix,
  * and a word that cannot be segmented collapsing WHOLESALE to `[UNK]`
  * — the standard WordPiece contract, per the public BERT tokenizer
  * description and the HuggingFace tokenizers documentation).
  *
  * Semantics pinned to the trainer
  * ([[graft.queries.TextQueries]] wordpieceTrainModel) and its oracle:
  * at each position take the LONGEST vocab piece (word-initial form at
  * position 0, `##`-form elsewhere); if no length matches, the whole
  * word — including pieces already emitted — becomes the single token
  * `[UNK]`. ASCII-lowercase input contract (the word streams feeding it
  * are `^[a-z]+$`-filtered), so byte == codepoint and substrings are
  * byte slices.
  */
object WordPieceOps {

  val Unk = "[UNK]"

  /** The ONE greedy step both encoders share (the contract-carrying
    * core — a divergence here would desynchronize `wordpiece_encode`
    * from `wordpiece_offsets`, whose span invariant the q_tok_align
    * oracle pins): the longest l ≥ 1 whose candidate (word-initial form
    * at pos 0, `##`-form later) is in vocab, or 0 when greedy is stuck. */
  @inline private[plans] def matchAt(s: String, pos: Int,
      vocab: java.util.HashSet[String], maxPieceLen: Int): Int = {
    var l = math.min(maxPieceLen, s.length - pos)
    while (l >= 1) {
      val cand =
        if (pos == 0) s.substring(0, l)
        else "##" + s.substring(pos, pos + l)
      if (vocab.contains(cand)) return l
      l -= 1
    }
    0
  }

  /** Greedy-encode one word; returns the piece array. */
  def encode(w: UTF8String, vocab: java.util.HashSet[String],
             maxPieceLen: Int): ArrayData = {
    val s = w.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var pos = 0
    while (pos < n) {
      val found = matchAt(s, pos, vocab, maxPieceLen)
      if (found == 0)
        return new GenericArrayData(Array[Any](UTF8String.fromString(Unk)))
      out += UTF8String.fromString(
        if (pos == 0) s.substring(0, found)
        else "##" + s.substring(pos, pos + found))
      pos += found
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `wordpiece_encode(word)` → ARRAY<STRING> pieces; the vocabulary is a
  * codegen reference object (bounded model state, broadcast with the
  * plan — the UnigramEncodeExpr / BPE-merge-chain discipline). Seq field
  * for structural equality (see ArgminCellExpr). */
case class WordPieceEncodeExpr(child: Expression, vocab: Seq[String])
  extends UnaryExpression {
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  // longest raw-character span any piece can cover (## prefix excluded);
  // lazy val: the interpreted eval path calls this per ROW
  @transient private lazy val maxPieceLen: Int =
    vocab.iterator.map(p => if (p.startsWith("##")) p.length - 2 else p.length)
      .foldLeft(1)(math.max)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WordPieceOps.encode(input.asInstanceOf[UTF8String], vocabSet, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordpieceVocab", vocabSet, "java.util.HashSet")
    val mpl = maxPieceLen
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WordPieceOps.encode($c, $setRef, $mpl)")
  }
  override def prettyName: String = "wordpiece_encode"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Offset-mapping variant — the HuggingFace `offset_mapping` serving
  * feature: span-labeling pipelines (NER, QA) must map token indices
  * back to character spans AFTER tokenization, so the encoder emits
  * `(piece, start, end)` with start/end char offsets within the word
  * (0-based, end-exclusive). Same greedy contract as [[WordPieceOps]];
  * a wholesale-`[UNK]` word maps to the single span (0, len) — the
  * whole-word span, exactly what a span aligner needs to know it lost
  * sub-word resolution there. */
object WordPieceOffsetOps {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  val schema: StructType = StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false)))

  def encode(w: UTF8String, vocab: java.util.HashSet[String],
             maxPieceLen: Int): ArrayData = {
    val s = w.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    def row(p: String, a: Int, b: Int): InternalRow = {
      val r = new GenericInternalRow(3)
      r.update(0, UTF8String.fromString(p)); r.update(1, a); r.update(2, b)
      r
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](n)
    var pos = 0
    while (pos < n) {
      val found = WordPieceOps.matchAt(s, pos, vocab, maxPieceLen)
      if (found == 0)
        return new GenericArrayData(Array[Any](row(WordPieceOps.Unk, 0, n)))
      val piece =
        if (pos == 0) s.substring(0, found)
        else "##" + s.substring(pos, pos + found)
      out += row(piece, pos, pos + found)
      pos += found
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `wordpiece_offsets(word)` → ARRAY<STRUCT<piece, start, end>>. */
case class WordPieceOffsetsExpr(child: Expression, vocab: Seq[String])
  extends UnaryExpression {
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxPieceLen: Int =
    vocab.iterator.map(p => if (p.startsWith("##")) p.length - 2 else p.length)
      .foldLeft(1)(math.max)
  override def dataType: DataType =
    ArrayType(WordPieceOffsetOps.schema, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WordPieceOffsetOps.encode(input.asInstanceOf[UTF8String], vocabSet, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordpieceVocab", vocabSet, "java.util.HashSet")
    val mpl = maxPieceLen
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WordPieceOffsetOps.encode($c, $setRef, $mpl)")
  }
  override def prettyName: String = "wordpiece_offsets"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def wordpieceEncode(word: Column, vocab: Seq[String]): Column =
    column(WordPieceEncodeExpr(expression(word), vocab))

  def wordpieceOffsets(word: Column, vocab: Seq[String]): Column =
    column(WordPieceOffsetsExpr(expression(word), vocab))
}
