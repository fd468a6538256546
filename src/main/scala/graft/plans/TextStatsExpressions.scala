package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics kernel — one byte pass computing everything the
  * quality-score / language-ID family previously derived from three regex
  * scans plus repeated interpreted `ArrayFilter` passes over the token
  * array (HOFs are CodegenFallback, and the token split itself re-ran per
  * consumer):
  *
  *  - `n_chars`   — codepoint length (= Spark `length()`).
  *  - `n_tokens`  — single-space tokens, empties dropped (=
  *    `TextFunctions.tokens`; space is the ONLY separator — a token may
  *    contain tabs/newlines, exactly like `split(text, " ")`).
  *  - `n_alpha`   — ASCII letter codepoints (= `length(text) −
  *    length(regexp_replace(text, "[a-zA-Z]", ""))`).
  *  - `n_bpeish`  — matches of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` (=
  *    `approxTokenCount`): leftmost-first alternation makes this maximal
  *    letter runs + maximal digit runs + every other non-(ASCII-ws)
  *    codepoint, which a 3-state scan reproduces exactly.
  *  - `hits[i]`   — per-stopword-list counts of tokens byte-equal to a
  *    list word (= `stopwordHits`: case-sensitive, whole-token match).
  *
  * TextStatsSpec pins every field to the columnar derivation on crafted,
  * generated, and sf0.001 corpora; the q_quality_score / q_lang_id DuckDB
  * oracles are the mass cross-check.
  */
object TextStats {

  def compute(s: UTF8String, lists: Array[Array[Array[Byte]]]): InternalRow = {
    val b = s.getBytes
    val n = b.length
    val hits = new Array[Long](lists.length)
    var nChars = 0L
    var nTokens = 0L
    var nAlpha = 0L
    var nBpeish = 0L
    // run states for the BPE-ish segmenter
    var inLetters = false
    var inDigits = false
    var tokStart = 0 // byte offset of the current space-token
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        // close the current space-token
        if (i > tokStart) {
          nTokens += 1
          var li = 0
          while (li < lists.length) {
            val words = lists(li)
            var wi = 0
            var matched = false
            while (wi < words.length && !matched) {
              matched = spanEq(b, tokStart, i - tokStart, words(wi))
              wi += 1
            }
            if (matched) hits(li) += 1
            li += 1
          }
        }
        tokStart = i + 1
      }
      if (i < n) {
        var l = UTF8String.numBytesForFirstByte(b(i))
        if (l <= 0 || i + l > n) l = 1
        nChars += 1
        val ch = b(i)
        val isLetter = l == 1 && ((ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z'))
        val isDigit = l == 1 && ch >= '0' && ch <= '9'
        val isWs = l == 1 && (ch == ' ' || ch == '\t' || ch == '\n' ||
          ch == 0x0b || ch == '\f' || ch == '\r')
        if (isLetter) {
          nAlpha += 1
          if (!inLetters) nBpeish += 1
        } else if (isDigit) {
          if (!inDigits) nBpeish += 1
        } else if (!isWs) {
          nBpeish += 1 // every other non-ws codepoint is its own match
        }
        inLetters = isLetter
        inDigits = isDigit
        i += l
      } else {
        i += 1
      }
    }
    // stopword hits per list were accumulated with the dominant-order
    // loop above; wrap the primitive results
    InternalRow(nChars, nTokens, nAlpha, nBpeish,
      new GenericArrayData(hits.map(h => h: Any)))
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

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_bpeish", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false), nullable = false)))
}

/** `text_stats(text)` — [[TextStats]] as a codegen'd Catalyst expression;
  * the stopword lists are bound at plan time as a reference object. */
case class TextStatsExpr(child: Expression, lists: Seq[Seq[String]])
  extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  @transient private lazy val listBytes: Array[Array[Array[Byte]]] =
    lists.map(_.map(_.getBytes("UTF-8")).toArray).toArray
  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], listBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopLists", listBytes, "byte[][][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.TextStats.compute($c, $ref)")
  }
  override def prettyName: String = "text_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Order-sensitive rolling document fingerprint — the native twin of
  * `TextFunctions.rollingFingerprint`: per space-token
  * `(n_chars·1009 + cp(first)·31 + cp(last)) mod 1e9+7`, folded
  * `(acc·31 + h) mod 1e9+7` in token order. One byte pass; `cp(·)` is the
  * full Unicode codepoint (= Spark/DuckDB `ascii()` on the token and on
  * its reverse). Every intermediate < 2^35 — exact in Long. */
object RollingFp {

  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    val n = b.length
    val P = 1000000007L
    var acc = 0L
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      if (i < n) {
        var nCp = 0L
        var firstCp = -1L
        var lastCp = 0L
        while (i < n && b(i) != ' ') {
          var l = UTF8String.numBytesForFirstByte(b(i))
          if (l <= 0 || i + l > n) l = 1
          val cp = codepointAt(b, i, l)
          if (firstCp < 0) firstCp = cp
          lastCp = cp
          nCp += 1
          i += l
        }
        val h = (nCp * 1009L + firstCp * 31L + lastCp) % P
        acc = (acc * 31L + h) % P
      }
    }
    acc
  }

  private[plans] def codepointAt(b: Array[Byte], i: Int, l: Int): Long = l match {
    case 1 => b(i) & 0xffL
    case 2 => ((b(i) & 0x1fL) << 6) | (b(i + 1) & 0x3fL)
    case 3 => ((b(i) & 0x0fL) << 12) | ((b(i + 1) & 0x3fL) << 6) | (b(i + 2) & 0x3fL)
    case _ => ((b(i) & 0x07L) << 18) | ((b(i + 1) & 0x3fL) << 12) |
      ((b(i + 2) & 0x3fL) << 6) | (b(i + 3) & 0x3fL)
  }
}

/** Per-document token-repetition statistics — the native collapse of
  * `explode(tokens) → groupBy(doc, token) → groupBy(doc)`: total token
  * count, distinct token count, and the top term frequency from one
  * byte pass + one small per-doc hash map (distinct tokens per doc,
  * hundreds — never the corpus). Space-only tokenization, empties
  * dropped, byte-exact token identity — identical to
  * `TextFunctions.tokens` grouping. Documents with zero tokens return
  * (0,0,0); the query filters them to match the explode shape, which
  * drops such docs. Removes BOTH aggregation exchanges: the only
  * remaining shuffle in q_repetition is the output sort. */
object TokenRepStats {

  def compute(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    val tf = new java.util.HashMap[String, Long]()
    var total = 0L
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val st = i
      while (i < n && b(i) != ' ') i += 1
      if (i > st) {
        total += 1
        val tok = new String(b, st, i - st, java.nio.charset.StandardCharsets.UTF_8)
        val prev = tf.get(tok)
        tf.put(tok, if (prev == null) 1L else prev + 1L)
      }
    }
    var top = 0L
    val it = tf.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > top) top = v }
    InternalRow(total, tf.size.toLong, top)
  }

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_tf", LongType, nullable = false)))
}

/** `token_rep_stats(text)` — [[TokenRepStats]] as a codegen'd expression. */
case class TokenRepStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TokenRepStats.schema
  override def nullSafeEval(input: Any): Any =
    TokenRepStats.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenRepStats.compute($c)")
  override def prettyName: String = "token_rep_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Context-window chunker — the native collapse of
  * `transform(sequence(0, last_start, S), start → concat_ws(" ",
  * slice(toks, start+1, C)))`: token spans are collected once per
  * document and each chunk string (tokens `[start, min(start+C, n))`
  * joined by single spaces) is built by direct byte copy, instead of an
  * interpreted per-chunk array slice + join. Chunk starts are
  * 0, S, 2S, … while ≤ n−1 — exactly the `sequence` bounds. Returns
  * `struct(n_tokens, chunks)`; a zero-token document returns (0, []) and
  * the query's `n_tokens > 0` filter reproduces the explode shape. */
object ChunkTexts {

  def compute(s: UTF8String, c: Int, step: Int): InternalRow = {
    val b = s.getBytes
    val n = b.length
    // token byte spans
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
    if (m == 0) {
      return InternalRow(0L, new GenericArrayData(new Array[Any](0)))
    }
    val nChunks = (m - 1) / step + 1
    val chunks = new Array[Any](nChunks)
    var k = 0
    while (k < nChunks) {
      val from = k * step
      val to = math.min(from + c, m)
      var len = to - from - 1 // single-space separators
      var t = from
      while (t < to) { len += ends(t) - starts(t); t += 1 }
      val out = new Array[Byte](len)
      var pos = 0
      t = from
      while (t < to) {
        if (t > from) { out(pos) = ' '; pos += 1 }
        val l = ends(t) - starts(t)
        System.arraycopy(b, starts(t), out, pos, l)
        pos += l
        t += 1
      }
      chunks(k) = UTF8String.fromBytes(out)
      k += 1
    }
    InternalRow(m.toLong, new GenericArrayData(chunks))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("chunks", ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false),
      nullable = false)))
}

/** `chunk_texts(text, C, S)` — [[ChunkTexts]] as a codegen'd expression. */
case class ChunkTextsExpr(child: Expression, c: Int, step: Int)
  extends UnaryExpression {
  override def dataType: DataType = ChunkTexts.schema
  override def nullSafeEval(input: Any): Any =
    ChunkTexts.compute(input.asInstanceOf[UTF8String], c, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.plans.ChunkTexts.compute($in, $c, $step)")
  override def prettyName: String = "chunk_texts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `rolling_fingerprint(text)` — [[RollingFp]] as a codegen'd expression. */
case class RollingFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    RollingFp.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingFp.compute($c)")
  override def prettyName: String = "rolling_fingerprint"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native whitespace tokenizer — the one-pass form of
  * `filter(split(text, " "), t ≠ "")` ([[graft.functions.TextFunctions
  * .tokens]]'s columnar reference): maximal runs of non-space bytes, in
  * order, as zero-copy UTF8String views into the document's byte array.
  * The columnar form is an ArrayFilter (CodegenFallback): the split
  * allocates every empty-string slot a multi-space run produces and the
  * filter lambda is interpreted per element — and because fallback
  * expressions interpret their whole subtree, any expression that nests
  * `tokens(text)` used to drag its surroundings out of codegen too. As a
  * leaf kernel this stays inside whole-stage codegen everywhere it is
  * referenced. TokensKernelSpec pins kernel ≡ columnar (order included);
  * every token-family oracle is the mass cross-check. */
object SplitTokens {

  def compute(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    var cap = 16
    var arr = new Array[Any](cap)
    var m = 0
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val st = i
      while (i < n && b(i) != ' ') i += 1
      if (i > st) {
        if (m == cap) {
          cap *= 2
          val na = new Array[Any](cap)
          System.arraycopy(arr, 0, na, 0, m)
          arr = na
        }
        arr(m) = UTF8String.fromBytes(b, st, i - st)
        m += 1
      }
    }
    if (m == arr.length) new GenericArrayData(arr)
    else {
      val out = new Array[Any](m)
      System.arraycopy(arr, 0, out, 0, m)
      new GenericArrayData(out)
    }
  }
}

/** `split_tokens(text)` — [[SplitTokens]] as a codegen'd expression. */
case class SplitTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SplitTokens.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SplitTokens.compute($c)")
  override def prettyName: String = "split_tokens"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document vocabulary-coverage stats — (n_tokens, n_oov) against a
  * plan-time vocabulary, the one-pass form of `size(toks)` +
  * `size(filter(toks, ¬array_contains(vocab, t)))` (an interpreted
  * per-token scan of the vocab literal in the columnar form). Byte-exact
  * whole-token comparison, same discipline as [[TextStats]]' stopword
  * hits. The vocabulary is bounded by construction (top-k
  * TakeOrderedAndProject, the IVF-centroid precedent), so binding it as a
  * literal array keeps OOV marking row-local at any corpus size. */
object OovStats {

  def compute(s: UTF8String, vocab: Array[Array[Byte]]): InternalRow = {
    val b = s.getBytes
    val n = b.length
    var total = 0L
    var oov = 0L
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      val st = i
      while (i < n && b(i) != ' ') i += 1
      if (i > st) {
        total += 1
        var hit = false
        var v = 0
        while (!hit && v < vocab.length) {
          val w = vocab(v)
          if (w.length == i - st) {
            var j = 0
            while (j < w.length && w(j) == b(st + j)) j += 1
            hit = j == w.length
          }
          v += 1
        }
        if (!hit) oov += 1
      }
    }
    InternalRow(total, oov)
  }

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_oov", LongType, nullable = false)))
}

/** `oov_stats(text)` — [[OovStats]] with the vocabulary bound at plan
  * time as a reference object (codegen'd via `ctx.addReferenceObj`). */
case class OovStatsExpr(child: Expression, vocab: Seq[String])
  extends UnaryExpression {
  @transient private lazy val vocabBytes: Array[Array[Byte]] =
    vocab.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  override def dataType: DataType = OovStats.schema
  override def nullSafeEval(input: Any): Any =
    OovStats.compute(input.asInstanceOf[UTF8String], vocabBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("oovVocab", vocabBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.OovStats.compute($c, $ref)")
  }
  override def prettyName: String = "oov_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}


/** Per-document feature-hashing histogram — the native collapse of
  * `explode(tokens) → hash → groupBy(doc, bucket)`: every token is hashed
  * with the engine-portable polynomial token hash (the SAME per-token `h`
  * as [[RollingFp]] — `(n_chars·1009 + cp(first)·31 + cp(last)) mod 1e9+7`,
  * = the query's `length(t)·1009 + ascii(t)·31 + ascii(reverse(t))` tree)
  * and counted into its `h mod nBuckets` slot in one byte pass. The
  * per-(doc, bucket) counts are doc-local, so the kernel removes the
  * token explode AND both aggregation exchanges; zero-token docs return
  * an all-zero histogram, which the query's `cnt > 0` filter drops to
  * match the explode shape. */
object FeatureHist {

  def compute(s: UTF8String, nBuckets: Int): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    val P = 1000000007L
    val counts = new Array[Any](nBuckets)
    var k = 0
    while (k < nBuckets) { counts(k) = 0L; k += 1 }
    var i = 0
    while (i < n) {
      while (i < n && b(i) == ' ') i += 1
      if (i < n) {
        var nCp = 0L
        var firstCp = -1L
        var lastCp = 0L
        while (i < n && b(i) != ' ') {
          var l = UTF8String.numBytesForFirstByte(b(i))
          if (l <= 0 || i + l > n) l = 1
          val cp = RollingFp.codepointAt(b, i, l)
          if (firstCp < 0) firstCp = cp
          lastCp = cp
          nCp += 1
          i += l
        }
        val h = (nCp * 1009L + firstCp * 31L + lastCp) % P
        val slot = (h % nBuckets).toInt
        counts(slot) = counts(slot).asInstanceOf[Long] + 1L
      }
    }
    new GenericArrayData(counts)
  }
}

/** `feature_hist(text, n)` — [[FeatureHist]] as a codegen'd expression. */
case class FeatureHistExpr(child: Expression, nBuckets: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    FeatureHist.compute(input.asInstanceOf[UTF8String], nBuckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FeatureHist.compute($c, $nBuckets)")
  override def prettyName: String = "feature_hist"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def splitTokens(text: Column): Column =
    column(SplitTokensExpr(expression(text)))

  def oovStats(text: Column, vocab: Seq[String]): Column =
    column(OovStatsExpr(expression(text), vocab))

  def textStats(text: Column, lists: Seq[Seq[String]]): Column =
    column(TextStatsExpr(expression(text), lists))

  def rollingFingerprint(text: Column): Column =
    column(RollingFingerprintExpr(expression(text)))

  def tokenRepStats(text: Column): Column =
    column(TokenRepStatsExpr(expression(text)))

  def chunkTexts(text: Column, c: Int, step: Int): Column =
    column(ChunkTextsExpr(expression(text), c, step))

  def featureHist(text: Column, nBuckets: Int): Column =
    column(FeatureHistExpr(expression(text), nBuckets))
}
