package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sequence-domain kernels beyond the reference's six expressions — the
  * two operations every FASTX toolkit ships next (the reference's users
  * run them downstream of `fasta_stats` today): DNA→protein translation
  * and FASTQ phred-quality decoding. Both are single-pass code-point
  * walks compiled into whole-stage codegen; both have exact relational
  * oracles (a 64-row codon-table join / an `ord(c)-33` unnest), so they
  * sit under the DuckDB gate like the rest of the surface rather than
  * being pinned-only.
  *
  * CODE-POINT exactness (not byte): frames and counts advance per UTF-8
  * code point — `UTF8String.numBytesForFirstByte` — so results match the
  * oracles' character-based `substr`/`string_split` on ANY input, not
  * just the ASCII fixtures (BioKernelSpec pins multi-byte corpora).
  */
object BioKernels {

  /** Standard genetic code, indexed a·16 + b·4 + c with A=0 C=1 G=2 T=3
    * per base (row-major in first-base order). One shared constant: the
    * DuckDB oracle's 64-row VALUES table is GENERATED from this string
    * ([[graft.queries.SeqQueries]]), so kernel and oracle cannot drift. */
  val CodonTable: String =
    "KNKNTTTTRSRSIIMI" + // Axx
    "QHQHPPPPRRRRLLLL" + // Cxx
    "EDEDAAAAGGGGVVVV" + // Gxx
    "*Y*YSSSS*CWCLFLF"   // Txx

  /** 2-bit base index for an ASCII byte; -1 = not A/C/G/T. */
  @inline private def baseIdx(b: Byte): Int = b match {
    case 'A' => 0
    case 'C' => 1
    case 'G' => 2
    case 'T' => 3
    case _   => -1
  }

  private val codonBytes: Array[Byte] = CodonTable.getBytes("US-ASCII")

  /** Translate complete leading codons of `s` (frame 0) to amino acids:
    * each triple of CODE POINTS maps through [[CodonTable]]; any codon
    * containing a non-ACGT code point (N, punctuation, multi-byte, …)
    * emits 'X'. Trailing 1-2 leftover code points are dropped — the
    * `length//3` convention the oracle's generate_series reproduces. */
  def translate(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val nChars = s.numChars()
    val out = new Array[Byte](nChars / 3)
    var i = 0      // byte cursor
    var cp = 0     // code-point ordinal
    var acc = 0    // 2-bit packed codon accumulator
    var bad = false
    var m = 0
    while (i < b.length && m < out.length) {
      val w = UTF8String.numBytesForFirstByte(b(i))
      val idx = if (w == 1) baseIdx(b(i)) else -1
      if (idx < 0) bad = true else acc = (acc << 2) | idx
      i += w
      cp += 1
      if (cp == 3) {
        out(m) = if (bad) 'X'.toByte else codonBytes(acc)
        m += 1
        cp = 0; acc = 0; bad = false
      }
    }
    UTF8String.fromBytes(out)
  }

  /** Exact integer phred stats of a quality string: per code point
    * q = codePoint − 33 (Sanger offset); returns
    * (n_bases, sum_q, min_q, max_q, n_ge30) — all integers, so consumers
    * divide the SAME operands the oracle divides and the derived doubles
    * are bit-identical. Empty string → (0, 0, null, null, 0), mirroring
    * SQL count/sum/min/max over zero rows (sum-of-empty surfaces as 0
    * via the query's COALESCE, min/max as NULL). */
  def phredStats(s: UTF8String): InternalRow = {
    val b = s.getBytes
    if (b.length == 0) return InternalRow(0L, 0L, null, null, 0L)
    var n = 0L
    var sum = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    var ge30 = 0L
    var i = 0
    while (i < b.length) {
      val w = UTF8String.numBytesForFirstByte(b(i))
      // decode the code point from the LOCAL bytes (a substring() here
      // would scan from the string start — O(n²) on multi-byte input)
      val cp = w match {
        case 1 => b(i) & 0xff
        case 2 => ((b(i) & 0x1f) << 6) | (b(i + 1) & 0x3f)
        case 3 => ((b(i) & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
        case _ => ((b(i) & 0x07) << 18) | ((b(i + 1) & 0x3f) << 12) |
          ((b(i + 2) & 0x3f) << 6) | (b(i + 3) & 0x3f)
      }
      val q = cp - 33
      n += 1
      sum += q
      if (q < mn) mn = q
      if (q > mx) mx = q
      if (q >= 30) ge30 += 1
      i += w
    }
    InternalRow(n, sum, mn, mx, ge30)
  }
}

/** `orf_scan(seq)` — longest open reading frame across the 3 forward
  * frames: an ORF is an exact `ATG` codon through the codon before the
  * next exact in-frame stop (`TAA`/`TAG`/`TGA`); length counts codons
  * including the start, excluding the stop; a start with no closing stop
  * is not an ORF. Unknown codons (N, punctuation, multi-byte) neither
  * open nor close — they sit inside an ORF as unknowns, the conservative
  * scanner convention, and exactly what a relational `codon = 'ATG'` /
  * `codon IN (stops)` derivation produces. Ties: longest, then smallest
  * frame, then smallest start. ONE code-point pass maintains all three
  * frame states (open-ATG index per frame, rolling last-3 window) —
  * O(n), allocation-free, vs the 3×-explode + two windows + join the
  * relational form pays. */
object OrfScan {

  /** (orf_len codons, frame 0-2, start 1-based char) — len 0 ⇒ nulls. */
  def scan(s: UTF8String): InternalRow = {
    val b = s.getBytes
    // rolling last-3 code points (as ASCII chars; 0 = other/multi-byte)
    var p2, p1, p0 = 0
    val open = Array(-1, -1, -1)
    var bestLen = 0L
    var bestFrame = -1
    var bestStart = -1
    var i = 0  // byte cursor
    var j = 0  // code-point ordinal
    while (i < b.length) {
      val w = UTF8String.numBytesForFirstByte(b(i))
      p2 = p1; p1 = p0
      p0 = if (w == 1) b(i) & 0xff else 0
      if (j >= 2) {
        val cs = j - 2          // codon start (code-point index)
        val f = cs % 3
        val isStart = p2 == 'A' && p1 == 'T' && p0 == 'G'
        val isStop = p2 == 'T' &&
          ((p1 == 'A' && (p0 == 'A' || p0 == 'G')) || (p1 == 'G' && p0 == 'A'))
        // the rolling window sees every 3-cp window; frame f only acts on
        // its own codons (cs ≡ f mod 3, which is all cs with this f)
        if (isStop) {
          if (open(f) >= 0) {
            val len = ((cs - open(f)) / 3).toLong
            if (len > bestLen ||
                (len == bestLen && (f < bestFrame ||
                  (f == bestFrame && open(f) < bestStart)))) {
              bestLen = len; bestFrame = f; bestStart = open(f)
            }
            open(f) = -1
          }
        } else if (isStart && open(f) < 0) {
          open(f) = cs
        }
      }
      i += w
      j += 1
    }
    if (bestLen == 0L) InternalRow(0L, null, null)
    else InternalRow(bestLen, bestFrame, (bestStart + 1).toLong)
  }
}

/** `homopolymer(seq)` — longest run of one repeated code point: the
  * sequencing-QC primitive (homopolymer tracts drive indel error in most
  * chemistries). One code-point pass; ties broken toward the EARLIER run
  * (scan order), which equals the relational island derivation's
  * (len DESC, start ASC) pick. Returns (max_run, run_char, run_start
  * 1-based); empty string → (0, null, null). */
object HomopolymerScan {

  def scan(s: UTF8String): InternalRow = {
    val b = s.getBytes
    if (b.length == 0) return InternalRow(0L, null, null)
    var bestLen = 0L
    var bestStart = 0
    var bestCharStart = 0   // byte offset of best run's char
    var bestCharWidth = 0
    var runStart = 0        // code-point index of current run start
    var runByteStart = 0
    var runLen = 0L
    var prevStart = -1      // byte offset of previous code point
    var prevWidth = 0
    var i = 0
    var j = 0
    while (i < b.length) {
      val w = UTF8String.numBytesForFirstByte(b(i))
      val same = prevStart >= 0 && prevWidth == w && {
        var k = 0
        var eq = true
        while (eq && k < w) { eq = b(prevStart + k) == b(i + k); k += 1 }
        eq
      }
      if (same) runLen += 1
      else { runStart = j; runByteStart = i; runLen = 1L }
      if (runLen > bestLen) {
        bestLen = runLen; bestStart = runStart
        bestCharStart = runByteStart; bestCharWidth = w
      }
      prevStart = i; prevWidth = w
      i += w; j += 1
    }
    val ch = UTF8String.fromBytes(
      java.util.Arrays.copyOfRange(b, bestCharStart, bestCharStart + bestCharWidth))
    InternalRow(bestLen, ch, (bestStart + 1).toLong)
  }
}

/** `homopolymer(seq)` — [[HomopolymerScan.scan]]. */
case class HomopolymerExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("max_run", LongType, nullable = false),
    StructField("run_char", StringType, nullable = true),
    StructField("run_start", LongType, nullable = true)))
  override def nullSafeEval(input: Any): Any =
    HomopolymerScan.scan(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.HomopolymerScan.scan($c)")
  override def prettyName: String = "homopolymer"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `orf_scan(seq)` — [[OrfScan.scan]]. */
case class OrfScanExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("orf_len", LongType, nullable = false),
    StructField("frame", IntegerType, nullable = true),
    StructField("start_pos", LongType, nullable = true)))
  override def nullSafeEval(input: Any): Any =
    OrfScan.scan(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.OrfScan.scan($c)")
  override def prettyName: String = "orf_scan"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `dna_translate(seq)` — [[BioKernels.translate]]. */
case class DnaTranslateExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    BioKernels.translate(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BioKernels.translate($c)")
  override def prettyName: String = "dna_translate"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `phred_stats(qual)` — [[BioKernels.phredStats]]. */
case class PhredStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bases", LongType, nullable = false),
    StructField("sum_q", LongType, nullable = false),
    StructField("min_q", IntegerType, nullable = true),
    StructField("max_q", IntegerType, nullable = true),
    StructField("n_ge30", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    BioKernels.phredStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BioKernels.phredStats($c)")
  override def prettyName: String = "phred_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BioExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def dnaTranslate(c: Column): Column =
    column(DnaTranslateExpr(expression(c)))

  def phredStats(c: Column): Column =
    column(PhredStatsExpr(expression(c)))

  def orfScan(c: Column): Column =
    column(OrfScanExpr(expression(c)))

  def homopolymer(c: Column): Column =
    column(HomopolymerExpr(expression(c)))
}
