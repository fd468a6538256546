package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native PII-redaction kernel — the one-pass-per-class byte scanner
  * behind [[graft.operators.Redact.scrub]]'s three regex classes.
  *
  * The regex implementation runs SIX full java.util.regex passes per
  * document (a `regexp_count` + a `regexp_replace` per class), each an
  * NFA walk with per-char state allocation; this kernel does the same
  * three sequential class rewrites with hand-rolled scanners that
  * reproduce java.util.regex leftmost-first, non-overlapping semantics
  * EXACTLY on each pattern:
  *
  *  - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}` — the local
  *    run is maximal with no productive backtracking ('@' is outside the
  *    local class), so a failed start anywhere inside a local run fails
  *    for every start in that run and the scan resumes AFTER the run
  *    (at k+1 when s(k)=='@' — domain bytes are local-class bytes, so a
  *    later email may begin inside a failed domain). The domain's greedy
  *    `+` then `\.[A-Za-z]{2,}` backtracking = the LARGEST dot position j
  *    inside the maximal domain run with ≥2 letters following, then the
  *    TLD extends greedily over letters (which cannot pass the domain
  *    run's end, letters being domain bytes).
  *  - phone `\+?[0-9]{3}-[0-9]{3}-[0-9]{4}` — fixed-width probe at each
  *    position ('+'-first, and the empty-`\+?` branch can never rescue a
  *    '+' byte, which is not a digit).
  *  - ids `[0-9]{9,}` — maximal digit runs of length ≥ 9.
  *
  * All three classes are pure-ASCII, so scanning BYTES is exact on UTF-8
  * input: continuation/lead bytes (≥ 0x80) are simply "not in class".
  * Counts are per class ON THE TEXT AS ALREADY REDACTED by earlier
  * classes, exactly like the fold in `Redact.scrub` (a phone inside a
  * replaced email is gone before the phone pass). RedactKernelSpec pins
  * kernel ≡ `Redact.scrub` on crafted backtracking corpora and generated
  * strings; the q_pii_redact DuckDB (RE2) oracle is the mass cross-check
  * at both SFs, byte-proven via md5 of the rewritten text.
  */
object PiiRedact {

  private val EmailTok = "<EMAIL>".getBytes("US-ASCII")
  private val PhoneTok = "<PHONE>".getBytes("US-ASCII")
  private val IdTok = "<ID>".getBytes("US-ASCII")

  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'

  /** Match spans for one class: flat [start0, end0, start1, end1, ...]. */
  private final class Spans {
    var a = new Array[Int](16)
    var m = 0
    def add(s: Int, e: Int): Unit = {
      if (2 * m == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(2 * m) = s; a(2 * m + 1) = e; m += 1
    }
  }

  /** Non-match bytes copied through, match spans replaced by `tok`. */
  private def rewrite(b: Array[Byte], sp: Spans, tok: Array[Byte]): Array[Byte] = {
    if (sp.m == 0) return b
    var matched = 0
    var i = 0
    while (i < sp.m) { matched += sp.a(2 * i + 1) - sp.a(2 * i); i += 1 }
    val out = new Array[Byte](b.length - matched + sp.m * tok.length)
    var pos = 0
    var from = 0
    i = 0
    while (i < sp.m) {
      val s = sp.a(2 * i); val e = sp.a(2 * i + 1)
      System.arraycopy(b, from, out, pos, s - from); pos += s - from
      System.arraycopy(tok, 0, out, pos, tok.length); pos += tok.length
      from = e; i += 1
    }
    System.arraycopy(b, from, out, pos, b.length - from)
    out
  }

  private def scanEmails(b: Array[Byte]): Spans = {
    val n = b.length
    val sp = new Spans
    var i = 0
    while (i < n) {
      if (!isLocal(b(i))) i += 1
      else {
        var k = i
        while (k < n && isLocal(b(k))) k += 1 // maximal local run [i, k)
        if (k >= n || b(k) != '@') i = k // every start in [i,k) fails alike
        else {
          var e = k + 1
          while (e < n && isDomain(b(e))) e += 1 // maximal domain run (k+1, e)
          // largest dot j with a non-empty domain part before it and ≥2
          // letters after it — the greedy-`+`-then-backtrack resolution
          var j = e - 3
          var found = -1
          while (found < 0 && j >= k + 2) {
            if (b(j) == '.' && isAlpha(b(j + 1)) && isAlpha(b(j + 2))) found = j
            else j -= 1
          }
          if (found < 0) i = k + 1 // resume after '@': a later email may
          else { //                   start inside this failed domain
            var me = found + 3 // TLD is greedy over letters
            while (me < n && isAlpha(b(me))) me += 1
            sp.add(i, me)
            i = me
          }
        }
      }
    }
    sp
  }

  /** `[0-9]{c}` at `q` and, when `dash`, a '-' right after. */
  @inline private def digitsThen(b: Array[Byte], q: Int, c: Int, dash: Boolean): Boolean = {
    var i = q
    val e = q + c
    while (i < e) { if (!isDigit(b(i))) return false; i += 1 }
    !dash || b(e) == '-'
  }

  private def scanPhones(b: Array[Byte]): Spans = {
    val n = b.length
    val sp = new Spans
    var i = 0
    while (i < n) {
      val q = if (b(i) == '+') i + 1 else i
      if (q + 12 <= n && digitsThen(b, q, 3, dash = true) &&
        digitsThen(b, q + 4, 3, dash = true) &&
        digitsThen(b, q + 8, 4, dash = false)) {
        sp.add(i, q + 12)
        i = q + 12
      } else i += 1
    }
    sp
  }

  private def scanLongDigits(b: Array[Byte]): Spans = {
    val n = b.length
    val sp = new Spans
    var i = 0
    while (i < n) {
      if (!isDigit(b(i))) i += 1
      else {
        val s = i
        while (i < n && isDigit(b(i))) i += 1 // maximal digit run
        if (i - s >= 9) sp.add(s, i)
      }
    }
    sp
  }

  def compute(s: UTF8String): InternalRow = {
    val b0 = s.getBytes
    val em = scanEmails(b0)
    val b1 = rewrite(b0, em, EmailTok)
    val ph = scanPhones(b1)
    val b2 = rewrite(b1, ph, PhoneTok)
    val id = scanLongDigits(b2)
    val b3 = rewrite(b2, id, IdTok)
    InternalRow(em.m.toLong, ph.m.toLong, id.m.toLong, UTF8String.fromBytes(b3))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_ids", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
}

/** `pii_redact(text)` — [[PiiRedact]] as a codegen'd expression. */
case class PiiRedactExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = PiiRedact.schema
  override def nullSafeEval(input: Any): Any =
    PiiRedact.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PiiRedact.compute($c)")
  override def prettyName: String = "pii_redact"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RedactExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def piiRedact(text: Column): Column = column(PiiRedactExpr(expression(text)))
}
