package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-hex-prefix kernel — the one-call collapse of
  * `substring(md5(x.cast("binary")), 1, n)` (and, at n = 32, of
  * `md5(x.cast("binary"))` itself).
  *
  * Spark's built-in `Md5` expression routes every row through
  * `DigestUtils.md5Hex`: a fresh `MessageDigest.getInstance("MD5")`
  * (JCA provider lookup + allocation per call — the same per-call SPI
  * cost the audio codec path paid before round 8's bypass), a `char[]`
  * hex encode, a `String`, and a `UTF8String.fromString` re-encode; the
  * `substring` then copies again. Here one thread-local digest is reused
  * across rows and the hex prefix is written once into exactly `n`
  * ASCII bytes. The md5 arithmetic itself — what the DuckDB oracles and
  * the reference's `hashlib.md5(...).hexdigest()[:n]`
  * (`/root/reference/src/polars_fastx/fastx_parsers.py:43-50`) pin — is
  * the JDK's, unchanged.
  *
  * String children hash their UTF-8 bytes (≡ `cast(s AS BINARY)`);
  * binary children hash their bytes directly, so every
  * `md5(key.cast("binary"))` site (sampling gates, dedup content keys)
  * can swap in without semantic change. HashKernelSpec pins kernel ≡
  * the built-in chain for both input types at n ∈ {1, 8, 15, 16, 32}.
  */
object Md5Prefix {

  private val Md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HexDigits = "0123456789abcdef".getBytes("US-ASCII")

  def compute(bytes: Array[Byte], len: Int): UTF8String = {
    val dig = Md.get()
    dig.reset()
    dig.update(bytes)
    val h = dig.digest()
    val n = math.max(0, math.min(len, 32))
    val hex = new Array[Byte](n)
    var j = 0
    while (j < n) {
      val b = h(j >> 1)
      hex(j) = HexDigits(if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf)
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  def compute(s: UTF8String, len: Int): UTF8String = compute(s.getBytes, len)
}

/** `md5_prefix(x, n)` — [[Md5Prefix]] as a codegen'd expression over a
  * string or binary child. */
case class Md5PrefixExpr(child: Expression, len: Int) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5_prefix needs a string or binary child, got $other")
    }
  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String  => Md5Prefix.compute(s, len)
    case b: Array[Byte] => Md5Prefix.compute(b, len)
  }
  // the UTF8String/byte[] overloads resolve statically from the child's
  // generated java type
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix.compute($c, $len)")
  override def prettyName: String = "md5_prefix"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** md5-hex prefix of a string's UTF-8 bytes / a binary's bytes. */
  def md5Prefix(c: Column, len: Int): Column =
    column(Md5PrefixExpr(expression(c), len))

  /** Full 32-char md5 hex — drop-in for `md5(c.cast("binary"))`. */
  def md5Hex(c: Column): Column = md5Prefix(c, 32)
}
