package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel — the canonical-composition pass every
  * tokenizer-bound corpus needs (two byte sequences for the same text —
  * `é` vs `e`+COMBINING ACUTE — fragment vocabulary statistics, dedup
  * keys, and exact-match decontamination): normalize to NFC via the
  * JDK's `java.text.Normalizer` (the Unicode standard algorithm — public
  * knowledge; DuckDB's `nfc_normalize` implements the same UAX #15
  * normalization, which is what makes the oracle replay possible).
  *
  * Output: (normalized, changed) — changed=1 when the input was NOT
  * already NFC (the corpus-health metric). The quick-check path
  * (`Normalizer.isNormalized`) makes the already-NFC common case a scan
  * with no allocation. Spark has no normalization built-in; this is the
  * codegen'd expression form (no UDF, no fallback). */
object NfcNormalize {

  def compute(s: UTF8String): InternalRow = {
    val t = s.toString
    if (java.text.Normalizer.isNormalized(t, java.text.Normalizer.Form.NFC))
      InternalRow(s, 0L)
    else
      InternalRow(UTF8String.fromString(
        java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)), 1L)
  }

  val schema: StructType = StructType(Seq(
    StructField("normalized", StringType, nullable = false),
    StructField("changed", LongType, nullable = false)))
}

/** `nfc_normalize(text)` — [[NfcNormalize]] as a codegen'd expression. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = NfcNormalize.schema
  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.compute($c)")
  override def prettyName: String = "nfc_normalize"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def nfcNormalize(text: Column): Column = column(NfcNormalizeExpr(expression(text)))
}
