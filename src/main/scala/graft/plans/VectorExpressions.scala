package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd vector kernels for the similarity family.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0L, _+_)`) is
  * already whole-stage-codegen'd, but `zip_with` MATERIALIZES the products
  * array before `aggregate` folds it — one `GenericArrayData` allocation +
  * boxed-long writes per evaluation. Inside the near-dup pair stage that is
  * one allocation per candidate PAIR, and in the hyperplane bucketer one
  * per plane per ROW. The fused kernel is a single primitive loop over the
  * two `ArrayData`s — no intermediate array, no boxing.
  *
  * Exactness is unchanged: the kernel computes the identical integer sum
  * (long addition is associative and order-free), so every oracle that
  * replays the HOF form as explode+SUM stays bit-identical — pinned by
  * equivalence tests in OperatorsSpec.
  */
object VectorOps {

  /** Exact integer dot product of two BIGINT arrays. */
  def longDot(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"longDot: dimension mismatch $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  /** Exact integer squared L2 distance of two BIGINT arrays. */
  def longDist2(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"longDist2: dimension mismatch $n vs ${b.numElements()}")
    var s = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); s += d * d; i += 1 }
    s
  }
}

/** sum(a[i]*b[i]) over two ARRAY<BIGINT> columns, fused (no intermediate
  * array). Null if either side is null; dimension mismatch fails loudly. */
case class LongDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.longDot($a, $b)")
  override def prettyName: String = "long_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** sum((a[i]-b[i])^2) over two ARRAY<BIGINT> columns, fused. */
case class LongDist2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.longDist2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorOps.longDist2($a, $b)")
  override def prettyName: String = "long_dist2"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Fused exact integer dot product (see [[VectorOps.longDot]]). */
  def longDot(a: Column, b: Column): Column =
    column(LongDotExpr(expression(a), expression(b)))

  /** Fused exact integer squared L2 distance. */
  def longDist2(a: Column, b: Column): Column =
    column(LongDist2Expr(expression(a), expression(b)))
}
