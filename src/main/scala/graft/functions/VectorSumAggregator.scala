package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise sum of integer vectors as a typed Aggregator: the
  * shuffle-free way to reduce an embedding column to one vector per group.
  * State is a single Long array per group per partition, merged
  * associatively, so a groupBy over N rows of d-dim vectors shuffles
  * #groups × d longs instead of exploding N × d rows through an exchange.
  * Integer addition is order-free, so results are bit-identical to the
  * exploded formulation (which remains the cross-engine oracle form).
  *
  * The zero buffer is empty (dimension unknown until the first row); a
  * dimension mismatch between rows fails loudly rather than truncating.
  */
object VectorSumAggregator extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  private def add(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b.clone()
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"VectorSumAggregator: dimension mismatch ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def reduce(buf: Array[Long], v: Array[Long]): Array[Long] =
    if (v == null) buf else add(buf, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = add(a, b)

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Double twin of [[VectorSumAggregator]] for mean/centroid computation
  * where the pipeline is already floating-point (e.g. Lloyd refinement —
  * recall-pinned, not hash-compared): same one-array-per-group state and
  * shuffle shape. FP addition order follows partition merge order, exactly
  * like the built-in `avg` it replaces. */
object DoubleVectorSumAggregator extends Aggregator[Array[Double], Array[Double], Array[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  private def add(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b.clone()
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"DoubleVectorSumAggregator: dimension mismatch ${a.length} vs ${b.length}")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def reduce(buf: Array[Double], v: Array[Double]): Array[Double] =
    if (v == null) buf else add(buf, v)

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = add(a, b)

  override def finish(r: Array[Double]): Array[Double] = r

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
