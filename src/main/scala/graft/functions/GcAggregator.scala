package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF example (the Aggregator rung of the UDF ladder): corpus-level
  * GC fraction as an exact two-Long state — (gc count, total length) —
  * merged associatively, so it distributes with map-side partial
  * aggregation and never loses precision to double summation. Register with
  * `functions.udaf(GcAggregator)` or use `.toColumn` on a typed Dataset.
  *
  * Counting matches E2's case-sensitive semantics (`fastx_parsers.py:19`):
  * only literal uppercase G/C in the numerator, full length in the
  * denominator.
  */
object GcAggregator extends Aggregator[String, (Long, Long), Double] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), seq: String): (Long, Long) = {
    if (seq == null) b
    else {
      var gc = 0L
      var i = 0
      while (i < seq.length) {
        val c = seq.charAt(i)
        if (c == 'G' || c == 'C') gc += 1
        i += 1
      }
      (b._1 + gc, b._2 + seq.length)
    }
  }

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.toDouble / r._2

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
