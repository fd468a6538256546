package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column bridges for Spark's internal bloom-filter expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are what the
  * `InjectRuntimeFilter` rule plants automatically when its size thresholds
  * allow; they are NOT registered in the public SQL function registry
  * (`bloom_filter_agg` resolves only internally). These bridges expose the
  * same expressions to the DataFrame API so a pipeline can pin the
  * bloom-semi-join-reduction shape explicitly instead of depending on
  * optimizer thresholds — the build side aggregates to one ~numBits/8-byte
  * binary regardless of row count, the probe side filters before its
  * exchange.
  *
  * The aggregate child must be an XXH64 hash (LongType) — pass
  * `xxhash64(keyCol)`, matching what the runtime-filter rule feeds it.
  */
object BloomExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def bloomFilterAgg(hashedKey: Column, estimatedItems: Long, numBits: Long): Column =
    column(new BloomFilterAggregate(expression(hashedKey),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  def mightContain(bloom: Column, hashedKey: Column): Column =
    column(BloomFilterMightContain(expression(bloom), expression(hashedKey)))
}
