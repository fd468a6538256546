package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Aggregate `top_k_by_score(score DOUBLE, id BIGINT)` → ARRAY<STRUCT<id
  * BIGINT, score DOUBLE>> of the group's k best pairs under (score DESC,
  * id ASC), best first — so `posexplode(top_k_by_score(...))` reproduces
  * the rank-filtered window (`row_number().over(partitionBy(g)
  * .orderBy(score.desc, id.asc)).filter(_ <= k)`) row for row.
  *
  * WHY not the window: Spark plans that filter as WindowGroupLimit, which
  * still SORTS the full candidate stream on both sides of the group-key
  * shuffle — measured r15 on the 2 M-vector knn fixture: 52 GB memory +
  * 22 GB disk spill for state that is only ever k rows per key (opt guide
  * §5 memory/spill). And WHY declarative rather than a
  * TypedImperativeAggregate: a typed buffer routes through
  * ObjectHashAggregateExec, whose sort-based fallback triggers at a
  * KEY-COUNT threshold (default 128) and re-sorts the remaining input —
  * the very sort being removed. This flat fixed-width buffer (k doubles +
  * k longs, slot 0 best, sentinel-filled tail) runs under whole-stage
  * codegen'd HashAggregateExec with MEMORY-based spill, does partial
  * map-side aggregation (k rows of state per key per partition cross the
  * exchange), and sorts nothing larger than 2k elements (merge).
  *
  * Ordering is exact vs the window formulation: update/merge compare with
  * Spark's own comparison expressions over DoubleType — identical to
  * SortOrder's total order on every value the callers can produce (their
  * norm guards exclude NaN, and integer-cast dots cannot yield -0.0; the
  * merge sort key negates scores, which is an exact sign flip for all
  * finite doubles and both infinities). Callers must keep scores finite
  * and non-NaN: -Infinity is the empty-slot sentinel and NaN would break
  * the primitive comparisons. Equal scores break toward the SMALLER id.
  * Pinned against the window formulation in OperatorsSpec.
  */
case class TopKByScore(score: Expression, id: Expression, k: Int)
  extends DeclarativeAggregate with BinaryLike[Expression] {

  require(k >= 1, s"top_k_by_score: k ($k) must be >= 1")

  override def left: Expression = score
  override def right: Expression = id

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  // slot 0 = best; (-Inf, Long.MaxValue) marks an empty slot. Sorted-insert
  // only ever shifts entries toward the tail, so sentinels stay a suffix.
  private lazy val bufScore: IndexedSeq[AttributeReference] =
    (0 until k).map(j => AttributeReference(s"topk_s$j", DoubleType, nullable = false)())
  private lazy val bufId: IndexedSeq[AttributeReference] =
    (0 until k).map(j => AttributeReference(s"topk_i$j", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = bufScore ++ bufId

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(k)(Literal(Double.NegativeInfinity)) ++ Seq.fill(k)(Literal(Long.MaxValue))

  /** Strict "candidate (cs, ci) outranks slot (ss, si)" under
    * (score DESC, id ASC). A sentinel slot always loses: any real score
    * beats -Infinity. */
  private def outranks(cs: Expression, ci: Expression,
                       ss: Expression, si: Expression): Expression =
    Or(GreaterThan(cs, ss), And(EqualTo(cs, ss), LessThan(ci, si)))

  // one-step sorted insert: slot j takes (old slot j-1) when the input
  // also outranks j-1 (everything from j-1 shifts down), else the input
  // itself; slots the input does not outrank are untouched.
  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(score), IsNotNull(id))
    val beats = (0 until k).map(j => outranks(score, id, bufScore(j), bufId(j)))
    val newScores = (0 until k).map { j =>
      val landed = if (j == 0) score else If(beats(j - 1), bufScore(j - 1), score)
      If(And(valid, beats(j)), landed, bufScore(j))
    }
    val newIds = (0 until k).map { j =>
      val landed = if (j == 0) id else If(beats(j - 1), bufId(j - 1), id)
      If(And(valid, beats(j)), landed, bufId(j))
    }
    (newScores ++ newIds).map(KnownNotNull)
  }

  // merge = re-sort the union of the two sorted k-lists and keep k: pack
  // 2k entries as structs keyed (−score ASC, id ASC) ≡ (score DESC, id
  // ASC), sort_array, read back slot j. Codegen's subexpression
  // elimination evaluates the sorted array once per merged pair.
  override lazy val mergeExpressions: Seq[Expression] = {
    def entry(s: Expression, i: Expression): Expression =
      CreateNamedStruct(Seq(
        Literal("n"), UnaryMinus(s), Literal("i"), i, Literal("s"), s))
    val all = (0 until k).flatMap { j =>
      Seq(entry(bufScore(j).left, bufId(j).left),
        entry(bufScore(j).right, bufId(j).right))
    }
    val sorted = SortArray(CreateArray(all), Literal(true))
    val newScores = (0 until k).map { j =>
      KnownNotNull(GetStructField(ElementAt(sorted, Literal(j + 1)), 2, Some("s")))
    }
    val newIds = (0 until k).map { j =>
      KnownNotNull(GetStructField(ElementAt(sorted, Literal(j + 1)), 1, Some("i")))
    }
    newScores ++ newIds
  }

  override lazy val evaluateExpression: Expression = {
    val structs = (0 until k).map { j =>
      CreateNamedStruct(Seq(
        Literal("id"), bufId(j), Literal("score"), bufScore(j)))
    }
    val size = (0 until k)
      .map[Expression] { j =>
        If(EqualTo(bufScore(j), Literal(Double.NegativeInfinity)),
          Literal(0), Literal(1))
      }
      .reduce(Add(_, _))
    Slice(CreateArray(structs), Literal(1), size)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)

  override def prettyName: String = "top_k_by_score"
}

/** [[TopKByScore]]'s integer twin for DISTANCE ranking: the group's k
  * best (id, dist) pairs under (dist ASC, id ASC), best (smallest)
  * first — the exact rows of `row_number().over(partitionBy(g)
  * .orderBy(dist.asc, id.asc)).filter(_ <= k)` for the ADC/L2 re-ranks,
  * whose scores are exact BIGINT squared distances (keeping them LongType
  * end to end; a double-typed score would silently round past 2^53).
  * Same flat fixed-width buffer / HashAggregate / no-candidate-sort
  * rationale as [[TopKByScore]]; empty slots hold (Long.MaxValue,
  * Long.MaxValue) sentinels, which real candidates always outrank
  * (integer squared distances are < 2^62 by construction). */
case class TopKByLongAsc(dist: Expression, id: Expression, k: Int)
  extends DeclarativeAggregate with BinaryLike[Expression] {

  require(k >= 1, s"top_k_by_long_asc: k ($k) must be >= 1")

  override def left: Expression = dist
  override def right: Expression = id

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dist", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  private lazy val bufDist: IndexedSeq[AttributeReference] =
    (0 until k).map(j => AttributeReference(s"topk_d$j", LongType, nullable = false)())
  private lazy val bufId: IndexedSeq[AttributeReference] =
    (0 until k).map(j => AttributeReference(s"topk_i$j", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = bufDist ++ bufId

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(2 * k)(Literal(Long.MaxValue))

  /** Strict "candidate (cd, ci) outranks slot (sd, si)" under
    * (dist ASC, id ASC). */
  private def outranks(cd: Expression, ci: Expression,
                       sd: Expression, si: Expression): Expression =
    Or(LessThan(cd, sd), And(EqualTo(cd, sd), LessThan(ci, si)))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(dist), IsNotNull(id))
    val beats = (0 until k).map(j => outranks(dist, id, bufDist(j), bufId(j)))
    val newDists = (0 until k).map { j =>
      val landed = if (j == 0) dist else If(beats(j - 1), bufDist(j - 1), dist)
      If(And(valid, beats(j)), landed, bufDist(j))
    }
    val newIds = (0 until k).map { j =>
      val landed = if (j == 0) id else If(beats(j - 1), bufId(j - 1), id)
      If(And(valid, beats(j)), landed, bufId(j))
    }
    (newDists ++ newIds).map(KnownNotNull)
  }

  // merge = sort the 2k-entry union ascending by (dist, id) and keep k;
  // sentinels sort last naturally
  override lazy val mergeExpressions: Seq[Expression] = {
    def entry(d: Expression, i: Expression): Expression =
      CreateNamedStruct(Seq(Literal("d"), d, Literal("i"), i))
    val all = (0 until k).flatMap { j =>
      Seq(entry(bufDist(j).left, bufId(j).left),
        entry(bufDist(j).right, bufId(j).right))
    }
    val sorted = SortArray(CreateArray(all), Literal(true))
    val newDists = (0 until k).map { j =>
      KnownNotNull(GetStructField(ElementAt(sorted, Literal(j + 1)), 0, Some("d")))
    }
    val newIds = (0 until k).map { j =>
      KnownNotNull(GetStructField(ElementAt(sorted, Literal(j + 1)), 1, Some("i")))
    }
    newDists ++ newIds
  }

  override lazy val evaluateExpression: Expression = {
    val structs = (0 until k).map { j =>
      CreateNamedStruct(Seq(
        Literal("id"), bufId(j), Literal("dist"), bufDist(j)))
    }
    val size = (0 until k)
      .map[Expression] { j =>
        If(EqualTo(bufDist(j), Literal(Long.MaxValue)), Literal(0), Literal(1))
      }
      .reduce(Add(_, _))
    Slice(CreateArray(structs), Literal(1), size)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByLongAsc =
    copy(dist = newLeft, id = newRight)

  override def prettyName: String = "top_k_by_long_asc"
}

object TopKExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column bridge: per-group array of the k best (id, score) pairs by
    * (score DESC, id ASC), best first. Scores must be finite and non-NaN
    * (see [[TopKByScore]]). */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    column(TopKByScore(expression(score), expression(id), k).toAggregateExpression())

  /** Column bridge: per-group array of the k best (id, dist) pairs by
    * (dist ASC, id ASC), best first (see [[TopKByLongAsc]]). */
  def topKByLongAsc(dist: Column, id: Column, k: Int): Column =
    column(TopKByLongAsc(expression(dist), expression(id), k).toAggregateExpression())
}
