package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StructField, StructType}

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

  /** Fixed-point quantization of one ARRAY<FLOAT> embedding:
    * vq[i] = floor(v[i]·2^20) as BIGINT — the fused form of
    * `transform(vec, v => floor(v.cast("double") * 2^20).cast("long"))`.
    * `transform` is CodegenFallback, which evaluates its entire child
    * subtree interpreted per row — measured as the dominant cost of the
    * similarity family's scans at the 1000× fixture. Identical math:
    * float→double widening is exact, ×2^20 is an exponent shift,
    * Math.floor→toLong is Spark's Floor(double) semantics. Elements are
    * assumed non-null (embedding fixtures; same contract as longDot). */
  def quantizeVec(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      // fail loud, not garbage: getFloat on a null slot reads junk bytes
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"quantize_vec: null element at position $i — embedding vectors must be dense")
      out(i) = math.floor(a.getFloat(i).toDouble * 1048576d).toLong
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** SQ8 scalar-quantization encode of one quantized (Q20 BIGINT) vector
    * against fixed per-dimension (mins, ranges):
    * c[i] = clamp(((vq[i] − mins[i]) · 255) div max(ranges[i], 1), 0, 255).
    * Operands are non-negative (mins are corpus minima), so Scala's
    * truncating `/` IS floor division — identical to the oracle's `//`. */
  def sq8Encode(a: ArrayData, mins: Array[Long], ranges: Array[Long]): ArrayData = {
    val n = a.numElements()
    require(n == mins.length,
      s"sq8_encode: dimension mismatch $n vs ${mins.length}")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val c = (a.getLong(i) - mins(i)) * 255L / math.max(ranges(i), 1L)
      out(i) = math.min(math.max(c, 0L), 255L)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** SQ8 decode (reconstruction): dq[i] = mins[i] + (c[i] · ranges[i])
    * div 255 — the dequantized BIGINT vector the ADC distance runs on. */
  def sq8Decode(a: ArrayData, mins: Array[Long], ranges: Array[Long]): ArrayData = {
    val n = a.numElements()
    require(n == mins.length,
      s"sq8_decode: dimension mismatch $n vs ${mins.length}")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = mins(i) + a.getLong(i) * ranges(i) / 255L
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Nearest-centroid assignment against a FIXED centroid matrix: argmin
    * over cells of exact integer squared L2 distance, tie → lowest cell id
    * (`ids` must be sorted ascending; first-win on `<` then equals
    * `array_min`'s lexicographic (d, cell) order). One tight k·d primitive
    * loop per row — the scalable replacement for the k-branch
    * `array_min(array(struct(long_dist2(…), cell), …))` expression tree,
    * which exceeds codegen method limits and pays per-branch dispatch as
    * k grows (SemDeDup wants k in the thousands; the paper uses 50 000).
    * The matrix rides along as ONE codegen reference object (k·d longs —
    * 25 MB even at k=50 000, d=64 — broadcast to executors inside the
    * serialized plan exactly like the literal tree was). */
  def argminCell(a: ArrayData, ids: Array[Int], cents: Array[Array[Long]]): Int = {
    val v = a.toLongArray()
    var best = 0L
    var bestIdx = -1
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      require(v.length == ct.length,
        s"argminCell: dimension mismatch ${v.length} vs ${ct.length}")
      // deliberately a PLAIN counted fold, no early abandon: at d = 64
      // both per-dim and 16-dim-chunked partial-distance pruning measured
      // SLOWER than this loop (157 → 198 / 186 s on the 2 M × k = 2048
      // assignment, round 11) — the branchy bound defeats C2
      // auto-vectorization and the savings don't cover it at small d
      var s = 0L
      var i = 0
      while (i < v.length) { val d = v(i) - ct(i); s += d * d; i += 1 }
      if (bestIdx < 0 || s < best) { best = s; bestIdx = c }
      c += 1
    }
    ids(bestIdx)
  }

  /** [[argminCell]] plus the winning distance: (cell id, squared L2 to the
    * assigned centroid) — SemDeDup's keep-rule needs the distance and it
    * falls out of the same k·d loop. */
  def argminCellDist(a: ArrayData, ids: Array[Int], cents: Array[Array[Long]]): InternalRow = {
    val v = a.toLongArray()
    var best = 0L
    var bestIdx = -1
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      require(v.length == ct.length,
        s"argminCellDist: dimension mismatch ${v.length} vs ${ct.length}")
      // plain fold, no early abandon — see argminCell for the measured
      // negative result on pruning at d = 64
      var s = 0L
      var i = 0
      while (i < v.length) { val d = v(i) - ct(i); s += d * d; i += 1 }
      if (bestIdx < 0 || s < best) { best = s; bestIdx = c }
      c += 1
    }
    InternalRow(ids(bestIdx), best)
  }

  /** [[argminCell]] plus the RESIDUAL against the winning centroid:
    * (cell id, vq − centroid) in one k·d pass — the IVF-PQ index build
    * (FAISS IVFADC) needs exactly this pair and fusing them avoids a
    * second full-corpus assignment scan. Same plain fold, same
    * first-win (d, cell) tie rule as [[argminCell]]. */
  def argminResidual(a: ArrayData, ids: Array[Int], cents: Array[Array[Long]]): InternalRow = {
    val v = a.toLongArray()
    var best = 0L
    var bestIdx = -1
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      require(v.length == ct.length,
        s"argminResidual: dimension mismatch ${v.length} vs ${ct.length}")
      var s = 0L
      var i = 0
      while (i < v.length) { val d = v(i) - ct(i); s += d * d; i += 1 }
      if (bestIdx < 0 || s < best) { best = s; bestIdx = c }
      c += 1
    }
    val ct = cents(bestIdx)
    val res = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { res(i) = v(i) - ct(i); i += 1 }
    InternalRow(ids(bestIdx),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(res))
  }

  /** [[argminCell]] extended to the `p` NEAREST cells (round 13, for the
    * corpus-wide self-kNN graph): one k·d pass with a p-slot insertion
    * list, returning cell ids ordered by (d, cell id) ascending — element
    * 0 is exactly [[argminCell]]'s answer. Strict `<` comparisons keep the
    * earlier (lower, since ids arrive sorted) cell on distance ties, the
    * same first-win rule as argminCell, so the DuckDB replay is the plain
    * `row_number() OVER (ORDER BY d, cell) <= p` window. `p` is bound at
    * plan time and tiny (nProbe), so the insertion list stays in
    * registers; same no-early-abandon rationale as [[argminCell]]. */
  def topCells(a: ArrayData, ids: Array[Int], cents: Array[Array[Long]], p: Int): ArrayData = {
    val v = a.toLongArray()
    val take = math.min(p, cents.length)
    val bd = new Array[Long](take)
    val bi = new Array[Int](take)
    var filled = 0
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      require(v.length == ct.length,
        s"topCells: dimension mismatch ${v.length} vs ${ct.length}")
      var s = 0L
      var i = 0
      while (i < v.length) { val d = v(i) - ct(i); s += d * d; i += 1 }
      if (filled < take) {
        var j = filled
        while (j > 0 && bd(j - 1) > s) { bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bd(j) = s; bi(j) = ids(c); filled += 1
      } else if (s < bd(take - 1)) {
        var j = take - 1
        while (j > 0 && bd(j - 1) > s) { bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bd(j) = s; bi(j) = ids(c)
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bi, filled))
  }

  /** [[argminCell]] for an ARRAY<FLOAT> vector against double centroids
    * (the float-mean IVF variant): components are widened float→double
    * exactly like `x.cast("double")`, the per-cell distance is the SAME
    * sequential left fold as the `aggregate(zip_with(…))` HOF it replaces
    * (identical IEEE operation sequence), and ties fall to the lowest cell
    * via first-win on Double.compare — `array_min`'s (d, cell) order. */
  def argminCellD(a: ArrayData, ids: Array[Int], cents: Array[Array[Double]]): Int = {
    val n = a.numElements()
    var best = 0d
    var bestIdx = -1
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      require(n == ct.length, s"argminCellD: dimension mismatch $n vs ${ct.length}")
      var s = 0d
      var i = 0
      while (i < n) {
        val d = a.getFloat(i).toDouble - ct(i)
        s += d * d
        i += 1
      }
      if (bestIdx < 0 || java.lang.Double.compare(s, best) < 0) { best = s; bestIdx = c }
      c += 1
    }
    ids(bestIdx)
  }

  /** Int8 quantization error stats over one ARRAY<FLOAT> embedding — the
    * fused form of q_vector_quantize's three CodegenFallback HOFs
    * (`transform` err array + `aggregate` left-fold + `array_max`), each
    * of which re-walked the row interpreted. Exact replication:
    * per element xd = (double) x, q = clamp(floor(xd·127), ±127) with
    * Spark's `Floor(double) → Math.floor(…).toLong` semantics,
    * e = |xd − q/127.0|; l1 is the SAME sequential IEEE left fold as
    * `aggregate(…, 0.0, acc+e)`; max follows array_max's total order
    * (Double.compare — NaN greatest). Empty array → (0, 0.0, null),
    * matching size/aggregate-of-empty/array_max-of-empty. */
  def quantErrStats(a: ArrayData): InternalRow = {
    val n = a.numElements()
    if (n == 0) return InternalRow(0, 0.0d, null)
    var l1 = 0.0d
    var mx = 0.0d
    var first = true
    var i = 0
    while (i < n) {
      val xd = a.getFloat(i).toDouble
      val q = math.max(-127L, math.min(127L, math.floor(xd * 127d).toLong))
      val e = math.abs(xd - q.toDouble / 127.0d)
      l1 += e
      if (first || java.lang.Double.compare(e, mx) > 0) { mx = e; first = false }
      i += 1
    }
    InternalRow(n, l1, mx)
  }

  /** Exact median of a double array: sort a private copy, take the middle
    * element (odd n) or the IEEE midpoint (a+b)/2 of the two middles
    * (even n) — exactly `quantile_cont(0.5)`'s interpolation at the
    * midpoint, so the value is engine-portable (one add + one divide,
    * both correctly rounded). EMPTY → null, matching SQL `median()` over
    * zero non-null values (a collect_list window frame drops nulls, so
    * an all-null frame arrives here as an empty array). */
  def exactMedian(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n == 0) return null
    val arr = new Array[Double](n)
    var i = 0
    while (i < n) { arr(i) = a.getDouble(i); i += 1 }
    java.util.Arrays.sort(arr)
    if ((n & 1) == 1) arr(n / 2) else (arr(n / 2 - 1) + arr(n / 2)) / 2.0d
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

/** `sq8_encode(vq)` against fixed per-dim (mins, ranges) —
  * [[VectorOps.sq8Encode]]. Seq fields for structural equality — see
  * [[ArgminCellExpr]]. */
case class Sq8EncodeExpr(child: Expression, mins: Seq[Long], ranges: Seq[Long])
  extends UnaryExpression {
  @transient private lazy val minsArr: Array[Long] = mins.toArray
  @transient private lazy val rangesArr: Array[Long] = ranges.toArray
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorOps.sq8Encode(input.asInstanceOf[ArrayData], minsArr, rangesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8Mins", minsArr, "long[]")
    val rangesRef = ctx.addReferenceObj("sq8Ranges", rangesArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.sq8Encode($c, $minsRef, $rangesRef)")
  }
  override def prettyName: String = "sq8_encode"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sq8_decode(codes)` — [[VectorOps.sq8Decode]]. Seq fields for
  * structural equality — see [[ArgminCellExpr]]. */
case class Sq8DecodeExpr(child: Expression, mins: Seq[Long], ranges: Seq[Long])
  extends UnaryExpression {
  @transient private lazy val minsArr: Array[Long] = mins.toArray
  @transient private lazy val rangesArr: Array[Long] = ranges.toArray
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorOps.sq8Decode(input.asInstanceOf[ArrayData], minsArr, rangesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("sq8Mins", minsArr, "long[]")
    val rangesRef = ctx.addReferenceObj("sq8Ranges", rangesArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.sq8Decode($c, $minsRef, $rangesRef)")
  }
  override def prettyName: String = "sq8_decode"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `exact_median(arr)` — [[VectorOps.exactMedian]]; null on empty. */
case class ExactMedianExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    VectorOps.exactMedian(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}Box = graft.plans.VectorOps.exactMedian($c);
      if (${ev.value}Box == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}Box.doubleValue();
      }""")
  override def prettyName: String = "exact_median"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `quant_err_stats(embedding)` — [[VectorOps.quantErrStats]]. */
case class QuantErrStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_dims", IntegerType, nullable = false),
    StructField("l1_err", DoubleType, nullable = false),
    StructField("max_err", DoubleType, nullable = true)))
  override def nullSafeEval(input: Any): Any =
    VectorOps.quantErrStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.quantErrStats($c)")
  override def prettyName: String = "quant_err_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `quantize_vec(v)` — [[VectorOps.quantizeVec]]. Accepts ARRAY<FLOAT>
  * only: the kernel reads 4-byte slots, so a silently-accepted
  * ARRAY<DOUBLE> would return garbage at the wrong stride (the transform
  * HOF it replaced accepted any numeric array — the analysis-time check
  * keeps the narrowed domain from failing silently). */
case class QuantizeVecExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_vec expects ARRAY<FLOAT>, got ${other.sql}")
    }
  override def nullSafeEval(input: Any): Any =
    VectorOps.quantizeVec(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorOps.quantizeVec($c)")
  override def prettyName: String = "quantize_vec"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `argmin_cell(vq)` over a fixed centroid matrix — [[VectorOps.argminCell]].
  * The matrix is carried as a codegen reference object, not a literal tree.
  *
  * Fields are `Seq` (not `Array`) so the generated case-class equals/
  * hashCode are STRUCTURAL: array fields compare by reference, which made
  * semantically identical argmin expressions never equal and defeated
  * Catalyst canonicalization / subexpression elimination (ADVICE r10).
  * The kernel still gets flat arrays via transient lazy conversion —
  * built once per (de)serialized expression instance, never per row. */
case class ArgminCellExpr(child: Expression,
                          ids: Seq[Int], cents: Seq[Seq[Long]])
  extends UnaryExpression {
  @transient private lazy val idsArr: Array[Int] = ids.toArray
  @transient private lazy val centsArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    VectorOps.argminCell(input.asInstanceOf[ArrayData], idsArr, centsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", idsArr, "int[]")
    val centsRef = ctx.addReferenceObj("cents", centsArr, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.argminCell($c, $idsRef, $centsRef)")
  }
  override def prettyName: String = "argmin_cell"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `argmin_cell_dist(vq)` — [[VectorOps.argminCellDist]]:
  * struct(cell, d) with the assigned squared distance. Seq fields for
  * structural equality — see [[ArgminCellExpr]]. */
case class ArgminCellDistExpr(child: Expression,
                              ids: Seq[Int], cents: Seq[Seq[Long]])
  extends UnaryExpression {
  @transient private lazy val idsArr: Array[Int] = ids.toArray
  @transient private lazy val centsArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("d", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    VectorOps.argminCellDist(input.asInstanceOf[ArrayData], idsArr, centsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", idsArr, "int[]")
    val centsRef = ctx.addReferenceObj("cents", centsArr, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.argminCellDist($c, $idsRef, $centsRef)")
  }
  override def prettyName: String = "argmin_cell_dist"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `argmin_residual(vq)` — [[VectorOps.argminResidual]]: struct(cell, res)
  * with the residual against the winning centroid. Seq fields for
  * structural equality — see [[ArgminCellExpr]]. */
case class ArgminResidualExpr(child: Expression,
                              ids: Seq[Int], cents: Seq[Seq[Long]])
  extends UnaryExpression {
  @transient private lazy val idsArr: Array[Int] = ids.toArray
  @transient private lazy val centsArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("res", org.apache.spark.sql.types.ArrayType(LongType,
      containsNull = false), nullable = false)))
  override def nullSafeEval(input: Any): Any =
    VectorOps.argminResidual(input.asInstanceOf[ArrayData], idsArr, centsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", idsArr, "int[]")
    val centsRef = ctx.addReferenceObj("cents", centsArr, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.argminResidual($c, $idsRef, $centsRef)")
  }
  override def prettyName: String = "argmin_residual"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `top_cells(vq)` — [[VectorOps.topCells]]: the `p` nearest cells as
  * ARRAY<INT> in (d, cell) order. Seq fields for structural equality —
  * see [[ArgminCellExpr]]. */
case class TopCellsExpr(child: Expression,
                        ids: Seq[Int], cents: Seq[Seq[Long]], p: Int)
  extends UnaryExpression {
  @transient private lazy val idsArr: Array[Int] = ids.toArray
  @transient private lazy val centsArr: Array[Array[Long]] =
    cents.map(_.toArray).toArray
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorOps.topCells(input.asInstanceOf[ArrayData], idsArr, centsArr, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", idsArr, "int[]")
    val centsRef = ctx.addReferenceObj("cents", centsArr, "long[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.topCells($c, $idsRef, $centsRef, $p)")
  }
  override def prettyName: String = "top_cells"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Double-centroid variant — [[VectorOps.argminCellD]]. Seq fields for
  * structural equality — see [[ArgminCellExpr]]. */
case class ArgminCellDExpr(child: Expression,
                           ids: Seq[Int], cents: Seq[Seq[Double]])
  extends UnaryExpression {
  @transient private lazy val idsArr: Array[Int] = ids.toArray
  @transient private lazy val centsArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    VectorOps.argminCellD(input.asInstanceOf[ArrayData], idsArr, centsArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("cellIds", idsArr, "int[]")
    val centsRef = ctx.addReferenceObj("cents", centsArr, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorOps.argminCellD($c, $idsRef, $centsRef)")
  }
  override def prettyName: String = "argmin_cell_d"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Fused fixed-point quantization (see [[VectorOps.quantizeVec]]). */
  def quantizeVec(v: Column): Column =
    column(QuantizeVecExpr(expression(v)))

  import scala.collection.immutable.ArraySeq

  /** Nearest-centroid assignment, BIGINT grid (see [[VectorOps.argminCell]]).
    * `cents` must be sorted by id ascending. The O(1) unsafe array wraps
    * are sound: every caller builds fresh arrays it never mutates after. */
  def argminCell(vq: Column, ids: Array[Int], cents: Array[Array[Long]]): Column =
    column(ArgminCellExpr(expression(vq), ArraySeq.unsafeWrapArray(ids),
      ArraySeq.unsafeWrapArray(cents.map(ArraySeq.unsafeWrapArray))))

  /** Nearest-centroid assignment, double grid. */
  def argminCellD(v: Column, ids: Array[Int], cents: Array[Array[Double]]): Column =
    column(ArgminCellDExpr(expression(v), ArraySeq.unsafeWrapArray(ids),
      ArraySeq.unsafeWrapArray(cents.map(ArraySeq.unsafeWrapArray))))

  /** struct(cell, d): assignment plus the winning squared distance. */
  def argminCellDist(vq: Column, ids: Array[Int], cents: Array[Array[Long]]): Column =
    column(ArgminCellDistExpr(expression(vq), ArraySeq.unsafeWrapArray(ids),
      ArraySeq.unsafeWrapArray(cents.map(ArraySeq.unsafeWrapArray))))

  /** struct(cell, res): assignment plus the residual vq − centroid. */
  def argminResidual(vq: Column, ids: Array[Int], cents: Array[Array[Long]]): Column =
    column(ArgminResidualExpr(expression(vq), ArraySeq.unsafeWrapArray(ids),
      ArraySeq.unsafeWrapArray(cents.map(ArraySeq.unsafeWrapArray))))

  /** ARRAY<INT> of the p nearest cells (see [[VectorOps.topCells]]). */
  def topCells(vq: Column, ids: Array[Int], cents: Array[Array[Long]],
               p: Int): Column =
    column(TopCellsExpr(expression(vq), ArraySeq.unsafeWrapArray(ids),
      ArraySeq.unsafeWrapArray(cents.map(ArraySeq.unsafeWrapArray)), p))

  /** SQ8 encode against fixed per-dim stats (see [[VectorOps.sq8Encode]]). */
  def sq8Encode(vq: Column, mins: Array[Long], ranges: Array[Long]): Column =
    column(Sq8EncodeExpr(expression(vq), ArraySeq.unsafeWrapArray(mins),
      ArraySeq.unsafeWrapArray(ranges)))

  /** SQ8 decode / reconstruction (see [[VectorOps.sq8Decode]]). */
  def sq8Decode(codes: Column, mins: Array[Long], ranges: Array[Long]): Column =
    column(Sq8DecodeExpr(expression(codes), ArraySeq.unsafeWrapArray(mins),
      ArraySeq.unsafeWrapArray(ranges)))

  /** Fused exact integer dot product (see [[VectorOps.longDot]]). */
  def longDot(a: Column, b: Column): Column =
    column(LongDotExpr(expression(a), expression(b)))

  /** Fused exact integer squared L2 distance. */
  def quantErrStats(c: Column): Column =
    column(QuantErrStatsExpr(expression(c)))

  def longDist2(a: Column, b: Column): Column =
    column(LongDist2Expr(expression(a), expression(b)))

  /** Exact median of a non-empty ARRAY<DOUBLE> (see [[VectorOps.exactMedian]]). */
  def exactMedian(c: Column): Column =
    column(ExactMedianExpr(expression(c)))
}
