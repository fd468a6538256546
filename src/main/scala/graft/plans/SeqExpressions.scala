package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, MapType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for E5/E6 (`fastx_parsers.py:30-41,52-67`) —
  * the codegen upgrade over the Scala-UDF path (SURVEY §7.5):
  *
  *  - no `ScalaUDF` wrapper: the generated code calls a static helper
  *    directly inside whole-stage codegen (no per-row closure dispatch,
  *    no encoder/`CatalystTypeConverters` round-trip of the Map — the
  *    helper builds `ArrayBasedMapData` straight from primitive arrays);
  *  - single UTF-8 pass: windows are compared byte-wise on the UTF8String
  *    (FASTX is ASCII), uppercasing per window without materializing an
  *    uppercase copy of the sequence.
  *
  * Exactly the reference algorithms: overlapping windows for k-mers,
  * stride-k complete windows for codons, uppercase-then-N-skip, count/total
  * over kept windows, empty map when nothing is kept.
  */
object SeqWindowFreq {

  /** Windows ≤ 8 bytes pack into a Long (uppercased bytes, big-endian) and
    * count through this open-addressing long→int map — ZERO allocation per
    * window, where the HashMap[String] form allocated a byte[] + String +
    * boxed Integer per corpus byte (measured as the whole cost of the
    * k-mer family at 100×: one window per position at step 1). Distinct
    * windows per doc are few (≤ alphabet^k), so the map stays tiny and
    * cache-resident; keys decode back to UTF8Strings only at the end. */
  private[plans] final class PackedCounts(k: Int) {
    // Long.MinValue is the slot sentinel, but it IS a reachable key at
    // k=8 (window bytes 0x80 00 00 00 00 00 00 00), so that one key is
    // counted out-of-table instead of colliding with empty slots.
    private val Empty = Long.MinValue
    private var minKeyCount = 0
    private var cap = 64
    private var keys = {
      val a = new Array[Long](cap)
      java.util.Arrays.fill(a, Empty)
      a
    }
    private var vals = new Array[Int](cap)
    var size = 0

    def add(key: Long): Unit = {
      if (key == Empty) {
        if (minKeyCount == 0) size += 1
        minKeyCount += 1
        return
      }
      var idx = (java.lang.Long.hashCode(key * -7046029254386353131L)
        & (cap - 1))
      while (keys(idx) != Empty && keys(idx) != key) idx = (idx + 1) & (cap - 1)
      if (keys(idx) == Empty) {
        keys(idx) = key
        vals(idx) = 1
        size += 1
        if (size * 2 > cap) grow()
      } else vals(idx) += 1
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap *= 2
      keys = new Array[Long](cap)
      java.util.Arrays.fill(keys, Empty)
      vals = new Array[Int](cap)
      var i = 0
      while (i < ok.length) {
        if (ok(i) != Empty) {
          var idx = (java.lang.Long.hashCode(ok(i) * -7046029254386353131L)
            & (cap - 1))
          while (keys(idx) != Empty) idx = (idx + 1) & (cap - 1)
          keys(idx) = ok(i)
          vals(idx) = ov(i)
        }
        i += 1
      }
    }

    /** Decode every entry: `f(packedKey, count)`. */
    def foreach(f: (Long, Int) => Unit): Unit = {
      if (minKeyCount > 0) f(Empty, minKeyCount)
      var i = 0
      while (i < cap) {
        if (keys(i) != Empty) f(keys(i), vals(i))
        i += 1
      }
    }
  }

  @inline private[plans] def unpack(key: Long, k: Int): UTF8String = {
    val b = new Array[Byte](k)
    var j = 0
    while (j < k) {
      b(j) = ((key >>> ((k - 1 - j) * 8)) & 0xff).toByte
      j += 1
    }
    UTF8String.fromBytes(b)
  }

  /** Uppercase + N-skip window scan; returns (map, total kept). Windows
    * are BYTE-level (FASTX is ASCII, where byte ≡ char — every oracle
    * fixture is ASCII-verified); on non-ASCII input the packed keys keep
    * the raw window bytes rather than the String-decode path's lossy
    * U+FFFD collapse of distinct invalid sequences. */
  /** Widths ≤ this ride the zero-alloc packed-Long kernel; wider windows
    * (e.g. genomics k=31) fall back to [[scanWide]]'s String-keyed map. */
  private[plans] val PackedKeyMaxK = 8

  private def emptyMap: MapData =
    new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
      new GenericArrayData(Array.empty[Any]))

  /** String-keyed fallback scan for k > [[PackedKeyMaxK]]: identical
    * uppercase/N-skip window semantics, keyed by the uppercased window
    * bytes. One byte[] + one byte pass per window — fine for the rare
    * wide-k path; narrow k stays on the zero-alloc [[scan]]. */
  private[graft] def scanWide(seq: UTF8String, k: Int, step: Int)
      : (java.util.HashMap[UTF8String, Array[Long]], Long) = {
    require(step >= 1, s"window step must be >= 1, got $step") // a 0 step would never advance
    val bytes = seq.getBytes
    val n = bytes.length
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var total = 0L
    var i = 0
    while (i + k <= n) {
      // single uppercase+N pass building the key bytes as it goes; an
      // N-window discards the buffer (one dead alloc, no second byte walk)
      val w = new Array[Byte](k)
      var j = 0
      var hasN = false
      while (j < k) {
        var b = bytes(i + j)
        if (b >= 'a' && b <= 'z') b = (b - 32).toByte
        if (b == 'N') hasN = true
        w(j) = b
        j += 1
      }
      if (!hasN) {
        total += 1
        val key = UTF8String.fromBytes(w)
        val cur = counts.get(key)
        if (cur == null) counts.put(key, Array(1L)) else cur(0) += 1
      }
      i += step
    }
    (counts, total)
  }

  /** Sorted-key entries of a [[scanWide]] map — UTF8String.compareTo is
    * unsigned byte-lexicographic, matching the packed path's
    * `Long.compareUnsigned` ordering on equal-width windows. */
  private[graft] def wideSorted(m: java.util.HashMap[UTF8String, Array[Long]])
      : Array[java.util.Map.Entry[UTF8String, Array[Long]]] = {
    val arr = m.entrySet().toArray(
      new Array[java.util.Map.Entry[UTF8String, Array[Long]]](m.size))
    java.util.Arrays.sort(arr,
      (a: java.util.Map.Entry[UTF8String, Array[Long]],
       b: java.util.Map.Entry[UTF8String, Array[Long]]) =>
        a.getKey.compareTo(b.getKey))
    arr
  }

  private def wideCountsMap(m: java.util.HashMap[UTF8String, Array[Long]]): MapData = {
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    var idx = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(idx) = e.getKey
      vals(idx) = e.getValue()(0)
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  private[plans] def scan(seq: UTF8String, k: Int, step: Int): (PackedCounts, Long) = {
    require(k <= PackedKeyMaxK, s"window width $k exceeds the 8-byte packed-key limit")
    require(step >= 1, s"window step must be >= 1, got $step") // a 0 step would never advance
    val bytes = seq.getBytes
    val n = bytes.length
    val counts = new PackedCounts(k)
    var total = 0L
    var i = 0
    while (i + k <= n) {
      var j = 0
      var hasN = false
      var key = 0L
      while (j < k) {
        var b = bytes(i + j)
        if (b >= 'a' && b <= 'z') b = (b - 32).toByte // ASCII uppercase
        if (b == 'N') hasN = true
        key = (key << 8) | (b & 0xffL)
        j += 1
      }
      if (!hasN) {
        total += 1
        counts.add(key)
      }
      i += step
    }
    (counts, total)
  }

  /** Count map variant: {window → count} over kept windows (LongType
    * values). The explode queries build on this — per-doc counts need no
    * cross-row aggregation at all, so the whole pipeline is shuffle-free
    * until the output sort. */
  def computeCounts(seq: UTF8String, k: Int, step: Int): MapData = {
    if (k <= 0) return emptyMap // UDF-reference semantics: k <= 0 -> {}
    if (k > PackedKeyMaxK) return wideCountsMap(scanWide(seq, k, step)._1)
    val (counts, _) = scan(seq, k, step)
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    var idx = 0
    counts.foreach { (key, cnt) =>
      keys(idx) = unpack(key, k)
      vals(idx) = cnt.toLong
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** [[computeCounts]] plus the kept-window total from the same scan. */
  /** DUST-style complexity stats in the same packed-key pass:
    * (Σ c·(c−1)/2 over window counts, total kept windows) — the fused
    * form of exploding [[computeCountsTotal]]'s map and re-aggregating
    * per doc (one shuffle saved; the product of consecutive integers is
    * even, so the /2 is exact integer arithmetic). */
  def computeDustStats(seq: UTF8String, k: Int, step: Int): InternalRow = {
    if (k <= 0) return InternalRow(0L, 0L)
    if (k > PackedKeyMaxK) {
      val (m, total) = scanWide(seq, k, step)
      var num = 0L
      val it = m.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        num += c * (c - 1L) / 2L
      }
      return InternalRow(num, total)
    }
    val (counts, total) = scan(seq, k, step)
    var num = 0L
    counts.foreach { (_, cnt) =>
      val c = cnt.toLong
      num += c * (c - 1L) / 2L
    }
    InternalRow(num, total)
  }

  def computeCountsTotal(seq: UTF8String, k: Int, step: Int): InternalRow = {
    if (k <= 0) return InternalRow(emptyMap, 0L)
    if (k > PackedKeyMaxK) {
      val (m, total) = scanWide(seq, k, step)
      return InternalRow(wideCountsMap(m), total)
    }
    val (counts, total) = scan(seq, k, step)
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    var idx = 0
    counts.foreach { (key, cnt) =>
      keys(idx) = unpack(key, k)
      vals(idx) = cnt.toLong
      idx += 1
    }
    InternalRow(
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals)),
      total)
  }

  /** Shared window-frequency kernel. `step` = 1 (k-mers) or k (codons). */
  def compute(seq: UTF8String, k: Int, step: Int): MapData = {
    if (k <= 0) return emptyMap
    if (k > PackedKeyMaxK) {
      val (m, total) = scanWide(seq, k, step)
      val keys = new Array[Any](m.size)
      val vals = new Array[Any](m.size)
      val tot = total.toDouble
      var idx = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(idx) = e.getKey
        vals(idx) = e.getValue()(0).toDouble / tot
        idx += 1
      }
      return new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
    }
    val (counts, total) = scan(seq, k, step)
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    val tot = total.toDouble
    var idx = 0
    counts.foreach { (key, cnt) =>
      keys(idx) = unpack(key, k)
      vals(idx) = cnt.toDouble / tot
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** Minimizer sketching (Roberts et al. 2004; the k-mer sub-sampling
  * primitive of modern genomics mappers/assemblers — public literature):
  * for every window of `w` consecutive k-mer positions, the minimizer is
  * the lexicographically smallest valid k-mer in the window; the distinct
  * minimizers (≈ 2/(w+1) of all positions) are a locality-preserving
  * sketch of the sequence. Same alphabet semantics as [[SeqWindowFreq]]:
  * per-byte ASCII uppercase, k-mers containing 'N' are invalid (a window
  * with no valid k-mer yields nothing). Unsigned packed-Long comparison on
  * equal-width big-endian windows IS byte-lexicographic order.
  *
  * One pass per document: packed grams + a monotonic index deque gives
  * O(positions) amortized — no per-window rescan, no allocation beyond the
  * gram arrays. Returns {minimizer → number of windows it minimizes}
  * (values sum to the count of non-empty windows). */
object MinimizerOps {

  def computeCounts(seq: UTF8String, k: Int, w: Int): MapData = {
    require(k >= 1, s"minimizer k must be >= 1, got $k")
    require(w >= 1, "window must be >= 1")
    if (k > SeqWindowFreq.PackedKeyMaxK) return computeCountsWide(seq, k, w)
    val bytes = seq.getBytes
    val n = bytes.length
    val p = n - k + 1
    val counts = new SeqWindowFreq.PackedCounts(k)
    if (p >= w) {
      val grams = new Array[Long](p)
      val valid = new Array[Boolean](p)
      var i = 0
      while (i < p) {
        var key = 0L
        var hasN = false
        var j = 0
        while (j < k) {
          var b = bytes(i + j)
          if (b >= 'a' && b <= 'z') b = (b - 32).toByte
          if (b == 'N') hasN = true
          key = (key << 8) | (b & 0xffL)
          j += 1
        }
        grams(i) = key
        valid(i) = !hasN
        i += 1
      }
      // monotonic deque of valid positions, gram values strictly increasing
      val dq = new Array[Int](p)
      var head = 0
      var tail = 0
      var pos = 0
      while (pos < p) {
        if (valid(pos)) {
          while (tail > head &&
            java.lang.Long.compareUnsigned(grams(dq(tail - 1)), grams(pos)) >= 0)
            tail -= 1
          dq(tail) = pos
          tail += 1
        }
        while (tail > head && dq(head) < pos - w + 1) head += 1
        if (pos >= w - 1 && tail > head) counts.add(grams(dq(head)))
        pos += 1
      }
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    var idx = 0
    counts.foreach { (key, cnt) =>
      keys(idx) = SeqWindowFreq.unpack(key, k)
      vals(idx) = cnt.toLong
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Wide-k path (k > 8 — minimap2's k=15, assembler k=31 regimes; the
    * same defect class the r10 wide-k kmer fallback fixed, extended to
    * the minimizer kernel per VERDICT r10 item 2): k-mers no longer fit a
    * packed Long, so the whole sequence is uppercased ONCE into a side
    * buffer, validity comes from a rolling N-count, and the monotonic
    * deque compares window positions directly against that buffer —
    * unsigned byte-lexicographic, identical to the packed path's
    * `Long.compareUnsigned` order on equal-width windows. O(positions)
    * deque pushes/pops with an O(k) compare per push — O(p·k) worst case,
    * the same bound as building the packed grams. Map keys are zero-copy
    * views into the shared uppercased buffer; a repeated deque head
    * reuses its count cell instead of re-hashing. */
  private def computeCountsWide(seq: UTF8String, k: Int, w: Int): MapData = {
    val bytes = seq.getBytes
    val n = bytes.length
    val p = n - k + 1
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    if (p >= w) {
      val up = new Array[Byte](n)
      var i = 0
      while (i < n) {
        var b = bytes(i)
        if (b >= 'a' && b <= 'z') b = (b - 32).toByte
        up(i) = b
        i += 1
      }
      // valid(pos) = window [pos, pos+k) is N-free, via a rolling count
      val valid = new Array[Boolean](p)
      var nN = 0
      i = 0
      while (i < n) {
        if (up(i) == 'N') nN += 1
        if (i >= k && up(i - k) == 'N') nN -= 1
        if (i >= k - 1) valid(i - k + 1) = nN == 0
        i += 1
      }
      // unsigned byte-lexicographic compare of the k-windows at a and b
      def cmp(a: Int, b: Int): Int = {
        var j = 0
        while (j < k) {
          val d = (up(a + j) & 0xff) - (up(b + j) & 0xff)
          if (d != 0) return d
          j += 1
        }
        0
      }
      val dq = new Array[Int](p)
      var head = 0
      var tail = 0
      var pos = 0
      var lastPos = -1
      var lastCell: Array[Long] = null
      while (pos < p) {
        if (valid(pos)) {
          while (tail > head && cmp(dq(tail - 1), pos) >= 0) tail -= 1
          dq(tail) = pos
          tail += 1
        }
        while (tail > head && dq(head) < pos - w + 1) head += 1
        if (pos >= w - 1 && tail > head) {
          val m = dq(head)
          if (m == lastPos) lastCell(0) += 1
          else {
            val key = UTF8String.fromBytes(up, m, k)
            var cell = counts.get(key)
            if (cell == null) { cell = Array(1L); counts.put(key, cell) }
            else cell(0) += 1
            lastPos = m
            lastCell = cell
          }
        }
        pos += 1
      }
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    var idx = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(idx) = e.getKey
      vals(idx) = e.getValue()(0)
      idx += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

/** `minimizer_counts(seq, k, w)` — [[MinimizerOps.computeCounts]]. */
case class MinimizerCountsExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinimizerOps.computeCounts(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinimizerOps.computeCounts($c, $k, $w)")
  override def prettyName: String = "minimizer_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

abstract class SeqWindowFreqExpression extends UnaryExpression {
  def k: Int
  def step: Int
  override def dataType: DataType = MapType(StringType, DoubleType, valueContainsNull = false)
  override def nullSafeEval(input: Any): Any =
    SeqWindowFreq.compute(input.asInstanceOf[UTF8String], k, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SeqWindowFreq.compute($c, $k, $step)")
}

/** E6 — overlapping k-mer frequencies, native. */
case class KmerFrequenciesExpr(child: Expression, k: Int) extends SeqWindowFreqExpression {
  override def step: Int = 1
  override def prettyName: String = "kmer_frequencies"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Window COUNT map (LongType values) — the shuffle-free building block
  * for the explode queries. */
case class SeqWindowCountsExpr(child: Expression, k: Int, step: Int)
  extends UnaryExpression {
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullSafeEval(input: Any): Any =
    SeqWindowFreq.computeCounts(input.asInstanceOf[UTF8String], k, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SeqWindowFreq.computeCounts($c, $k, $step)")
  override def prettyName: String = "seq_window_counts"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct(counts: Map[String,Long], total: Long) in one scan — the explode
  * queries' building block. The separate `aggregate(map_values(counts))`
  * total fold was CodegenFallback, which evaluates its ENTIRE child
  * subtree interpreted — including the count-map scan itself when
  * CollapseProject inlines it. Here the total falls out of the same
  * packed-key pass that builds the map. */
case class WindowCountsTotalExpr(child: Expression, k: Int, step: Int)
  extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("counts",
      MapType(StringType, LongType, valueContainsNull = false), nullable = false),
    StructField("total", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    SeqWindowFreq.computeCountsTotal(input.asInstanceOf[UTF8String], k, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SeqWindowFreq.computeCountsTotal($c, $k, $step)")
  override def prettyName: String = "window_counts_total"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `window_dust_stats(s, k, step)` — [[SeqWindowFreq.computeDustStats]]. */
case class WindowDustStatsExpr(child: Expression, k: Int, step: Int)
  extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dust_num", LongType, nullable = false),
    StructField("total", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    SeqWindowFreq.computeDustStats(input.asInstanceOf[UTF8String], k, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SeqWindowFreq.computeDustStats($c, $k, $step)")
  override def prettyName: String = "window_dust_stats"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** E5 — non-overlapping codon usage (k=3, stride 3), native. */
case class CodonUsageExpr(child: Expression) extends SeqWindowFreqExpression {
  override def k: Int = 3
  override def step: Int = 3
  override def prettyName: String = "codon_usage"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted `GRAM=count,…` window-count encoding — the one-pass collapse of
  * `concat_ws(",", transform(array_sort(map_entries(counts)), e →
  * concat(key, "=", value)))` + the `aggregate` total fold (both
  * CodegenFallback, both per doc). Packed keys sort with
  * `Long.compareUnsigned`, which for equal-length big-endian-packed
  * windows IS byte-lexicographic order — exactly `array_sort`'s binary
  * UTF8String comparison on the struct's key field (keys are unique, so
  * the value field never breaks ties). Returns
  * struct(n_kmers, total, kmer_enc); a windowless doc returns (0, 0, "")
  * matching the columnar form's empty-map results. */
object KmerEnc {

  def compute(seq: UTF8String, k: Int, step: Int): InternalRow = {
    if (k <= 0) return InternalRow(0L, 0L, UTF8String.EMPTY_UTF8)
    if (k > SeqWindowFreq.PackedKeyMaxK) return computeWide(seq, k, step)
    val (counts, total) = SeqWindowFreq.scan(seq, k, step)
    val m = counts.size
    val ks = new Array[Long](m)
    val vs = new Array[Int](m)
    var idx = 0
    counts.foreach { (key, cnt) =>
      ks(idx) = key; vs(idx) = cnt; idx += 1
    }
    // index sort by unsigned packed key = lexicographic gram order
    val order = new Array[Integer](m)
    var i = 0
    while (i < m) { order(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(order,
      (a: Integer, b: Integer) => java.lang.Long.compareUnsigned(ks(a), ks(b)))
    // raw-byte assembly (no char re-encode — grams carry the window's
    // exact bytes, like the map keys of the columnar form)
    var buf = new Array[Byte](math.max(16, m * (k + 8)))
    var pos = 0
    @inline def ensure(extra: Int): Unit =
      if (pos + extra > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, pos + extra))
      }
    i = 0
    while (i < m) {
      val digits = Integer.toString(vs(order(i)))
      ensure(k + digits.length + 2)
      if (i > 0) { buf(pos) = ','; pos += 1 }
      val key = ks(order(i))
      var j = 0
      while (j < k) {
        buf(pos) = ((key >>> ((k - 1 - j) * 8)) & 0xff).toByte
        pos += 1
        j += 1
      }
      buf(pos) = '='; pos += 1
      var d = 0
      while (d < digits.length) { buf(pos) = digits.charAt(d).toByte; pos += 1; d += 1 }
      i += 1
    }
    InternalRow(m.toLong, total,
      UTF8String.fromBytes(java.util.Arrays.copyOf(buf, pos)))
  }

  /** k > 8 fallback: same sorted `GRAM=count,…` encoding over the
    * String-keyed wide scan (binary key sort ≡ the packed unsigned-Long
    * order on equal-width windows). */
  private def computeWide(seq: UTF8String, k: Int, step: Int): InternalRow = {
    val (m, total) = SeqWindowFreq.scanWide(seq, k, step)
    val entries = SeqWindowFreq.wideSorted(m)
    val out = new java.io.ByteArrayOutputStream(math.max(16, entries.length * (k + 8)))
    var i = 0
    while (i < entries.length) {
      if (i > 0) out.write(',')
      out.write(entries(i).getKey.getBytes)
      out.write('=')
      val digits = java.lang.Long.toString(entries(i).getValue()(0))
      var d = 0
      while (d < digits.length) { out.write(digits.charAt(d)); d += 1 }
      i += 1
    }
    InternalRow(entries.length.toLong, total, UTF8String.fromBytes(out.toByteArray))
  }

  val schema: StructType = StructType(Seq(
    StructField("n_kmers", LongType, nullable = false),
    StructField("total", LongType, nullable = false),
    StructField("kmer_enc", StringType, nullable = false)))
}

/** `kmer_enc(seq, k, step)` — [[KmerEnc]] as a codegen'd expression. */
case class KmerEncExpr(child: Expression, k: Int, step: Int)
  extends UnaryExpression {
  override def dataType: DataType = KmerEnc.schema
  override def nullSafeEval(input: Any): Any =
    KmerEnc.compute(input.asInstanceOf[UTF8String], k, step)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KmerEnc.compute($c, $k, $step)")
  override def prettyName: String = "kmer_enc"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SeqExpressions {
  // Spark 4 moved Column off Expression; the bridge converts both ways
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def kmerFrequenciesNative(c: Column, k: Int = 3): Column =
    column(KmerFrequenciesExpr(expression(c), k))
  def codonUsageNative(c: Column): Column =
    column(CodonUsageExpr(expression(c)))

  /** {window → count} map (k-mers: step 1; codons: step k). */
  /** struct(counts, total) from one scan — the explode queries' source. */
  def windowCountsTotal(c: Column, k: Int, step: Int): Column =
    column(WindowCountsTotalExpr(expression(c), k, step))

  def windowDustStats(c: Column, k: Int, step: Int): Column =
    column(WindowDustStatsExpr(expression(c), k, step))

  def windowCounts(c: Column, k: Int, step: Int): Column =
    column(SeqWindowCountsExpr(expression(c), k, step))

  /** struct(n_kmers, total, sorted "GRAM=count,…" encoding). */
  def kmerEnc(c: Column, k: Int, step: Int): Column =
    column(KmerEncExpr(expression(c), k, step))

  /** {minimizer → windows minimized} (see [[MinimizerOps]]). */
  def minimizerCounts(c: Column, k: Int, w: Int): Column =
    column(MinimizerCountsExpr(expression(c), k, w))

  /** SQL registration: `SELECT kmer_frequencies(seq, 3)`. Delegates to
    * the single shared function table in [[graft.GraftExtensions]] — one
    * builder per function, one argument-coercion rule, regardless of
    * which registration path a session used. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    graft.GraftExtensions.register(spark)
}
