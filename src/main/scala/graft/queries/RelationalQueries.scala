package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational breadth (SURVEY §2.3): scans, joins, aggregations, windows,
  * set ops, rollup, distinct. All Catalyst built-ins — the plans are what a
  * 1000-executor cluster wants: filters/projections pushed into the parquet
  * scan, small dimensions broadcast (no shuffle of the fact table for the
  * star join), partial aggregation map-side, AQE free to re-plan skew.
  */
object RelationalQueries {

  /** Projection + predicate pushed to the scan; total order on the
    * (l_orderkey, l_linenumber) unique key. */
  def qScanProjectFilter(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val qScanProjectFilterSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Star join: orders ⋈ customer ⋈ nation ⋈ region, revenue per region.
    * nation/region are tiny → explicit broadcast; customer⋈orders shuffles
    * on the join key only. Decimal-cast revenue for exact reproducibility. */
  def qJoinStar(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer")
    val nation = broadcast(t(spark, sfDir, "nation"))
    val region = broadcast(t(spark, sfDir, "region"))
    val orders = t(spark, sfDir, "orders")
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name")
  }

  val qJoinStarSql: String =
    """SELECT r_name,
      |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS revenue,
      |       count(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** Semi + anti join, labeled and unioned. */
  def qSemiAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = t(spark, sfDir, "customer")
    val orders = t(spark, sfDir, "orders")
    val withO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("with_orders").as("tag"), col("c_custkey"))
    val withoutO = customer.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("without_orders").as("tag"), col("c_custkey"))
    withO.unionAll(withoutO).orderBy("tag", "c_custkey")
  }

  val qSemiAntiSql: String =
    """SELECT 'with_orders' AS tag, c_custkey FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT 'without_orders' AS tag, c_custkey FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY tag, c_custkey""".stripMargin

  /** Full outer join — snapshot reconciliation (the one outer-join shape
    * the semi/anti/star queries don't cover): per-user event activity vs
    * per-customer high-value orders, FULL OUTER on the shared key so the
    * output keeps left-only (active user, no big orders), right-only
    * (big-order customer, no events), and matched rows, labeled.
    *
    * Scale shape: both sides pre-aggregate BEFORE the join, so the outer
    * join runs on two already-reduced keyed tables (distinct keys, not raw
    * facts) — at 100 TB the shuffle carries one row per key per side. Full
    * outer cannot drop rows, so a shuffle join on the key is the correct
    * plan, not a missed broadcast. */
  def qFullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val big = t(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 400000d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
    ev.join(big, col("user_id") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("user_id"), col("o_custkey")).as("key"),
        col("n_events"), col("n_big_orders"),
        when(col("user_id").isNull, lit("orders_only"))
          .when(col("o_custkey").isNull, lit("events_only"))
          .otherwise(lit("both")).as("presence"))
      .orderBy("key")
  }

  val qFullOuterSql: String =
    """WITH ev AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
      |big AS (SELECT o_custkey, count(*) AS n_big_orders FROM orders
      |        WHERE o_totalprice > 400000 GROUP BY o_custkey)
      |SELECT coalesce(user_id, o_custkey) AS key, n_events, n_big_orders,
      |       CASE WHEN user_id IS NULL THEN 'orders_only'
      |            WHEN o_custkey IS NULL THEN 'events_only'
      |            ELSE 'both' END AS presence
      |FROM ev FULL OUTER JOIN big ON user_id = o_custkey
      |ORDER BY key""".stripMargin

  /** TPC-H Q1 shape: multi-aggregate hash agg with exact decimal arithmetic.
    * disc_price = dec(price)·dec(1-discount) stays decimal end-to-end. */
  def qAggQ1(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        decOut(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount"))))
          .as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val qAggQ1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_base_price,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
      |                * CAST(1 - l_discount AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_disc_price,
      |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / count(*) AS avg_qty,
      |       CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / count(*) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Grouping sets via rollup; subtotal rows' null keys coalesced to a
    * sentinel so the total ORDER BY is unambiguous in both engines. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("cnt"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  val qRollupSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |       coalesce(l_linestatus, '(all)') AS linestatus,
      |       count(*) AS cnt,
      |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Full cube over (returnflag, linestatus) — all 4 grouping sets. */
  def qCube(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_extendedprice")).as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
        col("cnt"), col("sum_price"))
      .orderBy("returnflag", "linestatus")

  val qCubeSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |       coalesce(l_linestatus, '(all)') AS linestatus,
      |       count(*) AS cnt,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Exact distinct aggregate (expands to a two-phase agg in Spark). */
  def qDistinctExact(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  val qDistinctExactSql: String =
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** HLL approximate distinct beside the exact count (no-oracle: Spark's
    * HyperLogLog++ differs from DuckDB's sketch; rows-only check. The
    * relative error bound is asserted in QueriesSmokeSpec).
    *
    * Deliberately TWO aggregations joined on the tiny group key: fusing
    * countDistinct with approx_count_distinct in one agg makes Spark carry
    * the multi-KB HLL buffer per (flag, partkey) row through the
    * distinct-expansion exchange — at corpus scale that's sketch-bytes ×
    * distinct-keys of shuffle. Split, each agg keeps small state (the HLL
    * path shuffles one sketch per flag, the exact path shuffles bare
    * keys), and the join is a broadcast of a handful of rows. */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
    exact.join(broadcast(approx), Seq("l_returnflag"))
      .orderBy("l_returnflag")
  }

  /** Exact percentiles per group. Spark's `percentile` and DuckDB's
    * `quantile_cont` share the same definition — sort, index (n-1)·p,
    * linear interpolation — and the interpolation arithmetic on identical
    * doubles is bit-identical (verified incl. fractional p), so this is
    * hash-exact with no quantization. `approx_percentile` (t-digest/KLL
    * style sketches) is engine-specific and deliberately not oracled. */
  def qPercentile(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      // array form: ONE sorted buffer per column serves both quantiles —
      // scalar-per-quantile calls buffer (and sort) every value twice
      .agg(
        expr("percentile(l_quantity, array(0.5D, 0.9D))").as("qty_p"),
        expr("percentile(l_extendedprice, array(0.25D, 0.75D))").as("price_p"))
      .select(col("l_returnflag"),
        col("qty_p").getItem(0).as("qty_p50"),
        col("qty_p").getItem(1).as("qty_p90"),
        col("price_p").getItem(0).as("price_p25"),
        col("price_p").getItem(1).as("price_p75"))
      .orderBy("l_returnflag")

  val qPercentileSql: String =
    """SELECT l_returnflag,
      |       quantile_cont(l_quantity, 0.5) AS qty_p50,
      |       quantile_cont(l_quantity, 0.9) AS qty_p90,
      |       quantile_cont(l_extendedprice, 0.25) AS price_p25,
      |       quantile_cont(l_extendedprice, 0.75) AS price_p75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Approximate percentile (GK sketch) beside the exact value — the
    * scale path for quantiles: exact `percentile` buffers every value of
    * a group on one reducer (fine at test SF, a memory wall at 100 TB),
    * while the sketch has bounded state and merges associatively.
    * `no-oracle`: sketch internals are engine-specific; the smoke spec
    * pins the approx within a relative-error band of the exact. */
  def qApproxPercentile(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      // array form halves the aggregation state: one exact buffer and one
      // sketch serve both quantiles
      .agg(
        expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ex"),
        expr("approx_percentile(l_extendedprice, array(0.5D, 0.9D), 1000)").as("ap"))
      .select(col("l_returnflag"),
        col("ex").getItem(0).as("exact_p50"),
        col("ap").getItem(0).as("approx_p50"),
        col("ex").getItem(1).as("exact_p90"),
        col("ap").getItem(1).as("approx_p90"))
      .orderBy("l_returnflag")

  /** Winsorization — percentile-clipped aggregation, the robust-statistics
    * outlier treatment a feature pipeline applies before training: per
    * group, values are clipped into the [p05, p95] band and re-aggregated,
    * with clip counts reported. Two passes, both scale-right: the bounds
    * aggregate is group-cardinality-sized and BROADCASTS back onto the
    * fact table (no fact shuffle for the join), and the clipped sum is
    * decimal-exact. The percentile bounds are bit-identical cross-engine
    * (same interpolation, see [[qPercentile]]), so clip comparisons and
    * the final hash match exactly. */
  def qWinsorize(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val (clipLo, clipHi) = graft.operators.Robust.clipFlags("l_extendedprice")
    graft.operators.Robust
      .winsorize(li, Seq("l_returnflag"), "l_extendedprice", 0.05, 0.95)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(clipLo, 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(clipHi, 1L).otherwise(0L)).as("n_clip_hi"),
        dsum(col("l_extendedprice_w")).as("sum_winsorized"))
      .orderBy("l_returnflag")
  }

  val qWinsorizeSql: String =
    """WITH b AS (
      |  SELECT l_returnflag,
      |         quantile_cont(l_extendedprice, 0.05) AS lo,
      |         quantile_cont(l_extendedprice, 0.95) AS hi
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag, count(*) AS n,
      |       CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
      |       CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
      |       CAST(CAST(sum(CAST(least(greatest(l_extendedprice, lo), hi) AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_winsorized
      |FROM lineitem l JOIN b USING (l_returnflag)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Salted two-phase aggregation over a hot low-cardinality key (5 event
    * types across the whole table — the classic hot-reducer shape when
    * aggregate state is large or map-side combine is unavailable). The
    * deterministic xxhash64 salt spreads each key over 8 reducer cells;
    * the decimal partials make the re-aggregation bit-identical to the
    * plain single-phase sum, so the oracle is just GROUP BY event_type —
    * salting is proven semantically transparent. */
  def qSkewSaltedAgg(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.Skew
      .saltedSumExact(t(spark, sfDir, "events"), "event_type", "value",
        salt = 8, stableCol = "event_id")
      .orderBy("event_type")

  val qSkewSaltedAggSql: String =
    """SELECT event_type,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value,
      |       count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Salted JOIN sibling of [[qSkewSaltedAgg]] — the oracle gate for
    * [[graft.operators.Skew.saltedJoin]] (previously unit-pinned only).
    * events is maximally skewed on the join key (5 event types over the
    * whole table: every key is hot); the dim side is MERGE-hinted to
    * model the non-broadcastable dimension that makes salting the right
    * tool (a broadcastable dim needs no salt — the hint pins the shuffle
    * shape so the salt is actually load-bearing in the plan). The left
    * salt is a deterministic xxhash64 of the unique event_id, the right
    * side replicates `salt`× via explode; the post-join aggregation is
    * decimal-exact, so the oracle is the plain UNSALTED join+agg —
    * salting proven semantically transparent, like its agg sibling. */
  def qSkewJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("event_type"), col("event_id"), col("value"))
    val dim = t(spark, sfDir, "events")
      .select("event_type").distinct()
      .withColumn("type_weight", length(col("event_type")).cast("long"))
      .hint("merge")
    graft.operators.Skew
      .saltedJoin(ev, dim, "event_type", salt = 8, leftStableCol = "event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        dsum(col("value")).as("sum_value"),
        max("type_weight").as("type_weight"))
      .orderBy("event_type")
  }

  val qSkewJoinSql: String =
    """WITH dim AS (
      |  SELECT DISTINCT event_type,
      |         CAST(length(event_type) AS BIGINT) AS type_weight
      |  FROM events)
      |SELECT e.event_type, count(*) AS cnt,
      |       CAST(CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value,
      |       max(d.type_weight) AS type_weight
      |FROM events e JOIN dim d ON d.event_type = e.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Top-3 orders per customer: rank inside a window, deterministic
    * tie-break on the unique o_orderkey. */
  def qWindowTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  val qWindowTopkSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Running sum per user over event time. The running frame is summed in
    * DECIMAL so the prefix values are exact (DuckDB's segment-tree window
    * aggregation groups double additions differently than Spark's
    * sequential frame — decimal removes the divergence). */
  def qWindowRunning(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"),
        decOut(sum(dec(col("value"))).over(w)).as("running_value"))
      .orderBy("user_id", "event_id")
  }

  /** Exact ROLLING MEDIAN per user over event time (8-row trailing frame)
    * — the robust time-series smoother next to the running sum: rolling
    * median denoises where rolling mean is outlier-dragged, and EXACT
    * medians at scale are the hard version (approx sketches don't
    * window). Spark has no median window function; the shape here is
    * `collect_list` over the row frame (bounded: ≤ 8 elements, so state
    * is O(frame), never O(partition)) into the native `exact_median`
    * kernel — sort-of-8 per row, one user_id Exchange for the window +
    * nothing else. Median of an even frame is the IEEE midpoint of the
    * two middles — identical to the oracle's `median()` interpolation,
    * so doubles compare bit-exact. */
  def qRollingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-7, Window.currentRow)
    // ONE exchange: range-partition by user_id up front — satisfies the
    // window's clustering requirement AND makes the final (user_id,
    // event_id) order total with only a partition-local sort (equal
    // user_ids share a range partition; the windowFreqs pattern)
    t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .repartitionByRange(col("user_id"))
      .withColumn("roll_med",
        graft.plans.VectorExpressions.exactMedian(
          collect_list(col("value")).over(w)))
      .drop("ts")
      .sortWithinPartitions("user_id", "event_id")
  }

  val qRollingMedianSql: String =
    """SELECT user_id, event_id, value,
      |       median(value) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id
      |                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS roll_med
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  val qWindowRunningSql: String =
    """SELECT user_id, event_id,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6)))
      |            OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                  ROWS UNBOUNDED PRECEDING) AS DECIMAL(28,6)) AS DOUBLE) AS running_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  /** Distinct-based set algebra over customer vs supplier nation keys. */
  def qSetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val c = t(spark, sfDir, "customer").select(col("c_nationkey").as("k"))
    val s = t(spark, sfDir, "supplier").select(col("s_nationkey").as("k"))
    val u = c.union(s).distinct().select(lit("union").as("op"), col("k"))
    val i = c.intersect(s).select(lit("intersect").as("op"), col("k"))
    val e = c.except(s).select(lit("except").as("op"), col("k"))
    u.unionAll(i).unionAll(e).orderBy("op", "k")
  }

  val qSetOpsSql: String =
    """SELECT 'union' AS op, k FROM
      |  (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'intersect' AS op, k FROM
      |  (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'except' AS op, k FROM
      |  (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |ORDER BY op, k""".stripMargin

  /** Pivot: one row per returnflag, one decimal-exact quantity column per
    * linestatus. Pivot values are given explicitly so Spark skips the
    * values-discovery job (an extra full scan at corpus scale). The plan
    * pre-aggregates on (returnflag, linestatus) with map-side combine —
    * the corpus-sized shuffle carries |groups| rows — then pivots the
    * tiny grouped result; equivalent work to the oracle's CASE-sums. */
  def qPivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(dsum(col("l_quantity")))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy("l_returnflag")

  val qPivotSql: String =
    """SELECT l_returnflag,
      |       CAST(CAST(sum(CASE WHEN l_linestatus = 'F'
      |                 THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS DOUBLE) AS qty_f,
      |       CAST(CAST(sum(CASE WHEN l_linestatus = 'O'
      |                 THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS DOUBLE) AS qty_o
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Unpivot (melt): wide part metrics → long (partkey, metric, value).
    * Narrow, shuffle-free: Spark expands each input row to k output rows
    * inside the scan stage, so the plan survives any scale — no exchange
    * at all until the output sort. */
  def qUnpivot(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "part")
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retailprice"))
      .unpivot(
        Array(col("p_partkey")),
        Array(col("size"), col("retailprice")),
        "metric", "value")
      .orderBy("p_partkey", "metric")

  val qUnpivotSql: String =
    """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |UNION ALL
      |SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value FROM part
      |ORDER BY p_partkey, metric""".stripMargin

  /** Explicit GROUPING SETS (beyond rollup/cube's fixed lattices) with the
    * grouping_id bitmask — Spark's `grouping_id(a,b)` and DuckDB's
    * `GROUPING(a,b)` emit the same MSB-first bitmask. Spark expands the
    * sets via a single Expand + one hash aggregate (rows × |sets| before
    * partial aggregation — map-side combine keeps the shuffle at
    * |groups| × |sets|, not |rows|). */
  def qGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "lineitem").createOrReplaceTempView("gs_lineitem")
    spark.sql(
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS cnt,
        |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_price
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |       coalesce(l_linestatus, '(all)') AS linestatus,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS cnt,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_price
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY returnflag, linestatus""".stripMargin

  /** Correlated scalar subquery: customers above their nation's average
    * balance. Catalyst decorrelates this into an aggregate on c_nationkey
    * + an equi-join — i.e. the scalable two-pass plan a hand-written
    * version would use; nothing is executed per-row. The inner average is
    * decimal-sum / count so both engines compare against the identical
    * double. */
  def qCorrSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    t(spark, sfDir, "customer").createOrReplaceTempView("cs_customer")
    spark.sql(
      """SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
        |FROM cs_customer c
        |WHERE c.c_acctbal > (
        |  SELECT CAST(CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / count(*)
        |  FROM cs_customer c2
        |  WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c.c_custkey""".stripMargin)
  }

  val qCorrSubquerySql: String =
    """SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      |FROM customer c
      |WHERE c.c_acctbal > (
      |  SELECT CAST(CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) / count(*)
      |  FROM customer c2
      |  WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c.c_custkey""".stripMargin

  /** Window-function breadth beyond rank/frames: row_number, ntile,
    * percent_rank, cume_dist, lag, lead in ONE window pass (single sort per
    * partition serves all six — Spark collapses same-spec window functions
    * into one Window operator, exactly what you want at scale).
    * Determinism: the window orders by the globally-unique o_orderkey, so
    * every rank is fixed; percent_rank/cume_dist are single divisions of
    * small ints (correctly-rounded IEEE, engine-identical); lag/lead pass
    * raw values through untouched. */
  def qWindowStats(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    t(spark, sfDir, "orders")
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        row_number().over(w).cast("long").as("rn"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        lag("o_totalprice", 1).over(w).as("prev_price"),
        lead("o_totalprice", 1).over(w).as("next_price"))
      .orderBy("o_orderkey")
  }

  val qWindowStatsSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |       CAST(row_number() OVER w AS BIGINT) AS rn,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |       percent_rank() OVER w AS pr,
      |       cume_dist() OVER w AS cd,
      |       lag(o_totalprice) OVER w AS prev_price,
      |       lead(o_totalprice) OVER w AS next_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Fixed-width histogram of l_extendedprice (bin = floor(x/5000)): the
    * binning idiom for numeric profiling at scale — one scan, map-side
    * combinable, output rows = bin count not data size. floor of one IEEE
    * division is engine-identical; sums are decimal-exact per §2.3. */
  def qHistogram(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "lineitem")
      .groupBy(floor(col("l_extendedprice") / lit(5000.0)).cast("long").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_extendedprice")).as("total"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy("bin")

  val qHistogramSql: String =
    """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
      |       count(*) AS n,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS total,
      |       min(l_extendedprice) AS lo,
      |       max(l_extendedprice) AS hi
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Mergeable distinct-count sketches — the property that matters at
    * 100 TB: per-DAY HLL sketches are built once (the partial a pipeline
    * would persist alongside each ingest batch), then UNIONED into
    * per-week estimates without touching the raw data again
    * (`hll_sketch_agg` → `hll_union_agg` → `hll_sketch_estimate`).
    * `q_approx_distinct` shows the one-shot sketch; this shows
    * re-aggregation, which exact distinct counts cannot do (a distinct
    * count per day cannot be summed into a week). Exact weekly twin
    * computed beside it; no-oracle (sketch encoding is engine-specific),
    * accuracy pinned in QueriesSmokeSpec. */
  def qHllMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        weekofyear(col("ts")).cast("long").as("week"))
    val daily = ev.groupBy("week", "day")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val weekly = daily.groupBy("week")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_users"),
        count(lit(1)).as("n_days"))
    val exact = ev.groupBy("week")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    weekly.join(exact, "week")
      .select(col("week"), col("n_days"), col("est_users"), col("exact_users"))
      .orderBy("week")
  }

  /** Statistical moments from exact integer power sums: per (returnflag,
    * linestatus), sample variance / stddev of l_quantity and the Pearson
    * correlation between quantity and linenumber. The aggregation carries
    * only long-typed partials (n, Σx, Σx², Σy, Σy², Σxy) — map-side
    * combinable, partition-order-free — and the moments come out in a
    * final projection whose few IEEE double ops are written identically
    * in the oracle, so the result is bit-exact cross-engine (the built-in
    * `stddev_samp`'s streaming update order would not be; its agreement
    * with this form is pinned in QueriesSmokeSpec). This is the scalable
    * shape for any second-moment statistic: one shuffle of six longs per
    * group. */
  def qStatsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    val li = t(spark, sfDir, "lineitem").select(
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast("long").as("q"),
      col("l_linenumber").cast("long").as("ln"))
    val d = (c: Column) => c.cast("double")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("s"), sum(col("q") * col("q")).as("ss"),
        sum(col("ln")).as("sl"), sum(col("ln") * col("ln")).as("sll"),
        sum(col("q") * col("ln")).as("sq"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n"),
        ((d(col("ss")) - d(col("s")) * d(col("s")) / d(col("n")))
          / (d(col("n")) - 1)).as("var_q"),
        sqrt((d(col("ss")) - d(col("s")) * d(col("s")) / d(col("n")))
          / (d(col("n")) - 1)).as("std_q"),
        ((d(col("sq")) - d(col("s")) * d(col("sl")) / d(col("n")))
          / sqrt((d(col("ss")) - d(col("s")) * d(col("s")) / d(col("n")))
            * (d(col("sll")) - d(col("sl")) * d(col("sl")) / d(col("n")))))
          .as("corr_q_ln"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val qStatsMomentsSql: String =
    """WITH s AS (
      |  SELECT l_returnflag, l_linestatus, count(*) AS n,
      |         sum(CAST(l_quantity AS BIGINT)) AS s,
      |         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS ss,
      |         sum(CAST(l_linenumber AS BIGINT)) AS sl,
      |         sum(CAST(l_linenumber AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS sll,
      |         sum(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS sq
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus, n,
      |       (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |         / (CAST(n AS DOUBLE) - 1) AS var_q,
      |       sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |         / (CAST(n AS DOUBLE) - 1)) AS std_q,
      |       (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(n AS DOUBLE))
      |         / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      |                * (CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(n AS DOUBLE))) AS corr_q_ln
      |FROM s ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Rank-family breadth beyond q_window_stats: ntile quartiles,
    * percent_rank, and cume_dist sharing ONE window (single per-segment
    * sort). The ordering key (acctbal, custkey) is total, so every output
    * is a ratio of small exact integers — one IEEE division, hash-exact
    * cross-engine with no quantization. */
  def qWindowRanks(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_custkey")
  }

  val qWindowRanksSql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |       ntile(4) OVER w AS quartile,
      |       percent_rank() OVER w AS pct_rank,
      |       cume_dist() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** The one join type every other gate here bans, used where it is
    * CORRECT: a deliberate cross join of two tiny dimensions (5 regions ×
    * 5 distinct priorities) builds the dense reporting grid, and the fact
    * side arrives pre-aggregated through a left join so zero combinations
    * survive with n_orders = 0. Cross joins are fine when both sides are
    * dimension-sized and broadcastable — the failure mode the other
    * queries guard against is a FACT table entering one. */
  def qCrossGrid(spark: SparkSession, sfDir: String): DataFrame = {
    val region = t(spark, sfDir, "region").select(col("r_regionkey"), col("r_name"))
    val prios = t(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("prio")).distinct()
    val counts = t(spark, sfDir, "orders")
      .join(t(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("rk"), col("o_orderpriority").as("cprio"))
      .agg(count(lit(1)).as("cnt"))
    region.crossJoin(prios)
      .join(counts,
        col("r_regionkey") === col("rk") && col("prio") === col("cprio"), "left")
      .select(col("r_name"), col("prio").as("o_orderpriority"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .orderBy("r_name", "o_orderpriority")
  }

  val qCrossGridSql: String =
    """WITH prios AS (SELECT DISTINCT o_orderpriority AS prio FROM orders),
      |counts AS (
      |  SELECT n_regionkey AS rk, o_orderpriority AS cprio, count(*) AS cnt
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |              JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2)
      |SELECT r.r_name, p.prio AS o_orderpriority, coalesce(c.cnt, 0) AS n_orders
      |FROM region r CROSS JOIN prios p
      |LEFT JOIN counts c ON c.rk = r.r_regionkey AND c.cprio = p.prio
      |ORDER BY r_name, o_orderpriority""".stripMargin

  /** Deequ-style data-quality constraint audit — the "expectations" pass a
    * production pipeline runs before admitting a batch: PK uniqueness, FK
    * integrity, referential completeness, range / domain / completeness /
    * non-negativity invariants, and a freshness monitor, each reported as
    * (check_name, table_name, n_violations, n_rows). The fixture makes
    * three checks fire (orphan orders, negative balances, stale shipdates)
    * and the rest prove clean — both directions matter.
    *
    * Scale shape: ALL row-local checks on a table fold into ONE
    * conditional-aggregation scan (melted to rows via explode(map)); the
    * relational checks are anti-join counts on their FK key. Denominators
    * join from a 3-row broadcast count table. Every number is an exact
    * integer. */
  def qAuditConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = t(spark, sfDir, "orders")
    val lineitem = t(spark, sfDir, "lineitem")
    val customer = t(spark, sfDir, "customer")
    def melt(table: String, agg: DataFrame): DataFrame = {
      val checkCols = agg.columns.toSeq
      agg.select(explode(map(
        checkCols.flatMap(c => Seq(lit(c), col(c))): _*)).as(Seq("check_name", "n_violations")))
        .select(col("check_name"), lit(table).as("table_name"), col("n_violations"))
    }
    val ordersChecks = melt("orders", orders.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_unique_orders"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("domain_orderstatus")))
    val lineitemChecks = melt("lineitem", lineitem.agg(
      sum(when(!col("l_quantity").between(1d, 50d), 1L).otherwise(0L))
        .as("range_quantity"),
      sum(when(!col("l_discount").between(0d, 0.1d), 1L).otherwise(0L))
        .as("range_discount"),
      sum(when(col("l_shipdate") >= lit("1998-10-01").cast("timestamp"), 1L)
        .otherwise(0L)).as("freshness_shipdate")))
    val customerChecks = melt("customer", customer.agg(
      sum(when(col("c_acctbal") < 0d, 1L).otherwise(0L)).as("nonneg_acctbal"),
      sum(when(col("c_name").isNull, 1L).otherwise(0L)).as("complete_name")))
    val fkOrders = orders.join(customer,
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("fk_orders_customer").as("check_name"),
        lit("orders").as("table_name"), col("n_violations"))
    val refLineitem = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("ref_orders_lineitem").as("check_name"),
        lit("orders").as("table_name"), col("n_violations"))
    val counts = orders.agg(count(lit(1)).as("n_rows"))
      .select(lit("orders").as("table_name"), col("n_rows"))
      .union(lineitem.agg(count(lit(1)).as("n_rows"))
        .select(lit("lineitem").as("table_name"), col("n_rows")))
      .union(customer.agg(count(lit(1)).as("n_rows"))
        .select(lit("customer").as("table_name"), col("n_rows")))
    ordersChecks.union(lineitemChecks).union(customerChecks)
      .union(fkOrders).union(refLineitem)
      .join(broadcast(counts), Seq("table_name"))
      .select(col("check_name"), col("table_name"),
        col("n_violations").cast("long").as("n_violations"), col("n_rows"))
      .orderBy("check_name")
  }

  val qAuditConstraintsSql: String =
    """WITH counts AS (
      |  SELECT 'orders' AS table_name, count(*) AS n_rows FROM orders
      |  UNION ALL SELECT 'lineitem', count(*) FROM lineitem
      |  UNION ALL SELECT 'customer', count(*) FROM customer),
      |checks AS (
      |  SELECT 'pk_unique_orders' AS check_name, 'orders' AS table_name,
      |         count(*) - count(DISTINCT o_orderkey) AS n_violations FROM orders
      |  UNION ALL SELECT 'domain_orderstatus', 'orders',
      |         sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) FROM orders
      |  UNION ALL SELECT 'range_quantity', 'lineitem',
      |         sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) FROM lineitem
      |  UNION ALL SELECT 'range_discount', 'lineitem',
      |         sum(CASE WHEN l_discount NOT BETWEEN 0 AND 0.1 THEN 1 ELSE 0 END) FROM lineitem
      |  UNION ALL SELECT 'freshness_shipdate', 'lineitem',
      |         sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-10-01' THEN 1 ELSE 0 END) FROM lineitem
      |  UNION ALL SELECT 'nonneg_acctbal', 'customer',
      |         sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) FROM customer
      |  UNION ALL SELECT 'complete_name', 'customer',
      |         sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) FROM customer
      |  UNION ALL SELECT 'fk_orders_customer', 'orders',
      |         (SELECT count(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |  UNION ALL SELECT 'ref_orders_lineitem', 'orders',
      |         (SELECT count(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)))
      |SELECT ch.check_name, ch.table_name,
      |       CAST(ch.n_violations AS BIGINT) AS n_violations, co.n_rows
      |FROM checks ch JOIN counts co ON co.table_name = ch.table_name
      |ORDER BY check_name""".stripMargin

  /** Bloom-filter semi-join reduction — the 100 TB join idiom when the
    * build side is too big to broadcast but far smaller than the probe
    * side: aggregate the selected keys into ONE bloom filter
    * (`bloom_filter_agg`, a few MB regardless of key count), broadcast
    * that single row, and pre-filter the fact table with `might_contain`
    * BEFORE the shuffle — the exchange then carries only probable matches
    * (bloom has no false negatives, so nothing real is lost; the exact
    * semi-join afterwards removes the false positives). This is the manual
    * form of what Spark's runtime-filter rule injects when thresholds
    * allow; writing it explicitly pins the shape at any threshold. The
    * final result is bloom-independent — bit-identical to the plain
    * semi-join, which is exactly what the oracle checks. */
  def qBloomPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val sel = t(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // Materialize the filter: ONE binary of numBits/8 bytes (~1 MB here)
    // comes to the driver regardless of build-side row count, then ships
    // to every probe task as a constant — the same materialize-and-ship
    // step InjectRuntimeFilter performs via its scalar subquery
    // (might_contain accepts only constants / scalar subqueries).
    val bfBytes = sel.agg(graft.plans.BloomExpressions
        .bloomFilterAgg(xxhash64(col("o_orderkey")), 1000000L, 8000000L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val pruned = t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_returnflag", "l_extendedprice")
      .filter(graft.plans.BloomExpressions
        .mightContain(lit(bfBytes), xxhash64(col("l_orderkey"))))
    pruned.join(sel, pruned("l_orderkey") === sel("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), dsum(col("l_extendedprice")).as("revenue"))
      .orderBy("l_returnflag")
  }

  val qBloomPruneSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
      |                     WHERE o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** k-anonymization with one generalization step — the privacy audit a
    * training pipeline runs before releasing user-derived data (beside
    * redaction, `q_pii_redact`, which scrubs direct identifiers; this
    * treats QUASI-identifiers whose combination re-identifies). The
    * quasi-identifier here is (c_nationkey, c_mktsegment): equivalence
    * classes of size ≥ k publish as-is at level 0; below-k classes
    * generalize the segment away ('*') and regroup by nation (level 1);
    * nations still below k collapse into the global ('*','*') bucket
    * (level 2). Every published class has n ≥ k or sits in the terminal
    * bucket — the k-anonymity guarantee, checkable by eye in the output.
    *
    * Scale shape: the fact table aggregates ONCE (two-phase, map-side
    * combine); all three levels derive from that class-cardinality-sized
    * table (|nations|·|segments| rows — KBs at any corpus size), so
    * generalization costs no second fact scan. All-integer counts. */
  def qKAnonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 16L
    val classes = graft.CacheScope.cached(
      t(spark, sfDir, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n")))
    val ok0 = classes.filter(col("n") >= k)
        .select(lit(0L).as("level"), col("c_nationkey").cast("string").as("nation"),
          col("c_mktsegment").as("segment"), col("n"))
    val small0 = classes.filter(col("n") < k)
      .groupBy(col("c_nationkey"))
      .agg(sum(col("n")).as("n"))
    val ok1 = small0.filter(col("n") >= k)
      .select(lit(1L).as("level"), col("c_nationkey").cast("string").as("nation"),
        lit("*").as("segment"), col("n"))
    val ok2 = small0.filter(col("n") < k)
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"))
      .filter(col("n") > 0)
      .select(lit(2L).as("level"), lit("*").as("nation"),
        lit("*").as("segment"), col("n"))
    ok0.unionByName(ok1).unionByName(ok2)
      .orderBy("level", "nation", "segment")
  }

  val qKAnonymitySql: String =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS n
      |  FROM customer GROUP BY 1, 2),
      |small0 AS (
      |  SELECT c_nationkey, CAST(sum(n) AS BIGINT) AS n
      |  FROM classes WHERE n < 16 GROUP BY 1)
      |SELECT CAST(0 AS BIGINT) AS level, CAST(c_nationkey AS VARCHAR) AS nation,
      |       c_mktsegment AS segment, n
      |FROM classes WHERE n >= 16
      |UNION ALL
      |SELECT CAST(1 AS BIGINT), CAST(c_nationkey AS VARCHAR), '*', n
      |FROM small0 WHERE n >= 16
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), '*', '*', CAST(sum(n) AS BIGINT)
      |FROM small0 WHERE n < 16
      |HAVING sum(n) > 0
      |ORDER BY level, nation, segment""".stripMargin

  /** ORC sink + source roundtrip with partition pruning: lineitem written
    * as ORC partitioned by `l_returnflag`, read back with a partition
    * filter, aggregated — beside the TSV/JSONL/parquet paths this covers
    * the remaining first-class columnar format a lakehouse actually mixes.
    * The read must prune to the single `l_returnflag=R` directory (pinned
    * by a plan-shape assertion in QueriesSpec — pruning is a directory
    * LISTING property, so it holds at any scale), and the partition column
    * round-trips through the directory name, exercising Spark's
    * partition-discovery path, not just the file codec.
    *
    * Oracle reads the same aggregate straight off the parquet: the ORC hop
    * must be lossless for every column type involved (double, string,
    * timestamp-derived group key). */
  def qOrcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val base = new java.io.File(
      spark.conf.getOption("graft.streamWorkDir")
        .getOrElse(new java.io.File(sys.props("user.dir"), "target/orc_roundtrip").getAbsolutePath),
      new java.io.File(sfDir).getName + "_orc")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete()
    }
    rm(base)
    val dir = base.getAbsolutePath
    t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice")
      .write.partitionBy("l_returnflag").orc(dir)
    spark.read.orc(dir)
      .filter(col("l_returnflag") === "R")
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_linestatus")
  }

  val qOrcRoundtripSql: String =
    """SELECT l_linestatus, count(*) AS cnt,
      |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_qty,
      |       CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_returnflag = 'R'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** Schema-evolution read (round 12) — the drift case every long-lived
    * ingestion hits: an early batch written under the OLD schema
    * (doc_id, lang, text) and a later batch under the drifted one (+
    * quality DOUBLE) must read back as ONE relation via
    * `mergeSchema = true`, with the missing column NULL for old-batch
    * rows. The readout proves all three contracts at once: total rows
    * (nothing dropped by the union), non-null quality count (exactly the
    * new-schema rows), and the quality sum (values survive the merge
    * bit-exactly — length/1024 is a dyadic rational, so even the double
    * SUM is order-free exact and hash-safe without the decimal detour).
    * Oracle computes straight off `documents` with the same parity split.
    * Scale shape: two narrow projected writes + one merged scan + one
    * two-phase aggregate; schema reconciliation is metadata-only (footer
    * union), not a data pass. */
  def qSchemaEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val base = new java.io.File(
      spark.conf.getOption("graft.streamWorkDir")
        .getOrElse(new java.io.File(sys.props("user.dir"), "target/schema_evo").getAbsolutePath),
      new java.io.File(sfDir).getName + "_se")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete()
    }
    rm(base)
    val dir = base.getAbsolutePath
    val docs = t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    docs.filter(col("doc_id") % 2 === 0)
      .write.mode("overwrite").parquet(dir + "/b0")
    docs.filter(col("doc_id") % 2 === 1)
      .withColumn("quality", length(col("text")).cast("double") / 1024d)
      .write.mode("overwrite").parquet(dir + "/b1")
    spark.read.option("mergeSchema", "true").parquet(dir + "/b0", dir + "/b1")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(col("quality")).as("n_new_schema"),
        sum(coalesce(col("quality"), lit(0d))).as("sum_quality"))
      .orderBy("lang")
  }

  val qSchemaEvolutionSql: String =
    """SELECT lang, count(*) AS n_docs,
      |       CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT) AS n_new_schema,
      |       sum(CASE WHEN doc_id % 2 = 1
      |                THEN CAST(length(text) AS DOUBLE) / 1024 ELSE 0 END) AS sum_quality
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_schema_evolution" -> (qSchemaEvolution _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_bloom_prune" -> (qBloomPrune _),
    "q_audit_constraints" -> (qAuditConstraints _),
    "q_cross_grid" -> (qCrossGrid _),
    "q_window_stats" -> (qWindowStats _),
    "q_histogram" -> (qHistogram _),
    "q_scan_project_filter" -> (qScanProjectFilter _),
    "q_join_star" -> (qJoinStar _),
    "q_semi_anti" -> (qSemiAnti _),
    "q_full_outer" -> (qFullOuter _),
    "q_agg_q1" -> (qAggQ1 _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_distinct_exact" -> (qDistinctExact _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_percentile" -> (qPercentile _),
    "q_window_topk" -> (qWindowTopk _),
    "q_window_running" -> (qWindowRunning _),
    "q_rolling_median" -> (qRollingMedian _),
    "q_set_ops" -> (qSetOps _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_corr_subquery" -> (qCorrSubquery _),
    "q_approx_percentile" -> (qApproxPercentile _),
    "q_skew_salted_agg" -> (qSkewSaltedAgg _),
    "q_skew_join" -> (qSkewJoin _),
    "q_stats_moments" -> (qStatsMoments _),
    "q_window_ranks" -> (qWindowRanks _),
    "q_hll_merge" -> (qHllMerge _),
    "q_winsorize" -> (qWinsorize _))

  val oracles: Map[String, String] = Map(
    "q_orc_roundtrip" -> qOrcRoundtripSql,
    "q_schema_evolution" -> qSchemaEvolutionSql,
    "q_k_anonymity" -> qKAnonymitySql,
    "q_bloom_prune" -> qBloomPruneSql,
    "q_audit_constraints" -> qAuditConstraintsSql,
    "q_cross_grid" -> qCrossGridSql,
    "q_window_stats" -> qWindowStatsSql,
    "q_histogram" -> qHistogramSql,
    "q_scan_project_filter" -> qScanProjectFilterSql,
    "q_join_star" -> qJoinStarSql,
    "q_semi_anti" -> qSemiAntiSql,
    "q_full_outer" -> qFullOuterSql,
    "q_agg_q1" -> qAggQ1Sql,
    "q_rollup" -> qRollupSql,
    "q_percentile" -> qPercentileSql,
    "q_cube" -> qCubeSql,
    "q_distinct_exact" -> qDistinctExactSql,
    "q_window_topk" -> qWindowTopkSql,
    "q_set_ops" -> qSetOpsSql,
    "q_window_running" -> qWindowRunningSql,
    "q_rolling_median" -> qRollingMedianSql,
    "q_pivot" -> qPivotSql,
    "q_unpivot" -> qUnpivotSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_corr_subquery" -> qCorrSubquerySql,
    "q_skew_salted_agg" -> qSkewSaltedAggSql,
    "q_skew_join" -> qSkewJoinSql,
    "q_stats_moments" -> qStatsMomentsSql,
    "q_window_ranks" -> qWindowRanksSql,
    "q_winsorize" -> qWinsorizeSql)
}
