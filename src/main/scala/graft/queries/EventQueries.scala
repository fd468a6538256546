package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Event-table queries (SURVEY §2.3): string/date functions, JSON
  * extraction, event-time tumbling windows, and gap sessionization.
  *
  * Timestamps never appear raw in an output: they are formatted to strings
  * (UTC session timezone) so the parquet-vs-DuckDB compare is byte-stable.
  * Gap comparisons happen in exact integer microseconds.
  *
  * The tumbling/sessionize queries are written batch-first with pure
  * event-time semantics; `graft.streaming.EventStreams` lifts the identical
  * logic onto Structured Streaming (SURVEY §7.6).
  */
object EventQueries {

  private def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Month bucket × event type: date_trunc + string functions + exact sums. */
  def qStringDate(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(
        date_format(date_trunc("month", col("ts")), "yyyy-MM-dd").as("month"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .withColumn("label", concat_ws("-", col("month"), upper(col("event_type"))))
      // round() on an exact double: both engines round half away from zero,
      // and exact .5 doubles stringify exactly — engine-identical
      .withColumn("sum_value_round", round(col("sum_value")))
      .select("month", "event_type", "label", "cnt", "sum_value", "sum_value_round")
      .orderBy("month", "event_type")

  val qStringDateSql: String =
    """SELECT strftime(date_trunc('month', ts), '%Y-%m-%d') AS month,
      |       event_type,
      |       strftime(date_trunc('month', ts), '%Y-%m-%d') || '-' || upper(event_type) AS label,
      |       count(*) AS cnt,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value,
      |       round(CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE)) AS sum_value_round
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY month, event_type""".stripMargin

  /** JSON path extraction aggregated per event type. */
  def qJsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  // sum(BIGINT) in DuckDB widens to HUGEINT, which pandas materializes as
  // float64 ("99111.0") while Spark's sum(long) stays int64 ("99111") — the
  // outer CAST pins the oracle back to BIGINT so the value hash matches.
  val qJsonExtractSql: String =
    """SELECT event_type, count(*) AS cnt,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Same extraction through Spark 4's VARIANT type: `parse_json` decodes
    * the string ONCE into the binary semi-structured encoding and every
    * `variant_get` path walks that encoding — at scale this replaces
    * per-path JSON re-parsing (`get_json_object` parses the string once per
    * path expression) and is the representation Spark shreds into columnar
    * storage. Output is plain longs, so the DuckDB JSON oracle applies. */
  def qVariantExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val v = parse_json(col("props"))
    t(spark, sfDir, "events")
      .select(pmod(col("user_id"), lit(10L)).as("user_bucket"),
        variant_get(v, "$.k", "long").as("k"))
      .groupBy("user_bucket")
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("user_bucket")
  }

  val qVariantExtractSql: String =
    """SELECT user_id % 10 AS user_bucket, count(*) AS cnt,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Frequent-items sketch: `approx_top_k` (count-min-style bounded-state
    * top-k) over event_type. The sketch tracks 100 items — far above the
    * column's cardinality — so its counts are EXACT here and the plain
    * GROUP BY top-3 is a hash-exact oracle; at 100 TB the same plan keeps
    * fixed memory per partition where an exact distinct-count aggregation
    * would shuffle every group. Tie-broken on item for a total order. */
  def qApproxTopk(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .agg(expr("approx_top_k(event_type, 3, 100)").as("topk"))
      .select(explode(col("topk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))

  val qApproxTopkSql: String =
    """SELECT event_type AS item, count(*) AS cnt
      |FROM events GROUP BY 1
      |ORDER BY cnt DESC, item LIMIT 3""".stripMargin

  /** Changelog compaction (CDC log → current state): the latest event per
    * user, deterministically tie-broken on event_id. The rank-1 window
    * filter plans as WindowGroupLimit (Spark 3.5+): each map task keeps
    * only its per-key top-1 BEFORE the shuffle, so the exchange carries
    * ~one row per key per partition — the scalable "latest row" plan, not
    * a full-table sort. This is the compaction every CDC/upsert ingest
    * runs to materialize a snapshot from an append log. */
  def qChangelogCompact(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(spark, sfDir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
      .orderBy("user_id")
  }

  val qChangelogCompactSql: String =
    """SELECT user_id, event_id, event_type,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
      |FROM (SELECT *, row_number() OVER
      |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Tumbling 1-hour event-time windows via Spark's `window()` — epoch
    * aligned, so DuckDB's date_trunc('hour') is the exact oracle. */
  def qTumblingWindow(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("sum_value"))
      .select(fmtTs(col("window.start")).as("hour_start"),
        col("cnt"), col("n_users"), col("sum_value"))
      .orderBy("hour_start")

  val qTumblingWindowSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |       count(*) AS cnt,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin

  /** Sliding event-time windows (1 h length, 15 min slide): every event
    * lands in exactly 4 overlapping windows. The oracle replicates each
    * event into its 4 window starts with pure integer microsecond
    * arithmetic — the same epoch alignment Spark's window() uses. */
  def qSlidingWindow(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("sum_value"))
      .select(fmtTs(col("window.start")).as("window_start"),
        col("cnt"), col("sum_value"))
      .orderBy("window_start")

  val qSlidingWindowSql: String =
    """WITH slid AS (
      |  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
      |                        - k * 900000000) AS ws,
      |         value
      |  FROM events, LATERAL unnest(generate_series(0, 3)) AS t(k))
      |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
      |       count(*) AS cnt,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value
      |FROM slid GROUP BY ws ORDER BY window_start""".stripMargin

  /** 30-minute-gap sessionization: lag → new-session flag → cumulative sum
    * as session index (the classic batch formulation; same logic feeds the
    * streaming wrapper). Gap test in exact microseconds, strictly greater. */
  def sessionized(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapMicros = 30L * 60 * 1000000
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  def qSessionize(spark: SparkSession, sfDir: String): DataFrame =
    sessionized(t(spark, sfDir, "events"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        fmtTs(min(col("ts"))).as("start_ts"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .cast("double") / 1000000d).as("duration_sec"),
        dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")

  /** Same sessionization through the BUILT-IN `session_window` aggregate:
    * Catalyst plans merging session instances inside a two-phase aggregate
    * (partial sessions map-side, merged after one shuffle on user_id) —
    * no window-function sort over the whole log, which is what makes it
    * the preferred batch form at scale and the form that lifts directly
    * to streaming state. Exact-gap boundary (pinned in QueriesSmokeSpec):
    * a row at exactly prev_ts + gap MERGES — session intervals are closed
    * at the end — matching [[qSessionize]]'s strict-> break, so both
    * sessionizers share one grouping semantic. */
  def qSessionWindow(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        fmtTs(col("sw.start")).as("session_start"),
        fmtTs(col("sw.end")).as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  val qSessionWindowSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |                   OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      |  FROM lagged),
      |sess AS (
      |  SELECT user_id, ts, value,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM flagged)
      |SELECT user_id,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
      |       count(*) AS n_events,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value
      |FROM sess
      |GROUP BY user_id, grp
      |ORDER BY user_id, session_start""".stripMargin

  val qSessionizeSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_ts IS NULL
      |                   OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      |  FROM lagged),
      |sess AS (
      |  SELECT user_id, event_id, ts, value,
      |         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id,
      |       count(*) AS n_events,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
      |       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1000000 AS duration_sec,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value
      |FROM sess
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Point-in-time join: each click gets the most recent purchase at or
    * before it for the same user — the no-look-ahead feature join (DuckDB's
    * native ASOF JOIN is the oracle). Purchases are deduped to one row per
    * (user, ts) with a max-event_id tie policy so both engines match
    * deterministically. */
  def qAsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
    val pDedup = purchases
      .withColumn("__rn", row_number().over(
        Window.partitionBy("user_id", "ts").orderBy(col("p_event_id").desc)))
      .filter(col("__rn") === 1).drop("__rn")
    graft.operators.AsofJoin
      .asofJoin(clicks, pDedup, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts"),
        col("value"), col("p_event_id"), col("p_value"))
      .orderBy("event_id")
  }

  val qAsofJoinSql: String =
    """WITH clicks AS (
      |  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
      |p0 AS (
      |  SELECT user_id, ts, max(event_id) AS p_event_id
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
      |p AS (
      |  SELECT p0.user_id, p0.ts, p0.p_event_id, e.value AS p_value
      |  FROM p0 JOIN events e ON e.event_id = p0.p_event_id)
      |SELECT c.event_id, c.user_id,
      |       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts, c.value,
      |       p.p_event_id, p.p_value
      |FROM clicks c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  /** [[graft.operators.TimeSeries.resample]] (per-user daily gap-fill
    * grid with forward fill) under the oracle gate; scale notes live on
    * the operator. */
  def qResample(spark: SparkSession, sfDir: String): DataFrame =
    graft.operators.TimeSeries
      .resample(t(spark, sfDir, "events"), "user_id", "ts", "value", unit = "day")
      .select(col("user_id"),
        date_format(col("bucket"), "yyyy-MM-dd").as("day"),
        col("cnt"),
        col("value_sum").as("day_value"),
        col("value_filled").as("filled_value"))
      .orderBy("user_id", "day")

  val qResampleSql: String =
    """WITH daily AS (
      |  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS cnt,
      |         CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS day_value
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
      |  FROM (SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1))
      |SELECT g.user_id AS user_id, strftime(g.day, '%Y-%m-%d') AS day,
      |       coalesce(d.cnt, 0) AS cnt, d.day_value,
      |       last_value(d.day_value IGNORE NULLS) OVER
      |         (PARTITION BY g.user_id ORDER BY g.day ROWS UNBOUNDED PRECEDING) AS filled_value
      |FROM grid g LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
      |ORDER BY g.user_id, g.day""".stripMargin

  /** Deterministic A/B experiment readout: users are assigned to arms by
    * the md5 gate (content-hash randomization — reproducible on any
    * engine, stable under reruns, no RNG), and the one-row readout holds
    * per-arm event/user counts, decimal-exact means, and the relative
    * lift in ppm. One conditional aggregation over one scan — the
    * experiment-analysis pattern where assignment, exposure counting and
    * the metric all come from the same pass. The lift division runs on
    * identical operands in both engines, so even its floor is
    * hash-exact. */
  def qAbLift(spark: SparkSession, sfDir: String): DataFrame = {
    val armA = graft.operators.Sampling
      .gateBelow(col("user_id").cast("string"), "8")   // ~50/50 split
    val isA = col("arm") === "A"
    val isB = col("arm") === "B"
    val avgA = decOut(sum(when(isA, dec(col("value"))))) / count(when(isA, 1))
    val avgB = decOut(sum(when(isB, dec(col("value"))))) / count(when(isB, 1))
    t(spark, sfDir, "events")
      .select(when(armA, "A").otherwise("B").as("arm"),
        col("user_id"), col("value"))
      .agg(count(when(isA, 1)).as("n_a"), count(when(isB, 1)).as("n_b"),
        countDistinct(when(isA, col("user_id"))).as("users_a"),
        countDistinct(when(isB, col("user_id"))).as("users_b"),
        avgA.as("avg_a"), avgB.as("avg_b"),
        floor((avgA / avgB - 1) * 1000000).cast("long").as("lift_ppm"))
  }

  val qAbLiftSql: String =
    """WITH armed AS (
      |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
      |              THEN 'A' ELSE 'B' END AS arm, user_id, value
      |  FROM events)
      |SELECT count(CASE WHEN arm = 'A' THEN 1 END) AS n_a,
      |       count(CASE WHEN arm = 'B' THEN 1 END) AS n_b,
      |       count(DISTINCT CASE WHEN arm = 'A' THEN user_id END) AS users_a,
      |       count(DISTINCT CASE WHEN arm = 'B' THEN user_id END) AS users_b,
      |       CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS DOUBLE)
      |         / count(CASE WHEN arm = 'A' THEN 1 END) AS avg_a,
      |       CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS DOUBLE)
      |         / count(CASE WHEN arm = 'B' THEN 1 END) AS avg_b,
      |       CAST(floor((CAST(CAST(sum(CASE WHEN arm = 'A' THEN CAST(value AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS DOUBLE)
      |                     / count(CASE WHEN arm = 'A' THEN 1 END)
      |                   / (CAST(CAST(sum(CASE WHEN arm = 'B' THEN CAST(value AS DECIMAL(18,6)) END) AS DECIMAL(28,6)) AS DOUBLE)
      |                     / count(CASE WHEN arm = 'B' THEN 1 END))
      |                   - 1) * 1000000) AS BIGINT) AS lift_ppm
      |FROM armed""".stripMargin

  /** Event-transition matrix (first-order Markov counts): for each user's
    * time-ordered event sequence, count every consecutive
    * (from_type → to_type) pair via one `lead` window — the sequential-
    * pattern summary behind next-event prediction and journey analysis.
    * One sort per user partition, then a tiny 5×5 aggregation; ordering is
    * total on (ts, event_id) so the matrix is hash-exact. */
  def qTransition(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(spark, sfDir, "events")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  val qTransitionSql: String =
    """WITH nxt AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events)
      |SELECT from_type, to_type, count(*) AS n
      |FROM nxt WHERE to_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Cohort retention matrix — the canonical product-analytics rollup:
    * each user's cohort is their first PURCHASE day, and the matrix counts
    * distinct users active in each week-of-age since their cohort. Both
    * inputs are pre-reduced before joining (distinct activity days;
    * min-day cohorts). The join strategy is deliberately left to AQE:
    * the cohort table is one row per purchasing user, so it broadcasts at
    * test scale but must shuffle-hash once users outgrow the broadcast
    * limit (10^8+ users is >8 GB) — a forced broadcast() here would
    * hard-fail or OOM at cluster scale. Day arithmetic is integer
    * (`datediff DIV 7`, non-negative by the at-or-after filter), so the
    * matrix is hash-exact. */
  def qRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val activity = ev
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val cohorts = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(min(date_trunc("day", col("ts"))).as("cohort"))
    activity.join(cohorts, "user_id")
      .filter(col("day") >= col("cohort"))
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        expr("datediff(day, cohort) DIV 7").as("age_week"), col("user_id"))
      .groupBy("cohort_day", "age_week")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "age_week")
  }

  val qRetentionSql: String =
    """WITH act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
      |coh AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
      |        FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
      |       date_diff('day', cohort, day) // 7 AS age_week,
      |       count(DISTINCT act.user_id) AS n_users
      |FROM act JOIN coh USING (user_id)
      |WHERE day >= cohort
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Ordered conversion funnel (view → click-after-view →
    * purchase-after-click): each stage's per-user first timestamp must
    * fall at-or-after the previous stage's — the staged min-aggregation
    * pattern behind every conversion report. Each stage is one filtered
    * aggregation producing a per-user table that joins into the next
    * stage's filter; the strategy is left to AQE because the stage tables
    * are one row per user — broadcast at test scale, shuffle-hash once
    * the user base outgrows the broadcast limit (a forced broadcast()
    * would OOM a 10^8-user funnel). Counts are exact integers on exact
    * microsecond comparisons. */
  def qFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") >= col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") >= col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(v, "1_view")
      .unionByName(stage(c, "2_click_after_view"))
      .unionByName(stage(p, "3_purchase_after_click"))
      .orderBy("stage")
  }

  val qFunnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts
      |      FROM events e JOIN v ON v.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts
      |      FROM events e JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY 1)
      |SELECT * FROM (
      |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
      |  UNION ALL SELECT '2_click_after_view', count(*) FROM c
      |  UNION ALL SELECT '3_purchase_after_click', count(*) FROM p)
      |ORDER BY stage""".stripMargin

  /** Incremental aggregation (materialized-view maintenance): a per-user
    * state table is built from a BASE period, a DELTA period is aggregated
    * separately, and the two partial states merge by re-aggregation — the
    * daily-pipeline pattern that updates 100 TB aggregates by touching
    * only the new partition instead of recomputing history. The oracle is
    * the from-scratch aggregation over ALL events, so the query PROVES
    * merge(base, delta) ≡ full recompute bit-for-bit — which holds because
    * the partials carry exact decimal sums and long counts (associative,
    * order-free); double-typed partials would not survive this test. */
  def qIncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val cutoff = "2024-01-21"
    def partial(df: DataFrame): DataFrame =
      df.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).as("s"))   // stays DECIMAL: mergeable exactly
    val base = partial(ev.filter(col("ts") < lit(cutoff).cast("timestamp")))
    val delta = partial(ev.filter(col("ts") >= lit(cutoff).cast("timestamp")))
    base.unionByName(delta)
      .groupBy("user_id")
      .agg(sum(col("n_events")).as("n_events"), sum(col("s")).as("s"))
      .select(col("user_id"), col("n_events"), decOut(col("s")).as("sum_value"))
      .orderBy("user_id")
  }

  val qIncrementalAggSql: String =
    """SELECT user_id, count(*) AS n_events,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Bitwise aggregates as presence bitmaps — the bitmap-index pattern:
    * per (user, day), one `bit_or` fold of `1 << type_code` yields a
    * 5-bit mask of which event types the user triggered that day, and
    * `bit_count(mask)` reads the distinct-type count straight off the
    * bits (no countDistinct state). Masks are tiny fixed-width ints that
    * re-aggregate by further `bit_or` — the same merge-friendly shape the
    * HLL sketches have, here exact because the domain is enumerable.
    * `bit_xor` covers the remaining bitwise-aggregate family member. */
  def qBitmapAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val typeCode = when(col("event_type") === "click", 0)
      .when(col("event_type") === "error", 1)
      .when(col("event_type") === "purchase", 2)
      .when(col("event_type") === "signup", 3)
      .otherwise(4).cast("long")
    t(spark, sfDir, "events")
      .select(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        typeCode.as("tc"))
      .groupBy("user_id", "day")
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(tc AS INT))")).as("type_mask"),
        bit_count(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(tc AS INT))"))).as("n_types"),
        bit_xor(col("tc")).as("xor_code"),
        count(lit(1)).as("cnt"))
      .orderBy("user_id", "day")
  }

  val qBitmapAggSql: String =
    """WITH coded AS (
      |  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |         CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
      |              WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END AS tc
      |  FROM events)
      |SELECT user_id, day,
      |       bit_or(CAST(1 AS BIGINT) << tc) AS type_mask,
      |       CAST(bit_count(bit_or(CAST(1 AS BIGINT) << tc)) AS INTEGER) AS n_types,
      |       bit_xor(CAST(tc AS BIGINT)) AS xor_code,
      |       count(*) AS cnt
      |FROM coded GROUP BY user_id, day
      |ORDER BY user_id, day""".stripMargin

  /** Argmin/argmax aggregates (`max_by`/`min_by`): the id of each event
    * type's highest- and lowest-valued event in ONE aggregation pass — no
    * rank window, no self-join. `value` ties within a group would make the
    * bare aggregate nondeterministic, so the ordering key is a fixed-width
    * sortable encoding `printf('%010.2f', value) || '|' || lpad(event_id)`
    * — lexicographic order equals (value, event_id) order because values
    * carry exactly 2 decimals (5 significant digits round-trip the double
    * exactly in both engines) and both fields are zero-padded. */
  def qMinmaxBy(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = concat(format_string("%010.2f", col("value")), lit("|"),
      lpad(col("event_id").cast("string"), 10, "0"))
    t(spark, sfDir, "events")
      .groupBy("event_type")
      .agg(max_by(col("event_id"), ord).as("max_event"),
        min_by(col("event_id"), ord).as("min_event"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }

  val qMinmaxBySql: String =
    """SELECT event_type,
      |       arg_max(event_id, printf('%010.2f', value) || '|' || lpad(CAST(event_id AS VARCHAR), 10, '0')) AS max_event,
      |       arg_min(event_id, printf('%010.2f', value) || '|' || lpad(CAST(event_id AS VARCHAR), 10, '0')) AS min_event,
      |       max(value) AS max_value,
      |       min(value) AS min_value,
      |       count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** RANGE-frame window (value-based frame, not row-based): per event, the
    * count and exact decimal sum of the same user's events in the trailing
    * hour [ts−1h, ts]. The frame is expressed on exact integer microseconds
    * (`unix_micros`), so frame membership is integer comparison in both
    * engines; peers (equal timestamps) are included by RANGE semantics in
    * both, which keeps the sum deterministic without a tie-break. One sort
    * per user partition — the sliding-aggregation shape that needs no
    * self-join. */
  def qRangeFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0)
    t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts_str"),
        count(lit(1)).over(w).as("trailing_cnt"),
        decOut(sum(dec(col("value"))).over(w)).as("trailing_sum"))
      .orderBy("event_id")
  }

  val qRangeFrameSql: String =
    """SELECT event_id, user_id,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
      |       count(*) OVER w AS trailing_cnt,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DECIMAL(28,6)) AS DOUBLE) AS trailing_sum
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** Band join: click/error pairs for the same user within ±5 minutes,
    * via the binned equi-join (RangeJoin) — the scale-safe replacement for
    * an inequality-predicate nested loop. */
  def qRangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_event_id"), col("ts").as("c_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("e_event_id"), col("ts").as("e_ts"))
    graft.operators.RangeJoin
      .toleranceJoin(clicks, errors, Seq("user_id"), "c_ts", "e_ts", 300000000L)
      .select(col("user_id"), col("c_event_id"), col("e_event_id"),
        ((unix_micros(col("e_ts")) - unix_micros(col("c_ts"))).cast("double") / 1000000d)
          .as("dt_sec"))
      .orderBy("c_event_id", "e_event_id")
  }

  val qRangeJoinSql: String =
    """SELECT c.user_id, c.event_id AS c_event_id, e.event_id AS e_event_id,
      |       CAST(epoch_us(e.ts) - epoch_us(c.ts) AS DOUBLE) / 1000000 AS dt_sec
      |FROM events c JOIN events e
      |  ON c.user_id = e.user_id
      | AND c.event_type = 'click' AND e.event_type = 'error'
      | AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 300000000
      |ORDER BY c_event_id, e_event_id""".stripMargin

  /** Robust (median/MAD) anomaly readout per event type — the outlier
    * monitor every metrics pipeline runs where mean/stddev would be
    * dragged by the very outliers under detection. Built on
    * [[graft.operators.Robust.mad]]: two tiny per-type aggregates
    * broadcast back; the flag is row-local; the fact table never shuffles
    * for a join. med/mad are interpolated percentiles (hash-exact vs
    * quantile_cont — see q_percentile) and the 3·MAD comparison is one
    * correctly-rounded multiply on identical doubles, so counts are
    * oracle-exact. */
  def qAnomalyMad(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events")
    val stats = graft.operators.Robust.mad(ev, Seq("event_type"), "value")
    ev.join(broadcast(stats), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(col("__med")).as("med"),
        max(col("__mad")).as("mad"),
        sum(when(graft.operators.Robust.anomalyFlag("value"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  val qAnomalyMadSql: String =
    """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |             FROM events GROUP BY 1),
      |mad AS (SELECT e.event_type, m.med,
      |               quantile_cont(abs(e.value - m.med), 0.5) AS mad
      |        FROM events e JOIN med m ON e.event_type = m.event_type
      |        GROUP BY e.event_type, m.med)
      |SELECT m.event_type, count(*) AS n, m.med, m.mad,
      |       CAST(sum(CASE WHEN abs(e.value - m.med) > 3.0 * m.mad
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM events e JOIN mad m ON e.event_type = m.event_type
      |GROUP BY m.event_type, m.med, m.mad
      |ORDER BY m.event_type""".stripMargin

  /** Slowly-changing-dimension type-2 history build — the standard
    * warehouse pattern for turning an attribute-change log into versioned
    * validity intervals. Each user's signup events carry a derived `tier`
    * attribute; consecutive duplicates are collapsed (only *changes* open a
    * new version), then each version gets `[valid_from, valid_to)` bounds
    * via `lead()` and the open version is flagged `is_current`.
    *
    * Scale shape: ONE shuffle on `user_id`; all three window passes
    * (change-detect lag, version row_number, interval lead) share that
    * partitioning, so Catalyst plans a single Exchange feeding stacked
    * Window operators. Per-user state is a handful of rows — no skew
    * hazard at any user count. Deterministic: ordering is (ts, event_id),
    * never ts alone. */
  def qScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val attr = t(spark, sfDir, "events")
      .filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / lit(25.0d)).cast("long").as("tier"))
    val changes = attr
      .withColumn("prev_tier", lag(col("tier"), 1).over(wOrd))
      .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
    changes
      .withColumn("version", row_number().over(wOrd).cast("long"))
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(wOrd))
      .select(col("user_id"), col("version"), col("tier"),
        fmtTs(col("ts")).as("valid_from"),
        coalesce(fmtTs(col("valid_to_ts")), lit("9999-12-31 00:00:00")).as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  val qScd2Sql: String =
    """WITH attr AS (
      |  SELECT user_id, ts, event_id,
      |         CAST(floor(value / 25.0) AS BIGINT) AS tier
      |  FROM events WHERE event_type = 'signup'),
      |ch AS (
      |  SELECT *, lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           AS prev_tier
      |  FROM attr),
      |per AS (
      |  SELECT user_id, ts, event_id, tier FROM ch
      |  WHERE prev_tier IS NULL OR tier <> prev_tier)
      |SELECT user_id,
      |       CAST(row_number() OVER w AS BIGINT) AS version,
      |       tier,
      |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |       coalesce(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
      |                '9999-12-31 00:00:00') AS valid_to,
      |       lead(ts) OVER w IS NULL AS is_current
      |FROM per
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** Ordered trajectory assembly — collapse each user's event stream into
    * ONE ordered sequence string ("view>click>purchase>…") plus summary
    * stats. This is the agent-trajectory / dialogue-assembly shape of LLM
    * training-data prep: many small ordered records become one training
    * example per entity, order-exactly preserved.
    *
    * Distributed shape: groupBy(user) + collect_list(struct(ts, event_id,
    * type)), sorted PER GROUP with `sort_array` (struct ordering =
    * lexicographic (ts, event_id) — a total order, since event_id is
    * unique) then flattened with transform + array_join. The sort is local
    * to each group after one shuffle — no global sort of the event table.
    * Per-entity state is bounded by that entity's event count; entities
    * are independent, so the operator scales with the number of users, not
    * total events. */
  def qTrajectory(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sort_array(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("ordered"))
      .select(col("user_id"), col("n_events"), col("n_purchases"),
        array_join(transform(col("ordered"), e => e("event_type")), ">")
          .as("trajectory"),
        col("ordered")(0)("event_type").as("first_type"),
        element_at(col("ordered"), -1)("event_type").as("last_type"))
      .orderBy("user_id")

  val qTrajectorySql: String =
    """WITH t AS (
      |  SELECT user_id, count(*) AS n_events,
      |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
      |         string_agg(event_type, '>' ORDER BY ts, event_id) AS trajectory
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events, n_purchases, trajectory,
      |       string_split(trajectory, '>')[1] AS first_type,
      |       string_split(trajectory, '>')[-1] AS last_type
      |FROM t ORDER BY user_id""".stripMargin

  /** Count-min-sketch parameters: d hash rows × w buckets, universal
    * hashes h_j(k) = ((a_j·k + b_j) mod p) mod w with p = 2^31−1 and fixed
    * odd multipliers < 2^31 — pure BIGINT arithmetic both engines evaluate
    * identically (k ≤ ~2^31 keeps a_j·k < 2^62). */
  private val CmsW = 256
  private val CmsP = 2147483647L
  private val CmsA = Array(1686629717L, 1779033703L, 1013904223L, 1540483477L)
  private val CmsB = Array(12345L, 362437L, 69069L, 2654435769L)

  private def cmsBucket(j: Int, key: Column): Column =
    pmod(pmod(key * lit(CmsA(j)) + lit(CmsB(j)), lit(CmsP)), lit(CmsW.toLong))

  /** Mergeable count-min sketch: per-day CMS partials over `events.user_id`
    * merged into one monthly sketch, then heavy-hitter estimates read back
    * out — the re-aggregatable frequency sketch beside q_hll_merge's
    * distinct-count sketch, but with FIXED hash functions, so (unlike an
    * engine-owned sketch) the DuckDB oracle replays it exactly.
    *
    * CMS is the sketch a 100 TB pipeline keeps per shard/day: counters are
    * d×w integers regardless of key cardinality, merge is elementwise sum
    * (associative and commutative — partition- and day-order free), and a
    * point estimate is min_j counter[j][h_j(k)], an overestimate by design
    * (collisions only ever ADD counts; `CmsSpec`-style bound pinned in
    * QueriesSpec). Output: top-10 users by estimate (tie → user_id) with
    * their exact counts beside — est ≥ exact always, equality when no
    * heavier key shares all d buckets.
    *
    * Scale shape: the sketch build is one 4×-explode + two-phase agg down
    * to d·w = 1024 rows (map-side combine absorbs the explode); the merged
    * sketch broadcasts into the estimate join; distinct-key extraction is
    * the only real shuffle. At 1000 executors the per-day partials ARE the
    * shuffle payload — 1024 longs per day, not per row. */
  def qCmsMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = t(spark, sfDir, "events").select(col("user_id"),
      date_format(col("ts"), "yyyy-MM-dd").as("day"))
    val rows = ev.select(col("user_id"), col("day"),
      explode(array((0 until CmsA.length).map(lit): _*)).as("j"))
      .withColumn("bucket", when(col("j") === 0, cmsBucket(0, col("user_id")))
        .when(col("j") === 1, cmsBucket(1, col("user_id")))
        .when(col("j") === 2, cmsBucket(2, col("user_id")))
        .otherwise(cmsBucket(3, col("user_id"))))
    // per-day partials, then the elementwise-sum merge — two aggs, the
    // second over at most days × d × w rows
    val daily = rows.groupBy("day", "j", "bucket").agg(count(lit(1)).as("cnt"))
    val merged = daily.groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
    val users = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
    val keyed = users.select(col("user_id"), col("exact"),
      explode(array((0 until CmsA.length).map(lit): _*)).as("j"))
      .withColumn("bucket", when(col("j") === 0, cmsBucket(0, col("user_id")))
        .when(col("j") === 1, cmsBucket(1, col("user_id")))
        .when(col("j") === 2, cmsBucket(2, col("user_id")))
        .otherwise(cmsBucket(3, col("user_id"))))
    keyed.join(broadcast(merged), Seq("j", "bucket"))
      .groupBy("user_id").agg(min(col("cnt")).as("est"), min(col("exact")).as("exact"))
      .orderBy(col("est").desc, col("user_id").asc)
      .limit(10)
  }

  lazy val qCmsMergeSql: String = {
    val hash = (j: Int) =>
      s"((user_id * ${CmsA(j)} + ${CmsB(j)}) % $CmsP) % $CmsW"
    val jCases = (0 until CmsA.length).map(j =>
      s"WHEN ${j} THEN ${hash(j)}").mkString(" ")
    s"""WITH rows_j AS (
       |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, j.j AS j,
       |         CASE j.j $jCases END AS bucket
       |  FROM events, (SELECT unnest(generate_series(0, ${CmsA.length - 1})) AS j) j),
       |daily AS (SELECT day, j, bucket, count(*) AS cnt FROM rows_j GROUP BY 1, 2, 3),
       |merged AS (SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS cnt FROM daily GROUP BY 1, 2),
       |users AS (SELECT user_id, count(*) AS exact FROM events GROUP BY 1),
       |keyed AS (
       |  SELECT u.user_id, u.exact, j.j AS j,
       |         CASE j.j $jCases END AS bucket
       |  FROM users u, (SELECT unnest(generate_series(0, ${CmsA.length - 1})) AS j) j)
       |SELECT k.user_id, CAST(min(m.cnt) AS BIGINT) AS est,
       |       CAST(min(k.exact) AS BIGINT) AS exact
       |FROM keyed k JOIN merged m ON m.j = k.j AND m.bucket = k.bucket
       |GROUP BY k.user_id
       |ORDER BY est DESC, user_id ASC
       |LIMIT 10""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cms_merge" -> (qCmsMerge _),
    "q_trajectory" -> (qTrajectory _),
    "q_scd2" -> (qScd2 _),
    "q_anomaly_mad" -> (qAnomalyMad _),
    "q_string_date" -> (qStringDate _),
    "q_json_extract" -> (qJsonExtract _),
    "q_variant_extract" -> (qVariantExtract _),
    "q_approx_topk" -> (qApproxTopk _),
    "q_changelog_compact" -> (qChangelogCompact _),
    "q_session_window" -> (qSessionWindow _),
    "q_tumbling_window" -> (qTumblingWindow _),
    "q_sliding_window" -> (qSlidingWindow _),
    "q_sessionize" -> (qSessionize _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_range_frame" -> (qRangeFrame _),
    "q_minmax_by" -> (qMinmaxBy _),
    "q_bitmap_agg" -> (qBitmapAgg _),
    "q_incremental_agg" -> (qIncrementalAgg _),
    "q_retention" -> (qRetention _),
    "q_funnel" -> (qFunnel _),
    "q_transition" -> (qTransition _),
    "q_ab_lift" -> (qAbLift _),
    "q_resample" -> (qResample _))

  val oracles: Map[String, String] = Map(
    "q_cms_merge" -> qCmsMergeSql,
    "q_trajectory" -> qTrajectorySql,
    "q_scd2" -> qScd2Sql,
    "q_anomaly_mad" -> qAnomalyMadSql,
    "q_string_date" -> qStringDateSql,
    "q_json_extract" -> qJsonExtractSql,
    "q_variant_extract" -> qVariantExtractSql,
    "q_approx_topk" -> qApproxTopkSql,
    "q_changelog_compact" -> qChangelogCompactSql,
    "q_session_window" -> qSessionWindowSql,
    "q_tumbling_window" -> qTumblingWindowSql,
    "q_sliding_window" -> qSlidingWindowSql,
    "q_sessionize" -> qSessionizeSql,
    "q_asof_join" -> qAsofJoinSql,
    "q_range_join" -> qRangeJoinSql,
    "q_range_frame" -> qRangeFrameSql,
    "q_minmax_by" -> qMinmaxBySql,
    "q_bitmap_agg" -> qBitmapAggSql,
    "q_incremental_agg" -> qIncrementalAggSql,
    "q_retention" -> qRetentionSql,
    "q_funnel" -> qFunnelSql,
    "q_transition" -> qTransitionSql,
    "q_ab_lift" -> qAbLiftSql,
    "q_resample" -> qResampleSql)
}
