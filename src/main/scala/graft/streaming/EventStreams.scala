package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming lift of the event pipeline (SURVEY §7.6): the
  * batch queries in EventQueries define the semantics; these wrappers run
  * the same logic incrementally with event-time watermarks.
  *
  * Batch-first design: `tumblingCounts` is literally the q_tumbling_window
  * aggregation applied to a streaming DataFrame — Catalyst plans the
  * incremental version (partial aggregates + state store) from the same
  * declarative plan. `sessionize` needs custom state (open sessions), so it
  * drops to `flatMapGroupsWithState` — the Spark-native analog of a
  * stateful stream operator, with event-time timeouts closing idle
  * sessions at the watermark.
  */
object EventStreams {

  /** Streaming read of an events parquet directory.
    *
    * A streaming file source needs an explicit schema, and the fixture's
    * `ts` encoding has shipped as both TIMESTAMP(NANOS) (→ nanos Long
    * under the legacy flag) and TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ), so
    * the schema is sniffed from the parquet footer with a plan-time batch
    * read (footer-only — no data pages are scanned) instead of being
    * hard-coded; normalization is the shared [[graft.Tables.normalizeEventTs]].
    */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val sniffed = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the streaming file source wants a directory: point it at sfDir and
    // glob-filter to the events file
    graft.Tables.normalizeEventTs(spark.readStream
      .schema(sniffed)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir))
  }

  /** Tumbling 1-hour event-time counts — identical aggregation to
    * q_tumbling_window; watermark bounds state. */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DecimalType(28, 6))
          .cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("cnt"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes — the streaming twin of
    * q_sliding_window. Same declarative aggregation; Spark assigns each
    * event to its 4 overlapping windows at the map side (a row-local
    * expand, NOT 4 shuffles), partial-aggregates, and the watermark
    * retires window state once event time passes window.end + delay. */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DecimalType(28, 6))
          .cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("cnt"), col("sum_value"))

  /** Streaming exact dedup — the stream twin of `Dedup.exactByContent`
    * for a continuously-arriving corpus: first record per content hash
    * wins, duplicates arriving within the watermark window are dropped,
    * and `dropDuplicatesWithinWatermark` expires state older than the
    * watermark (bounded state, unlike a bare `dropDuplicates` whose key
    * set grows forever). `contentCol` is hashed so state stores 16-byte
    * keys, not document bodies. */
  def dedupStream(docs: DataFrame, tsCol: String, contentCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, watermark)
      .withColumn("__key", graft.plans.HashExpressions.md5Hex(col(contentCol)))
      .dropDuplicatesWithinWatermark("__key")
      .drop("__key")

  /** Stream-static enrichment join: decorate a streaming fact with a
    * static dimension (user tier, document metadata, …). No state store
    * is involved — each micro-batch plans a plain join against the
    * static relation, which Spark re-resolves per batch (a dimension
    * table that changes on disk is picked up without restarting the
    * query). This is the stateless streaming join that scales;
    * stream-stream joins (stateful, watermark-bounded) are a different
    * operator.
    *
    * `hintBroadcast` (default true) marks the dim side broadcastable so
    * every micro-batch is a broadcast hash join and the stream never
    * shuffles — right for bounded dims (tiers, configs, vocabularies).
    * Pass false for a dim that grows with an entity population (per-user
    * tables at 10^8+ users outgrow the 8 GB broadcast limit): the
    * planner then shuffles the micro-batch against the dim instead of
    * OOMing executors. */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String = "user_id",
                   hintBroadcast: Boolean = true): DataFrame =
    events.join(if (hintBroadcast) broadcast(dim) else dim, Seq(key), "left")

  /** Stream-stream interval join (impression→conversion attribution):
    * match each `right` event to `left` events of the same user that
    * happened within `maxGap` BEFORE it. Both sides are watermarked and
    * the join condition bounds event-time distance, so Spark can expire
    * buffered rows once the watermark passes `ts + maxGap` — state stays
    * O(events per gap window), not O(stream). Without the time-range
    * predicate the state store would grow forever; with it, this is the
    * stateful join that survives an unbounded stream. Each side's columns
    * are prefixed (`l_` / `r_`) so the joined schema is unambiguous. */
  def intervalJoin(left: DataFrame, right: DataFrame, maxGap: String = "30 minutes",
                   key: String = "user_id", watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("l_key"), col("ts").as("l_ts"),
        col("event_id").as("l_event_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"))
    l.join(r, expr(
      s"l_key = r_key AND l_ts <= r_ts AND r_ts <= l_ts + interval $maxGap"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
  case class SessionState(start: Long, last: Long, nEvents: Long, sumValue: Double)
  case class Session(user_id: Long, start_ts: java.sql.Timestamp,
                     end_ts: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Gap duration (event-time) that closes a session — 30 min, matching
    * the batch q_sessionize. */
  val GapMs: Long = 30L * 60 * 1000

  /** Stateful streaming sessionization: per-user open-session state;
    * events extend the session or close it (gap > 30 min) and emit;
    * event-time timeout at watermark + gap flushes idle sessions.
    *
    * State is O(active users); emission is append-mode (closed sessions
    * are immutable) — the shape that scales to unbounded streams.
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          def toSession(s: SessionState): Session =
            Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
              s.nEvents, s.sumValue)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (cur == null) cur = SessionState(t, t, 1, e.value)
              else if (t - cur.last > GapMs) {
                closed += toSession(cur)
                cur = SessionState(t, t, 1, e.value)
              } else {
                cur = SessionState(cur.start, math.max(cur.last, t),
                  cur.nEvents + 1, cur.sumValue + e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.last + GapMs)
            }
            closed.result().iterator
          }
      }
  }
}
