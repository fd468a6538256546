package graft.queries

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables.t

/** Puts the Structured Streaming path itself under the driver's DuckDB
  * gate (the in-JVM StreamingSpec twins prove batch parity; this proves
  * the full readStream → stateful agg → parquet sink → read-back loop
  * end-to-end against an external oracle).
  *
  * Watermark mechanics make a finite stream tricky: with append output,
  * a window only emits once the event-time watermark passes its end, so
  * the windows near max(ts) would be held in state forever when the
  * input runs dry. The fixture therefore appends ONE sentinel event 4
  * hours past max(ts): when `Trigger.AvailableNow` drains the input, the
  * final watermark (sentinel − 2 h delay) clears every real window, and
  * the sentinel's own (incomplete, never-emitted) window is excluded
  * from the result by construction. At production scale the stream is
  * unbounded and no sentinel is needed — this is purely the
  * finite-fixture harness.
  */
object StreamQueries {

  private def rm(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
    f.delete()
  }

  /** Streaming twin of q_tumbling_window (minus the n_users distinct —
    * a distinct aggregate is not incrementally computable in append mode),
    * run for real through a checkpointed parquet sink. */
  def qStreamTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    val base = new File("/root/repo/target/stream_oracle/" + new File(sfDir).getName)
    rm(base)
    val inDir = new File(base, "in").getAbsolutePath
    val outDir = new File(base, "out").getAbsolutePath
    val ckpt = new File(base, "ckpt").getAbsolutePath

    val ev = t(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    // one scalar to the driver: the sentinel timestamp
    val maxTs = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 4L * 3600 * 1000)
    val sentinel = spark.range(1).select(
      lit(-1L).as("event_id"), lit(sentinelTs).as("ts"),
      lit(-1L).as("user_id"), lit(0.0).as("value"))
    ev.unionByName(sentinel).write.mode("overwrite").parquet(inDir)

    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE")
      .parquet(inDir)
    val q = graft.streaming.EventStreams.tumblingCounts(stream, watermark = "2 hours")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val sentinelHour = new java.text.SimpleDateFormat("yyyy-MM-dd HH:00:00")
    sentinelHour.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    spark.read.parquet(outDir)
      .filter(col("hour_start") =!= sentinelHour.format(sentinelTs))
      .orderBy("hour_start")
  }

  /** Oracle: the plain batch aggregation over `events` — the streaming
    * result must be indistinguishable from batch. */
  val qStreamTumblingSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |       count(*) AS cnt,
      |       CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> (qStreamTumbling _))

  val oracles: Map[String, String] = Map(
    "q_stream_tumbling" -> qStreamTumblingSql)
}
