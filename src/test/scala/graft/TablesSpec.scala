package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the events `ts` load path against every encoding the driver's
  * fixture has shipped in, so a regeneration in either direction cannot
  * silently kill the event-time/streaming/JSON suite again (round 7: the
  * fixture flipped TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and a hard-coded
  * nanos-Long assumption took out 31 queries at analysis time).
  *
  * Three tiny single-row fixtures, one per branch of Tables.t:
  *   - raw INT64 (what TIMESTAMP(NANOS) surfaces as under the legacy
  *     nanosAsLong flag, and what a plain Long column reads as anyway);
  *   - TIMESTAMP(MICROS) without isAdjustedToUTC → TIMESTAMP_NTZ;
  *   - TIMESTAMP(MICROS) adjusted to UTC → TimestampType.
  * All three must load to TimestampType with the identical wall clock.
  */
class TablesSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  // 2021-03-04 05:06:07.123456 UTC
  private val micros = 1614834367123456L

  private def writeFixture(build: => DataFrame): String = {
    val dir = Files.createTempDirectory("tables-spec").toFile
    dir.deleteOnExit()
    build.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.getAbsolutePath
  }

  private def loadedTs(sfDir: String): (DataType, String) = {
    val df = Tables.t(spark, sfDir, "events")
    val rendered = df.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect().head.getString(0)
    (df.schema("ts").dataType, rendered)
  }

  test("nanos-as-Long fixture is truncated to micros TimestampType") {
    import TestSpark.spark.implicits._
    val dir = writeFixture(
      Seq((1L, micros * 1000 + 789, 7L)).toDF("event_id", "ts", "user_id"))
    val (dt, wall) = loadedTs(dir)
    assert(dt === TimestampType)
    assert(wall === "2021-03-04 05:06:07.123456") // sub-micro nanos dropped
  }

  test("TIMESTAMP_NTZ (micros, not UTC-adjusted) fixture casts to TimestampType") {
    import TestSpark.spark.implicits._
    val dir = writeFixture(
      Seq((1L, micros, 7L)).toDF("event_id", "ts", "user_id")
        .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType)))
    // sanity: the fixture really round-trips as NTZ (not session timestamp)
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      === TimestampNTZType)
    val (dt, wall) = loadedTs(dir)
    assert(dt === TimestampType)
    assert(wall === "2021-03-04 05:06:07.123456")
  }

  test("UTC-adjusted TIMESTAMP(MICROS) fixture passes through unchanged") {
    import TestSpark.spark.implicits._
    val dir = writeFixture(
      Seq((1L, micros, 7L)).toDF("event_id", "ts", "user_id")
        .withColumn("ts", timestamp_micros(col("ts"))))
    val (dt, wall) = loadedTs(dir)
    assert(dt === TimestampType)
    assert(wall === "2021-03-04 05:06:07.123456")
  }

  test("streaming sniffed schema matches the batch load on the live fixture") {
    val batch = Tables.t(spark, TestSpark.Sf0001, "events")
    val stream = streaming.EventStreams.readEventStream(spark, TestSpark.Sf0001)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType === TimestampType)
    assert(stream.schema === batch.schema)
  }
}
