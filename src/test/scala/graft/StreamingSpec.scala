package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** Streaming semantics = batch semantics: the tumbling-window stream over
  * the events parquet must produce exactly the rows of the batch
  * q_tumbling_window aggregation; the stateful sessionizer must close
  * sessions on gap and on watermark timeout.
  */
class StreamingSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("streaming tumbling counts equal batch aggregation (complete mode)") {
    val stream = EventStreams.readEventStream(spark, TestSpark.Sf0001)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_test")
      .select("hour_start", "cnt", "sum_value")
      .collect().map(_.toSeq).toSet

    val batch = graft.queries.EventQueries
      .qTumblingWindow(spark, TestSpark.Sf0001)
      .select("hour_start", "cnt", "sum_value")
      .collect().map(_.toSeq).toSet

    assert(streamed == batch)
  }

  test("streaming sliding counts equal batch aggregation (complete mode)") {
    val stream = EventStreams.readEventStream(spark, TestSpark.Sf0001)
    val q = EventStreams.slidingCounts(stream)
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sliding_test")
      .select("window_start", "cnt", "sum_value")
      .collect().map(_.toSeq).toSet

    val batch = graft.queries.EventQueries
      .qSlidingWindow(spark, TestSpark.Sf0001)
      .select("window_start", "cnt", "sum_value")
      .collect().map(_.toSeq).toSet

    assert(streamed == batch)
  }

  test("streaming chunk verdicts equal the batch chunkDedup survival counts") {
    implicit val sq = spark.sqlContext
    import graft.streaming.DedupStreams
    val docsDf = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(80)
    val batchRows = graft.operators.Dedup.chunkDedup(docsDf, "doc_id", "text", chunkWords = 10)
      .select("doc_id", "n_chunks", "n_kept").as[(Long, Long, Long)].collect()
    val batch = batchRows.map(r => r._1 -> r._3).toMap
    val docs = docsDf.collect().map(r => DedupStreams.Doc(r.getLong(0), r.getString(1)))
    val input = MemoryStream[DedupStreams.Doc]
    val q = DedupStreams.chunkVerdictStream(input.toDS())
      .writeStream.format("memory").queryName("chunk_stream_test")
      .outputMode("append").start()
    try {
      // id-ordered delivery across two micro-batches = the batch operator's
      // global (id, pos) first-occurrence order
      val (first, rest) = docs.splitAt(40)
      input.addData(first.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(rest.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("chunk_stream_test")
        .groupBy("doc_id")
        .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .as[(Long, Long)].collect().toMap
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      // the parity check above is only meaningful if the fixture actually
      // contains duplicated chunks — pin that dedup was exercised
      assert(batchRows.exists(r => r._3 < r._2),
        "fixture contains no duplicated chunk — parity check is vacuous")
    } finally q.stop()
  }

  test("streaming MinHash-LSH candidates equal the batch banding pairs") {
    implicit val sq = spark.sqlContext
    import graft.streaming.DedupStreams
    val docsDf = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(60)
    val batch = graft.operators.Dedup.minhashLshPairs(docsDf, "doc_id", "text")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    CacheScope.release()
    val docs = docsDf.collect().map(r => DedupStreams.Doc(r.getLong(0), r.getString(1)))
    val input = MemoryStream[DedupStreams.Doc]
    val q = DedupStreams.candidateStream(input.toDS())
      .writeStream.format("memory").queryName("minhash_stream_test")
      .outputMode("append").start()
    try {
      // two micro-batches: exercises both in-batch pairing and cross-batch state
      val (first, rest) = docs.splitAt(30)
      input.addData(first.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(rest.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("minhash_stream_test")
        .select("d1", "d2").distinct().as[(Long, Long)].collect().toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(batch.nonEmpty, "fixture should contain at least one candidate pair")
    } finally q.stop()
  }

  test("stream-static enrichment join equals the batch join, and broadcasts") {
    val stream = EventStreams.readEventStream(spark, TestSpark.Sf0001)
    val batchEvents = graft.Tables.t(spark, TestSpark.Sf0001, "events")
    // static dimension: user tier derived deterministically from user_id
    val dim = batchEvents.select("user_id").distinct()
      .withColumn("tier", pmod(col("user_id"), lit(3L)))
    val enriched = EventStreams.enrichStream(stream, dim)
      .groupBy("tier").agg(count(lit(1)).as("cnt"))
    val q = enriched.writeStream.format("memory").queryName("enrich_test")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enrich_test")
      .select("tier", "cnt").as[(Long, Long)].collect().toSet
    val batch = batchEvents.join(dim, Seq("user_id"), "left")
      .groupBy("tier").agg(count(lit(1)).as("cnt"))
      .select("tier", "cnt").as[(Long, Long)].collect().toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // the join must be a broadcast hash join — the stream side never shuffles
    val p = EventStreams.enrichStream(stream, dim)
      .queryExecution.analyzed.toString
    assert(p.contains("ResolvedHint"), s"broadcast hint lost:\n$p")
  }

  test("stream-stream interval join matches the batch join on the same rows") {
    implicit val sq = spark.sqlContext
    def ts(min: Long) = new Timestamp((300000 + min) * 60000L)
    // impressions (left) and clicks (right); user 1 clicks twice — one
    // inside the 30-min gap, one outside; user 2's click precedes the
    // impression (must NOT match); user 3 has no click
    val imps = Seq((10L, ts(0), 1L), (11L, ts(0), 2L), (12L, ts(5), 3L))
    val clicks = Seq((20L, ts(10), 1L), (21L, ts(50), 1L), (22L, ts(-5), 2L))
    val li = MemoryStream[(Long, Timestamp, Long)]
    val ri = MemoryStream[(Long, Timestamp, Long)]
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("event_id"), col("_2").as("ts"), col("_3").as("user_id"))
    val joined = EventStreams.intervalJoin(shape(li.toDS().toDF()), shape(ri.toDS().toDF()))
      .select("l_event_id", "r_event_id")
    val q = joined.writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append").start()
    try {
      li.addData(imps: _*); ri.addData(clicks: _*)
      q.processAllAvailable()
      // advance both watermarks far past every buffered row so results flush
      li.addData((98L, ts(500), 99L)); ri.addData((99L, ts(500), 98L))
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_test")
        .as[(Long, Long)].collect().toSet
      val lb = shape(imps.toDF())
      val rb = shape(clicks.toDF())
      val batch = EventStreams.intervalJoin(lb, rb)
        .select("l_event_id", "r_event_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch && batch == Set((10L, 20L)),
        s"stream=$streamed batch=$batch")
    } finally q.stop()
  }

  test("streaming exact dedup: first content wins, state bounded by watermark") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    def ts(min: Long) = new Timestamp((200000 + min) * 60000L)
    val deduped = EventStreams.dedupStream(
      input.toDS().toDF("doc_id", "ts", "text"), "ts", "text",
      watermark = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0), "alpha"), (2L, ts(1), "beta"), (3L, ts(2), "alpha"))
      q.processAllAvailable()
      val first = spark.table("dedup_test").select("doc_id").as[Long].collect().toSet
      assert(first == Set(1L, 2L), s"in-batch duplicate not dropped: $first")
      // same content again within the watermark window: still a duplicate
      input.addData((4L, ts(3), "alpha"))
      q.processAllAvailable()
      assert(spark.table("dedup_test").select("doc_id").as[Long].collect().toSet
        == Set(1L, 2L))
      // far beyond the watermark: old keys expired, content re-admitted —
      // this is the bounded-state contract, not a correctness bug
      input.addData((5L, ts(100), "gamma"))
      q.processAllAvailable()
      input.addData((6L, ts(120), "alpha"))
      q.processAllAvailable()
      val fin = spark.table("dedup_test").select("doc_id").as[Long].collect().toSet
      assert(fin.contains(6L), s"expired-state re-admit missing: $fin")
    } finally q.stop()
  }

  test("file-sink restart from checkpoint is exactly-once (no reprocessing)") {
    val out = java.nio.file.Files.createTempDirectory("stream_sink").toString
    val chk = java.nio.file.Files.createTempDirectory("stream_chk").toString
    def start() = EventStreams.readEventStream(spark, TestSpark.Sf0001)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", chk)
      .start()
    val expected = graft.Tables.t(spark, TestSpark.Sf0001, "events").count()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart against the same checkpoint: the file source must recognize
    // every input file as already committed and write nothing new
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val n = spark.read.parquet(out).count()
    assert(n == expected, s"restart reprocessed input: $n != $expected")
  }

  test("stateful sessionizer: gap closes a session, watermark flushes the tail") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS())
    val q = sessions.writeStream.format("memory").queryName("session_test")
      .outputMode("append").start()
    try {
      // offset from epoch: the initial watermark is 0, and rows with
      // ts <= watermark are dropped as late
      def ts(min: Long) = new Timestamp((100000 + min) * 60000L)
      // user 1: events at t=0,10 then a 40-min gap then t=50
      input.addData(Event(1, ts(0), 1L, 1.0), Event(2, ts(10), 1L, 2.0),
        Event(3, ts(50), 1L, 4.0))
      q.processAllAvailable()
      // first session (0..10) closed by the in-batch gap
      val afterGap = spark.table("session_test").as[Session].collect()
      assert(afterGap.map(s => (s.user_id, s.n_events, s.sum_value)).toSet ==
        Set((1L, 2L, 3.0)))
      // advance watermark far: t=50 session times out (watermark 1h + gap)
      input.addData(Event(9, ts(50 + 200), 2L, 9.0))
      q.processAllAvailable()
      input.addData(Event(10, ts(50 + 400), 2L, 1.0))
      q.processAllAvailable()
      val all = spark.table("session_test").as[Session].collect()
      assert(all.exists(s => s.user_id == 1L && s.n_events == 1L && s.sum_value == 4.0),
        s"open session not flushed: ${all.mkString(", ")}")
    } finally q.stop()
  }
}
