package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Structured Streaming layer: file-arrival ingest + stateful sessions. */
class StreamingSpec extends SparkSpec {

  test("hourlyByType over a file stream drains with AvailableNow semantics") {
    val batchEvents = Tables.events(spark, sf)
    val schema = batchEvents.schema
    // stream the same parquet dir the batch reader uses
    val stream = spark.readStream.schema(
        Tables.apply(spark, sf, "events").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val withTs = if (stream.schema("ts").dataType.typeName == "long")
      stream.withColumn("ts", timestamp_micros(expr("ts div 1000"))) else stream
    val q = EventStreams.hourlyByType(withTs)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode only emits finalized windows (watermark passed); the
    // plumbing check is that the stream ran and state was maintained.
    assert(spark.table("hourly_out").schema.fieldNames.contains("hour_start"))
  }

  test("sessionizeBatch: gap splits sessions, totals exact") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0),   // session 1
      (1L, ts(500), 4.0),                    // session 2 (gap > 6h? no — use 30m gap)
      (2L, ts(0), 8.0)
    ).toDF("user_id", "ts", "value")
    val got = EventStreams.sessionizeBatch(df, gapMs = 30 * 60000)
      .orderBy("user_id", "session_seq").collect()
    assert(got.length == 3)
    assert(got(0).getLong(4) == 2 && got(0).getDouble(5) == 3.0)
    assert(got(1).getLong(4) == 1 && got(1).getDouble(5) == 4.0)
    assert(got(2).getLong(4) == 1 && got(2).getDouble(5) == 8.0)
  }

  test("stream-stream interval join matches clicks to in-window purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    val buys = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    // user 1: purchase 30m after click (in window); user 2: 90m after (out)
    clicks.addData((1L, ts(0), "c1"), (2L, ts(0), "c2"))
    buys.addData((1L, ts(30), 9.99), (2L, ts(90), 5.0))
    clicks.addData((9L, ts(600), "late"))   // advance both watermarks
    buys.addData((9L, ts(600), 0.0))
    val joined = EventStreams.intervalJoinStreams(
      clicks.toDF().toDF("user_id", "ts", "click_id"),
      buys.toDF().toDF("user_id", "ts", "amount"),
      key = "user_id", before = "0 seconds", after = "1 hour")
    val q = joined
      .select(col("l.user_id").as("uid"), col("click_id"), col("amount"))
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_out").collect()
    assert(rows.exists(r => r.getLong(0) == 1L && r.getDouble(2) == 9.99), rows.mkString(";"))
    assert(!rows.exists(r => r.getLong(0) == 2L), s"out-of-window purchase joined: ${rows.mkString(";")}")
  }

  test("session_window works in STREAMING mode with a watermark (same operator as batch)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    source.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
    source.addData((1L, ts(120), 3.0))   // > 30m gap → new session
    source.addData((1L, ts(600), 1.0))   // advances watermark, finalizes earlier sessions
    val events = source.toDF().toDF("user_id", "ts", "value")
    val q = events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .writeStream.format("memory").queryName("native_sess_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("native_sess_out").collect()
    // first session: 2 events totalling 3.0; second: the lone ts(120) event
    assert(closed.exists(r => r.getLong(2) == 2 && r.getDouble(3) == 3.0), closed.mkString(";"))
    assert(closed.exists(r => r.getLong(2) == 1 && r.getDouble(3) == 3.0), closed.mkString(";"))
  }

  test("sessionize (flatMapGroupsWithState) closes sessions on gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    source.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
    source.addData((1L, ts(120), 3.0))  // > 30m gap → closes first session
    source.addData((1L, ts(600), 1.0))  // advances watermark far enough
    val events = source.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.sessionize(spark, events, gapMs = 30 * 60000)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sess_out").collect()
    assert(closed.exists(r => r.getLong(2) == 2 && r.getDouble(3) == 3.0))
  }

  test("sessionize survives late events whose gap deadline predates the watermark") {
    // regression (sf10 stream probe): user 7's batch-2 event is 10 hours
    // late — the watermark (advanced by user 8) already passed its
    // 30-minute gap deadline, and setting that stale timeout threw
    // FLATMAPGROUPSWITHSTATE_USER_FUNCTION_ERROR pre-fix. The session
    // must close immediately instead.
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    // file-source shape, exactly like the sf10 drain: one file per
    // micro-batch, back to back. The late-record filter runs one batch
    // behind the eviction watermark, so batch-2 rows older than the
    // eviction watermark still reach the user function with a stale
    // gap deadline.
    val dir = java.nio.file.Files.createTempDirectory("sess-late").toString
    Seq((8L, ts(720), 1.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/f1")
    Thread.sleep(50)
    Seq((7L, ts(5), 4.0), (7L, ts(10), 6.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/f2")
    val schema = spark.read.parquet(s"$dir/f1").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*/")
    val q = EventStreams.sessionize(spark, src, gapMs = 30 * 60000)
      .writeStream.format("memory").queryName("sess_late").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("sess_late").collect()
    val u7 = out.filter(_.getLong(0) == 7L)
    assert(u7.length == 1 && u7(0).getLong(2) == 2 && u7(0).getDouble(3) == 10.0,
      out.mkString(";"))
  }
}
