package graft

import graft.operators.AsOf
import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built data. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof picks latest right row at or before left ts, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")),   // before any right row
      (4L, 30L, ts("2024-01-01 09:00:00"))    // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 5.0),
      (101L, 10L, ts("2024-01-01 11:00:00"), 7.0),
      (102L, 20L, ts("2024-01-01 09:30:00"), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")

    val got = AsOf.join(left, right, "user_id", "user_id", "ts", "ts",
      Seq("event_id", "value"), col("event_id"))
      .orderBy("event_id").collect()

    assert(got(0).getLong(3) == 100L && got(0).getDouble(4) == 5.0)
    assert(got(1).getLong(3) == 101L && got(1).getDouble(4) == 7.0)
    assert(got(2).isNullAt(3))   // right rows all later
    assert(got(3).isNullAt(3))   // key absent on right
  }

  test("asof: simultaneous right row visible; tie-break picks larger id") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (101L, 10L, ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOf.join(left, right, "user_id", "user_id", "ts", "ts",
      Seq("event_id", "value"), col("event_id")).head()
    assert(got.getLong(3) == 101L && got.getDouble(4) == 2.0)
  }

  test("streaming hourly agg (complete mode) matches batch aggregation") {
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val stream = spark.readStream
      .schema(Tables.apply(spark, sf, "events").schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sf)
    val withTs = if (stream.schema("ts").dataType.typeName == "long")
      stream.withColumn("ts", timestamp_micros(expr("ts div 1000"))) else stream
    val q = withTs
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("hourly_parity")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("hourly_parity")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch, "streaming complete-mode result diverged from batch")
  }
}
