package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput probe: `runMain graft.StreamProbe <sfDir>
  * [maxFilesPerTrigger]` drives the real Structured Streaming pipelines
  * (file source → watermark → stateful op → sink) over the scale
  * rehearsal's events table with `Trigger.AvailableNow`, reporting
  * events/sec per pipeline. Micro-batch boundaries come from
  * `maxFilesPerTrigger`, so the run exercises multi-batch state
  * handling (watermark advance, timeout sweeps, state store churn),
  * not a single monolithic batch.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata-sf10"
    val maxFiles = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = Engine.session("graft-streamprobe", cpus)

    val dir = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(dir).schema
    val nEvents = spark.read.parquet(dir).count()
    println(s"[stream] $nEvents events, maxFilesPerTrigger=$maxFiles")

    def drain(name: String, build: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Dataset[_]): Unit = {
      val src = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFiles)
        .parquet(dir)
      val t0 = System.nanoTime()
      val q = build(src).writeStream
        .format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"sp-$name").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.length
      println(f"[stream] $name: $dt%.1f s, ${nEvents / dt}%.0f events/s, $batches batches")
    }

    drain("hourly_agg", df =>
      streaming.EventStreams.hourlyByType(df, watermark = "2 hours"))
    drain("dedup", df =>
      streaming.EventStreams.dedupStream(df, Seq("event_id"), watermark = "2 hours"))
    drain("sessionize_fmgws", df =>
      streaming.EventStreams.sessionize(spark, df))
    spark.stop()
  }
}
