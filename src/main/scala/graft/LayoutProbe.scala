package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the sort-on-write data-skipping layout: a fact table
  * range-partitioned + sorted on its filter column at write time lets
  * parquet min/max statistics prune whole files and row groups for a
  * narrow range predicate — the scan reads the matching slice instead
  * of the whole table. This is the scan-side twin of the bucketed-join
  * layout (BucketProbe): bucketing kills the join shuffle, range-sort
  * kills the full-table read for selective time/range filters — at
  * 100 TB, the difference between touching ~a month of files and
  * touching seven years.
  *
  * Usage: `runMain graft.LayoutProbe <sfDir>`. Rewrites lineitem
  * range-sorted by l_shipdate into /tmp, runs a 30-day revenue
  * aggregate on both layouts, and prints one JSON line with times and
  * input bytes read (task InputMetrics summed per run — the
  * row-group/file pruning evidence: the sorted layout reads only the
  * files whose min/max overlap the predicate).
  */
object LayoutProbe {

  /** Scratch path for the date-sorted lineitem layout, keyed by the
    * source sf dir: ZOrderProbe reuses the layout when `_SUCCESS`
    * exists, and a path shared across scale factors would hand it a
    * stale layout from a previous run at a different SF — which only
    * surfaces later as a confusing "layouts disagree" failure, after
    * the z-order write cost is already paid.
    */
  def sortedLayoutPath(sfDir: String): String = {
    val key = java.lang.Integer.toHexString(
      new java.io.File(sfDir).getAbsolutePath.hashCode)
    s"/tmp/graft_layout_lineitem_sorted_$key"
  }

  def query(l: DataFrame): DataFrame =
    l.filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1998-07-01").cast("timestamp"))
      .agg(functions.Compat.exactSum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n"))

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LayoutProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = Engine.session("graft-layoutprobe", cpus)

    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) {
            bytesRead.addAndGet(t.taskMetrics.inputMetrics.bytesRead): Unit
          }
      })

    // best-of-two seconds + input bytes of the BETTER pass (collect()
    // drives the frame's own QueryExecution; the result is one agg row)
    def measure(mk: () => DataFrame): (Double, Long) = {
      def once(): (Double, Long) = {
        val b0 = bytesRead.get
        val t0 = System.nanoTime()
        mk().collect(): Unit
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        var prev = -1L
        var settled = 0
        while (settled < 3) {
          Thread.sleep(100)
          val cur = bytesRead.get
          if (cur == prev) settled += 1 else settled = 0
          prev = cur
        }
        (dt, bytesRead.get - b0)
      }
      val (a, b) = (once(), once())
      if (a._1 <= b._1) a else b
    }

    val sortedPath = LayoutProbe.sortedLayoutPath(sfDir)
    val plain = () => Tables.lineitem(spark, sfDir)

    val tw0 = System.nanoTime()
    // range partition → each output file owns a disjoint l_shipdate
    // slice; sortWithinPartitions → row groups inside a file are
    // min/max-tight. 128 ranges ≈ 3 weeks per file at 7 years of data.
    plain().repartitionByRange(128, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(sortedPath)
    val writeSec = (System.nanoTime() - tw0) / 1e9
    val sorted = () => spark.read.parquet(sortedPath)

    val total = plain().count()
    val (plainSec, plainBytes) = measure(() => query(plain()))
    val (sortedSec, sortedBytes) = measure(() => query(sorted()))

    println(f"""{"sf":"$sfDir","total_rows":$total,"plain_sec":$plainSec%.3f,"sorted_sec":$sortedSec%.3f,"sort_write_sec":$writeSec%.3f,"plain_bytes_read":$plainBytes,"sorted_bytes_read":$sortedBytes}""")
    spark.stop()
  }
}
