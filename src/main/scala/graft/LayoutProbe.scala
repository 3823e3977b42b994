package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Measures the sort-on-write data-skipping layout: a fact table
  * range-partitioned + sorted on its filter column at write time lets
  * parquet min/max statistics prune whole files and row groups for a
  * narrow range predicate — the scan reads the matching slice instead
  * of the whole table. This is the scan-side twin of the bucketed-join
  * layout (BucketProbe): bucketing kills the join shuffle, range-sort
  * kills the full-table read for selective time/range filters — at
  * 100 TB, the difference between touching ~1 day of files and
  * touching a year.
  *
  * Usage: `runMain graft.LayoutProbe <sfDir>`. Rewrites lineitem
  * range-sorted by l_shipdate into /tmp, runs a 30-day revenue
  * aggregate on both layouts, and prints one JSON line with times and
  * the scan's actual output rows (the row-group pruning evidence: the
  * sorted layout's scan emits only the matching row groups' rows).
  */
object LayoutProbe {

  def query(l: DataFrame): DataFrame =
    l.filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1998-07-01").cast("timestamp"))
      .agg(functions.Compat.exactSum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n"))

  /** Sum of numOutputRows across the plan's file scans — rows the scan
    * actually emitted after file/row-group min-max pruning.
    */
  def scanRows(df: DataFrame): Long = {
    df.write.format("noop").mode("overwrite").save()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans) ++
          other.subqueries.flatMap(scans)
      }
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  private def bestOfTwo(mk: () => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LayoutProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = Engine.session("graft-layoutprobe", cpus)

    val sortedPath = "/tmp/graft_layout_lineitem_sorted"
    val plain = () => Tables.lineitem(spark, sfDir)

    val tw0 = System.nanoTime()
    // range partition → each output file owns a disjoint l_shipdate
    // slice; sortWithinPartitions → row groups inside a file are
    // min/max-tight. 128 ranges ≈ a week per file at 7 years of data.
    plain().repartitionByRange(128, col("l_shipdate"))
      .sortWithinPartitions("l_shipdate")
      .write.mode("overwrite").parquet(sortedPath)
    val writeSec = (System.nanoTime() - tw0) / 1e9
    val sorted = () => spark.read.parquet(sortedPath)

    val total = plain().count()
    val plainTime = bestOfTwo(() => query(plain()))
    val sortedTime = bestOfTwo(() => query(sorted()))
    val plainRows = scanRows(query(plain()))
    val sortedRows = scanRows(query(sorted()))

    println(f"""{"sf":"$sfDir","total_rows":$total,"plain_sec":$plainTime%.3f,"sorted_sec":$sortedTime%.3f,"sort_write_sec":$writeSec%.3f,"plain_scan_rows":$plainRows,"sorted_scan_rows":$sortedRows}""")
    spark.stop()
  }
}
