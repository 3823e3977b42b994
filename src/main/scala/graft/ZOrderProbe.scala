package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Measures the z-order layout against the single-column sort for a
  * TWO-predicate query: `l_shipdate` in one year AND `l_partkey` in a
  * narrow range. The date-sorted layout prunes only the date (reads
  * the whole year); the z-ordered layout owns tight
  * (shipdate × partkey) hyper-rectangles per file, so both predicates
  * prune together. Footer row-group overlap is the structural
  * evidence (printed by the companion python analysis in SCALE.md);
  * this probe prints the timings and writes both layouts.
  *
  * Usage: `runMain graft.ZOrderProbe <sfDir>`.
  */
object ZOrderProbe {

  def query(l: DataFrame): DataFrame =
    l.filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
             col("l_partkey").between(1000, 2999))
      .agg(functions.Compat.exactSum(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n"))

  private def bestOfTwo(mk: () => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      mk().collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ZOrderProbe <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = Engine.session("graft-zorderprobe", cpus)

    // sf-keyed scratch paths: reusing a layout written from a different
    // sf dir would only surface as a late "layouts disagree" failure
    val datePath = LayoutProbe.sortedLayoutPath(sfDir)
    val zPath = datePath.replace("_sorted_", "_zorder_")
    val plain = () => Tables.lineitem(spark, sfDir)

    // date-sorted layout (reuse LayoutProbe's if present)
    if (!new java.io.File(datePath, "_SUCCESS").exists()) {
      plain().repartitionByRange(128, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite").parquet(datePath)
    }
    val tz0 = System.nanoTime()
    Sinks.writeZOrdered(plain(), zPath, Seq("l_shipdate", "l_partkey"), numFiles = 128)
    val zWriteSec = (System.nanoTime() - tz0) / 1e9

    val plainSec = bestOfTwo(() => query(plain()))
    val dateSec = bestOfTwo(() => query(spark.read.parquet(datePath)))
    val zSec = bestOfTwo(() => query(spark.read.parquet(zPath)))
    // identical results across layouts
    val rows = Seq(plain(), spark.read.parquet(datePath), spark.read.parquet(zPath))
      .map(l => query(l).collect().toSeq.toString)
    require(rows.distinct.size == 1, s"layouts disagree: $rows")

    println(f"""{"sf":"$sfDir","plain_sec":$plainSec%.3f,"date_sorted_sec":$dateSec%.3f,"zorder_sec":$zSec%.3f,"zorder_write_sec":$zWriteSec%.3f}""")
    spark.stop()
  }
}
