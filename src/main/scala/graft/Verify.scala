package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: restrict to named queries (dev iteration;
    // the driver always passes exactly two args → full dump)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive-micros parquet reads as TimestampType, not NTZ (see Engine)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Verify keeps the INT96 write default DELIBERATELY, unlike
      // Engine: the driver's oracle comparator reads these dumps with
      // pandas, which maps annotated micros (isAdjustedToUTC=true) to
      // tz-AWARE dtypes and then refuses naive comparisons. INT96 reads
      // back tz-naive. Stats don't matter on one-shot correctness dumps.
      .config("spark.sql.adaptive.enabled", "true")
      // data-volume-sized initial shuffle buckets, AQE owns the final
      // count (see Engine.initialShufflePartitions — the 8 g sf10 OOM
      // fix without the flat-8× sf0.1 tax); set here so correctness
      // dumps run the SAME plans the bench measures
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Engine.initialShufflePartitions(cpus.toInt, sfDir).toString)
      // AQE coalesce floor 128 KiB (see Engine.session) — same plans
      // as the bench measures
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "131072"))
      // WSCG bailout at the JIT huge-method limit (see Engine.session);
      // set here too so Verify exercises the SAME execution paths the
      // bench and production sessions use (the non-WSCG fallback must
      // stay value-identical, and this is where that's proven).
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Release intra-query persists (panel/index caches in the ANN
      // family): a 180-query dump would otherwise accumulate cached
      // blocks for the whole session (Bench clears per pass already).
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
