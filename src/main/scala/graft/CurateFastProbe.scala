package graft

import org.apache.spark.sql.functions._

/** Isolated timing for the PRODUCTION curation fast path — the
  * capacity-plan number (the CdcProbe/GraphScaleProbe convention for
  * measurements that are not oracle-checkable queries).
  *
  * `CorpusCuration.curateAtScale` (xxhash64 MinHash+LSH pairs → CC →
  * repetition gates, NO verification twin) emits an engine-specific
  * kept set: the xxhash64 family has no DuckDB replay, so it cannot
  * carry a value oracle. Registering it in SparkEntry.queries left a
  * permanent `err: no_oracle` row in the driver ledger (r13 verdict
  * item 2) — so the measurement lives here instead, and correctness
  * rides on the oracled twins:
  *   - q_curate_lsh      — dual-path agreement verdict (≤1% symmetric
  *                         difference between fast and exact kept sets;
  *                         measured 0 at both test SFs), DuckDB-oracled;
  *   - q_curate_lsh_md5  — the same composition with the portable md5
  *                         LSH stage, every phase replayed in DuckDB.
  *
  * `runMain graft.CurateFastProbe <sf dir>`: best-of-3 (plus one
  * discarded warmup pass at sf0.001 so the number is the plan, not
  * Janino compilation), full materialization via the noop sink, row
  * count asserted >0. The JSON line goes to BASELINE.md.
  */
object CurateFastProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = Engine.session("graft-curatefastprobe", cpus)
    val sf = args(0)

    def fastPath(dir: String) =
      graft.pipelines.CorpusCuration.curateAtScale(
          Tables.documents(spark, dir), "text", "doc_id")
        .orderBy("doc_id")

    // codegen/JIT warmup on the smallest SF (Bench's convention)
    fastPath("/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    var bestT = Double.MaxValue
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      fastPath(sf).write.format("noop").mode("overwrite").save()
      bestT = math.min(bestT, (System.nanoTime() - t0) / 1e9)
      spark.catalog.clearCache()
    }
    val kept = fastPath(sf).count()
    require(kept > 0, s"curateAtScale kept 0 rows at $sf")
    val line =
      f"""{"probe":"curate_fast","sf_dir":"$sf","cpus":$cpus,""" +
      f""""best_of_3_sec":$bestT%.2f,"kept_rows":$kept}"""
    println(line)
    spark.stop()
  }
}
