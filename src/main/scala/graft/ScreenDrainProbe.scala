package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-growth bound for the stateful near-dup screen (r14 verdict
  * item 1 — the last unmeasured 100 TB axis): the unbounded
  * `nearDupScreenStateful` keeps one long per (band, bucket) forever —
  * 3.83 M RocksDB rows / 335 MB at 500 k sf10 docs ⇒ ~0.7 KB/doc ⇒
  * ~670 GB at 1 B docs, with checkpoint upload, recovery replay, and
  * compaction cost all growing with it. This probe runs the BOUNDED
  * twin (`CorpusStream.nearDupScreenBounded`) through THREE drain
  * cycles over the full sf-dir documents table (RocksDB provider,
  * equal-size landing chunks — the bulk-drop cadence) and proves:
  *
  *   - **hit-set parity**: the union of the three cycles' `"hit"`
  *     events is row-identical (count + order-independent Σ xxhash64)
  *     to the unbounded twin drained over the same chunks with the
  *     same batching;
  *   - **state plateau**: per-cycle state rows stay ≈ one chunk's new
  *     buckets while the unbounded twin's state is the cumulative
  *     corpus — `require`d at max(cycle state) < 0.5 × unbounded final
  *     state (expected ≈ 0.35 with equal thirds);
  *   - the drained snapshot (parquet at rest, partitioned by cycle —
  *     idempotent re-drain) carries what left the state store.
  *
  * Chunks are hardlinked contiguous thirds of the source part files;
  * each cycle/drain is ONE AvailableNow batch over its chunk, so the
  * min-id-in-batch anchor rule is order-independent and parity is
  * exact by construction (multi-batch restart behavior is
  * ScreenRestartProbe's job).
  *
  * Also asserts, end-to-end in a JVM it owns, the relation-cache
  * lifecycle RelCacheSpec can only pin mechanically: after
  * `spark.stop()`, the application-end listener must have evicted this
  * session's `Tables` entries.
  *
  * Usage: `runMain graft.ScreenDrainProbe <sfDir> [cycles]`.
  */
object ScreenDrainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/testdata-sf10"
    val cycles = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = Engine.session("graft-screendrain", cpus, Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    spark.sparkContext.setLogLevel("WARN")

    // read once through Tables so the post-stop eviction assert below
    // exercises the listener path on a populated cache
    val docsDir = s"$sfDir/documents.parquet"
    val schema = Tables.documents(spark, sfDir).schema
    val nDocs = Tables.documents(spark, sfDir).count()

    val base = java.nio.file.Files.createTempDirectory("sdp").toString
    val parts = new java.io.File(docsDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toPath).sortBy(_.getFileName.toString)
    println(s"[screen-drain] $nDocs docs, ${parts.length} files, $cycles cycles")
    val per = math.ceil(parts.length.toDouble / cycles).toInt
    parts.grouped(per).zipWithIndex.foreach { case (group, i) =>
      val dir = java.nio.file.Paths.get(s"$base/chunk$i")
      java.nio.file.Files.createDirectories(dir)
      group.foreach(p => java.nio.file.Files.createLink(
        dir.resolve(p.getFileName), p))
    }

    def dirBytes(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isFile) f.length()
      else if (f.isDirectory) f.listFiles().map(c => dirBytes(c.getPath)).sum
      else 0L
    }

    def checksum(df: org.apache.spark.sql.DataFrame): (Long, BigDecimal) = {
      val r = df.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("doc_id"), col("dup_of"), col("band"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(BigDecimal(0)))).head()
      (r.getLong(0), BigDecimal(r.getDecimal(1)))
    }

    // ---- bounded: one drain cycle per chunk ----
    val snapshotPath = s"$base/snapshot"
    val cycleStats = (0 until cycles).map { i =>
      val snapshot =
        if (i == 0) streaming.CorpusStream.emptyScreenSnapshot(spark)
        else spark.read.parquet(snapshotPath)
      val t0 = System.nanoTime()
      val q = streaming.CorpusStream.nearDupScreenBounded(
          spark.readStream.schema(schema).parquet(s"$base/chunk$i"), snapshot)
        .writeStream.format("parquet").option("path", s"$base/sink$i")
        .option("checkpointLocation", s"$base/ckpt$i")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      // drain: this cycle's installed anchors join the at-rest snapshot
      // (dynamic overwrite of the cycle partition = idempotent re-drain)
      streaming.CorpusStream.screenSnapshot(spark.read.parquet(s"$base/sink$i"))
        .withColumn("cycle", lit(i))
        .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("cycle").parquet(snapshotPath)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      val stateBytes = dirBytes(s"$base/ckpt$i/state")
      println(f"[screen-drain] cycle $i: $sec%.1f s, state $stateRows rows / $stateBytes bytes")
      (sec, stateRows, stateBytes)
    }
    val boundedSinks = (0 until cycles).map(i => spark.read.parquet(s"$base/sink$i"))
      .reduce(_ unionByName _)
    val (nHits, sumHits) = checksum(boundedSinks.filter(col("kind") === "hit"))
    val snapRows = spark.read.parquet(snapshotPath).count()
    val snapBytes = dirBytes(snapshotPath)

    // ---- unbounded twin: one checkpoint, chunks landing between drains
    val growDir = s"$base/grow"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(growDir))
    var unboundedState = 0L
    val drainSecs = (0 until cycles).map { i =>
      new java.io.File(s"$base/chunk$i").listFiles().foreach(f =>
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(growDir, s"c$i-${f.getName}"), f.toPath))
      val t0 = System.nanoTime()
      val q = streaming.CorpusStream.nearDupScreenStateful(
          spark.readStream.schema(schema).parquet(growDir))
        .writeStream.format("parquet").option("path", s"$base/sinkU")
        .option("checkpointLocation", s"$base/ckptU")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      unboundedState = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      (System.nanoTime() - t0) / 1e9
    }
    val unboundedBytes = dirBytes(s"$base/ckptU/state")
    val (nRef, sumRef) = checksum(spark.read.parquet(s"$base/sinkU")
      .withColumn("band", col("band").cast("int")))

    val parity = nHits == nRef && sumHits == sumRef
    val maxCycleState = cycleStats.map(_._2).max
    val line =
      f"""{"probe":"screen_drain","sf_dir":"$sfDir","n_docs":$nDocs,"cycles":$cycles,""" +
      s""""cycle_sec":[${cycleStats.map(c => f"${c._1}%.1f").mkString(",")}],""" +
      s""""cycle_state_rows":[${cycleStats.map(_._2).mkString(",")}],""" +
      s""""cycle_state_bytes":[${cycleStats.map(_._3).mkString(",")}],""" +
      s""""unbounded_drain_sec":[${drainSecs.map(s => f"$s%.1f").mkString(",")}],""" +
      s""""unbounded_state_rows":$unboundedState,"unbounded_state_bytes":$unboundedBytes,""" +
      s""""snapshot_rows":$snapRows,"snapshot_bytes":$snapBytes,""" +
      s""""hits":$nHits,"hits_ref":$nRef,"parity":$parity}"""
    println(line)

    spark.stop()
    // the relation-cache listener must have swept this session on stop
    require(Tables.cachedPaths(spark).isEmpty,
      "Tables.relCache retained entries for a stopped session")
    require(parity,
      s"drain parity FAILED: bounded ($nHits, $sumHits) vs unbounded ($nRef, $sumRef)")
    require(maxCycleState < unboundedState / 2,
      s"state did not plateau: max cycle $maxCycleState vs unbounded $unboundedState")
  }
}
