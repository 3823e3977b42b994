package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Phase decomposition of the exact-pair pipeline
  * (`TextDedup.jaccardPairs` — the shared substrate of the
  * q_jaccard_pairs / q_subset_dup / q_dedup_clusters / q_cluster_* /
  * q_inc_* tail): times each prefix of the pipeline through the noop
  * sink, 3 passes, so the expensive phase is measured, not guessed
  * (guide §1). Usage: runMain graft.PairPhaseProbe <sf dir>
  */
object PairPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("pair-phase-probe", 32)
    val docs = Tables.documents(spark, sf)

    val passes = sys.env.getOrElse("PAIR_PROBE_PASSES", "3").toInt
    val onlyAb = sys.env.get("PAIR_PROBE_ONLY_AB").contains("1")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      if (onlyAb && !(name.startsWith("F") || name.startsWith("H"))) return
      for (pass <- 1 to passes) {
        spark.sparkContext.setJobDescription(s"$name pass=$pass")
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[pairphase] $name pass=$pass t=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
      spark.catalog.clearCache()
    }

    val sets = docs.select(col("doc_id").cast("long").as("doc"),
      TextFunctions.shingles(col("text"), 3).as("set"))
    def sh = sets.select(col("doc"), explode(col("set")).as("s0"))
      .select(col("doc"), xxhash64(col("s0")).as("s"))

    // C2: hash-composed trigram longs — no trigram string materialized,
    // explode carries pre-hashed longs (candidate optimization A/B)
    val ws = TextFunctions.tokens(col("text"))
    val h3 = {
      val h2 = zip_with(ws, slice(ws, lit(2), size(ws)),
        (a, b) => when(a.isNull || b.isNull, lit(null))
          .otherwise(xxhash64(a, b)))
      val h3c = zip_with(h2, slice(ws, lit(3), size(ws)),
        (h, c) => when(h.isNull || c.isNull, lit(null))
          .otherwise(xxhash64(h, c)))
      array_distinct(filter(h3c, x => x.isNotNull))
    }
    val setsH = docs.select(col("doc_id").cast("long").as("doc"), h3.as("hset"))
    def shH = setsH.select(col("doc"), explode(col("hset")).as("s"))

    time("A_tokens_only")(docs.select(TextFunctions.tokens(col("text")).as("w")))
    time("B2_hash_arrays")(setsH)
    time("C2_explode_prehashed")(shH)
    time("D2_postings_prehashed")(
      shH.groupBy("s").agg(sort_array(collect_set(col("doc"))).as("ds"))
        .filter(size(col("ds")) > 1))
    time("E2_packed_pairs_prehashed")(
      shH.groupBy("s").agg(sort_array(collect_set(col("doc"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(graft.plans.PackedPairs.pairs(col("ds"))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("common")))
    time("B_shingle_arrays")(sets)
    time("C_explode_hash")(sh)
    time("D_postings")(
      sh.groupBy("s").agg(sort_array(collect_set(col("doc"))).as("ds"))
        .filter(size(col("ds")) > 1))
    time("E_packed_pairs")(
      sh.groupBy("s").agg(sort_array(collect_set(col("doc"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(graft.plans.PackedPairs.pairs(col("ds"))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("common")))
    time("F_full_jaccard")(
      graft.operators.TextDedup.jaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.8))
    time("G_sizes_side")(sets.select(col("doc"), size(col("set")).as("sz")))

    time("F2_full_jaccard_repart32")(
      graft.operators.TextDedup.jaccardPairs(docs.repartition(32), "text",
        "doc_id", n = 3, threshold = 0.8))
    locally {
      val li = Tables.lineitem(spark, sf)
      def q1(src: org.apache.spark.sql.DataFrame) =
        src.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(graft.functions.Compat.exactSum(col("l_quantity"), 2).as("sum_qty"),
            count(lit(1)).as("n"))
      time("H1_q1agg_plain")(q1(li))
      time("H2_q1agg_repart32")(q1(li.repartition(32)))
    }

    // Per-stage metrics for the full jaccard run (steady state):
    // stage wall, task count, records, shuffle bytes — locates the time.
    locally {
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages.add(f"stage=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%6.2fs " +
            f"in=${m.inputMetrics.recordsRead}%9d shW=${m.shuffleWriteMetrics.bytesWritten / 1024}%8dKB " +
            f"shR=${m.shuffleReadMetrics.totalBytesRead / 1024}%8dKB " +
            f"exec=${m.executorRunTime / 1e3}%7.2fs cpu=${m.executorCpuTime / 1e9}%7.2fs " +
            s"name=${si.name}")
        }
      }
      // warm pass first (JIT/codegen), then the measured pass
      graft.operators.TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3,
        threshold = 0.8).write.format("noop").mode("overwrite").save()
      spark.sparkContext.addSparkListener(l)
      spark.sparkContext.setJobDescription("full_jaccard stage metrics")
      val t0 = System.nanoTime()
      graft.operators.TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3,
        threshold = 0.8).write.format("noop").mode("overwrite").save()
      println(f"[pairphase] staged_full t=${(System.nanoTime() - t0) / 1e9}%.2f")
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(l)
      stages.forEach(s => println(s"[pairstage] $s"))
    }
    // Volumes, for the record
    val nSh = sh.count()
    val nPost = sh.groupBy("s").agg(count(lit(1)).as("n")).filter(col("n") > 1).count()
    val nPairs = sh.groupBy("s").agg(sort_array(collect_set(col("doc"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(graft.plans.PackedPairs.pairs(col("ds"))).as("pk")).count()
    val nPk = sh.groupBy("s").agg(sort_array(collect_set(col("doc"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(graft.plans.PackedPairs.pairs(col("ds"))).as("pk"))
      .select("pk").distinct().count()
    println(s"[pairphase] volumes: shingle_rows=$nSh multi_postings=$nPost pair_rows=$nPairs distinct_pk=$nPk")
    spark.stop()
  }
}
