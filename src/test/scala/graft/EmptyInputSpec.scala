package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Empty-input totality: at scale, empty partitions and empty filter
  * results are routine — every operator must return an empty (correctly-
  * schemed) frame, not throw.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noEvents =
    Seq.empty[(Long, Long, java.sql.Timestamp, String)]
      .toDF("event_id", "user_id", "ts", "event_type")

  test("dedup family on zero documents") {
    assert(TextDedup.exactGroups(noDocs, "text", "doc_id").isEmpty)
    assert(TextDedup.jaccardPairs(noDocs, "text", "doc_id").isEmpty)
    assert(TextDedup.containmentPairs(noDocs, "text", "doc_id").isEmpty)
    assert(TextDedup.minhashLshPairs(noDocs, "text", "doc_id").isEmpty)
    assert(TextDedup.minhashLshPairsPortable(noDocs, "text", "doc_id").isEmpty)
    assert(TextDedup.simhashPairsPortable(noDocs, "text", "doc_id").isEmpty)
    assert(TextDedup.contaminationReport(noDocs, noDocs, "text", "doc_id").isEmpty)
    // empty corpus index AND empty drop, both directions
    val emptyIndex = TextDedup.bandedSignatures(noDocs, "text", "doc_id")
    assert(emptyIndex.isEmpty)
    val someDocs = Seq((1L, "some real document text here")).toDF("doc_id", "text")
    assert(TextDedup.crossCorpusNearDupsBanded(someDocs, emptyIndex,
      "text", "doc_id").isEmpty)
    assert(TextDedup.crossCorpusNearDupsBanded(noDocs,
      TextDedup.bandedSignatures(someDocs, "text", "doc_id"), "text", "doc_id").isEmpty)
  }

  test("block dedup and sketches on zero documents") {
    val bd = TextDedup.blockDedup(noDocs, "text", "doc_id")
    assert(bd.isEmpty && bd.columns.toSeq == Seq("doc_id", "n_blocks",
      "n_blocks_kept", "n_tokens_removed", "text_deduped"))
    assert(TextDedup.stripBoilerplate(noDocs, "text", "doc_id").isEmpty)
    assert(TextDedup.boilerplateReport(noDocs, "text", "doc_id").isEmpty)
    // whitespace-only docs are filtered before blocking, not crashed on
    val blank = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(TextDedup.blockDedup(blank, "text", "doc_id").isEmpty)
    val sk = Aggs.distinctSketches(noDocs, Seq("text"), "doc_id")
    assert(sk.isEmpty)
    assert(Aggs.mergeSketches(sk, Seq("text")).isEmpty)
    // PPS over an empty frame, and over a frame whose weights are all 0
    assert(TextQuality.ppsSample(noDocs.withColumn("lang", lit("x")),
      "lang", "doc_id", lit(1L), k = 5).isEmpty)
    val zeroW = Seq((1L, "t", "x")).toDF("doc_id", "text", "lang")
    assert(TextQuality.ppsSample(zeroW, "lang", "doc_id", lit(0L), k = 5).isEmpty)
    // LM scoring: empty reference (everything OOV-smoothed... V=0 →
    // division guard) and empty target both stay total
    val someDocs2 = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextQuality.bigramLmScore(noDocs, someDocs2, "text", "doc_id").isEmpty)
    val emptyRef = TextQuality.bigramLmScore(someDocs2, noDocs, "text", "doc_id")
    assert(emptyRef.count() == 1)   // row survives; score may be null, never a throw
  }

  test("clustering and curation on zero documents") {
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Graph.connectedComponents(pairs, "doc_a", "doc_b").isEmpty)
    val clusters = Graph.dedupClusters(noDocs, "doc_id", pairs, "doc_a", "doc_b")
    assert(clusters.isEmpty && clusters.columns.toSeq ==
      Seq("doc_id", "cluster_id", "is_canonical"))
    assert(graft.pipelines.CorpusCuration.curate(noDocs, "text", "doc_id").isEmpty)
    assert(TextQuality.repetitionReport(noDocs, "text", "doc_id").isEmpty)
  }

  test("evaluation, shuffle, and mixture planning on zero documents") {
    // single-row report contract: zero counts, NULL ratios (never NaN)
    val r = TextDedup.lshRecallReport(noDocs, "text", "doc_id").head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(4))
    assert(TextQuality.shuffleShards(noDocs, "doc_id", nShards = 4).isEmpty)
    assert(TextQuality.mixturePlan(noDocs, "text", "text",
      Map("a" -> 1.0), tokenBudget = 100L).isEmpty)
  }

  test("round-3 operators on zero rows") {
    val noMedia = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "media")
    assert(graft.functions.TextFunctions
      .chunkByTokens(noDocs, "text", "doc_id", 32, 24).isEmpty)
    assert(Multimodal.imagePHash(spark, noMedia, "doc_id").isEmpty)
    assert(Multimodal.imageFrameFeatures(spark, noMedia, "doc_id").isEmpty)
    assert(Multimodal.sampleFrames(spark, noMedia, "doc_id").isEmpty)
    val noHashes = Seq.empty[(Long, Long)].toDF("id", "phash")
    assert(Multimodal.phashNearDupPairs(noHashes, "id", "phash").isEmpty)
    val noVecs = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    assert(Similarity.lshNearDupPairs(noVecs, "vec_id", "embedding",
      threshold = 0.9, dim = 64).isEmpty)
    val chained = Funnel.anchoredChained(noEvents, "user_id", "ts", "event_type",
      Seq("view", "click"), 1000L).collect()
    assert(chained.map(r => (r.getInt(0), r.getLong(2))).toSeq ==
      Seq((1, 0L), (2, 0L)))
    assert(Funnel.hotUserReport(noEvents, "user_id", "event_type",
      Seq("view"), 10).isEmpty)
  }

  test("round-6 additions on zero rows") {
    val noVecs = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val noAssign = Seq.empty[(Long, Long)].toDF("node", "comp")
    // incremental CC: empty assignment, empty edge batch, both
    assert(Graph.incrementalComponents(noAssign, "node", "comp",
      noPairs, "doc_a", "doc_b").isEmpty)
    val someAssign = Seq((1L, 1L), (3L, 1L)).toDF("node", "comp")
    assert(Graph.incrementalComponents(someAssign, "node", "comp",
      noPairs, "doc_a", "doc_b").count() == 2)
    // prefer-keep over an empty corpus
    assert(Graph.dedupClustersBy(noDocs.withColumn("q", lit(1L)), "doc_id",
      col("q"), noPairs, "doc_a", "doc_b").isEmpty)
    // cross-corpus semantic screen: empty drop, empty index, both
    val someVecs = Seq((1L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val axes = Seq((100L, Array(1.0, 0.0)), (200L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val emptyIdx = Similarity.assignToCentroids(noVecs, axes, "vec_id", "embedding")
    assert(Similarity.crossCorpusSemanticPairs(someVecs, "vec_id", "embedding",
      emptyIdx, axes, 0.9).isEmpty)
    assert(Similarity.crossCorpusSemanticPairs(noVecs, "vec_id", "embedding",
      Similarity.assignToCentroids(someVecs, axes, "vec_id", "embedding"),
      axes, 0.9).isEmpty)
  }

  test("BPE family, answer parse, compaction on zero rows") {
    // training on nothing: both trainers stop at an empty merge table
    assert(BpeTrain.learnMerges(noDocs, "text", 4).isEmpty)
    assert(BpeTrain.learnMergesLocal(noDocs, "text", 4).isEmpty)
    // encode on nothing, both regimes (0 rules = fold, 70 > foldLimit =
    // mapPartitions), and the corpus join-back
    val noWords = noDocs.select(col("text").as("word"))
    assert(BpeTrain.encodeWords(noWords, "word", Seq.empty).isEmpty)
    val bigTable = (1 to 70).map(i => (s"a$i", "b"))
    assert(BpeTrain.encodeWords(noWords, "word", bigTable).isEmpty)
    assert(BpeTrain.encodeDocs(noDocs, "text", "doc_id", Seq("a" -> "b")).isEmpty)
    // answer parse on an empty frame keeps schema, no rows
    val parsed = noDocs.select(graft.functions.TextFunctions
      .extractAnswer(col("text"), graft.functions.TextFunctions.finalPattern).as("a"))
    assert(parsed.isEmpty && parsed.columns.toSeq == Seq("a"))
    // compacting an empty dataset yields a readable empty dataset
    val dir = java.nio.file.Files.createTempDirectory("empty-compact").toString
    noDocs.write.parquet(s"$dir/in")
    graft.sources.Sinks.compact(spark.read.parquet(s"$dir/in"), s"$dir/in", s"$dir/out")
    val back = spark.read.parquet(s"$dir/out")
    assert(back.isEmpty && back.columns.toSeq == Seq("doc_id", "text"))
  }

  test("round-11 additions on zero rows") {
    // sampled verdict reports on an empty corpus: one row, zero counts,
    // vacuously-true verdicts (no truth pairs -> nothing to recall)
    val m = TextDedup.minhashVsExactSampledReport(noDocs, "text", "doc_id")
      .collect()
    assert(m.length == 1 && m(0).getLong(0) == 0L &&
      m(0).getBoolean(1) && m(0).getBoolean(2))
    val c = graft.pipelines.CorpusCuration
      .curateAgreementSampledReport(noDocs, "text", "doc_id").collect()
    assert(c.length == 1 && c(0).getLong(0) == 0L && c(0).getLong(1) == 0L &&
      c(0).getBoolean(2))
    // versioned root with no published version fails loudly on read and
    // compact, not with an empty frame that hides a missing publish
    val root = java.nio.file.Files.createTempDirectory("empty-vroot").toString + "/t"
    intercept[java.io.FileNotFoundException] {
      graft.sources.Sinks.Versioned.read(spark, root)
    }
    intercept[java.io.FileNotFoundException] {
      graft.sources.Sinks.Versioned.compact(spark, root)
    }
    // an empty frame still publishes a complete, readable version
    assert(graft.sources.Sinks.Versioned.write(noDocs, root) == 0)
    assert(graft.sources.Sinks.Versioned.read(spark, root).isEmpty)
  }

  test("retrieval and events analytics on zero rows") {
    assert(Retrieval.bm25TopK(noDocs, "text", "doc_id", Seq("x")).isEmpty)
    // funnel emits the step skeleton with zero counts, not zero rows —
    // a report contract (every step visible even when nothing converted)
    val f = Funnel.anchored(noEvents, "user_id", "ts", "event_type",
      Seq("view", "click"), 1000L).orderBy("step").collect()
    assert(f.map(r => (r.getInt(0), r.getLong(2))).toSeq == Seq((1, 0L), (2, 0L)))
    assert(Funnel.cohortRetention(noEvents, "user_id", "ts").isEmpty)
    assert(Funnel.transitions(noEvents, "user_id", "ts", "event_type").isEmpty)
  }

  test("upsert and hashed classifier on zero rows") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val noRows = base.limit(0)
    // empty delta: base passes through unchanged
    assert(Joins.upsert(base, noRows, Seq("k")).collect().toSeq ==
      base.collect().toSeq)
    // empty base: the delta IS the snapshot
    assert(Joins.upsert(noRows, base, Seq("k")).collect().toSeq ==
      base.collect().toSeq)
    assert(Joins.upsert(noRows, noRows, Seq("k")).isEmpty)
    val scored = TextQuality.hashedLinearScore(noDocs, "text", "doc_id")
    assert(scored.isEmpty && scored.columns.toSeq ==
      Seq("doc_id", "n_feats", "w_sum", "score", "keep"))
    // streaming screen's batch form on zero docs: no hits, no throw
    assert(graft.streaming.CorpusStream
      .nearDupScreenStateful(noDocs).isEmpty)
  }

  test("round-12 session-5 additions on zero rows") {
    val noEdges = Seq.empty[(String, String)].toDF("s", "t")
    val pr = Graph.pageRank(noEdges, "s", "t")
    assert(pr.isEmpty && pr.columns.toSeq == Seq("node", "rank_fp"))
    val noPages = Seq.empty[(String, String)].toDF("url", "html")
    assert(Html.domainAnchorText(noPages, "url", "html").isEmpty)
    assert(Html.anchorPairs(lit("")) != null) // scalar; covered via frame:
    assert(noPages.select(Html.anchorPairs(col("html"))).isEmpty)
    val noHosts = Seq.empty[(Long, String)].toDF("id", "host")
    val blk = Seq("x.com").toDF("entry")
    assert(Domains.blocklistScreen(noHosts, "id", "host", blk, "entry").isEmpty)
    // empty BLOCKLIST: everything kept with blocked_by ''
    val hosts = Seq((1L, "a.com")).toDF("id", "host")
    val noBlk = Seq.empty[String].toDF("entry")
    val kept = Domains.blocklistScreen(hosts, "id", "host", noBlk, "entry")
      .select("id", "blocked_by")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept == Map(1L -> ""))
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val rp = Similarity.randomProject(noVecs, "vec_id", "embedding", 4, 2)
    assert(rp.isEmpty && rp.columns.toSeq == Seq("vec_id", "proj"))
  }
}
