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
    assert(TextDedup.contaminationReport(noDocs, noDocs, "text", "doc_id").isEmpty)
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
}
