package graft

import graft.streaming.CorpusStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Continuous corpus ingestion: per-drop near-dup screening against the
  * growing persisted band index, within-drop screening, and the
  * accept/reject/report contract — including a stream RESTART that must
  * pick up the index state written by the previous run.
  */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)
  private val base1 =
    "the quick brown fox jumps over the lazy dog near the quiet river bank every single morning"
  private val base4 =
    "training data pipelines require careful deduplication of web documents before any model sees them at all"

  test("ingest screens drops against corpus + within-batch, restart reloads the index") {
    val docsDir = Files.createTempDirectory("cs-docs").toString
    val stateDir = Files.createTempDirectory("cs-state").toString

    // drop 1: two distinct docs
    Seq(doc(1L, base1),
        doc(2L, "completely unrelated legal boilerplate about contracts and parties and obligations thereof"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d1")
    Thread.sleep(30)
    // drop 2: near-copy of doc 1, one fresh doc, an identical in-batch pair
    Seq(doc(3L, base1.replace("morning", "evening")),
        doc(4L, base4),
        doc(5L, "five example sentences about cooking pasta with garlic and olive oil on a sunday afternoon here"),
        doc(6L, "five example sentences about cooking pasta with garlic and olive oil on a sunday afternoon here"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d2")

    val schema = spark.read.parquet(s"$docsDir/d1").schema
    val q1 = CorpusStream.ingest(spark, s"$docsDir/*/", schema, stateDir,
      threshold = 0.5, maxFilesPerTrigger = 1)
    q1.awaitTermination()

    val accepted1 = spark.read.parquet(s"$stateDir/accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted1 == Set(1L, 2L, 4L, 5L), accepted1.toString)
    val pairs1 = spark.read.parquet(s"$stateDir/dup_pairs")
      .select("new_id", "corpus_id", "kind").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(pairs1.contains((3L, 1L, "corpus")), pairs1.toString)
    assert(pairs1.contains((6L, 5L, "batch")), pairs1.toString)

    // drop 3 arrives AFTER the stream finished: a new ingest call must
    // screen it against the index the previous run persisted (doc 4
    // was accepted in drop 2 of the previous run)
    Thread.sleep(30)
    Seq(doc(7L, base4.replace("web", "internet")),
        doc(8L, "a genuinely novel document mentioning telescopes satellites and the geometry of orbital mechanics"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d3")
    val q2 = CorpusStream.ingest(spark, s"$docsDir/*/", schema, stateDir,
      threshold = 0.5, maxFilesPerTrigger = 1)
    q2.awaitTermination()

    val accepted2 = spark.read.parquet(s"$stateDir/accepted")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(accepted2 == Set(1L, 2L, 4L, 5L, 8L), accepted2.toString)
    val pairs2 = spark.read.parquet(s"$stateDir/dup_pairs")
      .select("new_id", "corpus_id", "kind").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(pairs2.contains((7L, 4L, "corpus")), pairs2.toString)

    // the index holds bands ONLY for accepted docs (rejected docs must
    // never become screen targets)
    val indexed = spark.read.parquet(s"$stateDir/band_index")
      .select("doc").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 2L, 4L, 5L, 8L), indexed.toString)
  }
}
