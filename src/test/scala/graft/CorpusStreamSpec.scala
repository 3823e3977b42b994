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

  test("accepted sink -> versioned snapshot: downstream readers get complete compacted corpus states") {
    // the maintenance composition for the documented torn-batch read
    // caveat: the stream owns `accepted/` (per-batch small files,
    // non-transactional partition overwrites); consumers read through a
    // Versioned root that `snapshot` advances — complete states only
    val docsDir = Files.createTempDirectory("cs-snap-docs").toString
    val stateDir = Files.createTempDirectory("cs-snap-state").toString
    val readRoot = Files.createTempDirectory("cs-snap-read").toString + "/corpus"

    Seq(doc(1L, base1), doc(2L, base4))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d1")
    val schema = spark.read.parquet(s"$docsDir/d1").schema
    CorpusStream.ingest(spark, s"$docsDir/*/", schema, stateDir,
      threshold = 0.5, maxFilesPerTrigger = 1).awaitTermination()
    val v0 = graft.sources.Sinks.Versioned.snapshot(
      spark, s"$stateDir/accepted", readRoot)
    assert(v0 == 0)
    val snap0 = graft.sources.Sinks.Versioned.read(spark, readRoot)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(snap0 == Set(1L, 2L))

    // a later drop lands and is ingested; the PUBLISHED snapshot is
    // unchanged until the next maintenance tick — readers never observe
    // the live sink mid-append
    Thread.sleep(30)
    Seq(doc(3L, base1.replace("morning", "evening")),
        doc(4L, "a genuinely novel document mentioning telescopes satellites and orbital mechanics"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d2")
    CorpusStream.ingest(spark, s"$docsDir/*/", schema, stateDir,
      threshold = 0.5, maxFilesPerTrigger = 1).awaitTermination()
    assert(graft.sources.Sinks.Versioned.read(spark, readRoot)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))

    val v1 = graft.sources.Sinks.Versioned.snapshot(
      spark, s"$stateDir/accepted", readRoot)
    assert(v1 == 1)
    val snap1 = graft.sources.Sinks.Versioned.read(spark, readRoot)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(snap1 == Set(1L, 2L, 4L), snap1.toString) // 3 screened as a near-dup
    // snapshots carry the ingest_batch partition column as data, and
    // compaction collapsed the per-batch fragments
    assert(graft.sources.Sinks.Versioned.read(spark, readRoot)
      .columns.contains("ingest_batch"))
  }

  private def rmrf(p: String): Unit = {
    val f = new java.io.File(p)
    if (f.isDirectory) f.listFiles.foreach(c => rmrf(c.getPath))
    f.delete()
    // the local FS keeps a checksum sibling (.name.crc) next to every
    // file; a crash that never wrote `name` never wrote its crc either,
    // and a stale crc makes the replay's rename-commit fail as a bogus
    // "concurrent checkpoint use"
    val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
    if (crc.exists()) crc.delete(): Unit
  }

  /** Full observable sink state, row-exact (multisets, not sets — a
    * replay that double-writes rows must fail these).
    */
  private def sinkState(stateDir: String) = (
    spark.read.parquet(s"$stateDir/accepted").select("doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted,
    spark.read.parquet(s"$stateDir/band_index").select("doc", "band", "bucket")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .toSeq.sorted,
    spark.read.parquet(s"$stateDir/dup_pairs").select("new_id", "corpus_id", "kind")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq.sortBy(_.toString))

  test("mid-batch crash recovery: replay converges to the uninterrupted state") {
    val docsDir = Files.createTempDirectory("cs2-docs").toString
    val stateDir = Files.createTempDirectory("cs2-state").toString
    Seq(doc(1L, base1),
        doc(2L, "completely unrelated legal boilerplate about contracts and parties and obligations thereof"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d1")
    Thread.sleep(30)
    Seq(doc(3L, base1.replace("morning", "evening")),
        doc(4L, base4),
        doc(5L, "five example sentences about cooking pasta with garlic and olive oil on a sunday afternoon here"),
        doc(6L, "five example sentences about cooking pasta with garlic and olive oil on a sunday afternoon here"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d2")
    val schema = spark.read.parquet(s"$docsDir/d1").schema
    def drain(): Unit =
      CorpusStream.ingest(spark, s"$docsDir/*/", schema, stateDir,
        threshold = 0.5, maxFilesPerTrigger = 1).awaitTermination()

    drain()
    val clean = sinkState(stateDir)
    assert(clean._1 == Seq(1L, 2L, 4L, 5L), clean._1.toString)

    // Crash point A — between the corpus append and the index append of
    // batch 1 (accepted + pairs on disk, signatures not): kill = drop
    // the checkpoint commit marker; the index partition for batch 1 was
    // never written in this timeline
    rmrf(s"$stateDir/_checkpoint/commits/1")
    rmrf(s"$stateDir/band_index/ingest_batch=1")
    drain()
    assert(sinkState(stateDir) == clean,
      "replay after index-append crash must converge to the uninterrupted state")

    // Crash point B — after ALL three sink writes but before the
    // checkpoint commit: the replay re-screens with its own signatures
    // already in the index; the batch-partition exclusion must keep the
    // decisions identical (no self-rejection, no duplicate rows)
    rmrf(s"$stateDir/_checkpoint/commits/1")
    drain()
    assert(sinkState(stateDir) == clean,
      "replay after completed writes must be a no-op")
    val selfPairs = spark.read.parquet(s"$stateDir/dup_pairs")
      .filter(col("new_id") === col("corpus_id")).count()
    assert(selfPairs == 0, "a doc must never pair with its own replayed signature")

    // Crash point C — mid corpus append (accepted partition torn away
    // entirely, pairs written, index not): replay must restore the
    // accepted docs without double-writing anything else
    rmrf(s"$stateDir/_checkpoint/commits/1")
    rmrf(s"$stateDir/accepted/ingest_batch=1")
    rmrf(s"$stateDir/band_index/ingest_batch=1")
    drain()
    assert(sinkState(stateDir) == clean,
      "replay after a torn corpus append must restore the accepted docs exactly")

    // and the post-crash corpus still screens future drops correctly
    Thread.sleep(30)
    Seq(doc(7L, base4.replace("web", "internet")),
        doc(8L, "a genuinely novel document mentioning telescopes satellites and the geometry of orbital mechanics"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/d3")
    drain()
    val after = sinkState(stateDir)
    assert(after._1 == Seq(1L, 2L, 4L, 5L, 8L), after._1.toString)
    assert(after._3.contains((7L, 4L, "corpus")), after._3.toString)
  }
}
