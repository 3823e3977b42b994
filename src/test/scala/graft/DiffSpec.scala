package graft

import graft.operators.Diff
import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Snapshot diff (Diff.snapshotDiff / diffSummary) and the Versioned
  * time-travel index (versions / readAt) it pairs with for release
  * audits. q_corpus_diff carries the DuckDB-oracled replay; this spec
  * pins the semantics the oracle can't see: null-vs-empty fingerprint
  * separation, portable/native parity, and version-resolution failure
  * modes.
  */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  private val old = Seq(
    (1L, Some("alpha"), "x"),
    (2L, Some("beta"), "y"),
    (3L, None: Option[String], "z"),   // null text
    (4L, Some(""), "w"),               // empty text
    (5L, Some("gone"), "v")
  ).toDF("id", "text", "tag")

  private val nu = Seq(
    (1L, Some("alpha"), "x"),          // unchanged
    (2L, Some("beta2"), "y"),          // changed (text)
    (3L, Some(""), "z"),               // null -> empty MUST be changed
    (4L, Some(""), "w2"),              // changed (second compare col)
    (6L, Some("new"), "u")             // added; 5 removed
  ).toDF("id", "text", "tag")

  test("snapshotDiff statuses, including null vs empty-string") {
    val d = Diff.snapshotDiff(old, nu, Seq("id"), Seq("text", "tag"))
      .orderBy("id")
    assert(d.columns.toSeq === Seq("id", "status"))
    val got = d.as[(Long, String)].collect().toSeq
    assert(got === Seq(
      1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "changed", 5L -> "removed", 6L -> "added"))
  }

  test("portable (md5) and native (xxhash64) fingerprints agree on status") {
    val a = Diff.snapshotDiff(old, nu, Seq("id"), Seq("text", "tag"))
    val b = Diff.snapshotDiff(old, nu, Seq("id"), Seq("text", "tag"),
      portable = true)
    assert(a.orderBy("id").collect().toSeq === b.orderBy("id").collect().toSeq)
  }

  test("diffSummary rolls up the four statuses") {
    val s = Diff.diffSummary(
      Diff.snapshotDiff(old, nu, Seq("id"), Seq("text", "tag")))
      .as[(String, Long)].collect().toSeq
    assert(s === Seq("added" -> 1L, "changed" -> 3L, "removed" -> 1L,
      "unchanged" -> 1L))
  }

  test("multi-column keys join correctly") {
    val o2 = old.withColumn("k2", col("id") % 2)
    val n2 = nu.withColumn("k2", col("id") % 2)
    val d = Diff.snapshotDiff(o2, n2, Seq("id", "k2"), Seq("text"))
    // same ids exist on both sides iff id in 1..4 -> never added/removed
    assert(d.filter(col("id").between(1, 4) &&
      col("status").isin("added", "removed")).count() === 0)
  }

  test("Versioned versions/readAt: time travel, then vacuum bounds it") {
    val root = java.nio.file.Files.createTempDirectory("diff-ver").toString
    val v0 = Sinks.Versioned.write(old, root)
    val v1 = Sinks.Versioned.write(nu, root)
    assert(Sinks.Versioned.versions(spark, root) === Seq(0, 1))
    assert(v0 === 0 && v1 === 1)

    // time-travel diff reproduces the fixture diff
    val d = Diff.snapshotDiff(
      Sinks.Versioned.readAt(spark, root, 0),
      Sinks.Versioned.readAt(spark, root, 1),
      Seq("id"), Seq("text", "tag"))
    assert(d.filter(col("status") =!= "unchanged").count() === 5)

    // readAt(current) ≡ read
    assert(Sinks.Versioned.readAt(spark, root, 1).collect().toSet ===
      Sinks.Versioned.read(spark, root).collect().toSet)

    // unpublished seq fails loudly
    intercept[java.io.FileNotFoundException] {
      Sinks.Versioned.readAt(spark, root, 7)
    }

    // vacuum to 1 version: v0 no longer reachable, v1 still is
    Sinks.Versioned.vacuum(spark, root, keep = 1)
    assert(Sinks.Versioned.versions(spark, root) === Seq(1))
    intercept[java.io.FileNotFoundException] {
      Sinks.Versioned.readAt(spark, root, 0)
    }
    assert(Sinks.Versioned.readAt(spark, root, 1).count() === 5)
  }
}
