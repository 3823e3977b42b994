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

  test("fingerprint is injection-proof across column boundaries") {
    // ("a<X>b","c") vs ("a","b<X>c") must be CHANGED for any would-be
    // separator X — per-column digests make boundaries unforgeable
    for (sep <- Seq("\u0001", "\u0000", "N", "V", "")) {
      val l = Seq((1L, s"a${sep}b", "c")).toDF("id", "p", "q")
      val r = Seq((1L, "a", s"b${sep}c")).toDF("id", "p", "q")
      for (portable <- Seq(false, true)) {
        val st = Diff.snapshotDiff(l, r, Seq("id"), Seq("p", "q"), portable)
          .select("status").as[String].head()
        assert(st === "changed", s"sep=${sep.map(_.toInt)} portable=$portable")
      }
    }
  }

  test("NULL cell is distinct from empty string AND from a literal NUL") {
    val l = Seq((1L, None: Option[String]), (2L, None: Option[String]))
      .toDF("id", "p")
    val r = Seq((1L, Some("")), (2L, Some("\u0000"))).toDF("id", "p")
    for (portable <- Seq(false, true)) {
      val st = Diff.snapshotDiff(l, r, Seq("id"), Seq("p"), portable)
        .orderBy("id").select("status").as[String].collect().toSeq
      assert(st === Seq("changed", "changed"), s"portable=$portable")
    }
  }

  test("NULL keys match null-safely: one row, not added+removed") {
    val l = Seq((None: Option[Long], "x"), (Some(1L), "y")).toDF("id", "p")
    val r = Seq((None: Option[Long], "x"), (Some(1L), "y2")).toDF("id", "p")
    val d = Diff.snapshotDiff(l, r, Seq("id"), Seq("p"))
    val byStatus = d.groupBy("status").count()
      .as[(String, Long)].collect().toMap
    assert(byStatus === Map("unchanged" -> 1L, "changed" -> 1L))
    // and the null key survives the output projection
    assert(d.filter(col("id").isNull).select("status")
      .as[String].head() === "unchanged")
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
