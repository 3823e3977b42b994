package graft

import graft.operators.{Joins, TextQuality}
import org.apache.spark.sql.functions._

/** Keyed MERGE/upsert semantics and the hashed linear quality scorer
  * (the two round-11 snapshot/curation additions).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "name", "bal")

  test("upsert: updates override, inserts add, untouched rows pass through") {
    val updates = Seq((2L, "b2", 25.0), (9L, "new", 99.0)).toDF("k", "name", "bal")
    val got = Joins.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0), (9L, "new", 99.0)))
  }

  test("upsert: versionOrder picks the max-version row per key") {
    val updates = Seq((2L, "old", 1.0), (2L, "newest", 3.0), (2L, "mid", 2.0))
      .toDF("k", "name", "bal")
    val got = Joins.upsert(base, updates, Seq("k"), versionOrder = Some(col("bal")))
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "newest", 3.0), (3L, "c", 30.0)))
  }

  test("upsert: duplicate update keys without versionOrder fail loudly at execution") {
    val updates = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "name", "bal")
    val merged = Joins.upsert(base, updates, Seq("k"))  // lazy: no error yet
    val e = intercept[Exception] { merged.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("versionOrder")), e.getMessage)
  }

  test("upsert: mismatched update schema refused") {
    val updates = Seq((2L, "x")).toDF("k", "name")
    val e = intercept[IllegalArgumentException] {
      Joins.upsert(base, updates, Seq("k"))
    }
    assert(e.getMessage.contains("must match base columns"))
  }

  test("upsert: type drift refused — a string-typed delta must not widen the snapshot") {
    val updates = Seq((2L, "x", "25.0")).toDF("k", "name", "bal") // bal: string
    val e = intercept[IllegalArgumentException] {
      Joins.upsert(base, updates, Seq("k"))
    }
    assert(e.getMessage.contains("column types must match") &&
      e.getMessage.contains("bal"), e.getMessage)
  }

  test("upsert: shuffled (non-broadcast) path returns the identical snapshot") {
    val updates = Seq((1L, "a2", 11.0), (4L, "d", 40.0)).toDF("k", "name", "bal")
    val b = Joins.upsert(base, updates, Seq("k"), broadcastUpdates = true)
      .orderBy("k").collect().toSeq
    val s = Joins.upsert(base, updates, Seq("k"), broadcastUpdates = false)
      .orderBy("k").collect().toSeq
    assert(b == s && b.size == 4)
  }

  test("upsert → Versioned publish: merge-then-swap, old snapshot intact until the new one lands") {
    import graft.sources.Sinks.Versioned
    val root = java.nio.file.Files.createTempDirectory("upsert-ver").toString
    assert(Versioned.write(base, root) == 0)
    val updates = Seq((2L, "b2", 25.0), (9L, "new", 99.0)).toDF("k", "name", "bal")
    val merged = Joins.upsert(Versioned.read(spark, root), updates, Seq("k"))
    assert(Versioned.write(merged, root) == 1)
    val got = Versioned.read(spark, root).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0), (9L, "new", 99.0)))
    // the pre-merge version is still fully readable (reader isolation)
    val v0 = spark.read.parquet(s"$root/v00000").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(v0 == base.orderBy("k").as[(Long, String, Double)].collect().toSeq)
  }

  test("upsertPartitioned: only the delta's partitions rewrite; result ≡ full-table upsert") {
    import graft.sources.Sinks
    val root = java.nio.file.Files.createTempDirectory("upsert-part").toString + "/t"
    val table = Seq(
      (1L, "a", 10.0, "p1"), (2L, "b", 20.0, "p1"),
      (3L, "c", 30.0, "p2"), (4L, "d", 40.0, "p3"))
      .toDF("k", "name", "bal", "part")
    table.write.partitionBy("part").parquet(root)
    def files(p: String) = {
      val d = new java.io.File(s"$root/part=$p")
      if (!d.exists) Map.empty[String, Long]
      else d.listFiles.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    }
    val (p1Before, p3Before) = (files("p1"), files("p3"))
    // delta: update k=3 (partition p2), insert k=9 into NEW partition p4
    val delta = Seq((3L, "c2", 33.0, "p2"), (9L, "new", 99.0, "p4"))
      .toDF("k", "name", "bal", "part")
    val affected = Sinks.upsertPartitioned(spark, root, delta, Seq("k"), "part")
    assert(affected == Seq("p2", "p4"))
    // untouched partitions: identical files, untouched mtimes
    assert(files("p1") == p1Before && files("p3") == p3Before)
    // table now equals the full-table upsert of the same delta
    val got = spark.read.parquet(root)
      .select("k", "name", "bal", "part").orderBy("k")
      .as[(Long, String, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 10.0, "p1"), (2L, "b", 20.0, "p1"), (3L, "c2", 33.0, "p2"),
      (4L, "d", 40.0, "p3"), (9L, "new", 99.0, "p4")))
  }

  // ---- hashedLinearScore ---------------------------------------------

  /** Reference replay of the deterministic weight table. */
  private def refScore(text: String, buckets: Int = 4096): (Long, Long) = {
    val ws = text.trim.toLowerCase.split("\\s+").toSeq
    val feats = ws ++ ws.sliding(2).filter(_.size == 2).map(_.mkString("_"))
    val wsum = feats.map { f =>
      val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
        f.getBytes("UTF-8")).substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % buckets) % 2001 - 1000
    }.sum
    (feats.size.toLong, wsum)
  }

  test("hashedLinearScore: matches the md5 hashing-trick replay, keep = score > cutoff") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "word")).toDF("doc_id", "text")
    val got = TextQuality.hashedLinearScore(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Double], Boolean)].collect().toSeq
    for (((id, nf, wsum, score, keep), txt) <- got.zip(Seq("the quick brown fox", "word"))) {
      val (en, ew) = refScore(txt)
      assert(nf == en && wsum == ew, s"doc $id: got ($nf,$wsum) want ($en,$ew)")
      assert(score.contains(ew.toDouble / (en * 1000.0)))
      assert(keep == (score.get > 0.0))
    }
  }

  test("hashedLinearScore: null text scores null and is dropped, not kept") {
    val docs = Seq((1L, Some("alpha beta")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = TextQuality.hashedLinearScore(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got.length == 2)
    val nullRow = got(1)
    assert(nullRow.isNullAt(nullRow.fieldIndex("score")))
    assert(!nullRow.getBoolean(nullRow.fieldIndex("keep")))
  }

  test("hashedLinearScore: cutoff shifts the keep decision") {
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    val lo = TextQuality.hashedLinearScore(docs, "text", "doc_id", cutoff = -2.0)
      .select("keep").head().getBoolean(0)
    val hi = TextQuality.hashedLinearScore(docs, "text", "doc_id", cutoff = 2.0)
      .select("keep").head().getBoolean(0)
    assert(lo && !hi)  // weights are bounded in [-1, 1] per feature
  }
}
