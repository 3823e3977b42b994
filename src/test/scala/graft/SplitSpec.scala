package graft

import graft.operators.TextQuality
import org.apache.spark.sql.functions._

/** Deterministic hash-split: document-stable, partitioning-independent,
  * grow-stable, seed-sensitive.
  */
class SplitSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1 to 500).map(i => s"doc_$i").toDF("id")

  test("every row gets exactly one of the declared splits, proportions near fractions") {
    val got = TextQuality.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = got.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    assert(counts.values.sum == 500L)
    assert(counts("train") > 350 && counts("train") < 450,
      s"train proportion far from 0.8: $counts")
    assert(counts.getOrElse("val", 0L) > 20 && counts.getOrElse("test", 0L) > 20)
  }

  test("assignment is a pure function of the id: partitioning and row order never move a doc") {
    val base = TextQuality.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val shuffled = TextQuality.hashSplit(
      ids.orderBy(rand(42)).repartition(13), "id", Seq("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(base == shuffled)
  }

  test("grow-stable: raising the leading fraction only ever moves docs INTO it") {
    def trainSet(frac: Double) = TextQuality.hashSplit(ids, "id",
      Seq("train" -> frac, "rest" -> (1.0 - frac)))
      .filter(col("split") === "train").select("id").as[String].collect().toSet
    val small = trainSet(0.6)
    val big = trainSet(0.8)
    assert(small.subsetOf(big))
    assert(big.size > small.size)
  }

  test("seed reshuffles assignments") {
    def splitsWith(seed: String) = TextQuality.hashSplit(ids, "id",
      Seq("a" -> 0.5, "b" -> 0.5), seed = seed)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val s1 = splitsWith("")
    val s2 = splitsWith("epoch2")
    assert(s1 != s2)
  }

  test("fractions that do not sum to 1 are rejected; decimal boundaries match the oracle literal") {
    intercept[IllegalArgumentException] {
      TextQuality.hashSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
    // 0.8 + 0.1 must hit md5SampleThreshold(0.9) exactly, not the
    // double-sum 0.9000000000000001
    val df = TextQuality.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val viaLiterals = ids.withColumn("split",
      when(md5(col("id")) < lit(graft.functions.TextFunctions.md5SampleThreshold(0.8)), "train")
        .when(md5(col("id")) < lit(graft.functions.TextFunctions.md5SampleThreshold(0.9)), "val")
        .otherwise("test"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      viaLiterals.collect().map(r => (r.getString(0), r.getString(1))).toSet)
  }

  test("splitLeakage: cells canonicalized, pair and distinct-doc counts exact") {
    import spark.implicits._
    val assigned = Seq(
      (1L, "train"), (2L, "train"), (3L, "val"),
      (4L, "test"), (5L, "test"), (6L, "train")).toDF("doc_id", "split")
    val pairs = Seq(
      (1L, 2L),            // train-train (benign cell)
      (1L, 4L), (6L, 4L),  // test-train leaks sharing doc 4
      (3L, 5L)             // test-val leak
    ).toDF("doc_a", "doc_b")
    val got = TextQuality.splitLeakage(assigned, "doc_id", "split",
        pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("test", "train", 2L, 3L),  // pairs (1,4),(6,4): docs {1,4,6}
      ("test", "val", 1L, 2L),
      ("train", "train", 1L, 2L)))
  }

  test("splitLeakage: pairs with unassigned endpoints drop; empty pairs -> empty report") {
    import spark.implicits._
    val assigned = Seq((1L, "train"), (2L, "test")).toDF("doc_id", "split")
    val dangling = Seq((1L, 99L)).toDF("doc_a", "doc_b")
    assert(TextQuality.splitLeakage(assigned, "doc_id", "split",
      dangling, "doc_a", "doc_b").count() == 0)
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val rep = TextQuality.splitLeakage(assigned, "doc_id", "split",
      empty, "doc_a", "doc_b")
    assert(rep.count() == 0)
    assert(rep.columns.toSeq == Seq("split_a", "split_b", "n_pairs", "n_docs"))
  }

  test("leakedDocs: quarantine list is target-split docs with cross-split partners") {
    import spark.implicits._
    val assigned = Seq(
      (1L, "train"), (2L, "train"), (3L, "val"),
      (4L, "test"), (5L, "test")).toDF("doc_id", "split")
    val pairs = Seq(
      (1L, 4L), (2L, 4L), // doc 4 leaks twice
      (3L, 5L),           // doc 5 leaks from val
      (4L, 5L),           // test-test: not a leak
      (1L, 2L)            // train-train: not a leak
    ).toDF("doc_a", "doc_b")
    val got = TextQuality.leakedDocs(assigned, "doc_id", "split",
        pairs, "doc_a", "doc_b", targetSplit = "test")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((4L, 2L), (5L, 1L)))
    // anti-joining the quarantine restores independence: no cross-split
    // pair touches a surviving test doc
    val surviving = assigned.join(
      TextQuality.leakedDocs(assigned, "doc_id", "split",
        pairs, "doc_a", "doc_b", "test").withColumnRenamed("doc", "doc_id"),
      Seq("doc_id"), "left_anti")
    val rep = TextQuality.splitLeakage(surviving, "doc_id", "split",
        pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rep.forall { case (a, b) => a == b || !(a == "test" || b == "test") })
  }
}
