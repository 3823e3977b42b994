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
}
