package graft

import graft.operators.Aggs
import org.apache.spark.sql.functions._

/** Persistable HLL distinct-count sketches (`Aggs.distinctSketches` /
  * `mergeSketches`): the properties that justify q_hll_rollup's
  * no_oracle status — accuracy vs exact counts, the rollup ≡
  * direct-sketch identity, and parquet persistability (the whole point:
  * sketch once, roll up forever without rescanning).
  */
class SketchSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)

  test("estimates track the exact distinct counts within lgK=12 error") {
    val fine = Aggs.distinctSketches(docs, Seq("source", "lang"), "doc_id")
    val est = Aggs.mergeSketches(fine, Seq("source"))
      .select(col("source"), col("approx_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("source").agg(countDistinct("doc_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (src, ex) =>
      val e = est(src)
      // lgK=12 ⇒ ~1.6% RSE; 5σ bound with slack for small groups
      assert(math.abs(e - ex) <= math.max(5, 0.1 * ex),
        s"source $src: estimate $e vs exact $ex")
    }
  }

  test("rollup of fine sketches ≡ sketching the coarse group directly") {
    // HLL union is register-max, so merging disjoint fine sketches must
    // reproduce the direct coarse sketch's estimate EXACTLY — the
    // invariant that makes incremental per-day sketching sound
    val viaFine = Aggs.mergeSketches(
        Aggs.distinctSketches(docs, Seq("source", "lang"), "doc_id"),
        Seq("source"))
      .select(col("source"), col("approx_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Aggs.mergeSketches(
        Aggs.distinctSketches(docs, Seq("source"), "doc_id"), Seq("source"))
      .select(col("source"), col("approx_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaFine == direct, s"rollup $viaFine != direct $direct")
  }

  test("sketch table persists to parquet and merges identically after reload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    val fine = Aggs.distinctSketches(docs, Seq("source", "lang"), "doc_id")
    fine.write.mode("overwrite").parquet(dir)
    val before = Aggs.mergeSketches(fine, Seq("source"))
      .select(col("source"), col("n_rows"), col("approx_distinct")).collect().toSet
    val after = Aggs.mergeSketches(spark.read.parquet(dir), Seq("source"))
      .select(col("source"), col("n_rows"), col("approx_distinct")).collect().toSet
    assert(before == after, "reloaded sketches roll up differently")
  }

  test("incremental append: union of old + new partition sketches covers both") {
    // the daily-drop shape: yesterday's persisted sketches + today's new
    // partition, merged without touching yesterday's data
    val old = Aggs.distinctSketches(docs.filter(col("doc_id") % 2 === 0),
      Seq("source"), "doc_id").withColumn("day", lit("d0"))
    val fresh = Aggs.distinctSketches(docs.filter(col("doc_id") % 2 === 1),
      Seq("source"), "doc_id").withColumn("day", lit("d1"))
    val merged = Aggs.mergeSketches(old.unionByName(fresh), Seq("source"))
      .select(col("source"), col("approx_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = Aggs.mergeSketches(
        Aggs.distinctSketches(docs, Seq("source"), "doc_id"), Seq("source"))
      .select(col("source"), col("approx_distinct")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == whole, s"incremental $merged != whole-corpus $whole")
  }

  test("mergeSketches partially aggregates — the union is algebraic") {
    val p = Aggs.mergeSketches(
        Aggs.distinctSketches(docs, Seq("source", "lang"), "doc_id"),
        Seq("source"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("ObjectHashAggregate|HashAggregate".r.findAllIn(p).size >= 2,
      s"sketch union lost its map-side partial aggregate:\n$p")
  }
}
