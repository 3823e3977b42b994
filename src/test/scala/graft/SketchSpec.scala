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

  // ---- count-min frequency sketches --------------------------------

  import spark.implicits._

  private lazy val items = Seq(
    ("a", "x", "tok1"), ("a", "x", "tok1"), ("a", "x", "tok2"),
    ("a", "y", "tok1"), ("a", "y", "tok3"),
    ("b", "x", "tok2"), ("b", "x", "tok2"), ("b", "x", "tok4"))
    .toDF("grp", "part", "item")

  test("CMS: merged rollup is BIT-identical to sketching coarse directly") {
    // count-min is linear: cell-wise addition over shared hash planes —
    // not just equal estimates, the merged blob must equal the direct one
    val viaFine = Aggs.mergeCmSketches(
        Aggs.cmSketches(items, Seq("grp", "part"), "item"), Seq("grp"))
      .select(col("grp"), col("sketch")).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val direct = Aggs.cmSketches(items, Seq("grp"), "item")
      .select(col("grp"), col("sketch")).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(viaFine == direct, "CMS merge is not the linear identity")
  }

  test("CMS: estimates never undercount, and are exact on sparse input") {
    val merged = Aggs.mergeCmSketches(
      Aggs.cmSketches(items, Seq("grp", "part"), "item"), Seq("grp"))
    val est = items.groupBy("grp", "item").agg(count(lit(1)).as("n"))
      .join(merged, Seq("grp"))
      .select(col("grp"), col("item"), col("n"),
        Aggs.cmEstimate(col("sketch"), col("item")).as("est"))
      .collect()
    est.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"),
        s"undercount on ${r.getString(1)}")
      // 8 distinct items vs 27k-cell width: collision-free, so exact
      assert(r.getAs[Long]("est") == r.getAs[Long]("n"),
        s"unexpected collision on ${r.getString(1)}")
    }
    // an item never inserted estimates 0 on sparse input
    val zero = merged.filter(col("grp") === "a")
      .select(Aggs.cmEstimate(col("sketch"), lit("absent"))).as[Long].head()
    assert(zero == 0L)
  }

  test("CMS table persists to parquet and answers identically after reload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    val fine = Aggs.cmSketches(items, Seq("grp", "part"), "item")
    fine.write.mode("overwrite").parquet(dir)
    val before = Aggs.mergeCmSketches(fine, Seq("grp"))
      .select(col("grp"), Aggs.cmEstimate(col("sketch"), lit("tok1")).as("e"),
        col("n_items")).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val after = Aggs.mergeCmSketches(spark.read.parquet(dir), Seq("grp"))
      .select(col("grp"), Aggs.cmEstimate(col("sketch"), lit("tok1")).as("e"),
        col("n_items")).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(before == after, "reloaded CMS table answers differently")
  }

  test("CMS on empty input is total") {
    val none = Seq.empty[(String, String)].toDF("grp", "item")
    val sk = Aggs.cmSketches(none, Seq("grp"), "item")
    assert(sk.isEmpty)
    assert(Aggs.mergeCmSketches(sk, Seq("grp")).isEmpty)
  }

  // ---- KLL quantile sketches ---------------------------------------

  private lazy val vals = (1 to 10000)
    .map(i => (if (i % 2 == 0) "even" else "odd", i.toDouble))
    .toDF("grp", "v")

  test("KLL: quantile estimates sit within rank error of exact") {
    val est = Aggs.quantileSketches(vals, Seq("grp"), "v", k = 200)
    val rows = est.select(col("grp"), col("n_rows"),
        Aggs.kllQuantile(col("sketch"), 0.5).as("med"),
        Aggs.kllQuantile(col("sketch"), 0.95).as("p95")).collect()
    assert(rows.map(_.getString(0)).toSet == Set("even", "odd"))
    rows.foreach { r =>
      // values are 1..10000 split by parity: exact median ≈ 5000,
      // p95 ≈ 9500 in each group; 3% rank slack ≈ 4.7σ at k=200
      assert(math.abs(r.getAs[Double]("med") - 5000) <= 300, r.toString)
      assert(math.abs(r.getAs[Double]("p95") - 9500) <= 300, r.toString)
      assert(r.getAs[Long]("n_rows") == 5000L)
    }
  }

  test("KLL: rollup of fine sketches preserves the rank guarantee") {
    val merged = Aggs.mergeQuantileSketches(
      Aggs.quantileSketches(vals, Seq("grp"), "v", k = 200), Seq.empty)
    val r = merged.select(Aggs.kllQuantile(col("sketch"), 0.5).as("med"),
      col("n_rows")).collect().head
    assert(r.getAs[Long]("n_rows") == 10000L)
    assert(math.abs(r.getAs[Double]("med") - 5000) <= 300, r.toString)
  }

  test("KLL table persists to parquet and rolls up after reload") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kll").toString
    val fine = Aggs.quantileSketches(vals, Seq("grp"), "v", k = 200)
    fine.write.mode("overwrite").parquet(dir)
    val r = Aggs.mergeQuantileSketches(spark.read.parquet(dir), Seq.empty)
      .select(Aggs.kllQuantile(col("sketch"), 0.5).as("med"), col("n_rows"))
      .collect().head
    assert(r.getAs[Long]("n_rows") == 10000L)
    assert(math.abs(r.getAs[Double]("med") - 5000) <= 300, r.toString)
  }

  test("KLL: nulls are skipped, empty input and empty sketch are total") {
    val withNulls = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("grp", "v")
    val sk = Aggs.quantileSketches(withNulls, Seq("grp"), "v")
    val r = sk.select(col("n_rows"),
      Aggs.kllQuantile(col("sketch"), 1.0).as("mx")).collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 3.0)
    val none = Seq.empty[(String, Double)].toDF("grp", "v")
    assert(Aggs.quantileSketches(none, Seq("grp"), "v").isEmpty)
    // a group that aggregated zero non-null values yields an empty
    // sketch; the quantile extractor must return null, not throw
    val allNull = Seq(("a", None: Option[Double])).toDF("grp", "v")
    val q = Aggs.quantileSketches(allNull, Seq("grp"), "v")
      .select(Aggs.kllQuantile(col("sketch"), 0.5)).collect().head
    assert(q.isNullAt(0))
  }

  test("KLL aggregation partially aggregates map-side") {
    val p = Aggs.mergeQuantileSketches(
        Aggs.quantileSketches(vals, Seq("grp"), "v"), Seq.empty)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("ObjectHashAggregate|SortAggregate|HashAggregate".r
      .findAllIn(p).size >= 2,
      s"KLL union lost its map-side partial aggregate:\n$p")
  }
}
