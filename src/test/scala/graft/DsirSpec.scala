package graft

import graft.operators.TextQuality
import org.apache.spark.sql.functions._

/** DSIR importance resampling: fit/score/resample semantics on a
  * planted corpus — target-looking docs must score high, the resample
  * must prefer them, zero-feature docs must be excluded, and the guard
  * rails (maxBuckets, empty table) must fail loudly.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target split writes about "quantum flux capacitors"; raw writes
  // about "stock market prices"; probes are unseen docs of each style
  private def plantedCorpus() = {
    val target = (0L until 20L).map(i =>
      (i, s"quantum flux capacitor resonance $i quantum flux"))
    val raw = (100L until 180L).map(i =>
      (i, s"stock market price ticker $i close open"))
    val probes = Seq(
      (900L, "quantum flux capacitor resonance quantum"), // target-like
      (901L, "stock market price ticker close"),          // raw-like
      (902L, ""))                                         // zero-info
    (target ++ raw ++ probes).toDF("doc_id", "text")
  }

  test("planted signal: target-like probe scores above raw-like probe") {
    val docs = plantedCorpus()
    val fx = TextQuality.dsirFitFx(docs, col("doc_id") < 100L, "text",
      buckets = 512)
    val w = TextQuality.dsirWeights(docs, "text", "doc_id", fx)
      .collect().map(r => r.getLong(0) -> r).toMap
    val tProbe = w(900L).getDouble(3)
    val rProbe = w(901L).getDouble(3)
    assert(tProbe > 0.0, s"target-like probe logw $tProbe should be positive")
    assert(rProbe < 0.0, s"raw-like probe logw $rProbe should be negative")
    assert(tProbe > rProbe + 1.0,
      s"separation too small: $tProbe vs $rProbe")
  }

  test("resample prefers target-like docs; deterministic; excludes empty docs") {
    val docs = plantedCorpus()
    val fx = TextQuality.dsirFitFx(docs, col("doc_id") < 100L, "text",
      buckets = 512)
    val pick = TextQuality.dsirResample(docs, "text", "doc_id", fx,
      k = 21, seed = "t1").collect().map(_.getLong(0)).toSet
    // 20 target docs + 1 target-like probe have logw >> everything
    // else; Gumbel noise is O(1) vs a many-unit logw gap, so the top
    // 21 must be exactly the target-styled docs
    assert(pick == ((0L until 20L).toSet + 900L),
      s"expected the 21 target-styled docs, got $pick")
    val again = TextQuality.dsirResample(docs, "text", "doc_id", fx,
      k = 21, seed = "t1").collect().map(_.getLong(0)).toSet
    assert(pick == again, "same seed must select the same set")
    // "" tokenizes to [""] (one feature) so 902 is sampleable; only
    // genuinely null text has no weight and must be excluded
    val withNull = docs.unionByName(
      Seq((903L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val other = TextQuality.dsirResample(withNull, "text", "doc_id", fx,
      k = 200, seed = "t1").collect().map(_.getLong(0)).toSet
    assert(other.contains(902L) && !other.contains(903L),
      "null-text doc must never be sampled even when k exceeds the pool")
  }

  test("weights: logw is w_sum/scale exactly; empty doc carries nulls") {
    val docs = plantedCorpus()
    val fx = TextQuality.dsirFitFx(docs, col("doc_id") < 100L, "text",
      buckets = 512)
    val rows = TextQuality.dsirWeights(docs, "text", "doc_id", fx).collect()
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getDouble(3) == r.getLong(2).toDouble / 1e6,
          s"logw must be w_sum/1e6 for ${r.getLong(0)}")
    }
    // "" tokenizes to [""] (one feature), so n_feats == 1, not null —
    // the null case needs genuinely null text
    val withNull = docs.unionByName(
      Seq((903L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val nr = TextQuality.dsirWeights(withNull, "text", "doc_id", fx)
      .filter(col("doc_id") === 903L).collect()(0)
    assert(nr.isNullAt(1) && nr.isNullAt(3), "null text → null n_feats/logw")
  }

  test("guards: oversized buckets and empty table refuse loudly") {
    val docs = plantedCorpus()
    intercept[IllegalArgumentException] {
      TextQuality.dsirFitFx(docs, col("doc_id") < 100L, "text",
        buckets = 1 << 21)
    }
    intercept[IllegalArgumentException] {
      TextQuality.dsirWeights(docs, "text", "doc_id", Array.empty[Long])
    }
    intercept[IllegalArgumentException] {
      TextQuality.dsirResample(docs, "text", "doc_id", Array(1L), 0, "s")
    }
  }

  test("scoring plan is shuffle-free and top-k avoids a global sort") {
    val docs = plantedCorpus()
    val fx = TextQuality.dsirFitFx(docs, col("doc_id") < 100L, "text",
      buckets = 512)
    // weights: a pure map over the scan — no Exchange anywhere
    val wPlan = TextQuality.dsirWeights(docs, "text", "doc_id", fx)
      .queryExecution.executedPlan.toString
    assert(!wPlan.contains("Exchange"),
      s"dsirWeights must be zero-shuffle, got:\n$wPlan")
    // resample: orderBy+limit must compile to TakeOrderedAndProject,
    // not Sort+Exchange over the corpus
    val sPlan = TextQuality.dsirResample(docs, "text", "doc_id", fx,
        k = 5, seed = "t1")
      .queryExecution.sparkPlan.toString
    assert(sPlan.contains("TakeOrderedAndProject"),
      s"resample must use TakeOrderedAndProject, got:\n$sPlan")
  }
}
