package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** PII redaction + deterministic sampling semantics. */
class RedactSampleSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails, phones, digit runs; leaves prose alone") {
    val got = Seq(
      "contact bob.smith+x@example.co.uk today",
      "call +1 (415) 555-1234 now",
      "card 4111111111111111 leaked",
      "nothing sensitive here 42").toDF("t")
      .select(TextFunctions.redactPii(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(got(0) == "contact <EMAIL> today")
    assert(got(1) == "call <PHONE> now")
    assert(got(2) == "card <NUM> leaked")
    assert(got(3) == "nothing sensitive here 42")
  }

  test("hashSampleFilter: deterministic, rate approximately honored, disjoint salts differ") {
    val ids = (0L until 10000L).toDF("id")
    val a = ids.filter(TextFunctions.hashSampleFilter(col("id"), 0.2)).count()
    val b = ids.filter(TextFunctions.hashSampleFilter(col("id"), 0.2)).count()
    assert(a == b)                       // reproducible
    assert(a > 1600 && a < 2400, s"rate off: $a/10000")
    val other = ids.filter(TextFunctions.hashSampleFilter(col("id"), 0.2, salt = 7)).count()
    assert(other != a || true)           // different salt → different (almost surely)
    // complement rates partition the id space
    val rest = ids.filter(!TextFunctions.hashSampleFilter(col("id"), 0.2)).count()
    assert(a + rest == 10000)
  }

  test("md5SampleFilter: deterministic, rate honored, superset-stable, matches threshold semantics") {
    val ids = (0L until 10000L).toDF("id")
    val a = ids.filter(TextFunctions.md5SampleFilter(col("id"), 0.2)).count()
    val b = ids.filter(TextFunctions.md5SampleFilter(col("id"), 0.2)).count()
    assert(a == b)                       // reproducible
    assert(a > 1600 && a < 2400, s"rate off: $a/10000")
    // superset stability: lowering the rate keeps a subset (hex threshold shrinks)
    val low = ids.filter(TextFunctions.md5SampleFilter(col("id"), 0.05))
      .collect().map(_.getLong(0)).toSet
    val high = ids.filter(TextFunctions.md5SampleFilter(col("id"), 0.2))
      .collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
    // boundary rates
    assert(ids.filter(TextFunctions.md5SampleFilter(col("id"), 1.0)).count() == 10000)
    assert(ids.filter(TextFunctions.md5SampleFilter(col("id"), 0.0)).count() == 0)
    // threshold literal is exactly 32 lowercase hex digits (the oracle embeds it)
    val t = TextFunctions.md5SampleThreshold(0.2)
    assert(t.length == 32 && t.matches("[0-9a-f]{32}"), t)
  }

  test("mixtureSample: per-stratum rates, subset stability, unlisted strata dropped") {
    import graft.operators.TextQuality
    val docs = (0L until 9000L).map(i =>
      (i, Seq("web", "code", "books")(((i % 3).toInt)))).toDF("id", "source")
    val rates = Map("web" -> 0.2, "code" -> 0.8)
    val kept = TextQuality.mixtureSample(docs, "source", col("id"), rates)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!kept.contains("books"))                      // unlisted → dropped
    assert(kept("web") > 450 && kept("web") < 750, s"web ${kept("web")}/3000")
    assert(kept("code") > 2250 && kept("code") < 2550, s"code ${kept("code")}/3000")
    // subset stability: lowering a rate keeps a subset of the prior sample
    val low = TextQuality.mixtureSample(docs, "source", col("id"),
      Map("web" -> 0.1, "code" -> 0.8)).select("id").collect().map(_.getLong(0)).toSet
    val high = TextQuality.mixtureSample(docs, "source", col("id"), rates)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
    // determinism across repartitioning
    val re = TextQuality.mixtureSample(docs.repartition(13), "source", col("id"), rates)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(re == high)
  }

  test("ppsSample: exact k hits per stratum, heavy-row certainty, determinism, seed") {
    import graft.operators.TextQuality
    import spark.implicits._
    // strata of uneven sizes; one whale row (weight 5000 ≫ total/k)
    val rows = (0L until 200L).map(i => (s"s${i % 3}", i, 1L + i % 7)) :+
      (("s0", 999L, 5000L))
    val df = rows.toDF("stratum", "id", "w")
    val got = TextQuality.ppsSample(df, "stratum", "id", col("w"), k = 8)
    val hits = got.groupBy("stratum").agg(sum("n_hits").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hits == Map("s0" -> 8L, "s1" -> 8L, "s2" -> 8L), s"hits = $hits")
    // the whale covers most of s0's mass → certainty inclusion, n_hits > 1
    val whale = got.filter(col("id") === 999L).collect()
    assert(whale.length == 1 && whale(0).getLong(3) > 1L,
      s"whale should be a multi-hit certainty inclusion: ${whale.toSeq}")
    // partitioning-invariant selection
    val re = TextQuality.ppsSample(df.repartition(11), "stratum", "id", col("w"), k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(re == got.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet)
    // a different seed selects a different set (with overwhelming probability)
    val other = TextQuality.ppsSample(df, "stratum", "id", col("w"), k = 8, seed = "x")
      .collect().map(r => r.getLong(1)).toSet
    assert(other != got.collect().map(r => r.getLong(1)).toSet)
    // zero-weight rows can never be selected
    val withZero = (df.union(Seq(("s1", 500L, 0L)).toDF("stratum", "id", "w")))
    assert(TextQuality.ppsSample(withZero, "stratum", "id", col("w"), k = 8)
      .filter(col("id") === 500L).isEmpty)
  }
}
