package graft

import graft.functions.TextFunctions
import graft.operators.TextQuality
import org.apache.spark.sql.functions._

/** Repetition-quality metrics: duplicate-token fraction, run lengths,
  * top-n-gram dominance.
  */
class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  test("thresholdSweep: hand-computed suffix sums, weights, null scores, unreachable thresholds") {
    val df = Seq(
      (Some(5.0), 5L), (Some(15.0), 15L), (Some(30.0), 30L),
      (Some(120.0), 120L), (None, 7L) // null score: in totals, kept by nothing
    ).toDF("score", "w")
    val got = TextQuality.thresholdSweep(df, "score",
        Seq(10.0, 25.0, 50.0, 100.0, 200.0), weightCol = Some("w"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    val tn = 5.0; val tw = 177.0
    assert(got.toSeq == Seq(
      (10.0, 3L, 3 / tn, 165L, 165 / tw),
      (25.0, 2L, 2 / tn, 150L, 150 / tw),
      (50.0, 1L, 1 / tn, 120L, 120 / tw),
      (100.0, 1L, 1 / tn, 120L, 120 / tw),
      (200.0, 0L, 0.0, 0L, 0.0))) // unreachable threshold: kept 0, not a missing row
  }

  test("thresholdSweep: no weight column defaults to row counts; unsorted grid rejected") {
    val df = Seq(1.0, 2.0, 3.0).toDF("score")
    val got = TextQuality.thresholdSweep(df, "score", Seq(2.0))
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 2L))) // w == n when unweighted
    intercept[IllegalArgumentException] {
      TextQuality.thresholdSweep(df, "score", Seq(3.0, 1.0))
    }
    intercept[IllegalArgumentException] {
      TextQuality.thresholdSweep(df, "score", Seq.empty)
    }
  }

  test("thresholdSweep: empty frame keeps the grid with zero counts and null fractions") {
    val df = Seq.empty[(Double, Long)].toDF("score", "w")
    val got = TextQuality.thresholdSweep(df, "score", Seq(1.0, 2.0),
      weightCol = Some("w")).collect()
    assert(got.length == 2)
    assert(got.forall(r => r.getLong(1) == 0L && r.getLong(3) == 0L))
    assert(got.forall(r => r.isNullAt(2) && r.isNullAt(4))) // 0-of-nothing: fraction undefined
  }

  test("calibratedGate: strictest feasible cutoff applies; infeasible target falls back to loosest; empty stays empty") {
    // scores 5,15,30,120 + one null. Grid (10,25,50): frac_kept = 3/5,
    // 2/5, 1/5 — target 0.4 picks 25 (strictest with frac >= 0.4)
    val df = Seq(Some(5.0), Some(15.0), Some(30.0), Some(120.0), None)
      .toDF("score")
    val kept = TextQuality.calibratedGate(df, "score", Seq(10.0, 25.0, 50.0), 0.4)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    assert(kept.toSeq == Seq((30.0, 25.0), (120.0, 25.0))) // null score gated out
    // target 0.9 is infeasible on this grid (max frac is 3/5): the
    // loosest threshold (10) applies rather than an empty result
    val fb = TextQuality.calibratedGate(df, "score", Seq(10.0, 25.0, 50.0), 0.9)
      .collect().map(_.getDouble(0)).sorted
    assert(fb.toSeq == Seq(15.0, 30.0, 120.0))
    // empty input: empty output, no null-cut explosion
    assert(TextQuality.calibratedGate(Seq.empty[Double].toDF("score"),
      "score", Seq(10.0), 0.5).count() == 0)
    intercept[IllegalArgumentException] {
      TextQuality.calibratedGate(df, "score", Seq(10.0), 0.0)
    }
  }

  test("calibratedGate: a weight column makes the target a MASS fraction, not a row fraction") {
    // scores 5, 15, 30, 120 with weights = scores: total mass 170.
    // Grid (10, 25): w_frac_kept = 165/170 ≈ 0.97 and 150/170 ≈ 0.88,
    // but frac_kept (rows) = 3/4 and 2/4. A 0.8 target must pick 25
    // when weighted (mass says yes) and 10 when unweighted (rows say no)
    val df = Seq((5.0, 5L), (15.0, 15L), (30.0, 30L), (120.0, 120L))
      .toDF("score", "w")
    val weighted = TextQuality.calibratedGate(df, "score", Seq(10.0, 25.0), 0.8,
      weightCol = Some("w")).collect().map(_.getDouble(0)).sorted
    assert(weighted.toSeq == Seq(30.0, 120.0), weighted.toSeq.toString)
    val unweighted = TextQuality.calibratedGate(df, "score", Seq(10.0, 25.0), 0.8)
      .collect().map(_.getDouble(0)).sorted
    assert(unweighted.toSeq == Seq(15.0, 30.0, 120.0), unweighted.toSeq.toString)
  }

  test("sampleKPerGroup: exact quotas, small groups whole, deterministic") {
    import graft.operators.TextQuality
    val rows = ((1 to 30).map(i => (i.toLong, "big")) ++
      (100 to 102).map(i => (i.toLong, "small"))).toDF("id", "g")
    val got = TextQuality.sampleKPerGroup(rows, "g", col("id"), k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.count(_._2 == "big") == 5)
    assert(got.count(_._2 == "small") == 3) // group smaller than k kept whole
    val again = TextQuality.sampleKPerGroup(rows, "g", col("id"), k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.sorted.toSeq == again.sorted.toSeq)
    // a different salt draws a different deterministic sample
    val salted = TextQuality.sampleKPerGroup(rows, "g", col("id"), k = 5, salt = "x")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(salted.sorted.toSeq != got.sorted.toSeq)
  }

  test("shuffleShards: full coverage, contiguous per-shard positions, deterministic") {
    import graft.operators.TextQuality
    val ids = (1L to 200L).map(i => Tuple1(i)).toDF("doc_id")
    val got = TextQuality.shuffleShards(ids, "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every id exactly once; shards in range
    assert(got.map(_._1).sorted.toSeq == (1L to 200L))
    assert(got.forall(t => t._2 >= 0 && t._2 < 8))
    // positions are 1..count within each shard (a training reader can
    // stream each shard sequentially with no gaps)
    got.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length),
        s"shard $shard positions not contiguous")
    }
    // deterministic under physical repartitioning
    val re = TextQuality.shuffleShards(ids.repartition(13), "doc_id", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(re.sorted.toSeq == got.sorted.toSeq)
    // a new seed = a new epoch order
    val seeded = TextQuality.shuffleShards(ids, "doc_id", nShards = 8, seed = "epoch1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(seeded.sorted.toSeq != got.sorted.toSeq)
    // shardColumn IS the shuffleShards assignment — a manifest computed
    // from it can never disagree with the written layout
    val direct = ids.select(col("doc_id"),
        TextQuality.shardColumn(col("doc_id"), 8).as("shard"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.forall { case (id, shard, _) => direct(id) == shard })
  }

  test("mixturePlan: targets, rates, epochs from hand math; unlisted strata zeroed") {
    import graft.operators.TextQuality
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "x y z"),   // 6 tokens available
      (3L, "b", "x"),                           // 1 token available
      (4L, "c", "x y")                          // stratum not in weights
    ).toDF("doc_id", "src", "text")
    val plan = TextQuality.mixturePlan(docs, "src", "text",
        Map("a" -> 0.5, "b" -> 0.25), tokenBudget = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5), r.getLong(6))).sortBy(_._1)
    // a: target ⌊0.5·8⌋=4 of 6 → rate 4/6, one pass
    assert(plan(0) == ("a", 2L, 6L, 0.5, 4L, 4.0 / 6.0, 1L))
    // b: target 2 of 1 → capped rate 1.0, needs 2 epochs (upsampling)
    assert(plan(1) == ("b", 1L, 1L, 0.25, 2L, 1.0, 2L))
    // c: unlisted stratum planned out of the mix
    assert(plan(2) == ("c", 1L, 2L, 0.0, 0L, 0.0, 0L))
  }

  test("vocabDivergence: 0 for identical corpora, ln 2 for disjoint vocabularies") {
    import graft.operators.TextQuality
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta")).toDF("doc_id", "text")
    val same = TextQuality.vocabDivergence(a, a, "text").head()
    assert(math.abs(same.getDouble(0)) < 1e-9, s"JS(a,a) = ${same.getDouble(0)}")
    assert(same.getLong(1) == 6L && same.getLong(2) == 6L)
    assert(same.getLong(3) == 4L && same.getLong(4) == 4L)
    val b = Seq((1L, "epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val disjoint = TextQuality.vocabDivergence(a, b, "text").head()
    assert(math.abs(disjoint.getDouble(0) - math.log(2.0)) < 1e-6,
      s"disjoint JS = ${disjoint.getDouble(0)} != ln 2")
    // an empty side yields an EXPLICIT null, never NaN/garbage
    val empty = TextQuality.vocabDivergence(
      a.filter(col("doc_id") < 0), a, "text").head()
    assert(empty.isNullAt(0), s"empty-side JS should be null, got $empty")
  }

  test("chunkByTokens: overlap, partial tail, empty docs skipped, disjoint at stride=chunk") {
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "one two three"),                          // shorter than a chunk
      (3L, "   ")                                     // empty after trim
    ).toDF("doc_id", "text")
    val got = TextFunctions.chunkByTokens(docs, "text", "doc_id", 4, 3)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // chunking stops at the first window reaching the end — no
    // redundant tail chunk (a start-9 "t10" chunk would be a strict
    // subset of chunk 2)
    assert(got.toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4", 4), (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "one two three", 3)), s"got ${got.toSeq}")
    // stride == chunk → disjoint cover, token counts sum to doc length
    val disjoint = TextFunctions.chunkByTokens(docs, "text", "doc_id", 3, 3)
      .groupBy("doc_id").agg(sum("n_tokens").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(disjoint == Map(1L -> 10L, 2L -> 3L))
  }

  test("ngrams keeps duplicates; shingles is its distinct form") {
    val got = Seq("a b a b").toDF("t")
      .select(TextFunctions.ngrams(col("t"), 2).as("g"),
        TextFunctions.shingles(col("t"), 2).as("s")).head()
    assert(got.getSeq[String](0) == Seq("a_b", "b_a", "a_b"))
    assert(got.getSeq[String](1) == Seq("a_b", "b_a"))
  }

  test("repetitionStruct: dup fraction and longest same-token run") {
    val r = Seq("a a a b b c").toDF("t")
      .select(TextFunctions.repetitionStruct(col("t")).as("r"))
      .select("r.*").head()
    assert(r.getLong(0) == 6L)      // n_tokens
    assert(r.getLong(1) == 3L)      // n_distinct
    assert(r.getDouble(2) == 0.5)   // dup_token_frac
    assert(r.getLong(3) == 3L)      // max_token_run
  }

  test("repetitionReport: top bigram with count-then-gram tie-break") {
    val df = Seq(
      (1L, "a a a b b c"),   // top bigram a_a ×2 of 5
      (2L, "a b c d"),       // all bigrams unique → tie → lexicographically largest: c_d
      (3L, "hello")          // no bigram
    ).toDF("doc_id", "text")
    val got = TextQuality.repetitionReport(df, "text", "doc_id", n = 2)
      .orderBy("doc_id").collect()
    assert(got(0).getString(5) == "a_a" && got(0).getLong(6) == 2L &&
      math.abs(got(0).getDouble(7) - 0.4) < 1e-12)
    assert(got(1).getString(5) == "c_d" && got(1).getLong(6) == 1L)
    assert(got(2).isNullAt(5) && got(2).getLong(6) == 0L &&
      got(2).getDouble(7) == 0.0 && got(2).getLong(4) == 1L)
  }

  test("bigramLmScore: hand-computed smoothed probabilities, OOV, unscorable") {
    val ref = Seq((100L, "a b a b")).toDF("doc_id", "text")
    // model: c12 = {a b: 2, b a: 1}; heads = {a: 2, b: 1}; V = {a, b} = 2
    val target = Seq(
      (1L, "a b c"),   // lp(a b)=ln(3/4); lp(b c)=ln((0+1)/(1+2))
      (2L, "z z"),     // OOV head: ln((0+1)/(0+2))
      (3L, "solo"),    // < 2 tokens → unscorable
      (4L, "")         // empty → unscorable
    ).toDF("doc_id", "text")
    val got = TextQuality.bigramLmScore(target, ref, "text", "doc_id")
      .orderBy("doc_id").collect()
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val exp1 = ((r9(math.log(3.0 / 4.0)) + r9(math.log(1.0 / 3.0))) / 2).toDouble
    assert(got(0).getLong(1) == 2L && math.abs(got(0).getDouble(2) - exp1) < 1e-12,
      s"doc 1: ${got(0)}")
    assert(got(1).getLong(1) == 1L &&
      math.abs(got(1).getDouble(2) - r9(math.log(0.5)).toDouble) < 1e-12,
      s"doc 2: ${got(1)}")
    assert(got(2).getLong(1) == 0L && got(2).isNullAt(2), s"doc 3: ${got(2)}")
    assert(got(3).getLong(1) == 0L && got(3).isNullAt(2), s"doc 4: ${got(3)}")
    // reference-like text outscores OOV gibberish
    assert(got(0).getDouble(2) < r9(math.log(3.0 / 4.0)).toDouble &&
      TextQuality.bigramLmScore(
        Seq((9L, "a b a b")).toDF("doc_id", "text"), ref, "text", "doc_id")
        .head().getDouble(2) > got(1).getDouble(2))
  }

  test("temperatureShares: sums to 1, upweights low-resource strata") {
    import graft.operators.TextQuality
    val rows = Seq(("big", 10000L), ("small", 100L)).toDF("lang", "n")
    val got = TextQuality.temperatureShares(rows, "lang", col("n"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-8, got.toString)
    // raw proportion of 'small' is 100/10100 ≈ 0.0099; sqrt-scaling
    // lifts it to 10/110 ≈ 0.0909
    assert(math.abs(got("small") - 10.0 / 110.0) < 1e-9, got.toString)
    assert(got("small") > 100.0 / 10100.0 * 5)
  }

  test("quantileGate: discrete per-group median, singleton groups, ties") {
    import graft.operators.TextQuality
    val rows = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "a", 40L),
      (9L, "b", 5L),                       // singleton survives any p
      (11L, "c", 5L), (12L, "c", 5L), (13L, "c", 1L)) // tied median value
      .toDF("doc_id", "lang", "n_chars")
    val kept = TextQuality.quantileGate(rows, "lang", col("n_chars"),
        p = 0.5, tieBreak = col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    // a: rank ceil(2)=2 → thr 20 → keep {2,3,4}; b: thr 5 → keep {9};
    // c: rank ceil(1.5)=2 of (1,5,5) → thr 5 → keep both fives
    assert(kept == Set(2L, 3L, 4L, 9L, 11L, 12L))
  }

  test("q_entropy: hand-computed Shannon entropy, degenerate docs at 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ent")
    Seq((1L, "a a b", "en", "s", 5L), (2L, "x x x x", "en", "s", 7L),
        (3L, "w", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_entropy")(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    // H(a a b) = ln3 − (round9(2ln2) + 0)/3
    val expected = r9(math.log(3.0) -
      r9(2.0 * math.log(2.0)).toDouble / 3.0).toDouble
    assert(got(1L) == ((3L, expected)), s"got ${got(1L)}")
    // single repeated token and single-token docs: zero entropy exactly
    assert(got(2L) == ((4L, 0.0)) && got(3L) == ((1L, 0.0)))
  }

  test("extractAnswer: matched-empty vs no-match vs null (the reference's strip/N-A split)") {
    // the oracle corpus always carries non-empty sections, so the
    // matched-but-EMPTY capture (re.search hits, group(1).strip() == "")
    // is pinned here: it must yield "", never the no-match "N/A"
    import graft.functions.TextFunctions.{extractAnswer, finalPattern}
    val rows = Seq(
      (1L, Some("<|start|>assistant<|channel|>final<|message|> ans \nhere <|return|>")),
      (2L, Some("<|start|>assistant<|channel|>final<|message|> \n <|return|>")),
      (3L, Some("no markers at all")),
      (4L, Option.empty[String]))
      .toDF("id", "raw")
    val got = rows.select(col("id"), extractAnswer(col("raw"), finalPattern).as("a"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "ans \nhere", got(1L))   // DOTALL spans lines; ends trimmed
    assert(got(2L) == "", got(2L))             // matched-empty ≠ N/A
    assert(got(3L) == "N/A" && got(4L) == "N/A")
  }
}
