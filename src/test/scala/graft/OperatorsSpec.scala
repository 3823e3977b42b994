package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator family semantics (SURVEY.md §2.6-2.8, §2.10). */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dup = Seq(
    (1, "x", 10), (1, "x", 10), (1, "y", 5), (2, "z", 1)
  ).toDF("k", "s", "v")

  test("Dedup: duplicatesAll keeps every member of dup groups (D3)") {
    assert(Dedup.duplicatesAll(dup, Seq("k")).count() == 3)
  }

  test("Dedup: duplicatesAfterFirst returns only repeats (D2)") {
    val got = Dedup.duplicatesAfterFirst(dup, Seq("k"), Seq(col("s"), col("v")))
    assert(got.count() == 2)
  }

  test("Dedup: dedupKeepFirst is deterministic under explicit order (D5)") {
    val got = Dedup.dedupKeepFirst(dup, Seq("k"), Seq(col("v").desc, col("s")))
      .orderBy("k").collect()
    assert(got.map(_.getInt(2)).toSeq == Seq(10, 1))
  }

  test("Dedup: dedupPrefer keeps preferred row in dup group (D6)") {
    val got = Dedup.dedupPrefer(dup, Seq("k"), col("s") === "y", Seq(col("s"), col("v")))
      .orderBy("k").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("y", "z"))
  }

  test("Dedup: duplicateMetric counts removable rows (D8)") {
    assert(Dedup.duplicateMetric(dup, Seq("k")).head().getLong(0) == 2L)
  }

  test("Joins: outerWithIndicator both/left_only/right_only (J2)") {
    val l = Seq((1, "a"), (2, "b")).toDF("lk", "lv")
    val r = Seq((2, "B"), (3, "C")).toDF("rk", "rv")
    val got = Joins.outerWithIndicator(l, r, "lk", "rk")
      .orderBy(coalesce(col("lk"), col("rk")))
      .select("_merge").collect().map(_.getString(0))
    assert(got.toSeq == Seq("left_only", "both", "right_only"))
  }

  test("Joins: containment first-hit-wins picks lowest pick-order (J6)") {
    val left = Seq((1, "code ABC123 here"), (2, "nothing")).toDF("id", "hay")
    val right = Seq((10, "ABC123"), (5, "ABC123"), (7, "ZZZ")).toDF("rid", "needle")
    val got = Joins.containmentJoin(left, right, col("hay"), col("needle"),
      Seq("id"), Seq(col("rid").asc_nulls_last))
      .orderBy("id").collect()
    assert(got(0).getInt(2) == 5)       // lowest rid wins
    assert(got(1).isNullAt(2))          // unmatched row kept (left join)
  }

  test("Joins: containment refuses an unbounded needle side (J6 guard)") {
    // the r16 SF-curve lesson: BroadcastNestedLoopJoin is |L|×|R|
    // contains() tests, so a needle side that grows with the corpus is
    // a silent quadratic — the guard makes it loud at any call site
    val left = Seq((1, "code ABC123 here")).toDF("id", "hay")
    val right = (1 to 20).map(i => (i, s"N$i")).toDF("rid", "needle")
    val e = intercept[IllegalArgumentException] {
      Joins.containmentJoin(left, right, col("hay"), col("needle"),
        Seq("id"), Seq(col("rid").asc_nulls_last), maxRight = 10)
    }
    assert(e.getMessage.contains("needle side has > 10 rows"))
    // at/below the cap nothing changes
    assert(Joins.containmentJoin(left, right, col("hay"), col("needle"),
      Seq("id"), Seq(col("rid").asc_nulls_last), maxRight = 20).count() == 1)
  }

  test("Joins: unionOnCommon keeps shared columns in left order (J8)") {
    val a = Seq((1, "x", 9.0)).toDF("id", "s", "v")
    val b = Seq((2, 8.0, "y")).toDF("id", "v", "s")
    val got = Joins.unionOnCommon(a, b)
    assert(got.columns.toSeq == Seq("id", "s", "v"))
    assert(got.count() == 2)
  }

  test("Aggs: dynamic pivot discovers values (A10)") {
    val df = Seq(("g1", "a", 1.0), ("g1", "b", 2.0), ("g2", "a", 3.0)).toDF("g", "p", "v")
    val got = Aggs.dynamicPivot(df, "g", "p", col("v")).orderBy("g").collect()
    assert(got(0).getDouble(1) == 1.0 && got(0).getDouble(2) == 2.0)
    assert(got(1).getDouble(1) == 3.0 && got(1).isNullAt(2))
  }

  test("Aggs: summaryTable unpivots metrics (A11)") {
    val df = Seq(1, 2, 3).toDF("v")
    val got = Aggs.summaryTable(df, Seq(
      "n" -> count(lit(1)), "total" -> sum(col("v")))).orderBy("metric").collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("n", 3.0), ("total", 6.0)))
  }

  test("SchemaOps: guard raises on drift (V1), alignTo adds typed nulls (V2)") {
    val df = Seq((1, "a")).toDF("id", "s")
    val target = StructType(Seq(
      StructField("id", IntegerType), StructField("s", StringType),
      StructField("extra", DoubleType)))
    intercept[SchemaOps.SchemaDriftException] { SchemaOps.guard(df, target) }
    val aligned = SchemaOps.alignTo(df, target)
    assert(aligned.columns.toSeq == Seq("id", "s", "extra"))
    assert(aligned.head().isNullAt(2))
    assert(SchemaOps.guard(aligned, target).count() == 1)
  }

  test("rangeJoin: containment exact at cell boundaries, negatives, vs naive join") {
    val pts = Seq((1L, -35L), (2L, -32L), (3L, 0L), (4L, 31L), (5L, 32L), (6L, 100L))
      .toDF("pid", "v")
    val ivs = Seq((10L, -40L, -30L), (11L, -1L, 33L), (12L, 31L, 32L))
      .toDF("iid", "lo", "hi")
    val got = graft.operators.Joins.rangeJoin(pts, ivs, "v", "lo", "hi", grid = 16)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive reference
    val expect = (for {
      p <- Seq((1L, -35L), (2L, -32L), (3L, 0L), (4L, 31L), (5L, 32L), (6L, 100L))
      i <- Seq((10L, -40L, -30L), (11L, -1L, 33L), (12L, 31L, 32L))
      if p._2 >= i._2 && p._2 <= i._3
    } yield (p._1, i._1)).toSet
    assert(got == expect, s"got $got expect $expect")
  }

  test("intervalOverlapJoin: multi-cell pairs dedup, touching endpoints overlap") {
    val a = Seq((1L, 0L, 100L), (2L, 200L, 210L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 50L, 60L), (11L, 100L, 120L), (12L, 211L, 300L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = graft.operators.Joins.intervalOverlapJoin(
        a, b, "a_id", "a_lo", "a_hi", "b_id", "b_lo", "b_hi", grid = 16)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,10) spans several shared cells → exactly one row; (1,11) touch
    // at 100 → overlap; (2,12) adjacent but disjoint → no row
    assert(got == Set((1L, 10L), (1L, 11L)), s"got $got")
  }

  test("outlierReport: planted anomaly flagged, tight/tiny/constant groups silent") {
    import spark.implicits._
    // group "a": 100 values in [0, 99] plus one planted 10000 — only the
    // plant exceeds 3σ. "b": constant (zero variance). "c": single row.
    val rows = (0 until 100).map(i => ("a", i.toDouble)) ++
      Seq(("a", 10000.0)) ++ (0 until 5).map(_ => ("b", 7.0)) ++ Seq(("c", 1.0))
    val got = SchemaOps.outlierReport(rows.toDF("g", "v"), "g", "v", 3.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(got == List(("a", 1L, 10000.0)), s"got $got")
    // without the plant, the uniform group is quiet at 3σ (max z ≈ 1.7)
    val clean = SchemaOps.outlierReport(
      (0 until 100).map(i => ("a", i.toDouble)).toDF("g", "v"), "g", "v", 3.0)
    assert(clean.isEmpty)
  }

  test("kAnonymize: small cells fully suppressed, summary counts them") {
    val rows = (1 to 25).map(i => (i.toLong, "en", "web")) ++
      Seq((100L, "en", "rare"), (101L, "en", "rare")) ++  // cell of 2
      Seq((200L, "fr", "web"))                            // cell of 1
    val (kept, sup) = SchemaOps.kAnonymize(
      rows.toDF("id", "lang", "src"), Seq("lang", "src"), k = 3L)
    assert(kept.count() == 25 &&
      kept.select("src").distinct().collect().map(_.getString(0)).toSeq == Seq("web"))
    val s = sup.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(s == Set(("en", "rare", 2L), ("fr", "web", 1L)))
    // no suppressed row id leaks through the kept side
    assert(kept.filter(col("id") >= 100L).isEmpty)
  }

  test("scd2FromChanges: chained intervals, one current, ties versioned by id") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val changes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-02-01 00:00:00"), 11L),
      (1L, ts("2024-02-01 00:00:00"), 12L), // simultaneous: id breaks tie
      (2L, ts("2024-03-01 00:00:00"), 20L))
      .toDF("user_id", "ts", "event_id")
    val got = SchemaOps.scd2FromChanges(changes, "user_id", "ts", col("event_id"))
      .orderBy("user_id", "version")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Int]("version"), r.getAs[java.sql.Timestamp]("effective_to"),
        r.getAs[Boolean]("is_current")))
    assert(got.map(t => (t._1, t._2, t._3, t._5)).toSeq == Seq(
      (1L, 10L, 1, false), (1L, 11L, 2, false), (1L, 12L, 3, true),
      (2L, 20L, 1, true)))
    // intervals chain: each non-current row's effective_to equals the
    // next version's effective_from
    assert(got(0)._4 == ts("2024-02-01 00:00:00") &&
      got(1)._4 == ts("2024-02-01 00:00:00") && got(2)._4 == null)
  }

}
