package graft

import graft.operators.Aggs
import org.apache.spark.sql.functions._

/** Distributed rank-select exact percentiles: must agree bit-exactly with
  * Spark's buffering `percentile` aggregate on every shape that matters —
  * interpolated ranks, exact-hit ranks, p=0/1 extremes, single-value
  * groups, ties, and nulls.
  */
class RankSelectSpec extends SparkSpec {
  import spark.implicits._

  private def viaBuffer(df: org.apache.spark.sql.DataFrame, ps: Seq[(Double, String)]) =
    df.groupBy("g").agg(
      expr(s"percentile(v, ${ps.head._1})").as(ps.head._2),
      ps.tail.map { case (p, a) => expr(s"percentile(v, $p)").as(a) }: _*)

  private def assertSame(df: org.apache.spark.sql.DataFrame, ps: Seq[(Double, String)]): Unit = {
    val got = Aggs.rankSelectPercentiles(df, "g", col("v"), ps)
      .orderBy("g").collect()
    val want = viaBuffer(df, ps).orderBy("g").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (a, b) =>
      assert(a.get(0) == b.get(0))
      ps.indices.foreach { i =>
        assert(a.getDouble(i + 1) == b.getDouble(i + 1),
          s"group ${a.get(0)} percentile ${ps(i)._1}: got ${a.getDouble(i + 1)} want ${b.getDouble(i + 1)}")
      }
    }
  }

  test("matches buffering percentile on multi-group data with ties") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0),
      ("c", 42.0)
    ).toDF("g", "v").repartition(7)
    assertSame(df, Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90", 1.0 -> "p100"))
  }

  test("ignores null values; all-null group absent") {
    val df = Seq(
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("d", None)
    ).toDF("g", "v").repartition(5)
    val got = Aggs.rankSelectPercentiles(df, "g", col("v"), Seq(0.5 -> "med"))
      .orderBy("g").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("a"))
    assert(got(0).getDouble(1) == 2.0)
  }

  test("group values spanning many partitions stay globally ranked") {
    // 2000 values per group across 32 partitions — ranks must be global,
    // not per-partition
    val df = (1 to 2000).flatMap(i => Seq(("x", i.toDouble), ("y", (2001 - i).toDouble)))
      .toDF("g", "v").repartition(32)
    assertSame(df, Seq(0.5 -> "p50", 0.95 -> "p95"))
  }

  test("empty input yields empty output") {
    val df = Seq.empty[(String, Double)].toDF("g", "v")
    val got = Aggs.rankSelectPercentiles(df, "g", col("v"), Seq(0.5 -> "med"))
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("g", "med"))
  }

  test("numeric group column keeps its type") {
    val df = Seq((1L, 10.0), (1L, 20.0), (2L, 7.0)).toDF("g", "v")
    val got = Aggs.rankSelectPercentiles(df, "g", col("v"), Seq(0.5 -> "med"))
    assert(got.schema("g").dataType == org.apache.spark.sql.types.LongType)
    val m = got.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m == Map(1L -> 15.0, 2L -> 7.0))
  }

  test("histogramPercentiles ≡ rankSelectPercentiles ≡ percentile() on low-cardinality values") {
    import graft.operators.Aggs
    // skewed counts, interpolation between distinct values, negative
    // values, a single-value group, nulls
    // NaN is deliberately absent: NaN ordering differs across
    // sort_array / percentile() / rank-select and is pinned by its own
    // test below, with NaN-aware comparison (== is false for NaN).
    val rows = Seq.tabulate(500) { i =>
      (i % 3).toLong -> (i % 7).toDouble
    } ++ Seq(9L -> -5.0, 9L -> -5.0)
    val df = rows.toDF("g", "v")
      .unionByName(Seq((1L, Option.empty[Double])).toDF("g", "v"))
    val ps = Seq(0.5 -> "p50", 0.95 -> "p95", 0.0 -> "mn", 1.0 -> "mx")
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) ->
        (1 to 4).map(i => r.getDouble(i)).toSeq).toMap
    val hist = asMap(Aggs.histogramPercentiles(df, "g", col("v"), ps))
    val rank = asMap(Aggs.rankSelectPercentiles(df, "g", col("v"), ps))
    assert(hist == rank, s"hist=$hist rank=$rank")
    val builtin = asMap(df.filter(col("v").isNotNull).groupBy("g")
      .agg(expr("percentile(v, 0.5)"), expr("percentile(v, 0.95)"),
        expr("percentile(v, 0.0)"), expr("percentile(v, 1.0)")))
    assert(hist == builtin, s"hist=$hist builtin=$builtin")
  }

  test("NaN pins: all three paths sort NaN greatest and propagate it through interpolation") {
    // Spark's double ordering places NaN above +Inf, and groupBy/sort
    // normalize NaN to a single key — so with values [1, 2, NaN]:
    // p50 → 2.0 (rank 1), p100 → NaN, and p75 (rank 1.5, interpolating
    // 2.0 with NaN) → NaN via IEEE arithmetic. Pinned across the
    // histogram, rank-select, and buffering percentile() paths with
    // NaN-aware comparison (== is false for NaN).
    val df = Seq((1L, 1.0), (1L, 2.0), (1L, Double.NaN)).toDF("g", "v")
      .repartition(3)
    val ps = Seq(0.5 -> "p50", 0.75 -> "p75", 1.0 -> "mx")
    def vals(d: org.apache.spark.sql.DataFrame): Seq[Double] =
      d.orderBy("g").collect().map(r => (1 to 3).map(i => r.getDouble(i))).head
    def same(a: Seq[Double], b: Seq[Double]): Boolean =
      a.length == b.length &&
        a.zip(b).forall { case (x, y) => java.lang.Double.compare(x, y) == 0 }
    val expected = Seq(2.0, Double.NaN, Double.NaN)
    val hist = vals(Aggs.histogramPercentiles(df, "g", col("v"), ps))
    val rank = vals(Aggs.rankSelectPercentiles(df, "g", col("v"), ps))
    val builtin = vals(df.groupBy("g").agg(expr("percentile(v, 0.5)"),
      expr("percentile(v, 0.75)"), expr("percentile(v, 1.0)")))
    assert(same(hist, expected), s"hist=$hist")
    assert(same(rank, expected), s"rank=$rank")
    assert(same(builtin, expected), s"builtin=$builtin")
  }

  test("histogramPercentiles fails fast on high-cardinality values") {
    import graft.operators.Aggs
    val many = spark.range(0, 5000L).selectExpr("id % 3 as g", "CAST(id AS DOUBLE) as v")
    val ex = intercept[IllegalArgumentException] {
      Aggs.histogramPercentiles(many, "g", col("v"),
        Seq(0.5 -> "p50"), maxDistinct = 1000L)
    }
    assert(ex.getMessage.contains("rankSelectPercentiles"), ex.getMessage)
    // the documented regime still works under the same cap
    val few = spark.range(0, 5000L).selectExpr("id % 3 as g", "CAST(id % 40 AS DOUBLE) as v")
    val out = Aggs.histogramPercentiles(few, "g", col("v"),
      Seq(0.5 -> "p50"), maxDistinct = 1000L)
    assert(out.count() == 3)
  }

  test("spearmanRank: agreement 1, reversal -1, shuffled vs reference, nulls drop, empty") {
    // sum_d2 is emitted as DOUBLE (exact to 2^53 — the decimal
    // accumulator is internal): a DECIMAL(38,9) output column reads
    // back as Decimal OBJECTS from Spark parquet but float64 from
    // DuckDB, splitting the driver's dtype-sensitive hash gate
    def rho(rows: Seq[(Long, java.lang.Double, java.lang.Double)]): (Long, Double, Option[Double]) = {
      val r = Aggs.spearmanRank(rows.toDF("id", "a", "b"), "id", "a", "b")
        .collect().head
      (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    val mono = (1L to 20L).map(i => (i, Double.box(i.toDouble), Double.box(i * 2.0 + 1)))
    assert(rho(mono) == ((20L, 0.0, Some(1.0))))
    val rev = (1L to 20L).map(i => (i, Double.box(i.toDouble), Double.box(-i.toDouble)))
    val (n, s, Some(r)) = rho(rev)
    // perfect reversal: sum_d2 = n(n^2-1)/3, rho exactly -1
    assert(n == 20L && s == (20L * 399 / 3).toDouble && r == -1.0)
    // arbitrary permutation vs a driver-side reference replay
    val rnd = new scala.util.Random(11)
    val perm = rnd.shuffle((1L to 50L).toVector)
    val rows = (1L to 50L).map(i =>
      (i, Double.box(i.toDouble), Double.box(perm((i - 1).toInt).toDouble)))
    val want = {
      val d2 = (1L to 50L).map(i => { val d = i - perm((i - 1).toInt); d * d }).sum
      1.0 - 6.0 * d2 / (50.0 * (50.0 * 50.0 - 1.0))
    }
    assert(rho(rows)._3.contains(want))
    // null on either side drops the ROW (both rank passes see the same set)
    val withNulls = mono ++ Seq((100L, null.asInstanceOf[java.lang.Double], Double.box(1.0)),
      (101L, Double.box(1.0), null.asInstanceOf[java.lang.Double]))
    assert(rho(withNulls) == ((20L, 0.0, Some(1.0))))
    // empty and single-row: n <= 1 has no defined rho
    assert(rho(Seq.empty) == ((0L, 0.0, None)))
    assert(rho(Seq((1L, Double.box(1.0), Double.box(2.0)))) == ((1L, 0.0, None)))
  }

  test("sum_d2 2^53 contract: exact below the bound, correctly rounded above") {
    // The documented cross-engine contract (Aggs.spearmanRank scaladoc):
    // the emitted DOUBLE sum_d2 is bit-exact while the exact integer
    // fits 2^53, and correct to 1 ulp (one round-to-nearest
    // decimal->double cast) beyond — where ANOTHER engine's
    // decimal->double path may double-round, so hash gates on sum_d2
    // are only guaranteed flake-free inside the bound. The
    // anti-correlated worst case (b = -a) maximizes
    // sum_d2 = n(n^2-1)/3, letting a few hundred thousand rows cross
    // the bound that a correlated corpus would need billions for.
    import org.apache.spark.sql.functions.{col, lit}
    def run(n: Long): (Long, Double, Double) = {
      val df = spark.range(n).select(col("id"),
        col("id").cast("double").as("a"),
        (lit(0L) - col("id")).cast("double").as("b"))
      val r = Aggs.spearmanRank(df, "id", "a", "b").head()
      (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }
    def exactSumD2(n: Long): BigInt = // n(n^2-1)/3 for a perfect reversal
      BigInt(n) * (BigInt(n) * BigInt(n) - 1) / 3
    val bound = BigInt(2).pow(53)

    // n = 300k: exact sum_d2 = 8.99...e15 sits just BELOW 2^53 -> the
    // double must equal the integer exactly (every |int| <= 2^53 is
    // representable)
    val nLo = 300000L
    assert(exactSumD2(nLo) < bound, "fixture drifted: expected sub-2^53")
    val (gotNLo, gotSumLo, gotRhoLo) = run(nLo)
    assert(gotNLo == nLo)
    assert(BigDecimal(gotSumLo).toBigIntExact.contains(exactSumD2(nLo)),
      s"below 2^53 sum_d2 must be bit-exact: got $gotSumLo")
    assert(math.abs(gotRhoLo - (-1.0)) < 1e-12)

    // n = 320k: exact sum_d2 = 1.09e16 crosses 2^53 -> the double is the
    // correctly-rounded (round-to-nearest) cast of the exact integer,
    // which BigInt.toDouble also produces
    val nHi = 320000L
    assert(exactSumD2(nHi) > bound, "fixture drifted: expected super-2^53")
    val (gotNHi, gotSumHi, gotRhoHi) = run(nHi)
    assert(gotNHi == nHi)
    assert(gotSumHi == exactSumD2(nHi).toDouble,
      s"above 2^53 sum_d2 must be the round-to-nearest cast: got $gotSumHi " +
        s"expected ${exactSumD2(nHi).toDouble}")
    assert(math.abs(gotRhoHi - (-1.0)) < 1e-12)
  }

  test("topKByRank + ntileOf reproduce the naive full-group windows exactly") {
    import org.apache.spark.sql.expressions.Window
    // heavy ties across salts: prices drawn from a tiny value set so
    // rank/dense_rank tie groups straddle salt boundaries, group sizes
    // chosen to hit n % 4 = 0,1,2,3 AND an n < buckets group (q = 0)
    val rows = Seq.tabulate(641) { i =>
      val g = if (i < 3) "tiny" else s"g${i % 3}"
      (i.toLong, g, (i * 7 % 11).toDouble)
    }
    val df = rows.toDF("id", "g", "price")
    val byPrice = Window.partitionBy("g").orderBy(col("price").desc)
    val stable = Window.partitionBy("g").orderBy(col("price").desc, col("id"))
    val naive = df.select(col("id"), col("g"), col("price"),
        rank().over(byPrice).as("rnk"),
        dense_rank().over(byPrice).as("drnk"),
        ntile(4).over(stable).as("quartile"))
      .filter(col("rnk") <= 20)
    val sizes = df.groupBy("g").agg(count(lit(1)).as("_n"))
    val top = Aggs.topKByRank(df, Seq("g"), Seq(col("price").desc),
        k = 20, saltBy = xxhash64(col("id")), salts = 8)
      .withColumn("drnk", dense_rank().over(byPrice))
      .withColumn("_rn", row_number().over(stable))
      .join(broadcast(sizes), Seq("g"))
      .select(col("id"), col("g"), col("price"), col("rnk"), col("drnk"),
        Aggs.ntileOf(col("_rn"), col("_n"), 4).as("quartile"))
    val a = naive.orderBy("g", "rnk", "id").collect().toSeq
    val b = top.orderBy("g", "rnk", "id").collect().toSeq
    assert(a == b, s"salted top-k diverged from the naive window:\n" +
      s"naive ${a.take(5)}...\nsalted ${b.take(5)}...")
    // the tiny group (3 rows < 4 buckets) exercised the q = 0 branch
    assert(a.exists(_.getString(1) == "tiny"))
  }

  test("ntileOf matches the ntile window on every (n, rn) up to 40") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 40).flatMap(n => (1 to n).map(rn => (n, rn.toLong)))
      .toDF("g", "rn")
    val got = df.select(col("g"), col("rn"),
        Aggs.ntileOf(col("rn"), col("g").cast("long"), 4).as("t"))
    val want = df.select(col("g"), col("rn"),
        ntile(4).over(Window.partitionBy("g").orderBy("rn")).as("t"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "ntileOf arithmetic diverged from the ntile window")
  }
}
