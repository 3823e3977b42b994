package graft

import graft.plans.PackedPairs
import org.apache.spark.sql.functions._

/** Native PackedPairs expression: exact equality with the composed
  * flatten/transform/slice form it replaced in the exact-Jaccard
  * postings pipeline, codegen vs interpreted parity, degenerate and
  * null semantics.
  */
class PackedPairsSpec extends SparkSpec {
  import spark.implicits._

  private val composed = expr(
    "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), " +
      "y -> shiftleft(x, 32) | y)))")

  private lazy val lists = Seq(
    (1L, Seq(3L, 7L, 11L, 200L)),
    (2L, Seq(1L, 2L)),
    (3L, Seq(42L)),          // singleton: no pairs
    (4L, Seq.empty[Long]),   // empty: no pairs
    (5L, (1L to 40L).toSeq)  // a fat list: 780 pairs
  ).toDF("id", "ds")

  test("native packed pairs equal the composed flatten/transform form") {
    val both = lists.select(col("id"),
      PackedPairs.pairs(col("ds")).as("native"), composed.as("hof")).collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    assert(both.find(_.getLong(0) == 5L).get.getSeq[Long](1).size == 40 * 39 / 2)
  }

  test("codegen and interpreted eval agree") {
    val expr0 = PackedPairs.pairs(col("ds")).as("p")
    val wholestage = lists.select(col("id"), expr0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = lists.select(col("id"), expr0).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(wholestage == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("oversized posting list fails loudly at the MaxList guard, not the encoder") {
    // MaxList (22992) is the largest m whose m(m-1)/2 pair array fits
    // UnsafeArrayData.fromPrimitiveArray INCLUDING its null-bitmap
    // header; one past it must hit the guard's actionable message, not
    // an Int-overflow NegativeArraySizeException (m*(m-1)/2 in int goes
    // negative past m = 46341) or an opaque encoder error.
    val big = spark.range(1).select(
      sequence(lit(1L), lit(PackedPairs.maxListSize + 1L)).as("ds"))
    val ex = intercept[Exception] {
      big.select(PackedPairs.pairs(col("ds"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(ex).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("maxPostings")), s"got: $ex")
  }

  test("null list and null element yield NULL; wrong type rejected") {
    val odd = Seq((1L, Option(Seq[java.lang.Long](1L, null, 3L))),
      (2L, Option.empty[Seq[java.lang.Long]])).toDF("id", "ds")
    val out = odd.select(col("id"), PackedPairs.pairs(col("ds")).as("p"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Seq("a"))).toDF("id", "ds")
        .select(PackedPairs.pairs(col("ds"))).collect()
    }
  }

  test("pair values round-trip through the unpack the pipeline uses") {
    val got = Seq((1L, Seq(5L, 9L))).toDF("id", "ds")
      .select(explode(PackedPairs.pairs(col("ds"))).as("pk"))
      .select(shiftright(col("pk"), 32).as("doc_a"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((5L, 9L)))
  }
}
