package graft

import graft.plans.SigAgree
import org.apache.spark.sql.functions._

/** Native SigAgree expression: exact equality with the composed
  * size/filter/zip_with form it replaced in every MinHash pair
  * verify, codegen vs interpreted parity, null/length-mismatch
  * semantics.
  */
class SigAgreeSpec extends SparkSpec {
  import spark.implicits._

  private def zipForm(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    size(filter(zip_with(a, b, (x, y) => x === y), p => p))

  private def pseudo(i: Int, d: Int): Long =
    scala.util.hashing.MurmurHash3.productHash((i, d)).toLong % 4

  private lazy val sigs = (1 to 60).map { i =>
    // small value range forces plenty of agreeing positions
    (i.toLong, Array.tabulate(32)(d => pseudo(i, d)), Array.tabulate(32)(d => pseudo(i + 7, d)))
  }.toDF("id", "a", "b")

  test("native agreement count equals the size/filter/zip_with form") {
    val both = sigs.select(col("id"),
      SigAgree.agree(col("a"), col("b")).as("native"),
      zipForm(col("a"), col("b")).as("zip")).collect()
    both.foreach(r => assert(r.getInt(1) == r.getInt(2), r.toString))
    // sanity: the pseudo stream produces nontrivial agreement somewhere
    assert(both.exists(_.getInt(1) > 0) && both.exists(r => r.getInt(1) < 32))
  }

  test("codegen and interpreted eval agree") {
    val expr = SigAgree.agree(col("a"), col("b")).as("c")
    val wholestage = sigs.select(col("id"), expr).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = sigs.select(col("id"), expr).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(wholestage == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("length mismatch counts the common prefix only; null arrays and elements match the zip form") {
    val odd = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 9L)),     // prefix: 1 agree
      (2L, Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, null)),     // null elems never agree
      (3L, Seq[java.lang.Long](), Seq[java.lang.Long](1L))                    // empty → 0
    ).toDF("id", "a", "b")
    val out = odd.select(col("id"),
      SigAgree.agree(col("a"), col("b")).as("native"),
      zipForm(col("a"), col("b")).as("zip")).orderBy("id").collect()
    out.foreach(r => assert(r.getInt(1) == r.getInt(2), r.toString))
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 1, 0))
    val nullIn = Seq((1L, Option.empty[Seq[Long]], Option(Seq(1L, 2L)))).toDF("id", "a", "b")
    val r = nullIn.select(SigAgree.agree(col("a"), col("b"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("type mismatch rejected at analysis") {
    val bad = Seq((1L, Seq(1.0), Seq(1L))).toDF("id", "a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(SigAgree.agree(col("a"), col("b"))).collect()
    }
  }
}
