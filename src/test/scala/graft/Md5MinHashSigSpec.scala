package graft

import graft.plans.Md5MinHashSig
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Native md5-family k-minima signature: exact equality with the
  * explode → conv(substring(md5)) → groupBy(min×k) composition it
  * replaced in the portable LSH pipeline, codegen vs interpreted
  * parity, and degenerate semantics.
  */
class Md5MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16

  /** The previous composed formulation, verbatim (per-doc, via explode
    * + groupBy min over a + i*b from the md5 hex halves).
    */
  private def composed(df: org.apache.spark.sql.DataFrame) = {
    val hex = md5(col("s"))
    val sh = df.select(col("doc"), explode(col("set")).as("s"))
      .select(col("doc"),
        conv(substring(hex, 1, 12), 16, 10).cast("long").as("a"),
        conv(substring(hex, 13, 12), 16, 10).cast("long").as("b"))
    val minCols = (0 until K).map(i =>
      min(col("a") + lit(i.toLong) * col("b")).as(s"_h$i"))
    sh.groupBy("doc").agg(minCols.head, minCols.tail: _*)
      .select(col("doc"), array((0 until K).map(i => col(s"_h$i")): _*).as("sig"))
  }

  test("native signature equals the composed conv/substring/min form") {
    val word = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val set = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, word).map(_.distinct))
    val sets = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, set))
    val prop = Prop.forAll(sets) { ss =>
      val df = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc", "set")
      val native = df.select(col("doc"), Md5MinHashSig.sig(col("set"), K).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val old = composed(df)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      native == old
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
    // unicode shingles hash via UTF-8 bytes, same as Spark's md5()
    val uni = Seq((1L, Seq("héllo wörld", "日本語 テスト", "a_b_c"))).toDF("doc", "set")
    assert(uni.select(Md5MinHashSig.sig(col("set"), K)).head.getSeq[Long](0) ==
      composed(uni).head.getSeq[Long](1))
  }

  test("codegen and interpreted eval agree") {
    val df = Seq((1L, Seq("x_y_z", "y_z_w")), (2L, Seq("solo"))).toDF("doc", "set")
    val expr0 = Md5MinHashSig.sig(col("set"), K).as("sig")
    val wholestage = df.select(col("doc"), expr0).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(col("doc"), expr0).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(wholestage == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("degenerate inputs: null array -> null, all-null elements -> null, null elements skipped, bad k/type rejected") {
    val odd = Seq(
      (1L, Option(Seq[String](null, "a", null))), // null elements skipped
      (2L, Option(Seq[String](null, null))),      // nothing contributes -> null
      (3L, Option.empty[Seq[String]])             // null array -> null
    ).toDF("doc", "set")
    val out = odd.select(col("doc"), Md5MinHashSig.sig(col("set"), K).as("sig"))
      .orderBy("doc").collect()
    assert(out(0).getSeq[Long](1) ==
      Seq((1L, Seq("a"))).toDF("doc", "set")
        .select(Md5MinHashSig.sig(col("set"), K)).head.getSeq[Long](0))
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
    intercept[IllegalArgumentException] {
      Md5MinHashSig.sig(col("set"), 17) // family overflow bound
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((1L, Seq(2L))).toDF("doc", "set")
        .select(Md5MinHashSig.sig(col("set"), K)).collect()
    }
  }
}
