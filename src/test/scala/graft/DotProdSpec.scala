package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Native DotProd expression: bit-equality with the composed
  * zip_with/aggregate fold, codegen vs interpreted parity, null and
  * length-mismatch semantics.
  */
class DotProdSpec extends SparkSpec {
  import spark.implicits._

  private def pseudo(i: Int, d: Int): Double =
    scala.util.hashing.MurmurHash3.productHash((i, d)).toDouble / Int.MaxValue

  private lazy val vecs = (1 to 50).map { i =>
    (i.toLong, Array.tabulate(24)(d => pseudo(i, d)), Array.tabulate(24)(d => pseudo(i + 1000, d)))
  }.toDF("id", "a", "b")

  test("native dot product is bit-identical to the zip_with/aggregate fold") {
    val both = vecs.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotBuiltins(col("a"), col("b")).as("fold"))
      .collect()
    both.foreach { r =>
      // exact bit equality — same IEEE op order, so not a tolerance check
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), r.toString)
    }
  }

  test("codegen and interpreted eval agree") {
    val expr = Similarity.dot(col("a"), col("b")).as("d")
    val wholestage = vecs.select(col("id"), expr).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = vecs.select(col("id"), expr).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(wholestage == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("length mismatch and null elements yield NULL (fold parity)") {
    val odd = Seq(
      (1L, Array(1.0, 2.0), Array(3.0, 4.0)),          // ok → 11.0
      (2L, Array(1.0, 2.0), Array(3.0))                // length mismatch → null
    ).toDF("id", "a", "b")
    val out = odd.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotBuiltins(col("a"), col("b")).as("fold"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0 && out(0).getDouble(2) == 11.0)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))

    val withNulls = Seq((1L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0)))
      .toDF("id", "a", "b")
    val r = withNulls.select(
      Similarity.dot(col("a").cast("array<double>"), col("b").cast("array<double>")).as("native"),
      Similarity.dotBuiltins(col("a").cast("array<double>"), col("b").cast("array<double>")).as("fold"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
