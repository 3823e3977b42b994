package graft

import graft.operators.TextQuality
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ccnetBuckets decomposition (per-(lang,score) count compression +
  * straddle-only ranking) ≡ the naive `row_number() OVER (PARTITION BY
  * lang ORDER BY score DESC, id)` formulation it replaces — including
  * the hard cases: one score value owned by most of a language
  * (straddling both tercile boundaries), languages smaller than three
  * docs, and null scores.
  */
class CcnetSpec extends SparkSpec {
  import spark.implicits._

  private def naive(scored: DataFrame): Map[Long, String] = {
    val w = Window.partitionBy("lang")
      .orderBy(col("s").desc, col("id").asc)
    scored.filter(col("s").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n"), "head")
          .when(col("rn") * 3 <= col("n") * 2, "middle").otherwise("tail"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket"))
      .toMap
  }

  private def fast(scored: DataFrame): Map[Long, String] =
    TextQuality.ccnetBuckets(scored, "lang", "id", "s")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("bucket"))
      .toMap

  test("unique scores: decomposition equals the naive window") {
    val df = (0L until 90L).map(i =>
      (i, s"l${i % 3}", (i * 7 % 90).toDouble / 10.0)).toDF("id", "lang", "s")
    assert(fast(df) == naive(df))
  }

  test("heavy ties straddling both boundaries; tiny languages; nulls") {
    // lang a: 30 docs, 24 share score 5.0 (spans head→tail), a few
    // outside; lang b: 2 docs (n < 3 → no head slot at 3rn<=n); lang c:
    // ALL docs one score value; plus null-score rows that must vanish
    val a = (0L until 24L).map(i => (i, "a", 5.0)) ++
      Seq((24L, "a", 9.0), (25L, "a", 8.0), (26L, "a", 1.0),
        (27L, "a", 0.5), (28L, "a", 0.25), (29L, "a", 0.125))
    val b = Seq((100L, "b", 2.0), (101L, "b", 1.0))
    val c = (200L until 209L).map(i => (i, "c", 3.25))
    val nulls = Seq((300L, "a", Double.NaN)).map { case (i, l, _) =>
      (i, l, null.asInstanceOf[java.lang.Double]) }
    val df = (a ++ b ++ c).map { case (i, l, s) =>
      (i, l, java.lang.Double.valueOf(s)) }
      .++(nulls).toDF("id", "lang", "s")
    val f = fast(df)
    assert(f == naive(df))
    assert(!f.contains(300L), "null-score docs must be excluded")
    // the 24-way tie must split by id order: ids 2..9 (after the two
    // higher scores take slots 1-2) head, then middle, then tail
    assert(f(24L) == "head" && f(25L) == "head")
    assert(f(29L) == "tail")
  }

  test("tercile sizes follow integer arithmetic exactly") {
    // n=10: head floor(10/3)=3, middle 3, tail 4
    val df = (0L until 10L).map(i => (i, "x", 10.0 - i)).toDF("id", "lang", "s")
    val byBucket = fast(df).groupBy(_._2).view.mapValues(_.size).toMap
    assert(byBucket == Map("head" -> 3, "middle" -> 3, "tail" -> 4))
  }
}
