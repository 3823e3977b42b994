package graft

import graft.functions.TextFunctions
import graft.plans.UnicodeNorm
import org.apache.spark.sql.functions._

/** Native unicode_norm expression and its fingerprint integration. */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private val precomposed = "caf\u00e9"            // é as one codepoint
  private val combining = "cafe\u0301"             // e + combining acute

  test("NFC unifies combining and precomposed encodings; NFD decomposes") {
    val r = Seq((precomposed, combining)).toDF("a", "b")
      .select(
        UnicodeNorm.norm(col("a")) === UnicodeNorm.norm(col("b")),
        UnicodeNorm.norm(col("a"), "NFD") === UnicodeNorm.norm(col("b"), "NFD"),
        length(col("a")) === length(col("b")))
      .head()
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
  }

  test("stripAccents folds to ASCII") {
    val got = Seq("café über naïve").toDF("t")
      .select(TextFunctions.stripAccents(col("t"))).head().getString(0)
    assert(got == "cafe uber naive")
  }

  test("fingerprint now collapses encoding variants into one exact-dup group") {
    val docs = Seq((1L, precomposed), (2L, combining), (3L, "other text"))
      .toDF("doc_id", "text")
    val groups = graft.operators.TextDedup.exactGroups(docs, "text", "doc_id")
    assert(groups.count() == 2)
    val dup = groups.filter(col("n_copies") === 2).head()
    assert(dup.getLong(1) == 1L)
  }

  test("codegen and interpreted eval agree") {
    val df = Seq(precomposed, combining, "plain", "").toDF("t")
      .select(UnicodeNorm.norm(col("t")).as("n"))
    val wholestage = df.collect().map(_.getString(0)).toSeq
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(df.collect().map(_.getString(0)).toSeq == wholestage)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
