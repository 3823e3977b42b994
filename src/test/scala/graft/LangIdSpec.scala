package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Native LangIdPick expression: parity against the composed
  * filter/isin Column form it replaced, codegen vs interpreted, SQL
  * registration, tie-break and null semantics.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private lazy val texts = Seq(
    "the cat and the dog of the house was here it is",   // en
    "el perro y la casa de los gatos no se un",          // es
    "der hund und die katze ist von den anderen nicht",  // de
    "le chien et les chats des maisons en une est",      // fr
    "zzz qqq www",                                       // und (no hits)
    "",                                                  // und (one empty token)
    "the el the el the el",                              // exact en/es tie
    null.asInstanceOf[String]                            // composed form → und
  ).toDF("t")

  test("native langId ≡ composed filter/isin form on every fixture row") {
    val got = texts.select(
      TextFunctions.langId(col("t")).as("native"),
      TextFunctions.langIdComposed(col("t")).as("composed")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), s"row $r"))
    // the tie row: equal en/es scores pick the lexicographically larger
    // language (the struct array_max ordering the composed form defines)
    assert(got.map(_.getString(0)).toSeq ==
      Seq("en", "es", "de", "fr", "und", "und", "es", "und"))
  }

  test("codegen and interpreted eval agree") {
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(TextFunctions.langId(col("t"))).collect().map(_.getString(0)).toSeq
    val wholestage = run(texts)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(run(texts) == wholestage)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("lang_id SQL function registered; minScore constant validated") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftTestShim.registerFunctions(ext,
      spark.sessionState.functionRegistry)
    val got = spark.sql(
      "SELECT lang_id(split('the cat and the dog of it', ' '), 0.05) AS l")
      .collect().head.getString(0)
    assert(got == "en")
    // raised floor: the same row falls below minScore → und
    val floored = spark.sql(
      "SELECT lang_id(split('the cat kite goes here now then soon later maybe', ' '), 0.5) AS l")
      .collect().head.getString(0)
    assert(floored == "und")
    val err = intercept[Exception] {
      spark.sql("SELECT lang_id(split('a b', ' '))").collect()
    }
    assert(err.getMessage.contains("lang_id"), err.getMessage)
  }
}
