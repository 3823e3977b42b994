package graft

import graft.functions.TextFunctions
import graft.plans.MaxRun
import org.apache.spark.sql.functions._

/** Native MaxRun expression: codegen vs interpreted vs built-in-fold
  * parity, edge semantics.
  */
class MaxRunSpec extends SparkSpec {
  import spark.implicits._

  private lazy val texts = Seq(
    "a a a b b c",      // run 3
    "x",                // run 1
    "",                 // split("") → [""] → run 1
    "p q p q p q",      // run 1
    "z z z z z z z z"   // run 8
  ).toDF("t")

  test("max_run matches the aggregate-fold built-in on every fixture row") {
    val got = texts.select(
      MaxRun.maxRun(TextFunctions.tokens(col("t"))).as("native"),
      TextFunctions.maxTokenRunBuiltins(col("t")).as("fold")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"row $r"))
    assert(got.map(_.getLong(0)).toSeq == Seq(3L, 1L, 1L, 1L, 8L))
  }

  test("codegen and interpreted eval agree; nulls extend runs null-safely") {
    val arrs = Seq(
      (1L, Seq[String]("a", "a", null, null, null, "b")),  // null run 3
      (2L, Seq.empty[String]),                             // → 0
      (3L, Seq[String](null))                              // → 1
    ).toDF("id", "arr")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), MaxRun.maxRun(col("arr")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wholestage = run(arrs)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(run(arrs) == wholestage)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(wholestage == Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

}
