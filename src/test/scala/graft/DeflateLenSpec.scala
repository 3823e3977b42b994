package graft

import graft.functions.TextFunctions
import graft.plans.DeflateLen
import org.apache.spark.sql.functions._

/** Native DeflateLen expression (compression-ratio quality signal):
  * codegen vs interpreted parity, redundancy ordering, SQL
  * registration, null/empty edges.
  */
class DeflateLenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val texts = Seq(
    (1L, "a" * 400),                                   // maximally redundant
    (2L, "the quick brown fox jumps over the lazy dog " * 10),
    (3L, { val r = new scala.util.Random(42)
           (0 until 400).map(_ => r.nextPrintableChar()).mkString }),
    (4L, ""),                                          // empty → null ratio
    (5L, null.asInstanceOf[String])                    // null → null
  ).toDF("id", "t")

  test("redundant text compresses far better than pseudo-random text") {
    val got = texts.filter(col("id") <= 3)
      .select(col("id"), TextFunctions.compressionRatio(col("t")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) < 0.05, s"solid run should compress to almost nothing: $got")
    assert(got(1L) < got(2L) && got(2L) < got(3L),
      s"ratio must order by redundancy: $got")
    assert(got(3L) > 0.7, s"random text should barely compress: $got")
  }

  test("codegen and interpreted eval agree; null and empty stay null-safe") {
    def run(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), DeflateLen.len(col("t")).as("n"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    val wholestage = run(texts)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try run(texts)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    assert(wholestage == interpreted, s"$wholestage vs $interpreted")
    assert(wholestage(5L) == -1, "null input must yield null, not a crash")
    assert(wholestage(4L) >= 0, "empty string has a (tiny) deflate length")
    // deterministic across repeated evaluation (thread-local deflater reset)
    assert(run(texts) == wholestage)
  }

  test("deflate_len registered as a SQL function via GraftExtensions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftTestShim.registerFunctions(ext,
      spark.sessionState.functionRegistry)
    val n = spark.sql("SELECT deflate_len('aaaaaaaaaaaaaaaaaaaa') AS n")
      .head().getInt(0)
    assert(n > 0 && n < 20, s"20 identical chars must deflate below input size, got $n")
  }
}
