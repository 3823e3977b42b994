package graft

import graft.plans.GraftExtensions
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** GraftExtensions: the spark.sql.extensions injection path registers
  * the native expressions so plain SQL can call them.
  */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("injected functions resolve and run from SQL") {
    // apply the extensions object to a registry exactly as session
    // construction does (SparkSessionExtensions.registerFunctions is the
    // internal hook spark.sql.extensions goes through)
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftTestShim.registerFunctions(ext,
      spark.sessionState.functionRegistry)
    assert(spark.sessionState.functionRegistry
      .functionExists(FunctionIdentifier("vec_dot")))

    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("ext_vecs")
    assert(spark.sql("SELECT vec_dot(a, b) FROM ext_vecs").head().getDouble(0) == 32.0)

    Seq(Tuple1(Seq("alpha", "beta", "gamma"))).toDF("toks")
      .createOrReplaceTempView("ext_toks")
    assert(spark.sql("SELECT minhash_sig(toks, 8) FROM ext_toks")
      .head().getSeq[Long](0).length == 8)
    assert(!spark.sql("SELECT simhash_sig(toks) FROM ext_toks").head().isNullAt(0))
    assert(spark.sql("SELECT max_run(array('a', 'a', 'b')) AS r")
      .head().getLong(0) == 2L)
    assert(spark.sql("SELECT unicode_norm('café', 'NFC') = 'café' AS r")
      .head().getBoolean(0))
  }

  test("builders reject bad arity / non-constant / wrong-typed args with a real message") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftTestShim.registerFunctions(ext,
      spark.sessionState.functionRegistry)
    Seq(Tuple1("x")).toDF("s").createOrReplaceTempView("ext_bad")
    def analysisMsg(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // one-arg unicode_norm: arity error, not IndexOutOfBounds
    assert(analysisMsg("SELECT unicode_norm(s) FROM ext_bad").contains("2 arguments"))
    // column-valued form arg: foldable error, not eval() UnsupportedOperation
    assert(analysisMsg("SELECT unicode_norm(s, s) FROM ext_bad").contains("constant"))
    // wrong-typed constant for minhash_sig k
    assert(analysisMsg("SELECT minhash_sig(array(s), 'NFC') FROM ext_bad")
      .contains("integer"))
    assert(analysisMsg("SELECT vec_dot(array(1.0)) FROM ext_bad").contains("2 arguments"))
    assert(analysisMsg("SELECT max_run(array(s), s) FROM ext_bad").contains("1 argument"))
    // zero-arg calls: the arity message, not NoSuchElementException
    assert(analysisMsg("SELECT unicode_norm() FROM ext_bad").contains("2 arguments"))
    assert(analysisMsg("SELECT minhash_sig() FROM ext_bad").contains("2 arguments"))
    assert(analysisMsg("SELECT lsh_sig() FROM ext_bad").contains("5 arguments"))
    assert(analysisMsg("SELECT kll_sketch_agg() FROM ext_bad").contains("2 arguments"))
  }

  test("KLL aggregates run from SQL end to end (sketch → merge → quantile)") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftTestShim.registerFunctions(ext,
      spark.sessionState.functionRegistry)
    (1 to 1000).map(i => ("g" + (i % 2), i.toDouble)).toDF("grp", "v")
      .createOrReplaceTempView("ext_kll")
    val med = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(sk, 200), CAST(0.5 AS DOUBLE)) AS med
        |FROM (SELECT grp, kll_sketch_agg(v, 200) AS sk
        |      FROM ext_kll GROUP BY grp)""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(med - 500.0) <= 40, s"median $med drifted")
  }
}
