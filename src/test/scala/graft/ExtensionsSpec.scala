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
}
