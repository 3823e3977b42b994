package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native packaging of the engine's custom expressions: inject
  * them through `SparkSessionExtensions` so ANY session — including one
  * built by spark-submit with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` — gets
  * `minhash_sig`, `simhash_sig`, `vec_dot`, and `max_run` as SQL
  * functions, no imperative registration calls needed. The injection path survives
  * session cloning (e.g. thread-local sessions on a shared cluster),
  * unlike per-session temp-function registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProd].getName, "vec_dot"),
      (exprs: Seq[Expression]) => DotProd(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("max_run"),
      new ExpressionInfo(classOf[MaxRun].getName, "max_run"),
      (exprs: Seq[Expression]) => MaxRun(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNorm].getName, "unicode_norm"),
      (exprs: Seq[Expression]) => UnicodeNorm(exprs.head,
        exprs(1).eval().toString)))
  }
}
