package graft.plans

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{IntegerType, StringType}

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

  /** Validated constant-argument extraction for SQL builders: the second
    * argument of `minhash_sig`/`unicode_norm` is a compile-time constant
    * (it sizes the signature / names the normal form), so a non-foldable
    * or wrong-typed expression must fail analysis with a real message,
    * not an eval() UnsupportedOperationException.
    */
  private def constArg(fn: String, exprs: Seq[Expression], arity: Int,
                       idx: Int, wantStr: Boolean,
                       allowFractional: Boolean = false): Any = {
    def fail(msg: String): Nothing =
      throw new AnalysisException("INTERNAL_ERROR",
        Map("message" -> s"$fn: $msg"))
    if (exprs.length != arity)
      fail(s"expects $arity arguments, got ${exprs.length}")
    val e = exprs(idx)
    if (!e.foldable)
      fail(s"argument ${idx + 1} must be a constant, got ${e.sql}")
    val intTypes = Seq[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      IntegerType, org.apache.spark.sql.types.LongType)
    val fracTypes = Seq[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.FloatType, org.apache.spark.sql.types.DoubleType)
    val okType =
      if (wantStr) e.dataType == StringType
      else intTypes.contains(e.dataType) ||
        (allowFractional && (fracTypes.contains(e.dataType) ||
          e.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]))
    if (!okType)
      fail(s"argument ${idx + 1} must be ${if (wantStr) "a string"
        else if (allowFractional) "a numeric" else "an integer"} constant, got type ${e.dataType.sql}")
    val v = e.eval()
    if (v == null) fail(s"argument ${idx + 1} must not be NULL")
    v
  }

  private def checkArity(fn: String, exprs: Seq[Expression], n: Int): Seq[Expression] = {
    if (exprs.length != n)
      throw new AnalysisException("INTERNAL_ERROR",
        Map("message" -> s"$fn: expects $n arguments, got ${exprs.length}"))
    exprs
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        // constArg validates arity BEFORE exprs.head is touched — a
        // zero-arg call must produce the arity message, not
        // NoSuchElementException
        val k = constArg("minhash_sig", exprs, 2, 1, wantStr = false)
          .asInstanceOf[Number].intValue()
        MinHashSig(exprs.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimHashSig].getName, "simhash_sig"),
      (exprs: Seq[Expression]) => SimHashSig(checkArity("simhash_sig", exprs, 1).head)))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProd].getName, "vec_dot"),
      (exprs: Seq[Expression]) => { checkArity("vec_dot", exprs, 2); DotProd(exprs.head, exprs(1)) }))
    ext.injectFunction((
      FunctionIdentifier("max_run"),
      new ExpressionInfo(classOf[MaxRun].getName, "max_run"),
      (exprs: Seq[Expression]) => MaxRun(checkArity("max_run", exprs, 1).head)))
    ext.injectFunction((
      FunctionIdentifier("lsh_sig"),
      new ExpressionInfo(classOf[LshSig].getName, "lsh_sig"),
      (exprs: Seq[Expression]) => {
        val nbits = constArg("lsh_sig", exprs, 5, 1, wantStr = false).asInstanceOf[Number].intValue()
        val tables = constArg("lsh_sig", exprs, 5, 2, wantStr = false).asInstanceOf[Number].intValue()
        val dim = constArg("lsh_sig", exprs, 5, 3, wantStr = false).asInstanceOf[Number].intValue()
        val seed = constArg("lsh_sig", exprs, 5, 4, wantStr = false).asInstanceOf[Number].longValue()
        LshSig(exprs.head, nbits, tables, dim, seed)
      }))
    ext.injectFunction((
      FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNorm].getName, "unicode_norm"),
      (exprs: Seq[Expression]) => {
        val form = constArg("unicode_norm", exprs, 2, 1, wantStr = true).toString
        UnicodeNorm(exprs.head, form)
      }))
    ext.injectFunction((
      FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (exprs: Seq[Expression]) => DeflateLen(checkArity("deflate_len", exprs, 1).head)))
    ext.injectFunction((
      FunctionIdentifier("kll_sketch_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch_agg"),
      (exprs: Seq[Expression]) => {
        val k = constArg("kll_sketch_agg", exprs, 2, 1, wantStr = false)
          .asInstanceOf[Number].intValue()
        KllSketchAgg(exprs.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_merge_agg"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge_agg"),
      (exprs: Seq[Expression]) => {
        val k = constArg("kll_merge_agg", exprs, 2, 1, wantStr = false)
          .asInstanceOf[Number].intValue()
        KllMergeAgg(exprs.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "kll_quantile"),
      (exprs: Seq[Expression]) => {
        checkArity("kll_quantile", exprs, 2)
        KllQuantile(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo(classOf[LangIdPick].getName, "lang_id"),
      (exprs: Seq[Expression]) => {
        // lang_id(tokens_array, minScore): the engine's seed stopword
        // lists; minScore a numeric constant (fraction of tokens)
        val ms = constArg("lang_id", exprs, 2, 1, wantStr = false,
            allowFractional = true) match {
          case d: java.math.BigDecimal => d.doubleValue()
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
        }
        LangIdPick(exprs.head, graft.functions.TextFunctions.stopwords.toSeq, ms)
      }))
  }
}
