package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd signature-agreement count for two array<long>
  * columns — the est-Jaccard verify loop of every MinHash pair
  * operator. The composed-built-ins form
  * `size(filter(zip_with(a, b, _ === _), identity))` materializes a
  * boolean array then a filtered array PER CANDIDATE PAIR and walks
  * higher-order-function lambda plumbing per element; on the sf10
  * corpus that stage's allocation pressure made the k=32 pair queries
  * swing 2× run-to-run. This is one tight primitive loop, no
  * allocation.
  *
  * Semantics match the zip_with form exactly: count positions in the
  * common prefix where both elements are non-null and equal (zip_with
  * pads the shorter array with nulls and `filter` drops the null
  * comparisons, so trailing positions never count); null input array →
  * NULL result (`size(null)` is null under the non-legacy default).
  */
case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sig_agree requires two array<bigint>, got ${l.simpleString} / ${r.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_agree"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i) &&
         |      $x.getLong($i) == $y.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

object SigAgree {
  /** Column-level entry: wraps the expression directly (no registry). */
  def agree(a: Column, b: Column): Column =
    GraftColumnShim.column(SigAgree(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
}
