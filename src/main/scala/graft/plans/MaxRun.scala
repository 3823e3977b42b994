package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest run of equal consecutive elements in an array<string> — the
  * repetition-quality signal (`TextFunctions.repetitionStruct`,
  * `TextQuality.scalarGate`) that would otherwise be an `aggregate`
  * higher-order fold. `ArrayAggregate` is CodegenFallback: every row
  * drops out of whole-stage codegen into interpreted lambda plumbing
  * with per-step struct allocation. This expression is one primitive
  * loop with two scalar state variables, fully codegen'd — the
  * ingest-time quality gate stays inside the generated pipeline.
  *
  * Semantics match the fold exactly: null elements compare null-safe
  * (null == null extends a run), empty array → 0, null array → null.
  */
case class MaxRun(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_run requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "max_run"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = 0L
    var run = 0L
    var prev: UTF8String = null
    var prevNull = false
    var i = 0
    while (i < n) {
      val curNull = arr.isNullAt(i)
      val cur = if (curNull) null else arr.getUTF8String(i)
      val eq = i > 0 &&
        ((curNull && prevNull) || (!curNull && !prevNull && cur.equals(prev)))
      run = if (eq) run + 1 else 1
      if (run > best) best = run
      prev = cur
      prevNull = curNull
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val run = ctx.freshName("run")
      val best = ctx.freshName("best")
      val prev = ctx.freshName("prev")
      val prevNull = ctx.freshName("prevNull")
      val cur = ctx.freshName("cur")
      val curNull = ctx.freshName("curNull")
      val eq = ctx.freshName("eq")
      s"""
         |final int $n = $arr.numElements();
         |long $best = 0L;
         |long $run = 0L;
         |UTF8String $prev = null;
         |boolean $prevNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  final boolean $curNull = $arr.isNullAt($i);
         |  final UTF8String $cur = $curNull ? null : $arr.getUTF8String($i);
         |  final boolean $eq = $i > 0 &&
         |    (($curNull && $prevNull) || (!$curNull && !$prevNull && $cur.equals($prev)));
         |  $run = $eq ? $run + 1L : 1L;
         |  if ($run > $best) $best = $run;
         |  $prev = $cur;
         |  $prevNull = $curNull;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MaxRun =
    copy(child = newChild)
}

object MaxRun {
  /** Column-level entry: wraps the expression directly (no registry). */
  def maxRun(a: Column): Column =
    GraftColumnShim.column(MaxRun(GraftColumnShim.expression(a)))
}
