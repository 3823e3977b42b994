package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression —
  * the canonicalization step exact-dup fingerprinting needs: "é" as a
  * precomposed codepoint and as e + combining acute are the same text
  * to a reader but different bytes, so an un-normalized fingerprint
  * calls them distinct documents. Spark has no built-in for this;
  * the expression delegates to `java.text.Normalizer` (the JDK's ICU
  * implementation) in both eval and generated code.
  *
  * Not whole-stage-codegen-hostile: `doGenCode` emits a direct static
  * call — no lambda plumbing, no fallback to interpreted projection.
  */
case class UnicodeNorm(child: Expression, form: String) extends UnaryExpression {

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if Seq("NFC", "NFD", "NFKC", "NFKD").contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unicode_norm: unknown form '$form' (NFC|NFD|NFKC|NFKD)")
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_norm requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(s.asInstanceOf[UTF8String].toString, normForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {
  def norm(c: Column, form: String = "NFC"): Column =
    GraftColumnShim.column(UnicodeNorm(GraftColumnShim.expression(c), form))
}
