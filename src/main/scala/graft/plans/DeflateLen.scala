package graft.plans

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** DEFLATE-compressed byte length of a string — the primitive behind
  * the compression-ratio quality signal (Gopher/Dolma family):
  * machine-generated and template text compresses far better than
  * natural prose, so `deflate_len / octet_length` is a cheap
  * model-free redundancy score that catches repetition n-gram
  * heuristics miss (long-range structure, interleaved boilerplate).
  *
  * Native expression with direct static-call codegen (the
  * [[UnicodeNorm]] pattern). The Deflater is thread-local and reset per
  * row — native zlib allocation amortizes across a whole partition,
  * never per value. Fixed level 6, nowrap: deterministic for a given
  * zlib, which is why the driver query is golden-pinned rather than
  * DuckDB-oracled (no SQL engine reproduces zlib byte counts).
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(s: Any): Any =
    DeflateLen.compressedLength(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.DeflateLen.compressedLength($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(6, /* nowrap = */ true)
  }

  /** Called from both eval and generated code. */
  def compressedLength(bytes: Array[Byte]): Int = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0
    while (!d.finished()) n += d.deflate(buf)
    n
  }

  def len(c: Column): Column =
    GraftColumnShim.column(DeflateLen(GraftColumnShim.expression(c)))
}
