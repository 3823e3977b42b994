package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-ish token count — the number of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]`
  * matches — as ONE pass over the UTF-8 bytes, replacing
  * `size(regexp_extract_all(...))`.
  *
  * Two independent reasons the regex form had to go:
  *   1. it materializes an array of every match (one per punctuation
  *      character!) just to take its length;
  *   2. measured on this box, `java.util.regex`'s find() loop on THIS
  *      three-branch alternation does not scale across threads AT ALL —
  *      ~105k docs/s total whether 1 or 32 threads run it (SCALE.md
  *      "The regex that would not parallelize"; simple classes and
  *      2-branch alternations scale fine, so the cliff is specific to
  *      patterns like this one). A hand loop is ~20× faster single-
  *      threaded and scales linearly.
  *
  * Semantics match the java-regex form on any valid UTF-8: ASCII
  * letter/digit runs collapse to one token each, ASCII whitespace
  * (`\s` = [ \t\n\x0B\f\r], exactly java's ASCII-only default) skips,
  * any other CODE POINT (multi-byte sequences included — classes match
  * code points, so a 4-byte emoji is ONE token) counts singly. Null in,
  * null out. BpeIshCountSpec property-checks equivalence against the
  * regex form, Unicode and edge whitespace included.
  */
case class BpeIshCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpeish_count requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpeish_count"

  override def nullSafeEval(input: Any): Any =
    BpeIshCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.BpeIshCount.count($s);")

  override protected def withNewChildInternal(newChild: Expression): BpeIshCount =
    copy(child = newChild)
}

object BpeIshCount {
  /** Column-level entry: wraps the expression directly (no registry). */
  def bpeishCount(c: Column): Column =
    GraftColumnShim.column(BpeIshCount(GraftColumnShim.expression(c)))

  // one shared implementation for eval and codegen (static call — the
  // loop is the work, JIT inlines it either way)
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var cnt = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0) { // ASCII
        if (isLetter(b)) {
          cnt += 1; i += 1
          while (i < n && isLetter(s.getByte(i))) i += 1
        } else if (isDigit(b)) {
          cnt += 1; i += 1
          while (i < n && isDigit(s.getByte(i))) i += 1
        } else if (isWs(b)) {
          i += 1
        } else {
          cnt += 1; i += 1
        }
      } else { // multi-byte UTF-8 sequence = one non-alnum code point
        cnt += 1
        i += UTF8String.numBytesForFirstByte(b)
      }
    }
    cnt
  }

  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
}
