package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native intra-document segment dedup — the C4 "discard duplicate
  * lines" / RefinedWeb line-dedup move, as ONE pass per document:
  * split on a literal separator, keep each distinct segment's FIRST
  * occurrence (exact byte match), re-join with the same separator.
  * Value-identical to the list formulation
  * `array_join(filter(split(text, sep), (x, i) ->
  * array_position(split(text, sep), x) == i + 1), sep)` — but that
  * form's inner array_position is O(L) per element (O(L²) per doc,
  * unusable on a 10k-line page) and every HOF in the chain is
  * CodegenFallback. Here: one boundary scan, an open-addressed table
  * of FNV-1a segment hashes with exact byte-compare on hash hits
  * (dedup is EXACT, never probabilistic), one output copy. Empty
  * segments (consecutive separators, leading/trailing) are segments
  * too — the first empty survives, later ones dedupe away, exactly
  * like the list form. Map-side scalar work: 100 TB line-dedup is
  * pure scan parallelism, no shuffle, no state.
  */
case class DedupSegments(child: Expression, sep: String)
    extends UnaryExpression {

  require(sep != null && sep.nonEmpty, "dedup_segments: empty separator")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dedup_segments requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "dedup_segments"

  @transient private lazy val sepUtf8 = UTF8String.fromString(sep)

  override def nullSafeEval(input: Any): Any =
    DedupSegments.compute(input.asInstanceOf[UTF8String], sepUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepUtf8,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.DedupSegments.compute($c, $sepRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): DedupSegments =
    copy(child = newChild)
}

object DedupSegments {

  /** Shared implementation for eval and codegen (static call — the
    * WinnowFp/BpeIshCount pattern).
    */
  def compute(s: UTF8String, sep: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val sb = sep.getBytes
    val n = bytes.length
    val sl = sb.length
    // segment boundaries: starts(i) inclusive, ends(i) exclusive
    var segCount = 1
    var i = 0
    while (i + sl <= n) {
      if (matchesAt(bytes, i, sb)) { segCount += 1; i += sl }
      else i += 1
    }
    if (segCount == 1) return s // no separator: single segment, nothing to dedupe
    val starts = new Array[Int](segCount)
    val ends = new Array[Int](segCount)
    var c = 0
    var segStart = 0
    i = 0
    while (i + sl <= n) {
      if (matchesAt(bytes, i, sb)) {
        starts(c) = segStart; ends(c) = i; c += 1
        i += sl; segStart = i
      } else i += 1
    }
    starts(c) = segStart; ends(c) = n
    // open-addressed table of segment indices keyed by FNV-1a hash,
    // exact byte compare on hash hit — dedup is exact
    var cap = 4
    while (cap < segCount * 2) cap <<= 1
    val mask = cap - 1
    val slot = new Array[Int](cap) // segment index + 1; 0 = empty
    val keep = new Array[Boolean](segCount)
    var kept = 0
    var outLen = 0
    var si = 0
    while (si < segCount) {
      val h0 = fnv1a(bytes, starts(si), ends(si))
      var h = (h0 ^ (h0 >>> 32)).toInt & mask
      var decided = false
      var dup = false
      while (!decided) {
        val other = slot(h) - 1
        if (other < 0) { slot(h) = si + 1; decided = true }
        else if (sameBytes(bytes, starts(other), ends(other), starts(si), ends(si))) {
          dup = true; decided = true
        } else h = (h + 1) & mask
      }
      keep(si) = !dup
      if (!dup) { kept += 1; outLen += ends(si) - starts(si) }
      si += 1
    }
    if (kept == segCount) return s // nothing removed: reuse the input
    val out = new Array[Byte](outLen + (kept - 1) * sl)
    var pos = 0
    var first = true
    si = 0
    while (si < segCount) {
      if (keep(si)) {
        if (!first) { System.arraycopy(sb, 0, out, pos, sl); pos += sl }
        val len = ends(si) - starts(si)
        System.arraycopy(bytes, starts(si), out, pos, len)
        pos += len
        first = false
      }
      si += 1
    }
    UTF8String.fromBytes(out)
  }

  @inline private def matchesAt(b: Array[Byte], at: Int, pat: Array[Byte]): Boolean = {
    var j = 0
    while (j < pat.length) {
      if (b(at + j) != pat(j)) return false
      j += 1
    }
    true
  }

  @inline private def sameBytes(b: Array[Byte], s1: Int, e1: Int,
                                s2: Int, e2: Int): Boolean = {
    if (e1 - s1 != e2 - s2) return false
    var j = 0
    val len = e1 - s1
    while (j < len) {
      if (b(s1 + j) != b(s2 + j)) return false
      j += 1
    }
    true
  }

  @inline private def fnv1a(b: Array[Byte], from: Int, to: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = from
    while (j < to) {
      h ^= (b(j) & 0xFFL)
      h *= 0x100000001b3L
      j += 1
    }
    h
  }

  /** Column-level entry: wraps the expression directly (no registry). */
  def dedup(text: Column, sep: String): Column =
    GraftColumnShim.column(
      DedupSegments(GraftColumnShim.expression(text), sep))
}
