package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowed k-gram fingerprints — one pass per document, the
  * map-side engine of [[graft.operators.TextDedup.winnowedFingerprints]].
  * VALUE-IDENTICAL to the Column composition it replaces (and to the
  * q_dup_spans DuckDB oracle):
  *
  *   hs[i]  = conv(substring(md5(substring(text, i, k)), 1, 15), 16, 10)
  *   win j  = hs[j .. j+w-1]  (clamped; one whole-array window if
  *            fewer than w grams)
  *   emit   (min(win), j + array_position(win, min(win)) - 1)
  *   output = array_distinct of the emitted (fp, pos) structs
  *
  * but with none of the composed form's per-position costs: no
  * UTF8String substring allocation per gram (one UTF-8 byte buffer,
  * digest over byte slices), no hex rendering + conv() re-parse per
  * gram (the 60-bit prefix reads straight off the digest bytes), no
  * per-row boxed Integer sequence/struct churn, and the window minimum
  * runs as a monotonic deque — O(n) total rather than O(n·w) slice
  * scans. Positions count CODE POINTS, 1-based, exactly like SQL
  * `substr` (BpeIshCount's convention; surrogate pairs are one
  * position). The adjacent-window dedup it performs IS array_distinct
  * here: the selected position never decreases as the window slides
  * (a selected gram can only leave the window for good), so equal
  * consecutive picks are the only duplicates.
  *
  * Documents with fewer than k code points return an EMPTY array (the
  * composed form filters them before the explode; explode of empty
  * emits nothing, so the operator-level contract is unchanged).
  */
case class WinnowFp(child: Expression, k: Int, w: Int,
                    dedupe: Boolean = false)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"winnow_fp: bad k=$k / w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("fp", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(input: Any): Any =
    WinnowFp.compute(input.asInstanceOf[UTF8String], k, w, dedupe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WinnowFp.compute($c, $k, $w, $dedupe);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared implementation for eval and codegen (static call — the
    * BpeIshCount/DeflateLen pattern). With `dedupe` set, the emitted
    * sequence is reduced to one entry per distinct fp VALUE keeping the
    * smallest pos — map-side equivalent of the
    * `groupBy(fp, id).agg(min(pos))` shuffle the span pipeline used to
    * pay (selected positions never decrease, so keep-first IS min-pos;
    * WinnowFpSpec pins the equivalence). The probe set is a small
    * open-addressed table over the ≈2·len/(w+1) emitted entries.
    */
  def compute(s: UTF8String, k: Int, w: Int,
              dedupe: Boolean = false): ArrayData = {
    val bytes = s.getBytes
    // byte offset of each code point, plus the terminal offset: gram i
    // (1-based) is bytes[off(i-1), off(i-1+k))
    val off = codePointOffsets(bytes)
    val n = off.length - 1
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nh = n - k + 1
    val md = localMd.get()
    val hs = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      md.reset()
      md.update(bytes, off(i), off(i + k) - off(i))
      val d = md.digest()
      // first 15 hex chars = digest bytes 0..6 plus d7's high nibble
      hs(i) = (((d(0) & 0xFFL) << 48) | ((d(1) & 0xFFL) << 40) |
        ((d(2) & 0xFFL) << 32) | ((d(3) & 0xFFL) << 24) |
        ((d(4) & 0xFFL) << 16) | ((d(5) & 0xFFL) << 8) |
        (d(6) & 0xFFL)) << 4 | ((d(7) >> 4) & 0xFL)
      i += 1
    }
    val nw = math.max(nh - w + 1, 1)
    // monotonic deque of indices, values strictly increasing back-to-
    // front is NOT required on ties: equal values are kept so the front
    // stays the EARLIEST in-window index of the minimum — exactly
    // array_position's first-occurrence semantics
    val deque = new Array[Int](nh)
    var head = 0
    var tail = 0 // exclusive
    val outFp = new Array[Long](nw)
    val outPos = new Array[Int](nw)
    var m = 0
    var j = 0
    while (j < nw) {
      // admit elements entering window j (0-based window start j,
      // covers [j, j + min(w, nh) - 1])
      val end = math.min(j + w, nh) // exclusive
      var e = if (j == 0) 0 else end - 1
      while (e < end) {
        while (tail > head && hs(deque(tail - 1)) > hs(e)) tail -= 1
        deque(tail) = e
        tail += 1
        e += 1
      }
      while (deque(head) < j) head += 1
      val sel = deque(head)
      val fp = hs(sel)
      val pos = sel + 1
      if (m == 0 || outFp(m - 1) != fp || outPos(m - 1) != pos) {
        outFp(m) = fp
        outPos(m) = pos
        m += 1
      }
      j += 1
    }
    if (dedupe && m > 1) {
      var cap = 4
      while (cap < m * 2) cap <<= 1
      val mask = cap - 1
      val slot = new Array[Long](cap)
      val used = new Array[Boolean](cap)
      var mm = 0
      var t = 0
      while (t < m) {
        val fp = outFp(t)
        // fp is a 60-bit md5 prefix — already uniform; fold high bits in
        var h = (fp ^ (fp >>> 32)).toInt & mask
        var decided = false
        var dup = false
        while (!decided) {
          if (!used(h)) { used(h) = true; slot(h) = fp; decided = true }
          else if (slot(h) == fp) { dup = true; decided = true }
          else h = (h + 1) & mask
        }
        if (!dup) { outFp(mm) = fp; outPos(mm) = outPos(t); mm += 1 }
        t += 1
      }
      m = mm
    }
    val rows = new Array[Any](m)
    i = 0
    while (i < m) {
      rows(i) = new GenericInternalRow(
        Array[Any](outFp(i), outPos(i)): Array[Any])
      i += 1
    }
    new GenericArrayData(rows)
  }

  /** Byte offsets of each code point start, with a terminal entry at
    * bytes.length — positions count code points like SQL substr
    * (a surrogate pair / 4-byte sequence is ONE position).
    */
  private def codePointOffsets(bytes: Array[Byte]): Array[Int] = {
    var count = 0
    var i = 0
    val len = bytes.length
    while (i < len) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      count += 1
    }
    val off = new Array[Int](count + 1)
    i = 0
    var c = 0
    while (i < len) {
      off(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    off(count) = len
    off
  }

  /** Column-level entry: wraps the expression directly (no registry). */
  def fingerprints(text: Column, k: Int, w: Int,
                   dedupe: Boolean = false): Column =
    GraftColumnShim.column(
      WinnowFp(GraftColumnShim.expression(text), k, w, dedupe))
}
