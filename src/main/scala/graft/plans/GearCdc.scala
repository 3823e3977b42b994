package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native gear-hash CDC cut computation — one pass per document, the
  * map-side engine of
  * [[graft.operators.TextDedup.contentDefinedChunks]]. VALUE-IDENTICAL
  * to the Column composition it replaces (and to the q_cdc_dedup DuckDB
  * oracle, which replays that composition in SQL):
  *
  *   g(p)    = conv(substring(md5('gear:' || substr(t, p, 1)), 1, 4), 16, 10)
  *   h(i)    = fold (a, x) → (31a + x) mod 2⁴⁰ over g on
  *             [max(i − w + 1, 1), i], init 0
  *   cut i   when h(i) mod 2^maskBits = 0; final position always a cut
  *   chunk   (pos = prev_cut + 1, len = cut − prev_cut)
  *
  * but with none of the composed form's per-position costs:
  *
  *   - ONE md5 per DISTINCT CHARACTER instead of one per position — a
  *     per-thread open-addressed cache keyed by the code point's UTF-8
  *     bytes (text alphabets are tiny relative to text length, so the
  *     digest work collapses by ~|text| / |alphabet|);
  *   - the windowed Horner fold updated INCREMENTALLY —
  *     h_i = (31·h_{i−1} + g_i − g_{i−w}·31ʷ) mod 2⁴⁰ over a w-slot
  *     ring buffer — O(1) per position instead of the composed form's
  *     O(w) slice + fold (both exact: operands stay < 2⁵⁶, and the
  *     mod-2⁴⁰ residue is a bitmask, correct through the subtraction's
  *     two's-complement wrap);
  *   - no boxed sequence/slice/struct churn per position.
  *
  * Positions count CODE POINTS, 1-based, exactly like SQL `substr`
  * (the WinnowFp convention; a surrogate pair is one position). Empty
  * text returns an EMPTY array — the operator filters those rows, so
  * the contract is unchanged.
  */
case class GearCdc(child: Expression, maskBits: Int, windowChars: Int)
    extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 30,
    s"gear_cdc: maskBits must be in [1, 30], got $maskBits")
  require(windowChars >= 2 && windowChars <= 64,
    s"gear_cdc: windowChars must be in [2, 64], got $windowChars")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_cdc requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "gear_cdc"

  override def nullSafeEval(input: Any): Any =
    GearCdc.compute(input.asInstanceOf[UTF8String], maskBits, windowChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GearCdc.compute($c, $maskBits, $windowChars);")

  override protected def withNewChildInternal(newChild: Expression): GearCdc =
    copy(child = newChild)
}

object GearCdc {

  private val gearPrefix = "gear:".getBytes("UTF-8")

  private val localMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Per-thread code-point → gear cache. Keys pack the char's UTF-8
    * bytes with their length ((len << 32) | bytes-as-unsigned-int), so
    * key 0 never occurs (len ≥ 1) and doubles as the empty slot.
    * Open-addressed, grown by rehash at 1/2 load — alphabets are
    * hundreds of entries, so this stays a few KB per thread for real
    * text. Adversarial high-diversity input (random Unicode) is capped:
    * past 2¹⁷ distinct code points new entries are computed directly
    * instead of cached (long-lived executor threads must not pin ~24 MB
    * of cache built by one pathological document).
    */
  private final class GearCache {
    private val maxEntries = 1 << 17
    private var cap = 1 << 10
    private var keys = new Array[Long](cap)
    private var vals = new Array[Int](cap)
    private var n = 0
    private def digest(bytes: Array[Byte], off: Int, len: Int): Int = {
      val md = localMd.get()
      md.reset()
      md.update(gearPrefix)
      md.update(bytes, off, len)
      val d = md.digest()
      ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
    }
    def getOrCompute(key: Long, bytes: Array[Byte], off: Int, len: Int): Int = {
      val mask = cap - 1
      var h = (key ^ (key >>> 29)).toInt & mask
      while (true) {
        val k = keys(h)
        if (k == key) return vals(h)
        if (k == 0L) {
          val g = digest(bytes, off, len)
          if (n < maxEntries) {
            keys(h) = key
            vals(h) = g
            n += 1
            if (n * 2 > cap) grow()
          }
          return g
        }
        h = (h + 1) & mask
      }
      0 // unreachable
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals
      cap <<= 1
      keys = new Array[Long](cap)
      vals = new Array[Int](cap)
      val mask = cap - 1
      var i = 0
      while (i < ok.length) {
        val key = ok(i)
        if (key != 0L) {
          var h = (key ^ (key >>> 29)).toInt & mask
          while (keys(h) != 0L) h = (h + 1) & mask
          keys(h) = key
          vals(h) = ov(i)
        }
        i += 1
      }
    }
  }

  private val localCache = new ThreadLocal[GearCache] {
    override def initialValue(): GearCache = new GearCache
  }

  /** Shared implementation for eval and codegen (static call — the
    * WinnowFp/BpeIshCount pattern). Returns array<struct<pos, len>>.
    */
  def compute(s: UTF8String, maskBits: Int, windowChars: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val cache = localCache.get()
    val mask40 = (1L << 40) - 1
    val cutMask = (1L << maskBits) - 1
    // 31^w mod 2^40 for the incremental window eviction
    var pow31w = 1L
    var p = 0
    while (p < windowChars) { pow31w = (pow31w * 31L) & mask40; p += 1 }

    val ring = new Array[Long](windowChars)
    var cuts = new Array[Int](16)
    var nCuts = 0
    var h = 0L
    var i = 0      // code-point index, 0-based (position = i + 1)
    var bo = 0     // byte offset of the current code point
    while (bo < len) {
      // clamp: a truncated multi-byte tail (binary-cast / corrupt data)
      // must degrade to a short final code point, not overrun the array
      val cl = math.min(UTF8String.numBytesForFirstByte(bytes(bo)), len - bo)
      var packed = 0L
      var b = 0
      while (b < cl) { packed = (packed << 8) | (bytes(bo + b) & 0xFFL); b += 1 }
      val key = (cl.toLong << 32) | packed
      val g = cache.getOrCompute(key, bytes, bo, cl).toLong
      val slot = i % windowChars
      h =
        if (i >= windowChars) (31L * h + g - ring(slot) * pow31w) & mask40
        else (31L * h + g) & mask40
      ring(slot) = g
      i += 1
      if ((h & cutMask) == 0L) {
        if (nCuts == cuts.length) cuts = java.util.Arrays.copyOf(cuts, nCuts * 2)
        cuts(nCuts) = i
        nCuts += 1
      }
      bo += cl
    }
    val n = i
    if (nCuts == 0 || cuts(nCuts - 1) != n) {
      if (nCuts == cuts.length) cuts = java.util.Arrays.copyOf(cuts, nCuts + 1)
      cuts(nCuts) = n
      nCuts += 1
    }
    val rows = new Array[Any](nCuts)
    var prev = 0
    var c = 0
    while (c < nCuts) {
      rows(c) = new GenericInternalRow(
        Array[Any](prev + 1, cuts(c) - prev): Array[Any])
      prev = cuts(c)
      c += 1
    }
    new GenericArrayData(rows)
  }

  /** Column-level entry: wraps the expression directly (no registry). */
  def chunks(text: Column, maskBits: Int, windowChars: Int): Column =
    GraftColumnShim.column(
      GearCdc(GraftColumnShim.expression(text), maskBits, windowChars))
}
