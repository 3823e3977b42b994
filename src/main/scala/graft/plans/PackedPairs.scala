package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd packed-pair emission from a sorted posting list —
  * the pair-generation loop of the exact-Jaccard dedup pipeline. For a
  * posting list `[d0 < d1 < ... < dm]` emits every ordered pair as one
  * packed long `(di << 32) | dj` (i < j), exactly the value the
  * previous composed form produced:
  *
  *   `flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2,
  *     size(ds)), y -> shiftleft(x, 32) | y)))`
  *
  * The composed form allocates one sliced copy of the list PLUS one
  * lambda-driven result array per element — O(m²) transient ArrayData
  * churn per list before the flatten copies everything again. On the
  * sf10 corpus that garbage made the exact-truth stage of the dual-path
  * bench queries swing 2-2.5× run to run. This expression fills one
  * primitive long[] of exactly m(m-1)/2 slots in a tight loop: no
  * intermediate arrays, no lambda plumbing, and the output is an
  * UnsafeArrayData the downstream explode iterates without boxing.
  *
  * Null elements cannot occur in the intended input (`collect_set`
  * never emits null); if one does appear the expression returns NULL
  * rather than a corrupt packing. Ids must fit unsigned 32 bits, as in
  * the composed form (packing is the caller's contract, unchanged).
  * A single list longer than `MaxList` (22992) entries fails loudly
  * with a pointer at `maxPostings` instead of attempting the
  * allocation the composed form would also have died on. The cap is
  * the `UnsafeArrayData.fromPrimitiveArray` ceiling INCLUDING its
  * null-bitmap header (8 + ceil(n/64)*8 bytes on top of 8n value
  * bytes, all of which must fit 2^31-1): n = 22992*22991/2 =
  * 264,304,536 pairs totals 268,434,296 longs — the largest that
  * fits — while 22993 overflows it. So the IllegalArgumentException
  * below is the failure mode for EVERY oversized list — not an Int
  * overflow (m*(m-1)/2 computed in int would go negative past
  * m = 46341) and not an opaque encoder error.
  */
case class PackedPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"packed_pairs requires array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "packed_pairs"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val m = xs.numElements()
    if (m > PackedPairs.MaxList) throw new IllegalArgumentException(PackedPairs.TooHot)
    var i = 0
    while (i < m) { if (xs.isNullAt(i)) return null; i += 1 }
    val out = new Array[Long]((m.toLong * (m - 1) / 2).toInt)
    var p = 0
    i = 0
    while (i < m) {
      val hi = xs.getLong(i) << 32
      var j = i + 1
      while (j < m) { out(p) = hi | xs.getLong(j); p += 1; j += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, x => {
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val hi = ctx.freshName("hi")
      val out = ctx.freshName("out")
      s"""
         |final int $m = $x.numElements();
         |if ($m > ${PackedPairs.MaxList}) {
         |  throw new IllegalArgumentException("${PackedPairs.TooHot}");
         |}
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |}
         |if (!${ev.isNull}) {
         |  final long[] $out = new long[(int) ((long) $m * ($m - 1) / 2)];
         |  int $p = 0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    final long $hi = $x.getLong($i) << 32;
         |    for (int $j = $i + 1; $j < $m; $j++) {
         |      $out[$p++] = $hi | $x.getLong($j);
         |    }
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PackedPairs =
    copy(child = newChild)
}

object PackedPairs {
  // Largest m whose pair count n = m(m-1)/2 fits UnsafeArrayData.fromPrimitiveArray:
  // (8 + ceil(n/64)*8 header bytes) + 8n value bytes <= 2^31-1. Beyond this the
  // encoder (not the allocation) is the binding limit, so the guard must trip
  // first to keep the error actionable.
  private[plans] val MaxList = 22992
  private[plans] val TooHot =
    "posting list exceeds 22992 entries - cap it with maxPostings before pair emission"

  /** The guard ceiling, exposed for specs and for callers sizing `maxPostings`. */
  def maxListSize: Int = MaxList

  /** Column-level entry: wraps the expression directly (no registry). */
  def pairs(ds: Column): Column =
    GraftColumnShim.column(PackedPairs(GraftColumnShim.expression(ds)))
}
