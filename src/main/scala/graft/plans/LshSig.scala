package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native codegen'd random-hyperplane LSH signature: ALL `tables`
  * bucket values of an array<double> vector in one pass — one tight
  * loop over (table, bit, dim) with the plane constants held as a
  * reference object.
  *
  * The composed form (tables·nbits separate `vec_dot(v, typedLit(
  * plane))` expressions OR-folded into buckets) is semantically
  * identical but carries tables·nbits 64-element array literals through
  * analysis and generates a method per dot — multi-second plan/codegen
  * compile time that dominates small batches and re-compiles per query.
  * Here the planes are computed ONCE per expression instance
  * (deterministic MurmurHash3, [[LshSig.planeComponent]]) and the
  * generated code is three nested loops.
  *
  * Semantics (bit-compatible with the composed form and the DuckDB
  * oracle mirror):
  *   - projection = strict index-order sum starting at 0.0 (IEEE-
  *     deterministic);
  *   - bit b of table t set iff dot(v, plane(t·[[LshSig.PlaneStride]]+b))
  *     >= 0 — the global plane index strides by a CONSTANT 64, not by
  *     nbits, so a table's planes are nbits-INDEPENDENT: the nbits=13
  *     bucket is a bit-prefix of the nbits=24 bucket for the same
  *     table. That is what lets [[graft.operators.Similarity.autoNbits]]
  *     size nbits from the corpus count while the DuckDB oracle replays
  *     the identical pairing from ONE fixed literal set gated by a
  *     dynamic `b < nbits` (an nbits-dependent index would need
  *     different plane literals per corpus size);
  *   - wrong vector length throws loudly (a silent fallback would land
  *     every row in bucket 0 and degenerate the candidate join to
  *     O(n²) — same contract as the previous assert_true guard).
  */
case class LshSig(child: Expression, nbits: Int, tables: Int, dim: Int,
                  seed: Long) extends UnaryExpression {

  require(nbits > 0 && nbits <= 62, "nbits must be in (0, 62]")
  require(tables > 0 && tables <= 256, "tables must be in (0, 256]")
  require(dim > 0, "dim must be positive")

  // local layout stays [t * nbits + b] (dense for the codegen loop);
  // only the hash-space index strides by PlaneStride
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(tables * nbits)(g =>
      Array.tabulate(dim)(d => LshSig.planeComponent(
        seed, (g / nbits) * LshSig.PlaneStride + (g % nbits), d)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sig requires array<double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"lsh_sig: vector length ${arr.numElements()} != dim=$dim")
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        val plane = planes(t * nbits + b)
        var s = 0.0
        var d = 0
        while (d < dim) { s += arr.getDouble(d) * plane(d); d += 1 }
        if (s >= 0.0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val pl = ctx.freshName("pl")
      val bucket = ctx.freshName("bucket")
      s"""
         |if ($c.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "lsh_sig: vector length " + $c.numElements() + " != dim=$dim");
         |}
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $nbits; $b++) {
         |    double[] $pl = $planesRef[$t * $nbits + $b];
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dim; $d++) {
         |      $s += $c.getDouble($d) * $pl[$d];
         |    }
         |    if ($s >= 0.0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshSig =
    copy(child = newChild)
}

object LshSig {
  /** Global plane-index stride per table: plane of (table t, bit b) is
    * [[planeComponent]] at gbit = t·PlaneStride + b. A constant stride
    * (not nbits) keeps every table's plane set independent of nbits —
    * see the class scaladoc. 64 > the 62-bit nbits ceiling, so tables
    * never collide.
    */
  val PlaneStride = 64

  /** The deterministic hyperplane component for (global) bit `gbit`,
    * dimension `d`, in [-1, 1] — the SINGLE source of truth shared by
    * the expression, the composed spec form, and the DuckDB oracle
    * generator (Double.toString round-trips exactly).
    */
  def planeComponent(seed: Long, gbit: Int, d: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((seed, gbit, d))
    h.toDouble / Int.MaxValue
  }

  /** Column-level entry: all `tables` bucket longs for a vector. */
  def sig(v: Column, nbits: Int, tables: Int, dim: Int, seed: Long): Column =
    GraftColumnShim.column(
      LshSig(GraftColumnShim.expression(v), nbits, tables, dim, seed))
}
