package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native k-minima signature for the engine-PORTABLE (md5-family)
  * MinHash pipeline — the map-side replacement for its
  * explode → groupBy(min×k) signature stage, which cost one exchange of
  * |corpus shingles| rows plus two `conv(substring(md5hex))` hex-string
  * parses per shingle. Value-identical to that composition:
  *
  *   a = conv(substring(md5(s), 1, 12), 16, 10)   — digest bytes 0-5
  *   b = conv(substring(md5(s), 13, 12), 16, 10)  — digest bytes 6-11
  *   sig[j] = min over elements of (a + j·b),  j in [0, k)
  *
  * (12 hex chars = 6 digest bytes, read big-endian unsigned — both
  * halves < 2^48, so a + j·b < 2^52 for j < 16: no overflow, matching
  * the SQL family's ANSI-safe bound; `k <= 16` is required for exactly
  * that reason, mirroring the composed form's guard.) One digest per
  * element, no hex string materialization, no per-shingle shuffle row:
  * signatures become embarrassingly parallel map work and only the
  * band self-join shuffles — the same shape the xxhash64 fast path got
  * from [[MinHashSig]], now for the DuckDB-oracle-checkable twin.
  *
  * Null elements are skipped (the exploded form's `min` ignores the
  * null a/b they produce). An array with NO contributing elements
  * returns NULL — callers filter empty sets first, matching the
  * exploded form where such docs simply emit no rows.
  */
case class Md5MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0 && k <= 16,
    "k must be in (0, 16] - the a + i*b double-hash family bound")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_minhash_sig requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "md5_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val d = org.apache.commons.codec.digest.DigestUtils.md5(
          arr.getUTF8String(i).getBytes)
        val a = ((d(0) & 0xFFL) << 40) | ((d(1) & 0xFFL) << 32) |
          ((d(2) & 0xFFL) << 24) | ((d(3) & 0xFFL) << 16) |
          ((d(4) & 0xFFL) << 8) | (d(5) & 0xFFL)
        val b = ((d(6) & 0xFFL) << 40) | ((d(7) & 0xFFL) << 32) |
          ((d(8) & 0xFFL) << 24) | ((d(9) & 0xFFL) << 16) |
          ((d(10) & 0xFFL) << 8) | (d(11) & 0xFFL)
        var j = 0
        while (j < k) {
          val h = a + j * b
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    // one MessageDigest per generated projection (per task): digest()
    // resets the instance, so reuse across rows/elements is safe and
    // avoids the per-call getInstance of DigestUtils
    val md = ctx.addMutableState("java.security.MessageDigest", "md5MinhashDigest",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |final int $n = $c.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    $any = true;
         |    byte[] $d = $md.digest($c.getUTF8String($i).getBytes());
         |    long $a = (($d[0] & 0xFFL) << 40) | (($d[1] & 0xFFL) << 32) |
         |      (($d[2] & 0xFFL) << 24) | (($d[3] & 0xFFL) << 16) |
         |      (($d[4] & 0xFFL) << 8) | ($d[5] & 0xFFL);
         |    long $b = (($d[6] & 0xFFL) << 40) | (($d[7] & 0xFFL) << 32) |
         |      (($d[8] & 0xFFL) << 24) | (($d[9] & 0xFFL) << 16) |
         |      (($d[10] & 0xFFL) << 8) | ($d[11] & 0xFFL);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $h = $a + $j * $b;
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |if (!$any) { ${ev.isNull} = true; }
         |else { ${ev.value} = new $gad($mins); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSig =
    copy(child = newChild)
}

object Md5MinHashSig {
  /** Column-level entry: wraps the expression directly (no registry). */
  def sig(set: Column, k: Int): Column =
    GraftColumnShim.column(Md5MinHashSig(GraftColumnShim.expression(set), k))
}
