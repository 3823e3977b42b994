package graft

import graft.plans.LshSig
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Native lsh_sig expression: codegen ≡ interpreted ≡ reference math,
  * bit-compat with the historical composed per-bit-literal form.
  */
class LshSigSpec extends SparkSpec {
  import spark.implicits._

  private def pseudoVec(i: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(d =>
      scala.util.hashing.MurmurHash3.productHash((i, d)).toDouble / Int.MaxValue)

  /** Reference computation straight from the plane definition: planes
    * stride by the CONSTANT PlaneStride (not nbits), so a table's
    * buckets at nbits=k are a bit-prefix of its buckets at nbits>k —
    * the property the dynamic-nbits DuckDB replay rides on.
    */
  private def reference(v: Array[Double], nbits: Int, tables: Int,
                        seed: Long): Seq[Long] =
    (0 until tables).map { t =>
      (0 until nbits).foldLeft(0L) { (acc, b) =>
        val proj = v.indices.foldLeft(0.0)((s, d) =>
          s + v(d) * LshSig.planeComponent(seed, t * LshSig.PlaneStride + b, d))
        if (proj >= 0.0) acc | (1L << b) else acc
      }
    }

  test("nbits-prefix property: same table's bucket truncates, planes nbits-independent") {
    val dim = 8; val seed = 42L
    val v = pseudoVec(7, dim)
    val wide = reference(v, 24, 3, seed)
    val narrow = reference(v, 13, 3, seed)
    (0 until 3).foreach { t =>
      assert((wide(t) & ((1L << 13) - 1)) == narrow(t),
        s"table $t: nbits=13 bucket is not a prefix of nbits=24 bucket")
    }
  }

  test("codegen and interpreted agree with the reference on random vectors") {
    val dim = 16; val nbits = 8; val tables = 3; val seed = 42L
    val rows = (0 until 50).map(i => (i.toLong, pseudoVec(i, dim))).toDF("id", "v")
    val got = rows.select(col("id"),
        LshSig.sig(col("v"), nbits, tables, dim, seed).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    (0 until 50).foreach { i =>
      assert(got(i.toLong) == reference(pseudoVec(i, dim), nbits, tables, seed),
        s"vector $i mismatch")
    }
    // interpreted eval path (no codegen): evaluate the expression directly
    (0 until 10).foreach { i =>
      val v = pseudoVec(i, dim)
      val expr = LshSig(
        org.apache.spark.sql.catalyst.expressions.Literal.create(v,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)),
        nbits, tables, dim, seed)
      val out = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
      assert(out == reference(v, nbits, tables, seed), s"interpreted $i mismatch")
    }
  }

  test("single-table lshBuckets matches table 0 of the banded form") {
    val dim = 16
    val rows = (0 until 20).map(i => (i.toLong, pseudoVec(i, dim))).toDF("id", "v")
    val single = Similarity.lshBuckets(rows, "id", "v", nbits = 8, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val banded = Similarity.lshBucketsBanded(rows, "id", "v", nbits = 8,
        tables = 2, dim = dim)
      .filter(col("t") === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(single == banded)
  }

  test("SQL surface: lsh_sig resolves via extensions with validated args") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    org.apache.spark.sql.GraftTestShim.registerFunctions(ext,
      spark.sessionState.functionRegistry)
    Seq(Tuple1(Array(0.5, -0.25, 0.125, 1.0))).toDF("v")
      .createOrReplaceTempView("lsh_vecs")
    val sig = spark.sql("SELECT lsh_sig(v, 4, 2, 4, 42L) AS s FROM lsh_vecs")
      .head().getSeq[Long](0)
    assert(sig.length == 2)
    val bad = intercept[Exception](
      spark.sql("SELECT lsh_sig(v, 4) FROM lsh_vecs").collect())
    assert(bad.getMessage.contains("5 arguments"))
  }
}
