package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The hashed-linear-classifier feature fold as ONE native expression:
  * `[n_feats, w_sum]` over the unigram+bigram hashing-trick features of
  * `lower(trim(text))` — value-identical to the composed
  * tokens ++ ngrams → transform(md5-bucket-weight) → aggregate(sum)
  * form it replaces (`TextQuality.hashedLinearScoreComposed`, kept as
  * the equivalence witness), but with none of its costs: Spark's
  * `transform`/`aggregate` higher-order functions are CodegenFallback
  * (interpreted lambda plumbing, per-row closure dispatch), and the
  * composed form also materializes the token array, the bigram-string
  * array, their concatenation, AND a weights array per document. Here
  * the features stream through one md5 each with two running longs of
  * state — the classifier's scan stays pure map work at any corpus
  * size, now without per-row array garbage.
  *
  * Exact-compatibility notes (each pinned by HashedFeatScoreSpec's
  * property check against the composed witness):
  *   - trim-then-lower in UTF8String space = `lower(trim(c))`;
  *   - tokenization is Spark `split(c, "\s+")` semantics — java split
  *     with limit −1 — INCLUDING the empty-token edge cases: a leading
  *     `""` when the trimmed text starts with non-space `\s`, a
  *     trailing `""` when it ends with one (limit −1 keeps trailing
  *     empty fields, unlike bare java split), and `[""]` for empty
  *     text; empty tokens hash like any feature;
  *   - `\s` is ASCII-only, so byte-scanning is UTF-8-safe
  *     (continuation bytes never collide with whitespace);
  *   - weight = `(uint32(md5[0..3]) % buckets) % 2001 − 1000`, the
  *     first-8-hex-chars parse without the hex string.
  */
case class HashedFeatScore(child: Expression, buckets: Int,
                           table: Option[Array[Long]] = None)
    extends UnaryExpression {

  require(buckets > 0, "buckets must be positive")
  require(table.forall(_.length == buckets),
    "weight table must have exactly `buckets` entries")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_feat_score requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_feat_score"

  override def nullSafeEval(input: Any): Any = new GenericArrayData(
    HashedFeatScore.score(input.asInstanceOf[UTF8String], buckets, table.orNull))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // a TRAINED table ships into the generated class as one reference
    // field — per-row work is an array index either way
    val tableRef = table match {
      case Some(t) => ctx.addReferenceObj("featTable", t, "long[]")
      case None => "null"
    }
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.HashedFeatScore.score($s, $buckets, $tableRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedFeatScore =
    copy(child = newChild)

  // the synthesized case-class equals compares Array[Long] by
  // REFERENCE, so two semantically identical trained expressions never
  // compared equal under plan canonicalization (missed subexpression
  // elimination — two hashedLinearScoreWeighted columns over the same
  // table would fold twice); deep-compare the table instead
  override def equals(o: Any): Boolean = o match {
    case h: HashedFeatScore =>
      h.child == child && h.buckets == buckets &&
        ((h.table, table) match {
          case (Some(a), Some(b)) => java.util.Arrays.equals(a, b)
          case (None, None)       => true
          case _                  => false
        })
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(
    child, Int.box(buckets),
    Int.box(table.map(java.util.Arrays.hashCode).getOrElse(0)))
}

object HashedFeatScore {
  /** Column-level entry: wraps the expression directly (no registry).
    * `table`: an optional TRAINED weight row per bucket (fixed-point
    * longs — the caller picks the scale; integer summation keeps the
    * score order-free and bit-reproducible, exactly like the derived
    * default). None = the deterministic `(bucket % 2001) − 1000`
    * stand-in.
    */
  def featScore(c: Column, buckets: Int,
                table: Option[Array[Long]] = None): Column =
    GraftColumnShim.column(
      HashedFeatScore(GraftColumnShim.expression(c), buckets, table))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  // one MessageDigest per thread, reset per feature — DigestUtils.md5
  // would pay MessageDigest.getInstance (provider lookup + allocation)
  // for EVERY token and bigram in the hot map loop (the same fix
  // Md5MinHashSig applies via codegen mutable state; a ThreadLocal is
  // the static-helper equivalent)
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def weight(f: String, buckets: Int, table: Array[Long]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
      ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    val bucket = (v % buckets).toInt
    if (table == null) bucket % 2001 - 1000 else table(bucket)
  }

  /** `[n_feats, w_sum]` — one shared implementation for eval + codegen. */
  def score(s: UTF8String, buckets: Int, table: Array[Long] = null): Array[Long] = {
    val str = s.trim().toLowerCase().toString
    // Spark split(str, "\\s+") = java split with limit -1: [""] for
    // empty input, a leading "" element when the string starts with a
    // separator, AND a trailing "" element when it ends with one
    // (limit -1 keeps trailing empty fields — unlike bare java split)
    val toks = new scala.collection.mutable.ArrayBuffer[String](16)
    val len = str.length
    if (len == 0) toks += ""
    else {
      var i = 0
      if (isWs(str.charAt(0))) toks += ""
      while (i < len) {
        while (i < len && isWs(str.charAt(i))) i += 1
        if (i < len) {
          val start = i
          while (i < len && !isWs(str.charAt(i))) i += 1
          toks += str.substring(start, i)
        }
      }
      if (isWs(str.charAt(len - 1))) toks += ""
    }
    var nFeats = 0L
    var wSum = 0L
    var i = 0
    val n = toks.length
    while (i < n) {
      nFeats += 1
      wSum += weight(toks(i), buckets, table)
      if (i + 1 < n) {
        nFeats += 1
        wSum += weight(toks(i) + "_" + toks(i + 1), buckets, table)
      }
      i += 1
    }
    Array(nFeats, wSum)
  }
}
