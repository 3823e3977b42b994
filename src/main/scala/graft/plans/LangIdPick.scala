package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID pick over a token array: one pass counts stopword
  * hits for every candidate language at once, then argmax with an
  * `und` floor — replacing the composed Column form, which evaluated a
  * `filter(toks, isin(...))` per LANGUAGE per row (k filtered array
  * allocations per document; `ArrayFilter` is CodegenFallback, so every
  * row also dropped out of whole-stage codegen). Measured 4 ms/doc
  * composed vs one hash probe per (token, language) here.
  *
  * Semantics are bit-compatible with the composed form (the q_lang_id
  * DuckDB oracle mirrors it):
  *   - score(lang) = stopword hits / max(numTokens, 1), double division;
  *   - winner = max by (score, lang) — the struct array_max ordering,
  *     so equal scores pick the lexicographically LARGEST language;
  *   - winner below `minScore` → "und"; null token array → null
  *     (the Column wrapper supplies the same null text → null result).
  */
case class LangIdPick(child: Expression,
                      langWords: Seq[(String, Seq[String])],
                      minScore: Double) extends UnaryExpression {

  require(langWords.nonEmpty, "lang_id: need at least one language")

  // sorted language list with UTF8 stopword hash sets; built once per
  // expression instance, shipped to executors inside the reference object
  @transient private lazy val sortedLangs = langWords.sortBy(_._1)
  @transient private lazy val langNames: Array[UTF8String] =
    sortedLangs.map(l => UTF8String.fromString(l._1)).toArray
  @transient private lazy val stopSets: Array[java.util.HashSet[UTF8String]] =
    sortedLangs.map { case (_, words) =>
      val set = new java.util.HashSet[UTF8String](words.length * 2)
      words.foreach(w => set.add(UTF8String.fromString(w)))
      set
    }.toArray
  @transient private lazy val und = UTF8String.fromString("und")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires array<string> tokens, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  /** Single-pass scoring; called from both interpreted and generated
    * code paths (the generated code holds `this` as a reference object —
    * one virtual call per row, loop stays JIT-compiled here).
    */
  def pick(a: Any): UTF8String = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = langNames.length
    val hits = new Array[Int](k)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          if (stopSets(j).contains(tok)) hits(j) += 1
          j += 1
        }
      }
      i += 1
    }
    val denom = math.max(n, 1).toDouble
    var bestScore = Double.NegativeInfinity
    var bestLang: UTF8String = null
    var j = 0
    while (j < k) {
      val score = hits(j).toDouble / denom
      // ascending lang order + >= : equal scores keep the later
      // (lexicographically larger) language — the struct-max tie-break
      if (score >= bestScore) { bestScore = score; bestLang = langNames(j) }
      j += 1
    }
    if (bestScore >= minScore) bestLang else und
  }

  override def nullSafeEval(a: Any): Any = pick(a)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val ref = ctx.addReferenceObj("langIdPick", this, classOf[LangIdPick].getName)
      s"${ev.value} = $ref.pick($arr);"
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdPick =
    copy(child = newChild)
}

object LangIdPick {
  /** Column-level entry over a token-array column. */
  def pick(tokens: Column, langWords: Map[String, Seq[String]],
           minScore: Double): Column =
    GraftColumnShim.column(
      LangIdPick(GraftColumnShim.expression(tokens), langWords.toSeq, minScore))
}
