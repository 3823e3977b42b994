package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked retrieval over a tokenized corpus: BM25 (and its tf-idf
  * degenerate) for query-driven corpus slicing — "give me the documents
  * most about X" is a routine curation primitive (topic-targeted
  * sampling, contamination checks against eval sets).
  *
  * Scale design:
  *   - the query-term filter lands BEFORE any aggregation, so only the
  *     postings of the |q| query terms ever shuffle — the corpus-wide
  *     (doc, term) matrix is never materialized;
  *   - document lengths and corpus stats (N, avg len) are one partial
  *     aggregation each; term document-frequencies are |q| rows,
  *     broadcast back;
  *   - top-k = global sort + limit → `TakeOrderedAndProject` (per-
  *     partition heaps, no global sort), ranks attached by the
  *     zipWithIndex-based `Joins.globalRowIds` on the k-row result —
  *     never a whole-corpus window.
  *
  * Determinism (what makes `q_bm25` oracle-hash-exact): `ln` is the one
  * non-deterministic ingredient across engines — JVM `Math.log` and
  * DuckDB's libm disagree by 1 ulp on ~0.1% of inputs (measured). Each
  * per-term score is therefore rounded to 9 dp (absorbing ulp noise)
  * and summed as DECIMAL (exact, order-independent); the displayed
  * score rounds to 6 dp. Ranking uses the rounded score with a doc-id
  * tie-break on both engines.
  */
object Retrieval {

  /** BM25 top-k: (rank, doc id, score) for the disjunctive query
    * `queryTerms`. Standard Robertson idf = ln((N - df + 0.5)/(df + 0.5) + 1).
    */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queryTerms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = bm25Scored(docs, textCol, idCol, queryTerms, k, k1, b)
    Joins.globalRowIds(scored, Seq(col("score").desc, col(idCol)), "rank")
      .select(col("rank"), col(idCol), col("score"))
  }

  /** The scoring stage of [[bm25TopK]] without the rank column — the
    * top-k (doc id, score) frame. Separated so the scoring plan is
    * inspectable (the zipWithIndex rank attach crosses an RDD boundary
    * that hides everything upstream from explain).
    */
  def bm25Scored(docs: DataFrame, textCol: String, idCol: String,
                 queryTerms: Seq[String], k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val lens = docs.select(col(idCol),
      size(TextFunctions.tokens(col(textCol))).cast("double").as("dl"))
    val stats = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avg_dl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(idCol, "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val termScore = tf
      .join(broadcast(dfreq), "term")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("s",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avg_dl"))))
    termScore
      .groupBy(idCol)
      .agg(sum(round(col("s"), 9).cast("decimal(27,9)")).as("sd"))
      .select(col(idCol), round(col("sd").cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
