package graft.pipelines

import graft.operators.{Graph, TextDedup, TextQuality}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the composition a data pipeline
  * actually ships — near-dup CLUSTER dedup (not just pair detection),
  * then repetition/quality gates. One retained row per kept document
  * with the metrics that justified keeping it.
  *
  * Scale shape: every stage is an already-audited operator —
  * `jaccardPairs` (swap in `minhashLshPairs` for 100 TB: same (a, b)
  * pair interface, approximate instead of exact), `Graph.dedupClusters`
  * (alternating-star CC), `TextQuality.repetitionReport` (map-side
  * folds + partial-aggregated gram counts). The final assembly is two
  * joins on the doc id: one left_semi against the canonical set (no
  * payload duplication), one to attach metrics.
  */
object CorpusCuration {

  def curate(docs: DataFrame, textCol: String, idCol: String,
             minTokens: Int = 25, maxDupFrac: Double = 0.65,
             maxTopGramFrac: Double = 0.15,
             jaccardThreshold: Double = 0.8): DataFrame = {
    val pairs = TextDedup.jaccardPairs(docs, textCol, idCol,
      n = 3, threshold = jaccardThreshold)
    val canonical = Graph.dedupClusters(docs, idCol, pairs, "doc_a", "doc_b")
      .filter(col("is_canonical")).select(idCol)
    // semi-join BEFORE the metric computation: per-doc metrics commute
    // with the filter, so the gram aggregation only runs over cluster
    // survivors (at scale, the duplicate fraction this skips is large)
    TextQuality.repetitionReport(
        docs.join(canonical, Seq(idCol), "left_semi"), textCol, idCol, n = 2)
      .filter(col("n_tokens") >= minTokens &&
        col("dup_token_frac") <= maxDupFrac &&
        col("top_ngram_frac") <= maxTopGramFrac)
      .select(col(idCol), col("n_tokens"), col("dup_token_frac"),
        col("top_ngram_frac"))
  }

  /** The 100 TB variant of [[curate]]: identical gates, but near-dup
    * pairs come from MinHash+LSH (`minhashLshPairs` with a hot-bucket
    * cap) instead of the quadratic exact path — the documented swap, as
    * one call. Recall < 1 by design (banded LSH); exact duplicates
    * always collide in every band, so exact-dup collapse is preserved.
    */
  def curateAtScale(docs: DataFrame, textCol: String, idCol: String,
                    minTokens: Int = 25, maxDupFrac: Double = 0.65,
                    maxTopGramFrac: Double = 0.15,
                    lshThreshold: Double = 0.8, k: Int = 32, bands: Int = 8,
                    maxBucketSize: Int = 100000): DataFrame = {
    val pairs = TextDedup.minhashLshPairs(docs, textCol, idCol,
      n = 3, k = k, bands = bands, threshold = lshThreshold,
      maxBucketSize = maxBucketSize)
    gateCanonical(docs, textCol, idCol, pairs,
      minTokens, maxDupFrac, maxTopGramFrac)
  }

  /** [[curateAtScale]] with the engine-portable LSH pair stage
    * (`minhashLshPairsPortable`, md5 double-hashing family) — identical
    * cluster/gate composition, but every stage is expressible in plain
    * SQL, so the WHOLE 100 TB curation path (LSH pairs → transitive
    * closure → repetition gates) is DuckDB-oracle-checkable end to end.
    * The xxhash64 production form stays golden-pinned.
    */
  def curateAtScalePortable(docs: DataFrame, textCol: String, idCol: String,
                            minTokens: Int = 25, maxDupFrac: Double = 0.65,
                            maxTopGramFrac: Double = 0.15,
                            lshThreshold: Double = 0.8,
                            k: Int = 16, bands: Int = 4): DataFrame = {
    val pairs = TextDedup.minhashLshPairsPortable(docs, textCol, idCol,
      n = 3, k = k, bands = bands, threshold = lshThreshold)
    gateCanonical(docs, textCol, idCol, pairs,
      minTokens, maxDupFrac, maxTopGramFrac)
  }

  /** Bounded-error verdict for the xxhash64 fast curation path: its
    * kept set rides on engine-specific hashes, but it must agree with
    * the EXACT path ([[curate]], whose quadratic pair stage is the
    * DuckDB-oracled q_curate_full) — banded LSH at k=32/bands=8 has
    * near-1 recall on the far-from-threshold near-dup clusters real
    * corpora exhibit, and guaranteed recall on exact duplicates. (The
    * md5 PORTABLE twin is deliberately NOT the comparator: at k=16 its
    * est-Jaccard filter admits many false-positive pairs, over-merging
    * clusters — a property of that verification twin, not of the fast
    * path.) Emits the corpus size and the exact kept-count (engine-
    * reproducible) plus an agreement verdict: symmetric difference of
    * the two kept sets ≤ `maxDisagreeFrac` of the kept count.
    */
  def curateAgreementReport(docs: DataFrame, textCol: String, idCol: String,
                            maxDisagreeFrac: Double = 0.01): DataFrame =
    agreementVerdict(docs, docs, textCol, idCol, "n_kept_exact", maxDisagreeFrac)

  /** Shared verdict body of the full and sampled agreement reports:
    * run BOTH curation paths over `universe`, compare kept sets, attach
    * the full-corpus doc count — one place for the disagreement
    * arithmetic so the two reports can never diverge on it.
    */
  private def agreementVerdict(allDocs: DataFrame, universe: DataFrame,
                               textCol: String, idCol: String,
                               keptCol: String,
                               maxDisagreeFrac: Double): DataFrame = {
    val fast = curateAtScale(universe, textCol, idCol)
      .select(col(idCol).as("_id")).withColumn("_f", lit(1))
    val exactKept = curate(universe, textCol, idCol)
      .select(col(idCol).as("_id")).withColumn("_e", lit(1))
    val agg = fast.join(exactKept, Seq("_id"), "full_outer")
      .agg(count(col("_e")).as(keptCol),
        count(when(col("_f").isNotNull && col("_e").isNull, 1)).as("_of"),
        count(when(col("_e").isNotNull && col("_f").isNull, 1)).as("_oe"))
    allDocs.agg(count(lit(1)).as("n_docs")).crossJoin(agg)
      .select(col("n_docs"), col(keptCol),
        ((col("_of") + col("_oe")) <=
          greatest(col(keptCol), lit(1L)) * maxDisagreeFrac)
          .as("fast_path_agrees_ok"))
  }

  /** [[curateAgreementReport]] with BOTH curation paths run over a
    * deterministic md5 document sample — the 100 TB form of the verdict,
    * where the exact path's quadratic pair stage cannot run corpus-wide.
    * Unlike the pair-level sampled report (where restricting full-corpus
    * LSH pairs to sampled endpoints is exact), a KEPT SET depends on
    * whole-corpus clustering — a doc's canonical status can hinge on a
    * near-twin outside the sample — so the only sound comparison runs
    * both paths over the SAME subcorpus: the verdict is then an exact
    * fast-vs-exact agreement on that md5-uniform subcorpus, not an
    * approximation with boundary artifacts. `n_docs` stays the full
    * corpus count; `n_kept_exact_sampled` is md5-deterministic and
    * DuckDB-oracle-checkable.
    *
    * This is what the sf10 bench gate runs; the full-corpus fast path
    * is exercised at scale by its portable twin (q_curate_lsh_md5 in
    * the same gate group), and the full-exact verdict stays on the
    * sf0.01/sf0.1 oracle gates (SCALE.md "Round-11 gate stabilization").
    */
  def curateAgreementSampledReport(docs: DataFrame, textCol: String, idCol: String,
                                   maxDisagreeFrac: Double = 0.01,
                                   sampleFrac: Double = 0.25): DataFrame = {
    require(sampleFrac > 0.0 && sampleFrac <= 1.0,
      s"sampleFrac must be in (0, 1], got $sampleFrac")
    val sample = docs.filter(
      graft.functions.TextFunctions.md5SampleFilter(col(idCol), sampleFrac))
    agreementVerdict(docs, sample, textCol, idCol, "n_kept_exact_sampled",
      maxDisagreeFrac)
  }

  /** [[curateAgreementSampledReport]] with a FIXED md5 document panel
    * instead of a fraction — the SF-invariant form (a fractional
    * subcorpus keeps the exact path's pair stage at (frac·N)², still
    * quadratic in the corpus). Same soundness argument: kept sets are
    * whole-subcorpus-clustering-dependent, so both paths run over the
    * SAME md5-uniform panel; the verdict is an exact fast-vs-exact
    * agreement on that panel at constant cost regardless of corpus
    * size. `n_docs` stays the full corpus count.
    */
  def curateAgreementBudgetReport(docs: DataFrame, textCol: String, idCol: String,
                                  maxDisagreeFrac: Double = 0.01,
                                  panelBudget: Int = 1280,
                                  panelTag: String = "clp"): DataFrame = {
    val panel = graft.operators.TextDedup.md5Panel(
        docs.select(col(idCol), col(textCol)), idCol, panelBudget, panelTag)
      // both curation paths consume the panel; persist so the
      // TakeOrdered selection runs once while the lineage stays
      // visible to plan audits.
      // release: caller-scope, ≤ panelBudget docs (SCALE.md r17 persist audit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    agreementVerdict(docs, panel, textCol, idCol, "n_kept_exact_sampled",
      maxDisagreeFrac)
  }

  /** Shared tail of the at-scale curation forms: transitive-closure
    * canonical set from the (doc_a, doc_b) pair frame, then the
    * repetition gates over the survivors only.
    */
  private def gateCanonical(docs: DataFrame, textCol: String, idCol: String,
                            pairs: DataFrame, minTokens: Int,
                            maxDupFrac: Double, maxTopGramFrac: Double): DataFrame = {
    val canonical = Graph.dedupClusters(docs, idCol,
        pairs.select("doc_a", "doc_b"), "doc_a", "doc_b")
      .filter(col("is_canonical")).select(idCol)
    TextQuality.repetitionReport(
        docs.join(canonical, Seq(idCol), "left_semi"), textCol, idCol, n = 2)
      .filter(col("n_tokens") >= minTokens &&
        col("dup_token_frac") <= maxDupFrac &&
        col("top_ngram_frac") <= maxTopGramFrac)
      .select(col(idCol), col("n_tokens"), col("dup_token_frac"),
        col("top_ngram_frac"))
  }
}
