package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality filtering for training corpora — the
  * Gopher-rules family the reference has no analogue for (its texts are
  * finance rows, not documents): machine-generated and boilerplate pages
  * are dominated by repeated n-grams, and the standard curation move is
  * to score repetition per document and drop the tail.
  *
  * Scale design: the scalar signals (duplicate-token fraction, longest
  * same-token run) are fold expressions over the token array — map-side,
  * codegen'd, zero shuffle ([[TextFunctions.repetitionStruct]]). The
  * top-n-gram dominance score needs a per-document mode, which no scalar
  * expression computes without O(len²) work — so it is an explode +
  * two-stage aggregation: groupBy (doc, gram) with map-side partial
  * counts, then max_by per doc. Two shuffles, both on compact keys, both
  * partially aggregated — the shape that survives 100 TB.
  */
object TextQuality {

  /** Stateless quality-gate predicate over the scalar repetition
    * signals — a single fold expression, so it applies IDENTICALLY to a
    * batch frame and a Structured Streaming source (no aggregation, no
    * state, no watermark): `stream.filter(scalarGate(col("text"), ...))`
    * is the streaming ingest-time quality filter. The top-n-gram
    * dominance gate needs a per-doc mode (an aggregation) and therefore
    * lives in [[repetitionReport]]/batch only.
    */
  def scalarGate(text: Column, minTokens: Int = 25,
                 maxDupFrac: Double = 0.65, maxTokenRun: Long = 10L): Column = {
    val r = TextFunctions.repetitionStruct(text)
    r.getField("n_tokens") >= minTokens &&
      r.getField("dup_token_frac") <= maxDupFrac &&
      r.getField("max_token_run") <= maxTokenRun
  }

  /** Temperature-scaled mixture shares (the mT5/XLM-R multilingual
    * rebalance): stratum i samples with share wᵢ^α / Σ wⱼ^α, α < 1
    * upweighting low-resource strata relative to their raw token mass.
    * α = 0.5 (temperature 2, the common setting) runs on `sqrt` — IEEE
    * correctly-rounded, so shares are bit-identical cross-engine under
    * the round9 + DECIMAL-sum discipline; other α use `pow`, whose last
    * ulp is libm-specific — still deterministic per engine, but only
    * the 0.5 path is oracle-pinned. Feed the shares to [[mixturePlan]]
    * for rates/epochs against a token budget.
    */
  def temperatureShares(df: DataFrame, stratumCol: String, weight: Column,
                        alpha: Double = 0.5): DataFrame = {
    val w = df.groupBy(stratumCol)
      .agg(sum(weight).as("weight"))
      .select(col(stratumCol), col("weight"),
        round(if (alpha == 0.5) sqrt(col("weight"))
              else pow(col("weight"), lit(alpha)), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 9)).as("_w"))
    w.crossJoin(w.agg(sum(col("_w")).as("_tw")))
      .select(col(stratumCol), col("weight"),
        round(col("_w").cast("double") / col("_tw").cast("double"), 9)
          .as("share"))
  }

  /** Per-group EXACT quantile gate: keep rows whose `value` is at or
    * above the group's p-quantile (discrete — the value at ascending
    * rank ⌈p·n⌉, so the threshold is always a value that EXISTS in the
    * group; invariant to tie order). The "drop the bottom half by
    * quality, per language" curation step with a deterministic,
    * engine-portable cutoff — unlike a rate-based sampler this adapts
    * to each group's own distribution. Costs one per-group sort window
    * + a broadcast-back of the (tiny) threshold table; at 100 TB swap
    * the threshold stage for [[Aggs.quantileSketches]] (approximate
    * cutoff, no sort) and keep the same gate join.
    */
  def quantileGate(df: DataFrame, groupCol: String, value: Column,
                   p: Double, tieBreak: Column): DataFrame = {
    // p = 0 would make ceil(p·n) = 0 — no threshold row exists, and the
    // gate join would silently drop EVERY group instead of keeping all.
    require(p > 0.0 && p <= 1.0, s"quantileGate: p must be in (0, 1], got $p")
    import org.apache.spark.sql.expressions.Window
    val thr = df
      .select(col(groupCol), value.as("_v"), tieBreak.as("_t"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(col("_v").asc, col("_t").asc)))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .filter(col("_rn") === ceil(lit(p) * col("_n")).cast("long"))
      .select(col(groupCol), col("_v").as("_thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(value >= col("_thr"))
      .drop("_thr")
  }

  /** Deterministic mixture sampling: per-stratum keep rates — the
    * "training mix" step (keep 30% of web, 100% of books…). Built on
    * the same hash-mod filter as [[TextFunctions.hashSampleFilter]], so
    * the kept set is reproducible across runs, engines, partitionings,
    * and cluster sizes, and is a SUPERSET-stable family: lowering a
    * stratum's rate keeps a subset of the previous sample (hash
    * threshold shrinks) — the property that makes mix ablations
    * comparable. Strata absent from `rates` are dropped.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, key: Column,
                    rates: Map[String, Double], salt: Int = 0): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(key, lit(salt)), lit(10000)) <
      (rateCol * 10000).cast("int"))
  }

  /** EXACTLY k rows per group, deterministically: rows rank by the md5
    * hex of their key (a uniform, engine-portable pseudo-random order —
    * md5 hashes identically everywhere, unlike xxhash64) and the first
    * k per group survive. `key` must UNIQUELY identify rows — duplicate
    * keys make the order between their rows arbitrary.
    *
    * Two-phase top-k so no window ever sorts a whole hot group: phase 1
    * takes each (group, salt-bucket)'s top k (64 bounded partitions per
    * group), phase 2 re-ranks the ≤ 64·k survivors per group — the
    * global top-k of a union of per-bucket top-ks is exactly the global
    * top-k, same discipline as the salted aggregations. Complements
    * [[mixtureSample]] (rate-based, approximate counts) when quotas
    * must be exact — eval-set construction, per-language caps.
    */
  def sampleKPerGroup(df: DataFrame, groupCol: String, key: Column,
                      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    val saltBuckets = 64
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("_salt"))
      .orderBy(col("_ord"), col("_key"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_ord"), col("_key"))
    df.withColumn("_key", key.cast("string"))
      .withColumn("_ord", md5(concat(col("_key"), lit(salt))))
      .withColumn("_salt", pmod(xxhash64(col("_key")), lit(saltBuckets)))
      .withColumn("_r1", row_number().over(w1)).filter(col("_r1") <= k)
      .withColumn("_r2", row_number().over(w2)).filter(col("_r2") <= k)
      .drop("_key", "_ord", "_salt", "_r1", "_r2")
  }

  /** Systematic probability-proportional-to-size (PPS) sampling:
    * EXACTLY `k` inclusion hits per stratum, each row hit with
    * probability proportional to its non-negative INTEGER weight
    * (token count is the natural one — "sample 1000 documents per
    * source, long documents proportionally more often", the
    * token-budget-aware complement of [[sampleKPerGroup]]'s uniform
    * quota). Classic systematic PPS over a deterministic md5 order:
    * a row is hit once for every multiple of total/k its weight span
    * covers, so a row heavier than total/k gets n_hits > 1 — a
    * deterministic upsampling count (exactly what a training mix does
    * with a rare high-value stratum). Σ n_hits = k per stratum, always.
    *
    * Every quantity is integer-exact — md5 ordering, DECIMAL(38,0)
    * cumulative sums, integral division — so the selected set is
    * bit-identical across engines, runs, and partitionings (no
    * float u^(1/w) key to diverge by an ulp and flip a selection).
    * Zero-weight rows are excluded (a zero-span row can never cover a
    * multiple); negative weights assert per row.
    *
    * Scale: one shuffle on the stratum; the cumulative window sorts
    * within each stratum — bounded by stratum size. For a single
    * mega-stratum, the [[graft.operators.Joins]] globalPrefixSum
    * range-partition pattern replaces the window; the selection
    * arithmetic is unchanged.
    */
  def ppsSample(df: DataFrame, stratumCol: String, idCol: String,
                weight: Column, k: Int, seed: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    val w = when(
      assert_true(weight >= 0, concat(lit("ppsSample: negative weight "),
        weight.cast("string"), lit(" — weights must be non-negative integers"))).isNull,
      weight.cast("decimal(38,0)"))
    val cumWin = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("_ord"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totWin = org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))
    df.select(col(stratumCol), col(idCol), w.as("_w"),
        md5(concat(col(idCol).cast("string"), lit(seed))).as("_ord"))
      .filter(col("_w") > 0)
      .withColumn("_cum", sum(col("_w")).over(cumWin))
      .withColumn("_tot", sum(col("_w")).over(totWin))
      .withColumn("n_hits",
        expr(s"(_cum * $k) div _tot") - expr(s"((_cum - _w) * $k) div _tot"))
      .filter(col("n_hits") > 0)
      .select(col(stratumCol), col(idCol),
        col("_w").cast("long").as("weight"), col("n_hits"))
  }

  /** CCNet-style n-gram LM quality scoring: fit an add-α-smoothed
    * bigram language model on a REFERENCE corpus (the "good text" slice
    * — wikipedia in CCNet), score every target document by its mean
    * bigram log-probability, and gate/bucket on the score. The standard
    * model-based quality filter, expressed as counts + joins:
    *   P(w2|w1) = (c(w1,w2) + α) / (c(w1,·) + α·V)
    * with V = reference vocabulary size; unseen bigrams smooth toward
    * α/(c+αV), unseen heads to 1/V. Higher (less negative) avg_logprob
    * = more reference-like text.
    *
    * Output: one row per target doc — (id, n_bigrams, avg_logprob);
    * docs with < 2 tokens have n_bigrams 0 and a NULL score (explicitly
    * unscorable, never NaN).
    *
    * Scale: the reference reduces to a (w1, w2, count) table in one
    * partial-agg'd pass — head counts and vocabulary derive from THAT
    * table, never a second reference scan; scoring is two equi-joins on
    * compact string keys (broadcast when the model is small, shuffle
    * hash otherwise) and one partial-agg'd per-doc sum. The only
    * transcendental (ln) rounds to 9 dp into a DECIMAL sum — the same
    * ulp-hardening as BM25/JS — so scores are oracle-exact cross-engine.
    * Bigram keys join the two tokens with a space: tokens come from a
    * whitespace split, so the separator can never occur inside a token.
    */
  def bigramLmScore(target: DataFrame, ref: DataFrame, textCol: String,
                    idCol: String, alpha: Int = 1): DataFrame = {
    require(alpha > 0, "alpha must be positive (zero breaks smoothing)")
    def pairs(c: Column): Column = {
      val ws = TextFunctions.tokens(c)
      filter(zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => when(a.isNull || b.isNull, lit(null))
          .otherwise(concat(a, lit(" "), b))), x => x.isNotNull)
    }
    // the model: one pass over the reference → (bigram, c12); heads and
    // vocabulary derive from it (persisted — it feeds three consumers)
    val c12 = ref.select(explode(pairs(col(textCol))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
      // release: caller-scope (SCALE.md r17 persist audit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val heads = c12
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = c12
      .select(substring_index(col("bg"), " ", 1).as("w"))
      .union(c12.select(substring_index(col("bg"), " ", -1).as("w")))
      .agg(count_distinct(col("w")).as("v"))
    val scored = target
      .select(col(idCol), explode(pairs(col(textCol))).as("bg"))
      .join(c12, Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(heads, Seq("w1"), "left")
      .crossJoin(vocab)
      .select(col(idCol),
        round(log((coalesce(col("c12"), lit(0L)) + alpha).cast("double") /
            (coalesce(col("c1"), lit(0L)) + lit(alpha) * col("v"))), 9)
          .cast("decimal(28,9)").as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
    target.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        (col("slp").cast("double") / col("n_bigrams")).as("avg_logprob"))
  }

  /** Jensen–Shannon divergence between two corpora's token
    * distributions — the training-mix drift check (did this month's
    * crawl shift vocabulary?). Exact token counts via one partial-agg
    * groupBy per side + a full outer join on token; the only
    * transcendental (ln) is rounded to 9 dp per term before a DECIMAL
    * sum, the same ulp-hardening as BM25, so the scalar is
    * oracle-checkable. Returns one row:
    * (js_divergence, n_tokens_a, n_tokens_b, vocab_a, vocab_b).
    * JS = 0.5·Σp·ln(2p/(p+q)) + 0.5·Σq·ln(2q/(p+q)), range [0, ln 2];
    * NULL (explicitly, never NaN) when either corpus is empty — JS
    * against an empty distribution is undefined.
    */
  def vocabDivergence(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    // persist the per-side counts: each feeds BOTH its total and the
    // full-outer join — unpersisted, the whole tokenize/explode/count
    // subtree (the dominant cost) would run twice per side
    def counts(df: DataFrame) = df
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      // release: caller-scope (SCALE.md r17 persist audit)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ca = counts(a); val cb = counts(b)
    val joined = ca.withColumnRenamed("cnt", "ca")
      .join(cb.withColumnRenamed("cnt", "cb"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    // totals straight from the (persisted, vocabulary-sized) per-side
    // counts — no second pass over the join. coalesce(sum, 0): an EMPTY
    // side must yield ta=0 (→ null js below), not a null total
    val totals = ca.agg(coalesce(sum(col("cnt")), lit(0L)).as("ta"))
      .crossJoin(cb.agg(coalesce(sum(col("cnt")), lit(0L)).as("tb")))
    joined.crossJoin(totals)
      .select(col("ca"), col("cb"), col("ta"), col("tb"),
        // try_divide: an empty side has ta=0 — ANSI division would
        // throw; the null result is absorbed by the explicit guard below
        try_divide(col("ca").cast("double"), col("ta")).as("p"),
        try_divide(col("cb").cast("double"), col("tb")).as("q"))
      .select(col("ca"), col("cb"), col("ta"), col("tb"),
        // terms with p=0 (or q=0) contribute 0 to their half
        round(when(col("p") > 0,
          col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))))
          .otherwise(lit(0.0)), 9).cast("decimal(28,9)").as("tp"),
        round(when(col("q") > 0,
          col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
          .otherwise(lit(0.0)), 9).cast("decimal(28,9)").as("tq"))
      .agg(
        // an empty side makes p or q a 0/0 NaN — JS against an empty
        // distribution is undefined, so the scalar is explicitly NULL
        // (never a silent NaN/garbage number)
        when(first(col("ta")) > 0 && first(col("tb")) > 0,
          lit(0.5) * sum(col("tp")).cast("double") +
            lit(0.5) * sum(col("tq")).cast("double"))
          .otherwise(lit(null).cast("double")).as("js_divergence"),
        first(col("ta")).as("n_tokens_a"), first(col("tb")).as("n_tokens_b"),
        sum(when(col("ca") > 0, 1L).otherwise(0L)).as("vocab_a"),
        sum(when(col("cb") > 0, 1L).otherwise(0L)).as("vocab_b"))
  }

  /** Deterministic global corpus shuffle into training shards:
    * (id, shard, pos) where `shard` ∈ [0, nShards) and `pos` is the
    * row's 1-based position within its shard — the "shuffle once, read
    * sequentially" layout every epoch-based training loader wants.
    * Order is the md5 hex of (seed, id): uniform, reproducible across
    * runs/engines/partitionings, and re-seedable per epoch without
    * rewriting data.
    *
    * Scale shape: there is deliberately NO global ordering — a global
    * row_number would funnel the corpus through one partition. The only
    * window is PARTITIONED BY shard (nShards-way parallel); choose
    * nShards so a shard's rows fit an executor sort (at 100 TB:
    * thousands of shards), which is the same sizing the downstream
    * training reader needs anyway. Writers pair this with
    * `.repartition(col("shard")).sortWithinPartitions("pos")`.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    seed: String = ""): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_key"), col(idCol))
    df.select(col(idCol), key.as("_key"))
      .withColumn("shard", shardColumn(col(idCol), nShards, seed))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** THE shard-assignment function — the single definition
    * [[shuffleShards]] and any composed pipeline share, so a manifest
    * computed elsewhere can never drift from the layout the shuffler
    * writes: first 56 bits of md5(seed:id) (BIGINT-safe in every
    * engine) mod nShards. Engine-portable; the DuckDB spelling is
    * `('0x' || substr(md5(seed || ':' || id), 1, 14))::BIGINT % n`.
    */
  def shardColumn(id: Column, nShards: Int, seed: String = ""): Column = {
    require(nShards > 0, "nShards must be positive")
    val key = md5(concat(lit(seed), lit(":"), id.cast("string")))
    pmod(conv(substring(key, 1, 14), 16, 10).cast("long"), lit(nShards.toLong))
  }

  /** Training-mixture planner: given per-stratum target weights and a
    * total token budget, one row per stratum with what the corpus HAS
    * (n_docs, n_tokens) and what the mix NEEDS — target_tokens
    * (⌊weight·budget⌋), sample_rate (≤ 1, the [[mixtureSample]] /
    * hash-filter rate that hits the target), and epochs
    * (⌈target/available⌉ — > 1 means the stratum must repeat to meet its
    * weight, the standard signal that a mix is infeasible without
    * upsampling). Strata absent from `weights` get weight 0 — planned
    * out of the mix. One partial-aggregated pass over the corpus; the
    * plan itself is stratum-count-sized.
    */
  def mixturePlan(df: DataFrame, stratumCol: String, textCol: String,
                  weights: Map[String, Double], tokenBudget: Long): DataFrame = {
    require(weights.values.forall(w => w >= 0.0), "weights must be >= 0")
    require(tokenBudget >= 0, "tokenBudget must be >= 0")
    val wCol = weights.foldLeft(lit(0.0)) { case (acc, (s, w)) =>
      when(col("stratum") === s, lit(w)).otherwise(acc)
    }
    df.select(col(stratumCol).as("stratum"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("_nt"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"))
      .withColumn("weight", wCol)
      .withColumn("target_tokens",
        floor(col("weight") * lit(tokenBudget.toDouble)).cast("long"))
      .withColumn("sample_rate",
        when(col("n_tokens") > 0,
          least(lit(1.0), col("target_tokens").cast("double") / col("n_tokens")))
          .otherwise(lit(0.0)))
      .withColumn("epochs",
        when(col("target_tokens") === 0 || col("n_tokens") === 0, lit(0L))
          .otherwise(ceil(col("target_tokens").cast("double") / col("n_tokens"))
            .cast("long")))
  }

  /** Per-document repetition report:
    * (id, n_tokens, n_distinct_tokens, dup_token_frac, max_token_run,
    *  top_ngram, top_ngram_count, top_ngram_frac).
    * `top_ngram_frac` = occurrences of the most frequent word n-gram over
    * all n-gram slots; ties broken by the lexicographically largest gram
    * (deterministic across engines and partitionings). Documents with
    * fewer than n tokens get (null, 0, 0.0).
    */
  def repetitionReport(df: DataFrame, textCol: String, idCol: String,
                       n: Int = 2): DataFrame = {
    val scalar = df.select(col(idCol),
      TextFunctions.repetitionStruct(col(textCol)).as("_r"))
      .select(col(idCol),
        col("_r.n_tokens").as("n_tokens"),
        col("_r.n_distinct_tokens").as("n_distinct_tokens"),
        col("_r.dup_token_frac").as("dup_token_frac"),
        col("_r.max_token_run").as("max_token_run"))
    val grams = df.select(col(idCol),
        explode(TextFunctions.ngrams(col(textCol), n)).as("gram"))
    val top = grams.groupBy(idCol, "gram").agg(count(lit(1)).as("cnt"))
      .groupBy(idCol)
      .agg(max(struct(col("cnt"), col("gram"))).as("_t"),
        sum(col("cnt")).as("_total"))
      .select(col(idCol), col("_t.gram").as("top_ngram"),
        col("_t.cnt").as("top_ngram_count"),
        (col("_t.cnt").cast("double") / col("_total")).as("top_ngram_frac"))
    scalar.join(top, Seq(idCol), "left")
      .withColumn("top_ngram_count", coalesce(col("top_ngram_count"), lit(0L)))
      .withColumn("top_ngram_frac", coalesce(col("top_ngram_frac"), lit(0.0)))
  }

  /** Deterministic train/val/test split: each row is assigned the split
    * whose cumulative-fraction interval contains the md5 hex of
    * (id, seed) — the standard leakage-safe corpus split. Properties a
    * training pipeline needs, all by construction:
    *
    *   - **document-stable**: assignment is a pure function of the id
    *     (+ seed) — re-runs, engine versions, cluster sizes, and row
    *     order never move a document between splits (unlike
    *     `randomSplit`, which reshuffles whenever partitioning changes);
    *   - **grow-stable**: raising a leading split's fraction only grows
    *     its interval — every document keeps its split unless it crosses
    *     the moved boundary (append-only corpora keep historic splits);
    *   - **engine-portable / oracle-checkable**: md5 hex compares
    *     lexicographically = numerically in lowercase hex in both Spark
    *     and DuckDB ([[TextFunctions.md5SampleFilter]] family; thresholds
    *     via [[TextFunctions.md5SampleThreshold]]).
    *
    * Map-side, codegen'd, zero shuffle — a scan at any scale. A null id
    * hashes to null and lands in the LAST split (both engines: a null
    * comparison fails every `when`).
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)],
                seed: String = "", as: String = "split"): DataFrame = {
    require(splits.size >= 2 && splits.forall(_._2 >= 0.0),
      "need >= 2 splits with non-negative fractions")
    // decimal cumulative sums: 0.8 + 0.1 is 0.9000000000000001 in double,
    // which would silently shift the 'val' boundary off the
    // md5SampleThreshold(0.9) literal an oracle embeds
    val cum = splits.map(x => BigDecimal(x._2)).scanLeft(BigDecimal(0))(_ + _).tail
    require((cum.last - 1).abs < BigDecimal("1e-9"),
      "split fractions must sum to 1")
    val bounds = cum.init.map(c => TextFunctions.md5SampleThreshold(c.toDouble))
    val key = md5(concat(col(idCol).cast("string"), lit(seed)))
    val assigned = bounds.zip(splits.map(_._1)).reverse
      .foldLeft(lit(splits.last._1): Column) { case (acc, (b, name)) =>
        when(key < lit(b), lit(name)).otherwise(acc)
      }
    df.withColumn(as, assigned)
  }

  /** Quality-gate threshold sweep: for each candidate cutoff `t` report
    * how much of the corpus a `scoreCol >= t` gate would KEEP — row
    * count, row fraction, and (optionally) a weight column's kept mass
    * (token counts, bytes). The calibration table a pipeline reads
    * BEFORE committing a gate: "a length floor of 50 keeps 61% of docs
    * but 94% of tokens" is this table's row, and eyeballing it is how
    * cutoffs are actually chosen.
    *
    * Scale shape: ONE corpus pass. Each row is binned to the number of
    * thresholds at or below its score (a grid-sized literal-array fold,
    * codegen'd, map-side), then a partial-aggregated groupBy over ≤
    * |thresholds|+1 bins. The keep-counts are suffix sums over that
    * GRID-sized aggregate — the window runs on ≤ a few hundred rows, a
    * driver-scale frame, never the corpus (contrast the naive form: one
    * corpus scan per threshold, or a corpus × grid cross join). Fractions
    * are single BIGINT-over-BIGINT IEEE divisions — bit-identical
    * cross-engine.
    *
    * Rows with a null score count toward the totals but are kept by no
    * threshold (a gate on a null score drops the row in both engines).
    */
  def thresholdSweep(df: DataFrame, scoreCol: String, thresholds: Seq[Double],
                     weightCol: Option[String] = None): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    require(thresholds == thresholds.sorted && thresholds.distinct == thresholds,
      "thresholds must be strictly ascending")
    val ts = thresholds
    // bin = #thresholds <= score: kept-at-t(i) = rows in bins > i, so
    // keep counts are suffix sums over the per-bin aggregate
    val bin = size(filter(
      array(ts.map(t => (col(scoreCol) >= lit(t)).cast("int")): _*),
      x => x === 1))
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    // sentinel empty top bin: every threshold's suffix range is
    // non-empty (unreachable cutoffs read kept=0 off it), and totals
    // come from an unbounded window over the SAME grid-sized aggregate
    // — re-deriving them from `df` would scan the corpus again (plan
    // pin: exactly one scan)
    val sentinel = df.sparkSession.range(1)
      .select(lit(ts.size).as("_bin"), lit(0L).as("_n"), lit(0L).as("_wsum"))
    val perBin = df.select(bin.as("_bin"), w.as("_w"))
      .groupBy("_bin")
      .agg(count(lit(1)).as("_n"), sum(coalesce(col("_w"), lit(0L))).as("_wsum"))
      .unionByName(sentinel)
      .groupBy("_bin")
      .agg(sum(col("_n")).as("_n"), sum(col("_wsum")).as("_wsum"))
    // grid-sized from here on: |bins| <= |thresholds|+2
    val unb = org.apache.spark.sql.expressions.Window.unboundedPreceding
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("_bin").desc).rowsBetween(unb, 0)
    val winAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("_bin").desc)
      .rowsBetween(unb, org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val suffix = perBin
      .withColumn("_kept_n", sum(col("_n")).over(win))
      .withColumn("_kept_w", sum(col("_wsum")).over(win))
      .withColumn("_tn", sum(col("_n")).over(winAll))
      .withColumn("_tw", sum(col("_wsum")).over(winAll))
    val grid = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(ts.zipWithIndex.map { case (t, i) =>
        org.apache.spark.sql.Row(t, i + 1) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("threshold",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("_minbin",
          org.apache.spark.sql.types.IntegerType, nullable = false))))
    // kept at threshold i = suffix sum over bins >= i, read off at the
    // SMALLEST such bin (min_by); the sentinel guarantees a match
    grid.join(suffix, suffix("_bin") >= grid("_minbin"), "left")
      .groupBy(col("threshold"))
      .agg(min_by(col("_kept_n"), col("_bin")).as("n_kept"),
        min_by(col("_kept_w"), col("_bin")).as("w_kept"),
        max(col("_tn")).as("_tn"), max(col("_tw")).as("_tw"))
      .select(col("threshold"),
        col("n_kept"),
        when(col("_tn") > 0,
          col("n_kept").cast("double") / col("_tn").cast("double")).as("frac_kept"),
        col("w_kept"),
        when(col("_tw") > 0,
          col("w_kept").cast("double") / col("_tw").cast("double")).as("w_frac_kept"))
      .orderBy("threshold")
  }

  /** Calibrate-then-gate: the composition a real curation run executes —
    * [[thresholdSweep]] measures what each candidate cutoff would keep,
    * the STRICTEST grid threshold whose kept-fraction still meets
    * `minFracKept` is chosen, and a `score >= cutoff` gate applies it —
    * all declared as ONE plan (no driver round-trip between the
    * calibration and the gate; the chosen cutoff flows through a 1-row
    * broadcast). The kept-fraction the target applies to is the WEIGHT
    * mass when `weightCol` is given (keep ≥ X of the token/byte mass —
    * the reason a caller passes a weight) and the row fraction
    * otherwise. If even the loosest grid threshold keeps less than the
    * target, that loosest threshold applies (the closest achievable
    * gate) — never a silently-empty result from an infeasible target.
    *
    * Output: the kept rows plus a `cut` column carrying the threshold
    * that was applied, so the decision is visible in the result, not
    * just in logs. Rows with a null score are dropped by any cutoff,
    * matching [[thresholdSweep]]'s accounting.
    *
    * Scale shape: exactly TWO corpus scans — one for the sweep (binned,
    * partial-aggregated, grid-sized from there on), one for the gate —
    * joined by a broadcast of the 1-row cutoff; the gate join is a
    * BroadcastNestedLoopJoin against one row, i.e. a filter. Plan pinned
    * (PlanAuditSpec): 2 scans, no cartesian wider than the 1-row
    * broadcast, partial aggregation intact.
    */
  def calibratedGate(df: DataFrame, scoreCol: String, thresholds: Seq[Double],
                     minFracKept: Double,
                     weightCol: Option[String] = None): DataFrame = {
    require(minFracKept > 0.0 && minFracKept <= 1.0,
      s"calibratedGate: minFracKept must be in (0, 1], got $minFracKept")
    val sweep = thresholdSweep(df, scoreCol, thresholds, weightCol)
    val frac = if (weightCol.isDefined) col("w_frac_kept") else col("frac_kept")
    val cut = sweep.agg(coalesce(
      max(when(frac >= minFracKept, col("threshold"))),
      min(col("threshold"))).as("cut"))
    df.join(broadcast(cut), col(scoreCol) >= col("cut"))
  }

  /** Near-dup split-leakage report: given a per-document split
    * assignment (`hashSplit`'s output shape) and a near-dup pair frame
    * (any of the LSH/exact pair operators), count the pairs whose
    * endpoints fall in each (split, split) cell. Cells with
    * `split_a != split_b` ARE eval contamination: a test document with a
    * train near-twin inflates the benchmark, and the hash split — being
    * content-blind — cannot prevent it. This is the audit a pipeline
    * runs after splitting; the actionable quarantine list is
    * [[leakedDocs]].
    *
    * Output: one row per observed cell (`split_a <= split_b`
    * lexicographically), `n_pairs`, and `n_docs` = distinct documents
    * touching the cell's pairs.
    *
    * Scale shape: the pair frame is the banded-LSH output (sub-quadratic
    * by construction); attaching splits is two equi-joins on the doc id
    * against the map-side split assignment; the report is a
    * partial-aggregated groupBy onto ≤ |splits|² cells. Nothing here
    * rescans text.
    */
  def splitLeakage(assigned: DataFrame, idCol: String, splitCol: String,
                   pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val s = assigned.select(col(idCol).as("_sid"), col(splitCol).as("_split"))
    val joined = pairs.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .join(s.select(col("_sid").as("_a"), col("_split").as("_sa")), Seq("_a"))
      .join(s.select(col("_sid").as("_b"), col("_split").as("_sb")), Seq("_b"))
      .select(col("_a"), col("_b"),
        least(col("_sa"), col("_sb")).as("split_a"),
        greatest(col("_sa"), col("_sb")).as("split_b"))
    // One pass over the joined pairs: exploding both endpoints gives
    // exactly 2 rows per pair, so n_pairs = rows/2 and n_docs =
    // count_distinct in the SAME aggregate — the candidate self-join and
    // both split equi-joins above execute once, not once per metric.
    joined.select(col("split_a"), col("split_b"),
        explode(array(col("_a"), col("_b"))).as("_doc"))
      .groupBy("split_a", "split_b")
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        count_distinct(col("_doc")).as("n_docs"))
      .orderBy("split_a", "split_b")
  }

  /** The quarantine list [[splitLeakage]] motivates: documents assigned
    * to `targetSplit` that have a near-dup partner in ANY other split.
    * Dropping (or re-homing) exactly these rows restores the
    * train/eval independence the hash split intended. One row per
    * leaked document with the count of its cross-split partners —
    * deterministic, re-runnable, and join-backable to the corpus as an
    * anti-join.
    */
  def leakedDocs(assigned: DataFrame, idCol: String, splitCol: String,
                 pairs: DataFrame, aCol: String, bCol: String,
                 targetSplit: String): DataFrame = {
    val s = assigned.select(col(idCol).as("_sid"), col(splitCol).as("_split"))
    val both = pairs.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .join(s.select(col("_sid").as("_a"), col("_split").as("_sa")), Seq("_a"))
      .join(s.select(col("_sid").as("_b"), col("_split").as("_sb")), Seq("_b"))
    // a pair leaks INTO the target from either side
    val hits = both.filter(col("_sa") === targetSplit && col("_sb") =!= targetSplit)
        .select(col("_a").as("doc"))
      .unionAll(both.filter(col("_sb") === targetSplit && col("_sa") =!= targetSplit)
        .select(col("_b").as("doc")))
    hits.groupBy("doc")
      .agg(count(lit(1)).as("n_cross_pairs"))
      .orderBy("doc")
  }

  /** Model-based quality scoring, fastText-shaped: hash unigram +
    * bigram features into `buckets` via the hashing trick, dot the
    * sparse feature vector with a weight table, squash to a keep/drop
    * decision — the "quality classifier" stage of a web-scale curation
    * run (the CCNet/fastText recipe), as distinct from the rule-based
    * gates above.
    *
    * The weight table here is a deterministic stand-in for trained
    * parameters — `w(bucket) = (bucket % 2001 − 1000) / 1000` — so the
    * whole score is replayable bit-exactly by any engine with md5
    * (the DuckDB oracle replays it); swapping in a trained table is a
    * broadcast-map substitution that changes no plan shape.
    *
    * Scale design: the whole feature fold is ONE native codegen'd
    * expression per row ([[graft.plans.HashedFeatScore]] — two running
    * longs of state, no per-row arrays; the first cut composed it from
    * `transform`/`aggregate` HOFs, which are CodegenFallback and
    * allocate four arrays per document). Zero explode, zero shuffle:
    * scoring 100 TB is embarrassingly parallel map work on the corpus
    * scan. Determinism: weights are INTEGERS summed as BIGINT
    * (order-free); the only floating-point op is one final division, so
    * Spark and the oracle agree to the last bit. Null text yields a
    * null score and `keep = false`.
    */
  def hashedLinearScore(df: DataFrame, textCol: String, idCol: String,
                        buckets: Int = 4096, cutoff: Double = 0.0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val sc = graft.plans.HashedFeatScore.featScore(col(textCol), buckets)
    // sc appears twice in the projection; whole-stage codegen's
    // subexpression elimination evaluates it ONCE per row (the same
    // convention every qualityStruct.getField caller relies on). Only
    // interpreted fallback — spec-only territory — pays the fold twice.
    df.select(
        col(idCol),
        sc.getItem(0).as("n_feats"),
        sc.getItem(1).as("w_sum"))
      .withColumn("score",
        when(col("n_feats") > 0, col("w_sum").cast("double") / (col("n_feats") * 1000.0)))
      .withColumn("keep", coalesce(col("score") > cutoff, lit(false)))
  }

  /** [[hashedLinearScore]] with a TRAINED weight table — the promised
    * "swap trained parameters in" is this one-argument substitution,
    * same plan, same zero-shuffle scan. Weights are FIXED-POINT longs
    * (`weightsFx(bucket)`, `buckets = weightsFx.length`; divide by
    * `scale` to read them as reals) so the per-document sum stays
    * integer — order-free and bit-reproducible across engines, exactly
    * like the derived default; one final double division produces the
    * score. Quantize a trained float row with
    * `math.round(w * scale)` — at the default 1e6 scale that is
    * fastText-grade precision.
    */
  def hashedLinearScoreWeighted(df: DataFrame, textCol: String, idCol: String,
                                weightsFx: Array[Long], scale: Double = 1e6,
                                cutoff: Double = 0.0): DataFrame = {
    require(weightsFx.nonEmpty, "weight table must be non-empty")
    val sc = graft.plans.HashedFeatScore.featScore(
      col(textCol), weightsFx.length, Some(weightsFx))
    df.select(
        col(idCol),
        sc.getItem(0).as("n_feats"),
        sc.getItem(1).as("w_sum"))
      .withColumn("score",
        when(col("n_feats") > 0, col("w_sum").cast("double") / (col("n_feats") * scale)))
      .withColumn("keep", coalesce(col("score") > cutoff, lit(false)))
  }

  /** The built-ins composition [[hashedLinearScore]] started as — kept
    * ONLY as the equivalence witness for HashedFeatScoreSpec (the
    * `transform`/`aggregate` HOFs are CodegenFallback and build four
    * per-row arrays; never use this form in a pipeline).
    */
  private[graft] def hashedLinearScoreComposed(
      df: DataFrame, textCol: String, idCol: String,
      buckets: Int = 4096, cutoff: Double = 0.0): DataFrame = {
    val ws = TextFunctions.tokens(col(textCol))
    val feats = concat(ws, TextFunctions.ngrams(col(textCol), 2))
    // md5 leading 8 hex chars → unsigned 32-bit → bucket → centered weight
    val weights = transform(feats, f =>
      (conv(substring(md5(f), 1, 8), 16, 10).cast("long") % buckets) % 2001 - 1000)
    df.select(
        col(idCol),
        size(feats).cast("long").as("n_feats"),
        aggregate(weights, lit(0L), (acc, w) => acc + w).as("w_sum"))
      .withColumn("score",
        when(col("n_feats") > 0, col("w_sum").cast("double") / (col("n_feats") * 1000.0)))
      .withColumn("keep", coalesce(col("score") > cutoff, lit(false)))
  }

  /** CCNet head/middle/tail bucketing: split each language's documents
    * into perplexity terciles of the [[bigramLmScore]] score (head =
    * most reference-like third) — the published CCNet corpus layout
    * that downstream sampling draws from ("take head+middle, drop
    * tail"). Buckets follow the exact per-language rank order
    * (score DESC, id ASC): rank·3 ≤ n → head, rank·3 ≤ 2n → middle,
    * else tail. Docs with a null score (unscorable, < 2 tokens) are
    * excluded — CCNet cannot place what the LM cannot score.
    *
    * Scale design — the naive formulation is `row_number() OVER
    * (PARTITION BY lang)`: a total sort of the corpus with one
    * partition per language, unrunnable at 100 TB with ~30 languages.
    * Instead the corpus compresses to a per-(lang, score) count frame
    * (partial-agg'd, ≤ |distinct scores| rows); cumulative slots and
    * language totals come from windows over THAT aggregated frame; a
    * score value whose slot span [cum+1, cum+c] falls inside one
    * bucket labels all its documents via an equi-join (AQE broadcasts
    * the aggregated side when small). Only the ≤ 2 score values per
    * language that STRADDLE a tercile boundary need intra-value
    * ranking — a window over just those documents, partitioned by
    * (lang, score). The corpus itself is never globally sorted.
    * Bucketing is pure integer arithmetic on exact counts, so the
    * result is bit-identical to the naive window (the oracle replays
    * that form; CcnetSpec pins the equivalence).
    */
  def ccnetBuckets(scored: DataFrame, langCol: String, idCol: String,
                   scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // `scored` is typically a whole LM-scoring pipeline, and this
    // operator fans it into three consumers (the count frame and both
    // join sides) — materialize it ONCE behind a checkpoint (reliable
    // when the session has a checkpoint dir, executor-local otherwise;
    // the Graph convention). Before this, the q_ccnet_buckets plan
    // re-evaluated the scorer per consumer: 41 parquet scans, zero
    // reuse.
    val reliable =
      scored.sparkSession.sparkContext.getCheckpointDir.isDefined
    val s0 = scored.filter(col(scoreCol).isNotNull)
    val s = if (reliable) s0.checkpoint(eager = true)
            else s0.localCheckpoint(eager = true)
    val g = s.groupBy(langCol, scoreCol).agg(count(lit(1)).as("_c"))
    // scores are distinct within (lang) after the groupBy, so the
    // RANGE-framed running sum equals a ROWS frame
    val wCum = Window.partitionBy(langCol).orderBy(col(scoreCol).desc)
    val gg = g
      .withColumn("_cumb", sum("_c").over(wCum) - col("_c"))
      .withColumn("_n", sum("_c").over(Window.partitionBy(langCol)))
    def bucketOf(rn: Column, n: Column): Column =
      when(rn * 3 <= n, "head").when(rn * 3 <= n * 2, "middle")
        .otherwise("tail")
    val gb = gg
      .withColumn("_bfirst", bucketOf(col("_cumb") + 1, col("_n")))
      .withColumn("_blast", bucketOf(col("_cumb") + col("_c"), col("_n")))
    val uniform = s
      .join(gb.filter(col("_bfirst") === col("_blast"))
        .select(col(langCol), col(scoreCol), col("_bfirst").as("bucket")),
        Seq(langCol, scoreCol))
    val wIn = Window.partitionBy(langCol, scoreCol).orderBy(col(idCol).asc)
    val straddle = s
      .join(gb.filter(col("_bfirst") =!= col("_blast"))
        .select(col(langCol), col(scoreCol), col("_cumb"), col("_n")),
        Seq(langCol, scoreCol))
      .withColumn("bucket",
        bucketOf(row_number().over(wIn) + col("_cumb"), col("_n")))
      .drop("_cumb", "_n")
    uniform.unionByName(straddle)
  }

  // ------------------------------------------------------------------
  // DSIR — Data Selection via Importance Resampling (Xie et al. 2023).
  // Select raw-corpus documents that look like a small TARGET set by
  // fitting hashed bag-of-ngrams multinomials on both, scoring each
  // document with the summed per-feature log-likelihood ratio, and
  // Gumbel-top-k resampling on those log weights. The standard
  // published move for "give me 100 B tokens that look like Wikipedia"
  // over a 100 TB crawl.
  // ------------------------------------------------------------------

  /** Fit the DSIR log-ratio table: one combined pass over `df` counts
    * hashed unigram+bigram features (the [[hashedLinearScore]] hashing
    * trick — identical md5-leading-8-hex buckets, so the fitted table
    * feeds [[graft.plans.HashedFeatScore]] unchanged) per bucket for
    * the target (`isTarget`) and raw (rest) populations, then the
    * driver turns counts into fixed-point log ratios:
    *
    *   fx(b) = round(( ln((ct(b)+α)/(T+αB)) − ln((cr(b)+α)/(R+αB)) )·scale)
    *
    * (add-α smoothed multinomial likelihood ratio, α = 0.5 default).
    * Rounding is HALF_UP away from zero — the same rule as Spark's
    * `round()` and DuckDB's `round()`, so an oracle refitting the table
    * in SQL lands on the identical longs (the only cross-engine wiggle
    * is the ≤1-ulp `ln` difference, ~1e-9 per-bucket odds of crossing a
    * rounding boundary — the q_lm_score convention).
    *
    * Scale design: the feature pass is explode → bucket → groupBy(b)
    * with map-side partial counts — ONE shuffle of ≤ `buckets` rows per
    * partition. The collect is the fitted MODEL (`buckets` longs, 32 KB
    * at the 4096 default), not data — same driver-side contract as the
    * BPE merge table, and fail-loud via `maxBuckets` long before it
    * could hurt. Buckets no feature ever hashes to keep the smoothed
    * prior ratio (never looked up; kept principled rather than zero).
    */
  def dsirFitFx(df: DataFrame, isTarget: Column, textCol: String,
                buckets: Int = 4096, alpha: Double = 0.5,
                scale: Double = 1e6, maxBuckets: Int = 1 << 20): Array[Long] = {
    require(buckets > 0 && buckets <= maxBuckets,
      s"buckets=$buckets outside (0, $maxBuckets] — the table is collected " +
        "to the driver as the fitted model; raise maxBuckets only knowingly")
    val feats = concat(TextFunctions.tokens(col(textCol)),
      TextFunctions.ngrams(col(textCol), 2))
    val counts = df
      .select(isTarget.as("_t"), explode(feats).as("_f"))
      .select(col("_t"),
        (conv(substring(md5(col("_f")), 1, 8), 16, 10).cast("long")
          % buckets).as("_b"))
      .groupBy("_b")
      .agg(sum(when(col("_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("_t"), 1L).otherwise(0L)).as("cr"))
      .collect()
    val ct = new Array[Long](buckets)
    val cr = new Array[Long](buckets)
    counts.foreach { r =>
      val b = r.getLong(0).toInt; ct(b) = r.getLong(1); cr(b) = r.getLong(2)
    }
    val tTot = ct.sum.toDouble + alpha * buckets
    val rTot = cr.sum.toDouble + alpha * buckets
    Array.tabulate(buckets) { b =>
      val lr = (math.log((ct(b) + alpha) / tTot)
        - math.log((cr(b) + alpha) / rTot)) * scale
      // HALF_UP away from zero == Spark round() == DuckDB round();
      // Math.round would differ on negative halves (floor(x+0.5))
      java.math.BigDecimal.valueOf(lr)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    }
  }

  /** Per-document DSIR log importance weight: `logw = Σ_f fx(bucket(f))
    * / scale` over the document's hashed unigram+bigram features —
    * [[graft.plans.HashedFeatScore]] with the fitted table, so scoring
    * is ONE codegen'd expression with two running longs: zero explode,
    * zero shuffle, bit-reproducible (integer sum; the only
    * floating-point op is the final division). 100 TB scoring is pure
    * map work on the corpus scan. Unlike the classifier scores this is
    * the raw SUM (DSIR does not length-normalize). Empty/null text →
    * null `logw`.
    */
  def dsirWeights(df: DataFrame, textCol: String, idCol: String,
                  fx: Array[Long], scale: Double = 1e6): DataFrame = {
    require(fx.nonEmpty, "fitted table must be non-empty")
    val sc = graft.plans.HashedFeatScore.featScore(col(textCol), fx.length, Some(fx))
    df.select(
        col(idCol),
        sc.getItem(0).as("n_feats"),
        sc.getItem(1).as("w_sum"))
      .withColumn("logw",
        when(col("n_feats") > 0, col("w_sum").cast("double") / scale))
  }

  /** Gumbel-top-k importance resampling over [[dsirWeights]]: each doc
    * draws a deterministic Gumbel `g = −ln(−ln(u))` from its 60-bit md5
    * fraction (`u = (md5_60(id‖seed)+0.5)/2^60` — exact in both engines:
    * integer prefix, power-of-two divide) and the k largest `logw + g`
    * win — equivalent to sampling k docs without replacement with
    * probability ∝ exp(logw), the resampling step of the DSIR paper.
    *
    * Scale: orderBy+limit compiles to TakeOrderedAndProject —
    * per-partition top-k, driver merges k·partitions rows; no global
    * sort, no full shuffle. For corpus-scale k (billions), switch to a
    * threshold on the key (rank-select the cutoff, one broadcast
    * compare — the [[calibratedGate]]-shaped plan); this form is for
    * k ≤ millions. Zero-feature docs carry no weight and are excluded.
    * Output is the selected docs' exact (id, n_feats, logw) ordered by
    * id — the Gumbel key only decides membership, so the ≤1-ulp `ln`
    * wiggle can at worst swap rank k with rank k+1, never corrupt a
    * value.
    */
  def dsirResample(df: DataFrame, textCol: String, idCol: String,
                   fx: Array[Long], k: Int, seed: String,
                   scale: Double = 1e6): DataFrame = {
    require(k > 0, "k must be positive")
    val u60 = conv(substring(md5(concat(col(idCol).cast("string"), lit(seed))),
      1, 15), 16, 10).cast("long")
    val u = (u60.cast("double") + 0.5) / 1.152921504606846976e18 // 2^60
    val gumbel = -log(-log(u))
    dsirWeights(df, textCol, idCol, fx, scale)
      .filter(col("logw").isNotNull)
      .withColumn("_gk", col("logw") + gumbel)
      .orderBy(col("_gk").desc, col(idCol).asc)
      .limit(k)
      .drop("_gk")
      .orderBy(idCol)
  }
}
