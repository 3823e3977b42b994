package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over an edge list, and the dedup-clustering
  * composition built on it (near-dup pairs → clusters → one canonical
  * document per cluster).
  *
  * The reference dedups only by exact match (`drop_duplicates`,
  * `Transaction Duplicates.ipynb:36`); clustering is the missing last
  * step of the near-dup suite here: `jaccardPairs` / `minhashLshPairs` /
  * `cosinePairsExact` emit PAIRS, but a pipeline that keeps "one doc per
  * near-dup group" needs the transitive closure of those pairs — A~B and
  * B~C must collapse to ONE cluster {A,B,C}, not two independent pairs.
  *
  * Scale design — this is the step that breaks naive implementations at
  * 100 TB, so the algorithm choice is the whole point:
  *   - **Alternating large-star / small-star** (Kiveris et al.,
  *     "Connected Components in MapReduce and Beyond", SoCC'14): each
  *     round is two join+aggregate passes over the edge list; converges
  *     in O(log² n) rounds on any graph (in practice 2–4 rounds for
  *     near-dup clusters, whose diameter is tiny). Naive label
  *     propagation needs O(diameter) rounds — a pathological chain of
  *     pairwise-similar docs (crawl boilerplate drift) makes that
  *     unbounded.
  *   - **Adaptive small-graph path.** The canonical edge list is counted
  *     in the same action that materializes it; when it fits one task
  *     (default ≤ 2^20 edges = 16 MB of longs), a single-task
  *     deterministic union-find replaces the distributed rounds — the
  *     same measured-size adaptivity AQE applies to joins. Near-dup pair
  *     graphs are usually tiny relative to their corpus (pairs ≪ docs),
  *     and each star round costs ~8 shuffles of pure fixed overhead at
  *     that size. Labels are identical by construction (component = min
  *     member id); PropertySpec runs both paths against each other.
  *   - **No unbounded aggregation buffers.** Star operations are
  *     formulated as groupBy-min + join-back, never
  *     `collect_list(neighbors)` — a hot node (one doc near-similar to
  *     millions) would overflow any per-group list buffer.
  *   - **Lineage truncation.** Each round ends in a checkpoint:
  *     iterative DataFrame graphs otherwise build a plan tree that
  *     doubles per round and stalls the optimizer long before the data
  *     is the problem. If the session has a RELIABLE checkpoint dir
  *     configured (`sc.setCheckpointDir` — HDFS/object store), rounds
  *     use `checkpoint()` and survive executor loss; otherwise
  *     `localCheckpoint()` (executor-local blocks — fine single-node,
  *     lineage-unrecoverable on a preemptible cluster, so production
  *     jobs SHOULD set a checkpoint dir). Checkpoints are LAZY: each
  *     round's convergence probe is the action that materializes it —
  *     one job per round, not two.
  *   - Edges live as canonical `(min, max)` longs — one 16-byte shuffle
  *     row per edge, text never moves.
  */
object Graph {

  /** Connected components of the undirected graph given by
    * (`srcCol`, `dstCol`). Returns one row per distinct node:
    * (`node`, `component`) where `component` is the smallest node id in
    * the node's component (deterministic, engine-independent labels).
    * Node ids must be non-null longs; self-loops are ignored. Nodes that
    * appear only as isolated self-loops are still emitted.
    *
    * `smallGraphThreshold`: edge count at or below which the single-task
    * union-find path runs instead of the distributed star rounds. Set 0
    * to force the distributed path (tests do; production never needs to).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 30,
                          smallGraphThreshold: Long = 1L << 20): DataFrame = {
    // Reliable checkpoints when the session has a checkpoint dir (writes
    // to fault-tolerant storage — the production-grade form for
    // preemptible clusters); executor-local blocks otherwise.
    val reliable =
      edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    // LAZY checkpoints: the caller's next action over the frame both
    // materializes the checkpoint and computes whatever that action
    // needs — one job per round instead of an eager-materialize job
    // PLUS a convergence job (the two-jobs-per-round shape profiling
    // showed dominating the per-round fixed cost on small graphs).
    //
    // Reliable mode additionally PERSISTS the pre-checkpoint plan:
    // Spark's reliable checkpoint writes files in a separate job that
    // re-evaluates the RDD, and with checkpointAllMarkedAncestors off
    // (the default) an ancestor's checkpoint is deferred to its own
    // next action — without the cache, the (possibly whole-pair-
    // pipeline) lineage would re-run once per deferred write. With it,
    // every re-evaluation is a cache read. Round frames release their
    // cache when their checkpoint file is superseded; the base/edge
    // caches stay until the caller's action (their checkpoints complete
    // there) — edge rows are two longs, so the footprint is the edge
    // list itself, spillable via MEMORY_AND_DISK.
    val cpSources = scala.collection.mutable.Map.empty[DataFrame, DataFrame]
    def cp(df: DataFrame): DataFrame =
      if (reliable) {
        val src = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val out = src.checkpoint(eager = false)
        cpSources(out) = src
        out
      } else df.localCheckpoint(eager = false)
    def releaseCache(df: DataFrame): Unit =
      cpSources.remove(df).foreach(_.unpersist(false))
    // One action over the (possibly expensive — a whole shingle→join
    // near-dup pipeline) input: checkpoint the canonical edge list AND
    // the node set together, then iterate over checkpointed data only.
    // The node set rides along as self-loop rows (u = v = node). Each
    // input row explodes to THREE rows (canonical edge + a self-loop
    // per endpoint) in ONE pass — a union of two selects over `raw`
    // would evaluate the entire upstream pair pipeline twice inside
    // this first action.
    val raw = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
    val base = raw
      .select(explode(array(
          struct(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v")),
          struct(col("u").as("u"), col("u").as("v")),
          struct(col("v").as("u"), col("v").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct()
      .transform(cp)
    // isolated nodes (self-loop-only or mentioned once) rejoin at the end
    // — the component computation drops nodes with no surviving edge
    val nodes = base.select(col("u").as("node")).distinct()

    // one action materializes BOTH lazy checkpoints (base, then e on
    // top of it) and counts the canonical edges — the number that picks
    // the execution path below
    val e = cp(canonical(base))
    val edgeCount = e.count()

    val labeled: DataFrame =
      if (edgeCount == 0)
        e.select(col("v").as("node"), col("u").as("component")).limit(0)
      else if (edgeCount <= smallGraphThreshold) unionFindLabels(e)
      else starRoundLabels(e, cp, releaseCache, reliable, maxIter)

    nodes.join(labeled, Seq("node"), "left")
      .select(col("node"), coalesce(col("component"), col("node")).as("component"))
  }

  private def canonical(df: DataFrame): DataFrame =
    df.filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()

  /** Small-graph path: one narrow stage over the checkpointed edge list
    * (coalesce(1) reads the partitions without a shuffle), classic
    * union-find with path halving. Union keeps the SMALLER root, so
    * every root is its component's minimum id — the same labels the
    * distributed rounds produce. Nodes never re-parented (roots and
    * singleton endpoints) may be absent from the output; the caller's
    * left-join + coalesce(node) assigns them to themselves.
    */
  private def unionFindLabels(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    e.select(col("u"), col("v")).as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var x = x0
          while (parent.getOrElse(x, x) != x) {
            val p = parent(x)
            parent(x) = parent.getOrElse(p, p) // path halving
            x = parent(x)
          }
          x
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent(rb) = ra
          else if (rb < ra) parent(ra) = rb
        }
        parent.keysIterator.toArray.iterator.map(k => (k, find(k)))
      }
      .toDF("node", "component")
  }

  /** Distributed path: alternating large-star / small-star rounds with
    * lazy per-round checkpoints; the convergence probe is the action
    * that materializes each round.
    */
  private def starRoundLabels(e0: DataFrame, cp: DataFrame => DataFrame,
                              releaseCache: DataFrame => Unit,
                              reliable: Boolean, maxIter: Int): DataFrame = {
    // In reliable mode, each round's checkpoint supersedes the previous
    // round's — delete the stale files as we go (cleanCheckpoints is
    // off by default, so they would otherwise accumulate per call).
    // Only intermediate rounds are deleted: the input edge set and the
    // final one must survive until the caller's action.
    def cpPath(df: DataFrame): Option[String] =
      if (!reliable) None
      else df.queryExecution.analyzed.collectFirst {
        // a checkpointed Dataset's plan root is LogicalRDD over the
        // reliably-checkpointed internal RDD (df.rdd would build a NEW
        // conversion RDD with no checkpoint file)
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.flatMap(_.getCheckpointFile)
    def deleteCp(file: Option[String]): Unit = file.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      scala.util.Try(
        p.getFileSystem(e0.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true))
    }
    var e = e0
    var first = true // never delete the caller's input checkpoint
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: every node u links its LARGER neighbors to
      // m(u) = min(N(u) ∪ {u}). Directed view: sym has one row per
      // (u, each neighbor v).
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = sym.groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = canonical(
        sym.filter(col("v") > col("u"))
          .join(lsMin, "u")
          .select(col("v").as("u"), col("m").as("v")))
      // small-star: every node u links its SMALLER neighbors (and itself)
      // to the min of those. Nodes with no smaller neighbor emit nothing
      // — their edges are re-emitted from the other endpoint's view.
      val symLs = ls.union(ls.select(col("v").as("u"), col("u").as("v")))
      val toSmaller = symLs.filter(col("v") < col("u"))
      val ssMin = toSmaller.groupBy("u").agg(min(col("v")).as("m"))
      val ss = cp(canonical(
        toSmaller.join(ssMin, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .union(ssMin.select(col("u"), col("m").as("v")))))
      // fixpoint: the edge set is stable. Both lists are distinct, so the
      // symmetric difference is "rows seen once in the union". This is
      // the round's ONLY action: the groupBy shuffle drains every
      // partition of `ss`, which completes ss's lazy checkpoint in the
      // same job that answers convergence. Checked every round (round 0
      // included — free now that it shares the materialization job, and
      // already-star-shaped graphs converge a full round earlier).
      converged = ss.union(e).groupBy("u", "v")
        .agg(count(lit(1)).as("c")).filter(col("c") === 1).isEmpty
      // ss is now materialized (its checkpoint write ran inside the
      // convergence job, reading the round's cache) — the previous
      // round's file AND cache are unreachable from anything the
      // caller sees
      val stale = if (first) None else cpPath(e)
      val staleFrame = if (first) None else Some(e)
      first = false
      e = ss
      deleteCp(stale)
      staleFrame.foreach(releaseCache)
      iter += 1
    }
    if (!converged && iter >= maxIter)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (the alternating algorithm needs O(log² n) rounds)")
    // fixpoint edge set is a star per component: (component-min, node).
    // Nodes carrying no edge are their own component.
    e.select(col("v").as("node"), col("u").as("component"))
      .union(e.select(col("u").as("node"), col("u").as("component")))
      .groupBy("node").agg(min(col("component")).as("component"))
  }

  /** Near-dup clustering: docs × similarity pairs → one row per doc with
    * its `cluster_id` (smallest doc id in the transitive-closure cluster)
    * and `is_canonical` (true for the cluster representative — the doc a
    * keep-one-per-cluster curation pass retains).
    *
    * `pairs` is any (idA, idB) frame — `TextDedup.jaccardPairs`,
    * `minhashLshPairs`, `Similarity.cosinePairsExact`… Docs in no pair
    * are their own singleton cluster.
    */
  def dedupClusters(docs: DataFrame, idCol: String,
                    pairs: DataFrame, idACol: String, idBCol: String): DataFrame = {
    val comps = connectedComponents(pairs, idACol, idBCol)
    docs.select(col(idCol).cast("long").as(idCol))
      .join(comps.withColumnRenamed("node", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
  }

  /** [[dedupClusters]] with a caller-chosen survivor: canonical = the
    * member maximizing `prefer` within its transitive cluster (tie →
    * smallest id) — keep the longest / highest-quality copy instead of
    * the smallest id. This is the D6 prefer-keep rule lifted from exact
    * dup groups to near-dup clusters (SemDeDup keeps e.g. the
    * lowest-perplexity member the same way: pass `-perplexity`).
    * `prefer` is evaluated against `docs`. Survivor choice is a
    * struct-max aggregate per cluster (map-side combinable, no windows,
    * no neighbor lists) joined back — the same bounded-buffer discipline
    * as the star rounds.
    */
  def dedupClustersBy(docs: DataFrame, idCol: String, prefer: Column,
                      pairs: DataFrame, idACol: String, idBCol: String): DataFrame = {
    val assigned = dedupClusters(docs, idCol, pairs, idACol, idBCol)
      .select(col(idCol), col("cluster_id"))
      .join(docs.select(col(idCol).cast("long").as(idCol),
        prefer.as("_pref")), Seq(idCol))
    val best = assigned.groupBy("cluster_id")
      .agg(max(struct(col("_pref"), negate(col(idCol)).as("_nid"))).as("_m"))
      .select(col("cluster_id"), negate(col("_m._nid")).as("_keep"))
    assigned.join(best, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"),
        (col(idCol) === col("_keep")).as("is_canonical"))
  }

  /** Cluster rollup onto the canonical survivor: after near-dup
    * clustering, the DROPPED copies' signals (view counts, source
    * diversity, quality votes) usually shouldn't vanish with them —
    * this aggregates caller-chosen metrics over each cluster and
    * attaches them to the canonical row, so curation keeps one document
    * but ALL its evidence. `assignment` is any
    * (idCol, cluster_id, is_canonical) frame ([[dedupClusters]] /
    * [[dedupClustersBy]] / the incremental path's join-back); `aggs`
    * are standard aggregate columns over the joined docs. One
    * partial-aggregated groupBy + a join back to the canonical rows.
    */
  def aggregateToCanonical(docs: DataFrame, idCol: String,
                           assignment: DataFrame,
                           aggs: Seq[Column]): DataFrame = {
    val joined = docs.join(assignment, Seq(idCol))
    val rolled = joined.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"), aggs: _*)
    joined.filter(col("is_canonical"))
      .drop("is_canonical")
      .join(rolled, Seq("cluster_id"))
  }

  /** Fixed-point PageRank over the directed graph (`srcCol`, `dstCol`) —
    * the domain-authority score every web-curation stack derives from
    * its link graph (C4/RefinedWeb-style pipelines rank domains by link
    * authority to set per-domain quality priors; the edge feed here is
    * [[graft.operators.Html.domainLinkGraph]]).
    *
    * Semantics (deliberately engine-portable — every step replays
    * bit-exactly in any engine with 64-bit integer floor division):
    *   - Edges are the DISTINCT non-null (src, dst) pairs; self-loops
    *     kept. Nodes = all endpoints.
    *   - Ranks are scaled longs: r₀ = `scale` per node ("total mass =
    *     N·scale"). Per iteration, with damping 85/100:
    *     r'(i) = floor(scale·15/100) + Σ_{j→i} floor(r(j)·85 / (100·od(j)))
    *     where od(j) is j's out-degree. All arithmetic is non-negative
    *     long floor division, so Spark's `DIV` (truncating) and e.g.
    *     DuckDB's `//` (flooring) agree exactly — no float drift across
    *     engines, partitionings, or reduction orders (the per-target sum
    *     is an integer sum).
    *   - Dangling mass is DROPPED, not redistributed (a node with no
    *     out-edges contributes nothing): total mass only shrinks, so
    *     every rank is bounded by N·scale. The redistribute variant
    *     needs a global scalar per iteration (an extra action or a
    *     crossjoin broadcast each round); dropping is the documented
    *     trade and ranks remain comparable as authority scores.
    *   - Fixed `iters` iterations, no convergence probe: a probe is one
    *     driver action per round, and production PageRank over a
    *     100 M-domain graph runs a budgeted round count anyway.
    *
    * Overflow: ranks are bounded by N·scale, and the per-edge product
    * r·85 must stay under 2⁶³ — so callers need N·scale·100 < 2⁶³:
    * default scale 10⁹ is safe to ~9×10⁷ nodes, 10⁸ to ~9×10⁸, and in
    * general choose scale ≤ 2⁶³/(100·N). The bound is enforced at
    * EVERY accumulation point: the per-round rank guard (lazy
    * `assert_true`, the [[Joins.upsert]] discipline), a DECIMAL(38,0)
    * contribution sum in the distributed path (a long sum of ≤
    * 0.85·2⁶³/100 addends can wrap 2⁶³ and land back in-range — the
    * decimal sum cannot), and an as-you-accumulate check in the
    * single-task loop. A too-big graph fails loudly at execution,
    * never wraps silently.
    *
    * Scale shape: the edge list (joined once with its out-degrees) is
    * hash-partitioned by src and persisted — each of the `iters` rounds
    * shuffles only the RANK table (one row per node) into that fixed
    * layout plus one aggregate exchange for the contribution sum; edge
    * bytes never move again. Rounds are materialized eagerly via
    * checkpoint (reliable when the session has a checkpoint dir, local
    * otherwise — same policy as [[connectedComponents]]), so the plan
    * never grows with `iters` and the caches are RELEASED before
    * return; the result frame owns no persisted state.
    *
    * Adaptive small-graph path (the [[connectedComponents]] move): the
    * distinct edge list is counted in the action that materializes its
    * cache; at or under `smallGraphThreshold` edges the whole
    * fixed-point loop runs in ONE task over the cached list — the
    * per-round join/agg/checkpoint machinery is pure fixed overhead at
    * that size, and the longs are identical by construction (per-node
    * values don't depend on any reduction order). Domain graphs are
    * small relative to their corpora (the web is ~10⁸ registrable
    * domains vs 10¹⁰ pages), so real runs often take this path too.
    *
    * Node ids are compared as STRINGS (domains/hosts — the native key
    * of a link graph); both columns are cast on entry, so either path
    * returns the same (node: string, rank_fp: long) schema.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 8, scale: Long = 1000000000L,
               smallGraphThreshold: Long = 1L << 20): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, None, iters, scale,
      smallGraphThreshold)

  /** WARM-START PageRank — the daily-drop shape (the
    * [[incrementalComponents]] counterpart): resume the recursion from
    * a persisted (node, rank_fp) assignment instead of the uniform
    * start, running only `iters` refinement rounds over the CURRENT
    * edge set. On an unchanged graph this is exactly the continued
    * recursion — resume(pageRank(E, n), m) == pageRank(E, n+m)
    * long-for-long (GraphSpec pins it; the q_pagerank_resume oracle
    * replays the full n+m unrolled recursion). On a grown graph it is
    * the standard warm start: new nodes enter at `scale` (initial
    * mass), departed nodes' rows are ignored, and a few rounds
    * re-mix — the point is never re-paying the full round budget after
    * a 1% daily edge delta.
    */
  def pageRankResume(edges: DataFrame, srcCol: String, dstCol: String,
                     init: DataFrame, initNodeCol: String,
                     initRankCol: String, iters: Int,
                     scale: Long = 1000000000L,
                     smallGraphThreshold: Long = 1L << 20): DataFrame = {
    // malformed init is REFUSED loudly before either execution path —
    // a duplicate node row would double-count contributions in the
    // distributed rounds but last-win-dedupe in the single-task map
    // (same input, different longs by path), and a null rank is a
    // data bug, not a new node. The upsert discipline: lazy in-plan
    // asserts over the node-sized init table.
    val w = Window.partitionBy("node")
    val cleaned = init
      .select(col(initNodeCol).cast("string").as("node"),
        col(initRankCol).cast("long").as("r0"))
      .filter(col("node").isNotNull)
      .withColumn("_ck", assert_true(
        col("r0").isNotNull && count(lit(1)).over(w) === 1,
        lit("pageRankResume: init must have one non-null rank per node " +
          "— found a duplicate node or a null rank")))
      .filter(col("_ck").isNull).drop("_ck")
    pageRankImpl(edges, srcCol, dstCol, Some(cleaned),
      iters, scale, smallGraphThreshold)
  }

  private def pageRankImpl(edges: DataFrame, srcCol: String, dstCol: String,
                           init: Option[DataFrame], iters: Int, scale: Long,
                           smallGraphThreshold: Long): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(scale >= 100 && scale % 100 == 0,
      s"pageRank: scale must be a positive multiple of 100, got $scale")
    require(scale <= Long.MaxValue / 100,
      s"pageRank: scale $scale exceeds 2^63/100 — the initial rank " +
        "itself would overflow the per-edge product")
    val mdLevel = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val teleport = scale / 100L * 15L
    // the per-edge product is r·85 with r ≤ N·scale; guard r against
    // the loose-but-sufficient bound 2⁶³/100
    val maxSafe = Long.MaxValue / 100L
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def cpEager(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    // reliable checkpoints write files that survive the call
    // (cleanCheckpoints is off by default) — delete each round's file
    // once the next round is materialized, same as the CC star rounds
    def cpFile(df: DataFrame): Option[String] =
      if (!reliable) None
      else df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.flatMap(_.getCheckpointFile)
    def deleteCpFile(file: Option[String]): Unit = file.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      scala.util.Try(
        p.getFileSystem(edges.sparkSession.sparkContext.hadoopConfiguration)
          .delete(p, true))
    }

    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .persist(mdLevel)
    // ONE action over the (possibly whole link-extraction) upstream
    // pipeline: materialize the edge cache and pick the execution path
    val nEdges = e.count()

    // both paths return an eagerly-materialized (checkpointed) frame,
    // so the edge cache can be released before return — the caller
    // owns no persisted state
    val ranked =
      if (nEdges <= smallGraphThreshold)
        cpEager(singleTaskPageRank(e, init, iters, scale))
      else distributedPageRank(e, init, iters, scale, teleport, maxSafe,
        cpEager, cpFile, deleteCpFile, mdLevel)
    e.unpersist(false)
    ranked
  }

  /** One-task fixed-point loop over the cached edge list (the
    * small-graph path) — same recursion, same longs. Warm-start rows
    * ride the same single-task frame as marker rows (no driver
    * collect, no second task).
    */
  private def singleTaskPageRank(e: DataFrame, init: Option[DataFrame],
                                 iters: Int, scale: Long): DataFrame = {
    import e.sparkSession.implicits._
    val teleport = scale / 100L * 15L
    val maxSafe = Long.MaxValue / 100L
    val edgeRows = e.select(lit(true).as("_isEdge"), col("src"),
      col("dst"), lit(0L).as("_r0"))
    val combined = init match {
      case None => edgeRows
      case Some(i) => edgeRows.unionByName(
        i.select(lit(false).as("_isEdge"), col("node").as("src"),
          lit("").as("dst"), col("r0").as("_r0")))
    }
    combined.as[(Boolean, String, String, Long)].coalesce(1)
      .mapPartitions { it =>
        val (edgeIt, initIt) = it.toArray.partition(_._1)
        val es = edgeIt.map(t => (t._2, t._3))
        val r0 = initIt.map(t => t._2 -> t._4).toMap
        r0.values.find(_ > maxSafe).foreach { v =>
          throw new IllegalStateException(
            s"pageRank: init rank $v exceeds 2^63/100 = $maxSafe")
        }
        val od = scala.collection.mutable.HashMap.empty[String, Long]
        es.foreach { case (s, _) => od(s) = od.getOrElse(s, 0L) + 1L }
        val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
        var r = nodes.map(n => n -> r0.getOrElse(n, scale)).toMap
        for (_ <- 1 to iters) {
          val contribs = scala.collection.mutable.HashMap.empty[String, Long]
          es.foreach { case (s, t) =>
            val acc = contribs.getOrElse(t, 0L) + r(s) * 85L / (100L * od(s))
            // fail as soon as a partial sum passes the rank bound: each
            // addend is < maxSafe (r guarded ≤ maxSafe), so checking
            // every accumulation means the sum can never reach 2·maxSafe,
            // far below the 2⁶³ silent-wrap point
            if (acc > maxSafe) throw new IllegalStateException(
              s"pageRank: rank exceeds 2^63/100 = $maxSafe — " +
                "N*scale*100 must stay under 2^63; lower `scale`")
            contribs(t) = acc
          }
          r = nodes.map { n =>
            val v = teleport + contribs.getOrElse(n, 0L)
            if (v > maxSafe) throw new IllegalStateException(
              s"pageRank: rank exceeds 2^63/100 = $maxSafe — " +
                "N*scale*100 must stay under 2^63; lower `scale`")
            n -> v
          }.toMap
        }
        nodes.iterator.map(n => (n, r(n)))
      }
      .toDF("node", "rank_fp")
  }

  /** Round-per-round join/agg path for graphs past the one-task size. */
  private def distributedPageRank(e: DataFrame, init: Option[DataFrame],
                                  iters: Int, scale: Long,
                                  teleport: Long, maxSafe: Long,
                                  cpEager: DataFrame => DataFrame,
                                  cpFile: DataFrame => Option[String],
                                  deleteCpFile: Option[String] => Unit,
                                  mdLevel: org.apache.spark.storage.StorageLevel): DataFrame = {
    // out-degree folded into the edge row once, then the iteration-
    // invariant layout: hash by src, cached for all rounds (reads the
    // already-materialized edge cache, so this is cheap)
    val ew = e
      .join(e.groupBy("src").agg(count(lit(1)).as("od")), "src")
      .repartition(col("src"))
      .persist(mdLevel)
    val nodes = ew.select(col("src").as("node"))
      .union(ew.select(col("dst").as("node")))
      .distinct()
      .persist(mdLevel)

    var ranks = init match {
      case None => nodes.select(col("node"), lit(scale).as("r"))
      case Some(i) =>
        // new nodes enter at `scale`; init rows for departed nodes drop
        // via the left join; oversized init ranks refused in-plan
        nodes.join(i, Seq("node"), "left")
          .select(col("node"), coalesce(col("r0"), lit(scale)).as("r"))
          .withColumn("_ovf", assert_true(col("r") <= maxSafe,
            lit(s"pageRank: init rank exceeds 2^63/100 = $maxSafe")))
          .filter(col("_ovf").isNull).drop("_ovf")
    }
    var prevFile: Option[String] = None
    for (_ <- 1 to iters) {
      // contribution sum as DECIMAL(38,0): a LONG sum of many
      // ≤ 0.85·maxSafe addends can wrap past 2⁶³ and land back inside
      // [0, maxSafe], slipping through the rank guard — the decimal
      // sum is exact, so the guard below sees the true total
      val contribs = ew.alias("e")
        .join(ranks.alias("rk"), col("e.src") === col("rk.node"))
        .select(col("e.dst").as("dst"),
          expr("(r * 85) DIV (100 * od)").cast("decimal(38,0)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("c"))
      ranks = cpEager(
        nodes.alias("n")
          .join(contribs.alias("ct"), col("n.node") === col("ct.dst"), "left")
          .select(col("n.node").as("node"),
            (lit(BigDecimal(teleport)).cast("decimal(38,0)") +
              coalesce(col("c"), lit(BigDecimal(0)).cast("decimal(38,0)")))
              .as("rd"))
          .withColumn("_ovf", assert_true(col("rd") <= lit(BigDecimal(maxSafe)),
            lit(s"pageRank: rank exceeds 2^63/100 = $maxSafe — " +
              "N*scale*100 must stay under 2^63; lower `scale`")))
          .filter(col("_ovf").isNull)
          .select(col("node"), col("rd").cast("long").as("r")))
      deleteCpFile(prevFile)
      prevFile = cpFile(ranks)
    }
    ew.unpersist(false)
    nodes.unpersist(false)
    ranks.select(col("node"), col("r").as("rank_fp"))
  }

  /** INCREMENTAL connected components — the daily-drop shape: a
    * persisted (node, component) assignment absorbs a NEW batch of edges
    * (new×new and new×old pairs from e.g.
    * `TextDedup.crossCorpusNearDupsBanded`) without re-running pair
    * generation or CC over the historical corpus. The old assignment is
    * replayed as STAR edges (node → its component label): stars
    * reproduce old connectivity exactly — CC(stars ∪ newEdges) =
    * CC(oldEdges ∪ newEdges) whenever `assignment` came from a CC over
    * oldEdges (min-id labels; spec-asserted against the full recompute).
    * Cost scales with |assignment| + |newEdges|, never with the old
    * PAIR set, and the star graph is already depth-1 so the alternating
    * rounds converge almost immediately.
    *
    * Returns one row per node in `assignment` ∪ the new edges' nodes:
    * (node, component) with min-id labels — same contract as
    * [[connectedComponents]], so [[dedupClusters]]-style join-backs
    * compose unchanged. New edges may merge old clusters (labels then
    * drop to the min across the merge) and introduce unseen nodes.
    */
  def incrementalComponents(assignment: DataFrame, nodeCol: String,
                            compCol: String, newEdges: DataFrame,
                            aCol: String, bCol: String): DataFrame = {
    val stars = assignment.select(col(nodeCol).cast("long").as("_u"),
      col(compCol).cast("long").as("_v"))
    val fresh = newEdges.select(col(aCol).cast("long").as("_u"),
      col(bCol).cast("long").as("_v"))
    // singleton assignment rows are self-loops; connectedComponents
    // ignores them as edges but still emits the node, preserving
    // isolated nodes across increments
    connectedComponents(stars.unionByName(fresh), "_u", "_v")
  }
}
