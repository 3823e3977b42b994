package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operator family (SURVEY.md §2.7, J1-J10).
  *
  * Scale notes baked into each helper:
  *   - enrichment joins against small lookups take a `broadcast` flag —
  *     the reference's lookups are 194-8,178 rows (BASELINE.md), which at
  *     any scale stay broadcast-able; the fact side never shuffles.
  *   - the full-outer reconciliation join shuffles both sides on the key —
  *     correct and unavoidable; pre-aggregation below the join (done by
  *     the caller, §3.1) keeps the shuffled volume at one-row-per-key.
  *   - the containment theta-join is a BroadcastNestedLoopJoin and is only
  *     safe while the lookup side broadcasts; for large×large use the
  *     MinHash path in [[TextDedup]] instead.
  */
object Joins {

  /** J2: full-outer join with a pandas `indicator=True` provenance column.
    * `_merge ∈ {both, left_only, right_only}` drives the DOR↔VP
    * reconciliation (DOP VP Compare.py:139-157).
    *
    * Implemented by tagging each side before the join so the indicator is
    * null-safe even when joined columns are legitimately null.
    */
  def outerWithIndicator(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         indicatorCol: String = "_merge"): DataFrame = {
    val l = left.withColumn("_l_present", lit(1))
    val r = right.withColumn("_r_present", lit(1))
    l.join(r, l(leftKey) === r(rightKey), "full_outer")
      .withColumn(indicatorCol,
        when(col("_l_present").isNotNull && col("_r_present").isNotNull, "both")
          .when(col("_r_present").isNull, "left_only")
          .otherwise("right_only"))
      .drop("_l_present", "_r_present")
  }

  /** J4: anti-join — rows of `left` whose key has no match in `right`.
    * (`~isin(other col)`, Saoirse Automation.ipynb:993-995.)
    */
  def antiJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
               broadcastRight: Boolean = true): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, left(leftKey) === r(rightKey), "left_anti")
  }

  /** J5: semi-join — rows of `left` whose key appears in `right`. */
  def semiJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
               broadcastRight: Boolean = true): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, left(leftKey) === r(rightKey), "left_semi")
  }

  /** J6: containment theta-join with first-hit-wins semantics
    * (Saoirse Automation.ipynb:1035-1049: unmatched ids matched where
    * `ReferenceNum in Site Study ID`).
    *
    * Physical plan: BroadcastNestedLoopJoin — every left row tests
    * EVERY right row, so cost is |left| × |right| contains() calls and
    * the right side must be bounded and corpus-size-INDEPENDENT (the
    * reference's use: a small unmatched-id remnant). `maxRight`
    * enforces that contract with one early-exit count before the join
    * is built — the r16 SF-curve sweep caught a fixture whose needle
    * side grew with the corpus, turning this quadratic silently (6.5×
    * wall for 10× data); the guard makes that failure loud at any call
    * site. "First hit" is made deterministic by `pickOrder` over the
    * right side.
    *
    * Guard caveat (shared with `Similarity.requireBounded`): the bound
    * is checked EAGERLY at call time with its own `limit(max+1).count()`
    * job, and the join re-evaluates the right side's lineage — two
    * instantiations. For a deterministic needle frame that is only an
    * extra scan; a NONDETERMINISTIC one (an unseeded sample, a
    * `first()` without ordering) can pass the guard on one
    * instantiation and materialize larger in the join. Pass
    * deterministic (or persisted/checkpointed) needle sides.
    */
  def containmentJoin(left: DataFrame, right: DataFrame,
                      haystack: Column, needle: Column,
                      leftKeyForWindow: Seq[String],
                      pickOrder: Seq[Column],
                      maxRight: Int = 65536): DataFrame = {
    require(maxRight > 0, "maxRight must be positive")
    val nRight = right.limit(maxRight + 1).count()
    require(nRight <= maxRight,
      s"containmentJoin: needle side has > $maxRight rows. This is a " +
        "broadcast nested-loop join — |left| × |right| contains() tests — " +
        "so a needle side that grows with the corpus makes it quadratic. " +
        "Pass a bounded, corpus-size-independent needle set, or raise " +
        "maxRight explicitly if the cost is truly intended")
    val joined = left.join(broadcast(right), haystack.contains(needle), "left")
    val w = Window.partitionBy(leftKeyForWindow.map(col): _*).orderBy(pickOrder: _*)
    joined.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** J7: join-key discovery — for candidate (leftCol, rightCol) pairs,
    * report the distinct-value overlap so a caller can pick the best key.
    * The reference brute-forces this with a cartesian pandas loop
    * (Accruals Report.ipynb:234-292).
    *
    * Scale shape: ONE scan per side PER COMPARISON DOMAIN, independent
    * of the candidate count. Candidates whose two columns share an
    * exact type form a native-typed domain (one per distinct type);
    * mixed-type pairs share one string domain. Within a domain each
    * side is unpivoted (explode over a struct array of its candidate
    * columns), deduped per (column, value), and the two sides meet in
    * a single equi-join on the value; counts group onto ≤ |candidates|
    * cells. The previous form built one distinct + semi-join branch
    * per candidate inside one unioned plan — C candidates cost 2C
    * scans of inputs that at corpus scale are the widest tables in the
    * lake; the all-string round-11 form then paid per-row casts and
    * string-width distinct shuffles even for the all-BIGINT-id case
    * that key discovery actually runs on (measured 2× on q_j7 — see
    * BASELINE.md round 12). Zero-overlap candidates still get a row
    * (overlap = 0) via the left join from the literal candidate frame.
    *
    * Equality semantics: same-type candidates compare NATIVELY (what
    * both the old per-candidate form and a same-type SQL join do;
    * Spark's join equality normalizes -0.0 = 0.0 and groups NaN with
    * NaN — float edges where numeric equality is itself a bad join-key
    * signal, and discovering a JOIN KEY on a float column is the real
    * smell this report would be surfacing). Mixed-type candidates
    * compare by CANONICAL STRING FORM — the DuckDB oracle's VARCHAR
    * comparison, injective for the id/code/date types that cross-type
    * discovery runs on — with DECIMAL values normalized before the
    * cast (trailing fractional zeros stripped), so scales that differ
    * only in rendering — 1.5 as decimal(10,1) vs 1.50 as
    * decimal(12,4) — still match, as they would under numeric equality.
    */
  def keyOverlapReport(left: DataFrame, right: DataFrame,
                       candidates: Seq[(String, String)]): DataFrame = {
    // "1.50" -> "1.5", "1.00" -> "1", "100" untouched (no '.'), applied
    // only to DecimalType: a lossless textual normalization, unlike a
    // cast to double (breaks >2^53 ids) or a common scale (overflows
    // high-precision decimals)
    def canon(df: DataFrame, c: String): Column = {
      val s = col(c).cast("string")
      df.schema(c).dataType match {
        case _: org.apache.spark.sql.types.DecimalType =>
          regexp_replace(
            regexp_replace(s, "(\\.[0-9]*?)0+$", "$1"), "\\.$", "")
        case _ => s
      }
    }
    // comparison domain: Some(type) when both columns share it (native
    // values, native shuffle width), None = the string domain
    val domains = candidates.distinct.groupBy { case (lc, rc) =>
      val lt = left.schema(lc).dataType
      if (lt == right.schema(rc).dataType) Some(lt) else None
    }
    val spark = left.sparkSession
    import spark.implicits._
    val counts = domains.values.map { pairs =>
      val native = pairs.forall { case (lc, rc) =>
        left.schema(lc).dataType == right.schema(rc).dataType }
      def unpivot(df: DataFrame, cols: Seq[String], tag: String) =
        df.select(explode(array(cols.map(c =>
            struct(lit(c).as("c"),
              (if (native) col(c) else canon(df, c)).as("v"))): _*)).as("x"))
          .select(col("x.c").as(tag), col("x.v").as("v"))
          .na.drop(Seq("v"))
          .distinct()
      val lv = unpivot(left, pairs.map(_._1).distinct, "left_col")
      val rv = unpivot(right, pairs.map(_._2).distinct, "right_col")
      // restrict each domain's cells to ITS OWN candidate pairs before
      // the union: a column reachable from two domains (same-type via
      // one candidate, mixed via another) would otherwise produce the
      // same cell under both equality semantics — two rows, and two
      // different counts wherever canonical-string and native equality
      // disagree
      val own = pairs.toDF("left_col", "right_col")
      lv.join(rv, Seq("v"))
        .groupBy(col("left_col"), col("right_col"))
        .agg(count(lit(1)).as("n"))
        .join(broadcast(own), Seq("left_col", "right_col"), "left_semi")
    }.reduce(_ unionByName _)
    val cand = candidates.toDF("left_col", "right_col")
    cand.join(counts, Seq("left_col", "right_col"), "left")
      .select(col("left_col"), col("right_col"),
        coalesce(col("n"), lit(0L)).as("overlap"))
  }

  /** J8: union of heterogeneous tables on their common columns
    * (`pd.concat(join="inner")`, Study Startup Legacy Data merge.ipynb:1207).
    * Column order follows `a`'s schema, like pandas.
    */
  def unionOnCommon(a: DataFrame, b: DataFrame): DataFrame = {
    val common = a.columns.filter(b.columns.toSet)
    a.select(common.map(col).toSeq: _*).unionByName(b.select(common.map(col).toSeq: _*))
  }

  /** J9: append union tolerating missing columns (filled with nulls). */
  def appendUnion(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** Skew-safe equi-join by key salting: the skewed left side gets a
    * random-but-deterministic salt in [0, buckets), the right side is
    * replicated `buckets` times, and the join key becomes (key, salt) —
    * splitting a hot key's rows across `buckets` reducers.
    *
    * AQE's skew-join handling covers sort-merge joins automatically;
    * explicit salting remains necessary for skewed *aggregations* and for
    * engines/paths AQE doesn't cover, so the engine ships it as a
    * first-class operator.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 16, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit every unmatched right row once per
    // replica — only join types that never null-extend the right side
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi")(joinType.toLowerCase),
      s"saltedJoin replicates the right side; '$joinType' would duplicate unmatched right rows")
    val salted = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Globally ordered 1-based row ids WITHOUT a single-partition window.
    * `df.orderBy` range-partitions into a total order across partitions;
    * `zipWithIndex` then assigns contiguous ids from per-partition counts
    * (one lightweight count job) — every partition stays parallel, unlike
    * `row_number() over (order by ...)` which funnels the whole table
    * through one task.
    */
  def globalRowIds(df: DataFrame, orderBy: Seq[Column],
                   idCol: String = "row_id", start: Long = 1L): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.orderBy(orderBy: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(idCol, LongType, nullable = false))
    val withId = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + start))
    }
    df.sparkSession.createDataFrame(withId, schema)
  }

  /** Globally ordered running sum WITHOUT a single-partition window —
    * the prefix-sum generalization of [[globalRowIds]]: `orderBy`
    * range-partitions into a total order, one pass collects the tiny
    * per-partition totals (driver-side metadata, |partitions| longs),
    * a second pass emits each row's inclusive cumulative sum as
    * partition offset + local running sum. Every partition stays
    * parallel; `sum() over (order by ...)` would funnel the whole table
    * through one task. Null values count as 0.
    *
    * Cache lifecycle: the sorted copy both passes read is pinned at the
    * RDD level, NOT via `DataFrame.persist`. The pin is load-bearing —
    * the range partitioner samples its input, so a recompute between
    * pass 1 (offset collect) and pass 2 (emit) could shift partition
    * boundaries and desynchronize offsets from rows. But a DataFrame
    * persist registers in the CacheManager, which holds the entry until
    * an explicit unpersist; a lazy operator that cannot unpersist before
    * the caller's action would accrete cached partitions across calls
    * (the round-2 bench failure mode). An RDD persist is instead tracked
    * by ContextCleaner through a weak reference: once the returned frame
    * is dropped, the cached blocks are reclaimed on the next GC — no
    * caller-side cleanup contract needed. Spec: OperatorsSpec
    * "globalPrefixSum releases its cache once the result is dropped".
    */
  def globalPrefixSum(df: DataFrame, orderBy: Seq[Column], value: Column,
                      as: String = "running_total"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sorted = df.withColumn("_psv", coalesce(value.cast("long"), lit(0L)))
      .orderBy(orderBy: _*)
    // serialized storage: these are row objects (post-.rdd), not columnar
    // batches — MEMORY_AND_DISK_SER keeps the text-heavy corpus rows
    // compact in memory instead of exploding into Java object graphs
    val pinned = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val vIdx = sorted.schema.fieldIndex("_psv")
    val partTotals = pinned
      .mapPartitionsWithIndex { (i, it) =>
        Iterator.single(i -> it.foldLeft(0L)(_ + _.getLong(vIdx)))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val schema = StructType(
      sorted.schema.fields.filterNot(_.name == "_psv") :+
        StructField(as, LongType, nullable = false))
    val out = pinned.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { row =>
        acc += row.getLong(vIdx)
        Row.fromSeq(row.toSeq.zipWithIndex
          .collect { case (v, j) if j != vIdx => v } :+ acc)
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Point-in-interval join WITHOUT a nested loop — Spark's planner
    * turns a bare `p.day BETWEEN i.start AND i.end` join condition into
    * BroadcastNestedLoopJoin (broadcastable side) or a cartesian
    * product: O(|points|·|intervals|) either way. Here intervals
    * explode onto a coarse grid (one row per `grid`-sized cell they
    * touch), points equi-join their single cell, and the exact
    * containment predicate filters — a shuffle hash/sort-merge join
    * whose cost is collisions, not the cross product.
    *
    * `grid` tunes replication vs selectivity: an interval spanning w
    * units emits ⌈w/grid⌉+1 rows, a cell holds points within `grid` of
    * each other — pick grid ≈ typical interval width. Values must be
    * LongType (timestamps via `unix_millis`/`datediff` upstream);
    * cells use floor division (negative domains stay aligned). Column
    * names must not collide across the two inputs (join output carries
    * both sides).
    */
  /** Exact floor(c / grid) for the FULL long range, negatives included:
    * subtracting the non-negative pmod first makes the numerator an
    * exact multiple of grid, so the decimal division has an integer
    * quotient and its scale-6 HALF_UP rounding can never move it. (A
    * bare decimal `floor(c/grid)` rounds before flooring — off-by-one
    * cells for grid ≳ 2·10⁶; a double path mis-buckets beyond 2^53.)
    */
  private def gridCell(c: Column, grid: Long): Column =
    ((c - pmod(c, lit(grid))).cast("decimal(38,0)") / lit(grid)).cast("long")

  private def requireNoCellCol(df: DataFrame, side: String): Unit =
    require(!df.columns.contains("_cell"),
      s"$side input already has a `_cell` column — rename it (reserved as the grid-join working column)")

  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                startCol: String, endCol: String, grid: Long): DataFrame = {
    require(grid > 0, "grid must be positive")
    requireNoCellCol(points, "points"); requireNoCellCol(intervals, "intervals")
    val p = points.withColumn("_cell", gridCell(col(pointCol), grid))
    val iv = intervals
      .withColumn("_cell",
        explode(sequence(gridCell(col(startCol), grid), gridCell(col(endCol), grid))))
    p.join(iv, Seq("_cell"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_cell")
  }

  /** Interval×interval overlap join on the same grid trick as
    * [[rangeJoin]]: both sides explode onto cells, overlapping pairs
    * share at least one cell, the exact predicate
    * (lStart ≤ rEnd ∧ rStart ≤ lEnd) filters, and (`lId`, `rId`)
    * dedup collapses multi-cell matches. Id columns are required
    * precisely because a pair CAN meet in several cells — and they must
    * UNIQUELY identify their rows: with duplicate ids the dedup keeps
    * one arbitrary row per (lId, rId) pair.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lId: String, lStart: String, lEnd: String,
                          rId: String, rStart: String, rEnd: String,
                          grid: Long): DataFrame = {
    require(grid > 0, "grid must be positive")
    requireNoCellCol(left, "left"); requireNoCellCol(right, "right")
    val l = left.withColumn("_cell",
      explode(sequence(gridCell(col(lStart), grid), gridCell(col(lEnd), grid))))
    val r = right.withColumn("_cell",
      explode(sequence(gridCell(col(rStart), grid), gridCell(col(rEnd), grid))))
    l.join(r, Seq("_cell"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("_cell")
      .dropDuplicates(lId, rId)
  }

  /** P5: sequential row ids continued across tables — the reference
    * assigns `range(1, n+1)` to one frame and `range(n+1, n+m+1)` to the
    * next (Study Startup Legacy Data merge.ipynb:41-45,1181-1192).
    * Order must be explicit (pandas relied on file order). Each frame's
    * ids come from [[globalRowIds]] (sort + zipWithIndex, parallel);
    * the cross-frame offset is the running total of the earlier frames'
    * counts (cheap driver-side metadata aggregates).
    */
  def sequentialRowIds(frames: Seq[DataFrame], orderBy: Seq[Column],
                       idCol: String = "row_id"): Seq[DataFrame] = {
    val counts = frames.map(_.count())
    val offsets = counts.scanLeft(0L)(_ + _)
    frames.zip(offsets).map { case (df, off) =>
      globalRowIds(df, orderBy, idCol, start = off + 1L)
    }
  }

  /** Semi-join reduction: prune `big` down to rows whose key MIGHT match
    * `small`'s key set, using a bloom filter built from the small side —
    * the standard big-join scale move when the small side is too large to
    * broadcast the join itself but its KEY SET fits a few-hundred-KB
    * filter. The pruned frame then joins exactly; bloom false positives
    * (rate `fpp`) survive the prune but are eliminated by the join, so
    * the composition is EXACT — and the shuffle pays only
    * |matching| + fpp·|big| rows instead of |big|.
    *
    * Built on the same native pair Spark's own AQE runtime filters use —
    * `BloomFilterAggregate` over xxhash64(key) on the build side, a
    * codegen'd `BloomFilterMightContain` literal filter on the probe side
    * (no UDF in the per-row path). The filter bytes ride to the driver
    * once (size set by `expectedItems`/`fpp`, ~1.2 MB at 1M keys / 3% —
    * the same bounded model-state surface as broadcast). Unlike AQE's
    * automatic injection this composes across statements: build once,
    * prune many frames (e.g. each table of a star schema) or reuse
    * across a session. Empty/null-only build side ⇒ nothing can match ⇒
    * returns `big.filter(false)` (exact).
    */
  def bloomPrune(big: DataFrame, bigKey: String,
                 small: DataFrame, smallKey: String,
                 expectedItems: Long = 1000000L,
                 fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    // XxHash64 is type-sensitive: INT 5 and BIGINT 5 hash differently, so
    // mismatched key types would produce silent FALSE NEGATIVES (breaking
    // the "composition is EXACT" contract) even though the exact join
    // itself would coerce and match them. Hash both sides in their
    // tightest common type; refuse pairs with no lossless widening.
    val bigType = big.schema(bigKey).dataType
    val smallType = small.schema(smallKey).dataType
    val hashType =
      if (bigType == smallType) bigType
      else org.apache.spark.sql.catalyst.analysis.TypeCoercion
        .findTightestCommonType(bigType, smallType)
        .getOrElse(throw new IllegalArgumentException(
          s"bloomPrune: no lossless common type for $bigKey:$bigType vs " +
            s"$smallKey:$smallType — cast one side explicitly before pruning"))
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnShim.expression(col(smallKey).cast(hashType)))),
      Literal(expectedItems), Literal(numBits))
    val bytes = small.filter(col(smallKey).isNotNull)
      .select(GraftColumnShim.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bytes == null) big.filter(lit(false))
    else big.filter(GraftColumnShim.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      new XxHash64(Seq(GraftColumnShim.expression(col(bigKey).cast(hashType)))))))
  }

  /** MERGE-style keyed upsert: apply a batch of `updates` to `base` with
    * latest-wins semantics — updated keys take the update row, new keys
    * insert, untouched base rows pass through. The snapshot-maintenance
    * primitive a dimension table needs between SCD2 loads (which keep
    * history; this keeps the current image).
    *
    * When `updates` carries several rows per key, `versionOrder` picks
    * the survivor (max wins, ties broken by the key itself upstream —
    * callers pass a total order, same contract as [[Dedup.keepFirst]]);
    * without it, duplicate update keys are refused loudly rather than
    * resolved arbitrarily.
    *
    * Scale shape: the common case is a huge base and a small delta, so
    * the base side is a broadcast LEFT ANTI join against the update
    * KEYS — the 100 TB base never shuffles and never round-trips the
    * driver; the delta dedup shuffles only the delta. With
    * `broadcastUpdates = false` (delta too big to broadcast) the anti
    * join becomes a shuffled hash join on the key — still one shuffle
    * of each side, no full rewrite. Output column order is `base`'s
    * (updates are conformed by name), so the result unions cleanly and
    * publishes atomically through [[graft.sources.Sinks.Versioned]] —
    * merge-then-swap, never in-place.
    *
    * Null keys follow join semantics: a null-keyed base row never
    * matches a delta key (it always passes through), and a null-keyed
    * delta row always inserts — upsert keys should be non-null by
    * schema contract, same as any MERGE.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             versionOrder: Option[Column] = None,
             broadcastUpdates: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val cols = base.columns.toSeq
    require(updates.columns.toSet == cols.toSet,
      s"upsert: updates columns ${updates.columns.sorted.mkString(",")} " +
        s"must match base columns ${cols.sorted.mkString(",")}")
    // names matching is not enough: a mistyped delta (string-typed CSV
    // read) would silently WIDEN the snapshot schema through the union
    // (double ∪ string → string) — refuse loudly instead
    val typeDrift = cols.flatMap { c =>
      val (bt, ut) = (base.schema(c).dataType, updates.schema(c).dataType)
      if (bt == ut) None else Some(s"$c: base $bt vs updates $ut")
    }
    require(typeDrift.isEmpty,
      s"upsert: update column types must match base — ${typeDrift.mkString("; ")}")
    // helper columns must not shadow (and then destroy) a real data
    // column named `_rn`/`_dup_chk` — pick the first suffix that is free
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !cols.contains(n)).get
    val latest = versionOrder match {
      case Some(ord) =>
        val rn = fresh("_rn")
        val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.desc)
        updates.withColumn(rn, row_number().over(w))
          .filter(col(rn) === 1).drop(rn)
      case None =>
        // lazy in-plan guard — no eager driver action; the window count
        // shuffles only the delta, and assert_true fails the job loudly
        // on the first duplicate key at execution time
        val chk = fresh("_dup_chk")
        val w = Window.partitionBy(keys.map(col): _*)
        updates.withColumn(chk, assert_true(
            count(lit(1)).over(w) === 1,
            lit("upsert: duplicate keys in updates and no versionOrder given — " +
              "pass versionOrder to pick a survivor")))
          .filter(col(chk).isNull).drop(chk)
    }
    val updateKeys = latest.select(keys.map(col): _*).distinct()
    val keep = base.join(
      if (broadcastUpdates) broadcast(updateKeys) else updateKeys,
      keys, "left_anti")
    keep.unionByName(latest.select(cols.map(col): _*))
  }
}
