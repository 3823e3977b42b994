package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation operator family (SURVEY.md §2.8, A1-A11).
  *
  * All of these compile to HashAggregate with map-side partial
  * aggregation (the `collect_set` variant to ObjectHashAggregate), so the
  * shuffle carries one partial row per (partition, key) — the property
  * that keeps them viable at 100 TB.
  */
object Aggs {

  /** Exact top-k rows BY RANK per group without sorting whole groups —
    * the low-cardinality-window fix (r17 full-surface sf10 sweep: a
    * rank window partitioned by a 5-value column sorts 3 M rows per
    * task at sf10, parallelism capped at the group count; 14× wall for
    * 10× data). Two phases:
    *
    *   1. SALTED local window: partition by (group, hash-salt) — the
    *      sort parallelism becomes groups × salts — and keep rows with
    *      local rank ≤ k. Correct superset: a row with GLOBAL rank ≤ k
    *      has < k rows strictly above it anywhere, so < k in its own
    *      salt.
    *   2. exact rank window over the ≤ groups·salts·k survivors
    *      (window input is now k-sized, not corpus-sized), filter ≤ k.
    *      Exact because every row strictly above a global top-k row is
    *      itself global top-k and therefore survived phase 1 — and a
    *      non-top-k survivor still sees ≥ k kept rows above it, so the
    *      final filter drops it (ties included: a row tied with a kept
    *      row shares its rank).
    *
    * The same argument makes dense_rank / row_number computed OVER THE
    * RETURNED FRAME exact for every returned row (all strictly-above
    * rows and all same-key ties are present). `saltBy` must be a
    * deterministic per-row expression (hash of a unique id).
    */
  def topKByRank(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                 k: Int, saltBy: Column, salts: Int = 32,
                 rankAlias: String = "rnk"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && salts > 0, "k and salts must be positive")
    val salted = df.withColumn("_tk_salt", pmod(saltBy, lit(salts)))
    val wLocal = Window
      .partitionBy((groupCols.map(col) :+ col("_tk_salt")): _*)
      .orderBy(order: _*)
    val cand = salted.withColumn("_tk_lr", rank().over(wLocal))
      .filter(col("_tk_lr") <= k).drop("_tk_lr", "_tk_salt")
    val wGlobal = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    cand.withColumn(rankAlias, rank().over(wGlobal))
      .filter(col(rankAlias) <= k)
  }

  /** SQL-standard NTILE(buckets) as arithmetic over (row_number, group
    * size) — for reports that already bound their rows (e.g. via
    * [[topKByRank]]) but must label them with tiles of the FULL group:
    * ntile itself is a window over every row of the partition, which is
    * exactly the full-group sort the top-k path exists to avoid. With
    * n = q·buckets + r, the first r tiles hold q+1 rows:
    * tile(rn) = ceil(rn/(q+1)) for rn ≤ r(q+1), else
    * r + ceil((rn − r(q+1))/q). Matches Spark's and DuckDB's ntile
    * bit-for-bit (oracle-pinned via q_rank).
    */
  def ntileOf(rn: Column, n: Column, buckets: Int): Column = {
    // Column `/` is fractional — integer ceil-div via floor((a+b-1)/b);
    // all operands ≤ group sizes ≪ 2^53, so the doubles are exact
    def ceilDiv(a: Column, b: Column) = floor((a + b - lit(1L)) / b).cast("long")
    val q = floor(n / buckets).cast("long")
    val r = pmod(n.cast("long"), lit(buckets.toLong))
    val boundary = r * (q + lit(1L))
    when(rn <= boundary, ceilDiv(rn, q + lit(1L)))
      // q = 0 only when n < buckets, where rn ≤ n = boundary keeps every
      // row in the first branch — greatest() just guards the dead /0
      .otherwise(r + ceilDiv(rn - boundary, greatest(q, lit(1L))))
      .cast("int")
  }

  /** A2: group-by with sum + sorted-distinct string concatenation —
    * pandas `.agg({amt: "sum", code: lambda s: "; ".join(sorted(set(s)))})`
    * (DOP VP Compare.py:125-134). No UDAF: collect_set → sort_array →
    * array_join is an exact semantic match.
    */
  def sumAndSortedSet(df: DataFrame, key: String, amount: Column, code: Column,
                      amountAlias: String = "total", codesAlias: String = "codes",
                      sep: String = "; "): DataFrame =
    df.groupBy(key).agg(
      sum(amount).as(amountAlias),
      array_join(sort_array(collect_set(code.cast("string"))), sep).as(codesAlias))

  /** Skew-safe variant of the sorted-set aggregation: a hot key whose
    * distinct-value set is huge makes the single ObjectHashAggregate
    * buffer for that key the straggler. Two phases bound it:
    *   1. partial `collect_set` per (key, salt) — the hot key's values
    *     spread across `buckets` buffers on different reducers;
    *   2. final merge per key: flatten + array_distinct + sort + join.
    * Same result as [[sumAndSortedSet]] for any data (spec-asserted);
    * use when a key can own millions of distinct codes. The same
    * two-phase shape generalizes to any non-algebraic aggregate
    * (exact percentile, collect_list) whose buffer is per-key unbounded.
    */
  def sumAndSortedSetSalted(df: DataFrame, key: String, amount: Column, code: Column,
                            amountAlias: String = "total", codesAlias: String = "codes",
                            sep: String = "; ", buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(code.cast("string")), lit(buckets)))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(amount).as("_amt"), collect_set(code.cast("string")).as("_codes"))
      .groupBy(key)
      .agg(sum(col("_amt")).as(amountAlias),
        array_join(
          sort_array(array_distinct(flatten(collect_list(col("_codes"))))),
          sep).as(codesAlias))
  }

  /** A4: masked conditional sums — per-bucket totals in ONE pass over the
    * data (`merged.loc[mask, col].sum()` per bucket, DOP VP Compare.py:200-204,
    * re-planned from N passes to one grouping-set-style aggregate).
    */
  def maskedSums(df: DataFrame, masks: Seq[(String, Column)], value: Column): DataFrame =
    df.agg(
      masks.head match { case (n, m) => sum(when(m, value)).as(n) },
      masks.tail.map { case (n, m) => sum(when(m, value)).as(n) }: _*)

  /** A8: histogram binning — integer-bucket counts (CTP Data Compare.ipynb
    * hist). `width` buckets of `floor(c / width) * width`.
    */
  def histogram(df: DataFrame, c: Column, width: Double): DataFrame =
    df.groupBy((floor(c / width) * width).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** A10: dynamic pivot — `PIVOT(SUM(x) FOR k IN (<runtime-discovered>))`
    * (Study Startup Data Extract.sql:19-34). Spark's `pivot()` without a
    * value list discovers the values natively (one extra distinct job);
    * callers that know the values should pass them to skip that job.
    */
  def dynamicPivot(df: DataFrame, groupKey: String, pivotKey: String,
                   value: Column, values: Seq[String] = Nil): DataFrame = {
    val g = df.groupBy(col(groupKey))
    val p = if (values.nonEmpty) g.pivot(pivotKey, values) else g.pivot(pivotKey)
    p.agg(sum(value))
  }

  /** A11: summary-table construction — (Metric, Value) rows from a set of
    * scalar aggregates, computed in one pass then unpivoted (the reference
    * builds this from collected python scalars, DOP VP Compare.py:285-314).
    */
  def summaryTable(df: DataFrame, metrics: Seq[(String, Column)]): DataFrame = {
    val agged = df.agg(
      metrics.head match { case (n, c) => c.cast("double").as(n) },
      metrics.tail.map { case (n, c) => c.cast("double").as(n) }: _*)
    agged.unpivot(Array.empty[Column], metrics.map(m => col(m._1)).toArray,
      "metric", "value")
  }

  /** Exact per-group percentiles by distributed rank-select — the scale
    * path for exact quantiles when individual groups are too large to
    * buffer. `percentile()` (ObjectHashAggregate) holds every value of a
    * group in one aggregation buffer: fine when groups are small, an OOM
    * when one group holds billions of rows. This operator never
    * materializes a group in one place:
    *
    *   1. range-partition by (group, value) and sort within partitions —
    *      each group's values are globally sorted across partitions, and
    *      every partition stays bounded by `maxPartitionBytes`-scale
    *      sizing regardless of group skew;
    *   2. one pass collects per-(partition, group) COUNTS only —
    *      O(partitions × groups) longs on the driver, the same metadata
    *      footprint as [[graft.operators.Joins.globalPrefixSum]];
    *   3. from the counts, each percentile p of a group with n values
    *      needs the values at global ranks floor(r) and ceil(r),
    *      r = p·(n−1) — a second pass over the cached sorted data emits
    *      just those ≤ 2·|percentiles| rows per group;
    *   4. linear interpolation (⌈r⌉−r)·v_lo + (r−⌊r⌋)·v_hi — the exact
    *      symmetric form Spark `percentile` and DuckDB `quantile_cont`
    *      evaluate, bit-for-bit.
    *
    * Driver state is O(partitions × groups + groups × percentiles):
    * meant for the huge-group/low-cardinality regime. For
    * high-cardinality small groups use `percentile()` — each buffer is
    * small there — or `approx_percentile`.
    *
    * Nulls in the value column are ignored (SQL aggregate semantics); a
    * group with no non-null values is absent from the output (matching
    * `GROUP BY` over the filtered rows).
    *
    * `maxGroups` enforces the documented regime: the group cardinality is
    * probed with a map-side `approx_count_distinct` before any shuffle,
    * and the call fails fast when it exceeds the cap — catching the
    * wrong-regime call BEFORE the O(partitions × groups) driver collect
    * allocates, not after. Raise it explicitly only if the driver heap is
    * sized for the resulting metadata.
    */
  def rankSelectPercentiles(df: DataFrame, groupCol: String, value: Column,
                            percentiles: Seq[(Double, String)],
                            maxGroups: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    require(percentiles.nonEmpty && percentiles.forall { case (p, _) => p >= 0 && p <= 1 },
      "percentiles must be in [0, 1]")
    val spark = df.sparkSession
    val approxGroups =
      df.select(approx_count_distinct(col(groupCol)).as("_n")).head().getLong(0)
    require(approxGroups <= maxGroups,
      s"rankSelectPercentiles: ~$approxGroups distinct '$groupCol' groups exceed " +
        s"maxGroups=$maxGroups. This operator holds O(partitions × groups) driver " +
        "state and is meant for the huge-group/LOW-cardinality regime; for many " +
        "small groups use percentile() or approx_percentile (per-group buffers " +
        "are small there), or raise maxGroups if the driver heap is sized for it")
    val nPart = spark.sessionState.conf.numShufflePartitions
    val groupField = df.select(col(groupCol)).schema.head

    val sorted = df
      .select(col(groupCol).as("_g"), value.cast("double").as("_v"))
      .filter(col("_v").isNotNull)
      .repartitionByRange(nPart, col("_g"), col("_v"))
      .sortWithinPartitions("_g", "_v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-(partition, group) counts — the only global state
    val counts: Array[(Int, Any, Long)] = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      // groups are contiguous within a (group, value)-sorted partition
      val m = scala.collection.mutable.LinkedHashMap.empty[Any, Long]
      it.foreach { r => val g = r.get(0); m.update(g, m.getOrElse(g, 0L) + 1L) }
      m.iterator.map { case (g, c) => (pid, g, c) }
    }.collect()

    val totals: Map[Any, Long] =
      counts.groupBy(_._2).map { case (g, cs) => g -> cs.map(_._3).sum }
    // global rank of the first row of group g in partition pid
    val offsets: Map[(Int, Any), Long] =
      counts.groupBy(_._2).flatMap { case (g, cs) =>
        val byPid = cs.sortBy(_._1)
        val exclusive = byPid.map(_._3).scanLeft(0L)(_ + _)
        byPid.zip(exclusive).map { case ((pid, _, _), off) => (pid, g) -> off }
      }

    // target global ranks per group: (rank → emit slots (percentileIdx, isHi))
    val wanted: Map[Any, Map[Long, Seq[(Int, Boolean)]]] = totals.map { case (g, n) =>
      val slots = percentiles.zipWithIndex.flatMap { case ((p, _), i) =>
        val r = p * (n - 1)
        Seq((r.toLong, (i, false)), (math.ceil(r).toLong, (i, true)))
      }
      g -> slots.groupBy(_._1).map { case (rk, xs) => rk -> xs.map(_._2) }
    }
    // resolve wanted GLOBAL ranks to (partition → group → LOCAL rank)
    // on the driver: pass 2 then skips every partition holding no wanted
    // rank without consuming a row, and early-exits a hit partition
    // after its last wanted local rank — with ≤ 2·|percentiles| wanted
    // rows per group, almost every partition is skipped wholesale
    // (measured at sf10: 29.9 s → see SCALE.md).
    val localWanted: Map[Int, Map[Any, Map[Long, Seq[(Int, Boolean)]]]] =
      counts.groupBy(_._1).map { case (pid, cs) =>
        pid -> cs.flatMap { case (_, g, c) =>
          val off = offsets((pid, g))
          val inPart = wanted(g).collect {
            case (rk, slots) if rk >= off && rk < off + c => (rk - off) -> slots
          }
          if (inPart.isEmpty) None else Some(g -> inPart)
        }.toMap
      }.filter(_._2.nonEmpty)
    val bcLocalWanted = spark.sparkContext.broadcast(localWanted)

    // pass 2: touch only partitions (and prefixes) that hold wanted ranks
    val hits: Array[(Any, Int, Boolean, Double)] = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      bcLocalWanted.value.get(pid) match {
        case None => Iterator.empty
        case Some(want) =>
          val remaining = want.view.mapValues(_.size).values.sum
          var found = 0
          var curG: Any = null
          var local = -1L
          // takeWhile stops PULLING rows once every wanted rank in this
          // partition is found — the tail of the partition is never
          // deserialized
          it.takeWhile(_ => found < remaining).flatMap { r =>
            val g = r.get(0)
            if (local < 0 || g != curG) { curG = g; local = 0L } else local += 1L
            want.get(g).flatMap(_.get(local)) match {
              case Some(slots) =>
                found += 1
                slots.map { case (i, hi) => (g, i, hi, r.getDouble(1)) }
              case None => Nil
            }
          }
      }
    }.collect()
    sorted.unpersist()
    bcLocalWanted.destroy()

    val rows = hits.groupBy(_._1).toSeq.map { case (g, hs) =>
      val vals = percentiles.zipWithIndex.map { case ((p, _), i) =>
        val lo = hs.find(h => h._2 == i && !h._3).get._4
        val hi = hs.find(h => h._2 == i && h._3).get._4
        val r = p * (totals(g) - 1)
        // the SYMMETRIC weighted form — (⌈r⌉−r)·lo + (r−⌊r⌋)·hi — is what
        // both Spark `percentile` and DuckDB `quantile_cont` evaluate;
        // the asymmetric lo + frac·(hi−lo) differs in the last ulp on
        // real data (caught by the sf0.1 oracle gate on p95 prices)
        if (math.floor(r) == math.ceil(r)) hi
        else (math.ceil(r) - r) * lo + (r - math.floor(r)) * hi
      }
      Row.fromSeq(g +: vals)
    }
    val schema = StructType(groupField.copy(name = groupCol) +:
      percentiles.map { case (_, alias) => StructField(alias, DoubleType, nullable = false) })
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** EXACT per-group percentiles from a bounded VALUE HISTOGRAM — the
    * scale path when the value column is low-cardinality (quantities,
    * ratings, day-of-month, coded categories): a 100 TB column with 50
    * distinct values needs a 50-row histogram per group, not a sort of
    * the corpus. Two tiny shuffles total — `groupBy(group, value)`
    * count (output ≤ groups × distinct values, map-side combined, so
    * executors stream the corpus once and emit almost nothing) and the
    * per-group histogram collect — then each percentile reads off the
    * sorted cumulative counts INSIDE a Column fold.
    *
    * Value-identical to [[rankSelectPercentiles]] / Spark `percentile`
    * / DuckDB `quantile_cont` (spec-pinned): same rank r = p·(n−1),
    * same symmetric interpolation (⌈r⌉−r)·v_lo + (r−⌊r⌋)·v_hi
    * evaluated over the same double operands. Nulls ignored; a group
    * with no non-null values is absent — the same contract as the
    * other two forms.
    *
    * `maxDistinct` enforces the regime: the VALUE cardinality is probed
    * map-side (approx_count_distinct) before any shuffle and the call
    * fails fast past the cap, naming the right operator for the other
    * regime — the mirror of [[rankSelectPercentiles]]' maxGroups guard.
    * The probe is a SEPARATE full scan of the input before the real job
    * (the same documented cost as rankSelectPercentiles' count pass) —
    * acceptable because wrong-regime refusal must happen BEFORE the
    * shuffle materializes executor-crushing histograms, and a scan is
    * the cheapest full-input pass there is. The HLL estimate carries
    * ~2% rsd, so a true cardinality slightly above the cap can slip
    * through — fine: the cap is an order-of-magnitude regime guard
    * (executor-memory bound, not a driver one), not an exact limit.
    * Per-group state is one array of ≤ ~maxDistinct (value, count)
    * structs on EXECUTORS (never the driver).
    */
  def histogramPercentiles(df: DataFrame, groupCol: String, value: Column,
                           percentiles: Seq[(Double, String)],
                           maxDistinct: Long = 100000L): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall { case (p, _) => p >= 0 && p <= 1 },
      "percentiles must be in [0, 1]")
    val approxVals =
      df.select(approx_count_distinct(value).as("_n")).head().getLong(0)
    require(approxVals <= maxDistinct,
      s"histogramPercentiles: ~$approxVals distinct values exceed " +
        s"maxDistinct=$maxDistinct. This operator materializes one " +
        "(value, count) histogram row per distinct value per group and is " +
        "meant for LOW-cardinality value columns; for continuous values " +
        "use rankSelectPercentiles (huge groups) or percentile() " +
        "(many small groups)")
    val hist = df
      .select(col(groupCol).as("_g"), value.cast("double").as("_v"))
      .filter(col("_v").isNotNull)
      .groupBy(col("_g"), col("_v")).agg(count(lit(1)).as("_c"))
      .groupBy(col("_g"))
      .agg(sort_array(collect_list(struct(col("_v"), col("_c")))).as("_h"),
        sum(col("_c")).as("_n"))
    // per percentile: one fold over the sorted histogram carrying
    // (cumulative count, value at rank ⌊r⌋, value at rank ⌈r⌉) — the
    // value at rank k is the first entry whose cumulative count
    // exceeds k
    val cols = percentiles.map { case (p, alias) =>
      val r = lit(p) * (col("_n").cast("double") - lit(1.0))
      val rf = floor(r)
      val rc = ceil(r)
      val picked = aggregate(col("_h"),
        struct(lit(0L).cast("long").as("cum"),
          lit(null).cast("double").as("lo"),
          lit(null).cast("double").as("hi")),
        (acc, e) => {
          val cum = acc.getField("cum") + e.getField("_c")
          struct(cum.as("cum"),
            coalesce(acc.getField("lo"),
              when(cum.cast("double") > rf, e.getField("_v"))).as("lo"),
            coalesce(acc.getField("hi"),
              when(cum.cast("double") > rc, e.getField("_v"))).as("hi"))
        })
      when(rf === rc, picked.getField("hi"))
        .otherwise((rc - r) * picked.getField("lo") +
          (r - rf) * picked.getField("hi"))
        .as(alias)
    }
    hist.select((col("_g").as(groupCol) +: cols): _*)
  }

  /** Per-group PERSISTABLE distinct-count sketches (HyperLogLog, Apache
    * DataSketches binary): one row per fine-grained group with a
    * mergeable `sketch` column plus the exact row count. The
    * incremental-analytics pattern for 100 TB: sketch each ingest
    * partition (day, source, shard) ONCE when it lands, persist the
    * sketch table (a few KB per group), and answer any coarser
    * distinct-count rollup forever after from [[mergeSketches]] —
    * without rescanning a byte of the corpus. `approx_count_distinct`
    * alone cannot do this: its sketch dies inside the query.
    *
    * lgK = 12 ⇒ ~1.6% relative standard error in 4 KB per group.
    */
  def distinctSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(col(valueCol)).as("n_rows"))

  /** Roll persisted sketches up to a coarser grouping: register-wise HLL
    * union (an algebraic aggregate — partial-merged map-side like any
    * sum) plus the summed row counts, with the estimate materialized.
    * Union of per-partition sketches is register-max, so the rollup
    * estimate is IDENTICAL to sketching the coarse group directly
    * (spec-asserted) — order- and partitioning-invariant.
    */
  def mergeSketches(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch"), lit(false)).as("sketch"),
        sum(col("n_rows")).as("n_rows"))
      .withColumn("approx_distinct", hll_sketch_estimate(col("sketch")))

  /** Per-group PERSISTABLE item-frequency sketches (count-min, Spark's
    * built-in linear sketch — `count_min_sketch` aggregate, map-side
    * partial like any sum): one row per fine-grained group with a
    * mergeable `sketch` binary plus the exact item count. Same
    * incremental pattern as [[distinctSketches]], for FREQUENCY instead
    * of cardinality: sketch each ingest partition once, persist, and
    * answer "how often does token X appear in any coarser slice" forever
    * without rescanning — with the CMS one-sided guarantee
    * estimate ≥ true count (never an undercount).
    *
    * eps/confidence size the sketch: width ⌈e/eps⌉ × depth ⌈ln(1/(1-conf))⌉
    * longs (1e-4 / 0.99 ⇒ 27183×5 ≈ 1.1 MB per group — choose eps per
    * group-count budget).
    */
  def cmSketches(df: DataFrame, groupCols: Seq[String], itemCol: String,
                 eps: Double = 1e-4, confidence: Double = 0.99,
                 seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count_min_sketch(col(itemCol), lit(eps), lit(confidence),
          lit(seed)).as("sketch"),
        count(col(itemCol)).as("n_items"))

  /** Roll a CMS table up to a coarser grouping. CMS is LINEAR — cell-wise
    * counter addition over shared hash planes (same eps/confidence/seed)
    * — so the merged sketch is BIT-IDENTICAL to sketching the coarse
    * group directly, independent of merge order (spec-asserted). The
    * collect_list is bounded: one element per fine group being rolled up,
    * each a fixed-size blob.
    */
  def mergeCmSketches(sketches: DataFrame, groupCols: Seq[String]): DataFrame = {
    val mergeAll = udf((parts: Seq[Array[Byte]]) => {
      val it = parts.iterator.map(b =>
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(b)))
      val acc = it.next()
      it.foreach(acc.mergeInPlace)
      val bos = new java.io.ByteArrayOutputStream()
      acc.writeTo(bos)
      bos.toByteArray
    })
    sketches.groupBy(groupCols.map(col): _*)
      .agg(collect_list(col("sketch")).as("_parts"),
        sum(col("n_items")).as("n_items"))
      .select(groupCols.map(col) ++ Seq(mergeAll(col("_parts")).as("sketch"),
        col("n_items")): _*)
  }

  /** Point-estimate a string item against a sketch blob. Deserialization
    * is per-row — apply to bounded candidate sets (top-m per group), not
    * the raw corpus; candidates × sketch rows arrive via a broadcast
    * join of the (small) merged table.
    */
  def cmEstimate(sketch: Column, item: Column): Column = {
    val f = udf((bytes: Array[Byte], it: String) =>
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes)).estimateCount(it))
    f(sketch, item)
  }

  /** Per-group PERSISTABLE quantile sketches (Apache DataSketches KLL):
    * the quantile leg of the sketch-table family —
    * [[distinctSketches]]=HLL, [[cmSketches]]=CMS, this=KLL. Sketch each
    * ingest partition once, persist, answer median/p95 over any coarser
    * slice forever without rescanning — what `approx_percentile` cannot
    * do (its t-digest dies inside the query). Native
    * TypedImperativeAggregate (graft.plans.KllSketchAgg), map-side
    * partial like any sum. k=200 ⇒ ~1.65% rank error in a few KB.
    */
  def quantileSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       k: Int = 200): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.plans.KllSketch.sketchAgg(col(valueCol).cast("double"), k)
          .as("sketch"),
        count(col(valueCol)).as("n_rows"))

  /** Roll a KLL table up to a coarser grouping (sketch union — algebraic,
    * partial-merged map-side). Unlike HLL/CMS the merged sketch is not
    * bit-identical to a direct build (compaction depends on fill order)
    * but the rank-error guarantee is preserved (spec-asserted).
    */
  def mergeQuantileSketches(sketches: DataFrame, groupCols: Seq[String],
                            k: Int = 200): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(graft.plans.KllSketch.mergeAgg(col("sketch"), k).as("sketch"),
        sum(col("n_rows")).as("n_rows"))

  /** INCLUSIVE quantile at rank p from a sketch blob (per-group rows
    * only — never the raw corpus).
    */
  def kllQuantile(sketch: Column, p: Double): Column =
    graft.plans.KllSketch.quantile(sketch, lit(p))

  /** Spearman rank correlation between two score columns — the
    * signal-agreement check a curation stack runs before trusting two
    * quality gates to vote (do the hashed classifier and the LM rank
    * the corpus the same way?). Pearson over raw doubles is NOT
    * cross-engine exact (float sums); ranks are. Ranks here are ROW
    * ranks under the total order (value ASC, id ASC) — deterministic
    * in any engine without average-rank tie arithmetic — and
    * Σd² = Σ(rankA − rankB)² is an exact integer, so the only IEEE
    * operation is the final ρ = 1 − 6Σd²/(n(n²−1)) evaluated
    * identically from exact operands.
    *
    * Rows where either score is null are dropped (unrankable).
    * Σd² accumulates as DECIMAL(38,0): per-term d² fits a long to
    * n ≈ 3·10⁹ rows, the sum is exact to 10³⁸ — no silent wrap at any
    * realistic corpus size.
    *
    * Cross-engine bit-identity contract for the emitted `sum_d2`
    * DOUBLE: exact while Σd² ≤ 2⁵³ (n ≲ ~3 M joined rows — Σd² grows
    * as O(n³/3) in the anti-correlated worst case). Beyond that the
    * value is correct to 1 ulp here (one correctly-rounded
    * decimal→double cast), but another engine's decimal→double path
    * may double-round (DuckDB hugeint→double), so a HASH gate on
    * sum_d2 is only guaranteed flake-free under the 2⁵³ bound; the
    * oracle gates run at sf ≤ 0.1 (n ≈ 10⁴), five orders inside it.
    * `spearman_rho` itself is derived from the same exact operands on
    * both engines and shares the bound.
    *
    * Scale shape: two range-partitioned sort+zipWithIndex rank passes
    * ([[Joins.globalRowIds]] — NO single-partition window), one
    * equi-join on the id, one all-partial aggregate to a single row.
    */
  def spearmanRank(df: DataFrame, idCol: String,
                   aCol: String, bCol: String): DataFrame = {
    // both rank passes consume the (possibly whole-scoring-pipeline)
    // input — materialize it ONCE (the ccnetBuckets rule: an operator
    // consuming its input N times must materialize it)
    val reliable = df.sparkSession.sparkContext.getCheckpointDir.isDefined
    val base0 = df.select(col(idCol), col(aCol), col(bCol))
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val base = if (reliable) base0.checkpoint(eager = true)
               else base0.localCheckpoint(eager = true)
    val ra = Joins.globalRowIds(base.select(col(idCol), col(aCol)),
        Seq(col(aCol), col(idCol)), "_ra")
      .select(col(idCol), col("_ra"))
    val rb = Joins.globalRowIds(base.select(col(idCol), col(bCol)),
        Seq(col(bCol), col(idCol)), "_rb")
      .select(col(idCol), col("_rb"))
    val d = col("_ra") - col("_rb")
    val nd = col("n").cast("double")
    ra.join(rb, Seq(idCol))
      .agg(count(lit(1)).as("n"),
        coalesce(sum((d * d).cast("decimal(38,0)")),
          lit(BigDecimal(0)).cast("decimal(38,0)")).as("_sum_d2_exact"))
      // output the exact integer as DOUBLE, not DECIMAL: Spark parquet
      // DECIMAL(38,9) reads back as Decimal OBJECTS (object dtype) in
      // pandas while DuckDB's lands as float64, so cross-engine hash
      // gates split on the dtype even when values are bit-equal. Both
      // engines casting the same exact decimal to double use IEEE
      // round-to-nearest → bit-identical at any magnitude (exact to
      // 2⁵³ anyway; Σd² ≤ ~1e29 loses only sub-ulp precision).
      .select(col("n"),
        col("_sum_d2_exact").cast("double").as("sum_d2"),
        when(col("n") > 1,
          lit(1.0) - (lit(6.0) * col("_sum_d2_exact").cast("double")) /
            (nd * (nd * nd - lit(1.0)))).as("spearman_rho"))
  }
}
