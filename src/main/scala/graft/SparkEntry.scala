package graft

import graft.functions.{Compat, TextFunctions}
import graft.operators._
import graft.pipelines.{IncrementalCuration, Reconciliation}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data extensions), each with a DuckDB
  * oracle where the semantics are SQL-expressible.
  *
  * Determinism rules used throughout so the driver's hash compare is
  * stable across engines:
  *   - every query ends in a total-order `orderBy`;
  *   - double aggregations go through DECIMAL (exact, order-independent)
  *     and back to DOUBLE — see [[Compat.exactSum]];
  *   - aliases are lowercase and identical between Spark and SQL.
  */
object SparkEntry {

  private val D2 = DecimalType(27, 2)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Reconciliation.detail(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- §2.8 aggregations -------------------------------------------
    "q1_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Compat.exactSum(col("l_quantity"), 2).as("sum_qty"),
          Compat.exactSum(col("l_extendedprice"), 2).as("sum_base_price"),
          Compat.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("sum_disc_price"),
          Compat.exactSum(
            col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6)
            .as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q3_top10" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(Compat.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q_a2_sortedset" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          Compat.exactSum(col("l_quantity"), 2).as("sum_qty"),
          Compat.sortedSetJoin(col("l_linestatus")).as("statuses"))
        .orderBy("l_returnflag")),
    "q_a4_masked" -> ((s, d) =>
      Aggs.maskedSums(Tables.lineitem(s, d), Seq(
        "returned_qty" -> (col("l_returnflag") === "R"),
        "qty_1997" -> (year(col("l_shipdate")) === 1997),
        "high_disc_qty" -> (col("l_discount") > 0.05)
      ), col("l_quantity").cast(D2))
        .select(
          col("returned_qty").cast("double").as("returned_qty"),
          col("qty_1997").cast("double").as("qty_1997"),
          col("high_disc_qty").cast("double").as("high_disc_qty"))),
    "q_a7_window_count" -> ((s, d) =>
      Dedup.withDuplicateCount(
        Tables.documents(s, d).select("doc_id", "lang"), Seq("lang"), "lang_count")
        .orderBy("doc_id")),
    "q_a8_hist" -> ((s, d) =>
      Aggs.histogram(Tables.orders(s, d), col("o_totalprice"), 20000.0)
        .select(col("bucket").cast("long").as("bucket"), col("n"))
        .orderBy("bucket")),
    "q_a10_pivot" -> ((s, d) =>
      Aggs.dynamicPivot(Tables.orders(s, d), "o_orderpriority", "o_orderstatus",
        col("o_totalprice").cast(D2))
        .select(col("o_orderpriority"),
          col("F").cast("double").as("f_total"),
          col("O").cast("double").as("o_total"),
          col("P").cast("double").as("p_total"))
        .orderBy("o_orderpriority")),
    "q_a11_summary" -> ((s, d) =>
      Aggs.summaryTable(Tables.orders(s, d), Seq(
        "n_orders" -> count(lit(1)),
        "total_value" -> sum(col("o_totalprice").cast(D2)).cast("double"),
        "max_price" -> max(col("o_totalprice")),
        "min_price" -> min(col("o_totalprice"))
      )).orderBy("metric")),

    // ---- §2.5 cleaning / scalar expressions ---------------------------
    "q_c_clean" -> ((s, d) =>
      Tables.eventsWide(s, d).select(
        col("event_id"),
        // from_json with a declared schema parses once into a typed
        // struct — measured ~2× cheaper than get_json_object's per-call
        // path evaluation on this 100k-row projection
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"),
        Compat.normalizeId(col("event_type")).as("etype_norm"),
        Compat.nullTokens(col("event_type")).as("etype_nn"),
        coalesce(col("value"), lit(0.0)).as("value_filled"),
        Compat.rowKey(Seq(col("event_type"), col("user_id"))).as("row_key"))
        .orderBy("event_id")),
    "q_c20_dates" -> ((s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 100).select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        add_months(col("o_orderdate"), 1).cast("timestamp").as("next_month"),
        last_day(col("o_orderdate")).as("month_end"),
        date_format(col("o_orderdate"), "MMMM").as("month_name"),
        Compat.timestampCascade(
          date_format(col("o_orderdate"), "MM/dd/yyyy"), "MM/dd/yyyy").as("parsed_back"))
        .orderBy("o_orderkey")),

    // ---- §2.6 duplicate handling -------------------------------------
    "q_d2_dup_after_first" -> ((s, d) =>
      Dedup.duplicatesAfterFirst(
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber"),
        Seq("l_orderkey"), Seq(col("l_linenumber")))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_d3_dup_all" -> ((s, d) =>
      Dedup.duplicatesAll(
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber"),
        Seq("l_orderkey"))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_d4_dup_count" -> ((s, d) =>
      Dedup.withDuplicateCount(
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber"),
        Seq("l_orderkey"))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_d5_keepfirst" -> ((s, d) =>
      Dedup.dedupKeepFirst(
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_orderkey"), Seq(col("l_linenumber"), col("l_quantity")))
        .orderBy("l_orderkey")),
    "q_d6_prefer" -> ((s, d) =>
      Dedup.dedupPrefer(
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_returnflag"),
        Seq("l_orderkey"), col("l_returnflag") === "R",
        Seq(col("l_linenumber"), col("l_returnflag")))
        .orderBy("l_orderkey")),
    "q_d8_metric" -> ((s, d) =>
      Dedup.duplicateMetric(Tables.documents(s, d), Seq("lang"))),
    "q_dedup_exact" -> ((s, d) =>
      TextDedup.exactGroups(Tables.documents(s, d), "text", "doc_id")
        .orderBy("fp")),

    // ---- §2.7 joins ---------------------------------------------------
    "q_j1_left" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),
    "q_j3_right" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey"))
    }),
    "q_j4_anti" -> ((s, d) =>
      Joins.antiJoin(Tables.customer(s, d), Tables.orders(s, d), "c_custkey", "o_custkey")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),
    "q_j5_semi" -> ((s, d) =>
      Joins.semiJoin(Tables.customer(s, d), Tables.orders(s, d), "c_custkey", "o_custkey")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),
    "q_j6_containment" -> ((s, d) => {
      // FIXED-BUDGET needle side (r16 SF-curve catch at the tightened
      // 5× bar): containmentJoin is a BroadcastNestedLoopJoin —
      // |left| × |right| contains() tests BY DESIGN — and the r15
      // fixture grew BOTH sides with the corpus, a genuine quadratic
      // (6.5× wall for 10× data; ~100× cost at sf10). The needle side
      // is now 1000 md5-selected suppliers: identity at sf0.1 and
      // below (supplier counts 10/100/1000 there), linear above — the
      // operator's own "right side must be small" contract, enforced
      // by the fixture AND by the operator's maxRight guard.
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      val sup = Tables.supplier(s, d)
        .orderBy(md5(concat(col("s_suppkey").cast("string"), lit(":j6"))),
          col("s_suppkey"))
        .limit(1000)
        .select(col("s_suppkey"), substring(col("s_name"), 9, 10).as("s_code"))
      Joins.containmentJoin(c, sup, col("c_name"), col("s_code"),
        Seq("c_custkey"), Seq(col("s_suppkey").asc_nulls_last))
        .select(col("c_custkey"), col("s_suppkey"))
        .orderBy("c_custkey")
    }),
    "q_j7_key_discovery" -> ((s, d) => {
      val r1 = Joins.keyOverlapReport(Tables.customer(s, d), Tables.orders(s, d),
        Seq("c_custkey" -> "o_custkey", "c_custkey" -> "o_orderkey"))
      val r2 = Joins.keyOverlapReport(Tables.orders(s, d), Tables.lineitem(s, d),
        Seq("o_orderkey" -> "l_orderkey"))
      r1.unionByName(r2).orderBy("left_col", "right_col")
    }),
    "q_j8_union_common" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.select("o_orderkey", "o_custkey", "o_totalprice")
      val b = o.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
      Joins.unionOnCommon(a, b).orderBy("o_orderkey", "o_totalprice")
    }),
    "q_j9_append" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val a = o.select("o_orderkey", "o_custkey", "o_totalprice")
      val b = o.filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderpriority")
      Joins.appendUnion(a, b)
        .orderBy(col("o_orderkey"), col("o_custkey").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),
    "q_upsert" -> ((s, d) => {
      // MERGE-style snapshot maintenance: every 7th customer gets an
      // updated balance, every 11th inserts as a new (negated-key) row,
      // the rest pass through — base side is a broadcast anti join
      // against the delta keys, so the big side never shuffles
      val base = Tables.customer(s, d)
      val updates = base.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_acctbal", col("c_acctbal") * 2)
        .unionByName(base.filter(col("c_custkey") % 11 === 0)
          // -(k+1): injective, strictly negative (keys start at 0), so
          // insert keys never collide with base or update keys
          .withColumn("c_custkey", -(col("c_custkey") + 1))
          .withColumn("c_mktsegment", lit("NEW")))
      Joins.upsert(base, updates, Seq("c_custkey"))
        .orderBy("c_custkey")
    }),
    "q_salted_join" -> ((s, d) => {
      // salted skew join must produce exactly the plain-join result —
      // proven here against the plain-join oracle
      // KEEP the raw loader (r19 A/B): lineitemWide measured −18%
      // isolated (2.71 → 2.22 s — the scan+join is evaluated twice
      // under the output sort's range sampling, and the fan
      // parallelizes both), but the output sort is TIE-AMBIGUOUS in
      // this fixture ((l_orderkey, l_linenumber) is not unique) and
      // the oracle's row hash rides the raw scan's arrival order —
      // the repartition scrambles tie order and fails the oracle.
      // Stage decomposition (QStagesProbe): broadcast build 0.3 s +
      // scan+join 0.6 s ×2 (range-sample pass + shuffle-write pass) +
      // 7.4 MB sort — no salt-keyed exchange exists at this scale
      // (the replicated side broadcasts), so the salting itself costs
      // only the 8× broadcast build; the floor is the total-order
      // output contract.
      val l = Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity")
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
      Joins.saltedJoin(l, o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "l_orderkey", buckets = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("o_orderpriority"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q_bloom_join" -> ((s, d) => {
      // bloom semi-join reduction: lineitem pruned by a bloom built from
      // the high-value order keys BEFORE the shuffle, then joined
      // exactly — false positives die in the join, so the result must
      // equal the plain join (the oracle). The aggregate keeps the
      // checked surface compact while still covering every joined row.
      val hot = Tables.orders(s, d)
        .filter(col("o_totalprice") > 150000.0)
        .select("o_orderkey", "o_orderpriority")
      val pruned = Joins.bloomPrune(
        Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice"),
        "l_orderkey", hot, "o_orderkey",
        expectedItems = 100000L, fpp = 0.01)
      pruned.join(hot, pruned("l_orderkey") === hot("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          Compat.exactSum(col("l_extendedprice"), 2).as("sum_price"))
        .orderBy("o_orderpriority")
    }),
    "q_a2_salted" -> ((s, d) =>
      // skew-safe two-phase sorted-set agg, same oracle as q_a2_sortedset
      Aggs.sumAndSortedSetSalted(Tables.lineitem(s, d), "l_returnflag",
        col("l_quantity").cast(DecimalType(27, 2)), col("l_linestatus"),
        "sum_qty", "statuses")
        .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"),
          col("statuses"))
        .orderBy("l_returnflag")),
    "q_recon" -> ((s, d) => Reconciliation.detail(s, d)),
    "q_recon_summary" -> ((s, d) => Reconciliation.summary(s, d)),

    // ---- §2.4 filters -------------------------------------------------
    "q_f_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")))
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .filter(col("o_orderstatus") =!= "P")
        .filter(col("o_orderpriority").rlike("^[12]-"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")),
    "q_f3_nullkeep" -> ((s, d) =>
      Tables.events(s, d)
        .filter((col("value") < 50) || col("value").isNull)
        .filter(col("event_type").isin("click", "view"))
        .select("event_id", "value")
        .orderBy("event_id")),

    // ---- §2.3 projections / §2.9 sorts / §2.10 schema ----------------
    "q_p_project" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name").as("customer_name"))
        .withColumn("src", lit("crm"))
        .orderBy("c_custkey")),
    "q_p5_rowid" -> ((s, d) =>
      // sort + zipWithIndex, not row_number over an unpartitioned window —
      // the latter moves the whole table through a single task at scale
      Joins.globalRowIds(Tables.supplier(s, d).select("s_suppkey"),
        Seq(col("s_suppkey")), "row_id")
        .orderBy("s_suppkey")),
    "q_o1_sort_limit" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)),
    "q_o3_top1" -> ((s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(1)),
    "q_v2_align" -> ((s, d) =>
      SchemaOps.alignTo(Tables.customer(s, d), StructType(Seq(
        StructField("c_custkey", LongType),
        StructField("c_name", StringType),
        StructField("loyalty_score", DoubleType))))
        .orderBy("c_custkey")),
    "q_mix_temp" -> ((s, d) =>
      // temperature-2 multilingual rebalance: per-lang token masses →
      // sqrt-scaled sampling shares (upweights low-resource langs);
      // sqrt is IEEE-exact so shares replay bit-for-bit
      TextQuality.temperatureShares(
        Tables.documents(s, d).select(col("lang"),
          explode(TextFunctions.tokens(col("text"))).as("t"))
          .groupBy("lang").agg(count(lit(1)).as("n_tokens")),
        "lang", col("n_tokens"), alpha = 0.5)
        .withColumnRenamed("weight", "n_tokens")
        .orderBy("lang")),
    "q_kanon" -> ((s, d) => {
      // k-anonymity release gate over (lang, source) quasi-identifiers:
      // per-combination counts of the kept side plus the suppressed
      // combinations' sizes — the auditable shape of a privacy-gated
      // extract (no row from a small cell escapes)
      val (kept, suppressed) = SchemaOps.kAnonymize(
        Tables.documents(s, d).select("doc_id", "lang", "source"),
        Seq("lang", "source"), k = 20L)
      kept.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_rows"), lit(true).as("released"))
        .unionByName(suppressed.select(col("lang"), col("source"),
          col("n_rows"), lit(false).as("released")))
        .orderBy("lang", "source")
    }),
    "q_scd2" -> ((s, d) =>
      // SCD2 dimension versioning from the event stream: each user's
      // purchase history becomes validity intervals (from, to, version,
      // is_current) — one key-partitioned window; query as-of any time
      // via AsOf, or filter is_current for the live snapshot
      SchemaOps.scd2FromChanges(
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value")),
        "user_id", "ts", tieBreak = col("event_id"))
        .select(col("user_id"), col("event_id"), col("effective_from"),
          col("effective_to"), col("version"), col("is_current"))
        .orderBy("user_id", "version")),
    "q_w_rolling" -> ((s, d) => {
      // time-RANGE window frame: per-user trailing-1-hour event count +
      // DECIMAL-exact value sum at every event (rangeBetween over epoch
      // seconds — the frame Spark sizes by VALUE distance, not row
      // count; rows with equal timestamps share a frame, so the result
      // is tie-order invariant)
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d).select(
        col("user_id"), col("event_id"), col("ts"), col("value"),
        count(lit(1)).over(byUser).as("n_trailing_1h"),
        sum(col("value").cast(DecimalType(27, 4))).over(byUser)
          .cast("double").as("sum_trailing_1h"))
        .orderBy("user_id", "ts", "event_id")
    }),
    "q_w_running" -> ((s, d) => {
      val byCust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
        row_number().over(byCust).as("rk"),
        lag(col("o_totalprice"), 1).over(byCust).as("prev_price"),
        sum(col("o_totalprice").cast(D2))
          .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
        .orderBy("o_custkey", "rk")
    }),

    // ---- Spark-native extras beyond the reference (SURVEY §2.11) -----
    "q_setops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val highValue = o.filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("custkey")).distinct()
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey")).distinct()
      highValue.intersect(building).withColumn("op", lit("intersect"))
        .unionByName(highValue.except(building).withColumn("op", lit("except")))
        .orderBy("op", "custkey")
    }),
    "q_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(Compat.exactSum(col("o_totalprice"), 2).as("total"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("total"), col("n"))
        .orderBy("status", "priority")),
    "q_rank" -> ((s, d) => {
      // top-20 per priority WITHOUT sorting whole priorities: the naive
      // rank window partitions by a 5-value column — 3 M rows per sort
      // task at sf10, parallelism 5, measured 14× wall for 10× data
      // (r17 full-surface sweep). Aggs.topKByRank salts the sort across
      // 160 tasks and re-ranks the ≤ 5·32·20 survivors exactly;
      // dense_rank/row_number over the survivor frame are exact for
      // every kept row (all strictly-better rows and all ties survive),
      // and ntile(4) OF THE FULL PRIORITY is recovered arithmetically
      // from (row_number, group count) — bit-identical to the window
      // (the unchanged full-set DuckDB oracle is the proof).
      val ords = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      val sizes = ords.groupBy("o_orderpriority").agg(count(lit(1)).as("_n"))
      val top = Aggs.topKByRank(ords, Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc), k = 20, saltBy = xxhash64(col("o_orderkey")))
      val byPrice = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      val stable = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      top
        .withColumn("drnk", dense_rank().over(byPrice))
        .withColumn("_rn", row_number().over(stable))
        .join(broadcast(sizes), Seq("o_orderpriority"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          col("rnk"), col("drnk"),
          Aggs.ntileOf(col("_rn"), col("_n"), 4).as("quartile"))
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    }),
    "q_percentiles" -> ((s, d) =>
      // Spark `percentile` and DuckDB `quantile_cont` share the linear
      // interpolation at rank q*(n-1) — verified bit-exact. The two
      // l_extendedprice percentiles share ONE aggregation buffer
      // (array-percentile) instead of buffering the column twice. NOTE:
      // exact percentile still buffers every value per group
      // (ObjectHashAggregate) — correct for the oracle, an OOM risk per
      // group at 100 TB. Scale paths: q_percentiles_approx (sketch) and
      // q_percentiles_scale (exact, rank-select) below.
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("_ep"),
          expr("percentile(l_quantity, 0.5)").as("med_qty"))
        .select(col("l_returnflag"), col("_ep").getItem(0).as("med_price"),
          col("_ep").getItem(1).as("p95_price"), col("med_qty"))
        .orderBy("l_returnflag")),
    "q_percentiles_scale" -> ((s, d) => {
      // exact percentiles WITHOUT per-group buffering: distributed
      // rank-select (range-partition + per-partition counts + targeted
      // second pass) — the exact-answer scale path when one group holds
      // billions of rows. Same oracle as q_percentiles: bit-equal result.
      val li = Tables.lineitem(s, d)
      val price = Aggs.rankSelectPercentiles(li, "l_returnflag",
        col("l_extendedprice"), Seq(0.5 -> "med_price", 0.95 -> "p95_price"))
      val qty = Aggs.rankSelectPercentiles(li, "l_returnflag",
        col("l_quantity"), Seq(0.5 -> "med_qty"))
      price.join(qty, Seq("l_returnflag")).orderBy("l_returnflag")
    }),
    "q_percentiles_hist" -> ((s, d) =>
      // the THIRD exact-percentile regime: low-cardinality values
      // (l_quantity has 50 distinct) read off a bounded per-group
      // histogram — two tiny map-combined shuffles, no corpus sort
      // (rankSelectPercentiles' regime) and no per-group value buffer
      // (percentile()'s). Same rank/interpolation arithmetic, so the
      // oracle is plain quantile_cont.
      Aggs.histogramPercentiles(Tables.lineitem(s, d), "l_returnflag",
          col("l_quantity"), Seq(0.5 -> "med_qty", 0.95 -> "p95_qty"))
        .orderBy("l_returnflag")),
    "q_percentiles_approx" -> ((s, d) => {
      // scale variant of q_percentiles: approx_percentile runs in bounded
      // memory (t-digest-style sketch, mergeable map-side) — the form to
      // use when a group can hold billions of rows. Sketch VALUES are
      // engine-specific, so the query emits rank-interval verdicts
      // instead (the q_kll_rollup construction, tie-robust): the exact
      // rank bracket [count(<est), count(≤est)] of each estimate must
      // overlap target ± 2% (accuracy 10000 ≈ 0.01% rank error;
      // measured ≤ 0.2% off-target, l_quantity ties spanning the
      // bracket, at both test SFs).
      val li = Tables.lineitem(s, d)
      val est = li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("_mp"),
          expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("_p95"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("_mq"))
      def bracketOk(v: Column, estCol: Column, q: Double) = {
        val n = count(lit(1))
        count(when(v < estCol, 1)) <= n * (q + 0.02) &&
          count(when(v <= estCol, 1)) >= n * (q - 0.02)
      }
      li.join(broadcast(est), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          bracketOk(col("l_extendedprice"), col("_mp"), 0.5).as("med_price_ok"),
          bracketOk(col("l_extendedprice"), col("_p95"), 0.95).as("p95_price_ok"),
          bracketOk(col("l_quantity"), col("_mq"), 0.5).as("med_qty_ok"))
        .orderBy("l_returnflag")
    }),
    "q_kll_rollup" -> ((s, d) => {
      // quantile-sketch table rollup (fine per (flag, status) → merged
      // per flag), cross-engine-checked through the KLL RANK GUARANTEE
      // rather than the engine-specific estimates: the exact rank of
      // each estimated quantile (a plain count the oracle replays) must
      // sit within generous sketch error of the target rank. KLL
      // compaction is randomized, so estimate VALUES are not even
      // run-deterministic — the guarantee is what's portable (0.04 slack
      // ≈ 6σ at k=200: deterministic-in-practice).
      val li = Tables.lineitem(s, d)
      val fine = Aggs.quantileSketches(li,
        Seq("l_returnflag", "l_linestatus"), "l_extendedprice", k = 200)
      val est = Aggs.mergeQuantileSketches(fine, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"),
          Aggs.kllQuantile(col("sketch"), 0.5).as("med"),
          Aggs.kllQuantile(col("sketch"), 0.95).as("p95"))
      li.select(col("l_returnflag"), col("l_extendedprice"))
        .join(broadcast(est), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(max(col("n_rows")).as("n_rows"),
          (abs(count(when(col("l_extendedprice") <= col("med"), 1))
            .cast("double") / max(col("n_rows")) - 0.5) <= 0.04).as("med_ok"),
          (abs(count(when(col("l_extendedprice") <= col("p95"), 1))
            .cast("double") / max(col("n_rows")) - 0.95) <= 0.04).as("p95_ok"))
        .orderBy("l_returnflag")
    }),
    "q_stats" -> ((s, d) => {
      // decimal-exact moment sums, then the closed-form variance/corr in
      // double — deterministic under any partitioning, unlike stddev/corr
      // aggregates whose float accumulation order varies
      val x = col("l_quantity"); val y = col("l_extendedprice")
      Tables.lineitemWide(s, d).groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          Compat.exactSum(x, 6).as("sx"),
          Compat.exactSum(x * x, 6).as("sxx"),
          Compat.exactSum(y, 6).as("sy"),
          Compat.exactSum(y * y, 6).as("syy"),
          Compat.exactSum(x * y, 6).as("sxy"))
        .select(col("l_returnflag"),
          (col("sx") / col("n")).as("mean_qty"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
            .as("sd_qty"),
          // rounded: C++ FMA contraction perturbs the last ulp vs the JVM
          round((col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
              sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 12)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),
    "q_skew_report" -> ((s, d) =>
      Tables.orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
        .agg(max(col("n")).as("max_per_key"),
          min(col("n")).as("min_per_key"),
          (sum(col("n")).cast("double") / count(lit(1))).as("mean_per_key"),
          expr("percentile(n, 0.99)").as("p99_per_key"))),
    "q_approx_profile" -> ((s, d) => {
      // HLL estimates are engine-specific, so the query emits the exact
      // distinct counts (engine-reproducible) plus bounded-error
      // verdicts computed in-query: |approx − exact| ≤ 15% (3× the
      // default rsd 0.05; measured ≤ 3.6% at both test SFs). The raw
      // deterministic counts live in q_distinct_profile (oracled).
      val li = Tables.lineitem(s, d)
      li.agg(
          count_distinct(col("l_orderkey")).as("exact_orders"),
          count_distinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_orderkey")).as("_ao"),
          approx_count_distinct(col("l_partkey")).as("_ap"))
        .select(col("exact_orders"), col("exact_parts"),
          (abs(col("_ao") - col("exact_orders")) <=
            col("exact_orders") * 0.15).as("orders_ok"),
          (abs(col("_ap") - col("exact_parts")) <=
            col("exact_parts") * 0.15).as("parts_ok"))
    }),
    "q_hll_rollup" -> ((s, d) => {
      // DataSketches HLL register state is engine-specific, so the
      // query emits exact per-source counts (engine-reproducible) plus
      // an in-query bounded-error verdict on the ROLLED-UP estimate:
      // sketch fine (source, lang) groups once, merge to source, and
      // the merged estimate must sit within 5% of the exact distinct
      // (lgK=12 → rsd ≈ 1.6%; measured 0.0% at both test SFs). Rollup ≡
      // direct-sketch and persist round-trips stay proven in SketchSpec.
      val docs = Tables.documents(s, d)
      val fine = Aggs.distinctSketches(docs,
        Seq("source", "lang"), "doc_id", lgK = 12)
      val rolled = Aggs.mergeSketches(fine, Seq("source"))
        .select(col("source"), col("n_rows"), col("approx_distinct"))
      val exact = docs.groupBy("source")
        .agg(count_distinct(col("doc_id")).as("exact_distinct"))
      rolled.join(exact, Seq("source"))
        .select(col("source"), col("n_rows"), col("exact_distinct"),
          (abs(col("approx_distinct") - col("exact_distinct")) <=
            col("exact_distinct") * 0.05).as("hll_ok"))
        .orderBy("source")
    }),
    "q_heavy_tokens" -> ((s, d) => {
      // heavy-hitter tokens per language through the persistable CMS
      // table: fine sketches per (lang, source) roll up to lang by
      // LINEAR merge, top tokens are estimated against the merged
      // sketch. The estimate VALUES are engine-specific (Spark CMS
      // hashing) but the one-sided guarantee estimate ≥ exact is not —
      // the oracle pins exact counts and the guarantee boolean, so a
      // sketch undercount (impossible unless the merge corrupts cells)
      // fails the gate.
      val toks = Tables.documents(s, d).select(col("lang"), col("source"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      // eps 1e-3: ~110 KB per sketch. Partial buffers ride the shuffle
      // (one per partition × fine group), so width is a bandwidth dial,
      // not just memory — and the pinned guarantee (est ≥ exact) holds
      // at ANY width; only estimate tightness varies.
      val fine = Aggs.cmSketches(toks, Seq("lang", "source"), "token",
        eps = 1e-3)
      val merged = Aggs.mergeCmSketches(fine, Seq("lang"))
      val counts = toks.groupBy("lang", "token")
        .agg(count(lit(1)).as("n_exact"))
      val w = Window.partitionBy("lang")
        .orderBy(col("n_exact").desc, col("token"))
      counts.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .join(broadcast(merged), Seq("lang"))
        .select(col("lang"), col("token"), col("n_exact"),
          (Aggs.cmEstimate(col("sketch"), col("token")) >= col("n_exact"))
            .as("est_ok"))
        .orderBy(col("lang"), col("n_exact").desc, col("token"))
    }),
    "q_profile" -> ((s, d) =>
      // one-pass numeric data-quality profile (the new-monthly-drop
      // trust check); decimal-exact means make it hash-checkable
      SchemaOps.profileNumeric(Tables.orders(s, d),
        Seq("o_custkey", "o_orderkey", "o_totalprice"))
        .orderBy("column")),
    "q_outliers" -> ((s, d) => {
      // anomaly gate on a corrupted drop: every 997th order's total is
      // fat-fingered 100×; the z-score report must flag exactly those
      // (planted z ≈ 30 vs ≤ 0.3 for clean rows — the near-uniform
      // columns max out at z ≈ 1.75, so nothing real trips the gate)
      val corrupted = Tables.orders(s, d).withColumn("amount",
        when(col("o_orderkey") % 997 === 0, col("o_totalprice") * 100)
          .otherwise(col("o_totalprice")))
      SchemaOps.outlierReport(corrupted, "o_orderpriority", "amount",
        zThreshold = 3.0)
        .orderBy("o_orderpriority")
    }),
    "q_distinct_profile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.agg(
        count_distinct(col("l_orderkey")).as("exact_orders"),
        count_distinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n_rows"))
    }),

    // ---- training-data: text analysis --------------------------------
    "q_quantile_gate" -> ((s, d) =>
      // drop the bottom half by length, per language — a distribution-
      // adaptive curation cutoff (discrete median: the threshold is a
      // value that exists in each group, invariant to tie order)
      TextQuality.quantileGate(Tables.documents(s, d)
          .select("doc_id", "lang", "n_chars"),
        "lang", col("n_chars"), p = 0.5, tieBreak = col("doc_id"))
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")),
    "q_keywords" -> ((s, d) => {
      // per-doc keyword extraction: top-3 terms by tf·idf with
      // idf = ln(N/df) rounded to 9dp before the product (the ln
      // discipline), ties broken by term — topic labels / dedup-cluster
      // naming without a model. Window is partitioned per doc (never
      // global); df comes from one partial-aggregated pass.
      val tok = Tables.documents(s, d).select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      val n = Tables.documents(s, d).count()
      val df_ = tok.select("doc_id", "token").distinct()
        .groupBy("token").agg(count(lit(1)).as("df"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val scored = tf.join(df_, Seq("token"))
        .select(col("doc_id"), col("token"),
          (col("tf") * round(log(lit(n.toDouble) / col("df")), 9)).as("score"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("token"))
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"),
          round(col("score"), 9).as("score"))
        .orderBy("doc_id", "rk")
    }),
    "q_bpe_merges" -> ((s, d) =>
      // BPE vocabulary TRAINING (not just counting): learn the first 8
      // merge rules over the corpus word-frequency table — one
      // corpus-sized pass, then vocab-sized iterative aggregation.
      // Runs the BATCHED distributed trainer (the 32k-rule production
      // shape: disjoint-prefix rule acceptance cuts pair-count shuffles
      // from one per rule to one per round) — provably the IDENTICAL
      // table as sequential greedy (BpeSpec pins equality on fixture,
      // adversarial, and random corpora), so the DuckDB oracle still
      // replays sequential greedy as chained CTEs. Deterministic: ties
      // break (lhs, rhs) lexicographically. r15 isolation: the
      // sequential form held 2.22 s fresh-JVM at sf0.1 (8 shuffle+argmax
      // rounds); batched collapses the 8 rules into 1-3 rounds.
      graft.operators.BpeTrain.learnMergesBatched(Tables.documents(s, d), "text", 8)),
    "q_bpe_encode" -> ((s, d) => {
      // the ENCODE half: tokenize with the table just learned — train 8
      // rules, apply them in rank order to the distinct words (the
      // vocab-sized application encodeDocs builds on), emit the top-50
      // words by corpus frequency with their '|'-joined token runs.
      // The 8-rule table comes from the DRIVER trainer (identical table
      // by BpeSpec's three-way equivalence; q_bpe_docs' regime) — this
      // query's subject is ENCODE, and the distributed trainers are
      // oracled in q_bpe_merges, so paying 8 distributed argmax rounds
      // here was pure redundancy (r15 isolation: 2.83 s fresh-JVM).
      val docs = Tables.documents(s, d)
      val merges = graft.operators.BpeTrain.learnMergesLocal(docs, "text", 8)
      graft.operators.BpeTrain.encodeWords(
          graft.operators.BpeTrain.wordFreqs(docs, "text"), "word", merges)
        .select(col("word"), col("freq"), array_join(col("tokens"), "|").as("tokens"))
        .orderBy(col("freq").desc, col("word")).limit(50)
    }),
    "q_bpe_docs" -> ((s, d) => {
      // the PRODUCTION tokenization regime end-to-end: an 80-rule merge
      // table (past encodeWords' 64-rule fold limit, so the application
      // runs the mapPartitions path real 32k-vocab tokenizers need)
      // trained by the in-memory trainer over the collected vocab-sized
      // word-frequency table, then the whole corpus tokenized via
      // encodeDocs' distinct-word join-back. Per doc: token count + md5
      // of the '|'-joined stream — a full-content encode check for
      // every document. 80 rules because the synthetic 31-word vocab
      // exhausts at 89 merges; BpeSpec proves the >=256-rule regime on
      // a wider vocab.
      val docs = Tables.documents(s, d)
      val merges = graft.operators.BpeTrain.learnMergesLocal(docs, "text", 80)
      graft.operators.BpeTrain.encodeDocs(docs, "text", "doc_id", merges)
        .select(col("doc_id"), size(col("tokens")).cast("long").as("n_tokens"),
          md5(array_join(col("tokens"), "|")).as("tok_md5"))
        .orderBy("doc_id")
    }),
    "q_answer_parse" -> ((s, d) => {
      // LLM-output parsing (the reference's analysis/final channel
      // split, LLM Testing.ipynb 54defb73): synthesize each doc's raw
      // chat-template decode deterministically from its text — every
      // 7th doc truncated before the final channel to exercise the
      // reference's "N/A" no-match fallback — then extract both
      // sections with the notebook's own DOTALL patterns
      val reasoning = concat(lit("step:\n "), substring(col("text"), 1, 80), lit(" \n"))
      val answer = concat(lit(" final: "), substring(col("text"), 1, 40), lit("\n"))
      val head = concat(
        lit("<|end|><|start|>assistant<|channel|>analysis<|message|>"),
        reasoning, lit("<|end|>"))
      val raw = when(col("doc_id") % 7 === 0, concat(head, lit("truncated")))
        .otherwise(concat(head,
          lit("<|start|>assistant<|channel|>final<|message|>"), answer, lit("<|return|>")))
      Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.extractAnswer(raw, TextFunctions.thinkingPattern).as("thinking"),
        TextFunctions.extractAnswer(raw, TextFunctions.finalPattern).as("final_text"))
        .orderBy("doc_id")
    }),
    "q_oov" -> ((s, d) => {
      // vocabulary-coverage audit: build the corpus top-1000 vocab
      // (tf-ranked, token tie-break) and measure each language's
      // out-of-vocabulary token rate — the pre-training check that a
      // tokenizer/vocab actually covers every slice. Exact integer
      // counts; the rate is one IEEE division rounded to 9dp.
      val tok = Tables.documents(s, d).select(col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      val vocab = tok.groupBy("token").agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("token")).limit(1000)
        .select("token")
      tok.join(broadcast(vocab.withColumn("_inv", lit(1))), Seq("token"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("_inv").isNull, 1)).as("n_oov"))
        .select(col("lang"), col("n_tokens"), col("n_oov"),
          round(col("n_oov").cast("double") / col("n_tokens"), 9).as("oov_rate"))
        .orderBy("lang")
    }),
    "q_entropy" -> ((s, d) => {
      // token-distribution entropy per doc (quality dial: low entropy =
      // repetitive/templated text, the Shannon complement of the
      // repetition metrics). H = ln(n) − Σ c·ln(c)/n over per-doc token
      // counts; each ln term rounded to 9dp then DECIMAL-summed, so the
      // result is order-independent and cross-engine exact (the
      // vocab_div discipline).
      val tok = Tables.documents(s, d).select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      tok.groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(round(col("c").cast("double") * log(col("c")), 9)
            .cast(DecimalType(28, 9))).as("s"),
          sum(col("c")).as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"),
          round(log(col("n_tokens")) - col("s").cast("double") / col("n_tokens"), 9)
            .as("entropy"))
        .orderBy("doc_id")
    }),
    "q_text_stats" -> ((s, d) => {
      val q = TextFunctions.qualityStruct(col("text"))
      Tables.documentsWide(s, d).select(
        col("doc_id"),
        length(col("text")).as("char_len"),
        q.getField("n_tokens").cast("long").as("n_tokens"),
        q.getField("avg_token_len").as("avg_token_len"),
        q.getField("punct_ratio").as("punct_ratio"),
        q.getField("digit_ratio").as("digit_ratio"),
        q.getField("stopword_ratio").as("stopword_ratio"),
        TextFunctions.tokenCountBpeIsh(col("text")).as("bpe_tokens"))
        .orderBy("doc_id")
    }),
    "q_token_shards" -> ((s, d) => {
      // budget-bounded training shards: parallel prefix sum (no global
      // window), shard = exclusive running total div budget
      val docs = Tables.documents(s, d).select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.sources.Sinks.packByBudget(docs, Seq(col("doc_id")), "n_tokens", budget = 2000L)
        .orderBy("doc_id")
    }),
    "q_seq_pack" -> ((s, d) => {
      // fixed-context training windows: docs concatenated in doc_id
      // order, cut into exact 512-token sequences; one row per
      // (doc, window) span
      val docs = Tables.documents(s, d).select(col("doc_id"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      graft.sources.Sinks.packSequences(docs, Seq(col("doc_id")), "n_tokens", seqLen = 512L)
        .orderBy("doc_id", "seq_id")
    }),
    "q_repetition" -> ((s, d) =>
      TextQuality.repetitionReport(Tables.documentsWide(s, d), "text", "doc_id", n = 2)
        .orderBy("doc_id")),
    "q_lang_id" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),
    "q_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // ---- training-data: dedup ----------------------------------------
    "q_jaccard_pairs" -> ((s, d) =>
      TextDedup.jaccardPairs(Tables.documentsWide(s, d), "text", "doc_id", n = 3, threshold = 0.8)
        .orderBy("doc_a", "doc_b")),
    "q_contamination" -> ((s, d) => {
      // synthetic eval set = every 50th doc; the screen flags their
      // near-dup leaks in the remaining corpus
      val docs = Tables.documentsWide(s, d)
      TextDedup.contaminationReport(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "text", "doc_id", n = 4)
        .orderBy("doc_id")
    }),
    "q_dedup_clusters" -> ((s, d) => {
      // transitive closure of the exact near-dup pairs → one canonical
      // doc per cluster (the keep-one step of a curation pipeline)
      val docs = Tables.documentsWide(s, d)
      Graph.dedupClusters(docs, "doc_id",
        TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8),
        "doc_a", "doc_b")
        .orderBy("doc_id")
    }),
    "q_dedup_clusters_sampled" -> ((s, d) => {
      // the sf10 gate form of q_dedup_clusters: the exact quadratic
      // pair stage runs only on a FIXED 1280-doc md5 panel (r16: the
      // quarter-sample kept pair cost at (N/4)² — quadratic in the
      // corpus; the fixed budget is SF-invariant); full-corpus CC at
      // scale stays exercised by the gate's q_curate_lsh_md5, whose
      // pair stage is the banded production path
      val docs = TextDedup.md5Panel(
          Tables.documents(s, d).select("doc_id", "text"), "doc_id",
          budget = 1280, tag = "dcp")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Graph.dedupClusters(docs, "doc_id",
        TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8),
        "doc_a", "doc_b")
        .orderBy("doc_id")
    }),
    "q_cluster_rollup" -> ((s, d) => {
      // evidence-preserving dedup: each near-dup cluster keeps ONE doc
      // but the rollup attaches the whole cluster's signals to it —
      // total chars, source diversity, member list
      val docs = Tables.documentsWide(s, d)
      val assign = Graph.dedupClusters(docs, "doc_id",
        TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8),
        "doc_a", "doc_b")
      Graph.aggregateToCanonical(
        docs.select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id", assign,
        Seq(Compat.exactSum(col("n_chars"), 0).as("total_chars"),
          count_distinct(col("source")).as("n_sources")))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("total_chars"), col("n_sources"))
        .orderBy("doc_id")
    }),
    "q_cluster_keep_best" -> ((s, d) => {
      // prefer-keep survivor rule over near-dup clusters: keep the
      // LONGEST member (n_chars), not the smallest id — the curation
      // default when near-dups differ in completeness
      val docs = Tables.documentsWide(s, d)
      Graph.dedupClustersBy(docs, "doc_id", col("n_chars"),
        TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8),
        "doc_a", "doc_b")
        .orderBy("doc_id")
    }),
    "q_inc_clusters" -> ((s, d) => {
      // INCREMENTAL clustering invariant, end to end: cluster the "old"
      // corpus (even doc ids), then absorb the "new" drop (odd ids) by
      // replaying the persisted assignment as star edges + only the
      // pairs that touch a new doc — the result must equal the full
      // recompute (q_dedup_clusters' oracle, replayed verbatim). The
      // query recomputes all pairs only to DERIVE the new-edge set; a
      // real deployment feeds crossCorpusNearDups output instead.
      val docs = Tables.documentsWide(s, d)
      val oldDocs = docs.filter(col("doc_id") % 2 === 0)
      // one pair-gen feeds both sides: pairs among even docs ARE the
      // old-corpus pairs (jaccard is per-pair), new edges are the rest.
      // localCheckpoint so the two consumers don't re-run the posting
      // pipeline (same discipline as CC's internal rounds).
      val allPairs = TextDedup.jaccardPairs(docs, "text", "doc_id",
        n = 3, threshold = 0.8).localCheckpoint()
      val oldAssign = Graph.dedupClusters(oldDocs, "doc_id",
        allPairs.filter(col("doc_a") % 2 === 0 && col("doc_b") % 2 === 0),
        "doc_a", "doc_b")
      val newEdges = allPairs
        .filter(col("doc_a") % 2 === 1 || col("doc_b") % 2 === 1)
      val comps = Graph.incrementalComponents(oldAssign, "doc_id",
        "cluster_id", newEdges, "doc_a", "doc_b")
      docs.select(col("doc_id").cast("long").as("doc_id"))
        .join(comps.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_id"))
        .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
        .orderBy("doc_id")
    }),
    "q_inc_curate" -> ((s, d) => {
      // INCREMENTAL CURATION capstone (diff → screen-the-delta →
      // curate), proven against full recompute: three corpus versions
      // with adds, in-place revisions, and removals at each step; the
      // engine runs fullEdges(v1) then TWO incremental ledger
      // transitions (only added/changed docs pay pair generation, via
      // snapshotDiff's (key, fingerprint)-sized shuffle); the ORACLE is
      // the full recompute over v3 — a green row is the cross-engine
      // proof that the incremental path lands row-identical (the
      // q_inc_clusters discipline lifted from CC to the whole
      // diff+screen+curate composition). IncrementalCurationSpec proves
      // the same identity per intermediate version with the Versioned
      // publish wrapper.
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      // each version frame is consumed by several stages (its own pair
      // gen, both sides of a diff, the next version's construction) —
      // checkpoint them like the at-rest parquet snapshots they stand in
      // for (Versioned.write/read in the pipeline form), so the
      // compounding union+case lineage isn't re-derived per consumer
      // bounded fan on the version checkpoints: the single-split scan
      // would otherwise serialize every shingle pass over v1/v2/v3,
      // while a full 32-way fan accumulates partitions through the
      // unions (32->64->96) and drowns this ~50-stage pipeline in task
      // launches (measured both ways; defaultParallelism/4 is the
      // interleaved-A/B sweet spot — versions re-materialize at a
      // FIXED width, so nothing accumulates)
      // (r19: collapsing the 3 version checkpoints into ONE tagged
      // union job was A/B'd 3× interleaved and measured a wash —
      // q_inc_curate −0.4 s once, store twin +0.2/+0.9 — reverted;
      // every consumer would read 3× the checkpointed blocks)
      val fan = math.max(1, s.sparkContext.defaultParallelism / 4)
      val v1 = docs.filter(col("doc_id") % 3 =!= 2)
        .repartition(fan).localCheckpoint()
      val v2 = v1.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" r2")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 2 && col("doc_id") % 2 === 0))
        .repartition(fan).localCheckpoint()
      val v3 = v2.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" r3")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 2 && col("doc_id") % 2 === 1))
        .repartition(fan).localCheckpoint()
      // each ledger version is edge-sized and feeds the next transition
      // (in production it is the persisted parquet the pipeline reads
      // back) — localCheckpoint stands in for that persistence and cuts
      // the compounding lineage the CC rounds would otherwise replay
      val e1 = IncrementalCuration.fullEdges(v1, "text", "doc_id")
        .localCheckpoint()
      val e2 = IncrementalCuration.incrementEdges(v1, v2, e1, "text", "doc_id")
        .localCheckpoint()
      val e3 = IncrementalCuration.incrementEdges(v2, v3, e2, "text", "doc_id")
      IncrementalCuration.curatedFromEdges(v3, "doc_id", e3)
        .orderBy("doc_id")
    }),
    "q_inc_curate_store" -> ((s, d) => {
      // the SHINGLE-STORE twin of q_inc_curate (r17 verdict item 2):
      // same three corpus versions, same incremental ledger semantics,
      // but the delta×unchanged screen reads the persisted hashed-
      // shingle segments (maintained by tombstoned transitions) instead
      // of re-shingling the unchanged side's text — and is proven
      // against the SAME full-recompute DuckDB oracle. Per-release
      // state checkpoints stand in for the at-rest segment parquet
      // exactly like q_inc_curate's ledger checkpoints.
      val docs = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      // bounded fan on the version checkpoints: the single-split scan
      // would otherwise serialize every shingle pass over v1/v2/v3,
      // while a full 32-way fan accumulates partitions through the
      // unions (32->64->96) and drowns this ~50-stage pipeline in task
      // launches (measured both ways; defaultParallelism/4 is the
      // interleaved-A/B sweet spot — versions re-materialize at a
      // FIXED width, so nothing accumulates)
      val fan = math.max(1, s.sparkContext.defaultParallelism / 4)
      val v1 = docs.filter(col("doc_id") % 3 =!= 2)
        .repartition(fan).localCheckpoint()
      val v2 = v1.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" r2")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 2 && col("doc_id") % 2 === 0))
        .repartition(fan).localCheckpoint()
      val v3 = v2.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" r3")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 3 === 2 && col("doc_id") % 2 === 1))
        .repartition(fan).localCheckpoint()
      val st1 = {
        val b = IncrementalCuration.bootstrapState(v1, "text", "doc_id")
        b.copy(edges = b.edges.localCheckpoint(),
          shingles = b.shingles.localCheckpoint(),
          sizes = b.sizes.localCheckpoint())
      }
      val st2 = IncrementalCuration.applyTransition(st1,
        IncrementalCuration.transitionState(v1, v2, st1, "text", "doc_id"),
        _.localCheckpoint())
      val st3 = IncrementalCuration.applyTransition(st2,
        IncrementalCuration.transitionState(v2, v3, st2, "text", "doc_id"),
        _.localCheckpoint())
      IncrementalCuration.curatedFromEdges(v3, "doc_id", st3.edges)
        .orderBy("doc_id")
    }),
    "q_subset_dup" -> ((s, d) =>
      TextDedup.containmentPairs(Tables.documentsWide(s, d), "text", "doc_id",
        n = 3, threshold = 0.8)
        .orderBy("doc_a", "doc_b")),
    "q_cluster_stats" -> ((s, d) => {
      // dedup observability: how big do near-dup clusters get (the
      // distribution that decides whether a hot cluster needs attention)
      val docs = Tables.documentsWide(s, d)
      Graph.dedupClusters(docs, "doc_id",
        TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8),
        "doc_a", "doc_b")
        .groupBy("cluster_id").agg(count(lit(1)).as("n_members"))
        .groupBy("n_members").agg(count(lit(1)).as("n_clusters"))
        .orderBy("n_members")
    }),
    "q_sample_k" -> ((s, d) =>
      // exact-quota deterministic sampling: md5 order is engine-portable
      // (unlike xxhash64), so this sampler is oracle-checkable
      TextQuality.sampleKPerGroup(
        Tables.documents(s, d).select("doc_id", "lang"), "lang",
        col("doc_id"), k = 20)
        .orderBy("lang", "doc_id")),
    "q_split" -> ((s, d) =>
      // document-stable train/val/test split: md5-interval assignment,
      // zero-shuffle map side, engine-portable — reported as per-(split,
      // lang) doc/token counts so the oracle checks every assignment
      TextQuality.hashSplit(Tables.documents(s, d), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextFunctions.tokens(col("text"))).cast("long")).as("n_tokens"))
        .orderBy("split", "lang")),
    "q_split_leakage" -> ((s, d) => {
      // eval-contamination audit: near-dup pairs (portable banded LSH,
      // the q_minhash_pairs_md5 stage) crossed with the hash-split
      // assignment (the q_split stage) — cells with split_a != split_b
      // are test/val documents with a train near-twin, the leakage a
      // content-blind split cannot prevent
      val docs = Tables.documentsWide(s, d)
      val assigned = TextQuality.hashSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val pairs = TextDedup.minhashLshPairsPortable(docs, "text", "doc_id",
        n = 3, k = 16, bands = 4, threshold = 0.5)
      TextQuality.splitLeakage(assigned, "doc_id", "split",
        pairs, "doc_a", "doc_b")
    }),
    "q_leaked_docs" -> ((s, d) => {
      // the actionable half of q_split_leakage: the quarantine list —
      // test docs with a cross-split near-twin, with partner counts;
      // anti-join this against the corpus to restore independence
      val docs = Tables.documentsWide(s, d)
      val assigned = TextQuality.hashSplit(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val pairs = TextDedup.minhashLshPairsPortable(docs, "text", "doc_id",
        n = 3, k = 16, bands = 4, threshold = 0.5)
      TextQuality.leakedDocs(assigned, "doc_id", "split",
        pairs, "doc_a", "doc_b", targetSplit = "test")
    }),
    "q_threshold_sweep" -> ((s, d) => {
      // gate-calibration sweep: for each candidate length floor, the
      // doc count and token mass a `n_tokens >= t` gate keeps — ONE
      // corpus pass binned to the grid, suffix sums over the grid-sized
      // aggregate (the oracle replays the naive corpus x grid form)
      val docs = Tables.documents(s, d)
        .select(size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      TextQuality.thresholdSweep(
        docs.withColumn("score", col("n_tokens").cast("double")),
        "score", Seq(10.0, 25.0, 50.0, 100.0, 200.0, 400.0),
        weightCol = Some("n_tokens"))
    }),
    "q_calibrated_gate" -> ((s, d) => {
      // the sweep's decision APPLIED: choose the strictest length floor
      // still keeping >= 50% of the TOKEN MASS (weightCol drives the
      // target), gate the corpus with it — one declared plan (sweep
      // scan + gate scan joined by a 1-row broadcast cutoff), the
      // composition a curation run executes
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
        .withColumn("score", col("n_tokens").cast("double"))
      TextQuality.calibratedGate(docs, "score",
          Seq(10.0, 25.0, 50.0, 100.0, 200.0, 400.0), minFracKept = 0.5,
          weightCol = Some("n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("cut"))
        .orderBy("doc_id")
    }),
    "q_pii_scan" -> ((s, d) => {
      // PII redaction audit: deterministic synthetic PII (emails, a
      // phone, long digit runs) is injected IN-QUERY so both engines
      // score the identical corpus, then redactPii runs and the report
      // counts tagged docs per source — n_leaked pins that no '@'
      // survives redaction. Patterns avoid lookaround on purpose:
      // identical under Java regex and RE2, so the whole scan is
      // oracle-checkable
      val docs = Tables.documents(s, d)
      val injected = docs.withColumn("_t", concat(col("text"),
        when(col("doc_id") % 10 === 0,
          concat(lit(" reach me at user"), col("doc_id"), lit("@example.com")))
          .when(col("doc_id") % 10 === 5, lit(" call 415-555-1234 now"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" account 12345678901234 on file"))
          .otherwise(lit(""))))
      injected.withColumn("_r", TextFunctions.redactPii(col("_t")))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("_r").contains("<EMAIL>"), 1L).otherwise(0L)).as("n_email"),
          sum(when(col("_r").contains("<PHONE>"), 1L).otherwise(0L)).as("n_phone"),
          sum(when(col("_r").contains("<NUM>"), 1L).otherwise(0L)).as("n_num"),
          sum(when(col("_r").contains("@"), 1L).otherwise(0L)).as("n_leaked"))
        .orderBy("source")
    }),
    "q_corpus_shuffle" -> ((s, d) =>
      // deterministic epoch shuffle into 32 training shards: md5 order,
      // no global window (the only sort is per-shard) — reproducible
      // across engines, so the whole layout is oracle-checked
      TextQuality.shuffleShards(Tables.documents(s, d), "doc_id", nShards = 32)
        .orderBy("shard", "pos")),
    "q_mix_plan" -> ((s, d) =>
      // training-mixture planner over language strata: binary-exact
      // weights (0.5/0.125×4) so floor/ceil arithmetic is bit-identical
      // cross-engine; one partial-aggregated pass over the corpus
      TextQuality.mixturePlan(Tables.documents(s, d), "lang", "text",
        Map("en" -> 0.5, "de" -> 0.125, "es" -> 0.125, "fr" -> 0.125,
          "zh" -> 0.125), tokenBudget = 50000L)
        .orderBy("stratum")),
    "q_prep_pipeline" -> ((s, d) => {
      // capstone composition: the whole training-data prep path as ONE
      // declarative plan — exact dedup (keep-first by NFC fingerprint) →
      // token-count quality gate → document-stable train/val/test split →
      // epoch-shard assignment (THE shardColumn shuffleShards uses) →
      // per-(split, shard) manifest. Every stage is md5-portable, so the
      // composition is oracle-checked end to end; two shuffles total
      // (fingerprint window + final manifest agg), everything else
      // map-side
      val fp = TextFunctions.fingerprint(col("text"))
      val toks = size(TextFunctions.tokens(col("text")))
      val w = Window.partitionBy("fp").orderBy("doc_id")
      val curated = Tables.documents(s, d)
        .select(col("doc_id"), fp.as("fp"), toks.cast("long").as("n_tokens"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("n_tokens") >= 30)
      TextQuality.hashSplit(curated, "doc_id",
          Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
        .withColumn("shard", TextQuality.shardColumn(col("doc_id"), 8, "e1"))
        .groupBy("split", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
        .orderBy("split", "shard")
    }),
    "q_vocab_div" -> ((s, d) => {
      // training-mix drift: JS divergence between even- and odd-id
      // corpus halves; ln ulp-hardened by 9dp rounding + DECIMAL sums
      val docs = Tables.documents(s, d)
      TextQuality.vocabDivergence(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "text")
    }),
    "q_cross_dedup" -> ((s, d) => {
      // incremental ingestion screen: every 7th doc re-arrives under a
      // new id and must match its source (and its source's duplicates)
      // in the existing corpus — old×old pairs are NOT re-reported. The
      // xxhash64 pair set is engine-specific, so the query emits the
      // exact drop×corpus truth-set size (trigram Jaccard ≥ 0.8,
      // engine-reproducible) plus verdicts: every planted identical
      // pair found (identical text → identical signatures → guaranteed),
      // and recall vs the exact truth ≥ 0.9. The raw screen stays
      // oracled via q_cross_dedup_md5.
      val corpus = Tables.documentsWide(s, d)
      val drop = corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(500000L)).as("doc_id"), col("text"))
      val reported = TextDedup.crossCorpusNearDups(drop, corpus, "text", "doc_id")
        .select(col("new_id"), col("corpus_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val both = corpus.select(col("doc_id"), col("text"))
        .unionByName(drop.select(col("doc_id"), col("text")))
      val truth = TextDedup.jaccardPairs(both, "text", "doc_id",
          n = 3, threshold = 0.8)
        .filter(col("doc_a") < 500000L && col("doc_b") >= 500000L)
        .select(col("doc_b").as("new_id"), col("doc_a").as("corpus_id"),
          lit(1).as("_t"))
      // planted = identical re-arrivals long enough to shingle (< n
      // tokens cannot be screened by any shingle pipeline)
      val planted = drop
        .filter(size(TextFunctions.tokens(col("text"))) >= 3)
        .select(col("doc_id").as("new_id"),
          (col("doc_id") - 500000L).as("corpus_id"))
      val missedPlanted =
        planted.join(reported, Seq("new_id", "corpus_id"), "left_anti")
      truth.join(reported.withColumn("_r", lit(1)),
          Seq("new_id", "corpus_id"), "full_outer")
        .agg(count(col("_t")).as("n_true"),
          count(when(col("_t").isNotNull && col("_r").isNotNull, 1)).as("_hit"))
        .crossJoin(missedPlanted.agg(count(lit(1)).as("_miss")))
        .select(col("n_true"),
          (col("_miss") === 0).as("all_planted_found_ok"),
          (col("n_true") === 0 || col("_hit") >= col("n_true") * 0.9)
            .as("recall_ok"))
    }),
    "q_cross_dedup_md5" -> ((s, d) => {
      // engine-portable twin of q_cross_dedup: same drop construction,
      // md5 double-hashing signatures — the asymmetric incremental
      // screen proven cross-engine end to end
      val corpus = Tables.documentsWide(s, d)
      val drop = corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(500000L)).as("doc_id"), col("text"))
      TextDedup.crossCorpusNearDupsPortable(drop, corpus, "text", "doc_id")
        .orderBy("new_id", "corpus_id")
    }),
    "q_corpus_diff" -> ((s, d) => {
      // corpus release audit (Diff.snapshotDiff): v2 = v1 minus
      // doc_id%17 (removed), doc_id%13 texts revised (changed),
      // doc_id%19 re-released under +10M ids (added). The diff joins
      // (key, fingerprint) projections only — md5 portable twin of the
      // xxhash64 production fingerprint (DiffSpec pins status parity).
      val v1 = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val v2 = v1.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(v1.filter(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      Diff.snapshotDiff(v1, v2, Seq("doc_id"), Seq("text"), portable = true)
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("key_sum"))
        .orderBy("status")
    }),
    "q_minhash_pairs" -> ((s, d) =>
      // the xxhash64 fast path's pair set is engine-specific, so the
      // query emits its QUALITY verdict against exact-Jaccard ground
      // truth: truth-set size (exact, engine-reproducible) + recall/
      // precision ≥ 0.9 booleans (measured 1.0/1.0 at both test SFs —
      // the fixture's near-dups sit far from the 0.5 boundary). The
      // raw-pairs surface stays oracled via q_minhash_pairs_md5.
      TextDedup.minhashVsExactReport(Tables.documentsWide(s, d), "text", "doc_id",
        n = 3, k = 32, bands = 8, threshold = 0.5,
        minRecall = 0.9, minPrecision = 0.9)),
    "q_minhash_pairs_sampled" -> ((s, d) =>
      // the 100 TB form of the q_minhash_pairs verdict: exact-Jaccard
      // truth on a FIXED 1280-doc md5 panel (r16: the quarter-sample
      // form kept truth cost at (N/4)² — quadratic in the corpus,
      // 5.2× for 10× data on the sf1→sf10 decade; a fixed budget is
      // SF-invariant), fast-path LSH still over the WHOLE corpus,
      // confusion matrix on the panel subpopulation (unbiased
      // per-pair — see minhashVsExactBudgetReport). This is the sf10
      // gate's query; full-exact q_minhash_pairs stays on the oracle
      // gates.
      TextDedup.minhashVsExactBudgetReport(Tables.documents(s, d), "text", "doc_id",
        n = 3, k = 32, bands = 8, threshold = 0.5,
        minRecall = 0.9, minPrecision = 0.9, panelBudget = 1280,
        panelTag = "mvp")),
    "q_minhash_pairs_md5" -> ((s, d) =>
      // the engine-portable LSH twin: md5 hash family, every stage
      // (shingle → signature minima → banding → verify) DuckDB-oracled
      TextDedup.minhashLshPairsPortable(Tables.documentsWide(s, d), "text", "doc_id",
        n = 3, k = 16, bands = 4, threshold = 0.5)
        .orderBy("doc_a", "doc_b")),
    "q_simhash_pairs" -> ((s, d) =>
      // the xxhash64 signature votes are engine-specific, so the query
      // emits the two portable claims about the banded pipeline: the
      // exact identical-text pair count (engine-reproducible) with its
      // guaranteed-recall verdict (identical text → hamming 0 → must be
      // found), and banded-candidates ≡ brute-force-hamming over the
      // same signatures (pigeonhole: 4×16-bit bands catch hamming ≤ 3).
      // The raw-pairs surface stays oracled via q_simhash_pairs_md5.
      TextDedup.simhashSelfCheckReport(Tables.documents(s, d), "text", "doc_id",
        maxHamming = 3)),
    "q_simhash_pairs_md5" -> ((s, d) =>
      // the engine-portable SimHash twin: 56-bit md5 token hashes,
      // per-bit vote, 4×14-bit banding, popcount verify — DuckDB-oracled
      TextDedup.simhashPairsPortable(Tables.documentsWide(s, d), "text", "doc_id",
        maxHamming = 3)
        .orderBy("doc_a", "doc_b")),
    "q_lsh_recall" -> ((s, d) =>
      // the measurement run before trusting banded LSH corpus-wide:
      // recall/precision of the md5 LSH screen vs exact-Jaccard truth
      // at the same 0.8 threshold — both pipelines and the confusion
      // counts oracle-checked end to end
      TextDedup.lshRecallReport(Tables.documentsWide(s, d), "text", "doc_id",
        n = 3, k = 16, bands = 4, threshold = 0.8)),
    "q_block_dedup" -> ((s, d) =>
      // block-level exact substring dedup (Lee et al. 2022 regime):
      // 16-token blocks, corpus-global keep-first by md5, reassembly in
      // document order — duplicated spans that survive whole-doc
      // fingerprints are removed from every later document
      TextDedup.blockDedup(Tables.documents(s, d), "text", "doc_id",
        blockTokens = 16)
        .orderBy("doc_id")),
    "q_boilerplate" -> ((s, d) =>
      // frequency-threshold boilerplate strip: every occurrence of any
      // 8-token block seen in ≥3 distinct docs is removed (template
      // chrome — no copy worth keeping), per-doc removal accounting
      TextDedup.stripBoilerplate(Tables.documents(s, d), "text", "doc_id",
        blockTokens = 8, minDocFreq = 3)
        .orderBy("doc_id")),

    // ---- training-data: similarity search ----------------------------
    "q_ann_topk" -> ((s, d) => {
      val e = Tables.embeddingsWide(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),
    "q_ann_quantized" -> ((s, d) => {
      val e = Tables.embeddingsWide(s, d)
      Similarity.quantizedTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf" -> ((s, d) => {
      // deterministic modulo-sampled centroids (production would pass a
      // fitCentroids k-means|| fit — engine-specific seeding — but this
      // probe is fully replayable: DuckDB re-derives the same centroid
      // set, assignment argmax, and nprobe=4 probe list bit-exactly).
      // The vec_id < 2000 bound caps the centroid COUNT at 80 (a no-op
      // at the oracle SFs, whose ids all sit below 2000): an unbounded
      // modulo stride scales centroids WITH the corpus, making the
      // assign stage N×N/25 — measured 15.5× for 10× data at sf1
      // before the bound; linear after, like the fixed-k md5 twin.
      val e = Tables.embeddingsWide(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
        e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000),
        "vec_id", "embedding", k = 5, nprobe = 4)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf_md5" -> ((s, d) => {
      // oracle twin with the hash-ordered centroid pick (the same
      // engine-portable md5 seeding that oracles q_semantic_dedup):
      // proves the IVF probe end-to-end under a centroid set chosen by
      // uniform hash order rather than the modulo stride
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
        Similarity.hashSeedCentroids(e, "vec_id", "embedding", k = 25, seed = 7),
        "vec_id", "embedding", k = 5, nprobe = 4)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf_capped" -> ((s, d) => {
      // the hot-cell guard on the DRIVER surface: cap = the observed
      // max occupancy (a centroid-count-sized agg), i.e. the largest
      // cap that drops nothing — the oracle (identical to q_ann_ivf's)
      // pins that the capping machinery (occupancy count + broadcast
      // semi-filter) is exactly identity on a non-skewed corpus;
      // TextDedupSpec proves the drop + recall-loss report on a skewed
      // one. At 100 TB the cap is the knob that bounds per-probe cost
      // when a degenerate centroid swallows the corpus.
      val e = Tables.embeddingsWide(s, d)
      // bounded centroid count (see q_ann_ivf) + persisted index: the
      // maxCell action and the probe would otherwise each recompute the
      // corpus-wide assign stage
      val cents = e.filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000)
      val assigned = Similarity.assignToCentroids(e, cents, "vec_id", "embedding")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val maxCell = Similarity.ivfCellReport(assigned, topN = 1).head().getLong(1)
      Similarity.ivfTopKAssigned(assigned, e.filter(col("vec_id") < 10), cents,
        "vec_id", "embedding", k = 5, nprobe = 4, maxCellSize = maxCell)
        .orderBy("query_id", "rank")
    }),
    "q_ann_pq" -> ((s, d) => {
      // product quantization end-to-end: md5-seeded per-subspace
      // codebooks (PQ8×16 on the 64-d corpus → 8 codes/vec, 64× below
      // raw doubles), exact sub-L2 encoding, ADC lookup-table search.
      // Every stage is deterministic arithmetic the oracle replays:
      // codes by (d2, code) argmin, scores by 9dp-round→DECIMAL sums.
      val e = Tables.embeddingsWide(s, d)
      val cb = Similarity.pqCodebooks(e, "vec_id", "embedding",
        m = 8, ksub = 16, dim = 64, seed = 7)
      val codes = Similarity.pqEncode(e, cb, "vec_id", "embedding", m = 8, dim = 64)
      Similarity.pqTopK(codes, e.filter(col("vec_id") < 10), cb,
        "vec_id", "embedding", m = 8, dim = 64, k = 5)
        .orderBy("query_id", "rank")
    }),
    "q_random_proj" -> ((s, d) => {
      // JL ±1 random projection 64→8: the md5-derived sign matrix is
      // re-derived by the oracle (never trusted as a table); each
      // component is the native sequential dot fold, so raw doubles
      // match cross-engine (the q_ann_topk convention)
      val p = Similarity.randomProject(Tables.embeddings(s, d),
        "vec_id", "embedding", inDim = 64, outDim = 8)
      p.select(col("vec_id") +:
          (1 to 8).map(j => element_at(col("proj"), j).as(s"p$j")): _*)
        .orderBy("vec_id")
    }),
    "q_rp_recall" -> ((s, d) => {
      // the JL payoff measured, never assumed: top-5 recall of
      // brute-force search in the 8-dim projected space vs exact
      // 64-dim truth — the q_ann_pq_recall recipe over randomProject
      val e = Tables.embeddingsWide(s, d)
      val q10 = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, q10, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("_e"))
      val pc = Similarity.randomProject(e, "vec_id", "embedding",
        inDim = 64, outDim = 8)
      val approx = Similarity.bruteForceTopK(
          pc, pc.filter(col("vec_id") < 10), "vec_id", "proj", k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("_p"))
      exact.join(approx, Seq("query_id", "neighbor_id"), "full_outer")
        .agg(count(col("_e")).as("n_exact"), count(col("_p")).as("n_proj"),
          count(when(col("_e").isNotNull && col("_p").isNotNull, 1)).as("n_hit"))
        .select(col("n_exact"), col("n_proj"), col("n_hit"),
          when(col("n_exact") > 0,
            col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }),
    "q_ann_pq_recall" -> ((s, d) => {
      // the PQ recall report vs exact brute-force truth — the same
      // measure-don't-assume discipline as q_embed_recall: ADC scores
      // are approximations, so the overlap of the two top-5 sets is
      // REPORTED (and oracle-verified), never presumed
      val e = Tables.embeddingsWide(s, d)
      val q10 = e.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(e, q10, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("_e"))
      val cb = Similarity.pqCodebooks(e, "vec_id", "embedding",
        m = 8, ksub = 16, dim = 64, seed = 7)
      val codes = Similarity.pqEncode(e, cb, "vec_id", "embedding", m = 8, dim = 64)
      val pq = Similarity.pqTopK(codes, q10, cb,
          "vec_id", "embedding", m = 8, dim = 64, k = 5)
        .select(col("query_id"), col("neighbor_id"), lit(1).as("_p"))
      exact.join(pq, Seq("query_id", "neighbor_id"), "full_outer")
        .agg(count(col("_e")).as("n_exact"), count(col("_p")).as("n_pq"),
          count(when(col("_e").isNotNull && col("_p").isNotNull, 1)).as("n_hit"))
        .select(col("n_exact"), col("n_pq"), col("n_hit"),
          when(col("n_exact") > 0,
            col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }),
    "q_pq_planted" -> ((s, d) => {
      // PLANTED-structure PQ recall gate (r14 verdict item 5): the
      // i.i.d.-noise corpus makes q_ann_pq_recall honest but
      // uninformative as a REGRESSION gate (recall 0.24 vs hairline
      // ties — noise has no recoverable structure). Every 50th vector
      // gets a near-identical copy (±4% componentwise, cosine ≈ 0.999,
      // id +1e6); PQ8×16 ADC top-1 must retrieve the original for ≥80%
      // of the probe panel — the PqSpec bar, driver-oracled so a
      // quantization regression that loses REAL structure goes red.
      //
      // FIXED-BUDGET panels (the 100 TB recall-gate shape, and the fix
      // for the r15 sf1 finding — the unbounded form cost 117 s there,
      // exact-ADC being |Q|×|N|): the probe panel is 128 md5-selected
      // copies and the corpus is 4096 md5-selected distractors plus
      // the panel's originals, so gate cost AND difficulty are
      // SF-invariant — corpus growth no longer masquerades as (or
      // dilutes) a quantization regression. Only the panel selection
      // scans the full table (TakeOrdered, one pass, no driver state).
      val base = Tables.embeddings(s, d)
        .select(col("vec_id").cast("long").as("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      val dups = base.filter(col("vec_id") % 50 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + lit(0.02) *
              ((col("vec_id") + i) % 5 - 2).cast("double"))).as("embedding"))
      // panel and corpus are persisted: they are panel-sized (128 / ~4.2k
      // rows) but their LINEAGE scans the full embeddings table, and the
      // codebook/encode/ADC consumers would otherwise inline that lineage
      // per use — 20 table scans at sf0.1 (measured; 3 after). At 100 TB
      // the selection scans are the query's only corpus-sized work and
      // must run ONCE.
      val panel = dups.orderBy(
          md5(concat(col("vec_id").cast("string"), lit(":pqq"))), col("vec_id"))
        .limit(128)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val originals = base.join(
        panel.select((col("vec_id") - 1000000L).as("vec_id")),
        Seq("vec_id"), "left_semi")
      val distractors = base.orderBy(
          md5(concat(col("vec_id").cast("string"), lit(":pqd"))), col("vec_id"))
        .limit(4096)
      val corpus = distractors.unionByName(originals).dropDuplicates("vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cb = Similarity.pqCodebooks(corpus, "vec_id", "embedding",
        m = 8, ksub = 16, dim = 64, seed = 7)
      val codes = Similarity.pqEncode(corpus, cb, "vec_id", "embedding", m = 8, dim = 64)
      val hit = col("neighbor_id") === col("query_id") - 1000000L
      Similarity.pqTopK(codes, panel, cb,
          "vec_id", "embedding", m = 8, dim = 64, k = 1)
        .agg(count(lit(1)).as("n_queries"),
          sum(when(hit, 1L).otherwise(0L)).as("n_top1_hits"))
        .select(col("n_queries"), col("n_top1_hits"),
          (col("n_top1_hits").cast("double") / col("n_queries")).as("recall_top1"),
          (col("n_top1_hits").cast("double") / col("n_queries") >= 0.8).as("recall_ok"))
    }),
    "q_ivf_cells" -> ((s, d) =>
      // the occupancy report itself, oracled: top-20 IVF cells by
      // vector count — the skew observability a 100 TB probe needs
      // BEFORE paying Σ|cell| in exact dots (see ivfCellReport scaladoc);
      // centroid count bounded like q_ann_ivf's (linear assign at scale)
      Similarity.ivfCellReport(
        Similarity.assignToCentroids(Tables.embeddingsWide(s, d),
          Tables.embeddingsWide(s, d)
            .filter(col("vec_id") % 25 === 0 && col("vec_id") < 2000),
          "vec_id", "embedding"), topN = 20)
        .orderBy(col("n_vectors").desc, col("cent_id"))),

    // ---- training-data: multimodal (REAL javax.imageio pixel decode) --
    "q_multimodal_meta" -> ((s, d) => {
      // real probe chain (header walk → ImageIO fallback) over real
      // synthesized PNGs, with every 10th doc carrying garbage bytes to
      // exercise the malformed→nulls contract; the oracle recomputes
      // validity and dimensions arithmetically
      import s.implicits._
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id")).as[Long]
      val media = ids.mapPartitions(_.map(id =>
          (id, if (id % 10 == 0) s"not-an-image-$id".getBytes("UTF-8")
               else Multimodal.synthImage(id))))
        .toDF("doc_id", "media")
      Multimodal.probeMeta(s, media, "doc_id")
        .select(col("id").as("doc_id"), col("valid"), col("format"),
          col("width").cast("int").as("width"),
          col("height").cast("int").as("height"))
        .orderBy("doc_id")
    }),
    "q_frame_sample" -> ((s, d) => {
      // REAL multi-frame decode: 1 + doc_id%4 solid-color frames per doc
      // encoded as an animated GIF, decoded with ImageIO, per-frame mean
      // RGB measured from the pixels; the oracle recomputes the frame
      // colors arithmetically — any decode drift hash-mismatches
      import s.implicits._
      val ids = Tables.documentsWide(s, d)
        .select(col("doc_id").cast("long").as("doc_id")).as[Long]
      val media = ids.mapPartitions(_.map { id =>
          val frames = (0 to (id % 4).toInt).map { f =>
            val img = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val rgb = ((((id * 5 + f * 49) % 256).toInt) << 16) |
              ((((id * 11 + f * 23) % 256).toInt) << 8) |
              (((id * 3 + f * 77) % 256).toInt)
            var y = 0
            while (y < 8) { var x = 0; while (x < 8) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
            img
          }
          (id, Multimodal.ImageCodec.encodeGif(frames))
        }).toDF("doc_id", "media")
      Multimodal.sampleFrames(s, media, "doc_id", 4)
        .toDF()
        .select(col("doc_id"), col("frame_idx"),
          element_at(col("feature"), 1).cast("double").as("mean_r"),
          element_at(col("feature"), 2).cast("double").as("mean_g"),
          element_at(col("feature"), 3).cast("double").as("mean_b"))
        .orderBy("doc_id", "frame_idx")
    }),
    "q_chunk" -> ((s, d) =>
      // context-length prep: 32-token windows at stride 24 (8-token
      // overlap), final partial window kept — chunk text and counts are
      // pure token arithmetic, fully oracle-checkable
      TextFunctions.chunkByTokens(Tables.documents(s, d), "text", "doc_id",
        chunkTokens = 32, strideTokens = 24)
        .orderBy("doc_id", "chunk_idx")),
    "q_audio_fp" -> ((s, d) => {
      // audio energy-envelope fingerprint over REAL decoded PCM: each
      // doc's 16-frame amplitude envelope IS its doc_id bit pattern
      // (0.8/0.2), and at 440 Hz / 16 kHz / 25 ms every frame holds
      // exactly 11 cycles — equal-amplitude frames are sample-identical,
      // so the sign-of-delta bits are closed-form: bit f = b(f+1)∧¬b(f)
      import s.implicits._
      val ids = Tables.documentsWide(s, d)
        .select(col("doc_id").cast("long").as("doc_id")).as[Long]
      val media = ids.mapPartitions(_.map { id =>
          val amps = (0 until 16).map(f =>
            if (((id >> f) & 1L) == 1L) 0.8 else 0.2)
          (id, Multimodal.WavCodec.synthesizeEnvelope(440.0, amps))
        }).toDF("doc_id", "media")
      Multimodal.audioFingerprint(s, media, "doc_id")
        .select(col("id").as("doc_id"), col("afp"))
        .orderBy("doc_id")
    }),
    "q_image_phash" -> ((s, d) =>
      // 56-bit dHash over REAL decoded pixels of the synthetic PNGs; the
      // oracle recomputes the luma plane and difference bits closed-form
      Multimodal.imagePHash(s,
          Multimodal.syntheticImages(s, Tables.documentsWide(s, d), "doc_id"), "id")
        .select(col("id").as("doc_id"), col("phash"))
        .orderBy("doc_id")),
    "q_image_frames" -> ((s, d) =>
      // full pixel-decode oracle: deterministic solid/gradient PNGs per
      // doc, decoded with ImageIO; exact channel means + integer-luma
      // histogram recomputed closed-form in SQL over the pixel grid
      Multimodal.imageFrameFeatures(s,
        Multimodal.syntheticImages(s, Tables.documentsWide(s, d), "doc_id"), "id", 1)
        .select(col("id").as("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"),
          col("h0"), col("h1"), col("h2"), col("h3"),
          col("h4"), col("h5"), col("h6"), col("h7"))
        .orderBy("doc_id")),
    "q_image_resize" -> ((s, d) => {
      // REAL resize round-trip: synth 8×8 PNGs → nearest-neighbor 4×4 →
      // PNG re-encode → re-decode and measure. Resized pixel (x,y) is
      // the original at (2x, 2y), so the means are closed-form in SQL
      val resized = Multimodal.resizeImages(s,
        Multimodal.syntheticImages(s, Tables.documentsWide(s, d), "doc_id"),
        "id", outW = 4, outH = 4)
      Multimodal.imageFrameFeatures(s, resized, "id", 1)
        .select(col("id").as("doc_id"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
        .orderBy("doc_id")
    }),
    "q_image_meta" -> ((s, d) => {
      // real header probing round-trip, like q_wav_meta: synthesize a
      // PNG header with dims derived from doc_id, parse it back; the
      // oracle recomputes the dims arithmetically
      import s.implicits._
      val ids = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id")).as[Long]
      val media = ids.mapPartitions(_.map(id =>
          (id, Multimodal.ImageMeta.synthesizePngHeader(
            (64 + id % 512).toInt, (48 + id % 256).toInt))))
        .toDF("doc_id", "media")
      Multimodal.probeImageMeta(s, media, "doc_id")
        .select(col("id").as("doc_id"), col("format"),
          col("width").cast("int").as("width"),
          col("height").cast("int").as("height"))
        .orderBy("doc_id")
    }),
    "q_wav_meta" -> ((s, d) => {
      // REAL codec round-trip (audio is NOT stubbed): synthesize a
      // deterministic PCM WAV per doc (freq/length derived from doc_id),
      // parse it back with the pure-JVM RIFF parser; the oracle
      // recomputes the expected header values arithmetically — any parse
      // drift hash-mismatches
      import s.implicits._
      val ids = Tables.documentsWide(s, d)
        .select(col("doc_id").cast("long").as("doc_id")).as[Long]
      val media = ids.mapPartitions(_.map(id =>
          (id, Multimodal.WavCodec.synthesize(
            100.0 + (id % 400), (40 + (id % 60) * 2).toInt))))
        .toDF("doc_id", "media")
      Multimodal.probeWavMeta(s, media, "doc_id")
        .select(col("id").as("doc_id"),
          col("sample_rate").cast("int").as("sample_rate"),
          col("channels").cast("int").as("channels"),
          col("bits_per_sample").cast("int").as("bits_per_sample"),
          col("n_samples").cast("bigint").as("n_samples"),
          col("duration_ms").cast("bigint").as("duration_ms"))
        .orderBy("doc_id")
    }),
    "q_wav_resample" -> ((s, d) => {
      // REAL resample round-trip: same fixture as q_wav_meta, decimated
      // 16 kHz → 8 kHz, the output WAV re-probed — kept samples are the
      // source verbatim, so the headers are pure arithmetic:
      // n = 16·ms even → n_samples = 8·ms, duration unchanged
      import s.implicits._
      val ids = Tables.documentsWide(s, d)
        .select(col("doc_id").cast("long").as("doc_id")).as[Long]
      val media = ids.mapPartitions(_.map(id =>
          (id, Multimodal.WavCodec.synthesize(
            100.0 + (id % 400), (40 + (id % 60) * 2).toInt))))
        .toDF("doc_id", "media")
      val resampled = Multimodal.resampleWav(s, media, "doc_id", factor = 2)
      Multimodal.probeWavMeta(s, resampled, "id")
        .select(col("id").as("doc_id"),
          col("sample_rate").cast("int").as("sample_rate"),
          col("n_samples").cast("bigint").as("n_samples"),
          col("duration_ms").cast("bigint").as("duration_ms"))
        .orderBy("doc_id")
    }),

    // ---- as-of join + corpus curation --------------------------------
    "q_range_join" -> ((s, d) => {
      // point-in-interval via the grid-bucketized equi-join (never a
      // nested loop): order dates landing inside 30-day promotion
      // windows anchored at promotion orders.
      // FIXED-BUDGET interval side (r17 full-surface sf10 sweep catch,
      // the q_j6 discipline): with BOTH sides riding the corpus over
      // the FIXED ~2,400-day date domain, the true overlap count —
      // the join's own output — is N_points·N_intervals·L/T ∝ N²
      // (measured 89× wall for 10× data at sf10, 225 s). Promotion
      // windows are corpus-size-independent in the production shape,
      // so the interval side is a 1024-order md5 panel: identity at
      // sf0.1 and below (the %199 stratum holds ≤754 orders there),
      // a genuine replayed selection above; output ∝ N linear.
      val ords = Tables.orders(s, d)
      val pts = ords.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("point_id"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
      val ivs = TextDedup.md5Panel(
          ords.filter(col("o_orderkey") % 199 === 0)
            .select(col("o_orderkey").as("interval_id"),
              datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("start_day")),
          "interval_id", 1024, "rji")
        .withColumn("end_day", col("start_day") + 30)
      Joins.rangeJoin(pts, ivs, "day", "start_day", "end_day", grid = 32)
        .select("point_id", "interval_id", "day")
        .orderBy("point_id", "interval_id")
    }),
    "q_interval_join" -> ((s, d) => {
      // overlapping 21- and 30-day windows from two order strata — the
      // interval×interval companion to q_range_join, same grid plan.
      // Same r17 fixed-budget bound as q_range_join (both sides over
      // the fixed date domain = quadratic output, measured 201× for
      // 10× data): the b side is a 1024-order md5 panel (identity at
      // sf0.1 and below), the a side stays corpus-sized — linear.
      val ords = Tables.orders(s, d)
      def days(c: Column) = datediff(c, lit("1970-01-01")).cast("long")
      val a = ords.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("a_id"), days(col("o_orderdate")).as("a_start"))
        .withColumn("a_end", col("a_start") + 21)
      val b = TextDedup.md5Panel(
          ords.filter(col("o_orderkey") % 199 === 0)
            .select(col("o_orderkey").as("b_id"), days(col("o_orderdate")).as("b_start")),
          "b_id", 1024, "ivj")
        .withColumn("b_end", col("b_start") + 30)
      Joins.intervalOverlapJoin(a, b, "a_id", "a_start", "a_end",
          "b_id", "b_start", "b_end", grid = 32)
        .select("a_id", "b_id", "a_start", "b_start")
        .orderBy("a_id", "b_id")
    }),
    "q_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = Dedup.dedupKeepFirst(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        Seq("user_id", "ts"), Seq(col("event_id").desc))
      AsOf.join(clicks, purchases, "user_id", "user_id", "ts", "ts",
        Seq("event_id", "value"), col("event_id"))
        .orderBy("event_id")
    }),
    "q_asof_tol" -> ((s, d) => {
      // staleness-bounded as-of: same match as q_asof but a purchase
      // more than 1 hour old is NOT "the" purchase — its payload nulls
      // out while the click row itself survives (left-join contract)
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = Dedup.dedupKeepFirst(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        Seq("user_id", "ts"), Seq(col("event_id").desc))
      AsOf.join(clicks, purchases, "user_id", "user_id", "ts", "ts",
        Seq("event_id", "value"), col("event_id"),
        toleranceMs = Some(3600000L))
        .orderBy("event_id")
    }),
    "q_asof_forward" -> ((s, d) => {
      // the NEXT-event lookup: for each click, the earliest same-user
      // purchase at or after it (ties at one ts resolved keep-smallest
      // on both sides, mirroring q_asof's keep-largest)
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = Dedup.dedupKeepFirst(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value"),
        Seq("user_id", "ts"), Seq(col("event_id").asc))
      AsOf.joinForward(clicks, purchases, "user_id", "user_id", "ts", "ts",
        Seq("event_id", "value"), col("event_id"))
        .orderBy("event_id")
    }),
    "q_attribution" -> ((s, d) => {
      // last-touch attribution: each purchase credits the most recent
      // click within a 1-hour lookback (as-of join + window filter) —
      // purchases with no click, or a stale one, land in the
      // unattributed bucket. DECIMAL-exact revenue split.
      val ev = Tables.events(s, d)
      val clicks = Dedup.dedupKeepFirst(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        Seq("user_id", "ts"), Seq(col("event_id").desc))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      AsOf.join(purchases, clicks, "user_id", "user_id", "ts", "ts",
          Seq("event_id", "ts"), col("event_id"))
        .select(col("value"),
          (col("asof_ts").isNotNull &&
            (col("ts").cast("long") - col("asof_ts").cast("long")) <= 3600L)
            .as("attributed"))
        .groupBy("attributed")
        .agg(count(lit(1)).as("n_purchases"),
          Compat.exactSum(col("value"), 4).as("total_value"))
        .orderBy("attributed")
    }),
    "q_curate" -> ((s, d) => {
      val fp = TextFunctions.fingerprint(col("text"))
      val toks = size(TextFunctions.tokens(col("text")))
      val w = Window.partitionBy("fp").orderBy("doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), fp.as("fp"), toks.as("n_tokens"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("n_tokens") >= 30)
        .select("doc_id", "lang", "n_tokens")
        .orderBy("doc_id")
    }),

    "q_bm25" -> ((s, d) =>
      Retrieval.bm25TopK(Tables.documents(s, d), "text", "doc_id",
        Seq("spark", "window", "join"), k = 20)
        .orderBy("rank")),
    "q_curate_full" -> ((s, d) =>
      graft.pipelines.CorpusCuration.curate(Tables.documentsWide(s, d), "text", "doc_id")
        .orderBy("doc_id")),
    "q_curate_lsh" -> ((s, d) =>
      // the documented 100 TB swap EXECUTED: identical gates to
      // q_curate_full, near-dup pairs from banded MinHash LSH instead
      // of the quadratic exact path. The xxhash64 kept set is
      // engine-specific, so the query emits the portable path's kept
      // count (exact — q_curate_lsh_md5's oracled output) plus an
      // agreement verdict: fast-path kept set within 1% symmetric
      // difference of the portable one (measured 0 at both test SFs).
      graft.pipelines.CorpusCuration.curateAgreementReport(
        Tables.documentsWide(s, d), "text", "doc_id")),
    "q_curate_lsh_sampled" -> ((s, d) =>
      // the 100 TB form of the q_curate_lsh verdict: BOTH curation
      // paths over a FIXED 1280-doc md5 panel (kept sets are
      // whole-subcorpus-clustering-dependent, so the sound comparison
      // runs both paths on the same panel — see
      // curateAgreementBudgetReport; r16 converted the quarter-sample
      // form, whose exact path stayed (N/4)²-quadratic). The sf10 gate
      // runs this plus q_curate_lsh_md5 (full-corpus portable fast
      // path); the full-exact q_curate_lsh stays on the oracle gates.
      graft.pipelines.CorpusCuration.curateAgreementBudgetReport(
        Tables.documents(s, d), "text", "doc_id",
        panelBudget = 1280, panelTag = "clp")),
    "q_curate_lsh_md5" -> ((s, d) =>
      // the SAME 100 TB curation composition with the portable LSH pair
      // stage — every phase (LSH pairs → transitive closure →
      // repetition gates) reproduced in the DuckDB oracle
      graft.pipelines.CorpusCuration.curateAtScalePortable(
          Tables.documentsWide(s, d), "text", "doc_id")
        .orderBy("doc_id")),
    // The PRODUCTION fast path in isolation (xxhash64 MinHash+LSH →
    // CC → gates, no verification twin) is measured by
    // graft.CurateFastProbe, NOT registered here: its kept set is
    // engine-specific (no DuckDB replay for xxhash64), so a queries
    // entry can only ever be a permanent no-oracle row in the driver
    // ledger (r13 verdict item 2). Correctness rides on q_curate_lsh's
    // oracled ≤1%-disagreement verdict + the portable twin
    // q_curate_lsh_md5; the capacity-plan number lives in BASELINE.md.

    "q_vocab" -> ((s, d) => {
      val tok = Tables.documents(s, d).select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      tok.groupBy("token")
        .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100)
    }),
    "q_sample_strat" -> ((s, d) =>
      // deterministic 20% sample per language stratum — reproducible
      // across engines/cluster sizes, unlike rng-based df.sample. Uses
      // the md5-threshold sampler (engine-portable hash) so the kept
      // set is oracle-checkable in DuckDB; hashSampleFilter (xxhash64)
      // is the cheaper hot-path twin with identical semantics.
      Tables.documents(s, d)
        .filter(TextFunctions.md5SampleFilter(col("doc_id"), 0.2))
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")),
    "q_compress_ratio" -> ((s, d) => {
      // zlib byte counts are library-specific, so the query emits exact
      // per-language byte totals (engine-reproducible) plus in-query
      // band verdicts on the deflate output: every doc inside the
      // stored-block upper bound, and real text (≥200 B) compressing
      // into the measured [0.35, 0.65] average band (observed ≈ 0.46,
      // max 0.61, at both test SFs). DeflateLenSpec still pins
      // codegen≡interpreted, redundancy ordering, and determinism.
      val r = Tables.documents(s, d).select(col("lang"),
        octet_length(col("text")).as("_nb"),
        graft.plans.DeflateLen.len(col("text")).as("_dl"))
      val ratio200 =
        when(col("_nb") >= 200, col("_dl").cast("double") / col("_nb"))
      r.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(col("_nb").cast("long")).as("total_bytes"),
          (min(when(col("_dl") > 0 &&
            col("_dl") <= col("_nb") + lit(64), 1).otherwise(0)) === 1)
            .as("bounds_ok"),
          coalesce(max(ratio200) <= 0.8, lit(true)).as("big_docs_ok"),
          coalesce(avg(ratio200).between(0.35, 0.65), lit(true))
            .as("avg_ratio_ok"))
        .orderBy("lang")
    }),
    "q_fuzzy_pairs" -> ((s, d) => {
      // typo-level record linkage end-to-end: short name strings (text
      // prefixes), every 10th doc gets a planted one-char-substituted
      // copy at id+1e6; the deletion-neighborhood join must recover
      // exactly the levenshtein≤1 pairs the brute-force oracle finds
      val base = Tables.documents(s, d).filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), substring(lower(trim(col("text"))), 1, 24).as("name"))
      val p = (col("doc_id") % 20).cast("int")
      val planted = base.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("name").substr(lit(1), p), lit("q"),
          col("name").substr(p + 2, length(col("name")))).as("name"))
      TextDedup.editDistancePairs(base.unionByName(planted), "name", "doc_id")
        .orderBy("id_a", "id_b")
    }),
    "q_lm_score" -> ((s, d) => {
      // CCNet-style model-based quality filter: fit an add-1 bigram LM
      // on the even-id half (the "reference" slice), score the odd-id
      // half by mean bigram log-probability — ln rounds to 9dp into a
      // DECIMAL sum, so the scores hash-match DuckDB exactly
      val docs = Tables.documentsWide(s, d)
      TextQuality.bigramLmScore(
        docs.filter(col("doc_id") % 2 === 1),
        docs.filter(col("doc_id") % 2 === 0), "text", "doc_id")
        .orderBy("doc_id")
    }),
    "q_cdc_dedup" -> ((s, d) => {
      // content-defined chunking over a quarter-sample with a planted
      // shared suffix: the gear-hash cut points are a pure function of
      // content, so the shared run's interior chunks dedup across docs
      // at ANY offset — the blob-store dedup primitive, fully replayed
      // by the oracle (per-char gear md5, Horner window fold, cut rule,
      // per-chunk md5)
      // the suffix must comfortably exceed the gear window: only
      // positions whose whole window lies inside the shared run hash
      // identically across docs, so interior chunks need hundreds of
      // shared chars to form (the first 39 positions straddle
      // doc-specific text by construction)
      // NON-periodic too: a repeated sentence makes the rolling hash
      // periodic (cut pattern all-or-nothing across periods); numbered
      // sections vary the content so cuts land independently
      val promo = (1 to 9).map(k =>
        s" CDCPROMO section $k rights reserved contact admin example com item $k end").mkString
      val docs = Tables.documents(s, d).filter(col("doc_id") % 32 === 0)
        .select(col("doc_id"), concat(col("text"), lit(promo)).as("t"))
      TextDedup.contentDefinedChunks(docs, "t", "doc_id", maskBits = 7)
        .groupBy("chunk_md5", "len")
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") >= 2)
        .orderBy(col("n_occurrences").desc, col("chunk_md5"))
        .limit(20)
    }),
    "q_score_agreement" -> ((s, d) => {
      // do the two quality signals rank the corpus the same way?
      // Spearman over ROW ranks (value, doc_id total order): Σd² is an
      // exact integer cross-engine, the only IEEE op is the final ρ —
      // rank correlation is the portable agreement metric where
      // Pearson's float sums are not
      val docs = Tables.documentsWide(s, d)
      val cls = TextQuality.hashedLinearScore(docs, "text", "doc_id")
        .select(col("doc_id"), col("score"))
      val lm = TextQuality.bigramLmScore(
          docs, docs.filter(col("doc_id") % 2 === 0), "text", "doc_id")
        .select(col("doc_id"), col("avg_logprob"))
      Aggs.spearmanRank(cls.join(lm, Seq("doc_id")),
        "doc_id", "score", "avg_logprob")
    }),
    "q_quality_classifier" -> ((s, d) =>
      // fastText-shaped model-based gate: unigram+bigram hashing trick
      // into 4096 buckets, deterministic centered integer weights
      // summed as BIGINT (order-free), ONE final IEEE division — the
      // whole score is a scalar expression (zero explode, zero
      // shuffle), so 100 TB scoring is pure map work on the scan
      TextQuality.hashedLinearScore(Tables.documents(s, d), "text", "doc_id")
        .orderBy("doc_id")),
    "q_classifier_weighted" -> ((s, d) =>
      // the TRAINED-table form of q_quality_classifier: a 64-bucket
      // fixed-point weight row rides into the native fold as one
      // reference object — same plan, same zero-shuffle scan; the
      // oracle embeds the identical table as a list literal
      TextQuality.hashedLinearScoreWeighted(
        Tables.documents(s, d), "text", "doc_id", trainedDemoWeights)
        .orderBy("doc_id")),
    "q_ccnet_buckets" -> ((s, d) => {
      // CCNet corpus layout: per-language perplexity terciles of the
      // bigram-LM score (ref = even-id half). Bucketed WITHOUT the
      // naive corpus-wide per-lang sort — per-(lang,score) count
      // compression + straddle-only ranking, proven ≡ the window form
      // (which the oracle replays)
      val docs = Tables.documentsWide(s, d)
      val scored = TextQuality.bigramLmScore(
          docs, docs.filter(col("doc_id") % 2 === 0), "text", "doc_id")
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      TextQuality.ccnetBuckets(scored, "lang", "doc_id", "avg_logprob")
        .select("doc_id", "lang", "avg_logprob", "bucket")
        .orderBy("doc_id")
    }),
    "q_dsir_weights" -> ((s, d) => {
      // DSIR (Xie et al. 2023): fit hashed-ngram multinomials on a
      // target split vs the raw rest (one explode+agg pass, ≤4096-row
      // shuffle), collect the 32 KB fixed-point log-ratio table as the
      // MODEL, then score every doc with the zero-shuffle native fold —
      // logw is an integer sum ÷ 1e6, so DuckDB refitting the same
      // table replays it bit-exactly
      val docs = Tables.documentsWide(s, d)
      val fx = TextQuality.dsirFitFx(docs, col("doc_id") % 13 === 0, "text")
      TextQuality.dsirWeights(docs, "text", "doc_id", fx).orderBy("doc_id")
    }),
    "q_dsir_sample" -> ((s, d) => {
      // the resampling half: deterministic Gumbel-top-k on logw —
      // sampling k docs ∝ exp(logw) without replacement. The Gumbel
      // uniform is a 60-bit md5 prefix over a power-of-two divide
      // (exact in both engines); the key orders membership only, output
      // values are the exact integers/division from q_dsir_weights
      val docs = Tables.documentsWide(s, d)
      val fx = TextQuality.dsirFitFx(docs, col("doc_id") % 13 === 0, "text")
      TextQuality.dsirResample(docs, "text", "doc_id", fx, k = 100, seed = "s1")
    }),
    "q_pps_sample" -> ((s, d) =>
      // systematic PPS: exactly 10 docs per language, selected with
      // probability proportional to token count — integer-exact
      // (md5 order + DECIMAL cumsum + integral division), so the
      // selected set hash-matches DuckDB bit for bit
      TextQuality.ppsSample(
        Tables.documents(s, d).filter(length(trim(col("text"))) > 0),
        "lang", "doc_id",
        size(TextFunctions.tokens(col("text"))), k = 10, seed = "s1")
        .orderBy("lang", "doc_id")),
    "q_cosine_pairs" -> ((s, d) => {
      // exact embedding near-dup truth, FIXED-BUDGET panel form (the
      // q_pq_planted pattern, r15 verdict item 2): cosinePairsExact is
      // |input|² BY DESIGN, so the full-corpus form's cost rides the
      // corpus quadratically (6.7× wall for 10× data at sf1). The panel
      // is 1024 md5-selected vectors — larger than the sf0.01 corpus
      // (identity there), a genuine replayed selection at sf0.1, and
      // SF-invariant cost above. Full corpora take the LSH scale path
      // (q_embed_neardup); its recall is measured by q_embed_recall.
      val e = Tables.embeddings(s, d)
      val panel = e.orderBy(
          md5(concat(col("vec_id").cast("string"), lit(":cosp"))), col("vec_id"))
        .limit(1024)
      Similarity.cosinePairsExact(panel, "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")
    }),
    "q_embed_neardup" -> ((s, d) => {
      // the VERIFIED multi-table LSH scale path end-to-end. The synthetic
      // corpus has no true near-dups (max pair cosine ≈ 0.51), so every
      // 10th vector gets a deterministic perturbed copy (coordinate-wise
      // ±4% scaling — cosine ≈ 0.999) planted at id+1_000_000; LSH must
      // recover exactly those pairs. Hyperplanes, perturbation, and
      // verification dot are all plan-time-exact arithmetic the oracle
      // reproduces bit-for-bit.
      val base = Tables.embeddings(s, d).select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val dups = base.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + lit(0.02) *
              ((col("vec_id") + i) % 5 - 2).cast("double"))).as("embedding"))
      // AUTO-SIZED nbits (r16 verdict item 2): fixed 14 bits left the
      // candidate term N²·tables/2¹⁴ quadratic in the corpus (7.1× wall
      // for 10× data on the sf1→sf10 decade). nbits = ⌈log₂N⌉+3 keeps
      // candidates ∝ N at every SF; the oracle replays the identical
      // sizing from count(*) over the planted union, and the same
      // plan-time plane constants, so the pair set stays bit-exact
      // cross-engine at any SF (recall at the auto size is measured by
      // q_embed_recall, not assumed)
      Similarity.lshNearDupPairs(base.unionByName(dups), "vec_id", "embedding",
        threshold = 0.9, nbits = 0, tables = 4)
        .select(col("id_a"), col("id_b"), col("sim"))
        .orderBy("id_a", "id_b")
    }),
    "q_embed_recall" -> ((s, d) => {
      // the embedding-side analogue of q_lsh_recall: recall/precision of
      // the multi-table hyperplane LSH screen vs exact-cosine truth on
      // the planted corpus, same threshold. The LSH path verifies with
      // the exact dot, so precision must be 1.0 — the report PROVES it
      // rather than assuming it; recall measures the banding miss rate.
      //
      // FIXED-BUDGET truth panel (r15 verdict item 2): exact truth was
      // |N|² over the whole planted corpus — 9.8× wall for 10× data at
      // sf1. The ESTIMATE UNDER TEST (LSH) still runs the FULL corpus;
      // only the truth comparison restricts to the md5-selected panel
      // subpopulation (1024 base vectors + their planted copies), which
      // is per-pair unbiased — the minhashVsExactSampledReport recipe
      // with a fixed budget instead of a fraction, so truth cost is
      // SF-invariant. Identity at sf0.01 (panel ⊇ corpus); genuine
      // replayed selection at sf0.1.
      val base = Tables.embeddingsWide(s, d).select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val dups = base.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + lit(0.02) *
              ((col("vec_id") + i) % 5 - 2).cast("double"))).as("embedding"))
      val all = base.unionByName(dups)
      val panelBase = base.orderBy(
          md5(concat(col("vec_id").cast("string"), lit(":erp"))), col("vec_id"))
        .limit(1024).select("vec_id")
      val panelIds = panelBase.unionByName(
        panelBase.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + lit(1000000L)).as("vec_id")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val panelVecs = all.join(panelIds, Seq("vec_id"), "left_semi")
      val exact = Similarity.cosinePairsExact(panelVecs, "vec_id", "embedding", 0.9)
        .select(col("id_a"), col("id_b"), lit(1).as("_e"))
      // auto-sized nbits — the same sizing q_embed_neardup runs (and
      // whose banding miss rate this report MEASURES at each SF)
      val lsh = Similarity.lshNearDupPairs(all, "vec_id", "embedding",
          threshold = 0.9, nbits = 0, tables = 4)
        .join(panelIds.withColumnRenamed("vec_id", "id_a"), Seq("id_a"), "left_semi")
        .join(panelIds.withColumnRenamed("vec_id", "id_b"), Seq("id_b"), "left_semi")
        .select(col("id_a"), col("id_b"), lit(1).as("_l"))
      exact.join(lsh, Seq("id_a", "id_b"), "full_outer")
        .agg(count(col("_e")).as("n_exact"), count(col("_l")).as("n_lsh"),
          count(when(col("_e").isNotNull && col("_l").isNotNull, 1)).as("n_hit"))
        .select(col("n_exact"), col("n_lsh"), col("n_hit"),
          when(col("n_exact") > 0,
            col("n_hit").cast("double") / col("n_exact")).as("recall"),
          when(col("n_lsh") > 0,
            col("n_hit").cast("double") / col("n_lsh")).as("precision"))
    }),
    "q_cross_semantic" -> ((s, d) => {
      // incremental semantic screen: the corpus is assigned to md5-seeded
      // cells ONCE (the persistable IVF index); the planted daily drop
      // is assigned and compared only within its cell against corpus
      // vectors — old×old is structurally excluded. Every stage
      // (seeding, argmax assignment, exact dots) replays in DuckDB.
      //
      // FIXED BUDGETS (r17 full-surface sf10 sweep catch): the previous
      // k = N/250 made the IN-QUERY index build N²/250 (11.3× isolated
      // for 10× data — the assign stage was 90% of the cost), and the
      // %10 drop rode the corpus. k is now the FIXED 8 the oracle SFs
      // already used (bit-identical oracles), and the drop is a fixed
      // 1024-doc md5 panel (identity at sf0.1 and below — a daily drop
      // is corpus-size-independent in production, same argument as
      // q_j6/q_range_join). Every stage is linear in N. At 100 TB the
      // cell count DOES ride the corpus — but its assignment cost is
      // paid once at INDEX BUILD (assignToCentroids' persisted-index
      // contract) and amortized across screens; the screen itself costs
      // |drop|·(k + cell) whatever built the index.
      val corpus = Tables.embeddings(s, d).select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val cents = Similarity.hashSeedCentroids(corpus, "vec_id", "embedding",
        k = 8, seed = 7L)
      val idx = Similarity.assignToCentroids(corpus, cents, "vec_id", "embedding")
      val drop = TextDedup.md5Panel(
        corpus.filter(col("vec_id") % 10 === 0)
          .select((col("vec_id") + lit(1000000L)).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x * (lit(1.0) + lit(0.02) *
                ((col("vec_id") + i) % 5 - 2).cast("double"))).as("embedding")),
        "vec_id", 1024, "xsp")
      Similarity.crossCorpusSemanticPairs(drop, "vec_id", "embedding",
          idx, cents, tau = 0.9)
        .orderBy("new_id", "corpus_id")
    }),
    "q_semantic_dedup" -> ((s, d) => {
      // SemDeDup end-to-end: the same planted perturbed copies as
      // q_embed_neardup (cosine ≈ 0.999 to their source) must collapse
      // into their source's semantic group through the within-cell
      // pipeline. Centroids are the md5-seeded portable pick, so cell
      // assignment, pair set, and canonical choice are all reproduced
      // bit-for-bit by the DuckDB oracle.
      val base = Tables.embeddings(s, d).select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val dups = base.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + lit(0.02) *
              ((col("vec_id") + i) % 5 - 2).cast("double"))).as("embedding"))
      val all = base.unionByName(dups)
      // k grows with the corpus (the SemDeDup contract: cells must stay
      // ~constant-size or the within-cell quadratic re-approaches
      // corpus²). greatest(8, N/250) is 8 at both oracle SFs — identity
      // there — and 88/880 at sf1/sf10, where fixed k=8 measured 4.6×
      // for 10× data. The count is one bounded driver action; the
      // oracle replays the same arithmetic in its LIMIT.
      val k = math.max(8L, all.count() / 250).toInt
      val cents = Similarity.hashSeedCentroids(all, "vec_id", "embedding",
        k = k, seed = 7L)
      Similarity.semanticDedup(all, "vec_id", "embedding", cents, tau = 0.9)
        .orderBy("vec_id")
    }),

    // ---- training-data: URL/domain curation ---------------------------
    "q_url_canon" -> ((s, d) =>
      // URL canonicalization + registrable domain over a deterministic
      // synthetic URL (the corpus has no URL column) — every rule
      // exercised: mixed-case schemes, default vs exotic ports,
      // unsorted/duplicate/empty query params, fragments, trailing
      // slashes, multi-part public suffixes. Map-only at any scale.
      Tables.documents(s, d).select(col("doc_id"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("url_canon", Domains.urlCanonicalize(col("url")))
        .withColumn("domain", Domains.registeredDomain(Domains.hostOf(col("url"))))
        .orderBy("doc_id")),
    "q_domain_cap" -> ((s, d) =>
      // the RefinedWeb/C4 per-domain cap: ≤ 3 docs per registrable
      // domain by deterministic md5 order, through the SALTED two-phase
      // top-k (exact — top-k commutes over row partitions), so the
      // zipfian-hot-domain escape hatch is the path under test; the
      // oracle replays the cap with one plain window
      Domains.domainCap(
          Tables.documents(s, d).select(col("doc_id"))
            .withColumn("url", synthUrl(col("doc_id"))),
          "url", "doc_id", k = 3, salt = 4)
        .select("doc_id", "domain")
        .orderBy("domain", "doc_id")),
    "q_domain_quality" -> ((s, d) =>
      // domain-level quality priors: docs/scored/kept per domain, mean
      // classifier score (9dp-round → DECIMAL sum → one double divide).
      // Domain derivation and the HashedFeatScore fold ride ONE corpus
      // scan; the only shuffle is the partial-aggregated groupBy.
      Domains.domainQualityRollup(
          Tables.documentsWide(s, d).select(col("doc_id"), col("text"))
            .withColumn("url", synthUrl(col("doc_id"))),
          "url", "text")
        .orderBy("domain")),
    "q_domain_refresh" -> ((s, d) => {
      // incremental rollup maintenance: the corpus split
      // deterministically into base/delta halves, each reduced to its
      // ADDITIVE per-domain state, merged by re-aggregation, finished —
      // while the oracle computes the rollup DIRECTLY over the whole
      // corpus. Hash equality IS the mergeability proof, cross-engine:
      // a daily refresh costs |delta| + a domain-sized state, never a
      // base rescan.
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("url", synthUrl(col("doc_id")))
      val half = conv(substring(
        md5(col("doc_id").cast("string")), 32, 1), 16, 10).cast("int") % 2
      Domains.finishDomainQuality(Domains.mergeDomainQuality(
          Domains.domainQualityState(docs.filter(half === 0), "url", "text"),
          Domains.domainQualityState(docs.filter(half === 1), "url", "text")))
        .orderBy("domain")
    }),
    "q_domain_sample" -> ((s, d) =>
      // the policy loop the rollup feeds: per-domain keep rates become
      // sqrt-flattened sampling weights (IEEE-exact), each doc keeps
      // iff its 60-bit md5 prefix clears floor(weight·2^60) — an
      // INTEGER comparison, so the kept set replays bit-for-bit
      Domains.domainPriorSample(
          Tables.documentsWide(s, d).select(col("doc_id"), col("text"))
            .withColumn("url", synthUrl(col("doc_id"))),
          "url", "doc_id", "text")
        .select("doc_id", "domain", "weight")
        .orderBy("doc_id")),
    "q_line_dedup" -> ((s, d) => {
      // C4/RefinedWeb intra-doc line dedup: 2-word lines derived
      // deterministically (the corpus has no newlines), then the native
      // one-pass keep-first segment dedup — pure map work, zero shuffle
      val lined = Tables.documents(s, d).select(col("doc_id"),
        regexp_replace(col("text"), "(\\S+ \\S+) ", "$1\n").as("text"))
      TextDedup.dedupIntraDoc(lined, "text", "doc_id")
        .orderBy("doc_id")
    }),
    "q_html_extract" -> ((s, d) => {
      // HTML → text, the step before every quality gate: deterministic
      // page synthesis around each document (title/style/script/
      // comment/headline/paragraph-split/entities), then the NATIVE
      // three-buffer extractor — the oracle replays the declared
      // regex/replace chain, so this row end-to-end proves
      // native ≡ chain on corpus data at both oracle SFs
      val t = col("t")
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("html", synthHtml(col("doc_id"), col("text")))
        .withColumn("t", Html.htmlToText(col("html")))
        .select(col("doc_id"),
          length(t).cast("long").as("n_chars"),
          (length(t) - length(replace(t, lit("\n"), lit(""))) + 1)
            .cast("long").as("n_lines"),
          substring(t, 1, 60).as("head"),
          md5(t).as("body_md5"))
        .orderBy("doc_id")
    }),
    "q_fix_mojibake" -> ((s, d) => {
      // encoding repair: accented/curly chars injected deterministically
      // (translate), corrupted exactly the way a cp1252 misread of
      // UTF-8 bytes does, then repaired by the native single-level
      // decoder. The oracle recomputes the INJECTED truth
      // independently — fixed_md5 green means repair ∘ corrupt = id
      // on real corpus text
      val injected = translate(col("text"), "etqx", "é’“”")
      val corrupted = replace(replace(replace(replace(injected,
          lit("é"), lit("Ã©")), lit("’"), lit("â€™")),
          lit("“"), lit("â€œ")), lit("”"), lit("â€\u009d"))
      Tables.documentsWide(s, d).select(col("doc_id"), col("text"))
        .withColumn("bad", corrupted)
        .withColumn("fixed", graft.plans.FixMojibake.of(col("bad")))
        .select(col("doc_id"),
          length(col("bad")).cast("long").as("n_chars_bad"),
          length(col("fixed")).cast("long").as("n_chars_fixed"),
          md5(col("fixed")).as("fixed_md5"))
        .orderBy("doc_id")
    }),
    "q_link_graph" -> ((s, d) =>
      // outlink edge extraction + domain-graph rollup (the URL-frontier
      // / domain-PageRank feed): two synthetic anchors per page plus a
      // relative href (dropped — no registrable domain), href targets
      // pulled with ONE cached regex, shuffling domain PAIRS only
      Html.domainLinkGraph(
          Tables.documents(s, d).select(col("doc_id"))
            .withColumn("url", synthUrl(col("doc_id")))
            .withColumn("html", linkHtml(col("doc_id"))),
          "url", "html")
        .orderBy("src_domain", "dst_domain")),
    "q_anchor_text" -> ((s, d) =>
      // anchor-text rollup per TARGET domain (the off-page quality
      // prior): simple anchors extracted with one cached two-group
      // pattern; relative, markup-bodied, and empty anchors drop by
      // contract; top anchor = map-combinable struct-min, no window
      Html.domainAnchorText(
          Tables.documents(s, d).select(col("doc_id"), col("text"))
            .withColumn("url", synthUrl(col("doc_id")))
            .withColumn("html", anchorHtml(col("doc_id"), col("text"))),
          "url", "html")
        .orderBy("dst_domain")),
    "q_url_blocklist" -> ((s, d) => {
      // UT1-style domain blocklist screen: label-boundary suffix match
      // via bounded suffix explode + broadcast equi-join (the corpus
      // never shuffles against the list); most-specific entry wins;
      // rollup audits kept ('') vs blocked-by-entry counts
      import s.implicits._
      val blk = Seq("site3.com", "www.site3.com", "api.site7.io",
        "news.site1.org", "site5.co.uk", "nohit.example").toDF("entry")
      Domains.blocklistScreen(
          Tables.documents(s, d).select(col("doc_id"))
            .withColumn("host", Domains.hostOf(synthUrl(col("doc_id")))),
          "doc_id", "host", blk, "entry")
        .groupBy("blocked_by").agg(count(lit(1)).as("n_docs"))
        .orderBy("blocked_by")
    }),
    "q_pagerank_resume" -> ((s, d) => {
      // the daily-drop shape pinned exactly: 5 uniform-start rounds,
      // persisted, then 3 WARM-START rounds over the same edges — must
      // equal the 8-round recursion long-for-long, which is exactly
      // what the oracle replays (the identical unrolled SQL as
      // q_pagerank)
      val edges = Html.domainLinkGraph(
          Tables.documents(s, d).select(col("doc_id"))
            .withColumn("url", synthUrl(col("doc_id")))
            .withColumn("html", linkHtml(col("doc_id"))),
          "url", "html")
        .select(col("src_domain"), col("dst_domain"))
      val warm = Graph.pageRank(edges, "src_domain", "dst_domain", iters = 5)
      Graph.pageRankResume(edges, "src_domain", "dst_domain",
          warm, "node", "rank_fp", iters = 3)
        .select(col("node").as("domain"), col("rank_fp"))
        .orderBy(col("rank_fp").desc, col("domain"))
    }),
    "q_domain_tiered_cap" -> ((s, d) => {
      // the capstone of the domain family: PageRank authority over the
      // extracted link graph sets a PER-DOMAIN document budget
      // (high-authority domains keep 120, the rest 40, unranked 60),
      // enforced by the md5-deterministic cap — every stage replays
      // exactly in the oracle (fixed-point ranks, integer tiers,
      // md5-order keep sets)
      val pages = Tables.documents(s, d).select(col("doc_id"))
        .withColumn("url", synthUrl(col("doc_id")))
        .withColumn("html", linkHtml(col("doc_id")))
      val pr = Graph.pageRank(
        Html.domainLinkGraph(pages, "url", "html")
          .select(col("src_domain"), col("dst_domain")),
        "src_domain", "dst_domain", iters = 8)
      val caps = pr.select(col("node").as("cap_domain"),
        when(col("rank_fp") >= lit(1000000000L), lit(120))
          .otherwise(lit(40)).as("k"))
      Domains.domainCapTiered(
          Tables.documents(s, d).select(col("doc_id"))
            .withColumn("url", synthUrl(col("doc_id"))),
          "url", "doc_id", caps, "cap_domain", "k", defaultK = 60)
        .groupBy("domain")
        .agg(count(lit(1)).as("n_kept"))
        .join(caps.withColumnRenamed("cap_domain", "domain"), Seq("domain"), "left")
        .select(col("domain"), coalesce(col("k"), lit(60)).as("k_cap"),
          col("n_kept"))
        .orderBy("domain")
    }),
    "q_pagerank" -> ((s, d) =>
      // domain authority over the extracted link graph: fixed-point
      // PageRank (scaled longs, floor division, dangling mass dropped)
      // — 8 rounds, each shuffling only the rank table into the cached
      // src-partitioned edge layout; bit-exact cross-engine because no
      // float ever enters the recursion
      Graph.pageRank(
          Html.domainLinkGraph(
              Tables.documents(s, d).select(col("doc_id"))
                .withColumn("url", synthUrl(col("doc_id")))
                .withColumn("html", linkHtml(col("doc_id"))),
              "url", "html")
            .select(col("src_domain"), col("dst_domain")),
          "src_domain", "dst_domain", iters = 8)
        .select(col("node").as("domain"), col("rank_fp"))
        .orderBy(col("rank_fp").desc, col("domain"))),
    "q_dup_spans" -> ((s, d) =>
      // ExactSubstr-regime duplicated spans: winnowed k-gram
      // fingerprints (any shared verbatim span ≥ k+w−1 chars selects a
      // common fingerprint in both docs regardless of alignment),
      // candidates equi-joined on fingerprint, every candidate span
      // verified CHARACTER-EXACTLY at its recorded positions
      TextDedup.dupSpanPairs(
          Tables.documentsWide(s, d).select(col("doc_id"), col("text")),
          "text", "doc_id", k = 30, w = 10, maxDocFreq = 64)
        .orderBy("id_a", "id_b")),
    "q_dup_span_strip" -> ((s, d) =>
      // the ExactSubstr ACTION, keep-first: every verified anchor range
      // shared with a lower-id doc is removed from the higher-id copy —
      // each removed char is verbatim present in a surviving doc. The
      // strip is a per-char mask over the sorted span starts, identical
      // list algebra in both engines
      TextDedup.stripDupSpans(
          Tables.documentsWide(s, d).select(col("doc_id"), col("text")),
          "text", "doc_id", k = 30, w = 10, maxDocFreq = 64)
        .orderBy("doc_id")),
    "q_cross_spans" -> ((s, d) => {
      // incremental span screen: every 7th doc re-arrives under a new
      // id (the q_cross_dedup drop convention) and must be caught
      // verbatim against the existing corpus — drop×corpus only, the
      // corpus fingerprint frame passed as the persistable index
      // argument. Fully md5-portable, so unlike the xxhash minhash
      // screen the RAW screen is oracle-checkable end to end.
      val corpus = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val drop = corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(500000L)).as("doc_id"), col("text"))
      val cfps = TextDedup.winnowedFingerprints(corpus, "text", "doc_id",
        dedupeByFp = true)
      TextDedup.crossCorpusDupSpans(drop, corpus, cfps, "text", "doc_id",
          k = 30, w = 10, maxDocFreq = 64)
        .orderBy("new_id", "corpus_id")
    }),

    // ---- events / sessionization -------------------------------------
    "q_funnel" -> ((s, d) =>
      Funnel.anchored(Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowMs = 3600000L)
        .orderBy("step")),
    "q_transitions" -> ((s, d) =>
      Funnel.transitions(Tables.events(s, d), "user_id", "ts", "event_type",
        tieBreak = Seq(col("event_id")))
        .orderBy("from_type", "to_type")),
    "q_retention" -> ((s, d) =>
      Funnel.cohortRetention(Tables.events(s, d), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")),
    "q_events_hourly" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(
          to_date(col("ts")).as("event_date"),
          hour(col("ts")).as("hr"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Compat.exactSum(col("value"), 4).as("total_value"))
        .orderBy("event_date", "hr", "event_type")),
    "q_paths" -> ((s, d) => {
      // path analysis: the top event-type trigram journeys across
      // users, built from windowed leads over the chronological
      // per-user stream — no per-user buffers (the funnel discipline),
      // one user shuffle, partial-aggregated counts
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        // concat (not concat_ws): NULL event_type must propagate to a
        // NULL path exactly like the oracle's `||`, not be skipped
        .select(concat(col("event_type"), lit(">"),
            lead(col("event_type"), 1).over(w), lit(">"),
            lead(col("event_type"), 2).over(w)).as("path"),
          lead(col("event_type"), 2).over(w).as("_l2"))
        .filter(col("_l2").isNotNull)
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(10)
    }),
    "q_events_hopping" -> ((s, d) =>
      // Spark's native multi-assign hopping window (1 h length, 30 min
      // hop): each event lands in exactly TWO windows — smoothed rate
      // curves without a self-join. The oracle replays the assignment
      // as an explicit 2-way unnest over epoch arithmetic.
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          Compat.exactSum(col("value"), 4).as("total_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("total_value"))
        .orderBy("win_start", "event_type")),
    "q_events_sessions_native" -> ((s, d) =>
      // same gap sessions via Spark's native session_window operator
      // (boundary semantics differ from the lag form only at diff==gap,
      // and the fixture has zero exact-6h gaps — verified) — same oracle
      graft.streaming.EventStreams.sessionizeNative(Tables.events(s, d), "6 hours")
        .orderBy("user_id", "session_seq")),
    "q_events_sessions" -> ((s, d) =>
      graft.streaming.EventStreams.sessionizeBatch(Tables.events(s, d), gapMs = 6 * 3600 * 1000L,
        tieBreak = Seq(col("event_id")))
        .select(col("user_id"), col("session_seq"), col("session_start"), col("session_end"),
          col("n_events"),
          col("total_value"))
        .orderBy("user_id", "session_seq"))
  )

  /** The q_classifier_weighted "trained" table: 64 fixed-point (1e-6)
    * weights from a seeded generator — a stand-in with the exact
    * runtime shape of a trained row. ONE definition feeds both the
    * Spark query (as the native fold's reference object) and the
    * DuckDB oracle (as a list literal), so the engines can only agree
    * by computing the same dot product.
    */
  private[graft] lazy val trainedDemoWeights: Array[Long] = {
    val rnd = new scala.util.Random(7L)
    Array.fill(64)((rnd.nextInt(2000001) - 1000000).toLong)
  }

  /** Deterministic synthetic URL for a document id — the corpus tables
    * carry no URL column, so the URL-curation queries derive one from
    * md5(doc_id) nibbles. Choices are independent per component, so the
    * canonicalizer meets every rule combination: mixed-case schemes,
    * mismatched default ports (`:443` under http survives, under https
    * drops), unsorted/duplicate/trailing-`&` query params, fragments,
    * trailing path slashes, and multi-part public suffixes. 12 sites ×
    * 5 TLDs → 60 registrable domains, so the per-domain cap is active
    * at every SF. Replayed bit-identically by [[urlDomainCtes]].
    */
  /** Probe hook: q_url_canon's input frame (documents + synthetic URL)
    * — UrlSortProbe A/Bs param-sort variants over the identical tree.
    */
  def docsWithSynthUrl(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"))
      .withColumn("url", synthUrl(col("doc_id")))

  /** Probe hook: q_html_extract's input frame (documents + synthesized
    * page) — HtmlProbe A/Bs the native extractor against the chain.
    */
  def docsWithSynthHtml(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .select(col("doc_id"), synthHtml(col("doc_id"), col("text")).as("html"))

  private def synthUrl(id: Column): Column = {
    val h = md5(id.cast("string"))
    def nib(i: Int): Column = conv(substring(h, i, 1), 16, 10).cast("int")
    def pick(i: Int, xs: String*): Column =
      element_at(array(xs.map(lit(_)): _*), nib(i) % xs.size + 1)
    concat(
      pick(1, "http", "HTTPS", "Http", "https"), lit("://"),
      pick(2, "", "www.", "News.", "api."),
      lit("site"), pmod(conv(substring(h, 3, 2), 16, 10).cast("int"), lit(12)),
      lit("."),
      pick(5, "com", "org", "co.uk", "io", "ac.jp"),
      pick(6, "", ":80", ":8080", ":443"),
      pick(7, "", "/", "/a/b", "/a/b/", "/Index"),
      pick(8, "", "?b=2&a=1", "?a=1", "?z=9&y=8&z=1&"),
      pick(9, "", "#Frag"))
  }

  /** Deterministic HTML page around a document — title/style/script/
    * comment/h1 chrome, the text split into `<p>` paragraphs every five
    * words, and an entity-bearing trailer. Plain concatenation +
    * one fixed regex, replayed verbatim by the q_html_extract oracle.
    */
  private def synthHtml(id: Column, text: Column): Column = concat(
    lit("<!DOCTYPE html><html><head><title>Doc "), id,
    lit("</title><style type=\"text/css\">body { margin: 0; }</style>"),
    lit("<script>if (a < b && c > d) { x = \"y\"; }</script></head>"),
    lit("<body><!-- id "), id, lit(" --><h1>Doc "), id,
    lit("</h1><div class=\"main\"><p>"),
    regexp_replace(text, "(\\S+ \\S+ \\S+ \\S+ \\S+) ", "$1</p><p>"),
    lit("</p><p>&quot;x&quot; &lt;tag&gt; &amp;co&nbsp;end</p></div>"),
    lit("<br><ul><li>a</li><li>b</li></ul></body></html>"))

  /** Two deterministic outlinks per page (case-mixed host, mixed TLD
    * sets including multi-part suffixes) plus a relative href that must
    * drop out (no registrable domain). Pure integer arithmetic on
    * doc_id — replayed verbatim by the q_link_graph oracle.
    */
  private def linkHtml(id: Column): Column = {
    val t1 = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("io"), lit("ac.jp")),
      (pmod(id * 13 + 5, lit(5)) + 1).cast("int"))
    val t2 = element_at(
      array(lit("com"), lit("net"), lit("org.uk"), lit("io"), lit("ne.jp")),
      (pmod(id * 3 + 2, lit(5)) + 1).cast("int"))
    concat(
      lit("<p><a href=\"https://WWW.Site"), pmod(id * 7 + 3, lit(12)),
      lit("."), t1,
      lit("/a\">x</a> <a href=\"http://media.site"), pmod(id * 11 + 1, lit(12)),
      lit("."), t2,
      lit("\">y</a> <a href=\"/local\">r</a></p>"))
  }

  /** Deterministic anchor-bearing HTML per document: a text-derived
    * anchor (markup chars stripped so the page stays well-formed), a
    * rotating "Doc k" anchor, plus the three edge cases the extractor
    * must drop — a relative href, a markup-bodied anchor, an empty
    * anchor. Pure integer arithmetic + substr/translate, replayed
    * verbatim by the q_anchor_text oracle.
    */
  private def anchorHtml(id: Column, text: Column): Column = {
    val clean = substring(translate(text, "<>\"&", ""), 1, 24)
    val t1 = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("io"), lit("ac.jp")),
      (pmod(id * 9 + 4, lit(5)) + 1).cast("int"))
    val t2 = element_at(
      array(lit("com"), lit("net"), lit("org.uk"), lit("io"), lit("ne.jp")),
      (pmod(id * 5 + 3, lit(5)) + 1).cast("int"))
    concat(
      lit("<p><a href=\"https://www.site"), pmod(id * 5 + 2, lit(12)),
      lit("."), t1, lit("/p\">"), clean, lit("</a> "),
      lit("<a class=\"m\" href=\"http://blog.site"), pmod(id * 7 + 4, lit(12)),
      lit("."), t2, lit("\">Doc "), pmod(id, lit(7)), lit("</a> "),
      lit("<a href=\"/rel\">skip me</a>"),
      lit("<a href=\"https://x.site0.com\"><b>bold</b></a>"),
      lit("<a href=\"https://ads.site9.com/z\"></a></p>"))
  }


  /** DuckDB oracles for every `queries` entry, split per domain:
    * [[OracleSqlText]] (corpus/web/semantic/quality replays) and
    * [[OracleSqlCore]] (relational, dedup clusters, events,
    * multimodal), with the shared SQL CTE builders in [[OracleCtes]].
    * The SQL half IS the correctness apparatus and had grown this
    * file past 5k lines — the split is pure layout, zero semantics.
    */
  def oracleSql: Map[String, String] = OracleSqlText.sql ++ OracleSqlCore.sql
}
