package graft

import graft.functions.{Compat, TextFunctions}
import graft.operators._
import graft.pipelines.Reconciliation
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
      Tables.events(s, d).select(
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
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      val sup = Tables.supplier(s, d)
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
      val byPrice = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      val stable = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        rank().over(byPrice).as("rnk"),
        dense_rank().over(byPrice).as("drnk"),
        ntile(4).over(stable).as("quartile"))
        .filter(col("rnk") <= 20)
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
      Tables.lineitem(s, d).groupBy("l_returnflag")
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
      // corpus-sized pass, then vocab-sized iterative aggregation with a
      // 1-row argmax per step. Deterministic: ties break (lhs, rhs)
      // lexicographically; the DuckDB oracle replays the identical
      // algorithm as chained CTEs.
      graft.operators.BpeTrain.learnMerges(Tables.documents(s, d), "text", 8)),
    "q_bpe_encode" -> ((s, d) => {
      // the ENCODE half: tokenize with the table just learned — train 8
      // rules, apply them in rank order to the distinct words (the
      // vocab-sized application encodeDocs builds on), emit the top-50
      // words by corpus frequency with their '|'-joined token runs
      val docs = Tables.documents(s, d)
      val merges = graft.operators.BpeTrain.learnMerges(docs, "text", 8)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
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
      Tables.documents(s, d).select(
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
      TextQuality.repetitionReport(Tables.documents(s, d), "text", "doc_id", n = 2)
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
      TextDedup.jaccardPairs(Tables.documents(s, d), "text", "doc_id", n = 3, threshold = 0.8)
        .orderBy("doc_a", "doc_b")),
    "q_contamination" -> ((s, d) => {
      // synthetic eval set = every 50th doc; the screen flags their
      // near-dup leaks in the remaining corpus
      val docs = Tables.documents(s, d)
      TextDedup.contaminationReport(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "text", "doc_id", n = 4)
        .orderBy("doc_id")
    }),
    "q_dedup_clusters" -> ((s, d) => {
      // transitive closure of the exact near-dup pairs → one canonical
      // doc per cluster (the keep-one step of a curation pipeline)
      val docs = Tables.documents(s, d)
      Graph.dedupClusters(docs, "doc_id",
        TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8),
        "doc_a", "doc_b")
        .orderBy("doc_id")
    }),
    "q_dedup_clusters_sampled" -> ((s, d) => {
      // the sf10 gate form of q_dedup_clusters: the exact quadratic
      // pair stage runs only on the md5 quarter-sample (the full-exact
      // form is the measured JIT-band swinger at 100×); full-corpus CC
      // at scale stays exercised by the gate's q_curate_lsh_md5, whose
      // pair stage is the banded production path
      val docs = Tables.documents(s, d)
        .filter(TextFunctions.md5SampleFilter(col("doc_id"), 0.25))
      Graph.dedupClusters(docs, "doc_id",
        TextDedup.jaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.8),
        "doc_a", "doc_b")
        .orderBy("doc_id")
    }),
    "q_cluster_rollup" -> ((s, d) => {
      // evidence-preserving dedup: each near-dup cluster keeps ONE doc
      // but the rollup attaches the whole cluster's signals to it —
      // total chars, source diversity, member list
      val docs = Tables.documents(s, d)
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
      val docs = Tables.documents(s, d)
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
      val docs = Tables.documents(s, d)
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
    "q_subset_dup" -> ((s, d) =>
      TextDedup.containmentPairs(Tables.documents(s, d), "text", "doc_id",
        n = 3, threshold = 0.8)
        .orderBy("doc_a", "doc_b")),
    "q_cluster_stats" -> ((s, d) => {
      // dedup observability: how big do near-dup clusters get (the
      // distribution that decides whether a hot cluster needs attention)
      val docs = Tables.documents(s, d)
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
      val docs = Tables.documents(s, d)
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
      val docs = Tables.documents(s, d)
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
      val corpus = Tables.documents(s, d)
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
      val corpus = Tables.documents(s, d)
      val drop = corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(500000L)).as("doc_id"), col("text"))
      TextDedup.crossCorpusNearDupsPortable(drop, corpus, "text", "doc_id")
        .orderBy("new_id", "corpus_id")
    }),
    "q_minhash_pairs" -> ((s, d) =>
      // the xxhash64 fast path's pair set is engine-specific, so the
      // query emits its QUALITY verdict against exact-Jaccard ground
      // truth: truth-set size (exact, engine-reproducible) + recall/
      // precision ≥ 0.9 booleans (measured 1.0/1.0 at both test SFs —
      // the fixture's near-dups sit far from the 0.5 boundary). The
      // raw-pairs surface stays oracled via q_minhash_pairs_md5.
      TextDedup.minhashVsExactReport(Tables.documents(s, d), "text", "doc_id",
        n = 3, k = 32, bands = 8, threshold = 0.5,
        minRecall = 0.9, minPrecision = 0.9)),
    "q_minhash_pairs_sampled" -> ((s, d) =>
      // the 100 TB form of the q_minhash_pairs verdict: exact-Jaccard
      // truth on a deterministic md5 quarter-sample (pair population
      // 1/16th), fast-path LSH still over the WHOLE corpus, confusion
      // matrix on the sampled subpopulation (unbiased per-pair — see
      // minhashVsExactSampledReport). This is the sf10 gate's query;
      // the full-exact q_minhash_pairs stays on the oracle gates.
      TextDedup.minhashVsExactSampledReport(Tables.documents(s, d), "text", "doc_id",
        n = 3, k = 32, bands = 8, threshold = 0.5,
        minRecall = 0.9, minPrecision = 0.9, sampleFrac = 0.25)),
    "q_minhash_pairs_md5" -> ((s, d) =>
      // the engine-portable LSH twin: md5 hash family, every stage
      // (shingle → signature minima → banding → verify) DuckDB-oracled
      TextDedup.minhashLshPairsPortable(Tables.documents(s, d), "text", "doc_id",
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
      TextDedup.simhashPairsPortable(Tables.documents(s, d), "text", "doc_id",
        maxHamming = 3)
        .orderBy("doc_a", "doc_b")),
    "q_lsh_recall" -> ((s, d) =>
      // the measurement run before trusting banded LSH corpus-wide:
      // recall/precision of the md5 LSH screen vs exact-Jaccard truth
      // at the same 0.8 threshold — both pipelines and the confusion
      // counts oracle-checked end to end
      TextDedup.lshRecallReport(Tables.documents(s, d), "text", "doc_id",
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
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),
    "q_ann_quantized" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.quantizedTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf" -> ((s, d) => {
      // deterministic modulo-sampled centroids (production would pass a
      // fitCentroids k-means|| fit — engine-specific seeding — but this
      // probe is fully replayable: DuckDB re-derives the same centroid
      // set, assignment argmax, and nprobe=4 probe list bit-exactly)
      val e = Tables.embeddings(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
        e.filter(col("vec_id") % 25 === 0), "vec_id", "embedding", k = 5, nprobe = 4)
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
      val e = Tables.embeddings(s, d)
      val cents = e.filter(col("vec_id") % 25 === 0)
      val assigned = Similarity.assignToCentroids(e, cents, "vec_id", "embedding")
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
      val e = Tables.embeddings(s, d)
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
      val e = Tables.embeddings(s, d)
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
      val e = Tables.embeddings(s, d)
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
    "q_ivf_cells" -> ((s, d) =>
      // the occupancy report itself, oracled: top-20 IVF cells by
      // vector count — the skew observability a 100 TB probe needs
      // BEFORE paying Σ|cell| in exact dots (see ivfCellReport scaladoc)
      Similarity.ivfCellReport(
        Similarity.assignToCentroids(Tables.embeddings(s, d),
          Tables.embeddings(s, d).filter(col("vec_id") % 25 === 0),
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
      val ids = Tables.documents(s, d)
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
      val ids = Tables.documents(s, d)
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
          Multimodal.syntheticImages(s, Tables.documents(s, d), "doc_id"), "id")
        .select(col("id").as("doc_id"), col("phash"))
        .orderBy("doc_id")),
    "q_image_frames" -> ((s, d) =>
      // full pixel-decode oracle: deterministic solid/gradient PNGs per
      // doc, decoded with ImageIO; exact channel means + integer-luma
      // histogram recomputed closed-form in SQL over the pixel grid
      Multimodal.imageFrameFeatures(s,
        Multimodal.syntheticImages(s, Tables.documents(s, d), "doc_id"), "id", 1)
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
        Multimodal.syntheticImages(s, Tables.documents(s, d), "doc_id"),
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
      val ids = Tables.documents(s, d)
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
      val ids = Tables.documents(s, d)
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
      // windows anchored at every 199th order
      val ords = Tables.orders(s, d)
      val pts = ords.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("point_id"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
      val ivs = ords.filter(col("o_orderkey") % 199 === 0)
        .select(col("o_orderkey").as("interval_id"),
          datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("start_day"))
        .withColumn("end_day", col("start_day") + 30)
      Joins.rangeJoin(pts, ivs, "day", "start_day", "end_day", grid = 32)
        .select("point_id", "interval_id", "day")
        .orderBy("point_id", "interval_id")
    }),
    "q_interval_join" -> ((s, d) => {
      // overlapping 21- and 30-day windows from two order strata — the
      // interval×interval companion to q_range_join, same grid plan
      val ords = Tables.orders(s, d)
      def days(c: Column) = datediff(c, lit("1970-01-01")).cast("long")
      val a = ords.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("a_id"), days(col("o_orderdate")).as("a_start"))
        .withColumn("a_end", col("a_start") + 21)
      val b = ords.filter(col("o_orderkey") % 199 === 0)
        .select(col("o_orderkey").as("b_id"), days(col("o_orderdate")).as("b_start"))
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
      graft.pipelines.CorpusCuration.curate(Tables.documents(s, d), "text", "doc_id")
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
        Tables.documents(s, d), "text", "doc_id")),
    "q_curate_lsh_sampled" -> ((s, d) =>
      // the 100 TB form of the q_curate_lsh verdict: BOTH curation
      // paths over a deterministic md5 quarter-sample (kept sets are
      // whole-corpus-clustering-dependent, so the sound sampled
      // comparison runs both paths on the same subcorpus — see
      // curateAgreementSampledReport). The sf10 gate runs this plus
      // q_curate_lsh_md5 (full-corpus portable fast path); the
      // full-exact q_curate_lsh stays on the oracle gates.
      graft.pipelines.CorpusCuration.curateAgreementSampledReport(
        Tables.documents(s, d), "text", "doc_id", sampleFrac = 0.25)),
    "q_curate_lsh_md5" -> ((s, d) =>
      // the SAME 100 TB curation composition with the portable LSH pair
      // stage — every phase (LSH pairs → transitive closure →
      // repetition gates) reproduced in the DuckDB oracle
      graft.pipelines.CorpusCuration.curateAtScalePortable(
          Tables.documents(s, d), "text", "doc_id")
        .orderBy("doc_id")),
    "q_curate_fast" -> ((s, d) =>
      // the PRODUCTION fast path in ISOLATION: xxhash64 MinHash+LSH
      // pairs → CC → gates, with NO verification twin attached.
      // q_curate_lsh runs BOTH this and the exact path by construction
      // (it is a bounded-error verdict), so its bench time is the
      // verification cost, not the scale path's — this entry is the
      // number a capacity plan should read. No oracle: the xxhash64
      // kept set is engine-specific (driver records rows>0); its
      // correctness rides on q_curate_lsh's ≤1%-disagreement verdict
      // and the oracled portable twin q_curate_lsh_md5.
      graft.pipelines.CorpusCuration.curateAtScale(
          Tables.documents(s, d), "text", "doc_id")
        .orderBy("doc_id")),

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
      val docs = Tables.documents(s, d)
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
      val docs = Tables.documents(s, d)
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
      val docs = Tables.documents(s, d)
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
      val docs = Tables.documents(s, d)
      val fx = TextQuality.dsirFitFx(docs, col("doc_id") % 13 === 0, "text")
      TextQuality.dsirWeights(docs, "text", "doc_id", fx).orderBy("doc_id")
    }),
    "q_dsir_sample" -> ((s, d) => {
      // the resampling half: deterministic Gumbel-top-k on logw —
      // sampling k docs ∝ exp(logw) without replacement. The Gumbel
      // uniform is a 60-bit md5 prefix over a power-of-two divide
      // (exact in both engines); the key orders membership only, output
      // values are the exact integers/division from q_dsir_weights
      val docs = Tables.documents(s, d)
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
    "q_cosine_pairs" -> ((s, d) =>
      // exact embedding near-dup oracle path (quadratic, like
      // q_jaccard_pairs); the scale path is lshNearDupPairs
      Similarity.cosinePairsExact(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")),
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
      // 14-bit tables: random-pair collision ~4/2¹⁴ (≈0.3M candidates on
      // 50k vectors, not 5M at 10 bits); per-table planted-pair recall
      // 0.9856¹⁴ = 0.87 → miss-all-4 ≈ 3·10⁻⁴
      Similarity.lshNearDupPairs(base.unionByName(dups), "vec_id", "embedding",
        threshold = 0.9, nbits = 14, tables = 4)
        .select(col("id_a"), col("id_b"), col("sim"))
        .orderBy("id_a", "id_b")
    }),
    "q_embed_recall" -> ((s, d) => {
      // the embedding-side analogue of q_lsh_recall: recall/precision of
      // the multi-table hyperplane LSH screen vs exact-cosine truth on
      // the planted corpus, same threshold. The LSH path verifies with
      // the exact dot, so precision must be 1.0 — the report PROVES it
      // rather than assuming it; recall measures the banding miss rate.
      val base = Tables.embeddings(s, d).select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val dups = base.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + lit(0.02) *
              ((col("vec_id") + i) % 5 - 2).cast("double"))).as("embedding"))
      val all = base.unionByName(dups)
      val exact = Similarity.cosinePairsExact(all, "vec_id", "embedding", 0.9)
        .select(col("id_a"), col("id_b"), lit(1).as("_e"))
      val lsh = Similarity.lshNearDupPairs(all, "vec_id", "embedding",
          threshold = 0.9, nbits = 14, tables = 4)
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
      val corpus = Tables.embeddings(s, d).select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val cents = Similarity.hashSeedCentroids(corpus, "vec_id", "embedding",
        k = 8, seed = 7L)
      val idx = Similarity.assignToCentroids(corpus, cents, "vec_id", "embedding")
      val drop = corpus.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            x * (lit(1.0) + lit(0.02) *
              ((col("vec_id") + i) % 5 - 2).cast("double"))).as("embedding"))
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
      val cents = Similarity.hashSeedCentroids(all, "vec_id", "embedding",
        k = 8, seed = 7L)
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
          Tables.documents(s, d).select(col("doc_id"), col("text"))
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
          Tables.documents(s, d).select(col("doc_id"), col("text"))
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
      Tables.documents(s, d).select(col("doc_id"), col("text"))
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
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "text", "doc_id", k = 30, w = 10, maxDocFreq = 64)
        .orderBy("id_a", "id_b")),
    "q_dup_span_strip" -> ((s, d) =>
      // the ExactSubstr ACTION, keep-first: every verified anchor range
      // shared with a lower-id doc is removed from the higher-id copy —
      // each removed char is verbatim present in a surviving doc. The
      // strip is a per-char mask over the sorted span starts, identical
      // list algebra in both engines
      TextDedup.stripDupSpans(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
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

  /** The full curation composition: cluster dedup (recursive
    * reachability over exact-Jaccard pairs) + repetition gates,
    * assembled from the q_dedup_clusters and q_repetition oracle
    * pieces. Shared between q_curate_full (row-for-row) and
    * q_curate_lsh (kept count inside its agreement verdict).
    */
  /** The md5-sampled documents subquery both sampled-verdict oracles
    * read from — the exact SQL twin of
    * `TextFunctions.md5SampleFilter(col("doc_id"), 0.25)`.
    */
  private def sampledDocsSrc(rate: Double): String =
    s"(SELECT doc_id, text FROM documents WHERE md5(CAST(doc_id AS VARCHAR)) < '${graft.functions.TextFunctions.md5SampleThreshold(rate)}')"

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

  /** DuckDB replay of [[TextQuality.dsirFitFx]] + [[TextQuality.dsirWeights]]:
    * refits the 4096-bucket add-0.5-smoothed log-ratio table from the
    * same `doc_id % 13` target split (same md5-leading-8-hex buckets as
    * the classifier oracles), quantizes with the same HALF_UP
    * `round(lr·1e6)`, and scores by join+SUM where Spark runs the
    * native zero-shuffle fold — the engines can only agree by landing
    * on identical fixed-point tables AND identical integer sums. Ends
    * in `sc(doc_id, n_feats, w_sum, logw)`.
    */
  private lazy val dsirCtes: String =
    """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
      |f AS (SELECT doc_id, ws || [ws[i]||'_'||ws[i+1] for i in range(1, len(ws))] AS fs FROM t),
      |e AS (SELECT doc_id, unnest(fs) AS feat FROM f),
      |b AS (SELECT doc_id, ('0x' || substr(md5(feat), 1, 8))::BIGINT % 4096 AS bkt FROM e),
      |cnt AS (SELECT bkt,
      |   SUM(CASE WHEN doc_id % 13 = 0 THEN 1 ELSE 0 END) AS ct,
      |   SUM(CASE WHEN doc_id % 13 <> 0 THEN 1 ELSE 0 END) AS cr
      |  FROM b GROUP BY bkt),
      |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt),
      |tab AS (SELECT bkt,
      |   CAST(round((ln((ct + 0.5)/(tt + 0.5*4096)) - ln((cr + 0.5)/(tr + 0.5*4096)))*1000000.0) AS BIGINT) AS fx
      |  FROM cnt, tot),
      |w AS (SELECT b.doc_id, SUM(tab.fx) AS w_sum FROM b JOIN tab USING (bkt) GROUP BY b.doc_id),
      |sc AS (SELECT f.doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
      |   CAST(coalesce(w.w_sum, 0) AS BIGINT) AS w_sum,
      |   CASE WHEN len(fs) > 0 THEN CAST(coalesce(w.w_sum, 0) AS DOUBLE)/1000000.0 END AS logw
      |  FROM f LEFT JOIN w USING (doc_id))""".stripMargin

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

  /** DuckDB replay of [[synthUrl]] + [[Domains.urlCanonicalize]] +
    * [[Domains.registeredDomain]]: a WITH prefix ending in
    * `dom(doc_id, url, url_canon, host, domain)`. The suffix list is
    * the verbatim [[Domains.multiPartSuffixes]] snapshot.
    */
  /** [[Domains.multiPartSuffixes]] as a DuckDB list literal — shared by
    * every oracle that replays [[Domains.registeredDomain]].
    */
  private lazy val suffixListSql: String =
    Domains.multiPartSuffixes.map("'" + _ + "'").mkString("[", ",", "]")

  private lazy val urlDomainCtes: String = {
    val suffixes = suffixListSql
    s"""WITH hx AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
      |u AS (SELECT doc_id,
      |  ['http','HTTPS','Http','https'][(('0x'||substr(h,1,1))::BIGINT % 4)+1] || '://' ||
      |  ['','www.','News.','api.'][(('0x'||substr(h,2,1))::BIGINT % 4)+1] ||
      |  'site' || CAST(('0x'||substr(h,3,2))::BIGINT % 12 AS VARCHAR) || '.' ||
      |  ['com','org','co.uk','io','ac.jp'][(('0x'||substr(h,5,1))::BIGINT % 5)+1] ||
      |  ['',':80',':8080',':443'][(('0x'||substr(h,6,1))::BIGINT % 4)+1] ||
      |  ['','/','/a/b','/a/b/','/Index'][(('0x'||substr(h,7,1))::BIGINT % 5)+1] ||
      |  ['','?b=2&a=1','?a=1','?z=9&y=8&z=1&'][(('0x'||substr(h,8,1))::BIGINT % 4)+1] ||
      |  ['','#Frag'][(('0x'||substr(h,9,1))::BIGINT % 2)+1] AS url
      | FROM hx),
      |c1 AS (SELECT doc_id, url, regexp_replace(trim(url), '#.*$$', '') AS nf FROM u),
      |c2 AS (SELECT *, lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
      |        regexp_replace(nf, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest FROM c1),
      |c3 AS (SELECT *, lower(regexp_replace(regexp_extract(rest, '^([^/?]*)', 1), '^[^@/]*@', '')) AS auth FROM c2),
      |c4 AS (SELECT *, regexp_extract(auth, ':([0-9]+)$$', 1) AS port,
      |        regexp_replace(auth, ':[0-9]+$$', '') AS host FROM c3),
      |c5 AS (SELECT *, CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
      |                        OR (scheme = 'https' AND port = '443') THEN ''
      |                 ELSE ':' || port END AS portpart,
      |        regexp_replace(rest, '^[^/?]*', '') AS pathq FROM c4),
      |c6 AS (SELECT *, regexp_extract(pathq, '^([^?]*)', 1) AS rawpath,
      |        CASE WHEN contains(pathq, '?') THEN regexp_replace(pathq, '^[^?]*\\?', '') ELSE '' END AS qry FROM c5),
      |c7 AS (SELECT *, CASE WHEN regexp_replace(rawpath, '/+$$', '') = '' THEN '/'
      |                 ELSE regexp_replace(rawpath, '/+$$', '') END AS pth,
      |        coalesce(array_to_string(list_sort(list_filter(string_split(qry, '&'), x -> x <> '')), '&'), '') AS params FROM c6),
      |canon AS (SELECT doc_id, url, host,
      |   CASE WHEN scheme = '' THEN lower(nf)
      |        ELSE scheme || '://' || host || portpart || pth ||
      |             CASE WHEN params = '' THEN '' ELSE '?' || params END END AS url_canon
      | FROM c7),
      |d1 AS (SELECT *, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n FROM canon),
      |dom AS (SELECT doc_id, url, url_canon, host,
      |   CASE WHEN n <= 2 THEN host
      |        WHEN list_contains($suffixes, ls[n-1] || '.' || ls[n])
      |          THEN ls[n-2] || '.' || ls[n-1] || '.' || ls[n]
      |        ELSE ls[n-1] || '.' || ls[n] END AS domain
      | FROM d1)""".stripMargin
  }

  /** The q_cdc_dedup planted suffix, shared verbatim by the Spark query
    * (as a lit) and the oracle (as a SQL literal — no quotes in the
    * content by construction).
    */
  private lazy val cdcPromoSql: String = (1 to 9).map(k =>
    s" CDCPROMO section $k rights reserved contact admin example com item $k end").mkString

  /** [[urlDomainCtes]] extended with the outlink replay: [[linkHtml]]
    * rebuilt arithmetically, hrefs re-extracted with the same regex,
    * hostOf + registeredDomain replayed per target. Ends in
    * `dstd(doc_id, dst_domain)` (relative links → domain ''); `dom`
    * from the prefix carries the src side. Shared by the q_link_graph
    * and q_pagerank oracles.
    */
  private lazy val linkGraphCtes: String =
    s"""$urlDomainCtes,
      |lh AS (SELECT doc_id,
      |  '<p><a href="https://WWW.Site' || CAST((doc_id*7+3)%12 AS VARCHAR) || '.' ||
      |   ['com','org','co.uk','io','ac.jp'][CAST((doc_id*13+5)%5 AS INT)+1] ||
      |  '/a">x</a> <a href="http://media.site' || CAST((doc_id*11+1)%12 AS VARCHAR) || '.' ||
      |   ['com','net','org.uk','io','ne.jp'][CAST((doc_id*3+2)%5 AS INT)+1] ||
      |  '">y</a> <a href="/local">r</a></p>' AS html FROM documents),
      |lk AS (SELECT doc_id, unnest(regexp_extract_all(html, 'href="([^"]*)"', 1)) AS href FROM lh),
      |dh AS (SELECT doc_id, lower(regexp_replace(regexp_extract(regexp_replace(
      |    regexp_replace(trim(href), '#.*$$', ''),
      |    '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^([^/?]*)', 1), '^[^@/]*@', '')) AS auth FROM lk),
      |dh2 AS (SELECT doc_id, regexp_replace(auth, ':[0-9]+$$', '') AS host FROM dh),
      |dd AS (SELECT doc_id, host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n FROM dh2),
      |dstd AS (SELECT doc_id,
      |   CASE WHEN n <= 2 THEN host
      |        WHEN list_contains($suffixListSql, ls[n-1] || '.' || ls[n]) THEN ls[n-2] || '.' || ls[n-1] || '.' || ls[n]
      |        ELSE ls[n-1] || '.' || ls[n] END AS dst_domain FROM dd)""".stripMargin

  /** The full q_pagerank/q_pagerank_resume oracle: distinct domain
    * edges from the link-graph CTEs, then the 8-round unrolled
    * recursion. The resume query shares it verbatim — warm start over
    * unchanged edges IS the continued recursion.
    */
  private lazy val pageRankOracleSql: String =
    s"""$linkGraphCtes,
      |edges AS (SELECT DISTINCT d.domain AS src, t.dst_domain AS dst
      |  FROM dom d JOIN dstd t USING (doc_id) WHERE t.dst_domain <> ''),
      |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      |outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
      |prr0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
      |$pageRankIterSql
      |SELECT node AS domain, r AS rank_fp FROM prr8
      |ORDER BY rank_fp DESC, domain""".stripMargin

  /** The q_pagerank oracle's 8 unrolled fixed-point iterations (CTEs
    * prc1/prr1 … prc8/prr8 over `edges`/`nodes`/`outd`/`r0`) — the same
    * recursion [[graft.operators.Graph.pageRank]] runs, scale 10⁹,
    * teleport 150000000 = 0.15·scale.
    */
  private lazy val pageRankIterSql: String = (1 to 8).map { i =>
    s"""prc$i AS (SELECT e.dst AS node, sum((r.r * 85) // (100 * o.od)) AS c
       |  FROM edges e JOIN prr${i - 1} r ON r.node = e.src
       |  JOIN outd o ON o.src = e.src GROUP BY e.dst),
       |prr$i AS (SELECT n.node, CAST(150000000 + COALESCE(c.c, 0) AS BIGINT) AS r
       |  FROM nodes n LEFT JOIN prc$i c USING (node))""".stripMargin
  }.mkString(",\n")

  /** [[urlDomainCtes]] extended with the classifier replay and the
    * per-domain ADDITIVE aggregate `agg(domain, n_docs, n_scored,
    * n_keep, score_sum)` — shared by the q_domain_quality /
    * q_domain_refresh / q_domain_sample oracles.
    */
  private lazy val domainAggCtes: String =
    s"""$urlDomainCtes,
      |t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
      |f AS (SELECT doc_id, ws || [ws[i]||'_'||ws[i+1] for i in range(1, len(ws))] AS fs FROM t),
      |sc AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
      |  CAST(coalesce(list_aggregate(list_transform(fs,
      |    x -> (('0x' || substr(md5(x), 1, 8))::BIGINT % 4096) % 2001 - 1000), 'sum'), 0) AS BIGINT) AS w_sum
      | FROM f),
      |scored AS (SELECT doc_id,
      |  CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000.0) END AS score
      | FROM sc),
      |agg AS (SELECT d.domain,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(s.score) AS BIGINT) AS n_scored,
      |  CAST(coalesce(sum(CASE WHEN s.score > 0.0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_keep,
      |  CAST(sum(CAST(round(s.score, 9) AS DECIMAL(38,9))) AS DOUBLE) AS score_sum
      | FROM dom d JOIN scored s ON d.doc_id = s.doc_id GROUP BY d.domain)""".stripMargin

  private lazy val domainQualitySql: String =
    s"""$domainAggCtes
      |SELECT domain, n_docs, n_scored, n_keep,
      |  CAST(n_keep AS DOUBLE)/n_docs AS keep_rate,
      |  CASE WHEN n_scored > 0 THEN score_sum/n_scored END AS mean_score
      |FROM agg ORDER BY domain""".stripMargin

  private def curateFullSqlOver(src: String): String =
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM $src),
      |sh AS (SELECT doc_id, unnest(list_distinct([ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
      | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id<b.doc_id GROUP BY 1, 2),
      |prs AS (SELECT doc_a, doc_b FROM cand
      | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
      | WHERE CAST(common AS DOUBLE)/(sa.sz+sb.sz-common) >= 0.8),
      |edges AS (SELECT doc_a AS u, doc_b AS v FROM prs UNION SELECT doc_b, doc_a FROM prs),
      |reach(node, comp) AS (SELECT u, u FROM edges
      | UNION SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v=r.node),
      |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
      |grams AS (SELECT doc_id, unnest([ws[i]||'_'||ws[i+1] for i in range(1, len(ws))]) AS gram FROM w),
      |gcnt AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
      |tp AS (SELECT doc_id, max(cnt) AS topcnt, sum(cnt) AS total FROM gcnt GROUP BY doc_id),
      |rep AS (SELECT w.doc_id,
      |  CAST(len(ws) AS BIGINT) AS n_tokens,
      |  CAST(len(ws)-len(list_distinct(ws)) AS DOUBLE)/greatest(len(ws), 1) AS dup_token_frac,
      |  COALESCE(CAST(t.topcnt AS DOUBLE)/t.total, 0.0) AS top_ngram_frac
      | FROM w LEFT JOIN tp t USING (doc_id))
      |SELECT r.doc_id, r.n_tokens, r.dup_token_frac, r.top_ngram_frac
      |FROM rep r LEFT JOIN comps c ON r.doc_id = c.node
      |WHERE COALESCE(c.comp, r.doc_id) = r.doc_id
      | AND r.n_tokens >= 25 AND r.dup_token_frac <= 0.65 AND r.top_ngram_frac <= 0.15
      |ORDER BY doc_id""".stripMargin

  private val curateFullSql: String = curateFullSqlOver("documents")

  /** q_curate_full's CC + repetition-gate oracle with the pair stage
    * swapped for the portable-LSH CTEs of q_minhash_pairs_md5 —
    * est_jaccard >= 0.8 means >= 13 of 16 positions agree. Shared
    * between q_curate_lsh_md5 (row-for-row) and q_curate_lsh (kept
    * count inside its agreement verdict).
    */
  private val curateLshMd5Sql: String =
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct([ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
       |ab AS (SELECT doc_id,
       |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
       |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
       |sig AS (SELECT doc_id,
       |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
       | FROM ab GROUP BY doc_id),
       |bd AS (SELECT doc_id, sig, band,
       |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
       | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  a.sig AS sig_a, b.sig AS sig_b
       | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
       |  AND a.doc_id < b.doc_id),
       |prs AS (SELECT doc_a, doc_b FROM cand
       | WHERE CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 >= 0.8),
       |edges AS (SELECT doc_a AS u, doc_b AS v FROM prs UNION SELECT doc_b, doc_a FROM prs),
       |reach(node, comp) AS (SELECT u, u FROM edges
       | UNION SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v=r.node),
       |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
       |grams AS (SELECT doc_id, unnest([ws[i]||'_'||ws[i+1] for i in range(1, len(ws))]) AS gram FROM w),
       |gcnt AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
       |tp AS (SELECT doc_id, max(cnt) AS topcnt, sum(cnt) AS total FROM gcnt GROUP BY doc_id),
       |rep AS (SELECT w.doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_tokens,
       |  CAST(len(ws)-len(list_distinct(ws)) AS DOUBLE)/greatest(len(ws), 1) AS dup_token_frac,
       |  COALESCE(CAST(t.topcnt AS DOUBLE)/t.total, 0.0) AS top_ngram_frac
       | FROM w LEFT JOIN tp t USING (doc_id))
       |SELECT r.doc_id, r.n_tokens, r.dup_token_frac, r.top_ngram_frac
       |FROM rep r LEFT JOIN comps c ON r.doc_id = c.node
       |WHERE COALESCE(c.comp, r.doc_id) = r.doc_id
       | AND r.n_tokens >= 25 AND r.dup_token_frac <= 0.65 AND r.top_ngram_frac <= 0.15
       |ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for the verified multi-table LSH near-dup path:
    * regenerates the SAME plan-time hyperplane constants as
    * [[Similarity.lshBucketsBanded]] via [[Similarity.planeComponent]]
    * (Double.toString is round-trip exact, so DuckDB parses the
    * identical doubles), plants the same perturbed near-dup copies
    * (DuckDB lambda index is 1-based → i-1), computes each table's
    * sign bucket, unions candidates across tables, and verifies with
    * the same sequential-fold cosine. Bit-exact cross-engine.
    */
  private def lshNearDupOracle(nbits: Int, tables: Int, dim: Int, seed: Long,
                               threshold: Double): String = {
    def bitTerms(t: Int): String = (0 until nbits).map { b =>
      val plane = (0 until dim)
        .map(d => Similarity.planeComponent(seed, t * nbits + b, d))
        .mkString("[", ",", "]")
      s"(CASE WHEN list_reduce(list_transform(list_zip(v, $plane::DOUBLE[]), x->x[1]*x[2]),(p,q)->p+q) >= 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("\n  + ")
    val tableSelects = (0 until tables).map(t =>
      s"SELECT vec_id, $t AS t, ${bitTerms(t)} AS bucket FROM n")
      .mkString("\nUNION ALL\n")
    s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
       |e0 AS (SELECT vec_id, e FROM eb
       | UNION ALL
       | SELECT vec_id + 1000000 AS vec_id,
       |  list_transform(e, (x, i) ->
       |    x * (1.0 + 0.02 * CAST((vec_id + (i - 1)) % 5 - 2 AS DOUBLE))) AS e
       | FROM eb WHERE vec_id % 10 = 0),
       |n0 AS (SELECT vec_id, e,
       |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
       |n AS (SELECT vec_id, list_transform(e,
       |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
       |bk AS ($tableSelects),
       |cand AS (SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
       | FROM bk a JOIN bk b2 ON a.t = b2.t AND a.bucket = b2.bucket
       |  AND a.vec_id < b2.vec_id),
       |p AS (SELECT id_a, id_b,
       |  list_reduce(list_transform(list_zip(na.v, nb.v), x -> x[1]*x[2]), (p,q)->p+q) AS sim
       | FROM cand JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b)
       |SELECT id_a, id_b, sim FROM p WHERE sim >= $threshold ORDER BY id_a, id_b""".stripMargin
  }

  /** q_embed_recall oracle: the lshNearDupOracle CTEs (planting,
    * normalize, banding, verified pairs) plus the exact-cosine pair set,
    * full-outer joined into confusion counts — recall/precision as
    * bigint-over-bigint IEEE divisions.
    */
  private def embedRecallOracle(nbits: Int, tables: Int, dim: Int, seed: Long,
                                threshold: Double): String = {
    val base = lshNearDupOracle(nbits, tables, dim, seed, threshold)
    // cut the final projection off the base oracle and continue its CTE
    // list (the preceding `p AS (...)` needs the joining comma back)
    val upToP = base.substring(0, base.lastIndexOf("SELECT id_a, id_b, sim"))
      .stripTrailing + ",\n"
    s"""${upToP}lshp AS (SELECT id_a, id_b FROM p WHERE sim >= $threshold),
       |ex AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       | FROM n a JOIN n b ON a.vec_id < b.vec_id
       | WHERE list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), (p,q)->p+q) >= $threshold),
       |j AS (SELECT e.id_a AS ea, l.id_a AS la FROM ex e
       | FULL OUTER JOIN lshp l ON e.id_a = l.id_a AND e.id_b = l.id_b),
       |c AS (SELECT count(ea) AS n_exact, count(la) AS n_lsh,
       |  count(CASE WHEN ea IS NOT NULL AND la IS NOT NULL THEN 1 END) AS n_hit FROM j)
       |SELECT n_exact, n_lsh, n_hit,
       | CASE WHEN n_exact > 0 THEN CAST(n_hit AS DOUBLE)/n_exact END AS recall,
       | CASE WHEN n_lsh > 0 THEN CAST(n_hit AS DOUBLE)/n_lsh END AS "precision"
       |FROM c""".stripMargin
  }

  /** Shared by q_ann_ivf and q_ann_ivf_capped: the capped variant's cap
    * equals the observed max occupancy, so its output is definitionally
    * the uncapped probe — one oracle pins both (the pin IS the point:
    * capping at max-cell must change nothing on a non-skewed corpus).
    */
  private val annIvfOracle: String =
    """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
      |n0 AS (SELECT vec_id, e,
      |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
      |n AS (SELECT vec_id, list_transform(e,
      |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
      |cents AS (SELECT vec_id AS cent_id, v AS cv FROM n WHERE vec_id % 25 = 0),
      |ca AS (SELECT vec_id, cent_id, v FROM (
      |  SELECT nn.vec_id, c.cent_id, nn.v, row_number() OVER (
      |    PARTITION BY nn.vec_id ORDER BY
      |    list_reduce(list_transform(list_zip(nn.v, c.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
      |    c.cent_id) AS rn
      |  FROM n nn CROSS JOIN cents c) WHERE rn = 1),
      |qa AS (SELECT vec_id AS query_id, cent_id, v AS qv FROM (
      |  SELECT nn.vec_id, c.cent_id, nn.v, row_number() OVER (
      |    PARTITION BY nn.vec_id ORDER BY
      |    list_reduce(list_transform(list_zip(nn.v, c.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
      |    c.cent_id) AS rn
      |  FROM n nn CROSS JOIN cents c WHERE nn.vec_id < 10) WHERE rn <= 4),
      |s AS (SELECT qa.query_id, ca.vec_id AS neighbor_id,
      |  list_reduce(list_transform(list_zip(qa.qv, ca.v), x->x[1]*x[2]),(p,q)->p+q) AS sim
      | FROM qa JOIN ca USING (cent_id) WHERE qa.query_id <> ca.vec_id),
      |r AS (SELECT query_id, neighbor_id, sim,
      |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM s)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
      |FROM r WHERE rank<=5 ORDER BY query_id, rank""".stripMargin

  /** PQ replay CTE prefix (PQ8×16, seed 7, 64-d, queries vec_id < 10,
    * k = 5): normalization, md5-ordered codebook with code indices,
    * exact sub-L2 encoding (argmin by (d2, code) — the struct-min
    * tie-break), per-query ADC lookup table, and the ranked top-k
    * `pqr(query_id, rank, neighbor_id, sim_pq)`. Scores are
    * 9dp-round → DECIMAL sums, so both engines rank identically.
    */
  private val pqCtes: String =
    """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
      |n0 AS (SELECT vec_id, e,
      |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
      |n AS (SELECT vec_id, list_transform(e,
      |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
      |cents0 AS (SELECT v, row_number() OVER (
      |    ORDER BY md5(CAST(vec_id AS VARCHAR) || ':7'), vec_id) - 1 AS code FROM n),
      |cents AS (SELECT code, v FROM cents0 WHERE code < 16),
      |subs AS (SELECT CAST(range AS INTEGER) AS sub FROM range(8)),
      |cb AS (SELECT sub, code, list_slice(v, sub*8+1, sub*8+8) AS cv
      |  FROM cents CROSS JOIN subs),
      |xsub AS (SELECT vec_id, sub, list_slice(v, sub*8+1, sub*8+8) AS xs
      |  FROM n CROSS JOIN subs),
      |dists AS (SELECT vec_id, sub, code,
      |  list_reduce(list_transform(list_zip(xs, cv),
      |    z -> (z[1]-z[2])*(z[1]-z[2])), (p,q)->p+q) AS d2
      | FROM xsub JOIN cb USING (sub)),
      |codes AS (SELECT vec_id, sub, code FROM (
      |  SELECT vec_id, sub, code, row_number() OVER (
      |    PARTITION BY vec_id, sub ORDER BY d2, code) AS rn FROM dists)
      | WHERE rn = 1),
      |qsub AS (SELECT vec_id AS query_id, sub, list_slice(v, sub*8+1, sub*8+8) AS qs
      |  FROM n CROSS JOIN subs WHERE vec_id < 10),
      |lut AS (SELECT query_id, sub, code,
      |  list_reduce(list_transform(list_zip(qs, cv), z -> z[1]*z[2]),(p,q)->p+q) AS pdot
      | FROM qsub JOIN cb USING (sub)),
      |pqs AS (SELECT l.query_id, c.vec_id AS neighbor_id,
      |  CAST(sum(CAST(round(l.pdot, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sim_pq
      | FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
      | WHERE l.query_id <> c.vec_id GROUP BY 1, 2),
      |pqr AS (SELECT query_id, neighbor_id, sim_pq, row_number() OVER (
      |  PARTITION BY query_id ORDER BY sim_pq DESC, neighbor_id) AS rank FROM pqs)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_ann_pq" ->
      s"""$pqCtes
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim_pq
        |FROM pqr WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_ann_pq_recall" ->
      s"""$pqCtes,
        |es AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |  list_reduce(list_transform(list_zip(q.v, c.v), z -> z[1]*z[2]),(p,q)->p+q) AS sim
        | FROM n q CROSS JOIN n c WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |er AS (SELECT query_id, neighbor_id, row_number() OVER (
        |  PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM es),
        |etop AS (SELECT query_id, neighbor_id FROM er WHERE rank <= 5),
        |ptop AS (SELECT query_id, neighbor_id FROM pqr WHERE rank <= 5),
        |j AS (SELECT coalesce(e.query_id, p.query_id) AS query_id,
        |  e.query_id IS NOT NULL AS in_e, p.query_id IS NOT NULL AS in_p
        | FROM etop e FULL OUTER JOIN ptop p
        |   ON e.query_id = p.query_id AND e.neighbor_id = p.neighbor_id)
        |SELECT CAST(sum(CASE WHEN in_e THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
        |  CAST(sum(CASE WHEN in_p THEN 1 ELSE 0 END) AS BIGINT) AS n_pq,
        |  CAST(sum(CASE WHEN in_e AND in_p THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
        |  CASE WHEN sum(CASE WHEN in_e THEN 1 ELSE 0 END) > 0 THEN
        |    CAST(sum(CASE WHEN in_e AND in_p THEN 1 ELSE 0 END) AS DOUBLE) /
        |    sum(CASE WHEN in_e THEN 1 ELSE 0 END) END AS recall
        |FROM j""".stripMargin,
    "q_embed_neardup" -> lshNearDupOracle(nbits = 14, tables = 4, dim = 64,
      seed = 42L, threshold = 0.9),
    "q_embed_recall" -> embedRecallOracle(nbits = 14, tables = 4, dim = 64,
      seed = 42L, threshold = 0.9),
    "q_cross_semantic" ->
      // corpus normalize + md5 seed pick + argmax assignment for BOTH
      // sides, then within-cell new×corpus exact dots
      """WITH eb AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |n0c AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM eb),
        |nc AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0c),
        |seeds AS (SELECT vec_id AS cent_id, v AS cv FROM nc
        | ORDER BY md5(vec_id::VARCHAR || ':7'), vec_id LIMIT 8),
        |ca AS (SELECT vec_id, cent_id FROM (
        |  SELECT nc.vec_id, s.cent_id, row_number() OVER (PARTITION BY nc.vec_id
        |   ORDER BY list_reduce(list_transform(list_zip(nc.v, s.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    s.cent_id) AS rn
        |  FROM nc CROSS JOIN seeds s) WHERE rn = 1),
        |nw AS (SELECT vec_id + 1000000 AS vec_id,
        |  list_transform(e, (x, i) ->
        |    x * (1.0 + 0.02 * CAST((vec_id + (i - 1)) % 5 - 2 AS DOUBLE))) AS e
        | FROM eb WHERE vec_id % 10 = 0),
        |n0n AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM nw),
        |nn AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0n),
        |na AS (SELECT vec_id, cent_id FROM (
        |  SELECT nn.vec_id, s.cent_id, row_number() OVER (PARTITION BY nn.vec_id
        |   ORDER BY list_reduce(list_transform(list_zip(nn.v, s.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    s.cent_id) AS rn
        |  FROM nn CROSS JOIN seeds s) WHERE rn = 1),
        |p AS (SELECT na.vec_id AS new_id, ca.vec_id AS corpus_id,
        |  list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), (p,q)->p+q) AS sim
        | FROM na JOIN ca ON na.cent_id = ca.cent_id
        |  JOIN nn a ON a.vec_id = na.vec_id
        |  JOIN nc b ON b.vec_id = ca.vec_id)
        |SELECT new_id, corpus_id, sim FROM p WHERE sim >= 0.9
        |ORDER BY new_id, corpus_id""".stripMargin,
    "q_semantic_dedup" ->
      // full SemDeDup replay: planting (1-based list_transform index →
      // i-1), normalize, md5-seeded centroid pick, argmax-dot assignment
      // (tie = lowest cent_id), within-cell ≥ tau pairs, recursive-CTE
      // transitive closure, min-id canonical — every float op is the
      // same left-fold the Spark plan runs, proven bit-exact by
      // q_cosine_pairs
      """WITH RECURSIVE eb AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |e0 AS (SELECT vec_id, e FROM eb
        | UNION ALL
        | SELECT vec_id + 1000000 AS vec_id,
        |  list_transform(e, (x, i) ->
        |    x * (1.0 + 0.02 * CAST((vec_id + (i - 1)) % 5 - 2 AS DOUBLE))) AS e
        | FROM eb WHERE vec_id % 10 = 0),
        |n0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
        |n AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
        |seeds AS (SELECT vec_id AS cent_id, v AS cv FROM n
        | ORDER BY md5(vec_id::VARCHAR || ':7'), vec_id LIMIT 8),
        |scored AS (SELECT n.vec_id, s.cent_id,
        |  list_reduce(list_transform(list_zip(n.v, s.cv), x->x[1]*x[2]),(p,q)->p+q) AS csim
        | FROM n CROSS JOIN seeds s),
        |assign AS (SELECT vec_id, cent_id FROM (
        |  SELECT vec_id, cent_id,
        |   row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id) AS rn
        |  FROM scored) WHERE rn = 1),
        |m AS (SELECT n.vec_id, a.cent_id, n.v FROM n JOIN assign a USING (vec_id)),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        | FROM m a JOIN m b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
        | WHERE list_reduce(list_transform(list_zip(a.v, b.v), x->x[1]*x[2]),(p,q)->p+q) >= 0.9),
        |edges AS (SELECT id_a AS u, id_b AS w FROM pairs
        | UNION SELECT id_b, id_a FROM pairs),
        |reach(node, comp) AS (SELECT u, u FROM edges
        | UNION SELECT e.u, r.comp FROM edges e JOIN reach r ON e.w = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
        |SELECT m.vec_id, m.cent_id, COALESCE(c.comp, m.vec_id) AS group_id,
        | COALESCE(c.comp, m.vec_id) = m.vec_id AS is_canonical
        |FROM m LEFT JOIN comps c ON m.vec_id = c.node
        |ORDER BY vec_id""".stripMargin,
    "q_distinct_profile" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem""".stripMargin,
    "q_sample_k" ->
      // NULLS FIRST everywhere: Spark ASC is NULLS FIRST, DuckDB
      // defaults NULLS LAST — latent divergence if the table ever
      // carries null lang/doc_id
      """WITH r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) NULLS FIRST,
        |      CAST(doc_id AS VARCHAR) NULLS FIRST) AS rn
        | FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 20
        |ORDER BY lang NULLS FIRST, doc_id NULLS FIRST""".stripMargin,
    "q_split" ->
      // identical md5-interval thresholds as hashSplit(0.8/0.1/0.1):
      // lowercase hex compares lexicographically = numerically in both
      // engines
      s"""WITH s AS (SELECT lang, text,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.8)}' THEN 'train'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         | FROM documents)
         |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT) AS n_tokens
         |FROM s GROUP BY split, lang
         |ORDER BY split NULLS FIRST, lang NULLS FIRST""".stripMargin,
    "q_split_leakage" ->
      // the q_minhash_pairs_md5 portable-LSH CTE chain (threshold 0.5)
      // crossed with q_split's md5-interval assignment; least/greatest
      // canonicalize the cell, n_docs unions both endpoints
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |ab AS (SELECT doc_id,
         |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
         |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
         |sig AS (SELECT doc_id,
         |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
         | FROM ab GROUP BY doc_id),
         |bd AS (SELECT doc_id, sig, band,
         |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.sig AS sig_a, b.sig AS sig_b
         | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id),
         |lshp AS (SELECT doc_a, doc_b FROM cand
         | WHERE CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 >= 0.5),
         |asg AS (SELECT doc_id,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.8)}' THEN 'train'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         | FROM documents),
         |px AS (SELECT p.doc_a, p.doc_b,
         |  least(x.split, y.split) AS split_a, greatest(x.split, y.split) AS split_b
         | FROM lshp p JOIN asg x ON p.doc_a = x.doc_id JOIN asg y ON p.doc_b = y.doc_id),
         |cells AS (SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs
         | FROM px GROUP BY 1, 2),
         |dd AS (SELECT split_a, split_b, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs FROM
         |  (SELECT split_a, split_b, doc_a AS doc FROM px
         |   UNION ALL SELECT split_a, split_b, doc_b FROM px) u GROUP BY 1, 2)
         |SELECT split_a, split_b, n_pairs, n_docs
         |FROM cells JOIN dd USING (split_a, split_b)
         |ORDER BY split_a, split_b""".stripMargin,
    "q_leaked_docs" ->
      // same LSH + assignment CTEs, un-canonicalized endpoint splits;
      // a doc leaks once per cross-split partner, from either side
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |ab AS (SELECT doc_id,
         |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
         |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
         |sig AS (SELECT doc_id,
         |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
         | FROM ab GROUP BY doc_id),
         |bd AS (SELECT doc_id, sig, band,
         |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.sig AS sig_a, b.sig AS sig_b
         | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id),
         |lshp AS (SELECT doc_a, doc_b FROM cand
         | WHERE CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 >= 0.5),
         |asg AS (SELECT doc_id,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.8)}' THEN 'train'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         | FROM documents),
         |px AS (SELECT p.doc_a, p.doc_b, x.split AS sa, y.split AS sb
         | FROM lshp p JOIN asg x ON p.doc_a = x.doc_id JOIN asg y ON p.doc_b = y.doc_id),
         |hits AS (SELECT doc_a AS doc FROM px WHERE sa = 'test' AND sb <> 'test'
         | UNION ALL SELECT doc_b FROM px WHERE sb = 'test' AND sa <> 'test')
         |SELECT doc, CAST(count(*) AS BIGINT) AS n_cross_pairs
         |FROM hits GROUP BY doc
         |ORDER BY doc""".stripMargin,
    "q_threshold_sweep" ->
      // naive corpus x grid replay of the binned suffix-sum sweep;
      // fractions are single BIGINT-over-BIGINT IEEE divisions.
      // Non-empty-corpus assumption: on an EMPTY documents table the
      // engine still emits one row per grid threshold (zero counts,
      // null fractions — pinned by TextQualitySpec) while this oracle's
      // GROUP BY over `t CROSS JOIN d` would return zero rows. The
      // harness never runs the oracle on an empty table; if that ever
      // changes, LEFT JOIN from `t` here to keep the grid.
      """WITH d AS (SELECT len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens FROM documents),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS tn, CAST(sum(n_tokens) AS BIGINT) AS tw FROM d),
        |t AS (SELECT unnest([10.0, 25.0, 50.0, 100.0, 200.0, 400.0]) AS threshold),
        |k AS (SELECT t.threshold AS threshold,
        |  CAST(count(CASE WHEN d.n_tokens >= t.threshold THEN 1 END) AS BIGINT) AS n_kept,
        |  CAST(coalesce(sum(CASE WHEN d.n_tokens >= t.threshold THEN d.n_tokens END), 0) AS BIGINT) AS w_kept
        | FROM t CROSS JOIN d GROUP BY t.threshold)
        |SELECT threshold, n_kept,
        | CAST(n_kept AS DOUBLE) / CAST(tn AS DOUBLE) AS frac_kept,
        | w_kept,
        | CAST(w_kept AS DOUBLE) / CAST(tw AS DOUBLE) AS w_frac_kept
        |FROM k CROSS JOIN tot
        |ORDER BY threshold""".stripMargin,
    "q_calibrated_gate" ->
      // the sweep replay picks the strictest threshold with WEIGHTED
      // kept-fraction >= 0.5 (the weight column drives the target;
      // loosest as the infeasible-target fallback), then the gate
      // filter applies it — same IEEE BIGINT/BIGINT division as the
      // engine's w_frac_kept comparison
      """WITH d AS (SELECT doc_id, CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens FROM documents),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tw FROM d),
        |t AS (SELECT unnest([10.0, 25.0, 50.0, 100.0, 200.0, 400.0]) AS threshold),
        |k AS (SELECT t.threshold AS threshold,
        |  CAST(coalesce(sum(CASE WHEN d.n_tokens >= t.threshold THEN d.n_tokens END), 0) AS BIGINT) AS w_kept
        | FROM t CROSS JOIN d GROUP BY t.threshold),
        |cut AS (SELECT coalesce(
        |   max(CASE WHEN CAST(w_kept AS DOUBLE) / CAST(tw AS DOUBLE) >= 0.5 THEN threshold END),
        |   min(threshold)) AS cut FROM k CROSS JOIN tot)
        |SELECT d.doc_id, d.n_tokens, cut.cut AS cut
        |FROM d CROSS JOIN cut WHERE CAST(d.n_tokens AS DOUBLE) >= cut.cut
        |ORDER BY d.doc_id""".stripMargin,
    "q_sample_strat" ->
      // identical md5-hex threshold literal as md5SampleFilter(_, 0.2):
      // lowercase hex compares lexicographically = numerically in both
      // engines
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled
         |FROM documents
         |WHERE md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.2)}'
         |GROUP BY lang
         |ORDER BY lang NULLS FIRST""".stripMargin,
    "q_fuzzy_pairs" ->
      // brute-force levenshtein join — valid oracle BECAUSE the
      // engine's deletion-neighborhood result is exact, not approximate
      """WITH base AS (SELECT doc_id, substr(lower(trim(text)), 1, 24) AS name
        |  FROM documents WHERE doc_id % 10 = 0),
        |planted AS (SELECT doc_id + 1000000 AS doc_id,
        |  substr(name, 1, CAST(doc_id % 20 AS INTEGER)) || 'q' ||
        |    substr(name, CAST(doc_id % 20 AS INTEGER) + 2) AS name FROM base),
        |u AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS INTEGER) AS edit_distance
        |FROM u a JOIN u b ON a.doc_id < b.doc_id
        |WHERE levenshtein(a.name, b.name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "q_lm_score" ->
      // the bigram LM reproduced as counts + joins; heads/vocabulary
      // derive from the c12 table exactly as the engine does, ln terms
      // round to 9dp into DECIMAL sums (the BM25/JS ulp-hardening)
      """WITH tw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |rp AS (SELECT unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw WHERE doc_id % 2 = 0),
        |c12 AS (SELECT bg, count(*) AS c12 FROM rp GROUP BY bg),
        |heads AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w) AS v FROM (
        |  SELECT split_part(bg,' ',1) AS w FROM c12 UNION SELECT split_part(bg,' ',2) AS w FROM c12)),
        |tp AS (SELECT doc_id, unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw WHERE doc_id % 2 = 1),
        |j AS (SELECT t.doc_id,
        |   CAST(round(ln(CAST(coalesce(c.c12,0)+1 AS DOUBLE)/(coalesce(h.c1,0)+1*v.v)), 9) AS DECIMAL(28,9)) AS lp
        |  FROM tp t LEFT JOIN c12 c USING (bg)
        |  LEFT JOIN heads h ON split_part(t.bg,' ',1)=h.w1 CROSS JOIN vocab v),
        |s AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp FROM j GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(s.n_bigrams,0) AS BIGINT) AS n_bigrams,
        | CAST(s.slp AS DOUBLE)/s.n_bigrams AS avg_logprob
        |FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |LEFT JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_cdc_dedup" ->
      // gear table keyed by the character string (md5 per position),
      // base-31 mod-2^40 Horner over the 16-char window (list_reduce no-init ≡ the
      // 0-init fold), mod-256 cut rule, conditional end cut, per-chunk
      // md5 — every branch replayed
      s"""WITH d AS (SELECT doc_id, text || '$cdcPromoSql' AS t
        |  FROM documents WHERE doc_id % 32 = 0),
        |gp AS (SELECT doc_id, t, len(t) AS n,
        |  list_transform(generate_series(1, len(t)), p ->
        |    ('0x' || substr(md5('gear:' || substr(t, p, 1)), 1, 4))::BIGINT) AS g
        | FROM d WHERE len(t) >= 1),
        |ct AS (SELECT doc_id, t, n,
        |  list_filter(generate_series(1, n), i ->
        |    list_reduce(g[greatest(i-15, 1):i], (a, x) -> (a*31 + x) % 1099511627776) % 128 = 0) AS cuts
        | FROM gp),
        |ca AS (SELECT doc_id, t,
        |  CASE WHEN len(cuts) > 0 AND cuts[-1] = n THEN cuts
        |       ELSE list_append(cuts, n) END AS cu FROM ct),
        |ch AS (SELECT doc_id, t, unnest(list_transform(generate_series(1, len(cu)), k ->
        |  struct_pack(pos := (CASE WHEN k = 1 THEN 0 ELSE cu[k-1] END) + 1,
        |              len := cu[k] - (CASE WHEN k = 1 THEN 0 ELSE cu[k-1] END)))) AS c
        | FROM ca)
        |SELECT md5(substr(t, c.pos, c.len)) AS chunk_md5, CAST(c.len AS INT) AS len,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM ch GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY n_occurrences DESC, chunk_md5 LIMIT 20""".stripMargin,
    "q_score_agreement" ->
      // both score replays composed (LM ref = even ids, target = ALL
      // docs; classifier over all docs), then row ranks under the
      // (value, doc_id) total order and the exact-integer Σd²; ρ is
      // one IEEE expression over exact operands
      """WITH tw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |rp AS (SELECT unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw WHERE doc_id % 2 = 0),
        |c12 AS (SELECT bg, count(*) AS c12 FROM rp GROUP BY bg),
        |heads AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w) AS v FROM (
        |  SELECT split_part(bg,' ',1) AS w FROM c12 UNION SELECT split_part(bg,' ',2) AS w FROM c12)),
        |tp AS (SELECT doc_id, unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw),
        |j AS (SELECT t.doc_id,
        |   CAST(round(ln(CAST(coalesce(c.c12,0)+1 AS DOUBLE)/(coalesce(h.c1,0)+1*v.v)), 9) AS DECIMAL(28,9)) AS lp
        |  FROM tp t LEFT JOIN c12 c USING (bg)
        |  LEFT JOIN heads h ON split_part(t.bg,' ',1)=h.w1 CROSS JOIN vocab v),
        |sagg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp FROM j GROUP BY doc_id),
        |lmv AS (SELECT doc_id, CAST(slp AS DOUBLE)/n_bigrams AS lm FROM sagg),
        |cf AS (SELECT doc_id, ws || [ws[i]||'_'||ws[i+1] for i in range(1, len(ws))] AS fs FROM tw),
        |cs AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
        |  CAST(coalesce(list_aggregate(list_transform(fs,
        |    x -> (('0x' || substr(md5(x), 1, 8))::BIGINT % 4096) % 2001 - 1000), 'sum'), 0) AS BIGINT) AS w_sum
        | FROM cf),
        |clv AS (SELECT doc_id, CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000.0) END AS cls FROM cs),
        |joined AS (SELECT l.doc_id, lm, cls FROM lmv l JOIN clv c USING (doc_id)
        |  WHERE lm IS NOT NULL AND cls IS NOT NULL),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY cls, doc_id) AS r1 FROM joined),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY lm, doc_id) AS r2 FROM joined),
        |ag AS (SELECT count(*) AS n, CAST(coalesce(sum((r1 - r2) * (r1 - r2)), 0) AS DECIMAL(38,0)) AS sum_d2
        |  FROM ra JOIN rb USING (doc_id))
        |SELECT CAST(n AS BIGINT) AS n, CAST(sum_d2 AS DECIMAL(38,9)) AS sum_d2,
        |  CASE WHEN n > 1 THEN 1.0 - (6.0 * CAST(sum_d2 AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)) END AS spearman_rho
        |FROM ag""".stripMargin,
    "q_quality_classifier" ->
      // hashing-trick replay: same md5-leading-8-hex bucket, same
      // centered (bucket % 2001 − 1000) integer weights, BIGINT sum →
      // one double division, so scores match to the last bit
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |f AS (SELECT doc_id, ws || [ws[i]||'_'||ws[i+1] for i in range(1, len(ws))] AS fs FROM t),
        |s AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
        |  CAST(coalesce(list_aggregate(list_transform(fs,
        |    x -> (('0x' || substr(md5(x), 1, 8))::BIGINT % 4096) % 2001 - 1000), 'sum'), 0) AS BIGINT) AS w_sum
        | FROM f)
        |SELECT doc_id, n_feats, w_sum,
        | CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000.0) END AS score,
        | coalesce(CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000.0) END > 0.0, FALSE) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_classifier_weighted" ->
      // the SAME trained table the Spark side carries, embedded as a
      // 64-entry list literal (1-based index); fixed-point BIGINT sum,
      // one double division at 1e6 scale
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
        |f AS (SELECT doc_id, ws || [ws[i]||'_'||ws[i+1] for i in range(1, len(ws))] AS fs FROM t),
        |s AS (SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
        |  CAST(coalesce(list_aggregate(list_transform(fs,
        |    x -> (${trainedDemoWeights.mkString("[", ", ", "]")})[(('0x' || substr(md5(x), 1, 8))::BIGINT % 64) + 1]), 'sum'), 0) AS BIGINT) AS w_sum
        | FROM f)
        |SELECT doc_id, n_feats, w_sum,
        | CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000000.0) END AS score,
        | coalesce(CASE WHEN n_feats > 0 THEN CAST(w_sum AS DOUBLE)/(n_feats * 1000000.0) END > 0.0, FALSE) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_ccnet_buckets" ->
      // q_lm_score's LM replay over ALL docs, then the NAIVE window
      // formulation the scalable decomposition must equal: row_number
      // per language over (score DESC, doc_id), integer tercile splits
      """WITH tw AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |rp AS (SELECT unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw WHERE doc_id % 2 = 0),
        |c12 AS (SELECT bg, count(*) AS c12 FROM rp GROUP BY bg),
        |heads AS (SELECT split_part(bg, ' ', 1) AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
        |vocab AS (SELECT count(DISTINCT w) AS v FROM (
        |  SELECT split_part(bg,' ',1) AS w FROM c12 UNION SELECT split_part(bg,' ',2) AS w FROM c12)),
        |tp AS (SELECT doc_id, unnest([ws[i]||' '||ws[i+1] for i in range(1, len(ws))]) AS bg
        |  FROM tw),
        |j AS (SELECT t.doc_id,
        |   CAST(round(ln(CAST(coalesce(c.c12,0)+1 AS DOUBLE)/(coalesce(h.c1,0)+1*v.v)), 9) AS DECIMAL(28,9)) AS lp
        |  FROM tp t LEFT JOIN c12 c USING (bg)
        |  LEFT JOIN heads h ON split_part(t.bg,' ',1)=h.w1 CROSS JOIN vocab v),
        |sagg AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp FROM j GROUP BY doc_id),
        |sc AS (SELECT d.doc_id, d.lang, CAST(s.slp AS DOUBLE)/s.n_bigrams AS avg_logprob
        |  FROM documents d JOIN sagg s USING (doc_id)),
        |r AS (SELECT doc_id, lang, avg_logprob,
        |   row_number() OVER (PARTITION BY lang ORDER BY avg_logprob DESC, doc_id) AS rn,
        |   count(*) OVER (PARTITION BY lang) AS n
        |  FROM sc)
        |SELECT doc_id, lang, avg_logprob,
        | CASE WHEN rn*3 <= n THEN 'head' WHEN rn*3 <= 2*n THEN 'middle' ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,
    "q_dsir_weights" ->
      // full DSIR replay: refit the log-ratio table, rescore every doc
      s"""$dsirCtes
        |SELECT doc_id, n_feats, w_sum, logw FROM sc ORDER BY doc_id""".stripMargin,
    "q_dsir_sample" ->
      // Gumbel-top-k membership on logw + g(md5 60-bit uniform); the
      // key decides the k winners only — output columns are the exact
      // integers/division of q_dsir_weights
      s"""$dsirCtes,
        |g AS (SELECT doc_id, n_feats, w_sum, logw,
        |   logw + (-ln(-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's1'), 1, 15))::BIGINT AS DOUBLE) + 0.5) / 1152921504606846976.0))) AS gk
        |  FROM sc WHERE logw IS NOT NULL),
        |topk AS (SELECT doc_id, n_feats, w_sum, logw FROM g
        |  ORDER BY gk DESC, doc_id ASC LIMIT 100)
        |SELECT doc_id, n_feats, w_sum, logw FROM topk ORDER BY doc_id""".stripMargin,
    "q_url_canon" ->
      s"""$urlDomainCtes
        |SELECT doc_id, url, url_canon, domain FROM dom ORDER BY doc_id""".stripMargin,
    "q_domain_cap" ->
      // ONE plain window replays the salted two-phase cap — top-k by a
      // total order is partition-invariant, so salt must not change
      // the kept set
      s"""$urlDomainCtes,
        |r AS (SELECT doc_id, domain,
        |  row_number() OVER (PARTITION BY domain
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        | FROM dom)
        |SELECT doc_id, domain FROM r WHERE rn <= 3
        |ORDER BY domain, doc_id""".stripMargin,
    "q_domain_quality" ->
      // classifier replay (q_quality_classifier's CTEs) joined to the
      // domain derivation, aggregated per domain; mean = DECIMAL sum of
      // 9dp-rounded scores cast to DOUBLE, one division
      domainQualitySql,
    "q_domain_refresh" ->
      // THE SAME direct rollup as q_domain_quality, verbatim: the Spark
      // side computes merge(state(base), state(delta)) over a
      // deterministic corpus split — hash equality against the direct
      // single-pass oracle IS the mergeability proof
      domainQualitySql,
    "q_domain_sample" ->
      // domain keep rates → sqrt-flattened weights (IEEE-exact), kept
      // docs by INTEGER comparison: 60-bit md5 prefix <
      // floor(weight·2^60) — floor(), not a cast (DuckDB casts round,
      // Spark casts truncate)
      s"""$domainAggCtes,
        |wts AS (SELECT domain,
        |  least(1.0, greatest(sqrt(CAST(n_keep AS DOUBLE)/n_docs), 0.05)) AS weight
        | FROM agg)
        |SELECT d.doc_id, d.domain, w.weight
        |FROM dom d JOIN wts w USING (domain)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 's1'), 1, 15))::BIGINT
        |  < CAST(floor(w.weight * 1152921504606846976) AS BIGINT)
        |ORDER BY d.doc_id""".stripMargin,
    "q_line_dedup" ->
      // same derived 2-word lines, keep-first replayed by list_position
      // (first-occurrence index) — O(L²) is fine for the oracle
      """WITH l AS (SELECT doc_id,
        |  regexp_replace(text, '(\S+ \S+) ', '\1' || chr(10), 'g') AS t FROM documents),
        |s AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM l),
        |k AS (SELECT doc_id, ls,
        |  list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kept FROM s)
        |SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_segments,
        | CAST(len(kept) AS BIGINT) AS n_kept,
        | array_to_string(kept, chr(10)) AS text_deduped
        |FROM k ORDER BY doc_id""".stripMargin,
    "q_html_extract" ->
      // the declared extraction chain, verbatim: 5 structural regex
      // passes (comments, script, style, block→newline, tags), 6 entity
      // replaces in order (&amp; last), 3 whitespace passes + trim —
      // the native expression must match this bit-for-bit
      """WITH h AS (SELECT doc_id,
        |  '<!DOCTYPE html><html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</title><style type="text/css">body { margin: 0; }</style>' ||
        |  '<script>if (a < b && c > d) { x = "y"; }</script></head>' ||
        |  '<body><!-- id ' || CAST(doc_id AS VARCHAR) || ' --><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
        |  '</h1><div class="main"><p>' ||
        |  regexp_replace(text, '(\S+ \S+ \S+ \S+ \S+) ', '\1</p><p>', 'g') ||
        |  '</p><p>&quot;x&quot; &lt;tag&gt; &amp;co&nbsp;end</p></div>' ||
        |  '<br><ul><li>a</li><li>b</li></ul></body></html>' AS html FROM documents),
        |ex AS (SELECT doc_id, trim(
        |  regexp_replace(regexp_replace(regexp_replace(
        |  replace(replace(replace(replace(replace(replace(
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    html,
        |    '<!--.*?-->', '', 'gs'),
        |    '<script\b[^>]*>.*?</script>', '', 'gis'),
        |    '<style\b[^>]*>.*?</style>', '', 'gis'),
        |    '</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|blockquote)\b[^>]*>', chr(10), 'gi'),
        |    '<[^>]*>', '', 'gs'),
        |  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&'),
        |  '[ \t\r\f]+', ' ', 'g'), ' *\n *', chr(10), 'g'), '\n+', chr(10), 'g'),
        |  ' ' || chr(10)) AS t FROM h)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        |  CAST(length(t) - length(replace(t, chr(10), '')) + 1 AS BIGINT) AS n_lines,
        |  substr(t, 1, 60) AS head, md5(t) AS body_md5
        |FROM ex ORDER BY doc_id""".stripMargin,
    "q_fix_mojibake" ->
      // the corruption replayed forward; the REPAIRED truth is the
      // injected string itself (repair must invert the corruption), so
      // n_chars_fixed/fixed_md5 come from `injected`, never from a
      // reimplementation of the decoder
      """WITH inj AS (SELECT doc_id, translate(text, 'etqx', 'é’“”') AS injected FROM documents),
        |bad AS (SELECT doc_id, injected,
        |  replace(replace(replace(replace(injected,
        |    'é', 'Ã©'), '’', 'â€™'), '“', 'â€œ'), '”', 'â€' || chr(157)) AS b
        | FROM inj)
        |SELECT doc_id, CAST(length(b) AS BIGINT) AS n_chars_bad,
        |  CAST(length(injected) AS BIGINT) AS n_chars_fixed,
        |  md5(injected) AS fixed_md5
        |FROM bad ORDER BY doc_id""".stripMargin,
    "q_link_graph" ->
      // src domains from the shared url CTEs; hrefs re-extracted with
      // the same regex, then hostOf + registeredDomain replayed on each
      // target; relative links yield domain '' and drop
      s"""$linkGraphCtes
        |SELECT d.domain AS src_domain, t.dst_domain,
        |  CAST(count(*) AS BIGINT) AS n_links,
        |  CAST(count(DISTINCT d.url) AS BIGINT) AS n_pages
        |FROM dom d JOIN dstd t USING (doc_id)
        |WHERE t.dst_domain <> ''
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_anchor_text" ->
      // anchorHtml replayed arithmetically; both capture groups of the
      // SAME pattern extracted and unnested in lockstep (DuckDB zips
      // parallel unnests positionally, exactly like the arrays_zip);
      // dst domains via the hostOf+registeredDomain replay; top anchor
      // by row_number ≡ the struct-min (max n, tie → min anchor)
      s"""$urlDomainCtes,
        |ah AS (SELECT d.doc_id, d.url,
        |  '<p><a href="https://www.site' || CAST((d.doc_id*5+2)%12 AS VARCHAR) || '.' ||
        |   ['com','org','co.uk','io','ac.jp'][CAST((d.doc_id*9+4)%5 AS INT)+1] ||
        |  '/p">' || substr(translate(t.text, '<>"&', ''), 1, 24) || '</a> ' ||
        |  '<a class="m" href="http://blog.site' || CAST((d.doc_id*7+4)%12 AS VARCHAR) || '.' ||
        |   ['com','net','org.uk','io','ne.jp'][CAST((d.doc_id*5+3)%5 AS INT)+1] ||
        |  '">Doc ' || CAST(d.doc_id%7 AS VARCHAR) || '</a> ' ||
        |  '<a href="/rel">skip me</a><a href="https://x.site0.com"><b>bold</b></a>' ||
        |  '<a href="https://ads.site9.com/z"></a></p>' AS html
        | FROM dom d JOIN documents t USING (doc_id)),
        |prs AS (SELECT doc_id, url,
        |  unnest(regexp_extract_all(html, '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 1)) AS href,
        |  unnest(regexp_extract_all(html, '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 2)) AS anchor
        | FROM ah),
        |pa AS (SELECT doc_id, url, anchor, lower(regexp_replace(regexp_extract(regexp_replace(
        |    regexp_replace(trim(href), '#.*$$', ''),
        |    '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''), '^([^/?]*)', 1), '^[^@/]*@', '')) AS auth FROM prs),
        |pa2 AS (SELECT doc_id, url, anchor, regexp_replace(auth, ':[0-9]+$$', '') AS host FROM pa),
        |pa3 AS (SELECT doc_id, url, anchor, host, string_split(host, '.') AS ls, len(string_split(host, '.')) AS n FROM pa2),
        |aex AS (SELECT doc_id, url, anchor,
        |   CASE WHEN n <= 2 THEN host
        |        WHEN list_contains($suffixListSql, ls[n-1] || '.' || ls[n]) THEN ls[n-2] || '.' || ls[n-1] || '.' || ls[n]
        |        ELSE ls[n-1] || '.' || ls[n] END AS dst_domain FROM pa3
        | ),
        |ex AS (SELECT * FROM aex WHERE dst_domain <> '' AND anchor <> ''),
        |ba AS (SELECT dst_domain, anchor, count(*) AS n FROM ex GROUP BY 1, 2),
        |tp AS (SELECT dst_domain, anchor AS top_anchor, n AS top_anchor_n,
        |  row_number() OVER (PARTITION BY dst_domain ORDER BY n DESC, anchor) AS rn FROM ba)
        |SELECT e.dst_domain, CAST(count(*) AS BIGINT) AS n_anchors,
        |  CAST(count(DISTINCT e.url) AS BIGINT) AS n_pages,
        |  t.top_anchor, CAST(t.top_anchor_n AS BIGINT) AS top_anchor_n
        |FROM ex e JOIN tp t ON e.dst_domain = t.dst_domain AND t.rn = 1
        |GROUP BY 1, t.top_anchor, t.top_anchor_n
        |ORDER BY 1""".stripMargin,
    "q_url_blocklist" ->
      // host suffixes generated from dot positions (list_filter over
      // generate_series ≡ the Spark HOF chain), longest matching entry
      // via arg_max (suffix lengths are strictly decreasing — unique)
      s"""$urlDomainCtes,
        |bl AS (SELECT unnest(['site3.com','www.site3.com','api.site7.io',
        |   'news.site1.org','site5.co.uk','nohit.example']) AS entry),
        |sf AS (SELECT doc_id, unnest(list_prepend(host,
        |   list_transform(list_filter(generate_series(1, length(host)),
        |     i -> substr(host, i, 1) = '.'),
        |     p -> substr(host, p + 1, length(host))))) AS suf FROM dom),
        |ht AS (SELECT s.doc_id, arg_max(s.suf, length(s.suf)) AS blocked_by
        | FROM sf s JOIN bl b ON s.suf = b.entry GROUP BY s.doc_id)
        |SELECT COALESCE(h.blocked_by, '') AS blocked_by,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM dom d LEFT JOIN ht h USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_domain_tiered_cap" ->
      // PageRank replayed (same unrolled CTEs), integer tier caps,
      // then the md5-order cap replay with a per-domain k and the
      // defaultK fallback for unranked domains
      s"""$linkGraphCtes,
        |edges AS (SELECT DISTINCT d.domain AS src, t.dst_domain AS dst
        |  FROM dom d JOIN dstd t USING (doc_id) WHERE t.dst_domain <> ''),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |outd AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
        |prr0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |$pageRankIterSql,
        |caps AS (SELECT node AS cdom,
        |  CASE WHEN r >= 1000000000 THEN 120 ELSE 40 END AS k FROM prr8),
        |capk AS (SELECT d.doc_id, d.domain, COALESCE(c.k, 60) AS k,
        |  md5(CAST(d.doc_id AS VARCHAR)) AS o
        | FROM dom d LEFT JOIN caps c ON d.domain = c.cdom),
        |rn AS (SELECT *, row_number() OVER (PARTITION BY domain ORDER BY o, doc_id) AS rn FROM capk),
        |kept AS (SELECT * FROM rn WHERE rn <= k)
        |SELECT domain, CAST(max(k) AS INT) AS k_cap,
        |  CAST(count(*) AS BIGINT) AS n_kept
        |FROM kept GROUP BY domain ORDER BY domain""".stripMargin,
    "q_pagerank" ->
      // the link-graph CTEs feed the distinct domain edge set; then 8
      // unrolled fixed-point iterations — floor division on longs
      // (DuckDB `//` ≡ Spark DIV on non-negatives), teleport
      // 0.15·scale, damping 85/100, dangling mass dropped. Bit-exact
      // by construction: no float touches the recursion
      pageRankOracleSql,
    "q_pagerank_resume" ->
      // warm start over the SAME edges is exactly the continued
      // recursion — the oracle is the identical 8-round unrolled SQL
      pageRankOracleSql,
    "q_dup_spans" ->
      // winnowing replayed list-for-list: per-position 60-bit md5 gram
      // hashes, per-window list_min with FIRST-occurrence position
      // (list_position = Spark array_position), distinct (fp, pos) per
      // doc, min pos per (doc, fp), doc-frequency cap, fp equi-join,
      // then the span text compared character-exactly before counting
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE length(text) >= 30),
        |hs AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(text)-30+1),
        |    i -> ('0x' || substr(md5(substr(text, i, 30)), 1, 15))::BIGINT) AS h
        | FROM docs),
        |wn AS (SELECT doc_id,
        |  -- no list_distinct (DuckDB lacks it for struct lists); the
        |  -- min-pos GROUP BY in fp1 collapses duplicates identically
        |  list_transform(generate_series(1, greatest(len(h)-10+1, 1)),
        |    j -> struct_pack(fp := list_min(h[j:j+9]),
        |                     pos := j + list_position(h[j:j+9], list_min(h[j:j+9])) - 1)) AS fps
        | FROM hs),
        |fpu AS (SELECT doc_id, u.fp AS fp, u.pos AS pos
        | FROM (SELECT doc_id, unnest(fps) AS u FROM wn)),
        |fp1 AS (SELECT doc_id, fp, min(pos) AS pos FROM fpu GROUP BY doc_id, fp),
        |safe AS (SELECT * FROM fp1 WHERE fp NOT IN
        |  (SELECT fp FROM fp1 GROUP BY fp HAVING count(*) > 64)),
        |ver AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pos_a, b.pos AS pos_b
        | FROM safe a JOIN safe b ON a.fp = b.fp AND a.doc_id < b.doc_id
        | JOIN docs ta ON a.doc_id = ta.doc_id
        | JOIN docs tb ON b.doc_id = tb.doc_id
        | WHERE substr(ta.text, CAST(a.pos AS INTEGER), 30) = substr(tb.text, CAST(b.pos AS INTEGER), 30)),
        |sel AS (SELECT id_a, id_b, pos_a, pos_b,
        |  row_number() OVER (PARTITION BY id_a, id_b ORDER BY pos_a, pos_b) AS rn,
        |  count(*) OVER (PARTITION BY id_a, id_b) AS n
        | FROM ver)
        |SELECT id_a, id_b, CAST(n AS BIGINT) AS n_spans,
        |  CAST(pos_a AS INTEGER) AS pos_a, CAST(pos_b AS INTEGER) AS pos_b
        |FROM sel WHERE rn = 1 ORDER BY id_a, id_b""".stripMargin,
    "q_dup_span_strip" ->
      // same winnow/verify CTEs; then per loser doc the sorted distinct
      // anchor starts, and a per-char mask (kept iff no span start in
      // (i-k, i]) rebuilt with an ordered string_agg — the identical
      // list algebra the Spark side runs with zip_with/exists
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE length(text) >= 30),
        |hs AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(text)-30+1),
        |    i -> ('0x' || substr(md5(substr(text, i, 30)), 1, 15))::BIGINT) AS h
        | FROM docs),
        |wn AS (SELECT doc_id,
        |  list_transform(generate_series(1, greatest(len(h)-10+1, 1)),
        |    j -> struct_pack(fp := list_min(h[j:j+9]),
        |                     pos := j + list_position(h[j:j+9], list_min(h[j:j+9])) - 1)) AS fps
        | FROM hs),
        |fpu AS (SELECT doc_id, u.fp AS fp, u.pos AS pos
        | FROM (SELECT doc_id, unnest(fps) AS u FROM wn)),
        |fp1 AS (SELECT doc_id, fp, min(pos) AS pos FROM fpu GROUP BY doc_id, fp),
        |safe AS (SELECT * FROM fp1 WHERE fp NOT IN
        |  (SELECT fp FROM fp1 GROUP BY fp HAVING count(*) > 64)),
        |ver AS (SELECT b.doc_id AS doc_id, b.pos AS pos
        | FROM safe a JOIN safe b ON a.fp = b.fp AND a.doc_id < b.doc_id
        | JOIN docs ta ON a.doc_id = ta.doc_id
        | JOIN docs tb ON b.doc_id = tb.doc_id
        | WHERE substr(ta.text, CAST(a.pos AS INTEGER), 30) = substr(tb.text, CAST(b.pos AS INTEGER), 30)),
        |spans AS (SELECT doc_id, list_sort(list(DISTINCT pos)) AS ps FROM ver GROUP BY doc_id),
        |strip AS (SELECT d.doc_id,
        |  CAST(len(s.ps) AS BIGINT) AS n_anchor_sites,
        |  coalesce(list_aggregate(list_transform(
        |    list_filter(generate_series(1, length(d.text)),
        |      i -> len(list_filter(s.ps, p -> p <= i AND i < p + 30)) = 0),
        |    i -> substr(d.text, CAST(i AS INTEGER), 1)), 'string_agg', ''), '') AS text_stripped,
        |  length(d.text) AS orig_len
        | FROM docs d JOIN spans s ON d.doc_id = s.doc_id)
        |SELECT doc_id, n_anchor_sites,
        |  CAST(orig_len - length(text_stripped) AS BIGINT) AS n_chars_removed,
        |  text_stripped
        |FROM strip ORDER BY doc_id""".stripMargin,
    "q_cross_spans" ->
      // the winnow CTEs instantiated over BOTH sides (corpus, and the
      // +500000 re-arrival drop), corpus-side doc-frequency cap,
      // asymmetric fp join, exact substr verify, first-position window
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE length(text) >= 30),
        |drp AS (SELECT doc_id + 500000 AS doc_id, text FROM documents
        |        WHERE doc_id % 7 = 0 AND length(text) >= 30),
        |chs AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(text)-30+1),
        |    i -> ('0x' || substr(md5(substr(text, i, 30)), 1, 15))::BIGINT) AS h
        | FROM docs),
        |cwn AS (SELECT doc_id,
        |  list_transform(generate_series(1, greatest(len(h)-10+1, 1)),
        |    j -> struct_pack(fp := list_min(h[j:j+9]),
        |                     pos := j + list_position(h[j:j+9], list_min(h[j:j+9])) - 1)) AS fps
        | FROM chs),
        |cfp1 AS (SELECT doc_id, u.fp AS fp, min(u.pos) AS pos
        | FROM (SELECT doc_id, unnest(fps) AS u FROM cwn) GROUP BY doc_id, u.fp),
        |dhs AS (SELECT doc_id,
        |  list_transform(generate_series(1, length(text)-30+1),
        |    i -> ('0x' || substr(md5(substr(text, i, 30)), 1, 15))::BIGINT) AS h
        | FROM drp),
        |dwn AS (SELECT doc_id,
        |  list_transform(generate_series(1, greatest(len(h)-10+1, 1)),
        |    j -> struct_pack(fp := list_min(h[j:j+9]),
        |                     pos := j + list_position(h[j:j+9], list_min(h[j:j+9])) - 1)) AS fps
        | FROM dhs),
        |dfp1 AS (SELECT doc_id, u.fp AS fp, min(u.pos) AS pos
        | FROM (SELECT doc_id, unnest(fps) AS u FROM dwn) GROUP BY doc_id, u.fp),
        |safe_new AS (SELECT * FROM dfp1 WHERE fp NOT IN
        |  (SELECT fp FROM cfp1 GROUP BY fp HAVING count(*) > 64)),
        |ver AS (SELECT n.doc_id AS new_id, c.doc_id AS corpus_id,
        |        n.pos AS pos_new, c.pos AS pos_corpus
        | FROM safe_new n JOIN cfp1 c ON n.fp = c.fp
        | JOIN drp tn ON n.doc_id = tn.doc_id
        | JOIN docs tc ON c.doc_id = tc.doc_id
        | WHERE substr(tn.text, CAST(n.pos AS INTEGER), 30) = substr(tc.text, CAST(c.pos AS INTEGER), 30)),
        |sel AS (SELECT new_id, corpus_id, pos_new, pos_corpus,
        |  row_number() OVER (PARTITION BY new_id, corpus_id ORDER BY pos_new, pos_corpus) AS rn,
        |  count(*) OVER (PARTITION BY new_id, corpus_id) AS n
        | FROM ver)
        |SELECT new_id, corpus_id, CAST(n AS BIGINT) AS n_spans,
        |  CAST(pos_new AS INTEGER) AS pos_new, CAST(pos_corpus AS INTEGER) AS pos_corpus
        |FROM sel WHERE rn = 1 ORDER BY new_id, corpus_id""".stripMargin,
    "q_outliers" ->
      // the engine's exact-moment formula replayed verbatim (decimal
      // sums → double ratios → IEEE sqrt — NOT avg/stddev_pop, whose
      // double accumulation is order-dependent); planted 100× rows
      // separate cleanly (z≈30 vs ≤0.3) so no boundary comparisons
      """WITH c AS (SELECT o_orderpriority AS g,
        |  CASE WHEN o_orderkey % 997 = 0 THEN o_totalprice * 100
        |       ELSE o_totalprice END AS amount FROM orders),
        |s AS (SELECT g, count(amount) AS n,
        |  CAST(sum(CAST(amount AS DECIMAL(18,4))) AS DOUBLE)/count(amount) AS m,
        |  CAST(sum(CAST(amount AS DECIMAL(19,4)) * CAST(amount AS DECIMAL(19,4))) AS DOUBLE)/count(amount) AS ex2
        | FROM c GROUP BY g),
        |j AS (SELECT c.g, c.amount, s.n, s.m,
        |  sqrt(greatest(s.ex2 - s.m*s.m, 0)) AS sd FROM c JOIN s USING (g))
        |SELECT g AS o_orderpriority, count(*) AS n_outliers,
        | min(amount) AS min_outlier, max(amount) AS max_outlier
        |FROM j WHERE n >= 2 AND sd > 0 AND abs(amount - m) > 3.0*sd
        |GROUP BY g ORDER BY o_orderpriority""".stripMargin,
    "q_pps_sample" ->
      // systematic PPS reproduced integer-exactly: HUGEINT cumulative
      // sums over the identical md5 order, integral // division — the
      // selected set and repeat counts are bit-identical cross-engine
      """WITH t AS (SELECT lang, doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS HUGEINT) AS w,
        |  md5(CAST(doc_id AS VARCHAR) || 's1') AS ord
        | FROM documents WHERE len(trim(text)) > 0),
        |c AS (SELECT lang, doc_id, w,
        |  sum(w) OVER (PARTITION BY lang ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(w) OVER (PARTITION BY lang) AS tot
        | FROM t WHERE w > 0)
        |SELECT lang, doc_id, CAST(w AS BIGINT) AS weight,
        | CAST((cum*10)//tot - ((cum-w)*10)//tot AS BIGINT) AS n_hits
        |FROM c WHERE (cum*10)//tot > ((cum-w)*10)//tot
        |ORDER BY lang, doc_id""".stripMargin,
    "q_vocab_div" ->
      """WITH wa AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 0),
        |ca AS (SELECT token, count(*) AS ca FROM wa GROUP BY token),
        |wb AS (SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents WHERE doc_id % 2 = 1),
        |cb AS (SELECT token, count(*) AS cb FROM wb GROUP BY token),
        |j AS (SELECT coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
        |  FROM ca FULL OUTER JOIN cb USING (token)),
        |tot AS (SELECT sum(ca) AS ta, sum(cb) AS tb FROM j),
        |terms AS (SELECT ca, cb, ta, tb,
        |  CAST(ca AS DOUBLE)/ta AS p, CAST(cb AS DOUBLE)/tb AS q FROM j, tot),
        |r AS (SELECT ca, cb, ta, tb,
        |  CAST(round(CASE WHEN p > 0 THEN p*ln(2.0*p/(p+q)) ELSE 0.0 END, 9) AS DECIMAL(28,9)) AS tp,
        |  CAST(round(CASE WHEN q > 0 THEN q*ln(2.0*q/(p+q)) ELSE 0.0 END, 9) AS DECIMAL(28,9)) AS tq
        | FROM terms)
        |SELECT 0.5*CAST(sum(tp) AS DOUBLE) + 0.5*CAST(sum(tq) AS DOUBLE) AS js_divergence,
        | CAST(max(ta) AS BIGINT) AS n_tokens_a, CAST(max(tb) AS BIGINT) AS n_tokens_b,
        | CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_a,
        | CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_b
        |FROM r""".stripMargin,
    "q_profile" -> Seq("o_custkey", "o_orderkey", "o_totalprice").map(c =>
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
         | CAST(min($c) AS DOUBLE) AS min, CAST(max($c) AS DOUBLE) AS max,
         | CAST(sum(CAST($c AS DECIMAL(38,8))) AS DOUBLE) / count($c) AS mean
         |FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),
    "q_interval_join" ->
      """WITH a AS (SELECT o_orderkey AS a_id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS a_start
        | FROM orders WHERE o_orderkey % 97 = 0),
        |b AS (SELECT o_orderkey AS b_id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS b_start
        | FROM orders WHERE o_orderkey % 199 = 0)
        |SELECT a_id, b_id, a_start, b_start
        |FROM a JOIN b ON a_start <= b_start + 30 AND b_start <= a_start + 21
        |ORDER BY a_id, b_id""".stripMargin,
    "q_range_join" ->
      """WITH p AS (SELECT o_orderkey AS point_id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
        | FROM orders WHERE o_orderkey % 7 = 0),
        |i AS (SELECT o_orderkey AS interval_id,
        |  CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS start_day
        | FROM orders WHERE o_orderkey % 199 = 0)
        |SELECT point_id, interval_id, day
        |FROM p JOIN i ON day BETWEEN start_day AND start_day + 30
        |ORDER BY point_id, interval_id""".stripMargin,
    "q_chunk" ->
      // fixed 0..511 start grid + filter stands in for a lateral
      // generate_series (docs are ≤ a few hundred tokens; chunkByTokens
      // itself has no such bound)
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |c AS (SELECT doc_id, toks, n, g.st AS st
        |  FROM s, generate_series(0, 511, 24) g(st)
        |  WHERE g.st <= greatest(0, CAST(ceil(CAST(n - 32 AS DOUBLE)/24) AS INTEGER)*24))
        |SELECT doc_id, CAST(st/24 AS INTEGER) AS chunk_idx,
        | array_to_string(list_slice(toks, st+1, least(st+32, n)), ' ') AS chunk_text,
        | CAST(least(32, n - st) AS INTEGER) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_audio_fp" ->
      // fingerprint bit f set iff amp rises frame f→f+1, i.e. doc_id
      // bit f+1 set and bit f clear
      """WITH f AS (SELECT doc_id, CAST(g.f AS INTEGER) AS f
        |  FROM documents, generate_series(0, 14) g(f))
        |SELECT doc_id,
        | CAST(coalesce(sum(CASE WHEN ((doc_id >> (f+1)) & 1) = 1
        |    AND ((doc_id >> f) & 1) = 0
        |   THEN (1::BIGINT << f) ELSE 0 END), 0) AS BIGINT) AS afp
        |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_image_phash" ->
      // the dHash oracle: synthetic colors depend only on x, so the 8×8
      // luma plane is 8 identical rows; difference bits at y·7+x
      """WITH gx AS (SELECT doc_id, CAST(g.x AS INTEGER) AS x
        |  FROM documents, generate_series(0, 7) g(x)),
        |rgb AS (SELECT doc_id, x,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS INTEGER)
        |       ELSE CAST(x*255//7 AS INTEGER) END AS r,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*7 + 3) % 256 AS INTEGER)
        |       ELSE CAST(doc_id % 256 AS INTEGER) END AS g,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*13 + 5) % 256 AS INTEGER)
        |       ELSE CAST(255 - x*255//7 AS INTEGER) END AS b
        | FROM gx),
        |lum AS (SELECT doc_id, x, (299*r + 587*g + 114*b)//1000 AS l FROM rgb),
        |bits AS (SELECT a.doc_id, a.x,
        |  CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bit
        | FROM lum a JOIN lum b ON a.doc_id = b.doc_id AND b.x = a.x + 1
        | WHERE a.x < 7)
        |SELECT doc_id,
        | CAST(coalesce(sum(bit * (1::BIGINT << (y.y*7 + x))), 0) AS BIGINT) AS phash
        |FROM bits, generate_series(0, 7) y(y)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top10" ->
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        | CAST(SUM(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey=o.o_orderkey
        | JOIN customer c ON o.o_custkey=c.c_custkey
        |WHERE c.c_mktsegment='BUILDING' AND o.o_orderdate < TIMESTAMP '1998-07-01'
        | AND l.l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "q_a2_sortedset" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
        | string_agg(DISTINCT l_linestatus, '; ' ORDER BY l_linestatus) AS statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_a4_masked" ->
      """SELECT
        | CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(27,2)) END) AS DOUBLE) AS returned_qty,
        | CAST(SUM(CASE WHEN EXTRACT(year FROM l_shipdate)=1997 THEN CAST(l_quantity AS DECIMAL(27,2)) END) AS DOUBLE) AS qty_1997,
        | CAST(SUM(CASE WHEN l_discount>0.05 THEN CAST(l_quantity AS DECIMAL(27,2)) END) AS DOUBLE) AS high_disc_qty
        |FROM lineitem""".stripMargin,
    "q_a7_window_count" ->
      """SELECT doc_id, lang, count(*) OVER (PARTITION BY lang) AS lang_count
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_a8_hist" ->
      """SELECT CAST(floor(o_totalprice/20000)*20000 AS BIGINT) AS bucket, count(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_a10_pivot" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS f_total,
        | CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS o_total,
        | CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(27,2)) END) AS DOUBLE) AS p_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_a11_summary" ->
      """SELECT metric, value FROM (
        | SELECT 'n_orders' AS metric, CAST(count(*) AS DOUBLE) AS value FROM orders
        | UNION ALL SELECT 'total_value', CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) FROM orders
        | UNION ALL SELECT 'max_price', max(o_totalprice) FROM orders
        | UNION ALL SELECT 'min_price', min(o_totalprice) FROM orders
        |) ORDER BY metric""".stripMargin,
    "q_c_clean" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        | lower(regexp_replace(CAST(event_type AS VARCHAR), '\s+', '', 'g')) AS etype_norm,
        | CASE WHEN trim(CAST(event_type AS VARCHAR)) IN ('','0') THEN NULL ELSE event_type END AS etype_nn,
        | coalesce(value, 0.0) AS value_filled,
        | concat_ws('|', coalesce(CAST(event_type AS VARCHAR),'nan'), coalesce(CAST(user_id AS VARCHAR),'nan')) AS row_key
        |FROM events ORDER BY event_id""".stripMargin,
    "q_c20_dates" ->
      """SELECT o_orderkey,
        | date_trunc('month', o_orderdate) AS month_start,
        | o_orderdate + INTERVAL 1 MONTH AS next_month,
        | last_day(o_orderdate) AS month_end,
        | monthname(o_orderdate) AS month_name,
        | strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS parsed_back
        |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin,
    "q_d2_dup_after_first" ->
      """SELECT l_orderkey, l_linenumber FROM (
        | SELECT l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        | FROM lineitem) WHERE rn > 1 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_d3_dup_all" ->
      """SELECT l_orderkey, l_linenumber FROM (
        | SELECT l_orderkey, l_linenumber, count(*) OVER (PARTITION BY l_orderkey) AS n
        | FROM lineitem) WHERE n > 1 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_d4_dup_count" ->
      """SELECT l_orderkey, l_linenumber,
        | count(*) OVER (PARTITION BY l_orderkey) AS duplicate_count
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_d5_keepfirst" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        | SELECT l_orderkey, l_linenumber, l_quantity,
        |  row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS rn
        | FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q_d6_prefer" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM (
        | SELECT l_orderkey, l_linenumber, l_returnflag,
        |  row_number() OVER (PARTITION BY l_orderkey
        |   ORDER BY CASE WHEN l_returnflag='R' THEN 0 ELSE 1 END, l_linenumber, l_returnflag) AS rn
        | FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q_d8_metric" ->
      // coalesce: Spark counts a null key as its own duplicate group
      // (pandas duplicated() semantics); bare count(DISTINCT) would not
      "SELECT count(*) - count(DISTINCT coalesce(lang, chr(1))) AS duplicate_rows FROM documents",
    "q_dedup_exact" ->
      """SELECT md5(lower(regexp_replace(trim(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp,
        | min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q_j1_left" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders LEFT JOIN customer ON o_custkey=c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q_j3_right" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM orders RIGHT JOIN customer ON o_custkey=c_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "q_j4_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_j5_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_j6_containment" ->
      """SELECT c_custkey, s_suppkey FROM (
        | SELECT c.c_custkey, s.s_suppkey,
        |  row_number() OVER (PARTITION BY c.c_custkey ORDER BY s.s_suppkey NULLS LAST) AS rn
        | FROM customer c LEFT JOIN supplier s ON contains(c.c_name, substr(s.s_name, 9, 10))
        |) WHERE rn = 1 ORDER BY c_custkey""".stripMargin,
    "q_j7_key_discovery" ->
      """SELECT * FROM (
        | SELECT 'c_custkey' AS left_col, 'o_custkey' AS right_col,
        |  (SELECT count(*) FROM (SELECT DISTINCT CAST(c_custkey AS VARCHAR) v FROM customer WHERE c_custkey IS NOT NULL) t
        |   WHERE EXISTS (SELECT 1 FROM orders o WHERE CAST(o.o_custkey AS VARCHAR)=t.v)) AS overlap
        | UNION ALL
        | SELECT 'c_custkey', 'o_orderkey',
        |  (SELECT count(*) FROM (SELECT DISTINCT CAST(c_custkey AS VARCHAR) v FROM customer WHERE c_custkey IS NOT NULL) t
        |   WHERE EXISTS (SELECT 1 FROM orders o WHERE CAST(o.o_orderkey AS VARCHAR)=t.v))
        | UNION ALL
        | SELECT 'o_orderkey', 'l_orderkey',
        |  (SELECT count(*) FROM (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) v FROM orders WHERE o_orderkey IS NOT NULL) t
        |   WHERE EXISTS (SELECT 1 FROM lineitem l WHERE CAST(l.l_orderkey AS VARCHAR)=t.v))
        |) ORDER BY left_col, right_col""".stripMargin,
    "q_j8_union_common" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |UNION ALL
        |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus='F'
        |ORDER BY o_orderkey, o_totalprice""".stripMargin,
    "q_j9_append" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, NULL, NULL, o_orderpriority FROM orders WHERE o_orderstatus='F'
        |ORDER BY o_orderkey, o_custkey ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_bloom_join" ->
      // plain join replayed — bloom false positives must be invisible
      """SELECT o.o_orderpriority,
        | count(*) AS n_lines,
        | CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 150000.0
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "q_salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderpriority
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "q_upsert" ->
      // MERGE replay: updates override, inserts add, untouched rows
      // pass through (doubling a double is IEEE-exact cross-engine)
      """WITH upd AS (
        | SELECT c_custkey, c_name, c_nationkey, c_acctbal*2 AS c_acctbal, c_mktsegment
        | FROM customer WHERE c_custkey % 7 = 0
        | UNION ALL
        | SELECT -(c_custkey + 1) AS c_custkey, c_name, c_nationkey, c_acctbal,
        |   'NEW' AS c_mktsegment
        | FROM customer WHERE c_custkey % 11 = 0)
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM upd
        |UNION ALL
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |ORDER BY c_custkey""".stripMargin,
    "q_a2_salted" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
        | string_agg(DISTINCT l_linestatus, '; ' ORDER BY l_linestatus) AS statuses
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_recon" ->
      """WITH oa AS (
        | SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_spend,
        |  count(*) AS n_orders
        | FROM orders GROUP BY o_custkey)
        |SELECT c.c_custkey, c.c_acctbal, oa.o_custkey, oa.total_spend, oa.n_orders,
        | CASE WHEN c.c_custkey IS NOT NULL AND oa.o_custkey IS NOT NULL THEN 'both'
        |      WHEN oa.o_custkey IS NULL THEN 'left_only' ELSE 'right_only' END AS _merge
        |FROM customer c FULL OUTER JOIN oa ON c.c_custkey=oa.o_custkey
        |ORDER BY coalesce(c.c_custkey, oa.o_custkey)""".stripMargin,
    "q_recon_summary" ->
      """WITH oa AS (
        | SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total_spend,
        |  count(*) AS n_orders
        | FROM orders GROUP BY o_custkey),
        |d AS (
        | SELECT c.c_custkey, oa.o_custkey, oa.total_spend,
        |  CASE WHEN c.c_custkey IS NOT NULL AND oa.o_custkey IS NOT NULL THEN 'both'
        |       WHEN oa.o_custkey IS NULL THEN 'left_only' ELSE 'right_only' END AS _merge
        | FROM customer c FULL OUTER JOIN oa ON c.c_custkey=oa.o_custkey)
        |SELECT metric, value FROM (
        | SELECT 'matched_spend' AS metric,
        |  CAST(SUM(CASE WHEN _merge='both' THEN CAST(total_spend AS DECIMAL(27,2)) END) AS DOUBLE) AS value FROM d
        | UNION ALL SELECT 'matched_customers', CAST(count(CASE WHEN _merge='both' THEN 1 END) AS DOUBLE) FROM d
        | UNION ALL SELECT 'customer_only', CAST(count(CASE WHEN _merge='left_only' THEN 1 END) AS DOUBLE) FROM d
        | UNION ALL SELECT 'order_only_spend',
        |  coalesce(CAST(SUM(CASE WHEN _merge='right_only' THEN CAST(total_spend AS DECIMAL(27,2)) END) AS DOUBLE), 0.0) FROM d
        | UNION ALL SELECT 'total_spend_all', CAST(SUM(CAST(total_spend AS DECIMAL(27,2))) AS DOUBLE) FROM d
        |) ORDER BY metric""".stripMargin,
    "q_f_orders" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority, o_orderstatus
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
        | AND o_orderpriority IN ('1-URGENT','2-HIGH')
        | AND o_orderstatus <> 'P'
        | AND regexp_matches(o_orderpriority, '^[12]-')
        |ORDER BY o_orderkey""".stripMargin,
    "q_f3_nullkeep" ->
      """SELECT event_id, value FROM events
        |WHERE (value < 50 OR value IS NULL) AND event_type IN ('click','view')
        |ORDER BY event_id""".stripMargin,
    "q_p_project" ->
      """SELECT c_custkey, c_name AS customer_name, 'crm' AS src
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_p5_rowid" ->
      """SELECT s_suppkey, CAST(row_number() OVER (ORDER BY s_suppkey) AS BIGINT) AS row_id
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_o1_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_quantity DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,
    "q_o3_top1" ->
      """SELECT o_orderkey, o_orderdate FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1""".stripMargin,
    "q_v2_align" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS loyalty_score
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_w_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(row_number() OVER w AS INTEGER) AS rk,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2)))
        |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rk""".stripMargin,
    "q_keywords" ->
      // tf·round9(ln(N/df)) replayed; identical doubles ⇒ identical
      // ordering, ties on token
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |nn AS (SELECT count(*) AS n FROM documents),
        |dfx AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |sc AS (SELECT doc_id, token,
        |  tf * round(ln(CAST(nn.n AS DOUBLE) / df), 9) AS score
        | FROM tf JOIN dfx USING (token) CROSS JOIN nn),
        |r AS (SELECT doc_id, token, score, row_number() OVER (
        |  PARTITION BY doc_id ORDER BY score DESC, token) AS rk FROM sc)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, token,
        | round(score, 9) AS score
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q_quantile_gate" ->
      // discrete per-group median by rank, replayed with the same
      // (value, id) ascending order
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang
        |   ORDER BY n_chars NULLS FIRST, doc_id NULLS FIRST) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        | FROM documents),
        |t AS (SELECT lang, n_chars AS thr FROM r
        | WHERE rn = CAST(ceil(0.5 * n) AS BIGINT))
        |SELECT d.lang, d.doc_id, d.n_chars
        |FROM documents d JOIN t ON d.lang = t.lang AND d.n_chars >= t.thr
        |ORDER BY d.lang NULLS FIRST, d.doc_id""".stripMargin,
    "q_bpe_merges" ->
      // the same 8-step BPE training loop as chained CTEs: per step,
      // pair counts over the wrapped-symbol strings, (count DESC, lhs,
      // rhs) argmax, left-to-right non-overlapping replace
      graft.operators.BpeTrain.oracleSql(8),
    "q_bpe_encode" ->
      // the training chain's final state IS every word encoded; emit
      // the top-50 by frequency as joined token strings
      graft.operators.BpeTrain.encodeOracleSql(8, 50),
    "q_bpe_docs" ->
      // production-regime tokenization: 80-rule chain (the corpus's
      // 31-word vocab ceilings at 89 learnable merges, so 80 is the
      // deepest table with argmax margin), then every doc's token
      // stream checked by count + md5
      graft.operators.BpeTrain.docsOracleSql(80),
    "q_answer_parse" ->
      // identical synthesis + the notebook's DOTALL patterns in RE2;
      // regexp-based trim on both sides so newline handling agrees
      """WITH raw AS (SELECT doc_id,
        | CASE WHEN doc_id % 7 = 0 THEN
        |  '<|end|><|start|>assistant<|channel|>analysis<|message|>'
        |   || 'step:' || chr(10) || ' ' || substr(text, 1, 80) || ' ' || chr(10)
        |   || '<|end|>' || 'truncated'
        | ELSE
        |  '<|end|><|start|>assistant<|channel|>analysis<|message|>'
        |   || 'step:' || chr(10) || ' ' || substr(text, 1, 80) || ' ' || chr(10)
        |   || '<|end|>'
        |   || '<|start|>assistant<|channel|>final<|message|>'
        |   || ' final: ' || substr(text, 1, 40) || chr(10) || '<|return|>'
        | END AS raw FROM documents)
        |SELECT doc_id,
        | CASE WHEN regexp_matches(raw,
        |   '(?s)<\|end\|><\|start\|>assistant<\|channel\|>analysis<\|message\|>(.*?)<\|end\|>')
        |  THEN regexp_replace(regexp_extract(raw,
        |   '(?s)<\|end\|><\|start\|>assistant<\|channel\|>analysis<\|message\|>(.*?)<\|end\|>', 1),
        |   '^\s+|\s+$', '', 'g')
        |  ELSE 'N/A' END AS thinking,
        | CASE WHEN regexp_matches(raw,
        |   '(?s)<\|start\|>assistant<\|channel\|>final<\|message\|>(.*?)<\|return\|>')
        |  THEN regexp_replace(regexp_extract(raw,
        |   '(?s)<\|start\|>assistant<\|channel\|>final<\|message\|>(.*?)<\|return\|>', 1),
        |   '^\s+|\s+$', '', 'g')
        |  ELSE 'N/A' END AS final_text
        |FROM raw ORDER BY doc_id""".stripMargin,
    "q_oov" ->
      // identical tf-ranked vocab cutoff; OOV counts are exact integers
      """WITH tok AS (SELECT lang,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |v AS (SELECT token FROM (
        |  SELECT token, count(*) AS tf FROM tok GROUP BY token
        |  ORDER BY tf DESC, token LIMIT 1000)),
        |j AS (SELECT t.lang, v.token AS iv
        | FROM tok t LEFT JOIN v ON t.token = v.token)
        |SELECT lang, count(*) AS n_tokens,
        | count(CASE WHEN iv IS NULL THEN 1 END) AS n_oov,
        | round(CAST(count(CASE WHEN iv IS NULL THEN 1 END) AS DOUBLE)
        |   / count(*), 9) AS oov_rate
        |FROM j GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin,
    "q_entropy" ->
      // same 9dp-round-then-DECIMAL-sum ln terms; final H is one IEEE
      // expression over the exact decimal sum
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |c AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
        |d AS (SELECT doc_id,
        |  SUM(CAST(round(CAST(c AS DOUBLE) * ln(c), 9) AS DECIMAL(28,9))) AS s,
        |  CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY doc_id)
        |SELECT doc_id, n AS n_tokens,
        | round(ln(n) - CAST(s AS DOUBLE) / n, 9) AS entropy
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_text_stats" ->
      """WITH t AS (SELECT doc_id, text,
        |  string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents)
        |SELECT doc_id,
        | CAST(length(text) AS INTEGER) AS char_len,
        | CAST(len(toks) AS BIGINT) AS n_tokens,
        | CAST(length(text) AS DOUBLE) / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS avg_token_len,
        | CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
        |  / greatest(CAST(length(text) AS DOUBLE), 1.0) AS punct_ratio,
        | CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |  / greatest(CAST(length(text) AS DOUBLE), 1.0) AS digit_ratio,
        | CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','that','was'))) AS DOUBLE)
        |  / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS stopword_ratio,
        | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS bpe_tokens
        |FROM t ORDER BY doc_id""".stripMargin,
    "q_token_shards" ->
      // the oracle may use the global window the engine deliberately
      // avoids — DuckDB is single-node, the funnel-through-one-task
      // concern does not apply to it
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS running_total FROM t)
        |SELECT doc_id, n_tokens, CAST(running_total AS BIGINT) AS running_total,
        | CAST((running_total - n_tokens) // 2000 AS BIGINT) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_seq_pack" ->
      // same window/prefix-sum caveat as q_token_shards: the oracle may
      // use the single-node window the engine avoids
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS s
        | FROM t),
        |w AS (SELECT doc_id, n_tokens, s, s + n_tokens AS e FROM c WHERE n_tokens > 0),
        |x AS (SELECT doc_id, n_tokens, s, e,
        |  unnest(generate_series(s // 512, (e - 1) // 512)) AS seq_id FROM w)
        |SELECT doc_id, n_tokens, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(s, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_offset,
        |  CAST(greatest(s, seq_id * 512) - s AS BIGINT) AS doc_offset,
        |  CAST(least(e, (seq_id + 1) * 512) - greatest(s, seq_id * 512) AS BIGINT) AS span_len
        |FROM x ORDER BY doc_id, seq_id""".stripMargin,
    "q_pii_scan" ->
      // same injection, same three redaction passes (RE2-compatible
      // patterns, 'g' flag = Spark's replace-all), same per-source tag
      // counts; n_leaked = docs still containing '@' after redaction
      """WITH base AS (SELECT source, text ||
        |  CASE WHEN doc_id % 10 = 0
        |   THEN ' reach me at user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |   WHEN doc_id % 10 = 5 THEN ' call 415-555-1234 now' ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' account 12345678901234 on file'
        |   ELSE '' END AS t FROM documents),
        |r AS (SELECT source, regexp_replace(regexp_replace(regexp_replace(t,
        |  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |  '(\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ]?[0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
        |  '[0-9]{9,16}', '<NUM>', 'g') AS red FROM base)
        |SELECT source, count(*) AS n_docs,
        | CAST(sum(CASE WHEN red LIKE '%<EMAIL>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
        | CAST(sum(CASE WHEN red LIKE '%<PHONE>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
        | CAST(sum(CASE WHEN red LIKE '%<NUM>%' THEN 1 ELSE 0 END) AS BIGINT) AS n_num,
        | CAST(sum(CASE WHEN red LIKE '%@%' THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q_corpus_shuffle" ->
      // mirrors TextQuality.shuffleShards bit for bit: md5(':'||id) key,
      // first 56 digest bits pick the shard, per-shard row_number over
      // (key, id). The oracle's window is fine single-node; the engine's
      // is partitioned by shard on purpose
      """WITH t AS (SELECT doc_id,
        |  md5(':' || CAST(doc_id AS VARCHAR)) AS k FROM documents),
        |s AS (SELECT doc_id, k,
        |  ('0x' || substr(k, 1, 14))::BIGINT % 32 AS shard FROM t)
        |SELECT doc_id, shard,
        | CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "q_prep_pipeline" ->
      // same md5 literals end to end: fingerprint dedup (q_curate), split
      // thresholds (hashSplit 0.9/0.95), shard = first 56 digest bits of
      // md5('e1:'||id) mod 8 (q_corpus_shuffle idiom)
      s"""WITH t AS (SELECT doc_id,
         |  md5(lower(regexp_replace(trim(nfc_normalize(text)), '\\s+', ' ', 'g'))) AS fp,
         |  CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
         | FROM documents),
         |c AS (SELECT doc_id, n_tokens FROM (
         |  SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM t)
         | WHERE rn = 1 AND n_tokens >= 30),
         |sp AS (SELECT doc_id, n_tokens,
         |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.9)}' THEN 'train'
         |       WHEN md5(CAST(doc_id AS VARCHAR)) < '${TextFunctions.md5SampleThreshold(0.95)}' THEN 'val'
         |       ELSE 'test' END AS split,
         |  ('0x' || substr(md5('e1:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 8 AS shard
         | FROM c)
         |SELECT split, shard, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM sp GROUP BY split, shard
         |ORDER BY split NULLS FIRST, shard NULLS FIRST""".stripMargin,
    "q_mix_plan" ->
      // binary-exact weights (0.5, 0.125) make floor/ceil/least
      // arithmetic bit-identical across engines; token counting is the
      // q_text_stats split
      """WITH t AS (SELECT lang AS stratum,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS nt FROM documents),
        |g AS (SELECT stratum, count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens FROM t GROUP BY 1),
        |p AS (SELECT stratum, n_docs, n_tokens,
        |  CAST(CASE stratum WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.125
        |   WHEN 'es' THEN 0.125 WHEN 'fr' THEN 0.125 WHEN 'zh' THEN 0.125
        |   ELSE 0.0 END AS DOUBLE) AS weight FROM g),
        |q AS (SELECT stratum, n_docs, n_tokens, weight,
        |  CAST(floor(weight * CAST(50000 AS DOUBLE)) AS BIGINT) AS target_tokens FROM p)
        |SELECT stratum, n_docs, n_tokens, weight, target_tokens,
        | CASE WHEN n_tokens > 0
        |  THEN least(CAST(1.0 AS DOUBLE), CAST(target_tokens AS DOUBLE)/n_tokens)
        |  ELSE CAST(0.0 AS DOUBLE) END AS sample_rate,
        | CASE WHEN target_tokens = 0 OR n_tokens = 0 THEN CAST(0 AS BIGINT)
        |  ELSE CAST(ceil(CAST(target_tokens AS DOUBLE)/n_tokens) AS BIGINT) END AS epochs
        |FROM q ORDER BY stratum""".stripMargin,
    "q_repetition" ->
      // max_token_run needs gaps-and-islands + two windows in SQL; the
      // Spark side is a single map-side fold expression. Top-gram ties
      // break on (cnt DESC, gram DESC) in both engines.
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS tok, unnest(range(1, len(ws)+1)) AS ord FROM t),
        |runs AS (SELECT doc_id, tok, ord - row_number() OVER (PARTITION BY doc_id, tok ORDER BY ord) AS grp FROM tok),
        |maxrun AS (SELECT doc_id, max(cnt) AS max_token_run FROM (
        |  SELECT doc_id, count(*) AS cnt FROM runs GROUP BY doc_id, tok, grp) GROUP BY doc_id),
        |grams AS (SELECT doc_id, unnest([ws[i]||'_'||ws[i+1] for i in range(1, len(ws))]) AS gram FROM t),
        |gcnt AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2),
        |top AS (SELECT doc_id, gram, cnt,
        |  CAST(cnt AS DOUBLE)/sum(cnt) OVER (PARTITION BY doc_id) AS frac,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rn FROM gcnt)
        |SELECT t.doc_id,
        | CAST(len(ws) AS BIGINT) AS n_tokens,
        | CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_tokens,
        | CAST(len(ws) - len(list_distinct(ws)) AS DOUBLE)/greatest(len(ws), 1) AS dup_token_frac,
        | m.max_token_run,
        | tp.gram AS top_ngram,
        | COALESCE(tp.cnt, 0) AS top_ngram_count,
        | COALESCE(tp.frac, 0.0) AS top_ngram_frac
        |FROM t JOIN maxrun m USING (doc_id)
        |LEFT JOIN (SELECT * FROM top WHERE rn = 1) tp USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_image_meta" ->
      """SELECT doc_id, 'png' AS format,
        | CAST(64 + doc_id % 512 AS INTEGER) AS width,
        | CAST(48 + doc_id % 256 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_meta" ->
      // every 10th doc carries non-image bytes → invalid with null dims;
      // the rest are real 8×8 synthesized PNGs
      """SELECT doc_id,
        | doc_id % 10 <> 0 AS valid,
        | CASE WHEN doc_id % 10 <> 0 THEN 'png' END AS format,
        | CASE WHEN doc_id % 10 <> 0 THEN CAST(8 AS INTEGER) END AS width,
        | CASE WHEN doc_id % 10 <> 0 THEN CAST(8 AS INTEGER) END AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      // frame colors recomputed arithmetically: doc d frame f is a solid
      // ((5d+49f)%256, (11d+23f)%256, (3d+77f)%256) 8×8 GIF frame, so the
      // decoded mean equals the color exactly
      """WITH f AS (SELECT doc_id, CAST(g.f AS INTEGER) AS frame_idx
        |  FROM documents, generate_series(0, 3) g(f) WHERE g.f <= doc_id % 4)
        |SELECT doc_id, frame_idx,
        | CAST((doc_id*5 + frame_idx*49) % 256 AS DOUBLE) AS mean_r,
        | CAST((doc_id*11 + frame_idx*23) % 256 AS DOUBLE) AS mean_g,
        | CAST((doc_id*3 + frame_idx*77) % 256 AS DOUBLE) AS mean_b
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q_image_frames" ->
      // the decoded-pixel oracle: color depends only on x (8 identical
      // rows per column), so sums over the 8 x-values stand in for the
      // full 64-pixel grid — mean = sum_x/8, hist = 8·count_x. Integer
      // luma (299r+587g+114b)//1000 keeps every step exact cross-engine.
      """WITH px AS (SELECT doc_id, CAST(g.x AS INTEGER) AS x
        |  FROM documents, generate_series(0, 7) g(x)),
        |rgb AS (SELECT doc_id, x,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS INTEGER)
        |       ELSE CAST(x*255//7 AS INTEGER) END AS r,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*7 + 3) % 256 AS INTEGER)
        |       ELSE CAST(doc_id % 256 AS INTEGER) END AS g,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*13 + 5) % 256 AS INTEGER)
        |       ELSE CAST(255 - x*255//7 AS INTEGER) END AS b
        | FROM px),
        |lum AS (SELECT doc_id, r, g, b,
        |  (299*r + 587*g + 114*b)//1000 AS luma FROM rgb)
        |SELECT doc_id,
        | CAST(0 AS INTEGER) AS frame_idx,
        | CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        | CAST(sum(r) AS DOUBLE)/8 AS mean_r,
        | CAST(sum(g) AS DOUBLE)/8 AS mean_g,
        | CAST(sum(b) AS DOUBLE)/8 AS mean_b,
        | CAST(8*sum(CASE WHEN luma//32 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS h0,
        | CAST(8*sum(CASE WHEN luma//32 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS h1,
        | CAST(8*sum(CASE WHEN luma//32 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS h2,
        | CAST(8*sum(CASE WHEN luma//32 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS h3,
        | CAST(8*sum(CASE WHEN luma//32 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS h4,
        | CAST(8*sum(CASE WHEN luma//32 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS h5,
        | CAST(8*sum(CASE WHEN luma//32 = 6 THEN 1 ELSE 0 END) AS BIGINT) AS h6,
        | CAST(8*sum(CASE WHEN luma//32 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS h7
        |FROM lum GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_image_resize" ->
      // nearest-neighbor 8×8→4×4 samples source x' = 2x (y collapses —
      // color depends only on x), so resized means are the 4-point
      // averages of the original column colors
      """WITH px AS (SELECT doc_id, CAST(g.x AS INTEGER) AS x
        |  FROM documents, generate_series(0, 3) g(x)),
        |rgb AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 256 AS INTEGER)
        |       ELSE CAST((2*x)*255//7 AS INTEGER) END AS r,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*7 + 3) % 256 AS INTEGER)
        |       ELSE CAST(doc_id % 256 AS INTEGER) END AS g,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id*13 + 5) % 256 AS INTEGER)
        |       ELSE CAST(255 - (2*x)*255//7 AS INTEGER) END AS b
        | FROM px)
        |SELECT doc_id,
        | CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
        | CAST(sum(r) AS DOUBLE)/4 AS mean_r,
        | CAST(sum(g) AS DOUBLE)/4 AS mean_g,
        | CAST(sum(b) AS DOUBLE)/4 AS mean_b
        |FROM rgb GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_wav_meta" ->
      // expected header values recomputed arithmetically from the
      // synthesis parameters: ms = 40 + (doc_id % 60)*2 at 16 kHz mono
      // PCM16 → n_samples = 16·ms, duration = ms
      """SELECT doc_id,
        | CAST(16000 AS INTEGER) AS sample_rate,
        | CAST(1 AS INTEGER) AS channels,
        | CAST(16 AS INTEGER) AS bits_per_sample,
        | CAST(16*(40 + (doc_id % 60)*2) AS BIGINT) AS n_samples,
        | CAST(40 + (doc_id % 60)*2 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_wav_resample" ->
      // decimation headers closed-form: rate halves, sample count
      // halves (16·ms is even), duration in ms is unchanged
      """SELECT doc_id,
        | CAST(8000 AS INTEGER) AS sample_rate,
        | CAST(8*(40 + (doc_id % 60)*2) AS BIGINT) AS n_samples,
        | CAST(40 + (doc_id % 60)*2 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_lang_id" ->
      // fully deterministic cross-engine: scores are exact integer
      // ratios (no transcendentals), argmax ties break on the lang
      // string via struct ordering in BOTH engines
      """WITH t AS (SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, lang, list_max([
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('der','die','und','das','ist','von','mit','den','nicht','ein'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'de'},
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','a','in','is','it','that','was'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'en'},
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','los','se','no'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'es'},
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('le','la','et','les','des','en','un','du','une','est'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'fr'},
        |  {'score': CAST(len(list_filter(toks, x -> x IN ('的','了','是','我','不','在','有','他','这','中'))) AS DOUBLE)/greatest(len(toks), 1), 'lang': 'zh'}
        | ]) AS best FROM t)
        |SELECT doc_id, lang,
        | CASE WHEN best.score >= 0.05 THEN best.lang ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |  [list_aggregate(ws[i:i+3], 'string_agg', '_') for i in range(1, len(ws)-2)])) AS gram FROM w),
        |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM g WHERE doc_id % 50 <> 0 GROUP BY 1),
        |hits AS (SELECT g.doc_id, count(*) AS n_hit FROM g JOIN ev USING (gram)
        | WHERE g.doc_id % 50 <> 0 GROUP BY 1)
        |SELECT h.doc_id, h.n_hit, t.n_grams,
        | CAST(h.n_hit AS DOUBLE)/t.n_grams AS overlap_frac
        |FROM hits h JOIN tot t USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_dedup_clusters" ->
      // connected components of the jaccard≥0.8 pair graph via a
      // recursive reachability CTE: comp(node) = min reachable node id —
      // identical labels to the Spark large-star/small-star result
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
        |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
        | COALESCE(c.comp, d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN comps c ON d.doc_id = c.node
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_clusters_sampled" ->
      // the q_dedup_clusters CTEs over the md5 quarter-sample — the
      // sf10 gate form (the full exact pair stage is the known JIT-band
      // swinger at 100×; full-exact stays on the oracle gates)
      s"""WITH RECURSIVE docs_s AS (SELECT * FROM ${sampledDocsSrc(0.25)}),
        |w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM docs_s),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
        |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
        | COALESCE(c.comp, d.doc_id) = d.doc_id AS is_canonical
        |FROM docs_s d LEFT JOIN comps c ON d.doc_id = c.node
        |ORDER BY doc_id""".stripMargin,
    "q_cluster_rollup" ->
      // reachability CTE + per-cluster aggregate joined to the min-id
      // canonical row
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
        |a AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
        |  d.source, d.n_chars
        | FROM documents d LEFT JOIN comps c ON d.doc_id = c.node),
        |r AS (SELECT cluster_id, count(*) AS cluster_size,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(27,0))) AS DOUBLE) AS total_chars,
        |  count(DISTINCT source) AS n_sources FROM a GROUP BY cluster_id)
        |SELECT a.doc_id, a.cluster_id, r.cluster_size, r.total_chars, r.n_sources
        |FROM a JOIN r USING (cluster_id) WHERE a.doc_id = a.cluster_id
        |ORDER BY a.doc_id""".stripMargin,
    "q_cluster_keep_best" ->
      // same reachability CTE; survivor = argmax(n_chars, tie min id)
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
        |a AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id, d.n_chars
        | FROM documents d LEFT JOIN comps c ON d.doc_id = c.node),
        |best AS (SELECT cluster_id, doc_id AS keep FROM (
        | SELECT cluster_id, doc_id,
        |  row_number() OVER (PARTITION BY cluster_id
        |   ORDER BY n_chars DESC, doc_id) AS rn FROM a) WHERE rn = 1)
        |SELECT a.doc_id, a.cluster_id, a.doc_id = b.keep AS is_canonical
        |FROM a JOIN best b USING (cluster_id)
        |ORDER BY doc_id""".stripMargin,
    "q_inc_clusters" ->
      // the FULL-recompute CTE, verbatim from q_dedup_clusters: the
      // incremental star-replay path must land on identical labels
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
        |SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id,
        | COALESCE(c.comp, d.doc_id) = d.doc_id AS is_canonical
        |FROM documents d LEFT JOIN comps c ON d.doc_id = c.node
        |ORDER BY doc_id""".stripMargin,
    "q_subset_dup" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | CAST(common AS DOUBLE)/least(sa.sz, sb.sz) AS containment
        |FROM cand JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        |WHERE CAST(common AS DOUBLE)/least(sa.sz, sb.sz) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_cluster_stats" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |prs AS (SELECT doc_a, doc_b FROM cand
        | JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
        |edges AS (SELECT doc_a AS u, doc_b AS v FROM prs
        | UNION SELECT doc_b, doc_a FROM prs),
        |reach(node, comp) AS (
        | SELECT u, u FROM edges
        | UNION
        | SELECT e.u, r.comp FROM edges e JOIN reach r ON e.v = r.node),
        |comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
        |assign AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS cluster_id
        | FROM documents d LEFT JOIN comps c ON d.doc_id = c.node),
        |sz2 AS (SELECT cluster_id, count(*) AS n_members FROM assign GROUP BY 1)
        |SELECT n_members, count(*) AS n_clusters FROM sz2 GROUP BY 1
        |ORDER BY n_members""".stripMargin,
    "q_jaccard_pairs" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) AS jaccard
        |FROM pairs JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        |WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8
        |ORDER BY doc_a, doc_b""".stripMargin,
    "q_minhash_pairs_md5" ->
      // mirrors minhashLshPairsPortable bit for bit: same "_"-joined
      // shingles, same md5-seeded double-hashing family h_i = a + i*b
      // over the digest's two 48-bit halves, same md5-of-band-slice
      // buckets, est_jaccard = agree/16 (exact power-of-two division —
      // bit-identical doubles)
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |ab AS (SELECT doc_id,
         |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
         |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
         |sig AS (SELECT doc_id,
         |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
         | FROM ab GROUP BY doc_id),
         |bd AS (SELECT doc_id, sig, band,
         |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.sig AS sig_a, b.sig AS sig_b
         | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id),
         |scored AS (SELECT doc_a, doc_b,
         |  CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 AS est_jaccard
         | FROM cand)
         |SELECT doc_a, doc_b, est_jaccard FROM scored
         |WHERE est_jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_lsh_recall" ->
      // the exact-Jaccard CTEs of q_jaccard_pairs + the portable-LSH
      // CTEs of q_minhash_pairs_md5 (both at threshold 0.8), full-outer
      // joined into confusion counts; recall/precision are
      // bigint-over-bigint double divisions (bit-identical IEEE)
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
         |sh AS (SELECT doc_id, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |cpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |exact AS (SELECT doc_a, doc_b
         | FROM cpairs JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
         | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8),
         |ab AS (SELECT doc_id,
         |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
         |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
         |sig AS (SELECT doc_id,
         |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
         | FROM ab GROUP BY doc_id),
         |bd AS (SELECT doc_id, sig, band,
         |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.sig AS sig_a, b.sig AS sig_b
         | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id),
         |lshp AS (SELECT doc_a, doc_b FROM cand
         | WHERE CAST(len(list_filter(list_zip(sig_a, sig_b), x -> x[1] = x[2])) AS DOUBLE) / 16 >= 0.8),
         |j AS (SELECT e.doc_a AS ea, l.doc_a AS la FROM exact e
         | FULL OUTER JOIN lshp l ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b),
         |c AS (SELECT count(ea) AS n_exact, count(la) AS n_lsh,
         |  count(CASE WHEN ea IS NOT NULL AND la IS NOT NULL THEN 1 END) AS n_hit FROM j)
         |SELECT n_exact, n_lsh, n_hit,
         | CASE WHEN n_exact > 0 THEN CAST(n_hit AS DOUBLE)/n_exact END AS recall,
         | CASE WHEN n_lsh > 0 THEN CAST(n_hit AS DOUBLE)/n_lsh END AS "precision"
         |FROM c""".stripMargin,
    "q_block_dedup" ->
      // 16-token non-overlapping blocks (the q_chunk grid at stride =
      // size), keep-first = row_number over md5(block) ordered by
      // (doc_id, block_idx), reassembly = ordered string_agg of
      // survivors; md5 hashes identically cross-engine
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |b AS (SELECT doc_id, CAST(st/16 AS INTEGER) AS block_idx,
        |  array_to_string(list_slice(toks, st+1, least(st+16, n)), ' ') AS block_text,
        |  least(16, n - st) AS n_tok
        | FROM s, generate_series(0, 511, 16) g(st)
        | WHERE g.st <= greatest(0, CAST(ceil(CAST(n - 16 AS DOUBLE)/16) AS INTEGER)*16)),
        |k AS (SELECT *, row_number() OVER (PARTITION BY md5(block_text)
        |   ORDER BY doc_id, block_idx) AS rn FROM b)
        |SELECT doc_id,
        | count(*) AS n_blocks,
        | count(*) FILTER (WHERE rn = 1) AS n_blocks_kept,
        | CAST(coalesce(sum(n_tok) FILTER (WHERE rn > 1), 0) AS BIGINT) AS n_tokens_removed,
        | coalesce(string_agg(block_text, ' ' ORDER BY block_idx) FILTER (WHERE rn = 1), '') AS text_deduped
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_boilerplate" ->
      // 8-token blocks; hot = blocks in ≥3 distinct docs; every hot
      // occurrence stripped (not keep-first), same reassembly shape
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        |b AS (SELECT doc_id, CAST(st/8 AS INTEGER) AS block_idx,
        |  array_to_string(list_slice(toks, st+1, least(st+8, n)), ' ') AS block_text,
        |  least(8, n - st) AS n_tok
        | FROM s, generate_series(0, 511, 8) g(st)
        | WHERE g.st <= greatest(0, CAST(ceil(CAST(n - 8 AS DOUBLE)/8) AS INTEGER)*8)),
        |hot AS (SELECT md5(block_text) AS fp FROM b
        | GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
        |k AS (SELECT b.*, h.fp IS NOT NULL AS is_hot
        | FROM b LEFT JOIN hot h ON md5(b.block_text) = h.fp)
        |SELECT doc_id,
        | count(*) AS n_blocks,
        | count(*) FILTER (WHERE NOT is_hot) AS n_blocks_kept,
        | CAST(coalesce(sum(n_tok) FILTER (WHERE is_hot), 0) AS BIGINT) AS n_tokens_removed,
        | coalesce(string_agg(block_text, ' ' ORDER BY block_idx) FILTER (WHERE NOT is_hot), '') AS text_cleaned
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_cross_dedup_md5" ->
      // same sig/band CTE shape as q_minhash_pairs_md5, applied to the
      // asymmetric (drop × corpus) screen; est_jaccard = agree/16 exact
      s"""WITH docs2 AS (
         |  SELECT doc_id, text, 'corpus' AS side FROM documents
         |  UNION ALL
         |  SELECT doc_id + 500000 AS doc_id, text, 'new' AS side
         |  FROM documents WHERE doc_id % 7 = 0),
         |w AS (SELECT doc_id, side, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM docs2),
         |sh AS (SELECT doc_id, side, unnest(list_distinct(
         |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
         |ab AS (SELECT doc_id, side,
         |  ('0x' || substr(md5(s), 1, 12))::BIGINT AS a,
         |  ('0x' || substr(md5(s), 13, 12))::BIGINT AS b FROM sh),
         |sig AS (SELECT doc_id, side,
         |  [${(0 until 16).map(i => s"min(a + $i*b)").mkString(", ")}] AS sig
         | FROM ab GROUP BY doc_id, side),
         |bd AS (SELECT doc_id, side, sig, band,
         |  md5(array_to_string(list_slice(sig, band*4+1, band*4+4), '|')) AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT nw.doc_id AS new_id, cp.doc_id AS corpus_id,
         |  nw.sig AS sig_new, cp.sig AS sig_corpus
         | FROM bd nw JOIN bd cp ON nw.band = cp.band AND nw.bucket = cp.bucket
         | WHERE nw.side = 'new' AND cp.side = 'corpus'),
         |scored AS (SELECT new_id, corpus_id,
         |  CAST(len(list_filter(list_zip(sig_new, sig_corpus), x -> x[1] = x[2])) AS DOUBLE) / 16 AS est_jaccard
         | FROM cand)
         |SELECT new_id, corpus_id, est_jaccard FROM scored
         |WHERE est_jaccard >= 0.8
         |ORDER BY new_id, corpus_id""".stripMargin,
    "q_simhash_pairs_md5" ->
      // mirrors simhashPairsPortable bit for bit: 56-bit md5 token
      // hashes, per-occurrence majority vote (ties → 0), 4×14-bit band
      // buckets, popcount-of-xor verify
      s"""WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t FROM documents),
         |th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 14))::BIGINT AS h FROM w),
         |v AS (SELECT doc_id,
         |  ${(0 until 56).map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b").mkString(",\n         |  ")}
         | FROM th GROUP BY doc_id),
         |sig AS (SELECT doc_id,
         |  ${(0 until 56).map(b => s"(CASE WHEN v$b > 0 THEN (1::BIGINT << $b) ELSE 0 END)").mkString(" +\n         |  ")} AS simhash
         | FROM v),
         |bd AS (SELECT doc_id, simhash, band,
         |  (simhash >> (band * 14)) & 16383 AS bucket
         | FROM sig, (SELECT unnest(range(0, 4)) AS band) bands),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         | FROM bd a JOIN bd b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "q_setops" ->
      """WITH hv AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000),
        |b AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_mktsegment='BUILDING')
        |SELECT custkey, 'intersect' AS op FROM (SELECT custkey FROM hv INTERSECT SELECT custkey FROM b)
        |UNION ALL
        |SELECT custkey, 'except' FROM (SELECT custkey FROM hv EXCEPT SELECT custkey FROM b)
        |ORDER BY op, custkey""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        | coalesce(o_orderpriority,'ALL') AS priority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS total,
        | count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        | CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
        | CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS INTEGER) AS drnk,
        | CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS quartile
        |FROM orders QUALIFY rnk <= 20
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,
    "q_random_proj" ->
      // the sign matrix re-derived cell by cell from md5 parity inside
      // a nested lambda; the projection is the same left fold as the
      // native dot (0-init vs first-element-init agree exactly — the
      // q_ann_topk raw-double convention)
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (SELECT vec_id, list_transform(generate_series(1, 8), j ->
        |  list_reduce(list_transform(generate_series(1, 64), i ->
        |    e[i] * (CASE WHEN ('0x'||substr(md5(CAST(i AS VARCHAR)||':'||CAST(j AS VARCHAR)||':rp'),1,1))::BIGINT % 2 = 0
        |            THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b)) AS pr
        | FROM e0)
        |SELECT vec_id, pr[1] AS p1, pr[2] AS p2, pr[3] AS p3, pr[4] AS p4,
        |  pr[5] AS p5, pr[6] AS p6, pr[7] AS p7, pr[8] AS p8
        |FROM p ORDER BY vec_id""".stripMargin,
    "q_rp_recall" ->
      // both searches replayed with the q_ann_topk normalize/top-k
      // CTEs — exact over the raw 64-dim vectors, approximate over the
      // re-derived 8-dim projections — then the recall overlap
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
        |p AS (SELECT vec_id, list_transform(generate_series(1, 8), j ->
        |  list_reduce(list_transform(generate_series(1, 64), i ->
        |    e[i] * (CASE WHEN ('0x'||substr(md5(CAST(i AS VARCHAR)||':'||CAST(j AS VARCHAR)||':rp'),1,1))::BIGINT % 2 = 0
        |            THEN 1.0 ELSE -1.0 END)), (a,b) -> a + b)) AS e
        | FROM e0),
        |eq AS (SELECT vec_id qid, list_transform(e,
        |  x -> x / sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b))) AS v FROM e0 WHERE vec_id<10),
        |ec AS (SELECT vec_id nid, list_transform(e,
        |  x -> x / sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b))) AS v FROM e0),
        |es AS (SELECT qid, nid, list_reduce(list_transform(list_zip(eq.v, ec.v), x -> x[1]*x[2]), (a,b)->a+b) AS sim
        | FROM eq, ec WHERE qid<>nid),
        |er AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM es),
        |pq AS (SELECT vec_id qid, list_transform(e,
        |  x -> x / sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b))) AS v FROM p WHERE vec_id<10),
        |pc AS (SELECT vec_id nid, list_transform(e,
        |  x -> x / sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b))) AS v FROM p),
        |ps AS (SELECT qid, nid, list_reduce(list_transform(list_zip(pq.v, pc.v), x -> x[1]*x[2]), (a,b)->a+b) AS sim
        | FROM pq, pc WHERE qid<>nid),
        |prr AS (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM ps),
        |ee AS (SELECT qid, nid, 1 AS fe FROM er WHERE rank<=5),
        |pp AS (SELECT qid, nid, 1 AS fp FROM prr WHERE rank<=5)
        |SELECT CAST(count(fe) AS BIGINT) AS n_exact,
        |  CAST(count(fp) AS BIGINT) AS n_proj,
        |  CAST(count(CASE WHEN fe IS NOT NULL AND fp IS NOT NULL THEN 1 END) AS BIGINT) AS n_hit,
        |  CASE WHEN count(fe) > 0
        |    THEN CAST(count(CASE WHEN fe IS NOT NULL AND fp IS NOT NULL THEN 1 END) AS DOUBLE) / count(fe)
        |  END AS recall
        |FROM ee FULL OUTER JOIN pp USING (qid, nid)""".stripMargin,
    "q_ann_topk" ->
      """WITH q0 AS (SELECT vec_id qid, embedding::DOUBLE[] qe FROM embeddings WHERE vec_id<10),
        |c0 AS (SELECT vec_id nid, embedding::DOUBLE[] ce FROM embeddings),
        |q AS (SELECT qid, list_transform(qe,
        |  x -> x / sqrt(list_reduce(list_transform(qe, y->y*y),(a,b)->a+b))) AS qn FROM q0),
        |c AS (SELECT nid, list_transform(ce,
        |  x -> x / sqrt(list_reduce(list_transform(ce, y->y*y),(a,b)->a+b))) AS cn FROM c0),
        |s AS (SELECT qid, nid,
        |  list_reduce(list_transform(list_zip(qn, cn), x -> x[1]*x[2]), (a,b)->a+b) AS sim
        | FROM q, c WHERE qid<>nid),
        |r AS (SELECT qid AS query_id, nid AS neighbor_id, sim,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM r WHERE rank<=5 ORDER BY query_id, rank""".stripMargin,
    "q_ann_ivf" ->
      // full IVF replay: normalize, modulo centroid set, argmax-dot
      // corpus assignment (tie → lowest cent_id, same as the struct-max),
      // nprobe=4 query probe list, within-cell cosine, top-5
      annIvfOracle,
    "q_ann_ivf_capped" ->
      // cap = observed max occupancy ⇒ definitionally the uncapped
      // probe; the shared oracle pins the cap machinery as identity
      annIvfOracle,
    "q_ivf_cells" ->
      // the same assignment CTE, aggregated to per-cell occupancy
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |n0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
        |n AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
        |cents AS (SELECT vec_id AS cent_id, v AS cv FROM n WHERE vec_id % 25 = 0),
        |ca AS (SELECT vec_id, cent_id FROM (
        |  SELECT nn.vec_id, c.cent_id, row_number() OVER (
        |    PARTITION BY nn.vec_id ORDER BY
        |    list_reduce(list_transform(list_zip(nn.v, c.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    c.cent_id) AS rn
        |  FROM n nn CROSS JOIN cents c) WHERE rn = 1)
        |SELECT cent_id, CAST(count(*) AS BIGINT) AS n_vectors
        |FROM ca GROUP BY cent_id
        |ORDER BY n_vectors DESC, cent_id LIMIT 20""".stripMargin,
    "q_ann_ivf_md5" ->
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |n0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(p,q)->p+q)) AS nrm FROM e0),
        |n AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
        |cents AS (SELECT vec_id AS cent_id, v AS cv FROM n
        | ORDER BY md5(vec_id::VARCHAR || ':7'), vec_id LIMIT 25),
        |ca AS (SELECT vec_id, cent_id, v FROM (
        |  SELECT nn.vec_id, c.cent_id, nn.v, row_number() OVER (
        |    PARTITION BY nn.vec_id ORDER BY
        |    list_reduce(list_transform(list_zip(nn.v, c.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    c.cent_id) AS rn
        |  FROM n nn CROSS JOIN cents c) WHERE rn = 1),
        |qa AS (SELECT vec_id AS query_id, cent_id, v AS qv FROM (
        |  SELECT nn.vec_id, c.cent_id, nn.v, row_number() OVER (
        |    PARTITION BY nn.vec_id ORDER BY
        |    list_reduce(list_transform(list_zip(nn.v, c.cv), x->x[1]*x[2]),(p,q)->p+q) DESC,
        |    c.cent_id) AS rn
        |  FROM n nn CROSS JOIN cents c WHERE nn.vec_id < 10) WHERE rn <= 4),
        |s AS (SELECT qa.query_id, ca.vec_id AS neighbor_id,
        |  list_reduce(list_transform(list_zip(qa.qv, ca.v), x->x[1]*x[2]),(p,q)->p+q) AS sim
        | FROM qa JOIN ca USING (cent_id) WHERE qa.query_id <> ca.vec_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM s)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM r WHERE rank<=5 ORDER BY query_id, rank""".stripMargin,
    "q_ann_quantized" ->
      // int8 quantization is exactly reproducible cross-engine: the
      // integer dot is exact, the only float ops (normalize, scale,
      // rescale) are the same IEEE doubles in the same order
      """WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        |n0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_transform(e, y->y*y),(a,b)->a+b)) AS nrm FROM e0),
        |n AS (SELECT vec_id, list_transform(e,
        |  x -> CASE WHEN nrm = 0 THEN 0.0 ELSE x / nrm END) AS v FROM n0),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM n),
        |qv AS (SELECT vec_id, scale,
        |  list_transform(v, x -> CAST(round(
        |    CASE WHEN scale = 0 THEN 0.0 ELSE x / scale END) AS INTEGER)) AS q FROM s),
        |p AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |  CAST(list_reduce(list_transform(list_zip(a.q, b.q), x -> x[1]*x[2]), (m,w)->m+w) AS DOUBLE)
        |    * a.scale * b.scale AS sim
        | FROM qv a, qv b WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |  row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM p)
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim
        |FROM r WHERE rank<=5 ORDER BY query_id, rank""".stripMargin,
    "q_cosine_pairs" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
        |  x -> x / sqrt(list_reduce(list_transform(embedding::DOUBLE[], y->y*y),(a,b)->a+b))) AS v
        | FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), (p,q)->p+q) AS sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_reduce(list_transform(list_zip(a.v, b.v), x -> x[1]*x[2]), (p,q)->p+q) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        | quantile_cont(l_extendedprice, 0.5) AS med_price,
        | quantile_cont(l_extendedprice, 0.95) AS p95_price,
        | quantile_cont(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_percentiles_scale" ->
      """SELECT l_returnflag,
        | quantile_cont(l_extendedprice, 0.5) AS med_price,
        | quantile_cont(l_extendedprice, 0.95) AS p95_price,
        | quantile_cont(l_quantity, 0.5) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_percentiles_hist" ->
      // the histogram path answers with the SAME interpolation as
      // quantile_cont — bit-equal, so the oracle is the plain form
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS med_qty,
        | quantile_cont(l_quantity, 0.95) AS p95_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_stats" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(count(*) AS DOUBLE) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sxy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        | (sx / n) AS mean_qty,
        | sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_qty,
        | round((sxy - sx * sy / n) /
        |  (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 12) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_skew_report" ->
      """WITH c AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT max(n) AS max_per_key, min(n) AS min_per_key,
        | CAST(SUM(n) AS DOUBLE) / count(*) AS mean_per_key,
        | quantile_cont(n, 0.99) AS p99_per_key
        |FROM c""".stripMargin,
    "q_vocab" ->
      """WITH tok AS (SELECT doc_id,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents)
        |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
        |FROM tok GROUP BY token ORDER BY tf DESC, token LIMIT 100""".stripMargin,
    "q_kll_rollup" ->
      // exact group counts replayed; the rank-guarantee booleans pinned
      // TRUE — a sketch whose quantile drifts past 4% rank error (6σ)
      // fails the gate
      """SELECT l_returnflag, count(*) AS n_rows,
        | TRUE AS med_ok, TRUE AS p95_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_heavy_tokens" ->
      // exact counts replayed; est_ok pinned TRUE — the CMS one-sided
      // bound (estimate never undercounts) must hold on every row
      """WITH tok AS (SELECT lang,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        | FROM documents),
        |c AS (SELECT lang, token, count(*) AS n_exact FROM tok GROUP BY 1, 2),
        |r AS (SELECT lang, token, n_exact, row_number() OVER (
        |  PARTITION BY lang ORDER BY n_exact DESC, token) AS rn FROM c)
        |SELECT lang, token, n_exact, TRUE AS est_ok FROM r WHERE rn <= 10
        |ORDER BY lang NULLS FIRST, n_exact DESC, token""".stripMargin,
    "q_asof" ->
      """WITH p0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type='purchase'),
        |p AS (SELECT user_id, ts, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM p0) WHERE rn = 1),
        |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type='click')
        |SELECT c.event_id, c.user_id, c.ts,
        | p.event_id AS asof_event_id, p.value AS asof_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_asof_tol" ->
      """WITH p0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type='purchase'),
        |p AS (SELECT user_id, ts, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM p0) WHERE rn = 1),
        |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type='click')
        |SELECT c.event_id, c.user_id, c.ts,
        | CASE WHEN epoch_ms(c.ts) - epoch_ms(p.ts) <= 3600000
        |      THEN p.event_id END AS asof_event_id,
        | CASE WHEN epoch_ms(c.ts) - epoch_ms(p.ts) <= 3600000
        |      THEN p.value END AS asof_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_asof_forward" ->
      """WITH p0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value
        |  FROM events WHERE event_type='purchase'),
        |p AS (SELECT user_id, ts, event_id, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
        |  FROM p0) WHERE rn = 1),
        |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type='click')
        |SELECT c.event_id, c.user_id, c.ts,
        | p.event_id AS asof_event_id, p.value AS asof_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin,
    "q_curate" ->
      """WITH t AS (SELECT doc_id, lang,
        |  md5(lower(regexp_replace(trim(nfc_normalize(text)), '\s+', ' ', 'g'))) AS fp,
        |  CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS INTEGER) AS n_tokens
        | FROM documents)
        |SELECT doc_id, lang, n_tokens FROM (
        | SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM t)
        |WHERE rn = 1 AND n_tokens >= 30 ORDER BY doc_id""".stripMargin,
    "q_bm25" ->
      // constants appear as decimal literals whose nearest double equals
      // the Scala-side fold (1.2+1.0 == double 2.2 — verified bitwise);
      // ln() ulp divergence between libms is absorbed by the 9 dp
      // per-term round + DECIMAL sum (see Retrieval Scaladoc)
      """WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |lens AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM t),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avg_dl FROM lens),
        |tok AS (SELECT doc_id, unnest(ws) AS term FROM t),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok
        | WHERE term IN ('spark', 'window', 'join') GROUP BY 1, 2),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |ts AS (SELECT tf.doc_id,
        |  ln((s.n_docs - d.df + 0.5)/(d.df + 0.5) + 1.0) * (tf.tf * 2.2) /
        |    (tf.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avg_dl)) AS sc
        | FROM tf JOIN dfreq d USING (term) JOIN lens l USING (doc_id) CROSS JOIN stats s),
        |agg AS (SELECT doc_id,
        |  round(CAST(sum(CAST(round(sc, 9) AS DECIMAL(27,9))) AS DOUBLE), 6) AS score
        | FROM ts GROUP BY doc_id),
        |top AS (SELECT doc_id, score FROM agg ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        | doc_id, score
        |FROM top ORDER BY rank""".stripMargin,
    "q_curate_full" -> curateFullSql,
    "q_approx_profile" ->
      // verdict form: exact distinct counts are the comparable
      // quantities; the bounded-error booleans are claims the engine
      // asserts in-query (|HLL - exact| <= 15%)
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
        | count(DISTINCT l_partkey) AS exact_parts,
        | true AS orders_ok, true AS parts_ok
        |FROM lineitem""".stripMargin,
    "q_hll_rollup" ->
      """SELECT source, count(*) AS n_rows,
        | count(DISTINCT doc_id) AS exact_distinct, true AS hll_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_percentiles_approx" ->
      // rank-interval verdicts: the engine checks each sketch estimate's
      // exact rank bracket overlaps target +- 2% in-query
      """SELECT l_returnflag, count(*) AS n_rows,
        | true AS med_price_ok, true AS p95_price_ok, true AS med_qty_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_compress_ratio" ->
      // exact byte totals per language (strlen = UTF-8 bytes, matching
      // Spark octet_length); deflate band verdicts asserted in-engine
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
        | true AS bounds_ok, true AS big_docs_ok, true AS avg_ratio_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_minhash_pairs" ->
      // truth-set size from the exact-Jaccard CTEs (threshold 0.5);
      // recall/precision >= 0.9 of the xxhash64 LSH asserted in-engine
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |exact AS (SELECT doc_a
        | FROM cand JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.5)
        |SELECT count(*) AS n_exact, true AS recall_ok, true AS precision_ok
        |FROM exact""".stripMargin,
    "q_minhash_pairs_sampled" ->
      // the q_minhash_pairs CTEs over the md5 quarter-sample — the
      // sampled truth count is md5-deterministic, so the 100 TB gate
      // query is itself oracle-exact; verdict booleans asserted
      // in-engine (full-corpus LSH restricted to sampled endpoints
      // equals LSH-on-the-sample: pairwise property)
      s"""WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM ${sampledDocsSrc(0.25)}),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |exact AS (SELECT doc_a
        | FROM cand JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.5)
        |SELECT count(*) AS n_exact_sampled, true AS recall_ok, true AS precision_ok
        |FROM exact""".stripMargin,
    "q_simhash_pairs" ->
      // identical-normalized-text pair count (md5 groups, exact in any
      // engine); the hamming-0 guaranteed-recall and banded==brute
      // verdicts are asserted in-engine
      """WITH g AS (SELECT md5(lower(trim(text))) AS h, count(*) AS c
        | FROM documents WHERE trim(text) <> '' GROUP BY 1)
        |SELECT CAST(coalesce(sum(c*(c-1)//2), 0) AS BIGINT) AS n_identical_pairs,
        | true AS identical_found_ok, true AS banded_equals_brute_ok
        |FROM g""".stripMargin,
    "q_cross_dedup" ->
      // exact drop x corpus truth-set size (trigram Jaccard >= 0.8 over
      // the corpus + offset re-arrivals); planted-recall and screen-
      // recall verdicts asserted in-engine
      """WITH docs2 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 500000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM docs2),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |  [ws[i]||'_'||ws[i+1]||'_'||ws[i+2] for i in range(1, len(ws)-1)])) AS s FROM w),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
        | FROM sh a JOIN sh b ON a.s=b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |truth AS (SELECT doc_a
        | FROM cand JOIN sizes sa ON doc_a=sa.doc_id JOIN sizes sb ON doc_b=sb.doc_id
        | WHERE CAST(common AS DOUBLE)/(sa.sz + sb.sz - common) >= 0.8
        |  AND doc_a < 500000 AND doc_b >= 500000)
        |SELECT count(*) AS n_true, true AS all_planted_found_ok, true AS recall_ok
        |FROM truth""".stripMargin,
    "q_curate_lsh" ->
      // agreement-verdict form: the exact quantities are the corpus
      // size and the EXACT path's kept count (curateFullSql, collapsed
      // to a count); the fast-path agreement boolean is asserted
      // in-engine
      s"""SELECT (SELECT count(*) FROM documents) AS n_docs,
         |  (SELECT count(*) FROM ($curateFullSql) kept) AS n_kept_exact,
         |  true AS fast_path_agrees_ok""".stripMargin,
    "q_curate_lsh_sampled" ->
      // the exact curation replay over the md5 quarter-sample: kept
      // count is md5-deterministic; the fast-vs-exact agreement boolean
      // (both paths on the SAME subcorpus) asserted in-engine
      s"""SELECT (SELECT count(*) FROM documents) AS n_docs,
         |  (SELECT count(*) FROM (${curateFullSqlOver(sampledDocsSrc(0.25))}) kept) AS n_kept_exact_sampled,
         |  true AS fast_path_agrees_ok""".stripMargin,
    "q_curate_lsh_md5" -> curateLshMd5Sql,
    "q_funnel" ->
      // chained min-aggregations reproduce the greedy-earliest anchored
      // semantics: for a fixed first-touch anchor, earliest-qualifying
      // per step is the unique optimal match
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_type FROM events
        | WHERE event_type IN ('view', 'click', 'purchase')),
        |t1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE event_type='view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(t) AS t2 FROM e JOIN t1 USING (user_id)
        | WHERE event_type='click' AND t >= t1.t1 AND t <= t1.t1 + 3600000 GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(t) AS t3 FROM e JOIN t2 USING (user_id) JOIN t1 USING (user_id)
        | WHERE event_type='purchase' AND t >= t2.t2 AND t <= t1.t1 + 3600000 GROUP BY 1)
        |SELECT * FROM (VALUES
        | (CAST(1 AS INTEGER), 'view', (SELECT count(*) FROM t1)),
        | (CAST(2 AS INTEGER), 'click', (SELECT count(*) FROM t2)),
        | (CAST(3 AS INTEGER), 'purchase', (SELECT count(*) FROM t3))
        |) AS v(step, step_name, n_users) ORDER BY step""".stripMargin,
    "q_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        | FROM events)
        |SELECT from_type, event_type AS to_type, count(*) AS n
        |FROM o WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,
    "q_retention" ->
      // week offsets are exact multiples of 7 days (both wk columns are
      // week-truncated), so the /7 division is exact in every engine
      """WITH a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_week FROM a GROUP BY 1),
        |g AS (SELECT c.cohort_week, CAST((a.wk - c.cohort_week)/7 AS INTEGER) AS week_offset,
        |  count(*) AS n_users
        | FROM a JOIN c USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort_week, n_users AS cohort_size FROM g WHERE week_offset = 0)
        |SELECT g.cohort_week, g.week_offset, g.n_users,
        | CAST(g.n_users AS DOUBLE)/s.cohort_size AS retention
        |FROM g JOIN s USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_events_hourly" ->
      """SELECT CAST(ts AS DATE) AS event_date,
        | CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr, event_type,
        | count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1,2,3 ORDER BY event_date, hr, event_type""".stripMargin,
    "q_mix_temp" ->
      // sqrt(mass) rounded to 9dp, DECIMAL-summed, one IEEE division
      """WITH tok AS (SELECT lang,
        |  unnest(string_split_regex(lower(trim(text)), '\s+')) AS t
        | FROM documents),
        |c AS (SELECT lang, count(*) AS n_tokens FROM tok GROUP BY lang),
        |w AS (SELECT lang, n_tokens,
        |  CAST(round(sqrt(n_tokens), 9) AS DECIMAL(28,9)) AS w FROM c),
        |t AS (SELECT SUM(w) AS tw FROM w)
        |SELECT lang, n_tokens,
        | round(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 9) AS share
        |FROM w CROSS JOIN t ORDER BY lang NULLS FIRST""".stripMargin,
    "q_kanon" ->
      // group sizes with the same >= k split
      """SELECT lang, source, count(*) AS n_rows, count(*) >= 20 AS released
        |FROM documents GROUP BY lang, source
        |ORDER BY lang NULLS FIRST, source NULLS FIRST""".stripMargin,
    "q_scd2" ->
      // same window replay: lead + row_number over (ts, event_id)
      """SELECT user_id, event_id,
        | CAST(ts AS TIMESTAMP) AS effective_from,
        | lead(CAST(ts AS TIMESTAMP)) OVER w AS effective_to,
        | CAST(row_number() OVER w AS INTEGER) AS version,
        | lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "q_w_rolling" ->
      // same RANGE frame over floor(epoch seconds); frames are
      // value-sized so equal timestamps share one frame in both engines
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        | count(*) OVER w AS n_trailing_1h,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER w AS DOUBLE) AS sum_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        | ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        | RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "q_attribution" ->
      // DuckDB ASOF LEFT JOIN + the same floor(epoch) second arithmetic;
      // FALSE AND NULL = FALSE in both engines, so the no-click bucket
      // groups as unattributed
      """WITH c0 AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
        |  FROM events WHERE event_type = 'click'),
        |c AS (SELECT user_id, ts, event_id FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |    ORDER BY event_id DESC) AS rn FROM c0) WHERE rn = 1),
        |p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
        | FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT p.ts, p.value, c.ts AS click_ts
        | FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
        |SELECT (click_ts IS NOT NULL AND
        |  CAST(floor(epoch(ts)) AS BIGINT) -
        |   CAST(floor(epoch(click_ts)) AS BIGINT) <= 3600) AS attributed,
        | count(*) AS n_purchases,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM a GROUP BY 1 ORDER BY attributed""".stripMargin,
    "q_paths" ->
      // identical windowed-lead trigrams; NULL-propagating || means the
      // tail rows drop with the same l2 filter
      """WITH p AS (SELECT
        |  event_type || '>' || lead(event_type, 1) OVER w || '>' ||
        |   lead(event_type, 2) OVER w AS path,
        |  lead(event_type, 2) OVER w AS l2
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT path, count(*) AS n FROM p WHERE l2 IS NOT NULL
        |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "q_events_hopping" ->
      // window starts are hop-aligned: event t lands in starts
      // floor(t/hop)·hop and the one hop earlier (len = 2·hop) —
      // replayed as an explicit unnest([0,1]) fan-out
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |w AS (SELECT CAST(to_timestamp(
        |   CAST(floor(epoch(e.ts)/1800)*1800 - 1800 + os.o*1800 AS BIGINT)) AS TIMESTAMP)
        |   AS win_start, event_type, value
        | FROM e, (SELECT unnest([0, 1]) AS o) os)
        |SELECT win_start, event_type, count(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_events_sessions_native" ->
      // identical oracle to q_events_sessions: the native session_window
      // form produces the same sessions on data without exact-gap
      // boundaries (asserted by the fixture check + parity spec)
      """WITH e AS (
        | SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |f AS (
        | SELECT user_id, event_id, ts, value,
        |  CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 21600000
        |       THEN 1 ELSE 0 END AS new_session
        | FROM e),
        |g AS (
        | SELECT user_id, ts, value,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        | FROM f)
        |SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
        | count(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,
    "q_events_sessions" ->
      // session_seq: DuckDB SUM(int) yields HUGEINT which lands as float64
      // on the driver side — CAST ... AS BIGINT matches Spark's LongType
      // (this, not tie order, was the round-1 hash mismatch: the fixture
      // has zero duplicate (user_id, ts) pairs). event_id tie-break kept
      // in both engines for determinism under future fixtures.
      """WITH e AS (
        | SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |f AS (
        | SELECT user_id, event_id, ts, value,
        |  CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 21600000
        |       THEN 1 ELSE 0 END AS new_session
        | FROM e),
        |g AS (
        | SELECT user_id, ts, value,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        | FROM f)
        |SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end,
        | count(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
        |FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin
  )
}
