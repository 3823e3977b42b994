package graft.pipelines

import graft.Tables
import graft.functions.Compat
import graft.operators.{Aggs, Joins}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The §3.1 reconciliation shape (DOP VP Compare.py:164-246) re-expressed
  * on the driver's star schema: per-customer order spend (the "VP
  * transactions" side, pre-aggregated below the join) reconciled against
  * the customer master (the "DOR" side) with a full-outer join + pandas
  * `indicator` provenance column, then masked per-bucket sums.
  *
  * Scale shape: the aggregate side shuffles once on the join key and
  * arrives at one row per key; the outer join is a shuffle join on the
  * same key (co-partitioned — Catalyst reuses the exchange). No
  * collect, no driver loop; the summary is a second one-pass aggregate.
  */
object Reconciliation {

  /** Unordered detail rows: one row per customer/spend pairing with
    * `_merge`. The summary path aggregates THIS frame directly — the
    * orderBy lives only in [[detail]], so the summary plan never carries
    * a Sort or its range-partitioning sample job (EliminateSorts would
    * usually drop an orderBy under an aggregate, but keeping the sort out
    * of the plan entirely is cheaper than relying on the rule and is
    * pinned in PlanAuditSpec).
    */
  def detailUnordered(spark: SparkSession, sfDir: String): DataFrame = {
    val customer = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
    val orderAgg = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(
        Compat.exactSum(col("o_totalprice"), 2).as("total_spend"),
        count(lit(1)).as("n_orders"))
    Joins.outerWithIndicator(customer, orderAgg, "c_custkey", "o_custkey")
  }

  /** Detail frame: [[detailUnordered]] in deterministic key order. */
  def detail(spark: SparkSession, sfDir: String): DataFrame =
    detailUnordered(spark, sfDir)
      .orderBy(coalesce(col("c_custkey"), col("o_custkey")))

  /** One-pass masked sums over the detail frame, unpivoted to
    * (metric, value) rows — the console-report totals of the reference.
    */
  def summary(spark: SparkSession, sfDir: String): DataFrame = {
    val d = detailUnordered(spark, sfDir)
    val spend = col("total_spend").cast(DecimalType(27, 2))
    Aggs.summaryTable(d, Seq(
      "matched_spend" -> sum(when(col("_merge") === "both", spend)).cast("double"),
      "matched_customers" -> count(when(col("_merge") === "both", 1)),
      "customer_only" -> count(when(col("_merge") === "left_only", 1)),
      "order_only_spend" -> coalesce(
        sum(when(col("_merge") === "right_only", spend)).cast("double"), lit(0.0)),
      "total_spend_all" -> sum(spend).cast("double")
    )).orderBy("metric")
  }
}
