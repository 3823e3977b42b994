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
}
