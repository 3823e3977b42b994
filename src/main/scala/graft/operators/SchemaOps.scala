package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema/validation operators (SURVEY.md §2.10, V1-V2).
  *
  * The reference's only regression defense is a column-set drift check
  * against last month's archived output (Saoirse Automation.ipynb:325-359)
  * plus ensure-column-exists loops (DOP VP Compare.py:64-73). Both become
  * first-class, fail-fast pipeline stages here.
  */
object SchemaOps {

  final case class SchemaDriftException(missing: Set[String], unexpected: Set[String])
    extends RuntimeException(
      s"schema drift: missing=${missing.toSeq.sorted.mkString(",")} " +
        s"unexpected=${unexpected.toSeq.sorted.mkString(",")}")

  /** V1: column-set drift check — raise on mismatch vs the expected schema. */
  def guard(df: DataFrame, expected: StructType): DataFrame = {
    val have = df.columns.toSet
    val want = expected.fieldNames.toSet
    if (have != want) throw SchemaDriftException(want -- have, have -- want)
    df
  }

  /** V2: ensure-columns-exist — add typed NULL columns for any missing
    * field, then conform column order to the target schema.
    */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    val withMissing = target.fields.foldLeft(df) { (acc, f) =>
      if (have(f.name)) acc else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }
    withMissing.select(target.fieldNames.map(col).toSeq: _*)
  }

  /** P6-style conform: reorder/select to a stored column list. */
  def conform(df: DataFrame, columnList: Seq[String]): DataFrame =
    df.select(columnList.map(col): _*)

  /** Add-missing-as-null without reordering, for drifting monthly drops. */
  def ensureColumns(df: DataFrame, cols: Seq[(String, DataType)]): DataFrame =
    cols.foldLeft(df) { case (acc, (n, t)) =>
      if (acc.columns.contains(n)) acc else acc.withColumn(n, lit(null).cast(t))
    }

  /** V4: spot-check a grand total against a known-good value (the
    * reference's printed Tableau cross-checks) — fail-fast assertion.
    */
  def assertTotal(df: DataFrame, c: String, expected: Double,
                  tolerance: Double = 1e-6): DataFrame = {
    val got = df.agg(sum(col(c)).cast("double")).head().getDouble(0)
    require(math.abs(got - expected) <= tolerance,
      f"total check failed on '$c': got $got%.4f expected $expected%.4f")
    df
  }

  /** One-pass numeric column profile — the data-quality report a
    * pipeline runs before trusting a new monthly drop: one row per
    * column with (n, nulls, min, max, mean). ONE aggregation over the
    * table (every stat is map-side combinable; 5·|cols| partials cross
    * the wire), unpivoted driver-free via stack. Means go through
    * DECIMAL (partitioning-invariant, oracle-exact per the engine's
    * decimal-sum rule).
    */
  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    // pure Column API with index-based intermediate names — arbitrary
    // input column names (spaces, hyphens, reserved words) never pass
    // through SQL text; backticks admit even dotted names
    val aggs = cols.zipWithIndex.map { case (c, i) =>
      val x = col(s"`$c`").cast("double")
      struct(
        count(lit(1)).as("n"),
        sum(when(x.isNull, 1L).otherwise(0L)).as("nulls"),
        min(x).as("min"),
        max(x).as("max"),
        (sum(x.cast("decimal(38,8)")).cast("double") / count(x)).as("mean")
      ).as(s"_p$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col(s"_p$i.n").as("n"),
        col(s"_p$i.nulls").as("nulls"), col(s"_p$i.min").as("min"),
        col(s"_p$i.max").as("max"), col(s"_p$i.mean").as("mean"))
    }
    one.select(explode(array(rows: _*)).as("_r")).select(col("_r.*"))
  }

  /** Per-group statistical outlier report — the anomaly gate a pipeline
    * runs on a new drop BEFORE merging it ("did this month's feed
    * contain fat-fingered amounts?"): rows whose value sits more than
    * `zThreshold` population standard deviations from their group's
    * mean, with per-group accounting. Two passes: one partial-agg'd
    * moments pass (DECIMAL sums — partitioning-invariant), then a
    * broadcast join back filters the outliers map-side. Every quantity
    * is deterministic cross-engine: means/variances are exact decimal
    * ratios and sqrt is IEEE correctly-rounded (unlike ln — no
    * ulp-hardening needed), so the flagged SET is oracle-exact.
    * Groups with fewer than 2 rows or zero variance flag nothing.
    */
  def outlierReport(df: DataFrame, groupCol: String, valueCol: String,
                    zThreshold: Double = 3.0): DataFrame = {
    val x = col(valueCol).cast("double")
    // decimal(18,4) squares multiply to (37,8) — inside the 38-digit
    // cap, so sums stay EXACT (a (38,8)² product would overflow 38 and
    // silently round, breaking cross-engine equality); bounds |x| to
    // 1e14, plenty for any metric column
    val xd = x.cast("decimal(18,4)")
    val stats = df.groupBy(groupCol).agg(
      count(x).as("_n"),
      (sum(xd).cast("double") / count(x)).as("_mean"),
      // population variance from exact sums: E[x²] − E[x]²
      (sum(xd * xd).cast("double") / count(x)).as("_ex2"))
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("_sd", sqrt(greatest(col("_ex2") - col("_mean") * col("_mean"),
        lit(0.0))))
      .filter(col("_n") >= 2 && col("_sd") > 0 &&
        abs(x - col("_mean")) > lit(zThreshold) * col("_sd"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_outliers"),
        min(x).as("min_outlier"), max(x).as("max_outlier"))
  }

  /** k-anonymity release gate: suppress every row whose quasi-identifier
    * combination is shared by fewer than k rows — the standard guard
    * before publishing grouped extracts (a cell of 1 re-identifies its
    * subject even with direct identifiers removed). Returns
    * (kept, suppressed-summary): the summary reports each suppressed
    * combination WITH its size but never the underlying rows, so the
    * release decision is auditable without leaking what it suppressed.
    * One partial-aggregated count + a broadcast-able join back; no
    * windows.
    */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String],
                 k: Long): (DataFrame, DataFrame) = {
    // groupBy treats NULL as a regular key value, so the join back must
    // too: an equi-join would silently drop rows whose quasi tuple
    // contains NULL (in neither kept nor suppressed — a hole in the
    // auditable partition). Null-safe equality (<=>) keeps the
    // kept ∪ suppressed ≡ all-rows invariant for NULL cells as well.
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_grp_n"))
      .select(quasiCols.map(c => col(c).as(s"_ka_$c")) :+ col("_grp_n"): _*)
    val keepCond = quasiCols.map(c => col(c) <=> col(s"_ka_$c")).reduce(_ && _)
    val kept = df.join(sizes.filter(col("_grp_n") >= k), keepCond)
      .select(df.columns.map(col): _*)
    val suppressed = sizes.filter(col("_grp_n") < k)
      .select(quasiCols.map(c => col(s"_ka_$c").as(c)) :+
        col("_grp_n").as("n_rows"): _*)
    (kept, suppressed)
  }

  /** SCD Type-2 dimension build from a change stream: each (key, ts)
    * change row becomes a validity interval — `effective_from` = its
    * timestamp, `effective_to` = the NEXT change's timestamp for the
    * key (null while current), plus `version` and `is_current`. One
    * key-partitioned window (lead + row_number over the same sort —
    * one shuffle, one sort); ties broken by `tieBreak` so simultaneous
    * changes version deterministically. Compose with [[AsOf]] to query
    * the dimension as-of any time, or filter `is_current` for the
    * live snapshot.
    */
  def scd2FromChanges(changes: DataFrame, keyCol: String, tsCol: String,
                      tieBreak: org.apache.spark.sql.Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol).asc, tieBreak.asc)
    changes
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
