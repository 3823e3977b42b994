package graft.pipelines

import graft.functions.Compat
import graft.operators.{Joins, SchemaOps}
import graft.sources.Excel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

/** The flagship reference pipeline, faithful end-to-end: DOR↔ViewPoint
  * financial reconciliation (DOP VP Compare.py:57-246 / DOR VP
  * Compare.ipynb). Reference-shaped inputs (the real column vocabulary),
  * reference semantics at every step:
  *
  *   load_and_clean_dor (py:57-87): ensure-columns → to_datetime coerce →
  *     date between → project 4 cols → to_numeric coerce + fillna(0)
  *   load_and_clean_vp (py:90-136): drop "Unnamed: 0" → drop_duplicates →
  *     ensure-columns → date coerce+filter → amount coerce+fill0 →
  *     dropna(id) → detail copy + groupby(id).agg(sum, sorted-set join)
  *   merge_and_reconcile (py:139-157): full outer join + indicator →
  *     fill amounts 0 → Difference = DOR − VP
  *   summary (py:175-223): masked bucket sums with the KPOCT/Pedi-Onc
  *     DOR-only program exclusion
  *   workbook (DOR VP Compare.ipynb:552-637): Summary / Matched_Studies /
  *     DOR_Detail / VP_Detail sheets + the interactive Study_Detail sheet
  *     (dropdown + FILTER formulas).
  *
  * All sums run through DECIMAL(27,2) ([[Compat.exactSum]]) — exact and
  * partitioning-invariant, so the golden totals recorded from the
  * reference's own run (BASELINE.md) reproduce bit-for-bit.
  */
object DorVpCompare {

  // Column vocabulary (DOP VP Compare.py:31-44)
  val DorDate = "Award Term Start Date"
  val DorId = "Project ID"
  val DorTitle = "Project Title"
  val DorAmount = "Total Cash Receipts"
  val DorProgram = "Program Area"
  val VpDate = "Accountable Completed Date"
  val VpId = "Service Line Code"
  val VpAmount = "Transaction Amount"
  val VpStudy = "Site Study Code"

  val ExcludeDorOnlyPrograms: Seq[String] = Seq("KPOCT", "Pedi-Onc")

  private val D2 = DecimalType(27, 2)

  /** load_and_clean_dor (py:57-87). */
  def cleanDor(raw: DataFrame, start: String, end: String): DataFrame =
    SchemaOps.ensureColumns(raw,
      Seq(DorDate, DorId, DorTitle, DorAmount, DorProgram).map(_ -> StringType))
      .withColumn(DorDate, Compat.coerceTimestamp(col(DorDate)))
      .filter(col(DorDate).between(lit(start).cast("timestamp"), lit(end).cast("timestamp")))
      .select(col(DorId), col(DorTitle),
        Compat.coerceNumericFill(col(DorAmount)).as(DorAmount), col(DorProgram))

  /** load_and_clean_vp (py:90-136): returns (grouped, detail). */
  def cleanVp(raw: DataFrame, start: String, end: String): (DataFrame, DataFrame) = {
    val noIdx = if (raw.columns.contains("Unnamed: 0")) raw.drop("Unnamed: 0") else raw
    val detail = SchemaOps.ensureColumns(noIdx.dropDuplicates(),
      Seq(VpDate, VpId, VpAmount, VpStudy).map(_ -> StringType))
      .withColumn(VpDate, Compat.coerceTimestamp(col(VpDate)))
      .filter(col(VpDate).between(lit(start).cast("timestamp"), lit(end).cast("timestamp")))
      .withColumn(VpAmount, Compat.coerceNumericFill(col(VpAmount)))
      .na.drop(Seq(VpId))
    val grouped = detail.groupBy(col(VpId))
      .agg(Compat.exactSum(col(VpAmount), 2).as(VpAmount),
        // pandas: "; ".join(sorted(set(str))) if any non-null else NA
        nullif(Compat.sortedSetJoin(col(VpStudy)), lit("")).as(VpStudy))
    (grouped, detail)
  }

  /** merge_and_reconcile (py:139-157): outer + indicator + Difference. */
  def merge(dor: DataFrame, vpGrouped: DataFrame): DataFrame =
    Joins.outerWithIndicator(dor, vpGrouped, DorId, VpId)
      .withColumn(DorAmount, coalesce(col(DorAmount), lit(0.0)))
      .withColumn(VpAmount, coalesce(col(VpAmount), lit(0.0)))
      .withColumn("Difference", (col(DorAmount).cast(D2) - col(VpAmount).cast(D2)).cast("double"))

  /** Console-report totals (py:197-223) as one (metric, value) frame:
    * one pass over the merged frame (masked sums, grouping-set style).
    */
  def summary(merged: DataFrame): DataFrame = {
    val matched = col("_merge") === "both"
    val dorOnlyEff = col("_merge") === "left_only" &&
      !coalesce(col(DorProgram), lit("")).isin(ExcludeDorOnlyPrograms: _*)
    val vpOnly = col("_merge") === "right_only"
    graft.operators.Aggs.summaryTable(merged, Seq(
      "total_dor" -> sum(col(DorAmount).cast(D2)).cast("double"),
      "total_vp" -> sum(col(VpAmount).cast(D2)).cast("double"),
      "overlap_dor" -> sum(when(matched, col(DorAmount).cast(D2))).cast("double"),
      "overlap_vp" -> sum(when(matched, col(VpAmount).cast(D2))).cast("double"),
      "matched_difference" -> (sum(when(matched, col(DorAmount).cast(D2))) -
        sum(when(matched, col(VpAmount).cast(D2)))).cast("double"),
      "dor_only_effective" -> coalesce(
        sum(when(dorOnlyEff, col(DorAmount).cast(D2))).cast("double"), lit(0.0)),
      "vp_only" -> coalesce(
        sum(when(vpOnly, col(VpAmount).cast(D2))).cast("double"), lit(0.0))))
  }

  /** The reconciliation workbook (DOR VP Compare.ipynb:552-637): four data
    * sheets + the interactive Study_Detail sheet with a matched-ids
    * dropdown and spilling FILTER blocks (K3+K4).
    */
  def writeWorkbook(summaryDf: DataFrame, merged: DataFrame,
                    dorDetail: DataFrame, vpDetail: DataFrame, path: String): Unit = {
    val matchedReport = merged.filter(col("_merge") === "both")
      .select(col(DorId), col(DorAmount), col(VpAmount), col("Difference"))
      .orderBy(DorId)
    val matchedRows = matchedReport.limit(Excel.maxDriverRows + 1).count().toInt
    val detail = Excel.studyDetailSheet(matchedRows, Seq(
      ("DOR Detail for selected Project ID", "DOR_Detail", dorDetail.columns.toSeq),
      ("VP Transactions for selected Project ID", "VP_Detail", vpDetail.columns.toSeq)))
    Excel.writeWorkbook(Seq(
      "Summary" -> summaryDf,
      "Matched_Studies" -> matchedReport,
      "DOR_Detail" -> dorDetail,
      "VP_Detail" -> vpDetail), path, Seq(detail))
  }

  /** Full pipeline from reference-shaped Excel inputs to the workbook,
    * returning the summary for assertion (§3.1 end-to-end).
    */
  def run(spark: SparkSession, dorXlsx: String, vpXlsx: String,
          outXlsx: String, start: String = "2000-01-01",
          end: String = "2025-12-31"): DataFrame = {
    val dor = cleanDor(Excel.read(spark, dorXlsx), start, end)
    val (vpGrouped, vpDetail) = cleanVp(Excel.read(spark, vpXlsx), start, end)
    val merged = merge(dor, vpGrouped)
    val s = summary(merged)
    writeWorkbook(s, merged,
      dor.select(DorId, DorTitle, DorAmount, DorProgram).orderBy(DorId),
      vpDetail.select(VpId, VpStudy, VpDate, VpAmount).orderBy(VpId, VpDate), outXlsx)
    s
  }
}
