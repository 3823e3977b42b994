package graft.pipelines

import graft.Tables
import graft.functions.Compat
import graft.operators.SchemaOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The §3.2 monthly-dashboard-refresh shape (Saoirse Automation.ipynb):
  * `read → project → rename-to-dashboard-vocab → null-token replace →
  * date coercion → cutoff filter → schema-drift check vs the archived
  * month → sink`, re-expressed as one lazy DAG with the drift check as a
  * fail-fast pre-flight (`SchemaOps.guard`).
  *
  * `Stage = DataFrame => DataFrame` composition keeps every month's
  * pipeline declarative; cross-run state (the reference's archived-month
  * column list) becomes an explicit expected `StructType`.
  */
object MonthlyRefresh {

  type Stage = DataFrame => DataFrame

  def pipeline(stages: Seq[Stage]): Stage = stages.reduce(_ andThen _)

  /** Dashboard vocabulary for the events feed (ordered — drives both the
    * projection and the output column order).
    */
  val renames: Seq[(String, String)] = Seq(
    "event_id" -> "Event ID", "ts" -> "Event Date",
    "user_id" -> "Participant ID", "event_type" -> "Event Type",
    "value" -> "Amount")

  val expectedSchema: StructType = StructType(Seq(
    StructField("Event ID", LongType),
    StructField("Event Date", TimestampType),
    StructField("Participant ID", LongType),
    StructField("Event Type", StringType),
    StructField("Amount", DoubleType)))

  def refresh(spark: SparkSession, sfDir: String,
              cutoff: String = "2024-02-01"): DataFrame = {
    val stages: Seq[Stage] = Seq(
      // project + rename to dashboard vocabulary (P1/P3)
      df => renames.foldLeft(df.select(renames.map(r => col(r._1)): _*)) {
        case (acc, (from, to)) => acc.withColumnRenamed(from, to)
      },
      // null-token replace on the categorical column (C7)
      df => df.withColumn("Event Type", Compat.nullTokens(col("Event Type"))),
      // cutoff filter with null-keep (F2/F3)
      df => df.filter(col("Event Date") < lit(cutoff).cast("timestamp") ||
        col("Event Date").isNull),
      // schema-drift pre-flight vs the archived month (V1)
      df => SchemaOps.guard(df, expectedSchema)
    )
    pipeline(stages)(Tables.events(spark, sfDir))
  }
}
