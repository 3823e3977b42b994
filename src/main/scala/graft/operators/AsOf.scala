package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row of the same key with `rightTs <= leftTs`. The standard temporal
  * join of feature stores and market data; Spark has no native operator.
  *
  * Implemented with the union + running-`last(ignoreNulls)` trick rather
  * than a custom SparkPlan: tag both sides, union them, sort within each
  * key by (ts, side) and carry the latest right payload forward — ONE
  * shuffle on the key, no range join explosion, no per-key driver work.
  * At 100 TB this is a single exchange + window, the same cost class as
  * sessionization. (A broadcast-range variant is unnecessary: the union
  * form already avoids the O(left × right-per-key) blowup a naive
  * `leftTs >= rightTs` join produces.)
  *
  * Ties: a right row at exactly `leftTs` IS visible (<=), and among
  * right rows sharing (key, ts) the one with the greatest `tieBreak`
  * wins — callers must pass a unique tie-break for deterministic output.
  */
object AsOf {

  /** @param payload right-side columns to attach (prefixed `asof_`)
    * @param tieBreak unique right-side ordering column for equal (key, ts)
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           payload: Seq[String], tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns
    val payloadType = StructType(payload.map(p => right.schema(p)))
    val leftRowType = StructType(leftCols.map(c => left.schema(c)))
    val l = left.withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadType))
      .withColumn("_tie", lit(null).cast("long"))
    // SQL ASOF-join semantics: a null right key or null right timestamp
    // never matches anything. Unfiltered, a null-ts right row would sort
    // first (nulls-first asc) and become the carried match for every
    // earlier-ts left row, and null keys would match null-key left rows
    // (Window.partitionBy groups nulls together). Left rows with a null
    // key/ts simply get a null match — correct left-join behavior.
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_payload"), tieBreak.cast("long").as("_tie"))
    val rUnioned = r.select(
      lit(null).cast(leftRowType).as("_lrow"),
      col("_k"), col("_ts"), col("_side"), col("_payload"), col("_tie"))
    val lUnioned = l.select(
      struct(leftCols.map(col): _*).as("_lrow"),
      col("_k"), col("_ts"), col("_side"), col("_payload"), col("_tie"))

    // right rows sort before left rows at equal ts (side 0 < 1) so an
    // exactly-simultaneous right row is visible; among equal (k, ts)
    // right rows the largest tie-break is carried (order asc + last()).
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rUnioned.unionByName(lUnioned)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val out = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      payload.map(p => col(s"_match.$p").as(s"asof_$p"))
    carried.select(out: _*)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row of
    * the same key with `rightTs >= leftTs` — the "next event after"
    * lookup (next price tick, next maintenance window, next session
    * start). Exact mirror of [[join]]: same union + one shuffle + one
    * window, with the scan direction reversed (running `last` over a
    * DESCENDING (ts, side, tie) order carries the nearest FUTURE right
    * payload backward onto left rows).
    *
    * Ties: a right row at exactly `leftTs` IS visible (>=), and among
    * right rows sharing (key, ts) the one with the SMALLEST `tieBreak`
    * wins (the mirror of [[join]]'s greatest-wins).
    */
  def joinForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTs: String, rightTs: String,
                  payload: Seq[String], tieBreak: Column): DataFrame = {
    import org.apache.spark.sql.types.StructType
    val leftCols = left.columns
    val payloadType = StructType(payload.map(p => right.schema(p)))
    val leftRowType = StructType(leftCols.map(c => left.schema(c)))
    val l = left.withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadType))
      .withColumn("_tie", lit(null).cast("long"))
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(payload.map(col): _*).as("_payload"), tieBreak.cast("long").as("_tie"))
    val rUnioned = r.select(
      lit(null).cast(leftRowType).as("_lrow"),
      col("_k"), col("_ts"), col("_side"), col("_payload"), col("_tie"))
    val lUnioned = l.select(
      struct(leftCols.map(col): _*).as("_lrow"),
      col("_k"), col("_ts"), col("_side"), col("_payload"), col("_tie"))

    // descending ts: right rows at equal ts still sort BEFORE left rows
    // (side 0 < 1 ascending breaks the tie), so an exactly-simultaneous
    // right row is visible; _tie DESC + last() carries the smallest.
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").desc, col("_side"), col("_tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rUnioned.unionByName(lUnioned)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val out = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      payload.map(p => col(s"_match.$p").as(s"asof_$p"))
    carried.select(out: _*)
  }
}
