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
    * @param toleranceMs match only right rows within this many
    *        milliseconds BEFORE the left timestamp (feature-store
    *        staleness bound: a year-old price is not "the" price).
    *        Stale matches become NULL payloads, exactly as if no right
    *        row existed — the left row itself is always kept. Filtering
    *        happens on the carried match, after the window: the nearest
    *        right row is still the nearest even when it is too old, so
    *        the one-shuffle plan is unchanged.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTs: String, rightTs: String,
           payload: Seq[String], tieBreak: Column,
           toleranceMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    // the carried match wraps (payload struct, matched right ts) so a
    // staleness bound can be applied AFTER the window — the nearest
    // right row is the nearest whether or not it is too old
    val wrapType = StructType(Seq(
      StructField("p", StructType(payload.map(p => right.schema(p)))),
      StructField("t", right.schema(rightTs).dataType)))
    val leftRowType = StructType(leftCols.map(c => left.schema(c)))
    val l = left.withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(wrapType))
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
        struct(struct(payload.map(col): _*).as("p"),
          col(rightTs).as("t")).as("_payload"),
        tieBreak.cast("long").as("_tie"))
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

    val fresh = toleranceMs match {
      case None => lit(true)
      case Some(tol) =>
        unix_millis(col("_ts")) - unix_millis(col("_match.t")) <= tol
    }
    val out = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      payload.map(p => when(fresh, col(s"_match.p.$p")).as(s"asof_$p"))
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
                  payload: Seq[String], tieBreak: Column,
                  toleranceMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    val wrapType = StructType(Seq(
      StructField("p", StructType(payload.map(p => right.schema(p)))),
      StructField("t", right.schema(rightTs).dataType)))
    val leftRowType = StructType(leftCols.map(c => left.schema(c)))
    val l = left.withColumn("_k", col(leftKey)).withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(wrapType))
      .withColumn("_tie", lit(null).cast("long"))
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("_k"), col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(struct(payload.map(col): _*).as("p"),
          col(rightTs).as("t")).as("_payload"),
        tieBreak.cast("long").as("_tie"))
    val rUnioned = r.select(
      lit(null).cast(leftRowType).as("_lrow"),
      col("_k"), col("_ts"), col("_side"), col("_payload"), col("_tie"))
    val lUnioned = l.select(
      struct(leftCols.map(col): _*).as("_lrow"),
      col("_k"), col("_ts"), col("_side"), col("_payload"), col("_tie"))

    // descending ts: right rows at equal ts still sort BEFORE left rows
    // (side 0 < 1 ascending breaks the tie), so an exactly-simultaneous
    // right row is visible; _tie DESC + last() carries the smallest.
    // desc is nulls-LAST in Spark, which would let a NULL-ts left row
    // sort after every right row and absorb the earliest payload —
    // desc_nulls_first moves only null-ts LEFT rows to the front (right
    // rows are pre-filtered non-null) so they correctly match nothing.
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").desc_nulls_first, col("_side"), col("_tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rUnioned.unionByName(lUnioned)
      .withColumn("_match", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val fresh = toleranceMs match {
      case None => lit(true)
      case Some(tol) =>
        unix_millis(col("_match.t")) - unix_millis(col("_ts")) <= tol
    }
    val out = leftCols.map(c => col(s"_lrow.$c").as(c)) ++
      payload.map(p => when(fresh, col(s"_match.p.$p")).as(s"asof_$p"))
    carried.select(out: _*)
  }
}
