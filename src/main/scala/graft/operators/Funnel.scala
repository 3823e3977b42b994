package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Funnel analysis over an event stream: how many users progress through
  * an ordered step sequence within a time window — the standard product-
  * analytics question neither the reference nor plain SQL answers in one
  * pass.
  *
  * Semantics (first-touch anchored, the deterministic industry default):
  * the anchor is the user's FIRST step-1 event; each later step matches
  * the EARLIEST qualifying event at-or-after the previous step's match;
  * every step must land within `windowMs` of the anchor. Greedy-earliest
  * is optimal for a fixed anchor (each choice maximizes the remaining
  * window), so the per-user result is unique — which is what makes
  * `q_funnel` oracle-checkable against a chained min-aggregation SQL.
  *
  * Scale shape: events are filtered to the step types BEFORE the one
  * shuffle (groupBy user); the per-user buffer holds only that user's
  * step-relevant events, walked once by a fold. No self-joins, no k
  * passes over the event table (the equivalent SQL needs one aggregation
  * per step). Pathologically hot users are bounded upstream (sample or
  * time-slice) like every per-user analysis.
  */
object Funnel {

  /** Returns one row per step: (step, step_name, n_users) where n_users
    * counts users whose journey reached AT LEAST that step.
    */
  def anchored(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, steps: Seq[String],
               windowMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.size
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    val evs = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user"),
        struct(unix_millis(col(tsCol)).as("t"), stepIdx.as("idx")).as("e"))
    // sort_array orders by (t, idx): simultaneous events resolve in step
    // order — deterministic and matched by the oracle's >= comparisons
    val staged = evs.groupBy("user")
      .agg(sort_array(collect_list(col("e"))).as("evs"))
      .select(aggregate(col("evs"),
        struct(lit(0).as("stage"), lit(0L).as("anchor"), lit(0L).as("last")),
        (acc, e) => {
          val stage = acc.getField("stage")
          val anchor = acc.getField("anchor")
          val start = stage === 0 && e.getField("idx") === 0
          val advance = stage > 0 && stage < k &&
            e.getField("idx") === stage &&
            e.getField("t") >= acc.getField("last") &&
            e.getField("t") <= anchor + windowMs
          when(start, struct(lit(1).as("stage"),
            e.getField("t").as("anchor"), e.getField("t").as("last")))
            .when(advance, struct((stage + 1).as("stage"),
              anchor.as("anchor"), e.getField("t").as("last")))
            .otherwise(acc)
        },
        acc => acc.getField("stage")).as("stage"))
    val aggCols = steps.indices.map(i =>
      sum(when(col("stage") >= i + 1, 1L).otherwise(0L)).as(s"_s$i"))
    val counts = staged.agg(aggCols.head, aggCols.tail: _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("step"), lit(s).as("step_name"),
          coalesce(col(s"_s$i"), lit(0L)).as("n_users"))
      }: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_users"))
  }

  /** Event transition matrix: counts of (from_type → to_type) over each
    * user's time-ordered event sequence — the Markov view of user
    * behavior (what follows what). One user-partitioned window (bounded
    * partitions) + one partial-aggregated count; `tieBreak` makes the
    * order total when timestamps collide, the same determinism contract
    * as every order-sensitive operator here.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieBreak: _*)
    events
      .select(col(userCol), col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; for each (cohort week, week offset), how many cohort
    * members were active and what fraction of the cohort that is.
    *
    * Shape: the activity matrix is `distinct (user, week)` — one
    * partial-aggregated dedup — then one groupBy per (cohort, offset).
    * Cohort sizes come from a window partitioned BY COHORT (bounded
    * partitions, never a global window). Week arithmetic stays on exact
    * multiples of 7 days, so the offset division is exact in every
    * engine — no float drift in the oracle compare.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val a = events.select(col(userCol).as("user"),
        to_date(date_trunc("week", col(tsCol))).as("wk"))
      .distinct()
    val c = a.groupBy("user").agg(min(col("wk")).as("cohort_week"))
    val g = a.join(c, "user")
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
    val w = Window.partitionBy("cohort_week")
    g.withColumn("_size", max(when(col("week_offset") === 0, col("n_users"))).over(w))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        (col("n_users").cast("double") / col("_size")).as("retention"))
  }
}
