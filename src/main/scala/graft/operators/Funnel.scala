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
  * step-relevant events (STRUCTURALLY capped at `maxEventsPerUser` —
  * a bot with 10⁸ events cannot blow an aggregation buffer; see
  * [[hotUserReport]] for who got clipped), walked once by a fold. No
  * self-joins, no k passes over the event table. [[anchoredChained]] is
  * the zero-buffer exact alternative (k chained mins).
  */
object Funnel {

  private def stepIdxExpr(typeCol: String, steps: Seq[String]): Column =
    steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }

  /** Returns one row per step: (step, step_name, n_users) where n_users
    * counts users whose journey reached AT LEAST that step.
    *
    * `maxEventsPerUser` bounds the per-user aggregation buffer
    * STRUCTURALLY: a spillable windowed row_number keeps only each
    * user's earliest `maxEventsPerUser` step-relevant events (by (t,
    * step)) before anything is collected. Earliest-first truncation
    * preserves the greedy walk exactly unless a user's journey needs
    * events beyond the cap — those users are visible in
    * [[hotUserReport]], the same cap+observability discipline as
    * TextDedup's maxPostings.
    */
  def anchored(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, steps: Seq[String],
               windowMs: Long, maxEventsPerUser: Int = 1000000): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(maxEventsPerUser > 0, "maxEventsPerUser must be positive")
    val k = steps.size
    val evs = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user"),
        struct(unix_millis(col(tsCol)).as("t"),
          stepIdxExpr(typeCol, steps).as("idx")).as("e"))
    // The cap runs in WindowExec (sort-based, spills to disk) — unlike
    // the ObjectHashAggregate buffer below, a hot user here costs disk,
    // not executor memory.
    val capped =
      if (maxEventsPerUser == Int.MaxValue) evs
      else {
        val w = Window.partitionBy("user").orderBy(col("e"))
        evs.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") <= maxEventsPerUser).drop("_rn")
      }
    // sort_array orders by (t, idx): simultaneous events resolve in step
    // order — deterministic and matched by the oracle's >= comparisons
    val staged = capped.groupBy("user")
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

  /** The zero-buffer exact funnel: k chained conditional-min
    * aggregations (s₁ = min step-1 time; sᵢ₊₁ = min step-(i+1) time in
    * [sᵢ, s₁+window]) — identical results to [[anchored]] (greedy-
    * earliest IS a chain of mins), but every aggregation is a map-side-
    * combinable min: NOTHING is buffered per user, so a 10⁸-event bot
    * costs the same memory as anyone else. Trade: k shuffles of the
    * (step-filtered, per-step pruned) events instead of one — the right
    * plan when hot users are expected and k is small.
    */
  def anchoredChained(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String],
                      windowMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val evs = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user"), unix_millis(col(tsCol)).as("t"),
        stepIdxExpr(typeCol, steps).as("idx"))
    // ties at the same millisecond resolve in step order in [[anchored]]
    // (sort by (t, idx) + >= comparisons); chained mins with >= bounds
    // reproduce that exactly.
    var frames = List(
      evs.filter(col("idx") === 0).groupBy("user")
        .agg(min(col("t")).as("anchor"))
        .withColumn("last", col("anchor")))
    for (i <- 1 until steps.size) {
      frames = (evs.filter(col("idx") === i)
        .join(frames.head, Seq("user"))
        .filter(col("t") >= col("last") && col("t") <= col("anchor") + windowMs)
        .groupBy("user")
        .agg(min(col("t")).as("_next"), first(col("anchor")).as("anchor"))
        .select(col("user"), col("anchor"), col("_next").as("last"))) :: frames
    }
    frames.reverse.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("step_name"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Users whose step-relevant event count exceeds `cap` — run this
    * alongside [[anchored]] when the cap might bite: it names the bots.
    */
  def hotUserReport(events: DataFrame, userCol: String, typeCol: String,
                    steps: Seq[String], cap: Int): DataFrame =
    events.filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol).as("user"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") > cap)
      .orderBy(col("n_events").desc, col("user"))

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
