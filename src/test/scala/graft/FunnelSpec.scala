package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

/** Anchored funnel: first-touch anchor, greedy-earliest steps, window. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("anchored funnel: window expiry, step order, first-touch anchor") {
    val events = Seq(
      // user 1: completes within 1000ms window
      (1L, ts(0L), "view"), (1L, ts(100L), "click"), (1L, ts(900L), "purchase"),
      // user 2: click outside the anchor window → stops at view
      (2L, ts(0L), "view"), (2L, ts(1500L), "click"), (2L, ts(1600L), "purchase"),
      // user 3: purchase BEFORE click → order violated, stops at click
      (3L, ts(0L), "view"), (3L, ts(50L), "purchase"), (3L, ts(100L), "click"),
      // user 4: no view at all → never enters
      (4L, ts(0L), "click"), (4L, ts(10L), "purchase"),
      // user 5: first view anchors; the LATER view does not re-anchor,
      // so the click at 1800 is out of window → stops at view
      (5L, ts(0L), "view"), (5L, ts(1200L), "view"), (5L, ts(1800L), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.anchored(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowMs = 1000L)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)),
      s"got ${got.toSeq}")
  }

  test("anchoredChained ≡ anchored on a mixed fixture and on real events") {
    val events = Seq(
      (1L, ts(0L), "view"), (1L, ts(100L), "click"), (1L, ts(900L), "purchase"),
      (2L, ts(0L), "view"), (2L, ts(1500L), "click"), (2L, ts(1600L), "purchase"),
      (3L, ts(0L), "view"), (3L, ts(50L), "purchase"), (3L, ts(100L), "click"),
      (4L, ts(0L), "click"), (4L, ts(10L), "purchase"),
      (5L, ts(0L), "view"), (5L, ts(1200L), "view"), (5L, ts(1800L), "click"),
      (6L, ts(0L), "click"), (6L, ts(0L), "view"), (6L, ts(0L), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("step").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows(Funnel.anchoredChained(events, "user_id", "ts", "event_type", steps, 1000L))
      == rows(Funnel.anchored(events, "user_id", "ts", "event_type", steps, 1000L)))
    // and on the real events table — the q_funnel configuration
    val ev = Tables.events(spark, sf)
    val cfg = (Seq("view", "click", "purchase"), 86400000L)
    assert(rows(Funnel.anchoredChained(ev, "user_id", "ts", "event_type", cfg._1, cfg._2))
      == rows(Funnel.anchored(ev, "user_id", "ts", "event_type", cfg._1, cfg._2)))
  }

  test("hot user: capped fold stays bounded and correct; report names the bot") {
    // one bot with 60k step-relevant events, journey completing in the
    // first three; two normal users
    val bot = (0 until 60000).map(i =>
      (99L, ts(i.toLong), if (i % 2 == 0) "view" else "click")) :+
      ((99L, ts(2L), "purchase"))
    val events = (bot ++ Seq(
      (1L, ts(0L), "view"), (1L, ts(1L), "click"), (1L, ts(2L), "purchase"),
      (2L, ts(0L), "view"))).toDF("user_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("step").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // cap of 1000 clips the bot's tail but its journey completed at t=2
    // → results identical to uncapped, buffer ≤ 1000 structurally
    val capped = rows(Funnel.anchored(events, "user_id", "ts", "event_type",
      steps, 1000000L, maxEventsPerUser = 1000))
    val chained = rows(Funnel.anchoredChained(events, "user_id", "ts", "event_type",
      steps, 1000000L))
    assert(capped == Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 2L)),
      s"got $capped")
    assert(chained == capped)
    // the zero-buffer chained path handles the bot with plain mins
    val report = Funnel.hotUserReport(events, "user_id", "event_type", steps, 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(report.toSeq == Seq((99L, 60001L)))
  }

  test("cohort retention: first-event week anchors, fractions of cohort size") {
    def day(d: Int) = ts(d * 86400000L)
    val events = Seq(
      // cohort of week 0 (Mon 1970-01-05 is day 4): users 1,2 start day 5
      (1L, day(5), "view"), (2L, day(5), "view"),
      // user 1 returns in week +1, user 2 does not
      (1L, day(12), "click"),
      // user 3 starts in week +1 alone
      (3L, day(12), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("1970-01-05", 0, 2L, 1.0),
      ("1970-01-05", 1, 1L, 0.5),
      ("1970-01-12", 0, 1L, 1.0)), s"got ${got.toSeq}")
  }

  test("out-of-order input sorts before the walk; ties resolve in step order") {
    val events = Seq(
      (1L, ts(500L), "purchase"), (1L, ts(0L), "view"), (1L, ts(200L), "click"),
      (2L, ts(0L), "click"), (2L, ts(0L), "view"), (2L, ts(0L), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.anchored(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowMs = 1000L)
      .orderBy("step").collect().map(_.getLong(2))
    // both users complete: user 1 after sorting, user 2 via same-ms
    // events resolving view→click→purchase by step index
    assert(got.toSeq == Seq(2L, 2L, 2L))
  }
}
