package graft

import graft.operators.Sessions
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gaps > threshold and aggregates per session") {
    val ev = Seq(
      // user 1: two sessions (3h gap inside session, 20h gap between)
      (1L, ts("2024-01-01 00:00:00"), 10L),
      (1L, ts("2024-01-01 03:00:00"), 11L),
      (1L, ts("2024-01-02 00:00:00"), 12L),
      // user 2: one single-event session
      (2L, ts("2024-01-01 05:00:00"), 20L)
    ).toDF("user_id", "ts", "event_id")
    val got = Sessions.sessionize(ev, gapSeconds = 43200L)
      .orderBy("user_id", "session_idx")
      .collect()
    assert(got.length == 3)
    val u1s1 = got(0)
    assert(u1s1.getLong(0) == 1L && u1s1.getLong(1) == 1L && u1s1.getLong(2) == 2L)
    val u1s2 = got(1)
    assert(u1s2.getLong(1) == 2L && u1s2.getLong(2) == 1L)
    assert(got(2).getLong(0) == 2L && got(2).getLong(2) == 1L)
    // start/end micros bracket the session
    assert(u1s1.getLong(3) < u1s1.getLong(4))
    assert(u1s2.getLong(3) == u1s2.getLong(4))
  }

  test("funnel counts earliest-entry ordered completion, not mere presence") {
    val ev = Seq(
      // user 1 completes signup -> click -> purchase in order
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // user 2 clicked BEFORE signing up, purchase after: stops at stage 0
      (2L, ts("2024-01-01 00:00:00"), "click"),
      (2L, ts("2024-01-01 01:00:00"), "signup"),
      // user 3 signup+click only
      (3L, ts("2024-01-01 00:00:00"), "signup"),
      (3L, ts("2024-01-01 00:30:00"), "click"),
      // user 4 never signed up: in no stage
      (4L, ts("2024-01-01 00:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Sessions.funnel(ev, Seq("signup", "click", "purchase"))
      .orderBy("stage").collect()
    assert(got.map(r => (r.getInt(0), r.getLong(2))).toSeq ==
      Seq((0, 3L), (1, 2L), (2, 1L)))
    assert(got(2).getString(1) == "signup>click>purchase")
  }

  test("funnel same-timestamp step counts as at-or-after") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "signup"),
      (1L, ts("2024-01-01 00:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Sessions.funnel(ev, Seq("signup", "click"))
      .orderBy("stage").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 1L))
  }

  test("funnel over input with no step events yields 0 counts, not NULL") {
    val ev = Seq((1L, ts("2024-01-01 00:00:00"), "pageview"))
      .toDF("user_id", "ts", "event_type")
    val got = Sessions.funnel(ev, Seq("signup", "click"))
      .orderBy("stage").collect()
    // the global agg runs over ZERO users — stage counts must be 0, the
    // same answer a COUNT(*)-style oracle gives, never NULL
    assert(got.map(_.getLong(2)).toSeq == Seq(0L, 0L))
  }

  test("cohortRetention: offset 0 always contains the cohort's full user set") {
    val ev = Tables(spark, sf(), "events")
    val got = Sessions.cohortRetention(ev)
    // every user's first event is at offset 0 by construction, so summing
    // offset-0 users across cohorts = total distinct users
    val off0 = got.filter(col("week_offset") === 0)
      .agg(sum("n_users")).as[Long].head()
    val total = ev.select("user_id").distinct().count()
    assert(off0 == total)
    // offsets are non-negative and bounded by the data span
    assert(got.filter(col("week_offset") < 0).isEmpty)
  }

  test("eventSequences: first-k in time order, heap rank == window rank") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:02"), 12L, "click"),
      (1L, ts("2024-01-01 00:00:01"), 11L, "view"),
      (1L, ts("2024-01-01 00:00:03"), 13L, "buy"),
      // tie on ts -> event_id breaks it
      (2L, ts("2024-01-01 05:00:00"), 21L, "view"),
      (2L, ts("2024-01-01 05:00:00"), 20L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessions.eventSequences(ev, budget = 2)
      .orderBy("user_id", "rnk")
      .as[(Long, Long, Long, String, Long, Boolean)].collect()
    assert(got.toSeq == Seq(
      (1L, 1L, 11L, "view", 3L, true),
      (1L, 2L, 12L, "click", 3L, true),
      (2L, 1L, 20L, "click", 2L, false),
      (2L, 2L, 21L, "view", 2L, false)))
    // agreement with the window formulation on real data
    val events = Tables(spark, sf("sf0.01"), "events")
    val heap = Sessions.eventSequences(events, budget = 8)
      .select($"user_id", $"rnk", $"event_id")
      .as[(Long, Long, Long)].collect().sorted
    import org.apache.spark.sql.expressions.Window
    val win = events
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")).cast("long"))
      .filter($"rnk" <= 8)
      .select($"user_id", $"rnk", $"event_id")
      .as[(Long, Long, Long)].collect().sorted
    assert(heap.toSeq == win.toSeq)
  }
}
