package graft

import graft.operators.Sessions
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Markov transition matrix and RFM segmentation: hand-computed
  * transitions (row-stochastic, last-event emits nothing) and quintile
  * banding on a constructed user population.
  */
class BehaviorAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("hand-computed transition matrix") {
    // user 1: a -> b -> a -> b ; user 2: a -> c
    val ev = Seq(
      (1L, ts(10), 1L, "a"), (2L, ts(20), 1L, "b"),
      (3L, ts(30), 1L, "a"), (4L, ts(40), 1L, "b"),
      (5L, ts(10), 2L, "a"), (6L, ts(20), 2L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessions.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // from a: b twice, c once -> p = 0.6667 / 0.3333
    assert(out(("a", "b")) == ((2L, 0.6667)))
    assert(out(("a", "c")) == ((1L, 0.3333)))
    // from b: a once (the final b at ts=40 emits nothing)
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(!out.contains(("c", "a")))
  }

  test("transition rows are row-stochastic per from_type") {
    val ev = Tables(spark, sf(), "events")
    val sums = Sessions.transitionMatrix(ev)
      .groupBy("from_type").agg(sum(col("p")).as("s"))
      .collect().map(_.getDouble(1))
    sums.foreach(s => assert(math.abs(s - 1.0) < 0.01, s"row sum $s"))
  }

  test("ties order by event_id within equal timestamps") {
    val ev = Seq(
      (2L, ts(10), 1L, "b"), (1L, ts(10), 1L, "a"), (3L, ts(20), 1L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessions.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "b"), ("b", "c")))
  }

  test("RFM quintile banding on a constructed population") {
    // 10 users: user i has i+1 events at times i*100..; value 10*(i+1)
    val rows = for {
      i <- 0 until 10
      j <- 0 to i
    } yield ((i * 20 + j).toLong, ts(1000L + i * 100 + j), i.toLong, 10.0 * (i + 1))
    val ev = rows.toDF("event_id", "ts", "user_id", "value")
    val out = Sessions.rfmSegments(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))))
      .toMap
    // user 9: most recent, most frequent, biggest spend -> "555"
    assert(out(9L)._6 == "555")
    // user 0: oldest, least frequent, smallest spend -> "111"
    assert(out(0L)._6 == "111")
    // monotone: scores never decrease with i on this construction
    val segs = (0 until 10).map(i => out(i.toLong))
    segs.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 <= b._3 && a._4 <= b._4 && a._5 <= b._5)
    }
    // frequency and decimal-summed monetary are exact
    assert(out(4L)._1 == 5L && out(4L)._2 == 250.0)
  }

  test("Kaplan-Meier hand curve with censoring") {
    def day(d: Double) = ts((d * 86400).toLong)
    // u1 churns at lifetime 10, u2 at 20, u4 at 0; u3 is active until
    // half a day before the end -> censored at lifetime 99
    val ev = Seq(
      (1L, day(0), 1L), (2L, day(10), 1L),
      (3L, day(0), 2L), (4L, day(20), 2L),
      (5L, day(0), 3L), (6L, day(99.5), 3L),
      (7L, day(0), 4L)).map { case (e, t, u) => (e, t, u) }
      .toDF("event_id", "ts", "user_id")
    val out = Sessions.kaplanMeier(ev, churnGapDays = 7).orderBy("t_day")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (0L, 4L, 1L, 0L, 0.75),
      (10L, 3L, 1L, 0L, 0.5),
      (20L, 2L, 1L, 0L, 0.25)))
  }

  test("Kaplan-Meier: censored users hold the curve up") {
    def day(d: Int) = ts(d.toLong * 86400)
    // same deaths, but with 4 extra long-lived censored users the
    // survival at t=0 rises from 0.75 to 7/8
    val churners = Seq((1L, day(0), 1L), (2L, day(0), 2L), (20L, day(50), 9L))
    val censored = (3L to 6L).flatMap(u =>
      Seq((u * 10, day(0), u), (u * 10 + 1, day(50), u)))
    val ev = (churners ++ censored).toDF("event_id", "ts", "user_id")
    val out = Sessions.kaplanMeier(ev, churnGapDays = 7).orderBy("t_day")
      .collect().map(r => (r.getLong(0), r.getDouble(4)))
    assert(out.head._1 == 0L && out.head._2 == 0.7143) // 1 - 2/7
  }

  test("session paths: gap splits journeys, frequencies and shares add up") {
    // user 1: a>b then (after the gap) a>c ; user 2: a>b
    val gapS = 100L
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(10), 1L, "b"),
      (3L, ts(500), 1L, "a"), (4L, ts(510), 1L, "c"),
      (5L, ts(0), 2L, "a"), (6L, ts(10), 2L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessions.sessionPaths(ev, k = 10, gapSeconds = gapS)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out("a>b") == ((2L, 0.6667)))
    assert(out("a>c") == ((1L, 0.3333)))
  }

  test("session paths order ties on event_id within equal timestamps") {
    val ev = Seq(
      (2L, ts(10), 1L, "b"), (1L, ts(10), 1L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Sessions.sessionPaths(ev, k = 5).collect()
    assert(out.head.getString(0) == "a>b")
  }

  test("RFM is deterministic and complete over the corpus") {
    val ev = Tables(spark, sf(), "events")
    val a = Sessions.rfmSegments(ev).orderBy("user_id").collect()
    val b = Sessions.rfmSegments(ev).orderBy("user_id").collect()
    assert(a.sameElements(b))
    assert(a.length == ev.select("user_id").distinct().count())
  }
}
