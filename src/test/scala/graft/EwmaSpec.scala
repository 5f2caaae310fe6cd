package graft

import graft.operators.Sessions
import java.sql.Timestamp

/** EWMA control chart: hand-computed folds, the alpha = 1 identity, spike
  * flagging, and quiet-series silence.
  */
class EwmaSpec extends SparkSpec {
  import spark.implicits._

  // n events of one type on the given day (days since 2024-01-01)
  private def series(counts: Seq[Int], tpe: String = "click") =
    counts.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map { k =>
        (day.toLong * 1000 + k,
          Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"), tpe)
      }
    }.toDF("event_id", "ts", "event_type")

  private def run(counts: Seq[Int], alpha: Double = 0.3) =
    Sessions.ewmaDailyCounts(series(counts), alpha = alpha)
      .orderBy("day").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getBoolean(4)))

  test("hand-computed fold") {
    val out = run(Seq(10, 10, 20))
    assert(out(0) == ((10L, 10.0, false)))
    assert(out(1) == ((10L, 10.0, false)))
    // e2 = 0.3*20 + 0.7*10 = 13; |20-10| = 10 > 3*sqrt(10) = 9.49 -> anomaly
    assert(out(2)._1 == 20L && out(2)._2 == 13.0 && out(2)._3)
  }

  test("alpha = 1 tracks the series exactly") {
    val out = run(Seq(5, 9, 2), alpha = 1.0)
    assert(out.map(_._2).toSeq == Seq(5.0, 9.0, 2.0))
  }

  test("steady series never alarms; a spike does, then smoothing absorbs it") {
    val steady = run(Seq(20, 21, 19, 20, 22, 18))
    assert(steady.forall(!_._3))
    val spike = run(Seq(20, 20, 20, 60, 20))
    assert(spike(3)._3, "the 3x spike must alarm")
    assert(!spike(0)._3)
  }

  test("per-type series are independent") {
    val df = series(Seq(10, 10)).unionAll(series(Seq(3), "view"))
    val out = Sessions.ewmaDailyCounts(df).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(out.count(_._1 == "click") == 2 && out.count(_._1 == "view") == 1)
  }
}
