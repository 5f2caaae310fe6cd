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

  private def runCusum(counts: Seq[Int]) =
    Sessions.cusumDailyCounts(series(counts))
      .orderBy("day").collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))

  test("CUSUM accumulates a sustained burst that EWMA's 3-sigma misses") {
    // 20 days at 25 then 5 at 40: the first burst day sits exactly AT the
    // EWMA 3-sigma fence (15 > 3*sqrt(25) is false) and smoothing absorbs
    // the rest — but the one-sided sum accumulates ~9.4/day and crosses h
    val shifted = Seq.fill(20)(25) ++ Seq.fill(5)(40)
    val ewma = run(shifted)
    assert(ewma.forall(!_._3), "no single day trips the EWMA alarm")
    val cusum = runCusum(shifted)
    assert(cusum.last._4, "the sustained burst must trip CUSUM")
    // the upward sum grows monotonically through the burst
    val ups = cusum.drop(20).map(_._2)
    assert(ups.zip(ups.tail).forall { case (a, b) => b >= a })
  }

  test("CUSUM hand fold") {
    // mu = 20, k = 0.5*sqrt(20) = 2.2360679...
    val out = runCusum(Seq(20, 20, 20))
    // every step: max(0, acc + (20 - 20 - 2.236)) = 0
    assert(out.forall(r => r._2 == 0.0 && r._3 == 0.0 && !r._4))
  }

  test("CUSUM one-sided sums stay non-negative") {
    val out = runCusum(Seq(5, 50, 5, 50, 5))
    assert(out.forall(r => r._2 >= 0.0 && r._3 >= 0.0))
  }

  private def runAcf(counts: Seq[Int], maxLag: Int = 7) =
    Sessions.autocorrelation(series(counts), maxLag = maxLag)
      .orderBy("lag").collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap

  test("ACF hand values on an alternating series") {
    // 10,20 x4: mu=15, denom=200; lag1: 7*(-25)/200; lag2: 6*25/200
    val acf = runAcf(Seq(10, 20, 10, 20, 10, 20, 10, 20))
    assert(acf(1L) == -0.875)
    assert(acf(2L) == 0.75)
  }

  test("ACF finds the planted period") {
    // spike every 3 days: lag 3 correlates far above lag 1
    val acf = runAcf(Seq(30, 10, 10, 30, 10, 10, 30, 10, 10, 30, 10, 10))
    assert(acf(3L) > 0.5)
    assert(acf(3L) > acf(1L) && acf(3L) > acf(2L))
  }

  test("ACF of a zero-variance series is 0 by the guard") {
    val acf = runAcf(Seq(5, 5, 5, 5, 5))
    assert(acf.values.forall(_ == 0.0))
  }

  test("per-type series are independent") {
    val df = series(Seq(10, 10)).unionAll(series(Seq(3), "view"))
    val out = Sessions.ewmaDailyCounts(df).collect()
      .map(r => (r.getString(0), r.getLong(2)))
    assert(out.count(_._1 == "click") == 2 && out.count(_._1 == "view") == 1)
  }
}
