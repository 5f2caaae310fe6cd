package graft

import graft.operators.Sessions
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Two-cohort log-rank test: a straight-double reference over the same
  * lifetime/censoring construction, cohort symmetry, and the degenerate
  * guards. Event fixtures are built so lifetimes and censoring are
  * hand-auditable (one event-day per user boundary, gap = 1 day).
  */
class LogRankSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  /** (user, cohort, firstDayIdx, lastDayIdx); corpus end = max last. */
  private def run(users: Seq[(Long, Long, Long, Long)])
      : (Long, Long, Long, Double, Option[Double]) = {
    val rows = users.flatMap { case (u, c, f, l) =>
      Seq((u, c, new Timestamp(f * day / 1000)),
        (u, c, new Timestamp(l * day / 1000)))
    }
    val df = rows.toDF("user_id", "c", "ts")
    Sessions.logRankTest(df, col("c"), churnGapDays = 1)
      .as[(Long, Long, Long, Double, Option[Double])].head()
  }

  /** Published log-rank over explicit (t, died, cohort) triples. */
  private def ref(lts: Seq[(Long, Boolean, Int)]): (Double, Double, Long) = {
    val days = lts.map(_._1).distinct.sorted
    var e = 0.0; var v = 0.0
    for (t <- days) {
      val atRisk = lts.filter(_._1 >= t)
      val r0 = atRisk.count(_._3 == 0).toDouble
      val r1 = atRisk.count(_._3 == 1).toDouble
      val r = r0 + r1
      val d = lts.count(x => x._1 == t && x._2).toDouble
      e += d * r0 / r
      if (r > 1) v += d * (r0 / r) * (1 - r0 / r) * (r - d) / (r - 1)
    }
    val oa = lts.count(x => x._2 && x._3 == 0).toLong
    (e, v, oa)
  }

  test("logrank: identical cohort compositions score z ~ 0") {
    // two cohorts with the SAME lifetime/censoring profile
    val users = (0L until 20L).map { i =>
      (i, i % 2, 0L, 1L + (i / 2) % 5) // lifetimes 1..5 days, mirrored
    }
    val got = run(users)
    assert(got._1 == 10L && got._2 == 10L)
    assert(math.abs(got._5.get) < 0.75) // same profile: no real signal
  }

  test("logrank: matches the published form on a mixed fixture") {
    // cohort 0 churns early, cohort 1 late + censored tail
    val users = Seq(
      (1L, 0L, 0L, 1L), (2L, 0L, 0L, 1L), (3L, 0L, 0L, 2L), (4L, 0L, 0L, 3L),
      (5L, 1L, 0L, 4L), (6L, 1L, 0L, 5L), (7L, 1L, 0L, 6L), (8L, 1L, 0L, 7L))
    val got = run(users)
    // replicate the operator's lifetime/censoring rule: end = day 7;
    // churned iff (end - last) > 1 day
    val lts = users.map { case (_, c, f, l) =>
      (l - f, (7L - l) > 1L, c.toInt)
    }
    val (e, v, oa) = ref(lts)
    assert(got._3 == oa)
    assert(math.abs(got._4 - e) < 1e-4)
    assert(math.abs(got._5.get - (oa - e) / math.sqrt(v)) < 1e-4)
    assert(got._5.get > 0) // cohort 0 churned MORE than expected
  }

  test("logrank: cohort swap flips the sign of z") {
    val users = Seq(
      (1L, 0L, 0L, 1L), (2L, 0L, 0L, 2L), (3L, 0L, 0L, 2L),
      (4L, 1L, 0L, 4L), (5L, 1L, 0L, 5L), (6L, 1L, 0L, 6L))
    val fwd = run(users)
    val rev = run(users.map { case (u, c, f, l) => (u, 1L - c, f, l) })
    assert(math.abs(fwd._5.get + rev._5.get) < 2e-4)
  }

  test("logrank: empty cohort reports counts, null z") {
    val got = run(Seq((1L, 0L, 0L, 1L), (2L, 0L, 0L, 2L)))
    assert(got._1 == 2L && got._2 == 0L && got._5.isEmpty)
  }
}
