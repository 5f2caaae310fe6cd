package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {

  // (num, den, y): p = num/den against outcome y
  private def frame(rows: Seq[(Long, Long, Boolean)]) = {
    import spark.implicits._
    rows.toDF("num", "den", "y")
  }

  private def report(rows: Seq[(Long, Long, Boolean)], bins: Int = 10) =
    Quality.calibrationReport(
      frame(rows), col("num"), col("den"), col("y"), bins)

  test("hand-computed bins: draw, fixed-point masses, bp renderings") {
    import spark.implicits._
    val got = report(Seq(
      (1L, 4L, false), // p=0.25 -> bin 2, sq20 262144, brier (1/16)*2^20
      (3L, 4L, true),  // p=0.75 -> bin 7, sq20 786432, brier (1/16)*2^20
      (4L, 4L, true),  // p=1.00 -> bin clamps to 9, brier 0
      (0L, 5L, false)  // p=0    -> bin 0, brier 0
    )).orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L),
      (2L, 1L, 0L, 262144L, 65536L, 2500L, 0L, 2500L),
      (7L, 1L, 1L, 786432L, 65536L, 7500L, 10000L, 2500L),
      (9L, 1L, 1L, 1048576L, 0L, 10000L, 10000L, 0L)))
  }

  test("hand-computed summary: ECE is the bin-mass-weighted gap, Brier the q20 mean") {
    import spark.implicits._
    val got = Quality.calibrationSummary(
      frame(Seq((1L, 4L, false), (3L, 4L, true), (4L, 4L, true), (0L, 5L, false))),
      col("num"), col("den"), col("y"))
      .as[(Long, Long, Long, Long)].collect().head
    // ECE = (1/4)(0 + 0.25 + 0.25 + 0) = 0.125; Brier = 2*65536/(4*2^20)
    assert(got == ((4L, 2L, 1250L, 313L)))
  }

  test("a perfectly calibrated 0/1 scorer has zero gap, ECE, and Brier") {
    import spark.implicits._
    val rows = (1 to 40).map(i => (if (i % 3 == 0) 1L else 0L, 1L, i % 3 == 0))
    val rep = report(rows)
    assert(rep.filter(col("gap_bp") =!= 0L || col("brier_q20_sum") =!= 0L).isEmpty)
    val s = Quality.calibrationSummary(
      frame(rows), col("num"), col("den"), col("y"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(s == ((40L, 13L, 0L, 0L)))
  }

  test("scores clamp to [0, den] and invalid rows drop") {
    import spark.implicits._
    val got = report(Seq(
      (7L, 4L, true),   // clamps to 4/4 -> bin 9, exact score 1, brier 0
      (-3L, 4L, false), // clamps to 0 -> bin 0
      (1L, 0L, true)    // den=0: dropped
    )).orderBy(col("bin"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      (0L, 1L, 0L, 0L, 0L, 0L, 0L, 0L),
      (9L, 1L, 1L, 1048576L, 0L, 10000L, 10000L, 0L)))
  }

  test("per-group calibration equals the global summary on each group's slice") {
    import spark.implicits._
    val rows = Seq(
      ("g1", 1L, 4L, false), ("g1", 3L, 4L, true), ("g1", 4L, 4L, true),
      ("g2", 0L, 5L, false), ("g2", 2L, 4L, true), ("g2", 1L, 2L, false))
    val df = rows.toDF("g", "num", "den", "y")
    val grouped = Quality.calibrationByGroup(
      df, "g", col("num"), col("den"), col("y"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    for (g <- Seq("g1", "g2")) {
      val slice = Quality.calibrationSummary(
        df.filter(col("g") === g), col("num"), col("den"), col("y"))
        .as[(Long, Long, Long, Long)].collect().head
      assert(grouped(g) == slice, s"group $g must match its slice's summary")
    }
  }

  test("bins parameter drives the draw") {
    import spark.implicits._
    val got = report(Seq((1L, 2L, false), (3L, 4L, true)), bins = 4)
      .select(col("bin")).as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L)) // 0.5 -> bin 2 of 4; 0.75 -> bin 3
  }

  // ---- Hosmer-Lemeshow goodness-of-fit over the same bins ----

  private def hlRun(rows: Seq[(Long, Long, Boolean)], bins: Int = 10)
      : (Long, Long, Option[Long], Option[Long], Option[Long]) = {
    import spark.implicits._
    graft.operators.Quality.hosmerLemeshow(frame(rows),
      col("num"), col("den"), col("y"), bins)
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].head()
  }

  /** Straight-double reference on the same 2^20-quantized expectations. */
  private def refHl(rows: Seq[(Long, Long, Boolean)], bins: Int)
      : (Long, Double) = {
    val byBin = rows.groupBy { case (num, den, _) =>
      math.min(bins - 1, num * bins / den) }
    val terms = byBin.toSeq.sortBy(_._1).map { case (_, rs) =>
      val n = rs.size.toDouble
      val o = rs.count(_._3).toDouble
      val e = rs.map { case (num, den, _) =>
        num * 1048576L / den }.sum / 1048576.0
      (e, n, o)
    }
    val live = terms.filter(t => t._1 > 0 && t._1 < t._2)
    (live.size.toLong, live.map { case (e, n, o) =>
      (o - e) * (o - e) / (e * (1 - e / n)) }.sum)
  }

  test("hosmerLemeshow: published form on quantized expectations (10 rounds)") {
    val gen = org.scalacheck.Gen.listOfN(200, for {
      den <- org.scalacheck.Gen.choose(5L, 40L)
      num <- org.scalacheck.Gen.choose(0L, den)
      y <- org.scalacheck.Gen.oneOf(true, false)
    } yield (num, den, y))
    for (round <- 0 until 10) {
      val rows = gen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(67000L + round)).get
      val got = hlRun(rows)
      val (cc, hl) = refHl(rows, 10)
      if (cc > 2) {
        assert(got._3 == Some(cc - 2), s"round $round df")
        assert(math.abs(got._4.get / 10000.0 - hl) < 1e-3, s"round $round hl")
        if (got._5.isDefined) {
          val h = hl / 2
          val p = math.exp(-h) * (1 + h + h * h / 2 + h * h * h / 6)
          assert(math.abs(got._5.get / 10000.0 - p) < 2e-4, s"round $round p")
        }
      } else assert(got._4.isEmpty)
    }
  }

  test("hosmerLemeshow: a systematically optimistic scorer scores far above an honest one") {
    // nine score levels 0.1..0.9, twenty rows each; the honest scorer's
    // labels arrive at exactly the stated rate, the liar's at 1 - rate
    val levels = (2L to 18L by 2L)
    val honest = levels.flatMap(num =>
      (0 until 20).map(i => (num, 20L, i < num)))
    val liar = levels.flatMap(num =>
      (0 until 20).map(i => (num, 20L, i < 20 - num)))
    val gh = hlRun(honest)
    val gl = hlRun(liar)
    assert(gh._3 == Some(7L)) // nine contributing bins
    assert(gh._4.get < 10000L, s"honest scorer must fit: ${gh._4}")
    assert(gl._4.get > gh._4.get * 5,
      s"miscalibration must dominate: ${gl._4} vs ${gh._4}")
  }

  test("hosmerLemeshow: degenerate expectations drop; all-zero scores null") {
    val zeros = (0 until 50).map(_ => (0L, 10L, false))
    val got = hlRun(zeros)
    assert(got._2 == 1L && got._3.isEmpty && got._4.isEmpty && got._5.isEmpty)
  }
}
