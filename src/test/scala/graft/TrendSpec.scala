package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Jonckheere–Terpstra ordered-trend test: hand-computed values, an
  * independent straight-double reference (pair counting, Hollander &
  * Wolfe tie-corrected variance), the k=2 ≡ Mann-Whitney identity, and
  * the ordered-alternative behaviors the unordered omnibus family lacks.
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private def jt(rows: Seq[(Long, Long)])
      : (Long, Long, Option[Long], Option[Double]) =
    Quality.jonckheereTerpstra(rows.toDF("g", "v"), col("v"), col("g"))
      .as[(Long, Long, Option[Long], Option[Double])].head()

  /** Published form, straight doubles, pairs counted directly. */
  private def refJt(rows: Seq[(Long, Long)]): (Double, Double) = {
    val gs = rows.map(_._1).distinct.sorted
    var s = 0.0
    for (i <- gs.indices; j <- i + 1 until gs.size) {
      val xi = rows.filter(_._1 == gs(i)).map(_._2)
      val xj = rows.filter(_._1 == gs(j)).map(_._2)
      s += (for (a <- xi; b <- xj)
        yield if (a < b) 1.0 else if (a == b) 0.5 else 0.0).sum
    }
    val n = rows.size.toDouble
    val ns = gs.map(g => rows.count(_._1 == g).toDouble)
    val pairs = (n * n - ns.map(x => x * x).sum) / 2
    val e = pairs / 2
    val ties = rows.map(_._2).groupBy(identity).values.map(_.size.toDouble)
    def m(f: Double => Double) = ns.map(f).sum
    def t(f: Double => Double) = ties.map(f).sum
    val v = (n * (n - 1) * (2 * n + 5) -
        m(x => x * (x - 1) * (2 * x + 5)) - t(x => x * (x - 1) * (2 * x + 5))) / 72 +
      m(x => x * (x - 1) * (x - 2)) * t(x => x * (x - 1) * (x - 2)) /
        (36 * n * (n - 1) * (n - 2)) +
      m(x => x * (x - 1)) * t(x => x * (x - 1)) / (8 * n * (n - 1))
    ((s - e) / math.sqrt(v), s / pairs)
  }

  test("jt: hand case — perfect ascending trend pins po to 1") {
    // g1={1,2}, g2={3,4}, g3={5,6}: every cross-group pair ascends
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (3L, 6L))
    val got = jt(rows)
    assert(got._1 == 3L && got._2 == 6L)
    assert(got._3 == Some(10000L))
    // JT = 12, E = (36-12)/4 = 6, var = (6*5*17 - 3*18)/72 = 6.333...,
    // z = 6/sqrt(6.3333) = 2.3842 after the display r4
    assert(got._4 == Some(2.3842))
  }

  test("jt: matches the published tie-corrected form (10 rounds)") {
    val rowGen = Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 12L))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(50, rowGen), 45000L + round)
      val (zWant, poWant) = refJt(rows)
      val got = jt(rows)
      assert(got._2 == 50L)
      assert(math.abs(got._3.get / 10000.0 - poWant) < 1e-4, s"po round $round")
      assert(math.abs(got._4.get - zWant) < 1e-4, s"z round $round")
    }
  }

  test("jt: reversing the group order flips the trend") {
    val rowGen = Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 9L))
    val rows = draw(Gen.listOfN(40, rowGen), 46000L)
    val fwd = jt(rows)
    val rev = jt(rows.map { case (g, v) => (5L - g, v) })
    // po_fwd + po_rev = 1 (ties counted half on both sides); z flips sign
    assert(math.abs((fwd._3.get + rev._3.get) - 10000L) <= 1)
    assert(math.abs(fwd._4.get + rev._4.get) < 2e-4)
  }

  test("jt: k=2 reduces to Mann-Whitney (po = AUC of group2 over group1)") {
    val as = Seq(1L, 4L, 4L, 9L); val bs = Seq(2L, 4L, 10L, 11L)
    val rows = as.map((1L, _)) ++ bs.map((2L, _))
    val got = jt(rows)
    val mwu = Quality.mannWhitneyU(bs.toDF("v"), as.toDF("v"), "v")
      .select("auc_bp").as[Long].head()
    assert(got._3.get == mwu)
  }

  test("jt: exact under any strictly monotone value map (rank statistic)") {
    val rowGen = Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 9L))
    val rows = draw(Gen.listOfN(30, rowGen), 47000L)
    assert(jt(rows.map { case (g, v) => (g, v * v * 3 + 1) }) == jt(rows))
  }

  test("jt: all values tied — var 0, null z, po at the half point") {
    val got = jt(Seq((1L, 5L), (1L, 5L), (2L, 5L), (2L, 5L)))
    assert(got._3 == Some(5000L) && got._4.isEmpty)
  }

  test("jt: single group reports counts, null displays") {
    assert(jt(Seq((1L, 1L), (1L, 2L))) == ((1L, 2L, None, None)))
  }

  test("jt: monotone trend scores higher than the same values shuffled across groups") {
    val trend = Seq.tabulate(30)(i => (i / 10 + 1L, i.toLong))
    val mixed = Seq.tabulate(30)(i => (i % 3 + 1L, i.toLong))
    assert(jt(trend)._4.get > jt(mixed)._4.get)
  }

  // ---- Mann-Kendall + Sen (the daily-series trend pairing) ----

  private val dayMs = 86400000L

  /** counts per day -> one event row per unit count on that day */
  private def mk(dailyCounts: Seq[Long], tpe: String = "t")
      : (String, Long, Long, Option[Double], Option[Double]) =
    graft.operators.Sessions.mannKendallTrend(
      dailyCounts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c.toInt)((tpe, new java.sql.Timestamp(d * dayMs)))
      }.toDF("event_type", "ts"))
      .as[(String, Long, Long, Option[Double], Option[Double])].head()

  test("mk: strictly ascending counts — S = m(m-1)/2, Sen = exact slope") {
    val got = mk(Seq(2L, 4L, 6L, 8L, 10L))
    assert(got._2 == 5L && got._3 == 10L) // all 10 pairs concordant
    // no ties: var = 5*4*15/18, z = 9/sqrt(16.666) = 2.2045
    assert(got._4 == Some(2.2045))
    assert(got._5 == Some(2.0)) // every pairwise slope is exactly 2
  }

  test("mk: reversing the series flips S and z; Sen negates") {
    val up = mk(Seq(1L, 3L, 2L, 7L, 6L, 9L))
    val dn = mk(Seq(9L, 6L, 7L, 2L, 3L, 1L))
    assert(up._3 == -dn._3)
    assert(math.abs(up._4.get + dn._4.get) < 2e-4)
    assert(math.abs(up._5.get + dn._5.get) < 2e-4)
  }

  test("mk: a constant series is fully tied — S 0, var 0, null z, Sen 0") {
    val got = mk(Seq(5L, 5L, 5L, 5L))
    assert(got._3 == 0L && got._4.isEmpty && got._5 == Some(0.0))
  }

  test("mk: Sen's slope shrugs off the outlier day that would wreck OLS") {
    val clean = mk(Seq(10L, 12L, 14L, 16L, 18L, 20L, 22L))
    val spiked = mk(Seq(10L, 12L, 14L, 500L, 18L, 20L, 22L))
    assert(clean._5 == Some(2.0))
    // the median pairwise slope barely moves; an OLS fit would report ~20x
    assert(math.abs(spiked._5.get - 2.0) < 1.0)
    assert(spiked._3 > 0L) // the trend call survives too
  }

  test("mk: single-day type reports counts and null displays") {
    val got = mk(Seq(7L))
    assert(got._2 == 1L && got._3 == 0L && got._4.isEmpty && got._5.isEmpty)
  }

  // ---- Pettitt change-point locator ----

  private def pettitt(dailyCounts: Seq[Long])
      : (String, Long, Option[Long], Option[java.sql.Date], Option[Double]) =
    graft.operators.Sessions.pettittTest(
      dailyCounts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c.toInt)(("t", new java.sql.Timestamp(d * dayMs)))
      }.toDF("event_type", "ts"))
      .as[(String, Long, Option[Long], Option[java.sql.Date], Option[Double])]
      .head()

  /** Straight reference: U_t by pair counting, earliest argmax. */
  private def refPettitt(xs: Seq[Long]): (Long, Int, Double) = {
    val m = xs.size
    val us = (1 until m).map { t =>
      (for (i <- 0 until t; j <- t until m)
        yield (xs(j) compare xs(i)).sign.toLong).sum
    }
    val k = us.map(math.abs).max
    val t = us.indexWhere(u => math.abs(u) == k) + 1
    val p = math.min(1.0, 2 * math.exp(-6.0 * k * k /
      (math.pow(m, 3) + math.pow(m, 2))))
    (k, t, p)
  }

  test("pettitt: a level shift is located at the split day") {
    val series = Seq.fill(6)(10L) ++ Seq.fill(6)(30L)
    val got = pettitt(series)
    val (k, t, p) = refPettitt(series)
    assert(got._3 == Some(k))
    assert(k == 36L) // 6x6 discordant pairs, all concordant upward
    assert(got._4.get.getTime / dayMs == t - 1) // split after day index t-1
    assert(math.abs(got._5.get - math.floor(p * 10000 + 0.5) / 10000) < 1e-9)
    assert(got._5.get < 0.05)
  }

  test("pettitt: matches the reference on a mixed series, earliest tie wins") {
    val series = Seq(4L, 9L, 2L, 8L, 8L, 3L, 12L, 1L, 7L, 7L)
    val got = pettitt(series)
    val (k, t, _) = refPettitt(series)
    assert(got._3 == Some(k))
    assert(got._4.get.getTime / dayMs == t - 1)
  }

  test("pettitt: a constant series carries no change point — K 0, p 1") {
    val got = pettitt(Seq(5L, 5L, 5L, 5L, 5L))
    assert(got._3 == Some(0L) && got._5 == Some(1.0))
  }

  test("pettitt: single-day type reports counts and null displays") {
    val got = pettitt(Seq(7L))
    assert(got._2 == 1L && got._3.isEmpty && got._4.isEmpty && got._5.isEmpty)
  }

  // ---- Ljung-Box portmanteau (whiteness over the first L lags) ----

  private def lb(dailyCounts: Seq[Long], lags: Int = 6)
      : (String, Long, Option[Long], Option[Long], Option[Long]) =
    graft.operators.Sessions.ljungBox(
      dailyCounts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c.toInt)(("t", new java.sql.Timestamp(d * dayMs)))
      }.toDF("event_type", "ts"), lags = lags)
      .as[(String, Long, Option[Long], Option[Long], Option[Long])].head()

  /** Published form, straight doubles: biased-ACF Q and the even-dof
    * chi-square survival.
    */
  private def refLb(xs: Seq[Long], lags: Int): (Double, Double, Double) = {
    val m = xs.size
    val mu = xs.sum.toDouble / m
    val den = xs.map(x => (x - mu) * (x - mu)).sum
    def rho(k: Int) =
      (0 until m - k).map(i => (xs(i) - mu) * (xs(i + k) - mu)).sum / den
    val q = m * (m + 2.0) *
      (1 to lags).map(k => rho(k) * rho(k) / (m - k)).sum
    val h = q / 2
    val p = math.exp(-h) * (0 until lags / 2)
      .map(j => math.pow(h, j) / (1 to j).product).sum
    (rho(1), q, p)
  }

  test("lb: matches the published form (10 rounds)") {
    val gen = Gen.listOfN(25, Gen.choose(1L, 80L))
    for (round <- 0 until 10) {
      val xs = draw(gen, 47000L + round)
      val (r1, q, p) = refLb(xs, 6)
      val got = lb(xs)
      assert(got._2 == 25L)
      assert(math.abs(got._3.get / 10000.0 - r1) < 2e-4, s"r1 round $round")
      assert(math.abs(got._4.get / 10000.0 - q) < 1e-3, s"q round $round")
      assert(math.abs(got._5.get / 10000.0 - p) < 2e-4, s"p round $round")
      assert(got._5.get >= 0L && got._5.get <= 10000L)
    }
  }

  test("lb: a strong cycle scores far above the same counts shuffled") {
    // period-2 alternation: rho(1) ~ -1, rho(2) ~ +1 — Q huge, p ~ 0
    val cyc = Seq.tabulate(24)(i => if (i % 2 == 0) 10L else 50L)
    val got = lb(cyc)
    assert(got._3.get < -8000L) // lag-1 autocorrelation strongly negative
    assert(got._5.get == 0L)
    // the same multiset in a fixed quasi-random order scores far lower
    val mixed = new scala.util.Random(7).shuffle(cyc.toList)
    assert(got._4.get > lb(mixed)._4.get)
  }

  test("lb: a constant series has zero denominator — null displays") {
    val got = lb(Seq.fill(12)(5L))
    assert(got._2 == 12L && got._3.isEmpty && got._4.isEmpty &&
      got._5.isEmpty)
  }

  test("lb: a series no longer than the lag count reports null displays") {
    val got = lb(Seq(3L, 9L, 4L, 8L, 2L, 7L))
    assert(got._2 == 6L && got._4.isEmpty)
  }

  test("lb: odd or non-positive lag counts are refused loudly") {
    intercept[IllegalArgumentException] { lb(Seq(1L, 2L, 3L), lags = 5) }
    intercept[IllegalArgumentException] { lb(Seq(1L, 2L, 3L), lags = 0) }
  }

  // ---- Wald-Wolfowitz runs test (randomness about the median) ----

  private def runs(dailyCounts: Seq[Long])
      : (String, Long, Long, Long, Long, Option[Long]) =
    graft.operators.Sessions.runsTest(
      dailyCounts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c.toInt)(("t", new java.sql.Timestamp(d * dayMs)))
      }.toDF("event_type", "ts"))
      .as[(String, Long, Long, Long, Long, Option[Long])].head()

  /** Published form, straight doubles: drop median ties, count runs,
    * normal approximation without continuity correction.
    */
  private def refRuns(xs: Seq[Long]): (Long, Long, Long, Double) = {
    val sorted = xs.sorted
    val m2 = sorted((xs.size - 1) / 2) + sorted(xs.size / 2)
    val sg = xs.map(x => (2 * x) compare m2).filter(_ != 0)
    val n1 = sg.count(_ > 0).toLong
    val n2 = sg.count(_ < 0).toLong
    val r = if (sg.isEmpty) 0L
      else 1L + sg.sliding(2).count(w => w.size == 2 && w(0) != w(1))
    val n = (n1 + n2).toDouble
    val c = 2.0 * n1 * n2
    val z = (r - (1.0 + c / n)) / math.sqrt(c * (c - n) / (n * n * (n - 1)))
    (n1, n2, r, z)
  }

  test("runs: perfect alternation maximizes runs — z large positive") {
    val xs = Seq.tabulate(20)(i => if (i % 2 == 0) 1L else 9L)
    val got = runs(xs)
    assert(got._3 == 10L && got._4 == 10L && got._5 == 20L)
    assert(got._6.get > 30000L)
  }

  test("runs: two level blocks give exactly 2 runs — z large negative") {
    val xs = Seq.fill(10)(2L) ++ Seq.fill(10)(40L)
    val got = runs(xs)
    assert(got._5 == 2L)
    assert(got._6.get < -30000L)
  }

  test("runs: matches the published form, ties dropped (10 rounds)") {
    val gen = Gen.listOfN(24, Gen.choose(1L, 30L))
    for (round <- 0 until 10) {
      val xs = draw(gen, 48000L + round)
      val (n1, n2, r, z) = refRuns(xs)
      val got = runs(xs)
      assert((got._3, got._4, got._5) == ((n1, n2, r)), s"counts round $round")
      if (n1 > 0 && n2 > 0 && n1 + n2 > 1 && 2 * n1 * n2 > n1 + n2)
        assert(math.abs(got._6.get / 10000.0 - z) < 2e-4, s"z round $round")
    }
  }

  // ---- Durbin-Watson lag-1 serial-correlation diagnostic ----

  private def dw(dailyCounts: Seq[Long]): (String, Long, Option[Long]) =
    graft.operators.Sessions.durbinWatson(
      dailyCounts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c.toInt)(("t", new java.sql.Timestamp(d * dayMs)))
      }.toDF("event_type", "ts"))
      .as[(String, Long, Option[Long])].head()

  test("dw: matches the published ratio; smooth vs alternating separate (10 rounds)") {
    for (round <- 0 until 10) {
      val xs = draw(Gen.listOfN(25, Gen.choose(1L, 60L)), 65000L + round)
      val got = dw(xs)
      val mu = xs.sum.toDouble / xs.size
      val want = xs.sliding(2).map(w => math.pow(w(1) - w(0), 2)).sum /
        xs.map(x => (x - mu) * (x - mu)).sum
      assert(math.abs(got._3.get / 10000.0 - want) < 1e-3, s"round $round")
    }
    // a smooth ramp hugs d ~ 0 (positive autocorrelation); a period-2
    // alternation pushes d toward 4
    val ramp = dw((1L to 20L).toSeq)
    val alt = dw(Seq.tabulate(20)(i => if (i % 2 == 0) 5L else 50L))
    assert(ramp._3.get < 10000L && alt._3.get > 30000L)
  }

  test("dw: reads beside Ljung-Box as d ~ 2(1 - rho1), within end effects") {
    val xs = draw(Gen.listOfN(30, Gen.choose(1L, 40L)), 65900L)
    val d = dw(xs)._3.get / 10000.0
    val r1 = lb(xs)._3.get / 10000.0
    // the identity is exact up to the two end terms (each bounded by
    // max-deviation^2 / denominator) — generous but directional
    assert(math.abs(d - 2 * (1 - r1)) < 0.5)
  }

  test("dw: constant and single-day series report null") {
    assert(dw(Seq.fill(10)(7L))._3.isEmpty)
    assert(dw(Seq(7L))._3.isEmpty)
  }

  test("runs: a constant series is all median ties — zero sides, null z") {
    val got = runs(Seq.fill(8)(5L))
    assert(got._3 == 0L && got._4 == 0L && got._5 == 0L && got._6.isEmpty)
  }

  test("runs: one day on each side has zero variance — null z") {
    // m2 = 1 + 9; the sides are one day each, sigma^2 = 0
    val got = runs(Seq(1L, 9L))
    assert(got._3 == 1L && got._4 == 1L && got._5 == 2L && got._6.isEmpty)
  }
}
