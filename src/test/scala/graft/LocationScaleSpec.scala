package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, Sessions}

/** The r16 location-scale / trend completion: Cucconi, Ansari–Bradley,
  * Lepage, D'Agostino K², Cox–Stuart, KPSS. Each pinned against an
  * independent per-element reference path (raw sorted ranks instead of
  * the engine's histogram spine) and/or a hand-computed case.
  */
class LocationScaleSpec extends SparkSpec {
  import spark.implicits._

  /** Midranks of xs within pool (per-element reference path). */
  private def midranks(xs: Seq[Double], pool: Seq[Double]): Seq[Double] =
    xs.map { x =>
      val lo = pool.count(_ < x); val eq = pool.count(_ == x)
      lo + (eq + 1) / 2.0
    }

  // ------------------------------------------------------------ Cucconi

  private def bruteCucconi(a: Seq[Double], b: Seq[Double]): (Double, Double, Double) = {
    val pool = a ++ b
    val n = pool.length.toDouble
    val rb = midranks(b, pool)
    val (na, nb) = (a.length.toDouble, b.length.toDouble)
    val sr2 = rb.map(r => r * r).sum
    val sq2 = rb.map(r => (n + 1 - r) * (n + 1 - r)).sum
    val den = math.sqrt(na * nb * (n + 1) * (2 * n + 1) * (8 * n + 11) / 5)
    val u = (6 * sr2 - nb * (n + 1) * (2 * n + 1)) / den
    val v = (6 * sq2 - nb * (n + 1) * (2 * n + 1)) / den
    val rho = 2 * (n * n - 4) / ((2 * n + 1) * (8 * n + 11)) - 1
    val c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    (u, v, c)
  }

  test("Cucconi matches the per-element reference on random data with ties") {
    val rnd = new scala.util.Random(3)
    for (trial <- 1 to 5) {
      val a = Seq.fill(30 + trial)(rnd.nextInt(15).toDouble)
      val b = Seq.fill(25 + trial)(rnd.nextInt(15).toDouble * 1.0 + rnd.nextInt(3))
      val out = Quality.cucconiTest(a.toDF("value"), b.toDF("value"), "value").head()
      val (u, v, c) = bruteCucconi(a, b)
      def bp(x: Double) = math.floor(x * 10000 + 0.5).toLong
      assert(math.abs(out.getLong(2) - bp(u)) <= 1, s"u trial $trial")
      assert(math.abs(out.getLong(3) - bp(v)) <= 1, s"v trial $trial")
      assert(math.abs(out.getLong(4) - bp(c)) <= 2, s"c trial $trial")
    }
  }

  test("Cucconi sees a pure SCALE change the location tests miss") {
    // same center, very different spread
    val a = Seq.fill(60)(50.0) ++ (1 to 20).map(i => 50.0 + (i % 3) - 1)
    val b = (1 to 80).map(i => if (i % 2 == 0) 10.0 else 90.0)
    val cuc = Quality.cucconiTest(a.toDF("value"), b.toDF("value"), "value").head()
    // C large -> p tiny
    assert(cuc.getLong(5) < 100L, "scale-only drift must reject")
  }

  // ----------------------------------------------------- Ansari–Bradley

  test("Ansari-Bradley: middle-vs-extremes gives a decisive positive z") {
    // a sits in the middle of the pooled ordering, b takes the extremes
    val a = (45 to 54).map(_.toDouble)
    val b = (1 to 5).map(_.toDouble) ++ (95 to 99).map(_.toDouble)
    val out = Quality.ansariBradley(a.toDF("value"), b.toDF("value"), "value").head()
    // middle scores are the big ones -> T_a above its mean -> z > 0
    assert(out.getLong(2) > 20000L, s"z_bp = ${out.getLong(2)}")
    val rev = Quality.ansariBradley(b.toDF("value"), a.toDF("value"), "value").head()
    assert(rev.getLong(2) < -20000L)
  }

  test("Ansari-Bradley matches the per-element midrank-score reference") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 5) {
      val a = Seq.fill(20 + trial)(rnd.nextInt(10).toDouble)
      val b = Seq.fill(25 + trial)(rnd.nextInt(10).toDouble)
      val out = Quality.ansariBradley(a.toDF("value"), b.toDF("value"), "value").head()
      val pool = a ++ b
      val n = pool.length
      // score AT the midrank, doubled: s2 = min(2M, 2(n+1) - 2M)
      def s2(x: Double): Long = {
        val lo = pool.count(_ < x); val eq = pool.count(_ == x)
        val m2 = 2 * lo + eq + 1
        math.min(m2, 2 * (n + 1) - m2).toLong
      }
      val t2a = a.map(s2).sum.toDouble
      val sc1 = pool.map(s2).sum.toDouble
      val sc2 = pool.map(x => s2(x).toDouble * s2(x)).sum
      val (nad, nbd, nd) = (a.length.toDouble, b.length.toDouble, n.toDouble)
      val e2 = nad * sc1 / nd
      val varT = nad * nbd * (nd * sc2 - sc1 * sc1) / (nd * nd * (nd - 1))
      val z = (t2a - e2) / math.sqrt(varT)
      assert(math.abs(out.getLong(2) - math.floor(z * 10000 + 0.5).toLong) <= 1,
        s"trial $trial")
    }
  }

  // ------------------------------------------------------------- Lepage

  test("Lepage components equal the standalone tests and compose L") {
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(40)(rnd.nextInt(20).toDouble)
    val b = Seq.fill(35)(rnd.nextInt(20).toDouble + 3)
    val da = a.toDF("value"); val db = b.toDF("value")
    val lp = Quality.lepageTest(da, db, "value").head()
    val ab = Quality.ansariBradley(da, db, "value").head()
    assert(lp.getLong(3) == ab.getLong(2), "zab leg == standalone AB")
    // L and p reconstruct from the displayed legs within rounding
    val zw = lp.getLong(2) / 10000.0; val zab = lp.getLong(3) / 10000.0
    assert(math.abs(lp.getLong(4) - math.floor((zw * zw + zab * zab) * 10000 + 0.5)) <= 3)
    assert(lp.getLong(5) >= 0 && lp.getLong(5) <= 10000)
  }

  // ----------------------------------------------------- D'Agostino K²

  test("D'Agostino K2 matches a driver-side recomputation of the chains") {
    val rnd = new scala.util.Random(31)
    val xs = Seq.fill(500)(math.max(0, 40 + rnd.nextGaussian() * 12).toLong)
    val out = Quality.dagostinoK2(xs.toDF("x"), col("x")).head()
    val n = xs.length.toDouble
    val mu = xs.map(_.toDouble).sum / n
    val m2 = xs.map(x => (x - mu) * (x - mu)).sum / n
    val m3 = xs.map(x => math.pow(x - mu, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - mu, 4)).sum / n
    val g1 = m3 / math.pow(m2, 1.5)
    val g2 = m4 / (m2 * m2) - 3
    val y = g1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    val b2 = 3 * (n * n + 27 * n - 70) * (n + 1) * (n + 3) /
      ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    val w2 = math.sqrt(2 * (b2 - 1)) - 1
    val delta = 1 / math.sqrt(math.log(math.sqrt(w2)))
    val alpha = math.sqrt(2 / (w2 - 1))
    val z1 = delta * math.log(y / alpha + math.sqrt((y / alpha) * (y / alpha) + 1))
    val eb2 = 3 * (n - 1) / (n + 1)
    val vb2 = 24 * n * (n - 2) * (n - 3) / ((n + 1) * (n + 1) * (n + 3) * (n + 5))
    val x = (g2 + 3 - eb2) / math.sqrt(vb2)
    val beta = 6 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9)) *
      math.sqrt(6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    val aA = 6 + 8 / beta * (2 / beta + math.sqrt(1 + 4 / (beta * beta)))
    val t = (1 - 2 / aA) / (1 + x * math.sqrt(2 / (aA - 4)))
    val z2 = ((1 - 2 / (9 * aA)) - math.cbrt(t)) / math.sqrt(2 / (9 * aA))
    val k2 = z1 * z1 + z2 * z2
    def bp(v: Double) = math.floor(v * 10000 + 0.5).toLong
    assert(math.abs(out.getLong(1) - bp(g1)) <= 1, "skew")
    assert(math.abs(out.getLong(2) - bp(g2)) <= 1, "kurt")
    assert(math.abs(out.getLong(3) - bp(z1)) <= 1, "z1")
    assert(math.abs(out.getLong(4) - bp(z2)) <= 1, "z2")
    assert(math.abs(out.getLong(5) - bp(k2)) <= 2, "k2")
  }

  test("D'Agostino K2 rejects a large uniform sample") {
    val xs = (0 until 2000).map(i => (i % 100).toLong)
    val out = Quality.dagostinoK2(xs.toDF("x"), col("x")).head()
    assert(out.getLong(2) < 0, "uniform kurtosis is negative")
    assert(out.getLong(6) < 100L, "uniform must reject normality")
  }

  // ---------------------------------------------------------- Watson U²

  test("Watson U2 matches the per-element reference and zeroes on identity") {
    val rnd = new scala.util.Random(41)
    val a = Seq.fill(40)(rnd.nextInt(10).toDouble)
    val b = Seq.fill(50)(rnd.nextInt(10).toDouble + 1)
    val out = Quality.watsonU2(a.toDF("value"), b.toDF("value"), "value").head()
    // reference: d_t = F_a - F_b after each pooled obs (value order)
    val (na, nb) = (a.length.toDouble, b.length.toDouble)
    val n = na + nb
    val values = (a ++ b).distinct.sorted
    var (cuma, cumb) = (0, 0)
    val steps = values.map { v =>
      cuma += a.count(_ == v); cumb += b.count(_ == v)
      (a.count(_ == v) + b.count(_ == v), cuma / na - cumb / nb)
    }
    val dbar = steps.map { case (c, d) => c * d }.sum / n
    val u2 = na * nb / (n * n) *
      steps.map { case (c, d) => c * (d - dbar) * (d - dbar) }.sum
    assert(math.abs(out.getLong(2) - math.floor(u2 * 10000 + 0.5).toLong) <= 1)
    val same = Quality.watsonU2(a.toDF("value"), a.toDF("value"), "value").head()
    assert(same.getLong(2) == 0L)
  }

  test("Watson U2 registers the tail-to-tail swap Kuiper exists for") {
    val a = Seq.fill(50)(1.0) ++ Seq.fill(50)(10.0)
    val b = Seq.fill(50)(4.0) ++ Seq.fill(50)(6.0)
    val out = Quality.watsonU2(a.toDF("value"), b.toDF("value"), "value").head()
    assert(out.getLong(2) > 500L, s"u2_bp = ${out.getLong(2)}")
  }

  // ------------------------------------------------------------- Grubbs

  test("Grubbs hand case: one planted outlier dominates") {
    val xs = (Seq.fill(20)(50L) ++ Seq.fill(20)(52L)) :+ 500L
    val out = Quality.grubbsTest(xs.toDF("x"), col("x")).head()
    val n = xs.length.toDouble
    val s1 = xs.sum.toDouble
    val c2 = n * xs.map(x => x.toDouble * x).sum - s1 * s1
    val s = math.sqrt(c2 / (n * (n - 1)))
    val gMax = (n * 500 - s1) / n / s
    val gMin = (s1 - n * 50) / n / s
    def bp(v: Double) = math.floor(v * 10000 + 0.5).toLong
    assert(out.getLong(0) == 41L && out.getLong(1) == 50L && out.getLong(2) == 500L)
    assert(out.getLong(3) == bp(gMax) && out.getLong(4) == bp(gMin))
    assert(out.getLong(5) == bp(math.max(gMax, gMin)))
    assert(out.getLong(3) > 60000L, "planted outlier gives G >> sqrt(n)")
  }

  test("Grubbs: constant sample nulls") {
    val out = Quality.grubbsTest(Seq(5L, 5L, 5L, 5L).toDF("x"), col("x")).head()
    assert(out.isNullAt(3) && out.isNullAt(5))
  }

  // --------------------------------------------------------- Cox–Stuart

  private def tsAt(dayI: Int) = new java.sql.Timestamp(dayI * 86400000L)

  test("Cox-Stuart: strictly rising series gives all-positive pairs") {
    // 6 days, counts 1..6 for type A: pairs (1,4),(2,5),(3,6) all rise
    val ev = (0 until 6).flatMap(d =>
      (0 to d).map(j => (d * 100L + j, tsAt(d), "A")))
      .toDF("event_id", "ts", "event_type")
    val out = Sessions.coxStuartTrend(ev).head()
    assert(out.getLong(1) == 6L && out.getLong(2) == 3L && out.getLong(3) == 3L)
    val z = (2.0 * 3 - 3) / math.sqrt(3.0)
    assert(out.getLong(4) == math.floor(z * 10000 + 0.5).toLong)
  }

  test("Cox-Stuart: odd length drops the middle day") {
    // 5 days: c = 3, pairs (x1,x4), (x2,x5) — day 3 unused
    val counts = Seq(5, 1, 9, 2, 4) // pairs: (5,2) fall, (1,4) rise
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => (d * 100L + j, tsAt(d), "A"))
    }.toDF("event_id", "ts", "event_type")
    val out = Sessions.coxStuartTrend(ev).head()
    assert(out.getLong(1) == 5L && out.getLong(2) == 2L && out.getLong(3) == 1L)
    assert(out.getLong(4) == 0L) // (2*1-2)/sqrt(2) = 0
  }

  // --------------------------------------------------------------- KPSS

  test("KPSS hand case: two-day series") {
    // counts (1, 2): D = (-1, 1); P = (-1, 0); sumP2 = 1; G0 = 2,
    // G1 = -1 -> num = 5, den = 2*(5*2 + 8*(-1)) = 4 -> eta = 1.25
    val ev = Seq((1L, tsAt(0), "A"), (2L, tsAt(1), "A"), (3L, tsAt(1), "A"))
      .toDF("event_id", "ts", "event_type")
    val out = Sessions.kpssTest(ev).head()
    assert(out.getLong(1) == 2L)
    assert(out.getLong(2) == 12500L)
    assert(out.getBoolean(3))
  }

  test("KPSS: a level series accepts, a trending one rejects") {
    def series(counts: Seq[Int], tpe: String) =
      counts.zipWithIndex.flatMap { case (c, d) =>
        (0 until c).map(j => (tpe.hashCode * 100000L + d * 100L + j, tsAt(d), tpe))
      }
    val level = series(Seq(10, 11, 9, 10, 11, 9, 10, 11, 9, 10, 11, 9,
      10, 11, 9, 10, 11, 9, 10, 10), "L")
    val trend = series((1 to 20).map(_ * 3), "T")
    val ev = (level ++ trend).toDF("event_id", "ts", "event_type")
    val out = Sessions.kpssTest(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(!out("L")._2, s"level series eta=${out("L")._1} must accept")
    assert(out("T")._2, s"trending series eta=${out("T")._1} must reject")
  }
}
