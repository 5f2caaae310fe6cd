package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quality, Sessions}

/** The r16 "classical completion" batch: ordinal-association card,
  * Brunner–Munzel, Mood's median, Page's trend, Nelson–Aalen, the
  * weighted log-rank trio, Kuiper, and RMST. Each block pins the
  * operator against a hand-computed case and/or a brute-force reference
  * implementation on randomized small inputs (the AuditPropSpec
  * published-replay discipline).
  */
class ClassicalCompletionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  // ------------------------------------------------- ordinal association

  /** O(n²) brute-force reference over raw (x, y) rows. */
  private def bruteOrdinal(rows: Seq[(Long, Long)]): (BigInt, BigInt, BigInt, BigInt, BigInt) = {
    var c = BigInt(0); var d = BigInt(0); var tx = BigInt(0); var ty = BigInt(0)
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val ((x1, y1), (x2, y2)) = (rows(i), rows(j))
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) c += 1 else d += 1
      }
      if (x1 == x2) tx += 1
      if (y1 == y2) ty += 1
    }
    val n = BigInt(rows.length)
    (c, d, n * (n - 1) / 2, tx, ty)
  }

  test("ordinal card matches the O(n^2) brute force on random grids") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val rows = Seq.fill(60 + trial)((rnd.nextInt(3).toLong, rnd.nextInt(3).toLong))
      val df = rows.toDF("x", "y")
      val out = Quality.ordinalAssociationCard(df, col("x"), col("y")).head()
      val (c, d, n0, tx, ty) = bruteOrdinal(rows)
      def r4(v: Double) = math.floor(v * 10000 + 0.5) / 10000
      val s = (c - d).toDouble
      assert(out.getDouble(3) == r4(s / (c + d).toDouble), "gamma")
      assert(out.getDouble(4) == r4(s / (n0 - tx).toDouble), "somers yx")
      assert(out.getDouble(5) == r4(s / (n0 - ty).toDouble), "somers xy")
      val mm = math.min(out.getLong(1), out.getLong(2))
      assert(out.getDouble(6) == r4(2.0 * mm * s /
        (rows.length.toDouble * rows.length * (mm - 1))), "tau_c")
    }
  }

  test("ordinal card: perfect concordance saturates every measure at 1") {
    val df = Seq((0L, 0L), (1L, 1L), (2L, 2L), (0L, 0L), (1L, 1L), (2L, 2L))
      .toDF("x", "y")
    val out = Quality.ordinalAssociationCard(df, col("x"), col("y")).head()
    assert(out.getDouble(3) == 1.0 && out.getDouble(4) == 1.0 &&
      out.getDouble(5) == 1.0)
  }

  // ----------------------------------------------------- Brunner–Munzel

  /** Direct midrank reference (R lawstat::brunner.munzel.test layout). */
  private def bruteBM(a: Seq[Double], b: Seq[Double]): (Double, Double, Double) = {
    val all = (a ++ b).sorted
    def midrank(xs: Seq[Double], pool: Seq[Double]): Seq[Double] = xs.map { x =>
      val lo = pool.count(_ < x); val eq = pool.count(_ == x)
      lo + (eq + 1) / 2.0
    }
    val ra = midrank(a, all); val rb = midrank(b, all)
    val rai = midrank(a, a.sorted); val rbi = midrank(b, b.sorted)
    val (na, nb) = (a.length.toDouble, b.length.toDouble)
    val m1 = ra.sum / na; val m2 = rb.sum / nb
    val v1 = a.indices.map(i => math.pow(ra(i) - rai(i) - m1 + (na + 1) / 2, 2)).sum / (na - 1)
    val v2 = b.indices.map(i => math.pow(rb(i) - rbi(i) - m2 + (nb + 1) / 2, 2)).sum / (nb - 1)
    val w = na * nb * (m2 - m1) / (na + nb) / math.sqrt(na * v1 + nb * v2)
    val df = math.pow(na * v1 + nb * v2, 2) /
      (math.pow(na * v1, 2) / (na - 1) + math.pow(nb * v2, 2) / (nb - 1))
    val pHat = (m2 - (nb + 1) / 2) / na
    (pHat, w, df)
  }

  test("Brunner-Munzel matches the direct midrank reference, ties included") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val a = Seq.fill(25 + trial)(rnd.nextInt(12).toDouble)
      val b = Seq.fill(30 + trial)(rnd.nextInt(12).toDouble + 2.0)
      val da = a.toDF("value"); val db = b.toDF("value")
      val out = Quality.brunnerMunzel(da, db, "value").head()
      val (pHat, w, df) = bruteBM(a, b)
      def bp(v: Double) = math.floor(v * 10000 + 0.5).toLong
      assert(out.getLong(2) == bp(pHat), s"p_hat trial $trial")
      assert(math.abs(out.getLong(3) - bp(w)) <= 1, s"w trial $trial")
      assert(math.abs(out.getLong(4) - bp(df)) <= 1, s"df trial $trial")
    }
  }

  test("Brunner-Munzel: identical samples give p_hat = 1/2 and W = null or 0") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("value")
    val out = Quality.brunnerMunzel(a, a, "value").head()
    assert(out.getLong(2) == 5000L)
    // equal samples: numerator 0 -> w = 0 when variance positive
    assert(out.isNullAt(3) || out.getLong(3) == 0L)
  }

  // -------------------------------------------------------- Mood median

  test("Mood's median: hand 2x2 chi2") {
    // g1: 8 of 10 above pooled median; g2: 2 of 10 above -> chi2 = 7.2
    // values: pooled median of {1..10, 11..20}? construct directly:
    // g1 values 10x {5}, g2 10x {1}, plus make median split hand-checkable
    val rows = Seq.fill(8)(("a", 10L)) ++ Seq.fill(2)(("a", 1L)) ++
      Seq.fill(2)(("b", 10L)) ++ Seq.fill(8)(("b", 1L))
    val df = rows.toDF("g", "v")
    val out = Quality.moodMedian(df, col("v"), col("g")).head()
    // pooled: 10x value 1, 10x value 10 -> doubled cum at v=1 is 20 >= 20
    // -> median 1; above-median: a=8, b=2, A=10, N=20, expected 5 each
    // chi2 = sum over groups: (8-5)^2/5 + (2-5)^2/5 + (2-5)^2/5 + (8-5)^2/5 = 7.2
    assert(out.getLong(0) == 20L && out.getLong(1) == 2L)
    assert(out.getLong(2) == 1L, "pooled lower median")
    assert(out.getLong(3) == 72000L, "chi2 bp")
    assert(out.getLong(4) == 1L, "dof")
  }

  test("Mood's median: all-equal values null the statistic") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val out = Quality.moodMedian(df, col("v"), col("g")).head()
    assert(out.isNullAt(3) && out.isNullAt(4))
  }

  // -------------------------------------------------------- Page trend

  test("Page trend: uniformly rising users maximize L") {
    // 6 users, each with 1 event in third 1, 2 in third 2, 3 in third 3
    // ranks per user are (1,2,3) -> doubled (2,4,6) -> L2 per user =
    // 1*2 + 2*4 + 3*6 = 28; max L = 28m/2 = 14m; E[L] = 12m
    val ev = (0 until 6).flatMap { u =>
      Seq((u * 100L, ts(0L), u.toLong)) ++
        Seq.fill(2)((u * 100L + 1, ts(40000L), u.toLong)) ++
        Seq.fill(3)((u * 100L + 2, ts(90000L), u.toLong))
    }.zipWithIndex.map { case ((_, t, u), i) => (i.toLong, t, u) }
      .toDF("event_id", "ts", "user_id")
    val out = Quality.pageTrend(ev).head()
    assert(out.getLong(0) == 6L && out.getLong(2) == 28L * 6)
    // z = (L2 - 24m) / (2 sqrt(2m)) = (168 - 144) / (2 sqrt 12)
    val z = (168.0 - 144.0) / (2 * math.sqrt(12.0))
    assert(out.getLong(3) == math.floor(z * 10000 + 0.5).toLong)
  }

  // ------------------------------------------------------- Nelson–Aalen

  test("Nelson-Aalen hand curve") {
    def day(d: Double) = ts((d * 86400).toLong)
    // the kaplanMeier spec's cohort: deaths at lifetimes 0, 10, 20 with
    // risk sets 4, 3, 2 -> H = 1/4, 1/4+1/3, 1/4+1/3+1/2
    val ev = Seq(
      (1L, day(0), 1L), (2L, day(10), 1L),
      (3L, day(0), 2L), (4L, day(20), 2L),
      (5L, day(0), 3L), (6L, day(99.5), 3L),
      (7L, day(0), 4L)).toDF("event_id", "ts", "user_id")
    val out = Sessions.nelsonAalen(ev, churnGapDays = 7).orderBy("t_day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    def g(x: Double) = math.floor(x * 1073741824)
    def bp(grains: Double) = math.floor(grains / 1073741824 * 10000 + 0.5).toLong
    val h1 = g(1.0 / 4); val h2 = h1 + g(1.0 / 3); val h3 = h2 + g(1.0 / 2)
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 4L, 1L), (10L, 3L, 1L), (20L, 2L, 1L)))
    assert(out.map(_._4).toSeq == Seq(bp(h1), bp(h2), bp(h3)))
    val v1 = g(1.0 / 16); val v2 = v1 + g(1.0 / 9); val v3 = v2 + g(1.0 / 4)
    def se(grains: Double) =
      math.floor(math.sqrt(grains / 1073741824) * 10000 + 0.5).toLong
    assert(out.map(_._5).toSeq == Seq(se(v1), se(v2), se(v3)))
  }

  // -------------------------------------------------- weighted log-rank

  test("weighted log-rank: the w=1 leg agrees with logRankTest") {
    val rnd = new scala.util.Random(11)
    val ev = (0 until 40).flatMap { u =>
      val last = 1 + rnd.nextInt(20)
      Seq((u * 10L, ts(0L), u.toLong), (u * 10L + 1, ts(last * 86400L), u.toLong))
    } :+ ((9999L, ts(30 * 86400L), 999L))
    val df = ev.toDF("event_id", "ts", "user_id")
    val cohort = pmod(col("user_id"), lit(2))
    val card = Sessions.weightedLogRankCard(df, cohort, churnGapDays = 1).head()
    val lr = Sessions.logRankTest(df, cohort, churnGapDays = 1).head()
    val zRef = math.floor(lr.getDouble(4) * 10000 + 0.5).toLong
    assert(math.abs(card.getLong(3) - zRef) <= 1,
      s"grain z ${card.getLong(3)} vs fold z $zRef")
    // all three z's share the sign; Gehan and Tarone-Ware are finite
    assert(!card.isNullAt(4) && !card.isNullAt(5))
    assert(Seq(card.getLong(3), card.getLong(4), card.getLong(5))
      .forall(z => z == 0 || z.sign == card.getLong(3).sign))
  }

  // ------------------------------------------------------------- Kuiper

  test("Kuiper: V = D+ + D-, and V >= the KS sup") {
    val a = Seq.fill(50)(1.0) ++ Seq.fill(50)(10.0)
    val b = Seq.fill(50)(4.0) ++ Seq.fill(50)(6.0)
    val da = a.toDF("value"); val db = b.toDF("value")
    val out = Quality.kuiperTest(da, db, "value").head()
    // a leads below 4 (D+ = 0.5 at v in [1,4)), b leads inside [6,10)
    assert(out.getLong(2) == 5000L && out.getLong(3) == 5000L &&
      out.getLong(4) == 10000L)
    val ks = Quality.ksTest(da, db, "value").head()
    assert(out.getLong(4) >= math.floor(ks.getDouble(2) * 10000 + 0.5).toLong)
  }

  // --------------------------------------------------------------- RMST

  test("RMST hand area under the KM step curve") {
    def day(d: Double) = ts((d * 86400).toLong)
    // KM curve: 0.75 @ day 0, 0.5 @ day 10, 0.25 @ day 20 (the KM spec
    // cohort) -> area to 30 = 0*1 + 10*0.75 + 10*0.5 + 10*0.25 = 15.0
    val ev = Seq(
      (1L, day(0), 1L), (2L, day(10), 1L),
      (3L, day(0), 2L), (4L, day(20), 2L),
      (5L, day(0), 3L), (6L, day(99.5), 3L),
      (7L, day(0), 4L)).toDF("event_id", "ts", "user_id")
    val out = Sessions.rmst(ev, tauDays = 30L, churnGapDays = 7).head()
    assert(out.getLong(0) == 30L && out.getLong(1) == 4L &&
      out.getLong(2) == 3L)
    val grains = math.floor(0.75 * 10 * 1048576) + math.floor(0.5 * 10 * 1048576) +
      math.floor(0.25 * 10 * 1048576)
    val expected = math.floor((0.0 + grains / 1048576) * 10000 + 0.5).toLong
    assert(out.getLong(3) == expected)
  }

  test("RMST: no deaths means the full horizon") {
    // every user active through the end -> empty KM curve -> area = tau
    val ev = Seq((1L, ts(0L), 1L), (2L, ts(86400L * 5), 1L),
      (3L, ts(0L), 2L), (4L, ts(86400L * 5), 2L))
      .toDF("event_id", "ts", "user_id")
    val out = Sessions.rmst(ev, tauDays = 30L, churnGapDays = 7).head()
    assert(out.getLong(2) == 0L && out.getLong(3) == 300000L)
  }
}
