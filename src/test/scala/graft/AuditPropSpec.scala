package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Properties over randomized inputs for the audit shelf: the calibration
  * report's masses must tile the input exactly and its summary must be
  * recomputable from the report; the fairness audit's confusion masses
  * must tile each group; PSI must be non-negative and zero exactly on
  * identical snapshots.
  */
class AuditPropSpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default
  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(params, Seed(seed)).getOrElse(sys.error(s"gen failed at $seed"))

  private val rowGen = for {
    den <- Gen.choose(1L, 40L)
    num <- Gen.choose(0L, den)
    y <- Gen.oneOf(true, false)
  } yield (num, den, y)

  test("calibration bins tile the input; summary recomputes from the report (15 rounds)") {
    for (round <- 0 until 15) {
      val rows = draw(Gen.listOfN(60, rowGen), 7000L + round)
      val df = rows.toDF("num", "den", "y")
      val rep = Quality.calibrationReport(df, col("num"), col("den"), col("y"))
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      assert(rep.map(_._2).sum == rows.size, s"round $round: bins must tile rows")
      assert(rep.map(_._3).sum == rows.count(_._3), s"round $round: positives tile")
      assert(rep.forall(r => r._1 >= 0 && r._1 < 10))
      assert(rep.forall(r => r._4 >= 0 && r._4 <= r._2 * 1048576L),
        s"round $round: q20 mass bounded by n*2^20")
      assert(rep.forall(r => r._8 == math.abs(r._6 - r._7)))
      val (n, nPos, eceBp, brierBp) = Quality.calibrationSummary(
        df, col("num"), col("den"), col("y"))
        .as[(Long, Long, Long, Long)].collect().head
      assert(n == rows.size && nPos == rows.count(_._3))
      assert(eceBp >= 0 && eceBp <= 10000 && brierBp >= 0 && brierBp <= 10000)
      // recompute ECE from the report in sorted bin order
      val ece = rep.sortBy(_._1).map { r =>
        r._2.toDouble / n * math.abs(
          r._4.toDouble / (r._2.toDouble * 1048576.0) - r._3.toDouble / r._2)
      }.sum
      assert(math.floor(ece * 10000 + 0.5).toLong == eceBp,
        s"round $round: summary ECE must recompute from the report")
    }
  }

  test("fairness confusion masses tile every group; gaps recompute (15 rounds)") {
    val gGen = for {
      g <- Gen.oneOf("g1", "g2", "g3")
      r <- rowGen
    } yield (g, r._1, r._2, r._3)
    for (round <- 0 until 15) {
      val rows = draw(Gen.listOfN(50, gGen), 8000L + round)
      val df = rows.toDF("g", "num", "den", "y")
      val audit = Quality.fairnessAudit(
        df, "g", col("num"), col("den"), col("y"), 1L, 2L)
        .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
        .collect()
      audit.foreach { a =>
        assert(a._5 + a._6 + a._7 + a._8 == a._2, s"round $round: tp+fp+fn+tn == n")
        assert(a._5 + a._7 == a._3, s"round $round: tp+fn == n_label_pos")
        assert(a._5 + a._6 == a._4, s"round $round: tp+fp == n_pred_pos")
        assert(a._10.isEmpty == (a._3 == 0) && a._11.isEmpty == (a._2 == a._3))
      }
      val gaps = Quality.fairnessGaps(
        df, "g", col("num"), col("den"), col("y"), 1L, 2L)
        .as[(Long, Long, Long, Long, Long)].collect().head
      assert(gaps._1 == audit.length)
      val sel = audit.map(_._9)
      assert(gaps._2 == sel.max - sel.min, s"round $round: parity gap recomputes")
      val tprs = audit.flatMap(_._10)
      if (tprs.nonEmpty) assert(gaps._3 == tprs.max - tprs.min)
    }
  }

  test("ksTest is bounded, symmetric, and zero on identical samples (10 rounds)") {
    val vGen = Gen.choose(0, 60).map(_.toDouble / 3.0)
    for (round <- 0 until 10) {
      val a = draw(Gen.listOfN(40, vGen), 11000L + round)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val b = draw(Gen.listOfN(40, vGen), 11500L + round)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val ab = Quality.ksTest(a, b, "v").as[(Long, Long, Double, Double)].head()
      val ba = Quality.ksTest(b, a, "v").as[(Long, Long, Double, Double)].head()
      assert(ab._3 >= 0.0 && ab._3 <= 1.0 && ab._4 >= 0.0 && ab._4 <= 1.0)
      assert(ab._3 == ba._3 && ab._4 == ba._4, s"round $round: KS is symmetric")
      val same = Quality.ksTest(a, a, "v").as[(Long, Long, Double, Double)].head()
      assert(same._3 == 0.0 && same._4 == 1.0, s"round $round")
    }
  }

  test("spearman is bounded and symmetric (10 rounds)") {
    val vGen = Gen.choose(-50, 50).map(_.toDouble)
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(30, Gen.zip(vGen, vGen)), 12000L + round)
        .zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val xy = Quality.spearmanCorrelation(rows, col("x"), col("y"), "id")
        .as[(Long, Double)].head()
      val yx = Quality.spearmanCorrelation(rows, col("y"), col("x"), "id")
        .as[(Long, Double)].head()
      assert(xy._2 >= -1.0 && xy._2 <= 1.0, s"round $round: |rho| <= 1 (${xy._2})")
      assert(xy._2 == yx._2, s"round $round: rho is symmetric")
    }
  }

  test("mannWhitneyU: U_a + U_b tiles 2·n_a·n_b, effect antisymmetric, identical-samples null (10 rounds)") {
    val vGen = Gen.choose(-20, 20).map(_.toDouble)
    for (round <- 0 until 10) {
      val as = draw(Gen.listOfN(25, vGen), 14000L + round)
      val bs = draw(Gen.listOfN(35, vGen), 14500L + round)
      val aDf = as.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val bDf = bs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val ab = Quality.mannWhitneyU(aDf, bDf, "v")
        .as[(Long, Long, Long, Option[Long], Option[Double])].head()
      val ba = Quality.mannWhitneyU(bDf, aDf, "v")
        .as[(Long, Long, Long, Option[Long], Option[Double])].head()
      assert(ab._1 == 25L && ab._2 == 35L)
      // U_a + U_b = n_a·n_b exactly, midranks or not
      assert(ab._3 + ba._3 == 2L * 25L * 35L, s"round $round: doubled U must tile")
      assert(ab._4.get >= 0L && ab._4.get <= 10000L, s"round $round: auc in bp range")
      ab._5.zip(ba._5).foreach { case (z1, z2) =>
        // half-up floor rounding can split a .00005 boundary one ulp
        // apart between +x and -x — antisymmetry holds to one display bp
        assert(math.abs(z1 + z2) <= 1.0001e-4, s"round $round: z antisymmetric ($z1, $z2)")
      }
      val same = Quality.mannWhitneyU(aDf, aDf, "v")
        .as[(Long, Long, Long, Option[Long], Option[Double])].head()
      assert(same._4.contains(5000L) && (same._5.isEmpty || same._5.contains(0.0)),
        s"round $round: identical samples sit at the null")
    }
  }

  test("proportionDiff and mcnemarTest: masses tile, symmetry laws hold (10 rounds)") {
    val pGen = Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))
    for (round <- 0 until 10) {
      val as = draw(Gen.listOfN(30, Gen.oneOf(true, false)), 19000L + round)
      val bs = draw(Gen.listOfN(20, Gen.oneOf(true, false)), 19500L + round)
      def df(vs: Seq[Boolean]) = vs.toDF("p")
      val ab = Quality.proportionDiff(df(as), df(bs), col("p"))
        .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long], Option[Double])]
        .head()
      val ba = Quality.proportionDiff(df(bs), df(as), col("p"))
        .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long], Option[Double])]
        .head()
      assert(ab._1 == 30L && ab._2 == as.count(identity))
      // signed difference flips within one display bp; z flips likewise
      assert(math.abs(ab._7.get + ba._7.get) <= 1L, s"round $round: diff antisymmetric")
      ab._8.zip(ba._8).foreach { case (z1, z2) =>
        assert(math.abs(z1 + z2) <= 1.0001e-4, s"round $round: z antisymmetric")
      }
      val same = Quality.proportionDiff(df(as), df(as), col("p"))
        .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long], Option[Double])]
        .head()
      assert(same._7.contains(0L) && (same._8.isEmpty || same._8.contains(0.0)),
        s"round $round: identical slices differ by zero")
      val pairs = draw(Gen.listOfN(40, pGen), 19800L + round)
      val pdf = pairs.toDF("a", "b")
      val m = Quality.mcnemarTest(pdf, col("a"), col("b"))
        .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])].head()
      val sw = Quality.mcnemarTest(pdf, col("b"), col("a"))
        .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])].head()
      assert(m._2 + m._3 + m._4 + m._5 == m._1, s"round $round: decision masses tile")
      assert(m._3 == sw._4 && m._4 == sw._3 && m._6 == sw._6 && m._7 == sw._7,
        s"round $round: swapping the rules swaps the off-diagonal, not the statistic")
    }
  }

  test("fleissKappa: perfect agreement is 1, vote masses bound p_e, bounds hold (10 rounds)") {
    val cGen = Gen.choose(0L, 2L)
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(40, Gen.zip(cGen, cGen, cGen)), 20000L + round)
      val df = rows.toDF("r0", "r1", "r2")
      val got = Quality.fleissKappa(df,
        Seq(col("r0"), col("r1"), col("r2")), 3)
        .as[(Long, Long, Option[Double], Option[Double], Option[Double])].head()
      assert(got._1 == 40L && got._2 == 3L)
      assert(got._3.exists(p => p >= 0.0 && p <= 1.0), s"round $round: p_bar in [0,1]")
      assert(got._4.exists(p => p >= 0.0 && p <= 1.0001), s"round $round: p_e in [0,1]")
      got._5.foreach(k => assert(k <= 1.0, s"round $round: kappa <= 1"))
      val perfect = Quality.fleissKappa(df,
        Seq(col("r0"), col("r0"), col("r0")), 3)
        .as[(Long, Long, Option[Double], Option[Double], Option[Double])].head()
      assert(perfect._3.contains(1.0), s"round $round: unanimous raters have p_bar 1")
      assert(perfect._5.isEmpty || perfect._5.contains(1.0),
        s"round $round: unanimous kappa is 1 (or null when one category takes all)")
    }
  }

  test("anovaF: F non-negative, eta2 in range, zero within-variance and single-group degenerate (10 rounds)") {
    val gGen = Gen.oneOf("a", "b", "c")
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(45, Gen.zip(gGen, Gen.choose(0L, 50L))), 21000L + round)
      val df = rows.toDF("g", "v")
      val got = Quality.anovaF(df, col("v"), col("g"))
        .as[(Long, Long, Option[Double], Option[Long])].head()
      assert(got._1 == 45L)
      got._3.foreach(f => assert(f >= 0.0, s"round $round: F >= 0"))
      got._4.foreach(e => assert(e >= 0L && e <= 10000L, s"round $round: eta2 in bp range"))
      // group-constant values: all variance is between groups
      val sep = Quality.anovaF(
        rows.map { case (g, _) => (g, g.head.toLong) }.toDF("g", "v"),
        col("v"), col("g"))
        .as[(Long, Long, Option[Double], Option[Long])].head()
      assert(sep._3.isEmpty && (sep._4.isEmpty || sep._4.contains(10000L)),
        s"round $round: zero within-variance must null F and saturate eta2")
      val single = Quality.anovaF(df.withColumn("g", lit("one")), col("v"), col("g"))
        .as[(Long, Long, Option[Double], Option[Long])].head()
      assert(single._3.isEmpty && (single._4.isEmpty || single._4.contains(0L)),
        s"round $round: one group has no between-variance")
    }
  }

  test("groupedKsTest row == ksTest(group, complement), every group (8 rounds)") {
    val gGen = Gen.oneOf("a", "b", "c")
    for (round <- 0 until 8) {
      val rows = draw(Gen.listOfN(60, Gen.zip(gGen, Gen.choose(0L, 25L))), 24000L + round)
      val df = rows.toDF("g", "v")
      val screen = Quality.groupedKsTest(df, col("v"), col("g"))
        .as[(String, Long, Long, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      rows.map(_._1).distinct.foreach { g =>
        val pair = Quality.ksTest(
          df.filter(col("g") === g), df.filter(col("g") =!= g), "v")
          .as[(Long, Long, Double, Double)].head()
        val row = screen(g)
        assert((row._2, row._3, row._4, row._5) == pair,
          s"round $round group $g: screen row $row must equal the pairwise test $pair")
      }
    }
  }

  test("groupedKsTestAuto: reduction law (bins >= distinct ==> binned == exact) and budget trip (8 rounds)") {
    val gGen = Gen.oneOf("a", "b", "c")
    for (round <- 0 until 8) {
      val rows = draw(Gen.listOfN(60, Gen.zip(gGen, Gen.choose(0L, 25L))), 26000L + round)
      val df = rows.toDF("g", "v")
      val exact = Quality.groupedKsTest(df, col("v"), col("g"))
        .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      // budget 0 forces the binned path; 64 bins >= 26 distinct values
      // makes the index map injective -> identical screen, row for row
      val reduced = Quality.groupedKsTestAuto(df, col("v"), col("g"),
        maxDistinct = 0L, bins = 64)
        .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(reduced == exact,
        s"round $round: injective binning must reproduce the exact screen")
      // within budget the auto path IS the exact path
      val auto = Quality.groupedKsTestAuto(df, col("v"), col("g"))
        .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(auto == exact, s"round $round: within-budget path is exact")
      // genuine budget trip: 4 coarse bins — counts stay exact, the
      // restricted supremum can only fall, p can only rise
      val coarse = Quality.groupedKsTestAuto(df, col("v"), col("g"),
        maxDistinct = 0L, bins = 4)
        .as[(String, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
      assert(coarse.map(r => (r._1, r._2, r._3)) ==
        exact.map(r => (r._1, r._2, r._3)),
        s"round $round: binning must not change group masses")
      coarse.zip(exact).foreach { case (c, e) =>
        assert(c._4 <= e._4 + 1e-9,
          s"round $round ${c._1}: binned D ${c._4} must lower-bound exact ${e._4}")
        assert(c._5 >= e._5 - 1e-9,
          s"round $round ${c._1}: binned p ${c._5} must be conservative vs ${e._5}")
      }
    }
  }

  test("groupedW1 row == wassersteinDistance(group, complement), every group (8 rounds)") {
    val gGen = Gen.oneOf("a", "b", "c")
    for (round <- 0 until 8) {
      val rows = draw(Gen.listOfN(60, Gen.zip(gGen, Gen.choose(0L, 25L))), 27000L + round)
      val df = rows.toDF("g", "v")
      val screen = Quality.groupedW1(df, col("v"), col("g"))
        .as[(String, Long, Long, Double, Option[Long])].collect()
        .map(r => r._1 -> r).toMap
      rows.map(_._1).distinct.foreach { g =>
        val pair = Quality.wassersteinDistance(
          df.filter(col("g") === g), df.filter(col("g") =!= g), "v")
          .as[(Long, Long, Double, Option[Long])].head()
        val row = screen(g)
        assert((row._2, row._3, row._4, row._5) == pair,
          s"round $round group $g: screen row $row must equal the pairwise distance $pair")
      }
    }
  }

  test("groupedW1: single-distinct-value corpus still reports every group with zero distance") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "v")
    val got = Quality.groupedW1(df, col("v"), col("g"))
      .as[(String, Long, Long, Double, Option[Long])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(("a", 2L, 1L, 0.0, None), ("b", 1L, 2L, 0.0, None)),
      s"degenerate corpus must keep all groups, got ${got.toSeq}")
  }

  test("bhAdjust: textbook step-up, monotone in rank, adj >= p, singleton fixpoint") {
    val ps = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.05), ("t4", 0.2))
      .toDF("k", "p")
    val got = Quality.bhAdjust(ps, col("k"), col("p"), fdrQ = 0.05)
      .as[(String, Double, Long, Double, Boolean)].collect().sortBy(_._3)
    // w = [.04, .04, .0667, .2]; suffix mins = [.04, .04, .0667, .2]
    assert(got.map(r => (r._1, r._4, r._5)).toSeq == Seq(
      ("t1", 0.04, true), ("t2", 0.04, true),
      ("t3", 0.0667, false), ("t4", 0.2, false)))
    val adj = got.map(_._4)
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b },
      "adjusted p must be non-decreasing in rank")
    assert(got.forall(r => r._4 >= r._2 - 1e-9), "adjustment never helps a p-value")
    val single = Quality.bhAdjust(Seq(("only", 0.03)).toDF("k", "p"),
      col("k"), col("p"))
      .as[(String, Double, Long, Double, Boolean)].head()
    assert(single._4 == 0.03 && single._3 == 1L,
      "a single test adjusts to itself")
  }

  test("holmAdjust: textbook step-down, Bonferroni bound, rejects within BH's") {
    val ps = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.04), ("t4", 0.5))
      .toDF("k", "p")
    val got = Quality.holmAdjust(ps, col("k"), col("p"), alpha = 0.05)
      .as[(String, Double, Long, Double, Boolean)].collect().sortBy(_._3)
    // w = [.04, .06, .08, .5]; prefix maxes = [.04, .06, .08, .5]
    assert(got.map(r => (r._1, r._4, r._5)).toSeq == Seq(
      ("t1", 0.04, true), ("t2", 0.06, false),
      ("t3", 0.08, false), ("t4", 0.5, false)))
    val adj = got.map(_._4)
    assert(adj.zip(adj.tail).forall { case (a, b) => a <= b },
      "adjusted p must be non-decreasing in rank")
    assert(got.forall(r => r._4 >= r._2 - 1e-9), "adjustment never helps")
    // random screens: Holm <= Bonferroni everywhere, and Holm's reject
    // set sits inside BH's at the same level (FWER is the stricter knob)
    for (round <- 0 until 10) {
      val raw = draw(Gen.listOfN(12, Gen.choose(0, 2000)), 52000L + round)
        .zipWithIndex.map { case (p, i) => (s"t$i", p / 2000.0) }
      val df = raw.toDF("k", "p")
      val holm = Quality.holmAdjust(df, col("k"), col("p"), alpha = 0.05)
        .as[(String, Double, Long, Double, Boolean)].collect()
      val bh = Quality.bhAdjust(df, col("k"), col("p"), fdrQ = 0.05)
        .as[(String, Double, Long, Double, Boolean)].collect()
        .map(r => r._1 -> r).toMap
      for (h <- holm) {
        assert(h._4 <= math.min(1.0, 12 * h._2) + 1.0001e-4,
          s"round $round: Holm must not exceed Bonferroni")
        assert(h._4 >= bh(h._1)._4 - 1.0001e-4,
          s"round $round: Holm adj >= BH adj")
        if (h._5) assert(bh(h._1)._5,
          s"round $round: a Holm reject must also be a BH reject")
      }
    }
    // empty screen yields an empty frame, not a throw
    assert(Quality.holmAdjust(
      Seq.empty[(String, Double)].toDF("k", "p"), col("k"), col("p"))
      .count() == 0L)
  }

  /** Published Bartlett form, straight doubles; None when undefined. */
  private def refBartlett(rows: Seq[(String, Long)]): Option[Double] = {
    val gs = rows.groupBy(_._1).filter(_._2.size >= 2)
    val k = gs.size
    if (k < 2) return None
    val n = gs.values.map(_.size).sum.toDouble
    val s2 = gs.map { case (g, r) =>
      val m = r.map(_._2).sum.toDouble / r.size
      g -> r.map(x => (x._2 - m) * (x._2 - m)).sum / (r.size - 1)
    }
    if (s2.values.exists(_ == 0)) return None
    val sp = gs.map { case (g, r) => (r.size - 1) * s2(g) }.sum / (n - k)
    val t = (n - k) * math.log(sp) -
      gs.map { case (g, r) => (r.size - 1) * math.log(s2(g)) }.sum
    val c = 1 + (gs.values.map(r => 1.0 / (r.size - 1)).sum - 1 / (n - k)) /
      (3 * (k - 1))
    Some(t / c)
  }

  test("bartlettTest: published form, exact translation invariance, degenerates (10 rounds)") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 40L))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(45, rowGen), 53000L + round)
      val got = Quality.bartlettTest(rows.toDF("g", "v"), col("v"), col("g"))
        .as[(Long, Long, Option[Long], Option[Long])].head()
      (got._4, refBartlett(rows)) match {
        case (Some(t), Some(w)) =>
          assert(math.abs(t / 10000.0 - w) < 1e-3, s"round $round: T")
        case (a, b) => assert(a.isEmpty && b.isEmpty, s"round $round")
      }
      // variance numerators are translation-invariant in exact integers:
      // shifting every value leaves T bit-identical
      val shifted = Quality.bartlettTest(
        rows.map { case (g, v) => (g, v + 1000L) }.toDF("g", "v"),
        col("v"), col("g"))
        .as[(Long, Long, Option[Long], Option[Long])].head()
      assert(shifted._4 == got._4, s"round $round: shift invariance")
    }
    // a zero-variance group nulls the statistic (ln 0)
    val zv = Seq(("a", 5L), ("a", 5L), ("b", 1L), ("b", 9L)).toDF("g", "v")
    assert(Quality.bartlettTest(zv, col("v"), col("g"))
      .as[(Long, Long, Option[Long], Option[Long])].head()._4.isEmpty)
    // groups below two observations drop before the statistic
    val drop = Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", 7L), ("c", 3L))
    val gd = Quality.bartlettTest(drop.toDF("g", "v"), col("v"), col("g"))
      .as[(Long, Long, Option[Long], Option[Long])].head()
    assert(gd._1 == 4L && gd._2 == 2L)
  }

  /** Published JB form, straight doubles. */
  private def refJb(xs: Seq[Long]): (Double, Double, Double) = {
    val n = xs.size.toDouble
    val mu = xs.sum / n
    def m(p: Int) = xs.map(x => math.pow(x - mu, p)).sum / n
    val skew = m(3) / math.pow(m(2), 1.5)
    val kurt = m(4) / (m(2) * m(2)) - 3
    (skew, kurt, n / 6 * (skew * skew + kurt * kurt / 4))
  }

  test("jarqueBera: published form per group, skew direction, degenerates (10 rounds)") {
    for (round <- 0 until 10) {
      val xs = draw(Gen.listOfN(50, Gen.choose(0L, 25L)), 54000L + round)
      val got = Quality.jarqueBera(
        xs.map(("a", _)).toDF("g", "v"), col("v"), col("g"))
        .as[(String, Long, Option[Long], Option[Long], Option[Long],
          Option[Long])].head()
      val (skew, kurt, jb) = refJb(xs)
      assert(got._2 == 50L)
      assert(math.abs(got._3.get / 10000.0 - skew) < 2e-4, s"round $round skew")
      assert(math.abs(got._4.get / 10000.0 - kurt) < 2e-4, s"round $round kurt")
      assert(math.abs(got._5.get / 10000.0 - jb) < 1e-3, s"round $round jb")
      assert(got._6.get >= 0L && got._6.get <= 10000L)
    }
    // a right-skewed group reports positive skew, a mirrored one negative,
    // and both carry the same JB (the statistic squares the moments)
    val right = Seq(1L, 1L, 1L, 1L, 2L, 2L, 3L, 10L)
    val left = right.map(11L - _)
    val two = (right.map(("r", _)) ++ left.map(("l", _))).toDF("g", "v")
    val rows = Quality.jarqueBera(two, col("v"), col("g"))
      .as[(String, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].collect().map(r => r._1 -> r).toMap
    assert(rows("r")._3.get > 0L && rows("l")._3.get < 0L)
    assert(math.abs(rows("r")._5.get - rows("l")._5.get) <= 1L)
    // constant group: zero variance, null displays
    val const = Quality.jarqueBera(
      Seq(("c", 7L), ("c", 7L), ("c", 7L)).toDF("g", "v"),
      col("v"), col("g"))
      .as[(String, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].head()
    assert(const._3.isEmpty && const._6.isEmpty)
  }

  test("cohensH: bounds, transfer across base rates, published form (10 rounds)") {
    def h(aPass: Seq[Boolean], bPass: Seq[Boolean]) =
      Quality.cohensH(aPass.toDF("p"), bPass.toDF("p"), col("p"))
        .as[(Long, Long, Long, Long, Option[Long], Option[Long],
          Option[Long])].head()
    // identical rates: h = 0; total separation: h = pi
    assert(h(Seq(true, false), Seq(true, false))._7 == Some(0L))
    assert(h(Seq(true, true), Seq(false, false))._7 ==
      Some(math.floor(math.Pi * 10000 + 0.5).toLong))
    // the transfer property: a 2-point gap at a 2% base is a BIGGER
    // effect than the same gap at 50%
    val lowBase = h(Seq.fill(4)(true) ++ Seq.fill(96)(false),
      Seq.fill(2)(true) ++ Seq.fill(98)(false))
    val midBase = h(Seq.fill(52)(true) ++ Seq.fill(48)(false),
      Seq.fill(50)(true) ++ Seq.fill(50)(false))
    assert(lowBase._7.get > midBase._7.get)
    for (round <- 0 until 10) {
      val ka = draw(Gen.choose(0, 30), 63000L + round)
      val kb = draw(Gen.choose(0, 40), 63500L + round)
      val got = h(Seq.fill(ka)(true) ++ Seq.fill(30 - ka)(false),
        Seq.fill(kb)(true) ++ Seq.fill(40 - kb)(false))
      val want = 2 * math.asin(math.sqrt(ka / 30.0)) -
        2 * math.asin(math.sqrt(kb / 40.0))
      assert(math.abs(got._7.get / 10000.0 - want) < 1.001e-4,
        s"round $round")
    }
  }

  test("gwetAc1: kappa-paradox robustness, perfect agreement, published form (10 rounds)") {
    def ac1(rows: Seq[(Long, Long)]) =
      Quality.gwetAc1(rows.toDF("a", "b"), col("a"), col("b"))
        .as[(Long, Long, Option[Long], Option[Long], Option[Long])].head()
    // the textbook paradox table: 90% of mass on one category, raw
    // agreement 0.9 — kappa collapses toward 0, AC1 stays high
    val paradox = Seq.fill(85)((0L, 0L)) ++ Seq.fill(5)((1L, 1L)) ++
      Seq.fill(5)((0L, 1L)) ++ Seq.fill(5)((1L, 0L))
    val gp = ac1(paradox)
    val kappa = graft.operators.Normalize.cohenKappa(
      paradox.toDF("a", "b"), "a", "b")
      .as[(Long, Double, Double, Double)].head()._4
    assert(gp._5.get / 10000.0 > kappa + 0.3,
      s"AC1 ${gp._5.get / 10000.0} must beat kappa $kappa on the paradox table")
    // unanimity on varied categories: AC1 exactly 1
    assert(ac1(Seq((0L, 0L), (1L, 1L), (2L, 2L)))._5 == Some(10000L))
    // single shared category: chance term degenerate
    assert(ac1(Seq((1L, 1L), (1L, 1L)))._5.isEmpty)
    // published form, straight doubles
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(50,
        Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 2L))), 64000L + round)
      val got = ac1(rows)
      val n = rows.size.toDouble
      val po = rows.count(r => r._1 == r._2) / n
      val cats = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
      val pe = cats.map { c =>
        val pi = (rows.count(_._1 == c) + rows.count(_._2 == c)) / (2 * n)
        pi * (1 - pi)
      }.sum / (cats.size - 1)
      val want = (po - pe) / (1 - pe)
      assert(math.abs(got._5.get / 10000.0 - want) < 2e-4, s"round $round")
    }
  }

  private def card22(rows: Seq[(Boolean, Boolean)])
      : (Long, Long, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long]) =
    Quality.twoByTwoCard(rows.toDF("x", "y"), col("x"), col("y"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long])].head()

  test("twoByTwoCard: hand ratios, Woolf/Katz intervals, degenerates (10 rounds)") {
    // a=20 b=10 c=10 d=20: OR = 4, RR = 2
    val hand = Seq.fill(20)((true, true)) ++ Seq.fill(10)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(20)((false, false))
    val h = card22(hand)
    assert(h._5 == Some(40000L) && h._8 == Some(20000L))
    assert(h._6.get < 40000L && h._7.get > 40000L)
    // proportional table: both ratios exactly 1
    val ind = Seq.fill(8)((true, true)) ++ Seq.fill(8)((true, false)) ++
      Seq.fill(4)((false, true)) ++ Seq.fill(4)((false, false))
    val gi = card22(ind)
    assert(gi._5 == Some(10000L) && gi._8 == Some(10000L))
    // published CI replay
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(80,
        Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))),
        62000L + round)
      val got = card22(rows)
      val a = rows.count(r => r._1 && r._2).toDouble
      val b = rows.count(r => r._1 && !r._2).toDouble
      val c = rows.count(r => !r._1 && r._2).toDouble
      val d = rows.count(r => !r._1 && !r._2).toDouble
      if (a > 0 && b > 0 && c > 0 && d > 0) {
        val orW = a * d / (b * c)
        val lo = math.exp(math.log(orW) -
          1.96 * math.sqrt(1 / a + 1 / b + 1 / c + 1 / d))
        assert(math.abs(got._5.get / 10000.0 - orW) < 2e-4, s"round $round")
        assert(math.abs(got._6.get / 10000.0 - lo) < 2e-4, s"round $round")
        val rrW = (a / (a + b)) / (c / (c + d))
        val rhi = math.exp(math.log(rrW) + 1.96 *
          math.sqrt(1 / a - 1 / (a + b) + 1 / c - 1 / (c + d)))
        assert(math.abs(got._8.get / 10000.0 - rrW) < 2e-4, s"round $round")
        assert(math.abs(got._10.get / 10000.0 - rhi) < 2e-4, s"round $round")
      }
    }
    // a zero cell nulls the odds ratio (no continuity fudge)
    val zc = card22(Seq((true, true), (false, true), (false, false)))
    assert(zc._5.isEmpty)
  }

  /** Published Welch form, straight doubles. */
  private def refWelch(as: Seq[Long], bs: Seq[Long]): (Double, Double) = {
    def mv(xs: Seq[Long]) = {
      val m = xs.sum.toDouble / xs.size
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1) / xs.size)
    }
    val (ma, va) = mv(as); val (mb, vb) = mv(bs)
    val t = (ma - mb) / math.sqrt(va + vb)
    val df = (va + vb) * (va + vb) /
      (va * va / (as.size - 1) + vb * vb / (bs.size - 1))
    (t, df)
  }

  test("welchTTest: published form, exact shift invariance, degenerates (10 rounds)") {
    for (round <- 0 until 10) {
      val as = draw(Gen.listOfN(25, Gen.choose(0L, 40L)), 60000L + round)
      val bs = draw(Gen.listOfN(35, Gen.choose(10L, 80L)), 60500L + round)
      val got = Quality.welchTTest(as.toDF("v"), bs.toDF("v"), "v")
        .as[(Long, Long, Option[Long], Option[Long], Option[Long],
          Option[Long])].head()
      val (t, df) = refWelch(as, bs)
      assert(got._1 == 25L && got._2 == 35L)
      assert(math.abs(got._5.get / 10000.0 - t) < 2e-4, s"round $round t")
      assert(math.abs(got._6.get / 10000.0 - df) < 1e-2, s"round $round df")
      // integer moments are translation-invariant exactly: shifting both
      // sides leaves t and df bit-identical
      val shifted = Quality.welchTTest(
        as.map(_ + 500L).toDF("v"), bs.map(_ + 500L).toDF("v"), "v")
        .as[(Long, Long, Option[Long], Option[Long], Option[Long],
          Option[Long])].head()
      assert(shifted._5 == got._5 && shifted._6 == got._6, s"round $round")
    }
    // one observation on a side, or both sides constant: null displays
    assert(Quality.welchTTest(Seq(5L).toDF("v"), Seq(1L, 2L).toDF("v"), "v")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].head()._5.isEmpty)
    assert(Quality.welchTTest(
      Seq(5L, 5L).toDF("v"), Seq(3L, 3L).toDF("v"), "v")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].head()._5.isEmpty)
  }

  test("signTest: masses, z, zeros drop, agreement with the signed-rank direction") {
    def st(ds: Seq[Long]) = Quality.signTest(ds.toDF("d"), col("d"))
      .as[(Long, Long, Long, Long, Option[Long])].head()
    // 12 positive of 16 nonzero (plus 4 zeros): z = (24-16)/4 = 2
    val got = st(Seq.fill(12)(3L) ++ Seq.fill(4)(-1L) ++ Seq.fill(4)(0L))
    assert(got == ((20L, 16L, 12L, 4L, Some(20000L))))
    // the two paired tests agree in direction on a one-sided shift
    val ds = (1L to 15L) :+ -2L
    val s = st(ds)._5.get
    val w = Quality.wilcoxonSignedRank(ds.toDF("d"), col("d"))
      .as[(Long, Long, Long, Long, Option[Long])].head()._5.get
    assert(s > 0 && w > 0)
    // all zeros: nothing to test
    assert(st(Seq(0L, 0L))._5.isEmpty)
  }

  /** Published signed-rank form, straight doubles, zeros dropped. */
  private def refWilcoxon(ds: Seq[Long]): Option[Double] = {
    val nz = ds.filter(_ != 0)
    if (nz.isEmpty) return None
    val n = nz.size
    val ranked = nz.map(math.abs).sorted.zipWithIndex
      .groupBy(_._1).map { case (v, xs) =>
        v -> xs.map(_._2 + 1).sum.toDouble / xs.size }
    val wPlus = nz.filter(_ > 0).map(d => ranked(math.abs(d))).sum
    val ties = nz.map(math.abs).groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val varW = n * (n + 1) * (2.0 * n + 1) / 24 - ties / 48
    if (varW <= 0) return None
    Some((wPlus - n * (n + 1) / 4.0) / math.sqrt(varW))
  }

  test("wilcoxonSignedRank: published form, antisymmetry, zeros drop (10 rounds)") {
    for (round <- 0 until 10) {
      val ds = draw(Gen.listOfN(40, Gen.choose(-12L, 15L)), 61000L + round)
      val df = ds.toDF("d")
      val got = Quality.wilcoxonSignedRank(df, col("d"))
        .as[(Long, Long, Long, Long, Option[Long])].head()
      assert(got._1 == 40L)
      assert(got._2 == ds.count(_ != 0).toLong)
      assert(got._3 == ds.count(_ > 0).toLong)
      (got._5, refWilcoxon(ds)) match {
        case (Some(z), Some(w)) =>
          assert(math.abs(z / 10000.0 - w) < 2e-4, s"round $round z")
        case (a, b) => assert(a.isEmpty && b.isEmpty, s"round $round")
      }
      // negating every difference flips z exactly (2W+ reflects around
      // the exact integer rank total)
      val neg = Quality.wilcoxonSignedRank(
        ds.map(-_).toDF("d"), col("d"))
        .as[(Long, Long, Long, Long, Option[Long])].head()
      (got._5, neg._5) match {
        case (Some(z1), Some(z2)) => assert(math.abs(z1 + z2) <= 1L)
        case (a, b) => assert(a.isEmpty && b.isEmpty)
      }
    }
    // a one-sided shift scores a large positive z
    val up = Quality.wilcoxonSignedRank(
      (1L to 20L).toDF("d"), col("d"))
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(up._5.get > 30000L)
    // all zeros: nothing to rank
    assert(Quality.wilcoxonSignedRank(
      Seq(0L, 0L, 0L).toDF("d"), col("d"))
      .as[(Long, Long, Long, Long, Option[Long])].head()._5.isEmpty)
  }

  test("byAdjust: harmonic-inflated step-up, sandwiched between BH and never below it") {
    val ps = Seq(("t1", 0.01), ("t2", 0.02), ("t3", 0.04), ("t4", 0.5))
      .toDF("k", "p")
    val got = Quality.byAdjust(ps, col("k"), col("p"), fdrQ = 0.1)
      .as[(String, Double, Long, Double, Boolean)].collect().sortBy(_._3)
    // c(4) = 25/12; ws = [.0833, .0833, .1111, 1.0417]; suffix mins
    assert(got.map(r => (r._1, r._4, r._5)).toSeq == Seq(
      ("t1", 0.0833, true), ("t2", 0.0833, true),
      ("t3", 0.1111, false), ("t4", 1.0, false)))
    for (round <- 0 until 10) {
      val raw = draw(Gen.listOfN(12, Gen.choose(0, 2000)), 66000L + round)
        .zipWithIndex.map { case (p, i) => (s"t$i", p / 2000.0) }
      val df = raw.toDF("k", "p")
      val by = Quality.byAdjust(df, col("k"), col("p"), fdrQ = 0.1)
        .as[(String, Double, Long, Double, Boolean)].collect()
      val bh = Quality.bhAdjust(df, col("k"), col("p"), fdrQ = 0.1)
        .as[(String, Double, Long, Double, Boolean)].collect()
        .map(r => r._1 -> r).toMap
      for (r <- by) {
        assert(r._4 >= bh(r._1)._4 - 1.0001e-4,
          s"round $round: BY adj >= BH adj")
        if (r._5) assert(bh(r._1)._5,
          s"round $round: a BY reject must also be a BH reject")
      }
    }
    assert(Quality.byAdjust(
      Seq.empty[(String, Double)].toDF("k", "p"), col("k"), col("p"))
      .count() == 0L)
  }

  /** Published Stuart–Maxwell form dropping category `drop` (the
    * statistic is invariant to the choice — the spec exploits that).
    */
  private def refStuart(rows: Seq[(Long, Long)], drop: Long)
      : Option[Double] = {
    val cats = Seq(0L, 1L, 2L).filter(_ != drop)
    val (i, j) = (cats(0), cats(1))
    def cell(a: Long, b: Long) = rows.count(r => r._1 == a && r._2 == b)
    def row(a: Long) = rows.count(_._1 == a)
    def colC(b: Long) = rows.count(_._2 == b)
    val d1 = row(i) - colC(i)
    val d2 = row(j) - colC(j)
    val s11 = row(i) + colC(i) - 2.0 * cell(i, i)
    val s22 = row(j) + colC(j) - 2.0 * cell(j, j)
    val s12 = -(cell(i, j) + cell(j, i)).toDouble
    val den = s11 * s22 - s12 * s12
    if (den <= 0) None
    else Some((d1 * d1 * s22 - 2.0 * d1 * d2 * s12 + d2 * d2 * s11) / den)
  }

  test("stuartMaxwell: published form, drop-category invariance, degenerates (10 rounds)") {
    val rowGen = Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 2L))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(60, rowGen), 55000L + round)
      val got = Quality.stuartMaxwell(rows.toDF("a", "b"), col("a"), col("b"))
        .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
        .head()
      assert(got._1 == 60L)
      (got._4, refStuart(rows, drop = 0L)) match {
        case (Some(c), Some(w)) =>
          assert(math.abs(c / 10000.0 - w) < 1e-3, s"round $round: chi2")
          // the statistic must not depend on which category is dropped
          val alt = refStuart(rows, drop = 1L).get
          assert(math.abs(w - alt) < 1e-9, s"round $round: drop invariance")
        case (a, b) => assert(a.isEmpty && b.isEmpty, s"round $round")
      }
    }
    // a symmetric confusion has equal margins: chi2 = 0, p = 1
    val sym = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (0L, 2L),
      (2L, 0L), (1L, 1L)).toDF("a", "b")
    val s = Quality.stuartMaxwell(sym, col("a"), col("b"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .head()
    assert(s._2 == Some(0L) && s._4 == Some(0L) && s._5 == Some(10000L))
    // perfect agreement: zero-variance covariance, null displays
    val diag = Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(Quality.stuartMaxwell(diag, col("a"), col("b"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .head()._4.isEmpty)
  }

  test("bowkerTest: published form, McNemar reduction, zero-pair dof (10 rounds)") {
    def refBowker(rows: Seq[(Long, Long)]): (Long, Double) = {
      val cats = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
      val ps = for (i <- cats.indices; j <- i + 1 until cats.size) yield {
        val nij = rows.count(r => r._1 == cats(i) && r._2 == cats(j))
        val nji = rows.count(r => r._1 == cats(j) && r._2 == cats(i))
        (nij, nji)
      }
      val live = ps.filter(p => p._1 + p._2 > 0)
      (live.size.toLong, live.map { case (x, y) =>
        (x - y).toDouble * (x - y) / (x + y) }.sum)
    }
    val rowGen = Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 2L))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(50, rowGen), 56000L + round)
      val got = Quality.bowkerTest(rows.toDF("a", "b"), col("a"), col("b"))
        .as[(Long, Long, Option[Long], Option[Long])].head()
      val (dfw, chiw) = refBowker(rows)
      if (dfw > 0) {
        assert(got._3 == Some(dfw), s"round $round: df")
        assert(math.abs(got._4.get / 10000.0 - chiw) < 1e-3, s"round $round")
      } else assert(got._4.isEmpty)
    }
    // two categories: Bowker degenerates to McNemar's uncorrected chi2
    val binGen = Gen.zip(Gen.oneOf(0L, 1L), Gen.oneOf(0L, 1L))
    val bin = draw(Gen.listOfN(40, binGen), 56500L)
    val bk = Quality.bowkerTest(bin.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Option[Long], Option[Long])].head()
    val mc = Quality.mcnemarTest(
      bin.map { case (a, b) => (a == 1L, b == 1L) }.toDF("a", "b"),
      col("a"), col("b"))
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])]
      .head()
    (bk._4, mc._6) match {
      case (Some(c), Some(w)) => assert(math.abs(c / 10000.0 - w) <= 1.0001e-4)
      case (a, b) => assert(a.isEmpty && b.isEmpty)
    }
    // perfect agreement: every pair mass 0 — df and chi2 null
    assert(Quality.bowkerTest(
      Seq((0L, 0L), (1L, 1L)).toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Option[Long], Option[Long])].head()._4.isEmpty)
  }

  /** Published Shrout–Fleiss two-way forms, straight doubles. */
  private def refIcc(units: Seq[Seq[Long]]): (Double, Double) = {
    val n = units.size.toDouble
    val k = units.head.size.toDouble
    val grand = units.flatten.sum / (n * k)
    val rowM = units.map(u => u.sum / k)
    val colM = (0 until units.head.size).map(j => units.map(_(j)).sum / n)
    val msr = rowM.map(m => (m - grand) * (m - grand)).sum * k / (n - 1)
    val msc = colM.map(m => (m - grand) * (m - grand)).sum * n / (k - 1)
    val sse = units.zipWithIndex.flatMap { case (u, i) =>
      u.zipWithIndex.map { case (x, j) =>
        val r = x - rowM(i) - colM(j) + grand; r * r } }.sum
    val mse = sse / ((n - 1) * (k - 1))
    ((msr - mse) / (msr + (k - 1) * mse + k / n * (msc - mse)),
      (msr - mse) / (msr + (msc - mse) / n))
  }

  test("intraclassCorrelation: published forms, perfect agreement, rater-offset penalty (10 rounds)") {
    val unitGen = Gen.listOfN(3, Gen.choose(0L, 8L))
    for (round <- 0 until 10) {
      val units = draw(Gen.listOfN(40, unitGen), 68000L + round)
      val df = units.map(u => (u(0), u(1), u(2))).toDF("r0", "r1", "r2")
      val got = Quality.intraclassCorrelation(df,
        Seq(col("r0"), col("r1"), col("r2")))
        .as[(Long, Long, Option[Long], Option[Long])].head()
      val (w21, w2k) = refIcc(units)
      (got._3, got._4) match {
        case (Some(a), Some(b)) =>
          assert(math.abs(a / 10000.0 - w21) < 2e-4, s"round $round icc21")
          assert(math.abs(b / 10000.0 - w2k) < 2e-4, s"round $round icc2k")
        case _ => // degenerate draw — both engines nulled consistently
      }
    }
    // unanimous raters on varied documents: both forms exactly 1
    val perfect = Seq((0L, 0L, 0L), (1L, 1L, 1L), (2L, 2L, 2L),
      (0L, 0L, 0L)).toDF("r0", "r1", "r2")
    val gp = Quality.intraclassCorrelation(perfect,
      Seq(col("r0"), col("r1"), col("r2")))
      .as[(Long, Long, Option[Long], Option[Long])].head()
    assert(gp._3 == Some(10000L) && gp._4 == Some(10000L))
    // shifting ONE rater by a constant hurts absolute agreement (2,1) —
    // on a base with REAL agreement (a shared document effect plus a
    // small rater wobble; independent raters have no ICC to dilute)
    val base = (0 until 40).map(i =>
      Seq(i % 9L, i % 9L, i % 9L + i % 2L))
    val clean = Quality.intraclassCorrelation(
      base.map(u => (u(0), u(1), u(2))).toDF("r0", "r1", "r2"),
      Seq(col("r0"), col("r1"), col("r2")))
      .as[(Long, Long, Option[Long], Option[Long])].head()
    val shifted = Quality.intraclassCorrelation(
      base.map(u => (u(0) + 5L, u(1), u(2))).toDF("r0", "r1", "r2"),
      Seq(col("r0"), col("r1"), col("r2")))
      .as[(Long, Long, Option[Long], Option[Long])].head()
    assert(shifted._3.get < clean._3.get,
      "a constant rater offset must lower ICC(2,1)")
    // a constant table has no variance to apportion
    val const = Seq((1L, 1L, 1L), (1L, 1L, 1L)).toDF("r0", "r1", "r2")
    assert(Quality.intraclassCorrelation(const,
      Seq(col("r0"), col("r1"), col("r2")))
      .as[(Long, Long, Option[Long], Option[Long])].head()._3.isEmpty)
  }

  /** Published interval-metric alpha, complete data, straight doubles. */
  private def refAlpha(units: Seq[Seq[Long]]): Option[Double] = {
    val n = units.size
    val m = units.head.size
    val dO = units.map(u => (for (i <- 0 until m; j <- 0 until m if i != j)
      yield ((u(i) - u(j)) * (u(i) - u(j))).toDouble).sum).sum /
      (n.toDouble * m * (m - 1))
    val pool = units.flatten
    val bigN = pool.size
    val dE = (for (a <- pool; b <- pool) yield ((a - b) * (a - b)).toDouble)
      .sum / (bigN.toDouble * (bigN - 1))
    if (dE == 0) None else Some(1.0 - dO / dE)
  }

  test("krippendorffAlpha: published form, perfect agreement, degenerates (10 rounds)") {
    val unitGen = Gen.listOfN(3, Gen.choose(0L, 2L))
    for (round <- 0 until 10) {
      val units = draw(Gen.listOfN(40, unitGen), 57000L + round)
      val df = units.map(u => (u(0), u(1), u(2))).toDF("r0", "r1", "r2")
      val got = Quality.krippendorffAlpha(df,
        Seq(col("r0"), col("r1"), col("r2")))
        .as[(Long, Long, Long, Option[Long])].head()
      assert(got._1 == 40L && got._2 == 3L)
      (got._4, refAlpha(units)) match {
        case (Some(a), Some(w)) =>
          assert(math.abs(a / 10000.0 - w) < 2e-4, s"round $round")
        case (a, b) => assert(a.isEmpty && b.isEmpty, s"round $round")
      }
    }
    // unanimous raters with VARIED values: alpha exactly 1
    val perfect = Seq((0L, 0L, 0L), (1L, 1L, 1L), (2L, 2L, 2L))
      .toDF("r0", "r1", "r2")
    assert(Quality.krippendorffAlpha(perfect,
      Seq(col("r0"), col("r1"), col("r2")))
      .as[(Long, Long, Long, Option[Long])].head()._4 == Some(10000L))
    // constant corpus: no expected disagreement to correct against
    val const = Seq((1L, 1L, 1L), (1L, 1L, 1L)).toDF("r0", "r1", "r2")
    assert(Quality.krippendorffAlpha(const,
      Seq(col("r0"), col("r1"), col("r2")))
      .as[(Long, Long, Long, Option[Long])].head()._4.isEmpty)
  }

  test("cochranQ with two rules equals McNemar's uncorrected chi2 (10 rounds)") {
    val pGen = Gen.zip(Gen.oneOf(true, false), Gen.oneOf(true, false))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(40, pGen), 25000L + round)
      val df = rows.toDF("a", "b")
      val q = Quality.cochranQ(df, Seq(col("a"), col("b")))
        .as[(Long, Long, Option[Double])].head()
      val mc = Quality.mcnemarTest(df, col("a"), col("b"))
        .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])].head()
      // the textbook identity: Q(2 rules) = (b-c)^2/(b+c); both sides are
      // 4-digit floor renderings of the same rational
      (q._3, mc._6) match {
        case (Some(qv), Some(cv)) =>
          assert(math.abs(qv - cv) <= 1.0001e-4, s"round $round: Q $qv vs McNemar $cv")
        case (a, b) => assert(a.isEmpty && b.isEmpty, s"round $round: degeneracy must agree")
      }
      val unanimous = Quality.cochranQ(df, Seq(col("a"), col("a"), col("a")))
        .as[(Long, Long, Option[Double])].head()
      assert(unanimous._3.isEmpty,
        s"round $round: identical rules never disagree — Q undefined")
    }
  }

  test("kruskalWallis with two groups equals the squared tie-corrected MWU z (10 rounds)") {
    val vGen = Gen.choose(0L, 15L)
    for (round <- 0 until 10) {
      val as = draw(Gen.listOfN(25, vGen), 26000L + round)
      val bs = draw(Gen.listOfN(30, vGen), 26500L + round)
      val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("g", "v")
      val kw = Quality.kruskalWallis(df, col("v"), col("g"))
        .as[(Long, Long, Option[Double], Option[Double])].head()
      assert(kw._1 == 55L && kw._2 == 2L)
      val z = Quality.mannWhitneyU(
        as.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
        bs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
        "v")
        .as[(Long, Long, Long, Option[Long], Option[Double])].head()._5
      (kw._4, z) match {
        case (Some(h), Some(zv)) =>
          // both are 4-digit renderings computed through different float
          // chains — agree to a display unit plus rounding slack
          assert(math.abs(h - zv * zv) < 3e-3,
            s"round $round: H_adj $h must equal z^2 ${zv * zv}")
        case _ => // degenerate (all tied) — both sides null-family
      }
      val const = Quality.kruskalWallis(
        df.withColumn("v", lit(7L)), col("v"), col("g"))
        .as[(Long, Long, Option[Double], Option[Double])].head()
      assert(const._4.isEmpty, s"round $round: all-tied correction is undefined")
    }
  }

  /** Published tie-corrected Dunn form, straight doubles: pooled
    * midranks, B = N(N+1)/12 − ΣT/(12(N−1)), z per unordered pair.
    */
  private def refDunn(rows: Seq[(String, Long)])
      : Map[(String, String), Double] = {
    val n = rows.size.toDouble
    val byV = rows.map(_._2).groupBy(identity)
    val ranks: Map[Long, Double] = byV.map { case (v, vs) =>
      v -> (rows.count(_._2 < v) + (vs.size + 1) / 2.0)
    }
    val t = byV.values.map(g => math.pow(g.size, 3) - g.size).sum
    val b = n * (n + 1) / 12 - t / (12 * (n - 1))
    val gs = rows.groupBy(_._1)
    val keys = gs.keys.toSeq.sorted
    (for (a <- keys; c <- keys if a < c) yield {
      val ra = gs(a).map(r => ranks(r._2)).sum / gs(a).size
      val rc = gs(c).map(r => ranks(r._2)).sum / gs(c).size
      (a, c) -> (ra - rc) /
        math.sqrt(b * (1.0 / gs(a).size + 1.0 / gs(c).size))
    }).toMap
  }

  test("dunnPostHoc matches the published tie-corrected form (10 rounds)") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(0L, 12L))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(60, rowGen), 49000L + round)
      val want = refDunn(rows)
      val got = Quality.dunnPostHoc(rows.toDF("g", "v"), col("v"), col("g"))
        .as[(String, String, Long, Long, Option[Long], Option[Boolean])]
        .collect().map(r => (r._1, r._2) -> r).toMap
      assert(got.keySet == want.keySet, s"round $round: pair sets")
      for (((a, c), row) <- got) {
        assert(row._3 == rows.count(_._1 == a).toLong)
        assert(row._4 == rows.count(_._1 == c).toLong)
        assert(math.abs(row._5.get / 10000.0 - want((a, c))) < 2e-4,
          s"round $round: z($a,$c)")
      }
    }
  }

  test("dunnPostHoc with two groups squares to the KW H_adj (10 rounds)") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b"), Gen.choose(0L, 15L))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(50, rowGen), 49500L + round)
      val df = rows.toDF("g", "v")
      val dunn = Quality.dunnPostHoc(df, col("v"), col("g"))
        .as[(String, String, Long, Long, Option[Long], Option[Boolean])]
        .collect()
      if (rows.map(_._1).distinct.size == 2) {
        assert(dunn.length == 1)
        val hAdj = Quality.kruskalWallis(df, col("v"), col("g"))
          .as[(Long, Long, Option[Double], Option[Double])].head()._4
        (dunn.head._5, hAdj) match {
          case (Some(zb), Some(h)) =>
            val z = zb / 10000.0
            assert(math.abs(z * z - h) < 3e-3,
              s"round $round: z^2 ${z * z} vs H_adj $h")
          case (a, b) =>
            assert(a.isEmpty && b.isEmpty, s"round $round: degeneracy")
        }
      }
    }
  }

  test("dunnPostHoc: all-tied pool nulls, single group empties, zCrit 0 rejects") {
    val tied = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
      .toDF("g", "v")
    val gotTied = Quality.dunnPostHoc(tied, col("v"), col("g"))
      .as[(String, String, Long, Long, Option[Long], Option[Boolean])]
      .collect()
    assert(gotTied.length == 1 && gotTied.head._5.isEmpty &&
      gotTied.head._6.isEmpty)
    assert(Quality.dunnPostHoc(
      Seq(("a", 1L), ("a", 2L)).toDF("g", "v"), col("v"), col("g"))
      .count() == 0L)
    val loose = Quality.dunnPostHoc(
      Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v"),
      col("v"), col("g"), zCrit = 0.0)
      .as[(String, String, Long, Long, Option[Long], Option[Boolean])]
      .collect()
    assert(loose.forall(_._6 == Some(true)))
  }

  test("brownForsythe: translation-invariant, F >= 0, group-constant degenerate (10 rounds)") {
    val gGen = Gen.oneOf("a", "b", "c")
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(45, Gen.zip(gGen, Gen.choose(0L, 60L))), 22000L + round)
      val df = rows.toDF("g", "v")
      val got = Quality.brownForsythe(df, col("v"), col("g"))
        .as[(Long, Long, Option[Double], Option[Long])].head()
      got._3.foreach(f => assert(f >= 0.0, s"round $round: F >= 0"))
      // shifting every value by a constant moves the medians with it:
      // the deviations, and the statistic, are EXACTLY unchanged
      val shifted = Quality.brownForsythe(
        rows.map { case (g, v) => (g, v + 1000L) }.toDF("g", "v"),
        col("v"), col("g"))
        .as[(Long, Long, Option[Double], Option[Long])].head()
      assert(got == shifted, s"round $round: translation invariance must be exact")
      val const = Quality.brownForsythe(
        rows.map { case (g, _) => (g, g.head.toLong) }.toDF("g", "v"),
        col("v"), col("g"))
        .as[(Long, Long, Option[Double], Option[Long])].head()
      assert(const._3.isEmpty && const._4.isEmpty,
        s"round $round: zero spread everywhere nulls the test")
    }
  }

  test("cronbachAlpha: identical items score exactly 1, alpha <= 1 (10 rounds)") {
    val iGen = Gen.choose(0L, 5L)
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(40, Gen.zip(iGen, iGen, iGen)), 23000L + round)
      val df = rows.toDF("a", "b", "c")
      val got = Quality.cronbachAlpha(df, Seq(col("a"), col("b"), col("c")))
        .as[(Long, Long, Option[Double])].head()
      assert(got._1 == 40L && got._2 == 3L)
      got._3.foreach(a => assert(a <= 1.0, s"round $round: alpha <= 1 ($a)"))
      val same = Quality.cronbachAlpha(df, Seq(col("a"), col("a"), col("a")))
        .as[(Long, Long, Option[Double])].head()
      // k identical items: item-variance sum is k*v, total variance k^2*v,
      // so alpha = k/(k-1) * (1 - 1/k) = 1 exactly (or null if v = 0)
      assert(same._3.isEmpty || same._3.contains(1.0),
        s"round $round: identical items must score exactly 1")
    }
  }

  test("uncertaintyCoefficient: U in [0,1], MI bounded by entropies, identity and independence (10 rounds)") {
    val lGen = Gen.oneOf("a", "b", "c", "d")
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(50, Gen.zip(lGen, lGen)), 18000L + round)
      val df = rows.toDF("x", "y")
      val got = Quality.uncertaintyCoefficient(df, col("x"), col("y"))
        .as[(Long, Long, Long, Double, Double, Double, Option[Double], Option[Double])]
        .head()
      assert(got._6 >= -1e-4 && got._6 <= math.min(got._4, got._5) + 1e-4,
        s"round $round: 0 <= MI <= min(H) (${got._6} vs ${got._4}/${got._5})")
      got._7.foreach(u => assert(u >= -1e-4 && u <= 1.0001, s"round $round: U in [0,1]"))
      got._8.foreach(u => assert(u >= -1e-4 && u <= 1.0001, s"round $round: U in [0,1]"))
      val self = Quality.uncertaintyCoefficient(df, col("x"), col("x"))
        .as[(Long, Long, Long, Double, Double, Double, Option[Double], Option[Double])]
        .head()
      assert(self._6 == self._4 && (self._7.isEmpty || self._7.contains(1.0)),
        s"round $round: X explains all of X")
    }
    // a product grid is independent by construction: MI folds to 0
    val prod = (for { x <- Seq("a", "b"); y <- Seq("u", "v", "w"); _ <- 1 to 4 }
      yield (x, y)).toDF("x", "y")
    val ind = Quality.uncertaintyCoefficient(prod, col("x"), col("y"))
      .as[(Long, Long, Long, Double, Double, Double, Option[Double], Option[Double])]
      .head()
    assert(ind._6 == 0.0 && ind._7.contains(0.0) && ind._8.contains(0.0),
      "independent columns must report zero MI and zero U")
  }

  test("kendallTauB == brute-force pair scan; bounds and perfect agreement (10 rounds)") {
    val oGen = Gen.choose(0L, 6L)
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(40, Gen.zip(oGen, oGen)), 17000L + round)
      val df = rows.toDF("x", "y")
      val got = Quality.kendallTauB(df, col("x"), col("y"))
        .as[(Long, Long, Long, Option[Double])].head()
      // brute force over all unordered pairs
      var cc = 0L; var dd = 0L; var tx = 0L; var ty = 0L
      for (i <- rows.indices; j <- (i + 1) until rows.size) {
        val (x1, y1) = rows(i); val (x2, y2) = rows(j)
        if (x1 != x2 && y1 != y2) {
          if ((x1 < x2) == (y1 < y2)) cc += 1 else dd += 1
        }
        if (x1 == x2) tx += 1
        if (y1 == y2) ty += 1
      }
      val n0 = rows.size.toLong * (rows.size - 1) / 2
      assert(got._1 == rows.size && got._2 == cc && got._3 == dd,
        s"round $round: C/D must equal the brute pair scan ($got vs $cc/$dd)")
      val expTau =
        if (n0 > tx && n0 > ty)
          Some(math.floor((cc - dd).toDouble /
            math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble) * 10000 + 0.5) / 10000)
        else None
      assert(got._4 == expTau, s"round $round: tau_b mismatch")
      got._4.foreach(t => assert(t >= -1.0 && t <= 1.0))
      val perfect = Quality.kendallTauB(df, col("x"), col("x"))
        .as[(Long, Long, Long, Option[Double])].head()
      assert(perfect._3 == 0L && (perfect._4.isEmpty || perfect._4.contains(1.0)),
        s"round $round: x-vs-x must be perfectly concordant")
    }
  }

  test("prCurve: masses tile, suffix sums monotone, threshold 0 keeps everything (10 rounds)") {
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(60, rowGen), 16000L + round)
      val df = rows.toDF("num", "den", "y")
      val rep = Quality.prCurve(df, col("num"), col("den"), col("y"))
        .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
        .collect().sortBy(_._1)
      val p = rows.count(_._3).toLong
      assert(rep.length == 10)
      assert(rep.forall(r => r._2 + r._4 == p),
        s"round $round: tp + fn must tile labeled positives at every threshold")
      assert(rep.head._2 == p && rep.head._3 == rows.size - p,
        s"round $round: threshold 0 predicts everything positive")
      val kept = rep.map(r => r._2 + r._3)
      assert(kept.zip(kept.tail).forall { case (a, b) => a >= b },
        s"round $round: predicted-positive mass shrinks as the threshold rises")
      rep.foreach { r =>
        r._5.foreach(v => assert(v >= 0 && v <= 10000))
        r._6.foreach(v => assert(v >= 0 && v <= 10000))
        r._7.foreach(v => assert(v >= 0 && v <= 10000))
      }
    }
  }

  test("wassersteinDistance: symmetric, zero on identical, translation-exact (10 rounds)") {
    val vGen = Gen.choose(-30, 30).map(_.toDouble)
    for (round <- 0 until 10) {
      val as = draw(Gen.listOfN(25, vGen), 15000L + round)
      val bs = draw(Gen.listOfN(25, vGen), 15500L + round)
      def df(vs: Seq[Double]) =
        vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val ab = Quality.wassersteinDistance(df(as), df(bs), "v")
        .as[(Long, Long, Double, Option[Long])].head()
      val ba = Quality.wassersteinDistance(df(bs), df(as), "v")
        .as[(Long, Long, Double, Option[Long])].head()
      assert(ab._3 >= 0.0, s"round $round: W1 >= 0")
      assert(ab._3 == ba._3, s"round $round: W1 symmetric")
      val same = Quality.wassersteinDistance(df(as), df(as), "v")
        .as[(Long, Long, Double, Option[Long])].head()
      assert(same._3 == 0.0, s"round $round: W1(a, a) = 0")
      // equal-size translation: W1(a, a + c) = c, up to the one-sided
      // floor(2^20) quantization (each gap term truncates down)
      val c = 7.25
      val shifted = Quality.wassersteinDistance(
        df(as), df(as.map(_ + c)), "v")
        .as[(Long, Long, Double, Option[Long])].head()
      assert(shifted._3 <= c + 1e-9 && shifted._3 >= c - 1e-3,
        s"round $round: translation cost ${shifted._3} must be ~$c")
    }
  }

  test("wassersteinDistance: single-distinct-value input still reports the real counts") {
    // < 2 pooled distinct values -> the next-value gap join is EMPTY; the
    // counts must come from the totals row, not from an aggregate over
    // the empty gap frame (which reported NULL n_a/n_b before r15)
    def df(vs: Seq[Double]) =
      vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = Quality.wassersteinDistance(
      df(Seq.fill(5)(3.0)), df(Seq.fill(7)(3.0)), "v")
      .as[(Long, Long, Double, Option[Long])].head()
    assert(got._1 == 5L && got._2 == 7L, s"real counts expected, got $got")
    assert(got._3 == 0.0 && got._4.isEmpty,
      s"degenerate range: w1 0, normalized display null, got $got")
  }

  test("rboOverlap is bounded by 1 - p^k and symmetric (10 rounds)") {
    import graft.operators.Ranking
    for (round <- 0 until 10) {
      val rnd = new scala.util.Random(13000L + round)
      def lst() = rnd.shuffle((1L to 15L).toList).take(10)
        .zipWithIndex.map { case (id, i) => (i.toLong + 1, id) }
        .toDF("rnk", "doc_id")
      val a = lst(); val b = lst()
      val cap = math.floor((1 - math.pow(0.9, 10)) * 10000 + 0.5) / 10000
      val ab = Ranking.rboOverlap(a, b).as[(Long, Double)].head()
      val ba = Ranking.rboOverlap(b, a).as[(Long, Double)].head()
      assert(ab._2 >= 0.0 && ab._2 <= cap, s"round $round: rbo in [0, 1-p^k]")
      assert(ab == ba, s"round $round: rbo is symmetric")
    }
  }

  test("scoreDrift is non-negative on arbitrary snapshots, zero on identical (10 rounds)") {
    val vGen = Gen.choose(-1000, 1000).map(_.toDouble / 7.0)
    for (round <- 0 until 10) {
      val a = draw(Gen.listOfN(80, vGen), 9000L + round)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val b = draw(Gen.listOfN(80, vGen), 9500L + round)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val psi = Quality.scoreDrift(a, b, "v", "id")
        .select(col("psi")).as[Double].head()
      assert(psi >= 0.0, s"round $round: PSI is a sum of non-negative terms ($psi)")
      val zero = Quality.scoreDrift(a, a, "v", "id")
        .select(col("psi")).as[Double].head()
      assert(zero == 0.0, s"round $round: identical snapshots drift 0 ($zero)")
    }
  }
}
