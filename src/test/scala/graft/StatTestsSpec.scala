package graft

import graft.operators.Quality

/** Gini concentration and chi-square independence: hand-computed values
  * on constructed distributions and contingency tables.
  */
class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  private def gini(vals: Seq[Long]): (Long, Long, Double) = {
    val r = Quality.giniConcentration(vals.toDF("v"), "v").head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("Gini: perfect equality scores 0") {
    assert(gini(Seq(5L, 5L, 5L, 5L)) == ((4L, 20L, 0.0)))
  }

  test("Gini: total concentration approaches 1 - 1/n") {
    assert(gini(Seq(0L, 0L, 0L, 10L)) == ((4L, 10L, 0.75)))
  }

  test("Gini: hand-computed intermediate") {
    // sorted 1,2,3,4: S2 = 30 -> G = 60/40 - 5/4 = 0.25
    assert(gini(Seq(4L, 1L, 3L, 2L))._3 == 0.25)
  }

  test("Gini: duplicates rank as a block") {
    // 1,1,2: S2 = 1*1 + 1*2 + 2*3 = 9 -> G = 18/(3*4) - 4/3 = 0.1667
    assert(gini(Seq(2L, 1L, 1L))._3 == 0.1667)
  }

  private def wilson(pairs: (String, Boolean)*) =
    Quality.wilsonInterval(
      pairs.toSeq.toDF("g", "ok"), "g", org.apache.spark.sql.functions.col("ok"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

  test("Wilson interval brackets the rate and stays in [0,1]") {
    val out = wilson((1 to 100).map(i => ("s", i <= 50)): _*)("s")
    assert(out._3 == 0.5)
    assert(out._4 > 0.4 && out._4 < 0.5 && out._5 > 0.5 && out._5 < 0.6)
    // textbook: p=0.5, n=100 -> [0.4038, 0.5962]
    assert(out._4 == 0.4038 && out._5 == 0.5962)
  }

  test("Wilson at a perfect rate: lower bound is n/(n+z^2), upper clips to 1") {
    val out = wilson((1 to 10).map(_ => ("s", true)): _*)("s")
    assert(out._3 == 1.0 && out._5 == 1.0)
    val expect = 10.0 / (10.0 + 1.96 * 1.96)
    assert(out._4 == (expect * 10000).round / 10000.0)
  }

  test("Wilson intervals tighten with n") {
    val small = wilson((1 to 10).map(i => ("s", i <= 5)): _*)("s")
    val big = wilson((1 to 1000).map(i => ("s", i <= 500)): _*)("s")
    assert((big._5 - big._4) < (small._5 - small._4))
  }

  private def theil(rows: (String, Long)*) = {
    val r = Quality.theilDecomposition(rows.toSeq.toDF("g", "v"), "g", "v").head()
    (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))
  }

  test("Theil: perfect equality scores 0 everywhere") {
    val (n, t, tb, tw, ok) = theil(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
    assert(n == 4L && t == 0.0 && tb == 0.0 && tw == 0.0 && ok)
  }

  test("Theil: pure between-group inequality has zero within") {
    // groups internally equal but different means
    val (_, t, tb, tw, ok) = theil(("a", 2L), ("a", 2L), ("b", 8L), ("b", 8L))
    assert(tw == 0.0 && tb > 0.0 && t == tb && ok)
  }

  test("Theil: pure within-group inequality has zero between") {
    // both groups have the same mean 5 but unequal members
    val (_, t, tb, tw, ok) = theil(("a", 2L), ("a", 8L), ("b", 2L), ("b", 8L))
    assert(tb == 0.0 && tw > 0.0 && t == tw && ok)
  }

  test("Theil: the decomposition identity holds on mixed data") {
    val (_, t, tb, tw, ok) = theil(
      ("a", 1L), ("a", 9L), ("b", 20L), ("b", 30L), ("c", 5L))
    assert(ok)
    assert(math.abs(t - (tb + tw)) <= 0.0001)
    assert(tb > 0 && tw > 0)
  }

  test("Theil: zero values contribute zero, not NaN") {
    val (_, t, _, _, ok) = theil(("a", 0L), ("a", 10L), ("b", 5L))
    assert(!t.isNaN && ok)
  }

  test("chi-square: independent table scores 0") {
    val rows = for { a <- Seq("x", "y"); b <- Seq(1, 2); _ <- 0 until 5 }
      yield (a, b)
    val out = Quality.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getDouble(3) == 5.0)   // expected
      assert(r.getDouble(5) == 0.0)   // chi2 total
      assert(r.getLong(6) == 1L)      // dof (2-1)*(2-1)
    }
  }

  test("chi-square: perfect association scores N") {
    val rows = (Seq.fill(10)(("x", 1)) ++ Seq.fill(10)(("y", 2)))
    val out = Quality.chiSquareIndependence(rows.toDF("a", "b"), "a", "b")
      .collect()
    // diagonal table: chi2 = N = 20
    assert(out.head.getDouble(5) == 20.0)
    out.foreach(r => assert(r.getDouble(3) == 5.0))
  }

  // ---- association card (chi2 + G + Cramér's V) ----

  private def card(rows: Seq[(String, Long)])
      : (Long, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long]) =
    Quality.associationCard(rows.toDF("a", "b"),
      org.apache.spark.sql.functions.col("a"),
      org.apache.spark.sql.functions.col("b"))
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].head()

  /** Straight-double reference over the densified cross. */
  private def refCard(rows: Seq[(String, Long)]): (Double, Double, Double) = {
    val n = rows.size.toDouble
    val as = rows.map(_._1).distinct.sorted
    val bs = rows.map(_._2).distinct.sorted
    var chi2 = 0.0; var g = 0.0
    for (a <- as; b <- bs) {
      val o = rows.count(r => r._1 == a && r._2 == b).toDouble
      val e = rows.count(_._1 == a) * rows.count(_._2 == b) / n
      chi2 += (e - o) * (e - o) / e
      if (o > 0) g += o * math.log(o / e)
    }
    (chi2, 2 * g, math.sqrt(chi2 / (n * (math.min(as.size, bs.size) - 1))))
  }

  test("associationCard: independence zeroes, diagonal saturates V at 1") {
    val ind = for { a <- Seq("x", "y"); b <- Seq(1L, 2L); _ <- 0 until 5 }
      yield (a, b)
    val gi = card(ind)
    assert(gi._5 == Some(0L) && gi._6 == Some(0L) && gi._7 == Some(0L))
    assert(gi._4 == Some(1L))
    val diag = Seq.fill(10)(("x", 1L)) ++ Seq.fill(10)(("y", 2L))
    val gd = card(diag)
    assert(gd._7 == Some(10000L)) // V = 1 on a diagonal table
    assert(gd._5 == Some(200000L)) // chi2 = N = 20
  }

  test("associationCard matches the published forms (10 rounds)") {
    val gen = org.scalacheck.Gen.listOfN(60, org.scalacheck.Gen.zip(
      org.scalacheck.Gen.oneOf("p", "q", "r"),
      org.scalacheck.Gen.choose(0L, 3L)))
    for (round <- 0 until 10) {
      val rows = gen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(58000L + round)).get
      val (chi2, g, v) = refCard(rows)
      val got = card(rows)
      assert(math.abs(got._5.get / 10000.0 - chi2) < 1e-3, s"round $round chi2")
      assert(math.abs(got._6.get / 10000.0 - g) < 1e-3, s"round $round g")
      assert(math.abs(got._7.get / 10000.0 - v) < 2e-4, s"round $round v")
      assert(got._4 == Some((got._2 - 1) * (got._3 - 1)))
    }
  }

  test("associationCard: a single-category axis carries no association") {
    val got = card(Seq(("x", 1L), ("x", 2L), ("x", 1L)))
    assert(got._2 == 1L && got._4.isEmpty && got._7.isEmpty)
  }

  // ---- DeLong AUC confidence interval ----

  private def ci(rows: Seq[(Double, Boolean)])
      : (Long, Long, Option[Long], Option[Long], Option[Long], Option[Long]) =
    graft.operators.Ranking.delongAucCi(rows.toDF("s", "l"),
      org.apache.spark.sql.functions.col("s"),
      org.apache.spark.sql.functions.col("l"))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].head()

  /** Published DeLong form, straight doubles via placements. */
  private def refDelong(rows: Seq[(Double, Boolean)])
      : (Double, Double) = {
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    def place(x: Double, other: Seq[Double]) =
      (other.count(_ < x) + other.count(_ == x) / 2.0) / other.size
    val v10 = pos.map(place(_, neg))
    val v01 = neg.map(s => 1.0 - place(s, pos))
    val auc = v10.sum / v10.size
    def svar(xs: Seq[Double]) = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    (auc, math.sqrt(svar(v10) / pos.size + svar(v01) / neg.size))
  }

  test("delongAucCi: AUC equals scoreAuc; SE matches the published form (10 rounds)") {
    val gen = org.scalacheck.Gen.listOfN(50, org.scalacheck.Gen.zip(
      org.scalacheck.Gen.choose(0, 20).map(_ / 20.0),
      org.scalacheck.Gen.oneOf(true, false)))
    for (round <- 0 until 10) {
      val rows = gen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(59000L + round)).get
      if (rows.count(_._2) >= 2 && rows.count(!_._2) >= 2) {
        val got = ci(rows)
        val (aucW, seW) = refDelong(rows)
        assert(math.abs(got._3.get / 10000.0 - aucW) < 1.001e-4,
          s"round $round auc")
        assert(math.abs(got._4.get / 10000.0 - seW) < 2e-4, s"round $round se")
        val auc2 = graft.operators.Ranking.scoreAuc(
          rows.zipWithIndex.map { case ((s, l), i) => (i.toLong, s, l) }
            .toDF("doc_id", "s", "l"),
          org.apache.spark.sql.functions.col("s"),
          org.apache.spark.sql.functions.col("l"))
          .as[(Long, Long, Double)].head()._3
        assert(math.abs(got._3.get / 10000.0 - auc2) < 1.001e-4,
          s"round $round auc-vs-scoreAuc")
      }
    }
  }

  test("delongAucCi: perfect separation pins auc 1 with zero-width interval") {
    val rows = Seq((0.1, false), (0.2, false), (0.3, false),
      (0.8, true), (0.9, true), (1.0, true))
    val got = ci(rows)
    assert(got._3 == Some(10000L) && got._4 == Some(0L))
    assert(got._5 == Some(10000L) && got._6 == Some(10000L))
  }

  test("delongAucCi: more data tightens the interval; one-sided inputs degrade loudly") {
    val base = Seq((0.2, false), (0.4, true), (0.3, false), (0.6, true),
      (0.5, false), (0.7, true), (0.1, false), (0.8, true))
    val small = ci(base)
    val big = ci(Seq.fill(8)(base).flatten)
    assert(small._3 == big._3) // duplication preserves the AUC
    assert(big._4.get < small._4.get)
    val onePos = ci(Seq((0.5, true), (0.2, false), (0.3, false)))
    assert(onePos._3.isDefined && onePos._4.isEmpty)
  }
}
