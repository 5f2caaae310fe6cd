package graft

import graft.operators.Normalize
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("madOutliers: robust fence flags the spike a mean/stddev fence would absorb") {
    // group g: values 10..14 tight, one 1000 spike. median 12.5, abs
    // deviations {2.5,1.5,.5,.5,1.5,987.5} -> MAD 1.5; only the spike
    // clears the 3*MAD fence
    val df = Seq(("g", 10.0), ("g", 11.0), ("g", 12.0), ("g", 13.0),
      ("g", 14.0), ("g", 1000.0), ("h", 5.0)).toDF("grp", "v")
    val got = Normalize.madOutliers(df, "grp", "v")
      .orderBy("grp")
      .select("grp", "med", "mad", "n_outliers", "n_rows")
      .as[(String, Double, Double, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 12.5, 1.5, 1L, 6L), ("h", 5.0, 0.0, 0L, 1L)))
  }

  test("madOutliers: all-equal group has zero MAD and zero outliers") {
    val df = Seq(("k", 7.0), ("k", 7.0), ("k", 7.0)).toDF("grp", "v")
    val got = Normalize.madOutliers(df, "grp", "v")
      .select("med", "mad", "n_outliers").as[(Double, Double, Long)].head()
    assert(got == ((7.0, 0.0, 0L)))
  }

  test("quantileNormalize: groups with different scales land on one distribution") {
    // A = (1,2,3), B = (10,20,30): same within-group quantiles, so both
    // groups map onto the same global values (1, 6.5, 30) — pos 2.5
    // interpolates g2=3 .. g3=10
    val df = Seq(
      (1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0),
      (4L, "B", 10.0), (5L, "B", 20.0), (6L, "B", 30.0)
    ).toDF("doc_id", "grp", "score")
    val got = Normalize.quantileNormalize(df, "score", "grp")
      .orderBy("doc_id").as[(Long, String, Double, Double)].collect()
    assert(got.map(_._4).toSeq == Seq(1.0, 6.5, 30.0, 1.0, 6.5, 30.0))
    // a singleton group maps to the global median position
    val df2 = Seq((1L, "A", 5.0), (2L, "A", 7.0), (3L, "S", 100.0))
      .toDF("doc_id", "grp", "score")
    val s = Normalize.quantileNormalize(df2, "score", "grp")
      .filter($"grp" === "S").as[(Long, String, Double, Double)].head()
    // global sorted (5, 7, 100), q = 0.5 -> pos 1 -> exactly 7
    assert(s._4 == 7.0)
    // monotone within each group on real data
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val real = Normalize.quantileNormalize(docs, "n_chars", "source")
      .as[(Long, String, Double, Double)].collect()
    real.groupBy(_._2).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4, s"${a._1}->${b._1} not monotone")
        case _ =>
      }
    }
  }

  test("cohenKappa: hand case, perfect agreement, degenerate single class") {
    // A = (a,a,b,b), B = (a,b,b,b): po = 3/4, pe = (2·1 + 2·3)/16 = 1/2,
    // kappa = (0.75 − 0.5)/0.5 = 0.5
    val df = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")).toDF("x", "y")
    val got = Normalize.cohenKappa(df, "x", "y")
      .as[(Long, Double, Double, Double)].head()
    assert(got == ((4L, 0.75, 0.5, 0.5)))
    // identical columns: kappa 1 (unless pe degenerates)
    val same = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("x", "y")
    assert(Normalize.cohenKappa(same, "x", "y")
      .as[(Long, Double, Double, Double)].head()._4 == 1.0)
    // one class on both sides: pe = 1, conventional kappa = 1
    val degen = Seq(("a", "a"), ("a", "a")).toDF("x", "y")
    assert(Normalize.cohenKappa(degen, "x", "y")
      .as[(Long, Double, Double, Double)].head()._4 == 1.0)
    // disjoint label sets: zero agreement, pe = 0, kappa = po = 0
    val disj = Seq(("a", "b"), ("a", "b")).toDF("x", "y")
    val d = Normalize.cohenKappa(disj, "x", "y")
      .as[(Long, Double, Double, Double)].head()
    assert(d._2 == 0.0 && d._3 == 0.0 && d._4 == 0.0)
  }

  /** Published quadratic-weight form, straight doubles. */
  private def refWeightedKappa(rows: Seq[(Long, Long)]): Option[Double] = {
    val n = rows.size.toDouble
    val obs = rows.groupBy(identity).map { case ((a, b), g) =>
      g.size * (a - b) * (a - b).toDouble }.sum
    val ra = rows.groupBy(_._1).map { case (k, g) => k -> g.size }
    val cb = rows.groupBy(_._2).map { case (k, g) => k -> g.size }
    val exp = (for ((a, x) <- ra; (b, y) <- cb)
      yield x.toDouble * y * (a - b) * (a - b)).sum / n
    if (exp == 0) None else Some(1.0 - obs / exp)
  }

  test("weightedKappa: hand case, binary reduces to unweighted, degenerates") {
    // perfect agreement: every cell diagonal, observed weighted mass 0
    val same = Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("x", "y")
    assert(Normalize.weightedKappa(same, "x", "y")
      .as[(Long, Long, Long, Option[Long])].head()._4 == Some(10000L))
    // far confusion (0 vs 2) must cost more than adjacent (0 vs 1):
    // same disagreement COUNT, different weighted kappa
    val adj = Seq((0L, 0L), (2L, 2L), (0L, 1L), (2L, 1L)).toDF("x", "y")
    val far = Seq((0L, 0L), (2L, 2L), (0L, 2L), (2L, 0L)).toDF("x", "y")
    val kAdj = Normalize.weightedKappa(adj, "x", "y")
      .as[(Long, Long, Long, Option[Long])].head()._4.get
    val kFar = Normalize.weightedKappa(far, "x", "y")
      .as[(Long, Long, Long, Option[Long])].head()._4.get
    assert(kAdj > kFar)
    // binary labels: quadratic weights are flat off-diagonal, so
    // weighted == unweighted kappa (the textbook reduction)
    val bin = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 1L), (1L, 0L),
      (0L, 0L), (1L, 1L), (0L, 0L)).toDF("x", "y")
    val kw = Normalize.weightedKappa(bin, "x", "y")
      .as[(Long, Long, Long, Option[Long])].head()._4.get
    val ku = Normalize.cohenKappa(bin, "x", "y")
      .as[(Long, Double, Double, Double)].head()._4
    assert(math.abs(kw / 10000.0 - ku) < 1.001e-4)
    // single shared category: chance weighted mass 0 -> null
    assert(Normalize.weightedKappa(
      Seq((1L, 1L), (1L, 1L)).toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long, Option[Long])].head()._4.isEmpty)
  }

  test("weightedKappa matches the published form (10 rounds)") {
    val gen = org.scalacheck.Gen.listOfN(40,
      org.scalacheck.Gen.zip(
        org.scalacheck.Gen.choose(0L, 3L), org.scalacheck.Gen.choose(0L, 3L)))
    for (round <- 0 until 10) {
      val rows = gen(org.scalacheck.Gen.Parameters.default,
        org.scalacheck.rng.Seed(51000L + round)).get
      val want = refWeightedKappa(rows)
      val got = Normalize.weightedKappa(rows.toDF("x", "y"), "x", "y")
        .as[(Long, Long, Long, Option[Long])].head()
      assert(got._1 == 40L)
      (got._4, want) match {
        case (Some(g), Some(w)) =>
          assert(math.abs(g / 10000.0 - w) < 2e-4, s"round $round")
        case (a, b) => assert(a.isEmpty && b.isEmpty, s"round $round")
      }
    }
  }
}
