package graft

import graft.operators.Quality
import org.scalacheck.Gen

/** 1-D energy distance: the Székely-Rizzo pairwise-expectation identity
  * D² = 2E|X−Y| − E|X−X'| − E|Y−Y'| as an independent reference (the
  * engine computes the CDF-gap integral — a completely different route
  * to the same number), plus hand values and the metric behaviors.
  */
class EnergyDistanceSpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private def ed(as: Seq[Long], bs: Seq[Long])
      : (Long, Long, Double, Option[Long]) =
    Quality.energyDistance(as.toDF("v"), bs.toDF("v"), "v")
      .as[(Long, Long, Double, Option[Long])].head()

  /** The pairwise form, straight doubles — V-statistic convention
    * (all pairs incl. self, matching the CDF-integral identity). */
  private def refEd(as: Seq[Long], bs: Seq[Long]): Double = {
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val exy = mean(for (a <- as; b <- bs) yield math.abs(a - b).toDouble)
    val exx = mean(for (a <- as; a2 <- as) yield math.abs(a - a2).toDouble)
    val eyy = mean(for (b <- bs; b2 <- bs) yield math.abs(b - b2).toDouble)
    2 * exy - exx - eyy
  }

  test("hand case: disjoint halves integrate to 3.0") {
    // gaps .5, 1, .5 on unit intervals -> integral 1.5, D^2 = 3.0; and the
    // pairwise identity: 2*2 - 0.5 - 0.5 = 3.0
    val got = ed(Seq(1L, 2L), Seq(3L, 4L))
    assert(got._1 == 2L && got._2 == 2L)
    assert(got._3 == 3.0)
  }

  test("identical samples: exactly 0") {
    assert(ed(Seq(1L, 5L, 9L), Seq(1L, 5L, 9L))._3 == 0.0)
  }

  test("matches the pairwise-expectation identity (10 rounds)") {
    val vGen = Gen.choose(0L, 25L)
    for (round <- 0 until 10) {
      val as = draw(Gen.listOfN(20, vGen), 50000L + round)
      val bs = draw(Gen.listOfN(25, vGen), 50500L + round)
      val want = refEd(as, bs)
      val got = ed(as, bs)
      assert(math.abs(got._3 - want) < 2e-4, s"round $round: ${got._3} vs $want")
    }
  }

  test("scales linearly with the value axis (unlike CvM, which ignores it)") {
    val as = Seq(1L, 4L, 4L, 9L); val bs = Seq(2L, 4L, 10L)
    val base = ed(as, bs)
    val scaled = ed(as.map(_ * 3), bs.map(_ * 3))
    assert(math.abs(scaled._3 - 3 * base._3) < 1e-3)
    // while the RANGE-normalized display is scale-free
    assert(math.abs(scaled._4.get - base._4.get) <= 1)
  }

  test("empty side reports counts and a zero integral") {
    val got = ed(Seq(1L, 2L), Seq.empty[Long])
    assert(got._1 == 2L && got._2 == 0L && got._3 == 0.0)
  }
}
