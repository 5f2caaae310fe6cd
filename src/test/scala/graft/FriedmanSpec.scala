package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Friedman χ² + Kendall's W: an independent Hollander–Wolfe tie-sum
  * reference (the engine computes the Conover integer identity — a
  * different route to the same number), perfect/zero concordance pins,
  * and the systematic-harshness behavior agreement statistics miss.
  */
class FriedmanSpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private def fr(rows: Seq[(Long, Long, Long)])
      : (Long, Long, Option[Double], Option[Long]) =
    Quality.friedmanTest(rows.toDF("x", "y", "z"),
      Seq(col("x"), col("y"), col("z")))
      .as[(Long, Long, Option[Double], Option[Long])].head()

  /** H&W form: 12S/(bk(k+1) − Στ/(k−1)) with midranks and the within-
    * block tie masses τ = Σ(t³−t). */
  private def ref(rows: Seq[Seq[Long]]): Double = {
    val b = rows.size; val k = rows.head.size
    def ranks(vs: Seq[Long]): Seq[Double] = vs.map { v =>
      vs.count(_ < v) + (vs.count(_ == v) + 1) / 2.0
    }
    val rj = (0 until k).map(j => rows.map(r => ranks(r)(j)).sum)
    val s = rj.map(r => math.pow(r - b * (k + 1) / 2.0, 2)).sum
    val tau = rows.map { r =>
      r.groupBy(identity).values.map(_.size.toDouble)
        .map(t => t * t * t - t).sum
    }.sum
    12 * s / (b * k * (k + 1) - tau / (k - 1))
  }

  test("perfect concordance: chi2 = b(k-1), W = 1") {
    val rows = Seq.fill(5)((1L, 2L, 3L))
    val got = fr(rows)
    assert(got._1 == 5L && got._2 == 3L)
    assert(got._3 == Some(10.0)) // b(k-1) = 5*2
    assert(got._4 == Some(10000L))
  }

  test("matches the Hollander-Wolfe tie-sum form (10 rounds)") {
    val rowGen = Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 3L), Gen.choose(0L, 3L))
    var checked = 0
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(40, rowGen), 51000L + round)
        .filterNot { case (x, y, z) => x == y && y == z } // keep denI > 0 likely
      if (rows.nonEmpty) {
        val want = ref(rows.map(r => Seq(r._1, r._2, r._3)))
        val got = fr(rows)
        assert(math.abs(got._3.get - want) < 1e-4, s"round $round")
        assert(math.abs(got._4.get / 10000.0 -
          want / (rows.size * 2.0)) < 1e-4, s"W round $round")
        checked += 1
      }
    }
    assert(checked == 10)
  }

  test("a systematically harsher rater trips Friedman where agreement can't see it") {
    // rater z always one band above x/y: within every doc the RANKS are
    // identical (z top) — perfect concordance on the disagreement
    val rows = (0 until 20).map(i => ((i % 2).toLong, (i % 2).toLong, (i % 2).toLong + 1))
    val got = fr(rows)
    assert(got._3.get > 30.0) // chi2 near b(k-1) = 40 with ties
    assert(got._4.get > 8000L)
  }

  test("all blocks fully tied: null displays, real counts") {
    val got = fr(Seq.fill(4)((2L, 2L, 2L)))
    assert(got._1 == 4L && got._3.isEmpty && got._4.isEmpty)
  }

  test("random independent raters sit near zero concordance") {
    val rowGen = Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L), Gen.choose(0L, 9L))
    val rows = draw(Gen.listOfN(120, rowGen), 52000L)
    val got = fr(rows)
    assert(got._4.get < 2000L, s"W ${got._4.get} should be near 0")
  }
}
