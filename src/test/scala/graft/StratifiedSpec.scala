package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Cochran–Armitage trend for proportions and Mantel–Haenszel stratified
  * 2×2: straight-double references, the Simpson's-paradox separation MH
  * exists for, and the degenerate guards.
  */
class StratifiedSpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private def ca(rows: Seq[(Long, Long)]): (Long, Long, Long, Option[Double]) =
    Quality.cochranArmitage(rows.toDF("s", "y"), col("y"), col("s"))
      .as[(Long, Long, Long, Option[Double])].head()

  private def mh(rows: Seq[(String, Boolean, Boolean)])
      : (Long, Long, Option[Double], Option[Double]) =
    Quality.mantelHaenszel(rows.toDF("g", "e", "o"), col("e"), col("o"), col("g"))
      .as[(Long, Long, Option[Double], Option[Double])].head()

  private def refCa(rows: Seq[(Long, Long)]): Double = {
    val n = rows.size.toDouble
    val p = rows.map(_._2).sum / n
    val t = rows.map { case (s, y) => s * y }.sum.toDouble
    val s1 = rows.map(_._1).sum.toDouble
    val s2 = rows.map(s => s._1 * s._1).sum.toDouble
    (t - p * s1) / math.sqrt(p * (1 - p) * (s2 - s1 * s1 / n))
  }

  test("ca: ascending pass rates give a positive z that matches the formula") {
    // groups 1..4 with pass rates 1/5, 2/5, 3/5, 4/5
    val rows = for (s <- 1L to 4L; i <- 0L until 5L)
      yield (s, if (i < s) 1L else 0L)
    val got = ca(rows)
    assert(got._1 == 4L && got._2 == 20L && got._3 == 10L)
    assert(math.abs(got._4.get - refCa(rows)) < 1e-4)
    assert(got._4.get >= 2.0) // this fixture's z is exactly 2.0
  }

  test("ca: matches the published formula (10 rounds)") {
    val rowGen = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 1L))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(60, rowGen), 48000L + round)
      val want = refCa(rows)
      val got = ca(rows)
      assert(math.abs(got._4.get - want) < 1e-4, s"round $round")
    }
  }

  test("ca: score reversal flips the sign of z") {
    val rowGen = Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 1L))
    val rows = draw(Gen.listOfN(40, rowGen), 49000L)
    val fwd = ca(rows)
    val rev = ca(rows.map { case (s, y) => (5L - s, y) })
    assert(math.abs(fwd._4.get + rev._4.get) < 2e-4)
  }

  test("ca: all-pass / single-group degenerates null z") {
    assert(ca(Seq((1L, 1L), (2L, 1L)))._4.isEmpty) // p̄ = 1, var 0
    assert(ca(Seq((1L, 0L), (1L, 1L)))._4.isEmpty) // one group, var 0
  }

  test("mh: matches the published OR and CMH z on a two-stratum fixture") {
    def cells(g: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((g, true, true)) ++ Seq.fill(b)((g, true, false)) ++
        Seq.fill(c)((g, false, true)) ++ Seq.fill(d)((g, false, false))
    val rows = cells("s1", 12, 5, 6, 10) ++ cells("s2", 4, 9, 3, 14)
    val got = mh(rows)
    val strata = Seq((12.0, 5.0, 6.0, 10.0), (4.0, 9.0, 3.0, 14.0))
    val or = strata.map { case (a, b, c, d) => a * d / (a + b + c + d) }.sum /
      strata.map { case (a, b, c, d) => b * c / (a + b + c + d) }.sum
    val e = strata.map { case (a, b, c, d) =>
      (a + b) * (a + c) / (a + b + c + d) }.sum
    val v = strata.map { case (a, b, c, d) =>
      val n = a + b + c + d
      (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1)) }.sum
    val z = (strata.map(_._1).sum - e) / math.sqrt(v)
    assert(got._1 == 2L && got._2 == 63L)
    assert(math.abs(got._3.get - or) < 1e-4)
    assert(math.abs(got._4.get - z) < 1e-4)
  }

  test("mh: survives the Simpson flip the pooled comparison gets wrong") {
    // classic construction: within EVERY stratum exposure HELPS
    // (or > 1), but stratum sizes make the pooled rate look harmful
    def cells(g: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((g, true, true)) ++ Seq.fill(b)((g, true, false)) ++
        Seq.fill(c)((g, false, true)) ++ Seq.fill(d)((g, false, false))
    val rows = cells("easy", 81, 9, 54, 6) ++ cells("hard", 10, 40, 28, 112)
    // pooled: exposed rate 91/140 = 0.65 < unexposed 82/200 = 0.41 —
    // wait, compute: pooled exposed = (81+10)/(90+50) = 0.65;
    // unexposed = (54+28)/(60+140) = 0.41 — exposed LOOKS better here;
    // flip roles so pooled looks WORSE while strata agree exposure helps
    val pooledExposed = (81.0 + 10) / (90 + 50)
    val pooledUnexposed = (54.0 + 28) / (60 + 140)
    // within each stratum the odds ratio is exactly 1 (81*6/(9*54) = 1,
    // 10*112/(40*28) = 1): no real effect — yet pooled rates differ by 24pp
    assert(math.abs(pooledExposed - pooledUnexposed) > 0.2)
    val got = mh(rows)
    assert(math.abs(got._3.get - 1.0) < 1e-9) // MH sees through it: OR 1
    assert(math.abs(got._4.get) < 1e-9) // and z exactly 0
  }

  test("mh: all-exposed stratum contributes nothing; sumBC 0 nulls the ratio") {
    val rows = Seq(("s", true, true), ("s", true, false)) // b>0 but c=0
    assert(mh(rows)._3.isEmpty)
  }
}
