package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Two-sample standardized effect sizes (Cliff's delta / Cohen's d /
  * Hedges' g) and the per-group Cliff's-delta screen: hand-computed
  * values, independent straight-double reference replays, the exact
  * ordinal invariances, and the grouped-vs-pairwise consistency contract.
  */
class EffectSizeSpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private def es(as: Seq[Long], bs: Seq[Long])
      : (Long, Long, Option[Long], Option[Long], Option[Long]) =
    Quality.effectSizes(as.toDF("v"), bs.toDF("v"), "v")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].head()

  private def screen(rows: Seq[(String, Long)])
      : Map[String, (Long, Long, Option[Long], Option[Long])] =
    Quality.groupedCliffsDelta(rows.toDF("g", "v"), col("v"), col("g"))
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  /** Published formulas, straight doubles, counting pairs directly —
    * independent of the engine's midrank kernel and moment grains. */
  private def refAll(as: Seq[Long], bs: Seq[Long]): (Double, Double, Double) = {
    val gt = (for (a <- as; b <- bs) yield ()).size.toDouble // force strict
    require(gt >= 0)
    val wins = as.map(a => bs.count(a > _)).map(_.toLong).sum
    val loss = as.map(a => bs.count(a < _)).map(_.toLong).sum
    val cliff = (wins - loss).toDouble / (as.size.toDouble * bs.size)
    val ma = as.map(_.toDouble).sum / as.size
    val mb = bs.map(_.toDouble).sum / bs.size
    val ssa = as.map(v => (v - ma) * (v - ma)).sum
    val ssb = bs.map(v => (v - mb) * (v - mb)).sum
    val sp2 = (ssa + ssb) / (as.size + bs.size - 2)
    val d = (ma - mb) / math.sqrt(sp2)
    val j = 1.0 - 3.0 / (4.0 * (as.size + bs.size) - 9)
    (cliff, d, j * d)
  }

  test("effectSizes: identical samples — zero delta, zero d, zero g") {
    assert(es(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) ==
      ((3L, 3L, Some(0L), Some(0L), Some(0L))))
  }

  test("effectSizes: disjoint halves pin delta to the +/-1 bounds") {
    val hi = es(Seq(10L, 11L, 12L), Seq(1L, 2L, 3L))
    assert(hi._3 == Some(10000L))
    val lo = es(Seq(1L, 2L, 3L), Seq(10L, 11L, 12L))
    assert(lo._3 == Some(-10000L))
  }

  test("effectSizes: hand case — Cliff from tied mass") {
    // a={1,2,2}, b={2,3}: wins #(a>b)=0, losses #(a<b)=1+1+1+... a=1:<2,<3
    // =2; a=2: <3 =1 twice -> loss=4, wins=0? a=2 vs b=2 tie. wins 0,
    // loss 4, delta = -4/6 = -0.666..., bp floor(-6666.67+0.5) = -6667
    assert(es(Seq(1L, 2L, 2L), Seq(2L, 3L))._3 == Some(-6667L))
  }

  test("effectSizes: matches published formulas (10 rounds)") {
    val vGen = Gen.choose(0L, 40L)
    for (round <- 0 until 10) {
      val as = draw(Gen.listOfN(25, vGen), 43000L + round)
      val bs = draw(Gen.listOfN(30, vGen), 43500L + round)
      val (cliff, d, g) = refAll(as, bs)
      val got = es(as, bs)
      assert(got._1 == 25L && got._2 == 30L)
      // delta is exact integer arithmetic to the display rounding; d/g
      // carry the 2^-20 moment grain — a display unit of slack covers it
      assert(math.abs(got._3.get / 10000.0 - cliff) < 1e-4, s"cliff round $round")
      assert(math.abs(got._4.get / 10000.0 - d) < 2e-4, s"d round $round")
      assert(math.abs(got._5.get / 10000.0 - g) < 2e-4, s"g round $round")
    }
  }

  test("effectSizes: antisymmetry — swapping sides flips every sign") {
    val as = Seq(1L, 4L, 4L, 9L, 12L); val bs = Seq(2L, 4L, 10L)
    val fwd = es(as, bs); val rev = es(bs, as)
    // bp rounding is floor(x+0.5): exact negation only when the 4th
    // decimal isn't a .5 boundary — delta's rational is 1/15 grained so
    // allow the one-unit rounding asymmetry
    assert(math.abs(fwd._3.get + rev._3.get) <= 1)
    assert(math.abs(fwd._4.get + rev._4.get) <= 1)
    assert(math.abs(fwd._5.get + rev._5.get) <= 1)
  }

  test("effectSizes: delta is a rank statistic (monotone-map exact), d is not") {
    val as = Seq(1L, 4L, 4L, 9L, 12L); val bs = Seq(2L, 4L, 10L, 11L)
    val base = es(as, bs)
    val mapped = es(as.map(v => v * v + 7), bs.map(v => v * v + 7))
    assert(mapped._3 == base._3) // delta exactly invariant
    assert(mapped._4 != base._4) // d prices the metric, so it moves
  }

  test("effectSizes: zero pooled variance nulls d/g, keeps delta") {
    assert(es(Seq(5L, 5L), Seq(5L, 5L)) == ((2L, 2L, Some(0L), None, None)))
  }

  test("effectSizes: empty side nulls every display, keeps counts") {
    assert(es(Seq(1L, 2L), Seq.empty[Long]) == ((2L, 0L, None, None, None)))
  }

  test("groupedCliffsDelta: each row equals the pairwise effectSizes delta") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 15L))
    val rows = draw(Gen.listOfN(60, rowGen), 44000L)
    val got = screen(rows)
    for (g <- Seq("a", "b", "c")) {
      val mine = rows.filter(_._1 == g).map(_._2)
      val rest = rows.filter(_._1 != g).map(_._2)
      val pairwise = es(mine, rest)
      assert(got(g)._1 == mine.size && got(g)._2 == rest.size)
      assert(got(g)._4 == pairwise._3,
        s"group $g: screen ${got(g)._4} vs pairwise ${pairwise._3}")
    }
  }

  test("groupedCliffsDelta: auc and delta are the same integer (2*auc-1)") {
    val rows = Seq(("a", 1L), ("a", 3L), ("a", 8L), ("b", 2L), ("b", 5L),
      ("c", 4L), ("c", 4L), ("c", 9L))
    for ((_, (_, _, auc, cliff)) <- screen(rows)) {
      // both render the one exact u2 integer: delta = 2*auc - 1 up to the
      // independent display roundings
      assert(math.abs((2 * auc.get - 10000) - cliff.get) <= 1)
    }
  }

  test("groupedCliffsDelta: single group reports counts, null displays") {
    val got = screen(Seq(("a", 1L), ("a", 2L)))
    assert(got("a") == ((2L, 0L, None, None)))
  }
}
