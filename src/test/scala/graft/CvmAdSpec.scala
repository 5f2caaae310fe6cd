package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Two-sample Cramér–von Mises (Anderson 1962 ECDF form) and k-sample
  * Anderson–Darling (Scholz–Stephens 1987 midrank form): hand-computed
  * values, independent half-rank reference replays (the engine doubles
  * the midranks; the reference here keeps the published halves — a real
  * cross-implementation), and the exact rank-statistic invariances.
  */
class CvmAdSpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  private def cvm(as: Seq[Long], bs: Seq[Long]): (Long, Long, Option[Long]) =
    Quality.cramerVonMises(as.toDF("v"), bs.toDF("v"), "v")
      .as[(Long, Long, Option[Long])].head()

  private def ad(rows: Seq[(String, Long)]): (Long, Long, Option[Long]) =
    Quality.andersonDarlingK(rows.toDF("g", "v"), col("v"), col("g"))
      .as[(Long, Long, Option[Long])].head()

  /** The published ECDF functional, straight doubles — independent of the
    * engine's integer cross-masses and per-class quantization. */
  private def refCvm(as: Seq[Long], bs: Seq[Long]): Double = {
    val na = as.size.toDouble; val nb = bs.size.toDouble; val nn = na + nb
    var cuma = 0L; var cumb = 0L; var s = 0.0
    for (v <- (as ++ bs).distinct.sorted) {
      val ca = as.count(_ == v); val cb = bs.count(_ == v)
      cuma += ca; cumb += cb
      val gap = cuma / na - cumb / nb
      s += (ca + cb) * gap * gap
    }
    na * nb / (nn * nn) * s
  }

  /** Scholz–Stephens A²akN with the paper's literal half-corrections
    * (B_j = cum − h/2, M_ij = cum_i − h_ij/2) — the engine's doubled
    * integer cores must land on the same statistic. */
  private def refAd(rows: Seq[(String, Long)]): Double = {
    val byG = rows.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    val all = rows.map(_._2)
    val nn = all.size.toDouble
    val values = all.distinct.sorted
    var s = 0.0
    for ((_, xs) <- byG) {
      val ni = xs.size.toDouble
      var cumall = 0L; var cumi = 0L; var inner = 0.0
      for (v <- values) {
        val hj = all.count(_ == v); val hij = xs.count(_ == v)
        cumall += hj; cumi += hij
        val bj = cumall - hj / 2.0
        val mij = cumi - hij / 2.0
        val den = bj * (nn - bj) - nn * hj / 4.0
        if (den > 0) {
          val num = nn * mij - ni * bj
          inner += hj / nn * (num * num) / den
        }
      }
      s += inner / ni
    }
    (nn - 1.0) / nn * s
  }

  test("cvm: identical samples score exactly 0") {
    assert(cvm(Seq(1L, 2L, 3L, 3L), Seq(1L, 2L, 3L, 3L)) == ((4L, 4L, Some(0L))))
  }

  test("cvm: hand case — disjoint halves") {
    // a={1,2}, b={3,4}: right-continuous gaps at the pooled values are
    // .5, 1, .5, 0 at h=1 each -> sum 1.5, T = (4/16)*1.5 = 0.375 (the
    // rank formula U/(N*na*nb) - (4*na*nb-1)/(6N) = 16/16 - 15/24 agrees);
    // every term dyadic so quantization is exact
    assert(cvm(Seq(1L, 2L), Seq(3L, 4L)) == ((2L, 2L, Some(3750L))))
  }

  test("cvm: matches the published ECDF functional (10 rounds)") {
    val vGen = Gen.choose(0L, 12L)
    for (round <- 0 until 10) {
      val as = draw(Gen.listOfN(30, vGen), 41000L + round)
      val bs = draw(Gen.listOfN(25, vGen), 41500L + round)
      val got = cvm(as, bs)
      assert(got._1 == 30L && got._2 == 25L)
      val want = refCvm(as, bs)
      // engine: per-class floor quantization at 2^-30 then one display
      // rounding — a display unit of slack covers both
      assert(math.abs(got._3.get / 10000.0 - want) < 2e-4,
        s"round $round: ${got._3.get / 10000.0} vs $want")
    }
  }

  test("cvm: exact under any strictly monotone value map (rank statistic)") {
    val as = Seq(1L, 4L, 4L, 9L, 12L)
    val bs = Seq(2L, 4L, 10L, 11L)
    val base = cvm(as, bs)
    // value magnitudes never enter — only the order — so a monotone map
    // leaves the statistic EXACTLY unchanged (unlike W1, which prices gaps)
    assert(cvm(as.map(v => v * v + 7), bs.map(v => v * v + 7)) == base)
  }

  test("ad: identical group compositions score exactly 0") {
    val rows = for (g <- Seq("a", "b", "c"); v <- 1L to 4L) yield (g, v)
    assert(ad(rows) == ((3L, 12L, Some(0L))))
  }

  test("ad: matches the published half-rank form (10 rounds)") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 12L))
    for (round <- 0 until 10) {
      val rows = draw(Gen.listOfN(60, rowGen), 42000L + round)
      val got = ad(rows)
      assert(got._2 == 60L)
      val want = refAd(rows)
      assert(math.abs(got._3.get / 10000.0 - want) < 2e-4,
        s"round $round: ${got._3.get / 10000.0} vs $want")
      assert(got._3.get >= 0L, s"round $round: A2 is a sum of squares")
    }
  }

  test("ad: all values tied is undefined (null), not zero") {
    val got = ad(Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)))
    assert(got._1 == 2L && got._2 == 4L && got._3.isEmpty)
  }

  test("ad: exact under any strictly monotone value map (rank statistic)") {
    val rows = Seq(("a", 1L), ("a", 3L), ("a", 3L), ("b", 2L), ("b", 8L),
      ("c", 3L), ("c", 9L), ("c", 9L))
    assert(ad(rows.map { case (g, v) => (g, v * 10 + 1) }) == ad(rows))
  }

  test("ad: separated groups dominate interleaved ones") {
    val sep = ad(Seq.tabulate(20)(i => ("a", i.toLong)) ++
      Seq.tabulate(20)(i => ("b", 100L + i)))
    val mix = ad(Seq.tabulate(40)(i => (if (i % 2 == 0) "a" else "b", i.toLong)))
    assert(sep._3.get > mix._3.get)
  }
}
