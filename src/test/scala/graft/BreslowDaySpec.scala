package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** Breslow–Day homogeneity with the Tarone correction: a straight-double
  * reference (quadratic fitted cells, hypergeometric-style variance), the
  * homogeneous-vs-heterogeneous separation the test exists for, and the
  * zero-margin conventions.
  */
class BreslowDaySpec extends SparkSpec {
  import spark.implicits._

  private def cells(g: String, a: Int, b: Int, c: Int, d: Int) =
    Seq.fill(a)((g, true, true)) ++ Seq.fill(b)((g, true, false)) ++
      Seq.fill(c)((g, false, true)) ++ Seq.fill(d)((g, false, false))

  private def bd(rows: Seq[(String, Boolean, Boolean)])
      : (Long, Long, Option[Double], Option[Double], Option[Double]) =
    Quality.breslowDay(rows.toDF("g", "e", "o"), col("e"), col("o"), col("g"))
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])].head()

  /** Published BD over explicit strata, straight doubles (common OR from
    * the raw MH sums — the engine's 2^-20 grains agree to ~1e-5). */
  private def ref(strata: Seq[(Double, Double, Double, Double)])
      : (Double, Double, Double) = {
    val r = strata.map { case (a, b, c, d) => a * d / (a + b + c + d) }.sum /
      strata.map { case (a, b, c, d) => b * c / (a + b + c + d) }.sum
    var bdS = 0.0; var dev = 0.0; var vs = 0.0
    for ((a, b, c, d) <- strata) {
      val n = a + b + c + d; val m1 = a + b; val t1 = a + c
      val x =
        if (math.abs(1 - r) < 1e-12) m1 * t1 / n
        else {
          val aq = 1 - r; val bq = (n - m1 - t1) + r * (m1 + t1)
          val cq = -r * m1 * t1
          val disc = math.sqrt(math.max(bq * bq - 4 * aq * cq, 0.0))
          val x1 = (-bq + disc) / (2 * aq); val x2 = (-bq - disc) / (2 * aq)
          val lo = math.max(0.0, m1 + t1 - n); val hi = math.min(m1, t1)
          if (x1 >= lo - 1e-9 && x1 <= hi + 1e-9) x1 else x2
        }
      val v = 1.0 / (1 / x + 1 / (m1 - x) + 1 / (t1 - x) + 1 / (n - m1 - t1 + x))
      bdS += (a - x) * (a - x) / v; dev += a - x; vs += v
    }
    (r, bdS, bdS - dev * dev / vs)
  }

  test("matches the published form on heterogeneous strata") {
    val rows = cells("s1", 30, 10, 10, 30) ++ cells("s2", 10, 30, 30, 10)
    val got = bd(rows)
    val (r, chi2, tarone) = ref(Seq((30, 10, 10, 30), (10, 30, 30, 10)))
    assert(got._1 == 2L && got._2 == 160L)
    assert(math.abs(got._3.get - r) < 1e-3)
    assert(math.abs(got._4.get - chi2) < 1e-2) // grain bias ~strata*2^-20 scaled by chi2 slope
    assert(math.abs(got._5.get - tarone) < 1e-2)
    // OR 9 vs OR 1/9: wildly heterogeneous — the test must say so
    assert(got._4.get > 20.0)
  }

  test("identical strata are homogeneous: chi2 ~ 0") {
    val rows = cells("s1", 12, 6, 5, 10) ++ cells("s2", 12, 6, 5, 10) ++
      cells("s3", 12, 6, 5, 10)
    val got = bd(rows)
    assert(got._4.get < 0.001)
    assert(got._5.get < 0.001)
    assert(got._5.get >= -0.001) // Tarone subtracts a nonnegative term
  }

  test("tarone never exceeds the uncorrected statistic") {
    val rows = cells("s1", 8, 4, 3, 9) ++ cells("s2", 5, 7, 6, 2) ++
      cells("s3", 9, 2, 4, 4)
    val got = bd(rows)
    assert(got._5.get <= got._4.get + 1e-9)
  }

  test("zero-margin strata contribute nothing") {
    val informative = cells("s1", 12, 6, 5, 10) ++ cells("s2", 4, 9, 7, 3)
    val padded = informative ++ cells("z1", 0, 0, 5, 9) // no exposed row
    val a = bd(informative); val b = bd(padded)
    // the common OR shifts only by the (zero) ad/bc mass of z1, and the
    // BD sums skip it entirely
    assert(a._4 == b._4 && a._5 == b._5)
  }

  test("sumBC 0 nulls everything but the counts") {
    val got = bd(cells("s", 3, 2, 0, 4)) // c = 0 -> bc mass 0
    assert(got._3.isEmpty && got._4.isEmpty && got._5.isEmpty)
    assert(got._1 == 1L && got._2 == 9L)
  }
}
