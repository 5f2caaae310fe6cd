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
}
