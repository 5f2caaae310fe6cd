package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** Split-conformal calibration: the finite-sample coverage guarantee on
  * synthetic exchangeable data, the exact order-statistic rank, and the
  * degenerate perfect-fit case.
  */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("coverage >= 1 - alpha on exchangeable synthetic data") {
    // y = 3x + deterministic pseudo-noise in [-5, 5): exchangeable across
    // the id%5 calibration/eval split because noise depends on a hash, not
    // on the split key
    val df = (1L to 2000L).map { i =>
      val noise = ((i * 2654435761L) % 1000) / 100.0 - 5.0
      (i, i % 100, 3.0 * (i % 100) + noise)
    }.toDF("doc_id", "x", "y")
    val r = Quality.conformalInterval(df, "x", "y", alpha = 0.1).head()
    val (nCal, k, coverage) = (r.getLong(0), r.getLong(2), r.getDouble(6))
    assert(k == math.ceil((nCal + 1) * 0.9).toLong)
    assert(coverage >= 0.85, s"coverage $coverage broke the conformal floor")
    assert(coverage <= 1.0)
  }

  test("olsCrossVal: perfect linear data recovers exact fits, rmse 0, folds partition") {
    val df = (1L to 500L).map(i => (i, i % 50, 2.0 * (i % 50) + 7.0))
      .toDF("doc_id", "x", "y")
    val rows = Quality.olsCrossVal(df, "x", "y", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows.map(_._2).sum == 500L, "folds partition the frame")
    rows.foreach { case (f, _, slope, intercept, rmse) =>
      assert(slope == 2.0 && intercept == 7.0 && rmse == 0.0,
        s"fold $f: complement fit must recover the exact line")
    }
  }

  test("olsCrossVal: noisy-but-exchangeable data gives stable fold fits") {
    val df = (1L to 2000L).map { i =>
      val noise = ((i * 2654435761L) % 1000) / 100.0 - 5.0
      (i, i % 100, 3.0 * (i % 100) + noise)
    }.toDF("doc_id", "x", "y")
    val slopes = Quality.olsCrossVal(df, "x", "y", k = 5)
      .collect().map(_.getDouble(2))
    assert(slopes.max - slopes.min < 0.05,
      s"complement fits should barely move: ${slopes.toSeq}")
  }

  test("distributed-rank q_hat == TakeOrdered q_hat (the shape it replaced), randomized") {
    // the r10 scale fix swapped orderBy.limit(k).agg(max) for the global
    // rank's index k-1: pin value-equality of the full output row on
    // noisy data across alphas and calibration splits, including ties
    // (integer-ish residuals collide after the DECIMAL(18,2) cast)
    for ((alpha, calMod, n) <- Seq((0.1, 5, 1200), (0.25, 2, 700), (0.05, 7, 300))) {
      val df = (1L to n.toLong).map { i =>
        val noise = ((i * 0x9E3779B9L) % 7).toDouble // heavy ties
        (i, i % 40, 2.0 * (i % 40) + noise)
      }.toDF("doc_id", "x", "y")
      val got = Quality.conformalInterval(df, "x", "y", alpha = alpha, calMod = calMod).head()
      // independent reference: same fit, residuals ranked by plain sort
      val cal = df.filter(pmod(col("doc_id"), lit(calMod)) === 0)
      val nCal = cal.count()
      val k = math.ceil((nCal + 1) * (1 - alpha)).toLong.min(nCal)
      assert(got.getLong(0) == nCal && got.getLong(2) == k,
        s"(alpha=$alpha calMod=$calMod) n_cal/k mismatch: $got")
      // re-derive q_hat by brute force from the operator's own residual
      // definition: k-th smallest |y - (a + b x)| on the calibration split
      val slope = got.getDouble(3); val intercept = got.getDouble(4)
      val qBrute = cal.select(
        abs(col("y") - (lit(intercept) + lit(slope) * col("x"))).as("r"))
        .orderBy(col("r")).collect().map(_.getDouble(0)).apply(k.toInt - 1)
      // display-rounded coefficients make this approximate: the pin is
      // the rank position, within the rounding-induced envelope
      assert(math.abs(got.getDouble(5) - math.floor(qBrute * 10000 + 0.5) / 10000) <= 0.002,
        s"(alpha=$alpha calMod=$calMod) q_hat ${got.getDouble(5)} vs brute $qBrute")
    }
  }

  test("perfect linear data: q_hat 0, coverage 1") {
    val df = (1L to 500L).map(i => (i, i % 50, 2.0 * (i % 50) + 7.0))
      .toDF("doc_id", "x", "y")
    val r = Quality.conformalInterval(df, "x", "y").head()
    assert(r.getDouble(5) == 0.0, "perfect fit has zero residual threshold")
    assert(r.getDouble(6) == 1.0, "every eval point is covered at q_hat 0")
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 7.0, "exact OLS recovery")
  }
}
