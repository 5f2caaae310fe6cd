package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** Benford first-digit audit: digit extraction edges, absent-digit spine,
  * expected shares, and a Benford-distributed vs uniform separation.
  */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  test("digit extraction covers decimals, negatives, and sub-1 values") {
    val df = Seq(245.6, -0.031, 0.5, 9000.0, 1.0e-7).toDF("v")
    val out = Quality.benfordTest(df, "v").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // digits: 2, 3, 5, 9, 1
    assert(out(2) == 1L && out(3) == 1L && out(5) == 1L && out(9) == 1L && out(1) == 1L)
    assert(out(4) == 0L && out(7) == 0L)
  }

  test("expected shares are the Benford probabilities") {
    val df = Seq(1.0).toDF("v")
    val exp = Quality.benfordTest(df, "v").collect()
      .map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(exp(1) == 0.301 && exp(2) == 0.1761 && exp(9) == 0.0458)
  }

  test("a Benford-ish multiplicative series deviates less than a uniform one") {
    // powers of 1.1 are classically Benford; uniform 100..999 all start 1-9 evenly
    val benford = (0 until 500).map(i => math.pow(1.1, i)).toDF("v")
    val uniform = (100 until 999).map(_.toDouble).toDF("v")
    def meanDev(df: org.apache.spark.sql.DataFrame) =
      Quality.benfordTest(df, "v").agg(avg(col("abs_dev"))).head().getDouble(0)
    assert(meanDev(benford) < meanDev(uniform))
    assert(meanDev(benford) < 0.02)
  }

  test("zero and null values are excluded") {
    val df = Seq(Some(0.0), None, Some(2.0)).toDF("v")
    val out = Quality.benfordTest(df, "v").agg(sum(col("n"))).head().getLong(0)
    assert(out == 1L)
  }
}
