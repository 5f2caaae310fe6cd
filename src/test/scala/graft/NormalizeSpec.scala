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
}
