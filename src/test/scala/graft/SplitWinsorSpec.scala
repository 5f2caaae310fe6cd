package graft

import graft.operators.{Normalize, Sampling}
import org.apache.spark.sql.functions._

/** Property pins for winsorization and the embargoed temporal split. */
class SplitWinsorSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize: interior values untouched, extremes clipped to the band") {
    val df = ((1L to 98L).map(i => ("g", i, 50.0)) ++
      Seq(("g", 99L, 0.001), ("g", 100L, 9999.0)))
      .toDF("grp", "id", "v")
    val out = Normalize.winsorize(df, "grp", "v", "id", lo = 0.05, hi = 0.95)
      .collect().map(r => r.getLong(1) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(50L) == ((50.0, false)), "interior value passes through")
    assert(out(99L)._2 && out(99L)._1 == 50.0, "low extreme clips up to p05")
    assert(out(100L)._2 && out(100L)._1 == 50.0, "high extreme clips down to p95")
  }

  test("temporal split: ordered, embargoed, exhaustive") {
    val df = (1 to 200).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d")))
      .toDF("id", "ts")
    val out = Sampling.temporalSplit(df, "ts", trainQ = 0.6, testQ = 0.7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("train", "embargo", "test"))
    assert(out.values.map(_._1).sum == 200L, "every row lands in exactly one split")
    // strict temporal order with a real gap: train < embargo < test
    assert(out("train")._3 < out("embargo")._2)
    assert(out("embargo")._3 < out("test")._2)
    // the embargo band holds ~10% of rows
    assert(out("embargo")._1 >= 15 && out("embargo")._1 <= 25)
  }
}
