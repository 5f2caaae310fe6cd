package graft

import org.apache.spark.sql.functions._
import graft.operators.{GlobalRank, Sessions}

/** Pins the r15 q170 fold: the 12 RFM quintile cuts computed by ONE
  * [[GlobalRank.groupedPercentileTable]] pass over the unpivoted
  * (metric, value) frame must be BIT-IDENTICAL to the three sequential
  * [[GlobalRank.percentileValues]] jobs they replaced — both helpers run
  * Spark's Percentile.getPercentile interpolation chain verbatim, so any
  * divergence here is a broken refactor, not float noise.
  */
class RfmFoldSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.2, 0.4, 0.6, 0.8)

  test("grouped fold cuts are bit-identical to per-metric percentileValues") {
    // deliberately awkward shapes: ties, a null metric value, a
    // non-interpolating size (r), and an interpolating one (f/m)
    val perUser = Seq(
      (1L, Some(100.0), 7.0, 12.5), (2L, Some(200.0), 7.0, 99.75),
      (3L, Some(150.0), 3.0, 12.5), (4L, None, 9.0, 0.25),
      (5L, Some(500.0), 1.0, 47.0), (6L, Some(450.0), 2.0, 47.0),
      (7L, Some(320.0), 11.0, 3.125)).toDF("id", "r", "f", "m")
    val sequential = Seq("r", "f", "m").map { c =>
      c -> GlobalRank.percentileValues(perUser, c, "id", probs)
        .map(_.toSeq.map(Option(_))).getOrElse(probs.map(_ => None))
    }.toMap
    val unpivoted = perUser.select(explode(array(
        struct(lit("r").as("_m"), col("r").as("_v")),
        struct(lit("f").as("_m"), col("f").as("_v")),
        struct(lit("m").as("_m"), col("m").as("_v")))).as("_e"))
      .select(col("_e._m").as("_m"), col("_e._v").as("_v"))
    val folded = GlobalRank.groupedPercentileTable(unpivoted, "_m", "_v",
        probs, probs.indices.map(i => s"_c${i + 1}")).collect()
      .map(r => r.getString(0) -> probs.indices.map(i =>
        if (r.isNullAt(i + 1)) Option.empty[Double] else Some(r.getDouble(i + 1))))
      .toMap
    for (metric <- Seq("r", "f", "m"))
      assert(folded(metric) == sequential(metric),
        s"cuts diverge for metric $metric")
  }

  test("rfmSegments still bands correctly through the folded cut pass") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // 10 users, user i has i+1 events of value 10*(i+1) ending at hour i
    val ev = (0 until 10).flatMap { i =>
      (0 to i).map(j => (i.toLong * 100 + j, ts(i * 3600L + j), i.toLong,
        10.0 * (i + 1)))
    }.toDF("event_id", "ts", "user_id", "value")
    val out = Sessions.rfmSegments(ev).collect()
      .map(r => r.getLong(0) -> r.getString(7)).toMap
    assert(out(9L) == "555" && out(0L) == "111")
  }
}
