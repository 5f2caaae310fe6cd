package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessions
import java.sql.Timestamp

/** The fused trend card must agree row-for-row with the standalone
  * Mann–Kendall, Cox–Stuart, and KPSS operators whose display chains it
  * copies (the KGroupCardSpec contract on the time axis).
  */
class TrendCardSpec extends SparkSpec {
  import spark.implicits._

  private def pinAgainstStandalones(events: org.apache.spark.sql.DataFrame): Unit = {
    val card = Sessions.trendCard(events)
      .collect().map(r => r.getString(0) -> r).toMap
    val mk = Sessions.mannKendallTrend(events.filter(col("ts").isNotNull))
      .collect().map(r => r.getString(0) -> r).toMap
    val cs = Sessions.coxStuartTrend(events)
      .collect().map(r => r.getString(0) -> r).toMap
    val kp = Sessions.kpssTest(events)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(card.keySet == mk.keySet && card.keySet == cs.keySet &&
      card.keySet == kp.keySet, "type universes must agree")
    for ((t, c) <- card) {
      def f(name: String) = c.get(c.fieldIndex(name))
      assert(f("n_days") == mk(t).get(1) && f("mk_s") == mk(t).get(2) &&
        f("z") == mk(t).get(3) && f("sen_slope") == mk(t).get(4),
        s"$t MK leg: $c vs ${mk(t)}")
      assert(f("n_pairs") == cs(t).get(2) && f("n_pos") == cs(t).get(3) &&
        f("cs_z_bp") == cs(t).get(4), s"$t CS leg: $c vs ${cs(t)}")
      assert(f("eta_bp") == kp(t).get(2) && f("reject_5pct") == kp(t).get(3),
        s"$t KPSS leg: $c vs ${kp(t)}")
    }
  }

  test("card rows equal the standalone operators on the real frame") {
    pinAgainstStandalones(Tables(spark, sf(), "events"))
    spark.catalog.clearCache()
  }

  test("card rows equal the standalones on synthetic trends and ties") {
    val rnd = new scala.util.Random(13)
    val day = 86400000L
    val rows = for {
      (t, gen) <- Seq(
        ("up", (d: Int) => 5 + d * 2),              // monotone rise
        ("flat", (_: Int) => 7),                    // fully tied
        ("noisy", (_: Int) => 3 + rnd.nextInt(9)))  // stationary noise
      d <- 0 until 14
      i <- 0 until gen(d)
    } yield (t, new Timestamp(d * day + i * 1000L))
    pinAgainstStandalones(rows.toDF("event_type", "ts"))
  }
}
