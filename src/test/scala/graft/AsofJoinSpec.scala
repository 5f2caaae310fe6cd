package graft

import graft.operators.AsofJoin
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks latest right row at-or-before left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (2L, ts("2024-01-01 10:00:03"), 50.0)
    ).toDF("key", "ts", "price")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.0),
      (1L, ts("2024-01-01 10:00:05"), 99.5), // same-ts: inclusive match
      (1L, ts("2024-01-01 10:00:09"), 99.9),
      (3L, ts("2024-01-01 09:00:00"), 1.0)   // other key, never matches
    ).toDF("key", "ts", "bid")

    val got = AsofJoin.backward(trades, quotes, Seq("key"), "ts", "ts", Seq("bid"))
      .orderBy("key", "ts")
      .select("key", "price", "asof_bid")
      .as[(Long, Double, Option[Double])].collect().toSeq

    assert(got == Seq(
      (1L, 100.0, Some(99.5)),  // 10:00:05 quote matches inclusively
      (1L, 101.0, Some(99.9)),  // latest before 10:00:10
      (2L, 50.0, None)          // no quotes for key 2 -> null payload
    ))
  }

  test("left rows precede all right rows -> null; multiple rights collapse to latest") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "early"),
                (1L, ts("2024-01-01 12:00:00"), "late")).toDF("key", "ts", "tag")
    val r = Seq((1L, ts("2024-01-01 06:00:00"), 1),
                (1L, ts("2024-01-01 07:00:00"), 2),
                (1L, ts("2024-01-01 08:00:00"), 3)).toDF("key", "ts", "v")
    val got = AsofJoin.backward(l, r, Seq("key"))
      .orderBy("ts").select("tag", "asof_v")
      .as[(String, Option[Int])].collect().toSeq
    assert(got == Seq(("early", None), ("late", Some(3))))
  }

  test("forward as-of join picks earliest right row at-or-after left ts") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), "early"),
                (1L, ts("2024-01-01 06:00:00"), "same"),
                (1L, ts("2024-01-01 12:00:00"), "late")).toDF("key", "ts", "tag")
    val r = Seq((1L, ts("2024-01-01 06:00:00"), 1),
                (1L, ts("2024-01-01 07:00:00"), 2)).toDF("key", "ts", "v")
    val got = AsofJoin.forward(l, r, Seq("key"))
      .orderBy("ts").select("tag", "asof_v")
      .as[(String, Option[Int])].collect().toSeq
    assert(got == Seq(
      ("early", Some(1)), // earliest at-or-after 00:00
      ("same", Some(1)),  // equal ts: inclusive
      ("late", None)))    // nothing after 12:00
  }
}
