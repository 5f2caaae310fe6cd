package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval matches exactly the qualifying pairs, once each") {
    val points = Seq((1L, 0L), (2L, 5L), (3L, 10L), (4L, 99L))
      .toDF("pid", "t")
    val intervals = Seq(
      (10L, 4L, 6L),    // catches t=5
      (11L, 0L, 50L),   // spans many bins: catches 0, 5, 10
      (12L, 7L, 9L),    // catches nothing
      (13L, 8L, 2L)     // inverted: dropped
    ).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", binWidth = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
    // exactly once per qualifying pair, even though interval 11 spans 13 bins
    assert(got.sorted == Seq((1L, 11L), (2L, 10L), (2L, 11L), (3L, 11L)))
    assert(got.distinct.length == got.length)
  }

  test("agrees with the nested-loop join on real data") {
    val epoch = lit("1970-01-01").cast("date")
    val li = Tables(spark, sf(), "lineitem")
      .select(datediff(col("l_shipdate"), epoch).cast("long").as("ship_day"))
    val win = Tables(spark, sf(), "orders")
      .filter(pmod(col("o_orderkey"), lit(500)) === 0)
      .select(col("o_orderkey").as("window_id"),
        datediff(col("o_orderdate"), epoch).cast("long").as("s"))
      .withColumn("e", col("s") + 7)
    val binned = RangeJoin.pointInInterval(li, win, "ship_day", "s", "e", binWidth = 8)
      .groupBy("window_id").count()
      .as[(Long, Long)].collect().toMap
    val brute = li.crossJoin(win)
      .filter(col("ship_day").between(col("s"), col("e")))
      .groupBy("window_id").count()
      .as[(Long, Long)].collect().toMap
    assert(binned == brute)
  }

  test("intervalOverlap: exactly-once pairs, edge touches, multi-cell spans") {
    val a = Seq(
      (1L, 0L, 10L),    // spans cells 0-2 at width 4
      (2L, 12L, 12L),   // degenerate single-point interval
      (3L, 100L, 90L)   // inverted -> dropped
    ).toDF("a_id", "a_s", "a_e")
    val b = Seq(
      (10L, 8L, 30L),   // overlaps 1 ([8,10]) and 2 ([12,12]); spans 7 cells
      (11L, 11L, 11L),  // gap between 1 and 2 -> no overlap
      (12L, -5L, 0L)    // touches 1 at exactly 0
    ).toDF("b_id", "b_s", "b_e")
    val got = RangeJoin.intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e", binWidth = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got.sorted == Seq((1L, 10L), (1L, 12L), (2L, 10L)))
    assert(got.distinct.length == got.length) // canonical-cell claim: no dups
  }

  test("intervalOverlap agrees with the nested-loop join on real data") {
    val epoch = lit("1970-01-01").cast("date")
    val a = Tables(spark, sf(), "orders")
      .filter(pmod(col("o_orderkey"), lit(200)) === 0)
      .select(col("o_orderkey").as("a_id"),
        datediff(col("o_orderdate"), epoch).cast("long").as("a_s"))
      .withColumn("a_e", col("a_s") + 14)
    val b = Tables(spark, sf(), "lineitem")
      .filter(pmod(col("l_orderkey"), lit(150)) === 0)
      .select(col("l_orderkey").as("b_id"), col("l_linenumber").as("b_ln"),
        datediff(col("l_shipdate"), epoch).cast("long").as("b_s"))
      .withColumn("b_e", col("b_s") + pmod(col("b_ln"), lit(5)) * 7) // 0-28 day spans
    val binned = RangeJoin
      .intervalOverlap(a, b, "a_s", "a_e", "b_s", "b_e", binWidth = 16)
      .groupBy("a_id").count().as[(Long, Long)].collect().toMap
    val brute = a.crossJoin(b)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .groupBy("a_id").count().as[(Long, Long)].collect().toMap
    assert(binned == brute && binned.nonEmpty)
  }
}
