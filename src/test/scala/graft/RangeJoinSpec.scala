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
}
