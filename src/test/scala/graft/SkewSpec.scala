package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals plain groupBy on a skewed distribution") {
    // 10k rows of hot key + scattered tail
    val df = spark.range(10000).select(lit("hot").as("k"), lit(2.0).as("v"))
      .union(spark.range(100).select(concat(lit("t"), $"id").as("k"), lit(1.0).as("v")))
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", buckets = 8)
      .orderBy("k").collect()
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .orderBy("k").collect()
    assert(salted.length == plain.length)
    salted.zip(plain).foreach { case (s, p) =>
      assert(s.getAs[String]("k") == p.getAs[String]("k"))
      assert(s.getAs[Long]("n") == p.getAs[Long]("n"))
      assert(math.abs(s.getAs[Double]("sum_v") - p.getAs[Double]("sum_v")) < 1e-9)
    }
  }

  test("saltedJoin equals plain join on skewed keys") {
    val big = spark.range(5000).select(
      when($"id" % 10 === 0, lit("hot")).otherwise(concat(lit("k"), $"id")).as("k"),
      $"id".as("v"))
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k7", "B")).toDF("k", "tag")
    val salted = Skew.saltedJoin(big, dim, Seq("k"), buckets = 4)
      .orderBy("v").select("k", "v", "tag").collect().toSeq
    val plain = big.join(dim, Seq("k"))
      .orderBy("v").select("k", "v", "tag").collect().toSeq
    assert(salted == plain)
  }
}
