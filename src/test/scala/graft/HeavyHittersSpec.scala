package graft

import graft.functions.HeavyHitters
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Misra-Gries sketch aggregate: exactness when keys fit in k, the
  * n/(k+1) error bound under eviction, distributed-merge correctness, and
  * the SQL registration path.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, col0: String, k: Int): Map[String, Long] =
    df.agg(HeavyHitters.heavy_hitters(col(col0), k).as("hh"))
      .select(explode($"hh").as("e")).select($"e.key", $"e.est_count")
      .as[(String, Long)].collect().toMap

  test("exact when distinct keys <= k, across many partitions") {
    val df = spark.range(0, 10000, 1, 16) // 16 partitions -> real merges
      .select((col("id") % 5).cast("string").as("key"))
    val got = sketch(df, "key", 8)
    assert(got == Map("0" -> 2000L, "1" -> 2000L, "2" -> 2000L, "3" -> 2000L, "4" -> 2000L))
  }

  test("eviction regime: every estimate within n/(k+1) of the true count") {
    // zipfish: key i appears ~ 2^(10-i) times, 40 distinct keys, k=8
    val rows = (0 until 40).flatMap(i => Seq.fill(math.max(1, 1 << math.max(0, 10 - i)))(s"k$i"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("key")
    val n = rows.size
    val k = 8
    val truth = rows.groupBy(identity).map { case (x, xs) => x -> xs.size.toLong }
    val got = sketch(df, "key", k)
    assert(got.size <= k)
    got.foreach { case (key, est) =>
      assert(est <= truth(key), s"$key overcounted: $est > ${truth(key)}")
      assert(truth(key) - est <= n / (k + 1) + 1,
        s"$key undercount ${truth(key) - est} beyond bound ${n / (k + 1)}")
    }
    // the dominant key must be retained
    assert(got.contains("k0"))
  }

  test("non-string input fails at analysis, not mid-job") {
    GraftSqlFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT misra_gries(id, 4) FROM range(10)").collect()
    }
    assert(e.getMessage.contains("misra_gries requires a STRING key column"),
      e.getMessage)
  }

  test("misra_gries is callable from SQL") {
    GraftSqlFunctions.register(spark)
    val r = spark.sql(
      "SELECT misra_gries(key, 4) AS hh FROM VALUES ('a'),('a'),('b') AS t(key)")
      .head().getSeq[Row](0)
    assert(r.map(x => (x.getString(0), x.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
  }
}
