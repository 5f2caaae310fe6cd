package graft

import graft.store.BucketedStore
import org.apache.spark.sql.functions._

/** Bucketed-table co-location: the join on the bucket key must plan with NO
  * shuffle exchange (the write-once-shuffle, query-many-times contract).
  */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the same key plans without Exchange") {
    val store = new BucketedStore(spark)
    val ev = Tables(spark, sf(), "events")
      .select($"user_id", $"event_id", $"value")
    val users = Tables(spark, sf(), "events")
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    store.writeBucketed(ev, "ev_b", "user_id", buckets = 4)
    store.writeBucketed(users, "users_b", "user_id", buckets = 4)

    // disable auto-broadcast: at sf0.001 both sides fit a broadcast, which
    // would hide the property under test (at 100 TB neither side does —
    // bucket co-location is exactly the case broadcast can't cover)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = store.colocatedJoin("ev_b", "users_b", "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"expected shuffle-free plan, got:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"expected bucketed scans, got:\n$plan")

      // correctness: identical to the plain (shuffled) join
      val expect = ev.join(users, "user_id").count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("aggregation on the bucket key is also exchange-free") {
    val store = new BucketedStore(spark)
    // self-contained: write our own table rather than depending on the
    // join test having run first
    store.writeBucketed(
      Tables(spark, sf(), "events").select($"user_id", $"value"),
      "ev_agg_b", "user_id", buckets = 4)
    val agg = store.table("ev_agg_b").groupBy("user_id")
      .agg(sum($"value").as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), s"expected shuffle-free agg, got:\n$plan")
    assert(agg.count() > 0)
  }
}
