package graft

import graft.store.LogStore
import graft.streaming.Rollup
import org.apache.spark.sql.functions._
import java.nio.file.Files

class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val store = new LogStore(Files.createTempDirectory("graft-rollup").toString)
    (store, new Rollup(store, "daily", Seq("date", "event_type"), "v"))
  }

  private def batch(rows: (String, String, Long)*) =
    rows.toDF("date", "event_type", "v")

  test("incremental updates equal a full batch recompute") {
    val (_, rollup) = fixture()
    val b0 = batch(("2024-01-01", "click", 2L), ("2024-01-01", "click", 3L),
      ("2024-01-01", "error", 5L))
    val b1 = batch(("2024-01-01", "click", 7L), ("2024-01-02", "view", 1L))
    rollup.update(b0, "w", 0L)
    rollup.update(b1, "w", 1L)

    val got = rollup.read(spark)
      .select("date", "event_type", "n", "sum_v")
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    val want = b0.union(b1).groupBy("date", "event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    assert(got == want)
  }

  test("a replayed epoch does not double-count") {
    val (_, rollup) = fixture()
    val b0 = batch(("2024-01-01", "click", 10L))
    rollup.update(b0, "w", 0L)
    rollup.update(b0, "w", 0L) // checkpoint replay of the same epoch
    val got = rollup.read(spark).select("n", "sum_v")
      .as[(Long, Long)].head()
    assert(got == ((1L, 10L)))
  }

  test("compaction of a closed date preserves the merged view") {
    val (store, rollup) = fixture()
    (0 until 5).foreach { e =>
      rollup.update(batch(("2024-01-01", "click", e.toLong)), "w", e.toLong)
    }
    val before = rollup.read(spark)
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    val (nBefore, nAfter, _) = store.compact(spark, "daily", "2024-01-01")
    assert(nBefore >= 5 && nAfter == 1)
    val after = rollup.read(spark)
      .as[(String, String, Long, Long)].collect().sorted.toSeq
    assert(after == before)
  }
}
