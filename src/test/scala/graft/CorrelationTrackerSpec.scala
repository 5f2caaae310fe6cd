package graft

import graft.streaming.CorrelationTracker
import graft.streaming.CorrelationTracker.{Event, RequestSummary}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class CorrelationTrackerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming: state accumulates across micro-batches per correlation id") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = CorrelationTracker.track(stream.toDS(), idleTimeoutMs = None)
      .writeStream.format("memory").queryName("tracked")
      .outputMode("update").start()
    try {
      stream.addData(
        Event("c1", ts("2024-01-01 10:00:00"), "start"),
        Event("c1", ts("2024-01-01 10:00:05"), "working"))
      q.processAllAvailable()
      stream.addData(
        Event("c1", ts("2024-01-01 10:00:09"), "ERROR: boom"),
        Event("c2", ts("2024-01-01 10:00:00"), "start"))
      q.processAllAvailable()
      // update mode: latest row per cid is the accumulated state
      val rows = spark.table("tracked").as[RequestSummary].collect()
        .groupBy(_.correlation_id).map { case (k, v) => k -> v.maxBy(_.n_events) }
      assert(rows("c1").n_events == 3)          // state carried across batches
      assert(rows("c1").saw_error)
      assert(rows("c1").duration_ms == 9000)
      assert(rows("c2").n_events == 1 && !rows("c2").saw_error)
    } finally q.stop()
  }

  test("batch backfill produces the same summaries") {
    val events = Seq(
      Event("c1", ts("2024-01-01 10:00:00"), "start"),
      Event("c1", ts("2024-01-01 10:00:09"), "ERROR: boom"),
      Event("c2", ts("2024-01-01 10:00:00"), "ok")).toDS()
    val got = CorrelationTracker.trackBatch(events).collect()
      .map(s => s.correlation_id -> ((s.n_events, s.duration_ms, s.saw_error))).toMap
    assert(got("c1") == ((2L, 9000L, true)))
    assert(got("c2") == ((1L, 0L, false)))
  }
}
