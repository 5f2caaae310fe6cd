package graft

import graft.operators.Sessions
import graft.streaming.TransitionMonitor
import graft.streaming.TransitionMonitor.{Ev, Transition}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming transition pairs: state bridges micro-batches (the last event
  * of batch N pairs with the first of batch N+1), within-batch ordering is
  * (ts, event_id), and the collected pair stream agrees with the batch
  * transition matrix over the same events.
  */
class TransitionMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("streaming: transitions bridge micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = TransitionMonitor.transitions(stream.toDS(), idleTimeoutMs = None)
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      stream.addData(
        Ev(1L, ts(10), 1L, "a"), Ev(1L, ts(20), 2L, "b"),
        Ev(2L, ts(5), 3L, "x"))
      q.processAllAvailable()
      stream.addData(
        Ev(1L, ts(30), 4L, "c"), // pairs with the carried "b"
        Ev(2L, ts(6), 5L, "y"))
      q.processAllAvailable()
      val got = spark.table("trans").as[Transition].collect()
        .map(t => (t.user_id, t.from_type, t.to_type)).toSet
      assert(got == Set((1L, "a", "b"), (1L, "b", "c"), (2L, "x", "y")))
    } finally q.stop()
  }

  test("within-batch ordering is (ts, event_id), not arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = TransitionMonitor.transitions(stream.toDS(), idleTimeoutMs = None)
      .writeStream.format("memory").queryName("trans2")
      .outputMode("append").start()
    try {
      // delivered out of order; same ts ties break on event_id
      stream.addData(
        Ev(1L, ts(20), 7L, "late"), Ev(1L, ts(10), 2L, "b"), Ev(1L, ts(10), 1L, "a"))
      q.processAllAvailable()
      val got = spark.table("trans2").as[Transition].collect()
        .map(t => (t.from_type, t.to_type)).toSet
      assert(got == Set(("a", "b"), ("b", "late")))
    } finally q.stop()
  }

  test("collected pair stream agrees with the batch transition matrix") {
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      Ev(1L, ts(10), 1L, "a"), Ev(1L, ts(20), 2L, "b"), Ev(1L, ts(30), 3L, "a"),
      Ev(2L, ts(10), 4L, "b"), Ev(2L, ts(15), 5L, "b"))
    val stream = MemoryStream[Ev]
    val q = TransitionMonitor.transitions(stream.toDS(), idleTimeoutMs = None)
      .writeStream.format("memory").queryName("trans3")
      .outputMode("append").start()
    try {
      stream.addData(evs: _*)
      q.processAllAvailable()
      val streamed = spark.table("trans3").as[Transition].collect()
        .groupBy(t => (t.from_type, t.to_type)).view.mapValues(_.length.toLong).toMap
      val batch = Sessions.transitionMatrix(
        evs.toDF()).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch)
    } finally q.stop()
  }
}
