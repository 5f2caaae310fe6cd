package graft

import graft.streaming.{PushSocketMicroBatchStream, PushSocketSource, CountOffset}
import org.scalatest.funsuite.AnyFunSuite

/** The source-side micro-batcher: pending frames become visible to the
  * engine when flushSize are buffered OR the oldest pending frame ages out
  * — the reference's dual flush condition (venus/db/write.py:24-28,58-59),
  * moved into `latestOffset` so an as-available trigger fires on SIZE
  * under load instead of idling out a wall-clock cadence (the r7→r9
  * ingest-throughput regression).
  */
class IngestFlushGateSpec extends AnyFunSuite {

  private def offset(s: PushSocketMicroBatchStream): Long =
    s.latestOffset().asInstanceOf[CountOffset].n

  private def sendAndSettle(port: Int, frames: Seq[String]): Unit = {
    PushSocketSource.send("localhost", port, frames)
    // admit happens on the acceptor's connection thread; wait for drain
    Thread.sleep(200)
  }

  test("size half: sub-size pending stays invisible, size-th frame exposes all") {
    val s = new PushSocketMicroBatchStream(0, "gate-size", 1000,
      flushSize = 5, flushAgeMs = 60000L)
    try {
      val port = PushSocketSource.boundPort("gate-size").get
      sendAndSettle(port, (1 to 3).map(i => s"r$i"))
      assert(offset(s) == 0L, "3 pending < flushSize must not expose")
      sendAndSettle(port, (4 to 5).map(i => s"r$i"))
      assert(offset(s) == 5L, "reaching flushSize exposes the whole backlog")
    } finally s.stop()
  }

  test("age half: a sub-size trickle exposes once the oldest frame ages out") {
    val s = new PushSocketMicroBatchStream(0, "gate-age", 1000,
      flushSize = 100, flushAgeMs = 400L)
    try {
      val port = PushSocketSource.boundPort("gate-age").get
      sendAndSettle(port, Seq("only-one"))
      assert(offset(s) == 0L, "fresh sub-size pending must wait")
      Thread.sleep(500)
      assert(offset(s) == 1L, "aged-out pending must flush")
    } finally s.stop()
  }

  test("prepareForTriggerAvailableNow bypasses the gate (catch-up drains the tail)") {
    // flushSize far above the send + an hour-long age: without the bypass
    // these frames stay invisible and an AvailableNow catch-up run would
    // snapshot the old offset and terminate having ingested nothing
    val s = new PushSocketMicroBatchStream(0, "gate-drain", 1000,
      flushSize = 1000, flushAgeMs = 3600000L)
    try {
      val port = PushSocketSource.boundPort("gate-drain").get
      sendAndSettle(port, (1 to 5).map(i => s"r$i"))
      assert(offset(s) == 0L, "fresh sub-size pending is gate-held")
      s.prepareForTriggerAvailableNow()
      assert(offset(s) == 5L,
        "AvailableNow preparation must expose the whole backlog")
      // frames arriving DURING the catch-up run must not extend it: the
      // prepare-time snapshot caps exposure, or a drain with live
      // producers never terminates (SupportsTriggerAvailableNow contract)
      sendAndSettle(port, Seq("late-1", "late-2"))
      assert(offset(s) == 5L,
        "post-prepare arrivals stay invisible to the AvailableNow run")
    } finally s.stop()
  }

  test("exposure is monotone across commit trims") {
    val s = new PushSocketMicroBatchStream(0, "gate-commit", 1000,
      flushSize = 2, flushAgeMs = 60000L)
    try {
      val port = PushSocketSource.boundPort("gate-commit").get
      sendAndSettle(port, Seq("a", "b"))
      assert(offset(s) == 2L)
      s.commit(CountOffset(2L))
      assert(offset(s) == 2L, "committed offset stays exposed")
      sendAndSettle(port, Seq("c"))
      assert(offset(s) == 2L, "new sub-size pending waits again")
      sendAndSettle(port, Seq("d"))
      assert(offset(s) == 4L)
    } finally s.stop()
  }
}
