package graft

import graft.streaming.RateLimiter
import graft.streaming.RateLimiter.{Ev, Verdict}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Token-bucket rate limiting: burst admission, event-time refill, bucket
  * state across micro-batches, and per-key independence.
  */
class RateLimiterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  private def run(rate: Double, burst: Double)(batches: Seq[Ev]*): Map[Long, Boolean] = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val name = s"rl${System.nanoTime()}"
    val q = RateLimiter.rateLimit(stream.toDS(), rate, burst, idleTimeoutMs = None)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Verdict].collect()
        .map(v => v.event_id -> v.admitted).toMap
    } finally q.stop()
  }

  test("burst admits, then the bucket drains and refills on event time") {
    val got = run(1.0, 2.0)(Seq(
      Ev(1L, ts(0), 1L),     // tokens 2 -> admit -> 1
      Ev(1L, ts(100), 2L),   // +0.1 -> 1.1 -> admit -> 0.1
      Ev(1L, ts(200), 3L),   // +0.1 -> 0.2 -> DROP
      Ev(1L, ts(5200), 4L))) // +5s -> capped at 2 -> admit
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true))
  }

  test("bucket state persists across micro-batches") {
    val got = run(1.0, 1.0)(
      Seq(Ev(1L, ts(0), 1L)),          // admit, bucket empty
      Seq(Ev(1L, ts(100), 2L)),        // 0.1 tokens -> drop
      Seq(Ev(1L, ts(1200), 3L)))       // refilled past 1 -> admit
    assert(got == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("keys are limited independently") {
    val got = run(1.0, 1.0)(Seq(
      Ev(1L, ts(0), 1L), Ev(2L, ts(0), 2L),
      Ev(1L, ts(10), 3L), Ev(2L, ts(10), 4L)))
    assert(got(1L) && got(2L))
    assert(!got(3L) && !got(4L))
  }

  test("verdicts cover every event — nothing silently dropped") {
    val evs = (1L to 20L).map(i => Ev(1L, ts(i * 50), i))
    val got = run(2.0, 3.0)(evs)
    assert(got.size == 20)
    assert(got.values.exists(identity) && got.values.exists(!_))
  }
}
