package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Per-key token-bucket rate limiting on a live stream — the classical
  * ingestion-edge admission control (token bucket: capacity `burst`,
  * refill `ratePerSec`; an event is admitted if a whole token is
  * available). Emits EVERY event with an `admitted` verdict, so the
  * consumer chooses drop vs dead-letter vs tag — the limiter never
  * silently loses data.
  *
  * Refill uses EVENT time (deterministic under replay — reprocessing the
  * same stream yields the same verdicts; processing-time refill would
  * not), with events ordered by (ts, event_id) within a micro-batch and
  * per-key arrival order trusted across batches (the ingest edge's
  * guarantee, as with [[TransitionMonitor]]).
  *
  * Scale notes: state is one (tokens, lastMs) pair per key, partitioned
  * across executors; ProcessingTimeTimeout evicts idle keys — an idle
  * key's bucket would have refilled to `burst` anyway, so eviction
  * changes no verdict.
  */
object RateLimiter {

  final case class Ev(key: Long, ts: Timestamp, event_id: Long)
  final case class Bucket(tokens: Double, lastMs: Long)
  final case class Verdict(key: Long, event_id: Long, admitted: Boolean)

  def rateLimit(
      events: Dataset[Ev],
      ratePerSec: Double,
      burst: Double,
      idleTimeoutMs: Option[Long] = Some(30 * 60 * 1000L)): Dataset[Verdict] = {
    require(ratePerSec > 0 && burst >= 1.0, "positive rate, burst >= 1")
    implicit val stateEnc = Encoders.product[Bucket]
    implicit val outEnc = Encoders.product[Verdict]
    val timeoutConf = idleTimeoutMs match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    events
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[Bucket, Verdict](
        OutputMode.Append, timeoutConf) {
        (key: Long, batch: Iterator[Ev], state: GroupState[Bucket]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var b = state.getOption.getOrElse(Bucket(burst, Long.MinValue))
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            if (sorted.isEmpty) Iterator.empty
            else {
              val out = sorted.map { e =>
                val t = e.ts.getTime
                val dt =
                  if (b.lastMs == Long.MinValue) 0.0
                  else math.max(0L, t - b.lastMs).toDouble / 1000.0
                val refilled = math.min(burst, b.tokens + dt * ratePerSec)
                val admit = refilled >= 1.0
                b = Bucket(if (admit) refilled - 1.0 else refilled, t)
                Verdict(key, e.event_id, admit)
              }
              state.update(b)
              idleTimeoutMs.foreach(state.setTimeoutDuration)
              out.iterator
            }
          }
      }
  }
}
