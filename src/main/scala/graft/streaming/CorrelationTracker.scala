package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom arbitrary-state streaming operator: per-correlation-id request
  * tracking via `mapGroupsWithState` — the escape hatch for state shapes
  * the built-in windowed/session aggregates can't express (here: first/last
  * event time, event count, and whether the request ever logged an error,
  * updated incrementally and emitted per micro-batch).
  *
  * This is the streaming materialization of the reference's `context`-table
  * idea (one enrichment row per correlation id, reference: migration:45-50)
  * — but maintained by the engine from the stream itself.
  *
  * Scale notes: state lives in the state store partitioned by key across
  * executors; `ProcessingTimeTimeout` + `idleTimeoutMs` evicts ids that
  * stopped logging, bounding state size on an unbounded id space.
  */
object CorrelationTracker {

  final case class Event(correlation_id: String, time: Timestamp, message: String)

  final case class RequestState(
      first_time: Long, last_time: Long, n_events: Long, saw_error: Boolean)

  final case class RequestSummary(
      correlation_id: String, first_time: Timestamp, last_time: Timestamp,
      n_events: Long, duration_ms: Long, saw_error: Boolean)

  /** Wire onto a streaming Dataset[Event] grouped by correlation id.
    *
    * @param idleTimeoutMs Some(ms): evict state for ids idle that long
    *   (ProcessingTimeTimeout — note the engine then schedules periodic
    *   timeout-check batches, so `processAllAvailable` never fully settles;
    *   production queries don't care, but tests should pass None).
    *   None: state lives for the query lifetime.
    */
  def track(
      events: Dataset[Event],
      idleTimeoutMs: Option[Long] = Some(30 * 60 * 1000L)): Dataset[RequestSummary] = {
    implicit val stateEnc = Encoders.product[RequestState]
    implicit val outEnc = Encoders.product[RequestSummary]
    val timeoutConf = idleTimeoutMs match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    events
      .groupByKey(_.correlation_id)(Encoders.STRING)
      .mapGroupsWithState[RequestState, RequestSummary](timeoutConf) {
        (cid: String, batch: Iterator[Event], state: GroupState[RequestState]) =>
          val prev = state.getOption.getOrElse(
            RequestState(Long.MaxValue, Long.MinValue, 0L, saw_error = false))
          val next = batch.foldLeft(prev) { (s, e) =>
            val t = e.time.getTime
            RequestState(
              math.min(s.first_time, t), math.max(s.last_time, t),
              s.n_events + 1,
              s.saw_error || e.message.toLowerCase(java.util.Locale.ROOT).contains("error"))
          }
          if (state.hasTimedOut) state.remove()
          else {
            state.update(next)
            idleTimeoutMs.foreach(state.setTimeoutDuration)
          }
          RequestSummary(cid, new Timestamp(next.first_time), new Timestamp(next.last_time),
            next.n_events, next.last_time - next.first_time, next.saw_error)
      }
  }

  /** Same state logic in batch mode (backfill path): mapGroups over the
    * full history — identical output for identical input, no state store.
    */
  def trackBatch(events: Dataset[Event]): Dataset[RequestSummary] = {
    implicit val outEnc = Encoders.product[RequestSummary]
    events
      .groupByKey(_.correlation_id)(Encoders.STRING)
      .mapGroups { (cid, it) =>
        val evs = it.toSeq
        val times = evs.map(_.time.getTime)
        RequestSummary(cid,
          new Timestamp(times.min), new Timestamp(times.max),
          evs.size.toLong, times.max - times.min,
          evs.exists(_.message.toLowerCase(java.util.Locale.ROOT).contains("error")))
      }
  }
}
