package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming twin of [[graft.operators.Sessions.transitionMatrix]]: emit
  * the (from, to) event-type transition PAIRS of each user's stream live,
  * carrying exactly one `LastEvent` of state per user so transitions
  * bridge micro-batch boundaries. Downstream the pair stream aggregates
  * however the consumer likes (windowed counts, foreachBatch upsert into
  * the matrix) — the stateful part is only the pair derivation.
  *
  * Ordering contract: events are sorted by (ts, event_id) WITHIN a
  * micro-batch; across batches the per-user arrival order is trusted
  * (the ingest edge's ordering guarantee — same caveat class as the other
  * stream operators). A batch backfill should use the batch operator,
  * which orders globally.
  *
  * Scale notes: state is one small case class per user, partitioned by
  * key across executors; `ProcessingTimeTimeout` evicts users that went
  * quiet, bounding state on an unbounded id space.
  */
object TransitionMonitor {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  final case class LastEvent(ts: Long, event_id: Long, event_type: String)
  final case class Transition(user_id: Long, from_type: String, to_type: String)

  def transitions(
      events: Dataset[Ev],
      idleTimeoutMs: Option[Long] = Some(30 * 60 * 1000L)): Dataset[Transition] = {
    implicit val stateEnc = Encoders.product[LastEvent]
    implicit val outEnc = Encoders.product[Transition]
    val timeoutConf = idleTimeoutMs match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append, timeoutConf) {
        (uid: Long, batch: Iterator[Ev], state: GroupState[LastEvent]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            if (sorted.isEmpty) Iterator.empty
            else {
              val withPrev = state.getOption
                .map(l => Ev(uid, new Timestamp(l.ts), l.event_id, l.event_type))
                .toSeq ++ sorted
              val out = withPrev.sliding(2).collect {
                case Seq(a, b) => Transition(uid, a.event_type, b.event_type)
              }.toVector
              val last = withPrev.last
              state.update(LastEvent(last.ts.getTime, last.event_id, last.event_type))
              idleTimeoutMs.foreach(state.setTimeoutDuration)
              out.iterator
            }
          }
      }
  }
}
