package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Input: one error event on a correlation stream. */
case class ErrorEvent(correlationId: String, eventUs: Long)

/** Emitted when a key sees `threshold`+ errors inside `windowUs`. */
case class BurstAlert(
    correlationId: String,
    nErrors: Int,
    windowStartUs: Long,
    windowEndUs: Long)

/** Sliding-window burst state: recent error event-times for one key. */
case class BurstTimes(us: Seq[Long])

/** Error-burst alerting over the ingest stream — "page me when one request
  * id logs N errors within T" — built on `transformWithState`, Spark 4's
  * arbitrary-state API (the successor to the `mapGroupsWithState` used by
  * [[CorrelationTracker]]; requires the RocksDB state store provider).
  *
  * Per key the state is the recent error event-times, trimmed to the
  * sliding window of the latest event and hard-capped at `threshold * 4`
  * entries, so state per key is O(threshold) regardless of input rate.
  * Each batch is merged with prior state and scanned with two pointers,
  * evaluating the sliding window at EVERY event (not only the latest —
  * a burst fully contained in one micro-batch followed by a straggler
  * still alerts). On reaching `threshold` the processor emits one alert
  * and re-arms on the events after the alert position — re-arming the
  * detector instead of re-alerting on every subsequent error of the
  * same burst.
  *
  * Scale: state lives in the executor-local RocksDB store partitioned by
  * key — the hot path never shuffles more than the (key, time) pairs, and
  * alert volume is bounded by bursts, not events.
  */
class BurstProcessor(threshold: Int, windowUs: Long)
    extends StatefulProcessor[String, ErrorEvent, BurstAlert] {

  @transient private var recent: ValueState[BurstTimes] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    recent = getHandle.getValueState[BurstTimes](
      "recent", Encoders.product[BurstTimes], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[ErrorEvent],
      timerValues: TimerValues): Iterator[BurstAlert] = {
    val prior = if (recent.exists()) recent.get().us else Seq.empty[Long]
    val all = (prior ++ rows.map(_.eventUs)).sorted.toIndexedSeq
    val alerts = Seq.newBuilder[BurstAlert]
    var left = 0 // start of the window ending at event j
    var armed = 0 // first event of the current armed segment (post-alert)
    var j = 0
    while (j < all.length) {
      if (left < armed) left = armed
      while (all(left) < all(j) - windowUs) left += 1
      if (j - left + 1 >= threshold) {
        alerts += BurstAlert(key, j - left + 1, all(left), all(j))
        armed = j + 1 // re-arm: later events start a fresh window
      }
      j += 1
    }
    val rem = all.drop(armed)
    val inWindow =
      if (rem.isEmpty) rem
      else rem.dropWhile(_ < rem.last - windowUs).takeRight(threshold * 4)
    if (inWindow.isEmpty) recent.clear()
    else recent.update(BurstTimes(inWindow))
    alerts.result().iterator
  }
}

object BurstDetector {

  /** Wire the processor onto a stream of (correlation_id, event-time-us)
    * error events. Output: append-mode alert stream.
    */
  def alerts(
      errors: Dataset[ErrorEvent],
      threshold: Int = 3,
      windowSeconds: Long = 300L): Dataset[BurstAlert] = {
    import errors.sparkSession.implicits._
    errors
      .groupByKey(_.correlationId)
      .transformWithState(
        new BurstProcessor(threshold, windowSeconds * 1000000L),
        TimeMode.None(),
        OutputMode.Append(),
        Encoders.product[BurstAlert])
  }
}
