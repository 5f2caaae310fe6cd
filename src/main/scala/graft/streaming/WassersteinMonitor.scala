package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming 1-Wasserstein drift monitor — the live twin of
  * [[graft.operators.Quality.wassersteinDistance]] (paired with
  * [[KsMonitor]] the way the batch audits pair: KS flags the worst CDF
  * gap, W₁ prices the whole move): scored events count into
  * caller-supplied fixed bins per source, and at event-time window
  * rollover the transport distance between the window's binned sample
  * and the CALLER-SUPPLIED reference histogram is emitted, in BIN-INDEX
  * units. Cost above a caller ceiling trips the alarm.
  *
  * Parity on the quantized axis is term-for-term, not approximate: the
  * monitor walks the PRESENT bins (reference or window mass — exactly
  * the distinct values the batch operator would see on bin-quantized
  * samples), takes the same BigInt cross-mass numerator per gap, the
  * same floor(term·2²⁰) per-gap quantization, the same integer sum, and
  * the same floor-form display — so it EQUALS `Quality
  * .wassersteinDistance` run on the bin indices (spec-pinned).
  * Calibration (cuts + reference histogram) stays the batch side's job,
  * the X214–X227 division.
  *
  * State is O(sources × bins) counters — never events.
  */
object WassersteinMonitor extends Serializable {

  final case class Scored(source: String, ts: Timestamp, value: Double)

  final case class HistState(win: Long, counts: Seq[Long], cumCounts: Seq[Long])

  final case class WinRow(
      source: String, window_start: Long, n_events: Long,
      w1: Double, cum_w1: Double, alarm: Boolean)

  def monitor(
      events: Dataset[Scored],
      cuts: Seq[Double],
      refCounts: Seq[Long],
      w1Ceiling: Double,
      windowMs: Long = 3600000L): Dataset[WinRow] = {
    val bins = refCounts.length
    require(bins > 1 && cuts.length == bins - 1,
      "need B >= 2 reference bins and B-1 cutpoints")
    require(cuts.zip(cuts.tail).forall { case (a, b) => a <= b },
      "cutpoints must be non-decreasing")
    require(refCounts.forall(_ >= 0) && refCounts.sum > 0,
      "reference histogram must be non-negative with positive mass")
    require(w1Ceiling > 0 && windowMs > 0, "positive ceiling and window")
    val cutsArr = cuts.toArray
    val nRef: Long = refCounts.sum
    // the batch operator's per-gap walk on the quantized axis: distinct
    // values = bins where EITHER side has mass; gap = index distance;
    // floor(term*2^20) integers sum exactly as the batch sum does
    def w1Of(counts: Seq[Long]): Double = {
      val nCur = counts.sum
      var s2 = 0L
      var prev = -1
      var cumR = 0L
      var cumC = 0L
      var prevNum = BigInt(0)
      var b = 0
      while (b < bins) {
        if (refCounts(b) + counts(b) > 0) {
          if (prev >= 0) {
            val term = prevNum.toDouble * (b - prev).toDouble /
              (nRef.toDouble * nCur.toDouble) * 1048576
            s2 += math.floor(term).toLong
          }
          cumR += refCounts(b)
          cumC += counts(b)
          prevNum = (BigInt(cumR) * nCur - BigInt(cumC) * nRef).abs
          prev = b
        }
        b += 1
      }
      math.floor(s2.toDouble / 1048576 * 10000 + 0.5) / 10000
    }
    implicit val stateEnc = Encoders.product[HistState]
    implicit val outEnc = Encoders.product[WinRow]
    events
      .groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState[HistState, WinRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[Scored], state: GroupState[HistState]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          if (sorted.isEmpty) Iterator.empty
          else {
            val zero = Vector.fill(bins)(0L)
            var st = state.getOption.getOrElse(
              HistState(sorted.head.ts.getTime / windowMs, zero, zero))
            val out = scala.collection.mutable.ArrayBuffer.empty[WinRow]
            def close(s: HistState): Unit = {
              val n = s.counts.sum
              if (n > 0) {
                val d = w1Of(s.counts)
                out += WinRow(src, s.win * windowMs, n, d, w1Of(s.cumCounts),
                  d > w1Ceiling)
              }
            }
            sorted.foreach { e =>
              val w = e.ts.getTime / windowMs
              // an out-of-order event across micro-batches (w < st.win) CLAMPS into
              // the current window: a close-and-reopen here would emit duplicate
              // window_start rows and split one window's counts across two emissions
              if (w > st.win) {
                close(st)
                st = HistState(w, zero, st.cumCounts)
              }
              val b = ScoreDriftMonitor.binOf(e.value, cutsArr)
              st = st.copy(
                counts = st.counts.updated(b, st.counts(b) + 1L),
                cumCounts = st.cumCounts.updated(b, st.cumCounts(b) + 1L))
            }
            state.update(st)
            out.iterator
          }
      }
  }
}
