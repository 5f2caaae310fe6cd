package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming two-sample Kolmogorov-Smirnov monitor — the live twin of
  * [[graft.operators.Quality.ksTest]] (the r13 batch audit shipped
  * without one): scored events arriving per source count into
  * caller-supplied fixed bins, and when an event-time window rolls over
  * the KS distance between the window's binned sample and the
  * CALLER-SUPPLIED reference histogram is emitted — "how far apart are
  * the CDFs anywhere, JUST NOW?", where the batch operator answers it
  * between snapshots. Distance above a caller ceiling trips the alarm
  * (KS D is in [0, 1]; 0.1 is a common drift tripwire).
  *
  * A live monitor cannot keep the batch operator's exact per-value CDFs
  * (state would grow with distinct values), so it monitors the
  * BIN-QUANTIZED distributions — and on those it is arithmetic parity,
  * not approximation: the supremum is the integer cross-mass max
  * |cumRef_b·n_cur − cumCur_b·n_ref| over bin boundaries (BigInt, the
  * CalibrationMonitor discipline), divided once and floor-rounded to 4
  * digits exactly like the batch ks_d — so the monitor equals
  * `Quality.ksTest` run on the bin indices (spec-pinned term-for-term).
  * Bin edges AND the reference histogram are the batch side's job to
  * produce (percentileValues cuts + one binned count — the X214–X227
  * division: batch calibrates, stream monitors).
  *
  * State is O(sources × bins) counters — never events; the cumulative
  * distance rides the same mergeable histogram.
  */
object KsMonitor extends Serializable {

  final case class Scored(source: String, ts: Timestamp, value: Double)

  final case class HistState(win: Long, counts: Seq[Long], cumCounts: Seq[Long])

  final case class WinRow(
      source: String, window_start: Long, n_events: Long,
      ks_d: Double, cum_ks_d: Double, alarm: Boolean)

  def monitor(
      events: Dataset[Scored],
      cuts: Seq[Double],
      refCounts: Seq[Long],
      ksCeiling: Double,
      windowMs: Long = 3600000L): Dataset[WinRow] = {
    val bins = refCounts.length
    require(bins > 1 && cuts.length == bins - 1,
      "need B >= 2 reference bins and B-1 cutpoints")
    require(cuts.zip(cuts.tail).forall { case (a, b) => a <= b },
      "cutpoints must be non-decreasing")
    require(refCounts.forall(_ >= 0) && refCounts.sum > 0,
      "reference histogram must be non-negative with positive mass")
    require(ksCeiling > 0 && windowMs > 0, "positive ceiling and window")
    val cutsArr = cuts.toArray
    // reference cumulative masses, precomputed once on the driver
    val nRef: Long = refCounts.sum
    val cumRef: Array[Long] = refCounts.scanLeft(0L)(_ + _).tail.toArray
    // the batch supremum on a window histogram: integer cross-masses at
    // every bin boundary (a superset of ksTest's distinct-value axis —
    // boundaries absent from both samples repeat the previous cumulative
    // pair and never move the max), ONE division, the batch ks_d
    // floor-form display rounding
    def ksOf(counts: Seq[Long]): Double = {
      val nCur = counts.sum
      var cum = 0L
      var best = BigInt(0)
      var b = 0
      while (b < bins) {
        cum += counts(b)
        val num = (BigInt(cumRef(b)) * nCur - BigInt(cum) * nRef).abs
        if (num > best) best = num
        b += 1
      }
      val d = best.toDouble / (nRef.toDouble * nCur.toDouble)
      math.floor(d * 10000 + 0.5) / 10000
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
                val d = ksOf(s.counts)
                out += WinRow(src, s.win * windowMs, n, d, ksOf(s.cumCounts),
                  d > ksCeiling)
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
