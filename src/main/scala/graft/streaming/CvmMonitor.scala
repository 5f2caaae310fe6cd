package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming two-sample Cramér–von Mises monitor — the live twin of
  * [[graft.operators.Quality.cramerVonMises]] and the L2 companion to
  * [[KsMonitor]] on the SAME state: KS trips on one bad gap anywhere
  * (a single spiked bin), CvM integrates the SQUARED gap across the
  * whole axis, so it trips on sustained low-grade separation a spike
  * test discounts — the "everything shifted a little" drift mode. Same
  * contract: scored events per source count into caller-supplied fixed
  * bins; a window rollover emits the criterion between the window's
  * binned sample and the caller-supplied reference histogram, in basis
  * points, with the alarm above a caller ceiling.
  *
  * Arithmetic parity, not approximation: on the bin indices this IS the
  * batch operator — per pooled bin the CDF-gap numerator
  * |cumRef_b·n_cur − cumCur_b·n_ref| forms in BigInt, the per-class
  * term h_b·(dnum/(n_ref·n_cur))² floors to ⌊term·2³⁰⌋ grains and sums
  * as a Long (the batch operator's order-free-integer discipline,
  * replayed sequentially here), and T renders as the same
  * ⌊T·10⁴ + 0.5⌋ basis points — spec-pinned term-for-term against
  * `Quality.cramerVonMises` on the bin indices. Bin edges and the
  * reference histogram are the batch side's job (the X214–X227
  * division: batch calibrates, stream monitors).
  *
  * State is O(sources × bins) counters — never events.
  */
object CvmMonitor extends Serializable {

  final case class Scored(source: String, ts: Timestamp, value: Double)

  final case class HistState(win: Long, counts: Seq[Long], cumCounts: Seq[Long])

  final case class WinRow(
      source: String, window_start: Long, n_events: Long,
      cvm_bp: Long, cum_cvm_bp: Long, alarm: Boolean)

  def monitor(
      events: Dataset[Scored],
      cuts: Seq[Double],
      refCounts: Seq[Long],
      cvmCeilingBp: Long,
      windowMs: Long = 3600000L): Dataset[WinRow] = {
    val bins = refCounts.length
    require(bins > 1 && cuts.length == bins - 1,
      "need B >= 2 reference bins and B-1 cutpoints")
    require(cuts.zip(cuts.tail).forall { case (a, b) => a <= b },
      "cutpoints must be non-decreasing")
    require(refCounts.forall(_ >= 0) && refCounts.sum > 0,
      "reference histogram must be non-negative with positive mass")
    require(cvmCeilingBp > 0 && windowMs > 0, "positive ceiling and window")
    val cutsArr = cuts.toArray
    val nRef: Long = refCounts.sum
    val cumRef: Array[Long] = refCounts.scanLeft(0L)(_ + _).tail.toArray
    val refArr: Array[Long] = refCounts.toArray
    // the batch criterion on a window histogram: integer cross-masses per
    // pooled bin class, the per-class floor(term*2^30) grains, ONE final
    // scale — Quality.cramerVonMises on the bin indices, sequentially
    def cvmBpOf(counts: Seq[Long]): Long = {
      val nCur = counts.sum
      var cumCur = 0L
      var s = 0L
      var b = 0
      while (b < bins) {
        cumCur += counts(b)
        val dnum = (BigInt(cumRef(b)) * nCur - BigInt(cumCur) * nRef).abs
        val gap = dnum.toDouble / (nRef.toDouble * nCur.toDouble)
        val h = (refArr(b) + counts(b)).toDouble
        s += math.floor(h * gap * gap * 1073741824.0).toLong
        b += 1
      }
      val nn = nRef.toDouble + nCur.toDouble
      val t = s.toDouble / 1073741824.0 *
        (nRef.toDouble * nCur.toDouble) / (nn * nn)
      math.floor(t * 10000 + 0.5).toLong
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
                val bp = cvmBpOf(s.counts)
                out += WinRow(src, s.win * windowMs, n, bp,
                  cvmBpOf(s.cumCounts), bp > cvmCeilingBp)
              }
            }
            sorted.foreach { e =>
              val w = e.ts.getTime / windowMs
              // out-of-order across micro-batches CLAMPS into the current
              // window (the KsMonitor/SprtMonitor r14-advisor discipline)
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
