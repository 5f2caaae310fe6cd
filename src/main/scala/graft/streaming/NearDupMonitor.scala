package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One document arrival on the ingest edge (simhash precomputed map-side). */
case class DocArrival(docId: Long, simhash: Long, eventUs: Long)

/** Emitted when an arriving doc is within Hamming `k` of an earlier one. */
case class NearDupAlert(docId: Long, matchedDocId: Long, hamming: Int)

private[streaming] case class BucketEntry(docId: Long, sim: Long, us: Long)
private[streaming] case class BucketState(entries: Seq[BucketEntry])

/** Streaming near-duplicate monitor — the in-flight twin of
  * [[graft.operators.Dedup.simhashNearDup]]: flag arriving documents whose
  * simhash is within Hamming distance k of an already-ingested document,
  * BEFORE they land in the corpus ("don't ingest what you already have").
  *
  * Same pigeonhole LSH as the batch operator: each doc registers in its
  * `segments` simhash-segment buckets; two docs within distance k share at
  * least one whole segment, so the per-bucket comparison is a lossless
  * candidate check. State is per-bucket in the executor-local RocksDB
  * store: a bounded FIFO of (docId, simhash, eventUs), capped at
  * `maxBucket` entries (oldest evicted) — O(maxBucket) per bucket
  * regardless of stream length, the same bounded-state discipline as
  * [[BurstProcessor]].
  *
  * Alert semantics: "earlier" is (eventUs, docId) order, so within-batch
  * pairs alert deterministically. A pair sharing several segments can
  * alert once per shared bucket — alerts are at-least-once per pair
  * (downstream `dropDuplicates` tightens if needed); an eviction from a
  * full bucket can miss a very-stale pair — the monitor is a freshness
  * filter, the batch operator remains the exhaustive pass.
  */
class NearDupProcessor(k: Int, maxBucket: Int)
    extends StatefulProcessor[String, DocArrival, NearDupAlert] {

  @transient private var bucket: ValueState[BucketState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bucket = getHandle.getValueState[BucketState](
      "bucket", Encoders.product[BucketState], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[DocArrival],
      timerValues: TimerValues): Iterator[NearDupAlert] = {
    val prior = if (bucket.exists()) bucket.get().entries else Seq.empty[BucketEntry]
    val arrivals = rows.toSeq.sortBy(a => (a.eventUs, a.docId))
    val alerts = Seq.newBuilder[NearDupAlert]
    var seen = prior.toVector
    arrivals.foreach { a =>
      // best (min hamming, then min id) earlier match in this bucket
      var bestId = -1L
      var bestH = Int.MaxValue
      seen.foreach { e =>
        if (e.docId != a.docId) {
          val h = java.lang.Long.bitCount(e.sim ^ a.simhash)
          if (h <= k && (h < bestH || (h == bestH && e.docId < bestId)))
            { bestH = h; bestId = e.docId }
        }
      }
      if (bestId >= 0) alerts += NearDupAlert(a.docId, bestId, bestH)
      seen = seen :+ BucketEntry(a.docId, a.simhash, a.eventUs)
    }
    bucket.update(BucketState(seen.takeRight(maxBucket)))
    alerts.result().iterator
  }
}

object NearDupMonitor {

  /** Wire the processor onto a doc-arrival stream. `docs` must carry
    * (docId, simhash, eventUs); [[withSimhash]] derives that frame from
    * raw text map-side. Output: append-mode alert stream, at-least-once
    * per near-dup pair (once per shared segment bucket).
    */
  def alerts(
      docs: Dataset[DocArrival],
      k: Int = 3,
      segments: Int = 4,
      maxBucket: Int = 256): Dataset[NearDupAlert] = {
    import docs.sparkSession.implicits._
    require(segments >= k + 1, s"need >= k+1 segments for distance-$k recall")
    val width = 64 / segments
    val mask = if (width == 64) -1L else (1L << width) - 1
    docs
      .flatMap { a =>
        (0 until segments).map { s =>
          (s + ":" + ((a.simhash >>> (s * width)) & mask), a)
        }
      }
      .groupByKey(_._1)
      .mapValues(_._2)
      .transformWithState(
        new NearDupProcessor(k, maxBucket),
        TimeMode.None(),
        OutputMode.Append(),
        Encoders.product[NearDupAlert])
  }

  /** Map a raw (doc_id, text, event-time-us) frame to [[DocArrival]]s with
    * the same simhash kernel as the batch operator (blank docs excluded —
    * the [[Dedup.simhashNearDup]] invariant).
    */
  def withSimhash(
      raw: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      usCol: String = "event_us"): Dataset[DocArrival] = {
    import raw.sparkSession.implicits._
    raw
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("docId"),
        Dedup.simhash(col(textCol)).as("simhash"),
        col(usCol).as("eventUs"))
      .as[DocArrival]
  }
}
