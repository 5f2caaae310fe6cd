package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-batch ingest telemetry — the reference's insert-latency stopwatch
  * ("Inserting $size records took $time_ sec", venus/db/write.py:70 via
  * `@aiodec.astopwatch`) and health surface (venus/main.py:40-47)
  * re-expressed as a `StreamingQueryListener`: every micro-batch's row
  * count and trigger latency is captured as it completes, with no code in
  * the hot path (Spark publishes progress events off the query thread).
  *
  * Attach with `spark.streams.addListener(listener)`; scope to one query
  * by filtering on `queryId`.
  */
final class IngestMetricsListener extends StreamingQueryListener {

  /** One completed micro-batch: rows ingested and wall-clock trigger ms. */
  final case class BatchMetric(
      queryId: java.util.UUID, batchId: Long, rows: Long, durationMs: Long)

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetric]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val duration = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    buf.add(BatchMetric(p.id, p.batchId, p.numInputRows, duration))
  }

  /** Snapshot of captured batches (completed triggers only). */
  def metrics: Seq[BatchMetric] = {
    val it = buf.iterator()
    val out = Seq.newBuilder[BatchMetric]
    while (it.hasNext) out += it.next()
    out.result()
  }

  def totalRows: Long = metrics.map(_.rows).sum

  /** Mean ingest rate in rows/sec over batches that moved data. */
  def meanRate: Double = {
    val busy = metrics.filter(m => m.rows > 0 && m.durationMs > 0)
    if (busy.isEmpty) 0.0
    else busy.map(_.rows).sum.toDouble / (busy.map(_.durationMs).sum / 1000.0)
  }
}
