package graft.streaming

import graft.model.IngestConfig
import java.nio.file.{Files, Paths}
import java.util.Properties

/** Live ingest-configuration refresh — the engine analog of the reference's
  * Consul poll loop (reference: venus/settings.py:44-127, polled every 60 s
  * from venus/main.py:28-31).
  *
  * Spark-idiomatic shape: instead of a background poller mutating global
  * state, the ingest stream resolves its [[ConfigSource]] at the top of
  * every micro-batch (inside `foreachBatch`), so a config change is applied
  * on the NEXT batch — the same effective latency as the reference's poll
  * interval, with no shared mutable settings object. What hot-applies per
  * batch: `dropFields` (the DROP_FIELDS ignore-list, settings.py:26-37).
  * What is fixed at query start: the trigger interval and per-trigger rate
  * caps (`maxBatchAgeSeconds`, `maxBatchSize`) — Spark pins the trigger
  * when the query starts, so those follow the stop/restart contract
  * (checkpointed restart is lossless, see StreamIngestSpec).
  */
trait ConfigSource extends Serializable {
  /** The freshest config; called once per micro-batch on the driver. */
  def current(): IngestConfig
}

object ConfigSource {
  /** Fixed config — the no-refresh default. */
  final case class Static(config: IngestConfig) extends ConfigSource {
    override def current(): IngestConfig = config
  }

  /** Java-properties file re-read at most every `ttlMs` (the reference's
    * 60 s Consul poll cadence, settings.py:57-69). Recognized keys:
    * `drop_fields` (comma-separated), `max_batch_size`,
    * `max_batch_age_seconds`; absent keys keep the fallback's values.
    *
    * Failure contract mirrors the reference (settings.py:62-69: poll
    * errors are logged and the previous settings stay live): a missing or
    * malformed file, or an unparsable value, keeps the LAST GOOD config —
    * a bad config push degrades freshness, never correctness.
    */
  final class FromFile(
      path: String,
      fallback: IngestConfig = IngestConfig(),
      ttlMs: Long = 60000L) extends ConfigSource {
    @transient private var lastGood: IngestConfig = fallback
    // half of MinValue so `now - lastReadAt` can't overflow on first call
    @transient private var lastReadAt: Long = Long.MinValue / 2

    override def current(): IngestConfig = synchronized {
      val now = System.nanoTime() / 1000000L
      if (now - lastReadAt >= ttlMs) {
        lastReadAt = now
        try {
          val props = new Properties()
          val in = Files.newInputStream(Paths.get(path))
          try props.load(in) finally in.close()
          def opt(k: String): Option[String] =
            Option(props.getProperty(k)).map(_.trim).filter(_.nonEmpty)
          lastGood = IngestConfig(
            dropFields = opt("drop_fields")
              .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
              .getOrElse(lastGood.dropFields),
            maxBatchSize = opt("max_batch_size").map(_.toInt)
              .getOrElse(lastGood.maxBatchSize),
            maxBatchAgeSeconds = opt("max_batch_age_seconds").map(_.toInt)
              .getOrElse(lastGood.maxBatchAgeSeconds))
        } catch {
          case scala.util.control.NonFatal(_) => // keep lastGood
        }
      }
      lastGood
    }
  }
}
