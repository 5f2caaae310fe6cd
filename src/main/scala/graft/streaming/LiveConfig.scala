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
  * What is fixed at query start: the source's flush gate
  * (`maxBatchAgeSeconds`, `maxBatchSize` → PushSocketSource
  * `flushAgeMs`/`flushSize`) — source options are pinned when the query
  * starts, so those follow the stop/restart contract (checkpointed restart
  * is lossless, see StreamIngestSpec).
  */
trait ConfigSource extends Serializable {
  /** The freshest config; called once per micro-batch on the driver. */
  def current(): IngestConfig
}

/** Operational side-channels of the reference's settings poller that are
  * not ingest-semantics: secret-masked change logging and logger-level
  * hot-update (reference: venus/settings.py:88-91 password masking,
  * :104-127 logger level reload from the Consul KV path).
  */
object LiveConfig {
  /** Keys whose values must never be printed in full
    * (reference: venus/settings.py:10 `DO_NOT_PRINT`).
    */
  val DoNotPrint: Set[String] = Set("password", "pass", "pw")

  /** Mask a value for logging when its key looks secret: first character
    * kept, the rest X-ed (the reference's exact scheme, settings.py:89-91).
    * Non-secret keys pass through; empty values stay empty.
    */
  def mask(key: String, value: String): String =
    if (DoNotPrint.exists(key.toLowerCase.contains) && value.nonEmpty)
      value.head + "X" * (value.length - 1)
    else value

  /** Apply a `logger=LEVEL` spec list ("root=WARN,graft=DEBUG") to the
    * live log4j2 configuration — the reference's logger-level hot-reload
    * (settings.py:104-127: "root" means the root logger, unchanged levels
    * skipped, bad entries logged and ignored). Returns the changes applied
    * as (logger, oldLevel, newLevel).
    */
  def applyLogLevels(spec: String): Seq[(String, String, String)] = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    spec.split(",").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { entry =>
      entry.split("=", 2) match {
        case Array(rawName, rawLevel) =>
          val name = rawName.trim
          val level = Level.toLevel(rawLevel.trim, null)
          if (name.isEmpty || level == null) None // bad entry: skip, keep old
          else {
            val isRoot = name.equalsIgnoreCase("root")
            val logger =
              if (isRoot) LogManager.getRootLogger else LogManager.getLogger(name)
            val old = String.valueOf(logger.getLevel)
            if (old == level.toString) None // unchanged: skip (reference :118)
            else {
              if (isRoot) Configurator.setRootLevel(level)
              else Configurator.setLevel(name, level)
              Some((if (isRoot) "root" else name, old, level.toString))
            }
          }
        case _ => None
      }
    }
  }
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
    @transient private var lastProps: Map[String, String] = Map.empty
    @transient private lazy val log =
      org.slf4j.LoggerFactory.getLogger(classOf[FromFile])

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
          // change log with secret masking (reference settings.py:84-96:
          // every changed key is announced, passwordish values X-ed out)
          val snapshot = {
            import scala.jdk.CollectionConverters._
            if (lastProps == null) lastProps = Map.empty // post-deserialize
            props.asScala.toMap
          }
          snapshot.foreach { case (k, v) =>
            val prev = lastProps.get(k)
            if (!prev.contains(v)) log.info(
              "config '{}' changed. Was '{}', updating to '{}'",
              k, prev.map(LiveConfig.mask(k, _)).getOrElse("<unset>"),
              LiveConfig.mask(k, v))
          }
          lastProps = snapshot
          // logger-level hot-reload (reference settings.py:104-127)
          opt("log_levels").foreach { spec =>
            LiveConfig.applyLogLevels(spec).foreach { case (n, o, nw) =>
              log.info("logger '{}' changed from level '{}' to '{}'", n, o, nw)
            }
          }
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
