package graft.model

import org.apache.spark.sql.types._

/** Canonical table schemas for the engine.
  *
  * Mirrors the reference DDL
  * (reference: alembic/versions/37716151a213_initialise_database.py:26-78):
  * four fixed relational envelopes, three of which carry a schemaless JSON
  * payload column. We store the payload as a raw JSON string column
  * (`data_raw`) — portable, Parquet-friendly, and queried via
  * `get_json_object` / `from_json`; promoted columns mirror the reference's
  * envelope exactly (reference: README.rst:27-30).
  */
object Schemas {

  /** `logs` — main event stream (reference: migration:26-33).
    * Partition column `date` is derived at write time (the TimescaleDB
    * hypertable chunk-routing equivalent, migration:39-43).
    */
  val logs: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("message", StringType),
    StructField("correlation_id", StringType),
    StructField("data_raw", StringType, nullable = false)
  ))

  /** `context` — per-correlation enrichment (reference: migration:45-50). */
  val context: StructType = StructType(Seq(
    StructField("correlation_id", StringType, nullable = false),
    StructField("data_raw", StringType, nullable = false)
  ))

  /** `span` — tracing intervals (reference: migration:54-62). */
  val span: StructType = StructType(Seq(
    StructField("span_id", StringType, nullable = false),
    StructField("correlation_id", StringType),
    StructField("description", StringType),
    StructField("time_start", TimestampType, nullable = false),
    StructField("time_end", TimestampType, nullable = false)
  ))

  /** `metric` — numeric time-series (reference: migration:66-78). */
  val metric: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("data_raw", StringType, nullable = false)
  ))

  /** The canonical 22-field Python LogRecord JSON envelope emitted by
    * producers (reference: README.rst:37-61). Used as the ascribed schema
    * for full decomposition of the raw wire record.
    */
  val logRecord: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("msg", StringType),
    StructField("args", ArrayType(StringType)),
    StructField("levelname", StringType),
    StructField("levelno", IntegerType),
    StructField("pathname", StringType),
    StructField("filename", StringType),
    StructField("module", StringType),
    StructField("exc_text", StringType),
    StructField("stack_info", StringType),
    StructField("lineno", IntegerType),
    StructField("funcName", StringType),
    StructField("created", DoubleType),
    StructField("msecs", DoubleType),
    StructField("relativeCreated", DoubleType),
    StructField("thread", LongType),
    StructField("threadName", StringType),
    StructField("processName", StringType),
    StructField("process", LongType),
    StructField("correlation_id", StringType),
    StructField("random_timing_data", DoubleType),
    StructField("message", StringType),
    StructField("created_iso", StringType)
  ))
}

/** Engine ingest configuration.
  *
  * Defaults mirror the reference's knobs (reference: venus/settings.py:26-41):
  * `dropFields` = DROP_FIELDS default ignore-list, `maxBatchAgeSeconds` =
  * MAX_BATCH_AGE_SECONDS and `maxBatchSize` = MAX_BATCH_SIZE — the two
  * halves of the micro-batcher's flush-by-size-or-age condition, enforced
  * at the source (PushSocketSource `flushSize`/`flushAgeMs` defaults
  * mirror these).
  */
final case class IngestConfig(
    dropFields: Seq[String] = IngestConfig.DefaultDropFields,
    maxBatchSize: Int = 100,
    maxBatchAgeSeconds: Int = 5
)

object IngestConfig {
  /** reference: venus/settings.py:26-37 */
  val DefaultDropFields: Seq[String] = Seq(
    "stack_info", "funcName", "created", "msecs",
    "module", "thread", "threadName", "processName"
  )
  /** Fields promoted out of the payload into envelope columns
    * (reference: venus/db/write.py:41-47 — `pop` semantics). */
  val PromotedFields: Seq[String] = Seq("created", "message", "correlation_id")
}
