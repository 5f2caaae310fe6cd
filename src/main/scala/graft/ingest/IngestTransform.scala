package graft.ingest

import graft.functions.JsonFunctions
import graft.model.IngestConfig
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** The pure `DataFrame => DataFrame` ingest pipeline: raw JSON wire records
  * in, partition-ready `logs` envelope rows out.
  *
  * Re-expresses the reference's ingest dataflow
  * (reference: venus/db/write.py:19-62) as a single declarative Spark
  * lineage, so it is identical for batch and Structured Streaming inputs:
  *
  *   1. JSON parse with dead-letter split  (reference: write.py:31-36)
  *   2. extract + coerce `created` -> time, `message`, `correlation_id`
  *      (reference: write.py:41-47)
  *   3. drop records lacking `created`     (reference: write.py:42-44)
  *   4. pop promoted keys + configured ignore-list from the payload
  *      (reference: write.py:51, settings.py:26-37)
  *   5. add a `date` partition column — the hypertable chunk-routing
  *      equivalent (reference: migration:39-43)
  *
  * Everything is built from codegen'd built-ins (from_json, map_filter,
  * to_json, timestamp_seconds) — no UDFs — so the whole transform stays
  * inside WholeStageCodegen and scales linearly with partitions.
  */
object IngestTransform {

  /** Name of the input column holding the raw JSON wire record. */
  val RawCol = "value"

  /** Parses the payload as a string-keyed map: key-preserving (unlike an
    * ascribed StructType, unknown keys survive) and exact for the
    * "pop fields, keep the rest" semantics. Values are re-serialized JSON
    * scalars/objects; `valueType = StringType` keeps raw text, so we parse
    * values with a second pass only where typed access is needed.
    */
  private val payloadMapType = MapType(StringType, StringType)

  /** Full transform: raw JSON strings -> logs envelope.
    *
    * Input: any DataFrame with a string column `value` (one JSON record per
    * row). Output columns: `time TIMESTAMP, message STRING,
    * correlation_id STRING, data_raw STRING, date DATE`.
    *
    * Malformed JSON and records missing `created` are silently dropped here;
    * use [[deadLetter]] on the same input to route them to a side sink
    * (reference drops them with a log line, write.py:34-36,42-44).
    */
  def apply(raw: DataFrame, config: IngestConfig = IngestConfig()): DataFrame = {
    val removed = (config.dropFields ++ IngestConfig.PromotedFields).distinct
    raw
      // A5: extract + coerce. `created` is an epoch-seconds float
      // (reference: write.py:41) — timestamp_seconds keeps fractional part.
      .withColumn("time", timestamp_seconds(try_cast_double(get_json_object(col(RawCol), "$.created"))))
      .withColumn("message", get_json_object(col(RawCol), "$.message"))
      .withColumn("correlation_id", lower(get_json_object(col(RawCol), "$.correlation_id")))
      // A6: mandatory-field filter (drops unparseable rows too: time is null).
      .filter(col("time").isNotNull)
      // A7: pop promoted + ignore-list keys from the payload, preserving the
      // remaining fields' JSON types exactly (reference pop semantics,
      // write.py:41-52; type fidelity asserted by test_sender.py:133-136).
      .withColumn("data_raw", JsonFunctions.json_drop_keys(col(RawCol), removed))
      .withColumn("date", to_date(col("time")))
      .select("time", "message", "correlation_id", "data_raw", "date")
  }

  /** ANSI-safe string->double (malformed -> NULL, not error). */
  private def try_cast_double(c: Column): Column = c.try_cast("double")

  /** Rows the main transform drops, for a dead-letter sink: malformed JSON
    * (reference: write.py:34-36) and records without `created`
    * (reference: write.py:42-44), each tagged with a reason.
    */
  def deadLetter(raw: DataFrame): DataFrame = {
    // from_json in PERMISSIVE mode yields NULL for unparseable documents,
    // matching the reference's dead-letter condition.
    val parsed = from_json(col(RawCol), payloadMapType)
    raw
      .withColumn(
        "reason",
        when(parsed.isNull, lit("malformed_json"))
          .when(try_cast_double(get_json_object(col(RawCol), "$.created")).isNull,
            lit("missing_created"))
      )
      .filter(col("reason").isNotNull)
      .select(col(RawCol).as("raw"), col("reason"))
  }
}
