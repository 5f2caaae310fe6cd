package graft.ingest

import graft.functions.JsonFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest transform for the `metric` table — the reference's second
  * hypertable (reference: migration:66-78: `time TIMESTAMPTZ NOT NULL,
  * data JSONB NOT NULL`, chunked like `logs`).
  *
  * Same wire shape as logs ingest (epoch-seconds `created` in the JSON
  * payload) but a leaner envelope: no message/correlation promotion — just
  * time extraction, created popped from the payload, and the date partition
  * column for chunk-equivalent pruning. Dashboard aggregation over the
  * result is `window()`/`groupBy(date)` + `get_json_object`/`variant_get`
  * on `data_raw` (reference: metabase-instructions.rst:18-22 line charts).
  */
object MetricIngest {

  val RawCol = "value"

  /** Raw JSON wire records -> metric envelope:
    * `time TIMESTAMP, data_raw STRING, date DATE`.
    * Malformed / `created`-less records are dropped here (dead-letter them
    * with [[IngestTransform.deadLetter]] on the same input).
    */
  def apply(raw: DataFrame): DataFrame =
    raw
      .withColumn("time",
        timestamp_seconds(get_json_object(col(RawCol), "$.created").try_cast("double")))
      .filter(col("time").isNotNull)
      .withColumn("data_raw", JsonFunctions.json_drop_keys(col(RawCol), Seq("created")))
      .withColumn("date", to_date(col("time")))
      .select("time", "data_raw", "date")
}
