package graft

import org.apache.spark.sql.types.TimestampType

/** The driver's testdata has shipped `events.ts` in two parquet encodings
  * across generations — TIMESTAMP(NANOS) (read as raw longs via the legacy
  * conf) and TIMESTAMP(isAdjustedToUTC=false, MICROS) (read as
  * TIMESTAMP_NTZ). r8 broke when the driver switched shapes and the loader
  * only normalized the first; these fixtures pin BOTH branches so a future
  * re-generation can never silently regress the seven ts-consuming query
  * families again. Fixture rows are identical instants in both files.
  */
class TablesSpec extends SparkSpec {

  private val fixtures = "src/test/resources/fixtures"

  private def loaded(dir: String) = Tables(spark, s"$fixtures/$dir", "events")

  test("NTZ-micros events normalize to TimestampType with unchanged instants") {
    val df = loaded("events_ntz")
    assert(df.schema("ts").dataType == TimestampType)
    val first = df.orderBy("event_id").select("ts").head.getTimestamp(0)
    // session TZ is UTC, so the NTZ wall-clock IS the instant
    assert(first.toInstant.toString == "2024-03-01T12:00:00Z")
    assert(df.count() == 12)
  }

  test("legacy nanos events normalize to TimestampType with micro truncation") {
    val df = loaded("events_nanos")
    assert(df.schema("ts").dataType == TimestampType)
    val first = df.orderBy("event_id").select("ts").head.getTimestamp(0)
    assert(first.toInstant.toString == "2024-03-01T12:00:00Z")
    assert(df.count() == 12)
  }

  test("both encodings yield identical rows") {
    val a = loaded("events_ntz").orderBy("event_id").collect().toSeq
    val b = loaded("events_nanos").orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("eventsRange prunes identically on both encodings") {
    for (dir <- Seq("events_ntz", "events_nanos")) {
      val r = Tables.eventsRange(spark, s"$fixtures/$dir",
        "2024-03-01 12:30:00", "2024-03-01 13:00:00")
      assert(r.schema("ts").dataType == TimestampType)
      // rows at 12:35, 12:42, 12:49, 12:56 (7-minute cadence from 12:00)
      assert(r.count() == 4, s"encoding $dir")
    }
  }

  test("unix_micros works downstream of both encodings (the r8 regression)") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq("events_ntz", "events_nanos")) {
      val us = loaded(dir).select(unix_micros(col("ts")).as("us"))
        .orderBy("us").head.getLong(0)
      assert(us == 1709294400000000L, s"encoding $dir") // 2024-03-01T12:00:00Z
    }
  }
}
