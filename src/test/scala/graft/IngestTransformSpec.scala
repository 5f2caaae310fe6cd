package graft

import graft.ingest.IngestTransform
import graft.model.IngestConfig
import org.apache.spark.sql.functions._

/** Ingest semantics per the reference contract (FIXTURES.md §1):
  * extract/coerce promoted fields, pop them + the ignore-list from the
  * payload with type fidelity, drop `created`-less records, dead-letter
  * malformed JSON.
  */
class IngestTransformSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    """{"name":"root","msg":"blah","levelname":"INFO","levelno":20,
      |"pathname":"tests/sender.py","filename":"sender.py","module":"sender",
      |"lineno":59,"funcName":"app_items","created":1554635562.8368905,
      |"msecs":836.89,"thread":15368,"threadName":"MainThread",
      |"processName":"MainProcess","process":11604,
      |"correlation_id":"8E820A74-EF80-4FBE-A4F7-692F6352B6BE",
      |"random_timing_data":1.23,"message":"blah blah blah",
      |"created_iso":"2019-04-07T11:12:42.836890+00:00"}""".stripMargin.replaceAll("\n", "")

  private def ingest(rows: String*) =
    IngestTransform(rows.toDF("value"))

  test("promoted fields extracted and coerced") {
    val r = ingest(good).head()
    assert(r.getAs[java.sql.Timestamp]("time").getTime == 1554635562836L)
    assert(r.getAs[String]("message") == "blah blah blah")
    // UUID lowercased to canonical form
    assert(r.getAs[String]("correlation_id") == "8e820a74-ef80-4fbe-a4f7-692f6352b6be")
    assert(r.getAs[java.sql.Date]("date").toString == "2019-04-07")
  }

  test("promoted + ignore-list keys popped from payload, others retained with types intact") {
    val data = ingest(good).select("data_raw").as[String].head()
    val keys = spark.range(1).select(
      json_object_keys(lit(data))).as[Seq[String]].head()
    // popped: promoted (created, message, correlation_id) + DROP_FIELDS
    val popped = IngestConfig.DefaultDropFields ++ IngestConfig.PromotedFields
    assert(keys.toSet.intersect(popped.toSet).isEmpty)
    // retained, reference contract fields (test_sender.py:130-136)
    assert(keys.contains("filename") && keys.contains("pathname") &&
      keys.contains("random_timing_data"))
    // type fidelity: numbers must survive as JSON numbers, not strings
    assert(data.contains("\"random_timing_data\":1.23"))
    assert(data.contains("\"levelno\":20"))
    assert(data.contains("\"filename\":\"sender.py\""))
  }

  test("records without created are dropped; malformed JSON dropped") {
    val noCreated = """{"message":"x","correlation_id":"c"}"""
    val malformed = """{not json!"""
    val out = ingest(good, noCreated, malformed)
    assert(out.count() == 1)
  }

  test("dead-letter tags malformed vs missing-created") {
    val noCreated = """{"message":"x"}"""
    val malformed = """{not json!"""
    val dead = IngestTransform.deadLetter(Seq(good, noCreated, malformed).toDF("value"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(dead.size == 2)
    assert(dead(noCreated) == "missing_created")
    assert(dead(malformed) == "malformed_json")
  }

  test("fractional epoch seconds preserved to millis") {
    val r = ingest("""{"created":1000000000.5,"message":"m"}""").head()
    assert(r.getAs[java.sql.Timestamp]("time").getTime == 1000000000500L)
  }

  test("custom drop-fields config respected") {
    val cfg = IngestConfig(dropFields = Seq("lineno"))
    val data = IngestTransform(Seq(good).toDF("value"), cfg)
      .select("data_raw").as[String].head()
    assert(!data.contains("\"lineno\""))
    assert(data.contains("\"funcName\"")) // not in custom list
  }
}
