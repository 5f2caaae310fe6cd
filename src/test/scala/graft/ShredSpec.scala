package graft

import java.nio.file.Files

import graft.query.LogsTable
import graft.store.LogStore
import org.apache.spark.sql.functions._

/** Promoted/shredded payload fields — the `jsonb_path_ops` GIN analog
  * (reference: migration:37): containment on a promoted field must reach
  * the parquet scan as a pushed filter, and must return exactly what the
  * extraction path returns.
  */
class ShredSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("graft-shred").toString
    val store = new LogStore(r)
    val rows = Seq(
      (1L, """{"k": 42, "status": "ok"}"""),
      (2L, """{"k": 7}"""),
      (3L, """{"k": 42, "status": "err"}"""),
      (4L, """{"other": true}""")
    ).toDF("event_id", "data_raw")
    store.appendShredded("events_shred", rows, promote = Seq("k", "status"))
    r
  }

  test("promoted containment pushes to the parquet scan (PushedFilters)") {
    val df = new LogStore(root).read(spark, "events_shred")
    assert(df.columns.contains("p_k") && df.columns.contains("p_status"))
    val q = df.filter(LogsTable(df).jsonContains(Map("k" -> "42")))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(p_k,42)"),
      s"containment filter not pushed to the scan:\n$plan")
    assert(q.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("non-promoted keys fall back to extraction; mixed conjunctions work") {
    val df = new LogStore(root).read(spark, "events_shred")
    val lt = LogsTable(df)
    // "other" was not promoted -> get_json_object path
    assert(df.filter(lt.jsonContains(Map("other" -> "true")))
      .select("event_id").as[Long].collect().toSeq == Seq(4L))
    // mixed: promoted k pushes, extracted status verifies post-scan
    val mixed = df.filter(lt.jsonContains(Map("k" -> "42", "status" -> "err")))
    assert(mixed.select("event_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("promoted path and extraction path agree row for row") {
    val df = new LogStore(root).read(spark, "events_shred")
    val viaPromoted = df.filter(LogsTable(df).jsonContains(Map("k" -> "42")))
      .select("event_id").as[Long].collect().sorted.toSeq
    val noPromo = df.drop("p_k", "p_status")
    val viaExtract = noPromo.filter(LogsTable(noPromo).jsonContains(Map("k" -> "42")))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(viaPromoted == viaExtract)
  }
}
