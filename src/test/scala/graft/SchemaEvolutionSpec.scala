package graft

import graft.store.LogStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The store's schema-evolution story — the alembic-migration analog
  * (the reference versions its DDL; a parquet store's equivalent event is
  * "a payload field got promoted to a real column mid-corpus"). Pins that
  * full-history reads AND the compaction path preserve both schema
  * versions: v1 rows surface NULL in the promoted column, v2 rows keep
  * their values, nothing is dropped either side of the promotion.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore() = new LogStore(
    Files.createTempDirectory("graft-schema-evo").toString)

  test("a column promoted mid-corpus reads across old and new epochs") {
    val store = tmpStore()
    // epochs 0-1: schema v1 (no promoted column)
    (0 until 2).foreach { e =>
      val v1 = Seq.tabulate(5)(i =>
        (s"m$e-$i", s"c$i", """{"env":"prod"}""", "2024-01-01"))
        .toDF("message", "correlation_id", "data_raw", "date")
      store.appendIdempotent("logs", v1, "w", batchId = e.toLong)
    }
    // epochs 2-3: schema v2 — payload field `env` promoted to p_env
    (2 until 4).foreach { e =>
      val v2 = Seq.tabulate(5)(i =>
        (s"m$e-$i", s"c$i", s"""{"env":"stage$i"}""", s"stage$i", "2024-01-01"))
        .toDF("message", "correlation_id", "data_raw", "p_env", "date")
      store.appendIdempotent("logs", v2, "w", batchId = e.toLong)
    }
    val all = store.read(spark, "logs")
    assert(all.columns.contains("p_env"), "merged schema must carry the promoted column")
    assert(all.count() == 20)
    // v1 epochs: NULL promoted column (nullable ADD COLUMN semantics);
    // v2 epochs: values intact
    assert(all.filter(col("p_env").isNull).count() == 10)
    assert(all.filter(col("p_env").startsWith("stage")).count() == 10)
    // the promoted column is queryable across the WHOLE history alongside
    // extraction on the raw payload (old rows answer through the payload)
    val viaPayload = all
      .filter(get_json_object(col("data_raw"), "$.env") === "prod").count()
    assert(viaPayload == 10)
  }

  test("compaction preserves both schema versions within one date") {
    val store = tmpStore()
    val v1 = Seq.tabulate(4)(i => (s"old-$i", s"c$i", "2024-02-01"))
      .toDF("message", "correlation_id", "date")
    val v2 = Seq.tabulate(4)(i => (s"new-$i", s"c$i", s"env$i", "2024-02-01"))
      .toDF("message", "correlation_id", "p_env", "date")
    store.appendIdempotent("logs", v1, "w", batchId = 0L)
    store.appendIdempotent("logs", v2, "w", batchId = 1L)
    val before = store.read(spark, "logs")
      .select("message", "p_env").as[(String, Option[String])]
      .collect().sortBy(_._1).toSeq

    val (nBefore, _, rows) = store.compact(spark, "logs", "2024-02-01")
    assert(nBefore >= 2 && rows == 8)

    val after = store.read(spark, "logs")
    assert(after.columns.contains("p_env"),
      "compaction must not drop the promoted column")
    val afterRows = after.select("message", "p_env")
      .as[(String, Option[String])].collect().sortBy(_._1).toSeq
    assert(afterRows == before)
    assert(afterRows.count(_._2.isEmpty) == 4)   // v1 rows: NULL survives
    assert(afterRows.count(_._2.exists(_.startsWith("env"))) == 4)
  }
}
