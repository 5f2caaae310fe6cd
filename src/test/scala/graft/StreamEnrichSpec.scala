package graft

import graft.streaming.StreamAggregates
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamEnrichSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static enrich joins the broadcast dimension without state") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Int)]
    val dim = Seq(("c1", "tenant-a"), ("c2", "tenant-b"))
      .toDF("correlation_id", "tenant")

    val enriched = StreamAggregates.enrich(
      stream.toDF().toDF("correlation_id", "v"), dim)
    val q = enriched.writeStream.format("memory")
      .queryName("enriched_out").outputMode("append").start()
    try {
      stream.addData(("c1", 1), ("c2", 2), ("c9", 3)) // c9: no dim row
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("enriched_out")
      .select("correlation_id", "v", "tenant")
      .as[(String, Int, String)].collect().sortBy(_._2).toSeq
    // left join: unmatched keys survive with NULL tenant (enrichment must
    // never drop log rows — parity with the reference's independent tables)
    assert(got == Seq(("c1", 1, "tenant-a"), ("c2", 2, "tenant-b"), ("c9", 3, null)))
  }

  test("enrich output is append-safe (no stateful operators in the plan)") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Int)]
    val dim = Seq(("c1", "t")).toDF("correlation_id", "tenant")
    val enriched = StreamAggregates.enrich(
      stream.toDF().toDF("correlation_id", "v"), dim)
    // append mode without watermark only analyzes if the join is stateless
    val q = enriched.writeStream.format("noop").outputMode("append").start()
    try {
      stream.addData(("c1", 1))
      q.processAllAvailable()
      assert(q.lastProgress == null || q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
