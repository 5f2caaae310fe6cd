package graft

import graft.streaming.{DocArrival, NearDupMonitor}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming near-dup monitor — the in-flight twin of Dedup.simhashNearDup. */
class NearDupMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("flags near-dup arrivals across and within batches; unrelated pass") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[DocArrival]
      val alerts = NearDupMonitor.alerts(stream.toDS(), k = 3)
      val q = alerts.writeStream.format("memory")
        .queryName("neardup_out").outputMode("append").start()
      try {
        val simA = 0x0123456789abcdefL
        stream.addData(DocArrival(1L, simA, 1000L))
        q.processAllAvailable()
        assert(spark.table("neardup_out").isEmpty) // first sighting: clean

        // 1-bit flip of A arrives later -> alert against doc 1;
        // a far-away simhash stays silent
        stream.addData(
          DocArrival(2L, simA ^ 1L, 2000L),
          DocArrival(3L, ~simA, 2000L))
        q.processAllAvailable()
        val got = spark.table("neardup_out")
          .as[(Long, Long, Int)].collect().toSet
        assert(got.contains((2L, 1L, 1)))
        assert(!got.exists(_._1 == 3L))

        // within-ONE-batch pair: later (us, id) doc alerts against earlier
        stream.addData(
          DocArrival(10L, 0x7700000000000000L, 5000L),
          DocArrival(11L, 0x7700000000000001L, 5000L))
        q.processAllAvailable()
        val got2 = spark.table("neardup_out")
          .as[(Long, Long, Int)].collect().toSet
        assert(got2.contains((11L, 10L, 1)))
        assert(!got2.exists(_._1 == 10L), "earlier doc of the pair is clean")
      } finally q.stop()
    }
  }

  test("withSimhash agrees with the batch operator's pairs") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // batch ground truth on a small corpus
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog today"),
        (3L, "completely different content about query engines")
      ).toDF("doc_id", "text")
      val batchPairs = graft.operators.Dedup.simhashNearDup(docs, k = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet

      val withUs = docs.withColumn("event_us",
        org.apache.spark.sql.functions.col("doc_id") * 1000L)
      val arrivals = NearDupMonitor.withSimhash(withUs).collect().toSeq

      val stream = MemoryStream[DocArrival]
      val q = NearDupMonitor.alerts(stream.toDS(), k = 3)
        .writeStream.format("memory")
        .queryName("neardup_batch_parity").outputMode("append").start()
      try {
        arrivals.foreach { a => stream.addData(a); q.processAllAvailable() }
        val streamed = spark.table("neardup_batch_parity")
          .as[(Long, Long, Int)].collect()
          .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).toSet
        assert(streamed == batchPairs,
          s"stream=$streamed batch=$batchPairs")
      } finally q.stop()
    }
  }
}
