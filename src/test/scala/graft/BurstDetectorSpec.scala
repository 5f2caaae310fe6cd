package graft

import graft.streaming.{BurstDetector, ErrorEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class BurstDetectorSpec extends SparkSpec {
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

  test("alerts fire at threshold errors within the window, once per burst") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[ErrorEvent]
      val alerts = BurstDetector.alerts(
        stream.toDS(), threshold = 3, windowSeconds = 300L)
      val q = alerts.writeStream.format("memory")
        .queryName("burst_out").outputMode("append").start()
      try {
        val base = 1700000000000000L
        stream.addData(
          ErrorEvent("cA", base), ErrorEvent("cA", base + 1000000L),
          ErrorEvent("cB", base)) // cB: only 1 error
        q.processAllAvailable()
        assert(spark.table("burst_out").isEmpty) // nobody at threshold yet
        stream.addData(ErrorEvent("cA", base + 2000000L)) // cA reaches 3
        q.processAllAvailable()
        val got = spark.table("burst_out")
          .as[(String, Int, Long, Long)].collect().toSeq
        assert(got == Seq(("cA", 3, base, base + 2000000L)))
        // state cleared after the alert: two more errors do NOT re-alert
        stream.addData(ErrorEvent("cA", base + 3000000L),
          ErrorEvent("cA", base + 4000000L))
        q.processAllAvailable()
        assert(spark.table("burst_out").count() == 1)
      } finally q.stop()
    }
  }

  test("a burst fully inside one micro-batch alerts despite a later straggler") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[ErrorEvent]
      val alerts = BurstDetector.alerts(
        stream.toDS(), threshold = 3, windowSeconds = 60L)
      val q = alerts.writeStream.format("memory")
        .queryName("burst_inbatch_out").outputMode("append").start()
      try {
        val base = 1700000000000000L
        // 3 errors within 2s (a qualifying burst), then one event 10 min
        // later — all in a SINGLE batch. The window must be evaluated at
        // each event, not only at the batch's latest one.
        stream.addData(
          ErrorEvent("cA", base), ErrorEvent("cA", base + 1000000L),
          ErrorEvent("cA", base + 2000000L),
          ErrorEvent("cA", base + 600000000L))
        q.processAllAvailable()
        val got = spark.table("burst_inbatch_out")
          .as[(String, Int, Long, Long)].collect().toSeq
        assert(got == Seq(("cA", 3, base, base + 2000000L)))
        // the straggler re-armed the state: two more nearby errors complete
        // a SECOND burst (straggler + 2 = threshold)
        stream.addData(ErrorEvent("cA", base + 601000000L),
          ErrorEvent("cA", base + 602000000L))
        q.processAllAvailable()
        assert(spark.table("burst_inbatch_out").count() == 2)
      } finally q.stop()
    }
  }

  test("two separate bursts in one micro-batch emit two alerts") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[ErrorEvent]
      val alerts = BurstDetector.alerts(
        stream.toDS(), threshold = 3, windowSeconds = 60L)
      val q = alerts.writeStream.format("memory")
        .queryName("burst_double_out").outputMode("append").start()
      try {
        val base = 1700000000000000L
        val gap = 600000000L // 10 min between bursts
        stream.addData(
          ErrorEvent("cA", base), ErrorEvent("cA", base + 1000000L),
          ErrorEvent("cA", base + 2000000L),
          ErrorEvent("cA", base + gap), ErrorEvent("cA", base + gap + 1000000L),
          ErrorEvent("cA", base + gap + 2000000L))
        q.processAllAvailable()
        val got = spark.table("burst_double_out")
          .as[(String, Int, Long, Long)].collect().toSeq.sortBy(_._3)
        assert(got == Seq(
          ("cA", 3, base, base + 2000000L),
          ("cA", 3, base + gap, base + gap + 2000000L)))
      } finally q.stop()
    }
  }

  test("errors spread wider than the window never alert") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[ErrorEvent]
      val alerts = BurstDetector.alerts(
        stream.toDS(), threshold = 3, windowSeconds = 60L)
      val q = alerts.writeStream.format("memory")
        .queryName("burst_sparse_out").outputMode("append").start()
      try {
        val base = 1700000000000000L
        // 4 errors, each 2 minutes apart: window (60s) holds at most 1
        stream.addData((0 until 4).map(i =>
          ErrorEvent("cA", base + i * 120000000L)): _*)
        q.processAllAvailable()
        assert(spark.table("burst_sparse_out").isEmpty)
      } finally q.stop()
    }
  }
}
