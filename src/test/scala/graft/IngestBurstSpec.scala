package graft

import graft.store.LogStore
import graft.streaming.StreamIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** BASELINE.md derived floors: absorb a >= 65,536-message burst without
  * loss (the reference's intake-queue capacity, venus/main.py:36 — where it
  * DROPS on overflow, we must not), and sustain >> 20 rec/s (the
  * reference's trivial 100-rows-per-5s floor).
  */
class IngestBurstSpec extends SparkSpec {
  import spark.implicits._

  test("65,536-record burst ingested with zero loss; throughput reported") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-burst").toString
    val store = new LogStore(s"$root/store")
    val stream = MemoryStream[String]

    val n = 65536
    val records = (0 until n).map { i =>
      s"""{"created":${1700000000 + i % 86400}.5,"message":"m$i","correlation_id":"00000000-0000-0000-0000-${f"$i%012d"}","k":$i}"""
    }
    val t0 = System.nanoTime()
    val q = StreamIngest.start(stream.toDF(), store, s"$root/ckpt",
      sourceFlushGated = true)
    try {
      records.grouped(16384).foreach(batch => stream.addData(batch))
      q.processAllAvailable()
    } finally q.stop()
    val elapsed = (System.nanoTime() - t0) / 1e9

    val stored = store.read(spark, "logs")
    val count = stored.count()
    assert(count == n, s"expected $n rows, got $count (loss!)")
    // distinct correlation ids — no duplicate-collapse hiding loss
    assert(stored.select("correlation_id").distinct().count() == n)
    val rate = n / elapsed
    info(f"burst: $n records in $elapsed%.1fs = $rate%.0f rec/s")
    assert(rate > 20, s"throughput $rate rec/s below the 20 rec/s floor")
  }
}
