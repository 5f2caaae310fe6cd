package graft

import graft.store.LogStore
import graft.streaming.StreamIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.util.UUID

/** End-to-end streaming ingest — the Spark translation of the reference's
  * black-box tests (reference: tests/test_sender.py:37-61 superset delivery,
  * :64-94 concurrent producers, :97-136 field extraction; malformed-record
  * dead-letter write.py:34-36).
  */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private def record(msg: String, cid: String = UUID.randomUUID().toString): String =
    s"""{"created":${System.currentTimeMillis() / 1000.0},"message":"$msg",""" +
      s""""correlation_id":"$cid","filename":"sender.py","random_timing_data":1.23}"""

  test("streamed records land queryable; malformed records dead-lettered") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-stream").toString
    val store = new LogStore(s"$root/store")
    val stream = MemoryStream[String]

    val sent = (1 to 25).map(_ => UUID.randomUUID().toString)
    val q = StreamIngest.start(stream.toDF(), store, s"$root/ckpt",
      sourceFlushGated = true) // MemoryStream polling is free: immediate batches
    try {
      // two "producers" interleaved (test_sender.py:64-94 shape)
      val (p1, p2) = sent.splitAt(12)
      stream.addData(p1.map(record(_)))
      stream.addData(p2.map(record(_)))
      stream.addData(Seq("{not json!", """{"message":"no created field"}"""))
      q.processAllAvailable()
    } finally q.stop()

    val logs = store.read(spark, "logs")
    // at-least-once contract: delivered is a superset of sent
    val messages = logs.select("message").as[String].collect().toSet
    assert(sent.toSet.subsetOf(messages))
    // extraction contract: payload keeps extra fields, promoted are columns
    val row = logs.head()
    assert(row.getAs[String]("correlation_id").matches("[0-9a-f-]{36}"))
    assert(row.getAs[String]("data_raw").contains("\"random_timing_data\":1.23"))
    assert(!row.getAs[String]("data_raw").contains("created"))
    // date partition column materialized in storage paths
    assert(Files.list(java.nio.file.Paths.get(s"$root/store/logs")).iterator()
      .hasNext)
    // dead letters captured with reasons
    val dead = store.read(spark, "dead_letter")
    assert(dead.count() == 2)
    assert(dead.select("reason").as[String].collect().toSet ==
      Set("malformed_json", "missing_created"))
  }

  test("checkpointed restart resumes without loss or duplication") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-restart").toString
    val store = new LogStore(s"$root/store")
    val stream = MemoryStream[String]
    val batch1 = (1 to 10).map(i => record(s"pre-$i"))
    val q1 = StreamIngest.start(stream.toDF(), store, s"$root/ckpt",
      sourceFlushGated = true)
    try {
      stream.addData(batch1)
      q1.processAllAvailable()
    } finally q1.stop()

    // same checkpoint, new query instance — the recovery path the
    // reference approximates with retained-batch retry (write.py:80-84)
    val batch2 = (1 to 10).map(i => record(s"post-$i"))
    val q2 = StreamIngest.start(stream.toDF(), store, s"$root/ckpt",
      sourceFlushGated = true)
    try {
      stream.addData(batch2)
      q2.processAllAvailable()
    } finally q2.stop()

    val messages = store.read(spark, "logs")
      .select("message").as[String].collect().toSeq
    assert(messages.length == 20, s"expected 20, got ${messages.length}")
    assert(messages.toSet == ((1 to 10).map(i => s"pre-$i") ++
      (1 to 10).map(i => s"post-$i")).toSet)
  }

  test("metric stream ingests and supports dashboard time-bucket aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-metric").toString
    val store = new LogStore(s"$root/store")
    val stream = MemoryStream[String]
    val q = StreamIngest.startMetric(stream.toDF(), store, s"$root/ckpt",
      sourceFlushGated = true)
    try {
      // metric wire shape: created + free-form numeric payload
      // (reference: metric table, migration:66-78)
      stream.addData((1 to 30).map(i =>
        s"""{"created":${1700000000 + i * 60},"cpu":${i % 10},"host":"h${i % 3}"}"""))
      stream.addData(Seq("{broken"))
      q.processAllAvailable()
    } finally q.stop()

    val metric = store.read(spark, "metric")
    assert(metric.count() == 30)
    assert(metric.columns.toSet.contains("data_raw"))
    // created popped from the payload, like logs promotion
    assert(!metric.head().getAs[String]("data_raw").contains("created"))
    // the Metabase-style line chart: avg cpu per 10-minute bucket
    val series = metric
      .groupBy(window(col("time"), "10 minutes"))
      .agg(avg(get_json_object(col("data_raw"), "$.cpu").cast("double")).as("avg_cpu"))
    assert(series.count() == 4) // 30 minutes of data at 60s spacing -> 4 buckets
    assert(store.read(spark, "dead_letter").count() == 1)
  }

  test("file source with maxFilesPerTrigger rate cap: multiple epochs, no loss") {
    // the reference's size-capped micro-batcher (MAX_BATCH_SIZE,
    // write.py:24-28) maps to source-side rate limiting: 1 file per
    // trigger -> one epoch per file, proven by distinct batch_id partitions
    val root = Files.createTempDirectory("graft-filesrc").toString
    val srcDir = Files.createDirectory(java.nio.file.Paths.get(s"$root/in"))
    (0 until 3).foreach { f =>
      val lines = (0 until 10).map(i => record(s"f$f-r$i"))
      Files.write(srcDir.resolve(s"part-$f.json"),
        String.join("\n", lines: _*).getBytes)
    }
    val store = new LogStore(s"$root/store")
    val raw = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(srcDir.toString)
      .withColumnRenamed("value", "value")
    val q = StreamIngest.start(raw, store, s"$root/ckpt",
      sourceFlushGated = true) // eager polling for test speed; prod file sources keep the age cadence
    try q.processAllAvailable() finally q.stop()

    val logs = store.read(spark, "logs")
    assert(logs.count() == 30)
    // 1 file per trigger -> at least 3 distinct epochs wrote
    assert(logs.select("batch_id").distinct().count() >= 3)
  }

  test("replayed epoch overwrites itself — exactly-once into the file sink") {
    // simulate the failure mode from ADVICE r1: logs append succeeds, the
    // dead-letter append fails, the epoch re-runs. With epoch-keyed dynamic
    // partition overwrite the second run must REPLACE the first run's rows.
    val root = Files.createTempDirectory("graft-idem").toString
    val store = new LogStore(s"$root/store")
    val df = Seq(("a", "2024-01-01"), ("b", "2024-01-02"))
      .toDF("message", "date")
    store.appendIdempotent("logs", df, "logs", batchId = 7L)
    store.appendIdempotent("logs", df, "logs", batchId = 7L) // the retry
    store.appendIdempotent("logs", df.filter($"message" === "a"), "logs", batchId = 8L)

    val got = store.read(spark, "logs")
      .select("message", "batch_id")
      .as[(String, String)].collect().toSeq.sorted
    assert(got == Seq(("a", "logs-7"), ("a", "logs-8"), ("b", "logs-7")), got.toString)
  }

  test("AvailableNow catch-up run drains the source and terminates itself") {
    val root = Files.createTempDirectory("graft-catchup").toString
    val srcDir = Files.createDirectory(java.nio.file.Paths.get(s"$root/in"))
    val lines = (0 until 15).map(i => record(s"c$i"))
    Files.write(srcDir.resolve("backlog.json"),
      String.join("\n", lines: _*).getBytes)
    val store = new LogStore(s"$root/store")
    val raw = spark.readStream.text(srcDir.toString)
    val q = StreamIngest.start(raw, store, s"$root/ckpt", availableNow = true)
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    assert(store.read(spark, "logs").count() == 15)
  }

  test("IngestMetricsListener captures per-batch rows and latency") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-metrics").toString
    val store = new LogStore(s"$root/store")
    val stream = MemoryStream[String]
    val listener = new graft.streaming.IngestMetricsListener
    spark.streams.addListener(listener)
    val q = StreamIngest.start(stream.toDF(), store, s"$root/ckpt",
      sourceFlushGated = true)
    try {
      stream.addData((1 to 20).map(i => record(s"m$i")))
      q.processAllAvailable()
    } finally q.stop()
    // progress events are delivered asynchronously — wait for them
    val deadline = System.nanoTime() + 10e9.toLong
    while (listener.totalRows < 20 && System.nanoTime() < deadline)
      Thread.sleep(50)
    spark.streams.removeListener(listener)
    assert(listener.totalRows == 20, listener.metrics.toString)
    assert(listener.metrics.exists(m => m.rows > 0 && m.durationMs > 0))
    assert(listener.meanRate > 0.0)
  }

  test("two writers sharing a table keep same-numbered epochs separate") {
    // the logs and metric streams both dead-letter into one table; epoch
    // ids are per-checkpoint, so without writer scoping the second
    // stream's epoch 3 would dynamic-overwrite the first's
    val root = Files.createTempDirectory("graft-writers").toString
    val store = new LogStore(s"$root/store")
    store.appendIdempotent("dead_letter", Seq(("x1", "r1")).toDF("raw", "reason"), "logs", 3L)
    store.appendIdempotent("dead_letter", Seq(("x2", "r2")).toDF("raw", "reason"), "metric", 3L)
    val got = store.read(spark, "dead_letter")
      .select("raw", "batch_id").as[(String, String)].collect().toSet
    assert(got == Set(("x1", "logs-3"), ("x2", "metric-3")), got.toString)
  }
}
