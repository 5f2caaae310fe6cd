package graft

import graft.model.IngestConfig
import graft.store.LogStore
import graft.streaming.{ConfigSource, StreamIngest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.{Files, Paths}
import java.util.UUID

/** Live config refresh — the Consul hot-reload analog
  * (reference: venus/settings.py:44-127): a changed ignore-list applies on
  * the NEXT micro-batch without restarting the query, and a bad config
  * file keeps the last good settings.
  */
class LiveConfigSpec extends SparkSpec {
  import spark.implicits._

  private def record(msg: String): String =
    s"""{"created":${System.currentTimeMillis() / 1000.0},"message":"$msg",""" +
      s""""correlation_id":"${UUID.randomUUID()}","filename":"sender.py","custom_field":7}"""

  test("FromFile parses knobs, keeps last good on malformed or missing file") {
    val f = Files.createTempFile("graft-cfg", ".properties")
    Files.writeString(f, "drop_fields=a, b ,c\nmax_batch_size=42\n")
    val src = new ConfigSource.FromFile(f.toString, ttlMs = 0)
    val c1 = src.current()
    assert(c1.dropFields == Seq("a", "b", "c"))
    assert(c1.maxBatchSize == 42)
    // absent key keeps fallback default
    assert(c1.maxBatchAgeSeconds == IngestConfig().maxBatchAgeSeconds)

    // malformed value -> previous config stays live (settings.py:62-69)
    Files.writeString(f, "max_batch_size=not_a_number\n")
    assert(src.current() == c1)
    Files.delete(f)
    assert(src.current() == c1)
  }

  test("FromFile honors the poll TTL") {
    val f = Files.createTempFile("graft-cfg-ttl", ".properties")
    Files.writeString(f, "max_batch_size=1\n")
    val src = new ConfigSource.FromFile(f.toString, ttlMs = 60000)
    assert(src.current().maxBatchSize == 1)
    Files.writeString(f, "max_batch_size=2\n")
    // within the TTL the cached value is served — no re-read per record
    assert(src.current().maxBatchSize == 1)
  }

  test("ignore-list change applies on the next micro-batch, no restart") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-livecfg").toString
    val store = new LogStore(s"$root/store")
    val stream = MemoryStream[String]
    val cfgFile = Paths.get(root, "ingest.properties")
    // start with the default ignore-list: custom_field survives in payload
    Files.writeString(cfgFile,
      "drop_fields=" + IngestConfig.DefaultDropFields.mkString(",") + "\n")
    val src = new ConfigSource.FromFile(cfgFile.toString, ttlMs = 0)

    val q = StreamIngest.start(stream.toDF(), store, s"$root/ckpt", src,
      availableNow = false)
    try {
      stream.addData(Seq(record("before-reload")))
      q.processAllAvailable()
      // hot config push: also project away custom_field
      Files.writeString(cfgFile,
        "drop_fields=" + (IngestConfig.DefaultDropFields :+ "custom_field")
          .mkString(",") + "\n")
      stream.addData(Seq(record("after-reload")))
      q.processAllAvailable()
    } finally q.stop()

    val logs = store.read(spark, "logs")
      .select($"message", $"data_raw").as[(String, String)].collect().toMap
    assert(logs("before-reload").contains("custom_field"))
    assert(!logs("after-reload").contains("custom_field"),
      "new ignore-list must apply from the next batch onward")
  }
}
