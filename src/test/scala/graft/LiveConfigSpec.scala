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

  test("secret masking: passwordish keys print first char + Xs, others verbatim") {
    import graft.streaming.LiveConfig
    // the reference's exact scheme (settings.py:10,88-91)
    assert(LiveConfig.mask("db_password", "hunter2") == "hXXXXXX")
    assert(LiveConfig.mask("PASS_PHRASE", "abc") == "aXX")
    assert(LiveConfig.mask("consul_pw", "x") == "x")
    assert(LiveConfig.mask("secret", "") == "")      // empty value: no crash
    assert(LiveConfig.mask("max_batch_size", "42") == "42") // not a secret
  }

  test("log-level hot-update applies to live loggers; bad entries skipped") {
    import graft.streaming.LiveConfig
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.config.Configurator
    val name = s"graft.test.dyn${UUID.randomUUID().toString.take(8)}"
    Configurator.setLevel(name, Level.WARN)
    val applied = LiveConfig.applyLogLevels(
      s"$name=DEBUG, bogus_no_equals, other=NOT_A_LEVEL")
    assert(applied == Seq((name, "WARN", "DEBUG")))
    assert(LogManager.getLogger(name).getLevel == Level.DEBUG)
    // unchanged level -> skipped (reference settings.py:116-118)
    assert(LiveConfig.applyLogLevels(s"$name=DEBUG").isEmpty)
  }

  test("FromFile applies log_levels from the config file on refresh") {
    import org.apache.logging.log4j.{Level, LogManager}
    val name = s"graft.test.file${UUID.randomUUID().toString.take(8)}"
    val f = Files.createTempFile("graft-cfg-lvl", ".properties")
    Files.writeString(f, s"log_levels=$name=ERROR\nmax_batch_size=9\n")
    val src = new ConfigSource.FromFile(f.toString, ttlMs = 0)
    assert(src.current().maxBatchSize == 9)
    assert(LogManager.getLogger(name).getLevel == Level.ERROR)
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
      availableNow = false, sourceFlushGated = true)
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
