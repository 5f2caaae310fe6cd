package graft

import graft.store.LogStore
import graft.streaming.{HealthEndpoint, StreamIngest}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.file.Files

/** TCP health endpoint (reference: venus/main.py:40-47 answers `ok`). */
class HealthEndpointSpec extends SparkSpec {
  import spark.implicits._

  private def probe(port: Int): String = {
    val sock = new Socket("127.0.0.1", port)
    try {
      val r = new BufferedReader(new InputStreamReader(sock.getInputStream))
      r.readLine()
    } finally sock.close()
  }

  test("answers ok while healthy, fail after, and closes cleanly") {
    @volatile var healthy = true
    val ep = HealthEndpoint.serve(() => healthy)
    try {
      assert(probe(ep.port) == "ok")
      assert(probe(ep.port) == "ok") // serves repeat probes
      healthy = false
      assert(probe(ep.port) == "fail")
    } finally ep.close()
    ep.close() // idempotent
    intercept[Exception](probe(ep.port))
  }

  test("forQuery tracks an ingest query's liveness") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-health").toString
    val store = new LogStore(s"$root/store")
    val stream = MemoryStream[String]
    val q = StreamIngest.start(stream.toDF(), store, s"$root/ckpt",
      sourceFlushGated = true)
    val ep = HealthEndpoint.forQuery(q)
    try {
      assert(probe(ep.port) == "ok")
      q.stop()
      assert(probe(ep.port) == "fail")
    } finally {
      ep.close()
      if (q.isActive) q.stop()
    }
  }
}
