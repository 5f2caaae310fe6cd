package graft.streaming

import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.streaming.StreamingQuery

/** TCP health endpoint — the reference's aiohealthcheck analog
  * (reference: venus/main.py:40-47, port at settings.py:12-13): a trivial
  * listener that answers `ok` to any connection while the ingest is
  * healthy, `fail` otherwise, then closes. Liveness probes (k8s-style TCP
  * or content checks) point here; telemetry beyond liveness lives in
  * [[IngestMetricsListener]].
  *
  * Runs one daemon accept-thread entirely off the query's hot path; the
  * health predicate is sampled per connection. `close()` is idempotent.
  */
final class HealthEndpoint private (server: ServerSocket, running: AtomicBoolean) {
  /** Bound port (useful when constructed with port 0 = ephemeral). */
  def port: Int = server.getLocalPort

  def close(): Unit = {
    running.set(false)
    try server.close() catch { case scala.util.control.NonFatal(_) => }
  }
}

object HealthEndpoint {

  /** Serve `healthy()` on `port` (0 = pick an ephemeral port). */
  def serve(healthy: () => Boolean, port: Int = 0): HealthEndpoint = {
    val server = new ServerSocket()
    server.bind(new InetSocketAddress(port))
    val running = new AtomicBoolean(true)
    val t = new Thread(() => {
      while (running.get()) {
        try {
          val sock = server.accept()
          try {
            val status = if (healthy()) "ok\n" else "fail\n"
            sock.getOutputStream.write(status.getBytes(StandardCharsets.UTF_8))
            sock.getOutputStream.flush()
          } finally sock.close()
        } catch {
          case scala.util.control.NonFatal(_) => // accept aborted on close()
        }
      }
    }, s"graft-health-${server.getLocalPort}")
    t.setDaemon(true)
    t.start()
    new HealthEndpoint(server, running)
  }

  /** Health = the streaming query is active and has thrown no exception —
    * the ingest-service liveness the reference's `ok` stands for.
    */
  def forQuery(query: StreamingQuery, port: Int = 0): HealthEndpoint =
    serve(() => query.isActive && query.exception.isEmpty, port)
}
