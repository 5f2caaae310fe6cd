package org.apache.spark.sql.hive.thriftserver

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.classic

/** Bridge into the package-private Thrift server entry point (the same
  * standard idiom as `org.apache.spark.sql.GraftBridge` for
  * ExpressionUtils): `HiveThriftServer2.startWithContext` is
  * `private[hive]`, so the one-line hop lives in this package and
  * `graft.tools.SqlGateway` stays in graft's own namespace.
  */
object GraftThriftBridge {

  /** Start a HiveServer2 Thrift endpoint bound to the session behind
    * `sqlContext`, in single-session mode (every JDBC connection shares
    * that session's temp views and registered functions — the served
    * catalog IS the gateway session). The single-session flag is a static
    * SQL conf, unreachable through RuntimeConfig on a live session, which
    * is the second reason this bridge exists. Returns a handle whose
    * `close()` stops the server.
    */
  def start(sqlContext: SQLContext): AutoCloseable = {
    sqlContext.sparkSession match {
      case s: classic.SparkSession =>
        s.sessionState.conf.setConfString(
          "spark.sql.hive.thriftServer.singleSession", "true")
      case _ => // non-classic session: server falls back to per-connection sessions
    }
    val server = HiveThriftServer2.startWithContext(sqlContext)
    new AutoCloseable { override def close(): Unit = server.stop() }
  }
}
