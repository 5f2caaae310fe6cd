package graft

import org.apache.spark.sql.connect.service.SparkConnectService

/** End-to-end Spark Connect serving twin of [[SqlGatewaySpec]]: the same
  * engine session exposed over the OTHER public wire — gRPC/Spark Connect
  * (multiplexed BI/notebook access) next to the Thrift HiveServer2 path.
  * A REAL spark-connect JVM client (the decoupled client library, not the
  * server-side classes) connects over a TCP socket, runs q38's CTE SQL
  * against the host session's registered view, and must get bit-identical
  * rows to the in-process run.
  *
  * Views are registered GLOBAL temp views: Connect serves each client
  * from its own forked session, and global_temp is the application-wide
  * namespace those sessions share — the same discipline a production
  * gateway would use for shared relations.
  */
class ConnectGatewaySpec extends SparkSpec {

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("q38's CTE SQL round-trips through a real spark-connect client") {
    val port = freePort()
    val sc = spark.sparkContext // initialize the lazy session (and SparkEnv) first
    // the binding port is a SparkConf (not SQL-conf) entry read at service
    // start; the live conf is reachable through SparkEnv
    org.apache.spark.SparkEnv.get.conf.set("spark.connect.grpc.binding.port", port.toString)
    SparkConnectService.start(sc)
    try {
      Tables(spark, sf(), "events").createOrReplaceGlobalTempView("events_cx")
      val sql =
        """WITH daily AS (
          |  SELECT CAST(ts AS DATE) AS day, user_id, count(*) AS n
          |  FROM global_temp.events_cx GROUP BY 1, 2
          |)
          |SELECT day, count(*) AS active_users, sum(n) AS total_events
          |FROM daily
          |WHERE n > (SELECT avg(n) FROM daily)
          |GROUP BY day ORDER BY day""".stripMargin
      val want = spark.sql(sql).collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSeq
      assert(want.nonEmpty, "q38 over the test table must produce rows")

      val client = org.apache.spark.sql.connect.SparkSession.builder()
        .remote(s"sc://localhost:$port")
        .create()
      try {
        val got = client.sql(sql).collect()
          .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2))).toSeq
        assert(got == want)
        // the wire is a full DataFrame API, not just SQL strings: the same
        // relation composed remotely must agree with the SQL run
        val remoteCount = client.table("global_temp.events_cx").count()
        assert(remoteCount == Tables(spark, sf(), "events").count())
      } finally client.close()
    } finally SparkConnectService.stop()
  }
}
