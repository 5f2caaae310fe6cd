package graft

import java.sql.DriverManager

/** BI serving endpoint e2e — the Metabase-hookup analog (reference:
  * doc/metabase-instructions.rst:1-23): an EXTERNAL JDBC client connects
  * to the HiveServer2 Thrift endpoint over the real wire protocol and
  * queries graft tables + custom SQL functions, exactly how a BI tool
  * would.
  */
class SqlGatewaySpec extends SparkSpec {

  test("external JDBC client queries tables and graft functions over Thrift") {
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    // the HiveServer2 session manager mutates the served session's confs
    // (java8 datetime API among them); snapshot what other suites rely on
    val java8Api = spark.conf.getOption("spark.sql.datetime.java8API.enabled")
    val server = graft.tools.SqlGateway.start(spark, sf(), port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val deadline = System.currentTimeMillis() + 60000
      var conn: java.sql.Connection = null
      while (conn == null && System.currentTimeMillis() < deadline) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/", "", "")
        catch { case _: Exception => Thread.sleep(500) }
      }
      assert(conn != null, s"no JDBC connection to localhost:$port within 60s")
      try {
        val st = conn.createStatement()
        // a BI tool's bread-and-butter: aggregate over a served table
        val rs = st.executeQuery(
          "SELECT count(*) AS n, count(DISTINCT event_type) AS k FROM events")
        assert(rs.next() && rs.getLong(1) > 0 && rs.getLong(2) > 0)
        // the custom function surface is served too
        val rs2 = st.executeQuery(
          "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        assert(rs2.next() && math.abs(rs2.getDouble(1) - 11.0) < 1e-9)
        // join across served views, ordered — a dashboard query shape
        val rs3 = st.executeQuery(
          "SELECT r.r_name, count(*) AS n FROM nation n " +
            "JOIN region r ON n.n_regionkey = r.r_regionkey " +
            "GROUP BY r.r_name ORDER BY r.r_name LIMIT 3")
        assert(rs3.next() && rs3.getLong(2) > 0)
        // the audit shelf is served as named views: the r13/r14 drift
        // screen read over JDBC, the way a governance dashboard reads it
        val rs4 = st.executeQuery(
          "SELECT count(*) AS n, sum(CASE WHEN reject THEN 1 ELSE 0 END) AS k " +
            "FROM ks_screen")
        assert(rs4.next() && rs4.getLong(1) > 0)
        val rs5 = st.executeQuery("SELECT * FROM governance_card")
        assert(rs5.next(), "governance_card view returned no row")
        assert(rs5.getMetaData.getColumnCount > 5)
        // the session-15 shelf: the composition card and the Holm screen
        // read over the same wire
        val rs6 = st.executeQuery(
          "SELECT k_groups, hhi_bp FROM composition")
        assert(rs6.next() && rs6.getLong(1) > 1 && rs6.getLong(2) > 0)
        val rs7 = st.executeQuery(
          "SELECT count(*), sum(CASE WHEN reject THEN 1 ELSE 0 END) " +
            "FROM holm_screen")
        assert(rs7.next() && rs7.getLong(1) > 0)
      } finally conn.close()
    } finally {
      server.close()
      java8Api match {
        case Some(v) => spark.conf.set("spark.sql.datetime.java8API.enabled", v)
        case None => spark.conf.unset("spark.sql.datetime.java8API.enabled")
      }
    }
  }
}
