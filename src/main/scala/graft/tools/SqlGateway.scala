package graft.tools

import graft.{GraftSqlFunctions, Tables}
import org.apache.spark.sql.SparkSession

/** BI serving endpoint — the engine analog of the reference's Metabase
  * hookup (reference: doc/metabase-instructions.rst:1-23, where analysts
  * point a BI tool at the Postgres port and query `logs`/`metric` over
  * SQL). Here the wire is HiveServer2 Thrift: any JDBC/ODBC client
  * (Metabase, DBeaver, beeline, Tableau) connects to
  * `jdbc:hive2://host:port/` and sees every graft table as a view plus
  * all custom functions (`word_shingles`, `vector_dot`, ...) on the SQL
  * surface.
  *
  * Usage: `runMain graft.tools.SqlGateway [sfDir] [port]` — blocks
  * serving until killed. At cluster scale the same two lines sit in the
  * long-running driver of a shared Spark application (or the queries move
  * to Spark Connect — `spark-connect_2.13` ships in the same jars dir —
  * for multiplexed remote sessions; the serving surface is identical SQL
  * either way).
  */
object SqlGateway {

  /** Audit-shelf views served to the BI consumer: the governance card and
    * the drift/calibration/fairness tables behind it, named the way a
    * dashboard reads them. Each view is the registered query's LOGICAL
    * plan (no materialization here — the gateway session computes it per
    * request, so a dashboard always reads the data as of its own query;
    * a deployment that prefers snapshots caches or CTAS-es the views).
    */
  val auditViews: Map[String, String] = Map(
    "governance_card" -> "q217_governance_card",
    "calibration" -> "q216_grouped_calibration",
    "fairness_audit" -> "q213_fairness_audit",
    "psi_drift" -> "q211_psi",
    "score_drift" -> "q215_score_drift",
    "ks_screen" -> "q232_fdr_screen",
    "w1_screen" -> "q235_w1_screen",
    "delta_screen" -> "q241_delta_screen",
    "ad_omnibus" -> "q239_ad_ksample",
    "effect_sizes" -> "q240_effect_sizes",
    "weekday_trend" -> "q242_jt_trend",
    "retention_logrank" -> "q243_logrank",
    "rate_trend" -> "q244_ca_trend",
    "adjusted_association" -> "q245_mantel_haenszel",
    "or_homogeneity" -> "q247_breslow_day",
    "drift_card" -> "q249_drift_card",
    "daily_trend" -> "q251_mk_trend",
    "change_point" -> "q252_pettitt",
    "whiteness" -> "q253_ljung_box",
    "randomness" -> "q254_runs_test",
    "posthoc_pairs" -> "q255_dunn_posthoc",
    "normality_screen" -> "q257_jarque_bera",
    "holm_screen" -> "q258_holm_screen",
    "composition" -> "q260_composition",
    "association" -> "q265_assoc_card",
    "auc_interval" -> "q266_auc_ci",
    "weekend_lift" -> "q269_two_by_two")

  /** Register every test table plus the graft function surface on the
    * session, then start a Thrift endpoint on `port`. Returns after the
    * server is up (callers block themselves — the spec stops it, `main`
    * sleeps forever).
    */
  def start(spark: SparkSession, sfDir: String, port: Int): AutoCloseable = {
    Tables.names.foreach { t =>
      Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }
    auditViews.foreach { case (view, q) =>
      graft.SparkEntry.queries(q)(spark, sfDir).createOrReplaceTempView(view)
    }
    GraftSqlFunctions.register(spark)
    spark.sqlContext.setConf("hive.server2.thrift.port", port.toString)
    spark.sqlContext.setConf("hive.server2.thrift.bind.host", "localhost")
    org.apache.spark.sql.hive.thriftserver.GraftThriftBridge
      .start(spark.sqlContext)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val port = if (args.length > 1) args(1).toInt else 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sql-gateway")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    start(spark, sfDir, port)
    println(s"graft SQL gateway serving jdbc:hive2://localhost:$port/")
    Thread.sleep(Long.MaxValue)
  }
}
