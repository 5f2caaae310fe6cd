package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** ProfileJobs for a LIST of queries in one JVM: per-pass wall time plus
  * Spark job count and per-job durations — separates fixed driver-side
  * job overhead (collect rounds, broadcast builds) from data volume
  * without one sbt launch per query.
  *   SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.ProfileMany /root/testdata/sf0.1 2 q160_edit_join q236_substr_pairs"
  */
object ProfileMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables(spark, sfDir, "lineitem").count() // warm session
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.getOrDefault(je.jobId, je.time)
        jobs.add((je.jobId, je.time - s))
      }
    })
    val byName = graft.SparkEntry.queries ++ graft.Bench.benchOnly.toMap
    names.foreach { name =>
      val fn = byName.getOrElse(name, sys.error(s"unknown query: $name"))
      for (p <- 1 to passes) {
        jobs.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        import scala.jdk.CollectionConverters._
        val js = jobs.asScala.toSeq.sortBy(_._1)
        println(f"[profile] $name pass $p: $secs%.2f s, rows=$n, " +
          s"jobs=${js.size}, job_ms=${js.map(_._2).mkString(",")}")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
