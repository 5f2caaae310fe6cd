package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch: run one query N times and report per-pass wall time plus the
  * Spark JOB count and per-job durations — the diagnostic for fixed
  * driver-side job costs (sequential k-means/CC rounds) that per-query
  * wall time alone can't separate from data volume.
  *   sbt "runMain graft.tools.ProfileJobs q100_semantic_dedup /root/testdata/sf0.1 3"
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1)
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    for (p <- 1 to passes) {
      jobs.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(f"[profile] pass $p: $secs%.2f s, rows=$n, jobs=${js.size}, " +
        s"job_ms=${js.map(_._2).mkString(",")}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
