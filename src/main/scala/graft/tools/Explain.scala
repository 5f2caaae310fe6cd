package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan and repeated timings for
  * one SparkEntry query. Usage:
  *   runMain graft.tools.Explain <queryName> [sfDir] [reps]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables(spark, sfDir, "lineitem").count() // session warm-up
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"===== $name @ $sfDir =====")
    df.explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"TIMING rep$i: ${(System.nanoTime() - t0) / 1e9}%.3fs rows=$n")
    }
    spark.stop()
  }
}
