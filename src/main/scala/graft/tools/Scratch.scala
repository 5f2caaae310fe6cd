package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostics main for interactive debugging.
  * Currently: time one SparkEntry query by name on a given sf dir,
  * repeated N times (cache cleared between runs, Bench-style).
  *   sbt "runMain graft.tools.Scratch q73_neardup_clusters /root/testdata/sf0.1 2"
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q73_neardup_clusters"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables(spark, sfDir, "lineitem").count() // warm session
    val fn = graft.SparkEntry.queries.get(name)
      .orElse(graft.Bench.benchOnly.toMap.get(name))
      .getOrElse(sys.error(s"unknown query: $name"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"$name run $i: $sec%.3f s ($n rows)")
    }
    spark.stop()
  }
}
