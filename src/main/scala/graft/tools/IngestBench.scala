package graft.tools

import org.apache.spark.sql.SparkSession

/** Solo ingest-throughput run: the exact measurement [[graft.Bench]] embeds
  * (4 TCP producers -> PushSocketSource -> StreamIngest -> LogStore, first
  * byte to last row queryable), isolated from the 200-query sweep so a
  * regression can be separated from box contention.
  *   sbt "runMain graft.tools.IngestBench [passes]"
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rates = (1 to passes).map { i =>
      val r = graft.Bench.ingestBench(spark)
      println(f"[ingest-bench] pass $i: $r%.0f rec/s")
      r
    }.sorted
    graft.Bench.lastIngestProgress.foreach { p =>
      println(s"[ingest-bench] last-pass batches=${p.size}")
      p.foreach(println)
    }
    println(f"[ingest-bench] median=${rates(rates.length / 2)}%.0f " +
      f"min=${rates.head}%.0f max=${rates.last}%.0f over $passes passes")
    spark.stop()
  }
}
