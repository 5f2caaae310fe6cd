package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump one query's result at a given sf for targeted oracle diff. */
object Profile73 {
  def main(args: Array[String]): Unit = {
    val name = args(0); val sfDir = args(1); val out = args(2)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
