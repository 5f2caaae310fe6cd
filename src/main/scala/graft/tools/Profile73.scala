package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profiler for q73: candidate volume, verify cost, CC loop cost. */
object Profile73 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir, "documents")
    docs.count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // phase 1: LSH candidates at bands=16 (what neardupClusters uses)
    val cands = timed("minhashLsh bands=16 t=0 (cand gen+est)") {
      val c = Dedup.minhashLsh(docs, numHashes = 16, bands = 16, shingleSize = 3, threshold = 0.0)
      println("  cands=" + c.count()); c
    }
    spark.catalog.clearCache()

    // phase 2: full pair list with exact verify
    val pairs = timed("ngramJaccardPairs bands=16 t=0.1") {
      val p = Dedup.ngramJaccardPairs(docs, threshold = 0.1, bands = 16)
      println("  pairs=" + p.count()); p
    }
    spark.catalog.clearCache()

    // phase 3: whole clustering
    timed("neardupClusters total") {
      println("  rows=" + Dedup.neardupClusters(docs, threshold = 0.1).count())
    }
    spark.stop()
  }
}
