package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

/** Scratch: stage-size + phase-time breakdown of the cross-split leakage
  * sweep (q57) — candidate volume before/after the straddle pushdown.
  */
object ProfileLeakage {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (pass <- 1 to 2) {
      println(s"=== pass $pass ===")
      val docs = graft.Tables(spark, sfDir, "documents")
      val n = 3; val numHashes = 32; val bands = 32
      val sigs = docs
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id").as("id"),
          Dedup.minhashSignature(col("text"), numHashes, n).as("sig"))
        .persist()
      phase("sigs") { sigs.count() }
      val banded = sigs.select(col("id"), posexplode(col("sig")))
        .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_hash")
      val a = banded.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
      val b = banded.select(col("band_id"), col("band_hash"), col("id").as("id_b"))
      val rawPairs = a.join(b, Seq("band_id", "band_hash")).filter(col("id_a") < col("id_b"))
      val nRaw = phase("raw-collisions") { rawPairs.count() }
      val straddling = rawPairs.filter(
        Sampling.splitLabel(col("id_a"), 90) =!= Sampling.splitLabel(col("id_b"), 90))
      val nStraddle = phase("straddle-collisions") { straddling.count() }
      val cands = straddling.select(col("id_a"), col("id_b")).distinct()
      val nCand = phase("distinct-cands") { cands.count() }
      val sh = docs.select(col("doc_id"),
        array_sort(transform(Dedup.shingles(col("text"), n), s => xxhash64(s))).as("hs"))
        .withColumn("sz", size(col("hs")))
        .persist()
      phase("sh") { sh.count() }
      val inter = graft.functions.SortedIntersect
        .sorted_intersect_count(col("hs_a"), col("hs_b")).cast("double")
      val union = (col("sz_a") + col("sz_b")).cast("double") - inter
      val out = phase("verify") {
        cands
          .join(sh.select(col("doc_id").as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a")).hint("SHUFFLE_HASH"), "id_a")
          .join(sh.select(col("doc_id").as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b")).hint("SHUFFLE_HASH"), "id_b")
          .select(col("id_a"), col("id_b"),
            when(union === 0, lit(0.0)).otherwise(inter / union).as("jaccard"))
          .filter(col("jaccard") >= 0.1)
          .count()
      }
      println(s"raw=$nRaw straddle=$nStraddle cands=$nCand out=$out")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
