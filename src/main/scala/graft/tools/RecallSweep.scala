package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off recall sweep for the IVF index knobs (iters, replicas, nprobe):
  * prints mean recall@10 over a fixed query set so the defaults in
  * [[Similarity]] are measured choices, not guesses.
  * Usage: runMain graft.tools.RecallSweep [sfDir]
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables(spark, sfDir, "embeddings").persist()
    val queryIds = Seq(0L, 17L, 93L, 211L, 404L, 888L, 1201L, 1777L)
      .filter(id => emb.filter(col("vec_id") === id).count() > 0)
    val exactTop = queryIds.map { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding")).head().getSeq[Float](0)
      qid -> (q, Similarity.bruteForceTopK(emb.filter(col("vec_id") =!= qid), q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet)
    }.toMap
    for (iters <- Seq(2, 3, 4); replicas <- Seq(2, 3); nprobe <- Seq(4)) {
      val centroids = Similarity.kmeansCentroids(emb, k = 16, iters = iters)
      val index = Similarity.ivfIndex(emb, centroids, replicas = replicas).persist()
      index.count()
      val recalls = queryIds.map { qid =>
        val (q, exact) = exactTop(qid)
        val approx = Similarity.ivfTopK(index.filter(col("vec_id") =!= qid), centroids, q, 10, nprobe = nprobe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        exact.intersect(approx).size / 10.0
      }
      println(f"RECALL iters=$iters replicas=$replicas nprobe=$nprobe -> ${recalls.sum / recalls.size}%.3f")
      index.unpersist()
    }
    spark.stop()
  }
}
