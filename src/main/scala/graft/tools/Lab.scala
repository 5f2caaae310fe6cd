package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for stage-by-stage timing experiments during the
  * optimization rounds. Contents change per experiment; not a runtime
  * surface.
  */
object Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables(spark, sfDir, "lineitem").count()
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[lab] $label pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    import graft.operators.Similarity
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 10).persist()
    corpus.count()
    time("exact topK")(Similarity.topKPerQuery(corpus, queries, 10).count())
    val t0 = System.nanoTime()
    val cents = Similarity.kmeansCentroids(corpus, k = 8, iters = 0)
    println(f"[lab] kmeansCentroids: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val t1 = System.nanoTime()
    val books = Similarity.pqResidualCodebooks(corpus, cents, m = 8, ksub = 16)
    println(f"[lab] pqResidualCodebooks: ${(System.nanoTime() - t1) / 1e9}%.3f s")
    val index = Similarity.ivfPqEncode(corpus, cents, books).persist()
    time("ivfPqEncode materialize")(index.count())
    time("ivfPqTopK")(Similarity.ivfPqTopKPerQuery(index, cents, books,
      queries, 10, nprobe = 4, rerank = 80).count())
    spark.stop()
  }
}
