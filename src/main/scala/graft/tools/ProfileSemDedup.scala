package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Scratch: phase-level job/time breakdown of semanticDedup at one sf. */
object ProfileSemDedup {
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
      val emb = graft.Tables(spark, sfDir, "embeddings")
      val k = 16; val threshold = 0.35; val replicas = 3
      val vecCol = "embedding"; val idCol = "vec_id"
      val centroids = phase("kmeans") {
        Similarity.kmeansCentroids(emb, k, iters = 0)
      }
      val rawNorm = Similarity.norm(col(vecCol))
      val base = emb.select(col(idCol), col(vecCol),
        when(rawNorm === 0, lit(1.0)).otherwise(rawNorm).as("nrm"))
      val scoredArr = sort_array(array(centroids.zipWithIndex.map { case (c, i) =>
        struct((Similarity.dot(col(vecCol), array(c.map(lit(_)): _*)) /
          col("nrm")).as("s"), lit(i).as("i"))
      }: _*), asc = false)
      val assigned = base
        .withColumn("_top", slice(scoredArr, 1, math.min(replicas, centroids.length)))
        .select(col(idCol), col(vecCol), col("nrm"),
          element_at(col("_top"), 1).getField("i").as("cluster"),
          element_at(col("_top"), 1).getField("s").as("centroid_cos"),
          transform(col("_top"), t => t.getField("i")).as("_clusters"))
        .persist()
      phase("assign-materialize") { assigned.count() }
      val replicated = assigned
        .select(col(idCol), col(vecCol), col("nrm"),
          explode(col("_clusters")).as("rcluster"))
        .repartition(col("rcluster"))
      val pairs = phase("pairs-checkpoint") {
        replicated
          .select(col("rcluster"), col(idCol).as("id_a"),
            col(vecCol).as("v_a"), col("nrm").as("nrm_a"))
          .join(replicated.select(col("rcluster"), col(idCol).as("id_b"),
            col(vecCol).as("v_b"), col("nrm").as("nrm_b")), Seq("rcluster"))
          .filter(col("id_a") < col("id_b"))
          .filter(Similarity.dot(col("v_a"), col("v_b")) /
            (col("nrm_a") * col("nrm_b")) >= threshold)
          .select(col("id_a"), col("id_b"))
          .distinct()
          .localCheckpoint()
      }
      println(s"pairs=${pairs.count()}")
      val labels = phase("cc") { Dedup.connectedComponents(pairs).localCheckpoint() }
      val winners = labels
        .join(assigned.select(col(idCol).as("id"), col("centroid_cos")), "id")
        .groupBy(col("lbl"))
        .agg(min_by(col("id"), struct(col("centroid_cos"), col("id"))).as("keep_id"))
      val n = phase("finish") {
        assigned
          .join(labels.select(col("id").as(idCol), col("lbl")), Seq(idCol), "left")
          .join(winners, Seq("lbl"), "left")
          .select(col(idCol), col("cluster"),
            coalesce(col("lbl"), col(idCol)).as("component_id"),
            round(col("centroid_cos"), 4).as("centroid_cos"),
            coalesce(col(idCol) === col("keep_id"), lit(true)).as("keep"))
          .count()
      }
      println(s"rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
