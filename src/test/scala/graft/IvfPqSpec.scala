package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** IVFADC composite retrieval (coarse inverted lists + residual PQ + ADC
  * + exact re-rank): recall on the driver's real embeddings, code/list
  * invariants, degenerate full-probe behavior, determinism, and the plan
  * shape (probing is an equi-join, never a nested loop over the corpus).
  */
class IvfPqSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  private def fitted = {
    val centroids = Similarity.kmeansCentroids(emb, k = 8, iters = 0)
    val books = Similarity.pqResidualCodebooks(emb, centroids, m = 8, ksub = 16)
    (centroids, books)
  }

  private def queriesDf(ids: Seq[Long]) = emb
    .filter(col("vec_id").isin(ids: _*))
    .select(col("vec_id").as("query_id"), col("embedding"))

  private def recallAt10(nprobe: Int, rerank: Int): Double = {
    val (centroids, books) = fitted
    val index = Similarity.ivfPqEncode(emb, centroids, books).persist()
    val qids = Seq(0L, 17L, 93L, 211L, 404L)
    val qs = queriesDf(qids)
    val exact = Similarity.topKPerQuery(emb, qs, 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity
      .ivfPqTopKPerQuery(index, centroids, books, qs, 10,
        nprobe = nprobe, rerank = rerank)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val r = qids.map(q =>
      exact(q).intersect(approx.getOrElse(q, Set.empty)).size / 10.0)
    index.unpersist()
    r.sum / r.size
  }

  test("full-probe + full-depth re-rank degenerates to EXACT retrieval") {
    // nprobe = k probes every list and rerank >= |corpus| re-ranks every
    // candidate exactly: quantization can no longer lose anything, so
    // recall must be exactly 1.0 — this pins the retrieval plumbing
    // (probe explode, equi-join, replica dedupe, shortlist join-back)
    val r = recallAt10(nprobe = 8, rerank = 600)
    assert(r == 1.0, f"full-probe full-depth recall $r%.2f is not exact")
  }

  test("partial-probe recall floor (nprobe=4/8, rerank=80)") {
    val r = recallAt10(nprobe = 4, rerank = 80)
    info(f"IVFADC recall@10 at nprobe=4/8: $r%.2f")
    assert(r >= 0.6, f"IVFADC recall $r%.2f below 0.6")
  }

  test("codes and lists are bounded; replicas multiply rows") {
    val (centroids, books) = fitted
    val index = Similarity.ivfPqEncode(emb, centroids, books, replicas = 2)
    val stats = index.agg(
      min(array_min(col("codes"))).as("cmin"),
      max(array_max(col("codes"))).as("cmax"),
      min(size(col("codes"))).as("szmin"),
      max(size(col("codes"))).as("szmax"),
      min(col("cluster")).as("lmin"),
      max(col("cluster")).as("lmax"),
      count(lit(1)).as("rows")).head()
    assert(stats.getAs[Int]("cmin") >= 0 && stats.getAs[Int]("cmax") <= 15)
    assert(stats.getAs[Int]("szmin") == 8 && stats.getAs[Int]("szmax") == 8)
    assert(stats.getAs[Int]("lmin") >= 0 && stats.getAs[Int]("lmax") <= 7)
    assert(stats.getAs[Long]("rows") == emb.count() * 2)
  }

  test("retrieval is deterministic") {
    val a = recallAt10(nprobe = 4, rerank = 80)
    val b = recallAt10(nprobe = 4, rerank = 80)
    assert(a == b)
  }

  test("probing plans as an equi-join, not a nested loop over the corpus") {
    val (centroids, books) = fitted
    val index = Similarity.ivfPqEncode(emb, centroids, books)
    val plan = Similarity
      .ivfPqTopKPerQuery(index, centroids, books,
        queriesDf(Seq(0L, 17L)), 10, nprobe = 4, rerank = 0)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
