package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  test("codebooks: shape, determinism, and subspace locality") {
    val emb = Tables(spark, sf(), "embeddings")
    val books = Similarity.pqCodebooks(emb, m = 8, ksub = 16)
    assert(books.length == 8)
    assert(books.forall(_.length == 16))
    assert(books.forall(_.forall(_.length == 8))) // dim 64 / m 8
    val again = Similarity.pqCodebooks(emb, m = 8, ksub = 16)
    assert(books.flatten.flatten.toSeq == again.flatten.flatten.toSeq,
      "pool seeding and Lloyd are deterministic")
  }

  test("encode: m codes per row, all within [0, ksub)") {
    val emb = Tables(spark, sf(), "embeddings")
    val books = Similarity.pqCodebooks(emb, m = 8, ksub = 16)
    val enc = Similarity.pqEncode(emb, books)
    val (szMin, szMax, cMin, cMax) = enc.agg(
      min(size(col("codes"))), max(size(col("codes"))),
      min(array_min(col("codes"))), max(array_max(col("codes"))))
      .as[(Int, Int, Int, Int)].head()
    assert(szMin == 8 && szMax == 8 && cMin >= 0 && cMax < 16)
  }

  test("ADC approximates the true cosine: per-pair error bounded") {
    val emb = Tables(spark, sf(), "embeddings")
    val books = Similarity.pqCodebooks(emb, m = 8, ksub = 16)
    val enc = Similarity.pqEncode(emb, books).persist()
    // reconstruct each vector from its codes and compare the implied
    // cosine against the true one on a sample of pairs
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val pq = Similarity.pqTopKPerQuery(enc, books, queries, 20)
    val joined = pq.join(
        emb.select(col("vec_id"), col("embedding").as("cv")), "vec_id")
      .join(queries.select(col("query_id"), col("embedding").as("qv")),
        "query_id")
      .select(col("cos").as("approx"),
        Similarity.cosine(col("cv"), col("qv")).as("exact"))
    val maxErr = joined.agg(max(abs(col("approx") - col("exact")))).as[Double].head()
    assert(maxErr < 0.4, s"ADC cosine error $maxErr out of band")
    enc.unpersist()
  }

  test("recall vs exact top-10 clears the q153 floor with margin") {
    val emb = Tables(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 10)
    val exact = Similarity.topKPerQuery(corpus, queries, 10)
    val books = Similarity.pqCodebooks(corpus, m = 8, ksub = 16)
    val enc = Similarity.pqEncode(corpus, books)
    val pq = Similarity.pqTopKPerQuery(enc, books, queries, 10, rerank = 80)
    val hits = pq.select("query_id", "vec_id")
      .join(exact.select("query_id", "vec_id"), Seq("query_id", "vec_id"))
      .count()
    val recall = hits.toDouble / (10 * 10)
    info(s"PQ recall@10 (m=8, ksub=16, rerank=80, dim=64): $recall")
    assert(recall >= 0.6, s"recall $recall under the q153 floor")
  }

  test("finer codebooks monotonically improve reconstruction") {
    val emb = Tables(spark, sf(), "embeddings")
    def avgTopCos(ksub: Int): Double = {
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") >= 5)
      val books = Similarity.pqCodebooks(corpus, m = 8, ksub = ksub)
      val enc = Similarity.pqEncode(corpus, books)
      val exact = Similarity.topKPerQuery(corpus, queries, 10)
      Similarity.pqTopKPerQuery(enc, books, queries, 10)
        .select("query_id", "vec_id")
        .join(exact.select("query_id", "vec_id"), Seq("query_id", "vec_id"))
        .count().toDouble
    }
    val coarse = avgTopCos(4)
    val fine = avgTopCos(32)
    info(s"recall hits: ksub=4 -> $coarse, ksub=32 -> $fine")
    assert(fine >= coarse, "more centroids per subspace can't hurt recall here")
  }
}
