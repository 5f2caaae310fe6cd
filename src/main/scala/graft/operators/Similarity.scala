package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`).
  *
  * Two tiers, as a 100 TB design demands:
  *  - [[bruteForceTopK]] — exact cosine top-k: one broadcast of the query
  *    vector, one map-side score, TakeOrderedAndProject for the top-k (no
  *    global sort). Correctness baseline and the right answer for one-off
  *    queries.
  *  - [[lshTopK]] / IVF-style [[bucketedIndex]] — approximate: random
  *    hyperplane signatures partition the corpus into buckets; a query only
  *    scans its own bucket (and optionally neighbors). Index build is one
  *    shuffle; queries touch 1/2^planes of the data.
  *
  * All kernels are pure `functions._` compositions (zip_with + aggregate),
  * fully codegen'd — no UDF serialization in the hot loop.
  */
object Similarity {

  /** Dot product of two float arrays, computed in double precision.
    * Single-pass custom Expression (interpreted zip_with+aggregate is ~5x
    * slower per pair; see VectorOps scaladoc).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.vector_dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = graft.functions.VectorOps.vector_norm(a)

  /** Cosine similarity in [-1, 1]; 0 when either vector is zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Exact brute-force cosine top-k against a literal query vector.
    * The query is a plan literal (broadcast with the task binaries);
    * `orderBy(...).limit(k)` plans as TakeOrderedAndProject — per-partition
    * heaps then a k-row merge on the driver, never a global sort.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      query: Seq[Float],
      k: Int,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val q = array(query.map(lit(_)): _*)
    corpus
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Random-hyperplane signature: bit p = sign of dot(v, plane_p), planes
    * drawn from a deterministic per-(plane, dim) bit-mix — no stored plane
    * matrix, any executor can recompute it (crucial for 100 TB: the "index"
    * is a pure function of the vector). Single-pass custom Expression.
    */
  def hyperplaneSignature(v: Column, planes: Int): Column =
    graft.functions.HyperplaneSig.hyperplane_sig(v, planes)

  /** IVF/LSH-style bucketed index: corpus + signature bucket, repartitioned
    * by bucket so each bucket is co-located. Persist the result (or write
    * it partitioned by `bucket`) and queries prune to one bucket.
    */
  def bucketedIndex(
      corpus: DataFrame,
      planes: Int = 8,
      vecCol: String = "embedding"): DataFrame =
    corpus
      .withColumn("bucket", hyperplaneSignature(col(vecCol), planes))
      .repartition(col("bucket"))

  /** Approximate top-k: score only the query's own LSH bucket.
    * Recall/latency trade is `planes` (bucket granularity); multi-probe =
    * also scan buckets at Hamming distance 1 (set `probeNeighbors`).
    */
  def lshTopK(
      index: DataFrame,
      query: Seq[Float],
      k: Int,
      planes: Int = 8,
      probeNeighbors: Boolean = true,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val qSig = signatureOf(query, planes)
    val buckets: Seq[Long] =
      if (probeNeighbors) qSig +: (0 until planes).map(b => qSig ^ (1L << b))
      else Seq(qSig)
    val q = array(query.map(lit(_)): _*)
    index
      .filter(col("bucket").isin(buckets: _*))
      .select(col(idCol), cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side signature of a literal query vector — must agree bit-for-bit
    * with [[hyperplaneSignature]] (same plane bit-mix, same fold order).
    */
  def signatureOf(query: Seq[Float], planes: Int): Long = {
    import graft.functions.HyperplaneSig.{MixA, MixB}
    (0 until planes).map { p =>
      var s = 0.0
      var i = 0
      while (i < query.length) {
        val sign = if ((((i.toLong * MixA + p.toLong * MixB) >> 17) & 1L) == 0) 1.0 else -1.0
        s += query(i).toDouble * sign
        i += 1
      }
      if (s > 0) 1L << p else 0L
    }.sum
  }
}
