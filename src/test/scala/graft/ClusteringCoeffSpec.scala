package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

/** Local clustering coefficient: hand graphs through the edge kernel
  * (triangle = 1.0, path = 0.0, asymmetric edges drop at mutualization)
  * and corpus-level invariants through the full kNN build.
  */
class ClusteringCoeffSpec extends SparkSpec {
  import spark.implicits._

  private def coeff(nodes: Seq[Long], directed: Seq[(Long, Long)]) =
    Graphs.clusteringCoefficientFromEdges(
      nodes.toDF("vec_id"), directed.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  private def bidir(pairs: (Long, Long)*): Seq[(Long, Long)] =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("a mutual triangle scores 1.0 everywhere") {
    val out = coeff(Seq(1L, 2L, 3L), bidir((1L, 2L), (2L, 3L), (1L, 3L)))
    Seq(1L, 2L, 3L).foreach { v =>
      assert(out(v) == ((2L, 1L, 1.0)))
    }
  }

  test("a path has no triangles; endpoints below degree 2 score 0") {
    val out = coeff(Seq(1L, 2L, 3L), bidir((1L, 2L), (2L, 3L)))
    assert(out(2L) == ((2L, 0L, 0.0)))
    assert(out(1L) == ((1L, 0L, 0.0)))
  }

  test("asymmetric edges drop at mutualization") {
    // 1->2 one-way only: the pair contributes nothing
    val out = coeff(Seq(1L, 2L, 3L),
      bidir((2L, 3L)) ++ Seq((1L, 2L)))
    assert(out(1L) == ((0L, 0L, 0.0)))
    assert(out(2L)._1 == 1L)
  }

  test("square without diagonals: degree 2, zero triangles") {
    val out = coeff(Seq(1L, 2L, 3L, 4L),
      bidir((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    Seq(1L, 2L, 3L, 4L).foreach(v => assert(out(v) == ((2L, 0L, 0.0))))
  }

  test("square plus one diagonal: the diagonal nodes close two wedges") {
    val out = coeff(Seq(1L, 2L, 3L, 4L),
      bidir((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    // nodes 2 and 4: degree 2, their two neighbors (1,3) are linked -> 1.0
    assert(out(2L) == ((2L, 1L, 1.0)))
    assert(out(4L) == ((2L, 1L, 1.0)))
    // nodes 1 and 3: degree 3, 2 closed wedges of 3 -> 2*2/(3*2) = 0.6667
    assert(out(1L) == ((3L, 2L, 0.6667)))
    assert(out(3L) == ((3L, 2L, 0.6667)))
  }

  test("corpus kNN coefficients are bounded and complete") {
    val emb = Tables(spark, sf(), "embeddings")
    val out = Graphs.clusteringCoefficient(emb, k = 5)
    assert(out.count() == emb.count())
    val bad = out.filter(col("coefficient") < 0.0 || col("coefficient") > 1.0).count()
    assert(bad == 0L)
    // degree is capped by k after mutualization
    assert(out.agg(max(col("degree"))).head().getLong(0) <= 5L)
  }
}
