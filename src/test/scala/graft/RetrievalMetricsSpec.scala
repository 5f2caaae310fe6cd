package graft

import graft.operators.Similarity

/** IR eval triple: hand-computed recall@k / MRR / NDCG@k, the perfect and
  * disjoint extremes, and rank-order sensitivity of NDCG.
  */
class RetrievalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def frame(lists: Map[Long, Seq[Long]]) =
    lists.toSeq.flatMap { case (q, ids) =>
      ids.zipWithIndex.map { case (id, i) => (q, id, (i + 1).toLong) }
    }.toDF("query_id", "vec_id", "rnk")

  private def run(exact: Map[Long, Seq[Long]], approx: Map[Long, Seq[Long]], k: Int) =
    Similarity.retrievalMetrics(frame(exact), frame(approx), k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap

  test("hand-computed metrics at k = 3") {
    val out = run(
      Map(1L -> Seq(10L, 11L, 12L)),
      Map(1L -> Seq(11L, 10L, 99L)), k = 3)
    val (recall, mrr, ndcg) = out(1L)
    assert(recall == 0.6667)
    assert(mrr == 0.5) // exact top-1 (10) sits at approx position 2
    val d = (i: Int) => 1.0 / math.log(i + 1)
    val expect = (d(1) + d(2)) / (d(1) + d(2) + d(3))
    assert(ndcg == (expect * 10000).round / 10000.0)
  }

  test("identical lists score perfectly; disjoint lists score zero") {
    val e = Map(1L -> Seq(1L, 2L, 3L), 2L -> Seq(4L, 5L, 6L))
    val perfect = run(e, e, 3)
    assert(perfect.values.toSet == Set((1.0, 1.0, 1.0)))
    val none = run(e, Map(1L -> Seq(7L, 8L, 9L), 2L -> Seq(7L, 8L, 9L)), 3)
    assert(none.values.toSet == Set((0.0, 0.0, 0.0)))
  }

  test("NDCG rewards putting relevant results earlier; recall is order-blind") {
    val e = Map(1L -> Seq(1L, 2L, 3L))
    val early = run(e, Map(1L -> Seq(1L, 8L, 9L)), 3)(1L)
    val late = run(e, Map(1L -> Seq(8L, 9L, 1L)), 3)(1L)
    assert(early._1 == late._1)
    assert(early._3 > late._3)
    assert(early._2 == 1.0 && late._2 == (1.0 / 3 * 10000).round / 10000.0)
  }
}
