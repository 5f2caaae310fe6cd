package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  // A -> B, A -> C, B -> C, C -> A  (no dangling nodes)
  private def triangle = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")

  test("pageRank: hand-computed fixpoint on a 3-node graph") {
    // one iteration from uniform r = 1/3, d = 0.85:
    //   contrib(A) = r(C)/1 = 1/3; contrib(B) = r(A)/2 = 1/6
    //   contrib(C) = r(A)/2 + r(B)/1 = 1/6 + 1/3 = 1/2; dangling = 0
    //   r'(v) = 0.15/3 + 0.85 * contrib(v)
    val got = Graphs.pageRank(triangle, iterations = 1)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - (0.05 + 0.85 / 3.0)) < 1e-12)
    assert(math.abs(got(2L) - (0.05 + 0.85 / 6.0)) < 1e-12)
    assert(math.abs(got(3L) - (0.05 + 0.85 / 2.0)) < 1e-12)
  }

  test("pageRank: dangling mass is redistributed, ranks always sum to 1") {
    // B is a sink: its whole rank re-enters as dangling mass each round
    val sink = Seq((1L, 2L), (3L, 2L), (3L, 1L)).toDF("src", "dst")
    for (iters <- Seq(1, 5)) {
      val ranks = Graphs.pageRank(sink, iterations = iters)
        .as[(Long, Double)].collect()
      assert(ranks.length == 3)
      assert(math.abs(ranks.map(_._2).sum - 1.0) < 1e-9, s"iters=$iters mass leak")
    }
    // the sink accumulates the most rank
    val last = Graphs.pageRank(sink, iterations = 10).as[(Long, Double)]
      .collect().maxBy(_._2)
    assert(last._1 == 2L)
  }

  test("pageRank: local tier == distributed tier (localEdgeLimit = 0)") {
    val edges = Graphs.knnEdges(Tables(spark, sf(), "embeddings"), k = 3)
      .localCheckpoint()
    val local = Graphs.pageRank(edges, iterations = 3, normalized = true)
      .as[(Long, Double)].collect().toMap
    val dist = Graphs.pageRank(edges, iterations = 3, normalized = true,
      localEdgeLimit = 0L).as[(Long, Double)].collect().toMap
    assert(local.keySet == dist.keySet)
    // identical arithmetic per term; only double-summation order differs
    local.foreach { case (v, r) =>
      assert(math.abs(r - dist(v)) < 1e-12, s"node $v: local $r vs dist ${dist(v)}")
    }
    // normalized: mean rank is 1
    assert(math.abs(local.values.sum / local.size - 1.0) < 1e-9)
  }

  test("personalized pageRank: seeded hand case, mass conservation, tier equality") {
    // seed {1}, one round from r0 = p = (1,0,0):
    //   contrib(2) = r1/2 = 0.5; contrib(3) = r1/2 + r2 = 0.5; contrib(1) = r3 = 0
    //   r' = 0.15·p + 0.85·contrib = (0.15, 0.425, 0.425)
    val got = Graphs.pageRank(triangle, iterations = 1, teleport = Seq(1L))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 0.15) < 1e-12)
    assert(math.abs(got(2L) - 0.425) < 1e-12)
    assert(math.abs(got(3L) - 0.425) < 1e-12)
    // rank mass stays 1 through many rounds (dangling × p redistribution)
    val sink = Seq((1L, 2L), (3L, 2L), (3L, 1L)).toDF("src", "dst")
    val deep = Graphs.pageRank(sink, iterations = 10, teleport = Seq(3L))
      .as[(Long, Double)].collect()
    assert(math.abs(deep.map(_._2).sum - 1.0) < 1e-9)
    // tier equality on a real seeded graph
    val edges = Graphs.knnEdges(Tables(spark, sf(), "embeddings"), k = 3)
      .localCheckpoint()
    val seeds = (0L to 450L by 50L)
    val local = Graphs.pageRank(edges, iterations = 3, teleport = seeds)
      .as[(Long, Double)].collect().toMap
    val dist = Graphs.pageRank(edges, iterations = 3, teleport = seeds,
      localEdgeLimit = 0L).as[(Long, Double)].collect().toMap
    assert(local.keySet == dist.keySet)
    local.foreach { case (v, r) =>
      assert(math.abs(r - dist(v)) < 1e-12, s"node $v: local $r vs dist ${dist(v)}")
    }
    // non-seed nodes with no inbound edges hold exactly zero mass
    val hasIn = edges.as[(Long, Long)].collect().map(_._2).toSet
    local.keySet.filter(v => !hasIn(v) && !seeds.contains(v))
      .foreach(v => assert(local(v) == 0.0, s"node $v should be massless"))
  }

  test("knnEdges: matrix tier == generic broadcast-join tier, exactly") {
    val emb = Tables(spark, sf(), "embeddings").localCheckpoint()
    val fast = Graphs.knnEdges(emb, k = 3).as[(Long, Long)].collect().sorted
    val generic = Graphs.knnEdges(emb, k = 3, matrixRowLimit = 0L)
      .as[(Long, Long)].collect().sorted
    assert(fast.toSeq == generic.toSeq)
  }

  test("labelConsistency: majority vote, lexicographic tie-break, noisy flag") {
    // 1,2,3 labeled a cluster together; 4 sits inside the cluster labeled b
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), "a"),
      (2L, Array(0.99f, 0.1f), "a"),
      (3L, Array(0.98f, -0.1f), "a"),
      (4L, Array(0.97f, 0.05f), "b")
    ).toDF("vec_id", "embedding", "label")
    val got = Graphs.labelConsistency(vecs, k = 2)
      .orderBy("vec_id").as[(Long, String, String, Boolean)].collect()
    // node 4's neighbors are all 'a' -> flagged
    assert(got(3) == (4L, "b", "a", true))
    // nodes whose 2-NN include node 4 see an (a=1, b=1) tie -> 'a' wins
    got.take(3).foreach { case (_, own, pred, noisy) =>
      assert(own == "a" && pred == "a" && !noisy)
    }
  }

  test("hardNegatives: exactly the kNN pairs inside the cosine band") {
    val emb = Tables(spark, sf(), "embeddings").localCheckpoint()
    val hn = Graphs.hardNegatives(emb, k = 5, lo = 0.25, hi = 0.35)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    val manual = Graphs.knnNeighbors(emb, k = 5)
      .as[(Long, Long, Double, Long)].collect()
      .filter(r => r._3 >= 0.25 && r._3 < 0.35)
      .map(r => (r._1, r._2, BigDecimal(r._3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(r => (r._1, r._2))
    assert(hn.nonEmpty && hn.toSeq == manual.toSeq)
  }

  test("knnEdges: k out-edges per node, no self-loops, neighbors are the cosine top-k") {
    val emb = Tables(spark, sf(), "embeddings").limit(50).localCheckpoint()
    val edges = Graphs.knnEdges(emb, k = 3).as[(Long, Long)].collect()
    val bySrc = edges.groupBy(_._1)
    assert(bySrc.size == 50)
    bySrc.foreach { case (s, es) =>
      assert(es.length == 3, s"src $s degree")
      assert(!es.exists(_._2 == s), s"src $s self-loop")
    }
    // cross-check one source against a brute-force cosine ranking
    val rows = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val (qid, qv) = rows.head
    val want = rows.filter(_._1 != qid)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    assert(bySrc(qid).map(_._2).toSet == want)
  }
}
