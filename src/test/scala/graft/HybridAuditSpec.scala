package graft

import graft.operators.{CorpusAnalytics, Ranking, Similarity}
import org.apache.spark.sql.functions._

/** Property pins for the round-10 additions: RRF fusion, token
  * burstiness, and the embedding isotropy audit.
  */
class HybridAuditSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: both-list documents outrank single-list ones at equal rank") {
    val sparse = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rnk")
    val dense = Seq((11L, 1L), (13L, 2L), (12L, 3L)).toDF("doc_id", "rnk")
    val out = Ranking.rrfFuse(sparse, dense, topN = 10)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getBoolean(3), r.getBoolean(4)))
    // 11 (ranks 2+1) and 12 (3+3) appear in both; 11 must lead overall
    assert(out.head._1 == 11L && out.head._3 && out.head._4)
    val byDoc = out.map(t => t._1 -> t._2).toMap
    assert(byDoc(12L) < byDoc(10L) || byDoc(12L) < byDoc(13L),
      "a both-list doc at mid ranks beats at least one single-list doc")
    // single-list docs carry the right flags
    val flags = out.map(t => t._1 -> (t._3, t._4)).toMap
    assert(flags(10L) == ((true, false)) && flags(13L) == ((false, true)))
  }

  test("tokenBurstiness: uniform token ~ Fano 0, concentrated token bursts") {
    val docs = (1L to 8L).map { i =>
      // 'the' once per doc (uniform); 'spark' four times in doc 1 only
      val extra = if (i == 1) " spark spark spark spark" else ""
      (i, s"the filler$extra")
    }.toDF("doc_id", "text")
    val out = CorpusAnalytics.tokenBurstiness(docs, topM = 10)
      .collect().map(r => r.getString(1) -> r.getDouble(4)).toMap
    assert(out("the") == 0.0, "once-per-doc token has zero variance")
    // spark: mean 4/8=0.5, ex2 16/8=2, var 1.75, fano 3.5
    assert(out("spark") == 3.5)
  }

  test("scoreAuc: separation 1, reversal 0, constant-score ties 0.5") {
    def auc(rows: Seq[(Long, Double, Boolean)]): Double =
      Ranking.scoreAuc(rows.toDF("doc_id", "s", "l"), col("s"), col("l"))
        .head().getDouble(2)
    val sep = (1L to 40L).map(i => (i, if (i <= 20) 0.1 else 0.9, i > 20))
    assert(auc(sep) == 1.0, "perfect separation")
    assert(auc(sep.map(t => t.copy(_3 = !t._3))) == 0.0, "perfect reversal")
    val const = (1L to 40L).map(i => (i, 0.5, i % 2 == 0))
    assert(auc(const) == 0.5, "all-ties midranks give exactly chance")
    // tie block straddling the classes: midranks, not arbitrary order
    val mixed = Seq((1L, 0.1, false), (2L, 0.5, false), (3L, 0.5, true),
      (4L, 0.9, true))
    // U = (2.5 + 4) - 2*3/2 = 3.5; AUC = 3.5/4
    assert(auc(mixed) == 0.875)
  }

  test("isotropyAudit: collapsed space ~ anisotropy 1, symmetric space ~ 0") {
    val same = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r1 = Similarity.isotropyAudit(same).head()
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 2L)
    assert(math.abs(r1.getDouble(5) - 1.0) < 0.01, "identical vectors collapse")
    assert(math.abs(r1.getDouble(4) - 1.0) < 0.01, "cos to centroid ~ 1")

    val sym = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(-1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val r2 = Similarity.isotropyAudit(sym).head()
    assert(r2.getDouble(3) < 0.01, "symmetric centroid sits at the origin")
    assert(r2.getDouble(5) < 0.01, "anisotropy ~ 0")
  }

  test("rboOverlap: identical lists 1-p^k, disjoint 0, swapped-pair hand case") {
    import spark.implicits._
    def lst(ids: Long*) = ids.zipWithIndex
      .map { case (id, i) => (i.toLong + 1, id) }.toDF("rnk", "doc_id")
    val a = lst(1L to 10L: _*)
    val same = Ranking.rboOverlap(a, a).as[(Long, Double)].head()
    // A_d = 1 at every depth: RBO = (1-p)*sum(p^(d-1)) = 1 - p^10
    assert(same._1 == 10L &&
      same._2 == math.floor((1 - math.pow(0.9, 10)) * 10000 + 0.5) / 10000)
    val disjoint = Ranking.rboOverlap(a, lst(101L to 110L: _*))
      .as[(Long, Double)].head()
    assert(disjoint == ((0L, 0.0)))
    // depth 2, p=0.5, A=[1,2] vs B=[2,1]: A_1=0, A_2=1 -> 0.5*0.5*1 = 0.25
    val swapped = Ranking.rboOverlap(lst(1L, 2L), lst(2L, 1L),
      p = 0.5, depth = 2).as[(Long, Double)].head()
    assert(swapped == ((2L, 0.25)))
  }
}
