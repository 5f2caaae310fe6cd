package graft

import graft.operators.{CorpusAnalytics, Sampling}
import org.apache.spark.sql.functions._

/** Heaps fit and Neyman allocation: the planted power-law exponent, the
  * template-soup floor, budget conservation, and the
  * noisy-stratum-gets-more property.
  */
class HeapsNeymanSpec extends SparkSpec {
  import spark.implicits._

  test("Heaps beta separates open from closed vocabularies") {
    // open: every doc contributes fresh tokens -> beta near 1
    val open = (0L until 400L)
      .map(i => (i, (0 until 20).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val bOpen = CorpusAnalytics.heapsFit(open).head()
    // closed: the same 30 words forever -> beta near 0
    val closed = (0L until 400L)
      .map(i => (i, (0 until 20).map(j => s"w${(i + j) % 30}").mkString(" ")))
      .toDF("doc_id", "text")
    val bClosed = CorpusAnalytics.heapsFit(closed).head()
    assert(bOpen.getDouble(1) > 0.9, s"open-vocab beta ${bOpen.getDouble(1)}")
    assert(bClosed.getDouble(1) < 0.2, s"closed-vocab beta ${bClosed.getDouble(1)}")
    assert(bOpen.getLong(0) == 10L)
  }

  test("Heaps fit is deterministic") {
    val docs = Tables(spark, sf(), "documents")
    val a = CorpusAnalytics.heapsFit(docs).head()
    val b = CorpusAnalytics.heapsFit(docs).head()
    assert(a == b)
  }

  test("Neyman: the noisier stratum gets more budget at equal size") {
    // stratum a: constant values (sigma 0); b: spread (sigma > 0)
    val df = ((1 to 100).map(_ => ("a", 10L)) ++
      (1 to 100).map(i => ("b", (i % 20).toLong))).toDF("g", "v")
    val out = Sampling.neymanAllocation(df, "g", "v", budget = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out("a") == 0L, "zero-variance stratum needs no samples")
    assert(out("b") == 100L)
  }

  test("Neyman: allocations track N_h * sigma_h and sum near the budget") {
    val df = ((1 to 300).map(i => ("big", (i % 10).toLong)) ++
      (1 to 100).map(i => ("small", (i % 10).toLong))).toDF("g", "v")
    val out = Sampling.neymanAllocation(df, "g", "v", budget = 400L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4)))).toMap
    // same sigma, 3x the rows -> 3x the budget
    assert(out("big")._2 == 300L && out("small")._2 == 100L)
    assert(out.values.map(_._2).sum == 400L)
  }

  test("OOV rate: in-vocab docs score 0, alien docs score 1") {
    import graft.operators.CorpusAnalytics
    val docs = ((0L until 50L).map(i => (i, "common words here again")) ++
      Seq((100L, "zzqx1 zzqx2 zzqx3"), (101L, "common zzqx9")))
      .toDF("doc_id", "text")
    val out = CorpusAnalytics.oovRate(docs, v = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(0L) == ((4L, 0L, 0.0)))
    assert(out(100L) == ((3L, 3L, 1.0)))
    assert(out(101L) == ((2L, 1L, 0.5)))
  }
}
