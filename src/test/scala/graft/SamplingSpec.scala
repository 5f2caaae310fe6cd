package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, disjoint, and complete") {
    val docs = Tables(spark, sf(), "documents")
    val (train, test) = Sampling.hashSplit(docs, "doc_id", trainPct = 90)
    val (train2, _) = Sampling.hashSplit(docs, "doc_id", trainPct = 90)
    val trainIds = train.select("doc_id").as[Long].collect().toSet
    val testIds = test.select("doc_id").as[Long].collect().toSet
    assert(trainIds.intersect(testIds).isEmpty)
    assert(trainIds.size + testIds.size == docs.count())
    // rerun gives the identical assignment (no rand())
    assert(train2.select("doc_id").as[Long].collect().toSet == trainIds)
    // proportion near the boundary (md5 buckets are near-uniform)
    val frac = trainIds.size.toDouble / (trainIds.size + testIds.size)
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac")
  }

  test("crossSplitLeakage finds exactly the straddling near-dup pairs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "completely different text about spark engines here"),
      (4L, "the quick brown fox jumps over the lazy dog !") // near-dup of 1,2
    ).toDF("doc_id", "text")
    // force a split boundary that separates at least one near-dup pair:
    // find a pct that puts doc 1 and doc 2 on different sides
    val buckets = docs.select($"doc_id", Sampling.pctBucket($"doc_id").as("b"))
      .as[(Long, Int)].collect().toMap
    val pct = (math.min(buckets(1L), buckets(2L)) + 1).toInt
    val leaks = Sampling.crossSplitLeakage(docs, threshold = 0.5, trainPct = pct)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(leaks.contains((1L, 2L)) || leaks.contains((2L, 1L)) ||
      leaks.exists(p => Set(p._1, p._2) == Set(1L, 2L)))
    // an unsplit pair is NOT reported even when similar
    val sameSide = Sampling.crossSplitLeakage(docs, threshold = 0.5, trainPct = 100)
    assert(sameSide.count() == 0)
  }
}
