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

  test("epochShuffle: complete permutation, deterministic, seed-sensitive, balanced") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val n = docs.count()
    val shuffled = Sampling.epochShuffle(docs, seed = 42L, shards = 8)
      .as[(Long, Long, Long)].collect()
    // every doc appears exactly once
    assert(shuffled.length == n)
    assert(shuffled.map(_._1).distinct.length == n)
    // positions are contiguous 1..count inside every shard (a loader can
    // stream a shard file and trust the batch index)
    shuffled.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.toSeq == (1L to rows.length).toSeq, s"shard $shard positions")
    }
    // same seed replays byte-identically; the next epoch's seed reorders
    val again = Sampling.epochShuffle(docs, seed = 42L, shards = 8)
      .as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == shuffled.sortBy(_._1).toSeq)
    val epoch2 = Sampling.epochShuffle(docs, seed = 43L, shards = 8)
      .as[(Long, Long, Long)].collect()
    assert(epoch2.sortBy(_._1).toSeq != shuffled.sortBy(_._1).toSeq)
    // md5 keys keep the shards balanced (no shard over 2x the mean)
    val sizes = shuffled.groupBy(_._2).values.map(_.length)
    assert(sizes.max < 2.0 * n / 8, s"shard sizes $sizes")
  }

  test("sourceQuota: caps every group, keeps small groups whole, deterministic") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val kept = Sampling.sourceQuota(docs, quota = 10)
      .as[(Long, String, Long)].collect()
    val bySource = kept.groupBy(_._2)
    val inputBySource = docs.select($"source", $"doc_id").as[(String, Long)]
      .collect().groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      assert(rows.length <= 10, s"$src over quota")
      assert(rows.length == math.min(10, inputBySource(src).length))
      // kept ids are real members of the group
      assert(rows.map(_._1).toSet.subsetOf(inputBySource(src).map(_._2).toSet))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a group smaller than the quota survives intact
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val keptTiny = Sampling.sourceQuota(tiny, quota = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(keptTiny == Set(1L, 2L, 3L))
    // rerun is identical (deterministic draw, no rand())
    val again = Sampling.sourceQuota(docs, quota = 10)
      .as[(Long, String, Long)].collect()
    assert(again.sortBy(_._1).toSeq == kept.sortBy(_._1).toSeq)
  }

  test("weightedSample: deterministic, weight-proportional, exact E-S keys") {
    val docs = Tables(spark, sf("sf0.01"), "documents")
    val got = Sampling.weightedSample(docs, k = 100, weightCol = "n_chars",
      keep = Seq("n_chars")).as[(Long, Long, Long)].collect()
    assert(got.length == 100)
    assert(got.map(_._1).sorted.toSeq == (1L to 100L).toSeq) // ranks dense
    assert(got.map(_._2).distinct.length == 100) // without replacement
    // replay is byte-identical (seeded md5 draw, no rand())
    val again = Sampling.weightedSample(docs, k = 100, weightCol = "n_chars",
      keep = Seq("n_chars")).as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
    // selection matches an in-process replay of the E-S key arithmetic,
    // including the boundary between rank 100 and the first dropped row
    val all = docs.filter($"n_chars".isNotNull && $"n_chars" > 0)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    def key(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws:$id".getBytes("UTF-8"))
      val h = java.lang.Long.parseLong(
        md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
      math.log((h.toDouble + 1) / 4294967296.0) / w.toDouble
    }
    val want = all.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k0) => (-k0, id) }.take(100).map(_._1)
    assert(got.sortBy(_._1).map(_._2).toSeq == want.toSeq)
    // weight-proportionality sanity: the sampled mean length clears the
    // corpus mean by a wide margin (length-biased draw)
    val corpusMean = all.map(_._2).sum.toDouble / all.length
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    assert(sampleMean > 1.1 * corpusMean,
      s"sample mean $sampleMean vs corpus $corpusMean")
  }
}
