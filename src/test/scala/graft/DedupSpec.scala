package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),   // near dup of 1
    (4L, "completely different content about spark engines and shuffles"),
    (5L, "THE  QUICK   brown fox jumps over the lazy dog") // dup modulo case/space
  ).toDF("doc_id", "text")

  test("shingles: distinct word n-grams, lowercased") {
    val sh = spark.range(1).select(
      Dedup.shingles(lit("A b c b c"), 2)).as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c b"))
    // fewer tokens than n -> single shingle
    val one = spark.range(1).select(Dedup.shingles(lit("solo"), 3)).as[Seq[String]].head()
    assert(one == Seq("solo"))
  }

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val got = Dedup.exact(docs).orderBy("doc_id").collect()
    assert(got.length == 3)                        // 1/2/5 merge, 3, 4
    assert(got(0).getAs[Long]("doc_id") == 1L && got(0).getAs[Long]("n_dups") == 3L)
  }

  test("minhash LSH finds the near-dup pair, not the unrelated doc") {
    // k=64 concentrates the agreement estimator (std ~0.06 at J=0.6); at
    // k=16 this fixed doc pair deterministically lands at 6/16 — verified
    // the family itself is unbiased (mean 0.597 over 500 J=0.6 pairs)
    val pairs = Dedup.minhashLsh(docs, numHashes = 64, bands = 32,
      shingleSize = 2, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))  // identical -> est_jaccard 1.0
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated
  }

  test("simhash: equal for identical docs, close for near-dups, far for unrelated") {
    val h = docs.select($"doc_id", Dedup.simhash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(3L)) < hamming(h(1L), h(4L)))
  }

  test("jaccard exact n-gram similarity") {
    val j = spark.range(1).select(
      Dedup.jaccard(lit("a b c d"), lit("a b c e"), 2)).as[Double].head()
    // shingles: {a b, b c, c d} vs {a b, b c, c e}: |I|=2, |U|=4
    assert(j == 0.5)
  }

  test("ngramJaccardPairs verifies candidates with exact jaccard") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 5L), (2L, 5L))) // only exact-normalized dups at >=0.99
  }

  test("simhashNearDup excludes blank docs (no Hamming-0 phantom pairs)") {
    val withBlanks = docs.unionByName(Seq(
      (100L, ""), (101L, "   \t")).toDF("doc_id", "text"))
    val pairs = Dedup.simhashNearDup(withBlanks, k = 0, segments = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 >= 100L || p._2 >= 100L), pairs.toString)
  }

  test("simhashNearDup == brute-force pairs within Hamming k (pigeonhole recall)") {
    // guaranteed-recall property: with segments >= k+1, the segment
    // equi-join must surface EVERY pair within distance k
    val sims = docs.select($"doc_id", Dedup.simhash($"text").as("h"))
      .as[(Long, Long)].collect()
    for (k <- Seq(0, 3, 15)) {
      val want = (for {
        (ia, ha) <- sims; (ib, hb) <- sims if ia < ib
        if java.lang.Long.bitCount(ha ^ hb) <= k
      } yield (ia, ib)).toSet
      val got = Dedup.simhashNearDup(docs, k = k, segments = k + 1)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == want, s"k=$k")
    }
  }

  test("neardupClusters: chain component collapses to one cluster, min id canonical") {
    // docs 1..5 form a CHAIN: each shares half its words with its neighbour
    // (jaccard ~0.27 on 2-gram shingles) but nothing with docs 2+ hops away
    // — label propagation needs multiple rounds, exercising the pointer
    // jump; docs 10/11 are an identical pair; doc 20 is isolated (no pairs)
    val words = (0 until 40).map(i => s"w$i")
    val chain = (0 until 5).map { i =>
      (i + 1L, words.slice(4 * i, 4 * i + 8).mkString(" "))
    }
    val extra = Seq(
      (10L, "identical twin document body"),
      (11L, "identical twin document body"),
      (20L, "zebra quokka xylophone umbrella nothing shared here"))
    val corpus = (chain ++ extra).toDF("doc_id", "text")
    val got = Dedup.neardupClusters(corpus, n = 2, threshold = 0.2)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // chain 1..5 -> cluster 1; pair 10/11 -> cluster 10; 20 absent (no edges)
    assert(got == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 1L, false), (5L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("lshBandPlan: S-curve picks the cheapest net clearing the recall target") {
    // low threshold: even r=1 can't clear 0.97 within 32 hashes -> the
    // exhaustive-sweep fallback (what the leakage report must run at)
    assert(Dedup.lshBandPlan(0.1) == (32, 32))
    // higher thresholds get strictly narrower nets
    assert(Dedup.lshBandPlan(0.3) == (10, 10))
    assert(Dedup.lshBandPlan(0.8) == (28, 7))
    // every derived plan actually clears the target at j = threshold
    for (t <- Seq(0.2, 0.3, 0.5, 0.7, 0.8, 0.9)) {
      val (nh, b) = Dedup.lshBandPlan(t)
      val r = nh / b
      val collide = 1 - math.pow(1 - math.pow(t, r), b)
      assert(collide >= 0.97, s"t=$t plan=($nh,$b) collide=$collide")
    }
  }

  test("connectedComponents: local union-find tier == distributed pointer-jumping tier") {
    // chain 1-2-3-4, star 10-{11,12}, pair 20-21, plus a cross edge merging
    // the chain and the star — multi-round propagation either way
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (10L, 12L),
      (20L, 21L), (4L, 12L)).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toSet
    val distributed = Dedup.connectedComponents(edges, localEdgeLimit = 0L)
      .as[(Long, Long)].collect().toSet
    val want = Set(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 1L), (11L, 1L), (12L, 1L),
      (20L, 20L), (21L, 20L))
    assert(local == want)
    assert(distributed == want)
  }

  test("survivorship: longest wins, tie -> lowest id, singletons keep themselves") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),            // near dup of 2, shorter
      (2L, "alpha beta gamma delta epsilon zeta eta"),   // superset -> longest, wins
      (10L, "identical twin document body"),             // tie with 11 -> lowest id
      (11L, "identical twin document body"),
      (20L, "zebra quokka xylophone umbrella nothing shared here")  // singleton
    ).toDF("doc_id", "text")
    val got = Dedup.survivorship(corpus, n = 2, threshold = 0.2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 30L, false),
      (2L, 1L, 39L, true),    // longest member of cluster 1
      (10L, 10L, 28L, true),  // tie on length -> lowest id
      (11L, 10L, 28L, false),
      (20L, 20L, 51L, true))) // no edges -> own cluster, keeps itself
  }

  test("embeddingNearDup finds planted duplicate vectors via LSH buckets") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),  // near dup of 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(vecs, planes = 2, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L && p._1 == 1L))
  }

  test("incrementalExact: batch dedups against corpus and within itself") {
    val corpus = Seq(
      (1L, "already in the corpus"),
      (2L, "another corpus document")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALREADY  in the corpus"),   // dup of corpus doc 1 (normalized)
      (11L, "brand new document"),
      (12L, "brand new document"),       // dup within the batch -> 11 wins
      (13L, "also new")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(batch, corpus)
      .orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(
      (10L, true, true, false),   // in corpus -> drop even as batch-first
      (11L, false, true, true),
      (12L, false, false, false), // batch dup of 11
      (13L, false, true, true)))
  }

  test("semanticDedup keeps one representative per duplicate group, singletons keep") {
    // two tight semantic groups + one singleton; threshold 0.9 separates
    // within-group cosine (>0.99) from cross-group (~0)
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f)),
      (3L, Array(0.98f, 0.05f, 0.05f)),
      (4L, Array(0.0f, 1.0f, 0.0f)),
      (5L, Array(0.05f, 0.99f, 0.0f)),
      (6L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, k = 2, threshold = 0.9)
      .select("vec_id", "component_id", "keep")
      .as[(Long, Long, Boolean)].collect()
    assert(got.length == 6)
    val byId = got.map(r => r._1 -> r).toMap
    // group A {1,2,3}: one component, exactly one keeper
    assert(Set(1L, 2L, 3L).map(byId(_)._2).size == 1)
    assert(Seq(1L, 2L, 3L).count(byId(_)._3) == 1)
    // group B {4,5}: one component, exactly one keeper
    assert(Set(4L, 5L).map(byId(_)._2).size == 1)
    assert(Seq(4L, 5L).count(byId(_)._3) == 1)
    // singleton: own component, keeps itself
    assert(byId(6L)._2 == 6L && byId(6L)._3)
    // determinism: a second run elects the same keepers
    val again = Dedup.semanticDedup(vecs, k = 2, threshold = 0.9)
      .select("vec_id", "component_id", "keep")
      .as[(Long, Long, Boolean)].collect()
    assert(again.sortBy(_._1).toSeq == got.sortBy(_._1).toSeq)
  }

  test("containmentPairs: asymmetric subset detection, exact threshold") {
    val docs = Seq(
      (1L, "a b c d e f"), // grams {abc,bcd,cde,def}: 2/4 shared -> 0.5 < 3/5
      (2L, "a b c d"),     // grams {abc,bcd}: both in doc 1 -> 1.0 >= 3/5
      (3L, "z y x w")      // unshared
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs)
      .select("a_id", "b_id", "n_a", "n_inter", "containment")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((2L, 1L, 2L, 2L, 1.0)))
  }

  test("containmentPairsWithHandle: eager consume + unpersist leaves the cache empty") {
    spark.catalog.clearCache() // earlier tests in the suite may hold pins
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d"), (3L, "z y x w")
    ).toDF("doc_id", "text")
    val (pairs, handle) = Dedup.containmentPairsWithHandle(docs)
    assert(pairs.count() == 1L)
    handle.unpersist(true)
    assert(spark.sharedState.cacheManager.isEmpty,
      "library eager-consume lifecycle must release the per-doc pin")
  }

  test("containmentPairs prefix filter agrees with brute force on real data") {
    val docs = Tables(spark, sf(), "documents")
    val got = Dedup.containmentPairs(docs)
      .select("a_id", "b_id", "n_a", "n_inter")
      .as[(Long, Long, Long, Long)].collect().toSet
    val g = docs.filter(trim(col("text")) =!= "")
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("gs"))
    val brute = g.select(col("doc_id").as("a_id"), col("gs").as("ga"))
      .crossJoin(g.select(col("doc_id").as("b_id"), col("gs").as("gb")))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), size(col("ga")).cast("long").as("n_a"),
        size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_inter"))
      .filter(col("n_inter") * 5 >= col("n_a") * 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
  }

  test("simhashDuplicates reports collision groups with a capped id list") {
    // six copies of one text + two of another + a singleton: the hot group
    // keeps its FULL population n but only maxIds evidence ids
    val d = (Seq.tabulate(6)(i => (i.toLong, "same same same text")) ++
      Seq((10L, "another repeated body"), (11L, "another repeated body"),
        (20L, "a singleton document"))).toDF("doc_id", "text")
    val got = Dedup.simhashDuplicates(d, maxIds = 3)
      .select(col("ids"), col("n"))
      .as[(Seq[Long], Long)].collect().toSet
    assert(got == Set((Seq(0L, 1L, 2L), 6L), (Seq(10L, 11L), 2L)))
    // default cap keeps everything when groups are small
    val full = Dedup.simhashDuplicates(d)
      .select(col("ids"), col("n"))
      .as[(Seq[Long], Long)].collect().toSet
    assert(full == Set((Seq(0L, 1L, 2L, 3L, 4L, 5L), 6L), (Seq(10L, 11L), 2L)))
  }
}
