package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("dot/norm propagate NULL for length-mismatched or null-element arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, lit}
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val mismatch = df.select(Similarity.dot($"a", $"b")).collect()(0)
    assert(mismatch.isNullAt(0), "length mismatch must yield NULL, not a partial dot")
    val withNullElem = spark.sql("SELECT array(1.0D, NULL) AS v")
    assert(withNullElem.select(Similarity.norm(org.apache.spark.sql.functions.col("v")))
      .collect()(0).isNullAt(0))
    val ok = df.select(Similarity.dot($"a", array(lit(2.0f), lit(0.5f)))).collect()(0)
    assert(ok.getDouble(0) == 3.0)
  }

  test("hyperplane signature propagates NULL for null-element vectors") {
    // same discipline as dot/norm: a corrupt vector gets NO bucket, not an
    // arbitrary silent one (ADVICE r1)
    val withNullElem = spark.sql("SELECT array(1.0D, NULL) AS v")
    assert(withNullElem.select(Similarity.hyperplaneSignature(col("v"), 4))
      .collect()(0).isNullAt(0))
    val clean = spark.sql("SELECT array(1.0D, 2.0D) AS v")
    assert(!clean.select(Similarity.hyperplaneSignature(col("v"), 4))
      .collect()(0).isNullAt(0))
  }
  import spark.implicits._

  test("dot / norm / cosine kernels") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      Similarity.dot($"a", $"b"),
      Similarity.norm($"a"),
      Similarity.cosine($"a", $"a")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("cosine of zero vector is 0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(Similarity.cosine($"a", $"b")).head().getDouble(0) == 0.0)
  }

  private lazy val corpus = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(-1.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine descending") {
    val got = Similarity.bruteForceTopK(corpus, Seq(1.0f, 0.0f, 0.0f), 3)
      .select("vec_id").as[Long].collect()
    assert(got.toSeq == Seq(1L, 2L, 3L) || got.toSeq == Seq(1L, 2L, 4L)) // 3/4 tie at 0
  }

  test("driver-side signatureOf agrees bit-for-bit with executor-side hyperplaneSignature") {
    val emb = Tables(spark, sf("sf0.001"), "embeddings").limit(50)
    val rows = emb.select($"vec_id",
      Similarity.hyperplaneSignature($"embedding", 8).as("sig"), $"embedding")
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](2)
      assert(r.getLong(1) == Similarity.signatureOf(v, 8),
        s"signature mismatch for vec ${r.getLong(0)}")
    }
  }

  test("lshTopK finds the query's own bucket (planted near vector recalled)") {
    val index = Similarity.bucketedIndex(corpus, planes = 2)
    val got = Similarity.lshTopK(index, Seq(1.0f, 0.0f, 0.0f), 2, planes = 2)
      .select("vec_id").as[Long].collect()
    assert(got.contains(1L)) // the identical vector must be recalled
  }

  test("topKPerQuery ranks each query's matches, excluding the self-match") {
    val queries = corpus.filter($"vec_id" === 1L || $"vec_id" === 4L)
      .withColumnRenamed("vec_id", "query_id")
    val got = Similarity.topKPerQuery(corpus, queries, k = 2)
      .orderBy("query_id", "rnk")
      .select("query_id", "rnk", "vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    // query 1 = (1,0,0): best is 2 (cos .707), then 3/4 tie at 0 -> 3
    // query 4 = (0,0,1): best is 2 (cos .707)? no - dot((1,1,0),(0,0,1))=0;
    //   all of 1,3,5 are orthogonal too -> rank by (cos desc, id asc) = ties
    assert(got.filter(_._1 == 1L) == Seq((1L, 1L, 2L), (1L, 2L, 3L)))
    assert(got.filter(_._1 == 4L).map(_._2) == Seq(1L, 2L))
  }

  test("topKPerQuery agrees with bruteForceTopK per query") {
    val emb = Tables(spark, sf("sf0.001"), "embeddings")
    val queries = emb.filter($"vec_id" % 50 === 0)
      .withColumnRenamed("vec_id", "query_id")
    val batch = Similarity.topKPerQuery(emb, queries, k = 5)
      .select("query_id", "rnk", "vec_id")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    queries.select("query_id", "embedding").as[(Long, Array[Float])]
      .collect().foreach { case (qid, qv) =>
        val single = Similarity.bruteForceTopK(
          emb.filter($"vec_id" =!= qid), qv.toSeq, 5)
          .select("vec_id").as[Long].collect().toSeq
        assert(batch(qid) == single, s"query $qid")
      }
  }

  test("lshTopKPerQuery returns at most k in-bucket matches per query") {
    val emb = Tables(spark, sf("sf0.001"), "embeddings")
    val queries = emb.filter($"vec_id" % 50 === 0)
      .withColumnRenamed("vec_id", "query_id")
    val got = Similarity.lshTopKPerQuery(emb, queries, k = 5)
      .select("query_id", "rnk", "vec_id")
      .as[(Long, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length <= 5, s"query $qid overflowed k")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq)
      assert(!rows.map(_._3).contains(qid), "self-match must be excluded")
    }
  }

  test("quantizeInt8: codes in range, error within step/2, constant dim exact") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(0.0f, 5.0f)), (2L, Seq(1.0f, 5.0f)), (3L, Seq(0.4f, 5.0f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(corpus)
      .select(col("vec_id"), col("qvec"), col("dqvec"), col("embedding"))
      .as[(Long, Seq[Int], Seq[Float], Seq[Float])].collect().sortBy(_._1)
    val step = 1.0 / 255 // dim 0 range [0, 1]
    for ((_, codes, dq, orig) <- q) {
      assert(codes.forall(c => c >= 0 && c <= 255))
      assert(math.abs(dq(0) - orig(0)) <= step / 2 + 1e-6)
      assert(codes(1) == 0 && dq(1) == 5.0f) // constant dim: code 0, exact
    }
    assert(q.map(_._2(0)).toSeq == Seq(0, 255, 102)) // 0.4*255 = 102
  }

  test("quantizedTopKPerQuery: recall@10 vs exact stays high on real embeddings") {
    val emb = Tables(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") >= 10)
    val exact = Similarity.topKPerQuery(corpus, queries, 10, queryIdCol = "query_id")
      .select("query_id", "vec_id")
    val quant = Similarity.quantizedTopKPerQuery(corpus, queries, 10, queryIdCol = "query_id")
      .select("query_id", "vec_id")
    val hits = quant.join(exact, Seq("query_id", "vec_id")).count()
    assert(hits >= 70, s"mean recall@10 ${hits / 100.0} below 0.7 floor")
  }

  test("coresetSelect: covers both clusters, diminishing returns, deterministic") {
    // two tight clusters: greedy must take one representative from EACH
    // before a second from either
    val vecs = Seq(
      (1L, Array(1.0f, 0.05f)), (2L, Array(0.99f, 0.1f)),
      (3L, Array(0.05f, 1.0f)), (4L, Array(0.1f, 0.99f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.coresetSelect(vecs, k = 2)
      .as[(Long, Long, Double)].collect()
    val picked = got.map(_._2).toSet
    assert(picked.intersect(Set(1L, 2L)).size == 1 &&
      picked.intersect(Set(3L, 4L)).size == 1, s"picked $picked")
    // real corpus: coverage strictly grows, marginal gains shrink
    val emb = Tables(spark, sf(), "embeddings").localCheckpoint()
    val real = Similarity.coresetSelect(emb, k = 6).as[(Long, Long, Double)].collect()
    assert(real.map(_._1).toSeq == (1L to 6L))
    val cov = real.map(_._3)
    cov.sliding(2).foreach { case Array(a, b) => assert(b > a); case _ => }
    val marginals = cov.sliding(2).map { case Array(a, b) => b - a }.toSeq
    marginals.sliding(2).foreach {
      case Seq(m1, m2) => assert(m2 <= m1 + 1e-9, s"gain grew: $m1 -> $m2")
      case _ =>
    }
    val again = Similarity.coresetSelect(emb, k = 6).as[(Long, Long, Double)].collect()
    assert(again.toSeq == real.toSeq)
  }

  test("mmrSelect: redundancy penalty flips the pick a pure top-k makes") {
    // a: most relevant; b: nearly a's duplicate, 2nd most relevant;
    // c: mirrored across the query axis — diverse from a but nearly as
    // relevant. Top-2 by relevance = (a, b); MMR pays b's redundancy
    // (sim(a,b) ≈ 1 vs sim(a,c) ≈ 0.9) and picks c.
    val vecs = Seq(
      (1L, Array(0.9f, 0.2f)),
      (2L, Array(0.89f, 0.21f)),
      (3L, Array(0.88f, -0.2f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmrSelect(vecs, Seq(1.0f, 0.0f), k = 2,
      poolSize = 3, lambda = 0.7).as[(Long, Long, Double)].collect()
    assert(got.map(_._2).toSeq == Seq(1L, 3L))
    // round 1 score is λ·rel(a)
    assert(math.abs(got(0)._3 - 0.7 * 0.9 / math.sqrt(0.85)) < 1e-6)
  }

  test("mmrSelect: more diverse than plain top-k on the real corpus, deterministic") {
    val emb = Tables(spark, sf(), "embeddings").localCheckpoint()
    val q = emb.filter($"vec_id" === 0).select($"embedding")
      .as[Array[Float]].head().toSeq
    val corpus = emb.filter($"vec_id" =!= 0)
    val mmr = Similarity.mmrSelect(corpus, q, k = 8, poolSize = 40)
      .as[(Long, Long, Double)].collect()
    assert(mmr.length == 8 && mmr.map(_._1).toSeq == (1L to 8L))
    val topk = Similarity.bruteForceTopK(corpus, q, 8)
      .as[(Long, Double)].collect()
    // rank 1 is the pure-relevance argmax in both
    assert(mmr.head._2 == topk.head._1)
    def cosOf(ids: Seq[Long]): Double = {
      val m = emb.filter($"vec_id".isin(ids: _*))
        .as[(Long, Array[Float], String)].collect().map(r => r._1 -> r._2).toMap
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length) yield {
        val (a, b) = (m(ids(i)), m(ids(j)))
        var d = 0.0; var na = 0.0; var nb = 0.0
        for (x <- a.indices) {
          d += a(x).toDouble * b(x); na += a(x).toDouble * a(x); nb += b(x).toDouble * b(x)
        }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      ps.sum / ps.length
    }
    assert(cosOf(mmr.map(_._2).toSeq) <= cosOf(topk.map(_._1).toSeq) + 1e-12)
    val again = Similarity.mmrSelect(corpus, q, k = 8, poolSize = 40)
      .as[(Long, Long, Double)].collect()
    assert(again.toSeq == mmr.toSeq)
  }

  test("jacobiEigen: hand case, reconstruction, orthonormal basis") {
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    val (evals, v) = Similarity.jacobiEigen(a)
    assert(evals.sorted.zip(Seq(1.0, 3.0)).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    // A = V diag(l) V^T and V^T V = I
    for (i <- 0 until 2; j <- 0 until 2) {
      val rec = (0 until 2).map(k => v(i)(k) * evals(k) * v(j)(k)).sum
      assert(math.abs(rec - a(i)(j)) < 1e-12)
      val dot = (0 until 2).map(k => v(k)(i) * v(k)(j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-12)
    }
  }

  test("whitenEmbeddings: correlated synthetic decorrelates to identity") {
    // two strongly correlated dims + one independent
    val rnd = new scala.util.Random(7)
    val rows = (0L until 400L).map { i =>
      val x = rnd.nextGaussian(); val e = rnd.nextGaussian() * 0.1
      (i, Array((3 * x).toFloat, (x + e).toFloat, rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (_, _, covRaw) = Similarity.covarianceStats(df, "embedding")
    assert(math.abs(covRaw(0)(1)) > 1.0, "raw dims must be correlated for the test to bite")
    val wt = Similarity.whitenEmbeddings(df, vecCol = "embedding").persist()
    assert(wt.count() == 400)
    val (_, mu2, cov2) = Similarity.covarianceStats(wt, "whitened")
    for (i <- 0 until 3) {
      assert(math.abs(mu2(i)) < 1e-9)
      for (j <- 0 until 3) {
        val t = if (i == j) 1.0 else 0.0
        assert(math.abs(cov2(i)(j) - t) < 1e-6, s"cov($i)($j) = ${cov2(i)(j)}")
      }
    }
    // deterministic under re-fit
    val again = Similarity.whitenEmbeddings(df, vecCol = "embedding")
    val x1 = wt.orderBy($"vec_id").as[(Long, Seq[Double])].collect().toSeq
    val x2 = again.orderBy($"vec_id").as[(Long, Seq[Double])].collect().toSeq
    assert(x1 == x2)
    wt.unpersist()
  }

  test("whitenedIdentityCheck passes on the real corpus, n_rows grounded") {
    val emb = Tables(spark, sf(), "embeddings")
    val got = Similarity.whitenedIdentityCheck(emb)
      .as[(Long, Boolean, Boolean)].head()
    assert(got == ((emb.count(), true, true)))
  }

  test("pcaProject: hand case recovers the principal axis, deterministic") {
    // points along y = 2x with small orthogonal noise: PC1 must be
    // ~(1,2)/sqrt(5) and carry almost all the variance
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map { i =>
      val t = rnd.nextGaussian(); val e = rnd.nextGaussian() * 0.05
      (i, Array((t - 2 * e).toFloat, (2 * t + e).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val p1 = Similarity.pcaProject(df, k = 1).persist()
    // projected variance ~= total variance (noise dim is tiny)
    val (_, _, covIn) = Similarity.covarianceStats(df, "embedding")
    val (_, _, covP) = Similarity.covarianceStats(p1, "pca")
    assert(covP(0)(0) > 0.95 * (covIn(0)(0) + covIn(1)(1)))
    // canonical sign: largest-|component| entry positive => pca_1
    // correlates POSITIVELY with y (the dominant raw coordinate)
    val signCorr = p1.join(df, "vec_id")
      .select(corr($"pca"(0), $"embedding"(1).cast("double"))).head().getDouble(0)
    assert(signCorr > 0.99)
    val again = Similarity.pcaProject(df, k = 1)
    assert(p1.orderBy($"vec_id").as[(Long, Seq[Double])].collect().toSeq ==
      again.orderBy($"vec_id").as[(Long, Seq[Double])].collect().toSeq)
    p1.unpersist()
  }

  test("pcaVarianceCheck passes on the real corpus, grounded columns") {
    val emb = Tables(spark, sf(), "embeddings")
    val got = Similarity.pcaVarianceCheck(emb, k = 16)
      .as[(Long, Long, Long, Boolean, Boolean, Boolean)].head()
    assert(got == ((emb.count(), 64L, 16L, true, true, true)))
  }

  test("randomProject: sparse Achlioptas matrix, norms preserved on average") {
    val emb = Tables(spark, sf(), "embeddings").limit(200).persist()
    val pr = Similarity.randomProject(emb, k = 32, seed = 42L).persist()
    assert(pr.count() == emb.count() * 32)
    // JL: E[||Rx||^2] = ||x||^2 — the mean ratio over the corpus must be
    // near 1 (k = 32 keeps the spread modest)
    val ratio = pr.groupBy($"vec_id").agg(sum($"val" * $"val").as("p2"))
      .join(
        emb.select($"vec_id",
          aggregate(transform($"embedding", x => x.cast("double") * x.cast("double")),
            lit(0.0), (a, b) => a + b).as("n2")),
        "vec_id")
      .select(avg($"p2" / $"n2")).head().getDouble(0)
    assert(math.abs(ratio - 1.0) < 0.25, s"mean norm ratio $ratio")
    // deterministic replay; different seed => different projection
    val again = Similarity.randomProject(emb, k = 32, seed = 42L)
    assert(pr.orderBy($"vec_id", $"dim").as[(Long, Int, Double)].collect().toSeq ==
      again.orderBy($"vec_id", $"dim").as[(Long, Int, Double)].collect().toSeq)
    val other = Similarity.randomProject(emb, k = 32, seed = 43L)
      .orderBy($"vec_id", $"dim").as[(Long, Int, Double)].collect().toSeq
    assert(other != pr.orderBy($"vec_id", $"dim").as[(Long, Int, Double)].collect().toSeq)
    pr.unpersist(); emb.unpersist()
  }
}
