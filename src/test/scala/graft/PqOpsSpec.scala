package graft

import graft.functions.{PqOps, VocabPairCounter}
import org.apache.spark.sql.functions._
import scala.util.Random

/** The r19 kernel rewrites must be VALUE-IDENTICAL to the expression
  * forms they replaced: PqModel's codes / residual codes / LUT / top-
  * cluster selection against the naive per-literal definitions (incl.
  * argmin tie order), and VocabPairCounter's per-doc pair-count cells
  * against the shifted-zip pair multiset.
  */
class PqOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private val m = 4
  private val ksub = 5
  private val dsub = 4
  private val dim = m * dsub
  private val books: Array[Array[Array[Double]]] =
    Array.fill(m, ksub, dsub)(rnd.nextGaussian())
  private val cents: Array[Array[Double]] =
    Array.fill(6, dim)(rnd.nextGaussian())
  private val model = PqOps.model(books, cents)

  // the expression form's arithmetic, replicated naively
  private def unitOf(v: Array[Float]): Array[Double] = {
    val d = v.map(_.toDouble)
    val raw = math.sqrt(d.map(x => x * x).sum)
    val nrm = if (raw == 0) 1.0 else raw
    d.map(_ / nrm)
  }
  private def naiveCodes(u: Array[Double]): Array[Int] =
    Array.tabulate(m) { j =>
      val sub = u.slice(j * dsub, (j + 1) * dsub)
      val scored = books(j).zipWithIndex.map { case (c, ci) =>
        val c2 = c.map(x => x * x).sum
        (c2 - 2.0 * sub.zip(c).map { case (a, b) => a * b }.sum, ci)
      }
      scored.minBy { case (d, ci) => (d, ci) }._2
    }

  private def vecs(n: Int): Seq[Array[Float]] =
    (0 until n).map(_ => Array.fill(dim)(rnd.nextGaussian().toFloat)) :+
      Array.fill(dim)(0.0f) // zero vector exercises the norm guard

  test("pq_codes == naive argmin (incl. zero vector)") {
    val vs = vecs(40)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = df.select(col("vec_id"),
      PqOps.pq_codes(col("embedding"), model).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    vs.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong).sameElements(naiveCodes(unitOf(v))), s"vec $i")
    }
  }

  test("pq_residual_codes == naive codes of unit - centroid") {
    val vs = vecs(20)
    val df = vs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.toSeq, i % cents.length) }
      .toDF("vec_id", "embedding", "cluster")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"), col("cluster"))
    val got = df.select(col("vec_id"),
      PqOps.pq_residual_codes(col("embedding"), col("cluster"), model).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    vs.zipWithIndex.foreach { case (v, i) =>
      val u = unitOf(v)
      val c = cents(i % cents.length)
      val res = u.indices.map(t => u(t) - c(t)).toArray
      assert(got(i.toLong).sameElements(naiveCodes(res)), s"vec $i")
    }
  }

  test("pq_lut == naive subspace dots") {
    val vs = vecs(10)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = df.select(col("vec_id"),
      PqOps.pq_lut(col("embedding"), model).as("lut"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray).toMap
    vs.zipWithIndex.foreach { case (v, i) =>
      val u = unitOf(v)
      for (j <- 0 until m; ci <- 0 until ksub) {
        val sub = u.slice(j * dsub, (j + 1) * dsub)
        val want = sub.zip(books(j)(ci)).map { case (a, b) => a * b }.sum
        assert(got(i.toLong)(j)(ci) == want, s"vec $i lut[$j][$ci]")
      }
    }
  }

  test("pq_top_clusters == descending (score, index) order incl. ties") {
    // duplicate centroids force score ties: desc sort_array tie order is
    // HIGHER index first
    val tieCents = cents ++ Array(cents(0).clone(), cents(2).clone())
    val tieModel = PqOps.model(books, tieCents)
    val vs = vecs(20)
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    for (r <- Seq(2, 4, tieCents.length)) {
      val got = df.select(col("vec_id"),
        PqOps.pq_top_clusters(col("embedding"), tieModel, r).as("tc"))
        .collect().map(row => row.getLong(0) ->
          row.getSeq[org.apache.spark.sql.Row](1)
            .map(p => (p.getDouble(0), p.getInt(1)))).toMap
      val gotIds = df.select(col("vec_id"),
        PqOps.pq_top_cluster_ids(col("embedding"), tieModel, r).as("ids"))
        .collect().map(row => row.getLong(0) -> row.getSeq[Int](1)).toMap
      vs.zipWithIndex.foreach { case (v, i) =>
        val raw = v.map(_.toDouble)
        val scores = tieCents.map(c =>
          raw.zip(c).map { case (a, b) => a * b }.sum)
        val want = scores.zipWithIndex
          .sortBy { case (s, ci) => (-s, -ci) }.take(r).toSeq
        assert(got(i.toLong) == want, s"vec $i r=$r")
        assert(gotIds(i.toLong) == want.map(_._2), s"vec $i r=$r ids")
      }
    }
  }

  test("vocab_pair_counts cells == shifted-zip pair multiset") {
    val vocab = Array("a", "b", "c", "d")
    val win = 3
    val counter = new VocabPairCounter(vocab, win)
    val wordPool = vocab ++ Array("oov1", "oov2")
    for (round <- 0 until 15) {
      val r2 = new Random(round)
      val ts = Array.fill(r2.nextInt(12) + 2)(wordPool(r2.nextInt(wordPool.length)))
      val df = Seq(Tuple1(ts.toSeq)).toDF("ts")
      val got = df.select(explode(graft.functions.WordPairs
        .vocab_pair_counts(col("ts"), counter)).as("p"))
        .select("p.w1", "p.w2", "p.c").as[(Int, Int, Long)].collect()
        .map { case (w1, w2, c) => (w1, w2) -> c }.toMap
      // naive shifted-zip reference
      val want = scala.collection.mutable.Map[(Int, Int), Long]()
      val is = ts.map(w => vocab.indexOf(w) + 1)
      for (d <- 1 to win; i <- 0 until is.length - d) {
        val (a, b) = (is(i), is(i + d))
        if (a > 0 && b > 0) {
          want((a, b)) = want.getOrElse((a, b), 0L) + 1
          want((b, a)) = want.getOrElse((b, a), 0L) + 1
        }
      }
      assert(got == want.toMap, s"round $round: tokens ${ts.mkString(",")}")
    }
  }
}
