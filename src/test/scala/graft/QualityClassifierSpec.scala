package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** IRLS logistic regression: recovery of a planted signal, agreement with
  * a pure-Scala reference fit, the MLE calibration identity, and the
  * shuffle-free score plan.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // planted signal in f1 with deterministic label noise (every 17th row
  // flips) so the data is NOT separable — the MLE stays finite and Newton
  // converges tightly in 8 steps
  private def planted = (0 until 200).map { i =>
    val f1 = (i % 20) / 20.0
    val f2 = ((i * 7) % 13) / 13.0
    val clean = if (f1 + 0.1 * ((i * 3) % 5 - 2) / 5.0 > 0.5) 1 else 0
    val y = if (i % 17 == 0) 1 - clean else clean
    (y, f1, f2)
  }.toDF("y", "f1", "f2")

  test("recovers the planted signal direction and separates") {
    val beta = Quality.logisticFit(planted, Seq("f1", "f2"), "y")
    assert(beta(1) > 0.0, "f1 drives y up")
    assert(math.abs(beta(1)) > math.abs(beta(2)), "noise feature smaller")
    val scored = Quality.logisticScore(planted, Seq("f1", "f2"), beta)
    val acc = scored
      .select(((col("score") > 0.5).cast("int") === col("y")).cast("int").as("ok"))
      .agg(avg(col("ok"))).head().getDouble(0)
    assert(acc > 0.9, s"accuracy $acc")
  }

  test("matches a pure-Scala IRLS reference on the same data") {
    val rows = planted.collect().map(r =>
      (r.getInt(0).toDouble, Array(1.0, r.getDouble(1), r.getDouble(2))))
    var b = Array(0.0, 0.0, 0.0)
    for (_ <- 0 until 8) {
      val h = Array.ofDim[Double](3, 3); val g = new Array[Double](3)
      rows.foreach { case (y, x) =>
        val eta = (0 until 3).map(i => b(i) * x(i)).sum
        val p = 1.0 / (1.0 + math.exp(-eta)); val w = p * (1 - p)
        for (i <- 0 until 3; j <- 0 until 3) h(i)(j) += w * x(i) * x(j)
        for (i <- 0 until 3) g(i) += (y - p) * x(i)
      }
      (0 until 3).foreach(i => h(i)(i) += 1e-8)
      // solve via the same elimination the operator uses (tiny system)
      val n = 3; val a = h.map(_.clone()); val bb = g.clone()
      for (c <- 0 until n) {
        val piv = (c until n).maxBy(r => math.abs(a(r)(c)))
        val ta = a(c); a(c) = a(piv); a(piv) = ta
        val tb = bb(c); bb(c) = bb(piv); bb(piv) = tb
        for (r <- c + 1 until n) {
          val f = a(r)(c) / a(c)(c)
          for (cc <- c until n) a(r)(cc) -= f * a(c)(cc)
          bb(r) -= f * bb(c)
        }
      }
      val delta = new Array[Double](n)
      for (r <- n - 1 to 0 by -1) {
        var s = bb(r)
        for (cc <- r + 1 until n) s -= a(r)(cc) * delta(cc)
        delta(r) = s / a(r)(r)
      }
      b = b.zip(delta).map { case (x, dx) => x + dx }
    }
    val beta = Quality.logisticFit(planted, Seq("f1", "f2"), "y")
    beta.zip(b).foreach { case (x, ref) =>
      assert(math.abs(x - ref) < 1e-6, s"$x vs $ref")
    }
  }

  test("MLE identities hold: calibration and vanishing gradient") {
    val beta = Quality.logisticFit(planted, Seq("f1", "f2"), "y")
    val scored = Quality.logisticScore(planted, Seq("f1", "f2"), beta)
    val Array(psum, ysum) = scored
      .agg(sum(col("score")), sum(col("y")).cast("double"))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(psum - ysum) < 1e-6)
  }

  test("score plan is a map-side projection: no exchange") {
    val beta = Array(0.1, -0.2, 0.3)
    val plan = Quality.logisticScore(planted, Seq("f1", "f2"), beta)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("contract frame pins the identities on real corpus data") {
    val docs = Tables(spark, sf(), "documents")
    val out = Quality.qualityClassifierContract(
      docs, labelExpr = col("source") === "src0").head()
    assert(out.getLong(0) > 0 && out.getLong(1) > 0)
    assert(out.getBoolean(2), "converged")
    assert(out.getBoolean(3), "calibrated")
    assert(out.getBoolean(4), "probs bounded")
  }
}
