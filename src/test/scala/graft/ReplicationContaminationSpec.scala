package graft

import graft.operators.{CorpusAnalytics, Sampling}
import org.apache.spark.sql.functions._

/** Replication plan (stochastic rounding) and eval-side contamination:
  * exact integer weights, the E[n] = w unbiasedness band, determinism,
  * and hand-computed contamination fractions.
  */
class ReplicationContaminationSpec extends SparkSpec {
  import spark.implicits._

  private def plan(w: Double, n: Int = 1000) =
    Sampling.replicationPlan(
      (0L until n.toLong).map(i => (i, w)).toDF("doc_id", "weight"), "weight")

  test("integer weights replicate exactly") {
    val out = plan(2.0).select("n_replicas").as[Long].collect()
    assert(out.forall(_ == 2L))
    assert(plan(0.0).select("n_replicas").as[Long].collect().forall(_ == 0L))
  }

  test("fractional weights stochastically round without bias") {
    val n05 = plan(0.5).agg(sum("n_replicas")).head().getLong(0)
    assert(n05 > 400 && n05 < 600, s"E=500, got $n05")
    val out23 = plan(2.3).select("n_replicas").as[Long].collect()
    assert(out23.forall(v => v == 2L || v == 3L))
    val s23 = out23.sum
    assert(s23 > 2200 && s23 < 2400, s"E=2300, got $s23")
  }

  test("plan is deterministic and seed-sensitive") {
    val a = plan(0.5).select("doc_id", "n_replicas").collect().toSeq
    val b = plan(0.5).select("doc_id", "n_replicas").collect().toSeq
    assert(a == b)
    val c = Sampling.replicationPlan(
      (0L until 1000L).map(i => (i, 0.5)).toDF("doc_id", "weight"),
      "weight", seed = "other").select("doc_id", "n_replicas").collect().toSeq
    assert(a != c)
  }

  test("replication is unbiased across the weight range (property sweep)") {
    // E[n] = w must hold for ANY fractional weight, not just 0.5: sweep
    // the grid and bound every realized mean within a 5-sigma band
    Seq(0.1, 0.25, 0.37, 0.62, 0.85, 1.5, 2.9).foreach { w =>
      val n = 2000
      val s = Sampling.replicationPlan(
        (0L until n.toLong).map(i => (i, w)).toDF("doc_id", "weight"), "weight")
        .agg(org.apache.spark.sql.functions.sum("n_replicas")).head().getLong(0)
      val frac = w - math.floor(w)
      val sd = math.sqrt(n * frac * (1 - frac))
      val expect = n * w
      assert(math.abs(s - expect) <= 5 * sd + 1e-9,
        s"w=$w: sum $s vs E=$expect (sd $sd)")
    }
  }

  test("hand-computed contamination fractions") {
    val train = Seq((100L, "a b c q")).toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, "a b c x y z"), // grams: abc bcx cxy xyz -> only abc hits
      (2L, "a b c q"),     // both grams in train -> 1.0
      (3L, "m n o p")).toDF("doc_id", "text") // novel -> 0.0
    val out = CorpusAnalytics.evalContamination(train, eval_).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((4L, 1L, 0.25)))
    assert(out(2L) == ((2L, 2L, 1.0)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("short eval docs use the whole-text shingle") {
    val train = Seq((100L, "hi there")).toDF("doc_id", "text")
    val eval_ = Seq((1L, "hi there"), (2L, "bye now")).toDF("doc_id", "text")
    val out = CorpusAnalytics.evalContamination(train, eval_).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 && out(2L) == 0.0)
  }

  test("train side never contaminates itself: report covers eval only") {
    val docs = Tables(spark, sf(), "documents")
    val out = CorpusAnalytics.evalContamination(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0))
    assert(out.count() == docs.filter(col("doc_id") % 50 === 0)
      .filter(trim(col("text")) =!= "").count())
    assert(out.filter(col("contamination") < 0 || col("contamination") > 1)
      .count() == 0L)
  }
}
