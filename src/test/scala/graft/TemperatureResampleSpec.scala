package graft

import graft.operators.CorpusAnalytics
import org.apache.spark.sql.functions._

/** Temperature (alpha) resampling: keep-rate formula against hand
  * arithmetic, the alpha=1 identity, tail-boost ordering, the pure
  * down-sample invariant (smallest group keeps everything), and
  * determinism of the md5 draw.
  */
class TemperatureResampleSpec extends SparkSpec {
  import spark.implicits._

  // group a: 4x the tokens of group b (docs of 4 tokens vs 1 token)
  private def corpus = (0L until 200L).map { i =>
    if (i % 2 == 0) (i, "w x y z", "a") else (i, "w", "b")
  }.toDF("doc_id", "text", "lang")

  private def run(alpha: Double) =
    CorpusAnalytics.temperatureResample(corpus, groupCol = "lang", alpha = alpha)

  test("hand-computed keep rates at alpha = 0.5") {
    // p_a = 0.8, p_b = 0.2; boost = p^-0.5 -> b is max;
    // r_a = sqrt(0.2/0.8) = 0.5, r_b = 1
    val rates = run(0.5).select($"lang", $"keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("a") == 0.5)
    assert(rates("b") == 1.0)
  }

  test("alpha = 1 keeps every row (rates all 1)") {
    assert(run(1.0).count() == 200L)
  }

  test("alpha = 0 targets the uniform mixture (rates ~ 1/p)") {
    // r_a = (p_a^-1)/(p_b^-1) = p_b/p_a = 0.25
    val rates = run(0.0).select($"lang", $"keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("a") == 0.25)
    assert(rates("b") == 1.0)
  }

  test("pure down-sample: the smallest group keeps all its rows") {
    val kept = run(0.5).filter($"lang" === "b").count()
    assert(kept == 100L)
  }

  test("realized keep fraction tracks the rate") {
    // r_a = 0.5 over 100 docs with a uniform 16-bit draw: expect ~50
    val keptA = run(0.5).filter($"lang" === "a").count()
    assert(keptA > 30L && keptA < 70L, s"kept $keptA of 100 at rate 0.5")
  }

  test("deterministic: identical output across runs") {
    val a = run(0.5).select("doc_id").as[Long].collect().sorted
    val b = run(0.5).select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("alpha out of range is rejected") {
    intercept[IllegalArgumentException](run(1.5).collect())
  }
}
