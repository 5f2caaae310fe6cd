package graft

import graft.operators.Dedup

/** LSH S-curve planner: hand-computed candidate probabilities, the
  * midpoint formula, monotonicity of the tradeoff, and the best-split
  * flag.
  */
class LshPlanSpec extends SparkSpec {

  private lazy val plan = Dedup.lshParameterPlan(spark).collect()
    .map(r => (r.getInt(0), r.getInt(1)) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5))))
    .toMap

  test("hand-computed S-curve points for (16, 4)") {
    val (mid, pn, pt, _) = plan((16, 4))
    // midpoint (1/16)^(1/4) = 0.5
    assert(mid == 0.5)
    // p(J) = 1 - (1 - J^4)^16
    def p(j: Double) = 1 - math.pow(1 - math.pow(j, 4), 16)
    assert(pn == (p(0.3) * 10000).round / 10000.0)
    assert(pt == (p(0.8) * 10000).round / 10000.0)
  }

  test("extreme splits degenerate as the theory says") {
    // b=64, r=1: everything collides (p -> 1 even at low J)
    assert(plan((64, 1))._2 > 0.99)
    // b=1, r=64: nothing collides below J ~ 1
    assert(plan((1, 64))._3 < 0.01)
  }

  test("exactly one split is flagged best and it beats the extremes") {
    val best = plan.filter(_._2._4)
    assert(best.size == 1)
    val (b, r) = best.keys.head
    assert(b > 1 && b < 64, s"best split ($b, $r) should be interior")
  }

  test("noise probability rises with b at fixed total signatures") {
    val byB = plan.toSeq.sortBy(_._1._1).map(_._2._2)
    assert(byB.zip(byB.tail).forall { case (a, c) => a <= c })
  }
}
