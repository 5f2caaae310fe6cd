package graft

import graft.operators.CorpusAnalytics

/** Pairwise JSD: the identical-distribution zero, the disjoint-support
  * ln 2 ceiling, bounds, and vocabulary sharing.
  */
class SourceJsdSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String, String)*) =
    CorpusAnalytics.sourceDivergenceMatrix(
      rows.toSeq.toDF("doc_id", "text", "src"), groupCol = "src")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap

  test("identical distributions diverge by 0") {
    val out = run((1L, "a a b c", "s1"), (2L, "a a b c", "s2"))
    assert(out(("s1", "s2")) == 0.0)
  }

  test("disjoint supports hit the ln 2 ceiling") {
    val out = run((1L, "x x y y", "s1"), (2L, "p p q q", "s2"))
    assert(out(("s1", "s2")) == 0.6931)
  }

  test("bounded and monotone in overlap") {
    val mixed = run((1L, "a b c d", "s1"), (2L, "a b p q", "s2"))(("s1", "s2"))
    assert(mixed > 0.0 && mixed < 0.6931)
    val close = run((1L, "a b c d", "s1"), (2L, "a b c q", "s2"))(("s1", "s2"))
    assert(close < mixed)
  }

  test("every unordered pair appears exactly once") {
    val out = run(
      (1L, "w1 w2", "a"), (2L, "w1 w3", "b"), (3L, "w2 w3", "c"))
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }
}
