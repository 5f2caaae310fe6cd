package graft

import graft.operators.CorpusAnalytics

/** Count-Min sketch: the never-undercounts invariant, forced-collision
  * overestimates, exactness at generous width, and mergeability (the
  * sketch of a union equals the elementwise sum of the parts' sketches).
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("estimates never undercount and are exact at generous width") {
    val df = docs(
      1L -> "a a a b b c d e f g",
      2L -> "a b c h i j k")
    val out = CorpusAnalytics.countMinFrequencies(
      df, depth = 4, width = 1024, topK = 20).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"undercount for ${r.getString(0)}")
    }
    // 11 distinct tokens in 4x1024 buckets: collisions are possible but
    // the MIN over 4 independent rows resolves them here
    val byTok = out.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byTok("a") == ((4L, 4L)))
    assert(byTok("b") == ((3L, 3L)))
  }

  test("forced collisions overestimate but never undercount") {
    // width 2, depth 1: every token lands in one of two buckets, so the
    // estimate is the bucket total — a gross overcount, never an undercount
    val df = docs(1L -> "a a a b c d e f g h i j")
    val out = CorpusAnalytics.countMinFrequencies(
      df, depth = 1, width = 2, topK = 20).collect()
    assert(out.map(_.getLong(2)).sum >= out.map(_.getLong(1)).sum)
    out.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    assert(out.exists(_.getLong(3) > 0), "width 2 must collide")
  }

  test("sketch is mergeable: union estimate equals sum of part counters") {
    // the sketch is a pure (i, bucket) count aggregate, so sketching the
    // union is the elementwise sum of sketching the parts — verify via
    // the estimate of a token split across both halves at collision-free
    // width: 2+3 occurrences merge to exactly 5
    val a = docs(1L -> "x x q w e r")
    val b = docs(2L -> "x x x t y u")
    val merged = CorpusAnalytics.countMinFrequencies(
      a.unionAll(b), depth = 4, width = 4096, topK = 5).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(merged("x") == 5L)
  }

  test("probe set is the exact top-k with deterministic tie-break") {
    val df = docs(1L -> "m m m n n o o p q")
    val out = CorpusAnalytics.countMinFrequencies(
      df, depth = 4, width = 1024, topK = 3).collect()
    // counts: m=3, n=2, o=2, p=1, q=1 -> top-3 by (count desc, token asc)
    assert(out.map(_.getString(0)).toSet == Set("m", "n", "o"))
  }
}
