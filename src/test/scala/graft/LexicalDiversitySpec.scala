package graft

import graft.operators.CorpusAnalytics

/** Lexical diversity: hand-computed TTR / root TTR / MATTR, the short-doc
  * fallback, length-independence of MATTR vs TTR's length bias, and edges.
  */
class LexicalDiversitySpec extends SparkSpec {
  import spark.implicits._

  private def run(w: Int, rows: (Long, String)*): Map[Long, (Long, Long, Double, Double, Double)] =
    CorpusAnalytics.lexicalDiversity(rows.toSeq.toDF("doc_id", "text"), w = w)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap

  test("hand-computed TTR, root TTR, MATTR") {
    val out = run(3, 1L -> "a b a b")
    val (n, types, ttr, root, mattr) = out(1L)
    assert(n == 4L && types == 2L)
    assert(ttr == 0.5)
    assert(root == 1.0) // 2 / sqrt(4)
    // windows of 3: (a b a) -> 2 types, (b a b) -> 2 -> 4 / (2*3)
    assert(mattr == 0.6667)
  }

  test("docs shorter than the window fall back to plain TTR") {
    val out = run(3, 1L -> "a b")
    assert(out(1L)._5 == 1.0)
    assert(out(1L)._3 == 1.0)
  }

  test("MATTR is length-independent where TTR is length-biased") {
    // the same local texture repeated: TTR collapses with length, MATTR holds
    val unit = "red green blue yellow"
    val out = run(4, 1L -> unit, 2L -> Seq.fill(10)(unit).mkString(" "))
    assert(out(2L)._3 < out(1L)._3) // TTR: 4/40 << 4/4
    assert(out(1L)._5 == 1.0)
    // every 4-window of the repeated text holds 4 distinct colors
    assert(out(2L)._5 == 1.0)
  }

  test("degenerate texts score zero") {
    val out = run(25, 1L -> "", 2L -> "   ")
    assert(out(1L) == ((0L, 0L, 0.0, 0.0, 0.0)))
    assert(out(2L) == ((0L, 0L, 0.0, 0.0, 0.0)))
  }

  test("constant text: MATTR floors at 1/w") {
    val out = run(4, 1L -> Seq.fill(12)("spam").mkString(" "))
    assert(out(1L)._5 == 0.25)
    assert(out(1L)._3 == (1.0 / 12 * 10000).round / 10000.0)
  }
}
