package graft

import graft.operators.CorpusAnalytics

/** Gopher repetition signals: hand-computed top-n-gram char fractions and
  * duplicated-5-gram coverage, tie-breaks, and degenerate-text edges.
  */
class GopherSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, Double, Double, Double, Double)] =
    CorpusAnalytics.gopherRepetitionSignals(rows.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))))
      .toMap

  test("hand-computed top-n-gram fractions") {
    val out = run(1L -> "a b a b c")
    val (nTok, tokChars, t2, t3, t4, d5) = out(1L)
    assert(nTok == 5L && tokChars == 5L)
    // "a b" occurs twice, 2 token chars per occurrence -> 4/5
    assert(t2 == 0.8)
    // all 3-grams unique; lex-smallest "a b a" (3 chars) -> 3/5
    assert(t3 == 0.6)
    // all 4-grams unique; "a b a b" (4 chars) -> 4/5
    assert(t4 == 0.8)
    // the single 5-gram occurs once -> no duplicated coverage
    assert(d5 == 0.0)
  }

  test("duplicated 5-gram coverage counts overlap once") {
    // "x y z w v" repeats at positions 0 and 5 -> every position covered
    val out = run(1L -> "x y z w v x y z w v")
    val (nTok, tokChars, t2, _, _, d5) = out(1L)
    assert(nTok == 10L && tokChars == 10L)
    assert(d5 == 1.0)
    // four 2-grams tie at count 2; lex-smallest "v x"? no — counts:
    // "x y" 2, "y z" 2, "z w" 2, "w v" 2, "v x" 1 -> top is "w v" (lex)
    assert(t2 == 0.4)
  }

  test("partial duplicated coverage") {
    // 5-gram "a b c d e" repeats (pos 0, 6); middle token "q" never covered
    val out = run(1L -> "a b c d e q a b c d e")
    val (nTok, _, _, _, _, d5) = out(1L)
    assert(nTok == 11L)
    assert(d5 == (10.0 / 11.0 * 10000).round / 10000.0)
  }

  test("degenerate texts") {
    val out = run(1L -> "hello", 2L -> "", 3L -> "   ", 4L -> "a b")
    assert(out(1L) == ((1L, 5L, 0.0, 0.0, 0.0, 0.0)))
    assert(out(2L) == ((0L, 0L, 0.0, 0.0, 0.0, 0.0)))
    assert(out(3L) == ((0L, 0L, 0.0, 0.0, 0.0, 0.0)))
    // two tokens: one bigram "a b" once -> 2/2 = 1.0; no 3/4/5-grams
    assert(out(4L) == ((2L, 2L, 1.0, 0.0, 0.0, 0.0)))
  }

  test("null text rows are excluded, case folds") {
    val df = Seq((1L, null: String), (2L, "A a")).toDF("doc_id", "text")
    val out = CorpusAnalytics.gopherRepetitionSignals(df).collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    // "A a" lowers to tokens (a, a): bigram "a a" once -> 2/2
    assert(out.head.getDouble(3) == 1.0)
  }

  test("template soup separates from diverse text") {
    val out = run(
      1L -> "buy now click here buy now click here buy now click here",
      2L -> "the quick brown fox jumps over the lazy sleeping dog today")
    // template: "buy now" (count 3, 6 chars) of 45 token chars = 0.4;
    // diverse: every bigram unique, lex-smallest "brown fox" = 8/48
    assert(out(1L)._3 == 0.4)
    assert(out(2L)._3 == 0.1667)
    assert(out(1L)._3 > out(2L)._3)
    assert(out(1L)._6 == 1.0) // the repeated 5-gram covers everything
    assert(out(2L)._6 == 0.0)
  }
}
