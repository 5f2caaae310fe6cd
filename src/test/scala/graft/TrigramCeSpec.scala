package graft

import graft.operators.CorpusAnalytics
import org.apache.spark.sql.DataFrame

/** Interpolated trigram-LM cross-entropy: hand-computed probabilities,
  * the perfectly-predictable-text zero bound, short-doc edges, and the
  * weight-sum guard.
  */
class TrigramCeSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Double)] =
    CorpusAnalytics.trigramCrossEntropy(rows.toSeq.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("hand-computed interpolated CE") {
    // "a b a b a": trigrams (aba)(bab)(aba); P(a|ab)=.6·(2/2)+.3·(2/2)
    // +.1·(3/5)=.96, P(b|ba)=.6·(1/1)+.3·(2/2)+.1·(2/5)=.94
    // CE = -(2·ln .96 + ln .94)/3 = 0.0478
    val out = run(1L -> "a b a b a")
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == 0.0478)
  }

  test("perfectly predictable text scores zero") {
    // a single repeated token: every component probability is 1, so the
    // interpolation sums to exactly λ3+λ2+λ1 = 1 and ln 1 = 0
    val out = run(1L -> "a a a a a a")
    assert(out(1L)._2 == 0.0)
  }

  test("docs with fewer than 3 tokens report zero trigrams") {
    val out = run(1L -> "a b", 2L -> "solo", 3L -> "x y z")
    assert(out(1L) == ((0L, 0.0)))
    assert(out(2L) == ((0L, 0.0)))
    assert(out(3L)._1 == 1L)
  }

  test("weights must sum to one") {
    intercept[IllegalArgumentException] {
      CorpusAnalytics.trigramCrossEntropy(
        Seq((1L, "a b c")).toDF("doc_id", "text"), l3 = 0.5, l2 = 0.5, l1 = 0.5)
    }
  }

  test("novel text scores higher than corpus-typical text") {
    // doc 2 repeats the corpus-dominant pattern; doc 1 is one-off
    val out = run(
      1L -> "q w e r t y u i o p",
      2L -> "a b c a b c a b c a",
      3L -> "a b c a b c a b c a",
      4L -> "a b c a b c a b c a")
    assert(out(1L)._2 > out(2L)._2)
  }
}
