package graft

import graft.operators.CorpusAnalytics

/** Gries' DP dispersion: hand-computed values, the evenly-dispersed ~0
  * floor, the concentrated ~1-s ceiling, absent-part accounting, and the
  * frequency-blindness DP exists to fix.
  */
class TermDispersionSpec extends SparkSpec {
  import spark.implicits._

  private def run(topK: Int, rows: (Long, String, String)*): Map[String, (Long, Double)] =
    CorpusAnalytics.termDispersion(
      rows.toSeq.toDF("doc_id", "text", "src"), groupCol = "src", topK = topK)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  test("hand-computed DP") {
    // parts equal-sized (4 tokens each, s = 0.5/0.5);
    // "x": 3 in a, 1 in b -> v = (0.75, 0.25) -> DP = 0.5*(0.25+0.25) = 0.25
    val out = run(10,
      (1L, "x x x p", "a"),
      (2L, "x q r s", "b"))
    assert(out("x") == ((4L, 0.25)))
    // "p" only in a: v=(1,0), s=(.5,.5) -> DP = 0.5*(0.5+0.5) = 0.5
    assert(out("p")._2 == 0.5)
  }

  test("perfectly corpus-like dispersion scores 0") {
    val out = run(5,
      (1L, "the a b", "s1"),
      (2L, "the c d", "s2"),
      (3L, "the e f", "s3"))
    assert(out("the")._2 == 0.0)
  }

  test("concentration in one small part approaches 1 - s") {
    // part b holds 1/10 of tokens; "z" lives only there:
    // DP = 0.5*(|0-0.9| + |1-0.1|) = 0.9
    val out = run(20,
      (1L, "a b c d e f g h i", "big"),
      (2L, "z", "small"))
    assert(out("z")._2 == 0.9)
  }

  test("equal raw frequency, different dispersion — DP separates them") {
    // "even" spread across parts; "bursty" same total in one part
    val out = run(10,
      (1L, "even bursty bursty bursty", "p1"),
      (2L, "even filler pad pad", "p2"),
      (3L, "even filler pad pad", "p3"))
    assert(out("even")._1 == 3L && out("bursty")._1 == 3L)
    assert(out("bursty")._2 > out("even")._2)
  }
}
