package graft

import graft.operators.CorpusAnalytics

/** RAKE: hand-computed deg/freq word scores and phrase folds, ranking with
  * lexicographic tie-break, and degenerate inputs.
  */
class RakeSpec extends SparkSpec {
  import spark.implicits._

  private def run(k: Int, stop: Seq[String], rows: (Long, String)*) =
    CorpusAnalytics.rakeTopPhrases(
      rows.toSeq.toDF("doc_id", "text"), k = k, stopwords = stop)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))

  test("hand-computed scores: longer phrases with shared words win") {
    // phrases: "red apple" / "green apple pie"
    // apple: freq 2, cooc 3 -> 2.5; red: 2.0; green, pie: 3.0
    val out = run(3, Seq("and"), 1L -> "red apple and green apple pie")
    assert(out.toSeq == Seq(
      (1L, 1L, "green apple pie", 8.5),
      (1L, 2L, "red apple", 4.5)))
  }

  test("equal scores tie-break lexicographically") {
    // "deep learning" and "deep network" both score 4.0
    val out = run(2, Seq("of", "the"), 1L -> "deep learning of the deep network")
    assert(out.toSeq == Seq(
      (1L, 1L, "deep learning", 4.0),
      (1L, 2L, "deep network", 4.0)))
  }

  test("k truncates per doc") {
    val out = run(1, Seq("and"), 1L -> "red apple and green apple pie")
    assert(out.length == 1 && out.head._3 == "green apple pie")
  }

  test("all-stopword and empty docs produce no rows") {
    val out = run(3, Seq("the", "and"), 1L -> "the and the", 2L -> "  ",
      3L -> "keep this")
    assert(out.map(_._1).toSet == Set(3L))
    assert(out.head._3 == "keep this")
  }

  test("no corpus statistics needed: single-doc scores are self-contained") {
    // the same doc scores identically alone or beside unrelated docs
    val alone = run(3, Seq("and"), 1L -> "alpha beta and gamma")
    val crowd = run(3, Seq("and"), 1L -> "alpha beta and gamma",
      2L -> "totally different words here")
    assert(alone.filter(_._1 == 1L).toSeq == crowd.filter(_._1 == 1L).toSeq)
  }
}
