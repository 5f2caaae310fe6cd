package graft

import graft.operators.Ranking
import org.apache.spark.sql.functions._

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfKeywords: hand-computed scores, lexicographic tie-break") {
    // 3 docs; "common" in all (idf = ln(4/4)+1 = 1), "rare" in one
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common alpha beta"),
      (3L, "common gamma gamma")
    ).toDF("doc_id", "text")
    val got = Ranking.tfidfKeywords(docs, k = 2)
      .orderBy("doc_id", "rnk")
      .as[(Long, Long, String, Double)].collect()
    val n = 3.0
    def idf(df: Int): Double = math.log((n + 1) / (df + 1)) + 1
    // doc 1: common tf=2 score 2.0; rare tf=1 score ln(2)+1 ~ 1.693
    assert(got(0) == (1L, 1L, "common", BigDecimal(2 * idf(3))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got(1)._3 == "rare")
    // doc 2: all three tf=1; alpha/beta both df=1 so idf(1)=ln(2)+1 >
    // common's idf(3)=1; alpha before beta lexicographically at the EXACT
    // same score
    assert(got(2)._3 == "alpha" && got(3)._3 == "beta")
    assert(got(2)._4 == got(3)._4)
    // doc 3: gamma tf=2 outranks common
    assert(got(4)._3 == "gamma" && got(5)._3 == "common")
  }

  test("bm25Rank: term coverage and length normalization order the ranking") {
    val docs = Seq(
      (1L, "merge batch window stream"),          // all 4 terms, short
      (2L, "merge batch filler filler filler filler filler filler"), // 2 terms, long
      (3L, "merge batch"),                        // 2 terms, short
      (4L, "filler filler filler")                // no terms
    ).toDF("doc_id", "text")
    val got = Ranking.bm25Rank(docs, Seq("merge", "batch", "window", "stream"))
      .as[(Long, Long, Double)].collect()
    // doc 4 scores 0 and is excluded
    assert(got.map(_._2).toSet == Set(1L, 2L, 3L))
    // full coverage wins; equal-tf docs order by length normalization
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got.forall(_._3 > 0))
  }

  test("bm25Rank: top hits on the real corpus actually contain query terms") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val terms = Seq("merge", "batch", "window", "stream")
    val got = Ranking.bm25Rank(docs, terms, topN = 5)
      .join(docs, "doc_id")
      .select($"rnk", $"text").as[(Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (rnk, text) =>
      val ts = text.toLowerCase.trim.split("\\s+").toSet
      assert(terms.exists(ts.contains), s"rank $rnk hit has no query term")
    }
  }
}
