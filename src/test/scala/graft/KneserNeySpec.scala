package graft

import graft.operators.CorpusAnalytics
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram CE: hand-computed probabilities, a pure
  * Scala reference model on a multi-doc corpus, the continuation-count
  * property that separates KN from a unigram-backoff mix, and degenerate
  * inputs.
  */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Double)] =
    CorpusAnalytics.kneserNeyCrossEntropy(rows.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

  /** Pure-Scala interpolated KN over the same corpus (the definition,
    * executed sequentially).
    */
  private def reference(texts: Map[Long, String], d: Double = 0.75): Map[Long, (Long, Double)] = {
    val docToks = texts.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val bigrams = docToks.toSeq.flatMap { case (id, ts) =>
      ts.sliding(2).filter(_.size == 2).map(p => (id, (p(0), p(1))))
    }
    val cb = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val cu = bigrams.groupBy(_._2._1).view.mapValues(_.size).toMap
    val n1u = cb.keys.groupBy(_._1).view.mapValues(_.size).toMap
    val n1w = cb.keys.groupBy(_._2).view.mapValues(_.size).toMap
    val nbt = cb.size
    texts.keys.map { id =>
      val bs = bigrams.filter(_._1 == id).map(_._2)
      if (bs.isEmpty) id -> ((0L, 0.0))
      else {
        val ce = -bs.map { case (u, w) =>
          math.log((cb((u, w)).toDouble - d) / cu(u) +
            (d * n1u(u) / cu(u)) * (n1w(w).toDouble / nbt))
        }.sum / bs.size
        id -> ((bs.size.toLong, math.rint(ce * 1e4) / 1e4))
      }
    }.toMap
  }

  test("hand-computed single-doc case") {
    // "a b a c": cb all 1; cu(a)=2 n1u(a)=2, cu(b)=1 n1u(b)=1;
    // n1w(b)=n1w(a)=n1w(c)=1; nbt=3
    // P(b|a)=P(c|a)=.25/2+(.75*2/2)*(1/3)=.375   P(a|b)=.25+.25=.5
    // CE = -(2 ln .375 + ln .5)/3 = 0.8849
    val out = run(1L -> "a b a c")
    assert(out(1L) == ((3L, 0.8849)))
  }

  test("matches the pure-Scala reference on a multi-doc corpus") {
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown cat sleeps",
      3L -> "a lazy dog and a quick fox",
      4L -> "the the the the",
      5L -> "one-token")
    val out = run(texts.toSeq: _*)
    val ref = reference(texts)
    texts.keys.foreach { id =>
      assert(out(id)._1 == ref(id)._1, s"doc $id n_bigrams")
      assert(math.abs(out(id)._2 - ref(id)._2) <= 1e-4, s"doc $id ce")
    }
  }

  test("continuation counts, not raw frequency, set the backoff mass") {
    // "francisco" occurs 3x but ONLY after "san" (one continuation
    // context); "dog" occurs 3x after 3 distinct predecessors. Score the
    // same left context "a": P(dog|a) must exceed P(francisco|a)'s backoff
    // share — i.e. the doc whose novel transition lands on the
    // many-context token scores LOWER CE.
    val corpus = Seq(
      1L -> "san francisco san francisco san francisco",
      2L -> "big dog red dog old dog",
      3L -> "a dog", 4L -> "a francisco")
    val out = run(corpus: _*)
    assert(out(3L)._2 < out(4L)._2)
  }

  test("degenerate docs: empty, blank, single-token, null") {
    val out = run(1L -> "", 2L -> "   ", 3L -> "solo",
      4L -> null.asInstanceOf[String], 5L -> "a b")
    Seq(1L, 2L, 3L, 4L).foreach { id => assert(out(id) == ((0L, 0.0))) }
    assert(out(5L)._1 == 1L)
  }

  test("self-scored probabilities are valid (CE is finite and positive)") {
    val docs = Tables(spark, sf(), "documents")
    val out = CorpusAnalytics.kneserNeyCrossEntropy(docs)
      .filter(col("n_bigrams") > 0).select("cross_entropy")
      .collect().map(_.getDouble(0))
    assert(out.nonEmpty)
    assert(out.forall(ce => ce > 0 && !ce.isNaN && !ce.isInfinite))
  }
}
