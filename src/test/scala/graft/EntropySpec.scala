package graft

import graft.operators.CorpusAnalytics
import org.apache.spark.sql.DataFrame

/** Shannon entropy signals: hand-computed char/word entropies, degenerate
  * texts, and the whitespace-only edge (chars but no tokens).
  */
class EntropySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Double, Long, Double)] =
    CorpusAnalytics.entropySignals(rows.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))))
      .toMap

  test("hand-computed char entropy") {
    val out = run(1L -> "aabb", 2L -> "abcd", 3L -> "aaaa")
    assert(out(1L)._2 == 0.6931) // ln 4 - (2·2 ln 2)/4 = ln 2
    assert(out(2L)._2 == 1.3863) // uniform: ln 4
    assert(out(3L)._2 == 0.0)    // constant: zero entropy
    assert(out(1L)._1 == 4L)
  }

  test("hand-computed word entropy") {
    val out = run(1L -> "a a b")
    // tokens (a, a, b): ln 3 - (2 ln 2)/3 = 0.6365
    assert(out(1L)._4 == 0.6365)
    assert(out(1L)._3 == 3L)
    // char side sees the spaces too: "a a b" = 5 chars {a:2, ' ':2, b:1}
    assert(out(1L)._1 == 5L)
  }

  test("case folding: entropy is computed over lowered text") {
    val out = run(1L -> "AaAa", 2L -> "aaaa")
    assert(out(1L)._2 == out(2L)._2)
  }

  test("whitespace-only text has chars but zero tokens") {
    val out = run(1L -> "   ")
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == 0.0) // single-symbol alphabet
    assert(out(1L)._3 == 0L)
    assert(out(1L)._4 == 0.0)
  }

  test("null and empty texts are dropped") {
    val out = run(1L -> "ok doc", 2L -> "", 3L -> null.asInstanceOf[String])
    assert(out.keySet == Set(1L))
  }

  test("gibberish separates from repetitive text") {
    val gibberish = (0 until 500)
      .map(i => ('a' + ((i * 2654435761L >>> 9) % 26).toInt).toChar).mkString
    val template = "the same words again and again " * 16
    val out = run(1L -> gibberish, 2L -> template)
    assert(out(1L)._2 > out(2L)._2 + 0.5,
      s"char entropy should separate: ${out(1L)._2} vs ${out(2L)._2}")
  }
}
