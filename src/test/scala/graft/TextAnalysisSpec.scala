package graft

import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).head().getAs[T](0)

  test("tokenCount: whitespace tokens, 0 for empty/blank") {
    assert(eval1[Int](TextAnalysis.tokenCount(lit("a  b\tc"))) == 3)
    assert(eval1[Int](TextAnalysis.tokenCount(lit(""))) == 0)
    assert(eval1[Int](TextAnalysis.tokenCount(lit("   "))) == 0)
  }

  test("subwordCount: words, digits, punct runs") {
    // "don't stop 42!" -> don, ', t, stop, 4, 2, !
    assert(eval1[Int](TextAnalysis.subwordCount(lit("don't stop 42!"))) == 7)
  }

  test("alphaRatio and meanWordLength") {
    assert(eval1[Double](TextAnalysis.alphaRatio(lit("ab12"))) == 0.5)
    assert(eval1[Double](TextAnalysis.meanWordLength(lit("ab cdef"))) == 3.0)
  }

  test("stopwordRatio counts list hits") {
    assert(eval1[Double](TextAnalysis.stopwordRatio(lit("the cat and the hat"))) == 0.6)
  }

  test("qualityScore in [0,1], higher for prose than for noise") {
    val prose = eval1[Double](TextAnalysis.qualityScore(
      lit("the quick brown fox jumps over the lazy dog and runs away")))
    val noise = eval1[Double](TextAnalysis.qualityScore(lit("@@ ## $$ 123 456")))
    assert(prose > noise && prose <= 1.0 && noise >= 0.0)
  }

  test("langId picks the language whose function words dominate") {
    assert(eval1[String](TextAnalysis.langId(
      lit("the cat is on the mat and it was good"))) == "en")
    assert(eval1[String](TextAnalysis.langId(
      lit("el gato que se sienta en la casa por los dias"))) == "es")
    assert(eval1[String](TextAnalysis.langId(lit("zzz qqq xxx"))) == "und")
  }

  test("fingerprint invariant to case and whitespace runs") {
    val a = eval1[String](TextAnalysis.fingerprint(lit("Hello   World")))
    val b = eval1[String](TextAnalysis.fingerprint(lit("hello world ")))
    val c = eval1[String](TextAnalysis.fingerprint(lit("hello worlds")))
    assert(a == b && a != c)
  }

  test("rollingHash is order-sensitive") {
    val ab = eval1[Long](TextAnalysis.rollingHash(lit("alpha beta")))
    val ba = eval1[Long](TextAnalysis.rollingHash(lit("beta alpha")))
    assert(ab != ba)
  }

  test("readability: hand-computed FK on a simple sentence") {
    // "the cat sat." -> 3 words, 1 sentence, vowel runs: e/a/a = 3
    val r = eval1[org.apache.spark.sql.Row](
      TextAnalysis.readability(lit("the cat sat.")))
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L && r.getLong(2) == 3L)
    // fk = 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert(r.getDouble(3) == -2.62)
    // ease = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(r.getDouble(4) == 119.19)
  }

  test("readability: multisyllable words raise the grade; sentences floor at 1") {
    val simple = eval1[org.apache.spark.sql.Row](
      TextAnalysis.readability(lit("no punctuation here at all")))
    assert(simple.getLong(1) == 1L) // sentence floor
    val hard = eval1[org.apache.spark.sql.Row](
      TextAnalysis.readability(lit("extraordinary communication prevails.")))
    assert(hard.getDouble(3) > simple.getDouble(3))
    // syllables never fall below the word count
    val weird = eval1[org.apache.spark.sql.Row](
      TextAnalysis.readability(lit("hmm pfft tsk")))
    assert(weird.getLong(2) == 3L)
  }
}
