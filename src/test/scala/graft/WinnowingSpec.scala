package graft

import graft.operators.CorpusAnalytics
import org.apache.spark.sql.DataFrame

/** Winnowing fingerprints + overlap join (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003). Pins the paper's guarantee (any shared substring of
  * length >= k + w - 1 yields a shared fingerprint), the ~2/(w+1)
  * selection density, the rightmost-min tie break, and the overlap join's
  * pairing + boilerplate df cap.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val k = 5
  private val w = 4

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def fps(df: DataFrame) =
    CorpusAnalytics.winnowingFingerprints(df, k = k, w = w)

  test("shared substring of length k + w - 1 guarantees a shared fingerprint") {
    // the 8-char run "qzvxkwpj" is the only content the two docs share
    val d = docs(
      1L -> "aaaa bbb qzvxkwpj ccc ddd",
      2L -> "eee fff qzvxkwpj ggg hhhh")
    val byDoc = fps(d).collect().groupBy(_.getLong(0))
    val shared = byDoc(1L).map(_.getLong(2)).toSet
      .intersect(byDoc(2L).map(_.getLong(2)).toSet)
    assert(shared.nonEmpty,
      "winnowing guarantee violated: no shared fingerprint for an 8-char match")
  }

  test("selection density is near 2/(w+1)") {
    // pseudo-random but deterministic text: no repeated windows, so the
    // expected density bound applies
    val text = (0 until 2000)
      .map(i => ('a' + ((i * 2654435761L >>> 7) % 26).toInt).toChar).mkString
    val n = fps(docs(1L -> text)).count().toDouble
    val grams = text.length - k + 1
    val density = n / grams
    // 2/(w+1) = 0.4 for w=4; allow generous slack both ways (distinct
    // drops repeats, min-sharing between adjacent windows lowers it)
    assert(density > 0.2 && density < 0.6, s"density $density out of range")
  }

  test("ties select the RIGHTMOST minimal gram of each window") {
    // a constant string: every gram hash identical, so every window's min
    // is decided purely by the positional tie-break term (2^21-1-pos):
    // rightmost gram wins. 10 chars, 6 grams, 3 windows -> pos {3, 4, 5}
    val rows = fps(docs(1L -> "aaaaaaaaaa")).collect()
    assert(rows.map(_.getLong(1)).toSet == Set(3L, 4L, 5L))
    assert(rows.map(_.getLong(2)).toSet.size == 1)
  }

  test("a doc shorter than k + w - 1 keeps one truncated window") {
    val rows = fps(docs(1L -> "aaaaaa")).collect() // 6 chars: 2 grams, 1 window
    assert(rows.length == 1)
    assert(rows.head.getLong(1) == 1L) // rightmost of the truncated window
  }

  test("overlap join pairs sharing docs and ignores disjoint ones") {
    val d = docs(
      1L -> "aaaa bbb the quick brown fox ccc",
      2L -> "eee fff the quick brown fox ggg",
      3L -> "zzz yyy xxwwvvuu ttss rrqq ppoo")
    val pairs = CorpusAnalytics
      .winnowingOverlapPairs(d, k = k, w = w, minShared = 1, maxDf = 20)
      .collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("minShared filters weak pairs") {
    val d = docs(
      1L -> "aaaa bbb the quick brown fox ccc",
      2L -> "eee fff the quick brown fox ggg")
    val strong = CorpusAnalytics
      .winnowingOverlapPairs(d, k = k, w = w, minShared = 1, maxDf = 20)
      .head.getLong(2)
    val filtered = CorpusAnalytics
      .winnowingOverlapPairs(d, k = k, w = w,
        minShared = strong.toInt + 1, maxDf = 20)
      .count()
    assert(filtered == 0)
  }

  test("df cap drops corpus boilerplate fingerprints") {
    // the same text in 6 docs: every fingerprint has df = 6 > maxDf = 5,
    // so the cap must remove ALL pairs (boilerplate carries no signal)
    val many = docs((1L to 6L).map(i => i -> "the quick brown fox jumps"): _*)
    val capped = CorpusAnalytics
      .winnowingOverlapPairs(many, k = k, w = w, minShared = 1, maxDf = 5)
      .count()
    assert(capped == 0)
    val uncapped = CorpusAnalytics
      .winnowingOverlapPairs(many, k = k, w = w, minShared = 1, maxDf = 6)
      .count()
    assert(uncapped == 15) // all C(6,2) identical-text pairs
  }
}
