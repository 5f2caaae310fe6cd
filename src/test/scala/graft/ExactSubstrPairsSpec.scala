package graft

import graft.operators.CorpusAnalytics

/** ExactSubstr pair evidence (Lee et al. 2022, arXiv:2107.06499): maximal
  * cross-doc shared token runs per document pair via capped shingle
  * postings + diagonal islands — q236's kernel, and the pair-level
  * complement of the per-doc coverage family (q107/q114).
  */
class ExactSubstrPairsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)],
      n: Int = 3, minRun: Int = 6, dfCap: Int = 128): Map[(Long, Long), (Long, Long)] =
    CorpusAnalytics.exactSubstringPairs(
      rows.toDF("doc_id", "text"), n = n, minRun = minRun, dfCap = dfCap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("a shared 8-token span reports max_run 8, one maximal span") {
    val out = run(Seq(
      1L -> "u1 u2 s1 s2 s3 s4 s5 s6 s7 s8 u3",
      2L -> "v1 s1 s2 s3 s4 s5 s6 s7 s8 v2 v3"))
    assert(out == Map((1L, 2L) -> ((8L, 1L))))
  }

  test("a 5-token shared span is below minRun=6 and emits no pair") {
    val out = run(Seq(
      1L -> "u1 u2 s1 s2 s3 s4 s5 u3 u4",
      2L -> "v1 s1 s2 s3 s4 s5 v2"))
    assert(out.isEmpty)
  }

  test("two disjoint shared spans count as two maximal spans") {
    val out = run(Seq(
      1L -> "a1 a2 a3 a4 a5 a6 u1 u2 u3 b1 b2 b3 b4 b5 b6 b7",
      2L -> "a1 a2 a3 a4 a5 a6 w1 w2 w3 b1 b2 b3 b4 b5 b6 b7"))
    // spans of 6 and 7 tokens at different diagonals-offsets
    assert(out == Map((1L, 2L) -> ((7L, 2L))))
  }

  test("a span repeated twice in one doc against one copy in the other is two alignments") {
    val out = run(Seq(
      1L -> "u1 s1 s2 s3 s4 s5 s6 u2",
      2L -> "s1 s2 s3 s4 s5 s6 w1 w2 s1 s2 s3 s4 s5 s6"))
    // doc1's single copy aligns with both of doc2's copies (two diagonals);
    // doc2's within-doc repeat itself is q114's domain, not a pair here
    assert(out == Map((1L, 2L) -> ((6L, 2L))))
  }

  test("within-doc repeats alone produce no pair") {
    val out = run(Seq(
      1L -> "s1 s2 s3 s4 s5 s6 x1 s1 s2 s3 s4 s5 s6",
      2L -> "totally different tokens here none shared at all"))
    assert(out.isEmpty)
  }

  test("grams above dfCap are excluded from matching") {
    // the span's every trigram occurs 3 times (three docs share it);
    // with dfCap=2 no gram clears the gate -> no pairs at all
    val docs = Seq(
      1L -> "p1 s1 s2 s3 s4 s5 s6 s7",
      2L -> "p2 s1 s2 s3 s4 s5 s6 s7",
      3L -> "p3 s1 s2 s3 s4 s5 s6 s7")
    assert(run(docs, dfCap = 2).isEmpty)
    // with the cap clear, all three pairs report the 7-token span
    val full = run(docs, dfCap = 128)
    assert(full.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(full.values.toSet == Set((7L, 1L)))
  }

  test("an over-cap interior gram splits a run only when no sub-cap gram bridges it") {
    // "c1 c2 c3" occurs in all four docs (occ=4 > cap=3) but every other
    // trigram of the long span occurs only twice: the bridging grams
    // ("s3 c1 c2", "c2 c3 s4", ...) keep the 1-2 run whole
    val out = run(Seq(
      1L -> "u1 s1 s2 s3 c1 c2 c3 s4 s5 s6 u2",
      2L -> "v1 s1 s2 s3 c1 c2 c3 s4 s5 s6 v2",
      3L -> "w1 w2 c1 c2 c3 w3 w4 w5 w6 w7 w8",
      4L -> "x1 x2 c1 c2 c3 x3 x4 x5 x6 x7 x8"), dfCap = 3)
    assert(out((1L, 2L)) == ((9L, 1L)))
    // docs 3/4 share ONLY the over-cap gram -> no pair
    assert(!out.contains((3L, 4L)))
  }

  test("pair runs are consistent with the per-doc coverage family (q114)") {
    val rows = Seq(
      1L -> "u1 u2 s1 s2 s3 s4 s5 s6 s7 s8 u3",
      2L -> "v1 s1 s2 s3 s4 s5 s6 s7 s8 v2 v3",
      3L -> "a1 a2 a3 a4 a5 a6 b7 b8 b9 s1 s2 s3",
      4L -> "a1 a2 a3 a4 a5 a6 c7 c8 c9 zz1 zz2")
    val df = rows.toDF("doc_id", "text")
    val pairs = run(rows)
    val perDoc = CorpusAnalytics.longestDuplicatedRun(df)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // every q236 run is built of cross-doc duplicated grams, so each
    // side's q114 longest covered run is at least the pair's max_run
    pairs.foreach { case ((a, b), (mx, _)) =>
      assert(perDoc(a) >= mx, s"doc $a longest_run ${perDoc(a)} < pair max_run $mx")
      assert(perDoc(b) >= mx, s"doc $b longest_run ${perDoc(b)} < pair max_run $mx")
    }
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)))
  }

  test("length-gated removal strips only runs >= minRun") {
    // doc1 shares a 9-token span with doc2 and a 5-token span with doc3;
    // at minRun=6 only the long span's positions are stripped
    val df = Seq(
      1L -> "u1 a1 a2 a3 a4 a5 a6 a7 a8 a9 u2 b1 b2 b3 b4 b5 u3",
      2L -> "v1 a1 a2 a3 a4 a5 a6 a7 a8 a9 v2",
      3L -> "w1 b1 b2 b3 b4 b5 w2").toDF("doc_id", "text")
    val out = CorpusAnalytics.removeLongDuplicatedPassages(df, minRun = 6)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((9L, "u1 u2 b1 b2 b3 b4 b5 u3")))
    assert(out(2L) == ((9L, "v1 v2")))
    // doc3's only shared span is 5 tokens < minRun -> untouched
    assert(out(3L) == ((0L, "w1 b1 b2 b3 b4 b5 w2")))
  }

  test("removal at minRun = n equals the strip-everything pass (q107)") {
    val df = Seq(
      1L -> "a b c tail1 x y z q",
      2L -> "head2 a b c mid x y z",
      3L -> "all unique tokens in here").toDF("doc_id", "text")
    val gated = CorpusAnalytics.removeLongDuplicatedPassages(df, minRun = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val full = CorpusAnalytics.removeDuplicatedPassages(df)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(gated == full)
  }

  test("null text and short docs are ignored without error") {
    val df = Seq((1L, "s1 s2 s3 s4 s5 s6 tail"), (2L, "s1 s2 s3 s4 s5 s6"),
      (3L, null.asInstanceOf[String]), (4L, "ab")).toDF("doc_id", "text")
    val out = CorpusAnalytics.exactSubstringPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map((1L, 2L) -> ((6L, 1L))))
  }
}
