package graft

import graft.operators.CorpusAnalytics

/** Keep-first passage removal: the globally first occurrence of a
  * duplicated n-gram survives (cross-doc AND within-doc), later
  * occurrences are stripped — contrasted with the strip-both semantics of
  * removeDuplicatedPassages.
  */
class KeepFirstPassageSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*): Map[Long, (Long, Long, String)] =
    CorpusAnalytics.removeDuplicatedPassagesKeepFirst(
      rows.toSeq.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("cross-doc: the earlier doc keeps the passage, the later loses it") {
    val out = run(1L -> "a b c tail1", 2L -> "head2 a b c")
    assert(out(1L) == ((4L, 0L, "a b c tail1")))
    // doc 2's "a b c" occupies positions 1..3 -> stripped
    assert(out(2L) == ((4L, 3L, "head2")))
  }

  test("within-doc repeats keep exactly one copy") {
    val out = run(1L -> "a b c x a b c")
    // grams: "a b c"@0 and @4 duplicate; positions 4,5,6 stripped
    assert(out(1L) == ((7L, 3L, "a b c x")))
  }

  test("strip-both twin removes every occurrence of a cross-doc passage") {
    val df = Seq((1L, "a b c tail1"), (2L, "head2 a b c")).toDF("doc_id", "text")
    val both = CorpusAnalytics.removeDuplicatedPassages(df)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(both(1L) == "tail1" && both(2L) == "head2")
    // ...while keep-first leaves the canonical copy in doc 1 (above)
  }

  test("unique and short texts pass through untouched") {
    val out = run(1L -> "all tokens here unique", 2L -> "ab", 3L -> "")
    assert(out(1L) == ((4L, 0L, "all tokens here unique")))
    assert(out(2L) == ((1L, 0L, "ab")))
    assert(out(3L) == ((1L, 0L, ""))) // literal split: one empty token
  }

  test("a first occurrence can still lose tokens to another gram's later occurrence") {
    // doc1: "q w e" first at (1,0); doc2 contains "q w e" again (stripped)
    // AND introduces "e r t" first at (2,3); doc3 repeats "e r t" -> its
    // copy is stripped even though doc3 is otherwise novel
    val out = run(1L -> "q w e", 2L -> "q w e r t", 3L -> "zz e r t")
    assert(out(1L)._3 == "q w e")
    // doc2: positions 0..2 covered by "q w e"(non-first); "w e r"@1 and
    // "e r t"@2 are FIRST occurrences -> positions 3,4 survive
    assert(out(2L)._3 == "r t")
    assert(out(3L)._3 == "zz")
  }
}
