package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[SparkEntry.subsampleRewrite]] — the sub3-twin oracle
  * derivation. The guard and the rewrite must agree on WHOLE-WORD
  * `FROM documents` matches: an identifier merely prefixed with
  * `documents`, or a lowercase `from documents`, must fail loudly
  * instead of producing a silently half-subsampled twin (the r12
  * ADVICE finding: a substring count would accept `FROM documentsx`
  * and then corrupt it to `FROM (SELECT ...)x`).
  */
class SubsampleRewriteSpec extends AnyFunSuite {

  private val sub = "FROM (SELECT * FROM documents WHERE doc_id % 3 = 0)"

  test("every whole-word FROM documents is rewritten, other tables untouched") {
    val sql = "WITH a AS (SELECT doc_id FROM documents), " +
      "b AS (SELECT doc_id FROM documents WHERE lang = 'en') " +
      "SELECT * FROM a JOIN b ON a.doc_id = b.doc_id JOIN events e ON 1=1"
    val got = SparkEntry.subsampleRewrite("qX", sql, "qXb")
    assert(got == ("WITH a AS (SELECT doc_id " + sub + "), " +
      "b AS (SELECT doc_id " + sub + " WHERE lang = 'en') " +
      "SELECT * FROM a JOIN b ON a.doc_id = b.doc_id JOIN events e ON 1=1"))
  }

  test("documents-prefixed identifier is a different table: untouched, no corruption") {
    // substring counting would have seen mentions == fromForms here and
    // the plain replace would have emitted 'FROM (SELECT ...)x' — the
    // r12 ADVICE trap. Word boundaries make documentsx simply not a
    // documents mention: the SQL passes through byte-identical.
    val sql = "SELECT * FROM documentsx WHERE x > 0"
    assert(SparkEntry.subsampleRewrite("qX", sql, "qXb") == sql)
  }

  test("lowercase from documents fails loudly instead of being skipped") {
    val sql = "SELECT * from documents WHERE x > 0"
    val e = intercept[IllegalArgumentException] {
      SparkEntry.subsampleRewrite("qX", sql, "qXb")
    }
    assert(e.getMessage.contains("outside a FROM clause"))
  }

  test("a documents mention in a non-FROM position fails loudly") {
    val sql = "SELECT 'documents' AS t FROM documents"
    val e = intercept[IllegalArgumentException] {
      SparkEntry.subsampleRewrite("qX", sql, "qXb")
    }
    assert(e.getMessage.contains("outside a FROM clause"))
  }

  test("the real twin oracles construct without tripping the guard") {
    val m = SparkEntry.oracleSql
    Seq("q22b_ngram_jaccard_sub3", "q57b_split_leakage_sub3",
      "q73b_neardup_clusters_sub3", "q98b_survivorship_sub3").foreach { t =>
      assert(m(t).contains(sub), s"$t lost its subsample clause")
    }
  }
}
