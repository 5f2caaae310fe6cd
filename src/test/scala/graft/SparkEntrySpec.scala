package graft

/** Smoke: every declared query runs and returns rows at sf0.001, and every
  * oracle key refers to a declared query (driver-contract invariants).
  */
class SparkEntrySpec extends SparkSpec {

  test("oracleSql keys are a subset of queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sf()).count() > 0, s"$name returned 0 rows")
    }
  }
}
