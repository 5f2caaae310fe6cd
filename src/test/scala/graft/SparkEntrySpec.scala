package graft

/** Smoke: every declared query runs and returns rows at sf0.001, and every
  * oracle key refers to a declared query (driver-contract invariants).
  */
class SparkEntrySpec extends SparkSpec {

  test("oracleSql keys are a subset of queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without a query: $unknown")
  }

  /** Approximate queries allowed to skip the DuckDB oracle, each pinned by
    * a hash-green contract twin. A NEW query without an oracle fails here
    * instead of silently landing as a weak rows-only gate row.
    */
  private val declaredRowsOnly: Map[String, String] = Map(
    "q20_minhash_lsh" -> "banded LSH pairs; containment pinned by q84",
    "q21_simhash" -> "signature bits; determinism + pigeonhole pinned by q85",
    "q24_ann_lsh" -> "approximate top-k; recall floor pinned by q86",
    "q25_embed_neardup" -> "bucketed near-dup pairs; exact set pinned by q87",
    "q39_ivf_ann" -> "IVF probe top-k; recall floors pinned by q86/q157",
    "q51_simhash_neardup" -> "Hamming-k pairs; brute-force equality pinned by q85",
    "q100_semantic_dedup" -> "k-means clusters; recall contract pinned by q101")

  test("every query is oracled or declared rows-only with a contract twin") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undeclared = noOracle -- declaredRowsOnly.keySet
    assert(undeclared.isEmpty,
      s"non-oracled queries missing a rows-only declaration: $undeclared")
    val stale = declaredRowsOnly.keySet -- noOracle
    assert(stale.isEmpty, s"rows-only declarations that now have oracles: $stale")
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
