package graft

import graft.operators.EditJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ed-Join edit-similarity self-join: losslessness vs the brute-force
  * quadratic join (the filter may only prune), per-edit-kind recall, the
  * degenerate-short-string sentinel bucket, and tau=0 (exact-dup) mode.
  */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: DataFrame, tau: Int): Set[(Long, Long, Long)] = {
    val b = df.filter(col("s").isNotNull)
    b.select(col("id").as("id1"), col("s").as("s1"))
      .crossJoin(b.select(col("id").as("id2"), col("s").as("s2")))
      .filter(col("id1") < col("id2"))
      .withColumn("dist", levenshtein(col("s1"), col("s2")).cast("long"))
      .filter(col("dist") <= tau)
      .select("id1", "id2", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def edjoin(df: DataFrame, q: Int, tau: Int): Set[(Long, Long, Long)] =
    EditJoin.editSimilarityJoin(df, "id", "s", q, tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("matches brute force exactly on a mixed corpus (q=2, tau=1)") {
    val df = Seq(
      1L -> "spark analytics engine", 2L -> "spark analytics engines",
      3L -> "spark analytic engine", 4L -> "flink analytics engine",
      5L -> "completely different", 6L -> "completely different",
      7L -> "ab", 8L -> "ac", 9L -> "b", 10L -> "xyz",
      11L -> (null: String), 12L -> "spark analytics enginX"
    ).toDF("id", "s")
    assert(edjoin(df, 2, 1) == brute(df, 1))
  }

  test("matches brute force at tau=2 (q=2 and q=3)") {
    val df = Seq(
      1L -> "deduplicate", 2L -> "deduplicato", 3L -> "dedupliXXto",
      4L -> "reduplicate", 5L -> "triplicate", 6L -> "pediculate"
    ).toDF("id", "s")
    assert(edjoin(df, 2, 2) == brute(df, 2))
    assert(edjoin(df, 3, 2) == brute(df, 2))
  }

  test("catches substitution, insertion, and deletion edits") {
    val df = Seq(
      1L -> "abcdefgh", 2L -> "abcdefgX", // substitution
      3L -> "abcdefghZ",                  // insertion vs 1
      4L -> "abcdefg"                     // deletion vs 1
    ).toDF("id", "s")
    val out = edjoin(df, 2, 1)
    assert(out.contains((1L, 2L, 1L)))
    assert(out.contains((1L, 3L, 1L)))
    assert(out.contains((1L, 4L, 1L)))
    // 2-4 is also distance 1 (drop the X); 2-3 and 3-4 are distance 2
    assert(out == Set((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L), (2L, 4L, 1L)))
  }

  test("short strings below the gram bound pair via the sentinel bucket") {
    // q=2, tau=1: strings with m = len-1 <= 2 grams have a vacuous prefix
    // bound; "ab"/"ax" share NO bigram yet are distance 1 apart
    val df = Seq(1L -> "ab", 2L -> "ax", 3L -> "zq").toDF("id", "s")
    val out = edjoin(df, 2, 1)
    assert(out.contains((1L, 2L, 1L)))
    assert(out == brute(df, 1))
  }

  test("tau=1 deletion-variant path: empty and single-char strings pair correctly") {
    // ""/"a" are distance 1 (identity variant of "" == deletion variant of
    // "a"); ""/"" distance 0; "a"/"b" distance 1 via the shared "" variant
    val df = Seq(1L -> "", 2L -> "a", 3L -> "", 4L -> "b", 5L -> "xy")
      .toDF("id", "s")
    assert(edjoin(df, 2, 1) == brute(df, 1))
  }

  test("tau=0 degenerates to exact duplicate detection") {
    val df = Seq(1L -> "same", 2L -> "same", 3L -> "Same").toDF("id", "s")
    assert(edjoin(df, 2, 0) == Set((1L, 2L, 0L)))
  }

  test("sf0.001 customer names: lossless vs brute force end to end (q=2 and q=3)") {
    val cust = Tables(spark, sf(), "customer")
      .select(col("c_custkey").cast("long").as("id"), col("c_name").as("s"))
    val expected = brute(cust, 1)
    assert(edjoin(cust, 2, 1) == expected)
    // q=3 is the SHIPPED q160 configuration — pin it brute-force too
    assert(edjoin(cust, 3, 1) == expected)
  }

  test("randomized dense corpora: positional location filter stays lossless") {
    // small alphabet + short strings = maximal positional-gram collisions
    // and plenty of true pairs: the adversarial regime for the r10
    // |pos1-pos2| <= tau candidate condition; q=3 is the production q160
    // configuration, q=2 the denser-collision one
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3; q <- Seq(2, 3)) {
      val strs = (1L to 60L).map { i =>
        val len = 3 + rnd.nextInt(8)
        i -> (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      val df = strs.toDF("id", "s")
      val tau = 1 + (trial % 2)
      assert(edjoin(df, q, tau) == brute(df, tau),
        s"trial $trial (q=$q tau=$tau) diverged from brute force")
    }
  }
}
