package graft

import graft.operators.Quality
import graft.operators.Quality._
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    Seq(
      (Some(1L), Some("en"), Some(10L)),
      (Some(2L), Some("de"), Some(20L)),
      (Some(3L), None, Some(999L)),
      (Some(4L), Some("xx"), None),
      (Some(4L), Some("EN!"), Some(-5L))
    ).toDF("id", "lang", "n")
  }

  test("profile: nulls, exact distincts, native-type min/max, completeness") {
    import spark.implicits._
    val p = Quality.profile(sample, Seq("id", "lang", "n"))
      .as[(String, Long, Long, Long, Double, String, String)]
      .collect().map(r => r._1 -> r).toMap
    val id = p("id")
    assert(id._2 == 5 && id._3 == 0 && id._4 == 4 && id._5 == 1.0)
    assert(id._6 == "1" && id._7 == "4")
    val lang = p("lang")
    assert(lang._3 == 1 && lang._4 == 4 && lang._5 == 0.8)
    val n = p("n")
    // numeric, not lexicographic: min is -5, not "10"
    assert(n._6 == "-5" && n._7 == "999")
  }

  test("check: one agg pass, violations counted per constraint") {
    import spark.implicits._
    val rep = Quality.check(sample, Seq(
      NotNull("id"), NotNull("lang"), Unique("id"),
      InRange("n", 0, 100),
      InSet("lang", Seq("en", "de", "fr")),
      MatchesRegex("lang", "^[a-z]{2}$")))
      .as[(String, Boolean, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(rep("not_null(id)") == (("not_null(id)", true, 0L, 5L)))
    assert(rep("not_null(lang)") == (("not_null(lang)", false, 1L, 5L)))
    // id 4 appears twice: one surplus duplicate row
    assert(rep("unique(id)") == (("unique(id)", false, 1L, 5L)))
    // 999 above, -5 below; NULL does not violate range
    assert(rep("in_range(n)") == (("in_range(n)", false, 2L, 5L)))
    // xx and EN! out of set; NULL ignored
    assert(rep("in_set(lang)") == (("in_set(lang)", false, 2L, 5L)))
    // anchored regex: EN! fails, xx passes
    assert(rep("matches_regex(lang)") == (("matches_regex(lang)", false, 1L, 5L)))
  }

  test("check on an empty table: all constraints pass vacuously") {
    val empty = sample.filter(col("id") < 0)
    val rep = Quality.check(empty, Seq(NotNull("id"), Unique("id"), InRange("n", 0, 1)))
    import spark.implicits._
    val rows = rep.as[(String, Boolean, Long, Long)].collect()
    assert(rows.length == 3 && rows.forall(r => r._2 && r._3 == 0L && r._4 == 0L))
  }

  test("profile and check agree on the real documents table") {
    import spark.implicits._
    val docs = Tables(spark, sf(), "documents")
    val prof = Quality.profile(docs, Seq("doc_id", "lang"))
      .as[(String, Long, Long, Long, Double, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(prof("doc_id")._4 == docs.count(), "doc_id must be fully distinct")
    val rep = Quality.check(docs, Seq(Unique("doc_id"), NotNull("text")))
      .as[(String, Boolean, Long, Long)].collect()
    assert(rep.forall(_._2), s"real-corpus constraints must pass: ${rep.mkString(",")}")
  }

  test("ksTest: identical 0/p=1, disjoint-support 1, overlap hand case") {
    import spark.implicits._
    def f(vs: Double*) = vs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val a = f(1.0, 2.0, 3.0, 4.0)
    val same = Quality.ksTest(a, a, "v")
      .as[(Long, Long, Double, Double)].head()
    assert(same == ((4L, 4L, 0.0, 1.0)))
    val apart = Quality.ksTest(a, f(10.0, 11.0, 12.0, 13.0), "v")
      .as[(Long, Long, Double, Double)].head()
    assert(apart._3 == 1.0 && apart._4 < 0.05)
    // a={1,2}, b={2,3}: sup at v=1 and v=2 is |1/2 - 0/2| = 0.5
    val hand = Quality.ksTest(f(1.0, 2.0), f(2.0, 3.0), "v")
      .as[(Long, Long, Double, Double)].head()
    assert(hand._1 == 2L && hand._2 == 2L && hand._3 == 0.5)
  }

  test("spearmanCorrelation: monotone 1, reversed -1, ties hand-checked, affine-invariant") {
    import spark.implicits._
    val mono = (1 to 20).map(i => (i.toLong, i.toDouble, i * i.toDouble))
      .toDF("id", "x", "y")
    assert(Quality.spearmanCorrelation(mono, col("x"), col("y"), "id")
      .as[(Long, Double)].head() == ((20L, 1.0)))
    val rev = (1 to 20).map(i => (i.toLong, i.toDouble, -i.toDouble))
      .toDF("id", "x", "y")
    assert(Quality.spearmanCorrelation(rev, col("x"), col("y"), "id")
      .as[(Long, Double)].head() == ((20L, -1.0)))
    // ties: x=(1,2,2,3), y=(1,3,3,4) — midranks align perfectly -> 1.0
    val tied = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 2.0, 3.0), (4L, 3.0, 4.0))
      .toDF("id", "x", "y")
    assert(Quality.spearmanCorrelation(tied, col("x"), col("y"), "id")
      .as[(Long, Double)].head() == ((4L, 1.0)))
    // rank statistic: invariant under a monotone transform of either axis
    val warped = mono.select(col("id"), (col("x") * 7.0 + 3.0).as("x"),
      exp(col("y") / 400.0).as("y"))
    assert(Quality.spearmanCorrelation(warped, col("x"), col("y"), "id")
      .as[(Long, Double)].head() == ((20L, 1.0)))
  }

  test("scoreDrift: identical snapshots are stable at 0; a shifted snapshot bands major") {
    import spark.implicits._
    val ref = (0 until 200).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val same = Quality.scoreDrift(ref, ref, "v", "id")
      .as[(Long, Long, Double, String)].head()
    assert(same == ((200L, 200L, 0.0, "stable")))
    val shifted = (0 until 200).map(i => (i.toLong, i.toDouble + 1000.0))
      .toDF("id", "v")
    val (nr, nc, psi, band) = Quality.scoreDrift(ref, shifted, "v", "id")
      .as[(Long, Long, Double, String)].head()
    // every shifted value lands in the top reference bin: maximal drift
    assert(nr == 200L && nc == 200L && psi > 0.25 && band == "major")
  }

  test("scoreDrift bins are cut from the reference, not the union") {
    import spark.implicits._
    val ref = (0 until 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    // cur concentrated in the middle reference bins: moderate mass
    // imbalance, not an out-of-range artifact
    val cur = (0 until 100).map(i => (i.toLong, 50.0 + (i % 10))).toDF("id", "v")
    val (_, _, psi, _) = Quality.scoreDrift(ref, cur, "v", "id")
      .as[(Long, Long, Double, String)].head()
    assert(psi > 0.25, s"concentration into two bins must register ($psi)")
  }
}
