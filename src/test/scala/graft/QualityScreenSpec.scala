package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._
import scala.util.Random

/** groupedKsTest's two tiers (driver fold under the cell gate vs the
  * distributed spine) must be row-identical — the gate may only change
  * the plan, never a value. Randomized corpora with ties, skewed group
  * sizes, singleton groups, and a 1-distinct-value degenerate.
  */
class QualityScreenSpec extends SparkSpec {
  import spark.implicits._

  private def screen(rows: Seq[(String, Long)], limit: Long) =
    Quality.groupedKsTest(rows.toDF("g", "v"), col("v"), col("g"), limit)
      .orderBy(col("group_key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq

  test("driver tier == distributed tier on randomized corpora (12 rounds)") {
    for (round <- 0 until 12) {
      val rnd = new Random(round)
      val nGroups = rnd.nextInt(6) + 2
      val rows = (0 until rnd.nextInt(300) + 20).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(12).toLong)
      }
      val local = screen(rows, 1L << 18)
      val dist = screen(rows, 0L) // gate off -> distributed spine
      assert(local == dist, s"round $round")
    }
  }

  test("tiers agree on degenerates: singleton group, one distinct value") {
    val single = Seq(("a", 5L), ("a", 5L), ("b", 5L))
    assert(screen(single, 1L << 18) == screen(single, 0L))
    val lone = Seq(("a", 1L), ("b", 2L), ("b", 3L), ("c", 2L))
    assert(screen(lone, 1L << 18) == screen(lone, 0L))
  }

  test("empty input yields an empty frame in both tiers") {
    val empty = Seq.empty[(String, Long)]
    assert(screen(empty, 1L << 18).isEmpty && screen(empty, 0L).isEmpty)
  }

  private def w1Screen(rows: Seq[(String, Long)], limit: Long) =
    Quality.groupedW1(rows.toDF("g", "v"), col("v"), col("g"), limit)
      .orderBy(col("group_key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), if (r.isNullAt(4)) null else r.getLong(4))).toSeq

  private def cdScreen(rows: Seq[(String, Long)], limit: Long) =
    Quality.groupedCliffsDelta(rows.toDF("g", "v"), col("v"), col("g"), limit)
      .orderBy(col("group_key"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4))).toSeq

  private def card(rows: Seq[(String, Long)], limit: Long) =
    Quality.driftScreenCard(rows.toDF("g", "v"), col("v"), col("g"),
      0.1, limit)
      .orderBy(col("test_key"))
      .collect().map(_.toSeq.toList).toSeq

  test("groupedW1 tiers agree on randomized corpora (10 rounds + degenerates)") {
    for (round <- 0 until 10) {
      val rnd = new Random(1000 + round)
      val nGroups = rnd.nextInt(5) + 2
      val rows = (0 until rnd.nextInt(250) + 20).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(10).toLong)
      }
      assert(w1Screen(rows, 1L << 18) == w1Screen(rows, 0L), s"round $round")
    }
    val oneValue = Seq(("a", 4L), ("b", 4L), ("b", 4L))
    assert(w1Screen(oneValue, 1L << 18) == w1Screen(oneValue, 0L))
  }

  test("groupedCliffsDelta tiers agree on randomized corpora (10 rounds + singleton)") {
    for (round <- 0 until 10) {
      val rnd = new Random(2000 + round)
      val nGroups = rnd.nextInt(5) + 2
      val rows = (0 until rnd.nextInt(250) + 20).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(10).toLong)
      }
      assert(cdScreen(rows, 1L << 18) == cdScreen(rows, 0L), s"round $round")
    }
    val single = Seq(("a", 1L), ("a", 2L))
    assert(cdScreen(single, 1L << 18) == cdScreen(single, 0L))
  }

  test("driftScreenCard tiers agree on randomized corpora (8 rounds + degenerates)") {
    for (round <- 0 until 8) {
      val rnd = new Random(3000 + round)
      val nGroups = rnd.nextInt(5) + 2
      val rows = (0 until rnd.nextInt(250) + 20).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(10).toLong)
      }
      assert(card(rows, 1L << 18) == card(rows, 0L), s"round $round")
    }
    val oneValue = Seq(("a", 4L), ("b", 4L), ("b", 4L))
    assert(card(oneValue, 1L << 18) == card(oneValue, 0L))
    val single = Seq(("a", 1L), ("a", 2L))
    assert(card(single, 1L << 18) == card(single, 0L))
  }

  private def kw(rows: Seq[(String, Long)], limit: Long) =
    Quality.kruskalWallis(rows.toDF("g", "v"), col("v"), col("g"), limit)
      .collect().map(_.toSeq.toList).toSeq

  private def mood(rows: Seq[(String, Long)], limit: Long) =
    Quality.moodMedian(rows.toDF("g", "v"), col("v"), col("g"), limit)
      .collect().map(_.toSeq.toList).toSeq

  private def dunn(rows: Seq[(String, Long)], limit: Long) =
    Quality.dunnPostHoc(rows.toDF("g", "v"), col("v"), col("g"), 3.2905, limit)
      .orderBy(col("group_a"), col("group_b"))
      .collect().map(_.toSeq.toList).toSeq

  private def kgc(rows: Seq[(String, Long)], limit: Long) =
    Quality.kGroupCard(rows.toDF("g", "v"), col("v"), col("g"), limit)
      .collect().map(_.toSeq.toList).toSeq

  test("kruskal/mood/dunn/kGroupCard tiers agree on randomized corpora (10 rounds)") {
    for (round <- 0 until 10) {
      val rnd = new Random(4000 + round)
      val nGroups = rnd.nextInt(5) + 2
      val rows = (0 until rnd.nextInt(300) + 20).map { _ =>
        (s"g${rnd.nextInt(nGroups)}", rnd.nextInt(9).toLong)
      }
      assert(kw(rows, 1L << 18) == kw(rows, 0L), s"kw round $round")
      assert(mood(rows, 1L << 18) == mood(rows, 0L), s"mood round $round")
      assert(dunn(rows, 1L << 18) == dunn(rows, 0L), s"dunn round $round")
      assert(kgc(rows, 1L << 18) == kgc(rows, 0L), s"kgc round $round")
    }
  }

  test("spearman tiers agree on randomized corpora (10 rounds + degenerates)") {
    def sp(rows: Seq[(Long, Long, Long)], limit: Long) =
      Quality.spearmanCorrelation(rows.toDF("id", "x", "y"),
        col("x"), col("y"), "id", limit)
        .collect().map(_.toSeq.toList).toSeq
    for (round <- 0 until 10) {
      val rnd = new Random(5000 + round)
      val rows = (0 until rnd.nextInt(300) + 5).map { i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(8).toLong)
      }
      assert(sp(rows, 1L << 18) == sp(rows, 0L), s"round $round")
    }
    // constant axis / single row: the distributed chain divides by the
    // zero rank-variance denominator and THROWS under ANSI; the local
    // tier must defer (None) so both tiers throw identically
    for (rows <- Seq(
      (0L until 6L).map(i => (i, 3L, i % 3)),
      Seq((1L, 2L, 3L)))) {
      val eLocal = intercept[Exception](sp(rows, 1L << 18))
      val eDist = intercept[Exception](sp(rows, 0L))
      assert(eLocal.getClass == eDist.getClass)
    }
  }

  test("ks/w1 single-group degenerate throws identically in both tiers (ANSI n_rest=0)") {
    val rows = Seq(("a", 1L), ("a", 2L), ("a", 2L))
    for (f <- Seq(
      (l: Long) => screen(rows, l),
      (l: Long) => w1Screen(rows, l))) {
      val eLocal = intercept[Exception](f(1L << 18))
      val eDist = intercept[Exception](f(0L))
      assert(eLocal.getClass == eDist.getClass)
    }
  }

  test("rank-family tiers agree on degenerates: single group, all-tied, two rows") {
    for (rows <- Seq(
      Seq(("a", 5L), ("a", 7L), ("a", 5L)),           // one group
      Seq(("a", 4L), ("b", 4L), ("c", 4L), ("b", 4L)), // all tied
      Seq(("a", 1L), ("b", 2L)))) {                   // minimal
      assert(kw(rows, 1L << 18) == kw(rows, 0L), s"kw $rows")
      assert(mood(rows, 1L << 18) == mood(rows, 0L), s"mood $rows")
      assert(dunn(rows, 1L << 18) == dunn(rows, 0L), s"dunn $rows")
      assert(kgc(rows, 1L << 18) == kgc(rows, 0L), s"kgc $rows")
    }
  }
}
