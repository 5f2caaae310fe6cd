package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

class FairnessSpec extends SparkSpec {

  // (group, num, den, y): decision is num/den >= 1/2
  private def audit(rows: Seq[(String, Long, Long, Boolean)]) = {
    import spark.implicits._
    Quality.fairnessAudit(rows.toDF("g", "num", "den", "y"),
      "g", col("num"), col("den"), col("y"), thrNum = 1L, thrDen = 2L)
  }

  test("hand-computed confusion masses, rates, and NULL-when-undefined") {
    import spark.implicits._
    val got = audit(Seq(
      ("g1", 3L, 4L, true),   // pred (0.75), y: tp
      ("g1", 1L, 4L, true),   // no pred, y: fn
      ("g1", 2L, 4L, false),  // pred (boundary 0.5 >= 0.5), !y: fp
      ("g1", 0L, 4L, false),  // tn
      ("g2", 1L, 4L, false),  // tn — g2 has NO positives: tpr undefined
      ("g2", 3L, 4L, false)   // fp
    )).orderBy(col("group_key"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect()
    assert(got(0) == (("g1", 4L, 2L, 2L, 1L, 1L, 1L, 1L,
      5000L, Some(5000L), Some(5000L))))
    assert(got(1) == (("g2", 2L, 0L, 1L, 0L, 1L, 0L, 1L,
      5000L, None, Some(5000L))))
  }

  test("gaps: parity spread, null-skipping equalized odds") {
    import spark.implicits._
    val rows = Seq(
      ("g1", 3L, 4L, true), ("g1", 1L, 4L, true),
      ("g1", 2L, 4L, false), ("g1", 0L, 4L, false),
      ("g2", 1L, 4L, false), ("g2", 3L, 4L, false), // no positives in g2
      ("g3", 3L, 4L, true), ("g3", 3L, 4L, true),
      ("g3", 3L, 4L, true), ("g3", 0L, 4L, true))   // no negatives in g3
    val g = Quality.fairnessGaps(rows.toDF("g", "num", "den", "y"),
      "g", col("num"), col("den"), col("y"), 1L, 2L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // selection: g1 2/4=5000, g2 1/2=5000, g3 3/4=7500 -> parity 2500
    // tpr defined on g1 (5000) and g3 (7500) -> gap 2500
    // fpr defined on g1 (5000) and g2 (5000) -> gap 0; eo = 2500
    assert(g == ((3L, 2500L, 2500L, 0L, 2500L)))
  }

  test("a group-blind scorer has zero gaps") {
    import spark.implicits._
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 0 until 8
    } yield (g, (i % 4).toLong, 4L, i % 2 == 0)
    val g = Quality.fairnessGaps(rows.toDF("g", "num", "den", "y"),
      "g", col("num"), col("den"), col("y"), 1L, 2L)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(g == ((3L, 0L, 0L, 0L, 0L)))
  }
}
