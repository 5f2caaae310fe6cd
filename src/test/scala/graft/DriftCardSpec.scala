package graft

import graft.operators.Quality
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

/** The drift card's contract: ONE shared spine, value-identical to the
  * three standalone screens it fuses — every column pinned against
  * groupedKsTest+bhAdjust, groupedW1, and groupedCliffsDelta on the same
  * input, plus the degenerate guards.
  */
class DriftCardSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: Seq[(String, String)]) = rows.toDF("source", "text")

  test("card columns equal the three standalone screens, row for row") {
    val rows = for {
      (src, lens) <- Seq(
        ("a", Seq(3, 3, 4, 5, 5, 6)),
        ("b", Seq(8, 9, 9, 10, 12, 14)),
        ("c", Seq(3, 5, 8, 9, 14, 20)))
      l <- lens
    } yield (src, Seq.fill(l)("w").mkString(" "))
    val d = docs(rows)
    val tc = TextAnalysis.tokenCount(col("text")).cast("long")
    val card = Quality.driftScreenCard(d, tc, col("source"))
      .collect().map(r => r.getString(0) -> r).toMap

    // q232's exact composition
    val ks = Quality.groupedKsTest(d, tc, col("source")).persist()
    def bp(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + lit(0.5)).cast("long")
    val fdr = Quality.bhAdjust(ks, col("group_key"), col("p_value"))
      .join(broadcast(ks.select(col("group_key").as("test_key"),
        col("n_g"), col("ks_d"))), "test_key")
      .select(col("test_key"), col("n_g"), bp(col("ks_d")).as("ks_d_bp"),
        bp(col("p_value")).as("p_bp"), col("p_rank"),
        bp(col("p_adj")).as("p_adj_bp"),
        (bp(col("p_adj")) <= 1000L).as("reject"))
      .collect().map(r => r.getString(0) -> r).toMap
    val w1 = Quality.groupedW1(d, tc, col("source"))
      .collect().map(r => r.getString(0) -> r).toMap
    val delta = Quality.groupedCliffsDelta(d, tc, col("source"))
      .collect().map(r => r.getString(0) -> r).toMap

    for (g <- Seq("a", "b", "c")) {
      val c = card(g)
      assert(c.getLong(1) == fdr(g).getLong(1), s"$g n_g")
      assert(c.getLong(3) == fdr(g).getLong(2), s"$g ks_d_bp")
      assert(c.getLong(4) == fdr(g).getLong(3), s"$g p_bp")
      assert(c.getLong(5) == fdr(g).getLong(4), s"$g p_rank")
      assert(c.getLong(6) == fdr(g).getLong(5), s"$g p_adj_bp")
      assert(c.getBoolean(7) == fdr(g).getBoolean(6), s"$g reject")
      assert(c.getDouble(8) == w1(g).getDouble(3), s"$g w1")
      assert(c.getLong(9) == w1(g).getLong(4), s"$g w1_norm_bp")
      assert(c.getLong(10) == delta(g).getLong(3), s"$g auc_bp")
      assert(c.getLong(11) == delta(g).getLong(4), s"$g cliff_bp")
      // the CvM and energy columns equal the PAIRWISE two-sample
      // operators run on (group, complement) — a cross-implementation
      // pin, not a parallel grouped build
      val mine = d.filter(col("source") === g)
      val rest = d.filter(col("source") =!= g)
      val cvmPair = Quality.cramerVonMises(
        mine.select(tc.as("v")), rest.select(tc.as("v")), "v")
        .select(col("t_bp")).as[Long].head()
      val enPair = Quality.energyDistance(
        mine.select(tc.as("v")), rest.select(tc.as("v")), "v")
        .select(col("energy")).as[Double].head()
      assert(c.getLong(12) == cvmPair, s"$g cvm_bp vs pairwise")
      assert(c.getDouble(13) == enPair, s"$g energy vs pairwise")
    }
  }

  test("an obviously drifted source is rejected and dominant") {
    val rows = (1 to 30).map(i => ("calm" + (i % 3), Seq.fill(5 + i % 3)("w").mkString(" "))) ++
      (1 to 30).map(_ => ("hot", Seq.fill(60)("w").mkString(" ")))
    val card = Quality.driftScreenCard(docs(rows),
      TextAnalysis.tokenCount(col("text")).cast("long"), col("source"))
      .collect().map(r => r.getString(0) -> r).toMap
    val hot = card("hot")
    assert(hot.getBoolean(7), "hot source must be rejected by the FDR screen")
    assert(hot.getLong(10) > 9000L, "hot dominates: auc near 1")
    assert(hot.getDouble(8) > 30.0, "the drift costs ~50 tokens of transport")
  }

  test("single group: counts real, screens null") {
    val rows = Seq(("only", "a b c"), ("only", "a b c d"))
    val out = Quality.driftScreenCard(docs(rows),
      TextAnalysis.tokenCount(col("text")).cast("long"), col("source"))
      .collect()
    // a single group has a null p-value, so the BH frame is empty — the
    // card reports no rows rather than a fabricated screen
    assert(out.isEmpty)
  }
}
