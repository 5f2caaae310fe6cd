package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** The fused k-group card must agree column-for-column with the
  * standalone ANOVA, Kruskal–Wallis, and Mood's median operators whose
  * display chains it copies (the TwoSampleCardSpec contract on the
  * k-group axis).
  */
class KGroupCardSpec extends SparkSpec {
  import spark.implicits._

  test("card columns equal the standalone operators on random groups") {
    val rnd = new scala.util.Random(71)
    for (trial <- 1 to 3) {
      val rows = (0 until 300).map { i =>
        val g = s"g${i % (4 + trial)}"
        (g, (rnd.nextInt(40) + (i % (4 + trial)) * 3).toLong)
      }
      val df = rows.toDF("g", "v")
      val card = Quality.kGroupCard(df, col("v"), col("g")).head()
      def cL(name: String) = card.getLong(card.fieldIndex(name))
      def cD(name: String) = card.getDouble(card.fieldIndex(name))

      val an = Quality.anovaF(df, col("v"), col("g")).head()
      assert(cD("f") == an.getDouble(2), "anova f")
      assert(cL("eta2_bp") == an.getLong(3), "eta2")

      val kw = Quality.kruskalWallis(df, col("v"), col("g")).head()
      assert(cD("h") == kw.getDouble(2), "kw h")
      assert(cD("h_adj") == kw.getDouble(3), "kw h_adj")

      val mood = Quality.moodMedian(df, col("v"), col("g")).head()
      assert(cL("median_v") == mood.getLong(2), "median")
      assert(cL("chi2_bp") == mood.getLong(3), "mood chi2")
      assert(cL("dof") == mood.getLong(4), "mood dof")
      assert(card.getLong(0) == mood.getLong(0) &&
        card.getLong(1) == mood.getLong(1), "n / k")
    }
  }

  test("degenerate input nulls every leg coherently") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "v")
    val card = Quality.kGroupCard(df, col("v"), col("g")).head()
    def idx(name: String) = card.fieldIndex(name)
    // constant corpus: zero within AND between variance, empty upper half
    assert(card.isNullAt(idx("f")) && card.isNullAt(idx("eta2_bp")))
    assert(card.isNullAt(idx("chi2_bp")) && card.isNullAt(idx("dof")))
    assert(card.getLong(idx("median_v")) == 5L)
  }
}
