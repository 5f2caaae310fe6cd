package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** The fused scale card must agree column-for-column with the standalone
  * Brown–Forsythe, Bartlett, and Welch ANOVA operators whose display
  * chains it copies (the KGroupCardSpec contract on the spread axis).
  */
class ScaleCardSpec extends SparkSpec {
  import spark.implicits._

  test("card columns equal the standalone operators on random groups") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 3) {
      val k = 3 + trial
      val rows = (0 until 350).map { i =>
        val g = s"g${i % k}"
        (g, (rnd.nextInt(15 + 12 * (i % k)) + (i % k) * 2).toLong)
      }
      val df = rows.toDF("g", "v")
      val card = Quality.scaleCard(df, col("v"), col("g")).head()
      def cL(name: String) = card.getLong(card.fieldIndex(name))
      def cD(name: String) = card.getDouble(card.fieldIndex(name))

      val bf = Quality.brownForsythe(df, col("v"), col("g")).head()
      assert(cL("n") == bf.getLong(0) && cL("k_groups") == bf.getLong(1),
        "n / k")
      assert(cD("bf_w") == bf.getDouble(2), "bf w")
      assert(cL("bf_eta2_bp") == bf.getLong(3), "bf eta2")

      val bt = Quality.bartlettTest(df, col("v"), col("g")).head()
      assert(cL("bart_df_t") == bt.getLong(2), "bartlett df")
      assert(cL("bart_t_bp") == bt.getLong(3), "bartlett t")

      val we = Quality.welchAnova(df, col("v"), col("g")).head()
      assert(cD("w_star") == we.getDouble(2), "welch w*")
      assert(cL("df2_bp") == we.getLong(3), "welch df2")
    }
  }

  test("singleton groups: bartlett drops them exactly as the standalone") {
    val df = (Seq(("solo", 7L)) ++ (0 until 60).map(i =>
      (s"g${i % 3}", (i % 17).toLong + i % 3))).toDF("g", "v")
    val card = Quality.scaleCard(df, col("v"), col("g")).head()
    val bt = Quality.bartlettTest(df, col("v"), col("g")).head()
    assert(card.getLong(card.fieldIndex("bart_df_t")) == bt.getLong(2))
    assert(card.getLong(card.fieldIndex("bart_t_bp")) == bt.getLong(3))
    // the BF/n side still counts the singleton
    val bf = Quality.brownForsythe(df, col("v"), col("g")).head()
    assert(card.getLong(card.fieldIndex("n")) == bf.getLong(0))
    assert(card.getLong(card.fieldIndex("k_groups")) == bf.getLong(1))
  }

  test("constant corpus nulls every leg coherently") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val card = Quality.scaleCard(df, col("v"), col("g")).head()
    def idx(name: String) = card.fieldIndex(name)
    assert(card.isNullAt(idx("bf_w")) && card.isNullAt(idx("bf_eta2_bp")))
    assert(card.isNullAt(idx("bart_t_bp")))
    assert(card.isNullAt(idx("w_star")) && card.isNullAt(idx("df2_bp")))
  }
}
