package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** The fused two-sample card must agree column-for-column with the
  * standalone operators whose display chains it copies — the q249
  * card-vs-separated-trio contract applied to the two-sample axis.
  * CvM is the one documented exception (the card uses the exact-moment
  * algebra, the standalone sums floor(term·2³⁰) grains), pinned within
  * 1 bp.
  */
class TwoSampleCardSpec extends SparkSpec {
  import spark.implicits._

  private def bp4(v: Double) = math.floor(v * 10000 + 0.5).toLong

  test("card columns equal the standalone operators on random data") {
    val rnd = new scala.util.Random(57)
    for (trial <- 1 to 3) {
      val a = Seq.fill(60 + trial)(rnd.nextInt(25).toDouble)
      val b = Seq.fill(70 + trial)(rnd.nextInt(25).toDouble + rnd.nextInt(4))
      val da = a.toDF("value"); val db = b.toDF("value")
      val card = Quality.twoSampleCard(da, db, "value").head()
      def cardL(name: String) = card.getLong(card.fieldIndex(name))

      val ks = Quality.ksTest(da, db, "value").head()
      assert(cardL("ks_d_bp") == bp4(ks.getDouble(2)), "ks_d")
      assert(cardL("ks_p_bp") == bp4(ks.getDouble(3)), "ks_p")

      val ku = Quality.kuiperTest(da, db, "value").head()
      assert(cardL("kuiper_v_bp") == ku.getLong(4), "kuiper")

      val wu = Quality.watsonU2(da, db, "value").head()
      assert(cardL("watson_u2_bp") == wu.getLong(2), "watson")

      val cvm = Quality.cramerVonMises(da, db, "value").head()
      assert(math.abs(cardL("cvm_t_bp") - cvm.getLong(2)) <= 1, "cvm grain")

      val mwu = Quality.mannWhitneyU(da, db, "value").head()
      assert(cardL("auc_bp") == mwu.getLong(3), "auc")
      assert(cardL("mwu_z_bp") == bp4(mwu.getDouble(4)), "mwu z")

      val bm = Quality.brunnerMunzel(da, db, "value").head()
      assert(cardL("bm_p_hat_bp") == bm.getLong(2), "bm p_hat")
      assert(cardL("bm_w_bp") == bm.getLong(3), "bm w")
      assert(cardL("bm_df_bp") == bm.getLong(4), "bm df")

      val cu = Quality.cucconiTest(da, db, "value").head()
      assert(cardL("cucconi_c_bp") == cu.getLong(4), "cucconi c")
      assert(cardL("cucconi_p_bp") == cu.getLong(5), "cucconi p")

      val ab = Quality.ansariBradley(da, db, "value").head()
      assert(cardL("ab_z_bp") == ab.getLong(2), "ab z")

      val lp = Quality.lepageTest(da, db, "value").head()
      assert(cardL("lepage_l_bp") == lp.getLong(4), "lepage l")
      assert(cardL("lepage_p_bp") == lp.getLong(5), "lepage p")
    }
  }

  test("identical samples: location/scale legs are null-or-central") {
    val a = (1 to 50).map(_.toDouble % 7)
    val card = Quality.twoSampleCard(a.toDF("value"), a.toDF("value"), "value").head()
    def cardL(name: String) = card.getLong(card.fieldIndex(name))
    assert(cardL("ks_d_bp") == 0L && cardL("kuiper_v_bp") == 0L &&
      cardL("watson_u2_bp") == 0L && cardL("cvm_t_bp") == 0L)
    assert(cardL("auc_bp") == 5000L && cardL("bm_p_hat_bp") == 5000L)
    assert(cardL("ks_p_bp") == 10000L)
  }
}
