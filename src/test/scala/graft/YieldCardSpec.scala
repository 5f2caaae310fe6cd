package graft

import org.apache.spark.sql.functions._

/** The dedup-yield curve and dataset card: band/cumulative arithmetic on a
  * planted corpus and card-field sanity over the real one.
  */
class YieldCardSpec extends SparkSpec {

  test("dedup yield: bands partition pairs, cumulative is a suffix sum") {
    val out = SparkEntry.queries("q199_dedup_yield")(spark, sf("sf0.01"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // bands ascend; every band is a 0.05 grid point in [0.5, 1.0]
    out.foreach { case (b, n, _) =>
      assert(b >= 0.5 && b <= 1.0 && n > 0)
      assert(math.abs(b * 20 - math.rint(b * 20)) < 1e-12)
    }
    // suffix-cumulative: n_cum(i) = n(i) + n_cum(i+1); last band closes
    out.sliding(2).foreach {
      case Array((_, n, c), (_, _, c2)) => assert(c == n + c2)
      case _ =>
    }
    assert(out.last._2 == out.last._3)
    // head cumulative covers every pair
    assert(out.head._3 == out.map(_._2).sum)
  }

  test("dataset card: rates bounded, masses consistent") {
    val r = SparkEntry.queries("q200_dataset_card")(spark, sf("sf0.01")).head()
    val (nDocs, nToks) = (r.getLong(0), r.getLong(1))
    assert(nDocs == 500L && nToks > 0)
    // rate columns are DECIMAL(20,4) (exact-decimal gate parity, r10)
    Seq(2, 3, 4).foreach { i =>
      val v = r.getDecimal(i).doubleValue()
      assert(v >= 0.0 && v <= 1.0, s"rate col $i = $v")
    }
    // mean tokens consistent with the masses (floor-form of the ratio)
    val mean = r.getDecimal(5).doubleValue()
    assert(math.abs(mean - nToks.toDouble / nDocs) < 0.0001)
  }
}
