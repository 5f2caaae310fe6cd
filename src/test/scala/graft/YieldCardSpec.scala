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
    val (nFps, nPass) = (r.getLong(2), r.getLong(3))
    assert(nFps > 0 && nFps <= nDocs && nPass >= 0 && nPass <= nDocs)
    // contamination masses ride along as of r13 (ADVICE item: a red on
    // the contamination bp must localize to value-vs-rounding too)
    val (nGrams, nHits) = (r.getLong(4), r.getLong(5))
    assert(nGrams > 0 && nHits >= 0 && nHits <= nGrams)
    // rate columns are BIGINT basis points (integer-only gate parity, r12)
    Seq(6, 7, 8).foreach { i =>
      val v = r.getLong(i)
      assert(v >= 0L && v <= 10000L, s"rate col $i = $v bp")
    }
    // bp columns replay floor(rate*1e4+0.5) of the shipped masses
    assert(r.getLong(6) ==
      math.floor((1.0 - nFps.toDouble / nDocs) * 10000 + 0.5).toLong)
    assert(r.getLong(7) ==
      math.floor(nPass.toDouble / nDocs * 10000 + 0.5).toLong)
    assert(r.getLong(8) ==
      math.floor(nHits.toDouble / nGrams * 10000 + 0.5).toLong)
    // mean tokens consistent with the masses (floor-form of the ratio)
    assert(r.getLong(9) ==
      math.floor(nToks.toDouble / nDocs * 10000 + 0.5).toLong)
  }
}
