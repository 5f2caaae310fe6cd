package graft

import graft.operators.Dedup

/** Properties of [[Dedup.semanticDedup]] over randomized vector sets, each
  * verified against plain-Scala cosine arithmetic on the same vectors:
  *  1. exactly one output row per input row (nothing lost or duplicated);
  *  2. exactly one keeper per component;
  *  3. every dropped row has a within-threshold neighbor IN ITS COMPONENT
  *     (drops are always witnessed — the precision guarantee q101 pins at
  *     corpus scale);
  *  4. singleton components keep themselves.
  * Seeded generation, no flakiness.
  */
class SemanticDedupPropSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 0.9

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    if (na * nb == 0) 0.0 else dot / (na * nb)
  }

  test("semanticDedup invariants hold over random clustered vector sets") {
    for (trial <- 0 until 3) {
      val rnd = new scala.util.Random(1000 + trial)
      // a few tight direction clusters plus lone outliers
      val anchors = Array.fill(3)(Array.fill(4)(rnd.nextGaussian().toFloat))
      val vecs: Seq[(Long, Array[Float])] = (0 until 24).map { i =>
        val v =
          if (i % 4 == 3) Array.fill(4)(rnd.nextGaussian().toFloat) // outlier
          else anchors(i % 3).map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
        (i.toLong, v)
      }
      val byId = vecs.toMap
      val got = Dedup.semanticDedup(
        vecs.toDF("vec_id", "embedding"), k = 3, threshold = Tau)
        .select("vec_id", "component_id", "keep")
        .as[(Long, Long, Boolean)].collect().toSeq
      // 1. one row per input
      assert(got.map(_._1).sorted == vecs.map(_._1), s"trial $trial: rows")
      // 2. one keeper per component
      got.groupBy(_._2).foreach { case (comp, members) =>
        assert(members.count(_._3) == 1, s"trial $trial comp $comp: keepers")
      }
      // 3. every drop is witnessed within its component
      val comps = got.groupBy(_._2)
      got.filterNot(_._3).foreach { case (id, comp, _) =>
        val witnesses = comps(comp).map(_._1).filter(_ != id)
        assert(witnesses.exists(w => cosine(byId(id), byId(w)) >= Tau),
          s"trial $trial: drop $id has no tau-witness in component $comp")
      }
      // 4. singletons keep themselves
      comps.filter(_._2.size == 1).foreach { case (comp, Seq((id, _, keep))) =>
        assert(keep && comp == id, s"trial $trial: singleton $id")
      }
      spark.catalog.clearCache()
    }
  }
}
