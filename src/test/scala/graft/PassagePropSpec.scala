package graft

import graft.operators.CorpusAnalytics
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: removeDuplicatedPassages and longestDuplicatedRun agree with
  * an independent straightforward reference implementation over random
  * corpora (tiny vocab forces dense cross-doc gram collisions; doc
  * lengths straddle the n-gram threshold).
  */
class PassagePropSpec extends SparkSpec {
  import spark.implicits._

  private val n = 3

  private def reference(docs: Seq[(Long, String)]): Map[Long, (String, Int, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val grams = docs.flatMap { case (id, _) =>
      val ts = toks(id)
      if (ts.length < n) Nil
      else ts.sliding(n).zipWithIndex.map { case (g, i) => (id, i, g.mkString(" ")) }.toSeq
    }
    val crossDoc = grams.groupBy(_._3).collect {
      case (g, occ) if occ.map(_._1).distinct.size >= 2 => g
    }.toSet
    val covered: Map[Long, Set[Int]] = grams
      .filter(g => crossDoc(g._3))
      .flatMap { case (id, pos, _) => (pos until pos + n).map(id -> _) }
      .groupBy(_._1).map { case (id, ps) => id -> ps.map(_._2).toSet }
    docs.map { case (id, _) =>
      val ts = toks(id)
      val cov = covered.getOrElse(id, Set.empty)
      val clean = ts.zipWithIndex.collect { case (t, i) if !cov(i) => t }.mkString(" ")
      val longest =
        if (cov.isEmpty) 0
        else cov.toSeq.sorted.foldLeft((0, 0, Int.MinValue)) {
          case ((best, run, prev), p) =>
            val r = if (p == prev + 1) run + 1 else 1
            (math.max(best, r), r, p)
        }._1
      id -> ((clean, cov.size, longest))
    }.toMap
  }

  private val wordGen = Gen.oneOf("a", "b", "c", "d")
  private val docGen = for {
    k <- Gen.choose(1, 9)
    ws <- Gen.listOfN(k, wordGen)
  } yield ws.mkString(" ")

  test("passage removal + longest run == reference on random corpora (15 rounds)") {
    val params = Gen.Parameters.default
    for (round <- 0 until 15) {
      val docs = (0 until 6).map { i =>
        (i.toLong, docGen.apply(params, Seed(round * 50L + i))
          .getOrElse(sys.error(s"gen failed $round/$i")))
      }
      val df = docs.toDF("doc_id", "text")
      val want = reference(docs)
      val gotClean = CorpusAnalytics.removeDuplicatedPassages(df)
        .select("doc_id", "clean_text", "n_removed")
        .as[(Long, String, Long)].collect()
      for ((id, clean, removed) <- gotClean) {
        assert((clean, removed.toInt) == ((want(id)._1, want(id)._2)),
          s"round $round doc $id: got ($clean, $removed) want ${want(id)} corpus=$docs")
      }
      val gotRuns = CorpusAnalytics.longestDuplicatedRun(df)
        .select("doc_id", "n_covered", "longest_run")
        .as[(Long, Long, Long)].collect()
      for ((id, cov, longest) <- gotRuns) {
        assert((cov.toInt, longest.toInt) == ((want(id)._2, want(id)._3)),
          s"round $round doc $id runs: got ($cov, $longest) want ${want(id)} corpus=$docs")
      }
    }
  }
}
