package graft

import graft.operators.{Dedup, RangeJoin}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Properties over randomized inputs for the two prefix/bin-filtered
  * operators: the filters must only PRUNE, never change the answer — both
  * must equal their brute-force definitions on arbitrary data, including
  * degenerate docs and zero-length / touching intervals.
  */
class ContainmentPropSpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.oneOf("a", "b", "c", "d", "e", "fox", "dog")
  private val docGen = for {
    k <- Gen.choose(1, 10)
    ws <- Gen.listOfN(k, wordGen)
  } yield ws.mkString(" ")

  test("containmentPairs == brute force on random small corpora (20 rounds)") {
    val params = Gen.Parameters.default
    for (round <- 0 until 20) {
      val docs = (0 until 8).map { i =>
        (i.toLong, docGen.apply(params, Seed(round * 100L + i))
          .getOrElse(sys.error(s"gen failed at $round/$i")))
      }.toDF("doc_id", "text")
      val got = Dedup.containmentPairs(docs, tauNum = 1, tauDen = 2)
        .select("a_id", "b_id", "n_inter").as[(Long, Long, Long)].collect().toSet
      val g = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("gs"))
      val brute = g.select(col("doc_id").as("a_id"), col("gs").as("ga"))
        .crossJoin(g.select(col("doc_id").as("b_id"), col("gs").as("gb")))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("ga"), col("gb"))).cast("long").as("n_inter"),
          size(col("ga")).cast("long").as("n_a"))
        .filter(col("n_inter") * 2 >= col("n_a") * 1)
        .select("a_id", "b_id", "n_inter").as[(Long, Long, Long)].collect().toSet
      assert(got == brute, s"round $round: $got vs $brute")
    }
  }

  test("intervalOverlap == nested loop on random intervals incl. degenerate (20 rounds)") {
    val params = Gen.Parameters.default
    val ivGen = for {
      s <- Gen.choose(-20L, 20L)
      len <- Gen.oneOf(Gen.const(0L), Gen.choose(0L, 9L), Gen.choose(0L, 40L))
    } yield (s, s + len)
    for (round <- 0 until 20) {
      def gen(tag: Long, n: Int, off: Int) = (0 until n).map { i =>
        val (a, b) = ivGen.apply(params, Seed(round * 1000L + off + i))
          .getOrElse(sys.error(s"gen failed at $round/$off/$i"))
        (tag + i, a, b)
      }
      val left = gen(0L, 7, 0).toDF("l_id", "ls", "le")
      val right = gen(100L, 7, 50).toDF("r_id", "rs", "re")
      for (bin <- Seq(1L, 4L, 64L)) {
        val got = RangeJoin.intervalOverlap(left, right, "ls", "le", "rs", "re", bin)
          .select("l_id", "r_id").as[(Long, Long)].collect()
        val brute = left.crossJoin(right)
          .filter(col("ls") <= col("re") && col("rs") <= col("le"))
          .select("l_id", "r_id").as[(Long, Long)].collect()
        assert(got.sorted.toSeq == brute.sorted.toSeq,
          s"round $round bin $bin: ${got.toSeq} vs ${brute.toSeq}")
        assert(got.distinct.length == got.length, s"round $round bin $bin emitted dups")
      }
    }
  }
}
