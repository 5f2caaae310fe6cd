package graft

import graft.operators.CorpusAnalytics

/** Good–Turing unseen mass + Chao1 richness: hand-computed
  * frequency-of-frequencies cases and the estimator's defining
  * behaviors (saturated corpus → zero unseen mass; heavy singleton
  * tail → large projected vocabulary).
  */
class VocabRichnessSpec extends SparkSpec {
  import spark.implicits._

  private def vr(texts: Seq[String])
      : (Long, Long, Long, Long, Option[Long], Double) =
    CorpusAnalytics.vocabRichness(texts.toDF("text"))
      .as[(Long, Long, Long, Long, Option[Long], Double)].head()

  test("hand case: counts, GT mass, and Chao1 from the fof table") {
    // tokens: a a a b b c d -> V=4, N=7, f1={c,d}=2, f2={b}=1
    val got = vr(Seq("a a a b b", "c d"))
    assert(got._1 == 4L && got._2 == 7L && got._3 == 2L && got._4 == 1L)
    // GT unseen = 2/7 = 0.2857 -> 2857 bp
    assert(got._5 == Some(2857L))
    // Chao1 = 4 + 2*2/(2*1) = 6
    assert(got._6 == 6.0)
  }

  test("saturated corpus: no singletons, zero unseen mass, chao1 = V") {
    val got = vr(Seq("x x y y", "x y"))
    assert(got._3 == 0L && got._5 == Some(0L) && got._6 == got._1.toDouble)
  }

  test("f2 = 0 falls back to the f1(f1-1)/2 correction") {
    // every token a singleton: V=3, f1=3, f2=0 -> chao1 = 3 + 3*2/2 = 6
    val got = vr(Seq("p q r"))
    assert(got._4 == 0L && got._6 == 6.0)
  }

  test("tokenization matches the corpus shelf: lowercase, whitespace") {
    val got = vr(Seq("  Foo   fOO\tbar  "))
    assert(got._1 == 2L && got._2 == 3L) // {foo, bar}, foo twice
  }

  test("a heavier singleton tail projects a larger vocabulary") {
    val few = vr(Seq("a a b b c c d"))          // f1 = 1
    val many = vr(Seq("a a b c d e f"))          // f1 = 5
    assert(many._6 > few._6)
    assert(many._5.get > few._5.get)
  }

  // ---- corpus distinct-n diversity ----

  private def dn(texts: Seq[String]): Map[Long, (Long, Long, Long)] =
    CorpusAnalytics.distinctNgrams(texts.toDF("text"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("distinct-n: hand case across the three orders") {
    // "a b a b": unigrams a,b,a,b; bigrams "a b","b a","a b"; trigrams
    // "a b a","b a b". "a b" adds 2 unigrams + 1 bigram.
    val got = dn(Seq("a b a b", "a b"))
    assert(got(1L) == ((6L, 2L, 3333L)))
    assert(got(2L) == ((4L, 2L, 5000L)))
    assert(got(3L) == ((2L, 2L, 10000L)))
  }

  test("distinct-n: a copy-paste corpus scores far below a varied one") {
    val copied = dn(Seq.fill(8)("the quick brown fox jumps"))
    val varied = dn(Seq("the quick brown fox", "a slow red dog",
      "some other words here", "yet more new tokens", "all fresh again ok",
      "never a repeat here", "final unique line now", "done with this set"))
    assert(copied(2L)._3 < varied(2L)._3)
    // every bigram in the copied corpus is one of 4 distinct strings
    assert(copied(2L)._2 == 4L)
  }

  test("distinct-n: docs shorter than n contribute nothing; empty text drops") {
    val got = dn(Seq("solo", "  ", "two words"))
    assert(got(1L)._1 == 3L)       // "solo", "two", "words" — blank doc out
    assert(got(2L)._1 == 1L)       // only "two words"
    assert(!got.contains(3L) || got(3L)._1 == 0L)
  }

  // ---- composition concentration card ----

  private def comp(sources: Seq[String])
      : (Long, Long, Option[Long], Option[Long], Option[Long], Option[Long],
        Option[Long]) =
    CorpusAnalytics.compositionDiversity(sources.toDF("source"))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])].head()

  test("composition: uniform mix — HHI 1/k, Hill recovers k exactly") {
    val got = comp(Seq.fill(10)("a") ++ Seq.fill(10)("b") ++
      Seq.fill(10)("c") ++ Seq.fill(10)("d"))
    assert(got._1 == 40L && got._2 == 4L)
    assert(got._3 == Some(2500L)) // top share 1/4
    assert(got._4 == Some(2500L)) // HHI 1/4
    // unbiased Simpson for equal groups: k*m(m-1)/(N(N-1)) = 4*90/1560
    assert(got._5 == Some(math.floor(360.0 / 1560 * 10000 + 0.5).toLong))
    assert(got._6 == Some(math.floor(math.log(4.0) * 10000 + 0.5).toLong))
    assert(got._7 == Some(40000L)) // e^{ln 4} = 4 effective sources
  }

  test("composition: a single source is maximally concentrated") {
    val got = comp(Seq.fill(7)("only"))
    assert(got._2 == 1L && got._3 == Some(10000L) && got._4 == Some(10000L))
    assert(got._5 == Some(10000L) && got._6 == Some(0L) &&
      got._7 == Some(10000L))
  }

  test("composition: skewing the mix raises HHI and lowers Hill") {
    val even = comp(Seq.fill(15)("a") ++ Seq.fill(15)("b"))
    val skew = comp(Seq.fill(27)("a") ++ Seq.fill(3)("b"))
    assert(skew._4.get > even._4.get)
    assert(skew._7.get < even._7.get)
    assert(even._7 == Some(20000L)) // 50/50 mixes like exactly 2 sources
  }
}
