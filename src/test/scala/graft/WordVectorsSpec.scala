package graft

import graft.operators.CorpusAnalytics

/** Count-based word vectors: the eigen identities, semantic clustering of
  * planted co-occurrence, determinism, and dimensionality.
  */
class WordVectorsSpec extends SparkSpec {
  import spark.implicits._

  // "cat" and "dog" share contexts (pet/food); "car" lives elsewhere
  private def corpus = (
    (1L to 12L).map(i => (i, s"the cat eats pet food bowl")) ++
    (13L to 24L).map(i => (i, s"the dog eats pet food bowl")) ++
    (25L to 36L).map(i => (i, s"the car burns motor fuel tank")))
    .toDF("doc_id", "text")

  private lazy val model =
    CorpusAnalytics.wordVectorModel(corpus, v = 12, win = 3, k = 4)

  private def vec(w: String): Array[Double] =
    model.vectors(model.vocab.indexOf(w))

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else d / (na * nb)
  }

  test("eigen identities hold") {
    assert(model.orthonormal && model.residualOk && model.traceOk)
    assert(model.tPairs > 0 && model.ppmiFro > 0)
  }

  test("shared contexts cluster: cat~dog beats cat~car") {
    assert(model.vocab.contains("cat") && model.vocab.contains("dog")
      && model.vocab.contains("car"))
    assert(cos(vec("cat"), vec("dog")) > cos(vec("cat"), vec("car")))
    assert(cos(vec("cat"), vec("dog")) > cos(vec("dog"), vec("car")))
  }

  test("deterministic: identical model across runs") {
    val again = CorpusAnalytics.wordVectorModel(corpus, v = 12, win = 3, k = 4)
    assert(again.vocab.sameElements(model.vocab))
    assert(again.vectors.flatMap(_.toSeq).sameElements(model.vectors.flatMap(_.toSeq)))
    assert(again.ppmiFro == model.ppmiFro)
  }

  test("vector dimensionality is bounded by k and positive eigenvalues") {
    assert(model.vectors.forall(_.length <= 4))
    assert(model.vectors.head.length == model.vectors.last.length)
  }
}
