package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions.lit
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: the single-pass WordShingles kernel agrees with an independent
  * straightforward reference implementation over randomized text (tokens,
  * repeated words, odd whitespace, fewer tokens than n).
  */
class ShinglesPropSpec extends SparkSpec {
  import spark.implicits._

  private def reference(text: String, n: Int): Seq[String] = {
    if (text.trim.isEmpty) return Seq.empty // blank doc -> empty shingle set
    val toks = text.trim.toLowerCase(java.util.Locale.ROOT).split("\\s+").toSeq
    val all =
      if (toks.length < n) Seq(toks.mkString(" "))
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    all.distinct
  }

  test("blank and whitespace-only text shingle to the empty set") {
    for (t <- Seq("", "   ", "\t\n ")) {
      for (n <- Seq(1, 3)) {
        val got = spark.range(1)
          .select(Dedup.shingles(lit(t), n)).as[Seq[String]].head()
        assert(got == Seq.empty, s"n=$n text=${t.replace("\n", "\\n")}")
      }
    }
  }

  private val wordGen = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(5)).suchThat(_.nonEmpty),
    Gen.oneOf("the", "Fox", "DOG", "a1", "x"))
  private val textGen = for {
    k <- Gen.choose(1, 12)
    ws <- Gen.listOfN(k, wordGen)
    sep <- Gen.oneOf(" ", "  ", "\t", " \n ")
  } yield ws.mkString(sep)

  test("word_shingles == reference implementation over random text") {
    for (trial <- 0 until 40) {
      val params = Gen.Parameters.default
      val text = textGen.apply(params, Seed(trial.toLong))
        .getOrElse(sys.error(s"gen failed at $trial"))
      for (n <- Seq(1, 2, 3, 5)) {
        val got = spark.range(1)
          .select(Dedup.shingles(lit(text), n)).as[Seq[String]].head()
        val want = reference(text, n)
        assert(got == want, s"n=$n text=${text.replace("\n", "\\n")}")
      }
    }
  }
}
