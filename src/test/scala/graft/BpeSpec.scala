package graft

import graft.functions.{Bpe, BpeCodec}
import graft.operators.CorpusAnalytics
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  test("learn: the classic Sennrich hand case, deterministic tie-break") {
    val merges = Bpe.learn(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 4)
    // es and st tie at 9 — lexicographic tie-break picks es; after es
    // merges, (es,t) dominates; then the lo/ow tie resolves to lo
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encode: greedy lowest-rank-first, unseen words segment safely") {
    val codec = new BpeCodec(Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    assert(codec.encode("lowest").toSeq == Seq("low", "est"))
    assert(codec.encode("slow").toSeq == Seq("s", "low"))
    assert(codec.encode("zzz").toSeq == Seq("z", "z", "z")) // no merge applies
    assert(codec.encode("").toSeq == Seq.empty)
    assert(codec.encode("x").toSeq == Seq("x"))
  }

  test("bpe_encode expression: codegen'd distributed encode + NULL safety") {
    import spark.implicits._
    val codec = new BpeCodec(Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
    val df = Seq(Some("lowest"), Some("low"), None).toDF("w")
    val got = df.select(Bpe.bpe_encode(col("w"), codec).as("toks"))
      .as[Option[Seq[String]]].collect().toSeq
    // "low" merges twice: l,o,w -> lo,w -> low (greedy runs to fixpoint)
    assert(got == Seq(Some(Seq("low", "est")), Some(Seq("low")), None))
  }

  test("bpeSegment: corpus-wide invariants hold, word types grounded") {
    import spark.implicits._
    val docs = Tables(spark, sf(), "documents")
    val nTypes = docs.filter(trim($"text") =!= "")
      .select(explode(split(lower(trim($"text")), "\\s+")).as("t"))
      .filter(length($"t") > 0).select(countDistinct($"t")).head().getLong(0)
    val got = CorpusAnalytics.bpeSegment(docs, numMerges = 50)
      .as[(Long, Long, Boolean, Boolean)].head()
    assert(got == ((nTypes, 50L, true, true)))
  }
}
