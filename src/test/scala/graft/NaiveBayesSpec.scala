package graft

import graft.operators.NaiveBayes
import org.apache.spark.sql.DataFrame

/** Trained char-trigram Naive Bayes lang-id: perfect separation on
  * disjoint synthetic vocabularies, prior dominance on ambiguous input,
  * self-consistency, determinism, and edge handling.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text", "lang")

  private def predict(df: DataFrame): Map[Long, String] =
    NaiveBayes.langPredict(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("disjoint vocabularies separate perfectly") {
    val d = docs(
      (1L, "der die das und nicht von sie ist", "de"),
      (2L, "und das der nicht die von ist sie", "de"),
      (3L, "the and not from she is of it was", "en"),
      (4L, "of it was the and not from she is", "en"))
    val preds = predict(d)
    assert(preds == Map(1L -> "de", 2L -> "de", 3L -> "en", 4L -> "en"))
  }

  test("self-prediction on the real corpus covers every eligible doc") {
    val d = Tables(spark, sf(), "documents")
    val out = NaiveBayes.langPredict(d)
    val eligible = d.filter("text IS NOT NULL AND lang IS NOT NULL AND " +
      "length(lower(text)) >= 3").count()
    assert(out.count() == eligible)
    // every predicted label is a label that exists in the corpus
    val langs = d.select("lang").distinct().collect().map(_.getString(0)).toSet
    val preds = out.select("lang_pred").distinct().collect()
      .map(_.getString(0)).toSet
    assert(preds.subsetOf(langs))
  }

  test("prediction is deterministic") {
    val d = Tables(spark, sf(), "documents")
    val a = NaiveBayes.langPredict(d).collect().toSeq.sortBy(_.getLong(0))
    spark.catalog.clearCache()
    val b = NaiveBayes.langPredict(d).collect().toSeq.sortBy(_.getLong(0))
    assert(a == b)
  }

  test("short and null texts are excluded") {
    val d = Seq(
      (1L, "long enough text here", "en"),
      (2L, "ab", "en"),
      (3L, null.asInstanceOf[String], "de")).toDF("doc_id", "text", "lang")
    assert(predict(d).keySet == Set(1L))
  }

  test("priors come from gram-eligible docs only: a zero-gram labeled doc " +
    "cannot shift any prediction (r18 verdict guard)") {
    // r18 moved per-class doc counts from `base` to `docGrams`; the two
    // agree BECAUSE base's length(t) >= n filter guarantees >= 1 gram per
    // kept doc. Pin it: adding labeled docs that produce zero grams
    // (too-short text — filtered before gram generation) leaves every
    // prediction row bit-identical.
    val core = docs(
      (1L, "der die das und nicht von sie ist", "de"),
      (2L, "und das der nicht die von ist sie", "de"),
      (3L, "the and not from she is of it was", "en"),
      (4L, "of it was the and not from she is", "en"),
      (5L, "die von und the was", "de"))
    val withDegenerate = docs(
      (1L, "der die das und nicht von sie ist", "de"),
      (2L, "und das der nicht die von ist sie", "de"),
      (3L, "the and not from she is of it was", "en"),
      (4L, "of it was the and not from she is", "en"),
      (5L, "die von und the was", "de"),
      (6L, "ab", "en"), // below n=3: zero grams
      (7L, "", "de"))
    val a = NaiveBayes.langPredict(core).collect().toSeq
      .sortBy(_.getLong(0))
    spark.catalog.clearCache()
    val b = NaiveBayes.langPredict(withDegenerate).collect().toSeq
      .sortBy(_.getLong(0))
    assert(a == b)
  }
}
