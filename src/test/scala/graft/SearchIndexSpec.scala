package graft

import org.apache.spark.sql.functions._
import graft.store.SearchIndex

/** The trigram sidecar must prune files WITHOUT ever changing results:
  * every assertion compares the indexed search against the brute-force
  * full-scan ILIKE over the same store.
  */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): String = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-searchidx").toString
    // many small files so pruning is observable; skewed content: only a
    // few files contain the needle terms
    val docs = Tables(spark, sf(), "documents").select("doc_id", "text")
    docs.repartition(16, col("doc_id"))
      .write.mode("overwrite").parquet(root)
    root
  }

  test("literal extraction: runs between wildcards, trigram gate") {
    assert(SearchIndex.literalRuns("%spark%") == Seq("spark"))
    assert(SearchIndex.literalRuns("%foo_bar%baz%") == Seq("foo", "bar", "baz"))
    assert(SearchIndex.requiredBuckets("%ab%").isEmpty) // too short to prune
    assert(SearchIndex.requiredBuckets("%spark merge%").get.size == 9)
  }

  test("driver-side bucket hash matches the Spark-side expression") {
    val sparkSide = spark.range(1)
      .select(explode(SearchIndex.trigramBuckets(lit("spark"))).as("b"))
      .as[Int].collect().toSet
    val driverSide = "spark".sliding(3).map(SearchIndex.bucketOf).toSet
    assert(sparkSide == driverSide)
  }

  test("indexed search matches the full scan exactly on the real corpus") {
    val root = freshStore()
    SearchIndex.build(spark, root, "text")
    val full = spark.read.parquet(root)
      .filter(lower(col("text")).like("%spark%") ||
        lower(col("text")).like("%merge%"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    val indexed = SearchIndex
      .search(spark, root, Seq("%spark%", "%merge%"), "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(indexed == full)
    assert(indexed.nonEmpty)
  }

  test("rare needle prunes to a strict subset of the files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-searchidx-rare").toString
    // 161 docs over 16 files; exactly one doc carries the needle, so only
    // its file (plus trigram-hash false positives, none at 2^20 buckets
    // for this vocabulary) can survive pruning
    val filler = (1L to 160L)
      .map(i => (i, s"common filler words alpha beta gamma delta row $i"))
    val corpus = (filler :+ (999L, "the zebrafish quantization needle"))
      .toDF("doc_id", "text")
    corpus.repartition(16, col("doc_id"))
      .write.mode("overwrite").parquet(root)
    SearchIndex.build(spark, root, "text")
    val candidates =
      SearchIndex.candidateFiles(spark, root, Seq("%zebrafish%")).get
    assert(candidates.size < 16,
      s"index pruned nothing: ${candidates.size} of 16 files")
    val got = SearchIndex.search(spark, root, Seq("%zebrafish%"), "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(999L))
  }

  test("pattern with no trigram-wide literal falls back to full scan") {
    val root = freshStore()
    SearchIndex.build(spark, root, "text")
    assert(SearchIndex.candidateFiles(spark, root, Seq("%ab%")).isEmpty)
    val full = spark.read.parquet(root)
      .filter(lower(col("text")).like("%ab%")).count()
    assert(SearchIndex.search(spark, root, Seq("%ab%"), "text").count() == full)
  }

  test("files appended after build are still searched (stale-index safety)") {
    val root = freshStore()
    SearchIndex.build(spark, root, "text")
    Seq((900001L, "freshly appended xylographic needle"))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(root)
    val got = SearchIndex.search(spark, root, Seq("%xylographic%"), "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(900001L))
  }

  test("no candidate files yields empty result with the table schema") {
    val root = freshStore()
    SearchIndex.build(spark, root, "text")
    val got = SearchIndex.search(spark, root, Seq("%zqxjkwv%"), "text")
    assert(got.columns.contains("doc_id"))
    assert(got.count() == 0)
  }
}
