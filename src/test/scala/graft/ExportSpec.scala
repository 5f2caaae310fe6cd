package graft

import graft.operators.Export
import java.nio.file.Files

class ExportSpec extends SparkSpec {
  import spark.implicits._

  test("shardedWrite: balanced, range-disjoint, internally sorted shards") {
    val out = Files.createTempDirectory("graft-export").toString + "/docs"
    val docs = Tables(spark, sf(), "documents")
    val n = docs.count()
    Export.shardedWrite(docs, out, shards = 4, sortCol = "doc_id")

    // all rows survive
    val back = spark.read.parquet(out)
    assert(back.count() == n)

    // balanced: every shard within 2x of the ideal size
    val stats = Export.shardStats(spark, out)
      .select("n_rows").as[Long].collect()
    assert(stats.length == 4, stats.mkString(","))
    val ideal = n.toDouble / 4
    stats.foreach(s => assert(s > ideal / 2 && s < ideal * 2, s"shard size $s vs ideal $ideal"))

    // range-disjoint AND internally sorted: per-file [min,max] don't overlap
    import org.apache.spark.sql.functions._
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .orderBy("lo")
      .select("lo", "hi").as[(Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, s"overlap: $hi1 >= $lo2")
      case _ =>
    }
    // spot-check in-file order on one shard
    val firstFile = back.select(input_file_name().as("f"), $"doc_id")
      .orderBy("f").limit(1).select("f").as[String].head()
    val ids = back.filter(input_file_name() === firstFile)
      .select("doc_id").as[Long].collect()
    assert(ids.sameElements(ids.sorted), "rows not sorted within shard")
  }

  test("exportManifest: order-independent, corruption-sensitive") {
    val docs = Seq(
      (0L, "alpha", "en"), (1L, "beta", "de"),
      (2L, "gamma", "en"), (3L, "delta", "fr"))
      .toDF("doc_id", "text", "lang")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Export.exportManifest(df, "doc_id", Seq("doc_id", "text", "lang"), 2)
        .orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2).toString))
        .toSeq
    val base = manifest(docs)
    assert(base.map(_._1) == Seq(0L, 1L) && base.forall(_._2 == 2L))
    // reordering rows changes nothing
    assert(manifest(docs.orderBy(org.apache.spark.sql.functions.col("text"))) == base)
    // a corrupted field moves exactly its shard's checksum
    val corrupted = Seq(
      (0L, "alpha", "en"), (1L, "beta", "de"),
      (2L, "GAMMA", "en"), (3L, "delta", "fr"))
      .toDF("doc_id", "text", "lang")
    val bad = manifest(corrupted)
    assert(bad(0)._3 != base(0)._3, "shard 0 checksum must move")
    assert(bad(1)._3 == base(1)._3, "shard 1 untouched")
    // a dropped row moves the count too
    val dropped = manifest(docs.filter(org.apache.spark.sql.functions.col("doc_id") =!= 2L))
    assert(dropped.head._2 == 1L)
  }
}
