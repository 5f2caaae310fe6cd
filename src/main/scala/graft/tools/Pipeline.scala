package graft.tools

import graft.Tables
import graft.operators.{Dedup, Export, Sampling}
import graft.query.LogsTable
import graft.store.LogStore
import graft.streaming.{IngestMetricsListener, StreamIngest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end demo of the library as one pipeline — the full life of a
  * training corpus on the engine:
  *
  *   1. stream raw JSON wire records into the date-partitioned store
  *      (AvailableNow catch-up mode, exactly-once epochs, telemetry),
  *   2. query the store through the LogsTable API,
  *   3. dedup + quality-gate the document corpus,
  *   4. split train/test deterministically and check for contamination,
  *   5. export balanced sorted shards.
  *
  * Usage: runMain graft.tools.Pipeline [sfDir] [workDir]
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val work = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-pipeline").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // -- 1. ingest: events -> wire JSON files -> streamed into the store
    val wireDir = s"$work/wire"
    Tables(spark, sfDir, "events").select(
      to_json(struct(
        (unix_micros(col("ts")) / lit(1000000.0)).as("created"),
        col("event_type").as("message"),
        concat(lit("00000000-0000-0000-0000-"),
          lpad(col("user_id").cast("string"), 12, "0")).as("correlation_id"),
        col("event_id"))).as("value"))
      .coalesce(4).write.mode("overwrite").text(wireDir)

    val store = new LogStore(s"$work/store")
    val listener = new IngestMetricsListener
    spark.streams.addListener(listener)
    val q = StreamIngest.start(
      spark.readStream.option("maxFilesPerTrigger", 2).text(wireDir),
      store, s"$work/ckpt", availableNow = true)
    q.awaitTermination(300000)
    println(s"[pipeline] ingested ${listener.totalRows} rows " +
      f"at ${listener.meanRate}%.0f rows/s over ${listener.metrics.size} batches")

    // -- 2. query through the LogsTable API
    val logs = LogsTable(store.read(spark, "logs"))
    val recent = logs.recent(5).select("time", "message").collect()
    println(s"[pipeline] recent-5 head: ${recent.headOption.mkString}")
    val errDays = logs.df.filter(col("message") === "error")
      .groupBy(col("date")).count().count()
    println(s"[pipeline] error-active days: $errDays")

    // -- 3. corpus dedup + quality gate
    val docs = Tables(spark, sfDir, "documents")
    val survivors = Dedup.exact(docs).count()
    val nearDups = Dedup.minhashLsh(docs, threshold = 0.3).count()
    println(s"[pipeline] docs=${docs.count()} exact-unique=$survivors near-dup-pairs=$nearDups")

    // -- 3b. round-7 curation: strip duplicated passages, rebalance mixture
    val repaired = graft.operators.CorpusAnalytics.removeDuplicatedPassages(docs)
    val removedTokens = repaired.agg(sum(col("n_removed"))).head().getLong(0)
    val rebalanced = graft.operators.CorpusAnalytics.mixtureResample(docs, "source")
    println(s"[pipeline] passage-removal stripped $removedTokens tokens; " +
      s"mixture resample kept ${rebalanced.count()} docs")

    // -- 4. split + decontaminate
    val (train, test) = Sampling.hashSplit(docs, "doc_id", trainPct = 90)
    val leaks = Sampling.crossSplitLeakage(docs, threshold = 0.1).count()
    println(s"[pipeline] train=${train.count()} test=${test.count()} cross-split-leaks=$leaks")

    // -- 5. export
    Export.shardedWrite(train, s"$work/export/train", shards = 4, sortCol = "doc_id")
    val shardSizes = Export.shardStats(spark, s"$work/export/train")
      .select("n_rows").collect().map(_.getLong(0)).sorted
    println(s"[pipeline] exported train shards: ${shardSizes.mkString(",")}")
    println(s"[pipeline] DONE work=$work")
    spark.stop()
  }
}
