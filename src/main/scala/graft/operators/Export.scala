package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Export-shaping for training corpora: the last mile of a data pipeline is
  * writing N BALANCED, internally-sorted shards that downstream loaders
  * stream sequentially (one shard per reader, no seek storms, reproducible
  * order).
  *
  * `repartitionByRange` samples the sort key and assigns contiguous key
  * ranges to shards — so shard boundaries follow the data distribution
  * (balanced rows per shard even under key skew), unlike hash partitioning
  * (balanced but unordered) or `coalesce` (neither). `sortWithinPartitions`
  * then orders rows inside each shard with NO extra shuffle — the range
  * exchange already co-located each key range.
  *
  * At 100 TB this is one range-exchange pass; `maxRecordsPerFile` bounds
  * individual file sizes if shards must split further.
  */
object Export {

  /** Write `df` as `shards` range-partitioned, internally-sorted parquet
    * shards under `outDir`.
    */
  def shardedWrite(
      df: DataFrame,
      outDir: String,
      shards: Int,
      sortCol: String,
      maxRecordsPerFile: Long = 0L): Unit =
    df.repartitionByRange(shards, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      // zstd: ~30% smaller than snappy at comparable decode speed — at
      // 100 TB the export is read many times by trainers, so size wins
      .option("compression", "zstd")
      .parquet(outDir)

  /** Read back an export and report per-shard row counts (file-level). */
  def shardStats(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(input_file_name().as("shard"))
      .agg(count(lit(1)).as("n_rows"))
}
