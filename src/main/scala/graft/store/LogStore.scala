package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Date-partitioned Parquet storage for the event tables — the TimescaleDB
  * hypertable equivalent (reference: migration:39-43,74-78): appends route
  * rows to `date=YYYY-MM-DD/` directories by event-time value, and readers
  * get partition pruning for any time-range predicate.
  *
  * At cluster scale the same layout holds: each micro-batch append writes
  * only the dates it touches; bloom filters on `correlation_id` give
  * point-lookup row-group skipping (the btree-index analog,
  * reference: migration:35).
  */
final class LogStore(root: String) {

  private def path(table: String) = s"$root/$table"

  /** Append-mode partitioned write (reference insert path:
    * venus/db/write.py:78-79 `executemany INSERT`).
    *
    * Do not mix with [[appendIdempotent]] on the SAME table: the idempotent
    * path adds a `batch_id` partition column, and a table written both ways
    * has inconsistent partitioning. Streaming tables use the idempotent
    * path; this is the batch/backfill path.
    */
  def append(table: String, df: DataFrame): Unit = {
    val writer = df.write
      .mode("append")
      .option("parquet.bloom.filter.enabled#correlation_id", "true")
    val partitioned =
      if (df.columns.contains("date")) writer.partitionBy("date") else writer
    partitioned.parquet(path(table))
  }

  /** Idempotent per-epoch write for streaming `foreachBatch`: rows land in
    * `batch_id=<writerId>-<epoch>` partitions written with DYNAMIC partition
    * overwrite, so a retried epoch (checkpoint replay after a mid-batch
    * failure) REPLACES its own partitions instead of appending duplicates.
    * Appends from other epochs — and other writers — are untouched: the
    * observable result is exactly-once into the file sink (reference's
    * retained-batch retry is at-least-once: venus/db/write.py:80-84).
    *
    * `writerId` scopes the epoch namespace per streaming query. Epoch ids
    * are only unique WITHIN one query's checkpoint, so two queries feeding
    * the same table (e.g. the logs and metric streams both dead-lettering)
    * would otherwise overwrite each other's same-numbered epochs.
    * Contract (same as any Spark file sink): a writerId is bound to its
    * checkpoint — resetting the checkpoint restarts epochs at 0, so pair a
    * fresh checkpoint with a fresh writerId or store path.
    */
  def appendIdempotent(table: String, df: DataFrame, writerId: String, batchId: Long): Unit = {
    import org.apache.spark.sql.functions.lit
    val parts =
      if (df.columns.contains("date")) Seq("date", "batch_id") else Seq("batch_id")
    df.withColumn("batch_id", lit(s"$writerId-$batchId"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("parquet.bloom.filter.enabled#correlation_id", "true")
      .partitionBy(parts: _*)
      .parquet(path(table))
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))
}
