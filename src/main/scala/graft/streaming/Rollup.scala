package graft.streaming

import graft.store.LogStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollup — a materialized dashboard aggregate
  * kept fresh per micro-batch without ever recomputing history.
  *
  * Design: the stored table holds per-epoch PARTIAL aggregates
  * (`date × keys × (n, sum)` per micro-batch), written through
  * [[LogStore.appendIdempotent]] — so a replayed epoch overwrites its own
  * partials instead of double-counting (exactly-once without read-modify-
  * write, which a raw file store can't do transactionally). Reads merge
  * the partials with one small aggregation: count and sum are
  * self-mergeable (the same partial/final split Spark's own
  * HashAggregate uses).
  *
  * Scale: each update shuffles only the BATCH's group cardinality; reads
  * aggregate rollup rows (dates × keys × epochs), not raw events. The
  * epoch dimension grows with time — [[LogStore.compact]] on closed dates
  * collapses the per-epoch files (and since merged partials are
  * themselves valid partials, a re-aggregating rewrite could collapse the
  * rows too; file compaction alone already bounds the read cost).
  */
final class Rollup(
    store: LogStore,
    table: String,
    groupCols: Seq[String],
    valueCol: String) {

  /** Fold one micro-batch into the rollup. Call from `foreachBatch`;
    * `writerId`/`batchId` carry the sink's idempotence contract.
    */
  def update(batch: DataFrame, writerId: String, batchId: Long): Unit = {
    val partials = batch
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_v"))
    store.appendIdempotent(table, partials, writerId, batchId)
  }

  /** The merged view: one aggregation over partials. */
  def read(spark: SparkSession): DataFrame =
    store.read(spark, table)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"))
}
