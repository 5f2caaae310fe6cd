package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranking — the shared machinery behind
  * [[Normalize.quantileNormalize]]'s rank table and [[Ranking.scoreAuc]]'s
  * Mann-Whitney ranks (and any future total-order statistic): instead of a
  * single-partition `row_number().over(Window.orderBy(...))` (the r9 q137
  * scale-killer PlanGuardSpec now forbids), rows range-partition by the
  * sort key, rank LOCALLY within each range bucket in parallel, and shift
  * by the bucket's cumulative offset — one bounded row per shuffle
  * partition, collected like [[Graphs]]' fit-small scalars.
  *
  * The repartitioned frame is persisted to PIN the sampled range
  * boundaries: the offset-count pass and the ranking pass must see
  * identical buckets (RangePartitioner samples nondeterministically), and
  * the cache also serves whatever the caller builds next. Intra-query
  * persist lifecycle — callers are queries; Bench clears caches between
  * them.
  */
private[operators] object GlobalRank {

  /** `df` plus a 0-based global index `outCol`, totally ordered by
    * (`sortCol`, `idCol`) — ties must be broken by a unique id for the
    * rank to be deterministic and engine-replayable.
    */
  def withGlobalIndex(
      df: DataFrame,
      sortCol: String,
      idCol: String,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val vr = df.repartitionByRange(p, col(sortCol), col(idCol))
      .withColumn("_grp_pid", spark_partition_id())
      .persist()
    var acc = 0L
    val offRows = vr.groupBy(col("_grp_pid")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_grp_pid")).collect()
      .map { r => val o = acc; acc += r.getLong(1); (r.getInt(0), o) }
      .toSeq
    import spark.implicits._
    val off = spark.createDataset(offRows).toDF("_grp_pid", "_grp_off")
    vr.withColumn("_grp_lr", (row_number().over(
        Window.partitionBy(col("_grp_pid"))
          .orderBy(col(sortCol), col(idCol))) - 1).cast("long"))
      .join(broadcast(off), "_grp_pid")
      .withColumn(outCol, col("_grp_lr") + col("_grp_off"))
      .drop("_grp_pid", "_grp_lr", "_grp_off")
  }
}
