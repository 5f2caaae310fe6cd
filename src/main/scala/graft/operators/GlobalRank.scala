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
private[graft] object GlobalRank {

  /** `df` plus a 0-based global index `outCol`, totally ordered by
    * (`sortCol`, `idCol`) — ties must be broken by a unique id for the
    * rank to be deterministic and engine-replayable.
    */
  def withGlobalIndex(
      df: DataFrame,
      sortCol: String,
      idCol: String,
      outCol: String): DataFrame =
    withGlobalIndexAndCount(df, sortCol, idCol, outCol)._1

  /** [[withGlobalIndex]] plus the frame's total row count (already known
    * from the offset pass — no extra job) and the persisted ranked frame,
    * for callers that need n alongside the index (order statistics).
    */
  def withGlobalIndexAndCount(
      df: DataFrame,
      sortCol: String,
      idCol: String,
      outCol: String): (DataFrame, Long) = {
    val (ranked, n, _) = withGlobalIndexCountAndHandle(df, sortCol, idCol, outCol)
    (ranked, n)
  }

  /** [[withGlobalIndexAndCount]] plus the PERSISTED internal frame, so a
    * caller that fully consumes `ranked` eagerly (e.g.
    * [[percentileValues]]' positional collect) can release the pinned
    * copy: unpersisting the derived `ranked` is a no-op because the
    * CacheManager matches by plan sameResult against the repartitioned
    * frame, never its descendant. Callers that hand `ranked` onward
    * LAZILY must NOT unpersist — the pinned range boundaries are what
    * keeps the offset pass and the (later) ranking pass on identical
    * buckets.
    */
  private def withGlobalIndexCountAndHandle(
      df: DataFrame,
      sortCol: String,
      idCol: String,
      outCol: String): (DataFrame, Long, DataFrame) = {
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
    val ranked = vr.withColumn("_grp_lr", (row_number().over(
        Window.partitionBy(col("_grp_pid"))
          .orderBy(col(sortCol), col(idCol))) - 1).cast("long"))
      .join(broadcast(off), "_grp_pid")
      .withColumn(outCol, col("_grp_lr") + col("_grp_off"))
      .drop("_grp_pid", "_grp_lr", "_grp_off")
    (ranked, acc, vr)
  }

  /** Exact interpolated percentiles of `valueCol` (nulls ignored, cast to
    * double) computed DISTRIBUTED: global-rank the values, pull only the
    * <= 2·|probs| positional rows to the driver, and interpolate there
    * with Spark's own `Percentile.getPercentile` arithmetic — position
    * `(n-1)·p` (Long × Double), then `(higher − pos)·vLo + (pos −
    * lower)·vHi` with the equal-keys shortcut — so the result is
    * BIT-IDENTICAL to the `percentile(...)` aggregate it replaces while
    * never materializing a corpus-cardinality buffer in one aggregation
    * state (the r10 q116 scale flag; same discipline as this object's
    * r9 q137 fix). Returns None when the frame has no non-null values
    * (the aggregate's NULL result).
    *
    * Tie-break note: `idCol` only has to be *some* column to complete the
    * range-partition key — positional VALUES of a sorted multiset are
    * invariant to how equal values are ordered among themselves, so the
    * result is deterministic even when ids collide.
    */
  def percentileValues(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      probs: Seq[Double]): Option[Array[Double]] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be in [0, 1]")
    val v = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("_pl_v"), col(idCol).as("_pl_id"))
    val (ranked, n, pinned) =
      withGlobalIndexCountAndHandle(v, "_pl_v", "_pl_id", "_pl_ix")
    if (n == 0) { pinned.unpersist(false); return None }
    val need = probs.flatMap { p =>
      val pos = (n - 1) * p
      Seq(pos.floor.toLong, pos.ceil.toLong)
    }.distinct
    val at: Map[Long, Double] = ranked
      .filter(col("_pl_ix").isin(need: _*))
      .select(col("_pl_ix"), col("_pl_v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pinned.unpersist(false)
    Some(probs.map { p =>
      val pos = (n - 1) * p
      val lower = pos.floor.toLong
      val higher = pos.ceil.toLong
      val lk = at(lower)
      if (higher == lower) lk
      else {
        val hk = at(higher)
        if (hk == lk) lk
        else (higher - pos) * lk + (pos - lower) * hk
      }
    }.toArray)
  }

  /** [[percentileValues]] as a ONE-ROW DataFrame of double literals named
    * `outCols` — a drop-in replacement for the one-row
    * `agg(percentile(...), ...)` scalar frames the engine broadcasts
    * beside corpus streams (all-null row when the input is empty, the
    * aggregate's behavior).
    */
  def percentileLiterals(
      df: DataFrame,
      valueCol: String,
      idCol: String,
      probs: Seq[Double],
      outCols: Seq[String]): DataFrame = {
    require(probs.length == outCols.length, "one output column per prob")
    val vals = percentileValues(df, valueCol, idCol, probs)
    val cols = outCols.zipWithIndex.map { case (c, i) =>
      vals.fold(lit(null).cast("double"))(a => lit(a(i))).as(c)
    }
    df.sparkSession.range(1).select(cols: _*)
  }
}
