package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure range join (no equi key) via axis binning.
  *
  * Spark plans a join whose only condition is an inequality as a
  * BroadcastNestedLoopJoin — O(|points| * |intervals|) compared pairs, the
  * operator that dies first at scale. When interval lengths are bounded
  * (maintenance windows, promo periods, sessions), binning turns it into a
  * plain shuffle equi-join: the axis is cut into `binWidth` cells, each
  * interval registers in every cell it overlaps (fanout <=
  * len/binWidth + 1 rows), each point lives in exactly ONE cell, and the
  * range predicate verifies after the cell equi-join.
  *
  * Because a point has exactly one cell, every qualifying (point,
  * interval) pair meets in exactly one cell — the join needs NO dedup
  * pass. Pick `binWidth` near the typical interval length: larger widths
  * cut interval fanout, smaller widths cut the per-cell candidate volume.
  *
  * The reference's span association (migration:54-64) carries a
  * correlation_id equi key, so q10 plans it as a hash join directly; this
  * operator covers the keyless case the reference never needed but any
  * 100 TB event store does ("which events fell in ANY maintenance
  * window?").
  */
object RangeJoin {

  /** Join `points` (a LONG axis column `pointCol`) to `intervals` (LONG
    * `startCol`/`endCol`, inclusive both ends). Output: every qualifying
    * pair with all columns of both inputs. Intervals with start > end are
    * dropped (empty by definition).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", floor(col(pointCol) / binWidth))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("_bin", explode(sequence(
        floor(col(startCol) / binWidth), floor(col(endCol) / binWidth))))
    p.join(iv, "_bin")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("_bin")
  }

  /** Interval-overlap join (both sides intervals, inclusive ends): left
    * [lStart,lEnd] pairs with right [rStart,rEnd] iff lStart <= rEnd AND
    * rStart <= lEnd. Same binning idea as [[pointInInterval]], with one
    * twist: both sides explode to their covered cells, so a qualifying
    * pair would meet in EVERY shared cell. Instead of a dedup shuffle,
    * each pair is claimed by exactly one canonical cell — the cell of the
    * overlap's left edge `greatest(lStart, rStart)`, which both intervals
    * necessarily cover — via a post-join predicate on `_bin`. Exactly-once
    * emission with zero extra exchanges.
    *
    * Cost: fanout is len/binWidth + 1 per row per side; per-cell work is
    * |left-in-cell| x |right-in-cell|. Bounded interval lengths keep both
    * terms constant as data grows — the keyless overlap join ("which
    * maintenance windows overlapped which incident spans?") without the
    * BroadcastNestedLoopJoin Spark would otherwise plan.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(s) <= col(e))
      .withColumn("_bin", explode(sequence(
        floor(col(s) / binWidth), floor(col(e) / binWidth))))
    binned(left, lStart, lEnd)
      .join(binned(right, rStart, rEnd), "_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bin") === floor(greatest(col(lStart), col(rStart)) / binWidth))
      .drop("_bin")
  }
}
