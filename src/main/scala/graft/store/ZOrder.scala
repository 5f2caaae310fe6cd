package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional scan pruning — the
  * lakehouse answer to "queries filter on BOTH user and value, but the
  * table can only be sorted one way". Interleaving the bits of two
  * bucketed dimensions into one sort key makes rows close in EITHER
  * dimension land close on disk, so parquet row-group/file min-max stats
  * stay TIGHT on both columns at once: a two-predicate box query admits a
  * small set of files instead of all of them (a single-column sort gives
  * tight stats on that column and useless full-range stats on the other).
  *
  * Shape: one min/max aggregation per write (broadcast one-row stats),
  * bucketing + bit interleave are pure map-side column arithmetic
  * (codegen'd shifts/masks, no UDF), then `repartitionByRange(zkey)` +
  * `sortWithinPartitions(zkey)` — exactly one range exchange, the same
  * cost as any sorted write. Linear min/max bucketing keeps the key
  * deterministic and engine-portable; heavily skewed dimensions bucket by
  * quantiles instead ([[withZKeyQuantile]] — same interleave downstream).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two bucket columns:
    * result bit 2i = b1's bit i, bit 2i+1 = b2's bit i. Pure column
    * shifts/masks — whole-stage-codegen-friendly, no UDF.
    */
  def interleaveBits(b1: Column, b2: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Add `_zkey`: both dimensions linearly bucketed to `bits` bits over
    * their observed min/max (one broadcast stats row), then interleaved.
    * Constant dimensions bucket to 0 and contribute nothing to the order.
    */
  def withZKey(
      df: DataFrame,
      c1: String,
      c2: String,
      bits: Int = 16): DataFrame = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val stats = df.agg(
      min(col(c1).cast("double")).as("_mn1"), max(col(c1).cast("double")).as("_mx1"),
      min(col(c2).cast("double")).as("_mn2"), max(col(c2).cast("double")).as("_mx2"))
    val levels = (1L << bits) - 1
    def bucket(c: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(0L)).otherwise(
        least(floor((c.cast("double") - mn) / ((mx - mn) / levels)), lit(levels))
          .cast("long"))
    df.crossJoin(broadcast(stats))
      .withColumn("_zkey", interleaveBits(
        bucket(col(c1), col("_mn1"), col("_mx1")),
        bucket(col(c2), col("_mn2"), col("_mx2")), bits))
      .drop("_mn1", "_mx1", "_mn2", "_mx2")
  }

  /** Quantile-bucketed `_zkey` — the skew-proof variant of [[withZKey]]:
    * each dimension buckets by its own `approx_percentile` cut points
    * (equal-POPULATION buckets) instead of an equal-WIDTH slice of the
    * min/max range. On a heavy-tailed column — real log data's `thread`
    * ids, latency values — linear bucketing drops almost every row into
    * one hot bucket (the long tail stretches the range), so the
    * interleaved key degenerates to a single-dim sort and pruning on that
    * dimension dies. Quantile cuts spread every dimension across all
    * 2^bits buckets by construction, at the cost of one extra aggregate
    * in the same one-row broadcast stats pass.
    *
    * Per-row bucketing is a codegen'd `aggregate` rank over the cut array
    * (2^bits - 1 doubles — `bits` is capped at 12 to keep the scan and the
    * broadcast row bounded; multi-dimensional clustering rarely wants more
    * than 2^8 buckets per dim anyway). Duplicate cut points (a value
    * spanning multiple quantiles) collapse adjacent buckets — correct,
    * just less selective on a dimension with few distinct values.
    */
  def withZKeyQuantile(
      df: DataFrame,
      c1: String,
      c2: String,
      bits: Int = 8): DataFrame = {
    require(bits > 0 && bits <= 12, "bits must be in [1, 12] for quantile bucketing")
    val nb = 1 << bits
    val fracs = array((1 until nb).map(i => lit(i.toDouble / nb)): _*)
    val stats = df.agg(
      percentile_approx(col(c1).cast("double"), fracs, lit(10000)).as("_q1"),
      percentile_approx(col(c2).cast("double"), fracs, lit(10000)).as("_q2"))
    def bucket(c: Column, cuts: Column): Column =
      aggregate(cuts, lit(0L), (acc, cut) =>
        acc + when(c.cast("double") >= cut, 1L).otherwise(0L))
    df.crossJoin(broadcast(stats))
      .withColumn("_zkey", interleaveBits(
        bucket(col(c1), col("_q1")),
        bucket(col(c2), col("_q2")), bits))
      .drop("_q1", "_q2")
  }

  /** Write `df` as parquet clustered by the Z-key of (c1, c2):
    * `numFiles` range-disjoint, internally sorted files — file and
    * row-group stats are tight on BOTH dimensions. `quantile = true`
    * switches to [[withZKeyQuantile]] bucketing (use it when either
    * dimension is heavy-tailed; `bits` is then capped at 12).
    */
  def clusteredWrite(
      df: DataFrame,
      path: String,
      c1: String,
      c2: String,
      numFiles: Int,
      bits: Int = 16,
      quantile: Boolean = false): Unit = {
    val keyed =
      if (quantile) withZKeyQuantile(df, c1, c2, math.min(bits, 12))
      else withZKey(df, c1, c2, bits)
    keyed
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }
}
