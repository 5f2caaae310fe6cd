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
  * deterministic and engine-portable; heavily skewed dimensions would
  * bucket by quantiles instead (same interleave downstream).
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

  /** Write `df` as parquet clustered by the Z-key of (c1, c2):
    * `numFiles` range-disjoint, internally sorted files — file and
    * row-group stats are tight on BOTH dimensions.
    */
  def clusteredWrite(
      df: DataFrame,
      path: String,
      c1: String,
      c2: String,
      numFiles: Int,
      bits: Int = 16): Unit =
    withZKey(df, c1, c2, bits)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
}
