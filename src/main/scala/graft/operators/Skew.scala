package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys — the explicit fallback when AQE's
  * runtime skew-join splitting (enabled by default in our sessions) isn't
  * applicable: aggregations whose hot key floods one reducer, and joins
  * whose hot-key partition exceeds what AQE can split (e.g. a single key
  * bigger than an executor).
  *
  * Salting trades one extra narrow stage for an even shuffle: the hot key's
  * rows spread over `n` salt buckets, so the worst reducer handles 1/n of
  * the hot key instead of all of it.
  */
object Skew {

  /** Deterministic row salt in [0, n): hash of the full row content.
    * A `rand`-based salt is NOT retry-safe — if a map task re-executes
    * after some reducers already fetched its output, rows re-assigned to
    * different salts get double-counted or lost (the SPARK-23207 hazard
    * class). A content hash re-derives the same salt on every attempt.
    * Degenerate case: bit-identical duplicate rows of a hot key all land
    * on one salt bucket — acceptable (identical rows carry no per-row
    * variance to spread; dedupe first if that pattern dominates).
    */
  private def salt(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(n)).cast("int")

  /** Two-phase salted sum/count: phase 1 aggregates (key, salt) — spreading
    * a hot key over n reducers — phase 2 merges the partials per key.
    * Output: keyCols, `n`, `sum_<valueCol>`.
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      buckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("_salt", salt(df, buckets))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(keys: _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join for a skewed big side: big rows get a random salt,
    * the (small, but not broadcast-small) right side is replicated once per
    * salt bucket, and the join key becomes (key, salt) — the hot key's rows
    * land on `buckets` reducers instead of one. Inner/left joins only
    * (replication would duplicate right-side misses otherwise).
    */
  def saltedJoin(
      big: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      buckets: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      "salted join supports inner/left only")
    val b = big.withColumn("_salt", salt(big, buckets))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    b.join(r, keyCols :+ "_salt", joinType).drop("_salt")
  }
}
