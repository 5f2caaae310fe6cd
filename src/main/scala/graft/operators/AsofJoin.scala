package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (backward) join: for each left row, attach the single latest right
  * row with `right.ts <= left.ts` within the same key group — the canonical
  * "most recent state at event time" lookup (quotes-to-trades, last error
  * before a click, config active at request time).
  *
  * The reference has no such operator (SURVEY §2.11); it is added as part of
  * the training-data-pipeline surface. Spark has no built-in as-of join
  * either, so this composes one from primitives — preference (a) of the
  * build rules — rather than a custom physical operator:
  *
  *   1. tag left/right rows and UNION them (same shuffle key: the join key),
  *   2. one window pass per key ordered by (ts, side): `last(right_payload,
  *      ignoreNulls)` over rows-unbounded-preceding fills each left row with
  *      the most recent right payload at-or-before its timestamp,
  *   3. keep left rows, unpack the payload struct.
  *
  * Scale properties (the reason for this shape): exactly ONE shuffle of
  * left+right by key; no range-condition join (which Spark would plan as a
  * broadcast-nested-loop or an exploding theta join); per-key work is a
  * sorted linear scan — O(|L|+|R|) per key — and skewed keys stay a single
  * sorted run rather than a quadratic pair blowup.
  */
object AsofJoin {

  /** @param left     event-side DataFrame
    * @param right    state-side DataFrame (its latest at-or-before row wins)
    * @param keyCols  equi-join key columns (present in both sides)
    * @param leftTs   left event-time column name
    * @param rightTs  right event-time column name
    * @param rightPayload right columns to carry (null when no match);
    *                 emitted with an `asof_` prefix to avoid collisions.
    *                 Defaults to all non-key right columns. The right
    *                 timestamp is always included as `asof_<rightTs>`.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String = "ts",
      rightTs: String = "ts",
      rightPayload: Seq[String] = Seq.empty): DataFrame =
    joinImpl(left, right, keyCols, leftTs, rightTs, rightPayload, forwardDir = false)

  /** Forward as-of: for each left row, attach the single EARLIEST right row
    * with `right.ts >= left.ts` within the key group ("next state change
    * at-or-after this event"). Same single-shuffle union+window machinery as
    * [[backward]], running on the reversed time axis: the window orders by
    * `_ts` DESCENDING, so `last(..., ignoreNulls)` over the preceding frame
    * holds the nearest right row at-or-after each left row.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String = "ts",
      rightTs: String = "ts",
      rightPayload: Seq[String] = Seq.empty): DataFrame =
    joinImpl(left, right, keyCols, leftTs, rightTs, rightPayload, forwardDir = true)

  private def joinImpl(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      forwardDir: Boolean): DataFrame = {
    val payload = if (rightPayload.nonEmpty) rightPayload
      else right.columns.filterNot(keyCols.contains).filterNot(_ == rightTs).toSeq

    val key = keyCols.map(col)
    val payloadFields = StructField("asof_" + rightTs, right.schema(rightTs).dataType) +:
      payload.map(c => StructField("asof_" + c, right.schema(c).dataType))
    val payloadStructType = StructType(payloadFields)

    // side 0 sorts before side 1 at equal ts -> a right row at ts T is
    // visible to left rows at the same T (inclusive <=, ASOF semantics)
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast(payloadStructType))
    val r = right
      .select(key :+ col(rightTs).as("_ts") :+ lit(0).as("_side") :+
        struct(col(rightTs).as("asof_" + rightTs) +:
          payload.map(c => col(c).as("asof_" + c)): _*).as("_payload"): _*)
      // align to the left's column set so unionByName lines up
      .select(left.columns.toSeq.map(c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(col("_ts"), col("_side"), col("_payload")): _*)

    // hash(_payload) as final tiebreaker: right rows sharing (key, ts) would
    // otherwise be ordered arbitrarily and last() would pick a
    // run-dependent match; the hash makes the pick stable across runs and
    // partitionings (still an arbitrary member of the tie, as in any ASOF
    // implementation, but a deterministic one)
    // backward: ascending ts — the frame holds all right rows at-or-before;
    // forward: descending ts — the frame holds all right rows at-or-after;
    // either way side 0 sorts first at equal ts, keeping the bound inclusive
    val tsOrder = if (forwardDir) col("_ts").desc else col("_ts").asc
    val w = Window.partitionBy(key: _*)
      .orderBy(tsOrder, col("_side"), xxhash64(col("_payload")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_filled", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toSeq.map(col) :+ col("_filled.*"): _*)
  }
}
