package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the GPT-style "concatenate the corpus and cut every
  * L tokens" step that turns variable-length documents into fixed-length
  * training windows (Brown et al. 2020 §2.1; every LM data loader does
  * this). Emits, per document, its token offset in the concatenated
  * stream and the range of training sequences it lands in — the index a
  * loader needs to materialize any window without re-reading its
  * neighbors.
  *
  * The global running offset is NOT a single-partition window: the corpus
  * is split into `buckets` contiguous id ranges by a pure value formula
  * (floor((id − min)·B / span) — deterministic, no sampled boundaries, so
  * re-evaluation cannot reassign rows the way `repartitionByRange`'s
  * sampled partitioner or `spark_partition_id` could), per-bucket token
  * totals fold to one tiny driver row-set whose prefix sums come back as
  * a broadcast join, and each bucket cumsums only its own slice under
  * `Window.partitionBy(bucket)`. At 100 TB that is one map-side-combined
  * agg over B rows + one balanced window sort per bucket — never a global
  * sort, never a driver bottleneck. (Assumes ids are roughly uniform over
  * their range, which epoch-ordered/dense ids are; a skewed id space just
  * unbalances bucket sizes, not correctness.)
  *
  * All arithmetic is integral (BIGINT `div`), so the oracle replays it
  * exactly; documents are taken in id order — the stable, reproducible
  * concatenation order (same discipline as [[Sampling.epochShuffle]]:
  * never a nondeterministic input order).
  */
object Packing {

  private def toks(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  def packSequences(
      docs: DataFrame,
      seqLen: Int = 256,
      buckets: Int = 32,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(seqLen >= 1, "need a positive sequence length")
    require(buckets >= 1, "need at least one bucket")
    val base = docs
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol), size(toks(col(textCol))).cast("long").as("n_tokens"))
    val bounds = base.agg(min(col(idCol)).as("lo"), max(col(idCol)).as("hi"))
    val bucketed = base
      .crossJoin(broadcast(bounds)) // one row: broadcast scalars
      .select(
        col(idCol), col("n_tokens"),
        // span+1 keeps hi in bucket B-1; all-integer floor division
        expr(s"(($idCol - lo) * $buckets) div (hi - lo + 1)").as("bucket"))
    val totals = bucketed
      .groupBy(col("bucket")).agg(sum(col("n_tokens")).as("t"))
    // prefix offsets: B rows, a driver-side scan in bucket order
    val spark = docs.sparkSession
    val prefRows = totals.orderBy(col("bucket")).collect()
    var acc = 0L
    val prefix = prefRows.map { r =>
      val off = acc; acc += r.getLong(1); (r.getLong(0), off)
    }
    import spark.implicits._
    val prefDf = prefix.toSeq.toDF("bucket", "bucket_off")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(prefDf), "bucket")
      .withColumn("start_off",
        col("bucket_off") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(idCol), col("n_tokens"), col("start_off"),
        expr(s"start_off div $seqLen").as("first_seq"),
        expr(s"(start_off + n_tokens - 1) div $seqLen").as("last_seq"))
  }
}
