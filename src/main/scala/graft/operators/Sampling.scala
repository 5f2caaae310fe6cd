package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training pipelines.
  *
  * The split assignment is a pure function of the row id — `md5` of its
  * decimal string form — NOT `rand()`: the same row lands in the same split
  * on every run, every engine, every retry (a `rand()` split silently
  * reshuffles under task retries — same hazard class as SPARK-23207 — and
  * can't be reproduced by an external auditor; the md5 form is replicated
  * exactly by the DuckDB oracle).
  *
  * No shuffle: assignment is a map-side scalar; downstream filters prune.
  */
object Sampling {

  /** Percent bucket in [0, 100): first 4 hex digits of md5(id-as-string).
    * 65536 buckets folded mod 100 — bias is < 0.4% per cell, irrelevant for
    * split purposes and fully deterministic.
    */
  def pctBucket(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("int") % 100

  /** 'train' / 'test' label at the given percentage boundary. */
  def splitLabel(id: Column, trainPct: Int = 90): Column =
    when(pctBucket(id) < trainPct, lit("train")).otherwise(lit("test"))

  /** Materialized (train, test) pair. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int = 90): (DataFrame, DataFrame) = {
    val labeled = df.withColumn("_split", splitLabel(col(idCol), trainPct))
    (labeled.filter(col("_split") === "train").drop("_split"),
      labeled.filter(col("_split") === "test").drop("_split"))
  }

  /** Train/test contamination report: near-duplicate document pairs that
    * straddle the split boundary — each row is a test document whose
    * near-duplicate leaked into train (or vice versa). Candidate
    * generation is [[Dedup.ngramJaccardPairs]] (LSH, one shuffle) with two
    * leakage-specific cost cuts:
    *
    *  - The band plan is DERIVED from the requested threshold
    *    ([[Dedup.lshBandPlan]], target recall 0.97 — a leakage report is a
    *    place where a missed pair is a silently contaminated eval): a
    *    t=0.1 sweep gets the exhaustive 32 r=1 bands (the r=2 routine
    *    setting measurably dropped a true cross-split pair at sf0.1), a
    *    t=0.3 sweep a 10-band net — nobody pays the wide explode when the
    *    S-curve says a narrow one already clears the target.
    *  - The straddle predicate PUSHES INTO candidate generation: split
    *    labels are a deterministic function of bare ids, so same-split
    *    pairs (~82% at a 90/10 split) drop before the pair dedup and the
    *    shingle-array verify joins ever see them. Recall is untouched —
    *    filtering by id can't change which true pairs collide.
    *
    * Pass `bands`/`numHashes` > 0 to override the derived plan.
    */
  def crossSplitLeakage(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.1,
      trainPct: Int = 90,
      bands: Int = 0,
      numHashes: Int = 0): DataFrame = {
    val (nh, b) =
      if (bands > 0 && numHashes > 0) (numHashes, bands)
      else Dedup.lshBandPlan(threshold)
    Dedup.ngramJaccardPairs(docs, textCol, idCol, n, threshold,
      bands = b, numHashes = nh,
      diffTag = Some(id => splitLabel(id, trainPct)))
      .withColumn("split_a", splitLabel(col("id_a"), trainPct))
      .withColumn("split_b", splitLabel(col("id_b"), trainPct))
      .filter(col("split_a") =!= col("split_b")) // invariant guard; free — pushdown already enforced it
  }
}
