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
    * generation is [[Dedup.ngramJaccardPairs]] (LSH, one shuffle); the
    * split labels join in afterwards, so the leakage check costs the same
    * as the dedup pass it reuses. A leakage report is a place where a
    * missed pair is a silently contaminated eval, so the default net is
    * the exhaustive-sweep setting (32 r=1 bands — per-pair miss (1-j)^32;
    * the r=2 default measurably dropped a true cross-split pair at sf0.1).
    */
  def crossSplitLeakage(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      n: Int = 3,
      threshold: Double = 0.1,
      trainPct: Int = 90,
      bands: Int = 32,
      numHashes: Int = 32): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(docs, textCol, idCol, n, threshold,
      bands = bands, numHashes = numHashes)
    pairs
      .withColumn("split_a", splitLabel(col("id_a"), trainPct))
      .withColumn("split_b", splitLabel(col("id_b"), trainPct))
      .filter(col("split_a") =!= col("split_b"))
  }
}
