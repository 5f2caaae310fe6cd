package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Group-wise top-k as a BOUNDED aggregate, not a window sort.
  *
  * `row_number().over(Window.partitionBy(group).orderBy(...))` shuffles and
  * sorts EVERY row of every group before discarding all but k — at 100 TB
  * that is a full-data exchange for a k-row-per-group answer. Here the
  * [[graft.functions.TopKPairs]] TypedImperativeAggregate keeps a k-entry
  * partial heap per partition per group, so the shuffle carries at most
  * k rows per (partition, group) and nothing is ever globally sorted
  * (same kernel the batch-retrieval family uses, lifted to arbitrary
  * group keys).
  *
  * Ordering is score DESC, id ASC on ties — callers encode composite
  * orderings into the double score (see q111: chars * 2^33 - id, exact
  * while chars < 2^19).
  */
object GroupTopK {

  /** Top `k` (score, id) rows per group; returns group cols + (rnk, id,
    * score). Deterministic: ties on score break by ascending id.
    */
  def topK(
      df: DataFrame,
      groupCols: Seq[String],
      score: Column,
      id: Column,
      k: Int): DataFrame = {
    val gs = groupCols.map(col)
    df
      .groupBy(gs: _*)
      .agg(graft.functions.TopKPairs
        .top_k_pairs(struct(score.as("score"), id.as("id")), k).as("hits"))
      .select(gs :+ posexplode(col("hits")): _*)
      .select(gs ++ Seq((col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("id"), col("col.score").as("score")): _*)
  }
}
