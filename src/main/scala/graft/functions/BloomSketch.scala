package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers for Spark's internal Bloom-filter expressions
  * (`bloom_filter_agg` / `might_contain`) — registered for runtime join
  * filtering but absent from the public FunctionRegistry, so they are
  * bridged the same way the other custom expressions are. The aggregate
  * builds the bitmap distributedly (partial filters OR-merge map-side) and
  * only the fixed-size bitmap ever reaches the driver; the probe is a
  * codegen'd bit test. Inputs must be XXH64 longs (the aggregate's input
  * contract): hash with `xxhash64(...)` on both build and probe sides.
  */
object BloomSketch {

  /** Aggregate: fold LONG hashes into a Bloom-filter bitmap (binary). */
  def bloom_agg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(hashed),
      GraftBridge.expression(org.apache.spark.sql.functions.lit(expectedItems)),
      GraftBridge.expression(org.apache.spark.sql.functions.lit(numBits)))
      .toAggregateExpression())

  /** Probe: true if `hashed` might be in the filter (no false negatives). */
  def bloom_might_contain(filter: Column, hashed: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(filter),
      GraftBridge.expression(hashed)))
}
