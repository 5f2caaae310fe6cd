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
  *
  * Known upstream quirk: when the PROBE argument is foldable (e.g.
  * `xxhash64` of a literal, as contract specs do), Spark's own
  * `BloomFilterMightContain.doGenCode` emits a `(Long)` cast on the
  * constant-folded value that Janino rejects, and Spark falls back to
  * interpreted projection with a one-line
  * `WARN UnsafeProjection: Expr codegen error`. Harmless — the hot path
  * (a per-row, non-foldable hash) codegens normally; don't burn time
  * chasing that WARN in the test suite.
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
