package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column <-> Expression converters, so custom
  * Catalyst expressions (e.g. graft.functions.JsonDropKeys) can be exposed as
  * user-facing Columns. Standard extension-library technique: the only code
  * in this package; everything else lives under `graft.*`.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder on an EXISTING session's registry — the
    * runtime path for sessions created without `spark.sql.extensions`
    * (e.g. the driver's own session running SparkEntry queries). The
    * build-time path is [[graft.GraftExtensions]].
    */
  def registerTempFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
