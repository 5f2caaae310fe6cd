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
}
