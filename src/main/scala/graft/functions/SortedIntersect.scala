package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** sorted_intersect_count(a, b) — |A ∩ B| of two sorted ARRAY<BIGINT>
  * columns via a single merge scan (see [[ExprKernels.sortedIntersectCount]]).
  *
  * Why a custom Expression: the exact-verify pass of the dedup family
  * computes one set intersection per LSH candidate pair. The built-in
  * `array_intersect` allocates and populates a hash set per invocation;
  * the merge scan is allocation-free and participates in whole-stage
  * codegen, keeping the verify join inside one codegen stage.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ExprKernels.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** positional_agree_count(a, b) — number of indices where two equal-length
  * ARRAY<BIGINT> columns hold the same value; the MinHash signature
  * agreement count (see [[ExprKernels.positionalAgreeCount]]).
  */
case class PositionalAgreeCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "positional_agree_count"
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.positionalAgreeCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ExprKernels.positionalAgreeCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SortedIntersect {
  import org.apache.spark.sql.GraftBridge

  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def positional_agree_count(a: Column, b: Column): Column =
    GraftBridge.column(PositionalAgreeCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
