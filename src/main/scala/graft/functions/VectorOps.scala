package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector kernels over ARRAY<FLOAT>/ARRAY<DOUBLE> columns.
  *
  * Why custom Expressions: Spark's higher-order functions (zip_with +
  * aggregate) evaluate an interpreted lambda per element with boxing — at
  * 64 dims x millions of pairs that dominates similarity-search runtime
  * (measured ~5x on the embedding near-dup operator). These evaluate as a
  * primitive while-loop over the ArrayData (see [[ExprKernels]]), and
  * participate in whole-stage codegen via `doGenCode` emitting a static
  * call. Math is float->double accumulation in index order, bit-identical
  * to the sequential definition (keeps DuckDB-oracle parity).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"
  private lazy val lFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (lFloat && rFloat) ExprKernels.dotFloat(x, y)
    else if (!lFloat && !rFloat) ExprKernels.dotDouble(x, y)
    else ExprKernels.dotMixed(x, lFloat, y, rFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      if (lFloat && rFloat) s"graft.functions.ExprKernels.dotFloat($a, $b)"
      else if (!lFloat && !rFloat) s"graft.functions.ExprKernels.dotDouble($a, $b)"
      else s"graft.functions.ExprKernels.dotMixed($a, $lFloat, $b, $rFloat)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** norm(a) — L2 norm in double precision. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def kernel: String = if (isFloat) "normFloat" else "normDouble"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (isFloat) ExprKernels.normFloat(arr) else ExprKernels.normDouble(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.$kernel($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object VectorOps {
  import org.apache.spark.sql.GraftBridge

  def vector_dot(a: Column, b: Column): Column =
    GraftBridge.column(VectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  def vector_norm(a: Column): Column =
    GraftBridge.column(VectorNorm(GraftBridge.expression(a)))
}
