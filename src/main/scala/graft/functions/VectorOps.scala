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
  override def nullable: Boolean = true
  private lazy val lFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.dot(a.asInstanceOf[ArrayData], lFloat, b.asInstanceOf[ArrayData], rFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_boxed =
        graft.functions.ExprKernels.dot($a, $lFloat, $b, $rFloat);
      if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** norm(a) — L2 norm in double precision; null on null elements. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"
  override def nullable: Boolean = true
  private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    ExprKernels.norm(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_boxed =
        graft.functions.ExprKernels.norm($c, $isFloat);
      if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_boxed.doubleValue(); }
    """)

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
