package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector kernels over ARRAY<FLOAT>/ARRAY<DOUBLE> columns.
  *
  * Why custom Expressions: Spark's higher-order functions (zip_with +
  * aggregate) evaluate an interpreted lambda per element with boxing — at
  * 64 dims x millions of pairs that dominates similarity-search runtime
  * (measured ~5x on the embedding near-dup operator). These evaluate as a
  * primitive while-loop over the ArrayData. Math is float->double
  * accumulation in index order, bit-identical to the sequential definition
  * (keeps DuckDB-oracle parity).
  */
private object VecEval {
  /** Sum of products in index order; null if either side is null handled
    * upstream. Lengths must match (enforced by the caller's data contract).
    */
  def dot(a: ArrayData, b: ArrayData, dt: DataType): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    dt match {
      case FloatType =>
        while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      case _ =>
        while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    }
    acc
  }
}

/** dot(a, b) — inner product in double precision. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"
  private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecEval.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elemType)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** norm(a) — L2 norm in double precision. */
case class VectorNorm(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    math.sqrt(VecEval.dot(arr, arr, elemType))
  }

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
