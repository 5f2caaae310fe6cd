package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Jaro-Winkler similarity (Winkler 1990's record-linkage measure — the
  * fuzzy string comparator census/entity-resolution systems standardized
  * on; strong on short names where edit distance over-penalizes and
  * token-set Jaccard has nothing to work with). Kernel in
  * [[ExprKernels.jaroWinkler]], bit-exact to DuckDB's
  * `jaro_winkler_similarity` so unrounded threshold filters replay;
  * codegen-capable (static call, WholeStageCodegen span intact).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.jaroWinkler(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ExprKernels.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object JaroWinkler {
  import org.apache.spark.sql.GraftBridge

  def jaro_winkler(a: Column, b: Column): Column =
    GraftBridge.column(JaroWinkler(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
