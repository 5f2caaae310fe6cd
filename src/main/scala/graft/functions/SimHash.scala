package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a string array (tokens or shingles) in one pass:
  * per-bit majority vote over xxhash64 of the elements — near-duplicate
  * documents land within small Hamming distance.
  *
  * Custom Expression for the same reason as [[MinHashSignature]]: the
  * built-in composition (`aggregate` per bit) replicates the tokenize
  * subtree once per bit; this evaluates the array once and votes all 64
  * bits per element ([[ExprKernels.simhash]], codegen-capable).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  import org.apache.spark.sql.GraftBridge

  /** `simhash64(arrayCol)` as a Column. */
  def simhash64(arr: Column): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(arr)))
}
