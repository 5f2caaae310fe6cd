package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature of a float/double vector: bit p = sign of
  * dot(v, plane_p), planes drawn from a deterministic per-(plane, dim)
  * SplitMix64-mixed Rademacher matrix — no stored plane matrix, any
  * executor recomputes it, so the "index" is a pure function of the vector.
  *
  * MUST stay bit-for-bit in agreement with
  * [[graft.operators.Similarity.signatureOf]] (driver-side literal variant).
  * Kernel in [[ExprKernels.hyperplaneSig]]; codegen emits the same call.
  */
case class HyperplaneSig(child: Expression, planes: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  override def nullable: Boolean = true
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    ExprKernels.hyperplaneSig(input.asInstanceOf[ArrayData], planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_boxed =
        graft.functions.ExprKernels.hyperplaneSig($c, $planes, $isFloat);
      if (${ev.value}_boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_boxed.longValue(); }
    """)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneSig {
  import org.apache.spark.sql.GraftBridge

  def hyperplane_sig(v: Column, planes: Int): Column =
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(v), planes))
}
