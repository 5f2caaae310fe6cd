package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** A fitted affine map y = W·(x − μ) with W of shape outDim×dim (square
  * for whitening, rectangular for PCA / random projection), shipped to
  * executors ONCE as an expression reference object — the
  * centroid-literal discipline of [[graft.operators.Dedup.semanticDedup]]
  * applied to a linear transform (for d = 64 the whole object is ~33 KB;
  * it rides with the task binaries, nothing joins).
  */
final class AffineWhitener(
    val mu: Array[Double],
    val w: Array[Double],
    val dim: Int,
    val outDim: Int)
    extends Serializable {
  require(mu.length == dim && w.length == outDim * dim, "whitener shape mismatch")

  def this(mu: Array[Double], w: Array[Double], dim: Int) = this(mu, w, dim, dim)

  /** W·(x − μ) in index order (deterministic double accumulation);
    * null on a dimension mismatch.
    */
  def apply(vec: ArrayData, isFloat: Boolean): ArrayData = {
    if (vec.numElements() != dim) return null
    val c = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      c(j) = (if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)) - mu(j)
      j += 1
    }
    val out = new Array[Double](outDim)
    var i = 0
    while (i < outDim) {
      var acc = 0.0
      var k = i * dim
      var t = 0
      while (t < dim) { acc += w(k) * c(t); k += 1; t += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** whiten_vec(vec) — apply the literal fitted whitener; codegen'd
  * (generated code calls straight into the reference object, no UDF
  * serialization per row).
  */
case class WhitenVec(child: Expression, whitener: AffineWhitener)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "whiten_vec"
  override def nullable: Boolean = true

  private lazy val vecIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any): Any =
    whitener.apply(vec.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affineWhitener", whitener, classOf[AffineWhitener].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = ($ref).apply($v, $vecIsFloat);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WhitenVec {
  import org.apache.spark.sql.GraftBridge

  def whiten_vec(vec: Column, whitener: AffineWhitener): Column =
    GraftBridge.column(WhitenVec(GraftBridge.expression(vec), whitener))
}
