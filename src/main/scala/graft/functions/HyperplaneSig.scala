package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature of a float/double vector: bit p = sign of
  * dot(v, plane_p), planes drawn from a deterministic per-(plane, dim)
  * bit-mix (Knuth multiplicative constants) — no stored plane matrix, any
  * executor recomputes it, so the "index" is a pure function of the vector.
  *
  * MUST stay bit-for-bit in agreement with
  * [[graft.operators.Similarity.signatureOf]] (driver-side literal variant).
  */
case class HyperplaneSig(child: Expression, planes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        val sign =
          if ((((i.toLong * HyperplaneSig.MixA + p.toLong * HyperplaneSig.MixB) >> 17) & 1L) == 0L) 1.0
          else -1.0
        s += x * sign
        i += 1
      }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneSig {
  val MixA = 2654435761L // Knuth multiplicative-hash constant
  val MixB = 40503L

  import org.apache.spark.sql.GraftBridge

  def hyperplane_sig(v: Column, planes: Int): Column =
    GraftBridge.column(HyperplaneSig(GraftBridge.expression(v), planes))
}
