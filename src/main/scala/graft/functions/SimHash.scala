package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a string array (tokens or shingles) in one pass:
  * per-bit majority vote over xxhash64 of the elements — near-duplicate
  * documents land within small Hamming distance.
  *
  * Custom Expression for the same reason as [[MinHashSignature]]: the
  * built-in composition (`aggregate` per bit) replicates the tokenize
  * subtree once per bit; this evaluates the array once and votes all 64
  * bits per element.
  */
case class SimHash(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {
  import org.apache.spark.sql.GraftBridge

  /** `simhash64(arrayCol)` as a Column. */
  def simhash64(arr: Column): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(arr)))
}
