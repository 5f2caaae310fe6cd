package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a string array in ONE pass: element i of the result
  * is min over the input of xxhash64(value, seed=i).
  *
  * Why a custom Expression instead of
  * `array((0 until k).map(i => array_min(transform(arr, s => xxhash64(s, i)))))`:
  * Catalyst's CollapseProject inlines the (already large) shingle-building
  * subtree into all k branches, so the composed form tokenizes and shingles
  * the document k times and produces a pathologically large codegen unit —
  * measured 20x slower at k=16. Here the array is evaluated once and all k
  * mins are folded in a single traversal: O(n*k) hashing, O(1) extra memory,
  * no expression-tree blowup. (Preference order per the build rules: built-in
  * composition was tried first and genuinely can't express "one pass".)
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var h = 0
        while (h < numHashes) {
          // golden-ratio-mixed seed: consecutive integer seeds give xxHash64
          // families correlated enough to bias MinHash agreement (measured
          // 5/16 agreement on a Jaccard-0.6 pair); mixing restores ~J
          val v = XxHash64Function.hash(s, StringType,
            h.toLong * MinHashSignature.SeedMix)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  import org.apache.spark.sql.GraftBridge

  /** 2^64 / golden ratio — standard seed scrambler (public constant, e.g.
    * SplitMix64 / Fibonacci hashing).
    */
  val SeedMix: Long = 0x9E3779B97F4A7C15L

  /** `minhash_signature(arrayCol, k)` as a Column. */
  def minhash_signature(arr: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(arr), numHashes))
}
