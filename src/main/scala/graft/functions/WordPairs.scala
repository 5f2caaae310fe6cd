package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-document symmetric window co-occurrence counts over a literal
  * vocabulary — the q187 word-vector pair generator collapsed to ONE
  * kernel node (the [[AffineWhitener]] reference-object discipline).
  *
  * Replaces: transform+array_position (a 50-string linear scan per
  * token) feeding an explode of 2·win·T zip_with structs into the
  * count aggregate. The kernel hash-maps each token to its 1-based
  * vocab position once and accumulates the v×v pair matrix in a local
  * long array, emitting only nonzero cells — the aggregate then sums
  * ≤v² bounded rows per doc instead of hashing 2·win·T occurrence rows.
  *
  * Parity: the emitted (w1, w2, c) multiset sums to exactly the pair
  * counts of the expression form — for every gap d in 1..win and every
  * adjacent-in-gap token pair (a, b) with both in-vocab, one count for
  * (a, b) and one for (b, a); OOV and null tokens drop, matching the
  * `array_position = 0 / null` filter. Counts are integers, so the
  * downstream sum is order-free exact.
  */
final class VocabPairCounter(val vocab: Array[String], val win: Int)
    extends Serializable {
  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.length * 2)
    var i = 0
    while (i < vocab.length) { m.put(vocab(i), Integer.valueOf(i + 1)); i += 1 }
    m
  }

  /** Nonzero (w1, w2, c) cells of the doc's windowed pair-count matrix,
    * w1/w2 1-based vocab positions, emitted in (w1, w2) ascending order.
    */
  def count(ts: ArrayData): ArrayData = {
    val n = ts.numElements()
    val v = vocab.length
    val is = new Array[Int](n)
    var i = 0
    while (i < n) {
      is(i) =
        if (ts.isNullAt(i)) 0
        else {
          val p = index.get(ts.getUTF8String(i).toString)
          if (p == null) 0 else p.intValue()
        }
      i += 1
    }
    val m = new Array[Long](v * v)
    var d = 1
    while (d <= win) {
      var j = 0
      val end = n - d
      while (j < end) {
        val a = is(j)
        val b = is(j + d)
        if (a > 0 && b > 0) {
          m((a - 1) * v + (b - 1)) += 1
          m((b - 1) * v + (a - 1)) += 1
        }
        j += 1
      }
      d += 1
    }
    var nz = 0
    var c = 0
    while (c < v * v) { if (m(c) != 0) nz += 1; c += 1 }
    val out = new Array[Any](nz)
    var o = 0
    c = 0
    while (c < v * v) {
      if (m(c) != 0) {
        out(o) = new GenericInternalRow(
          Array[Any](c / v + 1, c % v + 1, m(c)))
        o += 1
      }
      c += 1
    }
    new GenericArrayData(out)
  }
}

/** vocab_pair_counts(tokens) — array<struct<w1 int, w2 int, c long>>. */
case class VocabPairCounts(child: Expression, counter: VocabPairCounter)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", IntegerType, nullable = false),
      StructField("w2", IntegerType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "vocab_pair_counts"
  override def nullable: Boolean = true

  override def nullSafeEval(ts: Any): Any =
    counter.count(ts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabPairCounter", counter,
      classOf[VocabPairCounter].getName)
    nullSafeCodeGen(ctx, ev, ts => s"${ev.value} = ($ref).count($ts);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordPairs {
  import org.apache.spark.sql.GraftBridge

  def vocab_pair_counts(tokens: Column, counter: VocabPairCounter): Column =
    GraftBridge.column(VocabPairCounts(GraftBridge.expression(tokens), counter))
}
