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

/** window_pair_cells(tokens, win) — the OPEN-VOCABULARY sibling of
  * [[VocabPairCounts]] for q183's windowed PMI: per document, every
  * token pair at gap 1..win canonicalizes to (least, greatest) by the
  * binary string order (UTF8String.compareTo — exactly the `least`/
  * `greatest` the zip_with expression form applied) and accumulates in
  * a local hash map; the kernel emits the nonzero (w1, w2, c) cells.
  * Replaces win chained zip_with slices + flatten + explode — all
  * interpreted higher-order lambdas — with one compiled pass, and the
  * downstream aggregate sums ≤ pairs-per-doc bounded cells instead of
  * hashing every occurrence row. The summed counts are the identical
  * integer multiset (null tokens cannot occur below a split(); skipped
  * defensively), so the PMI chain is untouched.
  */
final class WindowPairCells(val win: Int) extends Serializable {
  def cells(ts: ArrayData): ArrayData = {
    val n = ts.numElements()
    val words = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      // clone: getUTF8String can return a view into a reused unsafe
      // buffer, and these bytes outlive the input row (map keys + the
      // emitted cells)
      words(i) = if (ts.isNullAt(i)) null else ts.getUTF8String(i).clone()
      i += 1
    }
    val m = new java.util.LinkedHashMap[
      (org.apache.spark.unsafe.types.UTF8String,
       org.apache.spark.unsafe.types.UTF8String), Array[Long]]()
    var d = 1
    while (d <= win) {
      var j = 0
      val end = n - d
      while (j < end) {
        val a = words(j)
        val b = words(j + d)
        if (a != null && b != null) {
          val k = if (a.compareTo(b) <= 0) (a, b) else (b, a)
          val c = m.get(k)
          if (c == null) m.put(k, Array(1L)) else c(0) += 1L
        }
        j += 1
      }
      d += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = new GenericInternalRow(
        Array[Any](e.getKey._1, e.getKey._2, e.getValue()(0)))
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** window_pair_cells(tokens) — array<struct<w1 string, w2 string, c long>>. */
case class WindowPairCellsExpr(child: Expression, counter: WindowPairCells)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "window_pair_cells"
  override def nullable: Boolean = true

  override def nullSafeEval(ts: Any): Any =
    counter.cells(ts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("windowPairCells", counter,
      classOf[WindowPairCells].getName)
    nullSafeCodeGen(ctx, ev, ts => s"${ev.value} = ($ref).cells($ts);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordPairs {
  import org.apache.spark.sql.GraftBridge

  def vocab_pair_counts(tokens: Column, counter: VocabPairCounter): Column =
    GraftBridge.column(VocabPairCounts(GraftBridge.expression(tokens), counter))

  def window_pair_cells(tokens: Column, win: Int): Column =
    GraftBridge.column(WindowPairCellsExpr(
      GraftBridge.expression(tokens), new WindowPairCells(win)))
}
