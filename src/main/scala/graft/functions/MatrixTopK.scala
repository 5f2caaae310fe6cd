package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** A candidate matrix for in-expression cosine top-k: ids plus a flat
  * row-major float buffer, shipped to executors ONCE as an expression
  * reference object (the centroid-literal discipline of
  * [[graft.operators.Dedup.semanticDedup]], scaled from k centroids to a
  * bounded candidate set).
  *
  * Why: a self-join kNN edge build over n vectors through the generic
  * crossJoin + TopKPairs path pays n² JOIN MACHINERY — joined-row
  * construction carrying both 64-float arrays, per-pair struct allocation,
  * and an n²-row aggregate — when the actual math (n²·dim flops) is the
  * cheap part. Here each input row scans the flat primitive buffer in one
  * codegen'd call and emits only its k winners: the n²-row intermediate
  * never exists and the edge build needs ZERO shuffles.
  *
  * Arithmetic is bit-identical to the join path: per-candidate norms are
  * the same float→double sequential sqrt(Σx²) as [[ExprKernels.norm]], the
  * dot accumulates in index order like [[ExprKernels.dot]] (products
  * commute exactly in IEEE754), zero denominator → score 0, and the
  * (score desc, id asc) total order matches [[TopKPairs]] — so swapping a
  * plan between the two paths cannot move a result.
  */
final class NeighborMatrix(val ids: Array[Long], val flat: Array[Float], val dim: Int)
    extends Serializable {
  require(ids.length * dim == flat.length, "matrix shape mismatch")

  @transient private lazy val norms: Array[Double] = {
    val out = new Array[Double](ids.length)
    var r = 0
    while (r < ids.length) {
      var acc = 0.0
      var i = r * dim
      val end = i + dim
      while (i < end) { val x = flat(i).toDouble; acc += x * x; i += 1 }
      out(r) = math.sqrt(acc)
      r += 1
    }
    out
  }

  /** Top-k (score desc, id asc) cosine neighbors of `vec`, excluding the
    * candidate with id == selfId; array of struct(score, id).
    */
  def topK(vec: ArrayData, vecIsFloat: Boolean, selfId: Long, k: Int): ArrayData = {
    val qn = ExprKernels.norm(vec, vecIsFloat)
    if (qn == null || vec.numElements() != dim) return null
    val qnorm = qn.doubleValue()
    val q = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      q(i) = if (vecIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    val hs = new Array[Double](k) // insertion-sorted top-k, best first
    val hid = new Array[Long](k)
    var m = 0
    var r = 0
    while (r < ids.length) {
      if (ids(r) != selfId) {
        var acc = 0.0
        var j = r * dim
        var t = 0
        while (t < dim) { acc += flat(j).toDouble * q(t); j += 1; t += 1 }
        val denom = norms(r) * qnorm
        val s = if (denom == 0) 0.0 else acc / denom
        val id = ids(r)
        if (m < k || s > hs(m - 1) || (s == hs(m - 1) && id < hid(m - 1))) {
          var p = if (m < k) m else k - 1
          while (p > 0 && (hs(p - 1) < s || (hs(p - 1) == s && hid(p - 1) > id))) {
            hs(p) = hs(p - 1); hid(p) = hid(p - 1); p -= 1
          }
          hs(p) = s; hid(p) = id
          if (m < k) m += 1
        }
      }
      r += 1
    }
    val rows = new Array[Any](m)
    var w = 0
    while (w < m) {
      rows(w) = InternalRow(hs(w), hid(w))
      w += 1
    }
    new GenericArrayData(rows)
  }
}

/** matrix_top_k(vec, id) — per-row cosine top-k against the literal
  * candidate matrix; NULL on null/malformed vec.
  */
case class MatrixTopK(left: Expression, right: Expression,
    matrix: NeighborMatrix, k: Int) extends BinaryExpression {
  require(k >= 1, "matrix_top_k: k >= 1")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "matrix_top_k"
  override def nullable: Boolean = true

  private lazy val vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any, id: Any): Any =
    matrix.topK(vec.asInstanceOf[ArrayData], vecIsFloat, id.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("neighborMatrix", matrix, classOf[NeighborMatrix].getName)
    nullSafeCodeGen(ctx, ev, (v, id) => s"""
      ${ev.value} = ($mRef).topK($v, $vecIsFloat, $id, $k);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MatrixTopK {
  import org.apache.spark.sql.GraftBridge

  def matrix_top_k(vec: Column, id: Column, matrix: NeighborMatrix, k: Int): Column =
    GraftBridge.column(MatrixTopK(
      GraftBridge.expression(vec), GraftBridge.expression(id), matrix, k))
}
