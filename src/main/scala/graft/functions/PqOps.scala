package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels over a literal model (coarse centroids +
  * subspace codebooks) shipped to executors ONCE as an expression
  * reference object — the [[AffineWhitener]] discipline applied to PQ.
  *
  * Why: the previous pure-expression forms built the argmin / LUT trees
  * out of per-literal nodes — m·ksub·dsub literal doubles plus a struct
  * and a sort_array per subspace (~1.7k expression nodes for the encode
  * alone, and the IVF variant adds a k·dim centroid matrix). Whole-stage
  * codegen then compiles thousands of nodes per plan, which dominated
  * q153/q157's COLD pass (driver bench: 15.8 s / 33.4 s first pass vs
  * 2.4 s / 4.5 s warm — pure compile tail). Each kernel here is ONE plan
  * node calling into this object.
  *
  * Arithmetic parity (oracle-pinned): every loop reproduces the exact
  * IEEE sequence of the expression form it replaces —
  *  - unit(i) = (double)v(i) / nrm, nrm = sqrt(Σ v(i)²) sequential,
  *    0 → 1.0 guard ([[ExprKernels.norm]] + the when/otherwise guard);
  *  - code argmin d = c2 − 2.0·(Σ sub(t)·c(t) sequential), c2 = left-fold
  *    Σ c(t)² (the Scala `.sum` the literal form used), ties to the
  *    LOWEST index (ascending sort_array of struct(d, i));
  *  - coarse scores s = Σ v(i)·cent(i) sequential over the RAW vector
  *    ([[ExprKernels.dot]] float→double), descending ties to the HIGHEST
  *    index (descending sort_array of struct(s, i));
  *  - residual r(i) = unit(i) − cent(i) (the zip_with form).
  * NaN/−0.0 cannot arise (finite inputs, c2 ≥ +0.0), so plain `<`/`>`
  * comparisons match sort_array's ordering.
  */
final class PqModel(
    val cents: Array[Double], // kCents·dim flat (empty for plain PQ)
    val kCents: Int,
    val books: Array[Double], // m·ksub·dsub flat
    val m: Int,
    val ksub: Int,
    val dsub: Int)
    extends Serializable {

  val dim: Int = m * dsub
  require(books.length == m * ksub * dsub, "PqModel: codebook shape mismatch")
  require(cents.length == kCents * dim, "PqModel: centroid shape mismatch")

  /** c2(j·ksub+ci) = Σ c(t)² as a left fold — identical to the
    * `c.map(x => x * x).sum` the literal expression form embedded.
    */
  val c2: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var jc = 0
    while (jc < m * ksub) {
      var s = 0.0
      var t = jc * dsub
      val end = t + dsub
      while (t < end) { s += books(t) * books(t); t += 1 }
      out(jc) = s
      jc += 1
    }
    out
  }

  /** Normalized copy of `vec` into `out`; false on length mismatch or a
    * null element (callers return null — matching the null poisoning of
    * the expression chain).
    */
  private def unitInto(vec: ArrayData, isFloat: Boolean, out: Array[Double]): Boolean = {
    if (vec.numElements() != dim) return false
    var s = 0.0
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return false
      val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      out(i) = x
      s += x * x
      i += 1
    }
    val raw = math.sqrt(s)
    val nrm = if (raw == 0) 1.0 else raw
    i = 0
    while (i < dim) { out(i) = out(i) / nrm; i += 1 }
    true
  }

  /** Argmin code per subspace over an already-prepared double vector. */
  private def codesOf(u: Array[Double]): ArrayData = {
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < ksub) {
        var s = 0.0
        var off = (j * ksub + ci) * dsub
        var t = j * dsub
        val tEnd = t + dsub
        while (t < tEnd) { s += u(t) * books(off); t += 1; off += 1 }
        val d = c2(j * ksub + ci) - 2.0 * s
        if (d < bestD) { bestD = d; best = ci }
        ci += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** PQ codes of the normalized vector ([[graft.operators.Similarity.pqEncode]]). */
  def codes(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val u = new Array[Double](dim)
    if (!unitInto(vec, isFloat, u)) return null
    codesOf(u)
  }

  /** Residual-PQ codes against coarse list `cluster` (IVFADC encode). */
  def residualCodes(vec: ArrayData, isFloat: Boolean, cluster: Int): ArrayData = {
    if (cluster < 0 || cluster >= kCents) return null
    val u = new Array[Double](dim)
    if (!unitInto(vec, isFloat, u)) return null
    var i = 0
    var off = cluster * dim
    while (i < dim) { u(i) = u(i) - cents(off); i += 1; off += 1 }
    codesOf(u)
  }

  /** Per-query ADC lookup table lut[j][ci] = unit_sub_j · codebook_j[ci]
    * — nested array<array<double>>, same layout as the expression form.
    */
  def lut(vec: ArrayData, isFloat: Boolean): ArrayData = {
    val u = new Array[Double](dim)
    if (!unitInto(vec, isFloat, u)) return null
    val rows = new Array[Any](m)
    var j = 0
    while (j < m) {
      val row = new Array[Double](ksub)
      var ci = 0
      while (ci < ksub) {
        var s = 0.0
        var off = (j * ksub + ci) * dsub
        var t = j * dsub
        val tEnd = t + dsub
        while (t < tEnd) { s += u(t) * books(off); t += 1; off += 1 }
        row(ci) = s
        ci += 1
      }
      rows(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(rows)
  }

  /** Coarse scores of the RAW vector against every centroid; null on
    * mismatch/null element. Scratch for the top-R selectors.
    */
  private def centScores(vec: ArrayData, isFloat: Boolean): Array[Double] = {
    if (vec.numElements() != dim) return null
    val s = new Array[Double](kCents)
    var c = 0
    while (c < kCents) {
      var acc = 0.0
      var off = c * dim
      var i = 0
      while (i < dim) {
        if (vec.isNullAt(i)) return null
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += x * cents(off)
        i += 1
        off += 1
      }
      s(c) = acc
      c += 1
    }
    s
  }

  /** Indices of the top-`r` centroids by (score desc, index desc) — the
    * descending sort_array tie order of the struct(s, i) form.
    */
  private def topOrder(s: Array[Double], r: Int): Array[Int] = {
    val n = s.length
    val idx = Array.tabulate(n)(identity)
    // descending (s, i) selection sort of the first r slots — k is tiny
    var a = 0
    while (a < r) {
      var best = a
      var b = a + 1
      while (b < n) {
        val better = s(idx(b)) > s(idx(best)) ||
          (s(idx(b)) == s(idx(best)) && idx(b) > idx(best))
        if (better) best = b
        b += 1
      }
      val tmp = idx(a); idx(a) = idx(best); idx(best) = tmp
      a += 1
    }
    idx
  }

  /** array<int> of the top-`r` coarse list ids (IVFADC multi-assignment). */
  def topClusterIds(vec: ArrayData, isFloat: Boolean, r: Int): ArrayData = {
    val s = centScores(vec, isFloat)
    if (s == null) return null
    val rr = math.min(r, kCents)
    val idx = topOrder(s, rr)
    val out = new Array[Int](rr)
    var i = 0
    while (i < rr) { out(i) = idx(i); i += 1 }
    new GenericArrayData(out)
  }

  /** array<struct<s double, i int>> of the top-`r` coarse lists — the
    * probe frame's (q·centroid, list) pairs.
    */
  def topClusters(vec: ArrayData, isFloat: Boolean, r: Int): ArrayData = {
    val s = centScores(vec, isFloat)
    if (s == null) return null
    val rr = math.min(r, kCents)
    val idx = topOrder(s, rr)
    val out = new Array[Any](rr)
    var i = 0
    while (i < rr) {
      out(i) = new GenericInternalRow(Array[Any](s(idx(i)), idx(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait PqVecInput { self: { def child: Expression } =>
  protected lazy val vecIsFloat: Boolean =
    self.child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** pq_codes(vec) — m argmin codes of the normalized vector. */
case class PqCodes(child: Expression, model: PqModel)
    extends UnaryExpression with PqVecInput {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"
  override def nullable: Boolean = true

  override def nullSafeEval(vec: Any): Any =
    model.codes(vec.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = ($ref).codes($v, $vecIsFloat);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_residual_codes(vec, cluster) — m argmin codes of unit(vec) − cent. */
case class PqResidualCodes(left: Expression, right: Expression, model: PqModel)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_residual_codes"
  override def nullable: Boolean = true
  private lazy val vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(vec: Any, cluster: Any): Any =
    model.residualCodes(vec.asInstanceOf[ArrayData], vecIsFloat,
      cluster.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"""
      ${ev.value} = ($ref).residualCodes($v, $vecIsFloat, $c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pq_lut(vec) — per-query m×ksub ADC lookup table. */
case class PqLut(child: Expression, model: PqModel)
    extends UnaryExpression with PqVecInput {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullable: Boolean = true

  override def nullSafeEval(vec: Any): Any =
    model.lut(vec.asInstanceOf[ArrayData], vecIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = ($ref).lut($v, $vecIsFloat);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_top_cluster_ids(vec) — top-r coarse list ids, score desc. */
case class PqTopClusterIds(child: Expression, model: PqModel, r: Int)
    extends UnaryExpression with PqVecInput {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_top_cluster_ids"
  override def nullable: Boolean = true

  override def nullSafeEval(vec: Any): Any =
    model.topClusterIds(vec.asInstanceOf[ArrayData], vecIsFloat, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = ($ref).topClusterIds($v, $vecIsFloat, $r);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** pq_top_clusters(vec) — top-r (score, list id) structs, score desc. */
case class PqTopClusters(child: Expression, model: PqModel, r: Int)
    extends UnaryExpression with PqVecInput {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", DoubleType, nullable = false),
      StructField("i", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_top_clusters"
  override def nullable: Boolean = true

  override def nullSafeEval(vec: Any): Any =
    model.topClusters(vec.asInstanceOf[ArrayData], vecIsFloat, r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = ($ref).topClusters($v, $vecIsFloat, $r);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PqOps {
  import org.apache.spark.sql.GraftBridge

  /** Flatten driver-side codebooks (and optional coarse centroids) into
    * one serializable model object.
    */
  def model(
      codebooks: Array[Array[Array[Double]]],
      centroids: Array[Array[Double]] = Array.empty): PqModel = {
    val m = codebooks.length
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    val books = new Array[Double](m * ksub * dsub)
    var j = 0
    while (j < m) {
      var ci = 0
      while (ci < ksub) {
        System.arraycopy(codebooks(j)(ci), 0, books, (j * ksub + ci) * dsub, dsub)
        ci += 1
      }
      j += 1
    }
    val dim = m * dsub
    val cents = new Array[Double](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      System.arraycopy(centroids(c), 0, cents, c * dim, dim)
      c += 1
    }
    new PqModel(cents, centroids.length, books, m, ksub, dsub)
  }

  def pq_codes(vec: Column, model: PqModel): Column =
    GraftBridge.column(PqCodes(GraftBridge.expression(vec), model))

  def pq_residual_codes(vec: Column, cluster: Column, model: PqModel): Column =
    GraftBridge.column(PqResidualCodes(
      GraftBridge.expression(vec), GraftBridge.expression(cluster), model))

  def pq_lut(vec: Column, model: PqModel): Column =
    GraftBridge.column(PqLut(GraftBridge.expression(vec), model))

  def pq_top_cluster_ids(vec: Column, model: PqModel, r: Int): Column =
    GraftBridge.column(PqTopClusterIds(GraftBridge.expression(vec), model, r))

  def pq_top_clusters(vec: Column, model: PqModel, r: Int): Column =
    GraftBridge.column(PqTopClusters(GraftBridge.expression(vec), model, r))
}
