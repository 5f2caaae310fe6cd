package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** KLL mergeable quantile sketch as a custom `TypedImperativeAggregate` —
  * the 100 TB path that [[graft.operators.Normalize.quantileNormalize]]'s
  * scaladoc prescribes for its global lookup table ("a merged t-digest/KLL
  * table broadcast to the groups") and that any corpus-wide percentile
  * threshold (quality cuts, MAD fences, perplexity bands) needs once a
  * total-order sort of the value column stops being affordable.
  *
  * Public algorithm (Karnin, Lang & Liberty, FOCS 2016): a ladder of
  * compactors where level l holds items of weight 2^l; when a level
  * overflows its capacity it sorts, keeps every second item, and promotes
  * the survivors one level up at doubled weight. Capacities decay
  * geometrically below the top level (ratio 2/3, floor 2), so total state
  * is O(k) regardless of input size, and two sketches merge by
  * concatenating levels and re-compacting — associative, partial-friendly,
  * exactly the map-side-combine shape Spark aggregation wants: one bounded
  * sketch per partition crosses the wire, never the values.
  *
  * Exactness and determinism: total weight is preserved exactly (an
  * odd-sized level holds its minimum back rather than orphan-promoting),
  * so `n` in the emitted summary always equals the true row count. The
  * compaction coin is a deterministic alternating flip (per-buffer
  * counter), not a PRNG — a single-partition build is bit-reproducible,
  * and under distributed merges only the ±eps·n rank placement can move,
  * never the weight accounting (the q152 contract pins the realized rank
  * error with slack over KLL's ~2.3/k one-level bound; KllSketchSpec pins
  * the error bound across partitionings and the exact regime below
  * capacity).
  *
  * Emits struct(n BIGINT, items ARRAY<STRUCT<v DOUBLE, w BIGINT>>) with
  * items sorted by value — the weighted summary that [[KllSketch.kllQuantile]]
  * folds (codegen'd `aggregate`, no explode/window) into any quantile, and
  * that a broadcast join turns into the global rank table of
  * [[graft.operators.Normalize.quantileNormalizeSketched]].
  */
case class KllDoubleSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf]
  with UnaryLike[Expression] {

  require(k >= 8, "kll_sketch: k must be >= 8")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kll_sketch requires a DOUBLE value column (cast first), got ${child.dataType.sql}")

  override def prettyName: String = "kll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("v", DoubleType), StructField("w", LongType)))))))

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)

  override def update(buf: KllBuf, input: InternalRow): KllBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(b1: KllBuf, b2: KllBuf): KllBuf = { b1.mergeIn(b2); b1 }

  override def eval(buf: KllBuf): Any = {
    val flat = buf.summary()
    InternalRow(buf.n, new GenericArrayData(
      flat.map { case (v, w) => InternalRow(v, w) }.asInstanceOf[Array[Any]]))
  }

  override def serialize(buf: KllBuf): Array[Byte] = buf.bytes()
  override def deserialize(bytes: Array[Byte]): KllBuf = KllBuf.from(bytes, k)

  override def withNewMutableAggBufferOffset(offset: Int): KllDoubleSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllDoubleSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KllDoubleSketch =
    copy(child = c)
}

/** Mutable KLL buffer: `levels(l)` holds unsorted items of weight 2^l.
  * Capacity of level l with H levels total: max(2, ceil(k * (2/3)^(H-1-l)))
  * — k at the top, geometric decay below, the standard KLL ladder.
  */
final class KllBuf(val k: Int) {
  var n: Long = 0L
  private[functions] var flips: Long = 0L
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])

  private def cap(l: Int): Int = {
    val fromTop = levels.length - 1 - l
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, fromTop)).toInt)
  }

  private def totalCap: Int = (0 until levels.length).map(cap).sum
  private def totalSize: Int = levels.map(_.length).sum

  def add(v: Double): Unit = {
    levels(0) += v
    n += 1
    if (totalSize > totalCap) compact()
  }

  /** Compact the lowest level over its capacity: sort, hold the minimum
    * back if the count is odd (exact weight preservation), promote every
    * second survivor at doubled weight. The starting parity alternates via
    * a deterministic counter — no PRNG, so retries and single-partition
    * re-runs reproduce bit-identical sketches.
    */
  private def compact(): Unit = {
    var l = 0
    while (l < levels.length && levels(l).length <= cap(l)) l += 1
    if (l >= levels.length) return
    val buf = levels(l)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    if (l + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
    val hold = sorted.length % 2 // odd: hold the min back at this level
    val offset = (flips & 1L).toInt
    flips += 1
    buf.clear()
    if (hold == 1) buf += sorted(0)
    var i = hold + offset
    val up = levels(l + 1)
    while (i < sorted.length) { up += sorted(i); i += 2 }
  }

  def mergeIn(o: KllBuf): Unit = {
    while (levels.length < o.levels.length) levels += ArrayBuffer.empty[Double]
    var l = 0
    while (l < o.levels.length) { levels(l) ++= o.levels(l); l += 1 }
    n += o.n
    flips += o.flips
    while (totalSize > totalCap) compact()
  }

  /** Flattened (value, weight) summary sorted by value. */
  def summary(): Array[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach(v => out += ((v, w)))
      l += 1
    }
    out.sortBy(_._1).toArray
  }

  def bytes(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(n)
    out.writeLong(flips)
    out.writeInt(levels.length)
    levels.foreach { lv =>
      out.writeInt(lv.length)
      lv.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }
}

object KllBuf {
  def from(bytes: Array[Byte], k: Int): KllBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new KllBuf(k)
    buf.n = in.readLong()
    buf.flips = in.readLong()
    val nl = in.readInt()
    buf.levels.clear()
    var l = 0
    while (l < nl) {
      val sz = in.readInt()
      val lv = new ArrayBuffer[Double](sz)
      var i = 0
      while (i < sz) { lv += in.readDouble(); i += 1 }
      buf.levels += lv
      l += 1
    }
    buf
  }
}

object KllSketch {
  import org.apache.spark.sql.GraftBridge

  /** Aggregate Column: struct(n, items sorted by v) — the mergeable
    * quantile summary. One bounded sketch per partition crosses the
    * shuffle; values never do.
    */
  def kll_sketch(c: Column, k: Int = 200): Column =
    GraftBridge.column(
      KllDoubleSketch(GraftBridge.expression(c), k).toAggregateExpression())

  /** Summary value at a 1-based cumulative-weight target: smallest item
    * whose running weight reaches `t` (clamped to the last item past the
    * end). A single codegen'd `aggregate` fold over the value-sorted items
    * array — no explode, no window, usable per-row against a broadcast
    * sketch, which is what makes the sketch a global-rank LOOKUP TABLE
    * rather than just a quantile answer.
    */
  def kllValueAtRank(items: Column, t: Column): Column =
    aggregate(
      items,
      struct(lit(0L).as("cum"), lit(null).cast("double").as("ans"),
        lit(null).cast("double").as("last")),
      (acc, e) => {
        val cum = acc.getField("cum") + e.getField("w")
        struct(cum.as("cum"),
          when(acc.getField("ans").isNull && cum >= t, e.getField("v"))
            .otherwise(acc.getField("ans")).as("ans"),
          e.getField("v").as("last"))
      },
      acc => coalesce(acc.getField("ans"), acc.getField("last")))

  /** Rank-quantile extraction from a sketch struct: the summary value at
    * cumulative weight ceil(p·n).
    */
  def kllQuantile(sketch: Column, p: Double): Column = {
    require(p > 0 && p <= 1, "kllQuantile: p must be in (0, 1]")
    val t = greatest(lit(1L), ceil(lit(p) * sketch.getField("n")).cast("long"))
    kllValueAtRank(sketch.getField("items"), t)
  }
}
