package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a custom `TypedImperativeAggregate` —
  * the "sketch aggregate" slot SURVEY §4.3 deferred (the reference has no
  * approximate aggregates at all; Spark ships HLL/quantile sketches but no
  * frequent-items aggregate with mergeable state).
  *
  * Classic guarantees (public algorithm, Misra & Gries 1982): with k
  * counters over n rows, every key with true frequency > n/(k+1) is
  * retained, and each estimate undercounts by at most n/(k+1). When the
  * distinct-key count never exceeds k the counts are EXACT — which is what
  * the oracle query pins (5 event types, k=8).
  *
  * Scale shape: the buffer is a bounded k-entry map regardless of input
  * size; partial aggregation runs map-side and `merge` combines partials
  * pairwise (sum counters, then fold back down to k by subtracting the
  * (k+1)-th largest count — the standard mergeable-MG construction, which
  * preserves the error bound). One pass, one tiny shuffle row per
  * partition: the 100 TB frequent-items answer.
  *
  * Determinism: `eval` emits entries sorted by (count desc, key asc). The
  * update path's eviction depends on arrival order (inherent to MG), so
  * cross-run determinism is guaranteed when keys fit in k (exact regime) —
  * the regime the gate exercises; the error-bound property is spec-tested
  * in the eviction regime.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "misra_gries: k must be positive")

  // declare the string input contract so misra_gries(user_id, 8) fails at
  // ANALYSIS time instead of a mid-job ClassCastException
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a STRING key column, got ${child.dataType.sql}")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("est_count", LongType))))

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.getOrDefault(key, 0L)
      if (cur > 0 || buf.size < k) buf.put(key, cur + 1L)
      else {
        // full and key absent: decrement every counter (the MG step that
        // charges this occurrence against one of each retained key)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[String, Long],
      b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b2.forEach { (key, cnt) =>
      b1.put(key, b1.getOrDefault(key, 0L) + cnt)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everyone, drop <= 0 —
      // deterministic regardless of merge order
      val counts = new Array[Long](b1.size)
      var i = 0
      b1.forEach { (_, c) => counts(i) = c; i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(b1.size - (k + 1))
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    buf.forEach { (key, c) => entries(i) = (key, c); i += 1 }
    val sorted = entries.sortBy { case (key, c) => (-c, key) }
    new GenericArrayData(sorted.map { case (key, c) =>
      InternalRow(UTF8String.fromString(key), c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (key, c) =>
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGries =
    copy(child = c)
}

object HeavyHitters {
  import org.apache.spark.sql.GraftBridge

  /** Aggregate Column: array<struct<key, est_count>> of ~top-k keys. */
  def heavy_hitters(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGries(GraftBridge.expression(c), k).toAggregateExpression())
}
