package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score, id) pairs — the batch-retrieval
  * workhorse: `groupBy(query_id).agg(top_k_pairs(struct(score, id), k))`
  * keeps only k entries per group IN EVERY PARTIAL BUFFER, so the shuffle
  * after map-side aggregation carries k rows per (partition, query) instead
  * of the full scored cross product. At 100 TB corpus x thousands of
  * queries this is the difference between shuffling k*|Q|*partitions rows
  * and shuffling |corpus|*|Q| rows (Spark's window row_number() path does
  * the latter — it has no partial pruning).
  *
  * Ordering is the total order (score desc, id asc): ties are impossible
  * to observe nondeterministically, merges commute, and `eval` emits the
  * sorted array — deterministic across retries/partitionings.
  */
case class TopKPairs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]]
  with UnaryLike[Expression] {

  require(k > 0, "top_k_pairs: k must be positive")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StructType(Array(a, b)) if a.dataType == DoubleType && b.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_k_pairs requires STRUCT<DOUBLE, BIGINT>, got ${other.sql}")
    }

  override def prettyName: String = "top_k_pairs"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))

  // heap entries are [scoreBits, id]; the root is the WORST kept pair under
  // (score asc, id desc), so a new pair replaces it iff strictly better
  private def better(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 > s2 || (s1 == s2 && id1 < id2)

  private def comparator: java.util.Comparator[Array[Long]] =
    (a: Array[Long], b: Array[Long]) => {
      val sa = java.lang.Double.longBitsToDouble(a(0))
      val sb = java.lang.Double.longBitsToDouble(b(0))
      if (sa != sb) java.lang.Double.compare(sa, sb)
      else java.lang.Long.compare(b(1), a(1))
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] =
    new java.util.PriorityQueue[Array[Long]](k + 1, comparator)

  private def offer(
      buf: java.util.PriorityQueue[Array[Long]],
      score: Double, id: Long): Unit = {
    if (buf.size < k) {
      buf.offer(Array(java.lang.Double.doubleToLongBits(score), id))
    } else {
      val worst = buf.peek()
      if (better(score, id, java.lang.Double.longBitsToDouble(worst(0)), worst(1))) {
        buf.poll()
        buf.offer(Array(java.lang.Double.doubleToLongBits(score), id))
      }
    }
  }

  override def update(
      buf: java.util.PriorityQueue[Array[Long]],
      input: InternalRow): java.util.PriorityQueue[Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        offer(buf, row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(
      b1: java.util.PriorityQueue[Array[Long]],
      b2: java.util.PriorityQueue[Array[Long]]): java.util.PriorityQueue[Array[Long]] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(b1, java.lang.Double.longBitsToDouble(e(0)), e(1))
    }
    b1
  }

  override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any = {
    val arr = new Array[(Double, Long)](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (java.lang.Double.longBitsToDouble(e(0)), e(1))
      i += 1
    }
    // best first: score desc, id asc
    val sorted = arr.sortBy { case (s, id) => (-s, id) }
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(id, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e(0)); bb.putLong(e(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.offer(Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): TopKPairs =
    copy(child = c)
}

object TopKPairs {
  import org.apache.spark.sql.GraftBridge

  /** Aggregate Column: array<struct<id, score>> of the k best pairs by
    * (score desc, id asc). Input must be struct(score: double, id: long).
    */
  def top_k_pairs(pair: Column, k: Int): Column =
    GraftBridge.column(
      TopKPairs(GraftBridge.expression(pair), k).toAggregateExpression())
}
