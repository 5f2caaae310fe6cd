package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A fitted byte-pair-encoding merge table (Sennrich et al. 2016, §3.2 —
  * the public BPE algorithm every modern LM tokenizer descends from),
  * applied greedily: start from characters, repeatedly merge the
  * adjacent pair with the LOWEST merge rank until no adjacent pair is in
  * the table. Deterministic for a given merge list.
  *
  * The codec is a literal reference object on the expression (the
  * centroid/whitener discipline): the merge table rides to executors with
  * the task binaries once, encoding is a per-row scan — no join, no
  * shuffle, no per-row serialization.
  */
final class BpeCodec(val merges: Seq[(String, String)]) extends Serializable {
  require(merges.nonEmpty, "bpe_encode: need at least one merge")

  private val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Greedy encode: lowest-rank adjacent pair merges first, all its
    * occurrences left to right, until fixpoint.
    */
  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms: Array[String] = word.toCharArray.map(_.toString)
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** encode as Spark ArrayData (called from generated code) */
  def encodeArray(word: UTF8String): ArrayData =
    new GenericArrayData(encode(word.toString).map(t => UTF8String.fromString(t): Any))
}

/** bpe_encode(word) — greedy BPE segmentation under a literal merge
  * table; codegen'd, returns array&lt;string&gt;.
  */
case class BpeEncode(child: Expression, codec: BpeCodec) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(word: Any): Any =
    codec.encodeArray(word.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, classOf[BpeCodec].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = ($ref).encodeArray($v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Bpe {
  import org.apache.spark.sql.GraftBridge

  def bpe_encode(word: Column, codec: BpeCodec): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(word), codec))

  /** Classic BPE training loop over a word-frequency table (driver-side:
    * the TYPE table, thresholded by `minFreq`, is orders of magnitude
    * smaller than the token stream — the same "fit small, apply
    * distributed" shape as the k-means centroids; sentencepiece trains on
    * a corpus sample for the same reason). Ties on pair count break
    * lexicographically, so training is deterministic.
    */
  def learn(wordFreqs: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 1, "learn at least one merge")
    var words: Seq[(Array[String], Long)] =
      wordFreqs.map { case (w, f) => (w.toCharArray.map(_.toString), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += (best._1 + best._2); j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, f)
          }
        }
        round += 1
      }
    }
    merges.toSeq
  }
}
