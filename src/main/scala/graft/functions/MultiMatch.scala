package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Aho–Corasick automaton over a fixed pattern set (Aho & Corasick, CACM
  * 1975 — public algorithm). One scan of the text finds every occurrence of
  * every pattern: O(len(text) + matches) per row, independent of the number
  * of patterns.
  *
  * Why it exists: blocklist / watchword filtering over a large corpus
  * (reference's search surface is per-pattern ILIKE, README.rst:96-99 —
  * fine for a handful of patterns, O(patterns × len) when a curation
  * blocklist has thousands of entries). The automaton is built ONCE per
  * expression instance on each executor (a few hundred KB for a 10k-entry
  * blocklist) and referenced from generated code — nothing per-row but the
  * scan itself, and nothing shuffles: the filter stays map-side.
  *
  * Patterns are deduplicated and sorted at construction, so the matched
  * subset comes back in lexicographic order deterministically.
  */
final class AhoCorasick(rawPatterns: Seq[String]) extends Serializable {
  private val patterns: Array[String] =
    rawPatterns.filter(_.nonEmpty).distinct.sorted.toArray

  require(patterns.nonEmpty, "multi_match: need at least one non-empty pattern")

  // trie with HashMap transitions (pattern alphabets are tiny relative to
  // Char); fail links and an output bitset per node, classic construction
  private val children = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
  private val outputs = mutable.ArrayBuffer(List.empty[Int])
  private val fail = mutable.ArrayBuffer(0)

  patterns.zipWithIndex.foreach { case (p, idx) =>
    var node = 0
    p.foreach { ch =>
      node = children(node).getOrElseUpdate(ch, {
        children += mutable.HashMap.empty[Char, Int]
        outputs += Nil
        fail += 0
        children.size - 1
      })
    }
    outputs(node) = idx :: outputs(node)
  }

  locally { // BFS fail-link construction
    val queue = mutable.Queue.empty[Int]
    children(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = children(f).get(ch).filter(_ != v).getOrElse(0)
        outputs(v) = outputs(v) ++ outputs(fail(v))
        queue.enqueue(v)
      }
    }
  }

  @transient private lazy val utf8Patterns: Array[UTF8String] =
    patterns.map(UTF8String.fromString)

  /** Matched pattern strings, lexicographically sorted, as Spark ArrayData.
    * Never null: no matches is an empty array.
    */
  def matchArray(text: UTF8String): ArrayData = {
    val s = text.toString
    val hit = new Array[Boolean](patterns.length)
    var hits = 0
    var node = 0
    var i = 0
    val n = s.length
    while (i < n && hits < patterns.length) {
      val ch = s.charAt(i)
      while (node != 0 && !children(node).contains(ch)) node = fail(node)
      node = children(node).getOrElse(ch, 0)
      var out = outputs(node)
      while (out.nonEmpty) {
        if (!hit(out.head)) { hit(out.head) = true; hits += 1 }
        out = out.tail
      }
      i += 1
    }
    val res = new Array[Any](hits)
    var j = 0
    var k = 0
    while (j < patterns.length) {
      if (hit(j)) { res(k) = utf8Patterns(j); k += 1 }
      j += 1
    }
    new GenericArrayData(res)
  }
}

/** multi_match(text, p1, p2, ...) — the lexicographically-sorted subset of
  * the literal pattern set occurring (as substrings) in `text`; empty array
  * when none match, NULL on NULL text.
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_match"
  override def nullable: Boolean = child.nullable

  @transient private lazy val ac = new AhoCorasick(patterns)

  override def nullSafeEval(input: Any): Any =
    ac.matchArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("multiMatchAc", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $acRef.matchArray($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MultiMatch {
  import org.apache.spark.sql.GraftBridge

  def multi_match(text: Column, patterns: Seq[String]): Column =
    GraftBridge.column(MultiMatch(GraftBridge.expression(text), patterns))
}
