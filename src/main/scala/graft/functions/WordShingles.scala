package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a document: lowercase, whitespace
  * tokenize, join each n-token window with single spaces, dedupe preserving
  * first occurrence. Fewer than n tokens -> one shingle of all tokens.
  *
  * Same output as the built-in composition
  * `array_distinct(transform(sequence(...), i => concat_ws(" ", slice(toks, i+1, n))))`
  * but single-pass: the HOF chain is interpreted per element (slice allocates
  * a sub-array per window) and dominated MinHash/Jaccard runtime.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim.toLowerCase
    val toks = text.split("\\s+")
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.length < n) {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordShingles {
  import org.apache.spark.sql.GraftBridge

  def word_shingles(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))
}
