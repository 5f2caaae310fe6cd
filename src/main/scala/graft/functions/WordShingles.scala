package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a document: lowercase, whitespace
  * tokenize, join each n-token window with single spaces, dedupe preserving
  * first occurrence. Fewer than n tokens -> one shingle of all tokens.
  *
  * Same output as the built-in composition
  * `array_distinct(transform(sequence(...), i => concat_ws(" ", slice(toks, i+1, n))))`
  * but single-pass: the HOF chain is interpreted per element (slice allocates
  * a sub-array per window) and dominated MinHash/Jaccard runtime. Kernel in
  * [[ExprKernels.shingles]]; codegen emits the same static call.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.shingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordShingles {
  import org.apache.spark.sql.GraftBridge

  def word_shingles(text: Column, n: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(text), n))
}
