package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text canonicalization — the normalize-before-you-hash pass every
  * dedup/decontamination pipeline runs first (CCNet/OSCAR-style): Unicode
  * NFC composition (so "é" and "é" stop being distinct fingerprint
  * universes), ASCII control characters (U+0000–U+001F, U+007F) mapped to
  * spaces, space runs collapsed, ends trimmed. C1 controls and exotic
  * Unicode spaces are left alone — the contract is exactly what the
  * DuckDB oracle can replay (`nfc_normalize` + two RE2 replaces), nothing
  * locale- or version-ambiguous.
  *
  * Single-pass after NFC; codegen-capable (kernel is a static call, the
  * enclosing WholeStageCodegen span stays intact — no CodegenFallback).
  */
case class CanonicalText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_text"

  override def nullSafeEval(input: Any): Any =
    ExprKernels.canonText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.canonText($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CanonicalText {
  import org.apache.spark.sql.GraftBridge

  def canonical_text(text: Column): Column =
    GraftBridge.column(CanonicalText(GraftBridge.expression(text)))
}
