package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Removes a fixed set of top-level keys from a JSON object, preserving the
  * types and order of the remaining fields exactly.
  *
  * This is the "pop promoted fields + ignore-list from the payload" operator
  * (reference: venus/db/write.py:41-52,65-67). It cannot be composed from
  * built-ins without losing value types (a MAP<STRING,STRING> round-trip
  * stringifies numbers/booleans, breaking the reference's contract that the
  * retained payload keeps e.g. `random_timing_data` as a double —
  * reference: tests/test_sender.py:133-136), hence a custom Expression.
  * Kernel in [[ExprKernels.jsonDropKeys]]; codegen-capable (it sits in the
  * per-record ingest hot path).
  *
  * Returns NULL for malformed input or non-object documents (those rows are
  * dead-lettered upstream anyway).
  */
case class JsonDropKeys(child: Expression, keys: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_drop_keys"

  private lazy val keysArray: Array[String] = keys.toArray

  override def nullSafeEval(input: Any): Any =
    ExprKernels.jsonDropKeys(input.asInstanceOf[UTF8String], keysArray)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the key list is a reference object: embedded once per generated class,
    // not re-built per row
    val keysRef = ctx.addReferenceObj("dropKeys", keysArray, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ExprKernels.jsonDropKeys($c, $keysRef);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object JsonFunctions {
  import org.apache.spark.sql.GraftBridge

  /** `json_drop_keys(col, keys)` as a Column. */
  def json_drop_keys(json: Column, keys: Seq[String]): Column =
    GraftBridge.column(JsonDropKeys(GraftBridge.expression(json), keys))
}
