package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  *
  * Returns NULL for malformed input or non-object documents (those rows are
  * dead-lettered upstream anyway).
  */
case class JsonDropKeys(child: Expression, keys: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_drop_keys"

  @transient private lazy val mapper = new ObjectMapper()

  override def nullSafeEval(input: Any): Any = {
    try {
      mapper.readTree(input.toString) match {
        case obj: ObjectNode =>
          keys.foreach(obj.remove)
          UTF8String.fromString(mapper.writeValueAsString(obj))
        case _ => null
      }
    } catch { case _: Exception => null }
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
