package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression form of the JSON type introspection (C8-C12 of
  * SURVEY §2: the reference's plpgsql is_number/is_string/is_object/
  * is_primitive helpers, GraphInitialization.cs:186-235).
  *
  * `json_type_of(doc, 'a.b')` → object|array|string|number|boolean|null,
  * SQL NULL when missing/unparseable. A real Expression (vs a Scala UDF)
  * keeps null semantics in the plan and avoids closure serialization;
  * evaluation parses with Jackson, so it stays CodegenFallback — fine off
  * the hot path, and the filter above it still prunes columns/rows first.
  */
case class JsonTypeOf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any, path: Any): Any = {
    val out = JsonFunctions.jsonTypeOf(doc.toString, path.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}
