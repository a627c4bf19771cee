package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression form of the JSON type introspection (C8-C12 of
  * SURVEY §2: the reference's plpgsql is_number/is_string/is_object/
  * is_primitive helpers, GraphInitialization.cs:186-235).
  *
  * `json_type_of(doc, 'a.b')` → object|array|string|number|boolean|null,
  * SQL NULL when missing/unparseable. A real Expression (vs a Scala UDF)
  * keeps null semantics in the plan and avoids closure serialization; the
  * generated code calls the static kernel directly, so a typed filter
  * stays inside whole-stage codegen instead of splitting the stage at a
  * CodegenFallback/ScalaUDF boundary — this sits on the C8-C12 filter
  * path, which at 100 TB is a full-scan predicate.
  */
case class JsonTypeOf(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(doc: Any, path: Any): Any =
    JsonTypeOf.typeOfStatic(doc.asInstanceOf[UTF8String],
      path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (doc, path) =>
      s"""
         |${ev.value} = graft.functions.JsonTypeOf.typeOfStatic($doc, $path);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

object JsonTypeOf {
  /** Static kernel shared by interpreted eval and generated code. */
  def typeOfStatic(doc: UTF8String, path: UTF8String): UTF8String = {
    if (doc == null || path == null) return null
    val out = JsonFunctions.jsonTypeOf(doc.toString, path.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}
