package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.json.Json

/** Type introspection over JSON documents — the engine-side equivalent of
  * the reference's plpgsql helpers `is_number`/`is_string`/`is_object`/
  * `is_primitive` (/root/reference/src/AgeDigitalTwins/
  * GraphInitialization.cs:186-235), which sniff agtype values.
  *
  * `get_json_object` erases the distinction between `"1"` and `1`, so the
  * type checks parse the doc with Jackson inside the native [[JsonTypeOf]]
  * expression — codegen'd, no ScalaUDF serialization, and the filter above
  * it still prunes columns/rows first.
  */
object JsonFunctions {

  /** JSON type at a dotted path: object|array|string|number|boolean|null,
    * or NULL (SQL) when the path is missing. */
  val jsonTypeOf: (String, String) => String = (doc: String, path: String) => {
    if (doc == null) null
    else Json.tryParse(doc) match {
      case None => null
      case Some(root) =>
        var cur = root
        var ok = true
        for (tok <- path.split("\\.") if ok && tok.nonEmpty) {
          if (cur != null && cur.isObject && cur.has(tok)) cur = cur.get(tok)
          else { ok = false; cur = null }
        }
        if (!ok || cur == null) null
        else if (cur.isObject) "object"
        else if (cur.isArray) "array"
        else if (cur.isTextual) "string"
        else if (cur.isNumber) "number"
        else if (cur.isBoolean) "boolean"
        else if (cur.isNull) "null"
        else null
    }
  }

  def json_type_of(doc: Column, path: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(JsonTypeOf(ColumnBridge.expression(doc),
      ColumnBridge.expression(lit(path))))
  }

  // Total booleans, never SQL NULL: the reference's plpgsql helpers
  // RETURN false on null/missing agtype values (EXCEPTION ... RETURN
  // false, GraphInitialization.cs:186-235), so `NOT IS_PRIMITIVE(x)` must
  // keep rows where x is undefined — three-valued NULL would drop them.
  private def typeIs(doc: Column, path: String, t: String): Column =
    coalesce(json_type_of(doc, path) === t, lit(false))

  def is_number(doc: Column, path: String): Column = typeIs(doc, path, "number")
  def is_string(doc: Column, path: String): Column = typeIs(doc, path, "string")
  def is_object(doc: Column, path: String): Column = typeIs(doc, path, "object")
  def is_bool_strict(doc: Column, path: String): Column =
    typeIs(doc, path, "boolean")
  def is_primitive(doc: Column, path: String): Column =
    coalesce(json_type_of(doc, path).isin("string", "number", "boolean"),
      lit(false))
}
