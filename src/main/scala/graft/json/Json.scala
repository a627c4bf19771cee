package graft.json

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import scala.jdk.CollectionConverters._

/** Minimal JSON toolkit over Jackson (already on the Spark classpath).
  *
  * Covers what the reference does with System.Text.Json + Json.Patch:
  *  - parse / canonical render
  *  - JSON-pointer get/set/remove (RFC 6901)
  *  - JSON-patch apply (RFC 6902) and deterministic diff
  *
  * Reference behavior being reproduced (not copied): patch application and
  * diff in `src/AgeDigitalTwins/AgeDigitalTwinsClient.DigitalTwins.cs:592-609`
  * and `src/AgeDigitalTwins.Events/CloudEventFactory.cs:106-107` of
  * /root/reference.
  */
object Json {
  val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  def parse(s: String): JsonNode = mapper.readTree(s)

  def tryParse(s: String): Option[JsonNode] =
    try Option(mapper.readTree(s)) catch { case _: Exception => None }

  /** Compact render; object key order is insertion order (Jackson default),
    * which keeps writes deterministic for a given construction order. */
  def render(n: JsonNode): String = mapper.writeValueAsString(n)

  /** Canonical render: keys sorted recursively — used wherever two engines
    * must produce hash-identical strings. */
  def renderCanonical(n: JsonNode): String = render(sortKeys(n))

  def sortKeys(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = nf.objectNode()
      o.properties().asScala.toSeq.map(e => e.getKey -> e.getValue)
        .sortBy(_._1).foreach { case (k, v) => out.set[JsonNode](k, sortKeys(v)) }
      out
    case a: ArrayNode =>
      val out = nf.arrayNode()
      a.elements().asScala.foreach(e => out.add(sortKeys(e)))
      out
    case other => other
  }

  def obj(): ObjectNode = nf.objectNode()
  def arr(): ArrayNode = nf.arrayNode()
  def text(s: String): JsonNode = nf.textNode(s)

  // ---------------- RFC 6901 pointers ----------------

  def splitPointer(ptr: String): List[String] =
    if (ptr.isEmpty || ptr == "/") Nil
    else ptr.stripPrefix("/").split("/", -1).toList
      .map(_.replace("~1", "/").replace("~0", "~"))

  def escapeToken(t: String): String = t.replace("~", "~0").replace("/", "~1")

  def get(root: JsonNode, ptr: String): Option[JsonNode] = {
    var cur = root
    for (tok <- splitPointer(ptr)) {
      if (cur == null) return None
      cur =
        if (cur.isObject) cur.get(tok)
        else if (cur.isArray) {
          val i = try tok.toInt catch { case _: Exception => return None }
          cur.get(i)
        } else return None
    }
    Option(cur)
  }

  /** Immutable set: returns a deep-copied root with the pointer target set.
    * Intermediate objects are created as needed (like the reference's
    * agtype_set, GraphInitialization.cs:123-150). */
  def set(root: JsonNode, ptr: String, value: JsonNode): JsonNode = {
    val copy = root.deepCopy[JsonNode]()
    val toks = splitPointer(ptr)
    if (toks.isEmpty) return value
    var cur = copy
    for (tok <- toks.init) {
      cur match {
        case o: ObjectNode =>
          if (!o.has(tok) || !o.get(tok).isContainerNode) o.set[JsonNode](tok, nf.objectNode())
          cur = o.get(tok)
        case a: ArrayNode =>
          val i = tok.toInt
          cur = a.get(i)
        case _ => throw new IllegalArgumentException(s"cannot traverse $ptr at $tok")
      }
    }
    val last = toks.last
    cur match {
      case o: ObjectNode => o.set[JsonNode](last, value)
      case a: ArrayNode =>
        if (last == "-") a.add(value)
        else {
          val i = last.toInt
          if (i == a.size) a.add(value) else a.set(i, value)
        }
      case _ => throw new IllegalArgumentException(s"cannot set $ptr")
    }
    copy
  }

  /** RFC-6902 `add` semantics: like [[set]] except (a) an existing array
    * index means *insert before* (shifting elements right), not replace,
    * and (b) the PARENT container must already exist — RFC 6902 §4.1
    * forbids conjuring intermediate objects (that looser behavior is
    * [[set]]'s, kept for agtype_set-style engine writes). The reference
    * relies on a conformant Json.Patch implementation in
    * patchTwin/updateComponent (DigitalTwins.cs:592-609), so `add` and
    * `replace` must diverge on arrays and missing parents must error. */
  def insert(root: JsonNode, ptr: String, value: JsonNode): JsonNode = {
    val toks = splitPointer(ptr)
    if (toks.isEmpty) return value
    val parentPtr =
      if (toks.init.isEmpty) ""
      else toks.init.map(escapeToken).mkString("/", "/", "")
    get(root, parentPtr) match {
      case Some(_: ArrayNode) =>
        val copy = root.deepCopy[JsonNode]()
        var cur = copy
        for (tok <- toks.init) cur = cur match {
          case o: ObjectNode => o.get(tok)
          case arr: ArrayNode => arr.get(tok.toInt)
          case _ => throw new IllegalArgumentException(s"cannot traverse $ptr at $tok")
        }
        val arr = cur.asInstanceOf[ArrayNode]
        val last = toks.last
        if (last == "-") arr.add(value)
        else {
          val i = try last.toInt catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(s"bad array index '$last' in $ptr")
          }
          if (i < 0 || i > arr.size)
            throw new IllegalArgumentException(
              s"array index $i out of bounds (size ${arr.size}) at $ptr")
          if (i == arr.size) arr.add(value) else arr.insert(i, value)
        }
        copy
      case Some(_: ObjectNode) => set(root, ptr, value) // add/overwrite member
      case Some(other) => throw new IllegalArgumentException(
        s"add target parent at $parentPtr is a ${other.getNodeType}, not a container")
      case None => throw new IllegalArgumentException(
        s"add target parent $parentPtr does not exist")
    }
  }

  /** RFC-6902 `replace` semantics: like [[set]] but the target must already
    * exist (objects and array indices alike). */
  def replace(root: JsonNode, ptr: String, value: JsonNode): JsonNode = {
    if (splitPointer(ptr).nonEmpty && get(root, ptr).isEmpty)
      throw new IllegalArgumentException(s"replace target $ptr not found")
    set(root, ptr, value)
  }

  def remove(root: JsonNode, ptr: String): JsonNode = {
    val copy = root.deepCopy[JsonNode]()
    val toks = splitPointer(ptr)
    if (toks.isEmpty) return nf.objectNode()
    var cur = copy
    for (tok <- toks.init) {
      cur = cur match {
        case o: ObjectNode => o.get(tok)
        case a: ArrayNode => a.get(tok.toInt)
        case _ => null
      }
      if (cur == null) throw new IllegalArgumentException(s"path $ptr not found")
    }
    cur match {
      case o: ObjectNode =>
        if (!o.has(toks.last)) throw new IllegalArgumentException(s"path $ptr not found")
        o.remove(toks.last)
      case a: ArrayNode => a.remove(toks.last.toInt)
      case _ => throw new IllegalArgumentException(s"cannot remove $ptr")
    }
    copy
  }
}

/** One RFC-6902 operation. `value` is null for remove. */
final case class PatchOp(op: String, path: String, value: JsonNode, from: String = null) {
  def toNode: ObjectNode = {
    val o = Json.obj()
    o.put("op", op)
    o.put("path", path)
    if (from != null) o.put("from", from)
    if (value != null) o.set[JsonNode]("value", value)
    o
  }
}

object JsonPatch {

  def parseOps(patchJson: String): Seq[PatchOp] = {
    val n = Json.parse(patchJson)
    require(n.isArray, "patch must be a JSON array")
    n.elements().asScala.map { op =>
      // malformed ops (non-object element, missing/mistyped op or path)
      // must surface as the IllegalArgumentException the HTTP layer maps
      // to 400 — not a NullPointerException 500
      require(op.isObject, s"patch op must be an object, got $op")
      val opName = op.get("op")
      val path = op.get("path")
      require(opName != null && opName.isTextual, s"missing/mistyped 'op' in $op")
      require(path != null && path.isTextual, s"missing/mistyped 'path' in $op")
      val needsValue = Set("add", "replace", "test")(opName.asText())
      require(!needsValue || op.has("value"),
        s"'${opName.asText()}' op requires a 'value' member")
      val needsFrom = Set("copy", "move")(opName.asText())
      require(!needsFrom ||
          (op.get("from") != null && op.get("from").isTextual),
        s"'${opName.asText()}' op requires a textual 'from' member")
      PatchOp(
        op = opName.asText(),
        path = path.asText(),
        value = if (op.has("value")) op.get("value") else null,
        from = if (op.has("from")) op.get("from").asText() else null)
    }.toSeq
  }

  /** RFC 6902 §4.6 value equality: numbers compare by value (1 == 1.0),
    * not by JSON node type, at EVERY nesting level — a `test` against
    * {"a":1} must succeed for {"a":1.0}, so objects and arrays recurse
    * rather than falling back to Jackson structural equality. */
  private def jsonEq(a: JsonNode, b: JsonNode): Boolean =
    if (a eq b) true
    else if (a == null || b == null) false
    else if (a.isNumber && b.isNumber)
      a.decimalValue().compareTo(b.decimalValue()) == 0
    else if (a.isObject && b.isObject)
      a.size() == b.size() && a.fieldNames().asScala.forall(f =>
        b.has(f) && jsonEq(a.get(f), b.get(f)))
    else if (a.isArray && b.isArray)
      a.size() == b.size() && (0 until a.size()).forall(i =>
        jsonEq(a.get(i), b.get(i)))
    else a == b

  /** Apply RFC 6902 ops; throws on test failure / missing paths like the
    * reference's Json.Patch (DigitalTwins.cs:592-609 surfaces those errors). */
  def apply(doc: JsonNode, ops: Seq[PatchOp]): JsonNode = {
    var cur = doc
    for (op <- ops) op.op match {
      case "add" => cur = Json.insert(cur, op.path, op.value.deepCopy[JsonNode]())
      case "replace" => cur = Json.replace(cur, op.path, op.value.deepCopy[JsonNode]())
      case "remove" => cur = Json.remove(cur, op.path)
      case "copy" =>
        val v = Json.get(cur, op.from).getOrElse(
          throw new IllegalArgumentException(s"from ${op.from} not found"))
        cur = Json.insert(cur, op.path, v.deepCopy[JsonNode]())
      case "move" =>
        val v = Json.get(cur, op.from).getOrElse(
          throw new IllegalArgumentException(s"from ${op.from} not found"))
        cur = Json.remove(cur, op.from)
        cur = Json.insert(cur, op.path, v.deepCopy[JsonNode]())
      case "test" =>
        val v = Json.get(cur, op.path).orNull
        if (v == null || !jsonEq(v, op.value))
          throw new IllegalArgumentException(s"test failed at ${op.path}")
      case other => throw new IllegalArgumentException(s"unknown op $other")
    }
    cur
  }

  /** Deterministic structural diff old→new as RFC-6902 ops.
    *
    * Ordering contract (stable for golden tests, mirrors the observable
    * output of the reference's `old.CreatePatch(new)` at
    * CloudEventFactory.cs:106): walk keys of the union of old/new objects in
    * sorted order; removes, then replaces/adds, depth-first. Arrays that
    * differ are replaced wholesale (the reference's twin docs never need
    * array-element-level ops).
    */
  def diff(oldDoc: JsonNode, newDoc: JsonNode): Seq[PatchOp] = {
    val out = Seq.newBuilder[PatchOp]
    def walk(path: String, o: JsonNode, n: JsonNode): Unit = {
      if (o == n) return
      if (o != null && n != null && o.isObject && n.isObject) {
        val oldKeys = o.properties().asScala.map(_.getKey).toSet
        val newKeys = n.properties().asScala.map(_.getKey).toSet
        for (k <- (oldKeys ++ newKeys).toSeq.sorted) {
          val p = s"$path/${Json.escapeToken(k)}"
          (oldKeys.contains(k), newKeys.contains(k)) match {
            case (true, false) => out += PatchOp("remove", p, null)
            case (false, true) => out += PatchOp("add", p, n.get(k).deepCopy[JsonNode]())
            case _ => walk(p, o.get(k), n.get(k))
          }
        }
      } else if (o == null) {
        out += PatchOp("add", path, n.deepCopy[JsonNode]())
      } else if (n == null) {
        out += PatchOp("remove", path, null)
      } else {
        out += PatchOp("replace", path, n.deepCopy[JsonNode]())
      }
    }
    walk("", oldDoc, newDoc)
    out.result()
  }

  def render(ops: Seq[PatchOp]): String = {
    val a = Json.arr()
    ops.foreach(op => a.add(op.toNode))
    Json.render(a)
  }
}
