package graft.json

import org.scalatest.funsuite.AnyFunSuite
import graft.core.ETag

class JsonSpec extends AnyFunSuite {

  test("pointer get/set/remove with $-keys and escapes") {
    val doc = Json.parse("""{"$dtId":"t1","$metadata":{"$model":"m1"},"a":{"b":[1,2]}}""")
    assert(Json.get(doc, "/$dtId").get.asText() == "t1")
    assert(Json.get(doc, "/$metadata/$model").get.asText() == "m1")
    assert(Json.get(doc, "/a/b/1").get.asInt() == 2)
    assert(Json.get(doc, "/missing").isEmpty)
    val doc2 = Json.set(doc, "/a/c", Json.text("x"))
    assert(Json.get(doc2, "/a/c").get.asText() == "x")
    assert(Json.get(doc, "/a/c").isEmpty, "set must not mutate the original")
    val doc3 = Json.remove(doc2, "/a/b")
    assert(Json.get(doc3, "/a/b").isEmpty)
    // ~0 / ~1 escapes
    val esc = Json.parse("""{"a/b":1,"c~d":2}""")
    assert(Json.get(esc, "/a~1b").get.asInt() == 1)
    assert(Json.get(esc, "/c~0d").get.asInt() == 2)
  }

  test("RFC-6902 apply: add/replace/remove/move/copy/test") {
    val doc = Json.parse("""{"a":1,"b":{"c":2}}""")
    val ops = JsonPatch.parseOps(
      """[{"op":"replace","path":"/a","value":10},
        |{"op":"add","path":"/b/d","value":[1,2]},
        |{"op":"remove","path":"/b/c"},
        |{"op":"copy","from":"/a","path":"/a2"},
        |{"op":"move","from":"/b/d","path":"/d"},
        |{"op":"test","path":"/a","value":10}]""".stripMargin)
    val out = JsonPatch.apply(doc, ops)
    assert(Json.render(Json.sortKeys(out)) == """{"a":10,"a2":10,"b":{},"d":[1,2]}""")
    val bad = JsonPatch.parseOps("""[{"op":"test","path":"/a","value":99}]""")
    assertThrows[IllegalArgumentException](JsonPatch.apply(doc, bad))
  }

  test("RFC-6902 test: numeric value-equality recurses into containers") {
    // {"a":1} must test-equal {"a":1.0} (RFC 6902 §4.6: numbers compare by
    // value at every level, not by node type)
    val doc = Json.parse("""{"o":{"a":1,"b":[2,3.0]},"n":1.50}""")
    val ok = JsonPatch.parseOps(
      """[{"op":"test","path":"/o","value":{"a":1.0,"b":[2.0,3]}},
        |{"op":"test","path":"/n","value":1.5}]""".stripMargin)
    JsonPatch.apply(doc, ok) // must not throw
    val bad = JsonPatch.parseOps(
      """[{"op":"test","path":"/o","value":{"a":1.0,"b":[2.0,4]}}]""")
    assertThrows[IllegalArgumentException](JsonPatch.apply(doc, bad))
  }

  test("RFC-6902 array semantics: add inserts, replace overwrites, bounds checked") {
    val doc = Json.parse("""{"arr":[1,2,3]}""")
    // add at existing index → INSERT before it (RFC 6902 §4.1), not overwrite
    val added = JsonPatch.apply(doc,
      JsonPatch.parseOps("""[{"op":"add","path":"/arr/1","value":9}]"""))
    assert(Json.render(added) == """{"arr":[1,9,2,3]}""")
    // add at index == size appends; '-' appends
    val appended = JsonPatch.apply(doc,
      JsonPatch.parseOps("""[{"op":"add","path":"/arr/3","value":9},
                           |{"op":"add","path":"/arr/-","value":10}]""".stripMargin))
    assert(Json.render(appended) == """{"arr":[1,2,3,9,10]}""")
    // replace overwrites in place and requires the index to exist
    val replaced = JsonPatch.apply(doc,
      JsonPatch.parseOps("""[{"op":"replace","path":"/arr/1","value":9}]"""))
    assert(Json.render(replaced) == """{"arr":[1,9,3]}""")
    assertThrows[IllegalArgumentException](JsonPatch.apply(doc,
      JsonPatch.parseOps("""[{"op":"replace","path":"/arr/3","value":9}]""")))
    assertThrows[IllegalArgumentException](JsonPatch.apply(doc,
      JsonPatch.parseOps("""[{"op":"add","path":"/arr/4","value":9}]""")))
    // move into an array index inserts (add semantics at destination)
    val moved = JsonPatch.apply(Json.parse("""{"arr":[1,2],"v":7}"""),
      JsonPatch.parseOps("""[{"op":"move","from":"/v","path":"/arr/0"}]"""))
    assert(Json.render(moved) == """{"arr":[7,1,2]}""")
    // add with a missing parent errors (RFC 6902 §4.1 — no conjured objects)
    assertThrows[IllegalArgumentException](JsonPatch.apply(doc,
      JsonPatch.parseOps("""[{"op":"add","path":"/nope/deep","value":1}]""")))
    // test compares numbers by value, not node type (RFC 6902 §4.6)
    JsonPatch.apply(Json.parse("""{"n":1}"""),
      JsonPatch.parseOps("""[{"op":"test","path":"/n","value":1.0}]"""))
  }

  test("diff is deterministic and round-trips") {
    val oldDoc = Json.parse("""{"a":1,"b":{"x":1,"y":2},"gone":true,"arr":[1,2]}""")
    val newDoc = Json.parse("""{"a":2,"b":{"x":1,"z":3},"new":"v","arr":[1,3]}""")
    val ops = JsonPatch.diff(oldDoc, newDoc)
    // deterministic order: union keys sorted, depth-first
    assert(ops.map(o => s"${o.op} ${o.path}") == Seq(
      "replace /a", "replace /arr", "remove /b/y", "add /b/z",
      "remove /gone", "add /new"))
    assert(JsonPatch.apply(oldDoc, ops) == newDoc)
    assert(JsonPatch.diff(newDoc, newDoc).isEmpty)
  }

  test("etag shape and matching (ETagGenerator.cs semantics)") {
    val e1 = ETag.generate("twin1", "2026-01-01T00:00:00Z")
    val e2 = ETag.generate("twin1", "2026-01-01T00:00:00Z")
    val e3 = ETag.generate("twin1", "2026-01-01T00:00:01Z")
    assert(e1 == e2, "same inputs → same etag")
    assert(e1 != e3)
    assert(e1.matches("""W/"[0-9a-f\-]{36}""""), s"unexpected shape: $e1")
    assert(ETag.matches("*", e1) && ETag.matches(e1, e1) && !ETag.matches(e3, e1))
  }
}
