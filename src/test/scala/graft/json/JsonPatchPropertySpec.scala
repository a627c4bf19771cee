package graft.json

import com.fasterxml.jackson.databind.JsonNode
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5 plan): for ANY pair of JSON documents,
  * `apply(old, diff(old, new)) == new` and `diff(x, x)` is empty — the
  * invariant the CDC patch derivation (E5) rests on. */
class JsonPatchPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genScalar: Gen[JsonNode] = Gen.oneOf(
    Gen.alphaNumStr.map(s => Json.parse("\"" + s + "\"")),
    Gen.chooseNum(-1000000, 1000000).map(i => Json.parse(i.toString)),
    Gen.chooseNum(-1000.0, 1000.0).map(d => Json.parse(f"$d%.4f")),
    Gen.oneOf(true, false).map(b => Json.parse(b.toString)),
    Gen.const(Json.parse("null")))

  private def genDoc(depth: Int): Gen[JsonNode] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      4 -> genScalar,
      2 -> Gen.mapOf(Gen.zip(
          Gen.oneOf("a", "b", "$meta", "x/y", "k~1", "name"),
          genDoc(depth - 1)))
        .map { m =>
          val o = Json.obj()
          m.foreach { case (k, v) => o.set[JsonNode](k, v) }
          o
        },
      1 -> Gen.listOfN(3, genDoc(depth - 1)).map { xs =>
        val a = Json.arr()
        xs.foreach(a.add)
        a
      })

  test("apply(old, diff(old, new)) == new for arbitrary documents") {
    check(Prop.forAll(genDoc(3), genDoc(3)) { (oldDoc, newDoc) =>
      JsonPatch.apply(oldDoc, JsonPatch.diff(oldDoc, newDoc)) == newDoc
    })
  }

  test("diff(x, x) is empty; diff is deterministic") {
    check(Prop.forAll(genDoc(3))(doc => JsonPatch.diff(doc, doc).isEmpty))
    check(Prop.forAll(genDoc(3), genDoc(3)) { (a, b) =>
      JsonPatch.render(JsonPatch.diff(a, b)) ==
        JsonPatch.render(JsonPatch.diff(a, b))
    })
  }

  test("pointer escaping round-trips through diff paths") {
    val oldDoc = Json.parse("""{"x/y": 1, "k~1": 2}""")
    val newDoc = Json.parse("""{"x/y": 9, "k~1": 2}""")
    val patch = JsonPatch.diff(oldDoc, newDoc)
    assert(patch.map(_.path) == Seq("/x~1y"))
    assert(JsonPatch.apply(oldDoc, patch) == newDoc)
  }

  test("malformed patch documents are typed client errors, never NPEs") {
    // the PATCH route maps IllegalArgumentException to 400; any other
    // escape (NPE on a missing member) would be a 500
    val bad = Seq(
      """[1]""",                                      // non-object op
      """[{"path": "/x"}]""",                         // missing op
      """[{"op": 3, "path": "/x"}]""",                // mistyped op
      """[{"op": "add"}]""",                          // missing path
      """[{"op": "add", "path": "/x"}]""",            // add without value
      """[{"op": "replace", "path": "/x"}]""",        // replace without value
      """[{"op": "test", "path": "/x"}]""",           // test without value
      """[{"op": "move", "path": "/x"}]""",           // move without from
      """[{"op": "copy", "path": "/x", "from": 1}]""" // mistyped from
    )
    bad.foreach { p =>
      intercept[IllegalArgumentException](JsonPatch.parseOps(p))
    }
    // a remove needs no value and still parses
    assert(JsonPatch.parseOps("""[{"op":"remove","path":"/x"}]""").size == 1)
  }

  test("fuzz: parseOps over op-shaped soup is parse-or-IllegalArgument") {
    val opSoup: org.scalacheck.Gen[String] = for {
      op <- Gen.oneOf("\"add\"", "\"remove\"", "\"move\"", "\"test\"",
        "\"frobnicate\"", "1", "null")
      path <- Gen.oneOf("\"/a\"", "\"\"", "\"nope\"", "3", "null")
      extra <- Gen.oneOf("", ",\"value\":1", ",\"from\":\"/b\"",
        ",\"value\":null,\"from\":7")
    } yield s"""[{"op":$op,"path":$path$extra}]"""
    check(Prop.forAll(opSoup) { p =>
      try { JsonPatch.parseOps(p); true }
      catch { case _: IllegalArgumentException => true }
    })
  }
}
