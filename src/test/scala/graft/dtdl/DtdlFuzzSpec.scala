package graft.dtdl

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Totality fuzz for the DTDL front door: `parseInterface` takes
  * user-uploaded model JSON and must answer Left(...), never throw —
  * the model-upload route maps Left to HTTP 400; an escape would 500. */
class DtdlFuzzSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** JSON-ish soup biased toward DTDL material: valid fragments, wrong
    * types in the right places, missing members, deep nesting. */
  private val key: Gen[String] = Gen.oneOf(
    "@id", "@type", "@context", "contents", "name", "schema", "extends",
    "enumValues", "enumValue", "valueSchema", "fields", "elementSchema",
    "mapValue", "target", "displayName", "unit", "schemas", "request")
  private val leaf: Gen[String] = Gen.oneOf(
    "\"Interface\"", "\"Property\"", "\"Relationship\"", "\"Component\"",
    "\"Telemetry\"", "\"Command\"", "\"Enum\"", "\"Object\"", "\"Array\"",
    "\"Map\"", "\"string\"", "\"integer\"", "\"dtmi:x;1\"",
    "\"dtmi:standard:schema:geospatial:point;2\"", "3", "2.5", "true",
    "null", "[]", "{}", "[1,2]", "\"\"")

  private def jsonDoc(depth: Int): Gen[String] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> Gen.listOfN(2, Gen.zip(key, jsonDoc(depth - 1)))
        .map(kvs => kvs.map { case (k, v) => s""""$k":$v""" }
          .mkString("{", ",", "}")),
      1 -> Gen.listOfN(2, jsonDoc(depth - 1))
        .map(_.mkString("[", ",", "]")))

  test("parseInterface totality: Left on garbage, never an escape") {
    check(Prop.forAll(jsonDoc(4)) { doc =>
      Dtdl.parseInterface(doc).isLeft || Dtdl.parseInterface(doc).isRight
    })
    // plus raw non-JSON strings
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      Dtdl.parseInterface(s).fold(_ => true, _ => true)
    })
  }
}
