package graft.dtdl

import org.scalatest.funsuite.AnyFunSuite
import graft.json.Json

/** DTDLParser conformance beyond the exercised-subset core: semantic
  * (quantitative) co-types with unit validation, and interface-level
  * `schemas` definitions referenced by @id. The semantic-type shape is the
  * reference's own sample — `["Property","Humidity"]` with
  * `"unit":"gramPerCubicMetre"` under the quantitativeTypes extension
  * context (reference AgeDigitalTwins.Test/SampleData.cs:37-41). */
class DtdlSemanticsSpec extends AnyFunSuite {

  private def parse(json: String) = Dtdl.parseInterface(json)

  // ---------- semantic types + units ----------

  test("the reference's Humidity sample parses and validates numerically") {
    val m = parse(
      """{"@id":"dtmi:g:room;1","@type":"Interface",
        |  "@context":["dtmi:dtdl:context;3","dtmi:dtdl:extension:quantitativeTypes;1"],
        |  "contents":[
        |    {"@type":["Property","Humidity"],"name":"humidity",
        |     "schema":"double","unit":"gramPerCubicMetre"}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:room;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"r","$metadata":{"$model":"dtmi:g:room;1"},"humidity":0.5}""")
    assert(reg.validateTwin(ok).isRight)
    val bad = Json.parse(
      """{"$dtId":"r","$metadata":{"$model":"dtmi:g:room;1"},"humidity":"wet"}""")
    assert(reg.validateTwin(bad).isLeft, "string for a double-schema property")
  }

  test("a unit outside the quantity kind's unit set is a model error") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":["Property","Temperature"],"name":"t",
        |   "schema":"double","unit":"gramPerCubicMetre"}]}""".stripMargin)
    assert(m.isLeft)
    assert(m.swap.toOption.get.contains("not valid for semantic type"))
  }

  test("a quantitative co-type requires a unit") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":["Property","Temperature"],"name":"t","schema":"double"}]}""".stripMargin)
    assert(m.isLeft)
    assert(m.swap.toOption.get.contains("no unit"))
  }

  test("a unit without a quantitative co-type is a model error") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"t","schema":"double","unit":"kelvin"}]}""".stripMargin)
    assert(m.isLeft)
    assert(m.swap.toOption.get.contains("without a quantitative"))
  }

  test("a quantitative co-type demands a numeric schema") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":["Property","Temperature"],"name":"t",
        |   "schema":"string","unit":"kelvin"}]}""".stripMargin)
    assert(m.isLeft)
    assert(m.swap.toOption.get.contains("numeric schema"))
  }

  test("unrecognized adjunct co-types pass through untouched") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":["Property","Initialized"],"name":"t","schema":"boolean"}]}""".stripMargin)
    assert(m.isRight, m)
  }

  test("full quantity-kind table: Force/Torque/Resistance/Latitude validate") {
    for ((kind, unit) <- Seq("Force" -> "newton", "Torque" -> "newtonMetre",
        "Resistance" -> "ohm", "Latitude" -> "degreeOfArc",
        "Density" -> "kilogramPerCubicMetre", "Capacitance" -> "microfarad")) {
      val m = parse(
        s"""{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
           |  {"@type":["Property","$kind"],"name":"x",
           |   "schema":"double","unit":"$unit"}]}""".stripMargin)
      assert(m.isRight, s"$kind/$unit rejected: $m")
    }
  }

  test("an unknown adjunct co-type with a unit passes through (fwd compat)") {
    // A quantity kind newer than our table (or another extension entirely)
    // must not be rejected just because it declares a mandatory unit.
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":["Property","ApparentEnergy"],"name":"x",
        |   "schema":"double","unit":"voltAmpereHour"}]}""".stripMargin)
    assert(m.isRight, m)
    // ...but a unit with ONLY the structural type is still an error.
    val bare = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"x","schema":"double","unit":"kelvin"}]}""".stripMargin)
    assert(bare.isLeft)
  }

  test("semantic types on Telemetry contents are validated too") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":["Telemetry","Temperature"],"name":"t",
        |   "schema":"double","unit":"degreeCelsius"}]}""".stripMargin)
    assert(m.isRight, m)
    val bad = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":["Telemetry","Temperature"],"name":"t",
        |   "schema":"double","unit":"watt"}]}""".stripMargin)
    assert(bad.isLeft)
  }

  // ---------- interface-level `schemas` reuse ----------

  test("a schemas-defined Object is referencable from multiple properties") {
    val m = parse(
      """{"@id":"dtmi:g:geo;1","@type":"Interface",
        |  "schemas":[
        |    {"@id":"dtmi:g:point;1","@type":"Object","fields":[
        |      {"name":"x","schema":"double"},{"name":"y","schema":"double"}]}],
        |  "contents":[
        |    {"@type":"Property","name":"origin","schema":"dtmi:g:point;1"},
        |    {"@type":"Property","name":"corner","schema":"dtmi:g:point;1"}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:geo;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"g","$metadata":{"$model":"dtmi:g:geo;1"},
        |  "origin":{"x":0.0,"y":0.0},"corner":{"x":1.5,"y":2.5}}""".stripMargin)
    assert(reg.validateTwin(ok).isRight)
    val bad = Json.parse(
      """{"$dtId":"g","$metadata":{"$model":"dtmi:g:geo;1"},
        |  "origin":{"x":0.0,"z":9.9}}""".stripMargin)
    assert(reg.validateTwin(bad).isLeft, "'z' is not a field of the shared schema")
  }

  test("schema definitions may reference each other in any order") {
    val m = parse(
      """{"@id":"dtmi:g:nest;1","@type":"Interface",
        |  "schemas":[
        |    {"@id":"dtmi:g:ring;1","@type":"Array","elementSchema":"dtmi:g:pt;1"},
        |    {"@id":"dtmi:g:pt;1","@type":"Object","fields":[
        |      {"name":"x","schema":"double"},{"name":"y","schema":"double"}]}],
        |  "contents":[
        |    {"@type":"Property","name":"boundary","schema":"dtmi:g:ring;1"}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:nest;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"n","$metadata":{"$model":"dtmi:g:nest;1"},
        |  "boundary":[{"x":0.0,"y":0.0},{"x":1.0,"y":0.0}]}""".stripMargin)
    assert(reg.validateTwin(ok).isRight)
    val bad = Json.parse(
      """{"$dtId":"n","$metadata":{"$model":"dtmi:g:nest;1"},
        |  "boundary":[{"x":0.0,"y":"zero"}]}""".stripMargin)
    assert(reg.validateTwin(bad).isLeft)
  }

  test("a dangling schema reference fails the model, not the instance") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"p","schema":"dtmi:g:missing;1"}]}""".stripMargin)
    assert(m.isLeft)
    assert(m.swap.toOption.get.contains("undefined schema"))
  }

  test("a dangling reference nested in an inline schema fails the model too") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"boundary",
        |   "schema":{"@type":"Array","elementSchema":"dtmi:g:missing;1"}}]}""".stripMargin)
    assert(m.isLeft)
    assert(m.swap.toOption.get.contains("undefined schema"))
  }

  test("cyclic schema definitions are rejected") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface",
        |  "schemas":[
        |    {"@id":"dtmi:g:a;1","@type":"Array","elementSchema":"dtmi:g:b;1"},
        |    {"@id":"dtmi:g:b;1","@type":"Array","elementSchema":"dtmi:g:a;1"}],
        |  "contents":[
        |    {"@type":"Property","name":"p","schema":"dtmi:g:a;1"}]}""".stripMargin)
    assert(m.isLeft)
    assert(m.swap.toOption.get.contains("unresolvable"))
  }

  test("a reused Enum schema validates membership") {
    val m = parse(
      """{"@id":"dtmi:g:s;1","@type":"Interface",
        |  "schemas":[
        |    {"@id":"dtmi:g:state;1","@type":"Enum","valueSchema":"string",
        |     "enumValues":[
        |       {"name":"on","enumValue":"on"},{"name":"off","enumValue":"off"}]}],
        |  "contents":[
        |    {"@type":"Property","name":"s1","schema":"dtmi:g:state;1"},
        |    {"@type":"Property","name":"s2","schema":"dtmi:g:state;1"}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:s;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:s;1"},"s1":"on","s2":"off"}""")
    assert(reg.validateTwin(ok).isRight)
    val bad = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:s;1"},"s1":"standby"}""")
    assert(reg.validateTwin(bad).isLeft)
  }
}
