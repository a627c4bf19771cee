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

  // ---------- reference sample-data conformance (1:1 named tests) ----------

  /** SampleData.cs Room (lines 7-72): inline nested Object `wall_size`
    * {width,height,depth: double} beside quantitative-typed temperature/
    * humidity and a Relationship. The twin-side scenarios mirror
    * DigitalTwinsTests.CreateOrReplaceDigitalTwinAsync_InvalidProperty_
    * ValidationFailedException. */
  private val roomModel =
    """{"@id":"dtmi:com:adt:dtsample:room;1","@type":"Interface",
      |  "@context":["dtmi:dtdl:context;3","dtmi:dtdl:extension:quantitativeTypes;1"],
      |  "contents":[
      |    {"@type":"Property","name":"name","schema":"string"},
      |    {"@type":"Property","name":"exitDoor","schema":"string"},
      |    {"@type":"Property","name":"temperature","schema":"double"},
      |    {"@type":["Property","Humidity"],"name":"humidity",
      |     "schema":"double","unit":"gramPerCubicMetre"},
      |    {"@type":"Property","name":"wall_size","schema":{
      |      "@type":"Object","fields":[
      |        {"name":"width","schema":"double"},
      |        {"name":"height","schema":"double"},
      |        {"name":"depth","schema":"double"}]}},
      |    {"@type":"Relationship","name":"rel_has_sensors",
      |     "@id":"dtmi:com:adt:dtsample:room:rel_has_sensors;1"}]}""".stripMargin

  test("SampleData Room: nested Object wall_size validates field-by-field") {
    val m = parse(roomModel)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:com:adt:dtsample:room;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"room1","$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},
        |  "name":"Room 1","temperature":22.5,"humidity":0.6,
        |  "wall_size":{"width":4.0,"height":2.5,"depth":6.0}}""".stripMargin)
    assert(reg.validateTwin(ok).isRight)
    val badType = Json.parse(
      """{"$dtId":"room1","$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},
        |  "wall_size":{"width":"wide","height":2.5,"depth":6.0}}""".stripMargin)
    val e1 = reg.validateTwin(badType)
    assert(e1.isLeft && e1.swap.toOption.get.contains("wall_size"),
      s"nested field type error must name the property: $e1")
    val badField = Json.parse(
      """{"$dtId":"room1","$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},
        |  "wall_size":{"width":4.0,"slope":1.0}}""".stripMargin)
    assert(reg.validateTwin(badField).isLeft,
      "'slope' is not a field of the inline Object schema")
  }

  test("CreateOrReplaceDigitalTwinAsync_InvalidProperty: ALL offending properties named") {
    // DigitalTwinsTests.cs:117-138 — Crater twin with an undefined 'test'
    // AND a mistyped 'diameter'; the reference asserts the single error
    // message mentions BOTH, so validation must accumulate, not
    // short-circuit on the first bad property.
    val crater = parse(
      """{"@id":"dtmi:com:contoso:Crater;1","@type":"Interface",
        |  "@context":"dtmi:dtdl:context;3","contents":[
        |    {"@type":"Property","name":"diameter","schema":"double"},
        |    {"@type":"Property","name":"depth","schema":"double"},
        |    {"@type":"Property","name":"age","schema":"double"}]}""".stripMargin)
    assert(crater.isRight, crater)
    val reg = ModelRegistry(Map("dtmi:com:contoso:Crater;1" -> crater.toOption.get))
    val bad = Json.parse(
      """{"$dtId":"invalidtwin",
        |  "$metadata":{"$model":"dtmi:com:contoso:Crater;1"},
        |  "test":"test","diameter":"foo"}""".stripMargin)
    val err = reg.validateTwin(bad).swap.toOption.get
    assert(err.contains("test"), s"must name the undefined property: $err")
    assert(err.contains("diameter"), s"must name the mistyped property: $err")
    // model-not-found is its own error, before any property check
    // (CreateOrReplaceDigitalTwinAsync_InvalidModel_ThrowsModelNotFound)
    val orphan = Json.parse(
      """{"$dtId":"t","$metadata":{"$model":"dtmi:com:notfound;1"},"test":1}""")
    assert(reg.validateTwin(orphan).swap.toOption.get
      .contains("dtmi:com:notfound;1 does not exist"))
  }

  test("ComponentsTests thermostat: component values validate against the component model") {
    // GetComponentAsync_ShouldReturnComponent_WhenComponentExists /
    // UpdateComponentAsync_ShouldThrowException_WhenComponentDoesNotExist
    // (ComponentsTests.cs:23-100,269): TestDevice has Component
    // 'thermostat' of model Thermostat; component docs carry their own
    // $metadata which validation must skip.
    val device = parse(
      """{"@id":"dtmi:example:TestDevice;1","@type":"Interface",
        |  "@context":"dtmi:dtdl:context;3","contents":[
        |    {"@type":"Component","name":"thermostat",
        |     "schema":"dtmi:example:Thermostat;1"}]}""".stripMargin)
    val thermo = parse(
      """{"@id":"dtmi:example:Thermostat;1","@type":"Interface",
        |  "@context":"dtmi:dtdl:context;3","contents":[
        |    {"@type":"Property","name":"temperature","schema":"double"},
        |    {"@type":"Property","name":"targetTemperature","schema":"double"}]}""".stripMargin)
    assert(device.isRight && thermo.isRight, (device, thermo))
    val reg = ModelRegistry(Map(
      "dtmi:example:TestDevice;1" -> device.toOption.get,
      "dtmi:example:Thermostat;1" -> thermo.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"test-twin-components-1",
        |  "$metadata":{"$model":"dtmi:example:TestDevice;1"},
        |  "thermostat":{"temperature":23.5,"targetTemperature":20.0,
        |    "$metadata":{"$lastUpdateTime":"2024-01-01T00:00:00Z"}}}""".stripMargin)
    assert(reg.validateTwin(ok).isRight)
    assert(reg.componentModel("dtmi:example:TestDevice;1", "thermostat")
      .contains("dtmi:example:Thermostat;1"))
    val badProp = Json.parse(
      """{"$dtId":"t","$metadata":{"$model":"dtmi:example:TestDevice;1"},
        |  "thermostat":{"fanSpeed":3}}""".stripMargin)
    assert(reg.validateTwin(badProp).swap.toOption.get
      .contains("not defined in the model dtmi:example:Thermostat;1"))
    val notObject = Json.parse(
      """{"$dtId":"t","$metadata":{"$model":"dtmi:example:TestDevice;1"},
        |  "thermostat":21.0}""".stripMargin)
    assert(reg.validateTwin(notObject).swap.toOption.get
      .contains("must be an object"))
  }

  test("SampleData Planet family: inheritance chain + relationship properties + Component") {
    // SampleData.cs:124-232 (CelestialBody/Planet/Moon/HabitablePlanet/
    // Crater) — the model set behind ModelsTests.CreateModels_Descendants
    // AndBasesStoredCorrectly and RelationshipsTests.UpdateRelationship
    // Async_SatellitesDistance: 'satellites' declares a Distance property
    // (which the reference stores but does not schema-check — parse must
    // accept it), 'deepCraters' is a Component, and HabitablePlanet
    // inherits name/mass through two extends levels.
    val celestial = parse(
      """{"@id":"dtmi:com:contoso:CelestialBody;1","@type":"Interface",
        |  "@context":"dtmi:dtdl:context;3","contents":[
        |    {"@type":"Property","name":"name","schema":"string"},
        |    {"@type":"Property","name":"mass","schema":"double"},
        |    {"@type":"Property","name":"temperature","schema":"double"},
        |    {"@type":"Relationship","name":"orbits",
        |     "target":"dtmi:com:contoso:CelestialBody;1"}]}""".stripMargin)
    val planet = parse(
      """{"@id":"dtmi:com:contoso:Planet;1","@type":"Interface",
        |  "@context":"dtmi:dtdl:context;3",
        |  "extends":"dtmi:com:contoso:CelestialBody;1","contents":[
        |    {"@type":"Relationship","name":"satellites",
        |     "target":"dtmi:com:contoso:Moon;1",
        |     "properties":[
        |       {"@type":"Property","name":"Distance","schema":"double"}]},
        |    {"@type":"Component","name":"deepCraters",
        |     "schema":"dtmi:com:contoso:Crater;1"},
        |    {"@type":"Property","name":"hasLife","schema":"boolean"}]}""".stripMargin)
    val moon = parse(
      """{"@id":"dtmi:com:contoso:Moon;1","@type":"Interface",
        |  "@context":"dtmi:dtdl:context;3",
        |  "extends":"dtmi:com:contoso:CelestialBody;1"}""".stripMargin)
    val habitable = parse(
      """{"@id":"dtmi:com:contoso:HabitablePlanet;1","@type":"Interface",
        |  "@context":"dtmi:dtdl:context;3",
        |  "extends":"dtmi:com:contoso:Planet;1"}""".stripMargin)
    val crater = parse(
      """{"@id":"dtmi:com:contoso:Crater;1","@type":"Interface",
        |  "@context":"dtmi:dtdl:context;3","contents":[
        |    {"@type":"Property","name":"diameter","schema":"double"}]}""".stripMargin)
    for (m <- Seq(celestial, planet, moon, habitable, crater))
      assert(m.isRight, m)
    val reg = ModelRegistry(Seq(celestial, planet, moon, habitable, crater)
      .map(_.toOption.get).map(i => i.id -> i).toMap)
    // bases/descendants closure (ModelsTests.CreateModels_Descendants...)
    assert(reg.bases("dtmi:com:contoso:HabitablePlanet;1") ==
      Seq("dtmi:com:contoso:Planet;1", "dtmi:com:contoso:CelestialBody;1"))
    assert(reg.descendants("dtmi:com:contoso:CelestialBody;1").toSet ==
      Set("dtmi:com:contoso:Planet;1", "dtmi:com:contoso:Moon;1",
        "dtmi:com:contoso:HabitablePlanet;1"))
    // relationships inherit: a HabitablePlanet still orbits and has moons
    assert(reg.hasRelationship("dtmi:com:contoso:HabitablePlanet;1", "satellites"))
    assert(reg.hasRelationship("dtmi:com:contoso:HabitablePlanet;1", "orbits"))
    // a twin of the leaf model validates properties from every level
    val ok = Json.parse(
      """{"$dtId":"earth",
        |  "$metadata":{"$model":"dtmi:com:contoso:HabitablePlanet;1"},
        |  "name":"Earth","mass":5.97e24,"hasLife":true,
        |  "deepCraters":{"diameter":1.2}}""".stripMargin)
    assert(reg.validateTwin(ok).isRight)
    val bad = Json.parse(
      """{"$dtId":"earth",
        |  "$metadata":{"$model":"dtmi:com:contoso:HabitablePlanet;1"},
        |  "name":"Earth","mass":"heavy"}""".stripMargin)
    assert(reg.validateTwin(bad).swap.toOption.get.contains("mass"),
      "inherited property types are enforced through the chain")
  }

  test("a Map schema validates values under arbitrary keys") {
    val m = parse(
      """{"@id":"dtmi:g:dev;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"thresholds","schema":{
        |    "@type":"Map",
        |    "mapKey":{"name":"name","schema":"string"},
        |    "mapValue":{"name":"level","schema":"double"}}}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:dev;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:dev;1"},
        |  "thresholds":{"low":1.5,"high":9.0}}""".stripMargin)
    assert(reg.validateTwin(ok).isRight)
    val badValue = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:dev;1"},
        |  "thresholds":{"low":"cold"}}""".stripMargin)
    assert(reg.validateTwin(badValue).isLeft,
      "map values must match the mapValue schema")
    val notObject = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:dev;1"},
        |  "thresholds":3.0}""".stripMargin)
    assert(reg.validateTwin(notObject).isLeft, "a Map instance is an object")
  }

  test("malformed Map schemas are model errors, not lenient AnySchema (r12 verdict #6)") {
    // DTDL v2/v3 §Map: mapKey AND mapValue are required, and the mapKey
    // schema MUST be string — DTDLParser rejects each of these
    def mapModel(schema: String) = parse(
      s"""{"@id":"dtmi:g:dev;1","@type":"Interface","contents":[
         |  {"@type":"Property","name":"m","schema":$schema}]}""".stripMargin)
    assert(mapModel(
      """{"@type":"Map","mapValue":{"name":"v","schema":"double"}}""").isLeft,
      "missing mapKey must fail")
    assert(mapModel(
      """{"@type":"Map","mapKey":{"name":"k","schema":"string"}}""").isLeft,
      "missing mapValue must fail")
    assert(mapModel(
      """{"@type":"Map","mapKey":{"name":"k","schema":"integer"},
        |"mapValue":{"name":"v","schema":"double"}}""".stripMargin).isLeft,
      "non-string mapKey must fail")
    assert(mapModel(
      """{"@type":"Map","mapKey":{"name":"k","schema":"string"},
        |"mapValue":{"name":"v"}}""".stripMargin).isLeft,
      "mapValue without a schema must fail")
    // nested positions are checked too: a bad Map inside an Array
    assert(mapModel(
      """{"@type":"Array","elementSchema":{
        |"@type":"Map","mapValue":{"name":"v","schema":"double"}}}""".stripMargin)
      .isLeft, "malformed Map nested in an Array must fail")
    // ...and inside the interface-level schemas registry
    assert(parse(
      """{"@id":"dtmi:g:dev;1","@type":"Interface",
        |  "schemas":[{"@id":"dtmi:g:badmap;1","@type":"Map",
        |    "mapValue":{"name":"v","schema":"double"}}],
        |  "contents":[
        |    {"@type":"Property","name":"m","schema":"dtmi:g:badmap;1"}]}""".stripMargin)
      .isLeft, "malformed Map in schemas registry must fail")
    // the well-formed shape still parses and validates (existing test
    // covers instance semantics)
    assert(mapModel(
      """{"@type":"Map","mapKey":{"name":"k","schema":"string"},
        |"mapValue":{"name":"v","schema":"double"}}""".stripMargin).isRight)
  }

  test("component-in-component is rejected at model upload (r12 verdict #6)") {
    // DTDL §Component: the interface a Component's schema names may not
    // itself declare Components — directly or via extends
    val leaf =
      """{"@id":"dtmi:g:leaf;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"p","schema":"double"}]}""".stripMargin
    val mid =
      """{"@id":"dtmi:g:mid;1","@type":"Interface","contents":[
        |  {"@type":"Component","name":"inner","schema":"dtmi:g:leaf;1"}]}""".stripMargin
    val outer =
      """{"@id":"dtmi:g:outer;1","@type":"Interface","contents":[
        |  {"@type":"Component","name":"nested","schema":"dtmi:g:mid;1"}]}""".stripMargin
    val st = new graft.store.TwinStore(() => "2026-01-01T00:00:00Z")
    st.createModels(Seq(leaf, mid)) // one level of components is fine
    val e = intercept[graft.store.StoreException] {
      st.createModels(Seq(outer))
    }
    assert(e.status == 400 && e.msg.contains("component"), e)
    // via extends: a component target inheriting a component-bearing base
    val viaExtends =
      """{"@id":"dtmi:g:mid2;1","@type":"Interface",
        |  "extends":"dtmi:g:mid;1","contents":[
        |  {"@type":"Property","name":"q","schema":"double"}]}""".stripMargin
    val outer2 =
      """{"@id":"dtmi:g:outer2;1","@type":"Interface","contents":[
        |  {"@type":"Component","name":"nested","schema":"dtmi:g:mid2;1"}]}""".stripMargin
    st.createModels(Seq(viaExtends))
    val e2 = intercept[graft.store.StoreException] {
      st.createModels(Seq(outer2))
    }
    assert(e2.status == 400 && e2.msg.contains("component"), e2)
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

  test("an integer Enum enforces BOTH membership and the valueSchema type") {
    // DTDLParser semantics (the reference delegates enum checking to it,
    // Validation/ + AgeDigitalTwinsClient.cs:71): valueSchema integer
    // means the instance must be an integral JSON number in the value
    // set — the string "1" and the double 1.5 both fail.
    val m = parse(
      """{"@id":"dtmi:g:sev;1","@type":"Interface",
        |  "contents":[
        |    {"@type":"Property","name":"severity",
        |     "schema":{"@type":"Enum","valueSchema":"integer",
        |       "enumValues":[
        |         {"name":"low","enumValue":1},
        |         {"name":"high","enumValue":3}]}}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:sev;1" -> m.toOption.get))
    def twin(v: String) = Json.parse(
      s"""{"$$dtId":"d","$$metadata":{"$$model":"dtmi:g:sev;1"},"severity":$v}""")
    assert(reg.validateTwin(twin("1")).isRight)
    assert(reg.validateTwin(twin("3")).isRight)
    assert(reg.validateTwin(twin("2")).isLeft, "2 is not a member")
    assert(reg.validateTwin(twin("\"1\"")).isLeft,
      "a STRING '1' does not satisfy an integer enum")
    assert(reg.validateTwin(twin("1.5")).isLeft,
      "a non-integral number does not satisfy an integer enum")
  }

  test("an Enum WITHOUT a declared valueSchema stays membership-only") {
    // spec-sloppy model (valueSchema is required by DTDL) that was
    // accepted before typed checking landed: defaulting the absent
    // valueSchema to "string" would reject the integer values it has
    // always validated — absence must mean untyped, not string
    val m = parse(
      """{"@id":"dtmi:g:untyped;1","@type":"Interface",
        |  "contents":[
        |    {"@type":"Property","name":"severity",
        |     "schema":{"@type":"Enum",
        |       "enumValues":[
        |         {"name":"low","enumValue":1},
        |         {"name":"high","enumValue":3}]}}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:untyped;1" -> m.toOption.get))
    def twin(v: String) = Json.parse(
      s"""{"$$dtId":"d","$$metadata":{"$$model":"dtmi:g:untyped;1"},"severity":$v}""")
    assert(reg.validateTwin(twin("1")).isRight,
      "integer member must keep validating with no declared valueSchema")
    assert(reg.validateTwin(twin("2")).isLeft, "membership still enforced")
  }

  test("a string Enum rejects a numeric instance even when digits match") {
    val m = parse(
      """{"@id":"dtmi:g:lvl;1","@type":"Interface",
        |  "contents":[
        |    {"@type":"Property","name":"level",
        |     "schema":{"@type":"Enum","valueSchema":"string",
        |       "enumValues":[
        |         {"name":"one","enumValue":"1"},
        |         {"name":"two","enumValue":"2"}]}}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:lvl;1" -> m.toOption.get))
    val okT = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:lvl;1"},"level":"1"}""")
    assert(reg.validateTwin(okT).isRight)
    val num = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:lvl;1"},"level":1}""")
    assert(reg.validateTwin(num).isLeft,
      "the NUMBER 1 does not satisfy a string enum containing \"1\"")
  }

  test("a unit-carrying property validates values end-to-end on the twin") {
    // The co-typed property keeps its declared schema for instance
    // checking — the unit qualifies the semantics, not the value type
    // (reference: Temperature sample in Validation/ via DTDLParser).
    val m = parse(
      """{"@id":"dtmi:g:th;1","@type":"Interface",
        |  "contents":[
        |    {"@type":["Property","Temperature"],"name":"temp",
        |     "schema":"double","unit":"degreeCelsius"}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:th;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:th;1"},"temp":21.5}""")
    assert(reg.validateTwin(ok).isRight)
    val bad = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:th;1"},"temp":"warm"}""")
    assert(reg.validateTwin(bad).isLeft,
      "the declared double schema still gates the value")
  }

  test("Command contents parse through without affecting instance validation") {
    // Commands are service-invocation surface, not twin state — DTDLParser
    // accepts them and twin validation ignores them; a parser that chokes
    // on the content type would reject real-world models.
    val m = parse(
      """{"@id":"dtmi:g:dev2;1","@type":"Interface",
        |  "contents":[
        |    {"@type":"Property","name":"temp","schema":"double"},
        |    {"@type":"Command","name":"reboot",
        |     "request":{"name":"delay","schema":"integer"},
        |     "response":{"name":"ok","schema":"boolean"}}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:dev2;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:dev2;1"},"temp":20.5}""")
    assert(reg.validateTwin(ok).isRight)
    val bad = Json.parse( // a property named like the command is undefined
      """{"$dtId":"d","$metadata":{"$model":"dtmi:g:dev2;1"},"reboot":1}""")
    assert(reg.validateTwin(bad).isLeft, "commands define no twin property")
  }

  // ---------- standard geospatial schemas (DTDL v2+, GeoJSON values) ----------

  private def geoReg(kind: String, version: Int = 2): ModelRegistry = {
    val m = parse(
      s"""{"@id":"dtmi:g:geo;1","@type":"Interface",
         |  "@context":"dtmi:dtdl:context;3",
         |  "contents":[
         |    {"@type":"Property","name":"where",
         |     "schema":"dtmi:standard:schema:geospatial:$kind;$version"}]}""".stripMargin)
    assert(m.isRight, m)
    ModelRegistry(Map("dtmi:g:geo;1" -> m.toOption.get))
  }
  private def twin(value: String) = Json.parse(
    s"""{"$$dtId":"g","$$metadata":{"$$model":"dtmi:g:geo;1"},"where":$value}""")

  test("geospatial point accepts a GeoJSON Point and rejects shape errors") {
    val reg = geoReg("point")
    assert(reg.validateTwin(twin(
      """{"type":"Point","coordinates":[-122.3,47.6]}""")).isRight)
    assert(reg.validateTwin(twin( // 3-element position (altitude) is legal
      """{"type":"Point","coordinates":[-122.3,47.6,30.0]}""")).isRight)
    assert(reg.validateTwin(twin(
      """{"type":"LineString","coordinates":[-122.3,47.6]}""")).isLeft,
      "type tag must match the declared kind")
    assert(reg.validateTwin(twin(
      """{"type":"Point","coordinates":[-122.3]}""")).isLeft,
      "a position needs 2-3 numbers")
    assert(reg.validateTwin(twin(
      """{"type":"Point","coordinates":["-122.3","47.6"]}""")).isLeft,
      "coordinates are numbers, not strings")
    assert(reg.validateTwin(twin("""{"type":"Point"}""")).isLeft,
      "coordinates member is required")
    assert(reg.validateTwin(twin(""""POINT(-122.3 47.6)"""")).isLeft,
      "WKT strings are not GeoJSON objects")
  }

  test("geospatial lineString needs 2+ positions; multiPoint nests once") {
    val ls = geoReg("lineString")
    assert(ls.validateTwin(twin(
      """{"type":"LineString","coordinates":[[0,0],[1,1],[2,2]]}""")).isRight)
    assert(ls.validateTwin(twin(
      """{"type":"LineString","coordinates":[[0,0]]}""")).isLeft,
      "a line needs at least two positions")
    val mp = geoReg("multiPoint")
    assert(mp.validateTwin(twin(
      """{"type":"MultiPoint","coordinates":[[0,0],[1,1]]}""")).isRight)
    assert(mp.validateTwin(twin(
      """{"type":"MultiPoint","coordinates":[0,0]}""")).isLeft,
      "MultiPoint coordinates are an array of positions")
  }

  test("geospatial polygon rings must close; multiPolygon nests twice") {
    val pg = geoReg("polygon")
    assert(pg.validateTwin(twin(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""")).isRight)
    assert(pg.validateTwin(twin(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[1,1]]]}""")).isLeft,
      "ring must be closed (first position = last)")
    assert(pg.validateTwin(twin(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[0,0]]]}""")).isLeft,
      "ring needs at least 4 positions")
    // Closure is numeric, not JSON-node identity: [0,0] closes with
    // [0.0,0.0] (Jackson's IntNode(0) != DoubleNode(0.0) must not leak
    // into GeoJSON semantics).
    assert(pg.validateTwin(twin(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0.0,0.0]]]}""")).isRight,
      "int/double mixed representation of the same position still closes")
    assert(pg.validateTwin(twin(
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,0,5]]]}""")).isLeft,
      "a 2D first position does not close against a 3D last position")
    val mpg = geoReg("multiPolygon", version = 3)
    assert(mpg.validateTwin(twin(
      """{"type":"MultiPolygon","coordinates":[[[[0,0],[4,0],[4,4],[0,0]]]]}""")).isRight)
    assert(mpg.validateTwin(twin(
      """{"type":"MultiPolygon","coordinates":[[[0,0],[4,0],[4,4],[0,0]]]}""")).isLeft,
      "a MultiPolygon is an array of polygons")
  }

  test("geospatial resolves before user schema definitions; patches validate too") {
    // dtmi:standard: is reserved — a user `schemas` entry cannot shadow it,
    // and the schema composes inside an Object like any other
    val m = parse(
      """{"@id":"dtmi:g:site;1","@type":"Interface",
        |  "contents":[
        |    {"@type":"Property","name":"fence",
        |     "schema":{"@type":"Object","fields":[
        |       {"name":"name","schema":"string"},
        |       {"name":"area","schema":"dtmi:standard:schema:geospatial:polygon;2"}]}}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map("dtmi:g:site;1" -> m.toOption.get))
    val ok = Json.parse(
      """{"$dtId":"s","$metadata":{"$model":"dtmi:g:site;1"},
        |  "fence":{"name":"yard",
        |    "area":{"type":"Polygon","coordinates":[[[0,0],[1,0],[1,1],[0,0]]]}}}""".stripMargin)
    assert(reg.validateTwin(ok).isRight)
    val bad = Json.parse(
      """{"$dtId":"s","$metadata":{"$model":"dtmi:g:site;1"},
        |  "fence":{"name":"yard","area":{"type":"Point","coordinates":[0,0]}}}""".stripMargin)
    assert(reg.validateTwin(bad).isLeft, "nested geospatial kind mismatch")
  }

  // ---------- DTMI well-formedness (DTDLParser parse-time checks) ----------

  private def interfaceWithId(id: String) =
    parse(s"""{"@id":"$id","@type":"Interface","contents":[]}""")

  test("DTMI format: valid shapes parse") {
    for (id <- Seq(
      "dtmi:a;1",
      "dtmi:com:contoso:Thing_1;1",
      "dtmi:a:b:c:d:e;999999999",
      "dtmi:v3:Thing;1.5",        // DTDL v3 two-part version
      "dtmi:v3:Thing;2.0"))
      assert(interfaceWithId(id).isRight, id)
  }

  test("DTMI format: malformed ids are typed model errors") {
    for (id <- Seq(
      "DTMI:a;1",            // scheme is case-sensitive
      "dtmi:a",              // missing version
      "dtmi:a;0",            // major must be >= 1
      "dtmi:a;01",           // leading zero
      "dtmi:a;1.01",         // leading zero in minor
      "dtmi:1a;1",           // segment starts with a digit
      "dtmi:_a;1",           // segment starts with underscore
      "dtmi:a_;1",           // segment ends with underscore
      "dtmi:a..b;1",         // bad separator
      "dtmi:a:;1",           // empty segment
      "dtmi:a b;1",          // whitespace
      "urn:a:b;1"))          // wrong scheme
    {
      val r = interfaceWithId(id)
      assert(r.isLeft && r.swap.toOption.get.contains("DTMI"), s"$id -> $r")
    }
  }

  test("interface @id caps at 128 characters; references at 2048") {
    val long = "dtmi:" + ("a" * 121) + ";1" // exactly 128 characters
    assert(long.length == 128)
    assert(interfaceWithId(long).isRight)
    val over = "dtmi:" + ("a" * 122) + ";1"
    assert(interfaceWithId(over).isLeft)
    // a relationship target may exceed 128 (general 2048 limit applies)
    val m = parse(
      s"""{"@id":"dtmi:g:r;1","@type":"Interface","contents":[
         |  {"@type":"Relationship","name":"to","target":"$over"}]}""".stripMargin)
    assert(m.isRight, m)
  }

  test("malformed extends / target / component schema references reject") {
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface",
        |  "extends":"not-a-dtmi","contents":[]}""".stripMargin).isLeft)
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Relationship","name":"to","target":"dtmi:bad_;1"}]}""".stripMargin)
      .isLeft)
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Component","name":"c","schema":"dtmi:comp;0"}]}""".stripMargin)
      .isLeft)
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface",
        |  "schemas":[{"@id":"bogus","@type":"Object",
        |    "fields":[{"name":"f","schema":"string"}]}],
        |  "contents":[]}""".stripMargin).isLeft)
  }

  // ---------- relationship-property validation (reference
  // Relationships.cs:260-420 × DigitalTwins.cs:266-457: relationship
  // writes validated against the model like twin writes; the Planet's
  // `satellites` carries a double `Distance`, SampleData.cs) ----------

  private def satelliteReg: ModelRegistry = {
    val planet = parse(
      """{"@id":"dtmi:g:planet;1","@type":"Interface","contents":[
        |  {"@type":"Relationship","name":"satellites",
        |   "target":"dtmi:g:moon;1",
        |   "properties":[
        |     {"@type":"Property","name":"Distance","schema":"double"},
        |     {"@type":"Property","name":"label","schema":"string"}]},
        |  {"@type":"Relationship","name":"near"}]}""".stripMargin)
    val moon = parse(
      """{"@id":"dtmi:g:moon;1","@type":"Interface","contents":[]}""".stripMargin)
    val iceMoon = parse(
      """{"@id":"dtmi:g:icemoon;1","@type":"Interface",
        |  "extends":"dtmi:g:moon;1"}""".stripMargin)
    val rock = parse(
      """{"@id":"dtmi:g:rock;1","@type":"Interface","contents":[]}""".stripMargin)
    assert(Seq(planet, moon, iceMoon, rock).forall(_.isRight))
    ModelRegistry(Seq(planet, moon, iceMoon, rock)
      .map(_.toOption.get).map(i => i.id -> i).toMap)
  }

  private def relDoc(json: String) = graft.json.Json.parse(json)

  test("relationship properties parse into the declaration, inherited lookups work") {
    val reg = satelliteReg
    val d = reg.relationshipDef("dtmi:g:planet;1", "satellites").get
    assert(d.target.contains("dtmi:g:moon;1"))
    assert(d.properties.keySet == Set("Distance", "label"))
    // a relationship with no properties block declares none
    assert(reg.relationshipDef("dtmi:g:planet;1", "near").get.properties.isEmpty)
  }

  test("declared rel properties type-check; undeclared ones reject; errors accumulate") {
    val reg = satelliteReg
    assert(reg.validateRelationship("dtmi:g:planet;1", "satellites",
      relDoc("""{"$relationshipName":"satellites","Distance":3.5,"label":"x"}""")).isRight)
    // wrong type
    val t = reg.validateRelationship("dtmi:g:planet;1", "satellites",
      relDoc("""{"$relationshipName":"satellites","Distance":"far"}"""))
    assert(t.isLeft && t.left.toOption.get.contains("Distance"))
    // undeclared property — the reference rejects undefined properties on
    // writes; both offenders must be named in ONE message
    val u = reg.validateRelationship("dtmi:g:planet;1", "satellites",
      relDoc("""{"$relationshipName":"satellites","bogus":1,"Distance":"x"}"""))
    assert(u.isLeft)
    val msg = u.left.toOption.get
    assert(msg.contains("bogus") && msg.contains("Distance"), msg)
  }

  test("declared target model enforces IS_OF_MODEL semantics on the target twin") {
    val reg = satelliteReg
    def v(target: String) =
      reg.validateRelationship("dtmi:g:planet;1", "satellites",
        relDoc("""{"$relationshipName":"satellites"}"""),
        Some(target))
    assert(v("dtmi:g:moon;1").isRight)       // exact target
    assert(v("dtmi:g:icemoon;1").isRight)    // inherited target
    val bad = v("dtmi:g:rock;1")
    assert(bad.isLeft && bad.left.toOption.get.contains("dtmi:g:moon;1"))
    // untargeted relationships accept anything
    assert(reg.validateRelationship("dtmi:g:planet;1", "near",
      relDoc("""{"$relationshipName":"near"}"""), Some("dtmi:g:rock;1")).isRight)
  }

  // ---------- Command contents + writable flags (reference Validation/,
  // SampleData.cs — commands are stored and validated at upload, never
  // executed; `writable` is metadata Azure DT accepts but does not
  // enforce on writes, and the reference follows suit) ----------

  test("Command contents parse: name + request/response payloads") {
    val m = parse(
      """{"@id":"dtmi:g:thermo;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"setpoint","schema":"double"},
        |  {"@type":"Command","name":"reboot"},
        |  {"@type":"Command","name":"setTarget",
        |   "request":{"name":"target","schema":"double"},
        |   "response":{"name":"accepted","schema":"boolean"}}]}""".stripMargin)
    assert(m.isRight, m)
    val i = m.toOption.get
    assert(i.commands.keySet == Set("reboot", "setTarget"))
    assert(i.commands("reboot") == CommandDef(None, None))
    assert(i.commands("setTarget") ==
      CommandDef(Some("target"), Some("accepted")))
    // inherited lookup through the registry
    val reg = ModelRegistry(Map(i.id -> i))
    assert(reg.commandDef("dtmi:g:thermo;1", "setTarget").isDefined)
    assert(reg.commandDef("dtmi:g:thermo;1", "nope").isEmpty)
  }

  test("malformed Commands are model errors: payload shape, name, dangling schema") {
    // request must be an object
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Command","name":"c","request":"double"}]}""".stripMargin).isLeft)
    // payload needs a name
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Command","name":"c",
        |   "request":{"schema":"double"}}]}""".stripMargin).isLeft)
    // payload needs a schema
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Command","name":"c",
        |   "request":{"name":"r"}}]}""".stripMargin).isLeft)
    // dangling schema reference inside a payload
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Command","name":"c",
        |   "response":{"name":"r","schema":"dtmi:missing;1"}}]}""".stripMargin).isLeft)
  }

  test("content names are required and unique across ALL content kinds") {
    // a Command shadowing a Property (or vice versa) must reject, not
    // silently last-win
    val dup = parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"reboot","schema":"string"},
        |  {"@type":"Command","name":"reboot"}]}""".stripMargin)
    assert(dup.isLeft && dup.left.toOption.get.contains("duplicate"), dup)
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"a","schema":"string"},
        |  {"@type":"Property","name":"a","schema":"double"}]}""".stripMargin).isLeft)
    // a content with no name at all
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Property","schema":"string"}]}""".stripMargin).isLeft)
  }

  test("a twin document cannot write a field named like a Command") {
    val i = parse(
      """{"@id":"dtmi:g:dev;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"p","schema":"double"},
        |  {"@type":"Command","name":"reboot"}]}""".stripMargin).toOption.get
    val reg = ModelRegistry(Map(i.id -> i))
    val bad = reg.validateTwin(graft.json.Json.parse(
      """{"$metadata":{"$model":"dtmi:g:dev;1"},"p":1.5,"reboot":true}"""))
    // commands are not writable state — the reference rejects undefined
    // properties, and a command name is not a property
    assert(bad.isLeft && bad.left.toOption.get.contains("reboot"), bad)
  }

  test("writable flags parse on Property/Relationship; non-boolean rejects") {
    val m = parse(
      """{"@id":"dtmi:g:w;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"ro","schema":"string","writable":false},
        |  {"@type":"Property","name":"rw","schema":"string","writable":true},
        |  {"@type":"Property","name":"unmarked","schema":"string"},
        |  {"@type":"Relationship","name":"owns","writable":false}]}""".stripMargin)
    assert(m.isRight, m)
    val reg = ModelRegistry(Map(m.toOption.get.id -> m.toOption.get))
    assert(reg.writableFlag("dtmi:g:w;1", "ro").contains(false))
    assert(reg.writableFlag("dtmi:g:w;1", "rw").contains(true))
    assert(reg.writableFlag("dtmi:g:w;1", "unmarked").isEmpty)
    assert(reg.writableFlag("dtmi:g:w;1", "owns").contains(false))
    // type-checked at upload, like DTDLParser
    assert(parse(
      """{"@id":"dtmi:g:w;1","@type":"Interface","contents":[
        |  {"@type":"Property","name":"p","schema":"string",
        |   "writable":"yes"}]}""".stripMargin).isLeft)
    // metadata, not a write guard: a twin may still write a
    // writable:false property (Azure DT + reference behavior)
    val regW = reg
    assert(regW.validateTwin(graft.json.Json.parse(
      """{"$metadata":{"$model":"dtmi:g:w;1"},"ro":"x"}""")).isRight)
  }

  test("relationship properties holding non-Property contents are model errors") {
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Relationship","name":"to","properties":[
        |    {"@type":"Telemetry","name":"t","schema":"double"}]}]}""".stripMargin)
      .isLeft)
    // dangling schema reference inside a rel property is a model error too
    assert(parse(
      """{"@id":"dtmi:g:x;1","@type":"Interface","contents":[
        |  {"@type":"Relationship","name":"to","properties":[
        |    {"@type":"Property","name":"p","schema":"dtmi:g:missing;1"}]}]}""".stripMargin)
      .isLeft)
  }
}
