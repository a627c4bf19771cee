package graft.store

import org.scalatest.funsuite.AnyFunSuite
import graft.json.Json

/** Ports the reference's write-path behaviors (DigitalTwinsTests /
  * ModelsTests / RelationshipsTests assertions, SURVEY §2.D + FIXTURES.md). */
class TwinStoreSpec extends AnyFunSuite {

  val roomModel =
    """{"@id":"dtmi:com:adt:dtsample:room;1","@type":"Interface",
      |"@context":"dtmi:dtdl:context;3","displayName":"Room","contents":[
      |{"@type":"Property","name":"name","schema":"string"},
      |{"@type":"Property","name":"temperature","schema":"double"},
      |{"@type":"Property","name":"dimensions","schema":{"@type":"Object","fields":[
      |  {"name":"length","schema":"double"},{"name":"width","schema":"double"},
      |  {"name":"height","schema":"double"}]}},
      |{"@type":"Relationship","name":"rel_has_sensors"}]}""".stripMargin

  val sensorModel =
    """{"@id":"dtmi:com:adt:dtsample:tempsensor;1","@type":"Interface",
      |"@context":"dtmi:dtdl:context;3","contents":[
      |{"@type":"Property","name":"name","schema":"string"},
      |{"@type":"Property","name":"temperature","schema":"double"}]}""".stripMargin

  // FIXTURES.md §1.2 inheritance chain
  val celestial =
    """{"@id":"dtmi:com:contoso:CelestialBody;1","@type":"Interface","contents":[
      |{"@type":"Property","name":"name","schema":"string"},
      |{"@type":"Property","name":"mass","schema":"double"}]}""".stripMargin
  val planet =
    """{"@id":"dtmi:com:contoso:Planet;1","@type":"Interface",
      |"extends":"dtmi:com:contoso:CelestialBody;1","contents":[
      |{"@type":"Property","name":"hasLife","schema":"boolean"}]}""".stripMargin
  val habitable =
    """{"@id":"dtmi:com:contoso:HabitablePlanet;1","@type":"Interface",
      |"extends":"dtmi:com:contoso:Planet;1"}""".stripMargin
  val moon =
    """{"@id":"dtmi:com:contoso:Moon;1","@type":"Interface",
      |"extends":"dtmi:com:contoso:CelestialBody;1"}""".stripMargin

  def freshStore(): TwinStore = {
    var t = 0
    val s = new TwinStore(() => { t += 1; f"2026-01-01T00:00:${t % 60}%02dZ" })
    s.createModels(Seq(roomModel, sensorModel))
    s
  }

  test("model closure: bases and descendants (FIXTURES §1.2 expectations)") {
    val s = new TwinStore()
    s.createModels(Seq(celestial, planet, habitable, moon))
    val r = s.models
    assert(r.bases("dtmi:com:contoso:Planet;1") == Seq("dtmi:com:contoso:CelestialBody;1"))
    assert(r.bases("dtmi:com:contoso:HabitablePlanet;1") ==
      Seq("dtmi:com:contoso:Planet;1", "dtmi:com:contoso:CelestialBody;1"))
    assert(r.descendants("dtmi:com:contoso:CelestialBody;1").sorted ==
      Seq("dtmi:com:contoso:HabitablePlanet;1", "dtmi:com:contoso:Moon;1",
        "dtmi:com:contoso:Planet;1"))
    assert(r.descendants("dtmi:com:contoso:Planet;1") ==
      Seq("dtmi:com:contoso:HabitablePlanet;1"))
  }

  test("descendants update when derived models arrive later; delete + recreate") {
    // ModelsTests.CreateModels_DescendantsUpdatedInBaseModel_WhenDerived
    // ModelsCreatedLater + CreateModels_ExistingModel_ThrowsModelAlready
    // Exists + CreateModels_CanDeleteAndCreateAgain (ModelsTests.cs:264,
    // 291,522): closures must track multi-call uploads, not just one batch.
    val s = new TwinStore()
    s.createModels(Seq(celestial))
    assert(s.models.descendants("dtmi:com:contoso:CelestialBody;1").isEmpty)
    s.createModels(Seq(planet, moon)) // extends resolves against the store
    assert(s.models.descendants("dtmi:com:contoso:CelestialBody;1").sorted ==
      Seq("dtmi:com:contoso:Moon;1", "dtmi:com:contoso:Planet;1"))
    s.createModels(Seq(habitable))
    assert(s.models.descendants("dtmi:com:contoso:CelestialBody;1").sorted ==
      Seq("dtmi:com:contoso:HabitablePlanet;1", "dtmi:com:contoso:Moon;1",
        "dtmi:com:contoso:Planet;1"))
    val dup = intercept[StoreException](s.createModels(Seq(moon)))
    assert(dup.status == 409 && dup.msg.contains("already exist"))
    s.deleteModel("dtmi:com:contoso:HabitablePlanet;1")
    assert(s.models.descendants("dtmi:com:contoso:Planet;1").isEmpty)
    s.createModels(Seq(habitable)) // delete-then-recreate round-trips
    assert(s.models.descendants("dtmi:com:contoso:Planet;1") ==
      Seq("dtmi:com:contoso:HabitablePlanet;1"))
  }

  test("create twin: validation, stamping, etag") {
    val s = freshStore()
    val stored = s.createOrReplaceTwin("room1",
      """{"$dtId":"room1","$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},
        |"name":"Room 1","temperature":22.5,
        |"dimensions":{"length":5.0,"width":4.0,"height":3.0}}""".stripMargin)
    assert(Json.get(stored, "/$etag").isDefined)
    assert(Json.get(stored, "/$metadata/$lastUpdateTime").isDefined)
    assert(Json.get(stored, "/$metadata/name/lastUpdateTime").isDefined)
    assert(Json.get(stored, "/$metadata/temperature/lastUpdateTime").isDefined)
  }

  test("create twin rejects unknown property and wrong types") {
    val s = freshStore()
    val e1 = intercept[StoreException](s.createOrReplaceTwin("r",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"bogus":1}"""))
    assert(e1.msg.contains("'bogus' is not defined in the model"))
    val e2 = intercept[StoreException](s.createOrReplaceTwin("r",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"temperature":"hot"}"""))
    assert(e2.msg.contains("temperature"))
    val e3 = intercept[StoreException](s.createOrReplaceTwin("r",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},
        |"dimensions":{"length":5.0,"depth":1.0}}""".stripMargin))
    assert(e3.msg.contains("depth"))
    val e4 = intercept[StoreException](s.createOrReplaceTwin("r",
      """{"$metadata":{"$model":"dtmi:missing;1"},"name":"x"}"""))
    assert(e4.msg.contains("does not exist"))
  }

  test("replace keeps unchanged-property metadata, restamps changed") {
    val s = freshStore()
    val v1 = s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A","temperature":20.0}""")
    val t1name = Json.get(v1, "/$metadata/name/lastUpdateTime").get.asText()
    val v2 = s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A","temperature":21.0}""")
    assert(Json.get(v2, "/$metadata/name/lastUpdateTime").get.asText() == t1name,
      "unchanged property keeps old timestamp")
    assert(Json.get(v2, "/$metadata/temperature/lastUpdateTime").get.asText() != t1name)
    assert(Json.get(v1, "/$etag") != Json.get(v2, "/$etag"))
  }

  test("ifNoneMatch * and etag preconditions") {
    val s = freshStore()
    s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A"}""")
    val e = intercept[StoreException](s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"B"}""",
      ifNoneMatchStar = true))
    assert(e.status == 412)
    val etag = Json.get(s.getTwin("room1"), "/$etag").get.asText()
    s.patchTwin("room1", """[{"op":"replace","path":"/name","value":"C"}]""",
      ifMatch = Some(etag))
    val stale = intercept[StoreException](s.patchTwin("room1",
      """[{"op":"replace","path":"/name","value":"D"}]""", ifMatch = Some(etag)))
    assert(stale.status == 412)
  }

  test("patch stamps only patched props; delete twin blocked by rels") {
    val s = freshStore()
    s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A","temperature":20.0}""")
    val before = s.getTwin("room1")
    val tName = Json.get(before, "/$metadata/name/lastUpdateTime").get.asText()
    val after = s.patchTwin("room1",
      """[{"op":"replace","path":"/temperature","value":25.5}]""")
    assert(Json.get(after, "/temperature").get.asDouble() == 25.5)
    assert(Json.get(after, "/$metadata/name/lastUpdateTime").get.asText() == tName)
    assert(Json.get(after, "/$metadata/temperature/lastUpdateTime").get.asText() != tName)

    s.createOrReplaceTwin("sensor1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:tempsensor;1"},"name":"S"}""")
    s.createOrReplaceRelationship("room1", "rel1",
      """{"$relationshipName":"rel_has_sensors","$targetId":"sensor1"}""")
    val blocked = intercept[StoreException](s.deleteTwin("room1"))
    assert(blocked.msg.contains("relationships"))
    s.deleteRelationship("room1", "rel1")
    s.deleteTwin("room1")
    assertThrows[StoreException](s.getTwin("room1"))
  }

  test("patched sourceTime survives metadata restamping (DigitalTwinsTests.cs:357)") {
    val s = freshStore()
    s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A"}""")
    val after = s.patchTwin("room1",
      """[{"op":"add","path":"/name","value":"Earth 3"},
        |{"op":"add","path":"/$metadata/name/sourceTime","value":"2026-02-03T04:05:06Z"}]""".stripMargin)
    assert(Json.get(after, "/name").get.asText() == "Earth 3")
    assert(Json.get(after, "/$metadata/name/sourceTime").get.asText()
      == "2026-02-03T04:05:06Z")
    assert(Json.get(after, "/$metadata/name/lastUpdateTime").isDefined)
    // and an explicit sourceTime in a created doc's metadata also sticks
    s.createOrReplaceTwin("room2",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1",
        |"temperature":{"sourceTime":"2026-01-02T00:00:00Z"}},"temperature":21.5}""".stripMargin)
    assert(Json.get(s.getTwin("room2"), "/$metadata/temperature/sourceTime")
      .get.asText() == "2026-01-02T00:00:00Z")
  }

  test("relationship validation: endpoints must exist, name must be defined") {
    val s = freshStore()
    s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A"}""")
    s.createOrReplaceTwin("sensor1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:tempsensor;1"},"name":"S"}""")
    val e1 = intercept[StoreException](s.createOrReplaceRelationship("room1", "r",
      """{"$relationshipName":"rel_has_sensors","$targetId":"ghost"}"""))
    assert(e1.status == 404)
    val e2 = intercept[StoreException](s.createOrReplaceRelationship("sensor1", "r",
      """{"$relationshipName":"rel_has_sensors","$targetId":"room1"}"""))
    assert(e2.msg.contains("not defined in model"))
    val ok = s.createOrReplaceRelationship("room1", "rel1",
      """{"$relationshipName":"rel_has_sensors","$targetId":"sensor1"}""")
    assert(Json.get(ok, "/$sourceId").get.asText() == "room1")
  }

  test("relationship patch: reserved $-fields immutable, schema re-checked") {
    val s = freshStore()
    s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A"}""")
    s.createOrReplaceTwin("sensor1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:tempsensor;1"},"name":"S"}""")
    s.createOrReplaceRelationship("room1", "rel1",
      """{"$relationshipName":"rel_has_sensors","$targetId":"sensor1"}""")
    // replacing /$targetId via PATCH would bypass the target constraint
    // enforced on create — reserved fields are immutable through PATCH
    val e = intercept[StoreException](s.patchRelationship("room1", "rel1",
      """[{"op":"replace","path":"/$targetId","value":"room1"}]"""))
    assert(e.status == 400 && e.msg.contains("reserved"), e.msg)
    // copy/move FROM a reserved path is equally rejected
    val e2 = intercept[StoreException](s.patchRelationship("room1", "rel1",
      """[{"op":"copy","from":"/$etag","path":"/weight"}]"""))
    assert(e2.status == 400, e2.msg)
    // an undeclared property still rejects through PATCH (rel_has_sensors
    // declares no properties)
    val e3 = intercept[StoreException](s.patchRelationship("room1", "rel1",
      """[{"op":"add","path":"/bogus","value":1}]"""))
    assert(e3.status == 400 && e3.msg.contains("bogus"), e3.msg)
  }

  test("validateRelationshipSchemas=false restores reference-exact leniency") {
    // the reference performs NO model-based validation of relationship
    // documents (UpdateRelationshipAsync: 'TODO: Add validation logic') —
    // the lenient store accepts undeclared rel properties, for migrations
    // replaying documents that predate their schemas
    val s = new TwinStore(validateRelationshipSchemas = false)
    s.createModels(Seq(roomModel, sensorModel))
    s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A"}""")
    s.createOrReplaceTwin("sensor1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:tempsensor;1"},"name":"S"}""")
    val ok = s.createOrReplaceRelationship("room1", "rel1",
      """{"$relationshipName":"rel_has_sensors","$targetId":"sensor1",
        |"undeclared_prop":42}""".stripMargin)
    assert(Json.get(ok, "/undeclared_prop").get.asInt() == 42)
    s.patchRelationship("room1", "rel1",
      """[{"op":"add","path":"/another","value":"x"}]""")
    // the declared-name check still applies (pre-r14 behavior, kept):
    // an unknown relationship NAME is rejected in both modes
    val e = intercept[StoreException](s.createOrReplaceRelationship(
      "room1", "r2", """{"$relationshipName":"ghost_rel","$targetId":"sensor1"}"""))
    assert(e.msg.contains("not defined in model"))
    // reserved-field immutability is identity protection, not schema
    // validation — it applies in lenient mode too
    val e2 = intercept[StoreException](s.patchRelationship("room1", "rel1",
      """[{"op":"replace","path":"/$targetId","value":"room1"}]"""))
    assert(e2.status == 400 && e2.msg.contains("reserved"))
  }

  test("batch upsert caps at 100 and reports per-item results") {
    val s = freshStore()
    val results = s.createOrReplaceTwins(Seq(
      """{"$dtId":"a","$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A"}""",
      """{"$dtId":"b","$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"bogus":1}""",
      """{"no_id":true}"""))
    assert(results(0).isRight && results(1).isLeft && results(2).isLeft)
    assertThrows[StoreException](
      s.createOrReplaceTwins(Seq.fill(101)("""{"$dtId":"x"}""")))
  }

  test("createModels resolves dependencies within request + store, else 400") {
    // derived-before-base within ONE request resolves (ModelsTests.cs:34)
    val s = new TwinStore()
    s.createModels(Seq(planet, celestial))
    assert(s.models.bases("dtmi:com:contoso:Planet;1")
      == Seq("dtmi:com:contoso:CelestialBody;1"))
    // resolving against already-stored models works (ModelsTests.cs:126)
    s.createModels(Seq(habitable))
    // a dangling extends fails the whole batch (ModelsTests.cs:146)
    val s2 = new TwinStore()
    val ex = intercept[StoreException](s2.createModels(Seq(planet)))
    assert(ex.status == 400 && ex.msg.contains("resolve"))
  }

  test("getModelWithBaseContents merges the inherited surface (ModelsTests.cs:581)") {
    val s = new TwinStore()
    s.createModels(Seq(celestial, planet, habitable))
    val merged = s.getModelWithBaseContents("dtmi:com:contoso:HabitablePlanet;1")
    assert(merged.id == "dtmi:com:contoso:HabitablePlanet;1")
    assert(merged.properties.keySet == Set("name", "mass", "hasLife"))
    // the un-merged lookup still returns only the local contents
    assert(s.getModel("dtmi:com:contoso:HabitablePlanet;1").properties.isEmpty)
  }

  test("model delete blocked by dependents") {
    val s = new TwinStore()
    s.createModels(Seq(celestial, planet))
    val e = intercept[StoreException](s.deleteModel("dtmi:com:contoso:CelestialBody;1"))
    assert(e.status == 409)
    s.deleteModel("dtmi:com:contoso:Planet;1")
    s.deleteModel("dtmi:com:contoso:CelestialBody;1")
    assert(s.models.models.isEmpty)
  }

  test("model embeddings: update, semantic + hybrid search, delete cleanup") {
    val s = new TwinStore()
    s.createModels(Seq(celestial, planet, habitable, moon))
    // 404 before the model exists, 400 on an empty vector
    intercept[StoreException](s.updateModelEmbedding("dtmi:none;1", Seq(1.0)))
    intercept[StoreException](
      s.updateModelEmbedding("dtmi:com:contoso:Planet;1", Nil))
    s.updateModelEmbedding("dtmi:com:contoso:CelestialBody;1", Seq(0.0, 0.0))
    s.updateModelEmbedding("dtmi:com:contoso:Planet;1", Seq(1.0, 0.0))
    s.updateModelEmbedding("dtmi:com:contoso:HabitablePlanet;1", Seq(1.0, 1.0))
    assert(s.modelEmbedding("dtmi:com:contoso:Planet;1").contains(Seq(1.0, 0.0)))
    // vector search ranks by L2; Moon (no embedding) sorts last
    val ranked = s.searchModels(None, Some(Seq(1.0, 0.25))).map(_.id)
    assert(ranked == Seq(
      "dtmi:com:contoso:Planet;1",          // d² = 0.0625
      "dtmi:com:contoso:HabitablePlanet;1", // d² = 0.5625
      "dtmi:com:contoso:CelestialBody;1",   // d² = 1.0625
      "dtmi:com:contoso:Moon;1"))           // no embedding → last
    // hybrid: lexical needle filters before the vector ranking
    val hybrid = s.searchModels(Some("planet"), Some(Seq(1.0, 0.25))).map(_.id)
    assert(hybrid == Seq(
      "dtmi:com:contoso:Planet;1", "dtmi:com:contoso:HabitablePlanet;1"))
    // lexical-only orders by id; limit respected
    assert(s.searchModels(Some("contoso"), None, limit = 2).map(_.id) ==
      Seq("dtmi:com:contoso:CelestialBody;1", "dtmi:com:contoso:HabitablePlanet;1"))
    // re-upload of a deleted model starts with no embedding
    s.deleteModel("dtmi:com:contoso:HabitablePlanet;1")
    s.createModels(Seq(habitable))
    assert(s.modelEmbedding("dtmi:com:contoso:HabitablePlanet;1").isEmpty)
  }

  test("mutation log records one row per logical operation") {
    val s = freshStore()
    s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"A"}""")
    s.createOrReplaceTwin("room1",
      """{"$metadata":{"$model":"dtmi:com:adt:dtsample:room;1"},"name":"B"}""")
    s.deleteTwin("room1")
    assert(s.mutations.map(_.eventType) == Seq("TwinCreate", "TwinUpdate", "TwinDelete"))
    assert(s.mutations.forall(_.ts.nonEmpty))
  }
}
