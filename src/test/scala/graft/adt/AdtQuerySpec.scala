package graft.adt

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.TwinGraph

/** Ports the reference's ADT query test corpus:
  *  - all 41 golden inputs from AdtQueryToCypherTests.cs must parse and plan;
  *  - semantic assertions over the CelestialBody→Planet→HabitablePlanet
  *    inheritance fixture (QueryTests.cs:634-758 expects 3/2/1 hits).
  */
class AdtQuerySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val graph: TwinGraph = {
    import spark.implicits._
    // 3 CelestialBody-family twins at each level: 1 moon, 1 planet, 1
    // habitable planet + a sun, mirroring the reference fixture scenario.
    val twins = Seq(
      ("sun", "dtmi:com:contoso:CelestialBody;1",
        """{"$dtId":"sun","name":"Sun","mass":1.989e30}"""),
      ("moon1", "dtmi:com:contoso:Moon;1",
        """{"$dtId":"moon1","name":"Moon","mass":7.34e22}"""),
      ("earth", "dtmi:com:contoso:Planet;1",
        """{"$dtId":"earth","name":"Earth","mass":5.97e24,"hasLife":true,"tags":["rocky","wet"],"dims":{"r":6371.0}}"""),
      ("kepler", "dtmi:com:contoso:HabitablePlanet;1",
        """{"$dtId":"kepler","name":"Kepler442b","mass":1.34e25,"Capacity":5}""")
    ).map { case (id, m, doc) => (id, m, null: String, "2026-01-01T00:00:00Z", doc) }
      .toDF("dt_id", "model_id", "etag", "last_update_time", "properties")

    val rels = Seq(
      ("r1", "moon1", "earth", "orbits", null: String, "{}"),
      ("r2", "earth", "sun", "orbits", null: String, "{}"),
      ("r3", "kepler", "sun", "orbits", null: String, "{}"),
      ("r4", "earth", "moon1", "satellites", null: String, """{"Distance":384400.0}""")
    ).toDF("relationship_id", "source_id", "target_id", "relationship_name", "etag", "properties")

    val models = Seq(
      ("dtmi:com:contoso:CelestialBody;1", Seq.empty[String],
        Seq("dtmi:com:contoso:Planet;1", "dtmi:com:contoso:HabitablePlanet;1", "dtmi:com:contoso:Moon;1"),
        "Celestial Body"),
      ("dtmi:com:contoso:Planet;1", Seq("dtmi:com:contoso:CelestialBody;1"),
        Seq("dtmi:com:contoso:HabitablePlanet;1"), "Planet"),
      ("dtmi:com:contoso:HabitablePlanet;1",
        Seq("dtmi:com:contoso:Planet;1", "dtmi:com:contoso:CelestialBody;1"),
        Seq.empty[String], "Habitable Planet"),
      ("dtmi:com:contoso:Moon;1", Seq("dtmi:com:contoso:CelestialBody;1"),
        Seq.empty[String], "Moon")
    ).toDF("id", "bases", "descendants", "display_name")

    // dual-written variant column, like GraphViews.graph — the planner
    // specs exercise the default (variant) extraction route
    TwinGraph(
      twins.withColumn("properties_v",
        org.apache.spark.sql.functions.try_parse_json(
          org.apache.spark.sql.functions.col("properties"))),
      rels.withColumn("properties_v",
        org.apache.spark.sql.functions.try_parse_json(
          org.apache.spark.sql.functions.col("properties"))),
      models)
  }

  lazy val planner = new AdtPlanner(graph)

  // ---- the 41 golden inputs: every one must parse and plan ----
  val corpus: Seq[String] = Seq(
    "SELECT T FROM DIGITALTWINS T",
    "SELECT * FROM DIGITALTWINS",
    "SELECT * FROM RELATIONSHIPS",
    "SELECT T.name FROM DIGITALTWINS T WHERE T.$metadata.$model = 'dtmi:com:adt:dtsample:room;1'",
    "SELECT * FROM DIGITALTWINS WHERE name = 'foo'",
    "SELECT * FROM DIGITALTWINS WHERE diameter > 2.5",
    "SELECT * FROM DIGITALTWINS WHERE $metadata.$model='dtmi:com:adt:dtsample:room;1'",
    "SELECT * FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:com:contoso:Planet;1')",
    "SELECT * FROM DIGITALTWINS WHERE STARTSWITH(name, 'foo')",
    "SELECT $dtId, name FROM DIGITALTWINS WHERE STARTSWITH(name, 'foo')",
    "SELECT $dtId, name FROM DIGITALTWINS WHERE ENDSWITH(name, 'foo')",
    "SELECT $dtId, name FROM DIGITALTWINS WHERE IS_DEFINED(name)",
    "SELECT T FROM DIGITALTWINS T WHERE IS_NULL(T.name)",
    "SELECT T FROM DIGITALTWINS T WHERE IS_OBJECT(T.someMap)",
    "SELECT T FROM DIGITALTWINS T WHERE IS_PRIMITIVE(T.someScalar)",
    "SELECT T FROM DIGITALTWINS T WHERE IS_STRING(T.someString)",
    "SELECT T FROM DIGITALTWINS T WHERE ARRAY_CONTAINS(T.tags, 'tag1')",
    "SELECT T FROM DIGITALTWINS T WHERE ARRAY_CONTAINS(T.numbers, 1)",
    "SELECT T FROM DIGITALTWINS T WHERE ARRAY_CONTAINS(T.bools, true)",
    "SELECT T FROM DIGITALTWINS T WHERE IS_BOOL(T.bool)",
    "SELECT * FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:com:contoso:Planet;1') AND name = 'foo'",
    "SELECT T FROM DIGITALTWINS T WHERE IS_OF_MODEL(T,'dtmi:com:contoso:Planet;1') AND T.name = 'foo'",
    "SELECT * FROM RELATIONSHIPS WHERE $sourceId = 'root'",
    "SELECT TOP(1) T FROM DIGITALTWINS T WHERE T.$metadata.$model = 'dtmi:com:adt:dtsample:room;1'",
    "SELECT TOP(1) FROM DIGITALTWINS WHERE $metadata.$model = 'dtmi:com:adt:dtsample:room;1'",
    "SELECT COUNT() FROM DIGITALTWINS",
    "SELECT T,R FROM DIGITALTWINS MATCH (current)-[R]->(T) WHERE current.$dtId='root'",
    "SELECT T FROM DIGITALTWINS MATCH (E)-[]->(T) WHERE T.$dtId = 'abc' AND E.$dtId != 'def'",
    "SELECT T FROM DIGITALTWINS MATCH (E)-[]->(T) WHERE T.$dtId != 'abc' AND E.$dtId != 'def'",
    "SELECT T FROM DIGITALTWINS MATCH (E)-[]->(T) WHERE T.size != 1 AND E.$dtId != 'def'",
    "SELECT B, R FROM DIGITALTWINS DT JOIN B RELATED DT.has R WHERE DT.$dtId = 'root2'",
    "SELECT B, R FROM DIGITALTWINS MATCH (T)-[R:hasBlob|hasModel]->(B) WHERE T.$dtId = 'root3'",
    "SELECT B, R FROM DIGITALTWINS MATCH (T)-[R:hasBlob|hasModel]->(B)-[R2:has]->(T2) WHERE T.$dtId = 'root3'",
    "SELECT LightBulb FROM DIGITALTWINS Room JOIN LightPanel RELATED Room.contains JOIN LightBulb RELATED LightPanel.contains WHERE Room.$dtId IN ['room1', 'room2']",
    "SELECT LightBulb FROM DIGITALTWINS Building JOIN Floor RELATED Building.contains JOIN Room RELATED Floor.contains JOIN LightPanel RELATED Room.contains JOIN LightBulbRow RELATED LightPanel.contains JOIN LightBulb RELATED LightBulbRow.contains WHERE Building.$dtId = 'Building1'",
    "SELECT r, t FROM DIGITALTWINS\n      MATCH (s)<-[r]-(t)\n      WHERE s.$dtId = 'root3'",
    "SELECT * FROM RELATIONSHIPS WHERE $sourceId = 'source' AND $targetId = 'target'",
    "SELECT * FROM relationships WHERE $sourceId = 'source' AND $targetId = 'target'",
    "SELECT R.$sourceId, R.$targetId FROM relationships R WHERE R.$sourceId IN ['s1','s2','s3'] AND R.$relationshipName = 'nextActivity'",
    "SELECT $sourceId, $targetId FROM relationships WHERE $sourceId IN ['s1','s2','s3'] AND $relationshipName = 'nextActivity'",
    "SELECT TOP(50) FROM DIGITALTWINS WHERE (CONTAINS(email,'test') OR CONTAINS(name,'test') OR CONTAINS($dtId,'test')) AND (IS_OF_MODEL('dtmi:com:contoso:Planet;1') OR IS_OF_MODEL('dtmi:com:contoso:Moon;1'))",
    "SELECT TOP (50) twin FROM DIGITALTWINS twin WHERE CONTAINS(twin.$dtId,'test') OR CONTAINS(twin.name,'test') OR CONTAINS(twin.displayName,'test') OR CONTAINS(twin.tag,'test') OR CONTAINS(twin.label,'test')",
    "SELECT * FROM DIGITALTWINS WHERE IS_NUMBER(Capacity)",
    "SELECT * FROM DIGITALTWINS WHERE IS_NUMBER(Capacity) AND Capacity != 0",
    "SELECT T FROM DIGITALTWINS T WHERE IS_NUMBER(T.temperature) AND T.temperature > 20.5",
    "SELECT TOP(1) FROM digitaltwins WHERE ($dtId IN ['00000-0000-0000-00000','test@example.com'] OR email = 'test@example.com') AND $metadata.$model = 'dtmi:com:arcadis:identity:Invite;1'"
  )

  test("all 41+ golden corpus queries parse and plan") {
    val failures = corpus.flatMap { q =>
      try { planner.run(q).schema; None }
      catch { case e: Exception => Some(s"$q\n  -> ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  private def count(q: String): Long = planner.run(q).count()

  test("IS_OF_MODEL inheritance 3/2/1 (QueryTests.cs:634-758)") {
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:com:contoso:CelestialBody;1')") == 4)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:com:contoso:Planet;1')") == 2)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:com:contoso:HabitablePlanet;1')") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_OF_MODEL(T, 'dtmi:com:contoso:Planet;1', exact)") == 1)
  }

  test("filters, functions and typing") {
    assert(count("SELECT * FROM DIGITALTWINS WHERE name = 'Earth'") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE mass > 1e24") == 3)
    assert(count("SELECT * FROM DIGITALTWINS WHERE hasLife = true") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE STARTSWITH(name, 'Ke')") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE ENDSWITH(name, 'arth')") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE CONTAINS(name, 'oo')") == 1)
    assert(count("SELECT T FROM DIGITALTWINS T WHERE ARRAY_CONTAINS(T.tags, 'rocky')") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_DEFINED(hasLife)") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_NULL(hasLife)") == 3)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_NUMBER(Capacity)") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_STRING(name)") == 4)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_OBJECT(dims)") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_PRIMITIVE(mass)") == 4)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_BOOL(hasLife)") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE IS_NUMBER(Capacity) AND Capacity != 0") == 1)
    assert(count("SELECT * FROM DIGITALTWINS WHERE $dtId IN ['sun', 'earth']") == 2)
    assert(count("SELECT * FROM DIGITALTWINS WHERE NOT name = 'Sun'") == 3)
  }

  test("relationship queries") {
    assert(count("SELECT * FROM RELATIONSHIPS") == 4)
    assert(count("SELECT * FROM RELATIONSHIPS WHERE $sourceId = 'earth'") == 2)
    assert(count("SELECT R.$sourceId, R.$targetId FROM relationships R WHERE R.$relationshipName = 'orbits'") == 3)
    val rows = planner.run(
      "SELECT $sourceId, $targetId FROM relationships WHERE $relationshipName = 'satellites'").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "earth" && rows(0).getString(1) == "moon1")
  }

  test("graph traversal: MATCH and JOIN RELATED") {
    // who orbits the sun
    assert(count("SELECT T FROM DIGITALTWINS MATCH (T)-[r:orbits]->(S) WHERE S.$dtId = 'sun'") == 2)
    // reverse arrow form
    assert(count("SELECT T FROM DIGITALTWINS MATCH (S)<-[r:orbits]-(T) WHERE S.$dtId = 'sun'") == 2)
    // JOIN RELATED form
    assert(count("SELECT B FROM DIGITALTWINS DT JOIN B RELATED DT.orbits R WHERE DT.$dtId = 'earth'") == 1)
    // two-hop: moon1 -orbits-> earth -orbits-> sun
    assert(count("SELECT C FROM DIGITALTWINS MATCH (A)-[r1:orbits]->(B)-[r2:orbits]->(C) WHERE A.$dtId = 'moon1'") == 1)
    // multi-label disjunction
    assert(count("SELECT B, R FROM DIGITALTWINS MATCH (T)-[R:orbits|satellites]->(B) WHERE T.$dtId = 'earth'") == 2)
  }

  test("variable-length edges in MATCH (B7 through the query language)") {
    // moon1 -orbits-> earth -orbits-> sun; earth -satellites-> moon1
    assert(count("SELECT T FROM DIGITALTWINS MATCH (S)-[r:orbits*1..2]->(T) WHERE S.$dtId = 'moon1'") == 2)
    assert(count("SELECT T FROM DIGITALTWINS MATCH (S)-[*1..2]->(T) WHERE S.$dtId = 'moon1'") == 3)
    assert(count("SELECT T FROM DIGITALTWINS MATCH (S)-[r:orbits*2..2]->(T) WHERE S.$dtId = 'moon1'") == 1)
    assert(count("SELECT T FROM DIGITALTWINS MATCH (S)-[*]->(T) WHERE S.$dtId = 'moon1'") == 3)
    // depth column exposed under the rel alias
    val df = planner.run(
      "SELECT r.depth AS depth FROM DIGITALTWINS MATCH (S)-[r:orbits*1..3]->(T) WHERE S.$dtId = 'moon1' AND T.$dtId = 'sun'")
    assert(df.collect().map(_.get(0).toString).toSeq == Seq("2"))
  }

  test("ofModelDistributed matches the plan-time closure path") {
    val m = "dtmi:com:contoso:Planet;1"
    val viaCollect = graph.ofModel(m).select("dt_id").collect().map(_.getString(0)).toSet
    val viaJoin = graph.ofModelDistributed(m).select("dt_id").collect().map(_.getString(0)).toSet
    assert(viaCollect == viaJoin && viaJoin == Set("earth", "kepler"))
  }

  test("lexical model search (C14 / Models.cs:911-931)") {
    val hits = graph.searchModels("planet").collect()
    assert(hits.map(_.getString(0)).toSeq ==
      Seq("dtmi:com:contoso:HabitablePlanet;1", "dtmi:com:contoso:Planet;1"))
    assert(graph.searchModels("moon").count() == 1)
    assert(graph.searchModels("zzz").count() == 0)
  }

  test("projection, TOP, COUNT") {
    val df = planner.run("SELECT T.name AS n, T.mass FROM DIGITALTWINS T WHERE T.$dtId = 'earth'")
    assert(df.columns.toSeq == Seq("n", "mass"))
    assert(df.collect()(0).getString(0) == "Earth")
    assert(count("SELECT TOP(2) FROM DIGITALTWINS") == 2)
    val c = planner.run("SELECT COUNT() FROM DIGITALTWINS")
    assert(c.columns.toSeq == Seq("COUNT"))
    assert(c.collect()(0).getLong(0) == 4)
  }
}
