package graft.adt

import org.scalatest.funsuite.AnyFunSuite

class RefParseSpec extends AnyFunSuite {
  val qs = Seq(
    "SELECT $dtId, name FROM DIGITALTWINS WHERE ENDSWITH(name, 'foo')",
    "SELECT $sourceId, $targetId FROM relationships WHERE $sourceId IN ['s1','s2','s3'] AND $relationshipName = 'nextActivity'",
    "SELECT * FROM DIGITALTWINS WHERE $metadata.$model='dtmi:com:adt:dtsample:room;1'",
    "SELECT * FROM DIGITALTWINS WHERE IS_OF_MODEL('dtmi:com:contoso:CelestialBody;1', exact)",
    "SELECT B, R FROM DIGITALTWINS DT JOIN B RELATED DT.has R WHERE DT.$dtId = 'root2'",
    "SELECT B, R FROM DIGITALTWINS MATCH (T)-[R:hasBlob|hasModel]->(B)-[R2:has]->(T2) WHERE T.$dtId = 'root3'",
    "SELECT COUNT() FROM DIGITALTWINS T WHERE T.name = 'notveryunique'",
    "SELECT T FROM DIGITALTWINS MATCH (E)-[]->(T) WHERE T.size != 1 AND E.$dtId != 'def'",
    "SELECT T FROM DIGITALTWINS T WHERE IS_OF_MODEL(T,'dtmi:com:adt:dtsample:room;1') AND T.name = 'foo'",
    "SELECT T,R FROM DIGITALTWINS MATCH (current)-[R]->(T) WHERE current.$dtId='root'",
    "SELECT TOP (50) twin FROM DIGITALTWINS twin WHERE CONTAINS(twin.$dtId,'test') OR CONTAINS(twin.name,'test')",
    "SELECT TOP(1) FROM DIGITALTWINS WHERE $metadata.$model = 'dtmi:com:adt:dtsample:room;1'",
    "SELECT TOP(1) FROM digitaltwins WHERE ($dtId IN ['00000-0000-0000-00000','test@example.com'] OR email = 'test@example.com') AND $metadata.$model = 'dtmi:com:arcadis:identity:Invite;1'",
    "SELECT _ FROM DIGITALTWINS _ WHERE _.$metadata.$model = 'dtmi:com:adt:dtsample:room;1'",
    "SELECT r, t FROM DIGITALTWINS\n      MATCH (s)<-[r]-(t)\n      WHERE s.$dtId = 'root3'",
    "SELECT * FROM DIGITALTWINS WHERE IS_NUMBER(Capacity) AND Capacity != 0",
    "SELECT R.$sourceId, R.$targetId FROM relationships R WHERE R.$sourceId IN ['s1','s2','s3'] AND R.$relationshipName = 'nextActivity'"
  )
  test("reference-suite query shapes all parse") {
    val fails = qs.flatMap { q =>
      try { AdtParser.parse(q); None }
      catch { case e: Exception => Some(s"$q\n  -> ${e.getMessage}") }
    }
    assert(fails.isEmpty, fails.mkString("\n"))
  }
}
