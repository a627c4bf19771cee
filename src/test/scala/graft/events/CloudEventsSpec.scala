package graft.events

import org.scalatest.funsuite.AnyFunSuite
import graft.json.Json
import graft.store.MutationEvent

/** Golden tests for CloudEvent derivation (reference semantics from
  * CloudEventFactory.cs — see SURVEY §2.E E5-E7). */
class CloudEventsSpec extends AnyFunSuite {

  val src = "https://test-instance"

  val twinOld =
    """{"$dtId":"sensor-temp-01","$etag":"W/\"e1\"",
      |"$metadata":{"$model":"dtmi:com:example:Sensor;1",
      |  "temperature":{"lastUpdateTime":"2026-01-01T00:00:01Z"}},
      |"temperature":70.0,"status":"ok"}""".stripMargin.replace("\n", "")
  val twinNew =
    """{"$dtId":"sensor-temp-01","$etag":"W/\"e2\"",
      |"$metadata":{"$model":"dtmi:com:example:Sensor;1",
      |  "temperature":{"lastUpdateTime":"2026-01-01T00:00:02Z"}},
      |"temperature":72.5,"status":"ok"}""".stripMargin.replace("\n", "")

  test("twin update EventNotification: modelId + patch, subject = dtId") {
    val ev = MutationEvent(1, "2026-01-01T00:00:02Z", "TwinUpdate", twinOld, twinNew)
    val out = CloudEventFactory.eventNotification(ev, src)
    assert(out.size == 1)
    val e = out.head
    assert(e.`type` == "Konnektr.Graph.Twin.Update")
    assert(e.subject == "sensor-temp-01")
    assert(e.time == "2026-01-01T00:00:02Z")
    val data = Json.parse(e.data)
    assert(Json.get(data, "/modelId").get.asText() == "dtmi:com:example:Sensor;1")
    val ops = Json.get(data, "/patch").get
    // $etag + metadata + temperature replaces; enhancement drops $etag?
    // no same-value synthesis here (temperature has explicit op), so
    // $etag replace stays, like the raw CreatePatch output.
    val paths = (0 until ops.size).map(i => ops.get(i).get("path").asText())
    assert(paths.contains("/temperature"))
    assert(paths.contains("/$metadata/temperature/lastUpdateTime"))
  }

  test("same-value update synthesizes replace op and drops $etag/$dtId ops") {
    // temperature metadata timestamp changed but value identical
    val sameNew = twinOld
      .replace("00:00:01Z", "00:00:09Z")
      .replace("W/\\\"e1\\\"", "W/\\\"e9\\\"")
    val ev = MutationEvent(2, "t", "TwinUpdate", twinOld, sameNew)
    val e = CloudEventFactory.eventNotification(ev, src).head
    val ops = Json.get(Json.parse(e.data), "/patch").get
    val rendered = (0 until ops.size).map(i =>
      (ops.get(i).get("op").asText(), ops.get(i).get("path").asText()))
    assert(rendered.contains(("replace", "/temperature")),
      s"synthesized replace missing: $rendered")
    assert(!rendered.exists(_._2 == "/$etag"), "etag op must be dropped")
    val v = (0 until ops.size).collectFirst {
      case i if ops.get(i).get("path").asText() == "/temperature" =>
        ops.get(i).get("value").asDouble()
    }
    assert(v.contains(70.0), "synthesized value is the (unchanged) current value")
  }

  test("twin create/delete EventNotification carry the full doc") {
    val c = CloudEventFactory.eventNotification(
      MutationEvent(3, "t", "TwinCreate", null, twinNew), src).head
    assert(c.`type` == "Konnektr.Graph.Twin.Create")
    assert(Json.parse(c.data) == Json.parse(twinNew))
    val d = CloudEventFactory.eventNotification(
      MutationEvent(4, "t", "TwinDelete", twinOld, null), src).head
    assert(d.`type` == "Konnektr.Graph.Twin.Delete")
    assert(Json.parse(d.data) == Json.parse(twinOld))
  }

  test("DataHistory twin update: property events with flattened keys") {
    val oldD =
      """{"$dtId":"t1","$metadata":{"$model":"m1"},
        |"dims":{"w":1.0,"h":2.0},"name":"x"}""".stripMargin.replace("\n", "")
    val newD =
      """{"$dtId":"t1","$metadata":{"$model":"m1"},
        |"dims":{"w":1.0,"h":3.0},"name":"x"}""".stripMargin.replace("\n", "")
    val out = CloudEventFactory.dataHistory(
      MutationEvent(5, "ts1", "TwinUpdate", oldD, newD), src)
    assert(out.size == 1)
    val body = Json.parse(out.head.data)
    assert(Json.get(body, "/key").get.asText() == "dims_h")
    assert(Json.get(body, "/value").get.asDouble() == 3.0)
    assert(Json.get(body, "/action").get.asText() == "Update")
    assert(Json.get(body, "/id").get.asText() == "t1")
  }

  test("DataHistory model change adds an Update lifecycle event") {
    val oldD = """{"$dtId":"t1","$metadata":{"$model":"m1"},"a":1}"""
    val newD = """{"$dtId":"t1","$metadata":{"$model":"m2"},"a":2}"""
    val out = CloudEventFactory.dataHistory(
      MutationEvent(6, "ts", "TwinUpdate", oldD, newD), src)
    val lifecycle = out.filter(_.`type` == CloudEventFactory.TwinLifecycleType)
    assert(lifecycle.size == 1)
    val lb = Json.parse(lifecycle.head.data)
    assert(Json.get(lb, "/action").get.asText() == "Update")
    assert(Json.get(lb, "/modelId").get.asText() == "m2")
    assert(out.exists(_.`type` == CloudEventFactory.PropertyEventType))
  }

  test("DataHistory create: lifecycle + one property event per property") {
    val doc = """{"$dtId":"t1","$metadata":{"$model":"m1"},"a":1,"b":"x"}"""
    val out = CloudEventFactory.dataHistory(
      MutationEvent(7, "ts", "TwinCreate", null, doc), src)
    val lc = out.filter(_.`type` == CloudEventFactory.TwinLifecycleType)
    assert(lc.size == 1)
    assert(Json.get(Json.parse(lc.head.data), "/action").get.asText() == "Create")
    val props = out.filter(_.`type` == CloudEventFactory.PropertyEventType)
    assert(props.map(e => Json.get(Json.parse(e.data), "/key").get.asText()).toSet ==
      Set("a", "b"))
    assert(props.forall(e =>
      Json.get(Json.parse(e.data), "/action").get.asText() == "Create"))
  }

  test("relationship lifecycle + subject shape src/relationships/relId") {
    val rel =
      """{"$relationshipId":"rel1","$sourceId":"room1","$targetId":"sensor1",
        |"$relationshipName":"has","Distance":3.0}""".stripMargin.replace("\n", "")
    val en = CloudEventFactory.eventNotification(
      MutationEvent(8, "ts", "RelationshipCreate", null, rel), src).head
    assert(en.subject == "room1/relationships/rel1")
    val dh = CloudEventFactory.dataHistory(
      MutationEvent(9, "ts", "RelationshipDelete", rel, null), src)
    val lc = dh.filter(_.`type` == CloudEventFactory.RelationshipLifecycleType).head
    val body = Json.parse(lc.data)
    assert(Json.get(body, "/name").get.asText() == "has")
    assert(Json.get(body, "/source").get.asText() == "room1")
    assert(Json.get(body, "/target").get.asText() == "sensor1")
    assert(Json.get(body, "/action").get.asText() == "Delete")
  }

  test("telemetry envelope: subject with and without component") {
    val t1 = """{"digitalTwinId":"twin1","telemetry":{"temperature":25.0}}"""
    val e1 = CloudEventFactory.eventNotification(
      MutationEvent(10, "ts", "Telemetry", null, t1), src).head
    assert(e1.`type` == "Konnektr.IoT.Telemetry" && e1.subject == "twin1")
    val t2 = """{"digitalTwinId":"twin1","componentName":"comp","telemetry":{}}"""
    val e2 = CloudEventFactory.eventNotification(
      MutationEvent(11, "ts", "Telemetry", null, t2), src).head
    assert(e2.subject == "twin1/components/comp")
    // payload is the telemetry node itself; id honors messageId
    // (CloudEventFactory.cs:763-797)
    val t3 = """{"digitalTwinId":"twin1","messageId":"m-42","telemetry":{"temp":26.0}}"""
    val e3 = CloudEventFactory.eventNotification(
      MutationEvent(12, "ts", "Telemetry", null, t3), src).head
    assert(e3.id == "m-42" && e3.data == """{"temp":26.0}""")
    // dataschema = the telemetry's model id when present
    // (CloudEventFactory.cs:765,794), null otherwise
    assert(e1.dataschema == null)
    val t4 = """{"digitalTwinId":"twin1","modelId":"dtmi:com:example:Thermostat;1","telemetry":{"temp":26.0}}"""
    val e4 = CloudEventFactory.eventNotification(
      MutationEvent(13, "ts", "Telemetry", null, t4), src).head
    assert(e4.dataschema == "dtmi:com:example:Thermostat;1")
  }

  test("event ids are deterministic (idempotent retries)") {
    val ev = MutationEvent(12, "ts", "TwinCreate", null, twinNew)
    val a = CloudEventFactory.eventNotification(ev, src).head.id
    val b = CloudEventFactory.eventNotification(ev, src).head.id
    assert(a == b)
  }
}
