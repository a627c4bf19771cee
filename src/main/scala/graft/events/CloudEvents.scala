package graft.events

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.json.{Json, JsonPatch, PatchOp}
import graft.store.MutationEvent
import scala.jdk.CollectionConverters._

/** One CloudEvents-1.0 envelope (flattened to columns for Spark frames).
  * `dataschema` is null except for telemetry, where the reference sets it
  * to the telemetry's model id URI (CloudEventFactory.cs CreateTelemetryEvents). */
final case class CloudEvent(
    id: String,
    source: String,
    `type`: String,
    subject: String,
    time: String,
    datacontenttype: String,
    data: String,
    dataschema: String = null)

/** Derives CloudEvents from mutation events — the Spark-side equivalent of
  * the reference's CloudEventFactory
  * (/root/reference/src/AgeDigitalTwins.Events/Core/Events/CloudEventFactory.cs),
  * reproducing: the EventNotification and DataHistory formats, the
  * same-value-update patch enhancement (:655-714), `$`-key skipping, nested
  * key flattening a/b → a_b (:557), model-change extra lifecycle event
  * (:497-530), and sourceTime/lastUpdatedBy extraction (:612-633).
  *
  * Event ids: the reference uses Guid.NewGuid(); we derive a deterministic
  * uuid from (seq, type, subject, key) so streaming retries are idempotent
  * and golden tests are stable.
  */
object CloudEventFactory {

  val EventNotificationTypes: Map[String, String] = Map(
    "TwinCreate" -> "Konnektr.Graph.Twin.Create",
    "TwinUpdate" -> "Konnektr.Graph.Twin.Update",
    "TwinDelete" -> "Konnektr.Graph.Twin.Delete",
    "RelationshipCreate" -> "Konnektr.Graph.Relationship.Create",
    "RelationshipUpdate" -> "Konnektr.Graph.Relationship.Update",
    "RelationshipDelete" -> "Konnektr.Graph.Relationship.Delete",
    "Telemetry" -> "Konnektr.IoT.Telemetry")

  val PropertyEventType = "Konnektr.Graph.Property.Event"
  val TwinLifecycleType = "Konnektr.Graph.Twin.Lifecycle"
  val RelationshipLifecycleType = "Konnektr.Graph.Relationship.Lifecycle"

  private def detId(parts: String*): String =
    java.util.UUID.nameUUIDFromBytes(parts.mkString("|").getBytes("UTF-8")).toString

  private def parse(s: String): ObjectNode =
    if (s == null) null else Json.parse(s).asInstanceOf[ObjectNode]

  private def textAt(n: JsonNode, ptr: String): String =
    if (n == null) null else Json.get(n, ptr).map(_.asText()).orNull

  // ---------------- EventNotification ----------------

  def eventNotification(ev: MutationEvent, source: String): Seq[CloudEvent] = {
    val oldDoc = parse(ev.oldJson)
    val newDoc = parse(ev.newJson)
    def envelope(tpe: String, subject: String, data: JsonNode) =
      CloudEvent(detId(ev.seq.toString, tpe, subject), source, tpe, subject,
        ev.ts, "application/json", Json.render(data))
    ev.eventType match {
      case "TwinCreate" =>
        Seq(envelope(EventNotificationTypes("TwinCreate"),
          textAt(newDoc, "/$dtId"), newDoc))
      case "TwinDelete" =>
        Seq(envelope(EventNotificationTypes("TwinDelete"),
          textAt(oldDoc, "/$dtId"), oldDoc))
      case "TwinUpdate" =>
        val patch = enhance(JsonPatch.diff(oldDoc, newDoc), newDoc)
        val body = Json.obj()
        body.put("modelId", textAt(newDoc, "/$metadata/$model"))
        body.set[JsonNode]("patch", Json.parse(JsonPatch.render(patch)))
        Seq(envelope(EventNotificationTypes("TwinUpdate"),
          textAt(newDoc, "/$dtId"), body))
      case "RelationshipCreate" =>
        Seq(envelope(EventNotificationTypes("RelationshipCreate"),
          s"${textAt(newDoc, "/$sourceId")}/relationships/${textAt(newDoc, "/$relationshipId")}",
          newDoc))
      case "RelationshipDelete" =>
        Seq(envelope(EventNotificationTypes("RelationshipDelete"),
          s"${textAt(oldDoc, "/$sourceId")}/relationships/${textAt(oldDoc, "/$relationshipId")}",
          oldDoc))
      case "RelationshipUpdate" =>
        val patch = JsonPatch.diff(oldDoc, newDoc) // no enhancement for rels (ref :238)
        val body = Json.obj()
        body.put("modelId", textAt(newDoc, "/$metadata/$model"))
        body.set[JsonNode]("patch", Json.parse(JsonPatch.render(patch)))
        Seq(envelope(EventNotificationTypes("RelationshipUpdate"),
          s"${textAt(newDoc, "/$sourceId")}/relationships/${textAt(newDoc, "/$relationshipId")}",
          body))
      case "Telemetry" =>
        val subject = Option(textAt(newDoc, "/componentName")) match {
          case Some(c) => s"${textAt(newDoc, "/digitalTwinId")}/components/$c"
          case None => textAt(newDoc, "/digitalTwinId")
        }
        // payload is the telemetry property itself (whole envelope only as
        // fallback) and the id is the producer's messageId when present —
        // CloudEventFactory.cs:763-797 (CreateTelemetryEvents)
        val payload = Json.get(newDoc, "/telemetry").getOrElse(newDoc)
        val tpe = EventNotificationTypes("Telemetry")
        val id = Option(textAt(newDoc, "/messageId"))
          .getOrElse(detId(ev.seq.toString, tpe, subject))
        Seq(CloudEvent(id, source, tpe, subject, ev.ts, "application/json",
          Json.render(payload),
          dataschema = textAt(newDoc, "/modelId")))
      case other => throw new IllegalArgumentException(s"unknown eventType $other")
    }
  }

  // ---------------- DataHistory ----------------

  def dataHistory(ev: MutationEvent, source: String,
      trackLastUpdatedBy: Boolean = false): Seq[CloudEvent] = {
    val oldDoc = parse(ev.oldJson)
    val newDoc = parse(ev.newJson)
    ev.eventType match {
      case "TwinCreate" | "TwinDelete" =>
        twinLifecycle(ev, source, oldDoc, newDoc) ++
          propertyEventsFromPatch(ev, source, oldDoc, newDoc, trackLastUpdatedBy)
      case "RelationshipCreate" | "RelationshipDelete" =>
        relationshipLifecycle(ev, source, oldDoc, newDoc) ++
          propertyEventsFromPatch(ev, source, oldDoc, newDoc, trackLastUpdatedBy)
      case "TwinUpdate" | "RelationshipUpdate" =>
        val modelChanged = ev.eventType == "TwinUpdate" &&
          textAt(newDoc, "/$metadata/$model") != textAt(oldDoc, "/$metadata/$model")
        val extra = if (modelChanged) {
          val body = Json.obj()
          body.put("twinId", textAt(newDoc, "/$dtId"))
          body.put("action", "Update")
          body.put("timeStamp", ev.ts)
          body.put("serviceId", source)
          body.put("modelId", textAt(newDoc, "/$metadata/$model"))
          Seq(CloudEvent(detId(ev.seq.toString, TwinLifecycleType, "modelchange"),
            source, TwinLifecycleType, textAt(newDoc, "/$dtId"), ev.ts,
            "application/json", Json.render(body)))
        } else Nil
        extra ++ propertyEventsFromPatch(ev, source, oldDoc, newDoc, trackLastUpdatedBy)
      case "Telemetry" => Nil
      case other => throw new IllegalArgumentException(s"unknown eventType $other")
    }
  }

  private def twinLifecycle(ev: MutationEvent, source: String,
      oldDoc: JsonNode, newDoc: JsonNode): Seq[CloudEvent] = {
    val doc = if (newDoc != null) newDoc else oldDoc
    val body = Json.obj()
    body.put("twinId", textAt(doc, "/$dtId"))
    body.put("action", if (ev.eventType == "TwinCreate") "Create" else "Delete")
    body.put("timeStamp", ev.ts)
    body.put("serviceId", source)
    body.put("modelId", textAt(doc, "/$metadata/$model"))
    Seq(CloudEvent(detId(ev.seq.toString, TwinLifecycleType),
      source, TwinLifecycleType, textAt(doc, "/$dtId"), ev.ts,
      "application/json", Json.render(body)))
  }

  private def relationshipLifecycle(ev: MutationEvent, source: String,
      oldDoc: JsonNode, newDoc: JsonNode): Seq[CloudEvent] = {
    val doc = if (newDoc != null) newDoc else oldDoc
    val body = Json.obj()
    body.put("relationshipId", textAt(doc, "/$relationshipId"))
    body.put("action", if (ev.eventType == "RelationshipCreate") "Create" else "Delete")
    body.put("timeStamp", ev.ts)
    body.put("serviceId", source)
    body.put("name", textAt(doc, "/$relationshipName"))
    body.put("source", textAt(doc, "/$sourceId"))
    body.put("target", textAt(doc, "/$targetId"))
    val subject = s"${textAt(doc, "/$sourceId")}/relationships/${textAt(doc, "/$relationshipId")}"
    Seq(CloudEvent(detId(ev.seq.toString, RelationshipLifecycleType),
      source, RelationshipLifecycleType, subject, ev.ts,
      "application/json", Json.render(body)))
  }

  /** Property events: one per non-`$` patch op, nested paths flattened with
    * `_`; Create/Delete events diff against an empty doc so every property
    * yields an event. */
  private def propertyEventsFromPatch(ev: MutationEvent, source: String,
      oldDoc: JsonNode, newDoc: JsonNode, trackLastUpdatedBy: Boolean)
      : Seq[CloudEvent] = {
    val effOld = if (oldDoc == null) Json.obj() else oldDoc
    val effNew = if (newDoc == null) Json.obj() else newDoc
    val rawPatch = JsonPatch.diff(effOld, effNew)
    val patch = enhance(rawPatch, effNew)
    val doc = if (newDoc != null) newDoc else oldDoc
    patch.flatMap { op =>
      val key = Json.splitPointer(op.path).mkString("_")
      if (key.isEmpty || key.startsWith("$")) None
      else {
        val body = Json.obj()
        body.put("timeStamp", ev.ts)
        body.put("serviceId", source)
        val id = Option(textAt(doc, "/$dtId")).getOrElse(textAt(doc, "/$sourceId"))
        body.put("id", id)
        body.put("modelId", textAt(doc, "/$metadata/$model"))
        body.put("key", key)
        if (op.value != null) body.set[JsonNode]("value", op.value.deepCopy[JsonNode]())
        body.put("relationshipTarget", textAt(doc, "/$targetId"))
        body.put("relationshipId", textAt(doc, "/$relationshipId"))
        body.put("action", op.op match {
          case "add" => "Create"
          case "remove" => "Delete"
          case "replace" => "Update"
          case _ => "unknown"
        })
        val metaPath = "/$metadata/" + Json.splitPointer(op.path).mkString("/")
        rawPatch.find(_.path == s"$metaPath/sourceTime")
          .foreach(st => body.set[JsonNode]("sourceTimeStamp", st.value))
        if (trackLastUpdatedBy)
          rawPatch.find(_.path == s"$metaPath/lastUpdatedBy")
            .foreach(lu => body.set[JsonNode]("updatedBy", lu.value))
        val relId = textAt(doc, "/$relationshipId")
        val subject = if (relId == null || relId.isEmpty) id
          else s"$id/relationships/$relId"
        Some(CloudEvent(detId(ev.seq.toString, PropertyEventType, key),
          source, PropertyEventType, subject, ev.ts,
          "application/json", Json.render(body)))
      }
    }
  }

  /** Same-value-update enhancement (CloudEventFactory.cs:655-714): a
    * `$metadata/<p>/lastUpdateTime` change without an explicit op on /<p>
    * synthesizes `replace /<p>` with the current value; `$etag`/`$dtId`
    * ops are dropped when any synthesis occurs. */
  def enhance(patch: Seq[PatchOp], newDoc: JsonNode): Seq[PatchOp] = {
    val explicit = patch.flatMap(op => Json.splitPointer(op.path) match {
      case first :: _ if first != "$metadata" => Some(first)
      case _ => None
    }).toSet
    val additional = patch.flatMap { op =>
      Json.splitPointer(op.path) match {
        case "$metadata" :: prop :: rest
            if rest.headOption.contains("lastUpdateTime") && !explicit(prop) =>
          Option(newDoc.get(prop)).map(v =>
            PatchOp("replace", s"/${Json.escapeToken(prop)}", v.deepCopy[JsonNode]()))
        case _ => None
      }
    }
    if (additional.isEmpty) patch
    else patch.filter(op => Json.splitPointer(op.path).headOption match {
      case Some("$etag") | Some("$dtId") => false
      case _ => true
    }) ++ additional
  }
}
