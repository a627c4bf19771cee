package graft.dtdl

import com.fasterxml.jackson.databind.JsonNode
import graft.json.Json
import scala.jdk.CollectionConverters._

/** DTDL v2-v4 subset: the JSON-level feature set the reference actually
  * exercises (Interface, extends, Property with primitive/Object/Array/Map/
  * Enum schemas, Relationship, Component, Telemetry) — full DTDLParser
  * conformance is explicitly out of scope (SURVEY §7 hard-part 5).
  *
  * Reference behavior reproduced: model parsing + bases/descendants closure
  * (/root/reference/src/AgeDigitalTwins/AgeDigitalTwinsClient.Models.cs:248-540)
  * and write-time property validation
  * (AgeDigitalTwinsClient.DigitalTwins.cs:266-457).
  */
sealed trait DtdlSchema {
  /** Validate a JSON value instance against this schema. */
  def validate(v: JsonNode): Either[String, Unit]
}

case class PrimitiveSchema(name: String) extends DtdlSchema {
  def validate(v: JsonNode): Either[String, Unit] = name match {
    case "string" | "dateTime" | "date" | "time" | "duration" =>
      if (v.isTextual) Right(()) else Left(s"expected $name, got ${v.getNodeType}")
    case "double" | "float" | "integer" | "long" =>
      if (v.isNumber) Right(()) else Left(s"expected $name, got ${v.getNodeType}")
    case "boolean" =>
      if (v.isBoolean) Right(()) else Left(s"expected boolean, got ${v.getNodeType}")
    case _ => Right(()) // unknown primitive: accept (forward compat)
  }
}

case class ObjectSchema(fields: Map[String, DtdlSchema]) extends DtdlSchema {
  def validate(v: JsonNode): Either[String, Unit] = {
    if (!v.isObject) return Left(s"expected Object, got ${v.getNodeType}")
    v.properties().asScala.foldLeft[Either[String, Unit]](Right(())) { (acc, e) =>
      acc.flatMap { _ =>
        fields.get(e.getKey) match {
          case Some(fs) => fs.validate(e.getValue).left.map(m => s"field '${e.getKey}': $m")
          case None => Left(s"field '${e.getKey}' is not defined in the object schema")
        }
      }
    }
  }
}

case class ArraySchema(element: DtdlSchema) extends DtdlSchema {
  def validate(v: JsonNode): Either[String, Unit] = {
    if (!v.isArray) return Left(s"expected Array, got ${v.getNodeType}")
    v.elements().asScala.zipWithIndex.foldLeft[Either[String, Unit]](Right(())) {
      case (acc, (el, i)) =>
        acc.flatMap(_ => element.validate(el).left.map(m => s"[$i]: $m"))
    }
  }
}

case class MapSchema(value: DtdlSchema) extends DtdlSchema {
  def validate(v: JsonNode): Either[String, Unit] = {
    if (!v.isObject) return Left(s"expected Map, got ${v.getNodeType}")
    v.properties().asScala.foldLeft[Either[String, Unit]](Right(())) { (acc, e) =>
      acc.flatMap(_ => value.validate(e.getValue).left.map(m => s"['${e.getKey}']: $m"))
    }
  }
}

case class EnumSchema(values: Set[String]) extends DtdlSchema {
  def validate(v: JsonNode): Either[String, Unit] =
    if (values.isEmpty || values.contains(v.asText())) Right(())
    else Left(s"value '${v.asText()}' not in enum")
}

case object AnySchema extends DtdlSchema {
  def validate(v: JsonNode): Either[String, Unit] = Right(())
}

final case class DtdlInterface(
    id: String,
    extendsIds: Seq[String],
    properties: Map[String, DtdlSchema],
    relationships: Map[String, Option[String]], // name -> target model (if any)
    components: Map[String, String],            // name -> component model id
    telemetry: Set[String],
    displayName: Option[String],
    raw: String)

object Dtdl {

  def parseSchema(n: JsonNode): DtdlSchema = {
    if (n == null || n.isNull) AnySchema
    else if (n.isTextual) PrimitiveSchema(n.asText())
    else if (n.isObject) {
      val t = Option(n.get("@type")).map(typeNames).getOrElse(Nil)
      if (t.contains("Object")) {
        val fields = Option(n.get("fields")).map(_.elements().asScala.map { f =>
          f.get("name").asText() -> parseSchema(f.get("schema"))
        }.toMap).getOrElse(Map.empty)
        ObjectSchema(fields)
      } else if (t.contains("Array")) {
        ArraySchema(parseSchema(n.get("elementSchema")))
      } else if (t.contains("Map")) {
        MapSchema(Option(n.get("mapValue")).map(mv => parseSchema(mv.get("schema")))
          .getOrElse(AnySchema))
      } else if (t.contains("Enum")) {
        val vals = Option(n.get("enumValues")).map(_.elements().asScala
          .flatMap(ev => Option(ev.get("enumValue")).map(_.asText())).toSet)
          .getOrElse(Set.empty[String])
        EnumSchema(vals)
      } else AnySchema
    } else AnySchema
  }

  private def typeNames(t: JsonNode): Seq[String] =
    if (t.isTextual) Seq(t.asText())
    else if (t.isArray) t.elements().asScala.map(_.asText()).toSeq
    else Nil

  def parseInterface(dtdlJson: String): Either[String, DtdlInterface] = {
    val n = Json.tryParse(dtdlJson).getOrElse(return Left("invalid JSON"))
    val id = Option(n.get("@id")).map(_.asText())
      .getOrElse(return Left("missing @id"))
    if (!Option(n.get("@type")).exists(t => typeNames(t).contains("Interface")))
      return Left(s"model $id: @type must be Interface")
    val ext = Option(n.get("extends")).map { e =>
      if (e.isTextual) Seq(e.asText()) else e.elements().asScala.map(_.asText()).toSeq
    }.getOrElse(Nil)
    var props = Map.empty[String, DtdlSchema]
    var rels = Map.empty[String, Option[String]]
    var comps = Map.empty[String, String]
    var telem = Set.empty[String]
    Option(n.get("contents")).foreach(_.elements().asScala.foreach { c =>
      val ts = Option(c.get("@type")).map(typeNames).getOrElse(Nil)
      val name = Option(c.get("name")).map(_.asText()).getOrElse("")
      if (ts.contains("Property")) props += name -> parseSchema(c.get("schema"))
      else if (ts.contains("Relationship"))
        rels += name -> Option(c.get("target")).map(_.asText())
      else if (ts.contains("Component"))
        comps += name -> Option(c.get("schema")).map(_.asText()).getOrElse("")
      else if (ts.contains("Telemetry")) telem += name
    })
    Right(DtdlInterface(id, ext, props, rels, comps, telem,
      Option(n.get("displayName")).map(_.asText()), dtdlJson))
  }

  /** Transitive bases per model (the reference computes this at upload,
    * Models.cs:276-299) — iterative expansion, cycle-safe. */
  def computeBases(models: Map[String, DtdlInterface]): Map[String, Seq[String]] =
    models.map { case (id, m) =>
      val seen = collection.mutable.LinkedHashSet[String]()
      def walk(cur: String): Unit =
        models.get(cur).foreach(_.extendsIds.foreach { b =>
          if (!seen.contains(b)) { seen += b; walk(b) }
        })
      walk(id)
      id -> seen.toSeq
    }

  /** Inverse closure: descendants per model (Models.cs:304-324). */
  def computeDescendants(bases: Map[String, Seq[String]]): Map[String, Seq[String]] = {
    val desc = collection.mutable.Map[String, Vector[String]]().withDefaultValue(Vector())
    for ((id, bs) <- bases.toSeq.sortBy(_._1); b <- bs)
      desc(b) = desc(b) :+ id
    bases.keys.map(id => id -> desc(id).sorted.toSeq).toMap
  }
}

/** TTL-cached view over a model source (the reference's model cache:
  * AgeDigitalTwinsClient.cs:21-23,162 — model JSON cached 10 s, so a model
  * uploaded by ANOTHER writer becomes visible to validation within the TTL
  * without rebuilding anything). `loader` re-reads the authoritative model
  * set (e.g. the models table of a shared [[graft.store.GraphStore]]
  * layout); a long-lived session pays one reload per TTL window, not one
  * per validation. */
final class CachedModelRegistry(loader: () => ModelRegistry,
    ttlMillis: Long = 10000L, nowMs: () => Long = () => System.currentTimeMillis()) {
  @volatile private var cached: ModelRegistry = _
  @volatile private var loadedAt: Long = Long.MinValue
  @volatile private var loads: Long = 0L

  /** The registry snapshot, reloading when stale. */
  def current: ModelRegistry = {
    val now = nowMs()
    if (cached == null || now - loadedAt >= ttlMillis) synchronized {
      if (cached == null || nowMs() - loadedAt >= ttlMillis) {
        cached = loader(); loadedAt = nowMs(); loads += 1
      }
    }
    cached
  }

  /** Drop the snapshot so the next access reloads (the reference's
    * cache-invalidate-on-own-write path). */
  def invalidate(): Unit = synchronized { cached = null }

  def loadCount: Long = loads
  def validateTwin(doc: JsonNode): Either[String, Unit] = current.validateTwin(doc)
}

/** A resolved model set with closures — the engine-side analogue of the
  * reference's models vertex table + cache. */
final case class ModelRegistry(models: Map[String, DtdlInterface]) {
  lazy val bases: Map[String, Seq[String]] = Dtdl.computeBases(models)
  lazy val descendants: Map[String, Seq[String]] = Dtdl.computeDescendants(bases)

  def chain(modelId: String): Seq[DtdlInterface] =
    (modelId +: bases.getOrElse(modelId, Nil)).flatMap(models.get)

  /** Effective property/relationship/component surface incl. inheritance. */
  def propertySchema(modelId: String, prop: String): Option[DtdlSchema] =
    chain(modelId).iterator.flatMap(_.properties.get(prop)).nextOption()
  def componentModel(modelId: String, comp: String): Option[String] =
    chain(modelId).iterator.flatMap(_.components.get(comp)).nextOption()
  def hasRelationship(modelId: String, name: String): Boolean =
    chain(modelId).exists(_.relationships.contains(name))
  def isTelemetry(modelId: String, name: String): Boolean =
    chain(modelId).exists(_.telemetry.contains(name))

  /** Validate a twin document against its declared model: every
    * non-`$` property must be a defined Property (type-checked) or
    * Component (validated against the component model). Mirrors
    * DigitalTwins.cs:266-457 incl. its error strings. */
  def validateTwin(doc: JsonNode): Either[String, Unit] = {
    val modelId = Json.get(doc, "/$metadata/$model")
      .map(_.asText())
      .getOrElse(return Left("$metadata.$model is required"))
    if (!models.contains(modelId)) return Left(s"Model $modelId does not exist")
    doc.properties().asScala.foldLeft[Either[String, Unit]](Right(())) { (acc, e) =>
      acc.flatMap { _ =>
        val k = e.getKey
        if (k.startsWith("$")) Right(())
        else propertySchema(modelId, k) match {
          case Some(schema) =>
            schema.validate(e.getValue).left.map(m => s"Property '$k': $m")
          case None =>
            componentModel(modelId, k) match {
              case Some(compModel) =>
                val compDoc = e.getValue
                if (!compDoc.isObject) Left(s"Component '$k' must be an object")
                else compDoc.properties().asScala
                  .filterNot(_.getKey.startsWith("$"))
                  .foldLeft[Either[String, Unit]](Right(())) { (a2, ce) =>
                    a2.flatMap { _ =>
                      propertySchema(compModel, ce.getKey) match {
                        case Some(s) => s.validate(ce.getValue)
                          .left.map(m => s"Component '$k' property '${ce.getKey}': $m")
                        case None =>
                          Left(s"Property '${ce.getKey}' is not defined in the model $compModel")
                      }
                    }
                  }
              case None => Left(s"Property '$k' is not defined in the model")
            }
        }
      }
    }
  }
}
