package graft.dtdl

import com.fasterxml.jackson.databind.JsonNode
import graft.json.Json
import scala.jdk.CollectionConverters._

/** DTDL v2-v4 subset: the JSON-level feature set the reference actually
  * exercises (Interface, extends, Property with primitive/Object/Array/Map/
  * Enum schemas, Relationship, Component, Telemetry), plus the three
  * DTDLParser conformance features beyond that subset: semantic
  * (quantitative) co-types with `unit` validation, and interface-level
  * `schemas` definitions referenced by `@id` — full DTDLParser conformance
  * remains out of scope (SURVEY §7 hard-part 5).
  *
  * Reference behavior reproduced: model parsing + bases/descendants closure
  * (/root/reference/src/AgeDigitalTwins/AgeDigitalTwinsClient.Models.cs:248-540)
  * and write-time property validation
  * (AgeDigitalTwins.DigitalTwins.cs:266-457); the semantic-type sample the
  * reference tests against is the `["Property","Humidity"]` +
  * `"unit":"gramPerCubicMetre"` content of
  * AgeDigitalTwins.Test/SampleData.cs:37-41 (context
  * `dtmi:dtdl:extension:quantitativeTypes;1`).
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

/** DTDL Enum: a closed value set with a declared `valueSchema` (integer |
  * string, DTDL v2+). An instance value must BOTH be of the valueSchema's
  * JSON type and match a member — DTDLParser semantics (the reference
  * delegates enum checking to it via Validation/,
  * /root/reference/src/AgeDigitalTwins/AgeDigitalTwinsClient.cs:71), so a
  * string "1" does not satisfy an integer enum and 1 does not satisfy a
  * string enum of "1". */
case class EnumSchema(valueSchema: String, values: Set[String]) extends DtdlSchema {
  def validate(v: JsonNode): Either[String, Unit] = {
    val typeOk = valueSchema match {
      case "integer" => v.isIntegralNumber
      case "string"  => v.isTextual
      case _         => true // lenient on exotic valueSchemas (fwd compat)
    }
    if (!typeOk)
      Left(s"enum value $v is not of valueSchema '$valueSchema'")
    else if (values.isEmpty || values.contains(v.asText())) Right(())
    else Left(s"value '${v.asText()}' not in enum")
  }
}

/** DTDL standard geospatial schema (`dtmi:standard:schema:geospatial:*`,
  * DTDL v2+): values are GeoJSON geometry objects (RFC 7946) — a `type`
  * tag matching the declared kind and a `coordinates` nesting of
  * positions (arrays of 2-3 numbers). The reference inherits these from
  * DTDLParser (`MaxDtdlVersion=4` at
  * /root/reference/src/AgeDigitalTwins/AgeDigitalTwinsClient.cs:71); its
  * own tests never exercise them, so this follows the public DTDL/GeoJSON
  * specs directly. */
case class GeoSchema(kind: String) extends DtdlSchema {
  private def pos(v: JsonNode): Either[String, Unit] =
    if (v.isArray && (v.size == 2 || v.size == 3) &&
      v.elements().asScala.forall(_.isNumber)) Right(())
    else Left(s"expected a GeoJSON position ([lon, lat] or [lon, lat, alt]), got $v")
  private def arrayOf(v: JsonNode, min: Int, what: String,
      each: JsonNode => Either[String, Unit]): Either[String, Unit] =
    if (!v.isArray) Left(s"expected an array of $what, got ${v.getNodeType}")
    else if (v.size < min) Left(s"$kind requires at least $min $what, got ${v.size}")
    else v.elements().asScala.map(each).collectFirst { case l @ Left(_) => l }
      .getOrElse(Right(()))
  private def ring(v: JsonNode): Either[String, Unit] =
    arrayOf(v, 4, "positions (a linear ring)", pos).flatMap { _ =>
      // Closure is a NUMERIC comparison: Jackson's JsonNode.equals is
      // numeric-type-sensitive (IntNode(0) != DoubleNode(0.0)), which
      // would reject a spec-valid ring like [[0,0],...,[0.0,0.0]].
      val first = v.get(0); val last = v.get(v.size - 1)
      val closed = first.size == last.size &&
        (0 until first.size).forall(i =>
          first.get(i).asDouble() == last.get(i).asDouble())
      if (closed) Right(())
      else Left("a polygon linear ring must be closed (first position = last)")
    }
  private def coords(v: JsonNode): Either[String, Unit] = kind match {
    case "point"           => pos(v)
    case "multiPoint"      => arrayOf(v, 1, "positions", pos)
    case "lineString"      => arrayOf(v, 2, "positions", pos)
    case "multiLineString" => arrayOf(v, 1, "line strings",
      arrayOf(_, 2, "positions", pos))
    case "polygon"         => arrayOf(v, 1, "linear rings", ring)
    case "multiPolygon"    => arrayOf(v, 1, "polygons",
      arrayOf(_, 1, "linear rings", ring))
    case _ => Right(()) // unknown geospatial kind: accept (forward compat)
  }
  private val geoType = kind.capitalize // GeoJSON type tags are UpperCamel
  def validate(v: JsonNode): Either[String, Unit] = {
    if (!v.isObject)
      return Left(s"expected a GeoJSON $geoType object, got ${v.getNodeType}")
    val t = Option(v.get("type")).filter(_.isTextual).map(_.asText())
    if (!t.contains(geoType))
      return Left(s"GeoJSON type must be '$geoType', got ${t.getOrElse("<missing>")}")
    Option(v.get("coordinates")) match {
      case None => Left("GeoJSON geometry requires 'coordinates'")
      case Some(c) => coords(c)
    }
  }
}

case object AnySchema extends DtdlSchema {
  def validate(v: JsonNode): Either[String, Unit] = Right(())
}

/** A Relationship declaration: optional target model plus the schema of
  * every property declared ON the relationship (DTDL `properties` array —
  * the reference's Planet.satellites carries a `Distance` double,
  * AgeDigitalTwins.Test/SampleData.cs). */
final case class RelationshipDef(
    target: Option[String],
    properties: Map[String, DtdlSchema])

/** A Command declaration: request/response payload names (payload schemas
  * are validated at upload like Property schemas, but commands carry no
  * runtime semantics here — the reference stores and validates them
  * without executing anything either). */
final case class CommandDef(
    request: Option[String],
    response: Option[String])

final case class DtdlInterface(
    id: String,
    extendsIds: Seq[String],
    properties: Map[String, DtdlSchema],
    relationships: Map[String, RelationshipDef],
    components: Map[String, String],            // name -> component model id
    telemetry: Set[String],
    displayName: Option[String],
    raw: String,
    commands: Map[String, CommandDef] = Map.empty,
    // declared `writable` flags on Property/Relationship contents (DTDL
    // metadata; the reference's write path — like Azure DT — accepts
    // writes regardless, so this is parsed/validated/exposed, not
    // enforced as a write guard)
    writable: Map[String, Boolean] = Map.empty)

object Dtdl {

  /** The DTDL quantitativeTypes extension, exercised subset: semantic
    * co-type → units it admits (DTDLParser validates unit membership; we
    * validate against this table and accept unknown co-types untouched for
    * forward compatibility). */
  val QuantitativeUnits: Map[String, Set[String]] = Map(
    "Temperature" -> Set("degreeCelsius", "degreeFahrenheit", "kelvin"),
    "Humidity" -> Set("gramPerCubicMetre", "kilogramPerCubicMetre"),
    "RelativeHumidity" -> Set("percent", "unity"),
    "Pressure" -> Set("pascal", "kilopascal", "bar", "millibar",
      "poundPerSquareInch"),
    "Distance" -> Set("metre", "centimetre", "millimetre", "kilometre",
      "mile", "foot", "inch"),
    "Length" -> Set("metre", "centimetre", "millimetre", "kilometre",
      "mile", "foot", "inch"),
    "Velocity" -> Set("metrePerSecond", "kilometrePerHour", "milePerHour",
      "knot"),
    "Acceleration" -> Set("metrePerSecondSquared", "gForce"),
    "Mass" -> Set("kilogram", "gram", "milligram", "tonne", "pound",
      "ounce"),
    "Angle" -> Set("degreeOfArc", "radian", "minuteOfArc", "secondOfArc"),
    "TimeSpan" -> Set("second", "millisecond", "microsecond", "minute",
      "hour", "day"),
    "Frequency" -> Set("hertz", "kilohertz", "megahertz", "gigahertz"),
    "Power" -> Set("watt", "kilowatt", "megawatt", "horsepower"),
    "Energy" -> Set("joule", "kilojoule", "kilowattHour",
      "electronvolt"),
    "Current" -> Set("ampere", "milliampere", "microampere"),
    "Voltage" -> Set("volt", "millivolt", "kilovolt"),
    "Illuminance" -> Set("lux", "footcandle"),
    "Luminosity" -> Set("candelaPerSquareMetre"),
    "DataSize" -> Set("bit", "byte", "kibibyte", "mebibyte", "gibibyte",
      "kilobyte", "megabyte", "gigabyte"),
    "DataRate" -> Set("bitPerSecond", "kibibitPerSecond",
      "bytePerSecond", "megabitPerSecond"),
    "Volume" -> Set("cubicMetre", "litre", "millilitre", "gallon",
      "fluidOunce"),
    "Area" -> Set("squareMetre", "squareCentimetre", "squareKilometre",
      "acre", "hectare"),
    "AngularAcceleration" -> Set("radianPerSecondSquared"),
    "AngularVelocity" -> Set("radianPerSecond", "degreePerSecond",
      "revolutionPerSecond", "revolutionPerMinute"),
    "Capacitance" -> Set("farad", "millifarad", "microfarad", "nanofarad",
      "picofarad"),
    "Density" -> Set("kilogramPerCubicMetre", "gramPerCubicMetre"),
    "ElectricCharge" -> Set("coulomb"),
    "Force" -> Set("newton", "pound", "ounce", "ton"),
    "Inductance" -> Set("henry", "millihenry", "microhenry"),
    "Latitude" -> Set("degreeOfArc", "minuteOfArc", "secondOfArc",
      "radian"),
    "Longitude" -> Set("degreeOfArc", "minuteOfArc", "secondOfArc",
      "radian"),
    "Luminance" -> Set("candelaPerSquareMetre"),
    "LuminousFlux" -> Set("lumen"),
    "LuminousIntensity" -> Set("candela"),
    "MagneticFlux" -> Set("weber", "maxwell"),
    "MagneticInduction" -> Set("tesla"),
    "MassFlowRate" -> Set("gramPerSecond", "kilogramPerSecond",
      "gramPerHour", "kilogramPerHour"),
    "Resistance" -> Set("ohm", "milliohm", "kiloohm", "megaohm"),
    "SoundPressure" -> Set("decibel", "bel"),
    "Thrust" -> Set("newton", "pound", "ounce", "ton"),
    "Torque" -> Set("newtonMetre"),
    "VolumeFlowRate" -> Set("litrePerSecond", "millilitrePerSecond",
      "litrePerHour", "millilitrePerHour"))

  /** Structural content @type values — everything else on a content node
    * is an adjunct co-type (semantic or from an unknown extension). */
  private val StructuralContentTypes =
    Set("Property", "Telemetry", "Relationship", "Component", "Command")

  private val NumericPrimitives =
    Set("double", "float", "integer", "long")

  /** Standard geospatial schema DTMIs (any DTDL version suffix). */
  private val GeoDtmi = "dtmi:standard:schema:geospatial:([A-Za-z]+);\\d+".r

  def parseSchema(n: JsonNode): DtdlSchema = parseSchema(n, Map.empty)

  /** Parse a schema node; textual `dtmi:` values resolve through `defs`
    * (the interface's `schemas` registry) — an unresolvable reference
    * parses to [[AnySchema]] only when `defs` is empty (legacy lenient
    * path); [[parseInterface]] pre-validates references and fails the
    * model instead. */
  def parseSchema(n: JsonNode, defs: Map[String, DtdlSchema]): DtdlSchema = {
    if (n == null || n.isNull) AnySchema
    else if (n.isTextual) {
      val name = n.asText()
      name match {
        // standard geospatial schemas resolve before user definitions:
        // the dtmi:standard: namespace is reserved by the DTDL spec
        case GeoDtmi(kind) => GeoSchema(kind)
        case _ if name.startsWith("dtmi:") => defs.getOrElse(name, AnySchema)
        case _ => PrimitiveSchema(name)
      }
    } else if (n.isObject) {
      val t = Option(n.get("@type")).map(typeNames).getOrElse(Nil)
      if (t.contains("Object")) {
        val fields = Option(n.get("fields")).map(_.elements().asScala.map { f =>
          f.get("name").asText() -> parseSchema(f.get("schema"), defs)
        }.toMap).getOrElse(Map.empty)
        ObjectSchema(fields)
      } else if (t.contains("Array")) {
        ArraySchema(parseSchema(n.get("elementSchema"), defs))
      } else if (t.contains("Map")) {
        MapSchema(Option(n.get("mapValue"))
          .map(mv => parseSchema(mv.get("schema"), defs))
          .getOrElse(AnySchema))
      } else if (t.contains("Enum")) {
        val vals = Option(n.get("enumValues")).map(_.elements().asScala
          .flatMap(ev => Option(ev.get("enumValue")).map(_.asText())).toSet)
          .getOrElse(Set.empty[String])
        // valueSchema is required by the spec (integer | string). When a
        // spec-sloppy model omits it, defaulting to "string" would start
        // rejecting integer-valued enums that validated before typed
        // checking landed — so an ABSENT valueSchema stays untyped
        // (membership-only), and only a DECLARED one enforces its type.
        val vs = Option(n.get("valueSchema")).filter(_.isTextual)
          .map(_.asText()).getOrElse("")
        EnumSchema(vs, vals)
      } else AnySchema
    } else AnySchema
  }

  /** Parse the interface-level `schemas` member (reusable schema
    * definitions keyed by `@id`, DTDL v2+). Definitions may reference each
    * other; resolution iterates to a fixpoint so ordering doesn't matter,
    * and a cyclic reference fails rather than recursing. Returns the
    * registry or the first error. */
  def parseSchemaDefs(n: JsonNode): Either[String, Map[String, DtdlSchema]] = {
    if (n == null || n.isNull) return Right(Map.empty)
    if (!n.isArray) return Left("'schemas' must be an array")
    val nodes = n.elements().asScala.toSeq
    val byId = nodes.map { d =>
      Option(d.get("@id")).map(_.asText())
        .getOrElse(return Left("schema definition missing @id")) -> d
    }
    if (byId.map(_._1).distinct.size != byId.size)
      return Left("duplicate schema definition @id")
    byId.foreach { case (id, d) =>
      validateSchemaNode(d) match {
        case Left(err) => return Left(s"schema definition $id: $err")
        case Right(()) =>
      }
    }
    // fixpoint: each pass parses definitions whose references all resolve
    var resolved = Map.empty[String, DtdlSchema]
    var pending = byId
    var progressed = true
    while (pending.nonEmpty && progressed) {
      val (ready, rest) = pending.partition { case (_, d) =>
        schemaRefs(d).forall(resolved.contains)
      }
      progressed = ready.nonEmpty
      resolved ++= ready.map { case (id, d) => id -> parseSchema(d, resolved) }
      pending = rest
    }
    if (pending.nonEmpty)
      Left(s"unresolvable (cyclic or undefined) schema reference in " +
        pending.map(_._1).sorted.mkString("[", ", ", "]"))
    else Right(resolved)
  }

  /** All `dtmi:` schema references inside a schema definition node that
    * must resolve through the user `schemas` registry — the reserved
    * standard namespace (geospatial) resolves intrinsically and is
    * excluded. */
  private def schemaRefs(n: JsonNode): Seq[String] = {
    if (n == null) Nil
    else if (n.isTextual) {
      val s = n.asText()
      if (s.startsWith("dtmi:") && !GeoDtmi.matches(s)) Seq(s) else Nil
    } else if (n.isObject)
      Seq("fields", "elementSchema", "mapValue", "schema")
        .flatMap(k => schemaRefs(n.get(k)))
    else if (n.isArray) n.elements().asScala.flatMap(schemaRefs).toSeq
    else Nil
  }

  private def typeNames(t: JsonNode): Seq[String] =
    if (t.isTextual) Seq(t.asText())
    else if (t.isArray) t.elements().asScala.map(_.asText()).toSeq
    else Nil

  /** Structural well-formedness of an inline schema node, recursing into
    * Object fields / Array elements / Map values. DTDL (v2 §Map, v3 §Map)
    * requires a Map to declare BOTH mapKey and mapValue, and the mapKey
    * schema MUST be string — DTDLParser rejects models violating either;
    * the lenient parseSchema fallback (missing mapValue → AnySchema) is
    * reserved for instance validation of legacy stored models, never for
    * model upload. */
  private[dtdl] def validateSchemaNode(n: JsonNode): Either[String, Unit] = {
    if (n == null || !n.isObject) return Right(())
    val t = Option(n.get("@type")).map(typeNames).getOrElse(Nil)
    if (t.contains("Map")) {
      val mk = n.get("mapKey")
      val mv = n.get("mapValue")
      if (mk == null || mv == null)
        return Left("Map schema requires both mapKey and mapValue")
      val keySchema = Option(mk.get("schema")).filter(_.isTextual).map(_.asText())
      if (!keySchema.contains("string"))
        return Left(s"Map mapKey schema must be 'string', got " +
          s"${keySchema.getOrElse("<missing>")}")
      if (mv.get("schema") == null)
        return Left("Map mapValue requires a schema")
      validateSchemaNode(mv.get("schema"))
    } else if (t.contains("Array")) {
      if (n.get("elementSchema") == null)
        Left("Array schema requires elementSchema")
      else validateSchemaNode(n.get("elementSchema"))
    } else if (t.contains("Object")) {
      val fields = Option(n.get("fields"))
        .map(_.elements().asScala.toSeq).getOrElse(Nil)
      fields.foldLeft[Either[String, Unit]](Right(())) { (acc, f) =>
        acc.flatMap(_ => validateSchemaNode(f.get("schema")))
      }
    } else Right(())
  }

  /** One DTMI path segment: starts with a letter, ends with a letter or
    * digit, interior may add digits/underscores (public DTDL spec,
    * "Digital Twin Model Identifier"). */
  private val DtmiSegment = "[A-Za-z](?:[A-Za-z0-9_]*[A-Za-z0-9])?"

  /** Full user DTMI: `dtmi:` scheme (case-sensitive), ≥1 colon-separated
    * segments, `;version` with major 1..999999999 (no leading zero) and
    * an optional DTDL-v3 `.minor`. */
  private val DtmiRe =
    (s"dtmi:$DtmiSegment(?::$DtmiSegment)*" +
      ";[1-9][0-9]{0,8}(?:\\.(?:0|[1-9][0-9]{0,8}))?").r

  /** DTMI well-formedness — the check DTDLParser applies to every model
    * identifier before resolution (reference
    * Validation/ParserDtmiResolverAsync.cs consumes parsed `Dtmi` values,
    * so a malformed id is rejected at parse time there; here it is a
    * typed model error). An Interface `@id` is additionally capped at 128
    * characters per the DTDL spec; other references use the 2048-char
    * general limit. */
  def validateDtmi(id: String, what: String,
      maxLen: Int = 2048): Either[String, Unit] =
    if (id.length > maxLen)
      Left(s"$what '${id.take(64)}…' exceeds $maxLen characters")
    else if (DtmiRe.matches(id)) Right(())
    else Left(s"$what '$id' is not a well-formed DTMI")

  def parseInterface(dtdlJson: String): Either[String, DtdlInterface] = {
    val n = Json.tryParse(dtdlJson).getOrElse(return Left("invalid JSON"))
    val id = Option(n.get("@id")).map(_.asText())
      .getOrElse(return Left("missing @id"))
    validateDtmi(id, "model @id", maxLen = 128) match {
      case Left(err) => return Left(err)
      case Right(()) =>
    }
    if (!Option(n.get("@type")).exists(t => typeNames(t).contains("Interface")))
      return Left(s"model $id: @type must be Interface")
    val ext = Option(n.get("extends")).map { e =>
      if (e.isTextual) Seq(e.asText()) else e.elements().asScala.map(_.asText()).toSeq
    }.getOrElse(Nil)
    ext.foreach { e =>
      validateDtmi(e, s"model $id: extends reference") match {
        case Left(err) => return Left(err)
        case Right(()) =>
      }
    }
    val defs = parseSchemaDefs(n.get("schemas")) match {
      case Right(d) => d
      case Left(err) => return Left(s"model $id: $err")
    }
    defs.keys.foreach { k =>
      validateDtmi(k, s"model $id: schema definition @id") match {
        case Left(err) => return Left(err)
        case Right(()) =>
      }
    }
    var props = Map.empty[String, DtdlSchema]
    var rels = Map.empty[String, RelationshipDef]
    var comps = Map.empty[String, String]
    var telem = Set.empty[String]
    var cmds = Map.empty[String, CommandDef]
    var writables = Map.empty[String, Boolean]
    val seenNames = scala.collection.mutable.Set.empty[String]
    Option(n.get("contents")).foreach(_.elements().asScala.foreach { c =>
      val ts = Option(c.get("@type")).map(typeNames).getOrElse(Nil)
      val name = Option(c.get("name")).map(_.asText()).getOrElse("")
      // DTDL: every content needs a name, unique within the interface —
      // DTDLParser rejects duplicates; silently last-wins would let a
      // Command shadow a Property (or vice versa) without a trace
      if (ts.exists(StructuralContentTypes.contains)) {
        if (name.isEmpty)
          return Left(s"model $id: content of type " +
            s"'${ts.mkString(",")}' is missing a name")
        if (!seenNames.add(name))
          return Left(s"model $id: duplicate content name '$name'")
      }
      // `writable` is DTDL metadata on Property/Relationship — parsed and
      // type-checked at upload (DTDLParser rejects non-boolean), exposed
      // via the interface, not enforced as a write guard (the reference
      // accepts writes to non-writable properties, like Azure DT)
      if (ts.contains("Property") || ts.contains("Relationship")) {
        Option(c.get("writable")).foreach { w =>
          if (!w.isBoolean)
            return Left(s"model $id: content '$name': writable must be a " +
              s"boolean, got ${w.getNodeType.toString.toLowerCase}")
          writables += name -> w.asBoolean()
        }
      }
      if (ts.contains("Property") || ts.contains("Telemetry")) {
        // every `schemas` @id reference — top-level OR nested inside an
        // inline Object/Array/Map — must resolve; a dangling reference is
        // a model error, not a silently accept-anything schema
        schemaRefs(c.get("schema")).filterNot(defs.contains).headOption
          .foreach(r => return Left(
            s"model $id: content '$name' references undefined schema '$r'"))
        validateSchemaNode(c.get("schema")) match {
          case Left(err) => return Left(s"model $id: content '$name': $err")
          case Right(()) =>
        }
        validateSemanticType(id, name, ts, c) match {
          case Left(err) => return Left(err)
          case Right(()) =>
        }
      }
      if (ts.contains("Property"))
        props += name -> parseSchema(c.get("schema"), defs)
      else if (ts.contains("Relationship")) {
        val target = Option(c.get("target")).map(_.asText())
        target.foreach { t =>
          validateDtmi(t, s"model $id: relationship '$name' target") match {
            case Left(err) => return Left(err)
            case Right(()) =>
          }
        }
        // DTDL `properties`: Property declarations scoped to the
        // relationship itself — same schema validation as twin-level
        // Property contents (dangling refs and malformed schemas are
        // model errors here too)
        var relProps = Map.empty[String, DtdlSchema]
        Option(c.get("properties")).foreach(_.elements().asScala.foreach { p =>
          val pts = Option(p.get("@type")).map(typeNames).getOrElse(Nil)
          val pname = Option(p.get("name")).map(_.asText()).getOrElse("")
          if (!pts.contains("Property"))
            return Left(s"model $id: relationship '$name' properties may " +
              s"only hold Property contents, got '${pts.mkString(",")}'")
          schemaRefs(p.get("schema")).filterNot(defs.contains).headOption
            .foreach(r => return Left(s"model $id: relationship '$name' " +
              s"property '$pname' references undefined schema '$r'"))
          validateSchemaNode(p.get("schema")) match {
            case Left(err) => return Left(
              s"model $id: relationship '$name' property '$pname': $err")
            case Right(()) =>
          }
          relProps += pname -> parseSchema(p.get("schema"), defs)
        })
        rels += name -> RelationshipDef(target, relProps)
      } else if (ts.contains("Component")) {
        val schema = Option(c.get("schema")).map(_.asText()).getOrElse("")
        if (schema.nonEmpty)
          validateDtmi(schema, s"model $id: component '$name' schema") match {
            case Left(err) => return Left(err)
            case Right(()) =>
          }
        comps += name -> schema
      }
      else if (ts.contains("Telemetry")) telem += name
      else if (ts.contains("Command")) {
        // request/response: optional CommandPayload objects. Payload
        // schemas get the same upload-time validation as Property schemas
        // (dangling refs and malformed shapes are model errors); no
        // runtime semantics — the reference's validator does the same.
        def payload(field: String): Either[String, Option[String]] =
          Option(c.get(field)) match {
            case None => Right(None)
            case Some(p) if !p.isObject =>
              Left(s"model $id: command '$name' $field must be an object")
            case Some(p) =>
              val pn = Option(p.get("name")).map(_.asText()).getOrElse("")
              if (pn.isEmpty)
                Left(s"model $id: command '$name' $field is missing a name")
              else if (p.get("schema") == null)
                Left(s"model $id: command '$name' $field is missing a schema")
              else schemaRefs(p.get("schema")).filterNot(defs.contains)
                .headOption match {
                case Some(r) => Left(s"model $id: command '$name' $field " +
                  s"references undefined schema '$r'")
                case None => validateSchemaNode(p.get("schema")) match {
                  case Left(err) =>
                    Left(s"model $id: command '$name' $field: $err")
                  case Right(()) => Right(Some(pn))
                }
              }
          }
        val req = payload("request") match {
          case Left(err) => return Left(err)
          case Right(r) => r
        }
        val resp = payload("response") match {
          case Left(err) => return Left(err)
          case Right(r) => r
        }
        cmds += name -> CommandDef(req, resp)
      }
    })
    Right(DtdlInterface(id, ext, props, rels, comps, telem,
      Option(n.get("displayName")).map(_.asText()), dtdlJson,
      commands = cmds, writable = writables))
  }

  /** Semantic (quantitative) co-type checks for a Property/Telemetry
    * content node: a recognized quantitative co-type requires a numeric
    * schema and a unit drawn from that quantity kind's unit set; a `unit`
    * on a content with no recognized quantitative co-type is an error.
    * Unrecognized co-types (adjunct types from other extensions) pass
    * through untouched. Mirrors DTDLParser's quantitativeTypes extension
    * behavior on the surface the reference exercises
    * (AgeDigitalTwins.Test/SampleData.cs:37-41). */
  private def validateSemanticType(modelId: String, name: String,
      ts: Seq[String], c: JsonNode): Either[String, Unit] = {
    val quant = ts.filter(QuantitativeUnits.contains)
    val unit = Option(c.get("unit")).map(_.asText())
    if (quant.size > 1)
      return Left(s"model $modelId: content '$name' has multiple " +
        s"quantitative co-types ${quant.mkString(", ")}")
    // Adjunct co-types we don't recognize (a quantity kind newer than this
    // table, or another extension entirely) pass through untouched — DTDL
    // forward compatibility. Unit enforcement only applies when the
    // co-type is a kind we actually know.
    val unknownAdjunct = ts.exists(t =>
      !StructuralContentTypes.contains(t) && !QuantitativeUnits.contains(t))
    (quant.headOption, unit) match {
      case (None, None) => Right(())
      case (None, Some(_)) if unknownAdjunct => Right(())
      case (None, Some(u)) =>
        Left(s"model $modelId: content '$name' declares unit '$u' " +
          "without a quantitative semantic co-type")
      case (Some(q), None) =>
        Left(s"model $modelId: content '$name' has semantic type '$q' " +
          "but no unit")
      case (Some(q), Some(u)) =>
        if (!QuantitativeUnits(q).contains(u))
          Left(s"model $modelId: unit '$u' is not valid for semantic " +
            s"type '$q'")
        else {
          val schemaName = Option(c.get("schema")).filter(_.isTextual)
            .map(_.asText())
          if (schemaName.exists(NumericPrimitives.contains)) Right(())
          else Left(s"model $modelId: content '$name' with semantic type " +
            s"'$q' must have a numeric schema, got " +
            s"${schemaName.getOrElse("a complex schema")}")
        }
    }
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
  def relationshipDef(modelId: String, name: String): Option[RelationshipDef] =
    chain(modelId).iterator.flatMap(_.relationships.get(name)).nextOption()

  /** Validate a relationship DOCUMENT's user properties against the
    * source model's declaration of that relationship: every non-`$` key
    * must be a declared relationship Property and type-check against its
    * schema (the reference validates twin props per model,
    * DigitalTwins.cs:266-457, and rel writes at Relationships.cs:260-420;
    * this closes the property-level corner of that parity). The target
    * constraint is also enforced here when the declaration names one:
    * `targetModelOf` supplies the target twin's model id (inheritance
    * counts — IS_OF_MODEL semantics). Errors accumulate, like
    * [[validateTwin]]. */
  def validateRelationship(srcModelId: String, name: String, doc: JsonNode,
      targetModelOf: => Option[String] = None): Either[String, Unit] = {
    val defn = relationshipDef(srcModelId, name).getOrElse(
      return Left(s"Relationship '$name' is not defined in model $srcModelId"))
    val propErrors = doc.properties().asScala.toSeq.flatMap { e =>
      val k = e.getKey
      if (k.startsWith("$")) Nil
      else defn.properties.get(k) match {
        case Some(schema) => schema.validate(e.getValue).left.toSeq
          .map(m => s"Relationship property '$k': $m")
        case None => Seq(s"Relationship property '$k' is not defined on " +
          s"'$name' in model $srcModelId")
      }
    }
    val targetErrors = (defn.target, targetModelOf) match {
      case (Some(required), Some(actual)) =>
        val ok = actual == required ||
          bases.getOrElse(actual, Nil).contains(required)
        if (ok) Nil
        else Seq(s"Relationship '$name' requires target model $required; " +
          s"target twin has model $actual")
      case _ => Nil
    }
    val errors = propErrors ++ targetErrors
    if (errors.isEmpty) Right(()) else Left(errors.mkString("; "))
  }
  def isTelemetry(modelId: String, name: String): Boolean =
    chain(modelId).exists(_.telemetry.contains(name))
  /** Command surface incl. inheritance (parsed + validated at upload; no
    * runtime semantics — parity with the reference's stored-only view). */
  def commandDef(modelId: String, name: String): Option[CommandDef] =
    chain(modelId).iterator.flatMap(_.commands.get(name)).nextOption()
  /** Declared `writable` flag on a Property/Relationship content, if any
    * ancestor declared one (DTDL metadata — not a write guard). */
  def writableFlag(modelId: String, name: String): Option[Boolean] =
    chain(modelId).iterator.flatMap(_.writable.get(name)).nextOption()

  /** Validate a twin document against its declared model: every
    * non-`$` property must be a defined Property (type-checked) or
    * Component (validated against the component model). Mirrors
    * DigitalTwins.cs:266-457 incl. its error strings. Errors ACCUMULATE
    * across properties ("; "-joined) rather than short-circuiting — the
    * reference's ValidationFailedException names every offending property
    * in one message (DigitalTwinsTests.cs:117-138 asserts both 'test' and
    * 'diameter' appear), which is what an API caller fixing a document
    * actually needs. */
  def validateTwin(doc: JsonNode): Either[String, Unit] = {
    val modelId = Json.get(doc, "/$metadata/$model")
      .map(_.asText())
      .getOrElse(return Left("$metadata.$model is required"))
    if (!models.contains(modelId)) return Left(s"Model $modelId does not exist")
    val errors = doc.properties().asScala.toSeq.flatMap { e =>
      val k = e.getKey
      if (k.startsWith("$")) Nil
      else propertySchema(modelId, k) match {
        case Some(schema) =>
          schema.validate(e.getValue).left.toSeq.map(m => s"Property '$k': $m")
        case None =>
          componentModel(modelId, k) match {
            case Some(compModel) =>
              val compDoc = e.getValue
              if (!compDoc.isObject) Seq(s"Component '$k' must be an object")
              else compDoc.properties().asScala.toSeq
                .filterNot(_.getKey.startsWith("$"))
                .flatMap { ce =>
                  propertySchema(compModel, ce.getKey) match {
                    case Some(s) => s.validate(ce.getValue).left.toSeq
                      .map(m => s"Component '$k' property '${ce.getKey}': $m")
                    case None =>
                      Seq(s"Property '${ce.getKey}' is not defined in the model $compModel")
                  }
                }
            case None => Seq(s"Property '$k' is not defined in the model")
          }
      }
    }
    if (errors.isEmpty) Right(()) else Left(errors.mkString("; "))
  }
}
