package graft.jobs

import graft.json.Json
import graft.store.{DigitalTwinStore, StoreException}
import scala.jdk.CollectionConverters._

/** ND-JSON bulk import (SURVEY §2 D13) — the reference's section-based
  * streaming format (/root/reference/src/AgeDigitalTwins/Jobs/
  * ImportJob.cs:444-786 and Jobs/README.md:43-64):
  *
  *   {"Section": "Header"}   (mandatory, first)
  *   {fileVersion, author, organization}
  *   {"Section": "Models"}        → all models created in one call
  *   {"Section": "Twins"}         → batched upserts
  *   {"Section": "Relationships"} → batched upserts
  *
  * Checkpointing: line-offset based — after every `checkpointInterval`
  * items the (section, lineNo, counts) snapshot is recorded; `resumeFrom`
  * replays from a snapshot, skipping lines already applied (the reference
  * checkpoints byte offsets into blob storage; the semantics — at-least-
  * once with idempotent upserts — are identical).
  */
final case class ImportCheckpoint(section: String, lineNo: Long,
    stats: ImportStats) {
  /** Durable form — counts INCLUDED, so a resume reports cumulative
    * totals, not just the resumed tail's. */
  def render: String =
    s"""{"section":"$section","lineNo":$lineNo,"models":${stats.modelsCreated},""" +
      s""""twins":${stats.twinsCreated},"rels":${stats.relationshipsCreated},""" +
      s""""errors":${stats.errors}}"""
}

object ImportCheckpoint {
  def parse(s: String): ImportCheckpoint = {
    val n = graft.json.Json.parse(s)
    ImportCheckpoint(n.get("section").asText(), n.get("lineNo").asLong(),
      ImportStats(
        modelsCreated = Option(n.get("models")).map(_.asLong()).getOrElse(0L),
        twinsCreated = Option(n.get("twins")).map(_.asLong()).getOrElse(0L),
        relationshipsCreated = Option(n.get("rels")).map(_.asLong()).getOrElse(0L),
        errors = Option(n.get("errors")).map(_.asLong()).getOrElse(0L)))
  }
}

final case class ImportStats(
    modelsCreated: Long = 0, twinsCreated: Long = 0, relationshipsCreated: Long = 0,
    errors: Long = 0, errorDetails: Seq[String] = Nil) {
  def +(other: ImportStats): ImportStats = ImportStats(
    modelsCreated + other.modelsCreated, twinsCreated + other.twinsCreated,
    relationshipsCreated + other.relationshipsCreated, errors + other.errors,
    errorDetails ++ other.errorDetails)
}

final case class ImportResult(stats: ImportStats,
    checkpoints: Seq[ImportCheckpoint], status: String)

object ImportJob {

  val SectionKey = "Section"
  val Sections = Set("Header", "Models", "Twins", "Relationships")

  /** Stream ND-JSON lines from any Hadoop-FS URI (file:, s3a:, abfs:,
    * gs: — whatever the session's Hadoop conf can reach), the counterpart
    * of the reference's blob-storage job streams
    * (ApiService/Services/{Azure,AwsS3,Gcs}BlobStorageService.cs). Lines
    * stream — a multi-GB blob never materializes driver-side — and the
    * stream is CLOSED in all cases (mid-import failure, empty blob), not
    * only when fully drained. */
  def withLines[T](spark: org.apache.spark.sql.SparkSession, uri: String)(
      f: Iterator[String] => T): T = {
    val path = new org.apache.hadoop.fs.Path(uri)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(path), "UTF-8"))
    try {
      val it = new Iterator[String] {
        private var nextLine = reader.readLine()
        def hasNext: Boolean = nextLine != null
        def next(): String = {
          val l = nextLine
          nextLine = reader.readLine()
          l
        }
      }
      f(it)
    } finally reader.close()
  }

  /** Run an import straight from a blob/object-store URI. */
  def runFromPath(spark: org.apache.spark.sql.SparkSession, store: DigitalTwinStore,
      uri: String, batchSize: Int = 50, checkpointInterval: Int = 50,
      resumeFrom: Option[ImportCheckpoint] = None,
      heartbeat: () => Unit = () => ()): ImportResult =
    withLines(spark, uri)(lines =>
      run(store, lines, batchSize, checkpointInterval, resumeFrom,
        heartbeat = heartbeat))

  /** Run an import over ND-JSON lines. `checkpointInterval` mirrors the
    * reference default of 50; `resumeFrom` skips up to a checkpoint. */
  def run(store: DigitalTwinStore, lines: Iterator[String],
      batchSize: Int = 50, checkpointInterval: Int = 50,
      resumeFrom: Option[ImportCheckpoint] = None,
      continueOnFailure: Boolean = true,
      heartbeat: () => Unit = () => (),
      onCheckpoint: ImportCheckpoint => Unit = _ => ()): ImportResult = {

    val checkpoints = collection.mutable.ArrayBuffer[ImportCheckpoint]()
    var stats = resumeFrom.map(_.stats).getOrElse(ImportStats())
    var section: String = null
    var lineNo = 0L
    val skipUntil = resumeFrom.map(_.lineNo).getOrElse(-1L)
    var headerSeen = false
    var headerDataSeen = false
    var sinceCheckpoint = 0
    val modelBuf = collection.mutable.ArrayBuffer[String]()

    def flushModels(): Unit = if (modelBuf.nonEmpty) {
      try {
        store.createModels(modelBuf.toSeq)
        stats = stats + ImportStats(modelsCreated = modelBuf.size)
      } catch {
        case e: StoreException =>
          stats = stats + ImportStats(errors = 1,
            errorDetails = Seq(s"models: ${e.msg}"))
          if (!continueOnFailure) throw e
      }
      modelBuf.clear()
    }

    def checkpoint(): Unit = {
      val cp = ImportCheckpoint(section, lineNo, stats)
      checkpoints += cp
      sinceCheckpoint = 0
      // durable-record hook: the caller persists this checkpoint so a
      // crash mid-import resumes from here, not from line 0
      onCheckpoint(cp)
      // lock-lease renewal rides the checkpoint cadence (the reference
      // renews on a timer during the import, ImportJob.cs:111-153)
      heartbeat()
    }

    for (raw <- lines) {
      lineNo += 1
      val line = raw.trim
      if (line.nonEmpty) {
        val node = Json.tryParse(line).getOrElse {
          stats = stats + ImportStats(errors = 1,
            errorDetails = Seq(s"line $lineNo: invalid JSON"))
          null
        }
        if (node != null) {
          val sec = Option(node.get(SectionKey)).map(_.asText())
          sec match {
            case Some(s) if Sections(s) =>
              if (section == "Models") flushModels()
              if (s != "Header" && !headerSeen)
                throw StoreException(400, "Header section is required first")
              section = s
              if (s == "Header") headerSeen = true
            case Some(other) =>
              throw StoreException(400, s"unknown section '$other'")
            case None =>
              if (section == null)
                throw StoreException(400, "Header section is required first")
              if (lineNo > skipUntil) {
                section match {
                  case "Header" =>
                    // only the FIRST header data line carries fileVersion
                    // (ImportJob.cs:444-458 reads exactly one); further
                    // metadata lines (author, organization) pass through
                    if (!headerDataSeen) {
                      headerDataSeen = true
                      val fv = Json.get(node, "/fileVersion").map(_.asText())
                      if (!fv.contains("1.0.0"))
                        throw StoreException(400,
                          s"Unsupported file version: ${fv.getOrElse("missing")}")
                    }
                  case "Models" => modelBuf += line
                  case "Twins" =>
                    try {
                      val id = Json.get(node, "/$dtId").map(_.asText())
                        .getOrElse(throw StoreException(400, "$dtId required"))
                      store.createOrReplaceTwin(id, line)
                      stats = stats + ImportStats(twinsCreated = 1)
                    } catch {
                      case e: StoreException =>
                        stats = stats + ImportStats(errors = 1,
                          errorDetails = Seq(s"line $lineNo: ${e.msg}"))
                        if (!continueOnFailure) throw e
                    }
                  case "Relationships" =>
                    try {
                      val src = Json.get(node, "/$dtId").map(_.asText())
                        .orElse(Json.get(node, "/$sourceId").map(_.asText()))
                        .getOrElse(throw StoreException(400, "$dtId/$sourceId required"))
                      val rid = Json.get(node, "/$relationshipId").map(_.asText())
                        .getOrElse(throw StoreException(400, "$relationshipId required"))
                      store.createOrReplaceRelationship(src, rid, line)
                      stats = stats + ImportStats(relationshipsCreated = 1)
                    } catch {
                      case e: StoreException =>
                        stats = stats + ImportStats(errors = 1,
                          errorDetails = Seq(s"line $lineNo: ${e.msg}"))
                        if (!continueOnFailure) throw e
                    }
                }
                sinceCheckpoint += 1
                if (sinceCheckpoint >= checkpointInterval) checkpoint()
              }
          }
        }
      }
    }
    if (section == "Models") flushModels()
    checkpoint()
    val status =
      if (stats.errors == 0) "Succeeded"
      else if (stats.twinsCreated + stats.relationshipsCreated + stats.modelsCreated > 0)
        "PartiallySucceeded"
      else "Failed"
    ImportResult(stats, checkpoints.toSeq, status)
  }
}
