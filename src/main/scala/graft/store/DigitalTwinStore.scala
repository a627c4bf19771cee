package graft.store

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.SparkSession
import graft.dtdl.{DtdlInterface, ModelRegistry}
import graft.graph.TwinGraph

/** The store surface the API layer serves (r17): everything
  * [[graft.api.HttpApi]] touches, implemented by BOTH the driver-resident
  * [[TwinStore]] (fixture scale, the reference's in-process shape) and
  * the table-backed [[TableTwinStore]] (snapshot + journal, million-twin
  * scale) — so the SAME HTTP layer, continuation tokens and rate limits
  * serve either backing, and the sf10 serving legs can run end-to-end
  * through the API (reference capacity claim includes the API surface,
  * README.md:35 + performance.mdx:28). */
trait DigitalTwinStore {
  // ---- twins ----
  def getTwin(dtId: String): JsonNode
  def createOrReplaceTwin(dtId: String, docJson: String,
      ifNoneMatchStar: Boolean = false,
      lastUpdatedBy: Option[String] = None): JsonNode
  def createOrReplaceTwins(docs: Seq[String]): Seq[Either[String, JsonNode]]
  def patchTwin(dtId: String, patchJson: String,
      ifMatch: Option[String] = None,
      lastUpdatedBy: Option[String] = None): JsonNode
  def deleteTwin(dtId: String, ifMatch: Option[String] = None): Unit
  def getComponent(dtId: String, componentName: String): JsonNode
  def updateComponent(dtId: String, componentName: String,
      patchJson: String): JsonNode
  // ---- relationships ----
  def getRelationship(sourceId: String, relId: String): JsonNode
  def createOrReplaceRelationship(sourceId: String, relId: String,
      docJson: String, ifNoneMatchStar: Boolean = false): JsonNode
  def createOrReplaceRelationships(docs: Seq[String])
      : Seq[Either[String, JsonNode]]
  def patchRelationship(sourceId: String, relId: String,
      patchJson: String): JsonNode
  def deleteRelationship(sourceId: String, relId: String): Unit
  def listRelationships(sourceId: String,
      relationshipName: Option[String] = None): Seq[JsonNode]
  def listIncomingRelationships(targetId: String): Seq[JsonNode]
  // ---- models ----
  def models: ModelRegistry
  def createModels(dtdlJsons: Seq[String]): Seq[DtdlInterface]
  def getModel(id: String): DtdlInterface
  def getModelWithBaseContents(id: String): DtdlInterface
  def deleteModel(id: String): Unit
  def deleteAllModels(): Unit
  def searchModels(query: Option[String], vector: Option[Seq[Double]],
      limit: Int = 10): Seq[DtdlInterface]
  def updateModelEmbedding(modelId: String, embedding: Seq[Double]): Unit
  // ---- telemetry / graph projections ----
  def publishTelemetry(dtId: String, payload: String,
      componentName: Option[String] = None): Unit
  def currentSeq: Long
  def toGraph(spark: SparkSession): TwinGraph
  def graphAt(spark: SparkSession, asOfSeq: Long): TwinGraph
  // ---- enumeration (job surface: delete-all sweeps) ----
  def twinIds: Seq[String]
  def relationshipKeys: Seq[(String, String)]
}
