package graft.jobs

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.JsonNode
import graft.dtdl.{DtdlInterface, ModelRegistry}
import graft.graph.TwinGraph
import graft.json.Json
import graft.store.{DigitalTwinStore, Key, StoreException, TableTwinStore}

/** r18 (r17 verdict #1): the delete job must fetch keys PER BATCH through
  * a cursor — never re-collect the full remaining id universe after every
  * batch (quadratic driver traffic; at sf10 ≈ 2.5e10 collected rows) —
  * and the table store must offer a bulk truncate whose cost is one
  * distributed journal append + one checkpoint, not a point write per
  * entity. */
class DeleteJobScaleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tempDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-deljob").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def fixedClock(): () => String = {
    var t = 0
    () => { t += 1; f"2026-01-01T00:00:${t % 60}%02dZ" }
  }

  private val model =
    """{"@id":"dtmi:dj:Thing;1","@type":"Interface","contents":[
      |{"@type":"Property","name":"n","schema":"integer"},
      |{"@type":"Relationship","name":"links"}]}""".stripMargin
  private def doc(id: String, n: Int) =
    s"""{"$$dtId":"$id","$$metadata":{"$$model":"dtmi:dj:Thing;1"},"n":$n}"""
  private def relDoc(rid: String, src: String, tgt: String) =
    s"""{"$$relationshipId":"$rid","$$sourceId":"$src","$$targetId":"$tgt",""" +
      s""""$$relationshipName":"links"}"""

  /** Populate a table store: 120 twins / 119 chain rels in the SNAPSHOT,
    * plus 10 twins + 5 rels journaled after the checkpoint, minus a few
    * deletes — so enumeration must merge snapshot + tail + session. */
  private def populated(): (String, TableTwinStore) = {
    val dir = tempDir()
    val s1 = TableTwinStore.open(spark, dir, fixedClock())
    s1.createModels(Seq(model))
    s1.batch {
      (1 to 120).foreach(i => s1.createOrReplaceTwin(f"t$i%03d", doc(f"t$i%03d", i)))
      (1 to 119).foreach(i => s1.createOrReplaceRelationship(
        f"t$i%03d", f"r$i%03d", relDoc(f"r$i%03d", f"t$i%03d", f"t${i + 1}%03d")))
    }
    s1.checkpoint()
    s1.batch {
      (121 to 130).foreach(i => s1.createOrReplaceTwin(f"t$i%03d", doc(f"t$i%03d", i)))
      (121 to 125).foreach(i => s1.createOrReplaceRelationship(
        f"t$i%03d", f"r$i%03d", relDoc(f"r$i%03d", f"t$i%03d", "t001")))
    }
    s1.deleteRelationship("t050", "r050")
    s1.deleteRelationship("t125", "r125")
    (dir, s1)
  }

  test("cursor enumeration merges snapshot, journal tail and session state") {
    val (dir, s1) = populated()
    // a FRESH lazy open exercises the pre-session-tail merge path too
    val s2 = TableTwinStore.open(spark, dir, fixedClock())
    for (store <- Seq(s1, s2)) {
      val expectedTwins = (1 to 130).map(i => f"t$i%03d")
      val expectedRels = ((1 to 119) ++ (121 to 125)).map(i =>
        (f"t$i%03d", f"r$i%03d")).filterNot(k => k._2 == "r050" || k._2 == "r125")
      // crawl in small pages; every page must respect the size bound
      def crawlTwins(n: Int): Seq[String] = {
        val out = collection.mutable.ArrayBuffer[String]()
        var after: Option[String] = None
        var page = store.twinIdsAfter(after, n)
        while (page.nonEmpty) {
          assert(page.size <= n)
          assert(page == page.sorted(Key.ordering), "page must be ordered")
          out ++= page
          after = Some(page.last)
          page = store.twinIdsAfter(after, n)
        }
        out.toSeq
      }
      def crawlRels(n: Int): Seq[(String, String)] = {
        val out = collection.mutable.ArrayBuffer[(String, String)]()
        var after: Option[(String, String)] = None
        var page = store.relationshipKeysAfter(after, n)
        while (page.nonEmpty) {
          assert(page.size <= n)
          out ++= page
          after = Some(page.last)
          page = store.relationshipKeysAfter(after, n)
        }
        out.toSeq
      }
      assert(crawlTwins(7) == expectedTwins)
      assert(crawlRels(7) == expectedRels)
      // page-size invariance
      assert(crawlTwins(130) == expectedTwins)
    }
  }

  test("snapshot-only cursor pages run ZERO Spark jobs") {
    val dir = tempDir()
    val s1 = TableTwinStore.open(spark, dir, fixedClock())
    s1.createModels(Seq(model))
    s1.batch((1 to 100).foreach(i =>
      s1.createOrReplaceTwin(f"z$i%03d", doc(f"z$i%03d", i))))
    s1.checkpoint()
    val s2 = TableTwinStore.open(spark, dir, fixedClock())
    // warm the reader construction (footer reads are driver-side I/O, not
    // Spark jobs, but the first graph fold below must not be billed)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val page1 = s2.twinIdsAfter(None, 10)
    val page2 = s2.twinIdsAfter(Some(page1.last), 10)
    val jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    assert(page1 == (1 to 10).map(i => f"z$i%03d"))
    assert(page2 == (11 to 20).map(i => f"z$i%03d"))
    assert(jobs == 0,
      s"cursor pages launched $jobs Spark job(s); the snapshot walk must " +
        "serve from the driver-side key pages")
  }

  /** Delegating spy: proves the delete job NEVER calls the full-universe
    * enumeration and never receives more than batchSize keys per fetch. */
  private final class SpyStore(u: DigitalTwinStore, maxBatch: Int)
      extends DigitalTwinStore {
    var maxSeen = 0
    def getTwin(dtId: String): JsonNode = u.getTwin(dtId)
    def createOrReplaceTwin(dtId: String, docJson: String,
        ifNoneMatchStar: Boolean, lastUpdatedBy: Option[String]): JsonNode =
      u.createOrReplaceTwin(dtId, docJson, ifNoneMatchStar, lastUpdatedBy)
    def createOrReplaceTwins(docs: Seq[String]): Seq[Either[String, JsonNode]] =
      u.createOrReplaceTwins(docs)
    def patchTwin(dtId: String, patchJson: String, ifMatch: Option[String],
        lastUpdatedBy: Option[String]): JsonNode =
      u.patchTwin(dtId, patchJson, ifMatch, lastUpdatedBy)
    def deleteTwin(dtId: String, ifMatch: Option[String]): Unit =
      u.deleteTwin(dtId, ifMatch)
    def getComponent(dtId: String, componentName: String): JsonNode =
      u.getComponent(dtId, componentName)
    def updateComponent(dtId: String, componentName: String,
        patchJson: String): JsonNode =
      u.updateComponent(dtId, componentName, patchJson)
    def getRelationship(sourceId: String, relId: String): JsonNode =
      u.getRelationship(sourceId, relId)
    def createOrReplaceRelationship(sourceId: String, relId: String,
        docJson: String, ifNoneMatchStar: Boolean): JsonNode =
      u.createOrReplaceRelationship(sourceId, relId, docJson, ifNoneMatchStar)
    def createOrReplaceRelationships(docs: Seq[String])
        : Seq[Either[String, JsonNode]] = u.createOrReplaceRelationships(docs)
    def patchRelationship(sourceId: String, relId: String,
        patchJson: String): JsonNode =
      u.patchRelationship(sourceId, relId, patchJson)
    def deleteRelationship(sourceId: String, relId: String): Unit =
      u.deleteRelationship(sourceId, relId)
    def listRelationships(sourceId: String,
        relationshipName: Option[String]): Seq[JsonNode] =
      u.listRelationships(sourceId, relationshipName)
    def listIncomingRelationships(targetId: String): Seq[JsonNode] =
      u.listIncomingRelationships(targetId)
    def models: ModelRegistry = u.models
    def createModels(dtdlJsons: Seq[String]): Seq[DtdlInterface] =
      u.createModels(dtdlJsons)
    def getModel(id: String): DtdlInterface = u.getModel(id)
    def getModelWithBaseContents(id: String): DtdlInterface =
      u.getModelWithBaseContents(id)
    def deleteModel(id: String): Unit = u.deleteModel(id)
    def deleteAllModels(): Unit = u.deleteAllModels()
    def searchModels(query: Option[String], vector: Option[Seq[Double]],
        limit: Int): Seq[DtdlInterface] = u.searchModels(query, vector, limit)
    def updateModelEmbedding(modelId: String, embedding: Seq[Double]): Unit =
      u.updateModelEmbedding(modelId, embedding)
    def publishTelemetry(dtId: String, payload: String,
        componentName: Option[String]): Unit =
      u.publishTelemetry(dtId, payload, componentName)
    def currentSeq: Long = u.currentSeq
    def toGraph(spark: SparkSession): TwinGraph = u.toGraph(spark)
    def graphAt(spark: SparkSession, asOfSeq: Long): TwinGraph =
      u.graphAt(spark, asOfSeq)
    def twinIds: Seq[String] =
      fail("delete job must never enumerate the full twin-id universe")
    def relationshipKeys: Seq[(String, String)] =
      fail("delete job must never enumerate the full relationship-key universe")
    override def twinIdsAfter(after: Option[String], n: Int): Seq[String] = {
      val page = u.twinIdsAfter(after, n)
      maxSeen = math.max(maxSeen, page.size)
      assert(page.size <= maxBatch, s"page of ${page.size} > batch $maxBatch")
      page
    }
    override def relationshipKeysAfter(after: Option[(String, String)],
        n: Int): Seq[(String, String)] = {
      val page = u.relationshipKeysAfter(after, n)
      maxSeen = math.max(maxSeen, page.size)
      assert(page.size <= maxBatch, s"page of ${page.size} > batch $maxBatch")
      page
    }
    override def batch[T](f: => T): T = u.batch(f)
  }

  test("delete job walks the cursor: per-batch key traffic only") {
    val (_, s1) = populated()
    val spy = new SpyStore(s1, maxBatch = 9)
    val svc = new JobService()
    val rec = svc.runDelete("del-cursor", spy, batchSize = 9)
    assert(rec.status == "Succeeded")
    assert(rec.resultJson.get.contains("\"relationshipsDeleted\":122"))
    assert(rec.resultJson.get.contains("\"twinsDeleted\":130"))
    assert(spy.maxSeen > 0 && spy.maxSeen <= 9)
    assert(s1.twinIdsAfter(None, 1).isEmpty)
    assert(s1.relationshipKeysAfter(None, 1).isEmpty)
    assert(s1.graph.twins.count() == 0 && s1.graph.relationships.count() == 0)
  }

  test("bulk truncate: one journaled sweep empties the store, CRUD survives") {
    val (dir, s1) = populated()
    val (twins, rels) = s1.truncateEntities()
    assert(twins == 130 && rels == 122)
    assert(s1.graph.twins.count() == 0)
    assert(s1.graph.relationships.count() == 0)
    // faults resolve to absent — nothing resurrects from stale tail state
    assert(intercept[StoreException](s1.getTwin("t001")).status == 404)
    assert(intercept[StoreException](s1.getRelationship("t002", "r002")).status == 404)
    // the store keeps working: re-create, read back, reopen sees it
    s1.createOrReplaceTwin("fresh1", doc("fresh1", 1))
    assert(Json.get(s1.getTwin("fresh1"), "/n").get.asInt() == 1)
    val s2 = TableTwinStore.open(spark, dir, fixedClock())
    assert(Json.get(s2.getTwin("fresh1"), "/n").get.asInt() == 1)
    assert(s2.graph.twins.count() == 1)
    assert(intercept[StoreException](s2.getTwin("t001")).status == 404)
  }

  test("bulk delete job on the table store: counts + models in the record") {
    val (_, s1) = populated()
    val svc = new JobService()
    val rec = svc.runDelete("del-bulk", s1, bulk = true)
    assert(rec.status == "Succeeded")
    assert(rec.resultJson.get.contains("\"relationshipsDeleted\":122"))
    assert(rec.resultJson.get.contains("\"twinsDeleted\":130"))
    assert(rec.resultJson.get.contains("\"modelsDeleted\":1"))
    assert(s1.models.models.isEmpty)
    assert(s1.graph.twins.count() == 0)
  }
}
