package graft.jobs

import org.scalatest.funsuite.AnyFunSuite
import graft.store.{StoreException, TwinStore}

/** Ports the reference's job behaviors: section parsing, header
  * requirement, batching, checkpoint/resume, per-item error accounting,
  * delete ordering, lock + lifecycle (the reference's Test/Jobs suite). */
class JobsSpec extends AnyFunSuite {

  val model =
    """{"@id":"dtmi:ex:m;1","@type":"Interface","contents":[{"@type":"Property","name":"name","schema":"string"},{"@type":"Relationship","name":"has"}]}"""

  def ndjson: Seq[String] = Seq(
    """{"Section": "Header"}""",
    """{"fileVersion": "1.0.0", "author": "user", "organization": "org"}""",
    """{"Section": "Models"}""",
    model,
    """{"Section": "Twins"}""",
    """{"$dtId":"twin1","$metadata":{"$model":"dtmi:ex:m;1"},"name":"T1"}""",
    """{"$dtId":"twin2","$metadata":{"$model":"dtmi:ex:m;1"},"name":"T2"}""",
    """{"Section": "Relationships"}""",
    """{"$dtId":"twin1","$relationshipId":"rel1","$relationshipName":"has","$targetId":"twin2"}""")

  test("import: full happy path with stats") {
    val store = new TwinStore()
    val result = ImportJob.run(store, ndjson.iterator)
    assert(result.status == "Succeeded")
    assert(result.stats.modelsCreated == 1)
    assert(result.stats.twinsCreated == 2)
    assert(result.stats.relationshipsCreated == 1)
    assert(store.getTwin("twin1") != null)
    assert(store.getRelationship("twin1", "rel1") != null)
  }

  test("import: unsupported fileVersion rejected (ImportJob.cs:444-458)") {
    val bad = ndjson.updated(1, """{"fileVersion": "2.0.0", "author": "u"}""")
    val ex = intercept[StoreException](
      ImportJob.run(new TwinStore(), bad.iterator))
    assert(ex.msg.contains("Unsupported file version"))
    // only the FIRST header data line is version-checked; extra metadata
    // lines (author, organization) must not abort the import
    val multiHeader = ndjson.patch(2, Seq("""{"author": "contoso"}""",
      """{"organization": "org2"}"""), 0)
    val ok = ImportJob.run(new TwinStore(), multiHeader.iterator)
    assert(ok.status == "Succeeded" && ok.stats.twinsCreated == 2)
  }

  test("import: header required first") {
    val store = new TwinStore()
    val noHeader = ndjson.drop(2)
    val e = intercept[StoreException](ImportJob.run(store, noHeader.iterator))
    assert(e.msg.contains("Header"))
  }

  test("import: bad items recorded, import continues (PartiallySucceeded)") {
    val store = new TwinStore()
    val withBad = ndjson.patch(6,
      Seq("""{"$dtId":"bad","$metadata":{"$model":"dtmi:ex:m;1"},"bogus":1}"""), 0)
    val result = ImportJob.run(store, withBad.iterator)
    assert(result.status == "PartiallySucceeded")
    assert(result.stats.errors == 1)
    assert(result.stats.twinsCreated == 2)
    assert(result.stats.errorDetails.head.contains("bogus"))
  }

  test("import: checkpoint every N items and resume skips applied lines") {
    val store = new TwinStore()
    val result = ImportJob.run(store, ndjson.iterator, checkpointInterval = 2)
    assert(result.checkpoints.nonEmpty)
    // resume from the second checkpoint on a fresh store replays the tail only
    val cp = result.checkpoints.head
    val store2 = new TwinStore()
    store2.createModels(Seq(model))
    store2.createOrReplaceTwin("twin1",
      """{"$metadata":{"$model":"dtmi:ex:m;1"},"name":"T1"}""")
    store2.createOrReplaceTwin("twin2",
      """{"$metadata":{"$model":"dtmi:ex:m;1"},"name":"T2"}""")
    val resumed = ImportJob.run(store2, ndjson.iterator,
      resumeFrom = Some(cp.copy(stats = ImportStats())))
    assert(resumed.stats.errors == 0)
    assert(store2.getRelationship("twin1", "rel1") != null)
  }

  test("job service: lifecycle, lock, delete ordering, purge") {
    val svc = new JobService()
    val store = new TwinStore()
    val rec = svc.runImport("job1", store, ndjson.iterator)
    assert(rec.status == "Succeeded")
    assert(rec.resultJson.get.contains("\"twinsCreated\":2"))
    assert(svc.get("job1").lockedBy.isEmpty)

    val del = svc.runDelete("job2", store)
    assert(del.status == "Succeeded")
    assert(del.resultJson.get.contains("\"relationshipsDeleted\":1"))
    assert(del.resultJson.get.contains("\"twinsDeleted\":2"))
    assert(store.twinIds.isEmpty && store.models.models.isEmpty)

    assert(svc.purgeFinishedBefore("9999-01-01T00:00:00Z") == 2)
    assertThrows[StoreException](svc.get("job1"))
  }
}
