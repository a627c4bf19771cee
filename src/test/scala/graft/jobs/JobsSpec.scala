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

  test("import from a Hadoop-FS URI (blob-storage job stream, A8)") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    val dir = java.nio.file.Files.createTempDirectory("graft-import")
    val f = dir.resolve("job.ndjson")
    java.nio.file.Files.write(f, ndjson.mkString("\n").getBytes("UTF-8"))
    val store = new TwinStore()
    val result = ImportJob.runFromPath(spark, store, "file://" + f.toString)
    assert(result.status == "Succeeded")
    assert(result.stats.twinsCreated == 2 && result.stats.relationshipsCreated == 1)
    assert(store.getRelationship("twin1", "rel1") != null)
  }

  /** A JobService with a controllable clock for lease-expiry tests. */
  private def timedService(): (JobService, () => Unit) = {
    var t = 0L
    val svc = new JobService(nowMs = () => t)
    (svc, () => t += 6 * 60 * 1000L) // advance past the 5-min default lease
  }

  test("lease locks: live lease blocks, expired lease is taken over") {
    val (svc, advance) = timedService()
    assert(svc.tryAcquireLock("j", "instanceA"))
    assert(!svc.tryAcquireLock("j", "instanceB"), "live lease must block")
    assert(svc.renewHeartbeat("j", "instanceA"))
    assert(!svc.renewHeartbeat("j", "instanceB"), "only the owner heartbeats")
    advance() // lease expires
    assert(!svc.renewHeartbeat("j", "instanceA"),
      "an expired lease cannot be resurrected by heartbeat")
    assert(svc.tryAcquireLock("j", "instanceB"), "expired lease is orphaned: takeover")
    assert(svc.lockInfo("j").get.owner == "instanceB")
    assert(svc.cleanupExpiredLocks() == 0) // B's lease is live
    advance()
    assert(svc.cleanupExpiredLocks() == 1)
  }

  test("multi-writer lock contention: two services, shared at-rest lease storage") {
    // The reference's distributed path (JobService.cs:593-735): instances
    // share lock_* columns in one database, so A's lease must fence B
    // through STORAGE, not memory. Two independent JobService instances —
    // separate clocks, separate FileLockStore objects — contend over the
    // same directory.
    val dir = java.nio.file.Files.createTempDirectory("graft-joblocks")
    var clockA = 0L
    var clockB = 0L
    val a = new JobService(nowMs = () => clockA,
      lockStore = new FileLockStore(dir))
    val b = new JobService(nowMs = () => clockB,
      lockStore = new FileLockStore(dir))
    assert(a.tryAcquireLock("j1", "writerA", leaseMillis = 1000))
    clockB = 500
    assert(!b.tryAcquireLock("j1", "writerB", leaseMillis = 1000),
      "a live lease must block a second writer through shared storage")
    assert(!b.renewHeartbeat("j1", "writerB"), "only the owner heartbeats")
    // A's heartbeat at t=900 extends the lease to t=1900
    clockA = 900
    assert(a.renewHeartbeat("j1", "writerA"))
    clockB = 1500
    assert(!b.tryAcquireLock("j1", "writerB", leaseMillis = 1000),
      "the heartbeat must extend the lease across writers")
    // A dies (no more heartbeats); past expiry B takes over
    clockB = 2000
    assert(b.tryAcquireLock("j1", "writerB", leaseMillis = 1000),
      "an orphaned lease is taken over")
    assert(b.lockInfo("j1").exists(_.owner == "writerB"))
    // fencing: the old owner's late heartbeat and release are no-ops
    clockA = 2100
    assert(!a.renewHeartbeat("j1", "writerA"),
      "a fenced-out instance must not resurrect its lease")
    a.releaseLock("j1", "writerA")
    assert(a.lockInfo("j1").exists(_.owner == "writerB"),
      "a non-owner release must not drop the new owner's lease")
    // the new owner's view is authoritative from either instance
    b.releaseLock("j1", "writerB")
    assert(a.lockInfo("j1").isEmpty && b.lockInfo("j1").isEmpty)
    // expired-lock GC sees shared state too
    assert(a.tryAcquireLock("j2", "writerA", leaseMillis = 1000))
    clockB = 4000
    assert(b.cleanupExpiredLocks() == 1,
      "cleanup must collect the other instance's expired lease")
  }

  test("lock race: 16 writers acquire concurrently, exactly one wins") {
    // The scripted-clock test above proves the fencing RULES; this one
    // proves the critical section — 16 threads (4 service instances × 4
    // threads, all over one directory) race tryAcquireLock on the same
    // job. The OS file lock + JVM mutex must serialize them to exactly
    // one winner, and the loser set must agree on who won.
    val dir = java.nio.file.Files.createTempDirectory("graft-lockrace")
    val now = System.currentTimeMillis()
    val services = (0 until 4).map(_ =>
      new JobService(nowMs = () => now, lockStore = new FileLockStore(dir)))
    val winners = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(16)
    val threads = (0 until 16).map { i =>
      val t = new Thread(() => {
        start.await()
        if (services(i % 4).tryAcquireLock("race-job", s"writer$i",
          leaseMillis = 60000)) winners.add(s"writer$i")
        done.countDown()
      })
      t.start(); t
    }
    start.countDown()
    assert(done.await(30, java.util.concurrent.TimeUnit.SECONDS), "race hung")
    threads.foreach(_.join(1000))
    assert(winners.size == 1, s"expected one winner, got $winners")
    val owner = services(0).lockInfo("race-job").map(_.owner)
    assert(owner.contains(winners.iterator().next()),
      s"stored owner $owner must be the winner $winners")
  }

  test("delete job: crash mid-phase, lease out, resume from checkpoint") {
    val (svc, advance) = timedService()
    val store = new TwinStore()
    store.createModels(Seq(model))
    (1 to 10).foreach(i => store.createOrReplaceTwin(s"t$i",
      s"""{"$$metadata":{"$$model":"dtmi:ex:m;1"},"name":"T$i"}"""))
    (1 to 9).foreach(i => store.createOrReplaceRelationship(s"t$i", s"r$i",
      s"""{"$$relationshipName":"has","$$targetId":"t${i + 1}"}"""))

    // instance A crashes after 3 batches of 2 (rels phase: 9 rels = 5 batches)
    val crashed = svc.runDelete("del", store, owner = "instanceA",
      batchSize = 2, checkpointEveryBatches = 1, crashAfterBatches = 3)
    assert(crashed.status == "Running", "crashed job stays Running")
    val cp = DeleteCheckpoint.parse(crashed.checkpoint.get)
    assert(cp.section == "Relationships" && cp.relationshipsDeleted == 6)
    assert(store.relationshipKeys.size == 3, "6 of 9 rels deleted before crash")
    // the dead instance still holds the lock: immediate takeover fails
    assertThrows[StoreException](
      svc.runDelete("del", store, owner = "instanceB", batchSize = 2))
    assert(svc.jobsToResume.isEmpty, "job not resumable while lease is live")

    advance() // lease expires → orphan
    assert(svc.jobsToResume.map(_.id) == Seq("del"))
    val resumed = svc.runDelete("del", store, owner = "instanceB", batchSize = 2)
    assert(resumed.status == "Succeeded")
    // counts carried across the crash: all 9 rels, 10 twins, 1 model
    assert(resumed.resultJson.get.contains("\"relationshipsDeleted\":9"))
    assert(resumed.resultJson.get.contains("\"twinsDeleted\":10"))
    assert(resumed.resultJson.get.contains("\"modelsDeleted\":1"))
    assert(store.twinIds.isEmpty && store.relationshipKeys.isEmpty)
    assert(svc.jobsToResume.isEmpty)
  }

  test("import crash persists mid-run checkpoints; resume continues, completed jobs refuse") {
    val svc = new JobService()
    val store = new TwinStore()
    val manyTwins = (1 to 8).map(i =>
      s"""{"$$dtId":"t$i","$$metadata":{"$$model":"dtmi:ex:m;1"},"name":"T$i"}""")
    val lines = ndjson.take(5) ++ manyTwins // header + models + Twins section
    var emitted = 0
    val crashing = lines.iterator.map { l =>
      emitted += 1
      if (emitted == 10) throw new RuntimeException("instance death")
      l
    }
    val rec = svc.runImport("imp", store, crashing,
      batchSize = 1, checkpointInterval = 2)
    assert(rec.status == "Failed")
    // the checkpoint was persisted DURING the run, not only at completion
    assert(rec.checkpoint.isDefined, "crash must leave a resumable checkpoint")
    val cp = ImportCheckpoint.parse(rec.checkpoint.get)
    assert(cp.lineNo > 0 && cp.lineNo < lines.size)

    val resumed = svc.resumeImport("imp", store, lines.iterator,
      batchSize = 1, checkpointInterval = 2)
    assert(resumed.status == "Succeeded")
    // every twin made it in, and the record's creation time survived
    (1 to 8).foreach(i => store.getTwin(s"t$i"))
    assert(resumed.createdAt == rec.createdAt)
    // cumulative counts: at least the full set, at-least-once overlap may
    // recount the replayed tail
    assert(resumed.resultJson.get.contains("\"modelsCreated\":1"))
    // a completed job is NOT resumable (its checkpoint is end-of-file; a
    // "resume" would no-op and overwrite the real counts)
    val e = intercept[StoreException](
      svc.resumeImport("imp", store, lines.iterator))
    assert(e.status == 409 && e.msg.contains("not resumable"))
  }

  test("cancel revokes the lease so a running import aborts; Cancelled is never overwritten") {
    val svc = new JobService()
    val store = new TwinStore()
    val manyTwins = (1 to 8).map(i =>
      s"""{"$$dtId":"c$i","$$metadata":{"$$model":"dtmi:ex:m;1"},"name":"C$i"}""")
    val lines = ndjson.take(5) ++ manyTwins
    // cancel arrives mid-import (from "another instance"): the next
    // heartbeat must fail and the record must STAY Cancelled
    var sent = 0
    val cancelling = lines.iterator.map { l =>
      sent += 1
      if (sent == 9) svc.cancel("job-c")
      l
    }
    val rec = svc.runImport("job-c", store, cancelling,
      batchSize = 1, checkpointInterval = 2)
    assert(rec.status == "Cancelled",
      s"completion must not overwrite an acknowledged cancel, got ${rec.status}")
    assert(svc.get("job-c").status == "Cancelled")
  }

  test("bulk delete: crash between truncate and checkpoint keeps full counts") {
    val (svc, advance) = timedService()
    val store = new TwinStore()
    store.createModels(Seq(model))
    (1 to 6).foreach(i => store.createOrReplaceTwin(s"t$i",
      s"""{"$$metadata":{"$$model":"dtmi:ex:m;1"},"name":"T$i"}"""))
    (1 to 5).foreach(i => store.createOrReplaceRelationship(s"t$i", s"r$i",
      s"""{"$$relationshipName":"has","$$targetId":"t${i + 1}"}"""))

    // crashAfterBatches=1: the tick right after truncateEntities throws,
    // so the post-truncate checkpoint save never happens — the worst-case
    // window where the truncate is durable but its counts were not
    val crashed = svc.runDelete("del-bulk-crash", store, owner = "A",
      bulk = true, crashAfterBatches = 1)
    assert(crashed.status == "Running")
    val cp = DeleteCheckpoint.parse(crashed.checkpoint.get)
    assert(cp.bulkTwins.contains(6L) && cp.bulkRels.contains(5L),
      s"corpus counts must be persisted BEFORE the truncate, got $cp")
    assert(store.twinIds.isEmpty && store.relationshipKeys.isEmpty,
      "the truncate itself completed before the crash")

    advance() // lease expires
    val resumed = svc.runDelete("del-bulk-crash", store, owner = "B",
      bulk = true)
    assert(resumed.status == "Succeeded")
    // the resume re-truncates an EMPTY store (idempotent, returns 0/0);
    // counts must come from the persisted precount, not that return
    assert(resumed.resultJson.get.contains("\"twinsDeleted\":6"),
      s"lost twin count: ${resumed.resultJson.get}")
    assert(resumed.resultJson.get.contains("\"relationshipsDeleted\":5"),
      s"lost relationship count: ${resumed.resultJson.get}")
    assert(resumed.resultJson.get.contains("\"modelsDeleted\":1"))
  }
}
