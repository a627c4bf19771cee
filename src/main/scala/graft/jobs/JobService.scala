package graft.jobs

import graft.store.{StoreException, TwinStore}
import graft.json.Json
import scala.jdk.CollectionConverters._

/** Job metadata + lifecycle (SURVEY §2 D15) and the delete-everything job
  * (D14). The reference keeps a `{graph}_jobs.jobs` SQL table with lease
  * locks and heartbeats (Jobs/JobService.cs:517-735); in a single-driver
  * Spark deployment the lock degenerates to a local mutex but the schema
  * and status lifecycle (Running → Succeeded | PartiallySucceeded | Failed
  * | Cancelled) are kept for API parity.
  */
final case class JobRecord(
    id: String,
    jobType: String, // import | delete
    status: String,  // NotStarted | Running | Succeeded | PartiallySucceeded | Failed | Cancelled
    createdAt: String,
    finishedAt: Option[String],
    lockedBy: Option[String],
    checkpoint: Option[String], // serialized ImportCheckpoint
    resultJson: Option[String])

final class JobService(clock: () => String = () => java.time.Instant.now().toString) {

  private val jobs = collection.mutable.LinkedHashMap[String, JobRecord]()
  private val locks = collection.mutable.Map[String, String]()

  def list: Seq[JobRecord] = jobs.values.toSeq
  def get(id: String): JobRecord =
    jobs.getOrElse(id, throw StoreException(404, s"job $id not found"))

  def acquireLock(jobId: String, owner: String): Boolean = synchronized {
    locks.get(jobId) match {
      case Some(o) if o != owner => false
      case _ => locks(jobId) = owner; true
    }
  }

  def releaseLock(jobId: String, owner: String): Unit = synchronized {
    if (locks.get(jobId).contains(owner)) locks.remove(jobId)
  }

  /** Run an import job under a lock with status lifecycle + checkpoints. */
  def runImport(id: String, store: TwinStore, lines: Iterator[String],
      owner: String = "driver", batchSize: Int = 50,
      checkpointInterval: Int = 50): JobRecord = {
    if (jobs.contains(id) && jobs(id).status == "Running")
      throw StoreException(409, s"job $id already running")
    if (!acquireLock(id, owner)) throw StoreException(409, s"job $id locked")
    jobs(id) = JobRecord(id, "import", "Running", clock(), None, Some(owner), None, None)
    try {
      val result = ImportJob.run(store, lines, batchSize, checkpointInterval)
      val rec = jobs(id).copy(
        status = result.status,
        finishedAt = Some(clock()),
        lockedBy = None,
        checkpoint = result.checkpoints.lastOption.map(c =>
          s"""{"section":"${c.section}","lineNo":${c.lineNo}}"""),
        resultJson = Some(
          s"""{"modelsCreated":${result.stats.modelsCreated},
             |"twinsCreated":${result.stats.twinsCreated},
             |"relationshipsCreated":${result.stats.relationshipsCreated},
             |"errors":${result.stats.errors}}""".stripMargin.replace("\n", "")))
      jobs(id) = rec
      rec
    } catch {
      case e: Exception =>
        val rec = jobs(id).copy(status = "Failed", finishedAt = Some(clock()),
          lockedBy = None, resultJson = Some(s"""{"error":"${e.getMessage}"}"""))
        jobs(id) = rec
        rec
    } finally releaseLock(id, owner)
  }

  /** D14 delete job: relationships → twins → models, counted and
    * checkpoint-ordered exactly like DeleteJob.cs:197-428. */
  def runDelete(id: String, store: TwinStore, owner: String = "driver"): JobRecord = {
    if (!acquireLock(id, owner)) throw StoreException(409, s"job $id locked")
    jobs(id) = JobRecord(id, "delete", "Running", clock(), None, Some(owner), None, None)
    try {
      var rels = 0L; var twins = 0L
      // relationships first (FK-like ordering)
      for ((src, rid) <- store.relationshipKeys) { store.deleteRelationship(src, rid); rels += 1 }
      for (tid <- store.twinIds) { store.deleteTwin(tid); twins += 1 }
      val nModels = store.models.models.size
      store.deleteAllModels()
      val rec = jobs(id).copy(status = "Succeeded", finishedAt = Some(clock()),
        lockedBy = None,
        resultJson = Some(
          s"""{"relationshipsDeleted":$rels,"twinsDeleted":$twins,"modelsDeleted":$nModels}"""))
      jobs(id) = rec
      rec
    } finally releaseLock(id, owner)
  }

  def cancel(id: String): JobRecord = {
    val rec = get(id)
    if (rec.status != "Running" && rec.status != "NotStarted")
      throw StoreException(400, s"job $id is ${rec.status}")
    val out = rec.copy(status = "Cancelled", finishedAt = Some(clock()))
    jobs(id) = out
    out
  }

  /** TTL purge of finished jobs (JobService.cs:954-977). */
  def purgeFinishedBefore(isoTime: String): Int = {
    val done = Set("Succeeded", "PartiallySucceeded", "Failed", "Cancelled")
    val victims = jobs.values.filter(j =>
      done(j.status) && j.finishedAt.exists(_ < isoTime)).map(_.id).toSeq
    victims.foreach(jobs.remove)
    victims.size
  }
}
