package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** E11 self-healing supervision: restart a streaming query when it dies OR
  * goes silent — the Spark analogue of the reference's replication
  * watchdog, which tears down and recreates the Postgres replication
  * connection when no keepalive arrives within the timeout and re-creates
  * the slot on reconnect (AgeDigitalTwinsReplication.cs:239-271 watchdog
  * loop, :678-813 reconnect + slot re-create).
  *
  * Structured Streaming checkpoints already subsume the reference's
  * restart-from-LSN recovery (a restarted query resumes from its
  * checkpointed offsets), so the ONLY job here is detection + restart:
  *
  *   - terminated (isActive false, e.g. a sink exception killed it) →
  *     restart via the injected factory;
  *   - active but silent — no progress event for `silenceTimeoutMs`
  *     (a hung source connection, the exact failure the reference's
  *     watchdog exists for) → stop() then restart.
  *
  * `check()` is a single synchronous probe so specs drive the state
  * machine deterministically with a fake clock; [[start]] wraps it in the
  * usual daemon polling loop for deployments. Restarts are capped by
  * `maxRestarts` — after that [[gaveUp]] flips and the supervisor stands
  * down (the reference similarly surfaces repeated reconnect failure
  * instead of looping forever). */
final class StreamWatchdog(
    startQuery: () => StreamingQuery,
    silenceTimeoutMs: Long,
    clock: () => Long = () => System.currentTimeMillis(),
    maxRestarts: Int = Int.MaxValue,
    progressAt: StreamingQuery => Option[Long] = StreamWatchdog.lastProgressMillis) {

  @volatile private var query: StreamingQuery = _
  @volatile private var lastProgressAt: Long = 0L
  @volatile private var restartCount = 0
  @volatile private var givenUp = false
  @volatile private var poller: Option[Thread] = None

  def restarts: Int = restartCount
  def gaveUp: Boolean = givenUp
  def current: StreamingQuery = query

  /** Launch (or adopt) the supervised query. */
  def launch(): StreamingQuery = synchronized {
    query = startQuery()
    lastProgressAt = clock()
    query
  }

  /** The watermark a silence verdict compares against: the newest progress
    * event's wall time, or the (re)start time before any progress. */
  private def progressWatermark(): Long =
    math.max(lastProgressAt, progressAt(query).getOrElse(0L))

  /** One probe: returns true if a restart happened. */
  def check(): Boolean = synchronized {
    if (givenUp || query == null) return false
    val dead = !query.isActive
    val silent = !dead && clock() - progressWatermark() > silenceTimeoutMs
    if (!dead && !silent) return false
    if (restartCount >= maxRestarts) { givenUp = true; return false }
    if (silent) stopWithTimeout(query)
    restartCount += 1
    // a throwing factory still counts the attempt: the next probe retries
    // (or exhausts maxRestarts), instead of the failure killing the caller
    try { query = startQuery(); lastProgressAt = clock() }
    catch { case _: Exception => }
    true
  }

  /** stop() a possibly-hung query without letting it hang US: a query
    * stuck in its source can block stop() indefinitely (the exact
    * scenario this watchdog exists for), so the call runs on a scratch
    * thread with a bounded join — the reference likewise caps its dispose
    * (AgeDigitalTwinsReplication.cs:259). An abandoned stop thread is
    * daemon and cannot keep the JVM alive. */
  private def stopWithTimeout(q: StreamingQuery, waitMs: Long = 10000L): Unit = {
    val t = new Thread(() => { try q.stop() catch { case _: Exception => } },
      "graft-watchdog-stop")
    t.setDaemon(true)
    t.start()
    t.join(waitMs)
  }

  /** Deployment mode: poll `check()` on a daemon thread. */
  def start(pollIntervalMs: Long): Unit = synchronized {
    if (poller.isDefined) return
    if (query == null) launch()
    val t = new Thread(() => {
      while (!givenUp && !Thread.currentThread().isInterrupted) {
        try Thread.sleep(pollIntervalMs)
        catch { case _: InterruptedException => return }
        // a probe failure must not kill the supervisor — the next tick
        // retries; check() itself already absorbs factory failures
        try check() catch { case _: Exception => }
      }
    }, "graft-stream-watchdog")
    t.setDaemon(true)
    t.start()
    poller = Some(t)
  }

  def shutdown(): Unit = synchronized {
    poller.foreach(_.interrupt())
    poller = None
    if (query != null) stopWithTimeout(query)
  }
}

object StreamWatchdog {
  /** Default progress extractor: the newest progress event's wall time. */
  def lastProgressMillis(q: StreamingQuery): Option[Long] =
    Option(q.lastProgress)
      .map(p => java.time.Instant.parse(p.timestamp).toEpochMilli)
}
