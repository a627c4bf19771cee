package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Multi-tier API rate limiting + database-protection guards — the
  * reference's RateLimitingConfiguration.cs (global fixed window +
  * Light/Medium/Heavy/Admin per-tier policies + weighted query token
  * bucket) and DatabaseProtectionMiddleware.cs (per-user concurrency cap
  * + query-complexity budget per window), re-expressed for the JDK
  * HttpServer binding. Defaults follow
  * docs/deployment-installation/performance.mdx:25-70.
  *
  * The ASP.NET limiters additionally queue up to QueueLimit waiters; a
  * synchronous exchange handler has no async queue to park requests in,
  * so over-limit requests 429 immediately with Retry-After — the
  * decision surface (which tier, which window, which budget) is the
  * part that matters for parity and is what the specs assert. */
object Protection {

  /** Operation tiers (performance.mdx:25-38). */
  sealed trait Tier
  object Tier {
    case object Global extends Tier
    case object Light extends Tier     // single GETs, lists, telemetry
    case object Medium extends Tier    // batch reads
    case object Heavy extends Tier     // twin/relationship writes+deletes
    case object Admin extends Tier     // models + jobs
    case object WeightedQuery extends Tier // POST /query token bucket
  }

  final case class Limits(
      globalPermits: Int = 1000, globalWindowSeconds: Int = 1,
      lightPermits: Int = 100, lightWindowSeconds: Int = 1,
      mediumPermits: Int = 50, mediumWindowSeconds: Int = 1,
      heavyPermits: Int = 20, heavyWindowSeconds: Int = 1,
      adminPermits: Int = 50, adminWindowSeconds: Int = 60,
      queryTokensPerWindow: Int = 50, queryWindowSeconds: Int = 1)

  final case class ProtectionConfig(
      limits: Limits = Limits(),
      maxConcurrentRequestsPerUser: Int = 20,
      maxQueryComplexityPerWindow: Double = 20000.0,
      queryComplexityWindowSeconds: Long = 60,
      baseQueryComplexity: Double = 1.0,
      clock: () => Long = () => System.currentTimeMillis())

  /** Outcome of the admission decision for one request. */
  sealed trait Decision
  case object Admitted extends Decision
  /** 429; `retryAfterSeconds` for the Retry-After header, `reason` for
    * the error envelope. */
  final case class Rejected(retryAfterSeconds: Long, reason: String) extends Decision

  /** One fixed window: permits refill when the window rolls over. */
  private final class FixedWindow(permits: Int, windowMillis: Long,
      clock: () => Long) {
    private var windowStart = clock()
    private var used = 0
    def tryAcquire(n: Int = 1): Option[Long] = synchronized {
      val now = clock()
      if (now - windowStart >= windowMillis) { windowStart = now; used = 0 }
      if (used + n > permits)
        Some(math.max(1L, (windowStart + windowMillis - now + 999) / 1000))
      else { used += n; None }
    }
    /** Return a permit acquired this window — a request rejected by a
      * LATER check must not erode the shared window for everyone else.
      * No-op if the window already rolled over (the permit expired). */
    def refund(n: Int = 1): Unit = synchronized {
      if (clock() - windowStart < windowMillis) used = math.max(0, used - n)
    }
  }

  /** Tier classification for a (method, path-segments) pair, mirroring
    * the per-endpoint RequireRateLimiting calls:
    * DigitalTwinsEndpoints.cs:32,61 (GET Light, writes Heavy),
    * RelationshipsEndpoints.cs:47,143, ComponentsEndpoints.cs:38,68,
    * TelemetryEndpoints.cs:40 (Light), ModelsEndpoints.cs:61 and
    * ImportJobEndpoints.cs:30 (Admin), QueryEndpoints.cs:67 (weighted). */
  def classify(method: String, segs: List[String]): Option[Tier] = segs match {
    case "query" :: _ => Some(Tier.WeightedQuery)
    case "models" :: _ => Some(Tier.Admin)
    case "jobs" :: _ => Some(Tier.Admin)
    case "relationships" :: _ => Some(Tier.Heavy) // batch create/replace
    case "digitaltwins" :: _ =>
      // hybrid search (POST only) is a read (DigitalTwinsEndpoints.cs:151:
      // LightOperations); a PUT/PATCH/DELETE on the twin id "search" is
      // still a write and stays Heavy
      if (method == "GET" || segs.lastOption.contains("telemetry") ||
          (method == "POST" && segs == List("digitaltwins", "search")))
        Some(Tier.Light)
      else Some(Tier.Heavy)
    case _ => None // graph lifecycle & unknown routes: global only
  }
}

/** Stateful guard instance — one per HttpApi. */
final class Protection(cfg: Protection.ProtectionConfig = Protection.ProtectionConfig()) {
  import Protection._

  private val clockMs = cfg.clock
  private def window(permits: Int, seconds: Int) =
    new FixedWindow(permits, seconds * 1000L, clockMs)

  private val global = window(cfg.limits.globalPermits, cfg.limits.globalWindowSeconds)
  private val light = window(cfg.limits.lightPermits, cfg.limits.lightWindowSeconds)
  private val medium = window(cfg.limits.mediumPermits, cfg.limits.mediumWindowSeconds)
  private val heavy = window(cfg.limits.heavyPermits, cfg.limits.heavyWindowSeconds)
  private val admin = window(cfg.limits.adminPermits, cfg.limits.adminWindowSeconds)
  private val query = window(cfg.limits.queryTokensPerWindow, cfg.limits.queryWindowSeconds)

  private final class UserMetrics {
    val concurrent = new AtomicInteger(0)
    var complexityWindowStart: Long = clockMs()
    var complexitySpent: Double = 0.0
  }
  private val users = new ConcurrentHashMap[String, UserMetrics]()

  /** Full admission check: per-user concurrency → (query routes)
    * complexity budget → global window → tier window. Per-user checks run
    * FIRST so a request destined for a per-user 429 never debits the
    * shared windows (one user's rejected burst must not erode everyone
    * else's capacity); a tier rejection refunds the already-debited
    * global permit for the same reason. On admission the per-user
    * concurrent count is incremented — the caller MUST pair with
    * [[release]] in a finally. */
  def admit(method: String, segs: List[String], userId: String): Decision = {
    val tier = classify(method, segs)
    val m = users.computeIfAbsent(userId, _ => new UserMetrics)
    // concurrency cap (DatabaseProtectionMiddleware.cs:43-56) — reserve
    // the slot with a CAS loop so concurrent admits cannot both pass a
    // stale check and overshoot the cap.
    var reserved = false
    while (!reserved) {
      val cur = m.concurrent.get()
      if (cur >= cfg.maxConcurrentRequestsPerUser)
        return Rejected(1, s"maximum ${cfg.maxConcurrentRequestsPerUser} " +
          "concurrent requests allowed per user")
      reserved = m.concurrent.compareAndSet(cur, cur + 1)
    }
    def rollbackConcurrent(): Unit = m.concurrent.decrementAndGet()
    // query complexity budget (DatabaseProtectionMiddleware.cs:58-74):
    // checked before the request, debited by base complexity on entry;
    // the executed query's real charge tops up via recordQueryCharge.
    var complexityDebited = false
    if (tier.contains(Tier.WeightedQuery)) {
      m.synchronized {
        val now = clockMs()
        if (now - m.complexityWindowStart >= cfg.queryComplexityWindowSeconds * 1000) {
          m.complexityWindowStart = now
          m.complexitySpent = 0.0
        }
        if (m.complexitySpent > cfg.maxQueryComplexityPerWindow) {
          rollbackConcurrent()
          return Rejected(
            math.max(1L, (m.complexityWindowStart +
              cfg.queryComplexityWindowSeconds * 1000 - now) / 1000),
            "query units limit exceeded; reduce query complexity or wait")
        }
        m.complexitySpent += cfg.baseQueryComplexity
        complexityDebited = true
      }
    }
    def rollbackUser(): Unit = {
      if (complexityDebited) m.synchronized {
        m.complexitySpent = math.max(0.0, m.complexitySpent - cfg.baseQueryComplexity)
      }
      rollbackConcurrent()
    }
    global.tryAcquire() match {
      case Some(retry) =>
        rollbackUser()
        return Rejected(retry, "global rate limit exceeded")
      case None =>
    }
    val tierResult = tier match {
      case Some(Tier.Light) => light.tryAcquire().map(r => (r, "light"))
      case Some(Tier.Medium) => medium.tryAcquire().map(r => (r, "medium"))
      case Some(Tier.Heavy) => heavy.tryAcquire().map(r => (r, "heavy"))
      case Some(Tier.Admin) => admin.tryAcquire().map(r => (r, "admin"))
      case Some(Tier.WeightedQuery) => query.tryAcquire().map(r => (r, "query"))
      case _ => None
    }
    tierResult match {
      case Some((retry, name)) =>
        global.refund()
        rollbackUser()
        return Rejected(retry, s"$name operations rate limit exceeded")
      case None =>
    }
    Admitted
  }

  /** Debit the actual charge a query consumed (the reference feeds
    * `HttpContext.Items["QueryCharge"]` back into the weighted limiter,
    * WeightedQueryRateLimitingMiddleware.cs:28-45). */
  def recordQueryCharge(userId: String, charge: Double): Unit = {
    val m = users.computeIfAbsent(userId, _ => new UserMetrics)
    m.synchronized { m.complexitySpent += math.max(0.0, charge - cfg.baseQueryComplexity) }
  }

  def release(userId: String): Unit =
    Option(users.get(userId)).foreach(_.concurrent.decrementAndGet())

  /** Visible for specs. */
  def concurrentFor(userId: String): Int =
    Option(users.get(userId)).map(_.concurrent.get()).getOrElse(0)
}
