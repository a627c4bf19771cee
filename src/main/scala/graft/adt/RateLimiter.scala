package graft.adt

/** Charge-weighted token bucket — the policy layer the reference runs as
  * WeightedQueryRateLimitingMiddleware + DatabaseProtectionMiddleware
  * (/root/reference/src/AgeDigitalTwins.ApiService/Middleware, budget
  * 20,000 charge units per window, 50 req/s, docs/deployment-installation/
  * performance.mdx:25-70). Queries debit their computed charge (B20);
  * exceeding the window budget rejects until the window rolls.
  */
final class RateLimiter(
    budgetPerWindow: Double = 20000.0,
    windowMillis: Long = 1000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private var windowStart = clock()
  private var spent = 0.0

  /** Debit `charge` if the current window has budget; false = throttled.
    * A single charge larger than the whole budget is rejected outright. */
  def tryAcquire(charge: Double): Boolean = synchronized {
    val now = clock()
    if (now - windowStart >= windowMillis) {
      windowStart = now
      spent = 0.0
    }
    if (spent + charge > budgetPerWindow) false
    else { spent += charge; true }
  }

  def remaining: Double = synchronized {
    if (clock() - windowStart >= windowMillis) budgetPerWindow
    else budgetPerWindow - spent
  }
}
