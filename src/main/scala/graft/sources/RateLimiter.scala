package graft.sources

/** Token-bucket rate limiter for remote fetch loops (reference
  * `src/core/indexer/github-rate-limiter.ts:28-196` — the repo tree
  * fetcher throttles API calls). Injectable clock so tests never
  * sleep; at scale one limiter instance lives per fetch partition
  * (`mapPartitions`), bounding aggregate request rate to
  * partitions × ratePerSecond.
  */
class RateLimiter(ratePerSecond: Double, burst: Int,
    nanoTime: () => Long = () => System.nanoTime()) {
  require(ratePerSecond > 0 && burst >= 1)

  private var tokens: Double = burst.toDouble
  private var last: Long = nanoTime()

  private def refill(): Unit = {
    val now = nanoTime()
    tokens = math.min(burst.toDouble,
      tokens + (now - last) / 1e9 * ratePerSecond)
    last = now
  }

  /** Nanoseconds the caller must wait before proceeding (0 = go now);
    * consumes a token when admitted. */
  def acquireDelayNanos(): Long = synchronized {
    refill()
    if (tokens >= 1.0) { tokens -= 1.0; 0L }
    else ((1.0 - tokens) / ratePerSecond * 1e9).toLong
  }

  /** Blocking acquire (production path). */
  def acquire(): Unit = {
    var d = acquireDelayNanos()
    while (d > 0) {
      Thread.sleep(d / 1000000, (d % 1000000).toInt)
      d = acquireDelayNanos()
    }
  }
}
