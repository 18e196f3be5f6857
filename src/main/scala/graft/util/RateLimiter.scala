package graft.util

/** I2 — global rate limiter (src/lib/rateLimit.ts:3-9 + Bottleneck
  * semantics): max concurrency 1, minimum spacing ⌈1000/rps⌉ ms between
  * operation starts — the reference wraps every Notion call in this. */
final class RateLimiter(requestsPerSecond: Int, clock: Clock = SystemClock) {
  require(requestsPerSecond > 0)
  val minTimeMs: Long = math.ceil(1000.0 / requestsPerSecond).toLong
  private var lastStartMs: Option[Long] = None

  def schedule[T](op: () => T): T = synchronized {
    val now = clock.nowMs()
    val earliest = lastStartMs.map(_ + minTimeMs).getOrElse(now)
    if (earliest > now) clock.sleep(earliest - now)
    lastStartMs = Some(clock.nowMs())
    op()
  }
}
