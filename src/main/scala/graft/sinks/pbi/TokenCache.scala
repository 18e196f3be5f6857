package graft.sinks.pbi

import graft.util.{Clock, SystemClock}

/** K7 — OAuth client-credentials token cache
  * (src/sinks/pbi/client/auth.ts:26-85): fetch through an injectable
  * token source (HTTP in production, fake in tests), cache until 60 s
  * before expiry (early-expiry skew), refresh on demand. Fetches go
  * through the standard retry policy (5 retries, 500 ms base, 10 s cap).
  */
object TokenCache {
  /** (accessToken, expiresInSeconds) as returned by the token endpoint. */
  type TokenSource = () => (String, Long)
  val EarlyExpirySkewMs = 60000L
}

final class TokenCache(source: TokenCache.TokenSource,
                       clock: Clock = SystemClock,
                       retryOptions: graft.util.Retry.RetryOptions =
                         graft.util.Retry.RetryOptions(maxRetries = 5,
                           baseDelayMs = 500, maxDelayMs = 10000),
                       jitter: () => Long = () => scala.util.Random.nextInt(201).toLong) {
  import TokenCache._
  private var cached: Option[(String, Long)] = None // (token, expiresAtMs)
  var fetchCount = 0

  def accessToken(): String = synchronized {
    val now = clock.nowMs()
    cached match {
      case Some((token, expiresAt)) if now < expiresAt - EarlyExpirySkewMs => token
      case _ =>
        val (token, expiresInSecs) = graft.util.Retry.retry(retryOptions, clock, jitter) { () =>
          fetchCount += 1
          source()
        }
        cached = Some((token, clock.nowMs() + expiresInSecs * 1000))
        token
    }
  }

  def invalidate(): Unit = synchronized { cached = None }
}
