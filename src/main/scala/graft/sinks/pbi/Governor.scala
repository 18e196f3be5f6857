package graft.sinks.pbi

import graft.util.{Clock, SystemClock}

/** I3 — refresh governor (src/sinks/pbi/refresh/governor.ts:15-141):
  * sliding 1-minute / 1-hour budget windows for rows and POST requests;
  * blocks until the oldest contributing event expires. Defaults from
  * limits.ts:1-3.
  */
object Governor {
  case class Limits(maxRowsPerHour: Long = 900000L,
                    maxPostRequestsPerMinute: Int = 60,
                    maxPostRequestsPerHour: Int = 120)
  private val MinuteMs = 60000L
  private val HourMs = 3600000L
}

final class Governor(limits: Governor.Limits = Governor.Limits(),
                     clock: Clock = SystemClock) {
  import Governor._
  private case class RowEvent(ts: Long, rows: Long)
  private val rowEvents = scala.collection.mutable.Queue.empty[RowEvent]
  private val postTs = scala.collection.mutable.Queue.empty[Long]

  private def validate(rows: Long, posts: Int): Unit = {
    if (rows < 0 || posts < 0)
      throw new IllegalArgumentException("Refresh governor input cannot be negative.")
    if (rows > limits.maxRowsPerHour)
      throw new IllegalArgumentException(
        s"Requested rows ($rows) exceed configured maxRowsPerHour (${limits.maxRowsPerHour}).")
    if (posts > limits.maxPostRequestsPerMinute)
      throw new IllegalArgumentException(
        s"Requested postRequests ($posts) exceed configured maxPostRequestsPerMinute (${limits.maxPostRequestsPerMinute}).")
    if (posts > limits.maxPostRequestsPerHour)
      throw new IllegalArgumentException(
        s"Requested postRequests ($posts) exceed configured maxPostRequestsPerHour (${limits.maxPostRequestsPerHour}).")
  }

  private def pruneExpired(): Unit = {
    val hourCutoff = clock.nowMs() - HourMs
    while (postTs.nonEmpty && postTs.head <= hourCutoff) postTs.dequeue()
    while (rowEvents.nonEmpty && rowEvents.head.ts <= hourCutoff) rowEvents.dequeue()
  }

  private def blockingDelayMs(rows: Long, posts: Int): Long = {
    val now = clock.nowMs()
    val minuteCutoff = now - MinuteMs
    val hourRowsUsed = rowEvents.map(_.rows).sum
    val minutePosts = postTs.count(_ > minuteCutoff)
    val hourPosts = postTs.size
    val exceedsRows = hourRowsUsed + rows > limits.maxRowsPerHour
    val exceedsMinute = minutePosts + posts > limits.maxPostRequestsPerMinute
    val exceedsHour = hourPosts + posts > limits.maxPostRequestsPerHour
    if (!exceedsRows && !exceedsMinute && !exceedsHour) return 0L
    var candidates = List.empty[Long]
    if (exceedsRows && rowEvents.nonEmpty)
      candidates ::= rowEvents.head.ts + HourMs - now
    if (exceedsMinute)
      postTs.find(_ > minuteCutoff).foreach(ts => candidates ::= ts + MinuteMs - now)
    if (exceedsHour && postTs.nonEmpty)
      candidates ::= postTs.head + HourMs - now
    if (candidates.isEmpty) MinuteMs else math.max(1L, candidates.min)
  }

  /** Sleep until the requested (rows, posts) fit every window. */
  def waitForBudget(rows: Long, posts: Int): Unit = synchronized {
    validate(rows, posts)
    var done = false
    while (!done) {
      pruneExpired()
      val waitMs = blockingDelayMs(rows, posts)
      if (waitMs <= 0) done = true else clock.sleep(waitMs)
    }
  }

  /** Record consumed budget. */
  def record(rows: Long, posts: Int): Unit = synchronized {
    validate(rows, posts)
    val now = clock.nowMs()
    if (rows > 0) rowEvents.enqueue(RowEvent(now, rows))
    (0 until posts).foreach(_ => postTs.enqueue(now))
    pruneExpired()
  }
}
