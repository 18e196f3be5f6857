package graft.util

/** Injectable time source so throttling/backoff logic is testable with a
  * logical clock (SURVEY §5: "timing tests … logical clock, not
  * wall-clock"). */
trait Clock {
  def nowMs(): Long
  def sleep(ms: Long): Unit
}

object SystemClock extends Clock {
  def nowMs(): Long = System.currentTimeMillis()
  def sleep(ms: Long): Unit = if (ms > 0) Thread.sleep(ms)
}

/** Deterministic test clock: sleeping advances logical time. */
final class LogicalClock(start: Long = 0L) extends Clock {
  private var t = start
  val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
  def nowMs(): Long = synchronized(t)
  def sleep(ms: Long): Unit = synchronized {
    sleeps += ms
    t += math.max(0L, ms)
  }
  def advance(ms: Long): Unit = synchronized { t += ms }
}
