package graft.util

/** Leveled structured logger — analog of the reference's console
  * wrapper (/root/reference/src/lib/log.ts:1-24): `[level] message`
  * with an optional structured `meta` payload rendered after the
  * message. The sink is injectable so tests capture output the same
  * way CliSpec captures `Env.log` lines.
  */
final class Log(sink: String => Unit = Console.out.println) {
  private def emit(level: String, message: String, meta: Option[String]): Unit =
    sink(meta match {
      case Some(m) => s"[$level] $message $m"
      case None    => s"[$level] $message"
    })
  def info(message: String, meta: Option[String] = None): Unit =
    emit("info", message, meta)
  def warn(message: String, meta: Option[String] = None): Unit =
    emit("warn", message, meta)
  def error(message: String, meta: Option[String] = None): Unit =
    emit("error", message, meta)
}

object Log {
  /** Default process-wide logger (console sink). */
  val console: Log = new Log()
}
