package graft

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A local filesystem under its own scheme that COUNTS listStatus
  * calls — the probe for "versions() never lists the directory"
  * (version-list checkpointing). Registered per test via
  * `fs.counting.impl`; the same on-disk files are reachable through
  * both `file:` and `counting:` paths. */
class CountingFs extends RawLocalFileSystem {
  override def getScheme: String = "counting"
  override def getUri: java.net.URI = java.net.URI.create("counting:///")
  override def listStatus(p: Path): Array[FileStatus] = {
    CountingFs.listCalls.incrementAndGet(): Unit
    super.listStatus(p)
  }
}

object CountingFs {
  val listCalls = new java.util.concurrent.atomic.AtomicLong(0L)
}
