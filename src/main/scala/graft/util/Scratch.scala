package graft.util

/** One per-JVM scratch root for gated queries that materialize
  * artifacts to disk (parquet round trips, persisted dedup/sketch
  * indexes): repeat invocations overwrite the same subtree instead of
  * leaking a fresh /tmp copy per run (Bench runs each query twice per
  * round), and the whole tree is deleted on JVM exit. */
object Scratch {
  lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p
  }

  def dir(name: String): String = root.resolve(name).toString

  /** [[dir]], WIPED first — for gated queries whose artifact refuses
    * to overwrite (e.g. [[graft.sinks.ManifestTable.create]] fails on
    * an existing table): the second same-JVM invocation (Bench runs
    * every query twice per round) must REPLACE the previous run's
    * tree, not trip over it. */
  def freshDir(name: String): String = {
    def rm(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
      f.delete(): Unit
    }
    rm(root.resolve(name).toFile)
    dir(name)
  }
}
