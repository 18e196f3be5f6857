package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Shared maintenance for the path-keyed metadata epoch tables (the
  * [[FileStats]] stats table and the [[FileBloomIndex]] bloom index).
  *
  * Both tables key one row per data FILE by its path. That identity is
  * correct for append-only ingest (the manifest loop: new file → new
  * row), but any REWRITE — `mode("overwrite")` re-land, a
  * [[graft.sinks.ParquetSink.compactTable]] pass — creates files under
  * NEW names and deletes the old ones, stranding metadata rows whose
  * path no longer exists. A stale stats row makes pruning decisions
  * for a dead file; a stale bloom row makes the point-lookup read path
  * try to OPEN the dead file and crash. Two closures, both here:
  *
  *   - full rebuilds commit with REPLACE semantics
  *     ([[FileBloomIndex.commitFull]] / [[FileStats.commitStatsFull]]),
  *     so a rebuild can never inherit rows from a previous layout;
  *   - the manifest-driven maintenance tick calls [[reconcile]], which
  *     drops committed rows whose file is gone — one live listing
  *     against metadata-scale rows, cost independent of data volume.
  *
  * Path identity is canonicalized to the URI path component so the
  * `input_file_name()`-sourced rows (`file:///…`, percent-escaped)
  * and filesystem listings (plain `/…`) compare equal.
  */
private[sources] object PathMetadata {

  /** Scheme-independent canonical form of a recorded file path. */
  def canon(path: String): String =
    new org.apache.hadoop.fs.Path(path).toUri.getPath

  /** Canonical paths of every live data file under `dataDir`
    * (recursive, hidden/underscore files excluded — the same listing
    * contract as [[FileManifest.listFiles]]). */
  def livePaths(spark: SparkSession, dataDir: String,
                suffix: String = ".parquet"): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dataDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    val out = Set.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && name.endsWith(suffix) && !name.startsWith("_") &&
        !name.startsWith("."))
        out += f.getPath.toUri.getPath
    }
    out.result()
  }

  /** Drop committed metadata rows whose path is no longer a live file
    * under `dataDir`, committing the survivors as a new epoch. Returns
    * the committed version, or None when every row is live (no epoch
    * churn on a clean table). The row set is metadata scale (one row
    * per file), so the driver-side path collection is bounded by the
    * same argument as [[FileManifest.listFiles]]. */
  def reconcile(spark: SparkSession, root: String,
                dataDir: String): Option[Long] = {
    val live = livePaths(spark, dataDir)
    val table = graft.sinks.VersionedTable.read(spark, root)
    val recorded = table.select(col("path"))
      .collect().map(_.getString(0)) // |files| rows: metadata scale
    val dead = recorded.filterNot(p => live.contains(canon(p)))
    if (dead.isEmpty) None
    else Some(graft.sinks.VersionedTable.write(
      table.filter(!col("path").isin(dead.toIndexedSeq: _*)), root))
  }

  /** True when `path` (as recorded by `input_file_name()` or a
    * listing) names an existing file. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Verify every pruned-read candidate still exists, naming the
    * freshness contract on failure instead of surfacing a raw
    * PATH_NOT_FOUND from deep inside the scan. `what` names the
    * calling index for the message. Existence checks are one metadata
    * RPC per CANDIDATE file (the post-prune set, not the table). */
  def requireLive(spark: SparkSession, paths: Seq[String], what: String): Unit = {
    val missing = paths.filterNot(exists(spark, _))
    if (missing.nonEmpty)
      throw new IllegalStateException(
        s"$what: index references ${missing.size} deleted file(s), e.g. " +
          s"${missing.head}. The index is stale for a rewritten layout — " +
          "full rebuilds must commit with commitFull (replace), and " +
          "rewrites/compactions must be followed by reconcile().")
  }

  /** Schema of the table, probed from the first LIVE recorded path —
    * a dead first row must not poison the probe. */
  def liveSchema(spark: SparkSession, recordedPaths: Seq[String],
                 what: String): org.apache.spark.sql.types.StructType =
    recordedPaths.find(exists(spark, _)) match {
      case Some(p) => spark.read.parquet(p).schema
      case None => throw new IllegalStateException(
        s"$what: no recorded file exists on disk — the index is fully " +
          "stale; rebuild it with commitFull against the live layout.")
    }
}
