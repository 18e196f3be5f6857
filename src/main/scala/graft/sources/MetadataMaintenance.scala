package graft.sources

import org.apache.spark.sql.SparkSession

/** The manifest-driven metadata maintenance TICK, as one callable
  * step: discover newly landed files, index ONLY those (stats rows +
  * bloom rows, cost ∝ the delta), commit them to the manifest, then
  * reconcile both metadata tables against the live listing so rows
  * for deleted/rewritten files are dropped in the same pass.
  *
  * This closes the loop [[FileManifest]] alone leaves open: the
  * manifest covers append-only ingest, but a
  * [[graft.sinks.ParquetSink.compactTable]] pass (or any overwrite
  * re-land) both DELETES indexed files and CREATES unindexed ones.
  * Compaction's new files surface through `newFiles` (fresh paths not
  * in the manifest) and get delta-indexed; its dead files are dropped
  * by [[PathMetadata.reconcile]]. After one tick, point and range
  * reads are exact again and open no dead paths.
  *
  * Every step is metadata-scale: the listing and the manifest
  * anti-join are |files| rows, the stats/bloom builds scan only the
  * new files, and reconcile rewrites |files|-row epoch tables.
  */
object MetadataMaintenance {

  /** What one tick did: files newly indexed, and the reconcile commit
    * versions (None = that table had no dead rows). */
  final case class Tick(newFiles: Int,
                       statsReconciled: Option[Long],
                       bloomReconciled: Option[Long])

  /** Run one tick. `statsCols` are the stats-tracked columns,
    * `bloomKey` the bloom-indexed point-lookup column. Either root may
    * be shared across ticks; both bootstrap on first use. */
  def tick(spark: SparkSession, landingDir: String, manifestPath: String,
           statsRoot: String, statsCols: Seq[String],
           bloomRoot: String, bloomKey: String): Tick = {
    val nf = FileManifest.newFiles(spark, landingDir, manifestPath)
    val files = nf.select("path").collect().map(_.getString(0)).toSeq
    if (files.nonEmpty) {
      FileStats.commitStats(
        FileStats.collectFor(spark, files, statsCols), statsRoot)
      FileBloomIndex.commitDelta(
        FileBloomIndex.buildFor(spark, files, bloomKey), bloomRoot)
      FileManifest.commit(spark, manifestPath, nf)
    }
    val sRec =
      if (graft.sinks.VersionedTable.latestVersion(spark, statsRoot) >= 0)
        FileStats.reconcile(spark, statsRoot, landingDir)
      else None
    val bRec =
      if (graft.sinks.VersionedTable.latestVersion(spark, bloomRoot) >= 0)
        FileBloomIndex.reconcile(spark, bloomRoot, landingDir)
      else None
    Tick(files.size, sRec, bRec)
  }
}
