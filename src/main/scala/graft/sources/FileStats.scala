package graft.sources

import graft.sinks.VersionedTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file column statistics + data-skipping reads — the metadata
  * layer that makes a 100 TB table scannable: one tiny row per FILE
  * (min/max/null-count per tracked column + row count), so a range
  * predicate can discard whole files before Spark ever opens them.
  * This is the stats half of the lakehouse-table pattern (Delta/Iceberg
  * file-level `minValues`/`maxValues`) on plain parquet directories,
  * composing with the pieces this repo already has:
  *
  *   - [[FileManifest]] discovers which files are NEW per ingest epoch;
  *   - [[collectFor]] scans ONLY those files for their stats (cost ∝
  *     new data, never the table);
  *   - [[commitStats]] upserts the rows into a
  *     [[graft.sinks.VersionedTable]] keyed by path (always-readable
  *     pointer flip, as-of history);
  *   - [[readRange]] prunes against the stats table and reads only
  *     surviving files, then applies the exact row predicate.
  *
  * Pruning is SOUND, never assumed complete: a kept file may hold rows
  * outside the range (the row filter handles them) but no file holding
  * a matching row is ever dropped — `max < lo || min > hi` can only be
  * true when every value in the file misses the range, and an all-null
  * file (NULL min/max → NULL comparison → filtered out) cannot match a
  * range predicate, which rejects NULL by SQL semantics. The win is
  * proportional to layout quality: data written via
  * [[graft.sinks.ParquetSink]]'s range or Z-order writers yields files
  * with narrow, disjoint min/max envelopes — on a day-ranged layout a
  * one-day query opens ~1/days of the files. The stats table itself is
  * |files| rows — metadata scale — so the driver-side path collection
  * here is bounded by the same argument as [[FileManifest.listFiles]].
  */
object FileStats {

  /** Stats for every file in a parquet directory: one scan, grouped by
    * `input_file_name()` — distributed, no per-file driver loop. Use
    * [[collectFor]] + [[commitStats]] for incremental maintenance. */
  def collect(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(dir), cols)

  /** Stats for an explicit file list (the [[FileManifest.newFiles]]
    * batch): cost ∝ the new files, not the table. */
  def collectFor(spark: SparkSession, files: Seq[String],
                 cols: Seq[String]): DataFrame =
    statsOf(spark.read.parquet(files: _*), cols)

  private def statsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "track at least one column")
    val aggs = count(lit(1)).as("row_count") +: cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    }
    df.groupBy(input_file_name().as("path")).agg(aggs.head, aggs.tail: _*)
  }

  /** Upsert a batch's stats rows into the versioned stats table (a
    * re-landed file's stats replace the old row — same (path) identity
    * caveat as the manifest). Returns the committed version. */
  def commitStats(stats: DataFrame, root: String): Long =
    if (VersionedTable.latestVersion(stats.sparkSession, root) < 0)
      VersionedTable.write(stats, root)
    else VersionedTable.merge(stats, root, Seq("path"))

  /** Pointer-resolved read of the current stats table. */
  def readStats(spark: SparkSession, root: String): DataFrame =
    VersionedTable.read(spark, root)

  /** Files whose [min,max] envelope for `c` intersects [lo,hi] —
    * the sound-prune set for `c BETWEEN lo AND hi`. */
  def candidateFiles(stats: DataFrame, c: String,
                     lo: Column, hi: Column): DataFrame =
    stats.filter(!(col(s"${c}_max") < lo || col(s"${c}_min") > hi))
      .select(col("path"))

  /** Exactly the rows of the table with `c` in [lo, hi], reading only
    * files the stats cannot rule out. Result is independent of the
    * stats' freshness ONLY if the stats cover every live file —
    * maintain them through [[FileManifest]] commits. */
  def readRange(spark: SparkSession, stats: DataFrame, c: String,
                lo: Column, hi: Column): DataFrame = {
    val paths = candidateFiles(stats, c, lo, hi)
      .collect().map(_.getString(0)).sorted // |files| rows: metadata scale
    val schema = spark.read.parquet(
      stats.select("path").head().getString(0)).schema
    val pruned =
      if (paths.isEmpty)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else spark.read.schema(schema).parquet(paths: _*)
    pruned.filter(col(c).between(lo, hi))
  }
}
