package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING change-feed source over graft tables — the Delta-style
  * `spark.readStream.format("graft")`:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("keyCols", "doc_id")      // the change-feed switch
  *     .load(root)                       // epoch OR manifest table
  * }}}
  *
  * Offsets ARE table versions. Each micro-batch (v₀, v₁] delivers the
  * derived Debezium-shaped diff
  * ([[graft.sinks.VersionedTable.changesBetween]] /
  * [[graft.sinks.ManifestTable.changesBetween]]): key columns +
  * payload + `op` (I/U/D) + `seq` = v₁. The FIRST batch bootstraps —
  * the whole table at the stream's starting version as 'I' rows (the
  * [[graft.sinks.VersionedTable.consumeChanges]] contract, now with
  * Structured Streaming's checkpoint as the durable consumer offset).
  * Piped into `applyCdc` on a downstream table this is the medallion
  * hop, and it is REPLAY-IDEMPOTENT: a restart re-plans the same
  * (v₀, v₁] from the checkpoint, versions are immutable, and the diff
  * is deterministic, so the re-delivered batch folds to the same
  * content.
  *
  * Contract: the table is KEYED (one row per key at every version —
  * the merge/applyCdc invariant) and `keyCols` names its key. A
  * stream that lagged past vacuumed history fails fast on the missing
  * version — re-bootstrap with a fresh checkpoint.
  *
  * Scale shape: each batch costs one keyed diff (two version scans +
  * one full-outer join) + one materialization of the DELTA under the
  * stream's checkpoint scratch — cost ∝ batch, never ∝ stream
  * lifetime; the materialized delta is then served through the
  * delegated vectorized parquet reader like any other scan.
  */
final class GraftChangeFeedTable(spark: SparkSession, root: String,
                                 keyCols: Seq[String],
                                 feedSchema: StructType)
  extends Table with SupportsRead {

  override def name(): String = s"graft-changes.`$root`"
  override def schema(): StructType = feedSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = feedSchema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new GraftChangeFeedStream(spark, root, keyCols, feedSchema,
          checkpointLocation,
          Option(options.get("maxVersionsPerTrigger")).map(_.toLong))
    }
}

object GraftChangeFeedTable {
  /** Feed schema = table schema + the op/seq control columns. */
  def feedSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields.toSeq :+
      StructField("op", StringType, nullable = false) :+
      StructField("seq", LongType, nullable = false))
}

/** A table version as a streaming offset. */
final case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

object GraftVersionOffset {
  private val Re = """"version"\s*:\s*(-?\d+)""".r.unanchored
  def parse(json: String): GraftVersionOffset = json match {
    case Re(v) => GraftVersionOffset(v.toLong)
    case _ => throw new IllegalArgumentException(s"bad graft offset: $json")
  }
}

/** One leaf of the delegated parquet read, carrying the reader
  * factory its batch was planned with (a MicroBatchStream has one
  * global factory but plans per-batch scans — the partition is the
  * only channel wide enough to ship the per-batch factory). */
final case class GraftDelegatingPartition(inner: InputPartition,
                                          factory: PartitionReaderFactory)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

object GraftDelegatingReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    p match {
      case GraftDelegatingPartition(inner, f) => f.createReader(inner)
      case other => throw new IllegalStateException(s"unexpected $other")
    }
  override def supportColumnarReads(p: InputPartition): Boolean = false
}

final class GraftChangeFeedStream(spark: SparkSession, root: String,
                                  keyCols: Seq[String],
                                  feedSchema: StructType,
                                  checkpointLocation: String,
                                  maxVersionsPerTrigger: Option[Long] = None)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow snapshot: without native support Spark
    * wraps the stream and the wrapper's latestOffset bypasses the
    * inner admission control — one giant catch-up batch. Supporting
    * the trigger natively keeps `maxVersionsPerTrigger` honored while
    * the run still stops at the versions available at start. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(currentVersion)

  private val isManifest = graft.sinks.ManifestTable.exists(spark, root)

  private def currentVersion: Long =
    if (isManifest) graft.sinks.ManifestTable.latestVersion(spark, root)
    else graft.sinks.VersionedTable.latestVersion(spark, root)

  private def oldestRetained: Long =
    (if (isManifest) graft.sinks.ManifestTable.versions(spark, root)
     else graft.sinks.VersionedTable.versions(spark, root))
      .headOption.getOrElse(currentVersion)

  private def readVersion(v: Long): DataFrame =
    if (isManifest) graft.sinks.ManifestTable.readVersion(spark, root, v)
    else graft.sinks.VersionedTable.readVersion(spark, root, v)

  private def changes(from: Long, to: Long): DataFrame =
    if (isManifest)
      graft.sinks.ManifestTable.changesBetween(spark, root, from, to, keyCols)
    else
      graft.sinks.VersionedTable.changesBetween(spark, root, from, to, keyCols)

  override def initialOffset(): Offset = GraftVersionOffset(-1L)

  override def latestOffset(): Offset = GraftVersionOffset(currentVersion)

  /** Admission control — `maxVersionsPerTrigger` caps how many table
    * versions one micro-batch may span (the Delta `maxFilesPerTrigger`
    * shape: bound per-batch diff cost on a backlogged stream instead
    * of one giant catch-up batch). The bootstrap batch (start = -1)
    * is always a single version, clamped to the OLDEST RETAINED one —
    * a vacuumed table must not send a fresh stream chasing version 0
    * it no longer holds. */
  override def latestOffset(
      start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val cur = availableNowCap.getOrElse(currentVersion)
    val from = GraftVersionOffset.parse(start.json()).version
    maxVersionsPerTrigger match {
      case Some(m) if from < 0L =>
        GraftVersionOffset(math.min(cur, math.max(oldestRetained, m - 1)))
      case Some(m) => GraftVersionOffset(math.min(cur, from + m))
      case None => GraftVersionOffset(cur)
    }
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset.parse(json)

  /** The (from, to] diff — bootstrap when the stream has consumed
    * nothing yet. Column order is pinned to the feed schema. */
  private def batchDf(from: Long, to: Long): DataFrame = {
    val df =
      if (from < 0L) {
        val b = readVersion(to)
        b.select(b.columns.map(col).toIndexedSeq :+
          lit("I").as("op") :+ lit(to).as("seq"): _*)
      } else changes(from, to)
    df.select(feedSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = GraftVersionOffset.parse(start.json()).version
    val to = GraftVersionOffset.parse(end.json()).version
    if (to <= from) return Array.empty
    // materialize the delta under the stream's checkpoint scratch —
    // ONCE per range: Spark may re-plan the same batch (retries,
    // restarts) while earlier-planned tasks still hold the files, so
    // a completed materialization is REUSED, never rewritten (sound:
    // versions are immutable, the diff is deterministic); a torn one
    // (no _SUCCESS) is replaced
    val dir = s"$checkpointLocation/graft-feed/batch-$from-$to"
    val dirPath = new Path(dir)
    val f = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(new Path(dirPath, "_SUCCESS"))) {
      if (f.exists(dirPath)) f.delete(dirPath, true): Unit
      batchDf(from, to).write.parquet(dir)
    }
    val index = new InMemoryFileIndex(spark, Seq(new Path(dir)),
      Map.empty, Some(feedSchema))
    val batch = ParquetScanBuilder(spark, index, feedSchema, feedSchema,
      CaseInsensitiveStringMap.empty()).build().toBatch
    val factory = batch.createReaderFactory()
    batch.planInputPartitions().map(p =>
      GraftDelegatingPartition(p, factory): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftDelegatingReaderFactory

  /** Materialized deltas at or below the committed offset can never
    * be re-planned (Spark does not replay committed batches), so they
    * are garbage — without this sweep a long-running stream's
    * checkpoint scratch would grow one directory per micro-batch
    * forever. */
  override def commit(end: Offset): Unit = {
    val committed = GraftVersionOffset.parse(end.json()).version
    val feedDir = new Path(s"$checkpointLocation/graft-feed")
    try {
      val fs = feedDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(feedDir)) {
        val Name = """batch-(-?\d+)-(-?\d+)""".r
        fs.listStatus(feedDir).filter(_.isDirectory).foreach { d =>
          d.getPath.getName match {
            case Name(_, to) if to.toLong <= committed =>
              fs.delete(d.getPath, true): Unit
            case _ => ()
          }
        }
      }
    } catch { case _: Exception => () } // cleanup is best-effort
  }

  override def stop(): Unit = ()
}
