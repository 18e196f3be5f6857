package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** The DELETION-VECTOR-aware scan of a manifest-table snapshot —
  * correctness lives INSIDE the data source (any session, SQL or API,
  * reads right; no session extension involved):
  *
  *   - CLEAN files (no vector — the overwhelming majority) plan
  *     through the ordinary delegated parquet batch: manifest-listed
  *     index, envelope/bloom pruning on pushed filters, splits,
  *     vectorized reading — byte-for-byte today's path.
  *   - DV-BEARING files plan as ONE UNSPLIT partition each, read with
  *     NO pushed parquet filters: with nothing pushed, the parquet
  *     reader returns every row of the file IN FILE ORDER, so the
  *     wrapping reader's position counter IS the row index — it skips
  *     the positions the file's sidecar bitset marks deleted and
  *     emits the rest. (A pushed filter could skip row groups/pages
  *     and desynchronize the counter; Spark still applies the full
  *     predicate ABOVE the scan, so no wrong rows survive — the DV
  *     branch merely loses scan-level skipping, a read tax ∝ the
  *     DEGRADED subset that [[graft.sinks.ManifestTable
  *     .optimizeIncremental]] bounds by purging half-dead files.)
  *
  * The whole scan reports row-based reads while any vector is present
  * (Spark requires one answer per scan); a purged table goes back to
  * the plain columnar path. Column pruning applies to BOTH branches.
  */
final class GraftDvScanBuilder(
    spark: SparkSession,
    cleanBuilder: ParquetScanBuilder,
    dvBuilder: ParquetScanBuilder,
    dvFiles: Seq[(String, Long, String)], // (path, size, dv sidecar)
    commitTsMs: Long)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters {

  // filters push into the CLEAN branch only (listing prune + parquet
  // pushdown); the DV branch must read sequentially — see class doc.
  // Everything returns as post-scan filters, so Spark keeps the
  // Filter above both branches.
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    cleanBuilder.pushFilters(filters)

  override def pushedFilters: Array[Predicate] = cleanBuilder.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    cleanBuilder.pruneColumns(requiredSchema)
    dvBuilder.pruneColumns(requiredSchema)
  }

  override def build(): Scan =
    new GraftDvScan(spark, cleanBuilder.build(), dvBuilder.build(),
      dvFiles, commitTsMs)
}

final class GraftDvScan(
    spark: SparkSession, cleanScan: Scan, dvScan: Scan,
    dvFiles: Seq[(String, Long, String)], commitTsMs: Long)
  extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = cleanScan.readSchema()

  override def description(): String =
    s"GraftDvScan(dvFiles=${dvFiles.size}, clean=${cleanScan.description()})"

  /** Join planning must still see an honest size — a DV-bearing
    * snapshot that reported "unknown" would never broadcast again. */
  override def estimateStatistics(): Statistics = {
    val cleanBytes = cleanScan match {
      case s: SupportsReportStatistics =>
        val e = s.estimateStatistics().sizeInBytes()
        if (e.isPresent) e.getAsLong else 0L
      case _ => 0L
    }
    val total = cleanBytes + dvFiles.map(_._2).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(total)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = new Batch {
    private val cleanBatch = cleanScan.toBatch
    private val dvBatch = dvScan.toBatch

    override def planInputPartitions(): Array[InputPartition] = {
      val hc = spark.sparkContext.hadoopConfiguration
      val clean = cleanBatch.planInputPartitions()
        .map(p => GraftDvCleanPartition(p): InputPartition)
      val dvd = dvFiles.zipWithIndex.map { case ((p, size, dv), i) =>
        val raw = new Path(p)
        val qualified = raw.getFileSystem(hc).makeQualified(raw)
        val pf = PartitionedFile(InternalRow.empty,
          org.apache.spark.paths.SparkPath.fromPath(qualified),
          0L, size, Array.empty[String], commitTsMs, size)
        GraftDvFilePartition(FilePartition(i, Array(pf)), dv): InputPartition
      }
      clean ++ dvd
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftDvReaderFactory(cleanBatch.createReaderFactory(),
        dvBatch.createReaderFactory(),
        new graft.util.SerConf(spark.sparkContext.hadoopConfiguration))
  }
}

/** A delegated clean-branch leaf (row-based — the scan answers one
  * columnar-support question for all partitions). */
final case class GraftDvCleanPartition(inner: InputPartition)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** One whole DV-bearing file plus its sidecar path. */
final case class GraftDvFilePartition(inner: FilePartition, dvPath: String)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

final class GraftDvReaderFactory(cleanFactory: PartitionReaderFactory,
                                 dvFactory: PartitionReaderFactory,
                                 conf: graft.util.SerConf)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftDvCleanPartition(inner) => cleanFactory.createReader(inner)
      case GraftDvFilePartition(inner, dvPath) =>
        // the sidecar loads once per task, where it is consumed
        val bits = graft.sinks.ManifestTable.readDvBits(conf.value, dvPath)
        val r = dvFactory.createReader(inner)
        new PartitionReader[InternalRow] {
          // file position counter — sound because the partition is the
          // WHOLE file and the delegated read has no pushed filters
          private var pos = -1L
          override def next(): Boolean = {
            while (r.next()) {
              pos += 1
              if (pos > Int.MaxValue.toLong || !bits.get(pos.toInt))
                return true
            }
            false
          }
          override def get(): InternalRow = r.get()
          override def close(): Unit = r.close()
        }
      case other => throw new IllegalStateException(s"unexpected $other")
    }

  override def supportColumnarReads(p: InputPartition): Boolean = false
}
