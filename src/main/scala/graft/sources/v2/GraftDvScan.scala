package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}

/** The DELETION-VECTOR-aware scan of a manifest-table snapshot —
  * correctness lives INSIDE the data source (any session, SQL or API,
  * reads right; no session extension involved):
  *
  *   - CLEAN files (no vector — the overwhelming majority) plan
  *     through the ordinary delegated parquet batch: manifest-listed
  *     index, envelope/bloom pruning on pushed filters, splits,
  *     vectorized reading — byte-for-byte today's path.
  *   - DV-BEARING files read through the SAME delegated vectorized
  *     parquet batch, with the reader-generated ROW-INDEX column
  *     (`_tmp_metadata_row_index` — the mechanism behind
  *     `_metadata.row_index`, filled correctly by both the vectorized
  *     and row-based parquet readers even under predicate pushdown
  *     and row-group/page skipping) appended to the read schema. The
  *     wrapping reader drops the positions the file's sidecar bitset
  *     marks deleted and projects the index column away. Because the
  *     row index comes from the READER (not a position counter), DV
  *     files keep pushed filters, splits, envelope/bloom listing
  *     pruning, and columnar batches — Delta's DV read is this shape.
  *
  * Both branches answer ONE columnar-support question (Spark requires
  * uniform partitions): columnar whenever both delegates are, with
  * DV batches filtered through a zero-copy row-index remapping vector
  * ([[GraftRowMappedVector]]) — a batch with no deleted rows passes
  * through untouched. Column pruning applies to both branches.
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

  // filters push into BOTH branches (listing prune + parquet
  // pushdown): the reader-generated row index stays correct under
  // row-group/page skipping, so the DV branch no longer needs a
  // sequential read. Everything returns as post-scan filters, so
  // Spark keeps the Filter above both branches.
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    dvBuilder.pushFilters(filters): Unit
    cleanBuilder.pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] = cleanBuilder.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    cleanBuilder.pruneColumns(requiredSchema)
    // the DV branch additionally reads the row-index column the
    // parquet readers generate on demand; [[GraftDvReaderFactory]]
    // projects it away after consulting the sidecar bitset
    dvBuilder.pruneColumns(StructType(
      requiredSchema.fields.filterNot(
        _.name == ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME) :+
        GraftDvScanBuilder.RowIndexField))
  }

  override def build(): Scan =
    new GraftDvScan(spark, cleanBuilder.build(), dvBuilder.build(),
      dvFiles, commitTsMs)
}

object GraftDvScanBuilder {
  /** The parquet readers' GENERATED row-index column: requesting a
    * LongType field with this exact name makes both the vectorized
    * reader (ParquetColumnVector's isRowIndexColumn branch) and the
    * row-based reader (addRowIndexToRecordReaderIfNeeded) fill it
    * with the row's index WITHIN ITS FILE, correct under splits,
    * pushed filters, and row-group/page skipping — the mechanism
    * behind `_metadata.row_index`. NOTE: ParquetFileFormat
    * .ROW_INDEX_FIELD is the `_metadata` struct's field (named
    * `row_index`) — the flat temp column must use
    * ROW_INDEX_TEMPORARY_COLUMN_NAME, and must be NULLABLE: the
    * vectorized reader's missing-column check runs before its
    * row-index special case and refuses a required column absent
    * from the file (the generated values themselves are never
    * null). */
  private[v2] val RowIndexField: org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.types.StructField(
      ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
      org.apache.spark.sql.types.LongType, nullable = true)
}

final class GraftDvScan(
    spark: SparkSession, cleanScan: Scan, dvScan: Scan,
    dvFiles: Seq[(String, Long, String)], commitTsMs: Long)
  extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = cleanScan.readSchema()

  override def description(): String =
    s"GraftDvScan(dvFiles=${dvFiles.size}, clean=${cleanScan.description()})"

  /** Test hook: the DV branch's pushed source filters — the proof
    * that vectored files no longer read with pushdown disabled. */
  private[graft] def dvPushedFilters: Array[org.apache.spark.sql.sources.Filter] =
    dvScan match {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.pushedFilters
      case _ => Array.empty
    }

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
    private lazy val cleanFactory = cleanBatch.createReaderFactory()
    private lazy val dvFactory = dvBatch.createReaderFactory()

    // sidecar by scheme-less file path (manifest rows are unqualified,
    // the delegated planner's PartitionedFiles are fs-qualified)
    private val dvByPath: Map[String, String] =
      dvFiles.map { case (p, _, dv) => new Path(p).toUri.getPath -> dv }.toMap

    /** One planning pass, cached — planInputPartitions can be called
      * more than once per batch. The DV branch delegates to its
      * ParquetScan for listing-level pruning, SPLITS, and packing,
      * then re-groups so every emitted partition maps to exactly ONE
      * file's sidecar (row indexes are per-file; a multi-file
      * partition could not attribute them). Also decides the uniform
      * columnar answer: columnar iff both delegates are for every
      * partition. */
    private lazy val planned: (Array[InputPartition], Boolean) = {
      val clean = cleanBatch.planInputPartitions()
      val dvd: Array[InputPartition] = dvBatch.planInputPartitions()
        .iterator.flatMap {
          case fp: FilePartition => fp.files
          case other => throw new IllegalStateException(
            s"unexpected DV-branch partition $other")
        }.zipWithIndex.map { case (pf, i) =>
          val key = pf.toPath.toUri.getPath
          val dv = dvByPath.getOrElse(key, throw new IllegalStateException(
            s"DV-branch planned file $key has no sidecar mapping"))
          GraftDvFilePartition(FilePartition(i, Array(pf)), dv): InputPartition
        }.toArray
      val columnar = clean.forall(cleanFactory.supportColumnarReads) &&
        dvd.forall { case GraftDvFilePartition(inner, _) =>
          dvFactory.supportColumnarReads(inner)
        }
      (clean.map(p => GraftDvCleanPartition(p): InputPartition) ++ dvd,
        columnar)
    }

    override def planInputPartitions(): Array[InputPartition] = planned._1

    override def createReaderFactory(): PartitionReaderFactory = {
      val dvSchema = dvScan.readSchema()
      val rowIdxOrd = dvSchema.fieldIndex(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)
      new GraftDvReaderFactory(cleanFactory, dvFactory,
        new graft.util.SerConf(spark.sparkContext.hadoopConfiguration),
        dvSchema, rowIdxOrd, planned._2)
    }
  }
}

/** A delegated clean-branch leaf. */
final case class GraftDvCleanPartition(inner: InputPartition)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** One SPLIT of one DV-bearing file plus its sidecar path. */
final case class GraftDvFilePartition(inner: FilePartition, dvPath: String)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

final class GraftDvReaderFactory(cleanFactory: PartitionReaderFactory,
                                 dvFactory: PartitionReaderFactory,
                                 conf: graft.util.SerConf,
                                 dvSchema: StructType,
                                 rowIdxOrd: Int,
                                 columnar: Boolean)
  extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftDvCleanPartition(inner) => cleanFactory.createReader(inner)
      case GraftDvFilePartition(inner, dvPath) =>
        // the sidecar loads once per task, where it is consumed
        val bits = graft.sinks.ManifestTable.readDvBits(conf.value, dvPath)
        val r = dvFactory.createReader(inner)
        // survivors project the row-index column away
        val project = UnsafeProjection.create(
          dvSchema.fields.zipWithIndex.collect {
            case (f, i) if i != rowIdxOrd =>
              BoundReference(i, f.dataType, f.nullable): Expression
          }.toIndexedSeq)
        new PartitionReader[InternalRow] {
          override def next(): Boolean = {
            while (r.next()) {
              val ri = r.get().getLong(rowIdxOrd)
              // positions past Int.MaxValue cannot be in a bitset
              // sidecar — always live
              if (ri > Int.MaxValue.toLong || !bits.get(ri.toInt))
                return true
            }
            false
          }
          override def get(): InternalRow = project(r.get())
          override def close(): Unit = r.close()
        }
      case other => throw new IllegalStateException(s"unexpected $other")
    }

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] = p match {
    case GraftDvCleanPartition(inner) => cleanFactory.createColumnarReader(inner)
    case GraftDvFilePartition(inner, dvPath) =>
      val bits = graft.sinks.ManifestTable.readDvBits(conf.value, dvPath)
      val r = dvFactory.createColumnarReader(inner)
      new PartitionReader[ColumnarBatch] {
        private var current: ColumnarBatch = _
        override def next(): Boolean = {
          while (r.next()) {
            val b = r.get()
            val n = b.numRows()
            val idxVec = b.column(rowIdxOrd)
            // one pass over the reader-generated row indexes: build
            // the survivor map (original batch ordinals, in order)
            var i = 0
            var kept = 0
            val map = new Array[Int](n)
            while (i < n) {
              val ri = idxVec.getLong(i)
              if (ri > Int.MaxValue.toLong || !bits.get(ri.toInt)) {
                map(kept) = i; kept += 1
              }
              i += 1
            }
            if (kept > 0) {
              // drop the row-index column; remap only when some row
              // of THIS batch is deleted — untouched batches pass
              // through zero-copy
              val dataCols = Array.tabulate[ColumnVector](b.numCols() - 1) {
                j =>
                  val c = b.column(if (j < rowIdxOrd) j else j + 1)
                  if (kept == n) c else new GraftRowMappedVector(c, map)
              }
              current = new ColumnarBatch(dataCols, kept)
              return true
            }
          }
          false
        }
        override def get(): ColumnarBatch = current
        override def close(): Unit = r.close()
      }
    case other => throw new IllegalStateException(s"unexpected $other")
  }

  /** Uniform answer, decided at planning time: Spark refuses mixed
    * row/columnar partitions within one scan. */
  override def supportColumnarReads(p: InputPartition): Boolean = columnar
}

/** Zero-copy survivor view of a column vector: accessor `rowId` maps
  * through the survivor array to the underlying batch ordinal (the
  * Iceberg `ColumnVectorWithFilter` shape). Struct/interval/variant
  * children share the parent's row ids, so [[getChild]] wraps them
  * with the SAME map; array/map/string/binary accessors delegate
  * directly — their returned views reference the delegate's child
  * vectors with correct offsets. */
final class GraftRowMappedVector(under: ColumnVector, map: Array[Int])
  extends ColumnVector(under.dataType()) {

  override def close(): Unit = under.close()
  // consumers (ColumnarToRowExec) call closeIfFreeable() after EVERY
  // batch; the default implementation closes — which would free the
  // delegated reader's REUSED writable vectors and NPE its next
  // batch. Delegate the question: a writable vector answers "not
  // freeable" (reader-owned), anything else keeps its own semantics.
  override def closeIfFreeable(): Unit = under.closeIfFreeable()
  // may over-report after filtering — consumers use these only to
  // skip null checks, so over-reporting is safe, under-reporting not
  override def hasNull: Boolean = under.hasNull
  override def numNulls(): Int = under.numNulls()

  override def isNullAt(rowId: Int): Boolean = under.isNullAt(map(rowId))
  override def getBoolean(rowId: Int): Boolean = under.getBoolean(map(rowId))
  override def getByte(rowId: Int): Byte = under.getByte(map(rowId))
  override def getShort(rowId: Int): Short = under.getShort(map(rowId))
  override def getInt(rowId: Int): Int = under.getInt(map(rowId))
  override def getLong(rowId: Int): Long = under.getLong(map(rowId))
  override def getFloat(rowId: Int): Float = under.getFloat(map(rowId))
  override def getDouble(rowId: Int): Double = under.getDouble(map(rowId))
  override def getArray(rowId: Int): ColumnarArray = under.getArray(map(rowId))
  override def getMap(rowId: Int): ColumnarMap = under.getMap(map(rowId))
  override def getDecimal(rowId: Int, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    under.getDecimal(map(rowId), precision, scale)
  override def getUTF8String(rowId: Int)
      : org.apache.spark.unsafe.types.UTF8String =
    under.getUTF8String(map(rowId))
  override def getBinary(rowId: Int): Array[Byte] = under.getBinary(map(rowId))
  override def getChild(ordinal: Int): ColumnVector =
    new GraftRowMappedVector(under.getChild(ordinal), map)
}
