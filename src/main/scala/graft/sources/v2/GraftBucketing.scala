package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** STORAGE-PARTITIONED JOINS for bucketed manifest tables — the
  * Iceberg bucket-SPJ shape on the graft format.
  *
  * A table created with `bucketBy = (key, n)` lands every file inside
  * one hash bucket (`pmod(hash(key), n)`, Spark's Murmur3 seed 42 —
  * [[graft.sinks.ManifestTable.bucketSpec]]); the manifest records
  * each file's bucket. This scan wrapper regroups the delegated
  * parquet scan's planned files into ONE input partition PER BUCKET
  * (each carrying its bucket id as the partition key) and reports
  * `KeyGroupedPartitioning(bucket(n, key), n)` — so an equi-join of
  * two tables bucketed the same way runs with NO shuffle on either
  * side (`spark.sql.sources.v2.bucketing.enabled=true`). All n
  * buckets are always emitted — empty ones as empty partitions — so
  * the two sides' partition VALUES align by construction.
  *
  * Everything else delegates: readers (row and columnar), pushdown,
  * pruning, statistics. If column pruning drops the key, Spark simply
  * fails to resolve the reported transform and falls back to ordinary
  * planning — the wrapper can never make a plan worse.
  */
final class GraftBucketedScanBuilder(
    inner: ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters,
    logicalKey: String, numBuckets: Int,
    bucketOfFile: Map[String, Long])
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters {

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    inner.pushFilters(filters)

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def build(): Scan =
    new GraftBucketedScan(inner.build(), logicalKey, numBuckets,
      bucketOfFile)
}

final class GraftBucketedScan(inner: Scan, logicalKey: String,
                              numBuckets: Int,
                              bucketOfFile: Map[String, Long])
  extends Scan with SupportsReportPartitioning with SupportsReportStatistics {

  override def readSchema(): StructType = inner.readSchema()

  override def description(): String =
    s"GraftBucketed(bucket($numBuckets, $logicalKey), ${inner.description()})"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(numBuckets, logicalKey)), numBuckets)

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = new Batch {
    private val ib = inner.toBatch

    /** The delegated scan plans (pruned, filtered, split) file
      * partitions; regroup their files by the manifest's bucket —
      * splits of one file share its bucket, so regrouping loses
      * nothing the delegated plan knew. Every bucket emits (empty
      * ones included) in bucket order. */
    override def planInputPartitions(): Array[InputPartition] = {
      val files = ib.planInputPartitions().flatMap {
        case fp: FilePartition => fp.files
        case other => sys.error(
          s"bucketed scan expected file partitions, got $other")
      }
      val byBucket = files.groupBy { pf =>
        val p = new org.apache.hadoop.fs.Path(pf.filePath.toString)
          .toUri.getPath
        bucketOfFile.getOrElse(p, sys.error(
          s"file $p of a bucketed table carries no bucket — " +
            "the manifest and the layout desynchronized"))
      }
      (0 until numBuckets).map(b =>
        GraftBucketPartition(b,
          FilePartition(b, byBucket.getOrElse(b.toLong,
            Array.empty[org.apache.spark.sql.execution.datasources
              .PartitionedFile])))
          : InputPartition).toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftBucketReaderFactory(ib.createReaderFactory())
  }
}

/** One bucket's files, keyed by the bucket id — what
  * `KeyGroupedPartitioning` groups on. */
final case class GraftBucketPartition(bucket: Int, part: FilePartition)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
  override def preferredLocations(): Array[String] =
    part.preferredLocations()
}

final class GraftBucketReaderFactory(inner: PartitionReaderFactory)
  extends PartitionReaderFactory {
  private def un(p: InputPartition): InputPartition =
    p.asInstanceOf[GraftBucketPartition].part
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = inner.createReader(un(p))
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(un(p))
  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(un(p))
}

/** The `bucket(numBuckets, key)` function the catalog serves
  * ([[GraftCatalog.loadFunction]]). Storage-partitioned-join
  * compatibility compares the two sides' bound functions by
  * CANONICAL NAME; evaluation (runtime filtering, partially
  * clustered distributions) must match the WRITE side's bucket
  * assignment exactly — `pmod(hash(key), n)` with Spark's Murmur3
  * seed 42, per key type. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) — graft hash-bucket id (Murmur3 seed 42)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
    inputType.fields(1).dataType match {
      case LongType    => new GraftBucketBound(LongType)
      case IntegerType => new GraftBucketBound(IntegerType)
      case StringType  => new GraftBucketBound(StringType)
      case other => throw new UnsupportedOperationException(
        s"graft bucket supports long/int/string keys, got $other")
    }
  }
}

final class GraftBucketBound(keyType: DataType) extends ScalarFunction[Int] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${keyType.sql})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Int = {
    val n = input.getInt(0)
    // exactly catalyst's hash(col) per type (Murmur3Hash, seed 42) —
    // the write side's pmod(hash(key), n) and this must never diverge
    val h = keyType match {
      case LongType    => Murmur3_x86_32.hashLong(input.getLong(1), 42)
      case IntegerType => Murmur3_x86_32.hashInt(input.getInt(1), 42)
      case StringType =>
        val s = input.getUTF8String(1)
        Murmur3_x86_32.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, 42)
      case other => sys.error(s"unreachable key type $other")
    }
    ((h % n) + n) % n
  }
}
