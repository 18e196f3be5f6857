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

    private def bucketOf(
        pf: org.apache.spark.sql.execution.datasources.PartitionedFile)
        : Long = {
      val p = new org.apache.hadoop.fs.Path(pf.filePath.toString)
        .toUri.getPath
      bucketOfFile.getOrElse(p, sys.error(
        s"file $p of a bucketed table carries no bucket — " +
          "the manifest and the layout desynchronized"))
    }

    /** The delegated scan plans (pruned, filtered, split) partitions;
      * regroup them by the manifest's bucket — splits of one file
      * share its bucket, so regrouping loses nothing the delegated
      * plan knew. Handles BOTH delegated shapes: plain parquet
      * `FilePartition`s (a vector-free snapshot) and the DV scan's
      * clean/vectored wrappers — so a table with deletion vectors
      * keeps its storage-partitioned joins between maintenance ticks.
      * Every bucket emits (empty ones included) in bucket order. One
      * planning pass, cached (planInputPartitions can be called more
      * than once per batch); the uniform columnar answer computes
      * here — an EMPTY bucket must answer like its siblings, or the
      * scan would mix row and columnar partitions. */
    private lazy val planned
        : (Array[InputPartition], PartitionReaderFactory, Boolean) = {
      // built ONCE and reused at read time — a second delegated
      // factory would re-broadcast the Hadoop conf per query
      val factory = ib.createReaderFactory()
      val sub: Array[(Long, InputPartition)] =
        ib.planInputPartitions().flatMap {
          case fp: FilePartition =>
            fp.files.groupBy(bucketOf).map { case (b, fs) =>
              b -> (FilePartition(b.toInt, fs): InputPartition) }
          case GraftDvCleanPartition(fp: FilePartition) =>
            fp.files.groupBy(bucketOf).map { case (b, fs) =>
              b -> (GraftDvCleanPartition(FilePartition(b.toInt, fs))
                : InputPartition) }
          case dv @ GraftDvFilePartition(fp, _, _) =>
            // the DV scan emits SINGLE-file partitions today; assert
            // it, so a future multi-file packing fails loudly at
            // planning instead of riding every file to head's bucket
            val b = bucketOf(fp.files.head)
            require(fp.files.forall(f => bucketOf(f) == b),
              "DV partition spans buckets — regrouping assumes " +
                "single-file DV partitions")
            Seq(b -> (dv: InputPartition))
          case other => sys.error(
            s"bucketed scan cannot regroup partition $other")
        }
      val columnar = sub.forall(s => factory.supportColumnarReads(s._2))
      val byBucket = sub.groupBy(_._1)
      ((0 until numBuckets).map(b =>
        GraftBucketPartition(b,
          byBucket.getOrElse(b.toLong, Array.empty).map(_._2))
          : InputPartition).toArray, factory, columnar)
    }

    override def planInputPartitions(): Array[InputPartition] = planned._1

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftBucketReaderFactory(planned._2, planned._3)
  }
}

/** One bucket's delegated sub-partitions, keyed by the bucket id —
  * what `KeyGroupedPartitioning` groups on. The reader concatenates
  * the sub-partitions' delegated readers. */
final case class GraftBucketPartition(bucket: Int,
                                      parts: Array[InputPartition])
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
  override def preferredLocations(): Array[String] =
    parts.flatMap(_.preferredLocations()).distinct
}

final class GraftBucketReaderFactory(inner: PartitionReaderFactory,
                                     columnar: Boolean)
  extends PartitionReaderFactory {

  /** Lazily opened concatenation of the sub-partitions' readers —
    * one open delegate at a time. */
  private final class Concat[T](parts: Array[InputPartition],
                                open: InputPartition => PartitionReader[T])
    extends PartitionReader[T] {
    private var i = 0
    private var cur: PartitionReader[T] = _
    override def next(): Boolean = {
      while (true) {
        if (cur == null) {
          if (i >= parts.length) return false
          cur = open(parts(i)); i += 1
        }
        if (cur.next()) return true
        cur.close(); cur = null
      }
      false // unreachable
    }
    override def get(): T = cur.get()
    override def close(): Unit = if (cur != null) cur.close()
  }

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] =
    new Concat(p.asInstanceOf[GraftBucketPartition].parts,
      inner.createReader)
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new Concat(p.asInstanceOf[GraftBucketPartition].parts,
      inner.createColumnarReader)
  /** Uniform answer decided at planning time — empty buckets must
    * agree with their siblings. */
  override def supportColumnarReads(p: InputPartition): Boolean = columnar
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
