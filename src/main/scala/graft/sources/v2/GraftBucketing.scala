package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{ByteType, DataType, DateType, DecimalType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}

/** STORAGE-PARTITIONED JOINS for bucketed manifest tables — the
  * Iceberg bucket-SPJ shape on the graft format.
  *
  * A table created with `bucketBy = (keys, n)` lands every file inside
  * one hash-bucket GRID CELL: each key column hashes INDEPENDENTLY
  * (`pmod(hash(ki), n)`, Spark's Murmur3 seed 42), and the cell is the
  * tuple `(b1, …, bk)` — recorded in the manifest as the composite id
  * `b1·n^(k−1) + … + bk` ([[graft.sinks.ManifestTable.bucketSpec]]).
  * Per-column buckets are NOT a choice: Spark's
  * `KeyGroupedShuffleSpec` requires every partition transform to
  * reference exactly one column (`keyPositions` asserts a single
  * leaf), so a tuple-hashed single transform could never join
  * shuffle-free — multiple single-column transforms with a
  * tuple-valued partition key are the one shape the planner
  * understands (exactly how Iceberg lays out multi-dimensional
  * partitioning).
  *
  * This scan wrapper tags the delegated parquet scan's planned splits
  * with their cell as the partition KEY (one input partition per
  * delegated split, plus an empty partition for every cell the plan
  * didn't touch, so both sides of a join always carry identical
  * partition values) and reports `KeyGroupedPartitioning([bucket(n,
  * k1), …, bucket(n, kk)])`. Spark's OWN key-grouped machinery does
  * the rest: with `spark.sql.sources.v2.bucketing.enabled=true` it
  * groups same-key splits into one task (an equi-join of two
  * co-bucketed tables runs with NO shuffle on either side), and with
  * `spark.sql.sources.v2.bucketing.partiallyClusteredDistribution
  * .enabled=true` it keeps the splits of SKEWED buckets apart and
  * replicates the smaller side's groups over them instead — per-split
  * emission is exactly what lets a hot bucket stay parallel. (r11
  * pre-grouped the splits itself, which pinned every bucket to one
  * task and made partially-clustered a no-op.)
  *
  * Everything else delegates: readers (row and columnar), pushdown,
  * pruning, statistics. If column pruning drops the key, Spark simply
  * fails to resolve the reported transform and falls back to ordinary
  * planning — the wrapper can never make a plan worse.
  */
final class GraftBucketedScanBuilder(
    inner: ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters,
    logicalKeys: Seq[String], numBuckets: Int,
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
    new GraftBucketedScan(inner.build(), logicalKeys, numBuckets,
      bucketOfFile)
}

final class GraftBucketedScan(inner: Scan, logicalKeys: Seq[String],
                              numBuckets: Int,
                              bucketOfFile: Map[String, Long])
  extends Scan with SupportsReportPartitioning with SupportsReportStatistics {

  override def readSchema(): StructType = inner.readSchema()

  /** The full grid: n cells per key column. */
  private val numCells: Int =
    math.pow(numBuckets.toDouble, logicalKeys.length.toDouble).toInt

  override def description(): String =
    s"GraftBucketed(${logicalKeys.map(k => s"bucket($numBuckets, $k)")
      .mkString(", ")}, ${inner.description()})"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      logicalKeys.map(k =>
        Expressions.bucket(numBuckets, k)
          : org.apache.spark.sql.connector.expressions.Expression).toArray,
      numCells)

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
      * tag each with the manifest's bucket — splits of one file share
      * its bucket, so tagging loses nothing the delegated plan knew.
      * Handles BOTH delegated shapes: plain parquet `FilePartition`s
      * (a vector-free snapshot) and the DV scan's clean/vectored
      * wrappers — so a table with deletion vectors keeps its
      * storage-partitioned joins between maintenance ticks. Splits
      * stay SEPARATE partitions (Spark groups them; partially-
      * clustered distribution needs them apart); every bucket the
      * plan didn't touch emits one EMPTY partition, so the two join
      * sides' partition values align by construction even without
      * push-down partition values. One planning pass, cached
      * (planInputPartitions can be called more than once per batch);
      * the uniform columnar answer computes here — an EMPTY bucket
      * must answer like its siblings, or the scan would mix row and
      * columnar partitions. */
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
      // the composite id decomposes into the per-key cell tuple —
      // the partition VALUE Spark groups and aligns on
      def cells(composite: Long): Array[Int] = {
        val out = new Array[Int](logicalKeys.length)
        var rest = composite
        var i = logicalKeys.length - 1
        while (i >= 0) {
          out(i) = (rest % numBuckets).toInt; rest /= numBuckets; i -= 1
        }
        out
      }
      val present = sub.map(_._1).toSet
      val parts =
        sub.map { case (b, p) =>
          GraftBucketPartition(cells(b), Array(p)): InputPartition } ++
        (0 until numCells).filterNot(c => present.contains(c.toLong))
          .map(c => GraftBucketPartition(cells(c.toLong), Array.empty)
            : InputPartition)
      (parts, factory, columnar)
    }

    override def planInputPartitions(): Array[InputPartition] = planned._1

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftBucketReaderFactory(planned._2, planned._3)
  }
}

/** One delegated split (or an empty placeholder), keyed by its grid
  * cell — the per-key bucket tuple `KeyGroupedPartitioning` groups
  * on. Spark's key-grouped scan exec concatenates same-key partitions
  * into one task when fully clustered, and spreads them when
  * partially clustered; the reader only ever opens this partition's
  * own delegates. */
final case class GraftBucketPartition(cell: Array[Int],
                                      parts: Array[InputPartition])
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(cell.map(b => b: Any).toArray[Any])
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
  * ([[GraftCatalog.loadFunction]]) — always SINGLE-column (a
  * multi-column layout reports one transform per key column).
  * Storage-partitioned-join compatibility compares the two sides'
  * bound functions by CANONICAL NAME; evaluation (runtime filtering,
  * partially clustered distributions) must match the WRITE side's
  * bucket assignment exactly — so the bound function evaluates
  * catalyst's OWN `Murmur3Hash` (seed 42) over the key field, the
  * very expression the landing's `pmod(hash(key), n)` routing
  * compiles. One interpreted eval per call; every hashable key type
  * (integral, string, date, timestamp, decimal) rides for free and
  * can never diverge from the writer. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, col) — graft hash-bucket id (Murmur3 seed 42)"

  /** Key types a bucket layout accepts — kept to types whose catalyst
    * hash is a stable function of the VALUE (no float signed-zero /
    * NaN ambiguity, no nested collation surprises). The write side
    * ([[graft.sinks.ManifestTable]]) enforces the same set. */
  def supportedKeyType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType |
         DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, col), got ${inputType.simpleString}")
    val keyType = inputType.fields(1).dataType
    require(supportedKeyType(keyType),
      s"graft bucket does not support $keyType keys")
    new GraftBucketBound(keyType)
  }
}

final class GraftBucketBound(keyType: DataType)
  extends ScalarFunction[Int] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${keyType.sql})"
  override def isResultNullable: Boolean = false
  // catalyst's hash(key) verbatim — interpreted eval over the input
  // row's key field (field 0 is the bucket count), so the write
  // side's pmod(hash(key), n) and this can never diverge
  private val hasher =
    Murmur3Hash(Seq(BoundReference(1, keyType, nullable = true)), 42)
  override def produceResult(input: InternalRow): Int = {
    val n = input.getInt(0)
    val h = hasher.eval(input).asInstanceOf[Int]
    ((h % n) + n) % n
  }
}
