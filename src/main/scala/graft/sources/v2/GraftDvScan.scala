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
import org.apache.spark.sql.types.{BinaryType, BooleanType, ByteType, DataType, DateType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, StructField, StructType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarBatch, ColumnarMap, ColumnVector}

/** One file of the FILTERED branch of the composite scan: its
  * deletion-vector sidecar (if any), the indexes of the pending
  * equality-delete probe groups that apply to it (delete seq > file
  * seq, file inside the delete's envelope/bloom-touched set), and its
  * manifest row counts for honest statistics. */
final case class GraftFiltFile(path: String, size: Long,
                               dv: Option[String], probes: Array[Int],
                               rows: Long, dvRows: Long)

/** One pending equality delete, compiled for PER-TASK application:
  * the delete's key columns as PHYSICAL-name fields (the filt
  * branch's read schema speaks physical) and its key tuples,
  * normalized by [[GraftEqProbe.normalize]]. Key sets are one
  * micro-batch's distinct keys — small by construction; the planner
  * falls back to scratch materialization past a size guard
  * ([[graft.sinks.ManifestTable.eqProbes]]). */
final case class GraftEqProbeGroup(keyFields: Seq[StructField],
                                   keys: Set[Seq[Any]])

/** Shared normalization between the driver (building a probe group's
  * key set from the committed delete file) and the executors (probing
  * scanned rows against it) — the two sides MUST agree bit-for-bit or
  * deletes silently stop matching. */
object GraftEqProbe {

  /** Key types the in-memory probe handles; anything else falls back
    * to the scratch-materialization read path. */
  def supported(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
        BooleanType | FloatType | DoubleType | DateType |
        TimestampType | TimestampNTZType | BinaryType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Catalyst value → a serializable key component whose JVM equality
    * matches SQL equality: UTF8String→String, -0.0→0.0 (SQL: equal;
    * boxed: not), byte[]→content-equal wrapper (arrays compare by
    * reference), Decimal→canonical BigDecimal. Boxed Double/Float
    * already give NaN==NaN, matching Spark SQL's NaN semantics. */
  def normalize(v: Any): Any = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case d: Double => if (d == 0.0d) 0.0d else d
    case f: Float  => if (f == 0.0f) 0.0f else f
    case b: Array[Byte] =>
      scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    case d: org.apache.spark.sql.types.Decimal =>
      d.toJavaBigDecimal.stripTrailingZeros
    case x => x
  }

  /** The row's key tuple under `binds` ((ordinal, type) per key
    * column), normalized — or null when any component is NULL (SQL
    * equality: a NULL key matches nothing). */
  def keyOf(binds: Array[(Int, DataType)], row: InternalRow): Seq[Any] = {
    val arr = new Array[Any](binds.length)
    var i = 0
    while (i < binds.length) {
      val (o, dt) = binds(i)
      if (row.isNullAt(o)) return null
      arr(i) = normalize(row.get(o, dt))
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
  }
}

/** The row-filtering composite scan of a manifest-table snapshot —
  * deletion vectors AND pending equality deletes applied per task,
  * with correctness INSIDE the data source (any session, SQL or API,
  * reads right; no session extension involved):
  *
  *   - CLEAN files (no vector, no applicable pending delete — the
  *     overwhelming majority) plan through the ordinary delegated
  *     parquet batch: manifest-listed index, envelope/bloom pruning
  *     on pushed filters, splits, vectorized reading — byte-for-byte
  *     the vector-free path.
  *   - FILTERED files read through the SAME delegated vectorized
  *     parquet batch, with the reader-generated ROW-INDEX column
  *     (`_tmp_metadata_row_index` — correct under predicate pushdown
  *     and row-group/page skipping) and any missing equality-delete
  *     KEY columns appended to the read schema. The wrapping reader
  *     drops positions the file's sidecar bitset marks deleted and
  *     rows whose key tuple sits in an applicable pending delete's
  *     broadcast key set (the Iceberg v2 reader shape — a pure
  *     SELECT on an eq-pending table WRITES NOTHING; scratch
  *     materialization is the compaction path only), then projects
  *     the extra columns away.
  *
  * Both branches answer ONE columnar-support question (Spark requires
  * uniform partitions): columnar whenever both delegates are, with
  * filtered batches served through a zero-copy row-index remapping
  * vector ([[GraftRowMappedVector]]) — a batch with no dropped rows
  * passes through untouched. Column pruning applies to both branches.
  */
final class GraftDvScanBuilder(
    spark: SparkSession,
    cleanBuilder: ParquetScanBuilder,
    filtBuilder: ParquetScanBuilder,
    filtFiles: Seq[GraftFiltFile],
    probes: Seq[GraftEqProbeGroup],
    cleanRows: Option[Long],
    commitTsMs: Long)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters {

  // filters push into BOTH branches (listing prune + parquet
  // pushdown): the reader-generated row index stays correct under
  // row-group/page skipping, and the key probe is value-based, so
  // the filtered branch no longer needs a sequential read. Everything
  // returns as post-scan filters, so Spark keeps the Filter above
  // both branches. Pruning a filtered file by envelope/bloom is sound
  // — stats are a superset of its live rows, and an excluded file
  // contributes no survivors.
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    filtBuilder.pushFilters(filters): Unit
    cleanBuilder.pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] = cleanBuilder.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    cleanBuilder.pruneColumns(requiredSchema)
    // the filtered branch additionally reads the row-index column the
    // parquet readers generate on demand, plus any equality-delete
    // key column the projection dropped (the probe needs the VALUES);
    // [[GraftDvReaderFactory]] projects the extras away after
    // consulting the bitset/key sets
    val base = requiredSchema.fields.filterNot(
      _.name == ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)
    val have = base.map(_.name).toSet
    val keyExtras = probes.flatMap(_.keyFields)
      .filterNot(f => have.contains(f.name))
      .distinctBy(_.name)
    filtBuilder.pruneColumns(StructType(
      base ++ keyExtras :+ GraftDvScanBuilder.RowIndexField))
  }

  override def build(): Scan =
    new GraftDvScan(spark, cleanBuilder.build(), filtBuilder.build(),
      filtFiles, probes, cleanRows, commitTsMs)
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
  private[v2] val RowIndexField: StructField =
    StructField(
      ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
      LongType, nullable = true)
}

final class GraftDvScan(
    spark: SparkSession, cleanScan: Scan, filtScan: Scan,
    filtFiles: Seq[GraftFiltFile], probes: Seq[GraftEqProbeGroup],
    cleanRows: Option[Long], commitTsMs: Long)
  extends Scan with SupportsReportStatistics {

  override def readSchema(): StructType = cleanScan.readSchema()

  override def description(): String =
    s"GraftDvScan(filtFiles=${filtFiles.size}, eqProbes=${probes.size}, " +
      s"clean=${cleanScan.description()})"

  /** Test hook: the filtered branch's pushed source filters — the
    * proof that vectored files no longer read with pushdown
    * disabled. */
  private[graft] def dvPushedFilters: Array[org.apache.spark.sql.sources.Filter] =
    filtScan match {
      case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
        p.pushedFilters
      case _ => Array.empty
    }

  private def cleanPushedEmpty: Boolean = cleanScan match {
    case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
      p.pushedFilters.isEmpty
    case _ => false
  }

  /** Join planning must see honest numbers — a DV-bearing snapshot
    * that reported full file bytes for 90%-deleted files would never
    * broadcast again. Bytes scale by each filtered file's LIVE
    * fraction ((rows − dv_rows) / rows); row count is exact from the
    * manifest (modulo pending equality deletes, which only
    * over-report — the conservative direction) and reported only
    * when no filter was pushed (a pushed filter makes any manifest
    * count a guess). */
  override def estimateStatistics(): Statistics = {
    val cleanBytes = cleanScan match {
      case s: SupportsReportStatistics =>
        val e = s.estimateStatistics().sizeInBytes()
        if (e.isPresent) e.getAsLong else 0L
      case _ => 0L
    }
    val filtBytes = filtFiles.map { f =>
      if (f.rows <= 0L) f.size
      else (f.size * ((f.rows - f.dvRows).toDouble / f.rows)).toLong
    }.sum
    val liveRows = cleanRows.getOrElse(0L) +
      filtFiles.map(f => f.rows - f.dvRows).sum
    // exact only when the manifest counts were threaded through (the
    // pure-read planner) AND no filter was pushed (a pushed filter
    // makes any manifest count a guess)
    val rowsKnown = cleanRows.isDefined &&
      filtFiles.forall(_.rows > 0L) && cleanPushedEmpty
    val total = cleanBytes + filtBytes
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(total)
      override def numRows(): java.util.OptionalLong =
        if (rowsKnown) java.util.OptionalLong.of(liveRows)
        else java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = new Batch {
    private val cleanBatch = cleanScan.toBatch
    private val filtBatch = filtScan.toBatch
    private lazy val cleanFactory = cleanBatch.createReaderFactory()
    private lazy val filtFactory = filtBatch.createReaderFactory()

    // filt metadata by scheme-less file path (manifest rows are
    // unqualified, the delegated planner's PartitionedFiles are
    // fs-qualified)
    private val filtByPath: Map[String, GraftFiltFile] =
      filtFiles.map(f => new Path(f.path).toUri.getPath -> f).toMap

    /** One planning pass, cached — planInputPartitions can be called
      * more than once per batch. The filtered branch delegates to its
      * ParquetScan for listing-level pruning, SPLITS, and packing,
      * then re-groups so every emitted partition maps to exactly ONE
      * file's sidecar/probe set (row indexes are per-file; a
      * multi-file partition could not attribute them). Also decides
      * the uniform columnar answer: columnar iff both delegates are
      * for every partition. */
    private lazy val planned: (Array[InputPartition], Boolean) = {
      val clean = cleanBatch.planInputPartitions()
      val filt: Array[InputPartition] = filtBatch.planInputPartitions()
        .iterator.flatMap {
          case fp: FilePartition => fp.files
          case other => throw new IllegalStateException(
            s"unexpected filtered-branch partition $other")
        }.zipWithIndex.map { case (pf, i) =>
          val key = pf.toPath.toUri.getPath
          val f = filtByPath.getOrElse(key, throw new IllegalStateException(
            s"filtered-branch planned file $key has no metadata mapping"))
          GraftDvFilePartition(FilePartition(i, Array(pf)), f.dv,
            f.probes): InputPartition
        }.toArray
      val columnar = clean.forall(cleanFactory.supportColumnarReads) &&
        filt.forall { case GraftDvFilePartition(inner, _, _) =>
          filtFactory.supportColumnarReads(inner)
        }
      (clean.map(p => GraftDvCleanPartition(p): InputPartition) ++ filt,
        columnar)
    }

    override def planInputPartitions(): Array[InputPartition] = planned._1

    override def createReaderFactory(): PartitionReaderFactory = {
      val filtSchema = filtScan.readSchema()
      val rowIdxOrd = filtSchema.fieldIndex(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME)
      // the served columns, by ordinal in the filt read schema —
      // robust to any delegate reordering
      val requiredOrds = cleanScan.readSchema().fieldNames
        .map(filtSchema.fieldIndex)
      val probeBinds = probes.map(_.keyFields.map(f =>
        (filtSchema.fieldIndex(f.name), f.dataType)).toArray).toArray
      new GraftDvReaderFactory(cleanFactory, filtFactory,
        new graft.util.SerConf(spark.sparkContext.hadoopConfiguration),
        filtSchema, rowIdxOrd, requiredOrds,
        probeBinds, probes.map(_.keys).toArray, planned._2)
    }
  }
}

/** A delegated clean-branch leaf. */
final case class GraftDvCleanPartition(inner: InputPartition)
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** One SPLIT of one filtered file: its deletion-vector sidecar path
  * (if any) and the applicable equality-delete probe groups (indexes
  * into the factory's probe arrays). */
final case class GraftDvFilePartition(inner: FilePartition,
                                      dvPath: Option[String],
                                      probes: Array[Int])
  extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

final class GraftDvReaderFactory(cleanFactory: PartitionReaderFactory,
                                 filtFactory: PartitionReaderFactory,
                                 conf: graft.util.SerConf,
                                 filtSchema: StructType,
                                 rowIdxOrd: Int,
                                 requiredOrds: Array[Int],
                                 probeBinds: Array[Array[(Int, DataType)]],
                                 probeKeys: Array[Set[Seq[Any]]],
                                 columnar: Boolean)
  extends PartitionReaderFactory {

  /** Whether an applicable pending equality delete kills this row —
    * each probe group's key tuple looked up in its broadcast set
    * (NULL components match nothing). */
  private def deadByProbe(pidx: Array[Int], row: InternalRow): Boolean = {
    var j = 0
    while (j < pidx.length) {
      val g = pidx(j)
      val k = GraftEqProbe.keyOf(probeBinds(g), row)
      if (k != null && probeKeys(g).contains(k)) return true
      j += 1
    }
    false
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftDvCleanPartition(inner) => cleanFactory.createReader(inner)
      case GraftDvFilePartition(inner, dvPath, pidx) =>
        // the sidecar loads once per task, where it is consumed
        val bits = dvPath
          .map(graft.sinks.ManifestTable.readDvBits(conf.value, _)).orNull
        val r = filtFactory.createReader(inner)
        // survivors project the extra columns (row index, probe-only
        // keys) away
        val project = UnsafeProjection.create(
          requiredOrds.map { o =>
            val f = filtSchema.fields(o)
            BoundReference(o, f.dataType, f.nullable): Expression
          }.toIndexedSeq)
        new PartitionReader[InternalRow] {
          override def next(): Boolean = {
            while (r.next()) {
              val row = r.get()
              // positions past Int.MaxValue cannot be in a bitset
              // sidecar — always live
              val posLive = bits == null || {
                val ri = row.getLong(rowIdxOrd)
                ri > Int.MaxValue.toLong || !bits.get(ri.toInt)
              }
              if (posLive &&
                  (pidx.length == 0 || !deadByProbe(pidx, row)))
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
    case GraftDvCleanPartition(inner) =>
      cleanFactory.createColumnarReader(inner)
    case GraftDvFilePartition(inner, dvPath, pidx) =>
      val bits = dvPath
        .map(graft.sinks.ManifestTable.readDvBits(conf.value, _)).orNull
      val r = filtFactory.createColumnarReader(inner)
      new PartitionReader[ColumnarBatch] {
        private var current: ColumnarBatch = _
        override def next(): Boolean = {
          while (r.next()) {
            val b = r.get()
            val n = b.numRows()
            val idxVec = if (bits == null) null else b.column(rowIdxOrd)
            // one pass: reader-generated row index against the
            // bitset, then the key probe (only for still-live rows)
            // — build the survivor map (original batch ordinals, in
            // order)
            var i = 0
            var kept = 0
            val map = new Array[Int](n)
            while (i < n) {
              var ok = true
              if (idxVec != null) {
                val ri = idxVec.getLong(i)
                ok = ri > Int.MaxValue.toLong || !bits.get(ri.toInt)
              }
              if (ok && pidx.length > 0)
                ok = !deadByProbe(pidx, b.getRow(i))
              if (ok) { map(kept) = i; kept += 1 }
              i += 1
            }
            if (kept > 0) {
              // serve only the required columns; remap only when some
              // row of THIS batch dropped — untouched batches pass
              // through zero-copy
              val dataCols = requiredOrds.map { o =>
                val c = b.column(o)
                if (kept == n) c
                else new GraftRowMappedVector(c, map): ColumnVector
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
