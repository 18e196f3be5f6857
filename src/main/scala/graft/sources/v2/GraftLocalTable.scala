package graft.sources.v2

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only DSv2 table over DRIVER-COMPUTED rows — the carrier for
  * the catalog's METADATA TABLES (`graft.db.t.history`,
  * `graft.db.t.files`), whose contents are metadata-scale by
  * construction: |versions| / |files| rows computed from the
  * manifests alone, never data I/O. The rows THUNK is evaluated at
  * scan-planning time (once per executed scan), not at table
  * resolution: loadTable must stay cheap — EXPLAIN, existence probes,
  * and repeated references in one query all resolve the identifier
  * without paying the metadata aggregation. One partition; rows
  * serialize as external Rows and convert to InternalRows
  * executor-side through the schema's encoder. */
final class GraftLocalTable(tblName: String, tblSchema: StructType,
                            rows: () => Seq[Row]) extends Table with SupportsRead {

  def this(tblName: String, tblSchema: StructType, fixed: Seq[Row]) =
    this(tblName, tblSchema, () => fixed)

  override def name(): String = tblName
  override def schema(): StructType = tblSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = tblSchema
      override def toBatch: Batch = new Batch {
        // planInputPartitions can be called more than once per batch;
        // compute the rows once per executed scan
        private lazy val computed = rows()
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftLocalPartition(tblSchema, computed))
        override def createReaderFactory(): PartitionReaderFactory =
          GraftLocalReaderFactory
      }
    }
}

final case class GraftLocalPartition(schema: StructType,
                                     rows: Seq[Row]) extends InputPartition

object GraftLocalReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftLocalPartition(schema, rows) =>
        new PartitionReader[InternalRow] {
          private val ser = org.apache.spark.sql.catalyst.encoders
            .ExpressionEncoder(schema).createSerializer()
          private val it = rows.iterator
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (!it.hasNext) false
            else { cur = ser(it.next()).copy(); true }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
  override def supportColumnarReads(p: InputPartition): Boolean = false
}
