package graft.sources.v2

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** LOGICAL↔PHYSICAL name shim over a delegated scan builder — the
  * read side of RENAME COLUMN's name mapping
  * ([[graft.sinks.ManifestTable.renameColumn]]). Data files carry
  * each field's stable PHYSICAL name; the table exposes the logical
  * one. Data itself needs no translation — InternalRows and
  * ColumnarBatches carry no names — so the shim only rewrites the
  * three places names cross the boundary:
  *
  *   - required columns (logical → physical, into the delegate),
  *   - pushed filter attribute names (logical → physical — which is
  *     also what the manifest file index's envelope/bloom proofs and
  *     the parquet pushdown speak),
  *   - the built scan's read schema (physical → logical, back out).
  *
  * Partitions, reader factories, and batches pass through VERBATIM.
  * Unmapped tables never construct this shim ([[graft.sinks
  * .ManifestTable.hasMapping]]), so the pre-rename plan shape is
  * byte-identical. */
final class GraftMappedScanBuilder(
    inner: ScanBuilder with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters,
    logicalSchema: StructType)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters {

  private val toPhys: Map[String, String] = logicalSchema.fields
    .map(f => f.name -> graft.sinks.ManifestTable.physicalName(f)).toMap

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    inner.pushFilters(filters.map(_.transform {
      case a: AttributeReference
          if toPhys.getOrElse(a.name, a.name) != a.name =>
        a.withName(toPhys(a.name))
    })): Unit
    // everything re-applies above the scan (parquet pushdown is
    // best-effort row-group/page skipping, never exact) — and the
    // post-scan filters must reference the relation's LOGICAL output
    filters
  }

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(StructType(requiredSchema.fields.map(f =>
      f.copy(name = toPhys.getOrElse(f.name, f.name)))))

  override def build(): Scan =
    new GraftMappedScan(inner.build(), logicalSchema)
}

final class GraftMappedScan(inner: Scan, logicalSchema: StructType)
  extends Scan with SupportsReportStatistics {

  private val toLogical: Map[String, String] = logicalSchema.fields
    .map(f => graft.sinks.ManifestTable.physicalName(f) -> f.name).toMap

  override def readSchema(): StructType =
    StructType(inner.readSchema().fields.map(f =>
      f.copy(name = toLogical.getOrElse(f.name, f.name))))

  override def description(): String = s"GraftMapped(${inner.description()})"

  override def toBatch: Batch = inner.toBatch

  override def estimateStatistics(): Statistics = inner match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
}
