package graft.sources.v2

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, GetStructField}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** LOGICAL↔PHYSICAL name shim over a delegated scan builder — the
  * read side of RENAME COLUMN's name mapping
  * ([[graft.sinks.ManifestTable.renameColumn]]), at EVERY nesting
  * level (nested struct members evolve by the same frozen-physical-
  * name machinery — [[graft.sinks.ManifestTable.renameColumnPath]]).
  * Data files carry each field's stable PHYSICAL name; the table
  * exposes the logical one. Data itself needs no translation —
  * InternalRows and ColumnarBatches carry no names, and renames never
  * reorder fields, so ordinals line up — the shim only rewrites the
  * three places names cross the boundary:
  *
  *   - required columns (logical → physical, into the delegate;
  *     recursive, so nested schema pruning survives),
  *   - pushed filter attribute names AND types (logical → physical —
  *     the physical TYPE matters because nested predicate translation
  *     resolves `GetStructField` member names from the child schema;
  *     explicit logical name hints are stripped for the same reason),
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

  import graft.sinks.ManifestTable.{physicalName, physicalType}

  /** A (possibly nested-pruned) required type translated to physical
    * names, guided by the logical schema's tree — unmatched names
    * (generated columns like the row index) pass through. */
  private def translate(required: DataType, logical: DataType): DataType =
    (required, logical) match {
      case (r: StructType, l: StructType) =>
        StructType(r.fields.map { rf =>
          l.fields.find(_.name == rf.name) match {
            case Some(lf) => rf.copy(name = physicalName(lf),
              dataType = translate(rf.dataType, lf.dataType))
            case None => rf
          }
        })
      case (r: ArrayType, l: ArrayType) =>
        r.copy(elementType = translate(r.elementType, l.elementType))
      case (r: MapType, l: MapType) =>
        r.copy(valueType = translate(r.valueType, l.valueType))
      case (r, _) => r
    }

  private val logicalByName = logicalSchema.fields.map(f => f.name -> f).toMap

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    inner.pushFilters(filters.map(_.transform {
      // physical name AND physical dataType: nested predicate
      // translation (parquet pushdown, the index's proofs) resolves
      // struct member names from the attribute's type tree
      case a: AttributeReference if logicalByName.contains(a.name) && {
          val lf = logicalByName(a.name)
          physicalName(lf) != a.name ||
            physicalType(lf.dataType) != lf.dataType
        } =>
        val lf = logicalByName(a.name)
        AttributeReference(physicalName(lf),
          physicalType(lf.dataType), a.nullable, a.metadata)(
          a.exprId, a.qualifier)
      // a logical member-name hint would override the (physical)
      // child schema during translation — drop it, ordinals suffice
      case g: GetStructField if g.name.isDefined =>
        g.copy(name = None)
    })): Unit
    // everything re-applies above the scan (parquet pushdown is
    // best-effort row-group/page skipping, never exact) — and the
    // post-scan filters must reference the relation's LOGICAL output
    filters
  }

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(
      translate(requiredSchema, logicalSchema).asInstanceOf[StructType])

  override def build(): Scan =
    new GraftMappedScan(inner.build(), logicalSchema)
}

final class GraftMappedScan(inner: Scan, logicalSchema: StructType)
  extends Scan with SupportsReportStatistics {

  import graft.sinks.ManifestTable.physicalName

  /** Physical → logical, guided by the logical tree keyed by
    * PHYSICAL name at each level. */
  private def back(read: DataType, logical: DataType): DataType =
    (read, logical) match {
      case (r: StructType, l: StructType) =>
        StructType(r.fields.map { rf =>
          l.fields.find(lf => physicalName(lf) == rf.name) match {
            case Some(lf) => rf.copy(name = lf.name,
              dataType = back(rf.dataType, lf.dataType))
            case None => rf
          }
        })
      case (r: ArrayType, l: ArrayType) =>
        r.copy(elementType = back(r.elementType, l.elementType))
      case (r: MapType, l: MapType) =>
        r.copy(valueType = back(r.valueType, l.valueType))
      case (r, _) => r
    }

  override def readSchema(): StructType =
    back(inner.readSchema(), logicalSchema).asInstanceOf[StructType]

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
