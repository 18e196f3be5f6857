package graft.sources.v2

import org.apache.spark.sql.connector.catalog.{Identifier, StagedTable, SupportsWrite, TableCapability}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType

/** The staged side of atomic CTAS/RTAS ([[GraftCatalog.stageCreate]]/
  * `stageReplace`): a writable table handle whose DESCRIPTOR is
  * withheld until `commitStagedChanges` — Spark writes the query's
  * result first, then commits, so a failed CTAS leaves nothing
  * registered and [[GraftCatalog.abortStaged]] removes the staged
  * directory.
  *
  *   - CTAS (`replace = false`): the empty manifest table was created
  *     at stage time; the query APPENDS into it through the V1 bridge
  *     (one manifest commit), and the descriptor write is the single
  *     visibility step.
  *   - RTAS (`replace = true`): the data lands as ONE
  *     [[graft.sinks.ManifestTable.overwriteAs]] commit — content and
  *     (possibly different) schema replace together, CAS-serialized,
  *     with prior versions still time-travelable. The descriptor
  *     already exists; commit refreshes its properties.
  */
final class GraftStagedTable(
    catalog: GraftCatalog, ident: Identifier, location: String,
    stagedSchema: StructType, props: java.util.Properties,
    replace: Boolean, createdDir: Boolean)
  extends StagedTable with SupportsWrite {

  override def name(): String = ident.toString
  override def schema(): StructType = stagedSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
            if (replace)
              graft.sinks.ManifestTable.overwriteAs(data, location): Unit
            else
              graft.sinks.ManifestTable.write(data, location): Unit
          }
      }
    }

  override def commitStagedChanges(): Unit =
    catalog.commitStaged(ident, props)

  override def abortStagedChanges(): Unit =
    catalog.abortStaged(location, createdDir)
}
