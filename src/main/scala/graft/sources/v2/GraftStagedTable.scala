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
  *     already exists; commit refreshes its properties. Because the
  *     replacement commits DURING query execution (before
  *     `commitStagedChanges`), an abort COMPENSATES: it restores the
  *     pre-RTAS version as a new commit — content-identical to never
  *     having replaced, with the aborted attempt still visible in
  *     history/time travel. The compensation only fires while the
  *     RTAS commit is still the latest (a concurrent writer's commit
  *     on top is never rolled back), and a crash between the replace
  *     and the abort leaves the replacement until a manual
  *     restore() — the documented weaker-than-CTAS guarantee of
  *     replacing in place on a versioned format.
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

  /** The version the RTAS replacement committed as — what an abort
    * must compensate for (None until the write ran). */
  @volatile private var replacedAs: Option[Long] = None

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          (data: org.apache.spark.sql.DataFrame, _: Boolean) => {
            if (replace)
              replacedAs =
                Some(graft.sinks.ManifestTable.overwriteAs(data, location))
            else
              graft.sinks.ManifestTable.write(data, location): Unit
          }
      }
    }

  override def commitStagedChanges(): Unit =
    catalog.commitStaged(ident, props)

  override def abortStagedChanges(): Unit = {
    // a replace that already committed rolls back by COMPENSATION:
    // restore the pre-RTAS version — but only while this statement's
    // commit is still the table's latest; a concurrent commit on top
    // must never be silently discarded by a failing RTAS's cleanup.
    // The latest-check runs INSIDE the restore's CAS loop
    // (restoreIfCurrent) — a check-then-restore here would race a
    // writer landing between the check and the compensating commit
    replacedAs.foreach { v =>
      if (v > 0)
        graft.sinks.ManifestTable.restoreIfCurrent(
          catalog.session, location, v - 1, expectedCurrent = v): Unit
    }
    catalog.abortStaged(location, createdDir)
  }
}
