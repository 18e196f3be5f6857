package graft.sinks.pbi

/** I4/I5 — Push-dataset model spec + validator
  * (src/sinks/pbi/spec/types.ts, buildModelSpec.ts, validateSpec.ts).
  * Pure Scala; enforced before any provisioning/refresh work starts. */
object PbiSpec {

  sealed abstract class ColumnType(val name: String)
  case object Int64Type extends ColumnType("Int64")
  case object DoubleType extends ColumnType("Double")
  case object BooleanType extends ColumnType("Boolean")
  case object StringType extends ColumnType("String")
  case object DateTimeType extends ColumnType("DateTime")

  case class ColumnSpec(name: String, dataType: ColumnType)
  case class TableSpec(name: String, columns: Seq[ColumnSpec], description: Option[String] = None)
  case class RelationshipSpec(name: String, fromTable: String, fromColumn: String,
                              toTable: String, toColumn: String,
                              crossFilteringBehavior: Option[String] = Some("OneDirection"))
  case class DatasetSpec(name: String, defaultRetentionPolicy: Option[String],
                         tables: Seq[TableSpec], relationships: Seq[RelationshipSpec])

  val MaxTables = 75
  val MaxColumnsPerTable = 75
  val MaxRelationships = 75
  val MaxNameLength = 100
  val RequiredTableNames: Seq[String] = graft.notion.Derive.ExpectedTables
  private val ValidCrossFiltering = Set("OneDirection", "BothDirections", "Automatic")

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def validateName(kind: String, name: String, context: String = ""): Unit = {
    val ctx = if (context.nonEmpty) s" ($context)" else ""
    if (name.isEmpty) fail(s"Invalid spec: $kind name cannot be empty$ctx.")
    if (name != name.trim)
      fail(s"""Invalid spec: $kind name "$name" cannot have leading/trailing whitespace$ctx.""")
    if (name.exists(c => c < 0x20 || c == 0x7f))
      fail(s"""Invalid spec: $kind name "$name" contains control characters$ctx.""")
    if (name.length > MaxNameLength)
      fail(s"""Invalid spec: $kind name "$name" exceeds $MaxNameLength characters$ctx.""")
  }

  /** validateSpec.ts:48-159 — limits, name rules, case-insensitive dup
    * detection, exact required table set, relationship referential
    * checks. */
  def validate(spec: DatasetSpec): Unit = {
    if (spec.tables.length > MaxTables)
      fail(s"Power BI limit exceeded: tables (${spec.tables.length}) > $MaxTables.")
    val seen = scala.collection.mutable.Set.empty[String]
    for (t <- spec.tables) {
      validateName("table", t.name)
      if (!seen.add(t.name.toLowerCase)) fail(s"""Invalid spec: duplicate table name "${t.name}".""")
      if (t.columns.length > MaxColumnsPerTable)
        fail(s"""Power BI limit exceeded: columns in "${t.name}" (${t.columns.length}) > $MaxColumnsPerTable.""")
      val colSeen = scala.collection.mutable.Set.empty[String]
      for (c <- t.columns) {
        validateName("column", c.name, s"""table "${t.name}"""")
        if (!colSeen.add(c.name.toLowerCase))
          fail(s"""Invalid spec: duplicate column "${c.name}" in table "${t.name}".""")
      }
    }
    val actual = spec.tables.map(_.name).toSet
    val missing = RequiredTableNames.filterNot(actual.contains)
    val unexpected = actual.filterNot(RequiredTableNames.contains)
    if (missing.nonEmpty || unexpected.nonEmpty)
      fail(s"Invalid spec table set. Missing required tables: " +
        s"${if (missing.nonEmpty) missing.mkString(", ") else "none"}. " +
        s"Unexpected tables: ${if (unexpected.nonEmpty) unexpected.mkString(", ") else "none"}.")
    if (spec.relationships.length > MaxRelationships)
      fail(s"Power BI limit exceeded: relationships (${spec.relationships.length}) > $MaxRelationships.")
    val byLower = spec.tables.map(t => t.name.toLowerCase -> t).toMap
    for (r <- spec.relationships) {
      validateName("relationship", r.name,
        s"${r.fromTable}.${r.fromColumn} -> ${r.toTable}.${r.toColumn}")
      r.crossFilteringBehavior.foreach { b =>
        if (!ValidCrossFiltering.contains(b))
          fail(s"Invalid spec: relationship ${r.fromTable}.${r.fromColumn} -> " +
            s"""${r.toTable}.${r.toColumn} has invalid crossFilteringBehavior "$b".""")
      }
      val from = byLower.getOrElse(r.fromTable.toLowerCase,
        fail(s"""Invalid spec: relationship references missing fromTable "${r.fromTable}"."""))
      val to = byLower.getOrElse(r.toTable.toLowerCase,
        fail(s"""Invalid spec: relationship references missing toTable "${r.toTable}"."""))
      if (!from.columns.exists(_.name.equalsIgnoreCase(r.fromColumn)))
        fail(s"""Invalid spec: relationship references missing fromColumn "${r.fromColumn}" on table "${r.fromTable}".""")
      if (!to.columns.exists(_.name.equalsIgnoreCase(r.toColumn)))
        fail(s"""Invalid spec: relationship references missing toColumn "${r.toColumn}" on table "${r.toTable}".""")
    }
  }

  /** buildModelSpec.ts:4-184 — the 7-table / 63-column / 8-relationship
    * declared star schema. */
  def buildModelSpec(datasetName: String): DatasetSpec = {
    def rel(ft: String, fc: String, tt: String, tc: String) =
      RelationshipSpec(s"$ft.${fc}__to__$tt.$tc", ft, fc, tt, tc)
    val fact = TableSpec("FactTimeslices", Seq(
      ColumnSpec("Name", StringType), ColumnSpec("From Event", StringType),
      ColumnSpec("From Status", StringType), ColumnSpec("From Step N", Int64Type),
      ColumnSpec("From Task Name", StringType), ColumnSpec("From Task Page ID", StringType),
      ColumnSpec("From Time", DoubleType), ColumnSpec("From Workflow Step", StringType),
      ColumnSpec("Minutes Diff", Int64Type), ColumnSpec("Slice Label", StringType),
      ColumnSpec("To Event", StringType), ColumnSpec("To Status", StringType),
      ColumnSpec("To Step N", Int64Type), ColumnSpec("To Task Name", StringType),
      ColumnSpec("To Task Page ID", StringType), ColumnSpec("To Time", DoubleType),
      ColumnSpec("To Workflow Step", StringType), ColumnSpec("Workflow Definition", StringType),
      ColumnSpec("Workflow Record", StringType), ColumnSpec("Workflow Type", StringType),
      ColumnSpec("To DateTime", DateTimeType), ColumnSpec("To Date", DateTimeType),
      ColumnSpec("from_stage_key", StringType), ColumnSpec("to_stage_key", StringType)))
    val dimWorkflow = TableSpec("DimWorkflow", Seq(
      ColumnSpec("workflow_definition_key", StringType),
      ColumnSpec("workflow_definition", StringType)))
    val dimStage = TableSpec("DimStage", Seq(
      ColumnSpec("stage_key", StringType), ColumnSpec("color_hex", StringType),
      ColumnSpec("workflow_definition_key", StringType),
      ColumnSpec("workflow_definition", StringType), ColumnSpec("stage", StringType),
      ColumnSpec("stage_n", Int64Type), ColumnSpec("Stage Label", StringType)))
    val dimDate = TableSpec("DimDate", Seq(
      ColumnSpec("Date", DateTimeType), ColumnSpec("date_key", Int64Type),
      ColumnSpec("year", Int64Type), ColumnSpec("month_num", Int64Type),
      ColumnSpec("month_name", StringType), ColumnSpec("day_of_month", Int64Type),
      ColumnSpec("day_name", StringType)))
    val dimFrame = TableSpec("DimPlaybackFrame", Seq(
      ColumnSpec("frame_n", Int64Type), ColumnSpec("frame_datetime", DateTimeType),
      ColumnSpec("frame_date", DateTimeType)))
    val occupancy = TableSpec("StageOccupancy_Hourly", Seq(
      ColumnSpec("frame_n", Int64Type), ColumnSpec("snapshot_dt", DateTimeType),
      ColumnSpec("snapshot_day", DateTimeType), ColumnSpec("snapshot_label", StringType),
      ColumnSpec("workflow_definition", StringType), ColumnSpec("stage", StringType),
      ColumnSpec("stage_n", Int64Type), ColumnSpec("stage_key", StringType),
      ColumnSpec("item_count", Int64Type), ColumnSpec("Objective Count", Int64Type)))
    val throughput = TableSpec("StageThroughput_Daily", Seq(
      ColumnSpec("bucket_day", DateTimeType), ColumnSpec("bucket_n", Int64Type),
      ColumnSpec("workflow_definition", StringType), ColumnSpec("stage", StringType),
      ColumnSpec("stage_n", Int64Type), ColumnSpec("stage_key", StringType),
      ColumnSpec("entry_count", Int64Type), ColumnSpec("exit_count", Int64Type),
      ColumnSpec("occupancy_peak", Int64Type), ColumnSpec("occupancy_avg", DoubleType)))
    val spec = DatasetSpec(datasetName, Some("None"),
      Seq(fact, dimWorkflow, dimStage, dimDate, dimFrame, occupancy, throughput),
      Seq(
        rel("StageOccupancy_Hourly", "frame_n", "DimPlaybackFrame", "frame_n"),
        rel("StageOccupancy_Hourly", "stage_key", "DimStage", "stage_key"),
        rel("FactTimeslices", "from_stage_key", "DimStage", "stage_key"),
        rel("StageThroughput_Daily", "stage_key", "DimStage", "stage_key"),
        rel("StageThroughput_Daily", "bucket_day", "DimDate", "Date"),
        rel("DimPlaybackFrame", "frame_date", "DimDate", "Date"),
        rel("FactTimeslices", "To Date", "DimDate", "Date"),
        rel("DimStage", "workflow_definition_key", "DimWorkflow", "workflow_definition_key")))
    validate(spec)
    spec
  }
}
