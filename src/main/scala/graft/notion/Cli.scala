package graft.notion

import graft.sinks.{ExcelSink, JsonlSink}
import graft.sinks.pbi.{PbiSpec, Refresh, Registry}
import org.apache.spark.sql.SparkSession

/** M6 — thin command dispatcher mirroring the reference CLI surface
  * (src/cli/index.ts:410-435). Commands that need live HTTP (Notion
  * pull, Power BI) run against injectable adapters; offline runs use
  * recorded JSONL (pull) and the in-memory fake client (pbi:*), which
  * is also how the reference's tests exercise them.
  *
  *   normalize <dataDir>            raw → canon + quality issues
  *   excel:export <dataDir> <xlsx>  canon → 7-table workbook
  *   pbi:provision <dataDir>        ensure dataset via client
  *   pbi:refresh <dataDir>          derive → wipe+reload via client
  *   run <dataDir>                  pull(recorded) + normalize
  */
object Cli {

  case class Env(spark: SparkSession, cfg: NotionSchemas.NotionConfig,
                 client: Refresh.PbiClient = new Refresh.FakeClient,
                 // reference run date is the America/Los_Angeles calendar
                 // date (quality/timeslices.ts:174), not the JVM-tz date
                 runDate: String = graft.functions.Scalars.laRunDate(),
                 log: String => Unit = println)

  private val Datasets = Seq("workflowDefinitions", "workflowStages", "timeslices")

  /** `normalize` (cli/index.ts:73-131): read latest raw partitions,
    * build canon datasets, evaluate quality, exclude, write 4 outputs. */
  def normalize(env: Env, dataDir: String): Map[String, Long] = {
    env.cfg.validateOrThrow()
    val dates = Datasets.map { ds =>
      ds -> JsonlSink.latestDate(env.spark, dataDir, "raw", ds).getOrElse(
        throw new IllegalStateException(s"No raw data found for dataset: $ds"))
    }.toMap
    def raw(ds: String) = JsonlSink.read(env.spark, NotionSchemas.rawRecordSchema,
      dataDir, "raw", ds, dates(ds))
    val defs = Normalize.workflowDefinitions(raw("workflowDefinitions"), env.cfg)
    val stages = Normalize.workflowStages(raw("workflowStages"), env.cfg)
    val ts = Normalize.timeslices(raw("timeslices"), env.cfg)
    val issues = Quality.allIssues(ts, stages, env.runDate)
    val clean = Quality.excludeTimeslices(ts)
    val outDate = env.runDate
    JsonlSink.write(defs, dataDir, "canon", "workflowDefinitions", outDate, singleFile = true)
    JsonlSink.write(stages, dataDir, "canon", "workflowStages", outDate, singleFile = true)
    JsonlSink.write(clean, dataDir, "canon", "timeslices", outDate, singleFile = true)
    JsonlSink.write(issues, dataDir, "canon", "qualityIssues", outDate, singleFile = true)
    val report = Quality.report(ts, issues, env.runDate)
    env.log(s"[normalize] total=${report.timeslices_total} " +
      s"excluded=${report.timeslices_excluded_missing_workflow_definition} " +
      s"issues=${report.issues_total}")
    Map("workflowDefinitions" -> defs.count(), "workflowStages" -> stages.count(),
      "timeslices" -> clean.count(), "qualityIssues" -> issues.count())
  }

  private def canonTables(env: Env, dataDir: String) = {
    def canon(ds: String, schema: org.apache.spark.sql.types.StructType) = {
      val date = JsonlSink.latestDate(env.spark, dataDir, "canon", ds).getOrElse(
        throw new IllegalStateException(s"No canon data found for dataset: $ds"))
      env.spark.read.schema(schema).json(JsonlSink.datasetDir(dataDir, "canon", ds, date))
    }
    // canon schemas are the builders' output schemas; derive them from empty raw
    val empty = env.spark.createDataFrame(
      env.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      NotionSchemas.rawRecordSchema)
    val defs = canon("workflowDefinitions",
      Normalize.workflowDefinitions(empty, env.cfg).schema)
    val stages = canon("workflowStages", Normalize.workflowStages(empty, env.cfg).schema)
    val ts = canon("timeslices", Normalize.timeslices(empty, env.cfg).schema)
    (defs, stages, ts)
  }

  /** `excel:export` (cli/index.ts:219-273). */
  def excelExport(env: Env, dataDir: String, outputPath: String): Map[String, Long] = {
    val (defs, stages, ts) = canonTables(env, dataDir)
    val tables = Derive.deriveAll(defs, stages, ts)
    Derive.assertIntegrity(tables("FactTimeslices"), tables("DimStage"),
      tables("DimWorkflow"), stages, defs)
    ExcelSink.write(tables.map { case (k, v) =>
      k -> (if (v.columns.contains("attributes")) v.drop("attributes") else v) }, outputPath)
    val counts = tables.map { case (k, v) => k -> v.count() }
    counts.toSeq.sortBy(_._1).foreach { case (k, n) => env.log(s"[excel] $k rows=$n") }
    counts
  }

  /** `pull` (cli/index.ts:40-71): pull each dataset through the adapter
    * (throttled in production; recorded payloads offline) and land raw
    * JSONL partitions under `raw/<dataset>/<utcDate>/`. */
  def pull(env: Env, adapter: Ingest.NotionAdapter, dataDir: String,
           databaseIds: Map[String, String],
           date: String = graft.functions.Scalars.utcDateStamp()): Map[String, Long] =
    databaseIds.map { case (dataset, dbId) =>
      val records = Ingest.pullDataset(adapter, dataset, dbId)
      val df = Ingest.toDataFrame(env.spark, records)
      JsonlSink.write(df, dataDir, "raw", dataset, date, singleFile = true)
      env.log(s"[pull] $dataset records=${records.size}")
      dataset -> records.size.toLong
    }

  /** `run` = pull + normalize (cli/index.ts:207-210). */
  def run(env: Env, adapter: Ingest.NotionAdapter, dataDir: String,
          databaseIds: Map[String, String]): Map[String, Long] = {
    pull(env, adapter, dataDir, databaseIds, env.runDate)
    normalize(env, dataDir)
  }

  /** `audit:notion-schema` (cli/index.ts:156-205): fetch each database's
    * property schema via the adapter, print `name | id | type`, write the
    * audit JSON. Offline runs use a recorded-payload adapter. */
  def auditNotionSchema(env: Env, adapter: Ingest.NotionAdapter, dataDir: String,
                        databaseIds: Map[String, String]): String = {
    val sb = new StringBuilder("{\n")
    databaseIds.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((dataset, dbId), i) =>
      val db = adapter.retrieveDatabase(dbId)
      env.log(s"[audit] dataset=$dataset database=$dbId")
      db.properties.sortBy(_.name).foreach { p =>
        env.log(f"  ${p.name}%-30s | ${p.id.getOrElse(p.name)}%-12s | ${p.propType.getOrElse("unknown")}")
      }
      val props = db.properties.sortBy(_.name).map { p =>
        s"""      {"name": "${p.name}", "id": "${p.id.getOrElse(p.name)}", "type": "${p.propType.getOrElse("unknown")}"}"""
      }.mkString(",\n")
      sb.append(s"""  "$dataset": {"databaseId": "$dbId", "properties": [\n$props\n  ]}""")
      sb.append(if (i < databaseIds.size - 1) ",\n" else "\n")
    }
    sb.append("}\n")
    val out = java.nio.file.Paths.get(s"$dataDir/audit/notion-schema.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, sb.toString.getBytes("UTF-8"))
    out.toString
  }

  /** `pbi:provision` (cli/index.ts:275-311). */
  def pbiProvision(env: Env, dataDir: String, groupId: String,
                   datasetName: String): String =
    Registry.ensureDataset(env.client, dataDir, groupId,
      PbiSpec.buildModelSpec(datasetName))

  /** `pbi:refresh` (cli/index.ts:313-408): derive + wipe/reload. */
  def pbiRefresh(env: Env, dataDir: String, groupId: String,
                 datasetName: String): Refresh.RefreshTotals = {
    val spec = PbiSpec.buildModelSpec(datasetName)
    val datasetId = Registry.findDatasetId(
      Registry.load(dataDir), groupId, datasetName).getOrElse(
      throw new IllegalStateException(
        s"Dataset '$datasetName' not found in registry; run pbi:provision first."))
    val (defs, stages, ts) = canonTables(env, dataDir)
    val tables = Derive.deriveAll(defs, stages, ts)
    val rows = tables.map { case (name, df) =>
      val cols = df.columns.toSeq
      name -> df.collect().toSeq.map(r =>
        cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
    }
    Refresh.executeWipeAndReload(env.client, groupId, datasetId, spec, rows,
      log = env.log)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val env = Env(spark, DefaultConfig.config)
    args.toList match {
      case "normalize" :: dataDir :: Nil => normalize(env, dataDir)
      case "excel:export" :: dataDir :: out :: Nil => excelExport(env, dataDir, out)
      case "pbi:provision" :: dataDir :: group :: name :: Nil =>
        println(pbiProvision(env, dataDir, group, name))
      case "pbi:refresh" :: dataDir :: group :: name :: Nil =>
        println(pbiRefresh(env, dataDir, group, name))
      case other =>
        System.err.println(s"Unknown command: ${other.mkString(" ")}. " +
          "Commands: normalize | excel:export | pbi:provision | pbi:refresh")
        sys.exit(2)
    }
    spark.stop()
  }
}

/** Default property-ID bindings; override per deployment (env.ts analog —
  * ids here are the generic fixture ids, not the reference's workspace). */
object DefaultConfig {
  val config: NotionSchemas.NotionConfig = NotionSchemas.NotionConfig(
    timeslices = NotionSchemas.TimeslicePropertyIds(
      workflowDefinitionRel = "rel_workflow",
      workflowRecordRel = "rel_workflow_record",
      workflowInstancePageName = "rollup_instance_name",
      fromStageRel = "rel_from_step",
      toStageRel = "rel_to_step",
      startedAtDate = "start_date",
      endedAtDate = "end_date",
      fromTaskPageId = "rt_from_task_page",
      toTaskPageId = "rt_to_task_page",
      fromTaskName = "rt_from_task_name",
      toTaskName = "rt_to_task_name"),
    workflowStages = NotionSchemas.WorkflowStagePropertyIds(
      workflowDefinitionRel = "wf_rel",
      stageNumber = "stage_number",
      stageLabel = "stage_label"),
    workflowDefinitions = NotionSchemas.WorkflowDefinitionPropertyIds(title = "title_prop"))
}
