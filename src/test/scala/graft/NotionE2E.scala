package graft
/** Throwaway verification driver: consumes the notion package exactly as a
  * library user would — JSONL files on disk through normalize → quality →
  * derive → JSONL sinks. */
object NotionE2E {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.notion._
    val base = "/tmp/notion_e2e"
    // stage raw JSONL partitions on disk, as the ingest phase would
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(s"$base/raw"))
    val fx = graft.NotionFixtures
    val missingWf = fx.timesliceJson
      .replace("12345678-1234-1234-1234-1234567890ab", "99999999-9999-9999-9999-999999999999")
      .replace("\"rel_workflow\": {", "\"rel_workflow_zzz\": {")
    Files.write(Paths.get(s"$base/raw/timeslices.jsonl"),
      (fx.timesliceJson + "\n" + missingWf + "\n" + fx.dbJson).getBytes("UTF-8"))
    Files.write(Paths.get(s"$base/raw/stages.jsonl"), fx.stageJson.getBytes("UTF-8"))
    Files.write(Paths.get(s"$base/raw/defs.jsonl"), fx.defJson.getBytes("UTF-8"))
    val raw = spark.read.schema(NotionSchemas.rawRecordSchema).json(s"$base/raw/timeslices.jsonl")
    val rawSt = spark.read.schema(NotionSchemas.rawRecordSchema).json(s"$base/raw/stages.jsonl")
    val rawDef = spark.read.schema(NotionSchemas.rawRecordSchema).json(s"$base/raw/defs.jsonl")
    val cfg = graft.NotionFixtures.cfg
    val ts = Normalize.timeslices(raw, cfg)
    val stages = Normalize.workflowStages(rawSt, cfg)
    val defs = Normalize.workflowDefinitions(rawDef, cfg)
    val issues = Quality.allIssues(ts, stages, "2026-08-12")
    val clean = Quality.excludeTimeslices(ts)
    val report = Quality.report(ts, issues, "2026-08-12")
    println(s"REPORT total=${report.timeslices_total} excluded=${report.timeslices_excluded_missing_workflow_definition} issues=${report.issues_total} rules=${report.issues_by_rule}")
    val tables = Derive.deriveAll(defs, stages, clean)
    Derive.assertIntegrity(tables("FactTimeslices"), tables("DimStage"), tables("DimWorkflow"), stages, defs)
    tables.toSeq.sortBy(_._1).foreach { case (n, df) =>
      df.coalesce(1).write.mode("overwrite").json(s"$base/out/$n")
      println(s"TABLE $n rows=${df.count()}")
    }
    tables("FactTimeslices").show(3, 40, vertical = true)
    spark.stop()
  }
}
