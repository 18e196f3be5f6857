package graft

import graft.notion._
import graft.sinks.pbi.Refresh
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI flows over a staged raw data dir: normalize →
  * excel:export → pbi:provision → pbi:refresh, entirely offline
  * (fixtures + fake client), mirroring `run:end-to-end`. */
class CliSpec extends AnyFunSuite {
  import TestSpark._

  private def stageRawData(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli").toString
    def write(ds: String, lines: Seq[String]): Unit = {
      val p = java.nio.file.Paths.get(s"$dir/raw/$ds/2026-08-12")
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.write(p.resolve("records.jsonl"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    // make the timeslice's from_step resolve to the fixture stage page
    val tsResolvable = NotionFixtures.timesliceJson.replace(
      "bbbbbbbb-bbbb-bbbb-bbbb-bbbbbbbbbbbb", "22222222-2222-2222-2222-222222222222")
    val tsMissingWf = NotionFixtures.timesliceJson
      .replace("12345678-1234-1234-1234-1234567890ab", "99999999-9999-9999-9999-999999999999")
      .replace("\"rel_workflow\": {", "\"rel_workflow_zzz\": {")
    write("timeslices", Seq(tsResolvable, tsMissingWf, NotionFixtures.dbJson))
    write("workflowStages", Seq(NotionFixtures.stageJson))
    write("workflowDefinitions", Seq(NotionFixtures.defJson))
    dir
  }

  test("normalize -> excel:export -> pbi:provision -> pbi:refresh, offline end-to-end") {
    val dataDir = stageRawData()
    val client = new Refresh.FakeClient
    val env = Cli.Env(spark, NotionFixtures.cfg, client,
      runDate = "2026-08-12", log = _ => ())

    val counts = Cli.normalize(env, dataDir)
    assert(counts("timeslices") == 1, "missing-wf timeslice excluded")
    assert(counts("qualityIssues") == 1)

    val xlsx = s"$dataDir/out.xlsx"
    val tableCounts = Cli.excelExport(env, dataDir, xlsx)
    assert(tableCounts.keySet == notion.Derive.ExpectedTables.toSet)
    assert(tableCounts("FactTimeslices") == 1)
    assert(tableCounts("StageOccupancy_Hourly") == 1)
    assert(new java.io.File(xlsx).length() > 0)

    val dsId = Cli.pbiProvision(env, dataDir, "group-1", "TimeTracking")
    val totals = Cli.pbiRefresh(env, dataDir, "group-1", "TimeTracking")
    assert(totals.tablesProcessed == 7)
    assert(totals.totalRowsPosted ==
      tableCounts.values.sum, "every derived row posted")
    assert(client.tableRows(s"group-1/$dsId/FactTimeslices").size == 1)
  }

  test("normalize fails fast when a dataset has no raw partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cli2").toString
    val env = Cli.Env(spark, NotionFixtures.cfg, log = _ => ())
    val e = intercept[IllegalStateException](Cli.normalize(env, dir))
    assert(e.getMessage.contains("No raw data found"))
  }

  test("pbi:refresh without provision fails with a clear message") {
    val dataDir = stageRawData()
    val env = Cli.Env(spark, NotionFixtures.cfg, log = _ => ())
    Cli.normalize(env, dataDir)
    val e = intercept[IllegalStateException](
      Cli.pbiRefresh(env, dataDir, "group-1", "TimeTracking"))
    assert(e.getMessage.contains("pbi:provision"))
  }

  test("audit:notion-schema prints name|id|type and writes the audit json") {
    val dir = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val db = notion.Ingest.DatabaseLike("db-1", None, None, None, Seq(
      notion.Ingest.PropertyValue("Started", Some("w%5Czt"), Some("date"), "{}"),
      notion.Ingest.PropertyValue("Title", Some("title"), Some("title"), "{}")))
    val adapter = new notion.Ingest.FakeNotionAdapter(db, Seq.empty)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val env = Cli.Env(spark, NotionFixtures.cfg, log = lines += _)
    val out = Cli.auditNotionSchema(env, adapter, dir, Map("timeslices" -> "db-1"))
    assert(lines.exists(_.contains("Started")), "schema rows printed")
    val json = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    assert(json.contains("\"id\": \"w%5Czt\"") && json.contains("\"type\": \"date\""))
  }

  test("run-date helpers render LA vs UTC calendar dates") {
    val clock = new graft.util.LogicalClock(start = 1704088800000L) // 2024-01-01T06:00Z
    assert(functions.Scalars.utcDateStamp(clock) == "2024-01-01")
    assert(functions.Scalars.laRunDate(clock) == "2023-12-31") // LA still on Dec 31
  }

  test("run = pull + normalize lands raw partitions then canon outputs") {
    val dataDir = java.nio.file.Files.createTempDirectory("graft-run").toString
    val mkDb = (props: Seq[notion.Ingest.PropertyValue]) =>
      notion.Ingest.DatabaseLike("db-x", None, None, None, props)
    // minimal dataset trio: defs/stages empty, timeslices with one page
    val tsDb = mkDb(Seq(
      notion.Ingest.PropertyValue("Start", Some("start_date"), Some("date"), "{}"),
      notion.Ingest.PropertyValue("End", Some("end_date"), Some("date"), "{}")))
    val page = notion.Ingest.PageLike("12345678-1234-1234-1234-1234567890ab",
      "2026-02-01T12:10:00.000Z", None, None, Seq(
        notion.Ingest.PropertyValue("Start", None, None,
          """{"type":"date","date":{"start":"2026-02-01T12:00:00.000Z"}}""")))
    val adapters = Map(
      "timeslices" -> new notion.Ingest.FakeNotionAdapter(tsDb, Seq(page)),
      "workflowStages" -> new notion.Ingest.FakeNotionAdapter(mkDb(Seq.empty), Seq.empty),
      "workflowDefinitions" -> new notion.Ingest.FakeNotionAdapter(mkDb(Seq.empty), Seq.empty))
    val routing = new notion.Ingest.NotionAdapter {
      def pick(id: String) = adapters(id.split(":")(0))
      def retrieveDatabase(id: String) = pick(id).retrieveDatabase(id)
      def queryDatabasePage(id: String, c: Option[String], n: Int) =
        pick(id).queryDatabasePage(id, c, n)
    }
    val env = Cli.Env(spark, NotionFixtures.cfg, runDate = "2026-08-12", log = _ => ())
    val counts = Cli.run(env, routing, dataDir, Map(
      "timeslices" -> "timeslices:db", "workflowStages" -> "workflowStages:db",
      "workflowDefinitions" -> "workflowDefinitions:db"))
    // raw landed (db record + page), canon written; missing wf -> excluded
    assert(new java.io.File(s"$dataDir/raw/timeslices/2026-08-12").exists())
    assert(counts("timeslices") == 0, "timeslice without workflow definition excluded")
    assert(counts("qualityIssues") == 1)
  }
}
