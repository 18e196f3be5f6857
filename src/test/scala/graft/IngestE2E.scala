package graft
/** Consumer-style drive: pull (throttled fake adapter) → DataFrame →
  * normalize → canon counts, through public exports only. */
object IngestE2E {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import graft.notion._
    val db = Ingest.DatabaseLike("db-1", Some("2026-02-01T00:00:00Z"), None, None,
      Seq(Ingest.PropertyValue("Started", Some("start_date"), Some("date"), "{}"),
          Ingest.PropertyValue("Ended", Some("end_date"), Some("date"), "{}"),
          Ingest.PropertyValue("Name", Some("title_prop"), Some("title"), "{}")))
    val pages = (0 until 230).map { i =>
      Ingest.PageLike(f"abcdef$i%026d", "2026-02-01T12:10:00.000Z", None, None, Seq(
        Ingest.PropertyValue("Started", None, None,
          """{"type":"date","date":{"start":"2026-02-01T12:00:00.000Z"}}"""),
        Ingest.PropertyValue("Ended", None, None,
          """{"type":"date","date":{"start":"2026-02-01T12:05:00.000Z"}}"""),
        Ingest.PropertyValue("Name", None, None,
          s"""{"type":"title","title":[{"plain_text":"Slice $i"}]}""")))
    }
    val clock = new graft.util.LogicalClock
    val adapter = Ingest.throttled(new Ingest.FakeNotionAdapter(db, pages), clock, () => 0L)
    val records = Ingest.pullDataset(adapter, "timeslices", "db-1")
    println(s"PULLED ${records.size} records, throttle slept ${clock.sleeps.sum}ms over ${clock.sleeps.size} waits")
    val raw = Ingest.toDataFrame(spark, records)
    val ts = Normalize.timeslices(raw, NotionFixtures.cfg)
    val withDur = ts.filter(org.apache.spark.sql.functions.col("duration_seconds") === 300)
    println(s"NORMALIZED ${ts.count()} timeslices, ${withDur.count()} with duration 300s")
    ts.select("timeslice_id", "started_at", "duration_seconds", "page_title").show(2, false)
    // the same pull through the DSv2 source: executor-side cursor
    // streaming, process-shared throttling — must be row-identical
    val viaSource = spark.read.format("graft-notion")
      .option("datasets", "timeslices:db-1")
      .option("adapterFactory", classOf[IngestE2EFactory].getName)
      .load()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("databaseId", "entityType", "pageId").collect().toSeq
    val equal = rows(viaSource) == rows(raw)
    println(s"DSV2 ${viaSource.count()} records via format(graft-notion), " +
      s"row-identical to driver pull: $equal")
    require(equal, "DSv2 ingest diverged from the driver-side pull")
  }
}

/** Executor-instantiable factory reproducing IngestE2E's fixture for
  * the DSv2 path. */
class IngestE2EFactory extends graft.notion.NotionAdapterFactory {
  import graft.notion.Ingest
  override def create(): Ingest.NotionAdapter = {
    val db = Ingest.DatabaseLike("db-1", Some("2026-02-01T00:00:00Z"), None, None,
      Seq(Ingest.PropertyValue("Started", Some("start_date"), Some("date"), "{}"),
        Ingest.PropertyValue("Ended", Some("end_date"), Some("date"), "{}"),
        Ingest.PropertyValue("Name", Some("title_prop"), Some("title"), "{}")))
    val pages = (0 until 230).map { i =>
      Ingest.PageLike(f"abcdef$i%026d", "2026-02-01T12:10:00.000Z", None, None, Seq(
        Ingest.PropertyValue("Started", None, None,
          """{"type":"date","date":{"start":"2026-02-01T12:00:00.000Z"}}"""),
        Ingest.PropertyValue("Ended", None, None,
          """{"type":"date","date":{"start":"2026-02-01T12:05:00.000Z"}}"""),
        Ingest.PropertyValue("Name", None, None,
          s"""{"type":"title","title":[{"plain_text":"Slice $i"}]}""")))
    }
    new Ingest.FakeNotionAdapter(db, pages)
  }
}
