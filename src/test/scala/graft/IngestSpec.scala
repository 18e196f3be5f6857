package graft

import graft.notion.Ingest
import graft.util.LogicalClock
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {
  import TestSpark._

  private def mkPages(n: Int): Seq[Ingest.PageLike] = (0 until n).map { i =>
    Ingest.PageLike(
      id = f"page-$i%04d", lastEditedTime = "2026-02-01T12:10:00.000Z",
      createdTime = Some("2026-02-01T12:00:00.000Z"), url = Some(s"https://notion.so/$i"),
      properties = Seq(
        Ingest.PropertyValue("Started", None, None,
          """{"type":"date","date":{"start":"2026-02-01T12:00:00.000Z"}}"""),
        Ingest.PropertyValue("Title", None, None,
          s"""{"type":"title","title":[{"plain_text":"Page $i"}]}""")))
  }

  private val db = Ingest.DatabaseLike(
    id = "db-1", lastEditedTime = Some("2026-02-01T00:00:00.000Z"),
    url = Some("https://notion.so/db-1"), titleJson = Some("\"Timeslices\""),
    properties = Seq(
      Ingest.PropertyValue("Started", Some("w%5Czt"), Some("date"), """{"id":"w%5Czt","type":"date"}"""),
      Ingest.PropertyValue("Title", Some("title"), Some("title"), """{"id":"title","type":"title"}""")))

  test("pull re-keys page properties by schema property ID, adds the database record") {
    val adapter = new Ingest.FakeNotionAdapter(db, mkPages(3))
    val records = Ingest.pullDataset(adapter, "timeslices", "db-1")
    assert(records.size == 4)
    assert(records.head.entityType == "database" && records.head.pageId.isEmpty)
    val page = records(1)
    assert(page.properties.contains("w%5Czt"), "page property keyed by schema id, not name")
    assert(page.properties("w%5Czt").propertyName == "Started")
    assert(page.properties("w%5Czt").propertyType == "date")
    assert(page.metadata("dataset") == "timeslices")
  }

  test("cursor pagination walks all pages in page_size batches") {
    val adapter = new Ingest.FakeNotionAdapter(db, mkPages(250))
    val records = Ingest.pullDataset(adapter, "timeslices", "db-1")
    assert(records.size == 251)
    assert(adapter.queryCalls == 3, "250 pages at page_size 100 → 3 cursor calls")
  }

  test("throttled adapter spaces calls at 3 rps and retries through 429s") {
    val clock = new LogicalClock
    val flaky = new Ingest.NotionAdapter {
      val inner = new Ingest.FakeNotionAdapter(db, mkPages(150))
      var failedOnce = false
      def retrieveDatabase(id: String): Ingest.DatabaseLike = inner.retrieveDatabase(id)
      def queryDatabasePage(id: String, c: Option[String], n: Int) = {
        if (!failedOnce) {
          failedOnce = true
          throw Retry.HttpError(429, "throttle", Map("retry-after" -> "2"))
        }
        inner.queryDatabasePage(id, c, n)
      }
    }
    val records = Ingest.pullDataset(Ingest.throttled(flaky, clock, () => 0L),
      "timeslices", "db-1")
    assert(records.size == 151, "429 retried transparently")
    // limiter spaces the first query 334ms after retrieve; the 429 retry
    // sleeps its 2000ms retry-after; the 2s already exceeds the next
    // 334ms spacing window (start-time spacing, like Bottleneck)
    assert(clock.sleeps.toSeq == Seq(334L, 2000L), s"sleeps: ${clock.sleeps}")
  }

  test("pulled records flow into the normalize pipeline as a DataFrame") {
    val adapter = new Ingest.FakeNotionAdapter(db, mkPages(5))
    val raw = Ingest.toDataFrame(spark,
      Ingest.pullDataset(adapter, "timeslices", "db-1"))
    assert(raw.count() == 6)
    val pages = notion.Normalize.pageRecords(raw)
    assert(pages.count() == 5, "database record filtered by P1")
    // the configured started-at property id resolves post-re-keying
    import org.apache.spark.sql.functions._
    val started = pages.select(
      notion.NotionExtract.dateStart(notion.NotionExtract.parsed(
        element_at(col("properties"), "w%5Czt").getField("rawValue"))).as("s"))
      .collect().map(_.getString(0))
    assert(started.forall(_ == "2026-02-01T12:00:00.000Z"))
  }

  test("envelope validation fails fast on malformed records") {
    val badDb = db.copy(id = "db-1")
    val adapter = new Ingest.FakeNotionAdapter(badDb, Seq(
      Ingest.PageLike("p1", "2026-01-01T00:00:00Z", None, None, Nil)))
    // sabotage: blank databaseId at the pull boundary
    val e = intercept[IllegalArgumentException] {
      Ingest.pullDataset(adapter, "timeslices", "")
    }
    assert(e.getMessage.contains("databaseId"))
  }

  private object Retry { // local alias to keep imports tidy
    val HttpError = graft.util.Retry.HttpError
  }

  test("DSv2 ingest (format graft-notion) row-equals the driver pull; one cursor stream per dataset") {
    val viaSource = spark.read.format("graft-notion")
      .option("datasets", "timeslices:db-1,clients:db-2")
      .option("adapterFactory", classOf[IngestSpecFixtureFactory].getName)
      .load()
    // one partition per dataset: the cursor chain is sequential inside
    // a database; parallelism is across databases
    assert(viaSource.rdd.getNumPartitions == 2)
    val fixture = new IngestSpecFixtureFactory
    val viaDriver = Ingest.toDataFrame(spark,
      Ingest.pullDataset(fixture.create(), "timeslices", "db-1") ++
        Ingest.pullDataset(fixture.create(), "clients", "db-2"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("databaseId", "entityType", "pageId")
      .collect().toSeq
    assert(rows(viaSource) == rows(viaDriver),
      "the DSv2 pull must be row-identical to the driver-side pull")
    // both datasets pulled: 2 database records + 230 pages each
    assert(viaSource.count() == 2 + 2 * 230)
  }
}

/** Executor-instantiable fixture factory for the DSv2 ingest path —
  * resolved by class name on the reader side, exactly how a real
  * deployment injects its HTTP adapter. 230 pages → a 3-chunk cursor
  * walk per dataset (the fake serves any database id). */
class IngestSpecFixtureFactory extends graft.notion.NotionAdapterFactory {
  import graft.notion.Ingest
  private def pages: Seq[Ingest.PageLike] = (0 until 230).map { i =>
    Ingest.PageLike(
      id = f"page-$i%04d", lastEditedTime = "2026-02-01T12:10:00.000Z",
      createdTime = Some("2026-02-01T12:00:00.000Z"),
      url = Some(s"https://notion.so/$i"),
      properties = Seq(
        Ingest.PropertyValue("Started", None, None,
          """{"type":"date","date":{"start":"2026-02-01T12:00:00.000Z"}}"""),
        Ingest.PropertyValue("Title", None, None,
          s"""{"type":"title","title":[{"plain_text":"Page $i"}]}""")))
  }
  private def db: Ingest.DatabaseLike = Ingest.DatabaseLike(
    id = "db-1", lastEditedTime = Some("2026-02-01T00:00:00.000Z"),
    url = Some("https://notion.so/db-1"), titleJson = Some("\"Timeslices\""),
    properties = Seq(
      Ingest.PropertyValue("Started", Some("w%5Czt"), Some("date"),
        """{"id":"w%5Czt","type":"date"}"""),
      Ingest.PropertyValue("Title", Some("title"), Some("title"),
        """{"id":"title","type":"title"}""")))
  override def create(): Ingest.NotionAdapter =
    new Ingest.FakeNotionAdapter(db, pages)
}
