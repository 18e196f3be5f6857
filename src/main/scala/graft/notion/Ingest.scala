package graft.notion

import graft.util.{Clock, RateLimiter, Retry, SystemClock}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1-S3 — driver-side Notion ingestion (src/ingress/notionAdapter.ts +
  * pullNotion.ts) behind an adapter trait: cursor-paginated full scans
  * (page_size 100) under the global 3 rps limiter and retry policy,
  * property re-keying by stable property ID, a synthetic database
  * record, and fail-fast envelope validation.
  *
  * HTTP never appears here — a production adapter implements
  * `NotionAdapter` over whatever client is available; tests and offline
  * runs use [[FakeNotionAdapter]] with recorded payloads. The pull
  * itself is driver-side by design (a rate-limited cursor API cannot
  * fan out); the resulting records parallelize the moment they become
  * a DataFrame. At real scale the upgrade path is a DataSourceV2
  * TableProvider with cursor-split readers (SURVEY §2.1 S1).
  */
object Ingest {

  /** One Notion property payload on a page or database schema:
    * (name, id, type, payload-as-JSON). */
  case class PropertyValue(name: String, id: Option[String], propType: Option[String],
                           rawValueJson: String)

  case class PageLike(id: String, lastEditedTime: String,
                      createdTime: Option[String], url: Option[String],
                      properties: Seq[PropertyValue])

  case class DatabaseLike(id: String, lastEditedTime: Option[String],
                          url: Option[String], titleJson: Option[String],
                          properties: Seq[PropertyValue])

  /** S1/S2 — the adapter surface (notionAdapter.ts:36-69). */
  trait NotionAdapter {
    def retrieveDatabase(databaseId: String): DatabaseLike
    /** One cursor page: (results, nextCursor). page_size is 100. */
    def queryDatabasePage(databaseId: String, startCursor: Option[String],
                          pageSize: Int): (Seq[PageLike], Option[String])
  }

  /** Cursor loop over the adapter (queryAllPages, notionAdapter.ts:44-69). */
  def queryAllPages(adapter: NotionAdapter, databaseId: String): Seq[PageLike] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[PageLike]
    var cursor: Option[String] = None
    var first = true
    while (first || cursor.isDefined) {
      first = false
      val (results, next) = adapter.queryDatabasePage(databaseId, cursor, 100)
      out ++= results
      cursor = next
    }
    out.toSeq
  }

  /** Wrap any adapter with the reference's throttling: global 3 rps
    * limiter around every call, each retried (5 retries, base 500 ms,
    * cap 8 s) — notionAdapter.ts:75-84. */
  def throttled(inner: NotionAdapter, clock: Clock = SystemClock,
                jitter: () => Long = () => scala.util.Random.nextInt(201).toLong): NotionAdapter =
    throttledWith(inner, new RateLimiter(3, clock), clock, jitter)

  /** [[throttled]] against a PROCESS-SHARED limiter: every DSv2
    * partition reader in one executor JVM drains the same 3 rps
    * budget, so concurrent per-database readers cannot multiply the
    * client's rate the way per-reader limiters would. (Across
    * executor PROCESSES the budget multiplies — the deployment
    * matches executors-per-token to the API contract, exactly as it
    * would scale any per-token client pool.) */
  def processThrottled(inner: NotionAdapter): NotionAdapter =
    throttledWith(inner, processLimiter, SystemClock,
      () => scala.util.Random.nextInt(201).toLong)

  private lazy val processLimiter = new RateLimiter(3, SystemClock)

  private def throttledWith(inner: NotionAdapter, limiter: RateLimiter,
                            clock: Clock,
                            jitter: () => Long): NotionAdapter =
    new NotionAdapter {
      private val opts = Retry.RetryOptions(maxRetries = 5, baseDelayMs = 500,
        retryAfterCapMs = Some(5 * 60 * 1000L),
        maxDelayMs = 8000)
      private def call[T](op: () => T): T =
        limiter.schedule(() => Retry.retry(opts, clock, jitter)(op))
      def retrieveDatabase(id: String): DatabaseLike = call(() => inner.retrieveDatabase(id))
      def queryDatabasePage(id: String, c: Option[String], n: Int): (Seq[PageLike], Option[String]) =
        call(() => inner.queryDatabasePage(id, c, n))
    }

  /** Raw record rows in the rawRecordSchema envelope shape. */
  case class RawPropertyRow(propertyId: String, propertyName: String,
                            propertyType: String, rawValue: String)
  case class RawRecordRow(source: String, entityType: String, databaseId: String,
                          pageId: Option[String], lastEditedTime: Option[String],
                          properties: Map[String, RawPropertyRow],
                          metadata: Map[String, String])

  private def validate(r: RawRecordRow): RawRecordRow = {
    // rawRecordSchema.parse analog (rawRecord.ts:9-18): fail fast on a
    // malformed envelope instead of propagating bad rows downstream.
    require(r.source.nonEmpty, "source must be non-empty")
    require(r.entityType == "database" || r.entityType == "page",
      s"entityType must be database|page, got '${r.entityType}'")
    require(r.databaseId.nonEmpty, "databaseId must be non-empty")
    r.properties.foreach { case (k, p) =>
      require(k.nonEmpty && p.propertyId.nonEmpty, "property ids must be non-empty")
    }
    r
  }

  /** S3, STREAMING form — the cursor walk as an iterator: the DB
    * schema record first, then page records in cursor order,
    * properties RE-KEYED BY PROPERTY ID via the schema's name→id map
    * (page payloads key by display name), each validated as it
    * streams. Memory held is ONE cursor page (100 rows) — this is
    * what lets [[graft.notion.GraftNotionProvider]]'s partition
    * readers ingest a database of any length without a driver-side
    * array ([[pullDataset]] keeps the materialized form for
    * driver-side callers). */
  def recordIterator(adapter: NotionAdapter, dataset: String,
                     databaseId: String): Iterator[RawRecordRow] = {
    val db = adapter.retrieveDatabase(databaseId)
    val nameToId: Map[String, (String, String)] = db.properties.map { p =>
      p.name -> (p.id.getOrElse(p.name), p.propType.getOrElse("unknown"))
    }.toMap

    val databaseRecord = RawRecordRow(
      source = "notion", entityType = "database", databaseId = databaseId,
      pageId = None, lastEditedTime = db.lastEditedTime,
      properties = db.properties.map { p =>
        val id = p.id.getOrElse(p.name)
        id -> RawPropertyRow(id, p.name, p.propType.getOrElse("unknown"), p.rawValueJson)
      }.toMap,
      metadata = Map("dataset" -> dataset) ++
        db.titleJson.map("title" -> _) ++ db.url.map("url" -> _))

    // one cursor page in flight at a time
    val pageChunks: Iterator[Seq[PageLike]] = new Iterator[Seq[PageLike]] {
      private var cursor: Option[String] = None
      private var first = true
      def hasNext: Boolean = first || cursor.isDefined
      def next(): Seq[PageLike] = {
        first = false
        val (results, nextCursor) = adapter.queryDatabasePage(databaseId, cursor, 100)
        cursor = nextCursor
        results
      }
    }
    val pageRecords = pageChunks.flatten.map { page =>
      RawRecordRow(
        source = "notion", entityType = "page", databaseId = databaseId,
        pageId = Some(page.id), lastEditedTime = Some(page.lastEditedTime),
        properties = page.properties.map { p =>
          val (id, tpe) = nameToId.getOrElse(p.name,
            (p.id.getOrElse(p.name), p.propType.getOrElse("unknown")))
          id -> RawPropertyRow(id, p.name, tpe, p.rawValueJson)
        }.toMap,
        metadata = Map("dataset" -> dataset) ++
          page.createdTime.map("created_time" -> _) ++ page.url.map("url" -> _))
    }
    (Iterator.single(databaseRecord) ++ pageRecords).map(validate)
  }

  /** S3 — pull one dataset (pullNotion.ts:67-107), materialized. */
  def pullDataset(adapter: NotionAdapter, dataset: String,
                  databaseId: String): Seq[RawRecordRow] =
    recordIterator(adapter, dataset, databaseId).toSeq

  /** One envelope record as a Row in [[NotionSchemas.rawRecordSchema]]
    * shape — shared by the driver-side [[toDataFrame]] and the DSv2
    * partition readers. */
  def rowOf(r: RawRecordRow): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(
      r.source, r.entityType, r.databaseId, r.pageId.orNull,
      r.lastEditedTime.orNull,
      r.properties.map { case (k, p) =>
        k -> org.apache.spark.sql.Row(
          p.propertyId, p.propertyName, p.propertyType, p.rawValue)
      },
      r.metadata)

  /** Pulled records → raw DataFrame in the rawRecordSchema envelope. */
  def toDataFrame(spark: SparkSession, records: Seq[RawRecordRow]): DataFrame = {
    val rows = records.map(rowOf)
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 5000)),
      NotionSchemas.rawRecordSchema)
  }

  /** Recorded-payload adapter for tests/offline runs; counts calls so
    * pagination and throttling are observable. */
  final class FakeNotionAdapter(db: DatabaseLike, pages: Seq[PageLike],
                                pageSize: Int = 100) extends NotionAdapter {
    var retrieveCalls = 0
    var queryCalls = 0
    def retrieveDatabase(databaseId: String): DatabaseLike = { retrieveCalls += 1; db }
    def queryDatabasePage(databaseId: String, startCursor: Option[String],
                          requested: Int): (Seq[PageLike], Option[String]) = {
      queryCalls += 1
      val start = startCursor.map(_.toInt).getOrElse(0)
      val slice = pages.slice(start, start + pageSize)
      val next = if (start + pageSize < pages.size) Some((start + pageSize).toString) else None
      (slice, next)
    }
  }
}
