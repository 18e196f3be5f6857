package graft.notion

import graft.notion.Ingest._
import graft.util.Retry

import scala.jdk.CollectionConverters._

/** Public Notion REST API surface (developers.notion.com; reference
  * src/ingress/notionAdapter.ts:36-69): response parsing shared by the
  * live HTTP adapter and the recorded-payload replay adapter, so an
  * offline run exercises the exact parse path a production pull uses.
  *
  * Jackson comes from the Spark runtime classpath — no extra
  * dependency.
  */
object NotionApi {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def optText(n: com.fasterxml.jackson.databind.JsonNode,
                      field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull)
      .map(v => if (v.isTextual) v.asText else v.toString)

  /** Property map → PropertyValue seq; rawValueJson is the whole
    * property node, which is what the raw envelope stores (the page
    * payload shape and the database schema shape both fit). */
  private def parseProperties(n: com.fasterxml.jackson.databind.JsonNode): Seq[PropertyValue] =
    Option(n.get("properties")).toSeq.flatMap { p =>
      p.fieldNames.asScala.toSeq.map { name =>
        val node = p.get(name)
        PropertyValue(name, optText(node, "id"), optText(node, "type"), node.toString)
      }
    }

  /** GET /v1/databases/:id response → DatabaseLike. */
  def parseDatabase(json: String): DatabaseLike = {
    val n = mapper.readTree(json)
    DatabaseLike(
      id = n.get("id").asText,
      lastEditedTime = optText(n, "last_edited_time"),
      url = optText(n, "url"),
      titleJson = Option(n.get("title")).filterNot(_.isNull).map(_.toString),
      properties = parseProperties(n))
  }

  /** POST /v1/databases/:id/query response → (pages, next_cursor). */
  def parseQueryResponse(json: String): (Seq[PageLike], Option[String]) = {
    val n = mapper.readTree(json)
    val pages = Option(n.get("results")).toSeq
      .flatMap(_.elements.asScala.toSeq)
      .map { r =>
        PageLike(
          id = r.get("id").asText,
          lastEditedTime = optText(r, "last_edited_time").getOrElse(""),
          createdTime = optText(r, "created_time"),
          url = optText(r, "url"),
          properties = parseProperties(r))
      }
    (pages, optText(n, "next_cursor"))
  }

  /** Minimal HTTP seam: (url, method, headers, body) →
    * (status, response headers, response body). Injectable so the
    * adapter is testable offline and the retry/throttle policy is
    * observable (I1/I2). */
  type Send = (String, String, Map[String, String], Option[String]) =>
    (Int, Map[String, String], String)

  /** Shared production HttpClient — ONE instance (each client owns a
    * selector thread + connection pool that JDK<21 cannot close), with a
    * connect timeout so a black-holed endpoint surfaces as an error the
    * retry policy can see instead of hanging forever. */
  private lazy val sharedClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .build()

  /** JDK HttpClient implementation of [[Send]] (production path). */
  lazy val jdkSend: Send = { (url, method, headers, body) =>
    val builder = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(60))
      .method(method, body match {
        case Some(b) => java.net.http.HttpRequest.BodyPublishers.ofString(b)
        case None => java.net.http.HttpRequest.BodyPublishers.noBody()
      })
    headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = sharedClient.send(builder.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    val respHeaders = resp.headers().map().asScala.toMap.map {
      case (k, vs) => k -> vs.asScala.mkString(",")
    }
    (resp.statusCode(), respHeaders, resp.body())
  }

  /** Live adapter over the public REST API. Wrap with
    * [[Ingest.throttled]] for the reference's 3 rps + retry policy. */
  final class NotionHttpAdapter(token: String, send: Send = jdkSend,
                                baseUrl: String = "https://api.notion.com",
                                notionVersion: String = "2022-06-28")
      extends NotionAdapter {

    private def headers = Map(
      "Authorization" -> s"Bearer $token",
      "Notion-Version" -> notionVersion,
      "Content-Type" -> "application/json")

    private def call(url: String, method: String, body: Option[String]): String = {
      val (status, respHeaders, respBody) = send(url, method, headers, body)
      if (status < 200 || status >= 300)
        throw Retry.HttpError(status, s"$method $url -> HTTP $status", respHeaders)
      respBody
    }

    def retrieveDatabase(databaseId: String): DatabaseLike =
      parseDatabase(call(s"$baseUrl/v1/databases/$databaseId", "GET", None))

    def queryDatabasePage(databaseId: String, startCursor: Option[String],
                          pageSize: Int): (Seq[PageLike], Option[String]) = {
      val cursor = startCursor
        .map(c => s""","start_cursor":${mapper.writeValueAsString(c)}""")
        .getOrElse("")
      val body = s"""{"page_size":$pageSize$cursor}"""
      parseQueryResponse(
        call(s"$baseUrl/v1/databases/$databaseId/query", "POST", Some(body)))
    }
  }

  /** Offline adapter replaying captured API responses from
    * `<dir>/<databaseId>.jsonl`: line 1 is the GET /v1/databases/:id
    * response, lines 2.. are successive query responses in pull order.
    * Cursors are the responses' own next_cursor values, so pagination
    * follows the recorded chain exactly as a live pull would. */
  final class RecordedNotionAdapter(dir: String) extends NotionAdapter {

    private def lines(databaseId: String): Seq[String] = {
      val p = java.nio.file.Paths.get(dir, s"$databaseId.jsonl")
      require(java.nio.file.Files.exists(p), s"No recorded payload at $p")
      java.nio.file.Files.readAllLines(p).asScala.toSeq.filter(_.trim.nonEmpty)
    }

    // memoized per database: a pull calls queryDatabasePage once per
    // recorded page, and re-reading + re-parsing the whole file each
    // call would make replay O(pages^2)
    private val parsedQueries =
      scala.collection.mutable.Map.empty[String, Seq[(Seq[PageLike], Option[String])]]
    private def queries(databaseId: String): Seq[(Seq[PageLike], Option[String])] =
      synchronized {
        parsedQueries.getOrElseUpdate(databaseId,
          lines(databaseId).tail.map(parseQueryResponse))
      }

    def retrieveDatabase(databaseId: String): DatabaseLike =
      parseDatabase(lines(databaseId).head)

    def queryDatabasePage(databaseId: String, startCursor: Option[String],
                          pageSize: Int): (Seq[PageLike], Option[String]) = {
      val responses = queries(databaseId)
      require(responses.nonEmpty, s"Recorded payload for $databaseId has no query responses")
      startCursor match {
        case None => responses.head
        case Some(c) =>
          // response i's next_cursor names response i+1
          responses.sliding(2).collectFirst {
            case Seq((_, Some(`c`)), next) => next
          }.getOrElse(throw new IllegalStateException(
            s"Recorded cursor '$c' not found for $databaseId"))
      }
    }
  }
}
