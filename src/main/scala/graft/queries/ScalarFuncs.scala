package graft.queries

import graft.QueryModule
import graft.functions.Scalars
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-verifiable bindings of the scalar library (SURVEY §2.3) to the
  * synthetic tables. Each query is a pure projection — Catalyst collapses
  * it into the parquet scan (check `ReadSchema` for pruning) and the whole
  * pipeline stays in one WholeStageCodegen span.
  */
object ScalarFuncs extends QueryModule {

  /** P12/P14/P15 — identity normalization family over customer. */
  def qScalarIds(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      Scalars.stableEntityId("customer", col("c_name")).as("sid"),
      Scalars.normalizeNullableString(col("c_mktsegment")).as("seg"),
      Scalars.sortKey(col("c_name"), col("c_mktsegment")).as("sort_key"))
      .orderBy(col("c_custkey"))

  /** P16/P29 — sha256 digest + deterministic color assignment over part. */
  def qScalarHash(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey"),
      Scalars.sha256Hex(col("p_name")).as("h"),
      Scalars.colorIndex(col("p_name")).as("color_idx"),
      Scalars.colorHex(col("p_name")).as("color"))
      .orderBy(col("p_partkey"))

  /** P19/P20/P23/P24 — timestamp rendering family over events (UTC
    * serials + America/Los_Angeles calendar semantics across a DST
    * boundary: the sf0.01 range spans 2024-03-10). */
  def qScalarTime(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      Scalars.oleSerial(col("ts")).as("ole_serial"),
      Scalars.isoUtc(col("ts")).as("iso_utc"),
      Scalars.laDayIso(col("ts")).as("la_day_iso"),
      Scalars.laLabel(col("ts")).as("la_label"))
      .orderBy(col("event_id"))

  /** P18/P21/P28 — UUID recovery + stage-number normalization over part.
    * Source strings are derived from md5(p_name): full compact form,
    * pre-hyphenated form, or a non-matching plain name. */
  def qScalarUuid(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(col("p_name"))
    val hyph = concat_ws("-",
      substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
    val src = when(col("p_size") > 33, h)
      .when(col("p_size") > 15, hyph)
      .otherwise(col("p_name"))
    Tables.part(spark, dir).select(
      col("p_partkey"),
      src.as("src"),
      Scalars.toUuidMaybe(src).as("uuid"),
      Scalars.normalizeStageNumber(col("p_retailprice") / 100).as("stage_num"),
      Scalars.pad2(col("p_size")).as("pad"))
      .orderBy(col("p_partkey"))
  }

  /** P2/P10-analog — JSON payload extraction with type dispatch over
    * events.props (`from_json` into a typed struct, P9-style CASE). */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val k = from_json(col("props"), org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.IntegerType)))).getField("k")
    Tables.events(spark, dir).select(
      col("event_id"),
      k.as("k"),
      when(k.isNull, "none").when(k % 2 === 0, "even").otherwise("odd").as("k_kind"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scalar_ids"  -> qScalarIds _,
    "q_scalar_hash" -> qScalarHash _,
    "q_scalar_time" -> qScalarTime _,
    "q_scalar_uuid" -> qScalarUuid _,
    "q_json_extract"-> qJsonExtract _)

  /** DuckDB hex→int of the first 8 sha256 hex digits (DuckDB has no
    * base-conv function; position-weighted strpos sum). */
  private val duckHexInt: String = {
    val weights = Seq(268435456L, 16777216L, 1048576L, 65536L, 4096L, 256L, 16L, 1L)
    weights.zipWithIndex.map { case (w, i) =>
      s"(strpos('0123456789abcdef', substr(h, ${i + 1}, 1)) - 1) * $w"
    }.mkString(" + ")
  }

  private val duckPalette: String =
    Scalars.Palette.map(c => s"'$c'").mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    "q_scalar_ids" ->
      """SELECT c_custkey,
        |  CASE WHEN c_name IS NULL THEN 'customer_unknown'
        |       ELSE 'customer_' || lower(replace(c_name, '-', '')) END AS sid,
        |  nullif(trim(c_mktsegment), '') AS seg,
        |  lower(concat_ws('|', COALESCE(trim(c_name), ''),
        |                       COALESCE(trim(c_mktsegment), ''))) AS sort_key
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scalar_hash" ->
      s"""SELECT p_partkey, h,
         |  CAST(($duckHexInt) % 36 AS INT) AS color_idx,
         |  ($duckPalette)[CAST(($duckHexInt) % 36 AS INT) + 1] AS color
         |FROM (SELECT p_partkey, sha256(p_name) AS h FROM part)
         |ORDER BY p_partkey""".stripMargin,
    "q_scalar_time" ->
      """SELECT event_id,
        |  (epoch_ms(CAST(ts AS TIMESTAMP)) + 2209161600000) / 86400000.0 AS ole_serial,
        |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%S.%gZ') AS iso_utc,
        |  strftime((CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
        |             AT TIME ZONE 'America/Los_Angeles',
        |           '%Y-%m-%dT00:00:00.000Z') AS la_day_iso,
        |  strftime((CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC')
        |             AT TIME ZONE 'America/Los_Angeles',
        |           '%Y-%m-%d %H:%M') AS la_label
        |FROM events ORDER BY event_id""".stripMargin,
    "q_scalar_uuid" ->
      """WITH b AS (SELECT p_partkey, p_size, p_retailprice, md5(p_name) AS h, p_name FROM part),
        |s AS (SELECT p_partkey, p_size, p_retailprice,
        |  CASE WHEN p_size > 33 THEN h
        |       WHEN p_size > 15 THEN substr(h,1,8) || '-' || substr(h,9,4) || '-' ||
        |            substr(h,13,4) || '-' || substr(h,17,4) || '-' || substr(h,21,12)
        |       ELSE p_name END AS src
        |  FROM b),
        |e AS (SELECT p_partkey, p_size, p_retailprice, src,
        |  regexp_extract(lower(src),
        |    '([0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12})', 1) AS hy,
        |  regexp_extract(lower(src), '([0-9a-f]{32})', 1) AS cp
        |  FROM s)
        |SELECT p_partkey, src,
        |  CASE
        |    WHEN hy <> '' THEN hy
        |    WHEN cp <> '' THEN substr(cp,1,8) || '-' || substr(cp,9,4) || '-' ||
        |         substr(cp,13,4) || '-' || substr(cp,17,4) || '-' || substr(cp,21,12)
        |    ELSE NULL END AS uuid,
        |  GREATEST(CAST(1 AS BIGINT),
        |           CAST(ROUND(p_retailprice / 100) AS BIGINT)) AS stage_num,
        |  lpad(CAST(p_size AS VARCHAR), 2, '0') AS pad
        |FROM e ORDER BY p_partkey""".stripMargin,
    "q_json_extract" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 'none'
        |       WHEN CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0 THEN 'even'
        |       ELSE 'odd' END AS k_kind
        |FROM events ORDER BY event_id""".stripMargin)
}
