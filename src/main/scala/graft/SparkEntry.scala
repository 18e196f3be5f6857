package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{LlmOps, NotionParity, Relational, ScalarFuncs, TimeSeries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every QueryModule's driver-verifiable queries. Each query
  * name has a Spark program and (where SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {
  /** Registered query modules, in presentation order. */
  def modules: Seq[QueryModule] = Seq(
    Relational, TimeSeries, ScalarFuncs, LlmOps, NotionParity)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap
}
