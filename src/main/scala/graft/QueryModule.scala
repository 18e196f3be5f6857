package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-verifiable queries.
  *
  * Contract (see SparkEntry): every query key maps to
  *  - a Spark program `(spark, sfDir) => DataFrame`, and
  *  - (where SQL-expressible) a DuckDB oracle SQL string over the same
  *    parquet tables, producing identical column names, types and values.
  *
  * Conventions for oracle parity:
  *  - every floating aggregate is rounded (ROUND(x, n)) on BOTH sides so
  *    summation-order ulps can't flip the hash;
  *  - integer aggregates are CAST(.. AS BIGINT) in the oracle (DuckDB
  *    SUM(int) is HUGEINT, COUNT is BIGINT; Spark is LongType);
  *  - no raw nanosecond timestamps in output (Spark reads parquet ns as
  *    µs); truncate to second/day or render as string first;
  *  - all computed columns aliased identically on both sides.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]
}
