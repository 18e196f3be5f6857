package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns for skew and co-location — the knobs that decide
  * whether a plan survives a 100× scale-up (builder brief: "salting for
  * skew, bucketing for co-located joins").
  *
  *  - saltedAgg: two-phase aggregation for skewed group keys. Phase 1
  *    aggregates (key, salt) partitions — hot keys fan out over `salt`
  *    reducers; phase 2 merges the per-salt partials. Only works for
  *    algebraic aggregates (sum/count/min/max); AQE's skew handling
  *    covers joins, but aggregation skew needs this.
  *  - saltedBroadcastableJoin: explicit salt column pair for joining a
  *    skewed fact key against a replicated dim when the dim side is too
  *    big to broadcast whole but small enough to replicate `salt` ways.
  *  - bucketedTable: write/read a bucketed table so repeated equi-joins
  *    and aggregations on the bucket key skip the shuffle entirely.
  */
object Scale {

  /** Two-phase salted count/sum over a skewed key.
    * Output: key, cnt, total (same as groupBy(key).agg(count, sum)). */
  def saltedAgg(df: DataFrame, key: String, valueCol: String,
                saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val partial = salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"))
    partial.groupBy(col(key))
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as("total"))
  }

  /** Salted equi-join: fact side gets a random salt in [0, n); the dim
    * side is replicated n× with every salt value. Join key becomes
    * (key, salt) — a hot fact key spreads over n reducers. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a bucketed+sorted table; later equi-joins/aggs on `key`
    * against tables bucketed the same way need no shuffle
    * (`spark.sql.sources.bucketing.enabled`, on by default). */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(tableName)
}
