package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface for the engine's time semantics
  * (SURVEY §2.7): the batch spine/occupancy/throughput operators
  * re-expressed as incremental queries. The reference simulates
  * time-series behavior batch-side; this is the streaming-native
  * equivalent for live event feeds.
  *
  * Design notes for scale:
  *  - watermarks bound state (late data beyond the watermark is the
  *    skip-and-count policy of derive/index.ts:470-478 — dropped, never
  *    failing);
  *  - distinct-user occupancy uses watermark + dropDuplicates (exact,
  *    bounded state) instead of COUNT(DISTINCT), which streaming
  *    aggregation cannot do;
  *  - output mode `update`/`append` works against any sink; tests use
  *    the memory sink with processAllAvailable().
  */
object EventStreams {

  /** Hourly distinct-user occupancy per event type over a streaming
    * event feed: the streaming analog of A6 (zero rows naturally absent).
    * Exact distinctness via dedup-within-watermark, then a windowed
    * count. */
  def hourlyOccupancy(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("frame_ts", date_trunc("hour", col("ts")))
      .dropDuplicates("frame_ts", "event_type", "user_id")
      .groupBy(col("frame_ts"), col("event_type"))
      .agg(count(lit(1)).as("item_count"))

  /** Daily entry counts per event type — streaming analog of A7's
    * entry side, with a tumbling 1-day window. */
  def dailyThroughput(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("entries"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("bucket_day"), col("event_type"),
        col("entries"), col("total_value"))
}
