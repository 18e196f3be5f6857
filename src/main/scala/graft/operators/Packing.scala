package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: lay the corpus's chunks end to
  * end and slice the concatenation into fixed-capacity context windows
  * ("concat-then-slice" packing — chunks may straddle a window
  * boundary; training masks across the seam). Assignment is the chunk's
  * START offset in the concatenation: pack_id = ⌊offset / capacity⌋,
  * pack_offset = offset mod capacity.
  *
  * Scale shape: a GLOBAL running sum would serialize into one window
  * partition, so the corpus is sharded first (hash of the doc id) and
  * packed WITHIN shards — one window partition per shard, all shards in
  * parallel, which is exactly how real pipelines pack per output shard.
  * Output order inside a shard is (doc_id, chunk_idx): deterministic,
  * append-stable within a shard.
  */
object Packing {

  /** Pack (doc_id, chunk_idx, n_chunk_tokens) rows into capacity-token
    * windows per shard. Output adds (shard, offset, pack_id,
    * pack_offset). */
  def packChunks(chunks: DataFrame, capacity: Int, nShards: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(nShards > 0, "nShards must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id"), col("chunk_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("shard",
        pmod(graft.operators.Dedup.hash32(col("doc_id").cast("string")),
          lit(nShards)).cast("int"))
      .withColumn("offset",
        sum(col("n_chunk_tokens")).over(w) - col("n_chunk_tokens"))
      // integer floor-division on longs (offset is non-negative) — no
      // double-precision round-trip
      .withColumn("pack_id", expr(s"offset div $capacity"))
      .withColumn("pack_offset", (col("offset") % capacity).cast("int"))
  }

  /** Padding-aware LENGTH-BUCKETED inference batches: sort the corpus
    * by sequence length (ties on id), cut consecutive runs of
    * `batchSize` into batches — within a batch all lengths are close,
    * so padding-to-max waste collapses (the dynamic-batching trick
    * every serving stack uses; random batching pads every sequence to
    * the global tail). The global sort rank comes from
    * [[Ids.withSequentialIds]] — range sort + offset recovery, NO
    * single-task window — so the op holds at corpus scale. Output
    * adds `batch_id` (0-based); batches are deterministic and equal
    * to ROW_NUMBER-over-(length, id) bucketing, which is the oracle.
    */
  def lengthBucketedBatches(df: DataFrame, idCol: String, lenCol: String,
                            batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be >= 1")
    Ids.withSequentialIds(df, Seq(lenCol, idCol), "_lb_seq")
      .withColumn("batch_id",
        floor((col("_lb_seq") - 1) / batchSize).cast("long"))
      .drop("_lb_seq")
  }

  /** Per-batch padding accounting for [[lengthBucketedBatches]]:
    * padded cost = n·max(len), waste = n·max − Σlen — all exact
    * integers. The Σ over batches of `padding` is the tokens a
    * pad-to-longest serving loop would burn; compare against the same
    * stats on random batches to quantify the win. */
  def batchPaddingStats(batches: DataFrame, lenCol: String): DataFrame =
    batches.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_seqs"),
        max(col(lenCol)).as("max_len"),
        sum(col(lenCol)).as("sum_len"))
      .withColumn("padding",
        col("n_seqs") * col("max_len") - col("sum_len"))
}
