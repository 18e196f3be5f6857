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

  /** ATOMIC greedy packing — the padding-based sibling of
    * [[packChunks]]: every document lands WHOLE in exactly one
    * fixed-capacity window (no straddling — the mode used when
    * cross-document attention or split documents are unacceptable),
    * bins filled greedily in first-fit-DECREASING order, the classic
    * near-optimal heuristic. The corpus is hashed into `nStreams`
    * independent packing streams; within a stream, docs in
    * (len DESC, id) order append to the current bin, and a doc that
    * would overflow `maxLen` opens the next bin. A single oversize
    * doc (> maxLen) gets its own bin — the caller's chunker should
    * have split it, but packing must not lose it.
    *
    * Scale shape: greedy packing is a NON-ASSOCIATIVE sequential fold
    * — no window trick computes it — so the parallelism grain is the
    * stream, exactly like [[packChunks]]'s shards and
    * [[graft.operators.Sampling.writeTrainingShards]]: one
    * constant-state pass per stream (a rare, justified
    * `mapPartitions` — O(1) state, no buffering; the no-UDF policy
    * concerns codegen-hostile per-ROW lambdas, not a per-partition
    * linear scan that has no declarative form), all streams in
    * parallel; size `nStreams` to the cluster. The per-stream rank is
    * a stream-partitioned window (bounded by the stream, the
    * [[packChunks]] precedent). Deterministic end to end: md5-salted
    * stream draw, total (len DESC, id) order.
    *
    * Output: input id column + (len, stream, rank, bin, offset) —
    * offset is the doc's start position inside its packed window;
    * per-(stream, bin): Σ len ≤ maxLen (single-oversize excepted),
    * offsets are the running sum, bins densely numbered from 0. */
  def packAtomic(df: DataFrame, idCol: String, lenCol: String,
                 maxLen: Long, nStreams: Int,
                 seed: String = "pack0"): DataFrame = {
    require(maxLen > 0, "maxLen must be positive")
    require(nStreams >= 1, "nStreams must be >= 1")
    val spark = df.sparkSession
    val ranked = df
      .select(col(idCol), col(lenCol).cast("long").as("len"))
      .withColumn("stream", pmod(Dedup.hash32(
        concat(col(idCol).cast("string"), lit("|"), lit(seed))),
        lit(nStreams.toLong)).cast("int"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("stream"))
          .orderBy(col("len").desc, col(idCol))).cast("long"))
    val outSchema = org.apache.spark.sql.types.StructType(
      ranked.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("offset",
          org.apache.spark.sql.types.LongType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(outSchema)
    val cap = maxLen
    ranked
      .repartition(nStreams, col("stream"))
      .sortWithinPartitions(col("stream"), col("rank"))
      .mapPartitions { it =>
        // constant-state greedy fold; state resets at stream changes
        // (hash partitioning may co-locate several streams)
        var cur = Int.MinValue
        var bin = -1L
        var rem = 0L
        it.map { r =>
          val stream = r.getInt(2)
          if (stream != cur) { cur = stream; bin = -1L; rem = 0L }
          val len = r.getLong(1)
          // the fit test is guarded on bin >= 0 so the FIRST doc of a
          // stream always opens bin 0 — without the guard a zero-length
          // head doc (len <= rem == 0 at stream start) would land with
          // bin = -1 and offset = maxLen, violating the dense-bins
          // contract (the oracle's recursive seed puts rank 1 in bin 0)
          val offset =
            if (bin >= 0L && len <= rem) { val o = cap - rem; rem -= len; o }
            else { bin += 1L; rem = cap - len; 0L } // oversize: rem < 0,
          // so the next doc never "fits" and correctly opens a new bin
          org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ Seq(bin, offset))
        }
      }
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
