package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for embedding / context-window pipelines: split
  * each document into overlapping fixed-size token windows — the
  * standard pre-processing step before embedding generation or
  * context-length-bounded training.
  *
  * Scale shape: pure per-row transformation (tokenize → window starts →
  * slice), one Generate per document with fan-out bounded by
  * ⌈n/stride⌉ — no shuffle, no state, stays in a single codegen stage
  * off the scan. The token array is materialized in the child
  * projection before the explode so the generator does not re-tokenize
  * per emitted chunk.
  */
object Chunking {

  /** Overlapping token windows of `chunkSize` tokens every
    * `chunkSize - overlap` tokens. Chunk k covers tokens
    * [k·stride, k·stride + chunkSize) (clamped to the document end); the
    * last chunk may be short, and every chunk is non-empty. Documents
    * with zero tokens emit no rows.
    *
    * Output: (doc_id, chunk_idx, chunk_text, n_chunk_tokens). */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize,
      "overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), col("n_tokens") - 1, lit(stride)),
          s => slice(col("toks"), s + 1, lit(chunkSize))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(col("chunk"), " ").as("chunk_text"),
        size(col("chunk")).as("n_chunk_tokens"))
  }
}
