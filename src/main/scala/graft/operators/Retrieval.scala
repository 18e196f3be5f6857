package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — combine the ranked outputs of
  * heterogeneous retrievers (lexical BM25, embedding ANN, …) into one
  * list without score calibration. Reciprocal-rank fusion (Cormack,
  * Clarke & Büttcher, SIGIR'09) uses only each document's RANK in each
  * list, so scorers with incomparable score scales (BM25 log-idf sums
  * vs cosine in [−1, 1]) fuse without per-list normalization — the
  * standard first-stage combiner in RAG / retrieval pipelines.
  *
  * Scale shape: the inputs are already top-k lists (each retriever has
  * its own sub-quadratic plan — TakeOrdered for BM25, banded/IVF probes
  * for ANN), so fusion runs over ≤ Σ|lists| ≈ n_retrievers·k candidate
  * rows regardless of corpus size. The groupBy shuffles only those
  * candidate rows, and the final ordinal window runs over a
  * candidate-bounded single partition — bounded by construction, never
  * corpus-sized (cf. the same argument at Sampling.rebalanceToMix).
  */
object Retrieval {

  /** Fuse named rank lists by reciprocal rank.
    *
    * Each input must carry `idCol` and an integer `rank` column
    * (1-based, dense within the list — the retrievers' row_number).
    * score(d) = Σ_lists 1/(k + rank_l(d)), rounded to 6 decimals
    * BEFORE the fused ordinal so the cross-engine tie-break is on the
    * rounded value (ties then break on id: fully deterministic).
    * With ≤ 2 lists the double sum has one order, so the rounding is
    * belt-and-braces; at ≥ 3 lists it is what keeps the fused ranking
    * reproducible under Spark's unordered aggregation.
    *
    * @return (idCol, rrf_score, n_lists, fused_rank), fused_rank ≤ topK
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String,
              k: Int = 60, topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one rank list")
    require(k >= 1 && topK >= 1, "k and topK must be positive")
    val candidates = rankings
      .map(_.select(col(idCol), col("rank")))
      .reduce(_ unionByName _)
    val byScore = Window.orderBy(col("rrf_score").desc, col(idCol).asc)
    candidates
      .groupBy(col(idCol))
      .agg(
        round(sum(lit(1.0) / (lit(k) + col("rank"))), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .withColumn("fused_rank", row_number().over(byScore))
      .filter(col("fused_rank") <= topK)
  }
}
