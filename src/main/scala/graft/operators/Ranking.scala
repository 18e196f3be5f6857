package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus relevance ranking — BM25 (Robertson/Sparck Jones) for a
  * bag-of-terms query, the standard lexical scorer for retrieval and
  * training-data quality mining (find documents most relevant to a
  * probe query; mine hard negatives next to positives).
  *
  * Scale shape: one explode feeds both the document-length aggregate
  * and the term-frequency aggregate; the tf side is FILTERED to the
  * query's terms before it ever shuffles, so its volume is
  * |docs containing a query term| regardless of corpus width. The
  * per-term document frequencies and the 1-row corpus stats broadcast;
  * the only corpus-sized shuffle is the doc-length join on doc_id.
  * Top-k plans as TakeOrdered (no global sort materialization).
  */
object Ranking {

  /** BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), over documents
    * containing at least one query term. Scores round to 4 decimals;
    * ordering ties break on doc_id — fully deterministic and
    * reproducible in ANSI SQL (the DuckDB oracle runs the same
    * arithmetic). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("tok"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    // exact-integer sum / count: avgdl is bit-identical across engines
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("tok").isInCollection(queryTerms))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(dfT), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("s",
        col("idf") * col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id")).agg(round(sum(col("s")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Top-k frequent items via the space-saving sketch
    * ([[graft.functions.TopKFreq]]): one pass, one aggregation whose
    * shuffle moves at most `capacity` counters per partition — the
    * hot-token / hot-key detector that works when the distinct-item
    * space is too large for a full (item, count) aggregation. With
    * capacity ≥ distinct items the counts are exact and `err` = 0
    * (the oracle-gated mode); otherwise each count carries its
    * overestimate bound and total error ≤ n/capacity. Output:
    * (item, n, err) ordered (n desc, item asc). */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int,
                   capacity: Int): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(items.sparkSession)
    items
      .agg(graft.functions.VectorExpressions
        .topkFreq(col(itemCol), k, capacity).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.cnt").as("n"),
        col("e.err").as("err"))
  }
}
