package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK` — exact cosine top-k: queries × corpus join,
  *    per-query window. Correct baseline; the join is
  *    |queries|·|corpus| so at scale the query side must be small or
  *    blocked. Broadcast the query side: the corpus never shuffles.
  *  - `ivfTopK` — IVF-style: corpus pre-partitioned into cells
  *    (any coarse cluster id column); a query probes only its own cell.
  *    This is the 100 TB path: cell id as partition key → each probe
  *    touches one partition; recall trades off with nprobe.
  *
  * Deterministic: cosine is an order-stable left fold (Dedup.cosine),
  * ranks tie-break on neighbor id.
  */
object Similarity {

  /** Exact top-k neighbors for each query row (excluding self-matches).
    * Output: (query_id, rank, neighbor_id, cos). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("nq", sqrt(Dedup.dot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("nc", sqrt(Dedup.dot(col("cv"), col("cv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(Dedup.dot(col("qv"), col("cv")) / (col("nq") * col("nc")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF-style top-k: probe only the query's own cell (nprobe = 1).
    * `cellCol` is any coarse-quantizer assignment (cluster id, label,
    * LSH bucket). Output shape matches bruteForceTopK. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, cellCol: String, k: Int): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(cellCol).as("cell"))
      .withColumn("nq", sqrt(Dedup.dot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(cellCol).as("cell"))
      .withColumn("nc", sqrt(Dedup.dot(col("cv"), col("cv"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(q).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        round(Dedup.dot(col("qv"), col("cv")) / (col("nq") * col("nc")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
