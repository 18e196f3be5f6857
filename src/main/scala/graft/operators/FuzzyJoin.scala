package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching — the entity-resolution / record-linkage
  * primitive a large corpus pipeline runs to find near-identical names,
  * titles, or source labels (merge candidates) without an O(n²) compare.
  *
  * Classic blocking design: records only compare within a block (an
  * equality key — brand+size here, in practice a normalized prefix,
  * phonetic code, or sorted-token key), so the candidate set is
  * Σ_b |b|² instead of n². Edit distance verifies each candidate pair.
  *
  * Scale shape: the self-join is an equi-join on the block key — a hash
  * shuffle co-locating each block, never a cartesian (plan-asserted in
  * PlanSpec). The `maxBlockSize` guard drops oversized blocks BEFORE the
  * join, the same df-cap contract as Dedup's capped Jaccard mode: one
  * degenerate block key (empty name, 'unknown') would otherwise
  * contribute |b|² pairs and dominate the stage. Levenshtein runs only
  * on surviving candidates (codegen'd built-in, no UDF).
  */
object FuzzyJoin {

  /** All intra-block pairs (id_a < id_b) within edit distance `maxDist`.
    *
    * @param df           input records
    * @param idCol        unique record id (orders pairs, breaks ties)
    * @param nameCol      string compared by edit distance
    * @param blockCols    equality blocking key
    * @param maxDist      maximum Levenshtein distance (inclusive)
    * @param maxBlockSize blocks larger than this are skipped entirely
    *                     (boilerplate-guard: a degenerate key would
    *                     contribute quadratic candidates)
    * Output: (id_a, id_b, name_a, name_b, dist).
    */
  def fuzzySelfPairs(df: DataFrame, idCol: String, nameCol: String,
                     blockCols: Seq[String], maxDist: Int,
                     maxBlockSize: Int): DataFrame = {
    val bk = blockCols.map(col)
    val base = df.select((bk :+ col(idCol).as("_id") :+ col(nameCol).as("_nm")): _*)
    val sizes = base.groupBy(bk: _*)
      .agg(count(lit(1)).as("_bs"))
      .filter(col("_bs") <= maxBlockSize)
      .drop("_bs")
    val kept = base.join(sizes, blockCols) // inner: drops oversized blocks
    val left = kept.select((bk :+ col("_id").as("id_a") :+ col("_nm").as("name_a")): _*)
    val right = kept.select((bk :+ col("_id").as("id_b") :+ col("_nm").as("name_b")): _*)
    left.join(right, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }

  /** Column wrapper for the [[graft.functions.JaroWinkler]] codegen
    * expression — the transposition-tolerant, prefix-boosted scorer
    * for the verify stage of blocked entity resolution (levenshtein's
    * complement: length-normalized, typo-at-the-end friendly).
    * Requires a registered function (operator entry points call
    * `VectorExpressions.ensureRegistered`; extension-built sessions
    * have it already). */
  def jaroWinkler(a: org.apache.spark.sql.Column,
                  b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("jaro_winkler", a, b)
}
