package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
  * — the MOSS algorithm) and the verbatim-substring-overlap pairs built
  * from them: the scalable approximation of suffix-array substring dedup
  * ("does any long run of tokens appear verbatim in two documents?"),
  * which the Jaccard/MinHash family cannot answer — bag-of-shingles
  * similarity is blind to ORDER and CONTIGUITY.
  *
  * Method: hash every k-token gram of the document, slide a window of w
  * consecutive gram hashes, and keep the minimum hash of each window.
  * The kept set (the fingerprint) has density ~2/(w+1) of the gram
  * stream, yet any shared token run of length ≥ w + k − 1 is GUARANTEED
  * to contribute at least one identical fingerprint to both documents
  * (the window that ends the shared run selects the same minimum on both
  * sides) — so pairs sharing no fingerprint provably share no
  * (w+k−1)-token substring.
  *
  * Scale shape: the gram hash + window-min is one per-document window
  * (partitioned by doc, bounded by document length — no corpus-wide
  * sort); fingerprints are ~2/(w+1) of gram volume, and the pair join is
  * an inverted-index equi-join on the fingerprint value. Unlike word
  * bigrams, k-token grams (k ≥ 4) draw from a combinatorially large
  * space, so fingerprint document frequencies stay tiny (max df = 6 on
  * the sf0.1 corpus) and the join cannot go quadratic the way a
  * stop-word shingle join does. All hashing is md5-derived
  * ([[Dedup.hash32]]) — reproducible in ANSI SQL for the oracle.
  */
object Winnowing {

  /** One row per selected fingerprint: (doc_id, fp). A document
    * contributes fingerprints only where it has at least w full windows
    * (i.e. ≥ w + k − 1 tokens); shorter documents emit nothing — there
    * is no substring of guaranteed length to detect. Fingerprints are
    * distinct per doc (the same minimum often wins consecutive
    * windows — that is the densification winnowing removes). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val grams = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("wd"))
      .filter(size(col("wd")) >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(col("wd")) - (k - 1)),
          i => Dedup.hash32(array_join(slice(col("wd"), i, lit(k)), " ")))))
      // posexplode is 0-based; positions are 1-based in the window below
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("wmin", min(col("h")).over(win))
      .filter(col("pos") >= w) // full windows only
      .select(col("doc_id"), col("wmin").as("fp"))
      .distinct()
  }

  /** Pairs of documents sharing ≥ `minShared` winnowing fingerprints —
    * the verbatim-overlap candidate set, with the shared count as the
    * overlap strength. `minShared` ≥ 2 suppresses single-window hash
    * coincidences. Output: (doc_a, doc_b, n_shared).
    *
    * `maxDf` is the BOILERPLATE guard (the [[Dedup.jaccardPairs]] maxDf
    * convention): a fingerprint shared by d documents contributes
    * O(d²) join rows, and real corpora concentrate exactly such
    * fingerprints in template headers/footers shared by millions of
    * documents. With the cap, fingerprints with document frequency
    * > maxDf are excluded from pair generation — the overlap they
    * witness is boilerplate, not document-specific copying — bounding
    * the join at O(maxDf²) per fingerprint. The contract stays
    * engine-independent: a pair is emitted iff it shares ≥ minShared
    * fingerprints each with df ≤ maxDf (replicable in the oracle's
    * candidate CTE). None (the gated default on this boilerplate-free
    * corpus, max df = 6) changes nothing.
    *
    * The emitted pair count is observed as `winnow_pairs`
    * (re-execution-proof distinct sketch, cf. the dedup metrics). */
  def overlapPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4, minShared: Int = 2,
                   maxDf: Option[Long] = None): DataFrame = {
    // cached: the pair self-join consumes the fingerprint pipeline on
    // BOTH sides (and the capped branch adds the df aggregate as a third
    // consumer) — Spark has no cross-branch CSE, so without the cache
    // the gram explode + window-min would execute 2-4x per action
    val fpAll = fingerprints(docs, idCol, textCol, k, w).cache()
    val fp = maxDf match {
      case None => fpAll
      case Some(cap) =>
        val ok = fpAll.groupBy(col("fp")).agg(count(lit(1)).as("_df"))
          .filter(col("_df") <= cap).select(col("fp"))
        fpAll.join(ok, Seq("fp"), "left_semi").cache()
    }
    fp.select(col("doc_id").as("doc_a"), col("fp"))
      .join(fp.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      // distinct metric name per mode (the jaccard convention) so the
      // exact and capped gated queries are separately visible in the
      // same bench artifact
      .observe(if (maxDf.isEmpty) "winnow_pairs" else "winnow_capped_pairs",
        approx_count_distinct(xxhash64(col("doc_a"), col("doc_b")), 0.005)
          .as("n_pairs"))
  }
}
