package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TF-IDF cosine similarity over word-bigram terms — the
  * lexical-similarity complement of the set-based dedup family
  * ([[Dedup.jaccardPairs]] weighs nothing; TF-IDF up-weights rare
  * terms), used for near-dup detection where shared RARE content should
  * dominate shared boilerplate.
  *
  * Everything stays in EXACT INTEGER arithmetic so the similarity
  * threshold decides identically on any engine (and run-to-run, under
  * any partitioning): idf is quantized to `round((ln((N+1)/(df+1))+1)
  * ·1000)` (smoothed sklearn idf, three fixed decimals), term weights
  * are `tf · idf_q` bigints, and `cosine ≥ pct/100` is evaluated as
  * `10000·dot² ≥ pct²·ssA·ssB` — no float sum ever reaches a
  * comparison. The comparison itself runs UNBOUNDED
  * ([[graft.functions.CosineGateQ]], BigInteger) and the norms/dot
  * accumulate in Decimal(38,0) with overflow-safe kernels: a LongType
  * `Σw²` wraps silently past 2⁶³ (w = tf·idf_q reaches ~1e7 on real
  * corpora, so ~1e5 terms suffice), and a Decimal(38,0) `10000·dot²`
  * NULLs past 38 digits in non-ANSI mode — both would silently drop
  * qualifying pairs at exactly the corpus scale this operator targets.
  * Weight bound for the exact fast path: |w| ≤ √Long.MaxValue ≈ 3.0e9
  * per term (beyond it the dot kernel switches to BigInteger products,
  * still exact).
  *
  * Scale shape (candidate-generation + verification, as everywhere in
  * the dedup family):
  *  - one shuffle builds (doc, term, tf), one term-keyed aggregate the
  *    df table (broadcast N is a 1-row cross);
  *  - candidates come ONLY from the df-capped inverted index
  *    (2 ≤ df ≤ maxDf): hot boilerplate terms never generate pairs, so
  *    candidate volume is Σ_capped df² — bounded by the cap, not the
  *    corpus;
  *  - verification joins the candidate pairs to per-doc sparse vectors
  *    (key-sorted `array<struct<k, w>>`, bounded by doc length) and
  *    computes the full dot in one [[graft.functions.SortedPairsDot]]
  *    merge walk per pair — the complete vectors, so the df cap only
  *    bounds WHO gets compared, never the similarity value itself.
  */
object TfIdf {

  /** (doc_id, term, tf) — word-bigram term frequencies. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(Dedup.shingles2(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Quantized smoothed idf: `round((ln((n+1)/(df+1)) + 1) · 1000)` as
    * a bigint — ≥ 1000 for every term, exactly reproducible in SQL. */
  private def idfQ(df: Column, n: Long): Column =
    round((log((lit(n) + lit(1.0)) / (df + lit(1.0))) + lit(1)) * lit(1000), 0)
      .cast("long")

  /** Weighted postings (doc_id, k = xxhash64(term), w = tf·idf_q, df).
    * The corpus count N resolves ONCE driver-side (for parquet a
    * metadata-only job) and inlines as a literal — the weighted-posting
    * subtree recurs in several plan branches (candidates + both vector
    * sides), and a 1-row N cross-broadcast would be re-planned per
    * branch. */
  def weightedPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.count()
    tf.join(dfs, Seq("term"))
      .select(col("doc_id"), xxhash64(col("term")).as("k"),
        (col("tf") * idfQ(col("df"), n)).as("w"), col("df"))
  }

  /** Per-doc sparse vector table: key-ascending array<struct<k, w>>
    * plus the squared norm Σw² — aggregated in Decimal(38,0), NOT
    * LongType: each w² fits a long only below |w| ≈ 3e9, and the SUM
    * wraps long silently well before that (~1e5 terms at w ≈ 1e7). */
  def docVectors(postings: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    postings.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("k"), col("w")))).as("vec"),
        sum(col("w").cast(dec) * col("w").cast(dec)).as("ss"))
  }

  /** Similar pairs with cosine ≥ thresholdPct/100: (doc_a, doc_b),
    * doc_a < doc_b. Exact — the df cap bounds candidate generation
    * only; similarity is computed over complete vectors. */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
                   thresholdPct: Int = 60, maxDf: Long = 20L): DataFrame = {
    require(thresholdPct >= 1 && thresholdPct <= 99,
      "thresholdPct must be in [1, 99]")
    graft.functions.VectorExpressions.ensureRegistered(docs.sparkSession)
    // the posting table feeds three branches (capped candidates + both
    // vector sides). Deliberately NOT cached: the pipeline is narrow
    // codegen'd column work off one parquet scan, and an A/B at sf0.1
    // showed materializing it costs more than the two recomputes —
    // unlike the PQ/quantize cases, no expensive expression risks
    // per-pair inlining here (the branches consume it through their
    // own aggregations)
    val w = weightedPostings(docs, idCol, textCol)
    val capped = w.filter(col("df").between(2, maxDf))
      .select(col("doc_id"), col("k"))
    val cand = capped.as("a").join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      // candidate-volume observability, the dedup-family convention:
      // distinct-sketch so AQE re-execution can't double-count
      .observe("tfidf_candidates",
        approx_count_distinct(xxhash64(col("doc_a"), col("doc_b")), 0.005)
          .as("n_pairs"))
    val vecs = docVectors(w)
    // dot is Decimal(38,0) (overflow-safe kernel); the threshold
    // decision runs in BigInteger — no 38-digit ceiling anywhere
    val dot = graft.functions.VectorExpressions
      .sortedPairsDot(col("va"), col("vb"))
    cand
      .join(vecs.select(col("doc_id").as("doc_a"), col("vec").as("va"),
        col("ss").as("ssa")), Seq("doc_a"))
      .join(vecs.select(col("doc_id").as("doc_b"), col("vec").as("vb"),
        col("ss").as("ssb")), Seq("doc_b"))
      .filter(graft.functions.VectorExpressions
        .cosineGate(dot, col("ssa"), col("ssb"), thresholdPct))
      .select(col("doc_a"), col("doc_b"))
  }
}
