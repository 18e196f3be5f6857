package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *  - `trainIvf`/`ivfSearchTopK` — a REAL learned coarse quantizer:
  *    seeded spherical k-means trained on a deterministic capped sample
  *    (the FAISS recipe — training cost is bounded regardless of corpus
  *    size), cell assignment as a pure Column expression (one map-side
  *    pass, no shuffle), and nprobe > 1 multi-cell probing with the
  *    recall/cost knob. With nprobe = nCells the probe is exhaustive and
  *    the result equals bruteForceTopK exactly (each corpus vector lives
  *    in exactly one cell), which is what makes the gated query
  *    oracle-checkable; recall at nprobe < nCells is spec-verified.
  *
  * Deterministic: cosine is an order-stable left fold (Dedup.cosine),
  * ranks tie-break on neighbor id, k-means init is hash-ordered.
  */
object Similarity {

  /** Unit-norm centroids of a spherical k-means coarse quantizer. */
  case class IvfModel(centroids: Vector[Array[Double]]) {
    def nCells: Int = centroids.size
  }

  /** Double-precision dot product for assignment expressions (float
    * corpus vector × double centroid literal). */
  private def ddot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def l2norm(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Seeded spherical k-means (Lloyd's) on a deterministic hash-ordered
    * sample of ≤ sampleCap vectors. The sample collects to the driver —
    * bounded memory regardless of corpus size — and iterations run
    * driver-side (nCells × dim × sampleCap flops per iter, trivial next
    * to one corpus scan). Empty cells keep their previous centroid. */
  def trainIvf(corpus: DataFrame, vecCol: String, nCells: Int,
               maxIters: Int = 5, seed: Long = 42L,
               sampleCap: Int = 65536): IvfModel = {
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).as("v"))
      .withColumn("_h", xxhash64(col("v"), lit(seed)))
      .orderBy(col("_h"))
      .limit(sampleCap)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .map(l2norm)
    require(sample.nonEmpty, "trainIvf: empty corpus")
    val dim = sample.head.length
    // init: the hash order is pseudo-random, so the first k distinct
    // vectors are a seeded random draw. Distinct BY CONTENT — Array
    // equality is reference equality, so distinct on Array[Double]
    // directly would be a no-op and duplicated vectors would seed
    // identical (dead) centroids.
    var cents: Vector[Array[Double]] =
      sample.map(_.toVector).distinct.take(nCells).toVector.map(_.toArray)
    require(cents.size == nCells,
      s"trainIvf: need >= $nCells distinct vectors, got ${cents.size}")
    (0 until maxIters).foreach { _ =>
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Long](nCells)
      sample.foreach { v =>
        var best = 0; var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < nCells) {
          var s = 0.0; var i = 0
          while (i < dim) { s += v(i) * cents(c)(i); i += 1 }
          if (s > bestSim) { bestSim = s; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else l2norm(sums(c))
      }
    }
    IvfModel(cents)
  }

  /** Persist a trained quantizer: one row per (cell, centroid vector).
    * The index a real deployment trains ONCE on a corpus sample and
    * re-reads for every ingest/search batch — training is the expensive
    * step; the model itself is nCells × dim doubles. */
  def saveIvf(spark: org.apache.spark.sql.SparkSession, model: IvfModel,
              path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a persisted quantizer; exact round-trip of [[saveIvf]]
    * (centroids are doubles — no re-quantization, so search results are
    * identical to the in-memory model's). */
  def loadIvf(spark: org.apache.spark.sql.SparkSession, path: String): IvfModel = {
    val rows = spark.read.parquet(path)
      .select(col("cell"), col("centroid")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    require(rows.nonEmpty && rows.map(_._1).toSeq == rows.indices,
      s"loadIvf: malformed model at $path")
    IvfModel(rows.map(_._2).toVector)
  }

  private def centroidsLit(model: IvfModel): Column =
    typedlit(model.centroids.map(_.toSeq))

  /** Nearest-centroid cell id (argmax cosine; the vector's own norm is a
    * positive scalar and cannot change the argmax). Pure expression —
    * assignment is a map-side pass, no shuffle, no UDF. */
  def cellExpr(vec: Column, model: IvfModel): Column = {
    val sims = transform(centroidsLit(model), c => ddot(vec, c))
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** The nprobe nearest cells for a query vector, nearest first (ties on
    * cell id). */
  def probeCellsExpr(vec: Column, model: IvfModel, nprobe: Int): Column = {
    val ranked = transform(centroidsLit(model),
      (c, i) => struct((-ddot(vec, c)).as("neg_sim"), i.as("cell")))
    transform(slice(array_sort(ranked), 1, nprobe), s => s.getField("cell"))
  }

  /** Shared scoring tail for every top-k variant: exclude self-matches,
    * cosine (null — never NaN — when either norm is zero, so zero
    * vectors can't outrank real neighbors: NaN sorts ABOVE every number
    * in a desc sort, nulls sort last and are dropped), per-query rank,
    * keep k. `pairs` carries (query_id, qv, nq, neighbor_id, cv, nc). */
  private def scoreTopK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        when(col("nq") > 0 && col("nc") > 0,
          round(Dedup.dot(col("qv"), col("cv")) / (col("nq") * col("nc")), 6)))
      .filter(col("cos").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  private def queriesSide(queries: DataFrame, idCol: String, vecCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("nq", sqrt(Dedup.dot(col("qv"), col("qv"))))

  private def corpusSide(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("nc", sqrt(Dedup.dot(col("cv"), col("cv"))))

  /** Query-side shaping for the cell-keyed probe joins. `broadcastQueries
    * = true` is the small-query contract (the corpus never shuffles);
    * with a corpus-proportional query set the caller passes `false` and
    * the probe becomes a plain equi-join on the cell key — both sides
    * shuffle by cell (bounded per-cell fan-out), and AQE is still free
    * to promote the query side back to a broadcast at runtime if its
    * actual size turns out small. Broadcasting an unbounded query set
    * is the driver/executor-OOM pattern this knob exists to avoid. */
  private def probeJoin(q: DataFrame, c: DataFrame,
                        broadcastQueries: Boolean): DataFrame =
    (if (broadcastQueries) broadcast(q) else q).join(c, Seq("cell"))

  /** IVF top-k with a learned quantizer: corpus assigned once (map-side),
    * query side exploded to its nprobe probe cells, join keyed on the
    * cell — only probed cells are scored. With `broadcastQueries` (the
    * default small-query contract) the corpus never shuffles; see
    * [[probeJoin]] for the large-query path. Output shape matches
    * bruteForceTopK. */
  def ivfSearchTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, model: IvfModel, k: Int, nprobe: Int,
                    broadcastQueries: Boolean = true): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    val q = queriesSide(queries, idCol, vecCol)
      .withColumn("cell", explode(probeCellsExpr(col("qv"), model, nprobe)))
    val c = corpusSide(corpus, idCol, vecCol)
      .withColumn("cell", cellExpr(col("cv"), model))
    scoreTopK(probeJoin(q, c, broadcastQueries), k)
  }

  /** Exact top-k neighbors for each query row (excluding self-matches).
    * The scoring join is |queries|·|corpus| with no key, so this operator
    * REQUIRES a bounded query set (its contract) — the query side always
    * broadcasts and the corpus never shuffles. A corpus-scale query set
    * has no exact sub-quadratic plan; route it through [[ivfSearchTopK]]
    * with `broadcastQueries = false` instead.
    * Output: (query_id, rank, neighbor_id, cos). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    scoreTopK(broadcast(queriesSide(queries, idCol, vecCol))
      .crossJoin(corpusSide(corpus, idCol, vecCol)), k)
  }

  /** IVF-style top-k: probe only the query's own cell (nprobe = 1).
    * `cellCol` is any coarse-quantizer assignment (cluster id, label,
    * LSH bucket). `broadcastQueries`: see [[probeJoin]]. Output shape
    * matches bruteForceTopK. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, cellCol: String, k: Int,
              broadcastQueries: Boolean = true): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(cellCol).as("cell"))
      .withColumn("nq", sqrt(Dedup.dot(col("qv"), col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(cellCol).as("cell"))
      .withColumn("nc", sqrt(Dedup.dot(col("cv"), col("cv"))))
    scoreTopK(probeJoin(q, c, broadcastQueries), k)
  }

  /** Per-group centroid cosine + outlier flag — the SemDeDup-style
    * pruning signal: vectors far from their cluster's mean direction are
    * out-of-distribution for the cluster (mislabeled, noise, or novel)
    * and are the first candidates for drop/review in embedding-space
    * curation. Output: (vec_id, label, cos_centroid, is_outlier) for
    * EVERY vector — the flag applies `cos_centroid < threshold` to the
    * rounded score.
    *
    * Determinism contract (what makes this oracle-checkable): vectors
    * are quantized to integers (⌊10⁶·x⌋ — exact and identical in any
    * IEEE engine), so the centroid numerator is an INTEGER sum — exact
    * and order-independent, immune to float reduction order, which a
    * plain `avg(float)` is not. The cosine itself is an order-stable
    * left fold over the quantized arrays.
    *
    * Scale shape: one posexplode (dim × n rows) into a (label, pos)
    * hash aggregate — algebraic, so map-side partial aggregation
    * collapses each partition to |labels|·dim rows before the shuffle
    * regardless of skew; the assembled |labels|-row centroid table
    * broadcasts; the scoring pass is map-side. The corpus never
    * shuffles. */
  def centroidOutliers(corpus: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, threshold: Double): DataFrame = {
    val Q = 1000000.0
    // cached: the centroid aggregation and the scoring join both consume
    // it, and Spark has no cross-branch CSE — without the cache the
    // corpus would be scanned and floor-quantized twice (the module
    // family's standard two-branch cache contract; the harness clears
    // caches between queries)
    val base = corpus.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
      transform(col(vecCol), x => floor(x.cast("double") * Q).cast("long"))
        .as("qv"))
      .cache()
    val inst = base
      .select(col("vec_id"), col("label"), posexplode(col("qv")))
      .select(col("label"), (col("pos") + 1).as("pos"), col("col").as("q"))
    val cent = inst.groupBy(col("label"), col("pos"))
      .agg((sum(col("q")).cast("double") / count(lit(1)) / Q).as("c"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cvec"))
      .withColumn("cnorm",
        sqrt(aggregate(col("cvec"), lit(0.0), (acc, c) => acc + c * c)))
    val v = transform(col("qv"), q => q.cast("double") / Q)
    val dotC = aggregate(zip_with(v, col("cvec"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val n2v = aggregate(v, lit(0.0), (acc, x) => acc + x * x)
    base.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        round(dotC / (sqrt(n2v) * col("cnorm")), 4).as("cos_centroid"))
      .withColumn("is_outlier", col("cos_centroid") < threshold)
  }

  // ---- product quantization (PQ) -----------------------------------

  /** Product-quantization codebooks: `m` subspaces, each with `k`
    * centroids of `dsub` dims. A corpus vector encodes to `m` small
    * codes (here one byte each) — at 100 TB the ANN candidate scan
    * reads m bytes/vector instead of 4·dim, and scoring a pair is an
    * m-entry table lookup instead of a dim-length dot product. */
  case class PqModel(codebooks: Vector[Vector[Array[Double]]]) {
    def m: Int = codebooks.size
    def k: Int = codebooks.head.size
    def dsub: Int = codebooks.head.head.length
    def dim: Int = m * dsub
  }

  /** Per-subspace L2 k-means (Lloyd's) on a deterministic hash-ordered
    * sample of ≤ sampleCap vectors — same bounded-training contract as
    * [[trainIvf]]: the sample collects to the driver, iterations are
    * driver-side, cost independent of corpus size. Vector dim must be
    * divisible by `m`. */
  def trainPq(corpus: DataFrame, vecCol: String, m: Int, k: Int,
              maxIters: Int = 8, seed: Long = 42L,
              sampleCap: Int = 65536): PqModel = {
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).as("v"))
      .withColumn("_h", xxhash64(col("v"), lit(seed)))
      .orderBy(col("_h"))
      .limit(sampleCap)
      .select(col("v"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.nonEmpty, "trainPq: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"trainPq: dim $dim not divisible by m=$m")
    val dsub = dim / m
    val books = (0 until m).map { j =>
      val subs = sample.map(v => v.slice(j * dsub, (j + 1) * dsub))
      // init: first k distinct subvectors in hash order (content equality)
      var cents: Vector[Array[Double]] =
        subs.map(_.toVector).distinct.take(k).toVector.map(_.toArray)
      require(cents.size == k,
        s"trainPq: subspace $j needs >= $k distinct subvectors, got ${cents.size}")
      (0 until maxIters).foreach { _ =>
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        subs.foreach { s =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < k) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = s(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += s(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old else sums(c).map(_ / counts(c))
        }
      }
      cents
    }.toVector
    PqModel(books)
  }

  private def pqBooksLit(model: PqModel): Column =
    typedlit(model.codebooks.map(_.map(_.toSeq)))

  /** PQ encoding as a pure Column expression — one map-side pass, no
    * shuffle, no UDF: per subspace, the L2-nearest centroid's index
    * (first index on ties — deterministic). Output: array<int>, length
    * m. Runs as the codegen kernel functions.PqEncode (codebooks ship
    * as a reference object, distances in element order — bit-identical
    * to the nested-HOF form it replaced, which paid m·k·dsub lambda
    * frames per row AND re-walked the codebook literal per element). */
  def pqEncodeExpr(vec: Column, model: PqModel): Column =
    graft.functions.VectorExpressions.pqEncode(vec, pqBooksLit(model))

  /** Asymmetric-distance (ADC) PQ top-k with exact rerank — the
    * production two-stage ANN shape:
    *
    *  1. SHORTLIST: each corpus vector is its m PQ codes; the query
    *     precomputes an m×k lookup table of subspace dot products, so
    *     scoring a candidate is m table lookups (vs dim multiplies) over
    *     m bytes of corpus state (vs 4·dim) — the approximate cosine
    *     uses the reconstruction's norm, also a table lookup. Top
    *     `candidates` per query survive.
    *  2. RERANK: the shortlist (|queries|·candidates rows, bounded)
    *     joins back to the float vectors by id and exact cosine picks
    *     the final top-k — output contract identical to
    *     [[bruteForceTopK]] (same rounding, same tie-break), recall
    *     governed by `candidates`.
    *
    * Scale shape: queries broadcast (bounded-query contract), the corpus
    * never shuffles in either stage; with `candidates` ≥ |corpus| the
    * shortlist is exhaustive and the result EQUALS bruteForceTopK
    * (spec-asserted), which is what certifies the rerank stage. */
  def pqSearchTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, model: PqModel, k: Int,
                   candidates: Int): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    // cache barrier: `codes` feeds both the reconstruction norm and
    // the per-pair ADC sum — un-materialized, CollapseProject inlines
    // the whole PQ-encode tree into the PAIR projection and every
    // corpus vector re-encodes |queries| times (the QuantizeI8 lesson)
    val pairs = broadcast(pqQuerySide(queries, idCol, vecCol, model))
      .crossJoin(pqCorpusSide(corpus, idCol, vecCol, model).cache())
    pqShortlistRerank(pairs, queries, corpus, idCol, vecCol, k, candidates)
  }

  /** IVF-PQ — the FAISS composition of the two quantizers: the coarse
    * quantizer prunes the search to the query's nprobe nearest cells
    * (an equi-join on the cell key — only probed cells are even read),
    * PQ codes ADC-score the survivors, and the bounded shortlist
    * reranks exactly. The 100 TB shape for corpus-scale ANN: per query
    * the scan touches nprobe/nCells of the corpus at m bytes per
    * vector, and the float vectors are read only for the shortlist.
    * With nprobe = nCells the cell join is exhaustive and the result
    * equals [[pqSearchTopK]] at the same candidate count
    * (spec-asserted). `broadcastQueries`: see [[probeJoin]]. */
  def ivfPqSearchTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                      vecCol: String, ivf: IvfModel, pq: PqModel, k: Int,
                      nprobe: Int, candidates: Int,
                      broadcastQueries: Boolean = true): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    val q = pqQuerySide(queries, idCol, vecCol, pq)
      .withColumn("cell", explode(probeCellsExpr(col("qv"), ivf, nprobe)))
    val c = pqCorpusSide(corpus, idCol, vecCol, pq)
      .withColumn("cell", cellExpr(col("cv"), ivf))
      .drop("cv")
      .cache() // same barrier as pqSearchTopK: encode once, not per pair
    val pairs = probeJoin(q, c, broadcastQueries)
    pqShortlistRerank(pairs, queries, corpus, idCol, vecCol, k, candidates)
  }

  /** Query side of an ADC scan: id, float vector + norm, and the m×k
    * table of subspace dot products the scoring lookups read. */
  private def pqQuerySide(queries: DataFrame, idCol: String, vecCol: String,
                          model: PqModel): DataFrame = {
    val dsub = model.dsub
    queriesSide(queries, idCol, vecCol)
      .withColumn("lut", transform(pqBooksLit(model), (book, j) =>
        transform(book, c =>
          ddot(slice(col("qv"), j * lit(dsub) + 1, lit(dsub)), c))))
  }

  /** Corpus side of an ADC scan: id, PQ codes, reconstruction norm
    * (a model-constant norm² table lookup — keeps `cv` only for cell
    * assignment; callers drop it). */
  private def pqCorpusSide(corpus: DataFrame, idCol: String, vecCol: String,
                           model: PqModel): DataFrame = {
    // centroid norm² table — a model constant, not per-query work
    val normsLit = typedlit(model.codebooks.map(_.map(c => c.map(x => x * x).sum)))
    corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("codes", pqEncodeExpr(col("cv"), model))
      .withColumn("nrec", sqrt(graft.functions.VectorExpressions
        .adcSum(col("codes"), normsLit)))
  }

  /** Shared PQ tail: ADC-score candidate pairs, keep `candidates` per
    * query, rerank the bounded shortlist exactly against the float
    * vectors ([[scoreTopK]] contract). */
  private def pqShortlistRerank(pairs: DataFrame, queries: DataFrame,
                                corpus: DataFrame, idCol: String,
                                vecCol: String, k: Int,
                                candidates: Int): DataFrame = {
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_cos").desc, col("neighbor_id").asc)
    val shortlist = pairs
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", graft.functions.VectorExpressions
        .adcSum(col("codes"), col("lut")))
      .filter(col("nq") > 0 && col("nrec") > 0)
      .withColumn("adc_cos", col("adc") / (col("nq") * col("nrec")))
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= candidates)
      .select(col("query_id"), col("neighbor_id"))
    // exact rerank: shortlist is bounded → broadcast onto the corpus
    val reranked = broadcast(shortlist
        .join(broadcast(queriesSide(queries, idCol, vecCol)), Seq("query_id")))
      .join(corpusSide(corpus, idCol, vecCol), Seq("neighbor_id"))
    scoreTopK(reranked, k)
  }

  /** Persist the PQ-ENCODED corpus — the ADC scan's entire read state
    * (id, m byte-ish codes, reconstruction norm, IVF cell), one row
    * per vector. At 100 TB this is the point of PQ: the shortlist
    * stage reads THIS table (m ints + a double per vector, cell-pruned
    * by parquet filter pushdown), never the float vectors — and a
    * streaming searcher must not re-encode the corpus per micro-batch,
    * which is exactly what an un-persisted encode pipeline does inside
    * `foreachBatch` (the per-batch cache is per-batch). The float
    * corpus table remains the rerank side only. */
  def saveEncodedCorpus(corpus: DataFrame, idCol: String, vecCol: String,
                        ivf: IvfModel, pq: PqModel, path: String): Unit = {
    graft.functions.VectorExpressions.ensureRegistered(corpus.sparkSession)
    pqCorpusSide(corpus, idCol, vecCol, pq)
      .withColumn("cell", cellExpr(col("cv"), ivf))
      .drop("cv")
      .write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveEncodedCorpus]] table, fail-fast validating the
    * code arity against the model that will score it (an encoded table
    * from a different PQ geometry would silently mis-score). */
  def loadEncodedCorpus(spark: org.apache.spark.sql.SparkSession,
                        path: String, pq: PqModel): DataFrame = {
    val df = spark.read.parquet(path)
    val head = df.select(size(col("codes"))).limit(1).collect()
    require(head.nonEmpty && head(0).getInt(0) == pq.m,
      s"encoded corpus at $path has code arity " +
        s"${head.headOption.map(_.getInt(0)).getOrElse(-1)}, model expects m=${pq.m}")
    df
  }

  /** [[ivfPqSearchTopK]] against a PERSISTED encoded corpus: identical
    * output contract (the encode is deterministic, so the stored codes
    * equal a fresh encode bit-for-bit — spec-asserted), but the
    * shortlist reads the m-int code table instead of encoding the
    * float corpus — no encode work, no cache barrier, cell pruning at
    * the scan. The per-micro-batch cost of a streaming searcher drops
    * to the query side only. */
  def ivfPqSearchTopKEncoded(queries: DataFrame, encoded: DataFrame,
                             corpus: DataFrame, idCol: String, vecCol: String,
                             ivf: IvfModel, pq: PqModel, k: Int, nprobe: Int,
                             candidates: Int,
                             broadcastQueries: Boolean = true): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    val q = pqQuerySide(queries, idCol, vecCol, pq)
      .withColumn("cell", explode(probeCellsExpr(col("qv"), ivf, nprobe)))
    val pairs = probeJoin(q, encoded, broadcastQueries)
    pqShortlistRerank(pairs, queries, corpus, idCol, vecCol, k, candidates)
  }

  /** Persist PQ codebooks: one row per (subspace, cell, centroid). */
  def savePq(spark: org.apache.spark.sql.SparkSession, model: PqModel,
             path: String): Unit = {
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, i) => (j, i, c.toSeq) }
    }.toDF("subspace", "cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Reload persisted codebooks; exact round-trip of [[savePq]]. */
  def loadPq(spark: org.apache.spark.sql.SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(path)
      .select(col("subspace"), col("cell"), col("centroid")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"loadPq: empty model at $path")
    val books = rows.groupBy(_._1).toVector.sortBy(_._1).map { case (j, rs) =>
      val cells = rs.sortBy(_._2)
      require(cells.map(_._2).toSeq == cells.indices, s"loadPq: subspace $j malformed")
      cells.map(_._3).toVector
    }
    require(rows.map(_._1).distinct.sorted.toSeq == books.indices,
      s"loadPq: malformed model at $path")
    PqModel(books)
  }

  /** Int8 scalar quantization of an embedding column — the 4× storage/
    * bandwidth cut a 100 TB embedding store takes before anything else
    * (a float32 corpus of 10¹¹ × 768-dim vectors is ~300 TB; int8 + one
    * float scale per vector is ~75 TB, and the ANN candidate stages
    * read the int8 form). Symmetric per-vector max-abs scaling:
    * scale = max|x|/127 (1.0 for an all-zero vector so dequantization
    * is well-defined), q_i = round(x_i/scale) ∈ [−127, 127]. All
    * arithmetic is codegen higher-order functions over the array — no
    * UDF, no shuffle; the quantization error contract is gated with a
    * DuckDB oracle (q_embedding_quant). */
  def quantizeInt8(df: DataFrame, vecCol: String, qCol: String = "q",
                   scaleCol: String = "q_scale"): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(df.sparkSession)
    val maxAbs = array_max(transform(col(vecCol), x => abs(x))).cast("double")
    // the quantized array comes from the one-pass codegen expression
    // (functions.QuantizeI8), byte-identical to the declarative
    // transform but opaque to CollapseProject — the declarative form
    // let the scale's array_max subtree inline INSIDE the element
    // lambda (O(dim²) per row) and pushdown then duplicated the whole
    // tree into every filter over the quantized vector
    df.withColumn(scaleCol,
        when(maxAbs.isNull || maxAbs === 0.0, lit(1.0))
          .otherwise(maxAbs / 127.0))
      .withColumn(qCol,
        graft.functions.VectorExpressions.quantizeI8(col(vecCol)))
  }

  /** Dequantized view of a [[quantizeInt8]] pair: x̂_i = q_i · scale. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Codegen int8 dot (functions.DotProductI8) — bit-identical to the
    * HOF `aggregate(zip_with(...))` form it replaced (exact integer
    * sum), minus the per-element lambda frames that dominated the
    * brute-force scoring pass. */
  private def intDot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotI8(a, b)

  /** Brute-force top-k over INT8-QUANTIZED vectors — the scoring pass a
    * quantized embedding store actually runs. The per-vector symmetric
    * scale cancels out of the cosine of two dequantized vectors
    * (cos(s_a·q_a, s_b·q_b) = Σq_a·q_b / (‖q_a‖·‖q_b‖)), so ranking
    * needs ONLY integer dot products over the int8 arrays: 4× less
    * scan bandwidth than float32 and bit-exact reproducible — integer
    * sums have no float reduction-order sensitivity, which is why this
    * gate's oracle is EXACT (the one final division is the same double
    * op in both engines). Zero vectors quantize to zero norm and are
    * excluded (cosine undefined). Same bounded-query contract and
    * output shape as [[bruteForceTopK]]. */
  def bruteForceTopKQuantized(queries: DataFrame, corpus: DataFrame,
                              idCol: String, vecCol: String, k: Int): DataFrame = {
    graft.functions.VectorExpressions.ensureRegistered(queries.sparkSession)
    def side(df: DataFrame, idAs: String, qAs: String, nAs: String) =
      quantizeInt8(df.select(col(idCol).as(idAs), col(vecCol).as("_v")),
        "_v", qCol = "_q")
        .select(col(idAs), col("_q").as(qAs))
        .withColumn(nAs, sqrt(intDot(col(qAs), col(qAs)).cast("double")))
        .filter(col(nAs) > 0.0)
    val q = side(queries, "query_id", "qq", "nq")
    // materialize the quantized corpus ONCE: without the cache barrier
    // Catalyst collapses the quantization transform upward into the
    // per-PAIR cosine projection (the norm filter keeps its own copy
    // below the join), re-quantizing every corpus vector |queries|
    // times — measured 2× on the sf0.1 brute-force pass
    val c = side(corpus, "neighbor_id", "qc", "nc").cache()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(intDot(col("qq"), col("qc")).cast("double") /
        (col("nq") * col("nc")), 6))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
