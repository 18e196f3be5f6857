package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data
  * pipelines. `df.sample()` is seed-dependent on PARTITIONING (a
  * repartition changes the rows drawn), which silently breaks
  * train/test hygiene at scale — these operators hash the row's stable
  * id instead, so membership is a pure function of the id: reshuffles,
  * retries and re-runs all agree, rows added later never move existing
  * rows between splits, and the assignment is reproducible in ANSI SQL
  * (md5-based, oracle-checkable).
  */
object Sampling {

  /** Uniform [0, 1) value from a stable id: first 8 md5 hex digits over
    * 2^32 (exact in double — the numerator is an integer < 2^32). */
  def hashUnit(id: Column): Column =
    Dedup.hash32(id.cast("string")) / lit(4294967296.0)

  /** The canonical stratum-salted hash input, `id|stratum` — ONE
    * definition shared by every stratified operator so the salt format
    * cannot drift between operators or from the DuckDB oracles'
    * `md5(CAST(id AS VARCHAR) || '|' || stratum)`. A NULL stratum
    * salts as NUL (a value no real stratum string contains), so
    * NULL-stratum rows get a real hash and sample as their own
    * stratum instead of vanishing through NULL-propagating concat —
    * oracles over a nullable stratum mirror it with
    * `coalesce(stratum, chr(0))`. */
  private def stratumSalt(idCol: String, strataCol: String): Column =
    concat(col(idCol).cast("string"), lit("|"),
      coalesce(col(strataCol).cast("string"), lit("\u0000")))

  /** Deterministic fraction-sample: keep rows with hashUnit(id) < f. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashUnit(col(idCol)) < fraction)

  /** Stratified deterministic sample: per-stratum keep fractions (the
    * `df.stat.sampleBy` analog, minus its partitioning dependence) —
    * e.g. downsample an over-represented language while keeping rare
    * ones whole. Strata absent from `fractions` keep `defaultFraction`
    * (0.0 = drop). The hash is salted with the stratum so a row's draw
    * in one stratum is independent of the id's draw in another — and a
    * pure function of (id, stratum): append-stable and repartition-proof
    * like every operator here. Pure map-side filter, no shuffle. */
  def stratifiedSampleByHash(df: DataFrame, idCol: String, strataCol: String,
                             fractions: Map[String, Double],
                             defaultFraction: Double = 0.0): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq)
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0, 1]")
    val u = hashUnit(stratumSalt(idCol, strataCol))
    val bound = fractions.foldRight(lit(defaultFraction): Column) {
      case ((stratum, f), acc) => when(col(strataCol) === stratum, f).otherwise(acc)
    }
    df.filter(u < bound)
  }

  /** Exactly k rows per stratum, drawn deterministically by salted-hash
    * rank — the "exactly 1000 eval docs per language" op where the
    * rate-based [[stratifiedSampleByHash]] only hits the count in
    * expectation. Rank-based membership is NOT append-stable (a new row
    * with a smaller hash displaces the current k-th — inherent to any
    * exact-k contract); pipelines needing append-stability use the
    * rate-based form. Strata with ≤ k rows are kept whole.
    *
    * Scale shape: one shuffle keyed by the stratum + a per-stratum sort
    * (Spark windows have no partial top-k, so a single giant stratum
    * sorts in full — acceptable because k-per-group sampling is run on
    * grouping columns of bounded cardinality and rows-per-group, not on
    * skewed power-law keys). */
  def exactKPerStratum(df: DataFrame, idCol: String, strataCol: String,
                       k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = Dedup.hash32(stratumSalt(idCol, strataCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(u.asc, col(idCol).asc)
    df.withColumn("_sample_rk", row_number().over(w))
      .filter(col("_sample_rk") <= k)
      .drop("_sample_rk")
  }

  /** [[exactKPerStratum]] WITHOUT the per-stratum window sort — the
    * same deterministic draw (k smallest salted hashes, ties on id)
    * expressed through the [[graft.functions.TopKBy]] partial
    * aggregate: at most 2k (hash, id) pairs per stratum per partition
    * exist anywhere, map-side combined, so the giant-stratum full sort
    * the window form documents as its limitation simply never happens.
    * Smallest-hash-first maps onto TopKBy's largest-score contract by
    * negating the hash (ties still break on id asc). Requires a
    * bigint-castable, non-NULL id, unique per stratum (the sane
    * sampling contract) — an id that casts to NULL fails fast rather
    * than silently dropping the row. A NULL stratum is its own
    * stratum (null-safe join), exactly as the window form's
    * partitionBy treats it; row equality with the window form is
    * spec-asserted. */
  def exactKPerStratumAgg(df: DataFrame, idCol: String, strataCol: String,
                          k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    graft.functions.VectorExpressions.ensureRegistered(df.sparkSession)
    val u = Dedup.hash32(stratumSalt(idCol, strataCol))
    // fail fast on a NULL-casting id: TopKBy's update would skip the
    // row (SQL aggregate convention), silently diverging from the
    // window draw, which keeps it — per-row codegen'd branch, no scan
    val idLong = coalesce(col(idCol).cast("long"),
      raise_error(concat(
        lit(s"exactKPerStratumAgg: id column '$idCol' must cast to " +
          "non-NULL bigint, got: "),
        coalesce(col(idCol).cast("string"), lit("NULL")))).cast("long"))
    val kept = df
      .select(col(strataCol).as("_samp_g"), idLong.as("_samp_id"),
        (-u).cast("double").as("_samp_s"))
      .groupBy(col("_samp_g"))
      .agg(graft.functions.VectorExpressions
        .topkBy(col("_samp_s"), col("_samp_id"), k).as("tk"))
      .select(col("_samp_g"),
        explode(transform(col("tk"), e => e.getField("id"))).as("_samp_id"))
    df.join(kept, df(strataCol) <=> kept("_samp_g") &&
      df(idCol).cast("long") === kept("_samp_id"), "left_semi")
  }

  /** Rebalance a corpus to a target domain mixture — the data-mixture
    * op behind "20% code, 5% forums, …" training recipes: given target
    * weights per domain (summing to 1), downsample every domain
    * deterministically so the OUTPUT proportions match the weights while
    * keeping as many rows as feasibility allows. The binding domain
    * (smallest n_g/w_g) is kept whole; every other domain's keep-rate is
    * `s·w_g/n_g` with `s = min_g(n_g/w_g)` — the largest feasible scale.
    * Domains absent from `weights` are dropped (weight 0).
    *
    * Membership is a pure function of (id, domain) via the salted hash —
    * append-stable and repartition-proof like every operator here; the
    * realized mix is exact in expectation and concentrates at corpus
    * scale. Scale shape: one low-cardinality count aggregate (map-side
    * combine collapses it to |domains| rows per partition), a broadcast
    * of the |domains|-row rate table, then a map-side filter — the
    * corpus itself never shuffles. */
  def rebalanceToMix(df: DataFrame, idCol: String, domainCol: String,
                     weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0.0) &&
      math.abs(weights.values.sum - 1.0) < 1e-9,
      "weights must be positive and sum to 1")
    val d = col(domainCol)
    val wExpr = weights.foldRight(lit(Double.NaN): Column) {
      case ((dom, wt), acc) => when(d === dom, wt).otherwise(acc)
    }
    val counts = df.filter(d.isInCollection(weights.keys.toSeq))
      .groupBy(d.as("_mix_domain"))
      .agg(count(lit(1)).as("_mix_n"), first(wExpr).as("_mix_w"))
    // s = min over domains of n_g / w_g, via a window over the
    // |domains|-row count table — NOT a second aggregate branch, which
    // (no cross-branch CSE) would re-scan the corpus for a 1-row value.
    // The unpartitioned window collapses to a single partition of
    // |domains| rows: bounded by construction.
    val s = min(col("_mix_n") / col("_mix_w"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    val rates = counts
      .select(col("_mix_domain"),
        (s * col("_mix_w") / col("_mix_n")).as("_mix_rate"))
    val u = hashUnit(stratumSalt(idCol, domainCol))
    df.join(broadcast(rates), d === col("_mix_domain"))
      .filter(u < col("_mix_rate"))
      .drop("_mix_domain", "_mix_rate")
  }

  /** Temperature-flattened domain mixture — the T5/mT5 recipe where
    * the target weights are not hand-chosen but DERIVED from the data:
    * w_g ∝ n_g^(1/τ), so over-represented domains are damped and rare
    * ones boosted relative to their natural share, then the corpus is
    * downsampled to that mixture exactly as [[rebalanceToMix]] does
    * (binding domain kept whole, every other domain's keep-rate
    * `s·w_g/n_g` with `s = min_g(n_g/w_g)`). τ = 1 is the identity
    * mixture (all rates 1); τ → ∞ approaches the uniform mixture.
    *
    * τ must be a power of two: n^(1/2^h) is then a chain of h
    * square roots, and IEEE sqrt — unlike libm pow — is correctly
    * rounded, so every rate is bit-identical in any engine and
    * membership stays oracle-reproducible (the package invariant; an
    * arbitrary-τ variant would hang membership on pow's last ulp).
    * Scale shape identical to [[rebalanceToMix]]: one
    * |domains|-row count aggregate, a broadcast rate table, a
    * map-side filter — the corpus never shuffles. */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String,
                     temperature: Int): DataFrame = {
    require(temperature >= 1 && Integer.bitCount(temperature) == 1,
      "temperature must be a power of two (1, 2, 4, 8, …)")
    val halvings = Integer.numberOfTrailingZeros(temperature)
    val d = col(domainCol)
    val counts = df.filter(d.isNotNull)
      .groupBy(d.as("_mix_domain"))
      .agg(count(lit(1)).cast("double").as("_mix_n"))
    val w = (1 to halvings).foldLeft(col("_mix_n")) { (c, _) => sqrt(c) }
    val s = min(col("_mix_n") / col("_mix_w"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    val rates = counts
      .withColumn("_mix_w", w)
      .select(col("_mix_domain"),
        (s * col("_mix_w") / col("_mix_n")).as("_mix_rate"))
    val u = hashUnit(stratumSalt(idCol, domainCol))
    df.join(broadcast(rates), d === col("_mix_domain"))
      .filter(u < col("_mix_rate"))
      .drop("_mix_domain", "_mix_rate")
  }

  /** Weighted Bernoulli sample: keep each row with probability
    * proportional to its weight, `p_i = expectedN · w_i / Σw` (capped at
    * 1 implicitly — rows with p ≥ 1 always pass since u < 1) — the
    * importance-sampling primitive ("sample 100k docs, length-weighted")
    * where [[sampleByHash]] draws uniformly. Expected output size is
    * ≤ expectedN (exactly expectedN when no p_i caps).
    *
    * Weights must be a non-negative INTEGER column: Σw then aggregates
    * exactly (LongType — no float summation-order drift), and the keep
    * test `u · Σw < expectedN · w_i` uses only IEEE correctly-rounded
    * ops (·, <) on exact inputs, so membership is bit-reproducible in
    * ANSI SQL like every operator here. (pow/ln-based Efraimidis-
    * Spirakis keys would hang the decision on libm rounding, which IS
    * engine-specific.) Zero-weight rows never match. Membership depends
    * on Σw, so it is repartition-proof but NOT append-stable — appends
    * change Σw; pipelines needing append-stability fix Σw out-of-band
    * and filter with the rate form directly.
    *
    * Scale shape: one exact count-style aggregate to a 1-row Σw,
    * broadcast back, then a map-side filter — the corpus never
    * shuffles. Σw must stay < 2^53 for the double cast to be exact
    * (9 PB of characters at 1 weight/char — checked). */
  def sampleByWeight(df: DataFrame, idCol: String, weightCol: String,
                     expectedN: Double): DataFrame = {
    require(expectedN > 0, "expectedN must be positive")
    val w = col(weightCol).cast("long")
    val tot = df.filter(w > 0).agg(sum(w).as("_w_sum"))
    df.filter(w > 0)
      .crossJoin(broadcast(tot))
      .filter(hashUnit(col(idCol)) * col("_w_sum").cast("double") <
        lit(expectedN) * w.cast("double"))
      .drop("_w_sum")
  }

  /** Assign each row to a named split by cumulative weight over the
    * hash unit — e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1).
    * Weights must sum to 1 (the last split absorbs rounding). */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val u = hashUnit(col(idCol))
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val expr = splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), bound), acc) =>
      when(u < bound, name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic training shards — the OUTPUT side of the pipeline.
    * A training run wants the corpus globally SHUFFLED into N balanced
    * shard files, and the shuffle must be reproducible (same seed →
    * same shards, same within-shard order), repartition-proof, and
    * append-stable at the assignment level — `df.orderBy(rand())` is
    * none of these. shard = hash32(id|seed) mod n; within-shard order =
    * (hash, id) ascending, a deterministic pseudo-random permutation
    * that is a pure function of the id set. Adds (`shard`, `shard_h`);
    * the seed salts the hash so re-sharding epochs draw independent
    * permutations. */
  def shardAssignments(df: DataFrame, idCol: String, nShards: Int,
                       seed: String = "shard0"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    val h = Dedup.hash32(
      concat(col(idCol).cast("string"), lit("|"), lit(seed)))
    df.withColumn("shard_h", h)
      .withColumn("shard", pmod(col("shard_h"), lit(nShards.toLong)).cast("int"))
  }

  /** Write [[shardAssignments]] as `shard=N/` parquet directories, each
    * file internally in the deterministic shuffled order: ONE range
    * shuffle aligned 1:1 with shard values + a distributed
    * sortWithinPartitions — no window, no per-shard single-task rank
    * materialization (a global position column would be the histogram's
    * two-pass ranking problem; training readers consume file order, so
    * the sorted files ARE the contract). */
  def writeTrainingShards(df: DataFrame, idCol: String, path: String,
                          nShards: Int, seed: String = "shard0"): Unit =
    shardAssignments(df, idCol, nShards, seed)
      .repartitionByRange(nShards, col("shard"), col("shard_h"), col(idCol))
      .sortWithinPartitions(col("shard"), col("shard_h"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
