package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted mergeable QUANTILE sketches — the quantile analog of the
  * HLL distinct-count epochs ([[Sketches]]): each ingest epoch folds
  * its values into a tiny per-group bucket-count table, epochs merge
  * by bucket-wise ADDITION, and any later consumer answers "p50/p95
  * per group across all history" from the merged counts — never by
  * re-scanning raw rows (the gap q_percentile_approx left open: GK via
  * `approx_percentile` is single-pass only; its sketch state is not
  * persistable or mergeable across jobs).
  *
  * Encoding: HDR-histogram-style log buckets over a fixed decimal
  * grid, in INTEGER arithmetic end to end.
  *   - `u = floor(value·100)` (centi-unit grid, values must be ≥ 0);
  *   - `u < 256` → bucket = u (exact region);
  *   - else with `j = bitlen(u) − 8` (so `u >> j` ∈ [128, 255]):
  *     bucket = j·128 + (u >> j).
  * Bucket width at scale j is 2^j centi-units, so the representative
  * (lower edge) under-reports a value by at most one part in 128:
  * RELATIVE value error ≤ 1/128 ≈ 0.8% (plus the 0.01 grid step), and
  * the estimate's RANK error is bounded by the chosen bucket's count
  * (the estimate's true rank interval brackets the target rank by
  * construction — [[estimates]] emits that bound per row).
  *
  * Why log-buckets and not KLL/GK blobs: compaction-based sketches
  * randomize (KLL) or depend on insertion order (GK), so two runs —
  * or a merged-epochs vs single-pass pair — produce different states
  * and different estimates, and a correctness gate degrades to a
  * tolerance flag. Bucket counts are a pure function of the input
  * MULTISET: partition order, merge order, and epoch boundaries are
  * all invisible (addition is associative-commutative), merged epochs
  * are BIT-EQUAL to a single pass (OperatorsSpec), and the DuckDB
  * oracle reproduces the estimate exactly — a full hash-match gate,
  * not a within-tolerance one. Size: ≤ 128·56 rows per group however
  * large the corpus (4 KB-ish like an HLL register file); the epoch
  * merge job's input is |groups|·|buckets|, not the history.
  *
  * Cf. reference `derive/index.ts:309-318` (its only quantile-ish
  * need is fixed aggregates); this operator is beyond-reference
  * surface for the 100 TB pipeline.
  */
object QuantileSketch {

  private val SubBuckets = 128 // 2^7 — relative error ≤ 1/128
  private val ExactLimit = 256L // u below this is bucketed exactly

  /** Centi-unit quantization: `floor(value·100)` as bigint. IEEE
    * double multiply + floor are bit-identical across engines (no
    * round-half ambiguity — the repo's rounding-split lesson). */
  def centiUnits(value: Column): Column =
    floor(value * lit(100.0)).cast("long")

  /** HDR bucket index of a centi-unit count `u ≥ 0` — a when-ladder
    * over the 55 possible scales (integer compares + shiftright only;
    * whole-stage codegen emits a flat branch chain). */
  def bucketOf(u: Column): Column = {
    val base = when(u < lit(ExactLimit), u)
    val ladder = (1 to 54).foldLeft(base) { (acc, j) =>
      acc.when(u < lit(ExactLimit << j),
        lit(j.toLong * SubBuckets) + shiftright(u, j))
    }
    ladder.otherwise(lit(55L * SubBuckets) + shiftright(u, 55))
  }

  /** Lower-edge representative of a bucket, back on the value grid
    * (inverse of [[bucketOf]] up to bucket width). For bucket ≥ 256:
    * scale j = bucket div 128 − 1, sub = bucket − j·128 ∈ [128, 255],
    * rep_u = sub · 2^j — computed as a double pow, which is EXACT here
    * (8 significant bits × a power of two fits the 53-bit mantissa)
    * and reproducible verbatim in the oracle's SQL. */
  def repValue(bucket: Column): Column = {
    val j = floor(bucket / lit(SubBuckets)).cast("long") - lit(1L)
    val sub = bucket - j * lit(SubBuckets.toLong)
    val repU = when(bucket < lit(ExactLimit), bucket)
      .otherwise((sub.cast("double") * pow(lit(2.0), j.cast("double")))
        .cast("long"))
    repU.cast("double") / lit(100.0)
  }

  /** One epoch's sketch: (group, bucket, n) — the fixed-size,
    * addition-mergeable state. Nulls are ignored (percentile
    * convention); negative values are rejected by the grid contract. */
  def sketch(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"),
        bucketOf(centiUnits(col(valueCol))).as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Fold any number of epoch sketches into one: bucket-wise sum —
    * associative, commutative, order-independent, so merged epochs are
    * bit-equal to a single-pass sketch over the union of their rows. */
  def mergeEpochs(epochs: Seq[DataFrame]): DataFrame = {
    require(epochs.nonEmpty, "mergeEpochs needs at least one epoch")
    epochs.reduce(_ unionByName _)
      .groupBy(col("grp"), col("bucket"))
      .agg(sum(col("n")).as("n"))
  }

  /** Save an epoch's sketch (tiny: |groups|·|buckets| rows). */
  def saveEpoch(sketch: DataFrame, path: String): Unit =
    sketch.write.mode("overwrite").parquet(path)

  def loadEpoch(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Quantile estimates from a sketch: for each percent in `pcts`,
    * the representative value of the first bucket whose cumulative
    * count reaches `ceil(pct·n/100)` (integer target arithmetic), plus
    * that bucket's count as the estimate's rank-error bound. The
    * cumulative window is partitioned per group and a group's bucket
    * count is bounded by the encoding (≤ 128·56 rows) however large
    * the data — bounded by construction, the Sampling.scala
    * convention, NOT a global window. */
  def estimates(sk: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 99),
      "pcts must be in [1, 99]")
    val byGrp = Window.partitionBy(col("grp")).orderBy(col("bucket"))
    val cum = sk
      .withColumn("cum", sum(col("n")).over(byGrp))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("grp"))))
    val aggs = pcts.flatMap { p =>
      val target = expr(s"(tot * $p + 99) div 100") // ceil(p·n/100), exact
      Seq(
        min(when(col("cum") >= target, repValue(col("bucket"))))
          .as(s"p${p}_sketch"),
        min(when(col("cum") >= target,
          struct(col("bucket"), col("n")))).getField("n")
          .as(s"p${p}_rank_err"))
    }
    cum.groupBy(col("grp"))
      .agg(max(col("tot")).as("n"), aggs: _*)
      .select(col("grp") +: col("n") +:
        pcts.flatMap(p => Seq(col(s"p${p}_sketch"), col(s"p${p}_rank_err"))): _*)
  }
}
