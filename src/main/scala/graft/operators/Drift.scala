package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two table epochs — "did this
  * week's feed change shape?", the monitor a training pipeline runs
  * before a new corpus epoch is allowed into the mix (the
  * distribution-level complement of [[SnapshotDiff]]'s row-level
  * diff). Two statistics with different failure modes:
  *
  *  - Kolmogorov-Smirnov: max CDF gap — sensitive to location/shape
  *    shifts anywhere in the distribution, computed EXACTLY here in
  *    integer arithmetic (`|ca·nb − cb·na|` cross-products, one
  *    division at the very end), so the statistic is bit-reproducible
  *    on any engine.
  *  - Population Stability Index: Σ (pa−pb)·ln(pa/pb) over fixed
  *    buckets — the banking-standard drift score, additive per bucket
  *    (so per-bucket terms localize WHERE the drift is). Laplace
  *    smoothing keeps empty buckets finite.
  *
  * Both take an INTEGER-valued column (quantize first — cents,
  * cf. IncrementalAgg): integer support bounds the state, makes every
  * count exact, and caps the KS value-walk window at |support| rows.
  */
object Drift {

  /** Exact two-sample KS statistic. The value walk is an unpartitioned
    * window over the DISTINCT support values — bounded by the
    * quantized support (the integer-column contract), never by row
    * count, same boundedness argument as the equi-depth histogram's
    * count table. Cross-products stay in LongType: na·nb must be
    * < 2^63 (√2^63 ≈ 3·10⁹ rows per side — beyond that, sample or
    * widen to Decimal).
    *
    * @return one row: (n_a, n_b, ks, ks_at) — the statistic and the
    *         support value where the CDF gap peaks (smallest such
    *         value on ties: deterministic)
    */
  def ks(a: DataFrame, b: DataFrame, valCol: String): DataFrame = {
    val u = a.select(col(valCol).cast("long").as("v"), lit(1L).as("ca"), lit(0L).as("cb"))
      .unionByName(
        b.select(col(valCol).cast("long").as("v"), lit(0L).as("ca"), lit(1L).as("cb")))
      .filter(col("v").isNotNull)
      .groupBy(col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val byV = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val walked = u
      .withColumn("cum_a", sum(col("ca")).over(byV))
      .withColumn("cum_b", sum(col("cb")).over(byV))
      .withColumn("n_a", sum(col("ca")).over(all))
      .withColumn("n_b", sum(col("cb")).over(all))
      .withColumn("gap_num",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
    walked
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(struct(col("gap_num"), (-col("v")).as("neg_v"))).as("m"))
      .select(col("n_a"), col("n_b"),
        round(col("m.gap_num") / (col("n_a") * col("n_b")).cast("double"), 6)
          .as("ks"),
        (-col("m.neg_v")).as("ks_at"))
  }

  /** Per-group exact KS — [[ks]] with every window PARTITIONED by the
    * group key, so the value walk shards across groups instead of one
    * global ordering (strictly better parallelism than the global
    * form): the "did any SEGMENT's distribution move between periods"
    * monitor. Output one row per group present on either side.
    * Groups with an empty side score NULL (no CDF to compare —
    * surfaced, not silently 1.0). */
  def ksByGroup(a: DataFrame, b: DataFrame, grpCol: String,
                valCol: String): DataFrame = {
    val u = a.select(col(grpCol).as("grp"), col(valCol).cast("long").as("v"),
        lit(1L).as("ca"), lit(0L).as("cb"))
      .unionByName(
        b.select(col(grpCol).as("grp"), col(valCol).cast("long").as("v"),
          lit(0L).as("ca"), lit(1L).as("cb")))
      .filter(col("v").isNotNull)
      .groupBy(col("grp"), col("v"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val byV = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("grp"))
    u
      .withColumn("cum_a", sum(col("ca")).over(byV))
      .withColumn("cum_b", sum(col("cb")).over(byV))
      .withColumn("n_a", sum(col("ca")).over(all))
      .withColumn("n_b", sum(col("cb")).over(all))
      .withColumn("gap_num",
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")))
      .groupBy(col("grp"), col("n_a"), col("n_b"))
      .agg(max(struct(col("gap_num"), (-col("v")).as("neg_v"))).as("m"))
      .select(col("grp"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("m.gap_num") /
            (col("n_a") * col("n_b")).cast("double"), 6)).as("ks"),
        (-col("m.neg_v")).as("ks_at"))
  }

  /** PSI over `nBuckets` equi-width buckets spanning [lo, hi] (values
    * outside clamp to the edge buckets — fixed edges are the PSI
    * contract: the reference epoch defines the grid and every later
    * epoch scores against it). Laplace-smoothed proportions
    * `(n_i + 0.5) / (n + 0.5·k)` keep ln finite on empty buckets.
    * Per-bucket terms are returned (PSI is their sum) so the drifted
    * region is visible, not just the score.
    *
    * Scale shape: one grouped count per side collapsed map-side to
    * ≤ nBuckets rows, a broadcast-sized join on bucket id, arithmetic.
    */
  def psi(a: DataFrame, b: DataFrame, valCol: String,
          lo: Long, hi: Long, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && hi > lo, "need hi > lo and >= 2 buckets")
    // clamp BEFORE the bucket arithmetic: the edge-bucket contract is
    // enforced on the value, so (v - lo) ∈ [0, hi - lo] and the
    // product cannot overflow for extreme inputs (|v| near 2^63 /
    // nBuckets previously wrapped negative and landed in bucket 0
    // instead of the top edge). Residual bound: (hi - lo) · nBuckets
    // must fit a long — the same quantized-span contract as ks().
    def bucketOf(c: Column): Column = {
      val v = least(lit(hi), greatest(lit(lo), c.cast("long")))
      floor((v - lit(lo)) * lit(nBuckets.toLong) / lit(hi - lo + 1))
        .cast("int")
    }
    def side(df: DataFrame, n: String): DataFrame =
      df.filter(col(valCol).isNotNull)
        .groupBy(bucketOf(col(valCol)).as("bucket"))
        .agg(count(lit(1)).as(n))
    val grid = a.sparkSession.range(nBuckets)
      .select(col("id").cast("int").as("bucket"))
    val counts = grid
      .join(side(a, "n_a"), Seq("bucket"), "left")
      .join(side(b, "n_b"), Seq("bucket"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = Window.partitionBy()
    val k = lit(nBuckets.toDouble)
    counts
      .withColumn("p_a", (col("n_a") + lit(0.5)) /
        (sum(col("n_a")).over(tot).cast("double") + lit(0.5) * k))
      .withColumn("p_b", (col("n_b") + lit(0.5)) /
        (sum(col("n_b")).over(tot).cast("double") + lit(0.5) * k))
      .withColumn("psi_term",
        round((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")), 6))
      .select(col("bucket"), col("n_a"), col("n_b"), col("psi_term"))
  }

  /** SCHEMA drift between two states of a table (epochs, snapshots,
    * upstream contract versions): per column of either side — added /
    * removed / type_changed / kept — with exact NULL ratios on both
    * sides, the cheap early warning for silent upstream contract
    * changes (a column going 0%→40% NULL breaks models long before
    * anything crashes). Metadata-scale by construction: one 1-row
    * aggregate per side (count + per-column null counts), the
    * |columns|-row result assembled on the driver. Ratios round to 4
    * decimals; a side where the column is absent carries NULLs. */
  def schemaDrift(prev: DataFrame, cur: DataFrame): DataFrame = {
    val spark = prev.sparkSession
    def stats(df: DataFrame): Map[String, (String, Option[Double])] = {
      val cols = df.columns.toSeq
      require(cols.nonEmpty, "schemaDrift requires at least one column")
      val aggs = count(lit(1)).as("_n") +: cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nn_$c"))
      val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = r.getLong(0)
      cols.zipWithIndex.map { case (c, i) =>
        val ratio =
          if (n == 0L) None
          else Some(BigDecimal(r.getLong(i + 1).toDouble / n)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        c -> (df.schema(c).dataType.catalogString, ratio)
      }.toMap
    }
    val a = stats(prev)
    val b = stats(cur)
    val rows = (a.keySet ++ b.keySet).toSeq.sorted.map { c =>
      val status = (a.get(c), b.get(c)) match {
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (Some((ta, _)), Some((tb, _))) if ta != tb => "type_changed"
        case _ => "kept"
      }
      (c, status,
        a.get(c).map(_._1).orNull, b.get(c).map(_._1).orNull,
        a.get(c).flatMap(_._2).map(java.lang.Double.valueOf).orNull,
        b.get(c).flatMap(_._2).map(java.lang.Double.valueOf).orNull)
    }
    spark.createDataFrame(rows).toDF("column", "status",
      "type_prev", "type_cur", "null_ratio_prev", "null_ratio_cur")
  }

  /** Benford first-significant-digit profile per group — the classic
    * fabricated-numbers / broken-feed detector: natural multiplicative
    * data follows P(d) = log10(1 + 1/d); a generator gone uniform (or
    * a truncated feed) deviates visibly. Input is a POSITIVE integer
    * column (the repo's cents convention — the first significant digit
    * is invariant under the 10^k scaling); the digit is taken from the
    * integer's decimal string, which is exact on every engine, never
    * from floating log10 arithmetic (log10(1000) rounds BELOW 3 in
    * some libms and misbins the whole power of ten). Output per
    * (group, digit): count, observed freq, Benford expectation, and
    * signed deviation — per-row arithmetic only, no cross-row float
    * sums to drift. */
  def benfordDigits(df: DataFrame, keyCol: String,
                    intCol: String): DataFrame = {
    val counts = df.filter(col(intCol) > 0)
      .withColumn("digit",
        substring(col(intCol).cast("string"), 1, 1).cast("int"))
      .groupBy(col(keyCol), col("digit"))
      .agg(count(lit(1)).as("n"))
    // ≤ 9 rows per key after aggregation: the per-key total window is
    // bounded by construction
    val w = Window.partitionBy(col(keyCol))
    counts
      .withColumn("_tot", sum(col("n")).over(w))
      .withColumn("freq", round(col("n").cast("double") / col("_tot"), 6))
      .withColumn("benford",
        round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)), 6))
      .withColumn("dev", round(col("freq") - col("benford"), 6))
      .drop("_tot")
  }
}
