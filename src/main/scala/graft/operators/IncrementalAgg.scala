package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate view — the materialized-view
  * pattern for a 100 TB fact table: keep a small (|keys|-row)
  * count/sum state table and fold CDC-style deltas into it, so a
  * day's ingest costs ∝ |delta| + |touched keys|, never a re-scan of
  * the full fact history. Complements [[graft.sinks.VersionedTable]]
  * (which owns the committed-epoch storage of exactly such state
  * tables) and `Sketches`/`QuantileSketch` (the same fold discipline
  * for distinct counts and quantiles).
  *
  * Maintained aggregates: COUNT and SUM — the retractable pair (a
  * delete subtracts exactly what its insert added; AVG = sum/n at
  * read time). MIN/MAX are NOT retractable without per-key history
  * and deliberately absent: a deleted extremum needs a re-scan (or a
  * sketch) to re-derive, and pretending otherwise silently corrupts
  * the view.
  *
  * The summed value must be an INTEGER column (quantize money to
  * cents first, cf. q_rolling_window): LongType addition is exact and
  * order-independent, so `state ∪ delta` folds bit-identically to a
  * from-scratch rebuild — spec-asserted — where float sums would
  * drift with partitioning.
  */
object IncrementalAgg {

  /** Build the initial state: one row per key with exact (n, val_sum). */
  def build(facts: DataFrame, keyCols: Seq[String], valCol: Column): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    facts.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(valCol.cast("long")).as("val_sum"))
  }

  /** Fold a delta batch into the state. Delta rows carry `opCol`:
    * 'I' inserts a fact row, 'D' retracts one previously inserted
    * (an update is D-old + I-new, the standard retraction encoding);
    * any other op value fails the job rather than corrupting the view.
    *
    * Contract: every D must match a live inserted row (standard CDC
    * retraction). Keys whose count falls to 0 leave the state; a key
    * driven negative by an unmatched retraction is a pipeline bug and
    * fails fast rather than surviving as nonsense.
    *
    * Scale shape: the delta pre-aggregates map-side to its own touched
    * keys, then one |state|+|touched-keys| shuffle rebuilds the view —
    * cost ∝ state size, independent of the fact history's volume. The
    * result is row-identical to [[build]] over the post-delta fact set
    * (spec-asserted bit equality).
    */
  def applyDelta(state: DataFrame, delta: DataFrame, keyCols: Seq[String],
                 valCol: Column, opCol: Column): DataFrame = {
    val sgn = when(opCol === "I", 1L).when(opCol === "D", -1L)
      .otherwise(raise_error(concat(lit("IncrementalAgg: unknown op "), opCol)))
    val d = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(sgn).as("n"), sum(sgn * valCol.cast("long")).as("val_sum"))
    state.unionByName(d)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("val_sum")).as("val_sum"))
      .withColumn("n", when(col("n") >= 0, col("n")).otherwise(raise_error(
        lit("IncrementalAgg: count went negative — unmatched retraction"))))
      .filter(col("n") > 0)
  }

  /** Range backfill — the repair path when a correction arrives BEYOND
    * the reach of row-level retractions (upstream restated three days;
    * nobody has the original rows to emit 'D's for): drop the state's
    * rows for keys matching `keyCond` and rebuild exactly those keys
    * from the corrected facts. `keyCond` must reference only key
    * columns (it is applied to both the state and the facts — the two
    * sides must select the same key range); facts outside the range
    * are never scanned, so the repair costs ∝ affected range, not
    * history. Row-identical to a full [[build]] over the corrected
    * fact set (spec-asserted). */
  def rebuildRange(state: DataFrame, facts: DataFrame, keyCols: Seq[String],
                   valCol: Column, keyCond: Column): DataFrame =
    state.filter(!coalesce(keyCond, lit(false)))
      .unionByName(build(facts.filter(keyCond), keyCols, valCol))
}
