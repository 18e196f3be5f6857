package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-tail treatment for metric columns — winsorization
  * (clip to per-group percentile bounds) is the standard robustifier
  * for training-signal columns (quality scores, per-doc loss, token
  * counts) where dropping outlier rows would bias the corpus but
  * keeping raw tails lets a handful of rows dominate a mean.
  */
object Outliers {

  /** Per-group winsorization: clip `valCol` into the group's exact
    * `[lo, hi]` percentile envelope (linear interpolation — Spark's
    * `percentile`; DuckDB's `quantile_cont` shares the definition).
    * Appends `<valCol>_w` = clamp(val, p_lo, p_hi) plus the bounds
    * themselves (`p_lo`, `p_hi`) for auditability.
    *
    * `roundBounds`: optionally round the percentile bounds to N
    * decimals before clipping. The interpolated percentile is the one
    * value in the pipeline computed with non-trivially-ordered float
    * arithmetic; rounding it makes the clip decision a comparison of
    * identical literals on any engine (the correctness-gate mode).
    * Production runs pass None and keep full precision.
    *
    * `approxAccuracy`: Some(acc) swaps the exact percentile for the
    * Greenwald-Khanna `approx_percentile` sketch (rank error ≤ 1/acc)
    * — bounded aggregation state per group, the mode a 100 TB run uses
    * (the exact form sorts within the aggregate). The bound is then an
    * actual data value within the rank window rather than an
    * interpolated one; the spec pins that rank contract.
    *
    * Scale shape: one grouped percentile aggregate collapses to
    * |groups| rows, broadcast back, then a map-side clamp. The data
    * itself never shuffles.
    */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                lo: Double, hi: Double,
                roundBounds: Option[Int] = None,
                approxAccuracy: Option[Int] = None): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, "need 0 <= lo < hi <= 1")
    val r: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      roundBounds match {
        case Some(n) => c => round(c, n)
        case None    => identity
      }
    def pct(q: Double): org.apache.spark.sql.Column = approxAccuracy match {
      case Some(acc) => expr(s"approx_percentile($valCol, $q, $acc)").cast("double")
      case None      => expr(s"percentile($valCol, $q)")
    }
    val bounds = df.groupBy(col(groupCol)).agg(
      r(pct(lo)).as("p_lo"),
      r(pct(hi)).as("p_hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valCol}_w",
        least(greatest(col(valCol), col("p_lo")), col("p_hi")))
  }
}
