package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass table profiling — the "what is in this table" operator a
  * pipeline runs before trusting 100 TB of new data: per-column
  * non-null counts, distinct cardinality, and min/max envelopes, all
  * from a SINGLE aggregate over one scan (profiles drive partition
  * sizing, join-strategy choices, and expectation thresholds — cf.
  * [[Expectations]], which enforces what a profile suggested).
  *
  * Distinct counts default to HyperLogLog (`approx_count_distinct`) —
  * one pass, bounded state, the only sane mode at scale. Exact mode
  * (`exactDistinct = true`, the oracle-gated path) pays Spark's
  * distinct-aggregate Expand: the scan is replayed |cols| ways through
  * the aggregation, still one job. Numeric envelopes surface as
  * doubles, string envelopes as strings, each NULL for columns of the
  * other kind — one uniform output schema for any column mix.
  *
  * Output: one row per profiled column —
  * (column, n_rows, n_nonnull, n_distinct, min_num, max_num,
  * min_str, max_str).
  */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = false,
              rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val kinds = cols.map { c =>
      c -> (df.schema(c).dataType match {
        case _: NumericType => 'n'
        case StringType     => 's'
        case _              => 'o'
      })
    }.toMap
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__d_$c"),
        (if (kinds(c) == 'n') min(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__mn_$c"),
        (if (kinds(c) == 'n') max(col(c)).cast("double")
         else lit(null).cast("double")).as(s"__mx_$c"),
        (if (kinds(c) == 's') min(col(c))
         else lit(null).cast("string")).as(s"__sn_$c"),
        (if (kinds(c) == 's') max(col(c))
         else lit(null).cast("string")).as(s"__sx_$c"))
    } :+ count(lit(1)).as("__rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // pivot the 1-row aggregate into one row per column — driver-free,
    // |cols| structs exploded from a single row
    val entries = array(cols.map { c =>
      struct(
        lit(c).as("column"), col("__rows").as("n_rows"),
        col(s"__n_$c").as("n_nonnull"), col(s"__d_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_num"), col(s"__mx_$c").as("max_num"),
        col(s"__sn_$c").as("min_str"), col(s"__sx_$c").as("max_str"))
    }: _*)
    one.select(explode(entries).as("p")).select("p.*")
  }
}
