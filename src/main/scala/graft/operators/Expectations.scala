package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over any DataFrame — the
  * generic form of the reference's fixed rule battery
  * (reference: src/canon/quality.ts rules → issue counters): callers
  * declare named boolean checks, the operator reports violation
  * counts, annotates rows with the rules they break, or splits
  * clean/quarantine — the ingest-gate shape (Delta constraints /
  * expectation-suite pattern) a 100 TB pipeline puts in front of
  * every landing table.
  *
  * Scale shape: [[report]] is ONE aggregation pass — every rule
  * becomes a conditional-sum column in a single `agg`, map-side
  * combined, no per-rule scans; the long format is unpivoted from the
  * one-row wide result with an explode, not a second job.
  * [[annotate]]/[[split]] are pure narrow projections (no shuffle at
  * all) — quarantine routing costs a scan, never a sort.
  *
  * NULL semantics: an expectation holds only when its check is
  * provably TRUE; NULL (unknown) counts as a violation, matching SQL
  * `NOT COALESCE(check, FALSE)` — a null order date is a data-quality
  * problem, not a pass.
  */
object Expectations {

  final case class Expectation(name: String, check: Column)

  private def violated(e: Expectation): Column =
    not(coalesce(e.check, lit(false)))

  /** Long-format violation report: (rule, violations, total), one row
    * per rule, computed in one aggregation pass over the data. */
  def report(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "declare at least one expectation")
    require(rules.map(_.name).distinct.size == rules.size,
      "expectation names must be unique")
    val aggs = count(lit(1)).as("_total") +: rules.map { e =>
      sum(when(violated(e), 1L).otherwise(0L)).as(s"_v_${e.name}")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    wide.select(explode(array(rules.map { e =>
        struct(lit(e.name).as("rule"),
          col(s"_v_${e.name}").as("violations"),
          col("_total").as("total"))
      }: _*)).as("r"))
      .select(col("r.rule"), col("r.violations"), col("r.total"))
  }

  /** Adds `violated_rules: array<string>` — empty for clean rows. */
  def annotate(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "declare at least one expectation")
    df.withColumn("violated_rules", array_compact(array(rules.map { e =>
      when(violated(e), lit(e.name))
    }: _*)))
  }

  /** (clean, quarantine): rows passing every expectation vs rows
    * carrying their broken rules — write-through both sides and no
    * row is silently dropped. */
  def split(df: DataFrame, rules: Seq[Expectation]): (DataFrame, DataFrame) = {
    val marked = annotate(df, rules)
    (marked.filter(size(col("violated_rules")) === 0).drop("violated_rules"),
      marked.filter(size(col("violated_rules")) > 0))
  }
}
