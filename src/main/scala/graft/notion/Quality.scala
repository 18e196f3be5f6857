package graft.notion

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Seven-rule data-quality engine (SURVEY §2.8;
  * src/normalize/quality/timeslices.ts + workflowStages.ts).
  *
  * Each rule is a filter + issue projection; issues union into one
  * DataFrame; MISSING_WORKFLOW_DEFINITION additionally excludes the row
  * from canon output via a left_anti join (J7). Deterministic
  * issue_id = sha256("runDate|dataset|entityId|rule").
  *
  * Scale: every rule is a narrow filter over the same scan — Catalyst
  * collapses them into one pass per source; the exclusion join
  * broadcasts the (small) excluded-id set.
  */
object Quality {

  private def issue(runDate: String, dataset: String, entityId: org.apache.spark.sql.Column,
                    severity: String, rule: String, message: String,
                    sample: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    struct(
      sha2(concat_ws("|", lit(runDate), lit(dataset), entityId, lit(rule)), 256).as("issue_id"),
      lit(runDate).as("run_date"),
      lit(dataset).as("dataset"),
      entityId.as("entity_id"),
      lit(severity).as("severity"),
      lit(rule).as("rule"),
      lit(message).as("message"),
      sample.as("sample"))
  }

  /** Evaluate all timeslice rules → issues DataFrame (8 columns, sample
    * as JSON string). */
  def timesliceIssues(ts: DataFrame, runDate: String): DataFrame = {
    val id = col("timeslice_id")
    def emit(cond: org.apache.spark.sql.Column, severity: String, rule: String,
             message: String, sample: org.apache.spark.sql.Column): DataFrame =
      ts.filter(cond).select(issue(runDate, "timeslices", id, severity, rule, message,
        to_json(sample)).as("i")).select("i.*")

    val missingWf = emit(col("workflow_definition_id").isNull, "error",
      "MISSING_WORKFLOW_DEFINITION",
      "Timeslice is missing workflow_definition_id and will be excluded.",
      struct(col("timeslice_id"), col("from_step_id"), col("to_step_id")))
    val fromNoStart = emit(col("from_step_id").isNotNull && col("started_at").isNull,
      "warn", "FROM_STEP_WITHOUT_STARTED_AT",
      "Timeslice has from_step_id but started_at is null.",
      struct(col("from_step_id")))
    val toNoEnd = emit(col("to_step_id").isNotNull && col("ended_at").isNull,
      "warn", "TO_STEP_WITHOUT_ENDED_AT",
      "Timeslice has to_step_id but ended_at is null.",
      struct(col("to_step_id")))
    val noSteps = emit(col("workflow_definition_id").isNotNull &&
      col("from_step_id").isNull && col("to_step_id").isNull,
      "warn", "WORKFLOW_WITH_NO_STEPS",
      "Timeslice has workflow_definition_id but no from/to steps.",
      struct(col("workflow_definition_id")))
    val noTimestamps = emit(
      (col("from_step_id").isNotNull || col("to_step_id").isNotNull) &&
        col("started_at").isNull && col("ended_at").isNull,
      "warn", "STEPS_WITHOUT_ANY_TIMESTAMP",
      "Timeslice has steps but both started_at and ended_at are null.",
      struct(col("from_step_id"), col("to_step_id")))
    val negDuration = emit(
      col("started_at").isNotNull && col("ended_at").isNotNull &&
        unix_millis(try_to_timestamp(col("ended_at"))) <
          unix_millis(try_to_timestamp(col("started_at"))),
      "warn", "NEGATIVE_DURATION",
      "Timeslice ended_at is earlier than started_at.",
      struct(col("started_at"), col("ended_at")))

    missingWf.unionByName(fromNoStart).unionByName(toNoEnd)
      .unionByName(noSteps).unionByName(noTimestamps).unionByName(negDuration)
  }

  /** STAGE_MISSING_LABEL_OR_NUMBER (quality/workflowStages.ts:11-29). */
  def workflowStageIssues(stages: DataFrame, runDate: String): DataFrame =
    stages.filter(col("stage_label").isNull || col("stage_number").isNull)
      .select(issue(runDate, "workflowStages", col("workflow_stage_id"), "warn",
        "STAGE_MISSING_LABEL_OR_NUMBER",
        "Workflow stage is missing stage_label or stage_number.",
        to_json(struct(col("stage_label"), col("stage_number")))).as("i"))
      .select("i.*")

  def allIssues(ts: DataFrame, stages: DataFrame, runDate: String): DataFrame =
    timesliceIssues(ts, runDate).unionByName(workflowStageIssues(stages, runDate))

  /** J7 — drop excluded (missing-workflow-definition) timeslices. */
  def excludeTimeslices(ts: DataFrame): DataFrame =
    ts.filter(col("workflow_definition_id").isNotNull)

  /** Coverage-percent diagnostic
    * (scripts/validate-workflow-instance-page-name.ts:40-64): share of
    * rows whose `column` is a non-blank string, with the reference's
    * first passing sample values plus up to `maxSamples` FAILING ids for
    * triage. One aggregate pass + two bounded limit() collects — no
    * full-result materialization at any corpus size. */
  case class CoverageReport(
    total: Long, nonNull: Long, pct: Double,
    sampleValues: Seq[(String, String)], failureSamples: Seq[String])

  def coverage(df: DataFrame, column: String = "workflow_instance_page_name",
               idCol: String = "timeslice_id", maxSamples: Int = 10): CoverageReport = {
    // trim().length > 0 semantics of the reference's filter
    val ok = coalesce(trim(col(column)) =!= "", lit(false))
    val agg = df.agg(count(lit(1)).as("total"),
      sum(when(ok, 1L).otherwise(0L)).as("nn")).collect()(0)
    val total = agg.getLong(0)
    val nn = Option(agg.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val pct = if (total == 0) 0.0 else nn.toDouble * 100.0 / total
    val samples = df.filter(ok).select(col(idCol), col(column))
      .limit(3).collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val failures = df.filter(!ok).select(col(idCol))
      .limit(maxSamples).collect().map(_.getString(0)).toSeq
    CoverageReport(total, nn, pct, samples, failures)
  }

  /** A1/A2 — run report aggregates (quality/index.ts:29-49). */
  case class RunQualityReport(
    run_date: String,
    timeslices_total: Long,
    timeslices_excluded_missing_workflow_definition: Long,
    issues_total: Long,
    issues_by_rule: Map[String, Long],
    no_to_step_in_run: Boolean)

  def report(ts: DataFrame, issues: DataFrame, runDate: String): RunQualityReport = {
    val agg = ts.agg(
      count(lit(1)).as("total"),
      sum(when(col("workflow_definition_id").isNull, 1L).otherwise(0L)).as("excluded"),
      sum(when(col("to_step_id").isNotNull, 1L).otherwise(0L)).as("to_steps"))
      .collect()(0)
    val byRule = issues.groupBy(col("rule")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    RunQualityReport(
      run_date = runDate,
      timeslices_total = agg.getLong(0),
      timeslices_excluded_missing_workflow_definition =
        Option(agg.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
      issues_total = byRule.values.sum,
      issues_by_rule = byRule,
      no_to_step_in_run = Option(agg.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L) == 0L)
  }
}
