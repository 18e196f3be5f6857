package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort / funnel analytics over an event log — the
  * user-lifecycle aggregations every product pipeline derives from the
  * same (entity, ts, type) shape the engine's sessionizer and SCD2
  * builder consume. All outputs are dates and counts: exact integer
  * arithmetic, bit-stable against any ANSI-SQL oracle.
  *
  * Scale shape: every step is keyed by the entity id — the cohort
  * assignment aggregate, the activity join, and the funnel's
  * stage-time aggregates all reuse one user-hash partitioning, and the
  * final day-keyed rollups aggregate partially map-side. Nothing
  * corpus-sized broadcasts; no windows over unbounded partitions.
  */
object Cohorts {

  /** Cohort retention matrix: users grouped by their FIRST-activity
    * day; for each (cohort_day, day_offset) the count of cohort
    * members active that day. `day_offset` is whole days since the
    * cohort day; row (c, 0) is the cohort size (every user is active
    * on their first day). */
  def retention(events: DataFrame, idCol: String, tsCol: String): DataFrame = {
    val activity = events
      .select(col(idCol).as("uid"), to_date(col(tsCol)).as("day"))
      .distinct()
    val cohorts = activity.groupBy(col("uid"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, Seq("uid"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("uid")).as("n_users"))
  }

  /** Ordered funnel: per user, stage i is reached when an event of
    * `steps(i)` STRICTLY AFTER the stage-(i−1) time exists; stage
    * times are the earliest qualifying event (min). Returns one row
    * per stage: (step, step_name, n_users) with n_users
    * monotonically non-increasing.
    *
    * Expressed as one aggregation per stage joined on the user key —
    * stage i's predicate needs stage i−1's time, so the dependency is
    * inherently sequential, but every pass is a user-keyed partial
    * aggregate over the (pre-filtered) step's events only. */
  def funnel(events: DataFrame, idCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    val ev = events.select(col(idCol).as("uid"), col(tsCol).as("ts"),
      col(typeCol).as("et"))
    // per-user stage times t0..tn, LEFT-joined so a user who stops at
    // stage i keeps a row with t_{i+1..n} null — one frame carries
    // every per-stage count
    var reached = ev.filter(col("et") === steps.head)
      .groupBy(col("uid")).agg(min(col("ts")).as("t0"))
    var i = 1
    while (i < steps.length) {
      val next = ev.filter(col("et") === steps(i))
        .join(reached.select(col("uid"), col(s"t${i - 1}")), Seq("uid"))
        .filter(col("ts") > col(s"t${i - 1}"))
        .groupBy(col("uid")).agg(min(col("ts")).as(s"t$i"))
      reached = reached.join(next, Seq("uid"), "left")
      i += 1
    }
    val counts = reached.agg(
      count(col("t0")).as("n0"),
      steps.indices.tail.map(j => count(col(s"t$j")).as(s"n$j")): _*).head()
    // output rows come from the step list, so a stage nobody reached
    // still appears (n_users = 0)
    import spark.implicits._
    steps.zipWithIndex.map { case (name, j) =>
      (j + 1, name, counts.getLong(j))
    }.toDF("step", "step_name", "n_users")
  }
}
