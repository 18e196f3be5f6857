package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph processing on DataFrames — the power-iteration
  * complement of [[Dedup.duplicateClusters]]'s pointer-jumping
  * connected components. Used on provenance graphs a curation pipeline
  * derives (host → host links, doc → source lineage): rank hubs,
  * weight domains, spot link farms.
  *
  * Scale shape per iteration: ONE shuffle join (edges ⋈ ranks on the
  * source key) + one destination-keyed aggregate. Edges are hash-
  * partitioned on src ONCE and cached, so every iteration's join
  * reuses that layout and only the |V|-row rank table moves. Rank
  * lineage is truncated with localCheckpoint every few rounds —
  * without it the plan doubles per iteration and the 10th round
  * compiles a 2^10-node tree (the [[Dedup.duplicateClusters]] lesson).
  */
object Graphs {

  /** Per-node degree stats: (node, out_deg, in_deg). */
  def degreeStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col(dstCol).as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Standard damped PageRank with uniform teleport and dangling-mass
    * redistribution: r' = (1−d)/N + d·(Σ_in r/outdeg + dangling/N).
    * Fixed iteration count — deterministic output for a deterministic
    * input (double arithmetic; per-node contribution sums are small and
    * the spec compares against an independent single-threaded reference
    * within 1e-9, not bit-exactly).
    *
    * @return (node, rank), Σ rank = 1 up to float error */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      "iterations must be in [1, 100]")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).cache()
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    // src-partitioned once; every iteration's join reuses the layout
    val eDeg = e.join(outDeg, Seq("src"))
      .repartition(col("src")).cache()
    eDeg.count(): Unit // materialize before the loop
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    var prev: DataFrame = null
    for (i <- 1 to iterations) {
      val withDeg = ranks.join(outDeg.withColumnRenamed("src", "node"),
        Seq("node"), "left")
      // dangling nodes (no out-edges) spread their mass uniformly
      val dangling = withDeg.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), (col("rank") / col("out_deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              lit(dangling / n))).as("rank"))
      // truncate lineage so iteration i doesn't re-plan iterations 1..i−1
      val mat = if (i % 3 == 0 || i == iterations)
        next.localCheckpoint(eager = true) else next
      if (mat ne next) {
        // the new checkpoint is MATERIALIZED (eager) — only now is the
        // previous checkpoint, which un-checkpointed intermediates
        // still referenced, safe to release
        if (prev != null) unpersistLocal(prev)
        prev = mat
      }
      ranks = mat
    }
    ranks
  }

  /** Release a localCheckpoint's backing RDD (cf. the identical helper
    * in [[Dedup]] — kept private there; the pattern is per-loop). */
  private def unpersistLocal(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
