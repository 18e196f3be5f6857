package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: the properties that matter at 100 TB
  * must be visible in `explain` output, not assumed — filter pushdown to
  * the parquet scan, column pruning, broadcast joins for dims, no
  * cartesian products, whole-stage codegen coverage. */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q1_agg pushes the discount filter into the parquet scan and prunes columns") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_discount), GreaterThan(l_discount,0.01)]"),
      s"missing pushdown in:\n$p")
    assert(!p.contains("l_shipdate"), "scan reads columns the query never uses")
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    val p = plan("q_join_dual_dim")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension join fell back to sort-merge")
  }

  test("anti/semi joins use hash join strategies, not cartesian") {
    val pa = plan("q_anti_join")
    val ps = plan("q_semi_join")
    assert(!pa.contains("CartesianProduct") && !ps.contains("CartesianProduct"))
    assert(pa.contains("LeftAnti") || pa.contains("left_anti"))
    assert(ps.contains("LeftSemi") || ps.contains("left_semi"))
  }

  test("scalar projections prune the scan and run in whole-stage codegen") {
    val df = SparkEntry.queries("q_scalar_hash")(spark, sf)
    df.collect() // execute THIS plan so AQE finalizes and codegen stages appear
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<p_partkey:bigint,p_name:string>"),
      s"scan should read only the two needed columns:\n$p")
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan form
    assert(p.contains("*(1) Project"), s"projection fell out of codegen:\n$p")
  }

  test("occupancy explode avoids cartesian products") {
    val p = plan("q_occupancy_hourly")
    assert(!p.contains("CartesianProduct"), s"occupancy must not be a cross join:\n$p")
    assert(p.contains("Generate explode") || p.contains("Generate"),
      "expected sequence+explode generator")
  }

  test("custom dot_f32 expression participates in codegen (no UDF fallback)") {
    val df = SparkEntry.queries("q_dedup_embedding")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dot_f32"), s"custom expression missing from plan:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      "vector math must not fall back to UDF execution")
  }

  test("ANN query side broadcasts; corpus never shuffles") {
    val p = plan("q_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side should broadcast in:\n$p")
  }
}
