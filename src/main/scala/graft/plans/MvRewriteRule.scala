package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Identity-only stand-in for a resolved graft snapshot inside
  * canonical plan comparison: two reads of the same (root, version)
  * normalize to EQUAL leaves regardless of relation-instance identity
  * (separate loads build separate [[graft.sources.v2.GraftTable]]
  * handles that never compare equal), while different versions — a
  * time travel, a moved head — stay distinct, which is exactly what
  * makes MV freshness fall out of the match for free. */
private[graft] final case class GraftRelPlaceholder(
    root: String, version: Long, output: Seq[Attribute])
  extends LeafNode {
  override def doCanonicalize(): LogicalPlan =
    copy(output = output.map(QueryPlan.normalizeExpressions(_, output)))
}

/** TRANSPARENT MATERIALIZED-VIEW REWRITE — the analyzer rule that
  * makes a registered, FRESH incremental MV serve matching aggregate
  * queries over its base without the query being rewritten by hand:
  *
  * {{{
  *   MaterializedView.enableRewrite(spark, mvRoot)
  *   // any query whose analyzed plan IS the view's definition —
  *   // over the same base/dim snapshots the view reflects — now
  *   // reads the view's files instead of re-scanning the base
  * }}}
  *
  * Matching is canonical-plan CONTAINMENT: the definition is
  * re-analyzed against the snapshots the view's offsets name, both
  * sides normalize (subquery aliases eliminated, graft relations
  * replaced by (root, version) placeholders) and compare
  * canonicalized — the child subtree and grouping set exactly, the
  * output columns as (name, expression) containment, so a query
  * selecting a SUBSET of the view's columns (or a different order)
  * is served too. That shape makes the substitution sound by
  * construction:
  *
  *  - FRESHNESS is the version match. The candidate's base relation
  *    carries the view's last-refreshed version; a user query reads
  *    the head. They are equal exactly when the view is caught up —
  *    a stale view simply never matches (and a `versionAsOf` read of
  *    the offset version matches deliberately: the view IS that
  *    snapshot's aggregate).
  *  - NO FALSE POSITIVES from cosmetic variation only: canonical
  *    comparison tolerates aliasing/exprId/qualifier noise, nothing
  *    semantic. A HAVING or ORDER BY above the aggregate survives —
  *    the matched subtree substitutes under it.
  *
  * The substituted plan projects the view's columns positionally
  * under the matched node's own output attributes (name + exprId
  * preserved), so parent operators resolve unchanged. At 100 TB this
  * turns a full fact re-scan into a read of the view's files — the
  * entire point of maintaining the MV incrementally. */
final case class GraftMvRewriteRule(spark: SparkSession)
  extends Rule[LogicalPlan] {
  import graft.sinks.MaterializedView

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // re-entrancy guard: candidate building and view reads run the
    // analyzer themselves
    if (MaterializedView.buildingRewrite.get()) return plan
    val roots = spark.conf.getOption(MaterializedView.RewriteRootsConf)
      .getOrElse("").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (roots.isEmpty || plan.isStreaming) return plan
    // cheap screen before any canonicalization: the plan must read at
    // least one registered view's base at all
    val scanRoots: Set[String] = plan.collect {
      case r: DataSourceV2Relation =>
        MaterializedView.graftRootOf(r)
    }.flatten.toSet
    if (scanRoots.isEmpty) return plan
    val candidates = roots
      .flatMap(m => MaterializedView.rewriteCandidate(spark, m))
      .filter(c => scanRoots.contains(c.baseRoot))
    if (candidates.isEmpty) return plan
    plan.transformDown {
      case agg: Aggregate if agg.resolved =>
        MaterializedView.normalizeForRewrite(agg).canonicalized match {
          case cAgg: Aggregate =>
            // a match needs: the same canonical child (join/filter
            // subtree over the same version-pinned snapshots), the
            // same grouping SET, and every output (name, canonical
            // expression) present among the view's columns — so a
            // query selecting a SUBSET of the view's columns, or a
            // different order, is served too; anything the view
            // cannot answer by name+expression stands down
            val userOut = agg.output.map(_.name)
              .zip(cAgg.aggregateExpressions
                .map(MaterializedView.bareExpr))
            candidates.find(c =>
              c.cChild == cAgg.child &&
                c.cGrouping == cAgg.groupingExpressions.toSet &&
                userOut.forall(c.cOutputs.contains)) match {
              case Some(c) =>
                MaterializedView.substituteRewrite(spark, c, agg)
                  .getOrElse(agg)
              case None => agg
            }
          case _ => agg
        }
    }
  }
}
