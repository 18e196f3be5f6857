package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit, max, min, sum}

/** Metadata-only aggregates in the PLANNER — the Delta/Iceberg
  * "COUNT(*) answered from the manifest" ergonomics on plain parquet:
  * a whole-table `COUNT(*)/COUNT(c)/MIN(c)/MAX(c)` aggregate over a
  * [[GraftTables]]-registered directory collapses at optimization
  * time to a [[LocalRelation]] holding the answer computed from the
  * committed [[graft.sources.FileStats]] epoch — zero data I/O, no
  * scan stage, independent of table size. The API-level twin is
  * [[graft.sources.FileStats.tableSummary]]; this rule is what makes
  * a user's plain `spark.read.parquet(dir).agg(...)` get the same
  * answer for free.
  *
  * Exactness is PROVEN per query, never assumed: the rewrite fires
  * only when the stats epoch's path set covers EXACTLY the scan's own
  * live file listing (one metadata-scale set comparison — the same
  * listing the scan would use), each path appears once, and every
  * consulted summary cell is non-NULL (footer-collected stats may
  * record "unknown" for writer-omitted columns — unknown must scan,
  * never guess). Any mismatch, unsupported aggregate shape (DISTINCT,
  * FILTER, grouping keys, untracked column), or interposed Filter
  * leaves the plan untouched — like [[StatsPruneRule]], the metadata
  * path is an optimization, not a correctness dependency.
  *
  * Supported shapes over tracked column c:
  *   COUNT(*)/COUNT(1) = Σ row_count;  COUNT(c) = Σ row_count − Σ
  *   c_nulls;  MIN(c)/MAX(c) = fold of the per-file envelopes (NULL —
  *   SQL's empty/all-NULL answer — when no file has a non-NULL value).
  */
case class MetaAggRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (StatsPruneRule.inMetadataQuery.get()) plan
    else plan.transformDown {
      case agg @ Aggregate(Nil, aggExprs, child, _) =>
        bareRelation(child) match {
          case Some(rel) if !rel.location.isInstanceOf[GraftPrunedFileIndex] =>
            GraftTables.lookup(rel.location.rootPaths) match {
              case Some(entry) if entry.statsRoot.nonEmpty =>
                tryAnswer(agg, aggExprs, rel, entry).getOrElse(agg)
              case _ => agg
            }
          case _ => agg
        }
    }

  /** The scan under the aggregate, seen through at most a pruning
    * Project of plain attributes (what column pruning inserts). Any
    * Filter, join, or computed projection disqualifies. */
  private def bareRelation(p: LogicalPlan): Option[HadoopFsRelation] = p match {
    case l: LogicalRelation => l.relation match {
      case r: HadoopFsRelation => Some(r)
      case _ => None
    }
    case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
      bareRelation(child)
    case _ => None
  }

  /** Either Some(LocalRelation answer) or None when any aggregate
    * shape or metadata proof fails. */
  private def tryAnswer(agg: Aggregate, aggExprs: Seq[NamedExpression],
                        rel: HadoopFsRelation,
                        entry: GraftTables.Entry): Option[LogicalPlan] = {
    // every output must be a supported, unfiltered, non-distinct
    // aggregate (or a literal riding along)
    sealed trait Need
    case object NRows extends Need
    final case class NCount(c: String) extends Need
    final case class NMin(c: String) extends Need
    final case class NMax(c: String) extends Need
    final case class NLit(v: Literal) extends Need
    val needs: Seq[Option[Need]] = aggExprs.map {
      case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
        fn match {
          case Count(Seq(Literal(_, _))) => Some(NRows)
          case Count(Seq(a: AttributeReference))
            if entry.statsCols.contains(a.name) => Some(NCount(a.name))
          case Min(a: AttributeReference)
            if entry.statsCols.contains(a.name) => Some(NMin(a.name))
          case Max(a: AttributeReference)
            if entry.statsCols.contains(a.name) => Some(NMax(a.name))
          case _ => None
        }
      case Alias(l: Literal, _) => Some(NLit(l))
      case _ => None
    }
    if (needs.exists(_.isEmpty)) return None

    StatsPruneRule.inMetadataQuery.set(true)
    try {
      val stats = graft.sources.FileStats.readStats(spark, entry.statsRoot.get)
      // proof of coverage: stats paths == the scan's OWN live listing,
      // each exactly once (metadata scale on both sides)
      val statPaths = stats.select(col("path")).collect()
        .map(r => GraftTables.canon(r.getString(0)))
      val live = rel.location.inputFiles
        .map(p => GraftTables.canon(p))
      if (statPaths.length != statPaths.distinct.length) return None
      if (statPaths.toSet != live.toSet) return None

      val wanted = needs.flatten.distinct.filter(!_.isInstanceOf[NLit])
      val cols = wanted.map {
        case NRows => sum(col("row_count")).as("_n_rows")
        case NCount(c) =>
          (sum(col("row_count")) - sum(col(s"${c}_nulls"))).as(s"_cnt_$c")
        case NMin(c) => min(col(s"${c}_min")).as(s"_min_$c")
        case NMax(c) => max(col(s"${c}_max")).as(s"_max_$c")
        case NLit(_) => lit(0).as("_unused") // unreachable (filtered)
      }
      val row: org.apache.spark.sql.Row =
        if (cols.isEmpty) org.apache.spark.sql.Row()
        else stats.agg(cols.head, cols.tail: _*).collect()(0)
      val byNeed: Map[Need, Any] = wanted.zipWithIndex.map { case (n, i) =>
        val v = row.get(i)
        n match {
          // an empty table's Σ is NULL — COUNT of nothing is 0
          case NRows | NCount(_) => (n: Need) -> (if (v == null) 0L else v)
          case _ => (n: Need) -> v
        }
      }.toMap
      // a NULL count cell (footer-stats "unknown") must scan, not guess;
      // NULL min/max is only valid as the honest empty/all-NULL answer —
      // distinguishable: row_count-Σnulls for that column must be 0
      val nullCountUnknown = wanted.exists {
        case c: NCount => byNeed(c) == null
        case _ => false
      }
      if (nullCountUnknown) return None
      val values = needs.zip(aggExprs).map {
        case (Some(NLit(l)), _) => l.value // already catalyst
        case (Some(n), ne) =>
          CatalystTypeConverters.createToCatalystConverter(
            ne.dataType)(byNeed(n))
        case (None, _) => return None // unreachable
      }
      // for MIN/MAX the metadata fold is exact only when a NULL result
      // provably means "no non-NULL value exists": check via the same
      // stats (Σ row_count − Σ nulls == 0). A NULL min with non-NULL
      // values present would be footer "unknown" — scan instead.
      val minMaxUnsound = wanted.exists {
        case n @ (NMin(_) | NMax(_)) if byNeed(n) == null =>
          val c = n match { case NMin(x) => x; case NMax(x) => x
                            case _ => throw new MatchError(n) }
          val chk = stats.agg(
            (sum(col("row_count")) - sum(col(s"${c}_nulls"))).as("nn"))
            .collect()(0)
          chk.isNullAt(0) || chk.getLong(0) != 0L
        case _ => false
      }
      if (minMaxUnsound) return None
      Some(LocalRelation(agg.output,
        Seq(InternalRow.fromSeq(values)), isStreaming = false))
    } catch {
      case e: Exception =>
        logWarning(s"graft metadata aggregate skipped for ${entry.dataDir}: $e")
        None
    } finally StatsPruneRule.inMetadataQuery.set(false)
  }
}
