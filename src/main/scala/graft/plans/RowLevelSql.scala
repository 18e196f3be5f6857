package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.GraftSqlShims

/** SQL row-level commands on graft MANIFEST tables — the statement
  * surface over the file-granular copy-on-write engine:
  *
  * {{{
  *   MERGE INTO graft.db.t AS t USING src AS s ON t.k = s.k
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  *   UPDATE graft.db.t SET v = v + 1 WHERE k < 100
  *   DELETE FROM graft.db.t WHERE k % 3 = 0
  * }}}
  *
  * Spark's own DSv2 path for these statements is the
  * `SupportsRowLevelOperations` rewrite, whose group granularity
  * without `_file` metadata columns is the WHOLE TABLE — a full
  * rewrite per statement. This rule instead substitutes, at post-hoc
  * resolution time (before the optimizer's row-level rewrites run and
  * reject the table), an eagerly-executed command that delegates to
  * the manifest engine's own operations — [[graft.sinks.ManifestTable
  * .merge]] / [[graft.sinks.ManifestTable.updateWhere]] /
  * [[graft.sinks.ManifestTable.deleteWhere]] — so a SQL statement
  * costs exactly what the Scala API costs: envelope/bloom-selected
  * touched files + the batch, never the table. (The analyzer-rule
  * substitution is the same seam the major lakehouse formats used for
  * their MERGE before the DSv2 API existed.)
  *
  * Scope (anything else raises with the supported shape named):
  *   - MERGE: equi-key ON (conjunction of `t.a = s.b` attribute
  *     pairs), one `WHEN MATCHED THEN UPDATE` + one `WHEN NOT MATCHED
  *     THEN INSERT` whose aligned assignments agree column-for-column
  *     (the `SET *` / `INSERT *` upsert — both arms must write the
  *     same source row, because the engine's merge IS an upsert).
  *     In-batch duplicate keys remain the caller's contract, as in
  *     the Scala API.
  *   - UPDATE: top-level column assignments, any row-local predicate.
  *   - DELETE: any row-local predicate (subquery predicates are not
  *     row-local and fail resolution downstream).
  *
  * Expressions are carried by NAME, not exprId: the commands re-read
  * the table inside their own commit loops (fresh attribute ids), so
  * resolved references are rebased to `UnresolvedAttribute`s and
  * re-resolved against the re-read frame — sound for row-local
  * expressions, which is exactly the supported scope. Epoch-format
  * tables and time-traveled handles never match
  * ([[graft.sources.v2.GraftTable.rowLevelRoot]]). */
case class GraftRowLevelSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftTable(plan: LogicalPlan)
      : Option[graft.sources.v2.GraftTable] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation => r.table match {
        case t: graft.sources.v2.GraftTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  private def graftRoot(plan: LogicalPlan): Option[String] =
    graftTable(plan).flatMap(_.rowLevelRoot)

  /** Rebase resolved attribute references to plain names and wrap as
    * an (opaque) Column so the command can re-resolve them against
    * its own table read — and so CheckAnalysis does not walk them as
    * the command node's expressions (they are intentionally
    * unresolved until the command's own analysis). */
  private def byName(e: Expression): org.apache.spark.sql.Column =
    GraftSqlShims.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  private def assignMap(assigns: Seq[Assignment],
                        what: String): Seq[(String, Expression)] =
    assigns.map {
      case Assignment(k: AttributeReference, v) => k.name -> v
      case Assignment(other, _) => throw new UnsupportedOperationException(
        s"graft $what supports top-level column assignments only, " +
          s"got target $other")
    }

  /** The ON clause as equi-key (target column, SOURCE attribute)
    * pairs — a conjunction of attribute equalities across the two
    * sides. The source attribute is kept so the arm-agreement check
    * can verify key assignments against the JOIN key itself. */
  private def keyPairs(cond: Expression, tOut: AttributeSet,
                       sOut: AttributeSet)
      : Seq[(String, AttributeReference)] = cond match {
    case And(l, r) => keyPairs(l, tOut, sOut) ++ keyPairs(r, tOut, sOut)
    case EqualTo(a: AttributeReference, b: AttributeReference)
        if tOut.contains(a) && sOut.contains(b) => Seq(a.name -> b)
    case EqualTo(a: AttributeReference, b: AttributeReference)
        if sOut.contains(a) && tOut.contains(b) => Seq(b.name -> a)
    case other => throw new UnsupportedOperationException(
      "graft MERGE supports an equi-key ON clause (a conjunction of " +
        s"target-column = source-column equalities), got $other")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(target, cond)
        if d.resolved && graftRoot(target).isDefined =>
      // the table's declared deleteMode picks the grain: merge-on-read
      // commits deletion-vector bits, copy-on-write rewrites files
      GraftDeleteCommand(graftRoot(target).get, byName(cond),
        mor = graftTable(target).exists(_.morDelete))

    case u @ UpdateTable(target, assignments, cond)
        if u.resolved && graftRoot(target).isDefined =>
      GraftUpdateCommand(graftRoot(target).get,
        assignMap(assignments, "UPDATE")
          .map { case (n, v) => n -> byName(v) },
        cond.map(byName),
        mor = graftTable(target).exists(_.morUpdate))

    case m @ MergeIntoTable(target, source, mergeCond,
        matched, notMatched, notMatchedBySource, _)
        if m.resolved && graftRoot(target).isDefined =>
      val root = graftRoot(target).get
      def unsupported(why: String) = throw new UnsupportedOperationException(
        s"graft MERGE INTO supports exactly WHEN MATCHED THEN UPDATE + " +
          s"WHEN NOT MATCHED THEN INSERT with matching assignments " +
          s"(the SET * / INSERT * upsert); $why")
      val (updAssigns, updCond) = matched match {
        case Seq(UpdateAction(c, as, _)) => (assignMap(as, "MERGE"), c)
        case other => unsupported(s"matched actions were $other")
      }
      val (insAssigns, insCond) = notMatched match {
        case Seq(InsertAction(c, as)) => (assignMap(as, "MERGE"), c)
        case other => unsupported(s"not-matched actions were $other")
      }
      if (updCond.nonEmpty || insCond.nonEmpty)
        unsupported("conditional action clauses are not supported")
      if (notMatchedBySource.nonEmpty)
        unsupported("WHEN NOT MATCHED BY SOURCE is not supported")
      val targetCols = EliminateSubqueryAliases(target).output
      val pairs = keyPairs(mergeCond,
        AttributeSet(targetCols), AttributeSet(source.output)).distinct
      val keySrc = pairs.toMap
      val ins = insAssigns.toMap
      val upd = updAssigns.toMap
      targetCols.foreach { a =>
        val iv = ins.getOrElse(a.name,
          unsupported(s"INSERT does not assign column ${a.name}"))
        val uv = upd.getOrElse(a.name,
          unsupported(s"UPDATE does not assign column ${a.name}"))
        keySrc.get(a.name) match {
          // a KEY column must be assigned exactly the ON clause's
          // source column in BOTH arms — anything else would make the
          // engine merge on a different key than the statement joins
          // on (matched rows updated under the wrong identity)
          case Some(src) =>
            if (!iv.semanticEquals(src) || !uv.semanticEquals(src))
              unsupported(s"key column ${a.name} must be assigned the ON " +
                s"clause's source column ${src.name} in both arms")
          case None =>
            if (!iv.semanticEquals(uv))
              unsupported(s"column ${a.name} is assigned differently by " +
                "the two arms — the engine's merge writes one source row " +
                "per key")
        }
      }
      GraftMergeCommand(root, source,
        targetCols.map(a => (a.name, byName(ins(a.name)), a.dataType)),
        pairs.map(_._1),
        mor = graftTable(target).exists(_.morMerge))
  }
}

/** Eager DELETE: [[graft.sinks.ManifestTable.deleteWhere]] (or its
  * deletion-vector twin when the table declares `deleteMode =
  * 'merge-on-read'`) under the command's own CAS commit loop. */
final case class GraftDeleteCommand(root: String,
                                    cond: org.apache.spark.sql.Column,
                                    mor: Boolean = false)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    if (mor) graft.sinks.ManifestTable.deleteWhereMor(session, root, cond)
    else graft.sinks.ManifestTable.deleteWhere(session, root, cond)
    Nil
  }
}

/** Eager UPDATE: [[graft.sinks.ManifestTable.updateWhere]] (or the
  * deletion-vector twin under `updateMode = 'merge-on-read'`). A
  * missing WHERE updates every row (SQL semantics). */
final case class GraftUpdateCommand(
    root: String,
    sets: Seq[(String, org.apache.spark.sql.Column)],
    cond: Option[org.apache.spark.sql.Column],
    mor: Boolean = false)
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val c = cond.getOrElse(org.apache.spark.sql.functions.lit(true))
    if (mor) graft.sinks.ManifestTable.updateWhereMor(session, root, c, sets)
    else graft.sinks.ManifestTable.updateWhere(session, root, c, sets)
    Nil
  }
}

/** Eager MERGE: project the source through the INSERT arm's (aligned)
  * assignments into the target's schema and delegate to
  * [[graft.sinks.ManifestTable.merge]] — matched keys replaced,
  * unmatched insert, only envelope/bloom-touched files rewritten. */
final case class GraftMergeCommand(
    root: String, source: LogicalPlan,
    columns: Seq[(String, org.apache.spark.sql.Column,
      org.apache.spark.sql.types.DataType)],
    keys: Seq[String],
    mor: Boolean = false)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftSqlShims.ofRows(session, source)
      .select(columns.map { case (n, v, dt) => v.cast(dt).as(n) }: _*)
    if (mor) graft.sinks.ManifestTable.mergeMor(src, root, keys)
    else graft.sinks.ManifestTable.merge(src, root, keys)
    Nil
  }
}
