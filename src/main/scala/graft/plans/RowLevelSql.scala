package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, UpdateAction, UpdateTable}
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
  *     pairs), any mix of (conditional) `WHEN MATCHED
  *     UPDATE/DELETE`, (conditional) `WHEN NOT MATCHED INSERT`, and
  *     `WHEN NOT MATCHED BY SOURCE UPDATE/DELETE` — provided no
  *     UPDATE arm reassigns a key column and every INSERT assigns
  *     the keys the ON clause's source columns (the engine merges BY
  *     key). The pure `SET * / INSERT *` upsert takes a join-free
  *     fast path ([[GraftMergeCommand]]); every other shape compiles
  *     to one keyed CDC batch ([[GraftMergeFullCommand]]).
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
        s"graft MERGE INTO supports an equi-key ON clause with any mix " +
          s"of (conditional) WHEN MATCHED UPDATE/DELETE, WHEN NOT " +
          s"MATCHED INSERT, and WHEN NOT MATCHED BY SOURCE " +
          s"UPDATE/DELETE, provided no UPDATE arm reassigns a key " +
          s"column (the engine merges BY key); $why")
      val targetCols = EliminateSubqueryAliases(target).output
      val tSet = AttributeSet(targetCols)
      val sSet = AttributeSet(source.output)
      val pairs = keyPairs(mergeCond, tSet, sSet).distinct
      val keySrc = pairs.toMap
      // mergeMode grains: 'merge-on-read' vectors matched positions;
      // 'equality-delete' commits the keys with ZERO target reads —
      // expressible only for the pure SET */INSERT * upsert (the fast
      // path below); general clause shapes must read matched rows, so
      // an eq-declared table serves them at the vector grain
      val mor = graftTable(target).exists(_.morMerge)
      val eq = graftTable(target).exists(_.eqMerge)

      // side-qualified rebasing: matched clauses may reference BOTH
      // relations (same column names on both sides), so names alone
      // cannot address them — the command evaluates the expressions
      // over a join of the two frames aliased __graft_t / __graft_s
      def bySide(e: Expression): org.apache.spark.sql.Column =
        GraftSqlShims.column(e.transform {
          case a: AttributeReference if tSet.contains(a) =>
            UnresolvedAttribute(Seq(GraftMergeFullCommand.TAlias, a.name))
          case a: AttributeReference if sSet.contains(a) =>
            UnresolvedAttribute(Seq(GraftMergeFullCommand.SAlias, a.name))
        })

      /** An UPDATE arm must PRESERVE key identity: the engine merges
        * by key, so a key column may only be assigned the ON clause's
        * source column or the target's own column (equal for matched
        * rows) — anything else merges under a different identity than
        * the statement joins on. */
      def checkKeyPreserved(sets: Seq[(String, Expression)],
                            arm: String): Unit =
        sets.foreach { case (n, v) =>
          keySrc.get(n).foreach { src =>
            val tAttr = targetCols.find(_.name == n).get
            if (!v.semanticEquals(src) && !v.semanticEquals(tAttr))
              unsupported(s"$arm reassigns key column $n")
          }
        }

      def updateArm(c: Option[Expression], as: Seq[Assignment],
                    arm: String): GraftMergeArm = {
        val sets = assignMap(as, "MERGE")
        checkKeyPreserved(sets, arm)
        GraftMergeUpdate(c.map(bySide),
          sets.map { case (n, v) => n -> bySide(v) })
      }
      val matchedArms = matched.map {
        case UpdateAction(c, as, _) => updateArm(c, as, "WHEN MATCHED UPDATE")
        case DeleteAction(c) => GraftMergeDelete(c.map(bySide))
        case other => unsupported(s"matched action $other")
      }
      val insertArms = notMatched.map {
        case InsertAction(c, as) =>
          val sets = assignMap(as, "MERGE").toMap
          // an inserted row's key must be the ON clause's source
          // column — the identity the statement just failed to match
          pairs.foreach { case (tn, src) =>
            sets.get(tn) match {
              case Some(v) if v.semanticEquals(src) => ()
              case Some(_) => unsupported(
                s"INSERT must assign key column $tn the ON clause's " +
                  s"source column ${src.name}")
              case None => unsupported(s"INSERT does not assign key $tn")
            }
          }
          GraftMergeInsert(c.map(bySide),
            sets.toSeq.map { case (n, v) => n -> bySide(v) })
        case other => unsupported(s"not-matched action $other")
      }
      val bySourceArms = notMatchedBySource.map {
        case UpdateAction(c, as, _) =>
          updateArm(c, as, "WHEN NOT MATCHED BY SOURCE UPDATE")
        case DeleteAction(c) => GraftMergeDelete(c.map(bySide))
        case other => unsupported(s"not-matched-by-source action $other")
      }

      // FAST PATH — the SET * / INSERT * upsert (one unconditional
      // UPDATE + one unconditional INSERT assigning every column the
      // same source row, no BY SOURCE arms): delegate to the engine's
      // native upsert, whose cost is touched-files + batch with NO
      // source-target join at all
      val fast = (matched, notMatched, notMatchedBySource) match {
        case (Seq(UpdateAction(None, uas, _)), Seq(InsertAction(None, ias)),
            Seq()) =>
          val upd = assignMap(uas, "MERGE").toMap
          val ins = assignMap(ias, "MERGE").toMap
          val aligned = targetCols.forall { a =>
            (ins.get(a.name), upd.get(a.name)) match {
              case (Some(iv), Some(uv)) => keySrc.get(a.name) match {
                case Some(src) =>
                  iv.semanticEquals(src) && uv.semanticEquals(src)
                case None => iv.semanticEquals(uv)
              }
              case _ => false
            }
          }
          if (aligned)
            Some(GraftMergeCommand(root, source,
              targetCols.map(a => (a.name, byName(ins(a.name)), a.dataType)),
              pairs.map(_._1), mor, eq))
          else None
        case _ => None
      }
      // SECOND FAST PATH — `WHEN MATCHED THEN DELETE` as the only arm
      // on an equality-delete table: the source's keys commit as a
      // delete file (zero target reads, cost O(source)); matched rows
      // die at read time exactly like any eq delete
      val fastDelete = (matched, notMatched, notMatchedBySource) match {
        case (Seq(DeleteAction(None)), Seq(), Seq()) if eq =>
          Some(GraftDeleteByKeyCommand(root, source,
            pairs.map { case (tn, src) =>
              (tn, byName(src),
                targetCols.find(_.name == tn).get.dataType) }))
        case _ => None
      }
      fast.orElse(fastDelete).getOrElse(
        GraftMergeFullCommand(root, source,
          targetCols.map(a => (a.name, a.dataType)),
          pairs.map { case (tn, src) => (tn, src.name) },
          matchedArms, insertArms, bySourceArms, mor || eq))
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

/** One WHEN arm of the general MERGE path, carried as opaque Columns
  * (side-qualified names — see [[GraftMergeFullCommand]]). */
sealed trait GraftMergeArm
final case class GraftMergeUpdate(
    cond: Option[org.apache.spark.sql.Column],
    sets: Seq[(String, org.apache.spark.sql.Column)]) extends GraftMergeArm
final case class GraftMergeDelete(
    cond: Option[org.apache.spark.sql.Column]) extends GraftMergeArm
final case class GraftMergeInsert(
    cond: Option[org.apache.spark.sql.Column],
    sets: Seq[(String, org.apache.spark.sql.Column)])

/** Eager GENERAL MERGE — the full clause surface (conditional
  * matched UPDATE/DELETE, conditional INSERT, NOT MATCHED BY
  * SOURCE), compiled to ONE keyed CDC batch and applied by
  * [[graft.sinks.ManifestTable.applyCdc]] (or its deletion-vector
  * twin under `mergeMode = 'merge-on-read'`):
  *
  *   1. target ⋈ source on the ON keys (right_outer — or full_outer
  *      only when BY SOURCE arms exist and unmatched target rows
  *      matter). Without BY SOURCE arms the target side reads ONLY
  *      the envelope/bloom-touched files ([[graft.sinks.ManifestTable
  *      .readTouchedRows]]): a matched row can live nowhere else, so
  *      the join never scans the table.
  *   2. each row class evaluates its arm chain IN ORDER (SQL MERGE
  *      semantics: first arm whose condition holds applies; none →
  *      row untouched): matched → U with the arm's values / D;
  *      source-only → I; target-only → U/D from target values.
  *   3. the resulting one-op-per-key CDC batch lands through the
  *      engine's own touched-file commit — cost ∝ batch + touched
  *      files, exactly the Scala applyCdc's contract.
  *
  * Duplicate ON keys in the source are REFUSED (the SQL multi-match
  * error, and the keyed fold would silently drop all but one op).
  * The batch is computed from the snapshot read in step 1 — snapshot
  * isolation; the commit itself serializes via CAS. Expressions are
  * carried as Columns over `__graft_t` / `__graft_s` aliases so the
  * same column name on both relations stays addressable. */
final case class GraftMergeFullCommand(
    root: String, source: LogicalPlan,
    targetSchema: Seq[(String, org.apache.spark.sql.types.DataType)],
    keys: Seq[(String, String)], // (target col, source col)
    matched: Seq[GraftMergeArm],
    inserts: Seq[GraftMergeInsert],
    bySource: Seq[GraftMergeArm],
    mor: Boolean)
  extends LeafRunnableCommand {
  import GraftMergeFullCommand._
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    // the source evaluates THREE times below (multi-match check, key
    // projection, the join) — pin it, or a non-deterministic /
    // concurrently-growing source could pass the duplicate-key check
    // on one evaluation and violate it on another, re-creating the
    // exact multi-match corruption the refusal exists to prevent
    val s0 = GraftSqlShims.ofRows(session, source).persist()
    try {
    val srcKeyCols = keys.map { case (_, sn) => col(sn) }
    if (s0.groupBy(srcKeyCols: _*).count()
        .filter(col("count") > 1).limit(1).count() > 0)
      throw new IllegalStateException(
        "MERGE source has duplicate ON-clause keys — each target row " +
          "may match at most one source row (the SQL multi-match " +
          "error); de-duplicate the source first")
    val keyNames = keys.map(_._1)
    val srcKeys = s0.select(
      keys.map { case (tn, sn) => col(sn).as(tn) }: _*).distinct()
    val target0 =
      if (bySource.isEmpty)
        graft.sinks.ManifestTable.readTouchedRows(
          session, root, srcKeys, keyNames)
      else graft.sinks.ManifestTable.read(session, root)
    val t = target0.withColumn(TPresent, lit(true)).alias(TAlias)
    val s = s0.withColumn(SPresent, lit(true)).alias(SAlias)
    val onCond = keys.map { case (tn, sn) =>
      col(s"$TAlias.$tn") === col(s"$SAlias.$sn") }.reduce(_ && _)
    val j = t.join(s, onCond,
      if (bySource.isEmpty) "right_outer" else "full_outer")
    val isT = coalesce(col(TPresent), lit(false))
    val isS = coalesce(col(SPresent), lit(false))

    def tCol(n: String): Column = col(s"$TAlias.$n")
    // first arm whose condition holds decides — a NULL condition is
    // not-true (falls through), per SQL CASE/MERGE semantics
    def chain(arms: Seq[(Option[Column], Column)], default: Column): Column =
      arms.foldRight(default) { case ((c, v), els) =>
        when(c.getOrElse(lit(true)), v).otherwise(els) }

    def opOf(a: GraftMergeArm): (Option[Column], Column) = a match {
      case GraftMergeUpdate(c, _) => (c, lit("U"))
      case GraftMergeDelete(c)    => (c, lit("D"))
    }
    val nullStr = lit(null).cast("string")
    val op =
      when(isT && isS, chain(matched.map(opOf), nullStr))
        .when(!isT && isS,
          chain(inserts.map(i => (i.cond, lit("I"))), nullStr))
        .when(isT && !isS, chain(bySource.map(opOf), nullStr))

    def valOf(n: String): Column = {
      def armVal(a: GraftMergeArm): (Option[Column], Column) = a match {
        // an unassigned column keeps the target's value; a DELETE
        // arm's values are unread (only its keys matter — and key
        // reassignment is refused, so target side is the key)
        case GraftMergeUpdate(c, sets) =>
          (c, sets.collectFirst { case (`n`, v) => v }.getOrElse(tCol(n)))
        case GraftMergeDelete(c) => (c, tCol(n))
      }
      val insVal = chain(inserts.map(i => (i.cond,
        i.sets.collectFirst { case (`n`, v) => v }
          .getOrElse(lit(null)))), lit(null))
      when(isT && isS, chain(matched.map(armVal), tCol(n)))
        .when(!isT && isS, insVal)
        .otherwise(if (bySource.isEmpty) lit(null)
          else chain(bySource.map(armVal), tCol(n)))
    }

    val cdc = j.select(targetSchema.map { case (n, dt) =>
        valOf(n).cast(dt).as(n) } :+ op.as(OpCol) :+ lit(0L).as(SeqCol): _*)
      .filter(col(OpCol).isNotNull)
    if (mor)
      graft.sinks.ManifestTable.applyCdcMor(cdc, root, keyNames, SeqCol, OpCol)
    else
      graft.sinks.ManifestTable.applyCdc(cdc, root, keyNames, SeqCol, OpCol)
    Nil
    } finally s0.unpersist(): Unit
  }
}

object GraftMergeFullCommand {
  private[plans] val TAlias = "__graft_t"
  private[plans] val SAlias = "__graft_s"
  private val TPresent = "__graft_t_present"
  private val SPresent = "__graft_s_present"
  private val OpCol = "__graft_op"
  private val SeqCol = "__graft_seq"
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
    mor: Boolean = false,
    eq: Boolean = false)
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftSqlShims.ofRows(session, source)
      .select(columns.map { case (n, v, dt) => v.cast(dt).as(n) }: _*)
    if (eq) graft.sinks.ManifestTable.mergeEq(src, root, keys)
    else if (mor) graft.sinks.ManifestTable.mergeMor(src, root, keys)
    else graft.sinks.ManifestTable.merge(src, root, keys)
    Nil
  }
}

/** Eager keyed DELETE at the equality-delete grain — the `WHEN
  * MATCHED THEN DELETE`-only MERGE on an eq-declared table: the
  * source's key columns (projected under the target's names and
  * types) commit as one delete file via [[graft.sinks.ManifestTable
  * .deleteByKeyEq]]; nothing reads the target. */
final case class GraftDeleteByKeyCommand(
    root: String, source: LogicalPlan,
    keys: Seq[(String, org.apache.spark.sql.Column,
      org.apache.spark.sql.types.DataType)])
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    val src = GraftSqlShims.ofRows(session, source)
      .select(keys.map { case (n, v, dt) => v.cast(dt).as(n) }: _*)
    graft.sinks.ManifestTable.deleteByKeyEq(src, root, keys.map(_._1))
    Nil
  }
}
