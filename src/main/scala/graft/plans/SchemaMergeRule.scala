package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** WRITE-SIDE SCHEMA AUTO-MERGE for appends — the Delta `mergeSchema`
  * ergonomics: a by-name append whose frame carries new columns, new
  * struct members, or losslessly wider primitives EVOLVES the table
  * (the same additive metadata-only commits `ALTER TABLE` would make —
  * [[graft.sinks.ManifestTable.evolveSchemaFor]]) and then lands,
  * instead of failing resolution. Opt-in per write
  * (`.option("mergeSchema", "true")`) or per session
  * (`spark.graft.schema.autoMerge = true`); lossy conflicts refuse
  * with the column and types named — auto-merge is additive only.
  *
  * Runs in the analyzer's HINTS batch — the one that precedes
  * Resolution — because the built-in output resolver fails a
  * too-many-columns append in the same fixed-point iteration that
  * would first reach an injected resolution rule. ONE shape lives
  * here: the unresolved catalog identifier (`df.writeTo("cat.db.t")`),
  * whose relation would otherwise resolve to the pre-evolution
  * schema. The sibling surfaces route elsewhere: path-source appends
  * (`df.write.format("graft").save(root)`) report the batch's own
  * schema via external metadata, so their gate is the V1 write bridge
  * itself (routed to `writeMergeSchema`); SQL `MERGE INTO ... WITH
  * SCHEMA EVOLUTION` rides the table's `AUTOMATIC_SCHEMA_EVOLUTION`
  * capability through Spark's own analyzer rule into
  * `catalog.alterTable`; the streaming sink takes a `mergeSchema`
  * option. */
case class GraftSchemaMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def autoMergeOn(writeOptions: Map[String, String]): Boolean =
    writeOptions.collectFirst {
      case (k, v) if k.equalsIgnoreCase("mergeSchema") => v.toBoolean
    }.getOrElse(spark.conf
      .get("spark.graft.schema.autoMerge", "false").toBoolean)

  /** The manifest root behind a catalog identifier when (and only
    * when) it names a graft-catalog manifest table — anything else
    * (other catalogs, missing tables, metadata suffixes) is None. */
  private def catalogRoot(parts: Seq[String]): Option[String] = {
    if (parts.length < 2) return None
    val plugin =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case _: Exception => return None }
    plugin match {
      case c: graft.sources.v2.GraftCatalog =>
        val ident = Identifier.of(parts.tail.init.toArray, parts.last)
        try c.loadTable(ident) match {
          case t: graft.sources.v2.GraftTable if t.manifestBacked =>
            Some(t.tableRoot)
          case _ => None
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  /** The append query's schema — the rule runs in the HINTS batch,
    * where a DataFrame writer's raw logical plan is still unresolved,
    * so an unresolved query analyzes as its own self-contained
    * subtree (it references nothing of the target). Unanalyzable
    * (genuinely unresolvable) queries return None and the append
    * proceeds to fail with the analyzer's own error.
    *
    * Memoized by plan IDENTITY, not structural equality: the Hints
    * batch iterates to fixed point over the same plan INSTANCE (that
    * repeat is what the memo saves), while a structurally-identical
    * plan from a LATER statement may resolve differently — a temp
    * view redefined in between must re-analyze, never serve a stale
    * schema. The value carries a weak ref to its exact key instance
    * for the identity check (WeakHashMap itself compares by equals),
    * and the analysis runs OUTSIDE the map's monitor so concurrent
    * appends never serialize behind each other's analyzer pass. */
  private val schemaCache = new java.util.WeakHashMap[LogicalPlan,
    (java.lang.ref.WeakReference[LogicalPlan],
      Option[org.apache.spark.sql.types.StructType])]()
  private def querySchema(q: LogicalPlan)
      : Option[org.apache.spark.sql.types.StructType] =
    if (q.resolved) Some(q.schema)
    else {
      val hit = schemaCache.synchronized(Option(schemaCache.get(q)))
      hit match {
        case Some((ref, s)) if ref.get() != null && (ref.get() eq q) => s
        case _ =>
          val s = scala.util.Try(
            spark.sessionState.executePlan(q).analyzed.schema).toOption
          schemaCache.synchronized {
            schemaCache.put(q,
              (new java.lang.ref.WeakReference(q), s)): Unit
          }
          s
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // unresolved catalog identifier (`df.writeTo("cat.db.t")`): evolve
    // through the catalog — the analyzer's resolution then loads the
    // already-evolved table itself, so the plan passes through
    // untouched. (Path-source appends never come through here: their
    // relation reports the batch's own schema via external metadata,
    // and the write bridge itself routes to writeMergeSchema.)
    case a @ AppendData(u: UnresolvedRelation, query, opts, true, _, _)
        if autoMergeOn(opts) =>
      for {
        root <- catalogRoot(u.multipartIdentifier)
        qs <- querySchema(query)
      } {
        val schema = graft.sinks.ManifestTable.tableSchema(spark, root,
          graft.sinks.ManifestTable.latestVersion(spark, root))
        val cs = spark.conf
          .get("spark.sql.caseSensitive", "false").toBoolean
        if (graft.sinks.ManifestTable.needsMergeEvolution(schema, qs, cs))
          graft.sinks.ManifestTable.evolveSchemaFor(spark, root, qs)
      }
      a
  }
}
