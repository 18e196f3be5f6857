package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL MATERIALIZED VIEWS over manifest tables — exact
  * aggregates maintained at cost ∝ what changed, not table size.
  *
  * The view is itself an ordinary manifest table (read it, time-travel
  * it, prune it like any other); its definition is a SQL text over the
  * placeholder `__BASE__` plus the GROUP-key columns, e.g.
  *
  * {{{
  *   MaterializedView.create(spark, mvRoot, baseRoot,
  *     "SELECT lang, count(*) AS n, sum(n_chars) AS chars, " +
  *     "min(doc_id) AS first_doc FROM __BASE__ " +
  *     "WHERE n_chars >= 100 GROUP BY lang", Seq("lang"))
  *   ... writes to the base ...
  *   MaterializedView.refresh(spark, mvRoot) // cost ∝ changed groups
  * }}}
  *
  * Refresh is AFFECTED-KEY RECOMPUTE (the shape that keeps EVERY
  * aggregate exact — min/max/count-distinct included — where
  * delta-folding breaks on deletes): diff the base's changed FILES
  * between the view's last-refreshed version and the head (metadata +
  * changed-file reads only), extract the distinct group keys those
  * rows carry, re-run the definition over ONLY those groups' base rows
  * (a broadcast semi join the runtime file filter prunes the base scan
  * by — on a group-key-clustered base the recompute reads the touched
  * groups' files, not the table), and fold the result into the view as
  * one keyed CDC batch: recomputed groups upsert, vanished groups
  * delete. Groups the changes never touched are never read, never
  * rewritten.
  *
  * Exactly-once by idempotence: the view commit lands BEFORE the
  * offset advances, and a crash between the two re-runs the same
  * recompute against the same base version — same rows, same fold.
  * Group keys must be non-null base columns selected through
  * unchanged (the keyed fold and the semi join are equality-keyed);
  * a NULL key refuses with the fix named. */
object MaterializedView {

  private val StateSub = "_mvdef"

  /** The view's definition + refresh offset — a four-line sidecar
    * updated by atomic overwrite-rename (no Spark job for a metadata
    * write; the crash contract is idempotence, not the CAS). */
  final case class Spec(baseRoot: String, defSql: String,
                        keyCols: Seq[String], lastVersion: Long)

  private def statePath(mvRoot: String) =
    new org.apache.hadoop.fs.Path(s"$mvRoot/$StateSub/spec")

  private def fs(spark: SparkSession, mvRoot: String) =
    new org.apache.hadoop.fs.Path(mvRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSpec(spark: SparkSession, mvRoot: String): Spec = {
    val f = fs(spark, mvRoot)
    val p = statePath(mvRoot)
    require(f.exists(p),
      s"no materialized view at $mvRoot — create() first")
    val in = f.open(p)
    val lines = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      .split('\n')
    finally in.close()
    // defSql LAST (it may be long but never multi-line: temp-view SQL
    // with newlines is normalized at create)
    Spec(lines(0), lines(3), lines(1).split(",").toSeq, lines(2).toLong)
  }

  private def writeSpec(spark: SparkSession, mvRoot: String,
                        spec: Spec): Unit = {
    val f = fs(spark, mvRoot)
    val p = statePath(mvRoot)
    f.mkdirs(p.getParent): Unit
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".spec.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(Seq(spec.baseRoot, spec.keyCols.mkString(","),
      spec.lastVersion.toString, spec.defSql).mkString("\n")
      .getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Run the definition over `base` rows through a collision-free
    * temp view; the placeholder keeps the definition free of any
    * catalog/session coupling. */
  private def runDef(spark: SparkSession, defSql: String,
                     base: DataFrame): DataFrame = {
    val view = s"__graft_mv_${java.util.UUID.randomUUID().toString
      .replace("-", "")}"
    base.createOrReplaceTempView(view)
    try spark.sql(defSql.replace("__BASE__", view))
    finally spark.catalog.dropTempView(view): Unit
  }

  private def requireKeysNonNull(df: DataFrame, keyCols: Seq[String],
                                 what: String): Unit = {
    val bad = df.filter(keyCols.map(col(_).isNull).reduce(_ || _))
      .limit(1).count()
    require(bad == 0L,
      s"materialized-view group keys must be non-null ($what carries " +
        s"a NULL in ${keyCols.mkString(",")}) — coalesce the key in " +
        "the base or filter NULL groups in the definition's WHERE")
  }

  /** Create the view: validate the definition, run the INITIAL full
    * build at the base's current head (the one legitimately
    * table-sized pass), and commit it as a manifest table tracking the
    * group keys (so the refresh fold is file-granular on the view
    * side too). Returns the view's version 0. */
  def create(spark: SparkSession, mvRoot: String, baseRoot: String,
             defSql0: String, keyCols: Seq[String]): Long = {
    // whitespace-normalized so the sidecar stays line-oriented (a
    // string literal carrying a LITERAL newline/tab would be altered —
    // write it as char(10)/char(9) in SQL instead)
    val defSql = defSql0.replaceAll("[\\s]+", " ").trim
    require(defSql.contains("__BASE__"),
      "the definition must reference the base table as __BASE__")
    require(keyCols.nonEmpty, "materialized views need group keys")
    require(!ManifestTable.exists(spark, mvRoot),
      s"manifest table at $mvRoot already exists")
    val vB = ManifestTable.latestVersion(spark, baseRoot)
    require(vB >= 0, s"no manifest table at $baseRoot")
    val baseSchema = ManifestTable.tableSchema(spark, baseRoot, vB)
    keyCols.foreach(k => require(baseSchema.fieldNames.contains(k),
      s"group key $k must be a base-table column (selected through " +
        "unchanged) — the refresh extracts touched keys from the " +
        "base's changed rows"))
    val built = runDef(spark, defSql,
      ManifestTable.readVersion(spark, baseRoot, vB))
    keyCols.foreach(k => require(built.columns.contains(k),
      s"the definition's output must carry group key $k"))
    requireKeysNonNull(built, keyCols, "the initial build")
    val v = ManifestTable.create(built, mvRoot, keyCols)
    writeSpec(spark, mvRoot, Spec(baseRoot, defSql, keyCols, vB))
    v
  }

  /** Incremental refresh. Returns the view's new version and how many
    * groups were recomputed, or None when the base has not moved.
    * Cost: changed-file reads (the delta) + the touched groups' base
    * rows (runtime-filter-pruned scan) + a keyed fold over the view's
    * touched files. A view that lagged past the base's retention
    * refuses with the re-create contract named (same as a lagged
    * change-feed consumer). */
  def refresh(spark: SparkSession, mvRoot: String): Option[(Long, Long)] = {
    val spec = readSpec(spark, mvRoot)
    val vNow = ManifestTable.latestVersion(spark, spec.baseRoot)
    if (vNow == spec.lastVersion) return None
    require(vNow > spec.lastVersion,
      s"view offset ${spec.lastVersion} is ahead of base $vNow — the " +
        "base was restored/vacuumed under the view; re-create it")
    require(ManifestTable.versions(spark, spec.baseRoot)
        .contains(spec.lastVersion),
      s"view lagged past retention: base version ${spec.lastVersion} " +
        s"of ${spec.baseRoot} was vacuumed — re-create the view")
    // 1. TOUCHED GROUPS: the union of removed-state and added-state
    //    rows between the two versions carries every key whose group
    //    could have changed (removed rows mark shrink/vanish, added
    //    rows mark grow/appear); reads are bounded by the delta's
    //    files, with each side's deletion vectors applied
    val (removed, added) = ManifestTable.changedFileStates(
      spark, spec.baseRoot, spec.lastVersion, vNow)
    def keysOf(states: Seq[(String, Option[String], Long)], v: Long) =
      if (states.isEmpty) None
      else Some(ManifestTable.readFilesDv(spark,
        ManifestTable.tableSchema(spark, spec.baseRoot, v),
        states.map(s => (s._1, s._2)), states.map(_._3).sum)
        .select(spec.keyCols.map(col): _*))
    val touchedRows = (keysOf(removed, spec.lastVersion) ++
      keysOf(added, vNow)).reduceOption(_ unionByName _)
    val touched = touchedRows match {
      case None =>
        // metadata-only base commits (evolution, rename, constraint):
        // no group can have changed — advance the offset and stop
        writeSpec(spark, mvRoot, spec.copy(lastVersion = vNow))
        return Some((ManifestTable.latestVersion(spark, mvRoot), 0L))
      case Some(rows) => rows.distinct().cache()
    }
    // 2. RECOMPUTE exactly those groups from the base head: the
    //    broadcast semi join hands the runtime file filter the key
    //    values, so a group-key-clustered base scans the touched
    //    groups' files, not the table. Cached: the CDC fold reads it
    //    on both the upsert and the vanish side.
    val baseRows = ManifestTable.readVersion(spark, spec.baseRoot, vNow)
      .join(broadcast(touched), spec.keyCols, "left_semi")
    val recomputed = runDef(spark, spec.defSql, baseRows).cache()
    try {
      // one job over the cached delta keys: count + null-key contract
      // (a NULL would silently miss the equality-keyed fold)
      val nTouched = touched.count()
      requireKeysNonNull(touched, spec.keyCols, "a changed base row")
      // 3. ONE keyed CDC fold into the view: recomputed groups upsert,
      //    groups with no surviving rows delete. seq = the base
      //    version this refresh reflects (monotone across refreshes).
      val mvSchema = ManifestTable.tableSchema(spark, mvRoot,
        ManifestTable.latestVersion(spark, mvRoot))
      val payload = mvSchema.fieldNames.filterNot(spec.keyCols.contains)
      val vanished = touched.join(
          recomputed.select(spec.keyCols.map(col): _*),
          spec.keyCols, "left_anti")
        .select(spec.keyCols.map(col) ++
          payload.map(c => lit(null).cast(mvSchema(c).dataType).as(c)): _*)
      val cdc = recomputed.withColumn("op", lit("I"))
        .unionByName(vanished.withColumn("op", lit("D")))
        .withColumn("seq", lit(vNow))
      val v = ManifestTable.applyCdc(cdc, mvRoot, spec.keyCols)
      // 4. offset LAST: a crash above re-runs the same recompute
      //    against the same base version — idempotent by value
      writeSpec(spark, mvRoot, spec.copy(lastVersion = vNow))
      Some((v, nTouched))
    } finally { touched.unpersist(); recomputed.unpersist(): Unit }
  }
}
