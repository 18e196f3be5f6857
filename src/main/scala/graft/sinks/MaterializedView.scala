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
  * JOIN definitions — the star-schema MV users actually write
  * (`fact ⋈ dims GROUP BY dim.attr`) — declare each dimension with a
  * placeholder and its equi-join keys:
  *
  * {{{
  *   MaterializedView.create(spark, mvRoot, factRoot,
  *     "SELECT region_name, count(*) AS n, sum(amount) AS total " +
  *     "FROM __BASE__ f JOIN __DIM_regions__ r " +
  *     "ON f.region_id = r.region_id GROUP BY region_name",
  *     Seq("region_name"),
  *     dims = Seq(MaterializedView.JoinDim("regions", dimRoot,
  *       factKeys = Seq("region_id"), dimKeys = Seq("region_id"))))
  * }}}
  *
  * Refresh is AFFECTED-KEY RECOMPUTE (the shape that keeps EVERY
  * aggregate exact — min/max/count-distinct included — where
  * delta-folding breaks on deletes): diff the base's (and each dim's)
  * changed FILES between the view's last-refreshed versions and the
  * heads (metadata + changed-file reads only), derive the distinct
  * group keys those changes could have touched, re-run the definition
  * over ONLY those groups' base rows (a broadcast semi join the
  * runtime file filter prunes the base scan by — on a key-clustered
  * base the recompute reads the touched groups' files, not the
  * table), and fold the result into the view as one keyed CDC batch:
  * recomputed groups upsert, vanished groups delete. Groups the
  * changes never touched are never read, never rewritten.
  *
  * For join definitions the touched-group derivation goes THROUGH the
  * declared joins: a changed dim row marks the groups its old and new
  * attribute values name, and the fact rows joining its keys; group
  * keys may live on the fact or on any declared dim (each key name
  * must be unique across the joined relations and selected through
  * unchanged). The derivation reconstructs the join as LEFT joins — a
  * conservative SUPERSET of the definition's own join (an inner
  * definition contributes no row where the left reconstruction pads
  * NULLs), so it can only recompute extra groups, never miss one;
  * NULL-keyed derivations are dropped (the definition's own output
  * keys are non-null by the create() contract). The recompute itself
  * restricts the FACT by the touched groups' fact-side keys and the
  * touched dim attributes' join keys (again a superset of the touched
  * groups' membership — every member row of a touched group is
  * included), then keeps exactly the touched groups' recomputed rows.
  * Multi-hop (dim-of-dim) definitions and group keys computed through
  * expressions are out of scope — the create() checks name both.
  *
  * Exactly-once by idempotence: the view commit lands BEFORE the
  * offsets advance, and a crash between the two re-runs the same
  * recompute against the same base/dim versions — same rows, same
  * fold. Group keys must be non-null columns selected through
  * unchanged (the keyed fold and the semi join are equality-keyed);
  * a NULL key in a non-join definition refuses with the fix named. */
object MaterializedView {

  private val StateSub = "_mvdef"

  /** A declared dimension of a join definition: the placeholder name
    * (`__DIM_<name>__` in the SQL), its manifest root, and the
    * equi-join key columns on each side (positionally paired). */
  final case class JoinDim(name: String, root: String,
                           factKeys: Seq[String], dimKeys: Seq[String])

  private final case class DimState(dim: JoinDim, lastVersion: Long)

  /** The view's definition + refresh offsets — a line-oriented sidecar
    * updated by atomic overwrite-rename (no Spark job for a metadata
    * write; the crash contract is idempotence, not the CAS). */
  private final case class Spec(baseRoot: String, defSql: String,
                                keyCols: Seq[String], lastVersion: Long,
                                dims: Seq[DimState])

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
    // defSql on line 3 (it may be long but never multi-line:
    // temp-view SQL with newlines is normalized at create); declared
    // dims follow, one per line, tab-separated
    val dims = lines.drop(4).filter(_.nonEmpty).toSeq.map { l =>
      val f = l.split('\t')
      DimState(JoinDim(f(0), f(1), f(2).split(",").toSeq,
        f(3).split(",").toSeq), f(4).toLong)
    }
    Spec(lines(0), lines(3), lines(1).split(",").toSeq,
      lines(2).toLong, dims)
  }

  private def writeSpec(spark: SparkSession, mvRoot: String,
                        spec: Spec): Unit = {
    val f = fs(spark, mvRoot)
    val p = statePath(mvRoot)
    f.mkdirs(p.getParent): Unit
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".spec.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write((Seq(spec.baseRoot, spec.keyCols.mkString(","),
      spec.lastVersion.toString, spec.defSql) ++
      spec.dims.map(d => Seq(d.dim.name, d.dim.root,
        d.dim.factKeys.mkString(","), d.dim.dimKeys.mkString(","),
        d.lastVersion.toString).mkString("\t"))).mkString("\n")
      .getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def dimPlaceholder(name: String): String = s"__DIM_${name}__"

  /** Run the definition over `base` (and dim) rows through
    * collision-free temp views; the placeholders keep the definition
    * free of any catalog/session coupling. */
  private def runDef(spark: SparkSession, defSql: String,
                     base: DataFrame,
                     dims: Seq[(String, DataFrame)] = Nil): DataFrame = {
    def fresh() = s"__graft_mv_${java.util.UUID.randomUUID().toString
      .replace("-", "")}"
    val bound = (("__BASE__", base) +:
      dims.map { case (n, df) => (dimPlaceholder(n), df) })
      .map { case (ph, df) => (ph, fresh(), df) }
    bound.foreach { case (_, v, df) => df.createOrReplaceTempView(v) }
    try spark.sql(bound.foldLeft(defSql) { case (sql, (ph, v, _)) =>
      sql.replace(ph, v) })
    finally bound.foreach { case (_, v, _) =>
      spark.catalog.dropTempView(v): Unit }
  }

  private def requireKeysNonNull(df: DataFrame, keyCols: Seq[String],
                                 what: String,
                                 advice: String = "coalesce the key in " +
                                   "the base or filter NULL groups in " +
                                   "the definition's WHERE"): Unit = {
    val bad = df.filter(keyCols.map(col(_).isNull).reduce(_ || _))
      .limit(1).count()
    require(bad == 0L,
      s"materialized-view group keys must be non-null ($what carries " +
        s"a NULL in ${keyCols.mkString(",")}) — $advice")
  }

  /** Where each group key lives: None = the fact, Some(name) = that
    * declared dim. Each key must resolve to exactly ONE relation —
    * the refresh derives and restricts by these columns unqualified. */
  private def keyResidence(spark: SparkSession, spec: Spec)
      : Map[String, Option[String]] = {
    val factCols = ManifestTable.tableSchema(spark, spec.baseRoot,
      ManifestTable.latestVersion(spark, spec.baseRoot)).fieldNames.toSet
    val dimCols = spec.dims.map(d => d.dim.name ->
      ManifestTable.tableSchema(spark, d.dim.root,
        ManifestTable.latestVersion(spark, d.dim.root))
        .fieldNames.toSet).toMap
    spec.keyCols.map { k =>
      val homes = (if (factCols.contains(k)) Seq(None) else Nil) ++
        dimCols.collect { case (n, cs) if cs.contains(k) => Some(n) }
      require(homes.nonEmpty,
        s"group key $k is not a column of the base or any declared " +
          "dim — keys must be table columns selected through unchanged")
      require(homes.length == 1,
        s"group key $k is ambiguous (lives on " +
          s"${homes.map(_.getOrElse("the base")).mkString(" and ")}) — " +
          "key names must be unique across the joined relations")
      k -> homes.head
    }.toMap
  }

  /** Create the view: validate the definition, run the INITIAL full
    * build at the base's (and dims') current heads (the one
    * legitimately table-sized pass), and commit it as a manifest table
    * tracking the group keys (so the refresh fold is file-granular on
    * the view side too). Returns the view's version 0. */
  def create(spark: SparkSession, mvRoot: String, baseRoot: String,
             defSql0: String, keyCols: Seq[String],
             dims: Seq[JoinDim] = Nil): Long = {
    // whitespace-normalized so the sidecar stays line-oriented (a
    // string literal carrying a LITERAL newline/tab would be altered —
    // write it as char(10)/char(9) in SQL instead)
    val defSql = defSql0.replaceAll("[\\s]+", " ").trim
    require(defSql.contains("__BASE__"),
      "the definition must reference the base table as __BASE__")
    require(keyCols.nonEmpty, "materialized views need group keys")
    require(!ManifestTable.exists(spark, mvRoot),
      s"manifest table at $mvRoot already exists")
    require(dims.map(_.name).distinct.length == dims.length,
      "declared dim names must be unique (alias the same root twice " +
        "under two names)")
    val vB = ManifestTable.latestVersion(spark, baseRoot)
    require(vB >= 0, s"no manifest table at $baseRoot")
    val baseSchema = ManifestTable.tableSchema(spark, baseRoot, vB)
    val dimStates = dims.map { d =>
      require(defSql.contains(dimPlaceholder(d.name)),
        s"declared dim ${d.name} is never referenced — the definition " +
          s"must read it as ${dimPlaceholder(d.name)}")
      require(d.factKeys.nonEmpty &&
        d.factKeys.length == d.dimKeys.length,
        s"dim ${d.name} needs positionally-paired factKeys/dimKeys")
      val vD = ManifestTable.latestVersion(spark, d.root)
      require(vD >= 0, s"no manifest table at ${d.root}")
      val dimSchema = ManifestTable.tableSchema(spark, d.root, vD)
      d.factKeys.foreach(k => require(baseSchema.fieldNames.contains(k),
        s"dim ${d.name} join key $k is not a base column"))
      d.dimKeys.foreach(k => require(dimSchema.fieldNames.contains(k),
        s"dim ${d.name} join key $k is not a dim column"))
      DimState(d, vD)
    }
    val spec = Spec(baseRoot, defSql, keyCols, vB, dimStates)
    keyResidence(spark, spec): Unit // refuses missing/ambiguous keys
    val built = runDef(spark, defSql,
      ManifestTable.readVersion(spark, baseRoot, vB),
      dimStates.map(d =>
        d.dim.name -> ManifestTable.readVersion(spark, d.dim.root,
          d.lastVersion)))
    keyCols.foreach(k => require(built.columns.contains(k),
      s"the definition's output must carry group key $k"))
    requireKeysNonNull(built, keyCols, "the initial build")
    val v = ManifestTable.create(built, mvRoot, keyCols)
    writeSpec(spark, mvRoot, spec)
    v
  }

  /** Incremental refresh. Returns the view's new version and how many
    * groups were recomputed, or None when neither the base nor any
    * declared dim has moved. Cost: changed-file reads (the deltas) +
    * the touched groups' base rows (runtime-filter-pruned scan) + a
    * keyed fold over the view's touched files. A view that lagged
    * past any table's retention refuses with the re-create contract
    * named (same as a lagged change-feed consumer). */
  def refresh(spark: SparkSession, mvRoot: String): Option[(Long, Long)] = {
    val spec = readSpec(spark, mvRoot)
    def headOf(root: String, last: Long, what: String): Long = {
      val vNow = ManifestTable.latestVersion(spark, root)
      require(vNow >= last,
        s"view offset $last is ahead of $what $root at $vNow — the " +
          "table was restored/vacuumed under the view; re-create it")
      require(ManifestTable.versions(spark, root).contains(last),
        s"view lagged past retention: version $last of $what $root " +
          "was vacuumed — re-create the view")
      vNow
    }
    val vNow = headOf(spec.baseRoot, spec.lastVersion, "base")
    val dimNow = spec.dims.map(d =>
      d.dim.name -> headOf(d.dim.root, d.lastVersion, s"dim ${d.dim.name}"))
      .toMap
    if (vNow == spec.lastVersion &&
        spec.dims.forall(d => dimNow(d.dim.name) == d.lastVersion))
      return None
    val residence = keyResidence(spark, spec)
    val factKeyCols = spec.keyCols.filter(k => residence(k).isEmpty)
    def dimDf(d: DimState, v: Long): DataFrame =
      ManifestTable.readVersion(spark, d.dim.root, v)

    // 1a. CHANGED ROWS of each table, old and new state — reads are
    //     bounded by each delta's files, with each side's deletion
    //     vectors applied
    def changedRows(root: String, from: Long, to: Long)
        : (Option[DataFrame], Option[DataFrame]) = {
      if (from == to) return (None, None)
      val (removed, added) = ManifestTable.changedFileStates(
        spark, root, from, to)
      def rowsOf(states: Seq[(String, Option[String], Long)], v: Long) =
        if (states.isEmpty) None
        else Some(ManifestTable.readFilesDv(spark,
          ManifestTable.tableSchema(spark, root, v),
          states.map(s => (s._1, s._2)), states.map(_._3).sum))
      (rowsOf(removed, from), rowsOf(added, to))
    }
    val (remF, addF) = changedRows(spec.baseRoot, spec.lastVersion, vNow)
    // per dim: the changed rows and the distinct JOIN-KEY values they
    // carry (old ∪ new) — every fact row joining one of these keys
    // may have changed its group or its contribution
    val dimDeltas = spec.dims.map { d =>
      val (remD, addD) = changedRows(d.dim.root, d.lastVersion,
        dimNow(d.dim.name))
      val changedKeys = (remD.map(_.select(d.dim.dimKeys.map(col): _*)) ++
        addD.map(_.select(d.dim.dimKeys.map(col): _*)))
        .reduceOption(_ unionByName _).map(_.distinct())
      (d, remD, addD, changedKeys)
    }

    // 1b. TOUCHED FACT ROWS on each side: the fact's own changed rows
    //     plus fact rows joining a changed dim key — the dim-key semi
    //     join is broadcast, so the runtime file filter prunes a
    //     join-key-clustered fact to the matching files
    def factSide(factRows: Option[DataFrame], v: Long): Option[DataFrame] = {
      val viaDims = dimDeltas.flatMap { case (d, _, _, ck) =>
        ck.map { keys =>
          ManifestTable.readVersion(spark, spec.baseRoot, v)
            .join(broadcast(keys.toDF(d.dim.factKeys: _*)),
              d.dim.factKeys, "left_semi")
        }
      }
      (factRows.toSeq ++ viaDims).reduceOption(_ unionByName _)
    }
    // 1c. TOUCHED GROUP KEYS: project the group keys of each side's
    //     touched fact rows — through the declared joins at that
    //     side's versions when keys live on a dim. LEFT joins make
    //     the derivation a superset of the definition's own join
    //     (extra groups recompute to their unchanged values or fold
    //     as no-op deletes — never a wrong answer); NULL-keyed
    //     derivations drop (join definitions) or refuse (plain).
    def keysOfSide(rows: Option[DataFrame],
                   dimAt: DimState => Long): Option[DataFrame] =
      rows.map { r =>
        val neededDims = spec.dims.filter(d =>
          spec.keyCols.exists(k => residence(k).contains(d.dim.name)))
        val joined = neededDims.foldLeft(r.as("__f")) { (acc, d) =>
          val keptCols = (d.dim.dimKeys ++ spec.keyCols.filter(k =>
            residence(k).contains(d.dim.name))).distinct
          val cond = d.dim.factKeys.zip(d.dim.dimKeys).map {
            case (fk, dk) =>
              col(s"__f.$fk") === col(s"__d_${d.dim.name}.$dk")
          }.reduce(_ && _)
          acc.join(
            dimDf(d, dimAt(d)).select(keptCols.map(col): _*)
              .as(s"__d_${d.dim.name}"), cond, "left")
        }
        joined.select(spec.keyCols.map { k =>
          residence(k) match {
            case None      => col(s"__f.$k")
            case Some(dim) => col(s"__d_$dim.$k")
          }
        }: _*)
      }
    val touchedRaw = (keysOfSide(factSide(remF, spec.lastVersion),
        d => d.lastVersion) ++
      keysOfSide(factSide(addF, vNow), d => dimNow(d.dim.name)))
      .reduceOption(_ unionByName _)
    val advanced = spec.copy(lastVersion = vNow,
      dims = spec.dims.map(d =>
        d.copy(lastVersion = dimNow(d.dim.name))))
    val touched = touchedRaw match {
      case None =>
        // metadata-only commits (evolution, rename, constraint):
        // no group can have changed — advance the offsets and stop
        writeSpec(spark, mvRoot, advanced)
        return Some((ManifestTable.latestVersion(spark, mvRoot), 0L))
      case Some(rows) =>
        // join definitions: NULL derivations are the LEFT
        // reconstruction's padding for rows an inner definition
        // contributes nothing for — dropped here; the definition's
        // OWN output is null-checked below. Plain definitions keep
        // the loud refusal (checked on the cached frame, one job
        // with the count).
        (if (spec.dims.isEmpty) rows
         else rows.na.drop("any", spec.keyCols)).distinct().cache()
    }
    // 2. RECOMPUTE exactly those groups from the heads. The fact scan
    //    restricts to a SUPERSET of the touched groups' membership —
    //    fact-resident keys semi-join directly; dim-resident keys map
    //    to the dims' join keys first — so every member row of every
    //    touched group is read (broadcast semi joins the runtime file
    //    filter prunes a clustered fact by), then exactly the touched
    //    groups' recomputed rows are kept.
    var factR = ManifestTable.readVersion(spark, spec.baseRoot, vNow)
    if (factKeyCols.nonEmpty)
      factR = factR.join(
        broadcast(touched.select(factKeyCols.map(col): _*).distinct()),
        factKeyCols, "left_semi")
    spec.dims.foreach { d =>
      val resident = spec.keyCols.filter(k =>
        residence(k).contains(d.dim.name))
      if (resident.nonEmpty) {
        val pks = dimDf(d, dimNow(d.dim.name))
          .join(broadcast(touched.select(resident.map(col): _*).distinct()),
            resident, "left_semi")
          .select(d.dim.dimKeys.map(col): _*).distinct()
        factR = factR.join(broadcast(pks.toDF(d.dim.factKeys: _*)),
          d.dim.factKeys, "left_semi")
      }
    }
    val recomputedAll = runDef(spark, spec.defSql, factR,
      spec.dims.map(d =>
        d.dim.name -> dimDf(d, dimNow(d.dim.name)))).cache()
    val recomputed = recomputedAll
      .join(broadcast(touched), spec.keyCols, "left_semi")
    try {
      val nTouched = touched.count()
      if (spec.dims.isEmpty)
        requireKeysNonNull(touched, spec.keyCols, "a changed base row")
      else
        // the definition itself produced a NULL group over the
        // restricted inputs — out of the non-null-key contract; a
        // silent skip here would let the view diverge forever. The
        // definition is frozen in the spec sidecar, so the remedy is
        // re-creation, named. (A NULL group whose member rows the
        // restriction cannot see — an outer-join definition padding
        // unmatched rows — stays the documented create()-time
        // contract: filter NULL groups in the definition's WHERE.)
        requireKeysNonNull(recomputedAll, spec.keyCols,
          "the definition's recomputed output",
          advice = "new base/dim rows fall outside the definition's " +
            "join (an outer definition padding NULL groups?) — " +
            "re-create the view with a definition that keeps keys " +
            "non-null (inner join on the declared keys, or a WHERE " +
            "filtering NULL groups)")
      // 3. ONE keyed CDC fold into the view: recomputed groups upsert,
      //    groups with no surviving rows delete. seq = the sum of the
      //    table versions this refresh reflects — strictly monotone
      //    across refreshes (any refresh advanced at least one).
      val mvSchema = ManifestTable.tableSchema(spark, mvRoot,
        ManifestTable.latestVersion(spark, mvRoot))
      val payload = mvSchema.fieldNames.filterNot(spec.keyCols.contains)
      val vanished = touched.join(
          recomputed.select(spec.keyCols.map(col): _*),
          spec.keyCols, "left_anti")
        .select(spec.keyCols.map(col) ++
          payload.map(c => lit(null).cast(mvSchema(c).dataType).as(c)): _*)
      val seqV = vNow + spec.dims.map(d => dimNow(d.dim.name)).sum
      val cdc = recomputed.withColumn("op", lit("I"))
        .unionByName(vanished.withColumn("op", lit("D")))
        .withColumn("seq", lit(seqV))
      val v = ManifestTable.applyCdc(cdc, mvRoot, spec.keyCols)
      // 4. offsets LAST: a crash above re-runs the same recompute
      //    against the same base/dim versions — idempotent by value
      writeSpec(spark, mvRoot, advanced)
      Some((v, nTouched))
    } finally { touched.unpersist(); recomputedAll.unpersist(): Unit }
  }
}
