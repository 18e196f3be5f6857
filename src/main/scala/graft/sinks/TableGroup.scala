package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE TRANSACTIONS — cross-table snapshot consistency over
  * manifest tables, the Nessie/catalog-commit model re-expressed on
  * graft's own CAS primitives:
  *
  * {{{
  *   TableGroup.create(spark, grp, Map("fact" -> factRoot,
  *                                     "dims" -> dimRoot))
  *   ... WAP per member: createBranch / write / audit ...
  *   TableGroup.publishBranches(spark, grp, "load")   // fact+dim, one tuple
  *   TableGroup.read(spark, grp, "fact")              // both-or-neither
  * }}}
  *
  * The group versions TUPLES of member versions: each commit writes
  * `tuples/<n>` (member→version lines) by CREATE-EXCLUSIVE — the same
  * file-creation CAS the ref store uses, so two racing group commits
  * serialize and the loser retries against the winner's tuple. A
  * GROUP READER resolves the current tuple once and reads every
  * member AT ITS PINNED VERSION: it can never observe a fact+dim pair
  * no single tuple names — the atomicity boundary the star-schema
  * write (fact append + dim upsert + join-MV refresh) needs.
  *
  * HONEST SCOPE — the consistency boundary is the GROUP, exactly as
  * in Nessie/Iceberg-with-a-transactional-catalog:
  *   - Per-table readers (plain `ManifestTable.read`) keep seeing each
  *     table's own head the moment it commits; only group reads get
  *     the cross-table guarantee.
  *   - [[publishBranches]] publishes each member branch by ITS OWN
  *     CAS, then advances the group tuple LAST: a crash mid-way
  *     leaves the tuple at the old consistent pair (group readers
  *     unaffected) and a re-run converges — per-member publishes are
  *     at-least-once by value, the tuple advance is exactly-once.
  *   - A group reader lagging behind member vacuums refuses loudly at
  *     the member read (the version is named), like any time-travel
  *     reader; vacuum members with enough `keep` to cover the group's
  *     readers, or re-commit the group to the heads.
  *
  * At 100 TB every operation here is metadata: tuple files are
  * tens of bytes, a group commit is one exclusive create, a group
  * read adds one tiny file read per query. */
object TableGroup {

  private val Spec = "_members"
  private val Tuples = "tuples"
  private val Pointer = "_LATEST"

  final case class Snapshot(version: Long, members: Map[String, Long])

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def p(root: String, sub: String) =
    new org.apache.hadoop.fs.Path(root, sub)

  private def readLines(spark: SparkSession, root: String,
                        sub: String): Option[Seq[String]] = {
    val f = fs(spark, root)
    val path = p(root, sub)
    if (!f.exists(path)) None
    else {
      val in = f.open(path)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .split('\n').toSeq.filter(_.nonEmpty))
      finally in.close()
    }
  }

  /** Register a group over existing manifest tables; tuple 0 pins the
    * members' CURRENT heads. Member names must be simple identifiers
    * (they key the tuple lines). */
  def create(spark: SparkSession, groupRoot: String,
             members: Map[String, String]): Long = {
    require(members.nonEmpty, "a table group needs members")
    members.foreach { case (n, root) =>
      require(n.matches("[A-Za-z_][A-Za-z0-9_-]*"),
        s"member name '$n' must be an identifier")
      require(ManifestTable.exists(spark, root),
        s"group member $n at $root is not a manifest table")
    }
    val f = fs(spark, groupRoot)
    require(!f.exists(p(groupRoot, Spec)),
      s"table group at $groupRoot already exists")
    f.mkdirs(p(groupRoot, Tuples)): Unit
    val spec = f.create(p(groupRoot, Spec), false)
    try spec.write(members.toSeq.sortBy(_._1)
      .map { case (n, r) => s"$n\t$r" }.mkString("\n").getBytes("UTF-8"))
    finally spec.close()
    val heads = members.map { case (n, r) =>
      n -> ManifestTable.latestVersion(spark, r) }
    writeTuple(spark, groupRoot, 0L, heads)
    0L
  }

  /** Member name → table root, from the group spec. */
  def members(spark: SparkSession, groupRoot: String)
      : Map[String, String] =
    readLines(spark, groupRoot, Spec).getOrElse(
      sys.error(s"no table group at $groupRoot — create() first"))
      .map { l => val f = l.split('\t'); f(0) -> f(1) }.toMap

  private def writeTuple(spark: SparkSession, groupRoot: String,
                         v: Long, vs: Map[String, Long]): Unit = {
    val f = fs(spark, groupRoot)
    // create-exclusive IS the CAS: a racing committer of the same
    // group version loses with FileAlreadyExists
    val out = f.create(p(groupRoot, s"$Tuples/$v"), false)
    try out.write(vs.toSeq.sortBy(_._1)
      .map { case (n, mv) => s"$n\t$mv" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // monotone pointer cache, best effort (the tuple listing wins)
    try {
      val tmp = p(groupRoot, s".$Pointer.tmp-${java.util.UUID.randomUUID()}")
      val o2 = f.create(tmp, true)
      try o2.write(v.toString.getBytes("UTF-8")) finally o2.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        p(groupRoot, Pointer).toUri,
        spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, p(groupRoot, Pointer),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch { case _: Exception => () }
  }

  private def latestTuple(spark: SparkSession, groupRoot: String): Long = {
    val f = fs(spark, groupRoot)
    val hint =
      readLines(spark, groupRoot, Pointer)
        .flatMap(_.headOption).flatMap(s =>
          try Some(s.trim.toLong) catch { case _: Exception => None })
        .getOrElse(-1L)
    // tuples are contiguous from 0 (each commit is prior+1 through
    // the create-exclusive CAS) — probe upward from the hint, never
    // a listing
    var v = math.max(hint, -1L)
    if (v < 0L && f.exists(p(groupRoot, s"$Tuples/0"))) v = 0L
    require(v >= 0L, s"table group at $groupRoot has no committed tuple")
    while (f.exists(p(groupRoot, s"$Tuples/${v + 1}"))) v += 1
    v
  }

  /** The group's tuple at `version`. */
  def snapshotAt(spark: SparkSession, groupRoot: String,
                 version: Long): Snapshot =
    Snapshot(version,
      readLines(spark, groupRoot, s"$Tuples/$version").getOrElse(
        sys.error(s"table group at $groupRoot has no tuple $version"))
        .map { l => val f = l.split('\t'); f(0) -> f(1).toLong }.toMap)

  /** The group's CURRENT consistent snapshot. */
  def snapshot(spark: SparkSession, groupRoot: String): Snapshot =
    snapshotAt(spark, groupRoot, latestTuple(spark, groupRoot))

  /** Read member `name` at the group's current tuple — the
    * cross-table-consistent read. A member whose pinned version was
    * vacuumed refuses loudly (named), like any time-travel read. */
  def read(spark: SparkSession, groupRoot: String,
           name: String): DataFrame = {
    val snap = snapshot(spark, groupRoot)
    val roots = members(spark, groupRoot)
    require(roots.contains(name),
      s"no member $name in the group at $groupRoot " +
        s"(members: ${roots.keys.toSeq.sorted.mkString(", ")})")
    require(snap.members.contains(name),
      s"group tuple ${snap.version} predates member $name — " +
        "commit a tuple naming it")
    ManifestTable.readVersion(spark, roots(name), snap.members(name))
  }

  /** Advance the group atomically: the next tuple is the current one
    * with `updates` applied. Members may only move FORWARD (a
    * backward pin is a restore — re-create the group deliberately).
    * Retries against a racing committer's tuple; the create-exclusive
    * write is the commit point. */
  def commit(spark: SparkSession, groupRoot: String,
             updates: Map[String, Long]): Long = {
    val roots = members(spark, groupRoot)
    updates.keys.foreach(n => require(roots.contains(n),
      s"no member $n in the group at $groupRoot"))
    var attempt = 0
    while (attempt < 12) {
      val cur = latestTuple(spark, groupRoot)
      val curVs = snapshotAt(spark, groupRoot, cur).members
      updates.foreach { case (n, v) =>
        require(curVs.get(n).forall(_ <= v),
          s"member $n may not move backward (tuple $cur pins " +
            s"${curVs(n)}, update says $v) — a rollback is a " +
            "deliberate re-create, not a commit")
      }
      try {
        writeTuple(spark, groupRoot, cur + 1L, curVs ++ updates)
        return cur + 1L
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          attempt += 1 // a racer landed cur+1 — re-read and retry
      }
    }
    sys.error(s"group commit at $groupRoot lost the CAS 12 times — " +
      "pathological contention")
  }

  /** The atomic star-schema publish: publish branch `branch` on EVERY
    * member that has it (fast-forward, or three-way when `merge`),
    * then advance the group tuple ONCE with all the published
    * versions. Until that single tuple commit, group readers keep the
    * previous consistent pair; per-member publishes are idempotent by
    * value, so a crash mid-way re-runs to the same end state. Members
    * without the branch carry their tuple version forward unchanged.
    * Returns the new group version. */
  def publishBranches(spark: SparkSession, groupRoot: String,
                      branch: String, merge: Boolean = false): Long = {
    val roots = members(spark, groupRoot)
    val published = roots.flatMap { case (n, root) =>
      ManifestTable.readRef(spark, root, branch) match {
        case Some(ManifestTable.BranchRef(_)) =>
          Some(n -> ManifestTable.publishBranch(spark, root, branch,
            merge = merge))
        case Some(ManifestTable.TagRef(_)) => sys.error(
          s"ref $branch on member $n is a tag — only branches publish")
        case None => None
      }
    }
    require(published.nonEmpty,
      s"no member of the group at $groupRoot has a branch named " +
        s"$branch — nothing to publish")
    commit(spark, groupRoot, published)
  }
}
