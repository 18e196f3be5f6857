package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Manifest-based table format — epochs as FILE LISTS, not physical
  * copies. [[VersionedTable]] commits every epoch as a full `epoch=N`
  * directory: simple and right for metadata-scale tables (stats,
  * offsets, indexes), but at 100 TB a 1-row delete would copy 100 TB.
  * This table commits an epoch as a MANIFEST — a tiny parquet of
  * (path, size, row_count, per-tracked-column min/max/null-count) —
  * so untouched data files carry forward BY REFERENCE and row-level
  * operations rewrite only the files their keys can possibly touch:
  * the Delta/Iceberg copy-on-write grain.
  *
  * Layout under `root/`:
  *   - `data/<uuid>/part-*.parquet` — immutable data files; each
  *     commit lands its new files under a fresh uuid directory. A
  *     data file is INVISIBLE until some manifest references it, so
  *     landing is not a commit and a crashed writer leaks at worst an
  *     unreferenced directory ([[vacuum]] sweeps it by TTL).
  *   - `_manifests/` — a [[VersionedTable]] whose epoch N IS this
  *     table's version N. All commit machinery is inherited: CAS
  *     rename claims, serializable read-modify-write via
  *     `tryCommitAs`, pointer cache, commit timestamps
  *     ([[VersionedTable.versionAtTimestamp]] works verbatim), vacuum
  *     of old manifests. The table schema rides as a JSON sidecar
  *     inside each manifest epoch (atomic with it), so empty tables
  *     and column order survive.
  *
  * The manifest rows are deliberately the [[graft.sources.FileStats]]
  * shape: the stats ARE the manifest, one commit, never out of sync
  * with the file list — the coverage-proof dance the external stats
  * epochs need ([[graft.plans.MetaAggRule]]) is structural here. The
  * same envelope-proof engine
  * ([[graft.plans.StatsPruneRule.excludedByEnvelopes]]) that prunes
  * reads decides which files a MERGE/DELETE/CDC batch must rewrite.
  *
  * Scale shape per operation (T = table files, B = batch, K = files
  * whose tracked-column envelopes intersect the batch's keys):
  *   - [[write]] (append): lands B, commits manifest ∪ B — cost ∝ B.
  *   - [[merge]] / [[applyCdc]]: ONE metadata-scale envelope join to
  *     find K, one scan+rewrite of K ∪ B, manifest swap — cost ∝
  *     K + B, never T. On a key-clustered layout ([[optimize]] with
  *     the key as sort column) K ≈ touched keys / keys-per-file; on a
  *     random layout K degrades toward T honestly.
  *   - [[deleteWhere]]: envelope proofs over the predicate select K;
  *     non-range predicates degrade to K = T (documented, sound).
  *   - [[deleteWhereMor]]: same selection, but touched files keep
  *     their bytes and gain a DELETION-VECTOR sidecar (bitset of dead
  *     row positions) — cost ∝ touched-file scan + deleted bits,
  *     nothing rewritten; reads apply vectors in the scan.
  *   - [[vacuum]]: refcount-aware — a data file is deleted only when
  *     NO retained manifest references it (and it is older than the
  *     staging TTL, so a concurrent writer's just-landed files are
  *     never swept).
  *
  * Track your merge/delete columns: `statsCols` (fixed at [[create]])
  * should contain the row-level keys and the hot query dimensions —
  * untracked columns have no envelopes, so they can't narrow K and
  * can't prune reads.
  */
object ManifestTable {

  private val ManifestsSub = "_manifests"
  private val SchemaSidecar = "_graft_schema.json"
  private val EqSidecar = "_graft_eqdeletes.tsv"
  private val ConstraintsSidecar = "_graft_constraints.tsv"
  private val NdvSidecar = "_graft_ndv.tsv"
  private val DvSub = "_dv"
  private val EqSub = "_eq"

  private[graft] def manifestsRoot(root: String): String = s"$root/$ManifestsSub"

  private[graft] def dvRoot(root: String): String = s"$root/$DvSub"

  private def eqRoot(root: String): String = s"$root/$EqSub"

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def canon(p: String): String = new Path(p).toUri.getPath

  /** Column form of the canonical-path identity every path join in
    * this file relies on: scheme AND authority dropped in two steps
    * ("hdfs://nn:8020/t/x" → "/t/x", "file:/tmp/x" → "/tmp/x" — a
    * single scheme-strip would leave "/nn:8020/…"). One definition,
    * shared by the landing join and the bloom refinement, so the two
    * sides of a path comparison can never desynchronize. */
  private def canonPathCol(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "^[a-zA-Z0-9+.-]+://[^/]*", ""),
      "^[a-zA-Z0-9+.-]+:(?=/)", "")

  /** Whether `root` holds a manifest table (vs a plain directory or a
    * [[VersionedTable]]). */
  def exists(spark: SparkSession, root: String): Boolean =
    VersionedTable.latestVersion(spark, manifestsRoot(root)) >= 0

  def latestVersion(spark: SparkSession, root: String): Long =
    VersionedTable.latestVersion(spark, manifestsRoot(root))

  def versions(spark: SparkSession, root: String): Seq[Long] =
    VersionedTable.versions(spark, manifestsRoot(root))

  def versionAtTimestamp(spark: SparkSession, root: String, tsMs: Long): Long =
    VersionedTable.versionAtTimestamp(spark, manifestsRoot(root), tsMs)

  /** The manifest of one version: (path, size, row_count, stats…,
    * dv_path, dv_rows, seq) — normalized so manifests committed before
    * the deletion-vector / sequence columns existed read with
    * `dv_path = NULL, dv_rows = 0, seq = 0` (each manifest epoch
    * stands alone schema-wise; the normalization is what lets every
    * consumer handle DVs and equality-delete ordering uniformly).
    * `seq` is the version at which the file was ADDED — the ordering
    * equality deletes apply by (a delete at seq s kills matching rows
    * only in files with seq < s); legacy files' seq 0 makes them
    * subject to every later delete, which is exactly their age. */
  def manifest(spark: SparkSession, root: String, version: Long): DataFrame = {
    var m = VersionedTable.readVersion(spark, manifestsRoot(root), version)
    if (!m.columns.contains("dv_path"))
      m = m.withColumn("dv_path", lit(null).cast("string"))
    if (!m.columns.contains("dv_rows"))
      m = m.withColumn("dv_rows", lit(0L))
    if (!m.columns.contains("seq")) m = m.withColumn("seq", lit(0L))
    else m = m.withColumn("seq", coalesce(col("seq"), lit(0L)))
    if (!m.columns.contains("bucket"))
      m = m.withColumn("bucket", lit(null).cast("long"))
    m
  }

  /** Collected-manifest cache: a committed manifest epoch is immutable,
    * so its [[manifest]] rows can be collected ONCE and every further
    * metadata accessor ([[filesAt]], [[rawFiles]], [[effectiveFiles]],
    * [[fileBuckets]], the DV-state reads) served driver-side — each of
    * those otherwise re-runs a Spark job over the same tiny parquet
    * (measured: 56 such jobs in one MV-refresh query). Keyed by (epoch
    * dir, mtime) like [[VersionedTable]]'s schema cache, so a deleted-
    * and-re-created root can never serve stale rows. Entries above
    * `LocalizeMaxRows` are NOT cached (a 100k-file manifest's stats
    * rows are real memory); past the bound behavior is exactly the
    * uncached read. */
  private val LocalizeMaxRows = 65536
  private val manifestRowsCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long),
        (StructType, Seq[org.apache.spark.sql.Row])](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long),
            (StructType, Seq[org.apache.spark.sql.Row])]): Boolean =
        size > 64
    })

  /** The full normalized manifest of one version, collected once per
    * immutable epoch (see [[manifestRowsCache]]). */
  private[graft] def manifestCollected(spark: SparkSession, root: String,
                                       version: Long)
      : (StructType, Seq[org.apache.spark.sql.Row]) = {
    val dir = new Path(s"${manifestsRoot(root)}/epoch=$version")
    val key =
      try {
        val st = fs(spark, root).getFileStatus(dir)
        Some((dir.toUri.toString, st.getModificationTime))
      } catch { case _: java.io.IOException => None }
    key.flatMap(k => Option(manifestRowsCache.get(k))) match {
      case Some(v) => v
      case None =>
        val m = manifest(spark, root, version)
        val v = (m.schema, m.collect().toSeq)
        if (v._2.length <= LocalizeMaxRows)
          key.foreach(k => manifestRowsCache.put(k, v): Unit)
        v
    }
  }

  // ------------------------------------------------------- bucketing
  //
  // Hash-bucketed layout for STORAGE-PARTITIONED JOINS: a table
  // created with `bucketBy = (key, n)` lands every file inside one of
  // n hash buckets (`pmod(hash(key), n)` — Spark's Murmur3, seed 42),
  // the manifest records each file's bucket, and the catalog scan
  // reports `KeyGroupedPartitioning(bucket(n, key))` with one input
  // partition per bucket — two tables bucketed the same way equi-join
  // on the key with NO shuffle on either side (the Iceberg bucket-SPJ
  // shape). The spec is frozen at create in the key field's schema
  // metadata, so every landing, rewrite, and maintenance re-lay
  // preserves the layout automatically.

  private val BucketKey = "graft.bucket"
  private val BucketPosKey = "graft.bucket.pos"

  /** The bucket-key fields in declared key order (a single-column key
    * carries no position; multi-column keys stamp `graft.bucket.pos`
    * on each participant). */
  private def bucketFields(schema: StructType)
      : Seq[org.apache.spark.sql.types.StructField] =
    schema.fields.filter(_.metadata.contains(BucketKey))
      .sortBy(f => if (f.metadata.contains(BucketPosKey))
        f.metadata.getLong(BucketPosKey) else 0L).toSeq

  /** The table's bucket spec — (PHYSICAL key columns in declared
    * order, bucket count) — or None for unbucketed tables. */
  private[graft] def bucketSpec(
      schema: StructType): Option[(Seq[String], Int)] = {
    val fs = bucketFields(schema)
    fs.headOption.map(h =>
      (fs.map(physicalName), h.metadata.getLong(BucketKey).toInt))
  }

  /** `bucketSpec` under the LOGICAL names — what the reported
    * partitioning must reference (join attributes are logical). */
  private[graft] def bucketSpecLogical(
      schema: StructType): Option[(Seq[String], Int)] = {
    val fs = bucketFields(schema)
    fs.headOption.map(h =>
      (fs.map(_.name), h.metadata.getLong(BucketKey).toInt))
  }

  /** Per-file bucket ids of one version — the scan-side grouping for
    * storage-partitioned joins (metadata-scale, like every manifest
    * read). */
  private[graft] def fileBuckets(spark: SparkSession, root: String,
                                 version: Long): Map[String, Long] = {
    val (schema, rows) = manifestCollected(spark, root, version)
    val (ip, ib) = (schema.fieldIndex("path"), schema.fieldIndex("bucket"))
    rows.filterNot(_.isNullAt(ib))
      .map(r => r.getString(ip) -> r.getLong(ib)).toMap
  }

  /** Stamp a bucket declaration into a schema (the [[create]] path).
    * `key` is one column name or a comma-separated list — each column
    * of a MULTI-COLUMN key hashes into its OWN n buckets and a file's
    * cell is the tuple (per-column transforms are the one shape
    * Spark's storage-partitioned joins accept — see
    * [[graft.sources.v2.GraftBucketing]]); each participant field
    * records its position so the declared order survives schema
    * round-trips. The total grid (n^k cells) is capped: every landing
    * writes up to one file per occupied cell. */
  private def withBucketSpec(schema: StructType, key: String,
                             n: Int): StructType = {
    require(n >= 2 && n <= 4096, s"bucket count must be in [2, 4096], got $n")
    val keys = key.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(keys.nonEmpty, "bucketBy needs at least one key column")
    require(math.pow(n.toDouble, keys.length.toDouble) <= 4096.0,
      s"bucket grid too large: $n^${keys.length} cells exceeds 4096 — " +
        "use a smaller per-column bucket count")
    require(keys.distinct.length == keys.length,
      s"duplicate bucket key columns: ${keys.mkString(", ")}")
    keys.foreach(k => require(schema.fieldNames.contains(k),
      s"bucket column $k is not a table column"))
    // the landing writes bucket ids through a `gb` partition column —
    // a real column of that name would be silently consumed by it
    require(!schema.fieldNames.contains("gb"),
      "bucketed tables reserve the column name 'gb' for the bucket " +
        "directory layout — rename that column")
    keys.foreach { k =>
      val dt = schema(k).dataType
      require(graft.sources.v2.GraftBucketFunction.supportedKeyType(dt),
        s"bucketBy supports integral/string/date/timestamp/decimal " +
          s"keys, got $dt for $k")
    }
    StructType(schema.fields.map { f =>
      if (!keys.contains(f.name)) f
      else {
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).putLong(BucketKey, n.toLong)
        if (keys.length > 1)
          mb.putLong(BucketPosKey, keys.indexOf(f.name).toLong)
        f.copy(metadata = mb.build())
      }
    })
  }

  // ------------------------------------------------ equality deletes
  //
  // The Iceberg-v2 streaming-upsert grain: a keyed merge can commit
  // the BATCH'S KEYS as an equality-delete file instead of scanning
  // the target for matched positions — write cost O(batch), zero
  // target reads. The deletes are applied at read (resolved into
  // ordinary deletion vectors over the envelope/bloom-touched subset,
  // cached per version) and materialized durably by [[compactEq]] /
  // the first row-level op / the maintenance tick.

  /** One pending equality delete: `path` holds the delete's key rows
    * (a parquet directory under `_eq/`), `seq` the version it
    * committed at (it applies to files with a SMALLER seq), `keys`
    * the logical key column names. */
  private[graft] final case class EqEntry(path: String, seq: Long,
                                          keys: Seq[String])

  /** The pending equality deletes committed with `version` — read off
    * the epoch's registry sidecar; absent sidecar = none (every
    * pre-eq epoch). */
  private[graft] def eqDeletes(spark: SparkSession, root: String,
                               version: Long): Seq[EqEntry] = {
    val p = new Path(s"${manifestsRoot(root)}/epoch=$version", EqSidecar)
    val f = fs(spark, root)
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    val txt = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
    txt.split('\n').filter(_.nonEmpty).toSeq.map { line =>
      val parts = line.split('\t')
      EqEntry(parts(1), parts(0).toLong, parts(2).split(',').toSeq)
    }
  }

  /** Registry sidecar writer for a manifest epoch's staging hook —
    * nothing written when empty (absence IS the empty registry). */
  private def stageEq(spark: SparkSession, root: String,
                      entries: Seq[EqEntry])(dir: String): Unit = {
    if (entries.isEmpty) return
    val f = fs(spark, root)
    val out = f.create(new Path(dir, EqSidecar), true)
    try out.write(entries.map(e =>
      s"${e.seq}\t${e.path}\t${e.keys.mkString(",")}")
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The table's CHECK constraints committed with `version` — (name,
    * boolean SQL expression) pairs off the epoch's sidecar; absent
    * sidecar = none. Constraints are table INVARIANTS: every landing
    * of new or transformed rows validates against them before its
    * commit ([[landFiles]]), so a version's data always satisfies its
    * version's constraints. */
  private[graft] def constraintsAt(spark: SparkSession, root: String,
                                   version: Long): Seq[(String, String)] = {
    val p = new Path(s"${manifestsRoot(root)}/epoch=$version",
      ConstraintsSidecar)
    val f = fs(spark, root)
    if (!f.exists(p)) return Nil
    val in = f.open(p)
    val txt = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
    txt.split('\n').filter(_.nonEmpty).toSeq.map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1))
    }
  }

  /** Constraints sidecar writer for the staging hook — absence IS the
    * empty set. */
  private def stageConstraints(spark: SparkSession, root: String,
                               cons: Seq[(String, String)])
                              (dir: String): Unit = {
    if (cons.isEmpty) return
    val f = fs(spark, root)
    val out = f.create(new Path(dir, ConstraintsSidecar), true)
    try out.write(cons.map { case (n, e) => s"$n\t$e" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Approximate per-column DISTINCT counts from the last
    * [[analyzeTable]] pass — PHYSICAL-keyed (stable under RENAME
    * COLUMN), carried forward commit to commit like any ANALYZE
    * statistic (they go stale as the table moves; re-run on the
    * maintenance tick). Absence is the empty map: the planner falls
    * back to its own defaults, never to a wrong number. */
  private[graft] def ndvAt(spark: SparkSession, root: String,
                           version: Long): Map[String, Long] = {
    val p = new Path(s"${manifestsRoot(root)}/epoch=$version", NdvSidecar)
    val f = fs(spark, root)
    if (!f.exists(p)) return Map.empty
    val in = f.open(p)
    val txt = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
    txt.split('\n').filter(_.nonEmpty).map { line =>
      val i = line.indexOf('\t')
      (line.substring(0, i), line.substring(i + 1).toLong)
    }.toMap
  }

  private def stageNdv(spark: SparkSession, root: String,
                       ndv: Map[String, Long])(dir: String): Unit = {
    if (ndv.isEmpty) return
    val f = fs(spark, root)
    val out = f.create(new Path(dir, NdvSidecar), true)
    try out.write(ndv.toSeq.sortBy(_._1)
      .map { case (c, n) => s"$c\t$n" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** ANALYZE: one distributed pass computing approximate distinct
    * counts (HLL, `approx_count_distinct`) for `columns` (default:
    * every atomic-typed column), committed as a metadata-only version
    * whose sidecar every later commit carries forward. This is the
    * number COST-BASED join planning runs on (min/max/nullCount
    * already come exact from the manifest's own envelopes — NDV is
    * the one statistic that needs a data pass): with
    * `spark.sql.cbo.enabled` the scan reports it through the DSv2
    * column-statistics surface and join reorder/strategy sees real
    * cardinalities instead of defaults. Cost: ONE scan of the live
    * rows, all columns folded in the same pass. */
  def analyzeTable(spark: SparkSession, root: String,
                   columns: Seq[String] = Nil): Long = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist")
    val schema = tableSchema(spark, root, v)
    val atomic = schema.fields.filter { f =>
      import org.apache.spark.sql.types._
      f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => false
        case _ => true
      }
    }.map(_.name).toSeq
    val cols = if (columns.nonEmpty) columns else atomic
    cols.foreach(c => require(atomic.contains(c),
      s"analyzeTable: $c is not an atomic-typed table column"))
    val row = readVersion(spark, root, v)
      .agg(approx_count_distinct(col(cols.head)).as(cols.head),
        cols.tail.map(c => approx_count_distinct(col(c)).as(c)): _*)
      .head()
    val ndv = cols.map(c =>
      physicalFor(schema, c) -> row.getAs[Long](c)).toMap
    commitLoopEvolving(spark, root, ndvReg = _ => ndv) { base =>
      (manifest(spark, root, base), tableSchema(spark, root, base))
    }
  }

  /** Top-level column names a constraint expression references —
    * parsed, not analyzed (the check callers guard evolution, where
    * the expression may no longer resolve). */
  private def constraintRefs(spark: SparkSession, exprSql: String)
      : Set[String] =
    spark.sessionState.sqlParser.parseExpression(exprSql).collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        u.nameParts.head
    }.toSet

  /** One-pass violation probe over freshly landed files: read them
    * under the attempt's schema (physical names on disk, logical
    * names for the expressions), flag every constraint in one scan,
    * and refuse on the first violating row — SQL CHECK semantics:
    * only FALSE violates, NULL passes (enforce non-null with an
    * explicit `c IS NOT NULL` constraint). A refusal commits
    * NOTHING; the already-landed files stay unreferenced until
    * vacuum's TTL sweep, the same contract as a failed CTAS. */
  private def validateConstraints(spark: SparkSession, files: Seq[String],
                                  schema: StructType,
                                  cons: Seq[(String, String)]): Unit = {
    val logical = spark.read.schema(toPhysical(schema))
      .parquet(files: _*)
      .select(schema.fields.toIndexedSeq.map(f =>
        col(physicalName(f)).as(f.name)): _*)
    val flagged = logical.select(cons.map { case (n, e) =>
      (expr(e) <=> lit(false)).as(n) }: _*)
    val bad = flagged
      .filter(cons.map(c => col(c._1)).reduce(_ || _))
      .limit(1).collect()
    bad.headOption.foreach { r =>
      val broken = cons.filter { case (n, _) => r.getAs[Boolean](n) }
      sys.error("CHECK constraint violated by the batch — nothing " +
        "committed: " +
        broken.map { case (n, e) => s"$n ($e)" }.mkString(", "))
    }
  }

  /** ADD CONSTRAINT — a table-level CHECK invariant (`NOT NULL` is
    * spelled `c IS NOT NULL`): first proves EVERY existing live row
    * satisfies it (one scan, inside the CAS attempt, so a racing
    * write re-validates), then commits the widened registry as a
    * normal metadata-only version. From then on every commit that
    * lands rows — append, overwrite, MERGE, UPDATE, CDC, streaming
    * batches — validates them BEFORE committing
    * ([[commitLoopEvolvingOpt]]): a violating batch refuses with
    * nothing committed, the Delta CHECK-constraint contract. Cost at
    * scale: one extra read of each commit's OWN batch (never the
    * table), and the registry rides the existing sidecar staging. */
  def addConstraint(spark: SparkSession, root: String, name: String,
                    exprSql: String): Long =
    addConstraints(spark, root, Seq((name, exprSql)))

  /** [[addConstraint]] for a whole SET in ONE commit — the atomic
    * form an inline `CREATE TABLE (…, CONSTRAINT …, CONSTRAINT …)`
    * needs: every declaration validates against the same base before
    * anything commits, so a refused later constraint never strands an
    * earlier one on the table (which matters doubly when the CREATE
    * adopted a PRE-EXISTING location — a partial landing would gate a
    * table the failed statement never owned). One scan proves the
    * whole set over the existing live rows. */
  def addConstraints(spark: SparkSession, root: String,
                     cons: Seq[(String, String)]): Long = {
    require(cons.nonEmpty, "addConstraints requires at least one")
    cons.foreach { case (name, exprSql) =>
      require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"constraint name '$name' must be an identifier " +
          "([A-Za-z_][A-Za-z0-9_]*)")
      require(!exprSql.exists(c => c == '\n' || c == '\t'),
        "constraint expressions must not contain newlines or tabs") }
    require(cons.map(_._1).distinct.length == cons.length,
      s"duplicate constraint names in one set: " +
        cons.map(_._1).mkString(", "))
    commitLoop(spark, root,
      consReg = base => constraintsAt(spark, root, base) ++ cons) { base =>
      val existing = constraintsAt(spark, root, base)
      val schema = tableSchema(spark, root, base)
      cons.foreach { case (name, exprSql) =>
        require(!existing.exists(_._1 == name),
          s"constraint $name already exists on $root")
        val resolved = resolveCond(spark, expr(exprSql), schema)
        require(resolved.deterministic,
          s"constraint $name must be deterministic — it re-evaluates " +
            "on every future batch")
        require(resolved.collectFirst {
          case s: org.apache.spark.sql.catalyst.expressions
            .SubqueryExpression => s }.isEmpty,
          s"constraint $name must not contain subqueries")
      }
      val flags = cons.map { case (n, e) => (expr(e) <=> lit(false)).as(n) }
      val bad = readVersion(spark, root, base).select(flags: _*)
        .filter(cons.map(c => col(c._1)).reduce(_ || _))
        .limit(1).collect()
      bad.headOption.foreach { r =>
        val broken = cons.filter { case (n, _) => r.getAs[Boolean](n) }
        sys.error("cannot add constraint(s) " +
          broken.map { case (n, e) => s"$n ($e)" }.mkString(", ") +
          ": existing rows violate them")
      }
      manifest(spark, root, base)
    }
  }

  /** SET/DROP a column's CURRENT default — metadata-only, affecting
    * FUTURE inserts only: existing rows keep their EXISTS snapshot
    * (the value the column was added under, if any), the Spark/Delta
    * contract. `default = None` drops the current default. The SQL
    * text must fold to a constant of the column's type — validated by
    * Spark's own fold before anything commits. */
  def setColumnDefault(spark: SparkSession, root: String, name: String,
                       default: Option[String]): Long =
    commitLoopEvolving(spark, root) { base =>
      val schema = tableSchema(spark, root, base)
      require(schema.fieldNames.contains(name),
        s"column $name does not exist")
      val keys = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      val next = StructType(schema.fields.map { f =>
        if (f.name != name) f
        else {
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
          default match {
            case Some(sql) =>
              require(sql.nonEmpty, "SET DEFAULT requires an expression")
              // validation only: the fold throws on a non-constant or
              // type-incompatible expression; the EXISTS snapshot (if
              // any) is NOT rewritten — old rows keep reading the
              // value their evolution declared
              keys.constantFoldCurrentDefaultsToExistDefaults(
                StructType(Seq(f.copy(metadata =
                  new org.apache.spark.sql.types.MetadataBuilder()
                    .putString(keys.CURRENT_DEFAULT_COLUMN_METADATA_KEY,
                      sql).build()))),
                "ALTER TABLE ALTER COLUMN"): Unit
              f.copy(metadata = mb.putString(
                keys.CURRENT_DEFAULT_COLUMN_METADATA_KEY, sql).build())
            case None =>
              f.copy(metadata = mb.remove(
                keys.CURRENT_DEFAULT_COLUMN_METADATA_KEY).build())
          }
        }
      })
      (manifest(spark, root, base), next)
    }

  /** DROP CONSTRAINT — metadata-only removal of one named invariant;
    * refuses an unknown name (a silently-ignored typo would leave the
    * real constraint enforced against the user's belief) unless
    * `ifExists`, whose absent-name no-op decision runs INSIDE the CAS
    * attempt: two racing `IF EXISTS` drops both succeed (the loser
    * abstains with None) instead of the loser throwing. */
  def dropConstraint(spark: SparkSession, root: String, name: String,
                     ifExists: Boolean = false): Option[Long] =
    commitLoopEvolvingOpt(spark, root,
      consReg = base => constraintsAt(spark, root, base)
        .filterNot(_._1 == name)) { base =>
      if (!constraintsAt(spark, root, base).exists(_._1 == name)) {
        if (ifExists) None
        else sys.error(s"constraint $name does not exist on $root")
      } else Some((manifest(spark, root, base),
        tableSchema(spark, root, base)))
    }

  /** Tracked stats columns, read off the manifest's own schema. */
  def statsCols(spark: SparkSession, root: String, version: Long): Seq[String] =
    manifest(spark, root, version).schema.fieldNames.toSeq
      .filter(_.endsWith("_min")).map(_.stripSuffix("_min"))

  /** The table schema committed with `version`'s manifest. */
  def tableSchema(spark: SparkSession, root: String, version: Long): StructType = {
    val p = new Path(s"${manifestsRoot(root)}/epoch=$version", SchemaSidecar)
    val f = fs(spark, root)
    require(f.exists(p),
      s"manifest epoch $version of $root has no schema sidecar")
    val in = f.open(p)
    val json = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
    org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[StructType]
  }

  // ------------------------------------------------- column mapping
  //
  // RENAME COLUMN is metadata-only via Delta-style name mapping: a
  // field's PHYSICAL name — the name data files and manifest stat
  // columns actually carry — is frozen at birth and recorded in the
  // schema sidecar's field metadata under `graft.physical` the first
  // time it diverges from the logical name. Unmapped tables (no
  // rename ever) have physical == logical everywhere and every
  // mapping helper is the identity — existing tables stay readable
  // with zero behavior change, and their data files remain
  // plain-parquet readable under their logical names.

  private val PhysicalKey = "graft.physical"

  /** The name this field's data lives under in parquet files and
    * manifest stat columns. */
  private[graft] def physicalName(
      f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  private[graft] def physicalFor(schema: StructType, logical: String): String =
    schema.fields.find(_.name == logical).map(physicalName).getOrElse(logical)

  /** A field's TYPE as data files carry it: nested struct fields
    * renamed to their physical names, recursively (NESTED column
    * mapping — struct members evolve by the same frozen-physical-name
    * machinery as top-level columns). Arrays and maps recurse into
    * their element/value types. */
  private[graft] def physicalType(
      dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(name = physicalName(f), dataType = physicalType(f.dataType))))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = physicalType(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = physicalType(m.valueType))
    case other => other
  }

  /** The schema as data files carry it: fields renamed to their
    * physical names at EVERY nesting level (nullability/metadata
    * unchanged). */
  private[graft] def toPhysical(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(name = physicalName(f), dataType = physicalType(f.dataType))))

  /** Nullability-relaxed copy of a type — rename-only struct casts
    * must not try to narrow to NOT NULL (Cast refuses). */
  private def relaxedType(
      dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(nullable = true, dataType = relaxedType(f.dataType))))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = relaxedType(a.elementType))
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(valueType = relaxedType(m.valueType))
    case other => other
  }

  private def typeHasMapping(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case s: StructType => s.fields.exists(f =>
      physicalName(f) != f.name || typeHasMapping(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType =>
      typeHasMapping(a.elementType)
    case m: org.apache.spark.sql.types.MapType =>
      typeHasMapping(m.valueType)
    case _ => false
  }

  private[graft] def hasMapping(schema: StructType): Boolean =
    schema.fields.exists(f =>
      physicalName(f) != f.name || typeHasMapping(f.dataType))

  /** Rename a LOGICAL-named frame to physical names for landing —
    * identity when the table carries no mapping. Nested mappings
    * rename through a CAST to the physical type (struct casts are
    * positional, so same-shaped types rename losslessly). */
  private def physSelect(df: DataFrame, schema: StructType): DataFrame =
    if (!hasMapping(schema)) df
    else df.select(schema.fields.toIndexedSeq.map { f =>
      val c =
        if (typeHasMapping(f.dataType))
          // rename-only positional cast; relaxed nullability (a cast
          // may not narrow to NOT NULL)
          col(f.name).cast(relaxedType(physicalType(f.dataType)))
        else col(f.name)
      c.as(physicalName(f))
    }: _*)

  /** Rewrite a resolved row-local expression's attribute names
    * logical→physical — the form the manifest's stat columns and the
    * pruning proofs speak. */
  private def toPhysicalExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      schema: StructType)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    if (!hasMapping(schema)) return e
    val m = schema.fields.map(f => f.name -> physicalName(f)).toMap
    e.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
          if m.contains(a.name) && m(a.name) != a.name =>
        a.withName(m(a.name))
    }
  }

  /** Data-file paths of one version (driver-side: |files| strings —
    * metadata scale, the same bound every manifest read has). */
  def filesAt(spark: SparkSession, root: String, version: Long): Seq[String] = {
    val (schema, rows) = manifestCollected(spark, root, version)
    val i = schema.fieldIndex("path")
    rows.map(_.getString(i)).sorted
  }

  /** Read one version: the manifest's files, with the committed
    * schema. An empty manifest reads as an empty frame.
    *
    * Routed through `format("graft")` so the direct API plans exactly
    * like the DSv2/catalog path: the scan's listing comes from the
    * manifest via `GraftManifestFileIndex` — ZERO filesystem calls at
    * planning (a |files|-long root list handed to spark.read.parquet
    * would stat every file), plus the manifest-envelope and bloom
    * pruning the source runs on pushed filters. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    if (filesAt(spark, root, version).isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        tableSchema(spark, root, version))
    spark.read.format("graft")
      .option("versionAsOf", version.toString).load(root)
  }

  /** Read the current version. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root has no committed version")
    readVersion(spark, root, v)
  }

  // ---------------------------------------------------------------- commits

  /** Land `df`'s rows as fresh immutable data files and return their
    * manifest rows (path, size, row_count, envelopes). Not a commit:
    * the files are invisible until a manifest referencing them wins
    * the CAS. */
  /** The manifest-row schema for a table of `dataSchema` tracking
    * `stats` columns — needed to commit an EMPTY manifest (a created-
    * but-unloaded table) without any file to derive it from. */
  private def manifestSchema(dataSchema: StructType,
                             stats: Seq[String]): StructType = {
    import org.apache.spark.sql.types._
    StructType(
      (StructField("path", StringType) ::
      StructField("size", LongType) ::
      StructField("row_count", LongType) ::
      stats.toList.flatMap { c =>
        val dt = dataSchema(c).dataType
        Seq(StructField(s"${c}_min", dt), StructField(s"${c}_max", dt),
          StructField(s"${c}_nulls", LongType))
      }) :+ StructField("dv_path", StringType) :+
        StructField("dv_rows", LongType) :+ StructField("seq", LongType) :+
        StructField("bucket", LongType))
  }

  private def landFiles(df: DataFrame, root: String,
                        stats: Seq[String],
                        bucketAs: Option[Option[(String, Int)]] = None,
                        sortWithin: Seq[String] = Nil)
      : DataFrame = {
    val spark = df.sparkSession
    val dir = s"$root/data/${java.util.UUID.randomUUID().toString}"
    // a bucketed table's EVERY landing routes rows to their hash
    // bucket (the spec is frozen in the schema sidecar, so appends,
    // rewrites, and re-lays all preserve the layout): bucket ids
    // become `gb=<b>` partition directories — one repartition by the
    // bucket id first puts each bucket wholly in one task, so a
    // landing writes at most n files, and the directory component is
    // what the manifest's per-file `bucket` column reads back.
    // `bucketAs` overrides the table lookup EXPLICITLY — Some(None)
    // means "definitely unbucketed" (the RTAS schema-replace, whose
    // new schema carries no claim and may lack the old key entirely).
    // normalize both sources to (key columns, n): an explicit
    // bucketAs carries the CREATE declaration's comma-joined logical
    // names (logical == physical on a fresh table); the table lookup
    // serves physical names, which is what a landing frame speaks
    val bucket: Option[(Seq[String], Int)] = bucketAs match {
      case Some(b) => b.map { case (k, n) =>
        (k.split(",").map(_.trim).filter(_.nonEmpty).toSeq, n) }
      case None =>
        if (exists(spark, root))
          bucketSpec(tableSchema(spark, root, latestVersion(spark, root)))
        else None
    }
    bucket match {
      case Some((ks, n)) =>
        // each key hashes INDEPENDENTLY into n buckets; the landed id
        // is the grid cell's composite (b1·n^(k−1) + … + bk) — the
        // per-column shape storage-partitioned joins require
        // ([[graft.sources.v2.GraftBucketing]])
        val cell = ks.map(k => pmod(hash(col(k)), lit(n)))
          .reduceLeft((acc, b) => acc * n + b)
        val cells = math.pow(n.toDouble, ks.length.toDouble).toInt
        // the cell shuffle would DESTROY any clustering the caller
        // laid (optimize's range-sort) — a re-lay's in-bucket order
        // re-establishes inside each cell's task, so the bucket
        // file's row groups stay page-prunable on the sort columns
        val routed = df.withColumn("gb", cell)
          .repartition(cells, col("gb"))
        (if (sortWithin.isEmpty) routed
         else routed.sortWithinPartitions(
           (col("gb") +: sortWithin.map(col)): _*))
          .write.partitionBy("gb").parquet(dir)
      case None => df.write.parquet(dir)
    }
    val sizes = graft.sources.FileManifest.listFiles(spark, dir)
      .select(col("path"), col("size"))
    if (sizes.isEmpty) // an empty frame writes no data files
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        manifestSchema(df.schema, stats))
    // stats come from parquet FOOTERS when every tracked column's type
    // records them — |files| metadata reads, NOT a second scan of the
    // data just written (the landing was already one full write; at
    // scale the re-scan would double every commit's I/O). Unsupported
    // types fall back to the exact re-scan; footer "unknown" cells
    // land as NULL, which every consumer treats as
    // can't-prove-anything (pruning keeps, touched-file search
    // rewrites) — sound either way.
    val footersOk = stats.nonEmpty &&
      stats.forall(c => graft.sources.FooterStats.supported(df.schema(c).dataType))
    // DRIVER-SIDE landing-row assembly for small landings: under the
    // (conf'able) file-count bound the footer reads are a few KB each —
    // far below the scheduling cost of the footer job + the broadcast
    // join of the distributed path (measured: one job + one broadcast
    // build per commit, across every table-format query). The result is
    // a LocalRelation, value-identical to the joined frame below: same
    // FooterStats.fileRow fold, same row_count>0 filter, same
    // manifestSchema shape (the empty-landing return already commits
    // through it). Above the bound — a real cluster commit landing
    // thousands of files — the distributed path is untouched.
    val localFooterMax = spark.conf.getOption(
      "spark.graft.landing.localFooterMaxFiles").map(_.toInt).getOrElse(64)
    if (footersOk) {
      val files = sizes.select(col("path")).collect().map(_.getString(0)).toSeq
      if (files.size <= localFooterMax) {
        val sizeByPath = sizes.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val colTypes = stats.map(c => c -> df.schema(c).dataType)
        val hconf = spark.sparkContext.hadoopConfiguration
        val bucketOf: String => Any = bucket match {
          case None => _ => null
          case Some(_) => p =>
            "/gb=(\\d+)/[^/]+$".r.findFirstMatchIn(p)
              .map(m => java.lang.Long.valueOf(m.group(1).toLong))
              .getOrElse(sys.error(
                "bucketed landing produced a file outside a gb=N " +
                  s"directory: $p"))
        }
        val outRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
        files.foreach { p =>
          val fr = graft.sources.FooterStats.fileRow(p, hconf, colTypes)
          if (fr.getLong(1) > 0L)
            outRows.add(org.apache.spark.sql.Row.fromSeq(
              Seq[Any](p, sizeByPath(p), fr.getLong(1)) ++
                (2 until fr.length).map(fr.get) ++
                Seq[Any](null, 0L, null, bucketOf(p))))
        }
        return spark.createDataFrame(outRows, manifestSchema(df.schema, stats))
      }
    }
    val collected =
      if (footersOk) {
        val files = sizes.select(col("path")).collect().map(_.getString(0)).toSeq
        graft.sources.FileStats.collectFooters(spark, files, df.schema, stats)
      } else if (stats.isEmpty)
        spark.read.parquet(dir).groupBy(input_file_name().as("path"))
          .agg(count(lit(1)).as("row_count"))
      else graft.sources.FileStats.collect(spark, dir, stats)
    // canonical path identity on both sides (listFiles emits
    // toUri.getPath; input_file_name emits a scheme'd URI; footer rows
    // carry the listing's own paths) — [[canonPathCol]]: a mismatch
    // here would silently commit a manifest referencing NONE of the
    // batch's files. Zero-row write partitions produce no stats
    // group, so the inner join is also the empty-file filter — such
    // files stay on disk, unreferenced, until vacuum's TTL sweep
    val withCanon = collected.withColumn("path", canonPathCol(col("path")))
    // footer rows surface 0-row files (an empty replacement write);
    // they never enter the manifest. Freshly landed files carry no
    // deletion vector by construction.
    sizes.join(withCanon, Seq("path")).filter(col("row_count") > 0)
      .withColumn("dv_path", lit(null).cast("string"))
      .withColumn("dv_rows", lit(0L))
      // the ADDED-AT version is the commit's to decide — the commit
      // loop stamps NULL seq with its own attempt's version
      .withColumn("seq", lit(null).cast("long"))
      .withColumn("bucket",
        if (bucket.isEmpty) lit(null).cast("long")
        else {
          // the bucket id reads off the directory component DIRECTLY
          // ABOVE the file name (the landing's own partitionBy dir) —
          // an unanchored match could pick a 'gb=<digits>' in the
          // table-root path and silently stamp every file with a
          // wrong bucket. A bucketed landing whose file lacks the
          // component is a layout bug: fail the commit loudly.
          val b = regexp_extract(col("path"), "/gb=(\\d+)/[^/]+$", 1)
          when(b === "", raise_error(concat(
            lit("bucketed landing produced a file outside a gb=N " +
              "directory: "), col("path"))))
            .otherwise(b).cast("long")
        })
  }

  /** Strip the column-mapping metadata off a schema that came from
    * READING a mapped table — a NEW table built from that schema
    * (CTAS/RTAS) writes fresh files under the logical names, so a
    * carried-over mapping would point its sidecar at physical names
    * its own files never had. Recurses to EVERY nesting level:
    * nested-evolved struct members carry their frozen physical names
    * inside the dataType, and a top-level-only strip would leave the
    * new table requesting member names its own files never carried
    * (every such member would silently read NULL). */
  private def freshSchema(schema: StructType): StructType = {
    def freshType(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = dt match {
      case s: StructType => StructType(s.fields.map(freshField))
      case a: org.apache.spark.sql.types.ArrayType =>
        a.copy(elementType = freshType(a.elementType))
      case m: org.apache.spark.sql.types.MapType =>
        m.copy(valueType = freshType(m.valueType))
      case other => other
    }
    def freshField(f: org.apache.spark.sql.types.StructField)
        : org.apache.spark.sql.types.StructField = {
      val cleaned =
        if (!f.metadata.contains(PhysicalKey) &&
            !f.metadata.contains(BucketKey) &&
            !f.metadata.contains(BucketPosKey)) f.metadata
        else new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).remove(PhysicalKey)
          .remove(BucketKey) // a CTAS write is NOT bucketed
          .remove(BucketPosKey).build()
      f.copy(metadata = cleaned, dataType = freshType(f.dataType))
    }
    StructType(schema.fields.map(freshField))
  }

  /** Content replace that may also REPLACE THE SCHEMA — the RTAS /
    * overwriteSchema shape: land the batch and commit (batch rows,
    * batch schema) as the next version. Prior versions stay readable
    * under their own sidecars; tracked stats carry forward for
    * columns the new schema still names; the stream replay marker
    * resets exactly like [[overwrite]] (a full replace is a stream
    * restart). */
  def overwriteAs(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist — create() first")
    val schema = freshSchema(df.schema)
    val stats = statsCols(spark, root, v).filter(schema.fieldNames.contains)
    // the REPLACED schema carries no bucket claim (freshSchema), so
    // the landing must not inherit the old layout either — its key
    // may not even exist in the new schema
    val rows = landFiles(df, root, stats, bucketAs = Some(None))
    // a full content replace retires pending equality deletes with
    // the content they applied to; the REPLACED table definition also
    // starts constraint-free (the old invariants may reference
    // columns the new schema lacks — RTAS re-declares, not inherits)
    commitLoopEvolving(spark, root, extraStage =
      VersionedTable.stampBatch(spark, manifestsRoot(root), -1L),
      eqReg = _ => Nil, consReg = _ => Nil) { _ =>
      (rows, schema)
    }
  }

  /** Conform an append batch to the table schema: order by the
    * sidecar's column order, CAST each column to its declared type
    * (the Delta-style implicit safe cast), and RENAME to the field's
    * physical name — a same-name/compatible batch lands with the
    * table's exact physical types under the stable physical column
    * names, so schema-on-read can never meet a file whose parquet
    * types or names drifted; an incompatible type fails analysis. */
  private def conform(df: DataFrame, schema: StructType): DataFrame =
    // casting to the PHYSICAL type routes nested struct members to
    // their frozen physical names (struct casts rename positionally);
    // identical for unmapped tables
    df.select(schema.fields.toIndexedSeq.map(f =>
      col(f.name).cast(relaxedType(physicalType(f.dataType)))
        .as(physicalName(f))): _*)

  /** Schema sidecar writer for a manifest epoch's staging hook. */
  private def stageSchema(spark: SparkSession, root: String,
                          schema: StructType)(dir: String): Unit = {
    val f = fs(spark, root)
    val out = f.create(new Path(dir, SchemaSidecar), true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  /** Create the table with its first rows and the FIXED set of
    * tracked stats columns. Fails if the table already exists.
    * `bucketBy = Some((key, n))` freezes a hash-bucket layout (see
    * [[bucketSpec]]) that every later landing preserves and the
    * catalog scan reports for storage-partitioned joins; `key` may be
    * a comma-separated list for a multi-column bucket key. */
  def create(df: DataFrame, root: String, statsCols: Seq[String],
             bucketBy: Option[(String, Int)] = None): Long = {
    val spark = df.sparkSession
    require(!exists(spark, root), s"manifest table at $root already exists")
    statsCols.foreach(c => require(df.columns.contains(c),
      s"stats column $c is not a table column"))
    // a fresh table writes fresh files — a column mapping (or bucket
    // claim) carried in from READING another table must not leak
    val schema = bucketBy match {
      case Some((k, n)) => withBucketSpec(freshSchema(df.schema), k, n)
      case None         => freshSchema(df.schema)
    }
    val rows = landFiles(df, root, statsCols, bucketAs = Some(bucketBy))
    VersionedTable.writeStaged(rows, manifestsRoot(root))(
      stageSchema(spark, root, schema))
  }

  /** Append commit: land the batch, commit current-manifest ∪ batch.
    * Racing appends serialize through the manifest CAS — both batches
    * survive (the rewrite loop unions against whatever base won). */
  def write(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist — create() first")
    val schema = tableSchema(spark, root, v)
    require(df.columns.sorted.sameElements(schema.fieldNames.sorted),
      s"append schema ${df.columns.sorted.mkString(",")} != table " +
        s"schema ${schema.fieldNames.sorted.mkString(",")}")
    val rows = landFiles(conform(df, schema), root, statsCols(spark, root, v))
    commitLoop(spark, root) { base =>
      manifest(spark, root, base).unionByName(rows)
    }
  }

  /** WRITE-SIDE SCHEMA EVOLUTION — the Delta `mergeSchema` shape: one
    * append both EVOLVES the table and lands the batch. The incoming
    * frame may carry new top-level columns, new STRUCT members (one
    * level — the grain the nested-evolution machinery serves), and
    * losslessly WIDER primitive types; each becomes the matching
    * metadata-only evolution commit (fresh physical names so stale
    * bytes in live files can never resurrect; narrow stat triplets
    * cast — see [[alterColumns]] / [[alterNestedColumns]] /
    * [[widenColumnType]]) and the batch then lands under the evolved
    * schema with the table's absent columns and members filled NULL.
    * A batch column NARROWER than the table's upcasts at landing (no
    * schema change); anything else — incompatible primitives,
    * type-kind changes, array/map element evolution — refuses with
    * the conflict named: lossy evolution must be an explicit rewrite,
    * never an append side effect. */
  def writeMergeSchema(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val preV = latestVersion(spark, root)
    require(preV >= 0,
      s"manifest table at $root does not exist — create() first")
    val evolved = evolveSchemaFor(spark, root, df.schema)
    val postV = latestVersion(spark, root)
    val schema = tableSchema(spark, root, postV)
    try write(fillForSchema(df, schema), root)
    catch {
      case e: Throwable =>
        // the evolution above is this statement's own side effect —
        // a landing that fails must not leave it behind. COMPENSATE
        // (the RTAS-abort shape): restore the pre-evolution version
        // as a new commit, but only when every commit since preV is
        // provably ours (contiguous evolution versions) AND still the
        // latest (restoreIfCurrent's CAS guard) — a concurrent
        // writer's commit is never rolled back by this append's
        // failure. Fatal errors (interrupt, OOM) propagate without
        // scheduling more driver work. A crash between the evolution
        // and this handler leaves the (additive, reader-safe)
        // evolution behind — the documented weaker-than-atomic
        // residue of compensation.
        if (scala.util.control.NonFatal(e) && evolved.nonEmpty &&
            evolved.sorted == ((preV + 1) to postV).toSeq)
          try restoreIfCurrent(spark, root, preV,
            expectedCurrent = postV): Unit
          catch {
            case c: Throwable if scala.util.control.NonFatal(c) =>
              e.addSuppressed(c)
          }
        throw e
    }
  }

  /** The evolution half of [[writeMergeSchema]], shared by the
    * streaming sink's `mergeSchema` option: diff `incoming` against
    * the table schema and commit the additive changes (a no-op when
    * nothing differs); returns the versions it committed. The
    * change set pre-validates against one schema snapshot — widen
    * validation first (the strictest guard), then the nested parents'
    * pending-equality-delete guard — so an apply-phase refusal can
    * only come from a RACING writer moving the base, and the loop
    * then re-derives the delta fresh: changes a concurrent evolution
    * already made (the two-streams-add-the-same-column case) drop out
    * instead of spuriously failing on "already exists". */
  def evolveSchemaFor(spark: SparkSession, root: String,
                      incoming: StructType): Seq[Long] = {
    val cs = spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    var attempt = 0
    // the versions THIS call committed, across retries — the caller's
    // compensation evidence ([[writeMergeSchema]]): a failed landing
    // rolls the evolution back only when these are contiguous from
    // its pre-evolution snapshot (no foreign commit interleaved)
    val committed = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (true) {
      val v = latestVersion(spark, root)
      require(v >= 0,
        s"manifest table at $root does not exist — create() first")
      val schema = tableSchema(spark, root, v)
      val (adds, widens, nestedAdds) = mergeDelta(schema, incoming, cs)
      // a batch LACKING a non-nullable column (or member) outright
      // refuses — relaxing the constraint so NULLs could land would
      // drop a declared invariant as an append side effect
      refuseMissingNonNullable(missingNonNullable(schema, incoming, cs))
      // a non-nullable slot the batch carries NULLABLE may land NULLs
      // — the sidecar's nullability RELAXES in the same evolution
      // (the present-on-both-sides OR-merge), or every later read
      // plans non-null slots over null bytes
      val relaxes = nullRelaxes(schema, incoming, cs)
      if (adds.isEmpty && widens.isEmpty && nestedAdds.isEmpty &&
          relaxes.isEmpty) return committed.toSeq
      // metadata carried in from READING another table (frozen
      // physical names, bucket claims) must not leak into this
      // table's sidecar
      val addList = freshSchema(StructType(adds)).fields.toSeq
      try {
        if (widens.nonEmpty) validateWidens(spark, root, widens)
        // every STATIC refusal addColumns/alterNestedColumns could
        // raise is pre-checked here against the same snapshot as the
        // widens, so nothing commits before a doomed change is caught
        if (bucketSpec(schema).isDefined)
          addList.foreach(f => require(f.name != "gb",
            "bucketed tables reserve the column name 'gb' for the " +
              "bucket directory layout"))
        if (nestedAdds.nonEmpty) {
          val eqKeys = eqDeletes(spark, root, v).flatMap(_.keys).toSet
          nestedAdds.map(_._1).distinct.foreach(p =>
            require(!eqKeys.contains(p),
              s"column $p keys pending equality deletes — run compactEq() " +
                "(or any row-level op / maintenance tick) before evolving " +
                "inside it"))
        }
        widens.foreach { case (path, to) =>
          committed += widenColumnTypePath(spark, root, path, to) }
        if (addList.nonEmpty) committed += addColumns(spark, root, addList)
        nestedAdds.groupBy(_._1).foreach { case (parent, fields) =>
          committed += alterNestedColumns(spark, root, Seq(parent),
            freshSchema(StructType(fields.map(_._2))).fields.toSeq,
            Nil)
        }
        if (relaxes.nonEmpty)
          committed += commitLoopEvolving(spark, root) { base =>
            (manifest(spark, root, base),
              relaxNullability(tableSchema(spark, root, base), relaxes))
          }
        return committed.toSeq
      } catch {
        case _: IllegalArgumentException if attempt < 3 =>
          // racing evolution (or a genuinely refused change — the
          // re-derived delta then repeats the refusal and the final
          // attempt rethrows it)
          attempt += 1
      }
    }
    committed.toSeq // unreachable — the loop exits by return/throw
  }

  /** Dotted paths of non-nullable schema columns/struct members the
    * merged batch carries NULLABLE — the Delta nullability-merge for
    * slots PRESENT on both sides: merged nullability is the OR of the
    * two. Slots the batch LACKS entirely are NOT relaxed — they
    * refuse ([[missingNonNullable]]): an opt-in append must never
    * permanently weaken a NOT NULL constraint as a side effect of
    * omitting the column. */
  private def nullRelaxes(schema: StructType, incoming: StructType,
                          caseSensitive: Boolean): Seq[Seq[String]] = {
    def key(n: String): String = if (caseSensitive) n else n.toLowerCase
    val have = incoming.fields.map(f => key(f.name) -> f).toMap
    schema.fields.toSeq.flatMap { f =>
      have.get(key(f.name)) match {
        case None => Nil
        case Some(in) =>
          val top = if (!f.nullable && in.nullable) Seq(Seq(f.name)) else Nil
          val nested = (f.dataType, in.dataType) match {
            case (t: StructType, b: StructType) =>
              t.fields.toSeq.flatMap { m =>
                if (m.nullable) Nil
                else b.fields.find(x => key(x.name) == key(m.name)) match {
                  case None => Nil
                  case Some(bm) if bm.nullable => Seq(Seq(f.name, m.name))
                  case _ => Nil
                }
              }
            case _ => Nil
          }
          top ++ nested
      }
    }
  }

  /** Dotted paths of NON-NULLABLE schema columns/struct members the
    * merged batch does not carry at all — [[fillForSchema]] would
    * fill NULL into a declared non-null slot. [[evolveSchemaFor]]
    * REFUSES these (the Delta rule: a write missing a non-nullable
    * column fails; the nullability OR-merge applies only to slots
    * present on both sides). The caller supplies the column or
    * relaxes nullability with an explicit ALTER first. A batch
    * carrying the parent struct NULLABLE is the present-side relax
    * ([[nullRelaxes]]); this check is only for absent slots. */
  private def missingNonNullable(schema: StructType, incoming: StructType,
                                 caseSensitive: Boolean): Seq[Seq[String]] = {
    def key(n: String): String = if (caseSensitive) n else n.toLowerCase
    val have = incoming.fields.map(f => key(f.name) -> f).toMap
    schema.fields.toSeq.flatMap { f =>
      have.get(key(f.name)) match {
        case None =>
          if (f.nullable) Nil else Seq(Seq(f.name))
        case Some(in) =>
          (f.dataType, in.dataType) match {
            case (t: StructType, b: StructType) =>
              t.fields.toSeq.flatMap { m =>
                if (m.nullable ||
                    b.fields.exists(x => key(x.name) == key(m.name))) Nil
                else Seq(Seq(f.name, m.name))
              }
            case _ => Nil
          }
      }
    }
  }

  private def refuseMissingNonNullable(paths: Seq[Seq[String]]): Unit =
    require(paths.isEmpty,
      s"mergeSchema cannot land a batch missing non-nullable " +
        s"column(s) ${paths.map(_.mkString(".")).mkString(", ")} — " +
        "supply the column(s), or relax nullability first with an " +
        "explicit ALTER; an append must never drop a NOT NULL " +
        "constraint as a side effect of omitting the column")

  private def relaxNullability(s: StructType, paths: Seq[Seq[String]])
      : StructType = {
    val tops = paths.collect { case Seq(n) => n }.toSet
    val members = paths.collect { case Seq(p, m) => (p, m) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    StructType(s.fields.map { f =>
      val f2 = if (tops(f.name)) f.copy(nullable = true) else f
      (members.get(f.name), f2.dataType) match {
        case (Some(ms), st: StructType) =>
          f2.copy(dataType = StructType(st.fields.map(m =>
            if (ms(m.name)) m.copy(nullable = true) else m)))
        case _ => f2
      }
    })
  }

  /** Whether [[evolveSchemaFor]] would change anything — the pure
    * guard the analyzer-side auto-merge rule fires on. Throws the
    * same refusal on a LOSSY conflict: with auto-merge requested, the
    * named-conflict message beats the generic assignment error. */
  private[graft] def needsMergeEvolution(schema: StructType,
                                         incoming: StructType,
                                         caseSensitive: Boolean): Boolean = {
    val (a, w, n) = mergeDelta(schema, incoming, caseSensitive)
    refuseMissingNonNullable(
      missingNonNullable(schema, incoming, caseSensitive))
    a.nonEmpty || w.nonEmpty || n.nonEmpty ||
      nullRelaxes(schema, incoming, caseSensitive).nonEmpty
  }

  /** The post-evolution LOGICAL schema [[evolveSchemaFor]] would
    * commit for `incoming` — computed WITHOUT committing anything.
    * This is what the analyzer-side auto-merge rule
    * ([[graft.plans.GraftSchemaMergeRule]]) resolves the append
    * against: the relation REPORTS the merged schema so resolution
    * succeeds, and the evolution itself commits inside the write
    * ([[writeMergeSchema]]) where a failed landing compensates it
    * away — an analyzed-but-never-executed plan commits nothing.
    * Refuses exactly what evolveSchemaFor refuses (lossy conflicts,
    * missing non-nullable slots). Field metadata (frozen physical
    * names) is resolution-irrelevant here; the write re-derives the
    * real evolution against the committed schema. */
  private[graft] def mergedSchemaPreview(schema: StructType,
                                         incoming: StructType,
                                         caseSensitive: Boolean)
      : StructType = {
    refuseMissingNonNullable(
      missingNonNullable(schema, incoming, caseSensitive))
    val (adds, widens, nestedAdds) = mergeDelta(schema, incoming,
      caseSensitive)
    def setType(s: StructType, path: Seq[String],
                to: org.apache.spark.sql.types.DataType): StructType =
      StructType(s.fields.map { f =>
        if (f.name != path.head) f
        else if (path.length == 1) f.copy(dataType = to)
        else f.copy(dataType =
          setType(f.dataType.asInstanceOf[StructType], path.tail, to))
      })
    var out = schema
    widens.foreach { case (p, t) => out = setType(out, p, t) }
    // evolution adds are always nullable — existing rows read NULL
    out = StructType(out.fields ++ adds.map(_.copy(nullable = true)))
    nestedAdds.groupBy(_._1).foreach { case (parent, fs) =>
      out = StructType(out.fields.map { f =>
        if (f.name != parent) f
        else f.copy(dataType = StructType(
          f.dataType.asInstanceOf[StructType].fields ++
            fs.map(_._2.copy(nullable = true))))
      })
    }
    relaxNullability(out, nullRelaxes(schema, incoming, caseSensitive))
  }

  /** The additive difference `incoming` demands of `schema`: (new
    * top-level columns, lossless widens by dotted path, new struct
    * members by parent). Names match under the session's resolution
    * (case-insensitive by default — a batch column differing only in
    * case must NOT become a duplicate the resolver then finds
    * ambiguous). Refuses any conflict outside that language, and
    * refuses a NEW column/member of (or containing) the untyped-NULL
    * VoidType — parquet cannot land it, and committing it first would
    * strand the table. */
  private def mergeDelta(schema: StructType, incoming: StructType,
                         caseSensitive: Boolean)
      : (Seq[org.apache.spark.sql.types.StructField],
         Seq[(Seq[String], org.apache.spark.sql.types.DataType)],
         Seq[(String, org.apache.spark.sql.types.StructField)]) = {
    def refuse(name: String, have: org.apache.spark.sql.types.DataType,
               got: org.apache.spark.sql.types.DataType): Nothing =
      throw new IllegalArgumentException(
        s"mergeSchema cannot evolve column $name: table has " +
          s"${have.simpleString}, batch has ${got.simpleString} — only " +
          "new columns, new struct members, and lossless primitive " +
          "widenings evolve on write; a lossy change needs an explicit " +
          "rewrite")
    // compare types with field METADATA (frozen physical names on
    // mapped tables) and nullability stripped — neither is a schema
    // difference a batch can or should evolve
    def bare(dt: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, bare(f.dataType))))
      case a: org.apache.spark.sql.types.ArrayType =>
        org.apache.spark.sql.types.ArrayType(bare(a.elementType))
      case m: org.apache.spark.sql.types.MapType =>
        org.apache.spark.sql.types.MapType(bare(m.keyType), bare(m.valueType))
      case other => other
    }
    import org.apache.spark.sql.types.NullType
    def sameName(a: String, b: String): Boolean =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    def hasNullType(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case NullType => true
        case s: StructType => s.fields.exists(f => hasNullType(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          hasNullType(a.elementType)
        case mp: org.apache.spark.sql.types.MapType =>
          hasNullType(mp.keyType) || hasNullType(mp.valueType)
        case _ => false
      }
    def refuseVoid(name: String): Nothing =
      throw new IllegalArgumentException(
        s"mergeSchema cannot add column $name: its type carries the " +
          "untyped NULL (VOID) — cast the batch column to a concrete " +
          "type first (parquet cannot land VOID, and committing the " +
          "column before the landing fails would strand the table)")
    val adds = Seq.newBuilder[org.apache.spark.sql.types.StructField]
    val widens =
      Seq.newBuilder[(Seq[String], org.apache.spark.sql.types.DataType)]
    val nestedAdds =
      Seq.newBuilder[(String, org.apache.spark.sql.types.StructField)]
    incoming.fields.foreach { in =>
      schema.fields.find(f => sameName(f.name, in.name)) match {
        case None =>
          if (hasNullType(in.dataType)) refuseVoid(in.name)
          adds += org.apache.spark.sql.types.StructField(
            in.name, in.dataType, nullable = true)
        case Some(cur) => (bare(cur.dataType), bare(in.dataType)) match {
          case (a, b) if a == b => ()
          // an untyped-NULL batch column against an EXISTING column is
          // just NULL values — the landing casts them to the table type
          case (_, NullType) => ()
          // evolution paths speak the TABLE's casing — the batch's
          // only matters for brand-new names
          case (a: StructType, b: StructType) =>
            b.fields.foreach { m =>
              a.fields.find(f => sameName(f.name, m.name)) match {
                case None =>
                  if (hasNullType(m.dataType))
                    refuseVoid(s"${cur.name}.${m.name}")
                  nestedAdds += cur.name ->
                    org.apache.spark.sql.types.StructField(
                      m.name, m.dataType, nullable = true)
                case Some(am) if am.dataType == m.dataType => ()
                case Some(_) if m.dataType == NullType => ()
                case Some(am) if widenable(am.dataType, m.dataType) =>
                  widens += ((Seq(cur.name, am.name), m.dataType))
                case Some(am) if widenable(m.dataType, am.dataType) => ()
                case Some(am) =>
                  refuse(s"${cur.name}.${am.name}", am.dataType, m.dataType)
              }
            }
          case (a, b) if widenable(a, b) => widens += ((Seq(cur.name), b))
          case (a, b) if widenable(b, a) => ()
          case (a, b) => refuse(in.name, a, b)
        }
      }
    }
    // INTRA-batch conflicts: two new columns (or two new members of
    // one struct) differing only in case would both pass the
    // against-the-table diff and commit — poisoning every later
    // lookup under case-insensitive resolution with AMBIGUOUS_REFERENCE
    val addList = adds.result()
    val nestedList = nestedAdds.result()
    if (!caseSensitive) {
      addList.groupBy(_.name.toLowerCase).foreach { case (_, fs) =>
        require(fs.length == 1,
          s"mergeSchema batch carries new columns differing only in " +
            s"case: ${fs.map(_.name).mkString(", ")} — the session's " +
            "case-insensitive resolution could never tell them apart")
      }
      nestedList.groupBy(x => (x._1, x._2.name.toLowerCase)).foreach {
        case (_, fs) => require(fs.length == 1,
          s"mergeSchema batch carries new struct members differing " +
            s"only in case under ${fs.head._1}: " +
            s"${fs.map(_._2.name).mkString(", ")}")
      }
    }
    (addList, widens.result(), nestedList)
  }

  /** Conform a batch to the table's LOGICAL schema for landing under
    * [[writeMergeSchema]]: absent columns fill typed NULL, struct
    * columns rebuild BY NAME in table member order (absent members
    * NULL, a NULL struct stays NULL — never a struct of NULLs), and
    * present columns pass through for the landing's own cast to
    * upcast narrower primitives. */
  private[graft] def fillForSchema(df: DataFrame,
                                   schema: StructType): DataFrame = {
    // name matching follows the session's resolution (the same rule
    // mergeDelta diffs under) — a batch column differing only in case
    // must fill the table column, not be silently NULLed
    val cs = df.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def key(n: String): String = if (cs) n else n.toLowerCase
    val have = df.schema.fields.map(f => key(f.name) -> f.dataType).toMap
    df.select(schema.fields.toIndexedSeq.map { f =>
      (have.get(key(f.name)), f.dataType) match {
        case (None, _) =>
          lit(null).cast(relaxedType(f.dataType)).as(f.name)
        case (Some(b: StructType), t: StructType)
            if b.fields.map(x => key(x.name) -> x.dataType).toSeq !=
               t.fields.map(x => key(x.name) -> x.dataType).toSeq =>
          val bKeys = b.fields.map(x => key(x.name)).toSet
          val members = t.fields.toIndexedSeq.map { m =>
            if (bKeys.contains(key(m.name)))
              col(f.name).getField(m.name)
                .cast(relaxedType(m.dataType)).as(m.name)
            else lit(null).cast(relaxedType(m.dataType)).as(m.name)
          }
          org.apache.spark.sql.functions
            .when(col(f.name).isNull, lit(null))
            .otherwise(org.apache.spark.sql.functions.struct(members: _*))
            .as(f.name)
        case _ => col(f.name).cast(relaxedType(f.dataType)).as(f.name)
      }
    }: _*)
  }

  /** OVERWRITE commit (SQL TRUNCATE + INSERT, `writeTo(...).replace`):
    * the next manifest references ONLY `df`'s freshly landed files;
    * prior versions stay time-travelable until vacuum. */
  def overwrite(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist — create() first")
    val schema = tableSchema(spark, root, v)
    require(df.columns.sorted.sameElements(schema.fieldNames.sorted),
      s"overwrite schema ${df.columns.sorted.mkString(",")} != table " +
        s"schema ${schema.fieldNames.sorted.mkString(",")}")
    val rows = landFiles(conform(df, schema), root, statsCols(spark, root, v))
    // a full content replace is a stream RESTART: stamp the reset
    // tombstone so the replay marker does not carry into the table's
    // new life — the strict-discipline error message tells users to
    // overwrite() exactly to re-point a fresh-checkpoint stream here
    commitLoopEvolving(spark, root, extraStage =
      VersionedTable.stampBatch(spark, manifestsRoot(root), -1L),
      eqReg = _ => Nil) { base =>
      (rows, tableSchema(spark, root, base))
    }
  }

  /** Stream-idempotent append — [[VersionedTable.writeBatch]] for the
    * manifest format: the producing micro-batch id commits atomically
    * with the manifest version, and a batch id at or below the
    * current version's marker is a no-op — which is exactly the
    * foreachBatch redelivery case after a restart. Cost ∝ batch (the
    * manifest-append grain), so a streaming ingest into a 100 TB
    * table stays per-batch work. Returns None on a detected replay. */
  /** The table's stream replay marker — the highest batch id a
    * [[writeBatch]]/[[mergeMorBatch]] commit stamped (-1 when none).
    * Lets a sink skip per-batch work it can prove is a replay before
    * running any job over the micro-batch. */
  def lastAppliedBatch(spark: SparkSession, root: String): Long =
    VersionedTable.lastAppliedBatch(spark, manifestsRoot(root))

  /** Strict replay discipline shared by the batch-stamped commits
    * ([[writeBatch]], [[mergeMorBatch]]): an id EQUAL to the marker is
    * the redelivered micro-batch (no-op — the exactly-once case); an
    * id BELOW it cannot come from the same checkpoint (offsets are
    * monotone per checkpoint), so it is a DIFFERENT query's stream
    * aimed at this table — and silently swallowing its batches as
    * "replays" until its ids catch up would be wholesale data loss.
    * Returns true for the no-op replay; throws on the mismatch. */
  private def isReplay(spark: SparkSession, root: String,
                       batchId: Long): Boolean = {
    val last = VersionedTable.lastAppliedBatch(spark, manifestsRoot(root))
    require(batchId >= last,
      s"batch id $batchId is BELOW the table's replay marker $last — " +
        "this stream's checkpoint does not match the table's history " +
        "(a fresh checkpoint restarts ids at 0); write to a fresh " +
        "table, or overwrite() the table to restart it with the stream")
    batchId == last
  }

  def writeBatch(df: DataFrame, root: String, batchId: Long): Option[Long] = {
    val spark = df.sparkSession
    if (isReplay(spark, root, batchId))
      None
    else {
      val v = latestVersion(spark, root)
      require(v >= 0, s"manifest table at $root does not exist — create() first")
      val schema = tableSchema(spark, root, v)
      require(df.columns.sorted.sameElements(schema.fieldNames.sorted),
        s"append schema ${df.columns.sorted.mkString(",")} != table " +
          s"schema ${schema.fieldNames.sorted.mkString(",")}")
      val rows = landFiles(conform(df, schema), root, statsCols(spark, root, v))
      // the replay marker is RE-CHECKED against every attempt's fresh
      // base: the pre-loop check alone is a TOCTOU — a zombie driver
      // racing its restarted successor (both carrying the same batch
      // id) would have both pass it, and the CAS loser's retry would
      // recommit the batch onto the winner's manifest, double-applying
      // it. A mid-loop replay detection abandons the landed files —
      // unreferenced, vacuum's TTL sweep collects them.
      commitLoopEvolvingOpt(spark, root, extraStage =
        VersionedTable.stampBatch(spark, manifestsRoot(root), batchId)) {
        base =>
          if (isReplay(spark, root, batchId)) None
          else Some((manifest(spark, root, base).unionByName(rows),
            tableSchema(spark, root, base)))
      }
    }
  }

  /** Optimistic manifest-swap loop — the [[VersionedTable]] rewrite
    * loop over manifests: compute the next manifest AGAINST a pinned
    * base version, commit only as base+1; on conflict recompute. The
    * schema sidecar re-stages each attempt. */
  private def commitLoop(spark: SparkSession, root: String,
                         maxAttempts: Int = 12,
                         eqReg: Long => Seq[EqEntry] = null,
                         consReg: Long => Seq[(String, String)] = null,
                         validateCons: Boolean = true)
                        (next: Long => DataFrame): Long =
    commitLoopEvolving(spark, root, maxAttempts, eqReg = eqReg,
      consReg = consReg, validateCons = validateCons)(base =>
      (next(base), tableSchema(spark, root, base)))

  /** [[commitLoop]] where the next version may also commit a WIDER
    * schema sidecar (additive evolution — schema-on-read serves old
    * files' missing columns as NULL, so no data rewrites) and extra
    * staged sidecars (the batch-id replay marker). */
  private def commitLoopEvolving(spark: SparkSession, root: String,
                                 maxAttempts: Int = 12,
                                 extraStage: String => Unit = _ => (),
                                 eqReg: Long => Seq[EqEntry] = null,
                                 consReg: Long => Seq[(String, String)] = null,
                                 validateCons: Boolean = true,
                                 ndvReg: Long => Map[String, Long] = null)
                                (next: Long => (DataFrame, StructType)): Long =
    commitLoopEvolvingOpt(spark, root, maxAttempts, extraStage, eqReg,
      consReg, validateCons, ndvReg)(base => Some(next(base))).get

  /** [[commitLoopEvolving]] where an attempt may ABSTAIN (None) after
    * seeing the freshly resolved base — the hook [[writeBatch]]'s
    * per-attempt replay re-check needs: a None from `next` ends the
    * loop with no commit.
    *
    * `eqReg` decides the next version's equality-delete registry from
    * the attempt's base: null (the default) CARRIES the base's pending
    * deletes forward — correct for commits that neither read nor
    * rewrite rows (appends, evolution, renames). Commits that START
    * FROM THE EFFECTIVE VIEW ([[effectiveManifest]] — every row-level
    * op, optimize, compaction) pass `_ => Nil`: their manifest already
    * materialized the deletes as vectors, so carrying the registry
    * would re-apply them. */
  private def commitLoopEvolvingOpt(spark: SparkSession, root: String,
                                    maxAttempts: Int = 12,
                                    extraStage: String => Unit = _ => (),
                                    eqReg: Long => Seq[EqEntry] = null,
                                    consReg: Long => Seq[(String, String)] =
                                      null,
                                    validateCons: Boolean = true,
                                    ndvReg: Long => Map[String, Long] = null)
                                   (next: Long => Option[(DataFrame, StructType)])
      : Option[Long] = {
    val eq: Long => Seq[EqEntry] =
      if (eqReg != null) eqReg else base => eqDeletes(spark, root, base)
    // constraints are table invariants: every commit CARRIES them
    // unless add/drop/restore explicitly decides the next set
    val cons: Long => Seq[(String, String)] =
      if (consReg != null) consReg
      else base => constraintsAt(spark, root, base)
    // ANALYZE statistics carry like constraints (stale-but-useful is
    // the ANALYZE contract); only analyzeTable re-decides the set
    val ndv: Long => Map[String, Long] =
      if (ndvReg != null) ndvReg else base => ndvAt(spark, root, base)
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, root)
      require(base >= 0, s"manifest table at $root has no committed version")
      val (rows0, schema) = next(base) match {
        case Some(rs) => rs
        case None     => return None
      }
      // CHECK-constraint enforcement at the ONE place rows enter a
      // version: freshly landed files are exactly the NULL-seq
      // manifest rows (carried rows already satisfied the constraints
      // of the version that landed them, which every later commit
      // carries or explicitly re-decides). Validating INSIDE the
      // attempt closes the race with a concurrent addConstraint —
      // if this base moves, the retry re-reads the NEW base's set.
      // `validateCons = false` is reserved for provably
      // row-preserving relayouts (optimize/compaction), whose extra
      // full read would double their cost for rows that cannot have
      // changed.
      val consSet = cons(base) // once per attempt: validation + staging
      if (validateCons && consSet.nonEmpty) {
        val fresh = rows0.filter(col("seq").isNull)
          .select(col("path")).collect().map(_.getString(0)).toSeq
        if (fresh.nonEmpty)
          validateConstraints(spark, fresh, schema, consSet)
      }
      // freshly landed rows carry NULL seq — stamp them with THIS
      // attempt's target version (carried rows keep their added-at
      // version; a CAS retry re-stamps against its own base)
      val rows = rows0.withColumn("seq",
        coalesce(col("seq"), lit(base + 1)))
      VersionedTable.tryCommitAs(rows, manifestsRoot(root), base,
        dir => { stageSchema(spark, root, schema)(dir)
          stageEq(spark, root, eq(base))(dir)
          stageConstraints(spark, root, consSet)(dir)
          stageNdv(spark, root, ndv(base))(dir)
          extraStage(dir) }) match {
        case Some(v) => return Some(v)
        case None    => attempt += 1
      }
    }
    sys.error(s"manifest table at $root: commit lost the race " +
      s"$maxAttempts times — serialize the writers or shard the table")
  }

  /** Data-file paths of `base` that the batch keys can possibly touch
    * — exclusion by proof over the manifest's own envelopes: a file
    * is UNtouched only when, for some key column, every batch key
    * provably misses its [min,max]. Unknown envelopes (untracked key
    * column, NULL cells) degrade to touched. One metadata-scale
    * broadcast join: |files| × |distinct batch keys| envelope checks,
    * distributed. */
  private def touchedPaths(spark: SparkSession, root: String,
                           m: DataFrame, keys: DataFrame,
                           keyCols: Seq[String],
                           dataSchema: StructType): Seq[String] = {
    // only TRACKED key columns contribute exclusion proofs; with none
    // tracked every file is (honestly) touched. Manifest stat columns
    // are keyed by PHYSICAL name (stable under RENAME COLUMN); the
    // batch keys frame speaks logical.
    val phys = keyCols.map(k => k -> physicalFor(dataSchema, k)).toMap
    val tracked = keyCols.filter(k => m.columns.contains(s"${phys(k)}_min"))
    val byEnvelope: Seq[String] =
      if (tracked.isEmpty)
        m.select(col("path")).collect().map(_.getString(0)).sorted.toSeq
      else {
        val cond = tracked.map { k =>
          val miss = (col(k) < col(s"${phys(k)}_min")) ||
            (col(k) > col(s"${phys(k)}_max"))
          !(miss <=> lit(true)) // unknown envelope → possibly contained
        }.reduce(_ && _)
        broadcast(m.select(col("path") +:
            tracked.flatMap(k =>
              Seq(col(s"${phys(k)}_min"), col(s"${phys(k)}_max"))): _*))
          .join(keys.select(tracked.map(col): _*).distinct(), cond)
          .select(col("path")).distinct()
          .collect().map(_.getString(0)).sorted.toSeq
      }
    bloomRefine(spark, root, byEnvelope, keys, keyCols, dataSchema)
  }

  /** Intersect the envelope-touched set with per-file BLOOM membership
    * where a committed `_bloom_<keyCol>` index covers a key column —
    * the case envelopes cannot serve: on a hash-distributed key every
    * file's [min,max] spans every probe, so the envelope search
    * honestly degrades to rewriting the whole table; the blooms the
    * reads already consult ([[buildBloom]]) answer the same
    * point-membership question for the touched-file search, making
    * point-key merges file-granular on hash layouts too.
    *
    * Soundness: blooms have no false negatives, so dropping a no-hit
    * INDEXED file can never lose a matched key; files the index does
    * not cover (appended after the last [[buildBloom]] call, or the
    * whole table when no index exists) stay conservatively touched.
    * Cost: one broadcast of the touched files' bloom rows × |distinct
    * batch keys| membership probes per indexed key column. */
  private def bloomRefine(spark: SparkSession, root: String,
                          envelopeTouched: Seq[String], keys: DataFrame,
                          keyCols: Seq[String],
                          dataSchema: StructType): Seq[String] = {
    // bloom index roots are keyed by PHYSICAL column name (they index
    // file bytes, which rename never rewrites) — translate before the
    // lookup, keep the LOGICAL name for probing the keys frame
    val physToLogical = keyCols.map(k =>
      physicalFor(dataSchema, k) -> k).toMap
    val indexed = bloomsValid(spark, root, dataSchema).collect {
      case (pc, br) if physToLogical.contains(pc) =>
        (physToLogical(pc), br) }
    if (indexed.isEmpty || envelopeTouched.isEmpty) return envelopeTouched
    graft.functions.VectorExpressions.ensureRegistered(spark)
    // ONE pass for ALL indexed key columns (a composite key used to
    // pay one serial semi-join + probe-join pair PER column): the
    // indexes union tagged by column, each column's distinct key
    // HASHES union likewise, then one semi join restricts to the
    // touched set, one probe join finds the hits, and one anti join
    // yields every (column, path) a covering index proves key-free —
    // those paths drop. Conventions carried over verbatim: index rows
    // carry input_file_name URIs vs the manifest's canonical paths
    // (the shared [[canonPathCol]] strip); the touched-set
    // restriction is a broadcast SEMI JOIN, not an isin() (an In with
    // 100k literal children would blow up the driver); probes cast to
    // the TABLE's column type (the index hashed stored values — a
    // narrower-typed key would hash differently; NULL keys probe
    // nothing); and the DISTINCT KEYS broadcast, never the bloom rows
    // (numBits/8 bytes × 100k files would be GBs).
    val spk = spark
    import spk.implicits._
    val touchedDf = envelopeTouched.toDF("path")
    val idxAll = indexed.map { case (c, br) =>
      graft.sources.FileBloomIndex.read(spark, br)
        .withColumn("path", canonPathCol(col("path")))
        .select(lit(c).as("c"), col("path"), col("bloom"))
    }.reduce(_ unionByName _)
      .join(broadcast(touchedDf), Seq("path"), "left_semi")
    val keyHashes = indexed.map { case (c, _) =>
      keys.select(col(c).cast(dataSchema(c).dataType).as("k"))
        .filter(col("k").isNotNull).distinct()
        .select(lit(c).as("kc"), xxhash64(col("k")).as("h"))
    }.reduce(_ unionByName _)
    val hits = idxAll.join(broadcast(keyHashes),
        col("c") === col("kc") &&
          graft.functions.VectorExpressions.bloomMightContain(
            col("bloom"), col("h")))
      .select(col("c"), col("path")).distinct()
    val excluded = idxAll.select(col("c"), col("path"))
      .join(hits, Seq("c", "path"), "left_anti")
      .select(col("path")).distinct()
      .collect().map(_.getString(0)).toSet
    envelopeTouched.filterNot(excluded.contains)
  }

  /** Row-level MERGE (upsert by key), file-granular: only the files
    * whose key envelopes intersect the batch are rewritten; every
    * other file carries into the next manifest BY REFERENCE. Same
    * semantics as [[VersionedTable.merge]] (matched keys replaced,
    * unmatched insert, strict schema, in-batch duplicate keys are the
    * caller's contract). Returns the committed version. */
  def merge(updates: DataFrame, root: String, keyCols: Seq[String]): Long =
    merge(updates, root, keyCols, evolveSchema = false)

  /** MERGE with optional ADDITIVE schema evolution — and here the
    * manifest representation earns its keep: an evolved-in column
    * needs NO data rewrite at all for untouched files, because the
    * next manifest just commits a WIDER schema sidecar and
    * schema-on-read serves the old files' missing column as NULL.
    * Only the key-touched files rewrite, exactly as in the strict
    * path. A batch may carry NEW columns (existing rows read NULL
    * there) or OMIT existing ones (the update rows land NULL); the
    * next version's schema is base-order ++ new columns. The default
    * stays strict ([[VersionedTable.merge]]'s rationale verbatim). */
  def merge(updates: DataFrame, root: String, keyCols: Seq[String],
            evolveSchema: Boolean): Long = {
    require(keyCols.nonEmpty, "merge requires at least one key column")
    val spark = updates.sparkSession
    require(keyCols.forall(updates.columns.contains),
      s"update batch is missing key columns: " +
        keyCols.filterNot(updates.columns.contains).mkString(", "))
    rewriteTouched(spark, root, updates, keyCols, evolveSchema) {
      (touchedRows, upd) =>
        touchedRows.join(upd.select(keyCols.map(col): _*).distinct(),
            keyCols, "left_anti")
          .unionByName(upd, allowMissingColumns = evolveSchema)
    }
  }

  /** CDC fold, file-granular: [[VersionedTable.applyCdc]] semantics
    * (highest-seq change per key wins in-batch; D removes, others
    * upsert) at cost ∝ touched files + batch. */
  def applyCdc(changes: DataFrame, root: String, keyCols: Seq[String],
               seqCol: String = "seq", opCol: String = "op"): Long = {
    require(keyCols.nonEmpty, "applyCdc requires at least one key column")
    val spark = changes.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val winners = changes
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")
    rewriteTouched(spark, root, winners, keyCols) { (touchedRows, win) =>
      touchedRows.join(win.select(keyCols.map(col): _*), keyCols, "left_anti")
        .unionByName(
          win.filter(not(col(opCol) === lit("D"))).drop(opCol, seqCol))
    }
  }

  /** LIVE rows of the files a batch of keys can possibly touch — the
    * same envelope/bloom selection the keyed row-level ops use,
    * exposed for callers (the SQL MERGE compiler) that must JOIN
    * against current target values before computing their batch: a
    * target row matching a source key can only live in a touched
    * file, so the join scans those instead of the table. Reads the
    * LATEST version outside any commit loop — callers get snapshot
    * isolation; the subsequent keyed commit serializes via CAS. */
  private[graft] def readTouchedRows(spark: SparkSession, root: String,
                                     keys: DataFrame,
                                     keyCols: Seq[String]): DataFrame = {
    val base = latestVersion(spark, root)
    require(base >= 0, s"manifest table at $root does not exist")
    // the EFFECTIVE view — pending equality deletes applied, so a
    // matched target row a prior mergeEq already replaced never joins
    val (m, states) = effectiveManifest(spark, root, base)
    val schema = tableSchema(spark, root, base)
    val dvByPath: Map[String, (Option[String], Long)] =
      states.map(s => s._1 -> ((s._2, s._3))).toMap
    val touched = touchedPaths(spark, root, m, keys, keyCols, schema)
    readFilesDv(spark, schema, touched.map(p => (p, dvByPath(p)._1)),
      touched.map(p => dvByPath(p)._2).sum)
  }

  /** Shared core of the keyed row-level ops: pin a base manifest,
    * find the touched files, read ONLY them, apply `rewrite`
    * (touched-rows, batch) → replacement rows, land those as new
    * files, and commit (base-manifest − touched) ∪ new-rows as
    * base+1. Conflicts recompute from scratch against the new base —
    * including the touched-file set, which may differ. */
  private def rewriteTouched(spark: SparkSession, root: String,
                             batch: DataFrame, keyCols: Seq[String],
                             evolve: Boolean = false)
                            (rewrite: (DataFrame, DataFrame) => DataFrame): Long =
    // starts from the EFFECTIVE view, so the commit also materializes
    // any pending equality deletes — registry staged empty
    commitLoopEvolving(spark, root, eqReg = _ => Nil) { base =>
      val (m, effSt) = effectiveManifest(spark, root, base)
      val baseSchema = tableSchema(spark, root, base)
      val stats = statsCols(spark, root, base)
      val dvByPath: Map[String, (Option[String], Long)] =
        effSt.map(s => s._1 -> ((s._2, s._3))).toMap
      // additive evolution: the next version's schema is base-order ++
      // the batch's new columns; touched files read through the NEW
      // schema (absent columns surface as NULL — parquet by-name).
      // Evolved-in columns commit NULLABLE regardless of the batch's
      // nullability: every pre-evolution file lacks them, so untouched
      // rows READ null — and the vectorized reader enforces the
      // declared nullability per file (a non-nullable missing column
      // is a read error, not a null)
      val schema =
        if (!evolve) baseSchema
        else StructType(baseSchema.fields ++
          batch.schema.fields.filterNot(f =>
            baseSchema.fieldNames.contains(f.name))
            .map(_.copy(nullable = true)))
      val cols = schema.fieldNames.toSeq
      val keys = batch.select(keyCols.map(col): _*).distinct()
      val touched = touchedPaths(spark, root, m, keys, keyCols, baseSchema)
      // touched files read WITH their deletion vectors applied — a
      // rewrite that read raw would resurrect deleted rows; the
      // rewritten files then carry no vector (the rewrite purges it)
      val touchedRows = readFilesDv(spark, schema,
        touched.map(p => (p, dvByPath(p)._1)),
        touched.map(p => dvByPath(p)._2).sum)
      // the batch keeps its op/seq-style control columns — each op's
      // rewrite consumes them; the final projection normalizes order
      val replacement = rewrite(touchedRows, batch)
        .select(cols.map(col): _*)
      val newRows = landFiles(physSelect(replacement, schema), root, stats)
      (m.filter(!col("path").isin(touched: _*)).unionByName(newRows), schema)
    }

  /** Row-level DELETE, file-granular: the predicate's range conjuncts
    * run through the shared envelope-proof engine against the
    * manifest's own stats — provably-unmatching files carry forward
    * untouched, provably ALL-MATCHING files DROP from the manifest by
    * reference ([[graft.plans.StatsPruneRule.wholeFileMatched]] — the
    * metadata-only retention-delete grain: `ts < cutoff` on a
    * time-clustered table removes whole files with ZERO data I/O);
    * only the boundary files between the two proofs are rewritten,
    * with SQL DELETE semantics (NULL predicate keeps the row). A
    * predicate with no provable range shape degrades to rewriting
    * every file — sound, at the old whole-table cost. */
  def deleteWhere(spark: SparkSession, root: String, cond: Column): Long =
    // validateCons = false: a pure row filter cannot introduce a
    // CHECK violation — every surviving row already satisfied the
    // live set (replaceWhere keeps validation: its batch is new rows)
    rewriteWhere(spark, root, cond, dropWholeMatches = true,
      validateCons = false)(
      (touchedRows, matched) => touchedRows.filter(not(matched)))

  /** ADDITIVE schema evolution as a standalone commit — `ALTER TABLE
    * ADD COLUMN` for the manifest format: the next version reuses the
    * CURRENT manifest verbatim (every data file carries BY REFERENCE,
    * zero data I/O) and commits a WIDER schema sidecar; schema-on-read
    * serves the new columns as NULL for every existing row. New
    * columns must be nullable for exactly that reason. Returns the
    * committed version. */
  def addColumns(spark: SparkSession, root: String,
                 fields: Seq[org.apache.spark.sql.types.StructField]): Long =
    alterColumns(spark, root, adds = fields, drops = Nil)

  /** Additive ADD + DROP evolution as ONE commit — the atomic form a
    * multi-change `ALTER TABLE` needs (per-change commits would leave
    * the table half-altered when a later change fails): every check
    * runs against the attempt's base before anything commits. See
    * [[addColumns]]/[[dropColumns]] for each side's contract. */
  def alterColumns(spark: SparkSession, root: String,
                   adds: Seq[org.apache.spark.sql.types.StructField],
                   drops: Seq[String]): Long = {
    require(adds.nonEmpty || drops.nonEmpty,
      "alterColumns requires at least one change")
    adds.foreach(f => require(f.nullable,
      s"new column ${f.name} must be nullable — existing rows read NULL"))
    require(adds.map(_.name).distinct.length == adds.length,
      s"duplicate new column names: ${adds.map(_.name).mkString(", ")} — " +
        "a sidecar with repeated fields would poison every later read")
    require(adds.map(_.name).toSet.intersect(drops.toSet).isEmpty,
      "a column cannot be both added and dropped in one change set")
    commitLoopEvolving(spark, root) { base =>
      val schema = tableSchema(spark, root, base)
      adds.foreach(f => require(!schema.fieldNames.contains(f.name),
        s"column ${f.name} already exists"))
      drops.foreach(n => require(schema.fieldNames.contains(n),
        s"column $n does not exist"))
      require(schema.fields.length + adds.length > drops.distinct.length,
        "cannot drop every column of the table")
      drops.foreach(n => require(!schema.fields.exists(f =>
        f.name == n && f.metadata.contains(BucketKey)),
        s"column $n is the table's bucket key — the frozen hash layout " +
          "and its storage-partitioned joins ride on it; rebucket() " +
          "(CALL optimize_table with buckets) to change the layout " +
          "first"))
      drops.foreach(n =>
        require(!eqDeletes(spark, root, base).exists(_.keys.contains(n)),
          s"column $n keys pending equality deletes — run compactEq() " +
            "(or any row-level op / maintenance tick) before dropping it"))
      drops.foreach(n => constraintsAt(spark, root, base).foreach {
        case (cn, e) => require(!constraintRefs(spark, e).contains(n),
          s"column $n is referenced by constraint $cn ($e) — drop the " +
            "constraint before dropping the column") })
      if (bucketSpec(schema).isDefined)
        adds.foreach(f => require(f.name != "gb",
          "bucketed tables reserve the column name 'gb' for the bucket " +
            "directory layout"))
      val adds2: Seq[org.apache.spark.sql.types.StructField] =
        if (adds.isEmpty) Nil
        else {
          // RESURRECTION GUARD, mapping edition: schema-on-read maps
          // by PHYSICAL name, so re-adding a name some LIVE file
          // still physically carries (dropped by [[dropColumns]],
          // which rewrites nothing), or that another field's mapping
          // still claims (it was renamed away), must NOT reuse that
          // physical name — the stale values would resurrect. One
          // distributed footer sweep over the manifest's own listing
          // (executor-side footer reads — no data I/O; a CAS retry
          // re-sweeps because its base's file set may differ) detects
          // the conflict, and the new column simply maps to a FRESH
          // physical name: old files' stale bytes stay invisible, no
          // optimize() required, nothing refused.
          val liveNames = physicalColumns(spark, filesAt(spark, root, base))
          val taken = schema.fields.map(physicalName).toSet
          adds.map { f =>
            if (!liveNames.contains(f.name) && !taken.contains(f.name)) f
            else f.copy(metadata =
              new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
                .putString(PhysicalKey, f.name + "_gf" +
                  java.util.UUID.randomUUID().toString.take(8))
                .build())
          }
        }
      val next = StructType(
        schema.fields.filterNot(f => drops.contains(f.name)) ++ adds2)
      val m = manifest(spark, root, base)
      // stat triplets are keyed by the dropped fields' PHYSICAL names
      val statDrop = drops.flatMap { c =>
        val pc = physicalFor(schema, c)
        Seq(s"${pc}_min", s"${pc}_max", s"${pc}_nulls")
      }.filter(m.columns.contains)
      (m.drop(statDrop: _*), next)
    }
  }

  /** The physical column NAMES any of `files` carries — executor-side
    * parquet footer reads over the manifest's own listing (cost ∝
    * |files| footer reads, distributed; no stat-per-file planning, no
    * data I/O) — the [[addColumns]] resurrection guard's evidence. */
  private def physicalColumns(spark: SparkSession,
                              files: Seq[String]): Set[String] = {
    if (files.isEmpty) return Set.empty
    val conf = new graft.util.SerConf(spark.sparkContext.hadoopConfiguration)
    val spk = spark
    import spk.implicits._
    spark.createDataset(files).repartition(math.min(files.size, 32))
      .mapPartitions { it =>
        val out = scala.collection.mutable.Set.empty[String]
        // emit every physical path the file carries: top-level names
        // plus dotted nested paths ("s.a") — the nested re-add guard
        // needs the full tree, not just the roots
        def walk(prefix: String, t: org.apache.parquet.schema.Type): Unit = {
          val path = if (prefix.isEmpty) t.getName
            else s"$prefix.${t.getName}"
          out += path
          if (!t.isPrimitive)
            t.asGroupType().getFields.forEach(c => walk(path, c))
        }
        it.foreach { p =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(p), conf.value)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getFooter.getFileMetaData.getSchema.getFields
            .forEach(f => walk("", f))
          finally r.close()
        }
        out.iterator
      }.distinct().collect().toSet
  }

  /** `ALTER TABLE DROP COLUMN` — the inverse evolution, equally
    * metadata-only: the next version reuses the current manifest's
    * FILES verbatim under a NARROWER sidecar (schema-on-read by name
    * simply stops projecting the column — zero data I/O), and the
    * dropped columns' stat triplets leave the manifest rows so no
    * future landing, proof, or maintenance references a column the
    * schema lost. A lingering `_bloom_<col>` index is inert (no valid
    * predicate can name the column). Re-ADDING a dropped name while
    * live files still carry it maps the new column to a FRESH
    * physical name — see [[alterColumns]]'s resurrection guard. */
  def dropColumns(spark: SparkSession, root: String,
                  names: Seq[String]): Long =
    alterColumns(spark, root, adds = Nil, drops = names)

  /** `ALTER TABLE RENAME COLUMN` — METADATA-ONLY via the name
    * mapping: the next version commits the SAME manifest under a
    * sidecar whose field carries the new logical name and (frozen in
    * field metadata) its original PHYSICAL name, which is what data
    * files, manifest stat columns, and bloom index roots keep using.
    * Zero data I/O, stats and indexes stay valid, time travel reads
    * pre-rename versions under their own sidecars' old names. A
    * rename BACK to the physical name drops the mapping entry. */
  def renameColumn(spark: SparkSession, root: String,
                   from: String, to: String): Long = {
    require(from != to, "rename requires two different names")
    commitLoopEvolving(spark, root) { base =>
      val schema = tableSchema(spark, root, base)
      require(schema.fieldNames.contains(from),
        s"column $from does not exist")
      // pending equality deletes name their key columns LOGICALLY (in
      // the registry and inside the delete files themselves) — a
      // rename would orphan them and break every later read
      require(!eqDeletes(spark, root, base).exists(_.keys.contains(from)),
        s"column $from keys pending equality deletes — run compactEq() " +
          "(or any row-level op / maintenance tick) before renaming it")
      // constraint expressions are stored as SQL text over LOGICAL
      // names — a rename would silently break them at the next landing
      constraintsAt(spark, root, base).foreach { case (n, e) =>
        require(!constraintRefs(spark, e).contains(from),
          s"column $from is referenced by constraint $n ($e) — drop " +
            "the constraint (and re-add it under the new name) first") }
      require(!schema.fieldNames.contains(to),
        s"column $to already exists")
      val next = StructType(schema.fields.map { f =>
        if (f.name != from) f
        else {
          val phys = physicalName(f)
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
          val md =
            if (phys == to) mb.remove(PhysicalKey).build()
            else mb.putString(PhysicalKey, phys).build()
          f.copy(name = to, metadata = md)
        }
      })
      (manifest(spark, root, base), next)
    }
  }

  /** Navigate `parent` (logical names, structs at every step) and
    * apply `edit` to the struct type there — the shared schema
    * surgery of the NESTED evolution commits. An empty path edits the
    * top level; a path through an array/map refuses (element types do
    * not evolve member-wise). */
  private def mapStructAt(schema: StructType, parent: Seq[String],
                          what: String)
                         (edit: StructType => StructType): StructType = {
    def go(dt: org.apache.spark.sql.types.DataType,
           rest: Seq[String]): org.apache.spark.sql.types.DataType =
      (dt, rest) match {
        case (st: StructType, Seq()) => edit(st)
        case (st: StructType, h +: t) =>
          require(st.fieldNames.contains(h),
            s"$what: no field $h under ${parent.mkString(".")}")
          StructType(st.fields.map(f =>
            if (f.name != h) f else f.copy(dataType = go(f.dataType, t))))
        case (other, _) => throw new IllegalArgumentException(
          s"$what: path crosses a non-struct (${other.simpleString}) — " +
            "array/map element types do not evolve member-wise")
      }
    go(schema, parent).asInstanceOf[StructType]
  }

  /** The PHYSICAL dotted path of a logical field path — what parquet
    * footers carry ([[physicalColumns]]) and the nested re-add guard
    * compares against. */
  private def physicalPath(schema: StructType, path: Seq[String]): String = {
    var dt: org.apache.spark.sql.types.DataType = schema
    path.map { n =>
      val st = dt.asInstanceOf[StructType]
      val f = st.fields.find(_.name == n).getOrElse(
        sys.error(s"no field $n in ${st.simpleString}"))
      dt = f.dataType
      physicalName(f)
    }.mkString(".")
  }

  /** RENAME a NESTED struct field — metadata-only, exactly the
    * top-level [[renameColumn]] machinery one level down: the
    * member's physical name freezes in ITS OWN field metadata, data
    * files never rewrite, prior versions read under their own
    * sidecars. `path` is the full logical path (e.g. Seq("s", "a")).
    * A struct that keys pending equality deletes refuses (the delete
    * files carry its values under the old member names — struct
    * equality would stop resolving). */
  def renameColumnPath(spark: SparkSession, root: String,
                       path: Seq[String], to: String): Long = {
    require(path.nonEmpty, "rename requires a column path")
    if (path.length == 1) return renameColumn(spark, root, path.head, to)
    require(path.last != to, "rename requires two different names")
    commitLoopEvolving(spark, root) { base =>
      val schema = tableSchema(spark, root, base)
      require(!eqDeletes(spark, root, base).exists(
          _.keys.contains(path.head)),
        s"column ${path.head} keys pending equality deletes — run " +
          "compactEq() (or any row-level op / maintenance tick) before " +
          "renaming inside it")
      // constraints are SQL text over logical names; a constraint
      // touching ANY part of this top-level column blocks renames
      // inside it (conservative: refs track the head, the only name
      // the registry can see without a full analysis)
      constraintsAt(spark, root, base).foreach { case (n, e) =>
        require(!constraintRefs(spark, e).contains(path.head),
          s"column ${path.head} is referenced by constraint $n ($e) — " +
            "drop the constraint (and re-add it under the new name) " +
            "before renaming inside it") }
      val next = mapStructAt(schema, path.init, "RENAME COLUMN") { st =>
        require(st.fieldNames.contains(path.last),
          s"field ${path.mkString(".")} does not exist")
        require(!st.fieldNames.contains(to),
          s"field $to already exists in ${path.init.mkString(".")}")
        StructType(st.fields.map { f =>
          if (f.name != path.last) f
          else {
            val phys = physicalName(f)
            val mb = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
            val md =
              if (phys == to) mb.remove(PhysicalKey).build()
              else mb.putString(PhysicalKey, phys).build()
            f.copy(name = to, metadata = md)
          }
        })
      }
      (manifest(spark, root, base), next)
    }
  }

  /** ADD/DROP members of a NESTED struct column as ONE metadata-only
    * commit — [[alterColumns]] one level down. Added members must be
    * nullable (pre-evolution rows read NULL through the missing-field
    * path); dropped members stop projecting (bytes stay in old files,
    * invisible by name). Re-adding a member name that live files
    * still physically carry — or that a sibling's mapping claims —
    * maps the new member to a FRESH physical name, so stale bytes
    * never resurrect: the same footer-sweep guard as top level,
    * comparing DOTTED physical paths. */
  def alterNestedColumns(spark: SparkSession, root: String,
                         parent: Seq[String],
                         adds: Seq[org.apache.spark.sql.types.StructField],
                         drops: Seq[String]): Long = {
    require(parent.nonEmpty,
      "top-level changes go through alterColumns")
    require(adds.nonEmpty || drops.nonEmpty,
      "alterNestedColumns requires at least one change")
    adds.foreach(f => require(f.nullable,
      s"new field ${f.name} must be nullable — existing rows read NULL"))
    require(adds.map(_.name).distinct.length == adds.length,
      s"duplicate new field names: ${adds.map(_.name).mkString(", ")}")
    require(adds.map(_.name).toSet.intersect(drops.toSet).isEmpty,
      "a field cannot be both added and dropped in one change set")
    commitLoopEvolving(spark, root) { base =>
      val schema = tableSchema(spark, root, base)
      require(!eqDeletes(spark, root, base).exists(
          _.keys.contains(parent.head)),
        s"column ${parent.head} keys pending equality deletes — run " +
          "compactEq() (or any row-level op / maintenance tick) before " +
          "altering inside it")
      // a constraint referencing this top-level column blocks nested
      // drops under it (a dropped member would brick every later
      // landing's validation with an analysis error, not a refusal)
      if (drops.nonEmpty)
        constraintsAt(spark, root, base).foreach { case (n, e) =>
          require(!constraintRefs(spark, e).contains(parent.head),
            s"column ${parent.head} is referenced by constraint $n " +
              s"($e) — drop the constraint before altering inside it") }
      val physParent = physicalPath(schema, parent)
      val liveNames =
        if (adds.isEmpty) Set.empty[String]
        else physicalColumns(spark, filesAt(spark, root, base))
      val next = mapStructAt(schema, parent, "ALTER COLUMN") { st =>
        drops.foreach(n => require(st.fieldNames.contains(n),
          s"field ${parent.mkString(".")}.$n does not exist"))
        adds.foreach(f => require(!st.fieldNames.contains(f.name),
          s"field ${parent.mkString(".")}.${f.name} already exists"))
        require(st.fields.length + adds.length > drops.distinct.length,
          "cannot drop every field of a struct — drop the column instead")
        val taken = st.fields.map(physicalName).toSet
        val adds2 = adds.map { f =>
          if (!liveNames.contains(s"$physParent.${f.name}") &&
              !taken.contains(f.name)) f
          else f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putString(PhysicalKey, f.name + "_gf" +
                java.util.UUID.randomUUID().toString.take(8))
              .build())
        }
        StructType(st.fields.filterNot(f => drops.contains(f.name)) ++
          adds2)
      }
      (manifest(spark, root, base), next)
    }
  }

  /** Lossless primitive WIDENINGS the vectorized parquet reader
    * serves per file (its updater factory upcasts int32→long,
    * float→double, … at read) — the set `widenColumnType` accepts. */
  private[graft] def widenable(from: org.apache.spark.sql.types.DataType,
                               to: org.apache.spark.sql.types.DataType)
      : Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType)            => true
      case (IntegerType, LongType)                        => true
      case (FloatType, DoubleType)                        => true
      case _ => false
    }
  }

  /** The widen guards shared by [[widenColumnType]]'s commit loop and
    * the catalog's whole-set pre-validation — validated against ONE
    * schema snapshot so a refused later widen in a multi-change ALTER
    * never strands an earlier one half-applied. */
  private def validateWiden(schema: StructType,
                            eqKeys: Set[String], name: String,
                            to: org.apache.spark.sql.types.DataType)
      : Unit = {
    require(schema.fieldNames.contains(name),
      s"column $name does not exist")
    val f = schema(name)
    require(widenable(f.dataType, to),
      s"ALTER COLUMN TYPE supports lossless primitive widening only " +
        s"(got ${f.dataType.simpleString} -> ${to.simpleString}) — " +
        "other changes need per-file rewrites")
    require(!f.metadata.contains(BucketKey),
      s"bucket key $name cannot change type — the frozen layout's " +
        "hash is type-sensitive; rebucket() (CALL optimize_table " +
        "with buckets) off the key first, then widen")
    require(!eqKeys.contains(name),
      s"column $name keys pending equality deletes — run compactEq() " +
        "(or any row-level op / maintenance tick) before widening")
  }

  /** The nested analog of [[validateWiden]]: validates a dotted-path
    * widen AND returns the widened schema — the catalog's pre-check
    * and [[widenColumnTypePath]]'s commit body run EXACTLY this, so
    * the guards can never drift apart. */
  private def validateNestedWiden(schema: StructType,
      eqKeys: Set[String], path: Seq[String],
      to: org.apache.spark.sql.types.DataType): StructType = {
    require(!eqKeys.contains(path.head),
      s"column ${path.head} keys pending equality deletes — run " +
        "compactEq() (or any row-level op / maintenance tick) before " +
        "widening inside it")
    mapStructAt(schema, path.init, "ALTER COLUMN TYPE") { st =>
      require(st.fieldNames.contains(path.last),
        s"field ${path.mkString(".")} does not exist")
      StructType(st.fields.map { f =>
        if (f.name != path.last) f
        else {
          require(widenable(f.dataType, to),
            s"ALTER COLUMN TYPE supports lossless primitive widening " +
              s"only (got ${f.dataType.simpleString} -> " +
              s"${to.simpleString})")
          f.copy(dataType = to)
        }
      })
    }
  }

  /** Validate a WHOLE widen set (dotted paths included) against the
    * current schema without committing anything (the catalog's
    * multi-change ALTER seam). */
  private[graft] def validateWidens(spark: SparkSession, root: String,
      widens: Seq[(Seq[String], org.apache.spark.sql.types.DataType)])
      : Unit = {
    val base = latestVersion(spark, root)
    val schema = tableSchema(spark, root, base)
    val eqKeys = eqDeletes(spark, root, base).flatMap(_.keys).toSet
    widens.foreach {
      case (Seq(n), t) => validateWiden(schema, eqKeys, n, t)
      case (path, t) =>
        validateNestedWiden(schema, eqKeys, path, t): Unit
    }
  }

  /** ALTER COLUMN TYPE — WIDENING only, metadata-only (the Delta
    * type-widening shape): the next version reuses the current
    * manifest's files verbatim under the WIDER sidecar type; old
    * files keep their narrow parquet pages and the vectorized reader
    * upcasts per file, new landings conform to the wide type, and the
    * manifest's stat triplets for the column cast in the same commit
    * so envelope proofs keep firing. Guarded seams: a BUCKET key
    * refuses (the layout's hash is type-sensitive — hash(5: int)
    * ≠ hash(5L)); a column keying PENDING equality deletes refuses
    * (the key files carry narrow-typed tuples — compact first); and
    * the column's bloom index, if any, stops serving — the index
    * records its build-time key type and consumers skip a mismatched
    * one (xxhash64 of the wide probe value would never match the
    * narrow-hashed bits, so a stale index would FALSELY exclude
    * files), with the directory swept AFTER the successful commit (a
    * FAILED widen must not destroy a still-valid index, and a racing
    * narrow rebuild is neutralized by the type check rather than a
    * delete-vs-build race). Narrowing and non-primitive changes
    * refuse — they would need per-file rewrites. Top-level only. */
  def widenColumnType(spark: SparkSession, root: String, name: String,
                      to: org.apache.spark.sql.types.DataType): Long = {
    var physName: String = null
    val v = commitLoopEvolving(spark, root) { base =>
      val schema = tableSchema(spark, root, base)
      validateWiden(schema,
        eqDeletes(spark, root, base).flatMap(_.keys).toSet, name, to)
      val phys = physicalFor(schema, name)
      physName = phys
      val m = manifest(spark, root, base)
      val m2 =
        if (!m.columns.contains(s"${phys}_min")) m
        else m.withColumn(s"${phys}_min", col(s"${phys}_min").cast(to))
          .withColumn(s"${phys}_max", col(s"${phys}_max").cast(to))
      (m2, StructType(schema.fields.map(x =>
        if (x.name != name) x else x.copy(dataType = to))))
    }
    // post-commit cleanup only — correctness comes from the read-side
    // type check ([[blooms]] filters a mismatched build-time type)
    val bp = new Path(bloomRootFor(root, physName))
    if (fs(spark, root).exists(bp)) fs(spark, root).delete(bp, true): Unit
    v
  }

  /** [[widenColumnType]] for a NESTED struct member (dotted path) —
    * strictly simpler than top level: stat triplets, bloom indexes,
    * and bucket keys are all top-level concerns, so a nested widen is
    * pure schema surgery (the vectorized reader upcasts the narrow
    * leaf pages per file exactly as at top level). A struct keying
    * pending equality deletes refuses like every nested evolution. */
  def widenColumnTypePath(spark: SparkSession, root: String,
                          path: Seq[String],
                          to: org.apache.spark.sql.types.DataType)
      : Long = {
    require(path.nonEmpty, "widen requires a column path")
    if (path.length == 1)
      return widenColumnType(spark, root, path.head, to)
    commitLoopEvolving(spark, root) { base =>
      val schema = tableSchema(spark, root, base)
      val next = validateNestedWiden(schema,
        eqDeletes(spark, root, base).flatMap(_.keys).toSet, path, to)
      (manifest(spark, root, base), next)
    }
  }

  // ------------------------------------------------- deletion vectors

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Load one DV sidecar: a `java.util.BitSet.toByteArray` image —
    * bit k set ⇔ row index k of the sidecar's data file is deleted.
    * Size ∝ file row count / 8 (≤ ~12 MB for a 100M-row file), loaded
    * where it is consumed (an executor task), never on the driver. */
  private[graft] def readDvBits(conf: org.apache.hadoop.conf.Configuration,
                                dvPath: String): java.util.BitSet = {
    val p = new Path(dvPath)
    val in = p.getFileSystem(conf).open(p)
    val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
    finally in.close()
    java.util.BitSet.valueOf(bytes)
  }

  /** Expand (data file → DV sidecar) pairs into deleted
    * (`_dv_file`, `_dv_idx`) rows — on EXECUTORS: each task reads its
    * sidecars and walks the set bits; the driver never loads a bitset. */
  private def dvRowsDf(spark: SparkSession,
                       pairs: Seq[(String, String)]): DataFrame = {
    val conf = new graft.util.SerConf(
      spark.sparkContext.hadoopConfiguration)
    val spk = spark
    import spk.implicits._
    spark.createDataset(pairs)
      .repartition(math.min(pairs.size, 32))
      .flatMap { case (p, dvp) =>
        val bits = readDvBits(conf.value, dvp)
        new Iterator[(String, Long)] {
          private var i = bits.nextSetBit(0)
          override def hasNext: Boolean = i >= 0
          override def next(): (String, Long) = {
            val out = (p, i.toLong); i = bits.nextSetBit(i + 1); out
          }
        }
      }.toDF("_dv_file", "_dv_idx")
  }

  /** Read a file subset WITH its deletion vectors applied — the
    * DataFrame-level reader every INTERNAL consumer of file contents
    * rides (rewrite cores, change-feed diffs, incremental optimize;
    * user-facing reads apply DVs inside the DSv2 scan instead, see
    * [[graft.sources.v2.GraftTable]]). Clean files read verbatim;
    * DV-bearing files read with their file position (`_metadata
    * .row_index`) and anti-join the expanded deleted rows — cost ∝
    * subset + deleted rows in it. `totalDvRows` (from the manifest)
    * picks the join strategy: small DV sets broadcast, large ones
    * shuffle — never a blind broadcast of an unbounded side. */
  private[graft] def readFilesDv(spark: SparkSession, schema: StructType,
                                 files: Seq[(String, Option[String])],
                                 totalDvRows: Long): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val clean = files.collect { case (p, None) => p }
    val dvd = files.collect { case (p, Some(dv)) => (p, dv) }
    // files carry PHYSICAL column names; readers hand back logical
    // (nested mappings rename back through a positional struct cast)
    val toLogical = schema.fields.toIndexedSeq.map { f =>
      val c = col(physicalName(f))
      (if (typeHasMapping(f.dataType)) c.cast(relaxedType(f.dataType))
       else c).as(f.name)
    }
    val cleanDf =
      if (clean.isEmpty) None
      else Some(spark.read.schema(toPhysical(schema)).parquet(clean: _*)
        .select(toLogical: _*))
    val dvDf =
      if (dvd.isEmpty) None
      else {
        val raw = spark.read.schema(toPhysical(schema))
          .parquet(dvd.map(_._1): _*)
          .withColumn("_dv_file", canonPathCol(col("_metadata.file_path")))
          .withColumn("_dv_idx", col("_metadata.row_index"))
        val dels0 = dvRowsDf(spark, dvd)
        val dels = dvJoinSide(dels0, dvd, totalDvRows)
        Some(raw.join(dels, Seq("_dv_file", "_dv_idx"), "left_anti")
          .select(toLogical: _*))
      }
    (cleanDf.toSeq ++ dvDf.toSeq).reduce(_ unionByName _)
  }

  /** Join-strategy pick for the expanded deleted-rows side: BROADCAST
    * only when the estimated serialized size (each row repeats its
    * file-path string + a long) stays under 64 MB — a row-count
    * threshold alone would happily broadcast hundreds of MB of
    * repeated path strings on a mass delete; anything larger shuffles. */
  private def dvJoinSide(dels: DataFrame, dvd: Seq[(String, String)],
                         totalDvRows: Long): DataFrame = {
    val maxPath = dvd.map(_._1.length).foldLeft(0)(math.max)
    if (totalDvRows * (maxPath + 16L) <= (64L << 20)) broadcast(dels)
    else dels.hint("shuffle_hash")
  }

  /** Per-file DV state of one manifest: path → (dv sidecar, dv rows,
    * file rows) — one metadata-scale collect. */
  private def dvStates(spark: SparkSession, root: String, version: Long)
      : Seq[(String, Option[String], Long, Long)] = {
    val (schema, rows) = manifestCollected(spark, root, version)
    val Seq(ip, id, iv, ir) = Seq("path", "dv_path", "dv_rows",
      "row_count").map(schema.fieldIndex)
    rows.map(r => (r.getString(ip), Option(r.getString(id)),
      r.getLong(iv), r.getLong(ir))).sortBy(_._1)
  }

  /** MERGE-ON-READ row-level DELETE — the point-delete grain a 100 TB
    * table needs: instead of REWRITING every touched file (the
    * [[deleteWhere]] copy-on-write grain, cost ∝ touched bytes), the
    * commit writes one tiny DELETION-VECTOR sidecar per touched file —
    * a bitset of deleted row positions, ≤ rowCount/8 bytes — and the
    * next manifest points the surviving files at their vectors. Cost ∝
    * touched-file SCAN + deleted-row BITS; the data files themselves
    * carry forward BY REFERENCE (the Delta/Iceberg position-delete
    * grain).
    *
    * Semantics are identical to [[deleteWhere]] (SQL DELETE: a NULL
    * predicate keeps the row), proven by the shared oracle gate.
    * Every read path applies the vectors: user-facing scans inside
    * the DSv2 source, internal readers through [[readFilesDv]], the
    * change feed by treating a DV change as remove+add of the file's
    * state. Envelopes and blooms of a DV-bearing file become
    * CONSERVATIVE (supersets of the live rows) — sound for pruning
    * and touched-file search; metadata aggregates keep COUNT(*) exact
    * (live = row_count − dv_rows) and route MIN/MAX to the scan.
    * A repeated delete MERGES vectors (old ∪ new — idempotent); a
    * file whose vector covers every row drops from the manifest
    * entirely. [[optimizeIncremental]] purges vectors once a file is
    * half dead; [[optimize]] purges all. Sidecars are attempt-unique
    * and swept by [[vacuum]] once unreferenced. */
  def deleteWhereMor(spark: SparkSession, root: String, cond: Column): Long =
    commitLoop(spark, root, eqReg = _ => Nil) { base =>
      val (m, states) = effectiveManifest(spark, root, base)
      val schema = tableSchema(spark, root, base)
      val stats = statsCols(spark, root, base)
      val resolvedCond = toPhysicalExpr(
        resolveCond(spark, cond, schema), schema)
      val excluded = graft.plans.StatsPruneRule.excludedByEnvelopes(
        spark, resolvedCond, m, stats)
      // provably ALL-MATCHING files drop from the manifest directly —
      // no position scan, no vector sidecar (the metadata-only grain,
      // same proof as [[deleteWhere]]'s; raw envelopes are supersets
      // of the live rows, so a DV-bearing file's proof still holds)
      val dropped = graft.plans.StatsPruneRule.wholeFileMatched(
        resolvedCond, m, stats) -- excluded
      val kept =
        if (dropped.isEmpty) m
        else m.filter(!col("path").isin(dropped.toSeq: _*))
      val touched = states.filterNot(s =>
        excluded.contains(s._1) || dropped.contains(s._1))
      if (touched.isEmpty) kept
      else {
        // file positions of the rows the predicate matches — raw read
        // (existing DVs included: re-matching an already-deleted row
        // re-sets an already-set bit, which is what makes the merge
        // idempotent); physical names read, logical handed to `cond`
        val matched = spark.read.schema(toPhysical(schema))
          .parquet(touched.map(_._1): _*)
          .select(canonPathCol(col("_metadata.file_path")).as("_p") +:
            col("_metadata.row_index").as("_i") +:
            schema.fields.toIndexedSeq.map(f =>
              col(physicalName(f)).as(f.name)): _*)
          .filter(coalesce(cond, lit(false)))
          .select(col("_p"), col("_i"))
        vectorPositions(spark, root, kept, states, touched, matched)
          .getOrElse(kept)
      }
    }

  /** The deletion-vector bitset writer shared by the merge-on-read
    * commits ([[vectorPositions]]) and the equality-delete read-side
    * resolution ([[resolveEq]]): one writer task per hash bucket of
    * files builds each file's bitset from its (file, position) rows —
    * existing vectors OR-ed in via `oldDv` — and writes an
    * ATTEMPT-UNIQUE sidecar under `dvDir` (a killed speculative twin
    * can never tear the file the winning attempt's returned row
    * names). The collect is metadata-scale: (file, sidecar, total
    * deleted bits) per touched file. */
  private def writeVectors(spark: SparkSession, dvDir: String,
                           oldDv: Map[String, String],
                           positions: DataFrame): Seq[(String, String, Long)] = {
    val conf = new graft.util.SerConf(
      spark.sparkContext.hadoopConfiguration)
    val spk = spark
    import spk.implicits._
    positions.repartition(col("_p")).as[(String, Long)]
      .mapPartitions { it =>
        val byFile = new scala.collection.mutable.HashMap[
          String, java.util.BitSet]()
        it.foreach { case (p, i) =>
          // bitset positions are Int — a >2^31-row parquet file (far
          // past any sane file size) must fail loudly, never wrap
          // into a WRONG bit
          require(i <= Int.MaxValue.toLong,
            s"row index $i of $p exceeds the deletion-vector range — " +
              "split the file (OPTIMIZE) before merge-on-read deletes")
          byFile.getOrElseUpdate(p, new java.util.BitSet())
            .set(i.toInt)
        }
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        byFile.iterator.map { case (p, bits) =>
          oldDv.get(p).foreach(old =>
            bits.or(readDvBits(conf.value, old)))
          val out = s"$dvDir/${md5hex(p)}-$attempt.dv"
          val outPath = new Path(out)
          val os = outPath.getFileSystem(conf.value)
            .create(outPath, true)
          try os.write(bits.toByteArray) finally os.close()
          (p, out, bits.cardinality().toLong)
        }
      }.collect().toSeq
  }

  /** Shared commit core of the merge-on-read ops: given the matched
    * (file, position) rows of one base manifest, write the merged
    * vectors ([[writeVectors]]) and return the next manifest —
    * existing vectors OR-ed in, fully-covered files dropped,
    * untouched rows verbatim. None when nothing matched (the caller
    * commits the base unchanged). */
  private def vectorPositions(spark: SparkSession, root: String,
                              m: DataFrame,
                              states: Seq[(String, Option[String], Long, Long)],
                              touched: Seq[(String, Option[String], Long, Long)],
                              positions: DataFrame): Option[DataFrame] = {
    val spk = spark
    import spk.implicits._
    val dvDir = s"${dvRoot(root)}/${java.util.UUID.randomUUID().toString}"
    val oldDv: Map[String, String] =
      touched.collect { case (p, Some(dv), _, _) => p -> dv }.toMap
    val newEntries = writeVectors(spark, dvDir, oldDv, positions)
    if (newEntries.isEmpty) None
    else {
      val rowsByPath = states.map(s => s._1 -> s._4).toMap
      val dead = newEntries.collect {
        case (p, _, n) if n >= rowsByPath(p) => p }
      val upd = newEntries.filterNot(e => dead.contains(e._1))
        .toDF("path", "_new_dv", "_new_rows")
      Some(m.filter(!col("path").isin(dead: _*))
        .join(broadcast(upd), Seq("path"), "left")
        .withColumn("dv_path", coalesce(col("_new_dv"), col("dv_path")))
        .withColumn("dv_rows",
          coalesce(col("_new_rows"), col("dv_rows")))
        .drop("_new_dv", "_new_rows"))
    }
  }

  // ------------------------------------- equality-delete resolution
  //
  // Read-side materialization of pending equality deletes: the keys a
  // [[mergeEq]] committed resolve into ORDINARY deletion vectors over
  // the envelope/bloom-touched file subset, written once per version
  // into attempt-unique scratch under `_dv` and cached per (root,
  // version) — so every DV-aware consumer (the DSv2 scan, the
  // internal readers, the change feed) serves equality deletes with
  // zero new read machinery. The resolution job is exactly the
  // matched-positions scan [[mergeMor]] would have run at WRITE time,
  // deferred to the first read and paid once; [[compactEq]] / the
  // first row-level op / the maintenance tick make it durable.

  /** Version-keyed cache of resolved equality deletes. Entries are
    * immutable per version; scratch sidecars are TTL-swept by
    * [[vacuum]] when no manifest adopted them, so a hit re-validates
    * one sidecar's existence before being trusted. */
  private val eqCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Seq[(String, Option[String], Long, Long)]]()

  /** Cached resolutions retained per table root — newest-N covers the
    * live readers (the current version plus a few time travelers)
    * while bounding a long-lived driver that walks many versions. */
  private val EqCacheVersionsPerRoot = 4

  /** Test hook: simulate a FRESH JVM's empty resolution/probe
    * caches. */
  private[graft] def clearEqCache(): Unit = {
    eqCache.clear()
    eqProbeCache.clear()
  }

  /** Whether `version` has pending (unmaterialized) equality deletes
    * — consumers that answer from MANIFEST STATISTICS alone (metadata
    * aggregates) must route to the scan while true. */
  private[graft] def hasPendingEq(spark: SparkSession, root: String,
                                  version: Long): Boolean =
    eqDeletes(spark, root, version).nonEmpty

  /** Per-file effective DV state of one version: path → (dv sidecar,
    * deleted rows, file rows) with any pending equality deletes
    * RESOLVED in (fully-dead files dropped). Without pending deletes
    * this is exactly the manifest's own [[dvStates]]. */
  private[graft] def effectiveStates(spark: SparkSession, root: String,
                                     version: Long)
      : Seq[(String, Option[String], Long, Long)] = {
    val entries = eqDeletes(spark, root, version)
    if (entries.isEmpty) return dvStates(spark, root, version)
    val key = (canon(root), version)
    val hit = eqCache.get(key)
    // re-validate EVERY scratch sidecar: committed vectors are
    // refcount-durable, but unadopted eqres scratch is what the
    // vacuum TTL sweeps out from under a long-lived cache entry —
    // and it sweeps file by file, so checking only one sidecar would
    // let a partially swept resolution serve dangling paths (the
    // read then fails until the JVM restarts). Scratch sidecars are
    // few — one per eq-touched file — so each gets its own exists();
    // any miss evicts and recomputes instead of failing the read.
    if (hit != null) {
      val scratch = hit.collect {
        case (_, Some(dv), _, _) if dv.contains("/eqres-") => dv }
      if (scratch.forall(dv => fs(spark, root).exists(new Path(dv))))
        return hit
      eqCache.remove(key): Unit
    }
    val resolved = resolveEq(spark, root, version,
      manifest(spark, root, version), entries)
    eqCache.put(key, resolved)
    // BOUNDED per root: entries are full file-state lists, so a
    // long-lived driver walking many versions of a large table would
    // otherwise accumulate them for the life of the JVM. Old versions
    // re-resolve on the rare re-read; newest-N covers the live
    // readers (current version + a few time travelers).
    val mine = eqCache.keySet.asScala.filter(_._1 == key._1).toSeq
    if (mine.size > EqCacheVersionsPerRoot)
      mine.sortBy(_._2).dropRight(EqCacheVersionsPerRoot)
        .foreach(k => eqCache.remove(k): Unit)
    resolved
  }

  /** One pending equality delete compiled for PURE-READ application:
    * its commit seq, logical key columns, the normalized key tuples
    * (see [[graft.sources.v2.GraftEqProbe.normalize]]), and the
    * envelope/bloom-touched file subset — only those files pay the
    * per-task probe; everything else reads the untouched clean
    * path. */
  private[graft] final case class EqProbe(seq: Long, keyCols: Seq[String],
                                          keys: Set[Seq[Any]],
                                          touched: Set[String])

  /** Probe plans cached per (root, version) — entries are a few key
    * sets plus touched-path sets, all metadata-scale; key files are
    * immutable and registry-refcounted (vacuum keeps referenced
    * ones), so entries never go stale. Bounded like [[eqCache]]. Each
    * entry carries the key-file BYTES it holds in memory, re-checked
    * against the conf on every hit — neither raising nor lowering
    * `spark.graft.eq.maxProbeBytes` is pinned by the cache. */
  private val eqProbeCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), (Long, Seq[EqProbe])]()

  /** Compile `version`'s pending equality deletes into per-task probe
    * plans — the PURE-READ application path: a SELECT on an
    * eq-pending table applies the delete keys above the columnar scan
    * (broadcast with the task closure) and WRITES NOTHING, the
    * Iceberg v2 reader shape. Returns Some(Nil) when nothing is
    * pending, and None when this version must fall back to scratch
    * materialization ([[effectiveStates]]): a key type the probe
    * cannot represent, or key files past the in-memory guard
    * (`spark.graft.eq.maxProbeBytes`, default 64 MiB — a delete that
    * large is not "one micro-batch's keys" and belongs to
    * [[compactEq]]). */
  private[graft] def eqProbes(spark: SparkSession, root: String,
                              version: Long): Option[Seq[EqProbe]] = {
    val entries = eqDeletes(spark, root, version)
    if (entries.isEmpty) return Some(Nil)
    val key = (canon(root), version)
    val maxBytes = spark.conf
      .get("spark.graft.eq.maxProbeBytes", (64L << 20).toString).toLong
    val hit = eqProbeCache.get(key)
    if (hit != null) {
      // a LOWERED guard evicts an oversized cached plan (and its
      // heap-held key tuples) instead of pinning the old decision
      if (hit._1 <= maxBytes) return Some(hit._2)
      eqProbeCache.remove(key): Unit
      return None
    }
    val schema = tableSchema(spark, root, version)
    val f = fs(spark, root)
    // lazy: an unsupported key type short-circuits WITHOUT the
    // per-entry FS walk (its None is deliberately never cached, so a
    // permanently-scratch-path table must not re-pay it every SELECT);
    // the guard forces it on every path that can cache a plan
    lazy val keyBytes = entries.map(e =>
      f.getContentSummary(new Path(e.path)).getLength).sum
    val computed: Option[Seq[EqProbe]] = {
      val supported = entries.forall(_.keys.forall(k =>
        graft.sources.v2.GraftEqProbe.supported(schema(k).dataType)))
      if (!supported || keyBytes > maxBytes) None
      else {
        val m = manifest(spark, root, version)
        // touched subsets per key-column group (entries of one
        // streaming ingest share keys — one proof serves them all);
        // per-file applicability then narrows by seq in the planner
        val touchedByGroup: Map[Seq[String], Set[String]] =
          entries.groupBy(_.keys).map { case (keyCols, es) =>
            val keysDf = spark.read.parquet(es.map(_.path): _*)
              .select(keyCols.map(col): _*).distinct()
            keyCols -> touchedPaths(spark, root, m, keysDf, keyCols,
              schema).toSet
          }
        Some(entries.map { e =>
          val types = e.keys.map(k => schema(k).dataType)
          val rows = spark.read.parquet(e.path)
            .select(e.keys.map(col): _*)
            .queryExecution.executedPlan.executeCollect()
          val tuples: Set[Seq[Any]] = rows.iterator.flatMap { r =>
            val arr = new Array[Any](types.length)
            var i = 0
            var hasNull = false
            while (i < types.length && !hasNull) {
              if (r.isNullAt(i)) hasNull = true
              else arr(i) = graft.sources.v2.GraftEqProbe
                .normalize(r.get(i, types(i)))
              i += 1
            }
            // a NULL key component matches nothing (SQL equality) —
            // the tuple can never kill a row, so it never enters
            if (hasNull) None
            else Some(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(arr): Seq[Any])
          }.toSet
          EqProbe(e.seq, e.keys, tuples, touchedByGroup(e.keys))
        })
      }
    }
    // only POSITIVE plans cache: the fall-back-to-materialization
    // decision depends on the mutable maxProbeBytes conf, and a
    // cached None would pin this version to the scratch path for the
    // JVM's life even after the conf is raised (the None computation
    // is a registry read + per-entry FS length — cheap to redo)
    computed.foreach { plan =>
      eqProbeCache.put(key, (keyBytes, plan))
      val mine = eqProbeCache.keySet.asScala.filter(_._1 == key._1).toSeq
      if (mine.size > EqCacheVersionsPerRoot)
        mine.sortBy(_._2).dropRight(EqCacheVersionsPerRoot)
          .foreach(k => eqProbeCache.remove(k): Unit)
    }
    computed
  }

  /** The DSv2 scan's PURE-READ listing of one version: every manifest
    * file with its size, vector sidecar, per-file `seq`, and row
    * counts — raw states, no resolution, NOTHING written. The scan
    * applies pending equality deletes per task from [[eqProbes]]. */
  private[graft] def rawFiles(spark: SparkSession, root: String,
                              version: Long)
      : Seq[(String, Long, Option[String], Long, Long, Long)] = {
    val (schema, rows) = manifestCollected(spark, root, version)
    val Seq(ip, is, id, iq, ir, iv) = Seq("path", "size", "dv_path",
      "seq", "row_count", "dv_rows").map(schema.fieldIndex)
    rows.map(r => (r.getString(ip), r.getLong(is),
      Option(r.getString(id)), r.getLong(iq), r.getLong(ir),
      r.getLong(iv)))
  }

  /** [[effectiveStates]] with each file's size — the DSv2 scan's
    * listing shape. */
  private[graft] def effectiveFiles(spark: SparkSession, root: String,
                                    version: Long)
      : Seq[(String, Long, Option[String], Long)] = {
    val (schema, rows) = manifestCollected(spark, root, version)
    val (ip, is) = (schema.fieldIndex("path"), schema.fieldIndex("size"))
    val sizes = rows.map(r => r.getString(ip) -> r.getLong(is)).toMap
    effectiveStates(spark, root, version).map(s =>
      (s._1, sizes(s._1), s._2, s._3))
  }

  /** The EFFECTIVE manifest of one version — pending equality deletes
    * materialized as deletion vectors on its rows (dead files
    * dropped), plus the states. Row-level ops START FROM THIS VIEW:
    * their commit then carries the materialized vectors and stages an
    * EMPTY registry (`_ => Nil`), folding the compaction into their
    * own CAS commit for free. */
  private def effectiveManifest(spark: SparkSession, root: String,
                                version: Long)
      : (DataFrame, Seq[(String, Option[String], Long, Long)]) = {
    val m = manifest(spark, root, version)
    if (eqDeletes(spark, root, version).isEmpty)
      return (m, dvStates(spark, root, version))
    val states = effectiveStates(spark, root, version)
    val spk = spark
    import spk.implicits._
    val stDf = states.map(s => (s._1, s._2.orNull, s._3))
      .toDF("path", "_e_dv", "_e_rows")
    // inner join drops fully-dead files; effective vectors replace
    val em = m.join(broadcast(stDf), Seq("path"), "inner")
      .withColumn("dv_path", col("_e_dv"))
      .withColumn("dv_rows", col("_e_rows"))
      .drop("_e_dv", "_e_rows")
      .select(m.columns.toIndexedSeq.map(col): _*)
    (em, states)
  }

  /** The resolution job itself — cost ∝ the envelope/bloom-TOUCHED
    * subset of files OLDER than the deletes, never the table: per key
    * set, the pending delete files union (each key row tagged with
    * its delete's seq), candidate files (file seq < some delete's
    * seq) narrow through the shared [[touchedPaths]] proofs, and one
    * scan of the survivors semi-joins the broadcast keys under the
    * ORDERING predicate (delete seq > file seq — a delete never kills
    * rows that landed at or after it). Matched positions OR into the
    * files' existing vectors via [[writeVectors]]. */
  private def resolveEq(spark: SparkSession, root: String, version: Long,
                        m: DataFrame, entries: Seq[EqEntry])
      : Seq[(String, Option[String], Long, Long)] = {
    val spk = spark
    import spk.implicits._
    val raw = dvStates(spark, root, version)
    val schema = tableSchema(spark, root, version)
    val seqByPath: Map[String, Long] = {
      val (ms, rows) = manifestCollected(spark, root, version)
      val (ip, iq) = (ms.fieldIndex("path"), ms.fieldIndex("seq"))
      rows.map(r => r.getString(ip) -> r.getLong(iq)).toMap
    }
    val maxSeq = entries.map(_.seq).max
    val cand = raw.filter(s => seqByPath(s._1) < maxSeq)
    if (cand.isEmpty) return raw
    val candDf = cand.map(_._1).toDF("path")
    val mCand = m.join(broadcast(candDf), Seq("path"), "left_semi")
    val perGroup = entries.groupBy(_.keys).toSeq.flatMap {
      case (keyCols, es) =>
        val keysDf = es.map(e =>
          spark.read.parquet(e.path)
            .select(keyCols.map(col) :+ lit(e.seq).as("_eq_seq"): _*))
          .reduce(_ unionByName _)
        val touched = touchedPaths(spark, root, mCand,
          keysDf.select(keyCols.map(col): _*).distinct(), keyCols, schema)
          .toSet
        val tStates = cand.filter(s => touched.contains(s._1))
        if (tStates.isEmpty) None
        else {
          val live = readFilesDvPos(spark, schema,
            tStates.map(s => (s._1, s._2)), tStates.map(_._3).sum)
          val seqDf = tStates.map(s => (s._1, seqByPath(s._1)))
            .toDF("_p", "_fseq")
          // delete-side keys renamed — the live side carries the same
          // logical names; NULL keys never match (SQL equality), the
          // documented probe-nothing convention
          val ek = keysDf.select(keyCols.toIndexedSeq
            .map(c => col(c).as(s"_ek_$c")) :+ col("_eq_seq"): _*)
          val positions = live.join(broadcast(seqDf), Seq("_p"))
            .join(broadcast(ek),
              keyCols.map(c => col(c) === col(s"_ek_$c"))
                .reduce(_ && _) && col("_eq_seq") > col("_fseq"),
              "left_semi")
            .select(col("_p"), col("_i"))
          Some((positions, tStates))
        }
    }
    if (perGroup.isEmpty) return raw
    val positions = perGroup.map(_._1).reduce(_ unionByName _)
    val oldDv: Map[String, String] = perGroup.flatMap(_._2).collect {
      case (p, Some(dv), _, _) => p -> dv }.toMap
    val dvDir = s"${dvRoot(root)}/eqres-${java.util.UUID.randomUUID()}"
    val newEntries = writeVectors(spark, dvDir, oldDv, positions)
    if (newEntries.isEmpty) return raw
    val upd = newEntries.map(e => e._1 -> ((e._2, e._3))).toMap
    raw.flatMap { case s @ (p, _, _, rc) =>
      upd.get(p) match {
        case None               => Some(s)
        case Some((_, n)) if n >= rc => None // fully dead
        case Some((ndv, n))     => Some((p, Some(ndv), n, rc))
      }
    }
  }

  /** MERGE by key at the EQUALITY-DELETE grain — the streaming keyed
    * ingest shape (Iceberg v2's upsert): the batch lands as fresh
    * files and its DISTINCT KEYS commit as an equality-delete file,
    * with ZERO reads of the target — write cost O(batch), where even
    * [[mergeMor]] scans the envelope/bloom-touched files per batch.
    * Matched old rows die AT READ TIME: the delete applies to every
    * file ADDED BEFORE it (manifest `seq` ordering), resolved into
    * ordinary deletion vectors over the touched subset on first read
    * (cached per version) and materialized durably by [[compactEq]],
    * any row-level op, or the maintenance tick. Same strict-schema
    * upsert semantics as [[mergeMor]]; in-batch duplicate keys are
    * the caller's contract (BOTH would survive — same-seq rows are
    * exempt from the batch's own delete). */
  def mergeEq(updates: DataFrame, root: String, keyCols: Seq[String]): Long =
    mergeEqCore(updates, root, keyCols, batchId = None).get

  /** Stream-idempotent [[mergeEq]] — [[mergeMorBatch]]'s exactly-once
    * contract (the producing micro-batch id commits atomically with
    * the version; a replayed id is a no-op) at the zero-target-read
    * grain. */
  def mergeEqBatch(updates: DataFrame, root: String, keyCols: Seq[String],
                   batchId: Long): Option[Long] =
    mergeEqCore(updates, root, keyCols, batchId = Some(batchId))

  private def mergeEqCore(updates: DataFrame, root: String,
                          keyCols: Seq[String],
                          batchId: Option[Long]): Option[Long] = {
    require(keyCols.nonEmpty, "mergeEq requires at least one key column")
    require(keyCols.forall(updates.columns.contains),
      s"merge batch is missing key columns: " +
        keyCols.filterNot(updates.columns.contains).mkString(", "))
    val spark = updates.sparkSession
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist — create() first")
    val schema = tableSchema(spark, root, v)
    require(updates.columns.sorted.sameElements(schema.fieldNames.sorted),
      s"merge batch schema ${updates.columns.sorted.mkString(",")} != " +
        s"table schema ${schema.fieldNames.sorted.mkString(",")}")
    eqCommit(spark, root, keyCols,
      updates.select(keyCols.toIndexedSeq.map(col): _*),
      Some(updates), batchId)
  }

  /** CDC fold at the EQUALITY-DELETE grain — [[applyCdc]] semantics
    * (highest-seq change per key wins in-batch; D removes, others
    * upsert) with ZERO reads of the target: EVERY winner's key
    * commits as the delete file (a D's row dies outright; an upsert's
    * old row dies and its replacement lands at the same seq, exempt
    * from its own delete), and only the non-D winners land as fresh
    * files — write cost O(batch) where even [[applyCdcMor]] scans the
    * touched files per batch. The third CDC grain, same answer. */
  def applyCdcEq(changes: DataFrame, root: String, keyCols: Seq[String],
                 seqCol: String = "seq", opCol: String = "op"): Long = {
    require(keyCols.nonEmpty, "applyCdcEq requires at least one key column")
    val spark = changes.sparkSession
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist — create() first")
    val schema = tableSchema(spark, root, v)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val winners = changes
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")
      // evaluated twice below (keys + upserts) — never recompute a
      // window over the source between them
      .persist()
    try {
      val upserts = conform(
        winners.filter(not(col(opCol) === lit("D"))).drop(opCol, seqCol),
        schema)
      eqCommit(spark, root, keyCols,
        winners.select(keyCols.toIndexedSeq.map(col): _*),
        Some(upserts), batchId = None).get
    } finally winners.unpersist(): Unit
  }

  /** DELETE BY KEY at the equality-delete grain — every target row
    * whose key appears in `keys` dies, with ZERO reads of the target
    * (the `WHEN MATCHED THEN DELETE`-only MERGE, cost O(keys)). */
  def deleteByKeyEq(keys: DataFrame, root: String,
                    keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "deleteByKeyEq requires at least one key column")
    require(keyCols.forall(keys.columns.contains),
      s"key batch is missing key columns: " +
        keyCols.filterNot(keys.columns.contains).mkString(", "))
    val spark = keys.sparkSession
    require(latestVersion(spark, root) >= 0,
      s"manifest table at $root does not exist — create() first")
    eqCommit(spark, root, keyCols,
      keys.select(keyCols.toIndexedSeq.map(col): _*), None,
      batchId = None).get
  }

  /** Shared commit of one equality-delete batch: `keys0` land as the
    * delete's immutable key file, `rows` (when present) as fresh data
    * files — nothing reads the target; matched old rows die AT READ
    * TIME (per-task probes, or resolution on the compaction path). */
  private def eqCommit(spark: SparkSession, root: String,
                       keyCols: Seq[String], keys0: DataFrame,
                       rows: Option[DataFrame],
                       batchId: Option[Long]): Option[Long] = {
    val v = latestVersion(spark, root)
    if (batchId.exists(isReplay(spark, root, _))) return None
    val schema = tableSchema(spark, root, v)
    // the delete's key file: the batch's distinct keys CAST to the
    // table's declared types (resolution compares against conformed
    // stored values — a narrower-typed batch key must not miss),
    // written once, immutable, reusable across CAS retries
    val eqDir = s"${eqRoot(root)}/${java.util.UUID.randomUUID()}"
    keys0.select(keyCols.toIndexedSeq.map(c =>
      col(c).cast(schema(c).dataType).as(c)): _*).distinct()
      .write.parquet(eqDir)
    lazy val landed = rows.map(r => landFiles(conform(r, schema), root,
      statsCols(spark, root, v)))
    commitLoopEvolvingOpt(spark, root,
      extraStage = batchId
        .map(id => VersionedTable.stampBatch(spark, manifestsRoot(root), id) _)
        .getOrElse((_: String) => ()),
      eqReg = base => eqDeletes(spark, root, base) :+
        EqEntry(canon(eqDir), base + 1, keyCols)) { base =>
      if (batchId.exists(isReplay(spark, root, _))) None
      else {
        val m = manifest(spark, root, base)
        val next = landed match {
          case Some(l) => m.unionByName(l, allowMissingColumns = true)
            .select(m.columns.toIndexedSeq.map(col): _*)
          case None => m
        }
        Some((next, tableSchema(spark, root, base)))
      }
    }
  }

  /** Materialize every pending equality delete as deletion vectors in
    * ONE commit — the maintenance-tick compaction: the next manifest
    * is the EFFECTIVE view ([[effectiveManifest]]) under an empty
    * registry, so reads stop paying resolution and the delete key
    * files become vacuumable. None when nothing is pending. Content
    * is identical by construction (the same resolution serves reads).
    * Cost ∝ the touched subset — one read-side resolution adopted
    * into a metadata commit. */
  def compactEq(spark: SparkSession, root: String): Option[Long] = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root has no committed version")
    if (!hasPendingEq(spark, root, v)) return None
    commitLoopEvolvingOpt(spark, root, eqReg = _ => Nil) { base =>
      if (!hasPendingEq(spark, root, base)) None
      else Some((effectiveManifest(spark, root, base)._1,
        tableSchema(spark, root, base)))
    }
  }

  /** MERGE-ON-READ row-level UPDATE — [[deleteWhereMor]]'s sibling,
    * the Delta DV-update shape: the matched LIVE rows' old positions
    * join their files' deletion vectors, and their UPDATED COPIES land
    * as fresh appended files — cost ∝ MATCHED rows + touched-file
    * scan, zero untouched bytes rewritten (copy-on-write
    * [[updateWhere]] rewrites every touched file whole). Semantics are
    * SQL UPDATE exactly: rows where `cond` is true take the
    * assignments (values safe-CAST to the declared types, pre-update
    * values visible on the right-hand side); false/NULL rows are
    * untouched. Rows an existing vector already deleted are NOT
    * matched (they are not live — an update must never resurrect).
    * The matched set derives twice from one deterministic frame
    * (positions → vectors, values → landed copies) — immutable files
    * + a row-local predicate make the two derivations identical. */
  def updateWhereMor(spark: SparkSession, root: String, cond: Column,
                     sets: Seq[(String, Column)]): Long = {
    require(sets.nonEmpty, "updateWhereMor requires at least one assignment")
    commitLoop(spark, root, eqReg = _ => Nil) { base =>
      val (m, states) = effectiveManifest(spark, root, base)
      val schema = tableSchema(spark, root, base)
      val stats = statsCols(spark, root, base)
      sets.foreach { case (c, _) =>
        require(schema.fieldNames.contains(c),
          s"assignment target $c is not a table column") }
      val resolvedCond = toPhysicalExpr(
        resolveCond(spark, cond, schema), schema)
      val excluded = graft.plans.StatsPruneRule.excludedByEnvelopes(
        spark, resolvedCond, m, stats)
      val touched = states.filterNot(s => excluded.contains(s._1))
      if (touched.isEmpty) m
      else {
        // LIVE rows only: positions kept through the DV anti-join, so
        // an existing vector's rows can neither re-vector nor re-land.
        // The matched frame feeds TWO jobs (positions → vectors,
        // values → landed copies) — cache it so the touched files scan
        // once, not twice (the op's advertised cost bound)
        val live = readFilesDvPos(spark, schema,
          touched.map(s => (s._1, s._2)), touched.map(_._3).sum)
        val matched = live.filter(coalesce(cond, lit(false))).persist()
        try {
          val updated = matched.select(schema.fields.toIndexedSeq.map { f =>
            sets.find(_._1 == f.name) match {
              case Some((_, v)) => v.cast(f.dataType).as(f.name)
              case None         => col(f.name)
            }
          }: _*)
          vectorPositions(spark, root, m, states, touched,
            matched.select(col("_p"), col("_i"))) match {
            case None       => m // nothing matched — nothing lands either
            case Some(next) =>
              next.unionByName(
                landFiles(physSelect(updated, schema), root, stats))
          }
        } finally matched.unpersist(): Unit
      }
    }
  }

  /** MERGE-ON-READ keyed MERGE — [[merge]] at the deletion-vector
    * grain: the batch's matched keys VECTOR their old positions
    * (touched files keep their bytes) and the whole batch lands as
    * fresh appended files — cost ∝ BATCH + matched rows + one scan of
    * the envelope/bloom-touched files, where copy-on-write [[merge]]
    * REWRITES those files whole. Same semantics (matched keys
    * replaced, unmatched insert, strict schema, in-batch duplicate
    * keys are the caller's contract), proven on the shared oracle
    * algebra. The read-side tax is the vectored files' position-skip
    * scans until maintenance purges them — the same deferral
    * [[deleteWhereMor]] documents. */
  def mergeMor(updates: DataFrame, root: String, keyCols: Seq[String]): Long =
    mergeMor(updates, root, keyCols, evolveSchema = false)

  /** [[mergeMor]] with ADDITIVE schema evolution — [[merge]]'s
    * `evolveSchema` contract on the vector grain, where the manifest
    * representation's no-rewrite property is total: untouched files
    * never rewrote anyway, and here even the MATCHED files keep their
    * bytes — evolution costs exactly the wider sidecar plus the
    * landed batch. A batch may carry NEW columns (existing rows read
    * NULL) or OMIT existing ones (landed rows read NULL there). */
  def mergeMor(updates: DataFrame, root: String, keyCols: Seq[String],
               evolveSchema: Boolean): Long =
    mergeMorCore(updates, root, keyCols, evolveSchema, batchId = None).get

  /** Stream-idempotent [[mergeMor]] — the [[writeBatch]] contract at
    * the keyed grain: the producing micro-batch id commits atomically
    * with the version, a replayed id is a no-op (None), so the keyed
    * streaming sink is EXACTLY-ONCE rather than merely
    * idempotent-by-value (a value-idempotent replay still commits an
    * extra version whose change feed would show phantom deltas). */
  def mergeMorBatch(updates: DataFrame, root: String, keyCols: Seq[String],
                    batchId: Long): Option[Long] =
    mergeMorCore(updates, root, keyCols, evolveSchema = false,
      batchId = Some(batchId))

  private def mergeMorCore(updates: DataFrame, root: String,
                           keyCols: Seq[String], evolveSchema: Boolean,
                           batchId: Option[Long]): Option[Long] = {
    require(keyCols.nonEmpty, "mergeMor requires at least one key column")
    // the key must be REAL in every mode: an evolving batch missing a
    // key column would null-fill it and land unmatchable null-keyed
    // rows — a silent bad insert, never an upsert
    require(keyCols.forall(updates.columns.contains),
      s"merge batch is missing key columns: " +
        keyCols.filterNot(updates.columns.contains).mkString(", "))
    val spark = updates.sparkSession
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist — create() first")
    if (batchId.exists(isReplay(spark, root, _))) return None
    val baseSchema = tableSchema(spark, root, v)
    // the batch's GENUINELY new columns — the only fields an attempt
    // may widen a sidecar by (re-adding every entry-schema field would
    // silently resurrect a column a concurrent dropColumns removed)
    val batchNewFields =
      if (!evolveSchema) {
        require(
          updates.columns.sorted.sameElements(baseSchema.fieldNames.sorted),
          s"merge batch schema ${updates.columns.sorted.mkString(",")} != " +
            s"table schema ${baseSchema.fieldNames.sorted.mkString(",")}")
        Array.empty[org.apache.spark.sql.types.StructField]
      } else updates.schema.fields.filterNot(f =>
        baseSchema.fieldNames.contains(f.name)).map(_.copy(nullable = true))
    val schema = StructType(baseSchema.fields ++ batchNewFields)
    // keys come off the LOGICAL-named frame (conform renames to the
    // physical landing names, which the key joins must not see)
    val padded =
      schema.fieldNames.filterNot(updates.columns.contains).toSeq
        .foldLeft(updates)((df, c) =>
          df.withColumn(c, lit(null).cast(schema(c).dataType)))
    val batch = conform(padded, schema)
    val keys = padded.select(keyCols.map(col): _*).distinct()
    // immutable landed files are reusable across CAS retry attempts
    lazy val landed = landFiles(batch, root, statsCols(spark, root, v))
    commitLoopEvolvingOpt(spark, root, extraStage = batchId
      .map(id => VersionedTable.stampBatch(spark, manifestsRoot(root), id) _)
      .getOrElse((_: String) => ()), eqReg = _ => Nil) { base =>
      if (batchId.exists(isReplay(spark, root, _))) None
      else {
        val (m, states) = effectiveManifest(spark, root, base)
        val touched = touchedPaths(spark, root, m, keys, keyCols,
          tableSchema(spark, root, base)).toSet
        val touchedStates = states.filter(s => touched.contains(s._1))
        val live = readFilesDvPos(spark, schema,
          touchedStates.map(s => (s._1, s._2)), touchedStates.map(_._3).sum)
        val positions = live.join(keys, keyCols, "left_semi")
          .select(col("_p"), col("_i"))
        // the attempt's schema is ITS base's sidecar widened by the
        // BATCH's new columns only — a conflicting writer's evolution
        // (or column drop) is preserved, never clobbered
        val b = tableSchema(spark, root, base)
        val attemptSchema = StructType(b.fields ++
          batchNewFields.filterNot(f => b.fieldNames.contains(f.name)))
        // allowMissingColumns absorbs a base that gained stats columns
        // (concurrent evolution — the batch's absent cells surface as
        // NULL = unknown, conservative); the final projection pins the
        // BASE manifest's column set, so stat triplets a concurrent
        // dropColumns removed can never union back in
        val next = vectorPositions(spark, root, m, states, touchedStates,
            positions)
          .getOrElse(m).unionByName(landed, allowMissingColumns = true)
          .select(m.columns.toIndexedSeq.map(col): _*)
        Some((next, attemptSchema))
      }
    }
  }

  /** MERGE-ON-READ CDC fold — [[applyCdc]] at the deletion-vector
    * grain: every winning key's old position vectors, the non-D
    * winners land as appended files. Cost ∝ batch + matched rows;
    * semantics identical (highest-seq change per key wins in-batch,
    * D removes, others upsert). */
  def applyCdcMor(changes: DataFrame, root: String, keyCols: Seq[String],
                  seqCol: String = "seq", opCol: String = "op"): Long = {
    require(keyCols.nonEmpty, "applyCdcMor requires at least one key column")
    val spark = changes.sparkSession
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist — create() first")
    val schema = tableSchema(spark, root, v)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val winners = changes
      .withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")
    val keys = winners.select(keyCols.map(col): _*).distinct()
    val upserts = conform(
      winners.filter(not(col(opCol) === lit("D"))).drop(opCol, seqCol),
      schema)
    lazy val landed = landFiles(upserts, root, statsCols(spark, root, v))
    commitLoop(spark, root, eqReg = _ => Nil) { base =>
      val (m, states) = effectiveManifest(spark, root, base)
      val touched = touchedPaths(spark, root, m, keys, keyCols,
        tableSchema(spark, root, base)).toSet
      val touchedStates = states.filter(s => touched.contains(s._1))
      val live = readFilesDvPos(spark, schema,
        touchedStates.map(s => (s._1, s._2)), touchedStates.map(_._3).sum)
      val positions = live.join(keys, keyCols, "left_semi")
        .select(col("_p"), col("_i"))
      // allowMissingColumns + base-column pinning: see [[mergeMorCore]]
      vectorPositions(spark, root, m, states, touchedStates, positions)
        .getOrElse(m).unionByName(landed, allowMissingColumns = true)
        .select(m.columns.toIndexedSeq.map(col): _*)
    }
  }

  /** [[readFilesDv]] keeping each row's (file, position) as `_p`/`_i`
    * — for consumers that must VECTOR the rows they select
    * ([[updateWhereMor]], the keyed merge-on-read ops). Both branches
    * read positions; DV-bearing files anti-join their vectors so only
    * LIVE rows surface. */
  private def readFilesDvPos(spark: SparkSession, schema: StructType,
                             files: Seq[(String, Option[String])],
                             totalDvRows: Long): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .withColumn("_p", lit(null).cast("string"))
        .withColumn("_i", lit(null).cast("long"))
    val withPos = spark.read.schema(toPhysical(schema))
      .parquet(files.map(_._1): _*)
      .select(schema.fields.toIndexedSeq.map { f =>
        val c = col(physicalName(f))
        (if (typeHasMapping(f.dataType)) c.cast(relaxedType(f.dataType))
         else c).as(f.name)
      } :+
        canonPathCol(col("_metadata.file_path")).as("_p") :+
        col("_metadata.row_index").as("_i"): _*)
    val dvd = files.collect { case (p, Some(dv)) => (p, dv) }
    if (dvd.isEmpty) withPos
    else {
      val dels0 = dvRowsDf(spark, dvd)
        .withColumnRenamed("_dv_file", "_p").withColumnRenamed("_dv_idx", "_i")
      withPos.join(dvJoinSide(dels0, dvd, totalDvRows),
        Seq("_p", "_i"), "left_anti")
    }
  }

  /** Resolve a user predicate against the table schema (plan-only) so
    * the envelope-proof engine sees typed attributes. */
  private def resolveCond(spark: SparkSession, cond: Column,
                          schema: StructType)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .filter(cond).queryExecution.analyzed match {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) => c
      case other => sys.error(s"unexpected analyzed shape: $other")
    }

  /** RESTORE to a retained version — `RESTORE TABLE t TO VERSION AS OF
    * v` as a METADATA-ONLY commit: the next version's manifest is the
    * target version's manifest VERBATIM (every data file carries BY
    * REFERENCE, zero data I/O) under the target version's schema
    * sidecar, so the restore is itself a normal, time-travelable,
    * CAS-serialized commit — history is never rewritten, and the
    * restored files are re-referenced by a RETAINED manifest, which is
    * exactly what keeps the refcount-aware [[vacuum]] off them. Cost:
    * one manifest read + one manifest write. The equality-delete
    * registry restored is the TARGET version's: restoring to a
    * pre-delete version undoes the delete; restoring to a version
    * with pending deletes restores them pending. */
  def restore(spark: SparkSession, root: String, version: Long): Long = {
    commitLoopEvolving(spark, root,
      eqReg = _ => eqDeletes(spark, root, version),
      consReg = _ => constraintsAt(spark, root, version),
      ndvReg = _ => ndvAt(spark, root, version)) { base =>
      require(versions(spark, root).contains(version),
        s"manifest table at $root has no retained version $version " +
          "(vacuumed or never committed) — nothing to restore to")
      require(version != base, s"version $version is already current")
      (manifest(spark, root, version), tableSchema(spark, root, version))
    }
  }

  private object RestoreAborted extends Exception
    with scala.util.control.NoStackTrace

  /** [[restore]] that commits ONLY while `expectedCurrent` is still
    * the latest version — the compensation shape (RTAS abort): the
    * check runs INSIDE the CAS loop against each attempt's fresh
    * base, so a concurrent commit landing at any point makes this a
    * no-op (None) instead of silently burying that writer's version
    * under the compensating commit. */
  private[graft] def restoreIfCurrent(spark: SparkSession, root: String,
                                      version: Long,
                                      expectedCurrent: Long)
      : Option[Long] =
    try Some(commitLoopEvolving(spark, root,
      eqReg = _ => eqDeletes(spark, root, version),
      consReg = _ => constraintsAt(spark, root, version),
      ndvReg = _ => ndvAt(spark, root, version)) { base =>
      if (base != expectedCurrent) throw RestoreAborted
      require(versions(spark, root).contains(version),
        s"manifest table at $root has no retained version $version")
      (manifest(spark, root, version), tableSchema(spark, root, version))
    })
    catch { case RestoreAborted => None }

  /** SHALLOW CLONE — a new manifest table at `dstRoot` whose first
    * version references the SOURCE's data files by absolute path: zero
    * data copied, cost ∝ one manifest (the Delta `CREATE TABLE ...
    * SHALLOW CLONE` ergonomics — a 100 TB dev/test copy in a metadata
    * write). The clone is immediately independent for WRITES: appends
    * land under `dstRoot/data`, row-level ops rewrite borrowed files
    * INTO the clone, and the clone's [[vacuum]] only ever sweeps
    * `dstRoot/data` — it can never delete the source's files.
    *
    * The one shared-fate hazard is the source's OWN retention (the
    * documented shallow-clone contract): vacuuming the SOURCE can
    * delete files the clone still references, because the source's
    * refcount only sees its own manifests. Clone for short-lived
    * branches, or [[optimize]] the clone to materialize it. */
  def cloneTo(spark: SparkSession, srcRoot: String, dstRoot: String,
              version: Option[Long] = None): Long = {
    require(exists(spark, srcRoot), s"no manifest table at $srcRoot")
    require(!exists(spark, dstRoot),
      s"manifest table at $dstRoot already exists")
    val v = version.getOrElse(latestVersion(spark, srcRoot))
    require(versions(spark, srcRoot).contains(v),
      s"manifest table at $srcRoot has no retained version $v")
    // a clone must not depend on the source's UNCOMMITTED resolution
    // scratch (pending equality deletes resolve into TTL-swept
    // sidecars no source manifest references — the clone would dangle
    // within a day, a sharper hazard than the documented shared-fate
    // retention one); compaction is content-identical and cheap
    require(!hasPendingEq(spark, srcRoot, v),
      s"version $v of $srcRoot has pending equality deletes — run " +
        "compactEq() (or any row-level op / maintenance tick) on the " +
        "source before cloning")
    // the clone starts its own seq timeline: borrowed files reset to
    // seq 0 so the clone's future deletes order against ITS versions
    VersionedTable.writeStaged(
      manifest(spark, srcRoot, v).withColumn("seq", lit(0L)),
      manifestsRoot(dstRoot))(dir => {
      stageSchema(spark, dstRoot, tableSchema(spark, srcRoot, v))(dir)
      // the clone inherits the source's invariants — its future
      // writes enforce the same contract the source's did
      stageConstraints(spark, dstRoot, constraintsAt(spark, srcRoot, v))(dir)
      // ANALYZE stats transfer: the clone's content IS the source's,
      // so the source's NDV pass is exactly right for it
      stageNdv(spark, dstRoot, ndvAt(spark, srcRoot, v))(dir)
    })
  }

  // ------------------------------------------------- refs: branches & tags

  private val RefsSub = "_refs"
  private val BranchesSub = "_branches"

  private def refsRoot(root: String): String = s"$root/$RefsSub"

  /** Root of branch `name`'s own manifest table. Underscore-prefixed
    * so no flat listing ever surfaces branch data as the main
    * table's; manifest reads address files explicitly (only leaf
    * BASENAMES are hidden-filtered) and are unaffected. */
  def branchRoot(root: String, name: String): String =
    s"$root/$BranchesSub/$name"

  /** A named ref over the table's history — the Iceberg refs model
    * re-expressed on the linear epoch log: a [[TagRef]] pins one MAIN
    * version immutably (vacuum retains it until the ref drops); a
    * [[BranchRef]] is a writable fork — a full manifest table at
    * [[branchRoot]], shallow-cloned at creation (zero data copied), so
    * the ENTIRE op surface (append/MERGE/DELETE/SQL through the
    * catalog's `db.t.<branch>` identifier) works on it — recording the
    * main version it forked from, the fast-forward base
    * [[publishBranch]] checks. This is write-audit-publish: write to
    * the branch, audit the branch, publish atomically. */
  sealed trait Ref
  final case class TagRef(version: Long) extends Ref
  final case class BranchRef(base: Long) extends Ref

  /** Ref names must be identifiers that can NEVER parse as a version
    * number — `versionAsOf` dispatches on exactly that distinction. */
  private def requireRefName(name: String): Unit =
    require(name.matches("[A-Za-z_][A-Za-z0-9_-]*"),
      s"ref name '$name' must match [A-Za-z_][A-Za-z0-9_-]* — names " +
        "share the VERSION AS OF surface with numeric versions")

  private def refFile(root: String, name: String): Path =
    new Path(refsRoot(root), name)

  /** Read one ref, None when absent. */
  def readRef(spark: SparkSession, root: String, name: String): Option[Ref] = {
    val f = fs(spark, root)
    val p = refFile(root, name)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val line =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim
        finally in.close()
      line.split(' ') match {
        case Array("tag", v)    => Some(TagRef(v.toLong))
        case Array("branch", b) => Some(BranchRef(b.toLong))
        case _ => sys.error(s"unreadable ref $name on $root: '$line'")
      }
    }
  }

  /** All refs, name-sorted. */
  def listRefs(spark: SparkSession, root: String): Seq[(String, Ref)] = {
    val f = fs(spark, root)
    val base = new Path(refsRoot(root))
    if (!f.exists(base)) Nil
    else f.listStatus(base).filter(_.isFile).map(_.getPath.getName)
      .sorted.toSeq
      .flatMap(n => readRef(spark, root, n).map(n -> _))
  }

  /** Claim the ref NAME atomically: `create(overwrite = false)` is the
    * CAS — a second creator of the same name loses with
    * FileAlreadyExists instead of silently stealing the ref. */
  private def writeRefExclusive(spark: SparkSession, root: String,
                                name: String, line: String): Unit = {
    val f = fs(spark, root)
    f.mkdirs(new Path(refsRoot(root))): Unit
    val out = f.create(refFile(root, name), false)
    try out.write(line.getBytes("UTF-8")) finally out.close()
  }

  /** Move an EXISTING ref (publish advancing a branch's base) — tmp +
    * atomic overwrite rename, the pointer-bump pattern. */
  private def rewriteRef(spark: SparkSession, root: String,
                         name: String, line: String): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(refsRoot(root),
      s".${name}.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(line.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      refFile(root, name).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, refFile(root, name),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** TAG `version` (default: the head) as `name` — immutable, metadata
    * only (one tiny file). [[vacuum]] retains tagged versions past the
    * `keep` horizon, so a tag is a durable audit/repro pin:
    * `VERSION AS OF 'name'` reads it forever until [[dropRef]]. */
  def createTag(spark: SparkSession, root: String, name: String,
                version: Option[Long] = None): Long = {
    requireRefName(name)
    val v = version.getOrElse(latestVersion(spark, root))
    require(versions(spark, root).contains(v),
      s"manifest table at $root has no retained version $v")
    writeRefExclusive(spark, root, name, s"tag $v")
    v
  }

  /** BRANCH the table at `version` (default: the head) as `name`: the
    * ref file claims the name FIRST (so a concurrent [[vacuum]] never
    * sweeps the clone mid-creation), then a shallow clone materializes
    * the branch's own manifest table — zero data copied, cost one
    * manifest write. Returns the fork base (the main version the
    * branch diverges from, which [[publishBranch]] fast-forwards). */
  def createBranch(spark: SparkSession, root: String, name: String,
                   version: Option[Long] = None): Long = {
    requireRefName(name)
    val v = version.getOrElse(latestVersion(spark, root))
    require(versions(spark, root).contains(v),
      s"manifest table at $root has no retained version $v")
    writeRefExclusive(spark, root, name, s"branch $v")
    try cloneTo(spark, root, branchRoot(root, name), Some(v))
    catch { case e: Throwable =>
      fs(spark, root).delete(refFile(root, name), false): Unit
      throw e }
    v
  }

  /** PUBLISH branch `name` onto main — the write-audit-publish commit:
    * ONE CAS that adopts the branch's current manifest, schema,
    * and constraint registry as main's next version, REFUSED unless
    * main still sits at the branch's fork base (fast-forward only — a
    * moved main means the audit validated a state that no longer
    * composes; re-branch from the new head and re-apply). Data files
    * adopt BY REFERENCE (absolute paths into the branch dir — zero
    * copies at any scale); `seq` resets to 0 exactly as [[cloneTo]]'s
    * borrow does, sound because publish requires the branch's
    * equality-delete registry empty (compactEq first), so no pending
    * delete orders against file seqs. On success the ref's base
    * advances to the published version: continued branch work can
    * publish again as long as main only moves through this branch. */
  def publishBranch(spark: SparkSession, root: String,
                    name: String, merge: Boolean = false): Long = {
    val base0 = readRef(spark, root, name) match {
      case Some(BranchRef(b)) => b
      case Some(TagRef(_)) =>
        sys.error(s"ref $name on $root is a tag — tags are immutable " +
          "pins, only branches publish")
      case None => sys.error(s"no ref $name on $root")
    }
    val bRoot = branchRoot(root, name)
    require(exists(spark, bRoot),
      s"branch $name of $root has no manifest table — creation failed " +
        "midway; dropRef and re-create")
    val bv = latestVersion(spark, bRoot)
    require(!hasPendingEq(spark, bRoot, bv),
      s"branch $name has pending equality deletes — run compactEq() " +
        "(or any row-level op / maintenance tick) on the branch " +
        "before publishing")
    // three-way merge support: when main moved since the fork and
    // `merge = true`, a METADATA merge lands both lines in one commit
    // — sound at file granularity because every logical row lives in
    // exactly one file at the fork, so any row-level change on either
    // side touches that file's manifest state and overlapping-row
    // edits surface as both-sides-touched files (refused, both
    // commits named); disjoint appends/deletes/DV changes compose by
    // reference, zero data copied.
    // set iff the commit actually went through the three-way path —
    // ONLY then must the branch rebase onto the merged result (a
    // fast-forward already leaves main == branch content; syncing
    // after every FF would add a pointless branch commit per publish)
    @volatile var mergedCommit = false
    def threeWay(base: Long): (DataFrame, StructType) = {
      mergedCommit = true
      require(merge,
        s"main moved from $base0 to $base since branch $name forked — " +
          "non-fast-forward publish refused: re-create the branch " +
          "from the current head and re-apply its changes, or " +
          "publish with merge = true to three-way merge disjoint " +
          "file changes")
      require(!hasPendingEq(spark, root, base),
        s"main at $root has pending equality deletes — run " +
          "compactEq() (or any row-level op / maintenance tick) on " +
          "main before a merge publish")
      // schema: at most ONE side may have evolved since the fork
      val s0 = tableSchema(spark, root, base0)
      val sB = tableSchema(spark, bRoot, bv)
      val sM = tableSchema(spark, root, base)
      val mergedSchema =
        if (sB == s0) sM
        else if (sM == s0 || sB == sM) sB
        else sys.error(
          s"both main (v$base0 -> v$base) and branch $name (at " +
            s"v$bv) evolved the schema since the fork — align one " +
            "side before a merge publish")
      // per-path state: presence + (size, dv sidecar) — any row-level
      // change to a file changes exactly this
      def sideify(m: DataFrame, st: String, rw: String) =
        m.select(col("path"),
          struct(col("size"), col("dv_path")).as(st),
          struct(m.columns.map(col): _*).as(rw))
      val j = sideify(manifest(spark, root, base), "sm", "rm")
        .join(sideify(manifest(spark, bRoot, bv), "sb", "rb"),
          Seq("path"), "full_outer")
        .join(manifest(spark, root, base0).select(col("path"),
          struct(col("size"), col("dv_path")).as("s0")),
          Seq("path"), "full_outer")
      val branchTouched = !(col("sb") <=> col("s0"))
      val mainTouched = !(col("sm") <=> col("s0"))
      // CRASH REPLAY first: a merge publish that committed on main
      // but crashed before the branch sync / ref rewrite leaves main
      // ALREADY reflecting every branch change (the commit is atomic
      // — all of the branch's state landed or none did). Re-running
      // then recommits main's own state idempotently. This check must
      // precede conflict detection: a replay's both-removed paths are
      // indistinguishable per-path from two INDEPENDENT rewrites of
      // the same file (which would duplicate the file's surviving
      // rows through both replacements — the hazard refused below).
      val unabsorbed = j
        .filter(branchTouched && !(col("sb") <=> col("sm")))
        .limit(1).count() > 0
      if (!unabsorbed)
        (manifest(spark, root, base).withColumn("seq", lit(0L)),
          mergedSchema)
      else {
        // any path BOTH sides touched is a conflict — equal present
        // states cannot arise outside a replay (fresh file paths
        // carry UUIDs), and both-removed means two divergent rewrites
        val conflicts = j
          .filter(branchTouched && mainTouched)
          .select(col("path")).limit(5).collect().map(_.getString(0))
        require(conflicts.isEmpty,
          s"merge publish of branch $name refused: main (v$base0 -> " +
            s"v$base) and the branch (forked at v$base0, now v$bv) " +
            "both changed file(s) " + conflicts.mkString(", ") +
            " — overlapping row changes cannot compose at metadata " +
            s"granularity; re-create the branch from v$base and " +
            "re-apply its changes")
        val merged = j.select(
          when(branchTouched, col("rb")).otherwise(col("rm")).as("r"))
          .filter(col("r").isNotNull).select(col("r.*"))
          .withColumn("seq", lit(0L))
        (merged, mergedSchema)
      }
    }
    def pick[T](what: String, c0: T, cB: T, cM: T, base: Long): T =
      if (cB == c0) cM
      else if (cM == c0 || cB == cM) cB
      else sys.error(
        s"both main (v$base0 -> v$base) and branch $name changed " +
          s"the $what registry since the fork — align one side " +
          "before a merge publish")
    val published = commitLoopEvolving(spark, root,
      eqReg = _ => Nil,
      consReg = base =>
        if (base == base0) constraintsAt(spark, bRoot, bv)
        else pick("constraint", constraintsAt(spark, root, base0),
          constraintsAt(spark, bRoot, bv),
          constraintsAt(spark, root, base), base),
      ndvReg = base =>
        if (base == base0) ndvAt(spark, bRoot, bv)
        else {
          // advisory statistics: prefer whichever side re-analyzed,
          // main winning when both did — never a refusal
          val n0 = ndvAt(spark, root, base0)
          val nM = ndvAt(spark, root, base)
          if (nM == n0) ndvAt(spark, bRoot, bv) else nM
        }) { base =>
      if (base == base0)
        (manifest(spark, bRoot, bv).withColumn("seq", lit(0L)),
          tableSchema(spark, bRoot, bv))
      else threeWay(base)
    }
    // after a MERGE publish the branch must REBASE onto the merged
    // result before its ref advances: leaving the branch manifest at
    // its pre-merge state while the ref says "forked at published"
    // would let the NEXT (fast-forward) publish adopt the branch
    // wholesale and silently drop main's merged-in files. A crash
    // between the main commit and this sync re-runs as an idempotent
    // re-merge (every branch-touched path then reads identical on
    // both sides — no conflict, same merged content).
    if (mergedCommit && latestVersion(spark, root) == published &&
        readRef(spark, root, name).contains(BranchRef(base0))) {
      val pm = manifest(spark, root, published)
      val ps = tableSchema(spark, root, published)
      commitLoopEvolving(spark, bRoot,
        eqReg = _ => Nil,
        consReg = _ => constraintsAt(spark, root, published),
        ndvReg = _ => ndvAt(spark, root, published)) { _ =>
        (pm, ps)
      }: Unit
    }
    rewriteRef(spark, root, name, s"branch $published")
    published
  }

  /** Drop ref `name`. A tag drop releases its version to the normal
    * retention horizon. A branch drop deletes the branch's directory
    * EXCEPT files main's retained manifests still reference (published
    * files adopted by reference live under the branch dir until main's
    * own history stops naming them — [[vacuum]] re-sweeps orphaned
    * branch remnants once it does). */
  def dropRef(spark: SparkSession, root: String, name: String): Unit = {
    val ref = readRef(spark, root, name).getOrElse(
      sys.error(s"no ref $name on $root"))
    ref match {
      case TagRef(_)    => ()
      case BranchRef(_) =>
        sweepBranchDir(spark, root, branchRoot(root, name), ttlMs = 0L)
    }
    fs(spark, root).delete(refFile(root, name), false): Unit
  }

  /** Delete a branch directory bottom-up, keeping ONLY files main's
    * retained manifests reference (data files and deletion-vector
    * sidecars a publish adopted). `ttlMs` guards the vacuum-time
    * orphan sweep against a creator racing between ref write and
    * clone commit; an explicit [[dropRef]] passes 0. */
  private def sweepBranchDir(spark: SparkSession, root: String,
                             bDir: String, ttlMs: Long): Unit = {
    val f = fs(spark, root)
    val p = new Path(bDir)
    if (!f.exists(p)) return
    val prefix = canon(bDir) + "/"
    val live: Set[String] = versions(spark, root).flatMap { v =>
      val m = manifest(spark, root, v)
      m.select(col("path")).collect().map(r => canon(r.getString(0))) ++
        m.select(col("dv_path")).filter(col("dv_path").isNotNull)
          .collect().map(r => canon(r.getString(0)))
    }.filter(_.startsWith(prefix)).toSet
    val now = System.currentTimeMillis()
    def walk(dir: Path): Boolean = { // true = dir fully reclaimed
      var kept = false
      f.listStatus(dir).foreach { s =>
        if (s.isDirectory) { if (!walk(s.getPath)) kept = true }
        else if (live.contains(canon(s.getPath.toString)) ||
                 now - s.getModificationTime < ttlMs) kept = true
        else f.delete(s.getPath, false): Unit
      }
      if (!kept) f.delete(dir, true): Unit
      !kept
    }
    walk(p): Unit
  }

  /** Atomic predicate-scoped overwrite — Delta's `replaceWhere`: ONE
    * commit that deletes every row matching `cond` and inserts `df`,
    * so readers see either the old region or the new one, never a
    * half-swapped mix (the idempotent-backfill primitive: re-running a
    * partition rebuild converges instead of duplicating). `df`'s rows
    * must all satisfy `cond` — the constraint that makes the operation
    * a REPLACEMENT of the predicate region; violations fail before
    * anything lands. Cost ∝ touched files + batch: the predicate's
    * range conjuncts select touched files by envelope proof exactly as
    * [[deleteWhere]]; untouched files carry BY REFERENCE. */
  def replaceWhere(df: DataFrame, root: String, cond: Column): Long = {
    val spark = df.sparkSession
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root does not exist — create() first")
    val schema = tableSchema(spark, root, v)
    require(df.columns.sorted.sameElements(schema.fieldNames.sorted),
      s"replaceWhere schema ${df.columns.sorted.mkString(",")} != table " +
        s"schema ${schema.fieldNames.sorted.mkString(",")}")
    val batch = conform(df, schema)
    val violations = batch.filter(!coalesce(cond, lit(false))).limit(1).count()
    require(violations == 0L,
      "replaceWhere batch contains rows NOT matching the predicate — " +
        "the operation replaces the predicate's region, so every " +
        "inserted row must satisfy it (use write() to append outside it)")
    // land the batch ONCE — immutable files are reusable across CAS
    // retry attempts; only the manifest swap recomputes on conflict
    lazy val batchRows = landFiles(batch, root, statsCols(spark, root, v))
    // whole-matched files drop by reference: a replaceWhere whose
    // predicate aligns with the file layout (the partition-overwrite
    // shape) is drop + insert — zero reads of the replaced region
    rewriteWhere(spark, root, cond, extraRows = () => batchRows,
      dropWholeMatches = true)(
      (touchedRows, matched) => touchedRows.filter(not(matched)))
  }

  /** Row-level UPDATE, file-granular: same envelope-proof selection as
    * [[deleteWhere]] (provably-unmatching files carry forward BY
    * REFERENCE), with SQL UPDATE semantics on the rewritten files —
    * rows where `cond` is true take the assignments (values CAST to
    * the column's declared type, the Delta-style safe cast), rows
    * where it is false or NULL are kept verbatim. Assignment values
    * may reference any table column (pre-update values, as SQL
    * requires). A predicate with no provable range shape degrades to
    * rewriting every file — sound, at the old whole-table cost. */
  def updateWhere(spark: SparkSession, root: String, cond: Column,
                  sets: Seq[(String, Column)]): Long = {
    require(sets.nonEmpty, "updateWhere requires at least one assignment")
    rewriteWhere(spark, root, cond) { (touchedRows, matched) =>
      val schema = touchedRows.schema
      sets.foreach { case (c, _) =>
        require(schema.fieldNames.contains(c),
          s"assignment target $c is not a table column") }
      touchedRows.select(schema.fields.toIndexedSeq.map { f =>
        sets.find(_._1 == f.name) match {
          case Some((_, v)) =>
            when(matched, v.cast(f.dataType)).otherwise(col(f.name)).as(f.name)
          case None => col(f.name)
        }
      }: _*)
    }
  }

  /** Shared core of the PREDICATE row-level ops (DELETE/UPDATE): pin
    * a base manifest, resolve the user predicate against the table
    * schema (plan-only), select the touched files by envelope proof
    * (provably-unmatching files carry forward BY REFERENCE), read
    * ONLY them, apply `transform(touchedRows, matchedCond)` — where
    * `matchedCond` is the predicate with SQL's NULL-means-unmatched
    * already folded in — land the result, and commit the swap.
    * Conflicts recompute from scratch against the new base. */
  private def rewriteWhere(spark: SparkSession, root: String, cond: Column,
                           extraRows: () => DataFrame = null,
                           dropWholeMatches: Boolean = false,
                           validateCons: Boolean = true)
                          (transform: (DataFrame, Column) => DataFrame): Long =
    commitLoop(spark, root, eqReg = _ => Nil,
      validateCons = validateCons) { base =>
      val (m, states) = effectiveManifest(spark, root, base)
      val schema = tableSchema(spark, root, base)
      val stats = statsCols(spark, root, base)
      val resolvedCond = toPhysicalExpr(
        resolveCond(spark, cond, schema), schema)
      val excluded = graft.plans.StatsPruneRule.excludedByEnvelopes(
        spark, resolvedCond, m, stats)
      // DELETE-shaped callers opt in: a file whose envelope proves
      // EVERY row matches leaves the manifest BY REFERENCE — no read,
      // no rewrite (the metadata-only retention-delete / partition-
      // overwrite grain; vacuum reclaims the bytes on its tick). Raw
      // envelopes are supersets of the live rows, so the proof holds
      // under deletion vectors too. UPDATE must never take this path:
      // its matched rows are transformed, not removed.
      val dropped =
        if (!dropWholeMatches) Set.empty[String]
        else graft.plans.StatsPruneRule.wholeFileMatched(
          resolvedCond, m, stats) -- excluded
      val touchedStates = states.filterNot(s =>
        excluded.contains(s._1) || dropped.contains(s._1))
      val touched = touchedStates.map(_._1)
      val kept =
        if (dropped.isEmpty) m
        else m.filter(!col("path").isin(dropped.toSeq: _*))
      if (touchedStates.isEmpty)
        // nothing to rewrite: a fully-aligned op commits metadata (and
        // the replaceWhere batch) alone — an empty landing would still
        // write a 0-row parquet file
        if (extraRows == null) kept else kept.unionByName(extraRows())
      else {
        // touched reads apply the files' deletion vectors (a raw read
        // would resurrect deleted rows into the rewrite)
        val touchedRows = readFilesDv(spark, schema,
          touchedStates.map(s => (s._1, s._2)), touchedStates.map(_._3).sum)
        val newRows = landFiles(physSelect(
          transform(touchedRows, coalesce(cond, lit(false))), schema),
          root, stats)
        val next = kept.filter(!col("path").isin(touched: _*))
          .unionByName(newRows)
        if (extraRows == null) next else next.unionByName(extraRows())
      }
    }

  /** File-set delta between two versions — (removed, added) data-file
    * paths, from COMMITTED METADATA alone (two manifest reads, zero
    * data I/O). Files present in both manifests are immutable and
    * carried BY REFERENCE, so their rows are bit-identical at both
    * versions. */
  private[graft] def changedFileSets(spark: SparkSession, root: String,
                                     fromVersion: Long, toVersion: Long)
      : (Seq[String], Seq[String]) = {
    val (r, a) = changedFileStates(spark, root, fromVersion, toVersion)
    (r.map(_._1), a.map(_._1))
  }

  /** [[changedFileSets]] at the DV grain: a file's IDENTITY for the
    * delta is (path, deletion-vector), because a file carried by path
    * with a CHANGED vector has different effective rows on the two
    * sides — it must enter both scan subsets (from-side read with the
    * old vector, to-side with the new) so the key diff surfaces the
    * newly deleted rows as D. Entries carry (path, dv, dv_rows). */
  private[graft] def changedFileStates(spark: SparkSession, root: String,
                                       fromVersion: Long, toVersion: Long)
      : (Seq[(String, Option[String], Long)],
         Seq[(String, Option[String], Long)]) = {
    // EFFECTIVE states on both sides: a pending equality delete
    // changes a file's effective rows exactly like a vector commit,
    // so the feed must see it as remove+add of the file's state (the
    // cached resolution keeps repeated diffs metadata-cheap)
    def states(v: Long) =
      effectiveStates(spark, root, v).map(s => (s._1, s._2, s._3))
    val a = states(fromVersion)
    val b = states(toVersion)
    // a file's identity is its EFFECTIVE CONTENT, not its sidecar's
    // NAME: resolution scratch paths are JVM-unique, so a pending
    // version resolved here diffed against the same deletes compacted
    // in another JVM would report spurious remove+add pairs for
    // content-identical files. Same path + same sidecar is trivially
    // unchanged; different sidecars with the SAME deleted-row count
    // compare the bitsets themselves (sidecars are tiny — ≤ rows/8
    // bytes — and only count-coinciding pairs pay the read), which
    // stays exact even across restore() discontinuities where two
    // different position sets could coincide in size.
    val conf = spark.sparkContext.hadoopConfiguration
    def bits(dv: Option[String]): java.util.BitSet =
      dv.map(readDvBits(conf, _)).getOrElse(new java.util.BitSet())
    def sameContent(x: (String, Option[String], Long),
                    y: (String, Option[String], Long)): Boolean =
      x._2 == y._2 || (x._3 == y._3 && bits(x._2) == bits(y._2))
    val bByPath = b.map(s => s._1 -> s).toMap
    val aByPath = a.map(s => s._1 -> s).toMap
    (a.filter(s => !bByPath.get(s._1).exists(sameContent(s, _)))
        .sortBy(_._1),
      b.filter(s => !aByPath.get(s._1).exists(sameContent(_, s)))
        .sortBy(_._1))
  }

  /** Change feed between two versions — [[VersionedTable
    * .changesBetween]] semantics, at cost ∝ CHANGED FILES, never ∝
    * table (the Delta CDF grain): the two MANIFESTS diff first
    * ([[changedFileSets]] — committed metadata), and only the files
    * removed between the versions (from-side) and added (to-side) are
    * scanned and key-diffed.
    *
    * Soundness, from the keyed contract (one row per key per version)
    * plus file immutability: a carried file's rows are identical at
    * both versions, so a key whose row lives in a carried file at one
    * version either lives in the SAME carried file at the other (no
    * change — and it can't also appear in a removed/added file, which
    * would duplicate the key) or the key changed, in which case its
    * row at the other version is in a removed/added file by
    * definition. Every I/U/D row therefore has both of its sides
    * inside the scanned subsets, and keys rewritten WITH IDENTICAL
    * CONTENT (a merge rewrote their file for a neighbor) drop out in
    * the diff's change filter exactly as before. On a 100 TB table a
    * 1-file append's feed batch scans one file, not two snapshots. */
  def changesBetween(spark: SparkSession, root: String,
                     fromVersion: Long, toVersion: Long,
                     keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "changesBetween requires key columns")
    val (removed, added) =
      changedFileStates(spark, root, fromVersion, toVersion)
    def subset(states: Seq[(String, Option[String], Long)],
               version: Long): DataFrame =
      readFilesDv(spark, tableSchema(spark, root, version),
        states.map(s => (s._1, s._2)), states.map(_._3).sum)
    VersionedTable.diffKeyed(
      subset(removed, fromVersion), subset(added, toVersion),
      keyCols, fromVersion, toVersion)
  }

  /** Durable incremental consumption — [[VersionedTable
    * .consumeChanges]] for the manifest format, with the same
    * contract (offset in a tiny epoch table at `consumerRoot`,
    * at-least-once across crashes, bootstrap-as-inserts, fail-fast
    * past vacuumed history) but the manifest grain: every non-
    * bootstrap batch is a FILE-SET-DELTA diff ([[changesBetween]]) —
    * cost ∝ files changed since the last acknowledged version, never
    * ∝ table. */
  def consumeChanges(spark: SparkSession, root: String, consumerRoot: String,
                     keyCols: Seq[String]): Option[VersionedTable.ChangeBatch] = {
    val cur = latestVersion(spark, root)
    require(cur >= 0, s"manifest table at $root has no committed version")
    val last =
      if (VersionedTable.latestVersion(spark, consumerRoot) < 0) -1L
      else VersionedTable.read(spark, consumerRoot).head().getLong(0)
    if (last == cur) return None
    require(last < cur,
      s"consumer offset $last is ahead of the table's current version $cur")
    val changes =
      if (last < 0) {
        val b = readVersion(spark, root, cur)
        val payload = b.columns.filterNot(keyCols.contains).toSeq
        b.select(keyCols.map(col) ++ payload.map(col) :+
          lit("I").as("op") :+ lit(cur).as("seq"): _*)
      } else {
        require(versions(spark, root).contains(last),
          s"consumer lagged past retention: version $last of $root was " +
            "vacuumed — re-bootstrap the consumer (drop its offset " +
            "table)" + VersionedTable.CrashedSweepHint)
        changesBetween(spark, root, last, cur, keyCols)
      }
    Some(VersionedTable.ChangeBatch(changes, last, cur, () => {
      VersionedTable.write(
        spark.range(1).select(lit(cur).as("version")), consumerRoot)
      VersionedTable.vacuum(spark, consumerRoot, keep = 2)
    }))
  }

  /** OPTIMIZE: re-lay the CURRENT rows as a fresh file set (compaction
    * or re-clustering); content identical, all files replaced — the
    * one operation that is legitimately cost ∝ table. */
  /** Strip a bucket claim from every field — the inverse of
    * [[withBucketSpec]], preserving all other metadata (frozen
    * physical names in particular: the re-lay's files are new, but
    * the TABLE's column mapping must survive a rebucket). */
  private def clearBucketSpec(schema: StructType): StructType =
    StructType(schema.fields.map { f =>
      if (!f.metadata.contains(BucketKey)) f
      else f.copy(metadata =
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .remove(BucketKey).remove(BucketPosKey).build())
    })

  /** REBUCKET — bucket-layout evolution: [[optimize]]'s full re-lay
    * committed TOGETHER with the new bucket claim. One shuffle of the
    * current rows by the new grid (landed as `gb=` directories),
    * committed with the re-stamped schema in the SAME commit — a
    * reader resolves either wholly-old or wholly-new layout, and
    * storage-partitioned joins plan on whichever version they
    * pinned. `bucketBy = None` DROPS the claim (the table becomes
    * plain — the escape hatch the frozen-layout refusals point at:
    * rebucket away, then widen/drop the former key); `Some((key, n))`
    * re-clusters by the new key/count, `key` a comma-separated list
    * for a multi-column grid. Like [[optimize]]: cost ∝ table (the
    * one legitimate full rewrite), pending equality deletes resolve
    * into the re-lay, deletion vectors purge, history stays
    * time-travelable under the old layout's own manifests. */
  def rebucket(spark: SparkSession, root: String,
               bucketBy: Option[(String, Int)],
               sortCols: Seq[String] = Nil,
               numFiles: Int = 16): Long = {
    require(numFiles >= 1, "numFiles must be >= 1")
    commitLoopEvolving(spark, root, eqReg = _ => Nil,
      validateCons = false) { base =>
      val schema = tableSchema(spark, root, base)
      val next = bucketBy match {
        case Some((k, n)) => withBucketSpec(clearBucketSpec(schema), k, n)
        case None         => clearBucketSpec(schema)
      }
      // the landing hashes PHYSICAL columns (what the re-laid frame
      // speaks); the declaration above stamped logical names
      val physKeys = bucketSpec(next).map { case (ks, n) =>
        (ks.mkString(","), n) }
      sortCols.foreach(c => require(schema.fieldNames.contains(c),
        s"sort column $c is not a table column"))
      val cur = readVersion(spark, root, base)
      // optional IN-BUCKET clustering in the same pass: the grid
      // shuffle routes rows to cells, the per-cell sort lays them —
      // one rewrite instead of rebucket-then-optimize twice. A
      // dropped layout (bucketBy = None) re-lays like optimize:
      // `numFiles` range-clustered files (or a plain numFiles
      // compaction when no sort is named); a bucketed target's file
      // count is its cell count, so numFiles does not apply there.
      val laid =
        if (physKeys.nonEmpty) cur
        else if (sortCols.nonEmpty)
          cur.repartitionByRange(numFiles, sortCols.map(col): _*)
            .sortWithinPartitions(sortCols.map(col): _*)
        else cur.repartition(numFiles)
      val rows = landFiles(physSelect(laid, schema), root,
        statsCols(spark, root, base), bucketAs = Some(physKeys),
        sortWithin = sortCols.map(c => physicalName(schema(c))))
      (rows, next)
    }
  }

  def optimize(spark: SparkSession, root: String,
               sortCols: Seq[String] = Nil, numFiles: Int = 16,
               hilbert: Boolean = false): Long = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(!hilbert || sortCols.size >= 2,
      "hilbert clustering needs at least two columns")
    // the re-lay reads the EFFECTIVE rows (readVersion applies pending
    // equality deletes through the scan), so the replacement commits
    // under an empty registry; rows are preserved, not introduced —
    // constraint re-validation would double the re-lay's read cost
    // for rows that cannot have changed
    commitLoop(spark, root, eqReg = _ => Nil, validateCons = false) { base =>
      // re-lay BASE's rows (not a floating `current` — a conflict
      // recomputes against the new base, so no commit is ever lost)
      val cur = readVersion(spark, root, base)
      val schema = tableSchema(spark, root, base)
      val bucketed = bucketSpec(schema).isDefined
      // a curve layout cannot survive the bucketed landing's cell
      // shuffle (and no in-bucket order re-establishes it) — a silent
      // full-cost no-op must refuse instead
      require(!hilbert || !bucketed,
        "hilbert clustering cannot survive a bucketed landing's cell " +
          "shuffle — rebucket() off the layout first, or cluster " +
          "in-bucket with plain sortCols")
      // a BUCKETED table's landing reshuffles by cell, so a range
      // pre-pass would be a wasted whole-table shuffle+sort — skip
      // it and let the landing's in-bucket sort lay the rows
      // (physical names: that's what the landed frame speaks)
      val laid =
        if (hilbert) // N-dim skipping: the shared equi-depth Hilbert layout
          ParquetSink.clusterByCurve(cur, sortCols, numFiles)
        else if (bucketed) cur
        else if (sortCols.isEmpty) cur.repartition(numFiles)
        else cur.repartitionByRange(numFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      landFiles(physSelect(laid, schema), root,
        statsCols(spark, root, base),
        sortWithin =
          if (hilbert) Nil
          else sortCols.map(c => physicalName(schema(c))))
    }
  }

  /** INCREMENTAL optimize — maintenance cost ∝ the DEGRADED subset,
    * never the table (the 100 TB maintenance shape; [[optimize]] is
    * the legitimate-full-cost re-lay). Selection is METADATA-ONLY
    * over the manifest rows:
    *
    *   - SMALL files (`size < smallFileBytes`) — the log-structured
    *     append debris; compacted when at least two exist.
    *   - WIDE files (with `sortCols` on tracked NUMERIC/date/
    *     timestamp columns): per-file envelope-width geomean over the
    *     sort columns exceeding `wideFactor` × the population MEDIAN
    *     — appends that span the clustering domain and erode
    *     skipping; the median baseline self-calibrates against the
    *     domain's own scale. Files with UNKNOWN envelopes on a sort
    *     column are selected too: they are useless for pruning until
    *     rewritten with fresh stats.
    *
    * Selected files re-lay among themselves (range+sort when
    * `sortCols` given, plain compaction otherwise) into
    * `ceil(bytes/targetFileBytes)` files; every other file carries
    * forward BY REFERENCE. Returns None when nothing qualifies — the
    * no-op proof a second pass must hit. */
  def optimizeIncremental(spark: SparkSession, root: String,
                          sortCols: Seq[String] = Nil,
                          smallFileBytes: Long = 32L << 20,
                          targetFileBytes: Long = 128L << 20,
                          wideFactor: Double = 4.0,
                          hilbert: Boolean = false): Option[Long] = {
    require(wideFactor > 1.0, "wideFactor must exceed 1")
    require(!hilbert || sortCols.size >= 2,
      "hilbert clustering needs at least two columns")
    val base = latestVersion(spark, root)
    require(base >= 0, s"manifest table at $root has no committed version")
    val schema = tableSchema(spark, root, base)
    val stats = statsCols(spark, root, base)
    val widthCols = sortCols.filter { c =>
      stats.contains(c) && (schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType |
             org.apache.spark.sql.types.DateType |
             org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType => true
        case _ => false
      })
    }
    val m = manifest(spark, root, base)
    // per-file (path, size, envelope geomean | NULL unknown) — one
    // metadata-scale collect
    val widthExpr =
      if (widthCols.isEmpty) lit(null).cast("double")
      else widthCols.map { c =>
        log(greatest(
          col(s"${c}_max").cast("double") - col(s"${c}_min").cast("double"),
          lit(1e-12)))
      }.reduce(_ + _) / widthCols.size
    val rows = m.select(col("path"), col("size"),
        widthExpr.as("logw"), col("dv_rows"), col("row_count"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getLong(3), r.getLong(4)))
    val small = rows.filter(_._2 < smallFileBytes).map(_._1).toSet
    // DV-HEAVY files (vector covers ≥ half the rows): the read-side
    // tax (position skip + sidecar) now outweighs the rewrite it
    // deferred — rewriting purges the vector and restores exact
    // envelopes. Light vectors stay: that deferral IS the
    // merge-on-read win. Metadata-only selection, like the rest.
    val dvHeavy = rows.filter(r => r._4 > 0L && r._4 * 2 >= r._5)
      .map(_._1).toSet
    val wide: Set[String] =
      if (widthCols.isEmpty) Set.empty
      else {
        val known = rows.flatMap(r => r._3.map(w => (r._1, w)))
        if (known.isEmpty) rows.map(_._1).toSet // all unknown: refresh all
        else {
          val sorted = known.map(_._2).sorted
          val median = sorted(sorted.length / 2)
          val unknown = rows.filter(_._3.isEmpty).map(_._1).toSet
          known.filter(_._2 > median + math.log(wideFactor))
            .map(_._1).toSet ++ unknown
        }
      }
    val selected =
      (if (small.size >= 2) small else Set.empty[String]) ++ wide ++ dvHeavy
    if (selected.isEmpty) return None
    val selectedSeq = selected.toSeq.sorted
    val bytes = rows.filter(r => selected.contains(r._1)).map(_._2).sum
    // output file count must CONVERGE: enough range splits that each
    // output envelope lands back under the wide threshold (union
    // width / k ≤ wideFactor × median, with 2× margin for non-uniform
    // data), else a full-domain append would re-qualify every pass
    val byBytes = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val byWidth: Long =
      if (widthCols.isEmpty) 1L
      else {
        val knownLogw = rows.flatMap(_._3)
        if (knownLogw.isEmpty) 1L
        else {
          // union envelope of the SELECTED files only (narrow small
          // files must not inherit the table's domain width, or their
          // compaction would over-split forever)
          val sel = m.filter(col("path").isin(selectedSeq: _*))
          val unionLogw = widthCols.map { c =>
            val r = sel.agg(max(col(s"${c}_max").cast("double")),
              min(col(s"${c}_min").cast("double"))).head()
            if (r.isNullAt(0) || r.isNullAt(1)) 0.0
            else math.log(math.max(r.getDouble(0) - r.getDouble(1), 1e-12))
          }.sum / widthCols.size
          val sortedW = knownLogw.sorted
          val medianLogw = sortedW(sortedW.length / 2)
          math.max(1L, math.ceil(
            2.0 * math.exp(unionLogw - medianLogw) / wideFactor).toLong)
        }
      }
    val nFiles = math.min(4096L, math.max(byBytes, byWidth)).toInt
    // a small-only pass that cannot CONSOLIDATE (outputs ≥ inputs)
    // would churn versions forever — that is a no-op, not an optimize
    // (a DV purge, like a wide re-lay, is progress regardless of count)
    if (wide.isEmpty && dvHeavy.isEmpty && nFiles >= selected.size)
      return None
    // row-preserving re-lay: skip constraint re-validation (see
    // optimize)
    Some(commitLoop(spark, root, eqReg = _ => Nil,
      validateCons = false) { b =>
      // recompute against the CURRENT base on conflict: a selected
      // file may have been rewritten away — re-intersect with b's
      // manifest so only still-live files rewrite. Schema and stats
      // are ALSO re-read per attempt (not the pre-loop pins): a
      // concurrent evolveSchema merge widens the sidecar, and reading
      // touched files with the stale narrower schema would silently
      // drop the evolved column's values from the rewritten files
      // while the commit still stamps the wider sidecar — data loss.
      // The EFFECTIVE view: a re-lay that read raw would resurrect
      // pending equality deletes into the fresh files
      val curSchema = tableSchema(spark, root, b)
      val curStats = statsCols(spark, root, b)
      val (mb, liveStates) = effectiveManifest(spark, root, b)
      val live = liveStates.map(_._1).toSet
      val dvAt = liveStates.map(s => s._1 -> ((s._2, s._3))).toMap
      val todo = selectedSeq.filter(live.contains)
      // re-lay reads apply the selected files' deletion vectors — the
      // rewrite is also the purge (output files carry no vector)
      val rowsIn = readFilesDv(spark, curSchema,
        todo.map(p => (p, dvAt(p)._1)), todo.map(p => dvAt(p)._2).sum)
      // a BUCKETED table's landing reshuffles by cell: skip the
      // pre-sort it would destroy and re-lay inside each cell via
      // sortWithin instead (the same fix optimize/rebucket carry);
      // a curve layout has no in-bucket re-establishment — refuse
      val curBucketed = bucketSpec(curSchema).isDefined
      require(!hilbert || !curBucketed,
        "hilbert clustering cannot survive a bucketed landing's cell " +
          "shuffle — rebucket() off the layout first, or cluster " +
          "in-bucket with plain sortCols")
      val laid =
        if (hilbert) // the degraded subset re-lays on the shared curve
          ParquetSink.clusterByCurve(rowsIn, sortCols, nFiles)
        else if (curBucketed) rowsIn
        else if (sortCols.isEmpty) rowsIn.repartition(nFiles)
        else rowsIn.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      mb.filter(!col("path").isin(todo: _*))
        .unionByName(landFiles(physSelect(laid, curSchema), root, curStats,
          sortWithin =
            if (hilbert) Nil
            else sortCols.map(c => physicalName(curSchema(c)))))
    })
  }

  /** Per-file BLOOM index on `keyCol` — point-lookup pruning for the
    * case envelopes cannot serve: a hash-distributed key's min/max
    * spans every file, so `key = x` probes open the whole table
    * unless a membership structure answers per file. The index lives
    * beside the table (`root/_bloom_<col>`, a [[graft.sources
    * .FileBloomIndex]] epoch table) and `format("graft")` reads
    * consult it automatically for equality/IN conjuncts — no reader
    * options ([[blooms]] discovery).
    *
    * INCREMENTAL by construction: each call indexes only the current
    * version's files missing from the committed index (cost ∝ new
    * files — manifest data files are immutable and never re-land
    * under an old name, so merge-by-path delta commits are exactly
    * sound here); rows for vacuumed files exclude nothing from a
    * listing they don't appear in. Returns the committed index
    * version, None when every live file is already indexed. */
  def buildBloom(spark: SparkSession, root: String, keyCol: String,
                 numBits: Int = 1 << 17, numHashes: Int = 5): Option[Long] = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"manifest table at $root has no committed version")
    val schemaV = tableSchema(spark, root, v)
    require(schemaV.fieldNames.contains(keyCol),
      s"$keyCol is not a table column")
    // the index reads (and is named by) the column's PHYSICAL name —
    // stable under RENAME COLUMN, matching what data files carry
    val physCol = physicalFor(schemaV, keyCol)
    val br = bloomRootFor(root, physCol)
    val curType = schemaV(keyCol).dataType.catalogString
    // a pre-widen index hashes the NARROW type — its bits can never
    // serve wide probes; rebuild from scratch under the current type.
    // A MISSING marker counts as a mismatch too: delta-appending
    // wide-hashed rows onto unknown-typed bits and then stamping the
    // result would legitimize a poisoned index forever
    if (VersionedTable.latestVersion(spark, br) >= 0 &&
        !bloomTypeMarker(spark, br).contains(curType))
      fs(spark, root).delete(new Path(br), true): Unit
    val live = filesAt(spark, root, v)
    val todo =
      if (VersionedTable.latestVersion(spark, br) < 0) live
      else {
        // index rows carry input_file_name URIs; the manifest carries
        // canonical paths — compare canonical on both sides
        val indexed = graft.sources.FileBloomIndex.read(spark, br)
          .select(col("path")).collect()
          .map(r => canon(r.getString(0))).toSet
        live.filterNot(indexed.contains)
      }
    if (todo.isEmpty) return None
    val idx = graft.sources.FileBloomIndex.buildFor(spark, todo, physCol,
      numBits, numHashes)
    val committed =
      if (VersionedTable.latestVersion(spark, br) < 0)
        graft.sources.FileBloomIndex.commitFull(idx, br)
      else graft.sources.FileBloomIndex.commitDelta(idx, br)
    writeBloomTypeMarker(spark, br, curType)
    Some(committed)
  }

  private[graft] def bloomRootFor(root: String, c: String): String =
    s"$root/_bloom_$c"

  /** The key TYPE a bloom index was built against (xxhash64 is
    * type-sensitive — a wide probe's hash never matches bits built
    * from narrow values, so a post-widen index would FALSELY exclude
    * files). Consumers skip a mismatched index ([[bloomsValid]]);
    * missing marker = pre-widening legacy, necessarily matching. */
  /** Per-(index root, index version) marker cache: a rebuild bumps
    * the index's version, so an entry can never serve a different
    * generation's type — the planning hot path then pays the two
    * marker round-trips once per index generation, not per scan. */
  private val bloomTypeCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), Option[String]]()

  private def bloomTypeMarker(spark: SparkSession,
                              bloomRoot: String): Option[String] = {
    val p = new Path(bloomRoot, "_graft_keytype")
    val f = fs(spark, bloomRoot)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        Some(new String(buf.toByteArray, "UTF-8").trim)
      } finally in.close()
    }
  }

  private def writeBloomTypeMarker(spark: SparkSession, bloomRoot: String,
                                   t: String): Unit = {
    val out = fs(spark, bloomRoot)
      .create(new Path(bloomRoot, "_graft_keytype"), true)
    try out.write(t.getBytes("UTF-8")) finally out.close()
  }

  /** [[blooms]] restricted to indexes whose build-time key type still
    * matches the schema's — the read-side half of type widening's
    * bloom contract. A MISSING marker is treated as a MISMATCH
    * (fail-safe): an unmarked index may predate a widen whose
    * post-commit sweep did not land, and consulting it would FALSELY
    * exclude files — it stops serving until the next [[buildBloom]]
    * (the maintenance tick) rebuilds and stamps it. */
  private[graft] def bloomsValid(spark: SparkSession, root: String,
                                 schema: StructType)
      : Seq[(String, String)] =
    blooms(spark, root).filter { case (pc, br) =>
      val v = VersionedTable.latestVersion(spark, br)
      val marker = bloomTypeCache.computeIfAbsent((canon(br), v),
        _ => bloomTypeMarker(spark, br))
      schema.fields.find(f => physicalName(f) == pc)
        .map(_.dataType.catalogString)
        .exists(t => marker.contains(t))
    }

  /** Committed bloom indexes beside this table: (column, index root). */
  private[graft] def blooms(spark: SparkSession,
                            root: String): Seq[(String, String)] = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (!f.exists(p)) Nil
    else f.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("_bloom_")).toSeq
      .map(n => n.stripPrefix("_bloom_") -> s"$root/$n")
      .filter { case (_, r) => VersionedTable.latestVersion(spark, r) >= 0 }
  }

  /** Table HISTORY — the DESCRIBE HISTORY/DETAIL ergonomics: one row
    * per retained version with its commit timestamp (running-max
    * normalized, the [[VersionedTable.commitTimestamps]] contract),
    * file count, row count, and bytes — all from the manifests alone,
    * zero data I/O, |versions| × |files| metadata rows. MANIFEST
    * GRAIN: a version with PENDING equality deletes reports its
    * pre-delete row count (the deletes live outside the manifest
    * until compaction — the same reason [[graft.plans.MetaAggRule]]
    * routes COUNT(*) to the scan for such versions); the zero-I/O
    * contract is the point of this surface, so the number is
    * documented rather than resolved. */
  def history(spark: SparkSession, root: String): DataFrame = {
    val ts = VersionedTable.commitTimestamps(spark, manifestsRoot(root)).toMap
    // ONE aggregation job over the union of the retained manifests
    // (version tagged per branch) — not one serial job per version,
    // which turns sluggish at thousands of retained versions
    val vs = versions(spark, root)
    val agg: Map[Long, (Long, Long, Long)] =
      if (vs.isEmpty) Map.empty
      else {
        // ONE spark.read over every retained manifest epoch: the
        // hive-style `epoch=N` dirs give the version column via
        // partition discovery, and the explicit schema serves pre-DV
        // epochs' missing dv_rows as NULL (coalesced to 0). The
        // alternative — a per-version unionByName fold — builds a
        // |versions|-deep left-nested plan whose driver-side
        // analysis/optimization cost exceeds the serial jobs it
        // replaced at thousands of retained versions.
        val mroot = manifestsRoot(root)
        spark.read
          .schema("size BIGINT, row_count BIGINT, dv_rows BIGINT, epoch BIGINT")
          .option("basePath", mroot)
          .parquet(vs.map(v => s"$mroot/epoch=$v"): _*)
          .groupBy(col("epoch").as("version"))
          // LIVE rows: a deletion vector's rows are gone from the
          // reader's view, so they are gone from the version's count
          .agg(count(lit(1)).as("n_files"),
            coalesce(sum(col("row_count") -
              coalesce(col("dv_rows"), lit(0L))), lit(0L)).as("n_rows"),
            coalesce(sum(col("size")), lit(0L)).as("bytes"))
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      }
    val spk = spark
    import spk.implicits._
    // empty-manifest versions (a created-but-unloaded table) produce
    // no group — they still get their (0, 0, 0) history row
    vs.map { v =>
      val (nf, nr, b) = agg.getOrElse(v, (0L, 0L, 0L))
      (v, new java.sql.Timestamp(ts(v)), nf, nr, b)
    }.toDF("version", "committed_at", "n_files", "n_rows", "bytes")
  }

  /** Refcount-aware vacuum: drop manifest epochs beyond the newest
    * `keep`, then delete data files referenced by NO retained
    * manifest — but never files younger than `ttlMs` (a concurrent
    * writer's landed-but-uncommitted files must survive until its CAS
    * resolves). Also sweeps empty data/<uuid> directories. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2,
             ttlMs: Long = 24L * 3600 * 1000): Unit = {
    // TAGGED versions are pinned past the keep horizon — a tag is a
    // durable pin by contract; everything downstream (file/dv/eq
    // refcounts) follows automatically because it iterates the
    // RETAINED version list, which now includes the tagged epochs
    val refs = listRefs(spark, root)
    VersionedTable.vacuum(spark, manifestsRoot(root), keep, ttlMs,
      pinned = refs.collect { case (_, TagRef(v)) => v }.toSet)
    val referenced = versions(spark, root)
      .flatMap(v => filesAt(spark, root, v)).toSet
    // deletion-vector sidecars refcount exactly like data files: live
    // while ANY retained manifest's dv_path names them (abandoned
    // writer attempts and purged vectors age out by the same TTL)
    val dvReferenced = versions(spark, root)
      .flatMap(v => manifest(spark, root, v)
        .select(col("dv_path")).filter(col("dv_path").isNotNull)
        .collect().map(r => canon(r.getString(0)))).toSet
    val f = fs(spark, root)
    val now = System.currentTimeMillis()
    def sweep(sub: String, live: Set[String]): Unit = {
      val base = new Path(s"$root/$sub")
      if (!f.exists(base)) return
      // RECURSIVE: bucketed landings write one level deeper than
      // plain ones (data/<uuid>/gb=N/part-*), so the sweep walks the
      // whole subtree — stale files at any depth reclaim, and empty
      // directories collapse bottom-up (gb= dirs first, then their
      // landing dir)
      def walk(dir: Path): Unit = {
        f.listStatus(dir).foreach { s =>
          if (s.isDirectory) walk(s.getPath)
          else {
            val p = canon(s.getPath.toString)
            if (!live.contains(p) && now - s.getModificationTime >= ttlMs)
              f.delete(s.getPath, false): Unit
          }
        }
        if (dir != base && f.listStatus(dir).isEmpty)
          f.delete(dir, true): Unit
      }
      walk(base)
    }
    sweep("data", referenced)
    // equality-delete READ-RESOLUTION scratch (eqres-* under _dv) is
    // referenced only by the in-JVM cache until a commit adopts it —
    // the TTL sweep below ages abandoned resolutions out, and
    // [[effectiveStates]] re-validates a cache hit's sidecar exists
    sweep(DvSub, dvReferenced)
    // equality-delete KEY files refcount like vectors: live while any
    // retained version's registry names their directory
    val eqReferenced = versions(spark, root)
      .flatMap(v => eqDeletes(spark, root, v).map(e => canon(e.path))).toSet
    val eqBase = new Path(eqRoot(root))
    if (f.exists(eqBase)) {
      f.listStatus(eqBase).filter(_.isDirectory).foreach { d =>
        if (!eqReferenced.contains(canon(d.getPath.toString)) &&
            now - d.getModificationTime >= ttlMs)
          f.delete(d.getPath, true): Unit
      }
    }
    // ORPHANED branch remnants: a dropped branch's directory can keep
    // files main still referenced at drop time; once main's own
    // history stops naming them, this sweep reclaims what remains.
    // Dirs WITH a live ref are the branch's own manifest table — its
    // own vacuum manages it; never touched from here.
    val bBase = new Path(s"$root/$BranchesSub")
    if (f.exists(bBase)) {
      val named = refs.collect { case (n, BranchRef(_)) => n }.toSet
      f.listStatus(bBase).filter(_.isDirectory).foreach { d =>
        if (!named.contains(d.getPath.getName))
          sweepBranchDir(spark, root, d.getPath.toString, ttlMs)
      }
    }
  }
}
