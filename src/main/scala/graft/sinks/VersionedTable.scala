package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not, struct, when}

/** Always-readable versioned table — the epoch-flip pattern the
  * persisted-index docs prescribe ([[graft.operators.Dedup
  * .saveMinhashIndex]]'s non-atomicity note), implemented: every write
  * lands in a FRESH `epoch=N` directory, and readers resolve the
  * current epoch through a pointer file plus the committed epoch
  * listing. A reader holding an old resolution keeps reading the old
  * epoch's (immutable, fully written) files — parquet overwrite's
  * delete-then-write window never exists for readers.
  *
  * MULTI-WRITER SAFE commit protocol (optimistic, lock-free): a writer
  * first lands the epoch's data in a hidden `.stage-<uuid>` directory
  * (invisible to readers and to version resolution), then CLAIMS a
  * version number by renaming the staged directory to `epoch=N`
  * WITHOUT overwrite — `FileContext.rename` with `Rename.NONE` fails
  * when the destination exists, so the rename is a compare-and-swap on
  * the version number; a loser retries with the next number. On
  * filesystems whose no-overwrite rename is only check-then-act (the
  * local one), the rename is merely the claim ATTEMPT and ownership
  * is verified through a claim marker — see [[claimEpoch]]. Because
  * the rename is the publish step, an `epoch=N` directory exists ONLY
  * fully written: a crashed writer leaves at worst an orphaned
  * `.stage-*` directory that [[vacuum]] sweeps. The `_LATEST` pointer
  * is a monotone CACHE of the newest committed version — readers take
  * `max(pointer, committed directories)`, so a writer that loses the
  * (benign) pointer-update race can never hide a newer epoch.
  *
  * Blind appends ([[write]]) always succeed — racing writers serialize
  * onto distinct consecutive versions, none lost. Read-modify-write
  * commits ([[merge]], [[applyCdc]], [[deleteWhere]]) are
  * SERIALIZABLE via [[tryCommitAs]]: the rewrite is computed against
  * base version B and committed only as B+1; if another writer claimed
  * B+1 first, the claim fails and the operation recomputes against the
  * new current epoch — the lost-update anomaly (two rewrites both
  * based on B, the second silently discarding the first) cannot
  * commit. Same caveat as everywhere in this package: object stores
  * without atomic rename need an external commit coordinator.
  *
  * Old epochs are retained for as-of reads ([[readVersion]]) until
  * [[vacuum]] drops all but the newest k.
  */
object VersionedTable {

  private val Pointer = "_LATEST"
  private val TsSidecar = "_graft_commit_ts"

  /** Commit-timestamp clock — injectable so time-travel tests run on a
    * logical clock ([[graft.util.Clock]], the repo-wide discipline);
    * production leaves the default. Each epoch is stamped immediately
    * before its publishing rename, so the stamp commits atomically
    * with the epoch it describes. */
  @volatile private[graft] var commitClock: graft.util.Clock =
    graft.util.SystemClock

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest committed version, or -1 when the table has never
    * committed. The pointer is consulted as a fast monotone cache but
    * the committed `epoch=` listing wins when newer — a writer that
    * committed its CAS rename and then crashed (or lost the pointer
    * race) before refreshing `_LATEST` still has its epoch visible. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val committed =
      if (!f.exists(new org.apache.hadoop.fs.Path(root))) -1L
      else versions(spark, root).lastOption.getOrElse(-1L)
    math.max(readPointer(spark, root), committed)
  }

  /** Best-effort pointer read: -1 when missing OR momentarily
    * unreadable. Concurrent pointer bumps can expose a torn read on
    * filesystems whose rename moves the data file and its integrity
    * sidecar non-atomically (local ChecksumFs renames `_LATEST` and
    * `._LATEST.crc` as two operations); the committed `epoch=` listing
    * is authoritative, so a failed cache read degrades to it instead
    * of failing the resolution. */
  private def readPointer(spark: SparkSession, root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(root, Pointer)
    val f = fs(spark, root)
    try {
      if (!f.exists(p)) -1L
      else {
        val in = f.open(p)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim.toLong
        finally in.close()
      }
    } catch {
      case _: java.io.IOException | _: NumberFormatException => -1L
    }
  }

  /** Write `df` as the next epoch and publish it. Returns the new
    * version. The CAS rename of the staged directory is the COMMIT: a
    * crash before it leaves the table at the previous version with an
    * orphaned staging directory, never a half-visible epoch. Safe
    * under concurrent writers — each lands on its own version. */
  def write(df: DataFrame, root: String): Long =
    writeStaged(df, root)(_ => ())

  /** [[write]] with a staging hook: `stage(stageDir)` runs after the
    * epoch's data is fully written but BEFORE the publishing rename,
    * so sidecar artifacts (e.g. an index's `_graft_build_params`)
    * commit atomically with the epoch they describe — a reader can
    * never resolve an epoch whose sidecar is missing or half-written. */
  def writeStaged(df: DataFrame, root: String)(stage: String => Unit): Long = {
    val spark = df.sparkSession
    // a blind full-epoch replace is a stream RESTART: stamp the reset
    // tombstone (unless the hook stamped its own id) so
    // [[lastAppliedBatch]]'s newest-stamped-epoch walk does not
    // resurrect a marker from an earlier life of the table — the
    // documented "overwrite to restart the stream" path depends on it
    val resetStage: String => Unit = dir => {
      stage(dir)
      if (!fs(spark, root).exists(
          new org.apache.hadoop.fs.Path(dir, BatchSidecar)))
        stampBatch(spark, root, -1L)(dir)
    }
    var stageDir = stageEpoch(df, root, resetStage)
    var next = latestVersion(spark, root) + 1
    var won = false
    while (!won) {
      claimEpoch(spark, root, stageDir, next) match {
        case Won          => won = true
        case Lost         => next += 1
        case LostConsumed =>
          // the degenerate-rename loser's stage was consumed (see
          // [[claimEpoch]]) — re-stage and try the next number
          stageDir = stageEpoch(df, root, resetStage); next += 1
      }
    }
    bumpPointer(spark, root, next)
    next
  }

  /** Optimistic-concurrency commit: publish the staged rewrite ONLY as
    * `expectedBase + 1`. Returns None — with the staged data cleaned
    * up — when some other writer claimed that version first, i.e. when
    * the table moved past the base this rewrite was computed from; the
    * caller recomputes against the new current epoch and retries. This
    * is the conflict check that makes read-modify-write commits
    * serializable rather than merely durable. */
  def tryCommitAs(df: DataFrame, root: String, expectedBase: Long,
                  stage: String => Unit = _ => ()): Option[Long] = {
    val spark = df.sparkSession
    val stageDir = stageEpoch(df, root, stage)
    val want = expectedBase + 1
    claimEpoch(spark, root, stageDir, want) match {
      case Won =>
        bumpPointer(spark, root, want)
        Some(want)
      case Lost =>
        fs(spark, root).delete(stageDir, true): Unit
        None
      case LostConsumed => None // stage already gone (see claimEpoch)
    }
  }

  /** Land `df` (plus sidecars) in a hidden staging directory readers
    * and [[versions]] never resolve. */
  private val ClaimMarker = "_graft_claim"

  private def stageEpoch(df: DataFrame, root: String,
                         stage: String => Unit): org.apache.hadoop.fs.Path = {
    val name = s".stage-${java.util.UUID.randomUUID().toString}"
    df.write.mode("overwrite").parquet(s"$root/$name")
    stage(s"$root/$name")
    val f = fs(df.sparkSession, root)
    // EXACTLY-ONCE CARRY-FORWARD: a non-stream commit (maintenance
    // tick, batch merge, optimize) must not reset the stream replay
    // marker — [[lastAppliedBatch]] reads the newest STAMPED epoch, so
    // every epoch carries the table's high-water batch id forward
    // unless the stage hook stamped its own (the writeBatch paths do).
    // Without this, a crash-redelivered micro-batch landing after an
    // interleaved non-stream commit would be applied twice.
    if (!f.exists(
        new org.apache.hadoop.fs.Path(s"$root/$name", BatchSidecar))) {
      val carried = lastAppliedBatch(df.sparkSession, root)
      // ALWAYS stamp (the -1 "never streamed" answer included):
      // lastAppliedBatch walks newest→oldest until it finds a stamped
      // epoch, so a never-streamed table with thousands of retained
      // versions would otherwise pay that full walk — one exists()
      // per version — on EVERY commit; the tombstone makes the next
      // walk O(1) and -1 is already the documented reset value
      stampBatch(df.sparkSession, root, carried)(s"$root/$name")
    }
    // the claim marker: this stage's own (unique) directory name —
    // [[claimEpoch]] verifies after a "successful" publish rename
    // that the published epoch actually carries OUR marker
    val mk = f.create(
      new org.apache.hadoop.fs.Path(s"$root/$name", ClaimMarker), true)
    try mk.write(name.getBytes("UTF-8")) finally mk.close()
    // commit timestamp, stamped last (right before the publishing
    // rename) so [[versionAtTimestamp]] time travel works with no
    // out-of-band bookkeeping
    val out = f.create(
      new org.apache.hadoop.fs.Path(s"$root/$name", TsSidecar), true)
    try out.write(commitClock.nowMs().toString.getBytes("UTF-8"))
    finally out.close()
    new org.apache.hadoop.fs.Path(root, name)
  }

  private[graft] sealed trait Claim
  private[graft] case object Won extends Claim
  /** Lost with the stage directory intact — retry the next number. */
  private[graft] case object Lost extends Claim
  /** Lost AND the stage directory was consumed by a degenerate rename
    * (see [[claimEpoch]]) — the caller must re-stage before retrying. */
  private[graft] case object LostConsumed extends Claim

  /** CAS: rename the staged directory to `epoch=$version` WITHOUT
    * overwrite. `FileContext.rename(…, Rename.NONE)` refuses an
    * existing destination, so at most one racing writer wins each
    * version number — on filesystems whose no-overwrite rename is
    * atomic. The local filesystem's is NOT: `AbstractFileSystem
    * .rename` implements Rename.NONE as a CHECK-then-rename, and
    * `RawLocalFileSystem.rename` degrades a rename onto an existing
    * directory to a COPY-INTO fallback — so in the race window where
    * both writers pass the existence check, the loser's rename can
    * "succeed" by copying its stage INSIDE the winner's published
    * epoch, and both writers would believe they claimed the version
    * (a silent lost update; observed once under a 4-writer race).
    * The rename is therefore only the CLAIM ATTEMPT; ownership is
    * decided by [[verifyClaim]] reading the published epoch's claim
    * marker back. A detected degenerate loser deletes its copied-in
    * garbage and reports its stage consumed. */
  private def claimEpoch(spark: SparkSession, root: String,
                         stageDir: org.apache.hadoop.fs.Path,
                         version: Long): Claim = {
    val dst = new org.apache.hadoop.fs.Path(root, s"epoch=$version")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dst.toUri, spark.sparkContext.hadoopConfiguration)
    try {
      fc.rename(stageDir, dst)
      verifyClaim(spark, root, version, stageDir.getName)
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => Lost
      case _: java.io.IOException if fs(spark, root).exists(dst) =>
        // lost the race mid-rename; if our stage survived we can
        // retry cheaply, else the failed rename half-consumed it
        if (fs(spark, root).exists(stageDir)) Lost
        else verifyClaim(spark, root, version, stageDir.getName)
    }
  }

  /** Decide ownership of a published `epoch=version` by its claim
    * marker: ours → [[Won]]; someone else's (or unreadable) → we are
    * the degenerate-rename loser — our stage was copied INSIDE the
    * winner's epoch as a hidden subdirectory (invisible to readers,
    * but garbage), so delete it and report [[LostConsumed]]. Epochs
    * published by pre-marker writers never reach here: the marker is
    * staged before every rename this code performs. */
  private[graft] def verifyClaim(spark: SparkSession, root: String,
                                 version: Long, stageName: String): Claim = {
    val f = fs(spark, root)
    val dst = new org.apache.hadoop.fs.Path(root, s"epoch=$version")
    val marker = new org.apache.hadoop.fs.Path(dst, ClaimMarker)
    // an UNREADABLE marker must not be mistaken for a foreign one: a
    // writer whose rename genuinely won but whose read-back hiccuped
    // would otherwise report LostConsumed and re-commit its snapshot
    // — the exact double-apply the marker exists to prevent. Retry
    // briefly, then fail LOUDLY: ownership of a published epoch must
    // never be guessed.
    var attempt = 0
    while (attempt < 5) {
      val owner =
        try {
          if (!f.exists(marker)) None
          else {
            val in = f.open(marker)
            try Some(new String(
              org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
              .trim)
            finally in.close()
          }
        } catch { case _: java.io.IOException => None }
      owner match {
        case Some(o) if o == stageName => return Won
        case Some(_) => // definitively someone else's epoch
          f.delete(new org.apache.hadoop.fs.Path(dst, stageName), true): Unit
          return LostConsumed
        case None =>
          attempt += 1
          if (attempt < 5) Thread.sleep(50L << attempt)
      }
    }
    sys.error(s"epoch $version of $root has no readable claim marker — " +
      "cannot decide ownership of the published epoch (filesystem " +
      "anomaly); refusing to guess, since assuming a loss would " +
      "double-commit this snapshot")
  }

  /** Refresh the `_LATEST` cache, monotonically: skip when the pointer
    * already names `version` or newer. The flip itself is the ATOMIC
    * overwrite rename (FileContext + Rename.OVERWRITE): a
    * delete-then-rename pair would leave a window with no pointer file
    * at all. Two racing bumps can still land out of order — harmless,
    * because [[latestVersion]] takes max(pointer, committed listing);
    * the next successful bump re-converges the cache. */
  private def bumpPointer(spark: SparkSession, root: String, version: Long): Unit = {
    val f = fs(spark, root)
    val ptr = new org.apache.hadoop.fs.Path(root, Pointer)
    if (readPointer(spark, root) < version) {
      val tmp = new org.apache.hadoop.fs.Path(root,
        s".$Pointer.tmp-${java.util.UUID.randomUUID().toString}")
      val out = f.create(tmp, true)
      try out.write(version.toString.getBytes("UTF-8")) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        ptr.toUri, spark.sparkContext.hadoopConfiguration)
      try fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          // local ChecksumFs renames the pointer and its `.crc`
          // sidecar as TWO operations, so a racing bump can land its
          // sidecar between this rename's pair and the overwrite
          // throws. The pointer is a monotonic CACHE — latestVersion
          // takes max(pointer, committed listing) — so the losing
          // bump ABSTAINS instead of failing its commit: the racer's
          // value serves, and the next successful bump re-converges.
          try f.delete(tmp, false): Unit
          catch { case _: Exception => () }
      }
    }
  }

  /** Stream-batch idempotence marker: the id of the micro-batch that
    * produced an epoch, committed as a sidecar INSIDE that epoch (via
    * the [[writeStaged]] hook, so marker and state are atomic). Spark's
    * foreachBatch RE-DELIVERS the last micro-batch after a restart;
    * without the marker a fold-style sink (incrementalAggStream,
    * topKStream) would double-apply it. */
  private val BatchSidecar = "_graft_stream_batch"

  /** The table's high-water stream batch id, -1 when no epoch was ever
    * batch-stamped. Walks epochs newest→oldest and returns the FIRST
    * sidecar found: [[stageEpoch]] carries the marker forward into
    * every commit, so the newest stamped epoch holds the maximum —
    * and for histories whose interleaved non-stream commits (a
    * maintenance tick, a batch merge) predate the carry-forward, the
    * walk still reaches the stamped epoch below them instead of
    * resetting to -1, which would re-apply a crash-redelivered
    * micro-batch. Cost: one exists() per epoch until the first hit —
    * post-carry-forward that is the latest epoch. */
  def lastAppliedBatch(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    if (!f.exists(new org.apache.hadoop.fs.Path(root))) return -1L
    versions(spark, root).reverse.foreach { v =>
      val p = new org.apache.hadoop.fs.Path(s"$root/epoch=$v", BatchSidecar)
      if (f.exists(p)) {
        val in = f.open(p)
        try return new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim.toLong
        finally in.close()
      }
    }
    -1L
  }

  /** [[write]] stamped with the producing batch id — and a no-op
    * (None) when that id was already applied, which is exactly the
    * foreachBatch replay case. Ids must be monotone per table (Spark's
    * streaming epochIds are). Returns the committed version, or None
    * on a detected replay.
    *
    * The replay check runs INSIDE the CAS loop, against each attempt's
    * freshly resolved base: a single check before a blind commit would
    * be a TOCTOU — a zombie driver racing its restarted successor (the
    * exact redelivery case the marker exists for) could have BOTH
    * writers pass the pre-check, and the CAS loser's retry would
    * recommit the batch on top of the winner's epoch, double-applying
    * it. Losing the claim therefore re-reads the marker before every
    * retry. */
  def writeBatch(df: DataFrame, root: String, batchId: Long): Option[Long] = {
    val spark = df.sparkSession
    if (batchId <= lastAppliedBatch(spark, root)) return None
    // stage ONCE; the claim loop walks version numbers like
    // [[writeStaged]] (an append always succeeds under contention —
    // re-staging the whole batch per lost claim, or capping attempts,
    // would regress both). The marker re-check happens AFTER `next`
    // was resolved each iteration: a same-batch twin either stamped
    // the marker at a version this check reads (→ None), or claims
    // `next` first (→ our claim loses, the next iteration re-checks)
    // — the TOCTOU window of a check-then-blind-claim is closed.
    var stageDir = stageEpoch(df, root, stampBatch(spark, root, batchId))
    var next = latestVersion(spark, root) + 1
    while (true) {
      if (batchId <= lastAppliedBatch(spark, root)) {
        fs(spark, root).delete(stageDir, true): Unit
        return None
      }
      claimEpoch(spark, root, stageDir, next) match {
        case Won =>
          bumpPointer(spark, root, next)
          return Some(next)
        case Lost         => next += 1
        case LostConsumed =>
          stageDir = stageEpoch(df, root, stampBatch(spark, root, batchId))
          next += 1
      }
    }
    sys.error("unreachable")
  }

  /** Write the batch-id sidecar into a staging dir — shared with
    * [[ManifestTable.writeBatch]], whose epochs live in the manifest
    * VersionedTable but carry the same replay marker. */
  private[sinks] def stampBatch(spark: SparkSession, root: String,
                                batchId: Long)(dir: String): Unit = {
    val f = fs(spark, root)
    val out = f.create(
      new org.apache.hadoop.fs.Path(dir, BatchSidecar), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Row-level MERGE (upsert by key): commit a next epoch holding the
    * current rows whose key has NO match in `updates`, plus every
    * `updates` row — matched keys are replaced, unmatched keys insert
    * (the SQL `MERGE … WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT`
    * shape). One key anti-join + one epoch rewrite: cost ∝ table size
    * — the GDPR-delete / late-correction path no longer costs a
    * pipeline re-run, and readers of the old epoch are undisturbed.
    * `updates` must carry the table's full schema; duplicate keys
    * WITHIN `updates` are the caller's contract to resolve first
    * (both rows land in the epoch, like MERGE's multi-match error but
    * unchecked — dedupe with last-wins upstream). Returns the
    * committed version. */
  def merge(updates: DataFrame, root: String, keyCols: Seq[String]): Long =
    merge(updates, root, keyCols, evolveSchema = false)

  /** MERGE with optional additive schema evolution: with `evolveSchema`
    * a batch may carry NEW columns (existing rows take NULL there) or
    * OMIT existing ones (the update rows take NULL) — the next epoch's
    * schema is the union, which is how an epoch table absorbs an
    * upstream contract change without a stop-the-world backfill. The
    * default stays strict: a silently-widened schema in a pipeline
    * that didn't opt in is a bug surfacing as an analysis error, not an
    * epoch with surprise columns. Key columns must exist on both sides
    * either way. */
  def merge(updates: DataFrame, root: String, keyCols: Seq[String],
            evolveSchema: Boolean): Long = {
    require(keyCols.nonEmpty, "merge requires at least one key column")
    val spark = updates.sparkSession
    require(keyCols.forall(updates.columns.contains),
      s"update batch is missing key columns: ${keyCols.filterNot(updates.columns.contains).mkString(", ")}")
    rewriteLoop(spark, root) { base =>
      val cur = readVersion(spark, root, base)
      val keep = cur.join(
        updates.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
      // the USING-style anti-join moves key columns first; re-project to
      // the base epoch's column order (evolved-in columns append) so a
      // merge never churns the table's positional schema — positional
      // readers (union, exceptAll, parquet field ids) stay stable
      val merged = keep.unionByName(updates, allowMissingColumns = evolveSchema)
      val order = cur.columns ++ merged.columns.filterNot(cur.columns.contains)
      merged.select(order.map(col): _*)
    }
  }

  /** Row-APPEND as a serialized read-modify-write: the next epoch is
    * current ∪ batch, committed through the CAS loop — racing appends
    * each incorporate their predecessor, so none is lost (a blind
    * [[write]] of a precomputed union would retry only the VERSION
    * NUMBER on conflict, silently dropping the other writer's rows).
    * This is the INSERT INTO bridge for epoch tables; cost ∝ table
    * (every epoch is a full snapshot — the documented grain;
    * [[ManifestTable.write]] is the file-list-cost alternative).
    * Creates the table when absent. Returns the committed version. */
  def append(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    if (latestVersion(spark, root) < 0) write(df, root)
    else rewriteLoop(spark, root) { base =>
      readVersion(spark, root, base).unionByName(df)
    }
  }

  /** Optimistic retry loop shared by the read-modify-write commits:
    * pin the current version as the base, compute the rewrite AGAINST
    * THAT EPOCH (readVersion, not read — the plan must not silently
    * re-resolve to a newer epoch between planning and commit), and
    * publish only as base+1. A conflict (someone else claimed base+1)
    * recomputes against the new current epoch, so every committed
    * rewrite incorporated its predecessor — the lost-update anomaly
    * cannot commit. Bounded attempts: under sustained contention the
    * caller should serialize writers instead of spinning here. */
  private def rewriteLoop(spark: SparkSession, root: String,
                          maxAttempts: Int = 12)
                         (rewrite: Long => DataFrame): Long = {
    var attempt = 0
    while (attempt < maxAttempts) {
      val base = latestVersion(spark, root)
      require(base >= 0, s"versioned table at $root has no committed epoch")
      tryCommitAs(rewrite(base), root, base) match {
        case Some(v) => return v
        case None    => attempt += 1
      }
    }
    sys.error(s"versioned table at $root: rewrite lost the commit race " +
      s"$maxAttempts times — serialize the writers or shard the table")
  }

  /** Fold one CDC batch (a change stream in the Debezium shape: key
    * columns + a monotone per-key sequence + an op marker + the full
    * row payload) into the table as ONE epoch commit. Within the
    * batch, the highest-`seqCol` change per key wins (in-batch
    * collapse — a key inserted then deleted in the same batch nets to
    * absent); the winner then applies MERGE-style: `op = 'D'` removes
    * the key, any other op upserts the payload (`I`/`U` are synonyms,
    * like Debezium's `c`/`u` — the table can't tell a late insert from
    * an update and must not care). Folding batches one at a time in
    * sequence order equals one fold of their union, and the spec pins
    * that equivalence.
    *
    * Plan shape: one key-partitioned window over the BATCH (cost ∝
    * batch), one key anti-join + epoch rewrite (cost ∝ table) — the
    * copy-on-write table pattern; amortize via batch size, and vacuum
    * bounds retained history. `(key, seqCol)` pairs must be unique
    * within a batch — equal sequences per key make the winner
    * nondeterministic. Returns the committed version. */
  def applyCdc(changes: DataFrame, root: String, keyCols: Seq[String],
               seqCol: String = "seq", opCol: String = "op"): Long = {
    require(keyCols.nonEmpty, "applyCdc requires at least one key column")
    val spark = changes.sparkSession
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    val winners = changes
      .withColumn("_graft_rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")
    rewriteLoop(spark, root) { base =>
      val cur = readVersion(spark, root, base)
      val keep = cur.join(
        winners.select(keyCols.map(col): _*), keyCols, "left_anti")
      // same column-order preservation as merge: the anti-join's key-
      // first output must not leak into the committed epoch's schema
      keep.unionByName(
        winners.filter(not(col(opCol) === lit("D"))).drop(opCol, seqCol))
        .select(cur.columns.map(col): _*)
    }
  }

  /** Row-level DELETE: commit a next epoch WITHOUT the rows matching
    * `cond` (SQL DELETE semantics — rows where `cond` is NULL are
    * kept). Deleted rows remain as-of-readable in prior epochs until
    * [[vacuum]] drops them: deletion-for-compliance is therefore
    * delete-then-vacuum, and the spec pins that lineage. Returns the
    * committed version. */
  def deleteWhere(spark: SparkSession, root: String, cond: Column): Long =
    rewriteLoop(spark, root) { base =>
      readVersion(spark, root, base).filter(not(coalesce(cond, lit(false))))
    }

  /** CHANGE FEED between two committed epochs — the Delta
    * `table_changes` analog, derived rather than logged: one
    * Debezium-shaped row per key whose content differs between
    * `fromVersion` and `toVersion` — `op` = 'I' (key absent before),
    * 'D' (absent after), 'U' (present in both, any payload column
    * differs, NULL-safely) — carrying the AFTER payload for I/U and
    * the BEFORE payload for D, plus `seq` = `toVersion` (monotone per
    * key across successive feeds, so feeds pipe straight into
    * [[applyCdc]] on a downstream table; the round trip
    * `applyCdc(changesBetween(v0, v1))` onto the v0 state rebuilds v1
    * exactly — spec-pinned). This is what an incremental consumer
    * reads instead of diffing whole snapshots itself.
    *
    * Contract: the table is KEYED at both epochs (one row per key —
    * the [[merge]]/[[applyCdc]] invariant; duplicate keys would fan
    * out the join), and the schema did not evolve between them.
    * Scale shape: two epoch scans + ONE key-partitioned full-outer
    * join; payloads compare as structs (no per-column join churn),
    * unchanged keys drop before anything else happens. */
  def changesBetween(spark: SparkSession, root: String,
                     fromVersion: Long, toVersion: Long,
                     keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "changesBetween requires key columns")
    diffKeyed(readVersion(spark, root, fromVersion),
      readVersion(spark, root, toVersion), keyCols, fromVersion, toVersion)
  }

  /** The derived-change-feed diff itself, shared with
    * [[ManifestTable.changesBetween]] (identical semantics over a
    * different epoch representation). */
  private[sinks] def diffKeyed(a: DataFrame, b: DataFrame,
                               keyCols: Seq[String],
                               fromVersion: Long, toVersion: Long): DataFrame = {
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"schema evolved between epoch $fromVersion and $toVersion — " +
        "diff the common columns explicitly")
    val payload = b.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty, "table has no payload columns beyond the keys")
    def sel(df: DataFrame, as: String) =
      df.select(keyCols.map(col) :+
        struct(payload.map(col): _*).as(as): _*)
    val j = sel(a, "_cf_a").join(sel(b, "_cf_b"), keyCols, "full_outer")
    val changed = j.filter(col("_cf_a").isNull || col("_cf_b").isNull ||
      !(col("_cf_a") <=> col("_cf_b")))
    val after = coalesce(col("_cf_b"), col("_cf_a"))
    changed.select(
      keyCols.map(col) ++
        payload.map(p => after.getField(p).as(p)) :+
        when(col("_cf_a").isNull, lit("I"))
          .when(col("_cf_b").isNull, lit("D"))
          .otherwise(lit("U")).as("op") :+
        lit(toVersion).as("seq"): _*)
  }

  /** OPTIMIZE: re-lay the current epoch's rows as a fresh epoch —
    * small-file compaction (no sort columns) or re-clustering (range
    * partition + sort, so per-file envelopes narrow and stats/DSv2
    * pruning bites again). Readers of the old epoch are undisturbed;
    * the content is identical by construction (one scan + one epoch
    * commit, cost ∝ table). Returns the committed version. */
  def optimize(spark: SparkSession, root: String,
               sortCols: Seq[String] = Nil, numFiles: Int = 16): Long = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val cur = read(spark, root)
    val laid =
      if (sortCols.isEmpty) cur.repartition(numFiles)
      else cur.repartitionByRange(numFiles, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    write(laid, root)
  }

  /** Durable INCREMENTAL CONSUMPTION of a table's change feed — the
    * subscription API over [[changesBetween]]: the consumer's
    * last-acknowledged version persists in its own tiny epoch table
    * at `consumerRoot` (crash-safe through the same commit protocol),
    * so each call returns exactly the changes since the previous
    * ACKNOWLEDGED call — at-least-once across crashes (an unacked
    * batch is re-delivered; the I/U/D rows are idempotent to re-apply
    * through [[applyCdc]]). First consumption bootstraps: the whole
    * current epoch as 'I' rows. Returns None when the consumer is
    * already caught up; call `commit()` on the returned batch AFTER
    * durably applying it. Fails fast (naming retention) when the
    * consumer lagged past a vacuumed epoch — re-bootstrap then. */
  final case class ChangeBatch(changes: DataFrame, fromVersion: Long,
                               toVersion: Long, commit: () => Unit)

  def consumeChanges(spark: SparkSession, root: String, consumerRoot: String,
                     keyCols: Seq[String]): Option[ChangeBatch] = {
    val cur = latestVersion(spark, root)
    require(cur >= 0, s"versioned table at $root has no committed epoch")
    val last =
      if (latestVersion(spark, consumerRoot) < 0) -1L
      else read(spark, consumerRoot).head().getLong(0)
    if (last == cur) return None
    require(last < cur,
      s"consumer offset $last is ahead of the table's current epoch $cur")
    val changes =
      if (last < 0) {
        val b = readVersion(spark, root, cur)
        val payload = b.columns.filterNot(keyCols.contains).toSeq
        b.select(keyCols.map(col) ++ payload.map(col) :+
          lit("I").as("op") :+ lit(cur).as("seq"): _*)
      } else {
        require(versions(spark, root).contains(last),
          s"consumer lagged past retention: epoch $last of $root was " +
            "vacuumed — re-bootstrap the consumer (drop its offset " +
            "table)" + CrashedSweepHint)
        changesBetween(spark, root, last, cur, keyCols)
      }
    Some(ChangeBatch(changes, last, cur, () => {
      write(spark.range(1).select(lit(cur).as("version")), consumerRoot)
      vacuum(spark, consumerRoot, keep = 2)
    }))
  }

  /** Read the current epoch (pointer-resolved). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"versioned table at $root has no committed epoch")
    readVersion(spark, root, v)
  }

  /** Epoch-schema cache: a committed `epoch=N` directory is immutable
    * (the publishing rename is the commit; only vacuum removes it), so
    * its parquet schema can be inferred ONCE and reused — every
    * further [[readVersion]] of the same epoch then skips the
    * footer-reading Spark job schema inference launches (measured: the
    * single largest job population in the table-format query family —
    * 118 one-task jobs in one MV-refresh query). Keyed by (path,
    * directory mtime): a root that is deleted and re-created restarts
    * version numbering, and the fresh epoch directory's mtime differs,
    * so a stale entry can never serve the wrong schema. The cached
    * schema is exactly the previously inferred one, so the returned
    * frame is identical to an uncached read. */
  private val epochSchemaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), org.apache.spark.sql.types.StructType]()

  /** As-of read of a retained epoch. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame = {
    val dir = s"$root/epoch=$version"
    val p = new org.apache.hadoop.fs.Path(dir)
    val key =
      try {
        val st = fs(spark, root).getFileStatus(p)
        Some((p.toUri.toString, st.getModificationTime))
      } catch { case _: java.io.IOException => None }
    key.flatMap(k => Option(epochSchemaCache.get(k))) match {
      case Some(s) => spark.read.schema(s).parquet(dir)
      case None =>
        val df = spark.read.parquet(dir)
        key.foreach { k =>
          if (epochSchemaCache.size > 8192) epochSchemaCache.clear()
          epochSchemaCache.put(k, df.schema)
        }
        df
    }
  }

  /** Raw commit stamp of one epoch (ms), None for epochs committed
    * before stamping existed. */
  def commitTimestamp(spark: SparkSession, root: String,
                      version: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$root/epoch=$version", TsSidecar)
    val f = fs(spark, root)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** (version, effective commit ts) for every retained epoch, in
    * version order. Effective = RUNNING MAX of the raw stamps: racing
    * writers stamp before their CAS claim, so raw stamps can be
    * microscopically out of order vs version numbers — the running
    * max restores the invariant time travel needs (later version ⇒
    * not-earlier timestamp; Delta normalizes its log the same way).
    * Every retained epoch must be stamped — an unstamped (pre-upgrade)
    * epoch fails fast, naming `versionAsOf` as the fallback. */
  def commitTimestamps(spark: SparkSession, root: String): Seq[(Long, Long)] = {
    var running = Long.MinValue
    versions(spark, root).map { v =>
      val raw = commitTimestamp(spark, root, v).getOrElse(sys.error(
        s"epoch $v of $root has no commit timestamp (committed before " +
          "stamping) — time travel by version (versionAsOf) instead"))
      running = math.max(running, raw)
      v -> running
    }
  }

  /** Latest version whose effective commit timestamp is <= `tsMs` —
    * the `timestampAsOf` resolution ("what did the table look like at
    * time t"). Fails fast when t predates the oldest RETAINED epoch:
    * either the table didn't exist yet or the epoch that was current
    * at t has been vacuumed — answering from a newer epoch would be
    * silently wrong either way. */
  def versionAtTimestamp(spark: SparkSession, root: String,
                         tsMs: Long): Long = {
    val stamped = commitTimestamps(spark, root)
    require(stamped.nonEmpty, s"versioned table at $root has no committed epoch")
    val eligible = stamped.filter(_._2 <= tsMs)
    require(eligible.nonEmpty,
      s"no retained epoch of $root is as old as $tsMs (oldest retained: " +
        s"v${stamped.head._1} @ ${stamped.head._2}) — the epoch current " +
        "at that time was vacuumed, or the table did not exist yet" +
        CrashedSweepHint)
    eligible.last._1
  }

  /** All committed-or-orphaned epoch numbers present on disk. */
  /** The retained-version CHECKPOINT — what bounds [[versions]] on a
    * long-lived table: `_VCKPT` records the versions retained at its
    * write time plus the version it was written AT; everything
    * committed after is CONTIGUOUS (every commit is prior-latest + 1
    * through the CAS), so the live set is `recorded ∪ (at, latest]`
    * and latest resolves by probing upward from max(pointer, at) —
    * O(commits since the last pointer bump) existence checks, never a
    * directory listing. [[vacuum]] — the ONLY remover of versions —
    * writes the checkpoint BEFORE it deletes, so a crashed vacuum
    * leaves a checkpoint that UNDER-reports (its victims, still on
    * disk, read as already-vacuumed): retention validation then fails
    * fast conservatively, never resurrects a half-deleted version.
    * Tables never vacuumed have no checkpoint and fall back to the
    * exact listing. Concurrent vacuums of one table are operator
    * error (each would re-record the other's victims). */
  private val Ckpt = "_VCKPT"

  /** Appended to retention refusals that consult [[versions]]: the
    * checkpoint's conservative under-report after a crashed sweep is
    * RECONCILABLE (vacuum always re-reads the authoritative listing),
    * and "was vacuumed" alone sent operators to re-create/re-bootstrap
    * when a re-run would have restored the surviving version. */
  val CrashedSweepHint: String =
    " (if a recent vacuum crashed mid-sweep the version may still " +
      "exist on disk while the retained-version checkpoint " +
      "under-reports it — re-run vacuum on the table to reconcile, " +
      "then retry)"

  private def writeCkpt(spark: SparkSession, root: String,
                        at: Long, kept: Seq[Long]): Unit = {
    val f = fs(spark, root)
    val p = new org.apache.hadoop.fs.Path(root, Ckpt)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".$Ckpt.tmp-${java.util.UUID.randomUUID()}")
    // compact range encoding: 100k retained contiguous versions are
    // one "a-b" token, not 100k lines
    val ranges = kept.sorted.foldLeft(List.empty[(Long, Long)]) {
      case ((a, b) :: tail, v) if v == b + 1 => (a, v) :: tail
      case (acc, v) => (v, v) :: acc
    }.reverse.map { case (a, b) => if (a == b) s"$a" else s"$a-$b" }
    val out = f.create(tmp, true)
    try out.write(s"$at\n${ranges.mkString(",")}\n".getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def readCkpt(spark: SparkSession, root: String)
      : Option[(Long, Seq[Long])] = {
    val f = fs(spark, root)
    val p = new org.apache.hadoop.fs.Path(root, Ckpt)
    try {
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val lines = try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          .split('\n')
        finally in.close()
        val kept = lines(1).split(',').filter(_.nonEmpty).toSeq.flatMap {
          tok =>
            tok.split('-') match {
              case Array(a, b) => a.toLong to b.toLong
              case Array(a)    => Seq(a.toLong)
              case _ => throw new NumberFormatException(
                s"bad checkpoint range token '$tok'")
            }
        }
        Some((lines(0).toLong, kept))
      }
    } catch {
      // a torn/unreadable checkpoint degrades to the exact listing
      case _: java.io.IOException | _: NumberFormatException |
          _: ArrayIndexOutOfBoundsException => None
    }
  }

  def versions(spark: SparkSession, root: String): Seq[Long] =
    readCkpt(spark, root) match {
      case Some((at, kept)) =>
        val f = fs(spark, root)
        var v = math.max(at, readPointer(spark, root))
        while (f.exists(
            new org.apache.hadoop.fs.Path(root, s"epoch=${v + 1}")))
          v += 1
        (kept.filter(_ <= at) ++ ((at + 1) to v)).distinct.sorted
      case None => listVersions(spark, root)
    }

  /** The exact `epoch=` directory listing — the no-checkpoint
    * fallback, and [[vacuum]]'s own authoritative read (a vacuum must
    * see its predecessor's crash leftovers to finish sweeping them). */
  private def listVersions(spark: SparkSession, root: String): Seq[Long] =
    fs(spark, root).listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("epoch=") =>
        n.stripPrefix("epoch=").toLong }
      .sorted.toSeq

  /** Drop all epochs except the newest `keep` (and never the one the
    * pointer names). Also sweeps `.stage-*` directories orphaned by
    * crashed writers — but only ones older than `stageTtlMs`, so a
    * LIVE concurrent writer mid-stage (its CAS rename not yet
    * attempted) cannot have its data deleted out from under it.
    * `pinned` versions survive regardless of age — the retention
    * hook named TAGS ride ([[graft.sinks.ManifestTable.createTag]]):
    * a pinned epoch stays readable until its ref is dropped. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2,
             stageTtlMs: Long = 24L * 3600 * 1000,
             pinned: Set[Long] = Set.empty): Unit = {
    require(keep >= 1, "must keep at least one epoch")
    val cur = latestVersion(spark, root)
    val f = fs(spark, root)
    // the AUTHORITATIVE listing, not the checkpoint view: a prior
    // vacuum that crashed between its checkpoint write and its
    // deletes left victims on disk the checkpoint no longer names —
    // this pass must still see and finish them
    val live = listVersions(spark, root)
    val victims = live.dropRight(keep)
      .filter(_ != cur)
      .filterNot(pinned)
    // checkpoint FIRST, then delete: a crash mid-delete leaves the
    // checkpoint under-reporting (conservative fail-fast), never
    // naming versions that are half-gone
    writeCkpt(spark, root, cur, live.filterNot(victims.toSet))
    victims.foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(root, s"epoch=$v"), true): Unit
    }
    val now = System.currentTimeMillis()
    f.listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".stage-"))
      .filter(s => now - s.getModificationTime > stageTtlMs)
      .foreach(s => f.delete(s.getPath, true): Unit)
  }
}
