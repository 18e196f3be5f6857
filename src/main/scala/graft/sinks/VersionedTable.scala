package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, not}

/** Always-readable versioned table — the epoch-flip pattern the
  * persisted-index docs prescribe ([[graft.operators.Dedup
  * .saveMinhashIndex]]'s non-atomicity note), implemented: every write
  * lands in a FRESH `epoch=N` directory, and readers resolve the
  * current epoch through a pointer file that is replaced atomically
  * (write-temp + rename). A reader holding the old pointer keeps
  * reading the old epoch's (immutable, fully written) files; a torn
  * writer leaves at worst an orphaned epoch directory that the next
  * successful flip supersedes — parquet overwrite's delete-then-write
  * window never exists for readers.
  *
  * This is deliberately a MINIMAL single-writer design (one pointer,
  * no optimistic-concurrency log): index artifacts — MinHash epochs,
  * sketch tables, IVF/PQ models — have one maintaining batch job by
  * construction. Old epochs are retained for as-of reads
  * ([[readVersion]]) until [[vacuum]] drops all but the newest k.
  */
object VersionedTable {

  private val Pointer = "_LATEST"

  private def fs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current version, or -1 when the table has never committed. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(root, Pointer)
    val f = fs(spark, root)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Write `df` as the next epoch and flip the pointer. Returns the
    * new version. The pointer flip is the COMMIT: a crash before it
    * leaves the table at the previous version with an orphaned
    * directory, never a half-visible epoch. */
  def write(df: DataFrame, root: String): Long =
    writeStaged(df, root)(_ => ())

  /** [[write]] with a staging hook: `stage(epochDir)` runs after the
    * epoch's data is fully written but BEFORE the pointer flip, so
    * sidecar artifacts (e.g. an index's `_graft_build_params`) commit
    * atomically with the epoch they describe — a reader can never
    * resolve an epoch whose sidecar is missing or half-written. */
  def writeStaged(df: DataFrame, root: String)(stage: String => Unit): Long = {
    val spark = df.sparkSession
    val next = latestVersion(spark, root) + 1
    df.write.mode("overwrite").parquet(s"$root/epoch=$next")
    stage(s"$root/epoch=$next")
    val f = fs(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(root, s".$Pointer.tmp")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val ptr = new org.apache.hadoop.fs.Path(root, Pointer)
    // ATOMIC overwrite rename (FileContext + Rename.OVERWRITE): a
    // delete-then-rename pair would leave a window with no pointer file
    // at all, in which a racing reader sees latestVersion == -1 and
    // read() throws — breaking the always-readable contract. With the
    // overwrite rename a racing reader observes either the old or the
    // new pointer content, both naming fully-written epochs. (HDFS and
    // local filesystems rename atomically; object stores without atomic
    // rename need the same external-commit caveat compactTable
    // documents.)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      ptr.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    next
  }

  /** Stream-batch idempotence marker: the id of the micro-batch that
    * produced an epoch, committed as a sidecar INSIDE that epoch (via
    * the [[writeStaged]] hook, so marker and state are atomic). Spark's
    * foreachBatch RE-DELIVERS the last micro-batch after a restart;
    * without the marker a fold-style sink (incrementalAggStream,
    * topKStream) would double-apply it. */
  private val BatchSidecar = "_graft_stream_batch"

  /** Batch id recorded in the current epoch's sidecar, -1 when the
    * table is empty or its current epoch was not batch-stamped. */
  def lastAppliedBatch(spark: SparkSession, root: String): Long = {
    val v = latestVersion(spark, root)
    if (v < 0) -1L
    else {
      val p = new org.apache.hadoop.fs.Path(s"$root/epoch=$v", BatchSidecar)
      val f = fs(spark, root)
      if (!f.exists(p)) -1L
      else {
        val in = f.open(p)
        try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          "UTF-8").trim.toLong
        finally in.close()
      }
    }
  }

  /** [[write]] stamped with the producing batch id — and a no-op
    * (None) when that id was already applied, which is exactly the
    * foreachBatch replay case. Ids must be monotone per table (Spark's
    * streaming epochIds are). Returns the committed version, or None
    * on a detected replay. */
  def writeBatch(df: DataFrame, root: String, batchId: Long): Option[Long] =
    if (batchId <= lastAppliedBatch(df.sparkSession, root)) None
    else Some(writeStaged(df, root) { dir =>
      val f = fs(df.sparkSession, root)
      val out = f.create(
        new org.apache.hadoop.fs.Path(dir, BatchSidecar), true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    })

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
    val keep = read(spark, root).join(
      updates.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    write(keep.unionByName(updates, allowMissingColumns = evolveSchema), root)
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
    val keep = read(spark, root).join(
      winners.select(keyCols.map(col): _*), keyCols, "left_anti")
    write(keep.unionByName(
      winners.filter(not(col(opCol) === lit("D"))).drop(opCol, seqCol)), root)
  }

  /** Row-level DELETE: commit a next epoch WITHOUT the rows matching
    * `cond` (SQL DELETE semantics — rows where `cond` is NULL are
    * kept). Deleted rows remain as-of-readable in prior epochs until
    * [[vacuum]] drops them: deletion-for-compliance is therefore
    * delete-then-vacuum, and the spec pins that lineage. Returns the
    * committed version. */
  def deleteWhere(spark: SparkSession, root: String, cond: Column): Long =
    write(read(spark, root).filter(not(coalesce(cond, lit(false)))), root)

  /** Read the current epoch (pointer-resolved). */
  def read(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(spark, root)
    require(v >= 0, s"versioned table at $root has no committed epoch")
    readVersion(spark, root, v)
  }

  /** As-of read of a retained epoch. */
  def readVersion(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(s"$root/epoch=$version")

  /** All committed-or-orphaned epoch numbers present on disk. */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    fs(spark, root).listStatus(new org.apache.hadoop.fs.Path(root))
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("epoch=") =>
        n.stripPrefix("epoch=").toLong }
      .sorted.toSeq

  /** Drop all epochs except the newest `keep` (and never the one the
    * pointer names). */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2): Unit = {
    require(keep >= 1, "must keep at least one epoch")
    val cur = latestVersion(spark, root)
    val f = fs(spark, root)
    versions(spark, root).sorted.dropRight(keep)
      .filter(_ != cur)
      .foreach { v =>
        f.delete(new org.apache.hadoop.fs.Path(root, s"epoch=$v"), true): Unit
      }
  }
}
