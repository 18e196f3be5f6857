package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The durable SQL surface (sources.v2.GraftCatalog): named tables
  * resolve across sessions from on-disk descriptors, SQL time travel
  * hits the table formats' version/timestamp resolution, writes
  * commit through the CAS protocols, and — the load-bearing claim —
  * a FRESH session that knows only the catalog conf still gets
  * file-skipping, because named tables carry their metadata as table
  * properties (or structurally, in the manifest) instead of the
  * per-JVM GraftTables registry. */
class CatalogSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val warehouse = {
    val w = java.nio.file.Files
      .createTempDirectory("graft-warehouse").toString
    // a spec-private catalog name: the session caches catalog instances
    // on first use, and the gated q_graft_sql query owns "graft" with
    // its own warehouse when the full suite runs
    spark.conf.set("spark.sql.catalog.graftc",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftc.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftc.db")
    w
  }

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    import org.apache.spark.sql.execution.datasources.FilePartition
    df.queryExecution.sparkPlan.collect { case b: BatchScanExec =>
      b.partitions.flatten.collect { case fp: FilePartition =>
        fp.files.map(_.filePath.toString).toSeq }.flatten
    }.flatten.distinct.size
  }

  test("managed table lifecycle: CREATE with schema, INSERT INTO, SELECT, overwrite, rename, drop") {
    warehouse: Unit
    spark.sql("CREATE TABLE graftc.db.kv (k BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCols' = 'k')")
    assert(spark.sql("SHOW TABLES IN graftc.db").collect()
      .map(_.getString(1)).contains("kv"))
    // created empty, readable immediately
    assert(spark.sql("SELECT * FROM graftc.db.kv").count() == 0)
    spark.sql("INSERT INTO graftc.db.kv VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graftc.db.kv VALUES (3, 'c')")
    assert(spark.sql("SELECT * FROM graftc.db.kv ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // each INSERT was a real manifest commit: version history exists
    val loc = s"$warehouse/tables/db/kv"
    assert(sinks.ManifestTable.versions(spark, loc) == Seq(0L, 1L, 2L))
    // INSERT OVERWRITE replaces content; history stays travelable
    spark.sql("INSERT OVERWRITE graftc.db.kv VALUES (9, 'z')")
    assert(spark.sql("SELECT * FROM graftc.db.kv").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
    assert(spark.sql("SELECT * FROM graftc.db.kv VERSION AS OF 2")
      .count() == 3)
    // writeTo append composes with the same commit path
    Seq((10L, "w")).toDF("k", "v").writeTo("graftc.db.kv").append()
    assert(spark.sql("SELECT * FROM graftc.db.kv").count() == 2)
    spark.sql("ALTER TABLE graftc.db.kv RENAME TO graftc.db.kv2")
    assert(spark.sql("SELECT * FROM graftc.db.kv2").count() == 2)
    spark.sql("DROP TABLE graftc.db.kv2")
    assert(!spark.catalog.tableExists("graftc.db.kv2"))
    // data survives the descriptor drop (external-style semantics)
    assert(sinks.ManifestTable.read(spark, loc).count() == 2)
  }

  test("adopted location + SQL time travel by version and timestamp") {
    warehouse: Unit
    val loc = java.nio.file.Files
      .createTempDirectory("graft-catalog-adopt").toString + "/t"
    val clock = new util.LogicalClock(1000L)
    val prev = sinks.VersionedTable.commitClock
    sinks.VersionedTable.commitClock = clock
    try {
      sinks.ManifestTable.create(Seq((1L, "a")).toDF("k", "v"), loc, Seq("k"))
      clock.advance(5000L)
      sinks.ManifestTable.write(Seq((2L, "b")).toDF("k", "v"), loc)
      spark.sql(s"CREATE TABLE graftc.db.adopted USING graft LOCATION '$loc'")
      assert(spark.sql("SELECT * FROM graftc.db.adopted").count() == 2)
      assert(spark.sql("SELECT * FROM graftc.db.adopted VERSION AS OF 0")
        .collect().map(_.getLong(0)).toSeq == Seq(1L))
      // TIMESTAMP AS OF resolves through the stamped manifest commits
      // (t = 2s: only version 0, stamped at t=1s, existed)
      val t0 = java.time.Instant.ofEpochMilli(2000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString
        .replace('T', ' ')
      assert(spark.sql(
        s"SELECT * FROM graftc.db.adopted TIMESTAMP AS OF '$t0'")
        .collect().map(_.getLong(0)).toSeq == Seq(1L))
    } finally sinks.VersionedTable.commitClock = prev
  }

  test("a fresh session resolves by name and still prunes — no per-JVM registration involved") {
    warehouse: Unit
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val loc = java.nio.file.Files
      .createTempDirectory("graft-catalog-prune").toString + "/t"
    sinks.ManifestTable.create(
      docs.repartitionByRange(5, col("doc_id"))
        .sortWithinPartitions(col("doc_id")), loc, Seq("doc_id"))
    spark.sql(s"CREATE TABLE graftc.db.pruned USING graft LOCATION '$loc'")
    // a brand-new session: fresh session state and catalog instances,
    // nothing registered in it beyond the catalog conf itself
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graftc", "graft.sources.v2.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graftc.warehouse", warehouse)
    plans.GraftTables.clear() // prove the JVM registry plays no part
    val lo = docs.agg(min(col("doc_id"))).head().getLong(0)
    val total = sinks.ManifestTable.filesAt(spark, loc, 0).size
    val q = s2.sql(
      s"SELECT doc_id FROM graftc.db.pruned WHERE doc_id <= ${lo + 2}")
    assert(scannedFiles(q) < total,
      s"named-table read in a fresh session must prune (opened all $total)")
    assert(q.collect().map(_.getLong(0)).toSet ==
      docs.filter(col("doc_id") <= lo + 2)
        .select(col("doc_id")).as[Long].collect().toSet)
  }
}
