package graft.sinks.pbi

import graft.util.{Clock, SystemClock}

/** K3-K6 — the push-refresh execution family
  * (src/sinks/pbi/refresh/{batchRows,wipeAndReload,executeWipeAndReload}.ts
  * and the client surface of client/powerbiClient.ts) behind a client
  * trait so tests (and offline runs) use an in-memory fake.
  */
object Refresh {

  type Row = Map[String, Any]

  /** K4 — batch chunker (batchRows.ts:1-19): ≤10k rows per POST, hard
    * error above. */
  def batchRows[T](rows: Seq[T], maxBatchSize: Int = 10000): Seq[Seq[T]] = {
    if (maxBatchSize <= 0)
      throw new IllegalArgumentException("maxBatchSize must be a positive integer.")
    if (maxBatchSize > 10000)
      throw new IllegalArgumentException(
        "Power BI limit exceeded: maxBatchSize cannot be greater than 10000.")
    rows.grouped(maxBatchSize).toSeq
  }

  case class WipeAndReloadPlan(groupId: String, datasetId: String,
                               tables: Seq[(String, Seq[Seq[Row]])])

  private def assertTableSet(specNames: Seq[String], inputNames: Set[String],
                             op: String): Unit = {
    val missing = specNames.filterNot(inputNames.contains)
    val extra = inputNames.filterNot(specNames.contains)
    if (missing.nonEmpty || extra.nonEmpty)
      throw new IllegalArgumentException(
        s"$op table set mismatch. Missing: ${if (missing.nonEmpty) missing.mkString(", ") else "none"}. " +
        s"Extra: ${if (extra.nonEmpty) extra.mkString(", ") else "none"}.")
  }

  /** K5 — pure wipe+reload planner (wipeAndReload.ts:20-47). */
  def planWipeAndReload(groupId: String, datasetId: String, spec: PbiSpec.DatasetSpec,
                        tableRowsByName: Map[String, Seq[Row]]): WipeAndReloadPlan = {
    val specNames = spec.tables.map(_.name)
    assertTableSet(specNames, tableRowsByName.keySet, "wipeAndReload")
    WipeAndReloadPlan(groupId, datasetId,
      specNames.map(n => n -> batchRows(tableRowsByName.getOrElse(n, Seq.empty))))
  }

  /** K6 — client surface (powerbiClient.ts:29-158); implemented by an
    * HTTP client in production and an in-memory fake in tests. */
  trait PbiClient {
    def deleteRowsInGroup(groupId: String, datasetId: String, tableName: String): Unit
    def postRowsInGroup(groupId: String, datasetId: String, tableName: String,
                        rows: Seq[Row]): Unit
    def getDatasetsInGroup(groupId: String): Seq[(String, String)] // (id, name)
    def createPushDatasetInGroup(groupId: String, spec: PbiSpec.DatasetSpec): String
    def getTablesInGroup(groupId: String, datasetId: String): Seq[String]
    def putTableInGroup(groupId: String, datasetId: String,
                        table: PbiSpec.TableSpec): Unit
  }

  /** In-memory fake client (test double with full call journal). */
  final class FakeClient extends PbiClient {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    val tableRows = scala.collection.mutable.Map.empty[String, Vector[Row]]
      .withDefaultValue(Vector.empty)
    private val datasets = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    private val tables = scala.collection.mutable.Map.empty[String, Vector[PbiSpec.TableSpec]]
      .withDefaultValue(Vector.empty)
    private var nextId = 0

    def deleteRowsInGroup(g: String, d: String, t: String): Unit = {
      calls += s"delete:$t"
      tableRows(s"$g/$d/$t") = Vector.empty
    }
    def postRowsInGroup(g: String, d: String, t: String, rows: Seq[Row]): Unit = {
      calls += s"post:$t:${rows.size}"
      tableRows(s"$g/$d/$t") = tableRows(s"$g/$d/$t") ++ rows
    }
    def getDatasetsInGroup(g: String): Seq[(String, String)] = datasets.toSeq
    def createPushDatasetInGroup(g: String, spec: PbiSpec.DatasetSpec): String = {
      nextId += 1
      val id = s"ds-$nextId"
      datasets += ((id, spec.name))
      tables(s"$g/$id") = spec.tables.toVector
      calls += s"create:${spec.name}"
      id
    }
    def getTablesInGroup(g: String, d: String): Seq[String] =
      tables(s"$g/$d").map(_.name)
    def putTableInGroup(g: String, d: String, table: PbiSpec.TableSpec): Unit = {
      calls += s"putTable:${table.name}"
      tables(s"$g/$d") = tables(s"$g/$d").filterNot(_.name == table.name) :+ table
    }
  }

  case class RefreshTotals(tablesProcessed: Int, totalRowsPosted: Long,
                           totalPostRequests: Long)

  /** K3 — strict wipe+reload execution (executeWipeAndReload.ts:24-101):
    * per spec-ordered table DELETE then governed POST batches. */
  def executeWipeAndReload(client: PbiClient, groupId: String, datasetId: String,
                           spec: PbiSpec.DatasetSpec,
                           tableRowsByName: Map[String, Seq[Row]],
                           limits: Governor.Limits = Governor.Limits(),
                           clock: Clock = SystemClock,
                           log: String => Unit = _ => ()): RefreshTotals = {
    val specNames = spec.tables.map(_.name)
    assertTableSet(specNames, tableRowsByName.keySet, "executeWipeAndReload")
    val governor = new Governor(limits, clock)
    var rowsPosted = 0L
    var posts = 0L
    for (tableName <- specNames) {
      log(s"wiping table $tableName")
      client.deleteRowsInGroup(groupId, datasetId, tableName)
      val batches = batchRows(tableRowsByName.getOrElse(tableName, Seq.empty))
      for ((batch, i) <- batches.zipWithIndex) {
        governor.waitForBudget(batch.size.toLong, 1)
        client.postRowsInGroup(groupId, datasetId, tableName, batch)
        governor.record(batch.size.toLong, 1)
        rowsPosted += batch.size
        posts += 1
        log(s"posted batch $tableName ${i + 1}/${batches.size} rows=${batch.size}")
      }
    }
    RefreshTotals(specNames.size, rowsPosted, posts)
  }
}
