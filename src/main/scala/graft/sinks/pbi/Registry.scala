package graft.sinks.pbi

import java.nio.file.{Files, Paths}

/** K9 — dataset registry state store
  * (src/sinks/pbi/state/datasetRegistry.ts): a small driver-side JSON
  * file mapping (groupId, datasetName) → datasetId with upsert and
  * most-recent-entry lookup. Hand-rolled JSON (the only shape we need)
  * to stay dependency-free.
  */
object Registry {

  case class Entry(groupId: String, datasetName: String, datasetId: String,
                   createdAt: String, updatedAt: String,
                   lastAppliedSchemaHash: Option[String] = None)

  case class RegistryFile(entries: Seq[Entry])

  def path(dataDir: String): String = s"$dataDir/state/pbi-dataset-registry.json"

  /** Tolerant load (datasetRegistry.ts:26-80): malformed file → empty;
    * entries missing required strings are skipped; `workspaceId` is the
    * legacy alias for groupId. */
  def load(dataDir: String, nowIso: () => String = () => java.time.Instant.now.toString): RegistryFile = {
    val p = Paths.get(path(dataDir))
    if (!Files.exists(p)) return RegistryFile(Seq.empty)
    try {
      val raw = new String(Files.readAllBytes(p), "UTF-8")
      RegistryFile(parseEntries(raw, nowIso))
    } catch { case _: Exception => RegistryFile(Seq.empty) }
  }

  def save(dataDir: String, reg: RegistryFile): Unit = {
    val p = Paths.get(path(dataDir))
    Files.createDirectories(p.getParent)
    Files.write(p, render(reg).getBytes("UTF-8"))
  }

  def findDatasetId(reg: RegistryFile, groupId: String, datasetName: String): Option[String] =
    reg.entries.find(e => e.groupId == groupId &&
      e.datasetName.equalsIgnoreCase(datasetName)).map(_.datasetId)

  /** Sort by updatedAt desc, createdAt desc, name desc
    * (datasetRegistry.ts:82-114). */
  def findMostRecentEntryForGroup(reg: RegistryFile, groupId: String): Option[Entry] = {
    def ts(s: String): Long =
      try java.time.Instant.parse(s).toEpochMilli catch { case _: Exception => 0L }
    reg.entries.filter(_.groupId == groupId)
      .sortWith { (a, b) =>
        val (au, bu) = (ts(a.updatedAt), ts(b.updatedAt))
        if (au != bu) au > bu
        else {
          val (ac, bc) = (ts(a.createdAt), ts(b.createdAt))
          if (ac != bc) ac > bc
          else a.datasetName.compareTo(b.datasetName) > 0
        }
      }
      .headOption
  }

  /** Upsert keyed on (groupId, lower(datasetName)); updates set
    * updatedAt, inserts set both timestamps (datasetRegistry.ts:116-152). */
  def upsert(reg: RegistryFile, groupId: String, datasetName: String, datasetId: String,
             lastAppliedSchemaHash: Option[String] = None,
             nowIso: () => String = () => java.time.Instant.now.toString): RegistryFile = {
    val now = nowIso()
    val idx = reg.entries.indexWhere(e =>
      e.groupId == groupId && e.datasetName.equalsIgnoreCase(datasetName))
    if (idx < 0)
      RegistryFile(reg.entries :+ Entry(groupId, datasetName, datasetId, now, now,
        lastAppliedSchemaHash))
    else {
      val existing = reg.entries(idx)
      RegistryFile(reg.entries.updated(idx, existing.copy(
        datasetId = datasetId, updatedAt = now,
        lastAppliedSchemaHash = lastAppliedSchemaHash.orElse(existing.lastAppliedSchemaHash))))
    }
  }

  // -- minimal JSON (flat string fields only) -------------------------

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def render(reg: RegistryFile): String = {
    val es = reg.entries.map { e =>
      val hash = e.lastAppliedSchemaHash
        .map(h => s", ${q("lastAppliedSchemaHash")}: ${q(h)}").getOrElse("")
      s"""    {${q("groupId")}: ${q(e.groupId)}, ${q("datasetName")}: ${q(e.datasetName)}, ${q("datasetId")}: ${q(e.datasetId)}, ${q("createdAt")}: ${q(e.createdAt)}, ${q("updatedAt")}: ${q(e.updatedAt)}$hash}"""
    }
    s"{\n  ${q("entries")}: [\n${es.mkString(",\n")}\n  ]\n}\n"
  }

  /** Inverse of [[q]] — MUST undo every escape render emits (\" \\ \n
    * \uXXXX), or a control character in a dataset name round-trips
    * corrupted, the name lookup misses, and ensureDataset provisions a
    * duplicate dataset. */
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'u' if i + 5 < s.length =>
            try { sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6 }
            catch { case _: NumberFormatException => sb.append(s.charAt(i)); i += 1 }
          case _ => sb.append(s.charAt(i)); i += 1
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Tiny tolerant parser for the registry's flat-object-array shape. */
  private def parseEntries(raw: String, nowIso: () => String): Seq[Entry] = {
    val objPattern = java.util.regex.Pattern.compile("\\{[^{}]*\\}")
    val fieldPattern = java.util.regex.Pattern.compile(
      "\"([^\"]+)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")
    val entriesSection = raw.indexOf("\"entries\"") match {
      case -1 => return Seq.empty
      case i => raw.substring(i)
    }
    val m = objPattern.matcher(entriesSection)
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    while (m.find()) {
      val fields = scala.collection.mutable.Map.empty[String, String]
      val fm = fieldPattern.matcher(m.group())
      while (fm.find()) fields(fm.group(1)) = unescape(fm.group(2))
      val group = fields.get("groupId").orElse(fields.get("workspaceId"))
      (group, fields.get("datasetName"), fields.get("datasetId")) match {
        case (Some(g), Some(n), Some(d)) =>
          out += Entry(g, n, d,
            fields.getOrElse("createdAt", nowIso()),
            fields.getOrElse("updatedAt", nowIso()),
            fields.get("lastAppliedSchemaHash"))
        case _ => // skip malformed entry
      }
    }
    out.toSeq
  }

  /** K8 — ensure dataset: registry lookup → find by name → create
    * (provision/ensureDataset.ts:17-55); upserts the registry. */
  def ensureDataset(client: Refresh.PbiClient, dataDir: String, groupId: String,
                    spec: PbiSpec.DatasetSpec,
                    nowIso: () => String = () => java.time.Instant.now.toString): String = {
    PbiSpec.validate(spec)
    val reg = load(dataDir, nowIso)
    val fromRegistry = findDatasetId(reg, groupId, spec.name)
    val datasetId = fromRegistry
      .orElse(client.getDatasetsInGroup(groupId)
        .find(_._2.equalsIgnoreCase(spec.name)).map(_._1))
      .getOrElse(client.createPushDatasetInGroup(groupId, spec))
    // K8 schema diff: add missing tables only (schemaDiff.ts:9-26)
    val existing = client.getTablesInGroup(groupId, datasetId).map(_.toLowerCase).toSet
    spec.tables.filterNot(t => existing.contains(t.name.toLowerCase))
      .foreach(t => client.putTableInGroup(groupId, datasetId, t))
    save(dataDir, upsert(reg, groupId, spec.name, datasetId, nowIso = nowIso))
    datasetId
  }
}
