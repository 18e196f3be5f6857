package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized views ([[graft.sinks.MaterializedView]]):
  * affected-key recompute keeps every aggregate exact at cost ∝
  * changed groups. */
class MvSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.sinks.{ManifestTable, MaterializedView}

  private def fresh(tag: String): (String, String) = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    (s"$d/base", s"$d/mv")
  }

  private val DefSql =
    "SELECT lang, count(*) AS n, sum(chars) AS total, " +
      "min(doc) AS first_doc, max(chars) AS max_chars " +
      "FROM __BASE__ WHERE chars >= 10 GROUP BY lang"

  private def baseRows(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc", "lang", "chars")

  private def mvRows(mv: String): Seq[(String, Long, Long, Long, Long)] =
    ManifestTable.read(spark, mv).orderBy("lang").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  test("create builds the full aggregate; refresh with no base change is a no-op") {
    val (base, mv) = fresh("mv0")
    ManifestTable.create(baseRows(Seq(
      (1L, "en", 100L), (2L, "en", 50L), (3L, "de", 5L), (4L, "de", 30L))),
      base, Seq("doc", "lang"))
    MaterializedView.create(spark, mv, base, DefSql, Seq("lang"))
    assert(mvRows(mv) == Seq(("de", 1L, 30L, 4L, 30L),
      ("en", 2L, 150L, 1L, 100L)))
    assert(MaterializedView.refresh(spark, mv).isEmpty)
  }

  test("incremental refresh recomputes ONLY the touched groups, exactly — min/max stay right under deletes") {
    val (base, mv) = fresh("mv1")
    // one commit (→ its own files) per lang: the changed-file delta
    // is group-aligned, so the touched-group count is deterministic
    ManifestTable.create(
      baseRows(Seq((1L, "en", 100L), (2L, "en", 40L))).coalesce(1),
      base, Seq("doc", "lang"))
    ManifestTable.write(
      baseRows(Seq((3L, "de", 30L), (4L, "de", 60L))).coalesce(1), base)
    ManifestTable.write(baseRows(Seq((5L, "fr", 20L))).coalesce(1), base)
    MaterializedView.create(spark, mv, base, DefSql, Seq("lang"))

    // delete en's MAX row — the case a sum/count delta-fold can track
    // but min/max cannot; recompute gets it exact
    ManifestTable.deleteWhere(spark, base, col("doc") === 1L)
    val Some((_, touched1)) = MaterializedView.refresh(spark, mv)
    assert(touched1 == 1L, s"only en changed, recomputed $touched1 groups")
    assert(mvRows(mv) == Seq(("de", 2L, 90L, 3L, 60L),
      ("en", 1L, 40L, 2L, 40L), ("fr", 1L, 20L, 5L, 20L)))

    // upsert into de + append a NEW group in one refresh interval
    ManifestTable.merge(baseRows(Seq((3L, "de", 300L))), base, Seq("doc"))
    ManifestTable.write(baseRows(Seq((9L, "zh", 15L))), base)
    val Some((_, touched2)) = MaterializedView.refresh(spark, mv)
    assert(touched2 == 2L, s"de and zh changed, recomputed $touched2")
    assert(mvRows(mv) == Seq(("de", 2L, 360L, 3L, 300L),
      ("en", 1L, 40L, 2L, 40L), ("fr", 1L, 20L, 5L, 20L),
      ("zh", 1L, 15L, 9L, 15L)))
  }

  test("a group whose rows all vanish (or fall under the WHERE) leaves the view") {
    val (base, mv) = fresh("mv2")
    ManifestTable.create(baseRows(Seq(
      (1L, "en", 100L), (2L, "de", 50L), (3L, "fr", 20L))),
      base, Seq("doc", "lang"))
    MaterializedView.create(spark, mv, base, DefSql, Seq("lang"))
    assert(mvRows(mv).map(_._1) == Seq("de", "en", "fr"))
    // de vanishes by delete; fr drops below the definition's WHERE
    ManifestTable.deleteWhere(spark, base, col("lang") === "de")
    ManifestTable.merge(baseRows(Seq((3L, "fr", 2L))), base, Seq("doc"))
    MaterializedView.refresh(spark, mv): Unit
    assert(mvRows(mv) == Seq(("en", 1L, 100L, 1L, 100L)))
  }

  test("refresh is idempotent by value: re-running after a crash between view commit and offset converges") {
    val (base, mv) = fresh("mv3")
    ManifestTable.create(baseRows(Seq((1L, "en", 100L))),
      base, Seq("doc", "lang"))
    MaterializedView.create(spark, mv, base, DefSql, Seq("lang"))
    ManifestTable.write(baseRows(Seq((2L, "en", 60L))), base)
    MaterializedView.refresh(spark, mv): Unit
    val settled = mvRows(mv)
    // simulate the crash: rewind ONLY the offset and refresh again —
    // the same recompute against the same base version must land the
    // same values (a new view version, identical content)
    val st = java.nio.file.Paths.get(s"$mv/_mvdef/spec")
    val lines = java.nio.file.Files.readAllLines(st)
    lines.set(2, "0")
    java.nio.file.Files.write(st, lines)
    // the raw JDK write bypasses ChecksumFs — drop the stale sidecar
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$mv/_mvdef/.spec.crc")): Unit
    MaterializedView.refresh(spark, mv): Unit
    assert(mvRows(mv) == settled)
  }

  test("contracts: NULL group key refuses; base vacuumed past the offset refuses with re-create named") {
    val (base, mv) = fresh("mv4")
    ManifestTable.create(baseRows(Seq((1L, "en", 100L)))
      .union(Seq((2L, null.asInstanceOf[String], 50L))
        .toDF("doc", "lang", "chars")),
      base, Seq("doc"))
    assert(intercept[IllegalArgumentException] {
      MaterializedView.create(spark, mv, base, DefSql, Seq("lang"))
    }.getMessage.contains("non-null"))

    val (base2, mv2) = fresh("mv5")
    ManifestTable.create(baseRows(Seq((1L, "en", 100L))),
      base2, Seq("doc", "lang"))
    MaterializedView.create(spark, mv2, base2, DefSql, Seq("lang"))
    ManifestTable.write(baseRows(Seq((2L, "de", 60L))), base2)
    ManifestTable.write(baseRows(Seq((3L, "fr", 70L))), base2)
    ManifestTable.vacuum(spark, base2, keep = 1, ttlMs = 0L)
    val err = intercept[IllegalArgumentException] {
      MaterializedView.refresh(spark, mv2)
    }
    assert(err.getMessage.contains("re-create"))
  }

  test("metadata-only base commits advance the offset without touching any group") {
    val (base, mv) = fresh("mv6")
    ManifestTable.create(baseRows(Seq((1L, "en", 100L))),
      base, Seq("doc", "lang"))
    MaterializedView.create(spark, mv, base, DefSql, Seq("lang"))
    ManifestTable.addConstraint(spark, base, "pos", "doc > 0")
    val Some((_, touched)) = MaterializedView.refresh(spark, mv)
    assert(touched == 0L)
    assert(MaterializedView.refresh(spark, mv).isEmpty,
      "offset must have advanced past the metadata commit")
  }
}
