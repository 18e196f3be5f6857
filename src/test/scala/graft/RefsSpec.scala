package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Branches, tags, and write-audit-publish over the manifest format
  * ([[graft.sinks.ManifestTable]] refs). */
class RefsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.sinks.ManifestTable

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString + "/t"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy("id").collect().toSeq.map(_.toSeq)

  test("tags: pin, read by name, survive vacuum, release on drop") {
    val root = freshRoot("tag")
    ManifestTable.create(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root, Seq("id")) // v0
    ManifestTable.write(Seq((3L, "c")).toDF("id", "v"), root)     // v1
    val tagged = ManifestTable.createTag(spark, root, "audit_cut")
    assert(tagged == 1L)
    ManifestTable.deleteWhere(spark, root, col("id") === 1L)      // v2
    ManifestTable.write(Seq((4L, "d")).toDF("id", "v"), root)     // v3

    // read by name == read by pinned version, through BOTH surfaces
    val byName = spark.read.format("graft")
      .option("versionAsOf", "audit_cut").load(root)
    assert(rows(byName) == rows(ManifestTable.readVersion(spark, root, 1L)))
    assert(rows(byName) ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))

    // vacuum far past the tag: the tagged version AND its files survive
    ManifestTable.vacuum(spark, root, keep = 1, ttlMs = 0L)
    assert(ManifestTable.versions(spark, root).contains(1L),
      "tagged version must be pinned past the keep horizon")
    assert(rows(spark.read.format("graft")
      .option("versionAsOf", "audit_cut").load(root)) ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")),
      "tagged version must stay exactly readable after vacuum")
    // current head untouched by the pin
    assert(rows(ManifestTable.read(spark, root)) ==
      Seq(Seq(2L, "b"), Seq(3L, "c"), Seq(4L, "d")))

    // drop releases the pin: the next vacuum reclaims the version
    ManifestTable.dropRef(spark, root, "audit_cut")
    ManifestTable.vacuum(spark, root, keep = 1, ttlMs = 0L)
    assert(!ManifestTable.versions(spark, root).contains(1L))
    val err = intercept[IllegalArgumentException] {
      spark.read.format("graft")
        .option("versionAsOf", "audit_cut").load(root).collect()
    }
    assert(err.getMessage.contains("no ref"))
  }

  test("ref names: numeric refused (versionAsOf dispatch), duplicates refused") {
    val root = freshRoot("refname")
    ManifestTable.create(Seq((1L, "a")).toDF("id", "v"), root, Seq("id"))
    assert(intercept[IllegalArgumentException] {
      ManifestTable.createTag(spark, root, "123")
    }.getMessage.contains("ref name"))
    ManifestTable.createTag(spark, root, "v1_cut")
    intercept[Exception] { ManifestTable.createTag(spark, root, "v1_cut") }
    // tag and branch share ONE namespace: the claimed name refuses both
    intercept[Exception] { ManifestTable.createBranch(spark, root, "v1_cut") }
  }

  test("branch WAP: fork, write, audit isolation, publish, continue, non-FF refusal") {
    val root = freshRoot("wap")
    ManifestTable.create(
      (1L to 10L).map(i => (i, i * 10)).toDF("id", "v"), root, Seq("id"))
    val base = ManifestTable.createBranch(spark, root, "audit")
    assert(base == 0L)
    val bRoot = ManifestTable.branchRoot(root, "audit")

    // WRITE: the branch takes the full op surface — append + delete
    ManifestTable.write(Seq((11L, 110L)).toDF("id", "v"), bRoot)
    ManifestTable.deleteWhere(spark, bRoot, col("id") <= 2L)

    // AUDIT ISOLATION: main unchanged; the branch reads its own state
    // both directly and via VERSION AS OF '<branch>' on the MAIN root
    assert(ManifestTable.read(spark, root).count() == 10L)
    val want = ((3L to 11L).map(i => Seq(i, i * 10))).toSeq
    assert(rows(ManifestTable.read(spark, bRoot)) == want)
    assert(rows(spark.read.format("graft")
      .option("versionAsOf", "audit").load(root)) == want)

    // PUBLISH: one fast-forward commit; main == audited branch state
    val published = ManifestTable.publishBranch(spark, root, "audit")
    assert(published == 1L)
    assert(rows(ManifestTable.read(spark, root)) == want)

    // CONTINUE: the ref advanced to the published version, so further
    // branch work publishes again as long as main only moves through
    // this branch
    ManifestTable.write(Seq((12L, 120L)).toDF("id", "v"), bRoot)
    val published2 = ManifestTable.publishBranch(spark, root, "audit")
    assert(published2 == 2L)
    assert(ManifestTable.read(spark, root).count() == 10L)

    // NON-FAST-FORWARD: main moves on its own → publish refuses
    ManifestTable.write(Seq((13L, 130L)).toDF("id", "v"), root)
    ManifestTable.write(Seq((14L, 140L)).toDF("id", "v"), bRoot)
    val err = intercept[Exception] {
      ManifestTable.publishBranch(spark, root, "audit")
    }
    assert(err.getMessage.contains("non-fast-forward"))
  }

  test("merge publish: disjoint branch and main changes land in ONE commit; the branch rebases onto the merge; overlapping file changes refuse naming both commits") {
    val root = freshRoot("wap3w")
    ManifestTable.create(
      (1L to 10L).map(i => (i, i * 10)).toDF("id", "v"), root, Seq("id"))
    ManifestTable.createBranch(spark, root, "feature")
    val bRoot = ManifestTable.branchRoot(root, "feature")
    // branch line: an append AND a row-level delete (rewrites a fork
    // file — the state change the merge must adopt)
    ManifestTable.write(Seq((11L, 110L)).toDF("id", "v"), bRoot)
    ManifestTable.deleteWhere(spark, bRoot, col("id") === 7L)
    // main line moves underneath with its own disjoint append
    ManifestTable.write(Seq((21L, 210L)).toDF("id", "v"), root)
    // without the flag: the fast-forward refusal names the escape
    val ff = intercept[Exception] {
      ManifestTable.publishBranch(spark, root, "feature")
    }
    assert(ff.getMessage.contains("non-fast-forward") &&
      ff.getMessage.contains("merge = true"))
    // with it: ONE commit carrying the branch delete + both appends
    ManifestTable.publishBranch(spark, root, "feature", merge = true)
    val want = ((1L to 10L).filterNot(_ == 7L) ++ Seq(11L, 21L)).sorted
      .map(i => Seq[Any](i, i * 10))
    assert(rows(ManifestTable.read(spark, root)) == want)
    // REBASE: the branch adopted the merged state, so continued
    // branch work fast-forwards WITHOUT dropping main's merged-in
    // rows (the silent-loss hazard a ref-only advance would create)
    ManifestTable.write(Seq((12L, 120L)).toDF("id", "v"), bRoot)
    ManifestTable.publishBranch(spark, root, "feature")
    val want2 = ((1L to 10L).filterNot(_ == 7L) ++ Seq(11L, 12L, 21L))
      .sorted.map(i => Seq[Any](i, i * 10))
    assert(rows(ManifestTable.read(spark, root)) == want2,
      "a post-merge fast-forward must retain main's merged-in files")
    // CONFLICT: both sides change the same row's FILE — refused with
    // both commit ranges named; main keeps its state
    ManifestTable.deleteWhere(spark, bRoot, col("id") === 1L)
    ManifestTable.merge(Seq((1L, 999L)).toDF("id", "v"), root, Seq("id"))
    val err = intercept[Exception] {
      ManifestTable.publishBranch(spark, root, "feature", merge = true)
    }
    assert(err.getMessage.contains("both changed file"),
      s"got: ${err.getMessage}")
    assert("""v\d+ -> v\d+""".r.findFirstIn(err.getMessage).nonEmpty &&
      err.getMessage.contains("now v"),
      s"both commits named: ${err.getMessage}")
    assert(ManifestTable.read(spark, root)
      .filter(col("id") === 1L).head().getLong(1) == 999L,
      "a refused merge must leave main untouched")
  }

  test("table group: an atomic fact+dim publish — group readers see both-or-neither; per-table heads move independently; crash replay converges") {
    import graft.sinks.TableGroup
    val d = java.nio.file.Files.createTempDirectory("graft-txn").toString
    val (fact, dim, grp) = (s"$d/fact", s"$d/dim", s"$d/grp")
    ManifestTable.create(
      Seq((1L, 10L, 100L), (2L, 20L, 50L)).toDF("id", "rid", "amount"),
      fact, Seq("id"))
    ManifestTable.create(
      Seq((10L, "west"), (20L, "east")).toDF("rid", "rname"),
      dim, Seq("rid"))
    TableGroup.create(spark, grp, Map("fact" -> fact, "dim" -> dim))
    def groupJoin() = TableGroup.read(spark, grp, "fact")
      .join(TableGroup.read(spark, grp, "dim"), "rid")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("rname"))).toSeq
    assert(groupJoin() == Seq((1L, "west"), (2L, "east")))
    // the paired write: a fact row joining a NEW dim row — visible
    // together or not at all
    ManifestTable.createBranch(spark, fact, "load")
    ManifestTable.createBranch(spark, dim, "load")
    ManifestTable.write(Seq((3L, 30L, 70L)).toDF("id", "rid", "amount"),
      ManifestTable.branchRoot(fact, "load"))
    ManifestTable.write(Seq((30L, "north")).toDF("rid", "rname"),
      ManifestTable.branchRoot(dim, "load"))
    // both branches written, NOTHING published: group readers (and
    // per-table readers) see the old pair
    assert(groupJoin() == Seq((1L, "west"), (2L, "east")))
    // CRASH SIMULATION: one member's branch published, the tuple NOT
    // advanced — a group reader must still see the consistent OLD
    // pair, never fact-with-a-danging-rid
    ManifestTable.publishBranch(spark, fact, "load")
    assert(ManifestTable.read(spark, fact).count() == 3,
      "per-table head moves the moment its own CAS lands")
    assert(groupJoin() == Seq((1L, "west"), (2L, "east")),
      "the group tuple is the consistency boundary")
    // the re-run converges: publishes the remaining member (the
    // already-published fact re-publishes idempotently by value) and
    // advances the tuple ONCE
    val gv = TableGroup.publishBranches(spark, grp, "load")
    assert(gv == 1L)
    assert(groupJoin() ==
      Seq((1L, "west"), (2L, "east"), (3L, "north")))
    // isolation going forward: a direct write to a member's head does
    // NOT leak into group reads until the next tuple commit
    ManifestTable.write(Seq((4L, 10L, 5L)).toDF("id", "rid", "amount"),
      fact)
    assert(groupJoin() ==
      Seq((1L, "west"), (2L, "east"), (3L, "north")))
    TableGroup.commit(spark, grp, Map("fact" ->
      ManifestTable.latestVersion(spark, fact))): Unit
    assert(groupJoin() ==
      Seq((1L, "west"), (2L, "east"), (3L, "north"), (4L, "west")))
    // contracts: unknown member, backward move, unknown branch
    intercept[Exception] {
      TableGroup.commit(spark, grp, Map("nope" -> 1L))
    }
    val back = intercept[Exception] {
      TableGroup.commit(spark, grp, Map("fact" -> 0L))
    }
    assert(back.getMessage.contains("backward"))
    val nob = intercept[Exception] {
      TableGroup.publishBranches(spark, grp, "ghost")
    }
    assert(nob.getMessage.contains("no member"))
  }

  test("branch publish carries the branch's schema evolution and constraints") {
    val root = freshRoot("wapevolve")
    ManifestTable.create(Seq((1L, "a")).toDF("id", "v"), root, Seq("id"))
    ManifestTable.createBranch(spark, root, "dev")
    val bRoot = ManifestTable.branchRoot(root, "dev")
    ManifestTable.addConstraint(spark, bRoot, "pos_id", "id > 0")
    ManifestTable.merge(Seq((2L, "b", 7L)).toDF("id", "v", "extra"),
      bRoot, Seq("id"), evolveSchema = true)
    val published = ManifestTable.publishBranch(spark, root, "dev")
    val sch = ManifestTable.tableSchema(spark, root, published)
    assert(sch.fieldNames.contains("extra"))
    assert(ManifestTable.constraintsAt(spark, root, published)
      .contains(("pos_id", "id > 0")))
    // the carried constraint GATES main's future writes
    intercept[Exception] {
      ManifestTable.write(Seq((-5L, "x", 0L)).toDF("id", "v", "extra"), root)
    }
    // pre-publish main versions keep their narrower schema
    assert(!ManifestTable.tableSchema(spark, root, 0L)
      .fieldNames.contains("extra"))
  }

  test("branch drop: unpublished branch reclaims fully; published files survive by main's refcount") {
    val root = freshRoot("bdrop")
    ManifestTable.create(
      (1L to 6L).map(i => (i, i)).toDF("id", "v"), root, Seq("id"))

    // unpublished: the whole branch dir goes
    ManifestTable.createBranch(spark, root, "scratch")
    ManifestTable.write(Seq((7L, 7L)).toDF("id", "v"),
      ManifestTable.branchRoot(root, "scratch"))
    ManifestTable.dropRef(spark, root, "scratch")
    assert(!new java.io.File(
      ManifestTable.branchRoot(root, "scratch")).exists())

    // published: data files main adopted BY REFERENCE survive the drop
    ManifestTable.createBranch(spark, root, "audit")
    val bRoot = ManifestTable.branchRoot(root, "audit")
    ManifestTable.write(Seq((8L, 8L)).toDF("id", "v"), bRoot)
    ManifestTable.publishBranch(spark, root, "audit")
    ManifestTable.dropRef(spark, root, "audit")
    // branch manifests are gone, but main reads the published rows
    assert(!new java.io.File(s"$bRoot/_manifests").exists())
    assert(rows(ManifestTable.read(spark, root)) ==
      ((1L to 6L) :+ 8L).map(i => Seq(i, i)))
    // once main's own history stops naming the leftovers, vacuum's
    // orphan sweep reclaims the branch remnants bottom-up
    ManifestTable.optimize(spark, root) // rewrites all files into main
    ManifestTable.vacuum(spark, root, keep = 1, ttlMs = 0L)
    assert(!new java.io.File(s"$root/_branches/audit").exists(),
      "orphaned branch remnants must reclaim once unreferenced")
    assert(rows(ManifestTable.read(spark, root)) ==
      ((1L to 6L) :+ 8L).map(i => Seq(i, i)))
  }

  test("refs listing and publish-time eq hygiene") {
    val root = freshRoot("reflist")
    ManifestTable.create(Seq((1L, "a")).toDF("id", "v"), root, Seq("id"))
    ManifestTable.createTag(spark, root, "t0")
    ManifestTable.createBranch(spark, root, "b0")
    assert(ManifestTable.listRefs(spark, root).map(_._1) == Seq("b0", "t0"))

    // a branch holding PENDING equality deletes refuses to publish —
    // seq reset would otherwise disorder the delete
    val bRoot = ManifestTable.branchRoot(root, "b0")
    ManifestTable.mergeEq(Seq((1L, "z")).toDF("id", "v"), bRoot, Seq("id"))
    val err = intercept[Exception] {
      ManifestTable.publishBranch(spark, root, "b0")
    }
    assert(err.getMessage.contains("pending equality deletes"))
    ManifestTable.compactEq(spark, bRoot)
    val v = ManifestTable.publishBranch(spark, root, "b0")
    assert(rows(ManifestTable.readVersion(spark, root, v)) ==
      Seq(Seq(1L, "z")))
  }
}
