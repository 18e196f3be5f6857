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

  private val JoinDefSql =
    "SELECT region_name, count(*) AS n, sum(amount) AS total " +
      "FROM __BASE__ f JOIN __DIM_regions__ r " +
      "ON f.region_id = r.region_id GROUP BY region_name"

  private def joinMvRows(mv: String): Seq[(String, Long, Long)] =
    ManifestTable.read(spark, mv).orderBy("region_name").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("join definitions: a dim-side-only change remaps fact rows to their new groups exactly") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvj").toString
    val (fact, dim, mv) = (s"$d/fact", s"$d/dim", s"$d/mv")
    ManifestTable.create(
      Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 30L))
        .toDF("doc", "region_id", "amount"), fact, Seq("region_id"))
    ManifestTable.create(
      Seq((10L, "west"), (20L, "east")).toDF("region_id", "region_name"),
      dim, Seq("region_id"))
    MaterializedView.create(spark, mv, fact, JoinDefSql,
      Seq("region_name"), dims = Seq(MaterializedView.JoinDim(
        "regions", dim, Seq("region_id"), Seq("region_id"))))
    assert(joinMvRows(mv) == Seq(("east", 1L, 30L), ("west", 2L, 150L)))
    // dim-side-only change: region 10 renames west→coast. The fact
    // never moved — the refresh must mark the OLD group (west, via
    // the removed dim row) and the NEW group (coast) through the join
    // keys, recompute both, and delete the vanished west
    ManifestTable.deleteWhere(spark, dim, col("region_id") === 10L)
    ManifestTable.write(
      Seq((10L, "coast")).toDF("region_id", "region_name"), dim)
    val Some((_, touched1)) = MaterializedView.refresh(spark, mv)
    assert(joinMvRows(mv) == Seq(("coast", 2L, 150L), ("east", 1L, 30L)))
    assert(touched1 == 2L, s"exactly west+coast recompute: $touched1")
    assert(MaterializedView.refresh(spark, mv).isEmpty,
      "both offsets advanced")
    // ONE refresh folding a dim update AND a fact append (the gate
    // shape): east renames north while a new fact row joins region 20
    ManifestTable.write(
      Seq((4L, 20L, 70L)).toDF("doc", "region_id", "amount"), fact)
    ManifestTable.deleteWhere(spark, dim, col("region_id") === 20L)
    ManifestTable.write(
      Seq((20L, "north")).toDF("region_id", "region_name"), dim)
    val Some((_, touched2)) = MaterializedView.refresh(spark, mv)
    assert(joinMvRows(mv) == Seq(("coast", 2L, 150L), ("north", 2L, 100L)))
    assert(touched2 == 2L, s"east+north, coast untouched: $touched2")
    // exactness against a full recompute of the definition
    val full = Seq((10L, "coast"), (20L, "north"))
      .toDF("region_id", "region_name")
      .join(Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 30L),
        (4L, 20L, 70L)).toDF("doc", "region_id", "amount"), "region_id")
      .groupBy("region_name")
      .agg(count("*").as("n"), sum("amount").as("total"))
      .orderBy("region_name").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(joinMvRows(mv) == full)
  }

  test("join definitions: fact-resident group keys with a dim FILTER — a dim flip recomputes the right fact groups") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvjf").toString
    val (fact, dim, mv) = (s"$d/fact", s"$d/dim", s"$d/mv")
    // groups live on the FACT (lang); the dim only gates rows — a
    // dim-side flip must still find the affected groups THROUGH the
    // join keys (fact rows joining the changed dim rows)
    ManifestTable.create(
      Seq((1L, "en", 10L, 5L), (2L, "en", 20L, 3L), (3L, "de", 10L, 7L))
        .toDF("doc", "lang", "src_id", "words"), fact, Seq("src_id"))
    ManifestTable.create(
      Seq((10L, true), (20L, true)).toDF("src_id", "active"),
      dim, Seq("src_id"))
    MaterializedView.create(spark, mv, fact,
      "SELECT lang, sum(words) AS w FROM __BASE__ f " +
        "JOIN __DIM_srcs__ s ON f.src_id = s.src_id " +
        "WHERE s.active GROUP BY lang",
      Seq("lang"), dims = Seq(MaterializedView.JoinDim(
        "srcs", dim, Seq("src_id"), Seq("src_id"))))
    def rows() = ManifestTable.read(spark, mv).orderBy("lang")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(rows() == Seq(("de", 7L), ("en", 8L)))
    // deactivate source 10: en loses doc 1 (5 words), de loses doc 3
    // entirely — the de GROUP must vanish from the view
    ManifestTable.deleteWhere(spark, dim, col("src_id") === 10L)
    ManifestTable.write(Seq((10L, false)).toDF("src_id", "active"), dim)
    val Some((_, t)) = MaterializedView.refresh(spark, mv)
    assert(rows() == Seq(("en", 3L)))
    assert(t == 2L, s"en and de recompute (both join src 10): $t")
  }

  test("broadcast size gate: a full-churn refresh past the key threshold falls back to shuffle semi joins and still lands exact") {
    // lower the gate to 0 so EVERY touched-key join takes the
    // shuffle-semi fallback — the degenerate regime where
    // broadcast(touched)/broadcast(pks) would otherwise pump a
    // table-sized key set through the driver. The refresh must
    // produce byte-identical content either way.
    val d = java.nio.file.Files.createTempDirectory("graft-mvgate").toString
    val (fact, dim, mv) = (s"$d/fact", s"$d/dim", s"$d/mv")
    ManifestTable.create(
      (1L to 200L).map(i => (i, i % 20, i * 3))
        .toDF("doc", "region_id", "amount"), fact, Seq("region_id"))
    ManifestTable.create(
      (0L until 20L).map(i => (i, s"r$i")).toDF("region_id", "region_name"),
      dim, Seq("region_id"))
    MaterializedView.create(spark, mv, fact, JoinDefSql,
      Seq("region_name"), dims = Seq(MaterializedView.JoinDim(
        "regions", dim, Seq("region_id"), Seq("region_id"))))
    spark.conf.set("spark.graft.mv.maxBroadcastKeys", "0")
    try {
      // full-table churn: every dim row relabels AND the fact doubles —
      // every group is touched, the worst case the gate exists for
      ManifestTable.deleteWhere(spark, dim, lit(true))
      ManifestTable.write(
        (0L until 20L).map(i => (i, s"R$i")).toDF("region_id", "region_name"),
        dim)
      ManifestTable.write(
        (201L to 400L).map(i => (i, i % 20, i * 3))
          .toDF("doc", "region_id", "amount"), fact)
      val Some((_, touched)) = MaterializedView.refresh(spark, mv)
      assert(touched == 40L, s"old 20 + new 20 labels touched: $touched")
      val expect = (0L until 20L).map { r =>
        val docs = (1L to 400L).filter(_ % 20 == r)
        (s"R$r", docs.size.toLong, docs.map(_ * 3).sum)
      }.sortBy(_._1)
      assert(joinMvRows(mv) == expect)
    } finally spark.conf.unset("spark.graft.mv.maxBroadcastKeys")
  }

  test("join definitions: crash idempotence and dim retention — rewound offsets converge; a vacuumed dim version refuses with re-create named") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvjx").toString
    val (fact, dim, mv) = (s"$d/fact", s"$d/dim", s"$d/mv")
    ManifestTable.create(
      Seq((1L, 10L, 100L), (2L, 20L, 50L))
        .toDF("doc", "rid", "amount"), fact, Seq("rid"))
    ManifestTable.create(
      Seq((10L, "west"), (20L, "east")).toDF("rid", "rname"),
      dim, Seq("rid"))
    MaterializedView.create(spark, mv, fact,
      "SELECT rname, sum(amount) AS total FROM __BASE__ f " +
        "JOIN __DIM_r__ s ON f.rid = s.rid GROUP BY rname",
      Seq("rname"), dims = Seq(MaterializedView.JoinDim(
        "r", dim, Seq("rid"), Seq("rid"))))
    ManifestTable.deleteWhere(spark, dim, col("rid") === 10L)
    ManifestTable.write(Seq((10L, "coast")).toDF("rid", "rname"), dim)
    ManifestTable.write(Seq((3L, 20L, 25L)).toDF("doc", "rid", "amount"),
      fact)
    MaterializedView.refresh(spark, mv): Unit
    def rows() = ManifestTable.read(spark, mv).orderBy("rname")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val settled = rows()
    assert(settled == Seq(("coast", 100L), ("east", 75L)))
    // crash between the view commit and the offset write: rewind BOTH
    // offsets (base line + the dim's) and refresh again — the same
    // recompute against the same versions lands the same values
    val st = java.nio.file.Paths.get(s"$mv/_mvdef/spec")
    val lines = java.nio.file.Files.readAllLines(st)
    lines.set(2, "0") // base offset
    val dimLine = lines.get(4).split('\t')
    dimLine(4) = "0" // dim offset
    lines.set(4, dimLine.mkString("\t"))
    java.nio.file.Files.write(st, lines)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$mv/_mvdef/.spec.crc")): Unit
    MaterializedView.refresh(spark, mv): Unit
    assert(rows() == settled,
      "a replayed refresh must converge to identical content")
    // a DIM vacuumed past the view's offset refuses like a lagged base
    java.nio.file.Files.write(st, lines) // rewind again
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$mv/_mvdef/.spec.crc")): Unit
    ManifestTable.write(Seq((30L, "north")).toDF("rid", "rname"), dim)
    ManifestTable.vacuum(spark, dim, keep = 1, ttlMs = 0L)
    val err = intercept[IllegalArgumentException] {
      MaterializedView.refresh(spark, mv)
    }
    assert(err.getMessage.contains("re-create") &&
      err.getMessage.contains("dim"))
  }

  test("join definitions: contracts — ambiguous and non-column group keys refuse at create") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvjc").toString
    val (fact, dim) = (s"$d/fact", s"$d/dim")
    ManifestTable.create(
      Seq((1L, 10L, "en")).toDF("doc", "rid", "name"), fact, Seq("rid"))
    ManifestTable.create(
      Seq((10L, "west")).toDF("rid", "name"), dim, Seq("rid"))
    // `name` lives on BOTH sides — the refresh could not derive or
    // restrict by it unqualified
    val amb = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv1", fact,
        "SELECT f.name, count(*) AS n FROM __BASE__ f " +
          "JOIN __DIM_r__ r ON f.rid = r.rid GROUP BY f.name",
        Seq("name"), dims = Seq(MaterializedView.JoinDim(
          "r", dim, Seq("rid"), Seq("rid"))))
    }
    assert(amb.getMessage.contains("ambiguous"))
    // a computed key is not a column of either side
    val expr = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv2", fact,
        "SELECT upper(f.name) AS label, count(*) AS n FROM __BASE__ f " +
          "JOIN __DIM_r__ r ON f.rid = r.rid GROUP BY upper(f.name)",
        Seq("label"), dims = Seq(MaterializedView.JoinDim(
          "r", dim, Seq("rid"), Seq("rid"))))
    }
    assert(expr.getMessage.contains("not a column"))
    // an undeclared placeholder refuses with the dim named
    val ref = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv3", fact,
        "SELECT doc, count(*) AS n FROM __BASE__ GROUP BY doc",
        Seq("doc"), dims = Seq(MaterializedView.JoinDim(
          "r", dim, Seq("rid"), Seq("rid"))))
    }
    assert(ref.getMessage.contains("never referenced"))
  }

  test("snowflake: a dim-of-dim relabel lifts through the chain — one refresh, exact vs full recompute") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvsf").toString
    val (fact, accts, teams, mv) =
      (s"$d/fact", s"$d/accts", s"$d/teams", s"$d/mv")
    // fact(doc, acct) → accts(acct, team) → teams(team, label)
    ManifestTable.create(
      Seq((1L, 10L, 5L), (2L, 10L, 3L), (3L, 11L, 7L), (4L, 12L, 2L))
        .toDF("doc", "acct", "words"), fact, Seq("acct"))
    ManifestTable.create(
      Seq((10L, 100L), (11L, 100L), (12L, 200L)).toDF("acct", "team"),
      accts, Seq("acct"))
    ManifestTable.create(
      Seq((100L, "alpha"), (200L, "beta")).toDF("team", "label"),
      teams, Seq("team"))
    MaterializedView.create(spark, mv, fact,
      "SELECT label, count(*) AS n, sum(words) AS w FROM __BASE__ f " +
        "JOIN __DIM_accts__ a ON f.acct = a.acct " +
        "JOIN __DIM_teams__ t ON a.team = t.team GROUP BY label",
      Seq("label"),
      dims = Seq(
        MaterializedView.JoinDim("accts", accts, Seq("acct"), Seq("acct")),
        MaterializedView.JoinDim("teams", teams, Seq("team"), Seq("team"),
          parent = Some("accts"))))
    def rows() = ManifestTable.read(spark, mv).orderBy("label")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows() == Seq(("alpha", 3L, 15L), ("beta", 1L, 2L)))
    // ONE refresh folding: team 100 relabels alpha→gamma (dim-of-dim
    // only — must lift teams.team → accts.acct → fact rows), an acct
    // MOVES teams (11 → 200: its fact rows change groups), and the
    // fact appends
    ManifestTable.deleteWhere(spark, teams, col("team") === 100L)
    ManifestTable.write(Seq((100L, "gamma")).toDF("team", "label"), teams)
    ManifestTable.merge(Seq((11L, 200L)).toDF("acct", "team"),
      accts, Seq("acct"))
    ManifestTable.write(Seq((5L, 12L, 9L)).toDF("doc", "acct", "words"),
      fact)
    val Some((_, touched)) = MaterializedView.refresh(spark, mv)
    // full recompute over the three final states is the truth
    assert(rows() == Seq(("beta", 3L, 18L), ("gamma", 2L, 8L)),
      s"touched=$touched")
    assert(MaterializedView.refresh(spark, mv).isEmpty)
  }

  test("expression keys: a date_trunc month bucket maintains incrementally as rows move across buckets") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvek").toString
    val (base, mv) = (s"$d/base", s"$d/mv")
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    ManifestTable.create(
      Seq((1L, t("2024-01-05 10:00:00"), 5L),
        (2L, t("2024-01-20 10:00:00"), 3L),
        (3L, t("2024-02-02 10:00:00"), 7L))
        .toDF("id", "ts", "v"), base, Seq("id"))
    MaterializedView.create(spark, mv, base,
      "SELECT date_trunc('month', ts) AS month, count(*) AS n, " +
        "sum(v) AS total FROM __BASE__ GROUP BY date_trunc('month', ts)",
      Seq("month"), keyExprs = Map("month" -> "date_trunc('month', ts)"))
    def rows() = ManifestTable.read(spark, mv).orderBy("month")
      .collect().toSeq
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
    assert(rows() == Seq(("2024-01-01 00:00:00.0", 2L, 8L),
      ("2024-02-01 00:00:00.0", 1L, 7L)))
    // row 2 MOVES from January to March (old bucket shrinks, new
    // bucket appears), February gains a row — one refresh
    ManifestTable.merge(
      Seq((2L, t("2024-03-15 10:00:00"), 3L)).toDF("id", "ts", "v"),
      base, Seq("id"))
    ManifestTable.write(
      Seq((4L, t("2024-02-28 10:00:00"), 1L)).toDF("id", "ts", "v"), base)
    val Some((_, touched)) = MaterializedView.refresh(spark, mv)
    assert(touched == 3L, s"jan, feb, mar touched: $touched")
    assert(rows() == Seq(("2024-01-01 00:00:00.0", 1L, 5L),
      ("2024-02-01 00:00:00.0", 2L, 8L),
      ("2024-03-01 00:00:00.0", 1L, 3L)))
    // January 2024 empties entirely → the bucket leaves the view
    ManifestTable.deleteWhere(spark, base, col("id") === 1L)
    MaterializedView.refresh(spark, mv): Unit
    assert(rows().map(_._1) ==
      Seq("2024-02-01 00:00:00.0", "2024-03-01 00:00:00.0"))
  }

  test("expression-key contracts: non-deterministic, unresolvable, shadowing and undeclared expressions refuse at create") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvec").toString
    val base = s"$d/base"
    ManifestTable.create(
      Seq((1L, 10L)).toDF("id", "v"), base, Seq("id"))
    val nondet = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv1", base,
        "SELECT rand() AS b, count(*) AS n FROM __BASE__ GROUP BY rand()",
        Seq("b"), keyExprs = Map("b" -> "rand()"))
    }
    assert(nondet.getMessage.contains("non-deterministic"))
    val unres = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv2", base,
        "SELECT nope + 1 AS b, count(*) AS n FROM __BASE__ GROUP BY nope + 1",
        Seq("b"), keyExprs = Map("b" -> "nope + 1"))
    }
    assert(unres.getMessage.contains("does not resolve"))
    val shadow = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv3", base,
        "SELECT v, count(*) AS n FROM __BASE__ GROUP BY v",
        Seq("v"), keyExprs = Map("v" -> "v"))
    }
    assert(shadow.getMessage.contains("shadows"))
    val undeclared = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv4", base,
        "SELECT id, count(*) AS n FROM __BASE__ GROUP BY id",
        Seq("id"), keyExprs = Map("other" -> "v + 1"))
    }
    assert(undeclared.getMessage.contains("not a declared group key"))
  }

  test("declared-join validation: a definition joining on DIFFERENT columns than declared refuses at create, naming the missing equality") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvjv").toString
    val (fact, dim) = (s"$d/fact", s"$d/dim")
    ManifestTable.create(
      Seq((1L, 10L, 20L)).toDF("doc", "rid", "nid"), fact, Seq("rid"))
    ManifestTable.create(
      Seq((10L, 20L, "west")).toDF("rid", "nid", "rname"),
      dim, Seq("rid"))
    // declared on rid but the SQL joins on nid — refresh would derive
    // touched groups through the wrong keys; must refuse at create
    val wrong = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv1", fact,
        "SELECT rname, count(*) AS n FROM __BASE__ f " +
          "JOIN __DIM_r__ s ON f.nid = s.nid GROUP BY rname",
        Seq("rname"), dims = Seq(MaterializedView.JoinDim(
          "r", dim, Seq("rid"), Seq("rid"))))
    }
    assert(wrong.getMessage.contains("rid = rid") &&
      wrong.getMessage.contains("no such equality"))
    // a dim read only through a scalar subquery is not a provable
    // equi-join — refuse naming the contract
    val sub = intercept[IllegalArgumentException] {
      MaterializedView.create(spark, s"$d/mv2", fact,
        "SELECT doc, (SELECT max(rname) FROM __DIM_r__) AS top, " +
          "count(*) AS n FROM __BASE__ GROUP BY doc, " +
          "(SELECT max(rname) FROM __DIM_r__)",
        Seq("doc"), dims = Seq(MaterializedView.JoinDim(
          "r", dim, Seq("rid"), Seq("rid"))))
    }
    assert(sub.getMessage.contains("direct relation"))
    // EXTRA equalities beyond the declared pair are fine (they only
    // shrink the real join — the declared derivation stays a superset)
    MaterializedView.create(spark, s"$d/mv3", fact,
      "SELECT rname, count(*) AS n FROM __BASE__ f " +
        "JOIN __DIM_r__ s ON f.rid = s.rid AND f.nid = s.nid " +
        "GROUP BY rname",
      Seq("rname"), dims = Seq(MaterializedView.JoinDim(
        "r", dim, Seq("rid"), Seq("rid")))): Unit
  }

  private def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.name
    }

  test("transparent rewrite: a matching aggregate over the base reads the FRESH view, stands down when stale, resumes after refresh") {
    val d = java.nio.file.Files.createTempDirectory("graft-mvrw").toString
    val (fact, dim, mv) = (s"$d/fact", s"$d/dim", s"$d/mv")
    ManifestTable.create(
      Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 30L))
        .toDF("doc", "region_id", "amount"), fact, Seq("region_id"))
    ManifestTable.create(
      Seq((10L, "west"), (20L, "east")).toDF("region_id", "region_name"),
      dim, Seq("region_id"))
    MaterializedView.create(spark, mv, fact, JoinDefSql,
      Seq("region_name"), dims = Seq(MaterializedView.JoinDim(
        "regions", dim, Seq("region_id"), Seq("region_id"))))
    MaterializedView.enableRewrite(spark, mv)
    try {
      def userQuery(): org.apache.spark.sql.DataFrame = {
        ManifestTable.read(spark, fact).createOrReplaceTempView("rw_f")
        ManifestTable.read(spark, dim).createOrReplaceTempView("rw_d")
        spark.sql(
          "SELECT region_name, count(*) AS n, sum(amount) AS total " +
            "FROM rw_f f JOIN rw_d r ON f.region_id = r.region_id " +
            "GROUP BY region_name")
      }
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("region_name").collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // fresh at create: the plan must read the VIEW, not the base —
      // and the executed scan must touch no base file
      val q1 = userQuery()
      assert(scanRoots(q1).exists(_.contains("/mv")),
        s"expected the view to serve: ${scanRoots(q1)}")
      assert(!scanRoots(q1).exists(_.contains("/fact")))
      assert(q1.queryExecution.executedPlan.toString.contains("/mv"))
      assert(rows(q1) == Seq(("east", 1L, 30L), ("west", 2L, 150L)))
      // base moves → the view is STALE → the match fails by version
      // and the direct scan answers (never a stale view)
      ManifestTable.write(
        Seq((4L, 20L, 70L)).toDF("doc", "region_id", "amount"), fact)
      val q2 = userQuery()
      assert(!scanRoots(q2).exists(_.contains("/mv")),
        s"a stale view must not serve: ${scanRoots(q2)}")
      assert(rows(q2) == Seq(("east", 2L, 100L), ("west", 2L, 150L)))
      // refresh catches the view up → the rewrite resumes
      MaterializedView.refresh(spark, mv): Unit
      val q3 = userQuery()
      assert(scanRoots(q3).exists(_.contains("/mv")))
      assert(rows(q3) == Seq(("east", 2L, 100L), ("west", 2L, 150L)))
      // a DIFFERENT aggregate over the same base must not match
      ManifestTable.read(spark, fact).createOrReplaceTempView("rw_f")
      val other = spark.sql(
        "SELECT region_id, count(*) AS n FROM rw_f GROUP BY region_id")
      assert(!scanRoots(other).exists(_.contains("/mv")))
      // disable → the same matching query scans the base again
      MaterializedView.disableRewrite(spark, mv)
      assert(!scanRoots(userQuery()).exists(_.contains("/mv")))
    } finally {
      MaterializedView.disableRewrite(spark, mv)
      spark.catalog.dropTempView("rw_f"): Unit
      spark.catalog.dropTempView("rw_d"): Unit
    }
  }

  test("transparent rewrite: plain (non-join) definitions with a WHERE match too, and an ORDER BY above the aggregate survives") {
    val (base, mv) = fresh("mvrw2")
    ManifestTable.create(baseRows(Seq(
      (1L, "en", 100L), (2L, "en", 50L), (3L, "de", 5L), (4L, "de", 30L))),
      base, Seq("doc", "lang"))
    MaterializedView.create(spark, mv, base, DefSql, Seq("lang"))
    MaterializedView.enableRewrite(spark, mv)
    try {
      ManifestTable.read(spark, base).createOrReplaceTempView("rw_b")
      val q = spark.sql(
        "SELECT lang, count(*) AS n, sum(chars) AS total, " +
          "min(doc) AS first_doc, max(chars) AS max_chars " +
          "FROM rw_b WHERE chars >= 10 GROUP BY lang ORDER BY lang")
      assert(scanRoots(q).exists(_.contains("/mv")),
        s"rewrite under ORDER BY: ${scanRoots(q)}")
      assert(q.collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
        == Seq(("de", 1L), ("en", 2L)))
    } finally {
      MaterializedView.disableRewrite(spark, mv)
      spark.catalog.dropTempView("rw_b"): Unit
    }
  }

  test("transparent rewrite: column SUBSETS and reorders of the definition are served; foreign aliases and foreign aggregates stand down") {
    val (base, mv) = fresh("mvrw3")
    ManifestTable.create(baseRows(Seq(
      (1L, "en", 100L), (2L, "en", 50L), (3L, "de", 30L))),
      base, Seq("doc", "lang"))
    MaterializedView.create(spark, mv, base, DefSql, Seq("lang"))
    MaterializedView.enableRewrite(spark, mv)
    try {
      ManifestTable.read(spark, base).createOrReplaceTempView("rw_s")
      // a SUBSET of the view's columns, in a DIFFERENT order
      val sub = spark.sql(
        "SELECT sum(chars) AS total, lang FROM rw_s " +
          "WHERE chars >= 10 GROUP BY lang")
      assert(scanRoots(sub).exists(_.contains("/mv")),
        s"subset+reorder must serve: ${scanRoots(sub)}")
      assert(sub.orderBy("lang").collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))) ==
        Seq((30L, "de"), (150L, "en")))
      // same expression under a FOREIGN alias: the view's column
      // names are the contract — stands down, answers directly
      val alias = spark.sql(
        "SELECT lang, count(*) AS how_many FROM rw_s " +
          "WHERE chars >= 10 GROUP BY lang")
      assert(!scanRoots(alias).exists(_.contains("/mv")))
      assert(alias.orderBy("lang").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1))) ==
        Seq(("de", 1L), ("en", 2L)))
      // an aggregate the view does not carry: stands down
      val foreign = spark.sql(
        "SELECT lang, avg(chars) AS n FROM rw_s " +
          "WHERE chars >= 10 GROUP BY lang")
      assert(!scanRoots(foreign).exists(_.contains("/mv")))
    } finally {
      MaterializedView.disableRewrite(spark, mv)
      spark.catalog.dropTempView("rw_s"): Unit
    }
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
