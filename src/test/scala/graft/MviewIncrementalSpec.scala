package graft

import org.apache.spark.sql.Row

/** Incremental materialized-view refresh: after a small base delta, the
  * refresh must scan O(delta) base rows (changelog files of the new
  * commits only — never a full base re-scan), merge per-key aggregate
  * state, and produce EXACTLY the rows a full recompute would — across
  * MoR AND copy-on-write deltas (CoW net changes are derived by the
  * changelog). Fallback paths (out-of-band MV writes, forced-full
  * property, non-incrementable definitions, expired range) must
  * recompute and still be correct.
  */
class MviewIncrementalSpec extends SparkSpec {

  private def freshCat(name: String): String = {
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft-mvi-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.connector.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  private def refresh(cat: String, view: String): Row =
    spark.sql(s"CALL $cat.system.refresh_mview('$view')").head

  private def marker(mvDir: java.nio.file.Path)
      : com.fasterxml.jackson.databind.JsonNode =
    graft.model.Json.parse(java.nio.file.Files.readString(
      mvDir.resolve("mvstate").resolve("refresh.json")))

  test("refresh after a small append is incremental and scans O(delta)") {
    val wh = freshCat("mvi")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvi.db")
    spark.sql("""CREATE TABLE mvi.db.ord (k BIGINT, grp STRING,
      amt DOUBLE) TBLPROPERTIES('write.delete.mode'='merge-on-read',
      'write.update.mode'='merge-on-read')""")
    // a "large" base: 2000 rows over 4 groups
    spark.range(2000).selectExpr("id AS k",
      "concat('g', id % 4) AS grp", "CAST(id AS DOUBLE) / 10 AS amt")
      .createOrReplaceTempView("ord_src")
    spark.sql("INSERT INTO mvi.db.ord SELECT * FROM ord_src")

    spark.sql("""CREATE MATERIALIZED VIEW mvi.db.mv AS
      SELECT grp, COUNT(*) AS n, round(SUM(amt), 4) AS total,
        round(AVG(amt), 4) AS mean
      FROM mvi.db.ord WHERE k >= 100 GROUP BY grp""")

    def expected: Seq[Row] = spark.sql(
      """SELECT grp, COUNT(*) AS n, round(SUM(amt), 4) AS total,
        round(AVG(amt), 4) AS mean
      FROM mvi.db.ord WHERE k >= 100 GROUP BY grp ORDER BY grp""")
      .collect().toSeq
    def got: Seq[Row] = spark.sql(
      "SELECT grp, n, total, mean FROM mvi.db.mv ORDER BY grp")
      .collect().toSeq
    assert(got == expected, "create-time materialization mismatch")

    // the CREATE bootstrapped state + watermark: no-change refresh no-ops
    val noop = refresh("mvi", "db.mv")
    assert(noop.getString(2) == "noop", s"expected noop, got $noop")

    // base files before the delta — the incremental refresh must not
    // read ANY of them again
    val mvDir = java.nio.file.Paths.get(wh, "db", "mv")
    val baseT = graft.table.GraftTable.load(spark,
      java.nio.file.Paths.get(wh, "db", "ord").toString)
    val preDeltaFiles = baseT.liveEntries().map(_.path).toSet
    val wm0 = marker(mvDir).path("watermark").asLong()

    // small delta: 10 appended rows (one filtered out by the WHERE)
    spark.sql("""INSERT INTO mvi.db.ord VALUES
      (50, 'g0', 1.0),
      (3000, 'g0', 5.5), (3001, 'g1', 6.5), (3002, 'g2', 7.5),
      (3003, 'g3', 8.5), (3004, 'g0', 9.5), (3005, 'g1', 0.5),
      (3006, 'g2', 2.5), (3007, 'g3', 3.5), (3008, 'g0', 4.5)""")

    val r = refresh("mvi", "db.mv")
    assert(r.getString(2) == "incremental",
      s"expected incremental refresh, got $r")
    assert(r.getLong(3) == 10L,
      s"delta must be the 10 appended rows, got ${r.getLong(3)}")
    assert(got == expected, "post-incremental-refresh mismatch")

    // O(delta) evidence: the changelog range the refresh consumed reads
    // ONLY files committed after the watermark — zero pre-delta files
    val snap = baseT.metadata.currentSnapshotId.get
    val deltaInputs = baseT.changesBySeq(wm0, snap).inputFiles.toSet
    assert(deltaInputs.nonEmpty)
    assert(deltaInputs.intersect(preDeltaFiles).isEmpty,
      "incremental refresh re-read pre-delta base files")

    // MoR DELETE (changelog-expressible): groups adjust; a key below the
    // filter threshold is a no-op for the MV
    spark.sql("DELETE FROM mvi.db.ord WHERE k IN (3000, 3004, 3008, 50)")
    val r2 = refresh("mvi", "db.mv")
    assert(r2.getString(2) == "incremental", s"got $r2")
    assert(got == expected, "post-delete incremental refresh mismatch")

    // a group deleted to zero rows must DROP OUT of the MV
    spark.sql("DELETE FROM mvi.db.ord WHERE grp = 'g3'")
    val r3 = refresh("mvi", "db.mv")
    assert(r3.getString(2) == "incremental", s"got $r3")
    assert(got == expected, "emptied group must vanish")
    assert(!got.exists(_.getString(0) == "g3"))

    // MoR UPDATE commits a row delta (delete old + insert new in ONE
    // commit) — the changelog expresses it, so the refresh STAYS
    // incremental across updates and adjusts both sides per key
    spark.sql("UPDATE mvi.db.ord SET amt = amt + 100 WHERE k % 500 = 3")
    val r4 = refresh("mvi", "db.mv")
    assert(r4.getString(2) == "incremental", s"got $r4")
    assert(got == expected, "post-MoR-update incremental refresh mismatch")

    // COPY-ON-WRITE delete + update: the changelog derives their net
    // changes from the dropped-vs-added file diff, so the refresh stays
    // incremental across CoW commits too (pre-r19 this forced full)
    spark.sql("""ALTER TABLE mvi.db.ord SET TBLPROPERTIES(
      'write.delete.mode'='copy-on-write',
      'write.update.mode'='copy-on-write')""")
    spark.sql("DELETE FROM mvi.db.ord WHERE k IN (3001, 3005)")
    spark.sql("UPDATE mvi.db.ord SET amt = amt + 7 WHERE k % 400 = 1")
    val r5 = refresh("mvi", "db.mv")
    assert(r5.getString(2) == "incremental",
      s"CoW delta must stay incremental: $r5")
    assert(got == expected, "post-CoW incremental refresh mismatch")
  }

  test("fallbacks: out-of-band writes, forced full, joins; CoW stays " +
      "incremental") {
    val wh = freshCat("mvf")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvf.db")
    // default delete mode = copy-on-write: the changelog DERIVES the
    // commit's net changes, so the refresh stays incremental (pre-r19
    // this was the forced-full case)
    spark.sql("CREATE TABLE mvf.db.t (k BIGINT, grp STRING)")
    spark.sql("INSERT INTO mvf.db.t SELECT id, concat('g', id % 3) " +
      "FROM range(300)")
    spark.sql("CREATE MATERIALIZED VIEW mvf.db.mv AS " +
      "SELECT grp, COUNT(*) AS n FROM mvf.db.t GROUP BY grp")
    def got: Map[String, Long] = spark.sql(
      "SELECT grp, n FROM mvf.db.mv").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap

    spark.sql("DELETE FROM mvf.db.t WHERE k < 30") // CoW commit
    val r = refresh("mvf", "db.mv")
    assert(r.getString(2) == "incremental",
      s"CoW delta must stay incremental: $r")
    assert(got == Map("g0" -> 90L, "g1" -> 90L, "g2" -> 90L))

    // ... and the full fallback re-seeded the state: the next
    // append-only delta is incremental again
    spark.sql("INSERT INTO mvf.db.t VALUES (1000, 'g0')")
    val r2 = refresh("mvf", "db.mv")
    assert(r2.getString(2) == "incremental", s"got $r2")
    assert(got("g0") == 91L)

    // out-of-band write to the MV table: watermark snapshot mismatch →
    // full recompute, never a silent wrong merge
    spark.range(1).selectExpr("'gX' AS grp", "id AS n")
      .write.format("graft").mode("append")
      .save(java.nio.file.Paths.get(wh, "db", "mv").toString)
    spark.sql("INSERT INTO mvf.db.t VALUES (1001, 'g1')")
    val r3 = refresh("mvf", "db.mv")
    assert(r3.getString(2) == "full", s"out-of-band must force full: $r3")
    assert(got == Map("g0" -> 91L, "g1" -> 91L, "g2" -> 90L))

    // property opt-out: graft.mview.refresh=full forces full every time
    spark.sql("ALTER VIEW mvf.db.mv SET TBLPROPERTIES " +
      "('graft.mview.refresh'='full')")
    spark.sql("INSERT INTO mvf.db.t VALUES (1002, 'g2')")
    val r4 = refresh("mvf", "db.mv")
    assert(r4.getString(2) == "full", s"property must force full: $r4")
    assert(got("g2") == 91L)

    // non-incrementable definition (join): always full, always correct
    spark.sql("CREATE TABLE mvf.db.d (grp STRING, w DOUBLE)")
    spark.sql("INSERT INTO mvf.db.d VALUES ('g0', 2.0), ('g1', 3.0)")
    spark.sql("""CREATE MATERIALIZED VIEW mvf.db.mvj AS
      SELECT t.grp, COUNT(*) * MAX(d.w) AS score
      FROM mvf.db.t t JOIN mvf.db.d d ON t.grp = d.grp
      GROUP BY t.grp""")
    val r5 = refresh("mvf", "db.mvj")
    assert(r5.getString(2) == "full", s"join must be full: $r5")
    val score = spark.sql(
      "SELECT grp, score FROM mvf.db.mvj ORDER BY grp").collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(score == Map("g0" -> 182.0, "g1" -> 273.0))
  }

  test("expired base snapshots inside the refresh range force full") {
    val wh = freshCat("mvg")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvg.db")
    spark.sql("CREATE TABLE mvg.db.t (k BIGINT, grp STRING)")
    spark.sql("INSERT INTO mvg.db.t SELECT id, concat('g', id % 3) " +
      "FROM range(300)")
    spark.sql("CREATE MATERIALIZED VIEW mvg.db.mv AS " +
      "SELECT grp, COUNT(*) AS n FROM mvg.db.t GROUP BY grp")
    def got: Map[String, Long] = spark.sql(
      "SELECT grp, n FROM mvg.db.mv").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap

    // two append-only commits since the watermark, then expire the
    // FIRST of them out of the base's retained history: the delta for
    // (watermark, head] is unrecoverable — the refresh must detect the
    // gap and recompute instead of committing a silently short MV
    spark.sql("INSERT INTO mvg.db.t VALUES (1000, 'g0')")
    spark.sql("INSERT INTO mvg.db.t VALUES (1001, 'g1')")
    val baseT = graft.table.GraftTable.load(spark,
      java.nio.file.Paths.get(wh, "db", "t").toString)
    baseT.expireSnapshots(keepLast = 1)
    assert(baseT.metadata.snapshots.get.size == 1)
    val r = refresh("mvg", "db.mv")
    assert(r.getString(2) == "full",
      s"expired range must force full, got $r")
    assert(got == Map("g0" -> 101L, "g1" -> 101L, "g2" -> 100L))

    // the full fallback re-seeded state at the new head: a retained
    // append-only delta refreshes incrementally again
    spark.sql("INSERT INTO mvg.db.t VALUES (1002, 'g2')")
    val r2 = refresh("mvg", "db.mv")
    assert(r2.getString(2) == "incremental", s"got $r2")
    assert(got("g2") == 101L)
  }

  test("MIN/MAX maintain incrementally on appends, fall back on deletes") {
    freshCat("mvx")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvx.db")
    spark.sql("""CREATE TABLE mvx.db.t (grp STRING, x DOUBLE)
      TBLPROPERTIES('write.delete.mode'='merge-on-read')""")
    spark.sql("INSERT INTO mvx.db.t SELECT concat('g', id % 3), " +
      "CAST(id AS DOUBLE) FROM range(300)")
    spark.sql("""CREATE MATERIALIZED VIEW mvx.db.mv AS
      SELECT grp, COUNT(*) AS n, MIN(x) AS lo, MAX(x) AS hi
      FROM mvx.db.t GROUP BY grp""")
    def both: (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = (
      spark.sql("SELECT grp, n, lo, hi FROM mvx.db.mv ORDER BY grp")
        .collect().toSeq,
      spark.sql("""SELECT grp, COUNT(*) AS n, MIN(x) AS lo, MAX(x) AS hi
        FROM mvx.db.t GROUP BY grp ORDER BY grp""").collect().toSeq)
    val (g0, e0) = both
    assert(g0 == e0)

    // append-only delta: extremes on both sides move, stays incremental
    spark.sql("INSERT INTO mvx.db.t VALUES ('g0', -5.0), ('g1', 999.0), " +
      "('g2', 100.5)")
    val r = refresh("mvx", "db.mv")
    assert(r.getString(2) == "incremental", s"got $r")
    val (g1, e1) = both
    assert(g1 == e1, s"$g1 vs $e1")
    assert(g1.find(_.getString(0) == "g0").get.getDouble(2) == -5.0)
    assert(g1.find(_.getString(0) == "g1").get.getDouble(3) == 999.0)

    // a delta with DELETE rows cannot maintain extremes — full fallback,
    // still exactly right (the deleted maximum must disappear)
    spark.sql("DELETE FROM mvx.db.t WHERE x = 999.0")
    val r2 = refresh("mvx", "db.mv")
    assert(r2.getString(2) == "full", s"deletes must force full: $r2")
    val (g2, e2) = both
    assert(g2 == e2, s"$g2 vs $e2")
    assert(g2.find(_.getString(0) == "g1").get.getDouble(3) < 999.0)

    // ... and the full fallback re-seeded state: appends incremental again
    spark.sql("INSERT INTO mvx.db.t VALUES ('g2', -77.0)")
    val r3 = refresh("mvx", "db.mv")
    assert(r3.getString(2) == "incremental", s"got $r3")
    val (g3, e3) = both
    assert(g3 == e3)
    assert(g3.find(_.getString(0) == "g2").get.getDouble(2) == -77.0)
  }

  test("count/sum/avg null handling matches a full recompute") {
    freshCat("mvn")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mvn.db")
    spark.sql("""CREATE TABLE mvn.db.t (grp STRING, x DOUBLE)
      TBLPROPERTIES('write.delete.mode'='merge-on-read')""")
    // g1 has nulls mixed in; g2 is ALL null (SUM/AVG null, COUNT(x) 0)
    spark.sql("""INSERT INTO mvn.db.t VALUES
      ('g1', 1.5), ('g1', NULL), ('g1', 2.5),
      ('g2', NULL), ('g2', NULL)""")
    spark.sql("""CREATE MATERIALIZED VIEW mvn.db.mv AS
      SELECT grp, COUNT(*) AS rows, COUNT(x) AS vals,
        SUM(x) AS s, AVG(x) AS a
      FROM mvn.db.t GROUP BY grp""")
    def both: (Seq[Row], Seq[Row]) = (
      spark.sql("SELECT grp, rows, vals, s, a FROM mvn.db.mv " +
        "ORDER BY grp").collect().toSeq,
      spark.sql("""SELECT grp, COUNT(*) AS rows, COUNT(x) AS vals,
          SUM(x) AS s, AVG(x) AS a
        FROM mvn.db.t GROUP BY grp ORDER BY grp""").collect().toSeq)
    val (g0, e0) = both
    assert(g0 == e0, s"create: $g0 vs $e0")

    // delta adds a first non-null to g2 and more nulls everywhere
    spark.sql("""INSERT INTO mvn.db.t VALUES
      ('g1', NULL), ('g2', 4.0), ('g2', NULL), ('g3', NULL)""")
    val r = refresh("mvn", "db.mv")
    assert(r.getString(2) == "incremental", s"got $r")
    val (g1, e1) = both
    assert(g1 == e1, s"after insert: $g1 vs $e1")

    // delete the only non-null in g2: SUM/AVG must return to NULL while
    // the group itself survives (rows > 0)
    spark.sql("DELETE FROM mvn.db.t WHERE x = 4.0")
    val r2 = refresh("mvn", "db.mv")
    assert(r2.getString(2) == "incremental", s"got $r2")
    val (g2, e2) = both
    assert(g2 == e2, s"after delete: $g2 vs $e2")
    val g2row = g2.find(_.getString(0) == "g2").get
    assert(g2row.getLong(2) == 0L && g2row.isNullAt(3) && g2row.isNullAt(4))
  }
}
