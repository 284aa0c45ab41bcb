package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** Merge-on-read UPDATE and MERGE (write.update.mode / write.merge.mode
  * = merge-on-read): a row-delta commit — position deletes (or merged
  * DVs) for replaced rows plus appended new versions — with ZERO data
  * files rewritten, identical query results to the CoW path, changelog
  * expressibility, and v3 row-lineage preservation.
  */
class MorDmlSpec extends SparkSpec {

  private def freshCat(name: String): String = {
    val wh = java.nio.file.Files
      .createTempDirectory(s"graft-mor-$name").toString
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.connector.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  private def dataFiles(t: GraftTable): Set[String] =
    t.liveEntries().filter(_.isData).map(_.path).toSet
  private def deleteEntries(t: GraftTable) =
    t.liveEntries().filter(e => e.content == 1 || e.content == 2)

  test("MoR UPDATE: row delta, zero data files rewritten") {
    val wh = freshCat("mu")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mu.db")
    spark.sql("""CREATE TABLE mu.db.t (k BIGINT, grp STRING, v DOUBLE)
      TBLPROPERTIES('write.update.mode'='merge-on-read')""")
    spark.sql("INSERT INTO mu.db.t SELECT id, concat('g', id % 3), " +
      "CAST(id AS DOUBLE) FROM range(900)")
    val t = GraftTable.load(spark,
      java.nio.file.Paths.get(wh, "db", "t").toString)
    val before = dataFiles(t)
    assert(before.nonEmpty)

    spark.sql("UPDATE mu.db.t SET v = v * 10, grp = 'hot' " +
      "WHERE k % 100 = 7")
    val t2 = GraftTable.load(spark, t.location)
    // every pre-update data file SURVIVES (no rewrite); the commit only
    // added delete file(s) + new-version file(s)
    assert(before.subsetOf(dataFiles(t2)),
      "MoR UPDATE rewrote data files")
    assert(deleteEntries(t2).nonEmpty, "no delete files committed")
    assert(t2.metadata.currentSnapshot.get.summary.other
      .get("row-delta").contains("true"))

    // results match the logical update exactly
    val got = spark.sql("SELECT k, grp, v FROM mu.db.t " +
      "WHERE k % 100 = 7 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == (7L until 900L by 100L)
      .map(k => (k, "hot", k * 10.0)))
    assert(spark.sql("SELECT COUNT(*) FROM mu.db.t").head.getLong(0)
      == 900L)
    // untouched rows unchanged
    assert(spark.sql("SELECT grp, v FROM mu.db.t WHERE k = 8").head
      .toSeq == Seq("g2", 8.0))

    // the commit is changelog-expressible: the updated row appears as
    // delete(old) + insert(new) in the SAME commit
    val snaps = t2.metadata.snapshots.get.sortBy(_.sequenceNumber)
    val ch = t2.changes(snaps.head.snapshotId, snaps.last.snapshotId)
      .filter(col("k") === 7)
      .select("_change_type", "grp", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(ch == Set(("delete", "g1", 7.0), ("insert", "hot", 70.0)),
      s"changelog mismatch: $ch")
  }

  test("MoR MERGE: all three action kinds, zero data files rewritten") {
    val wh = freshCat("mm")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mm.db")
    spark.sql("""CREATE TABLE mm.db.t (k BIGINT, v DOUBLE, tag STRING)
      TBLPROPERTIES('write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO mm.db.t SELECT id, CAST(id AS DOUBLE), 'old' " +
      "FROM range(500)")
    val t = GraftTable.load(spark,
      java.nio.file.Paths.get(wh, "db", "t").toString)
    val before = dataFiles(t)

    spark.sql("""SELECT * FROM VALUES
        (10L, 111.0), (20L, 222.0),   -- matched, updated
        (30L, -1.0),                  -- matched, deleted (cond below)
        (1000L, 5.0), (1001L, 6.0)    -- not matched, inserted
      AS s(k, nv)""").createOrReplaceTempView("mm_src")
    spark.sql("""MERGE INTO mm.db.t t USING mm_src s ON t.k = s.k
      WHEN MATCHED AND s.nv < 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.nv, tag = 'upd'
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.nv, 'ins')""")

    val t2 = GraftTable.load(spark, t.location)
    assert(before.subsetOf(dataFiles(t2)), "MoR MERGE rewrote data files")
    assert(t2.metadata.currentSnapshot.get.summary.other
      .get("row-delta").contains("true"))

    assert(spark.sql("SELECT COUNT(*) FROM mm.db.t").head.getLong(0)
      == 501L) // 500 - 1 deleted + 2 inserted ... minus nothing else
    val touched = spark.sql("SELECT k, v, tag FROM mm.db.t " +
      "WHERE k IN (10, 20, 30, 1000, 1001) ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(touched == Seq((10L, 111.0, "upd"), (20L, 222.0, "upd"),
      (1000L, 5.0, "ins"), (1001L, 6.0, "ins")), touched.toString)
    // untouched row untouched
    assert(spark.sql("SELECT v, tag FROM mm.db.t WHERE k = 11").head
      .toSeq == Seq(11.0, "old"))

    // NOT MATCHED BY SOURCE actions
    spark.sql("""MERGE INTO mm.db.t t USING mm_src s ON t.k = s.k
      WHEN NOT MATCHED BY SOURCE AND t.k >= 498 AND t.k < 500 THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND t.k < 2 THEN UPDATE SET tag = 'nms'""")
    val t3 = GraftTable.load(spark, t.location)
    assert(before.subsetOf(dataFiles(t3)))
    assert(spark.sql("SELECT COUNT(*) FROM mm.db.t").head.getLong(0)
      == 499L)
    assert(spark.sql("SELECT tag FROM mm.db.t WHERE k = 1").head
      .getString(0) == "nms")
    // matched rows (k=10) kept: no matched actions in this merge
    assert(spark.sql("SELECT v FROM mm.db.t WHERE k = 10").head
      .getDouble(0) == 111.0)
  }

  test("MoR UPDATE under deletion-vectors keeps one DV per file") {
    val wh = freshCat("mdv")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mdv.db")
    spark.sql("""CREATE TABLE mdv.db.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES('write.update.mode'='merge-on-read',
        'write.delete.mode'='merge-on-read',
        'write.delete.format'='deletion-vectors')""")
    spark.sql("INSERT INTO mdv.db.t SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(400)")
    val t = GraftTable.load(spark,
      java.nio.file.Paths.get(wh, "db", "t").toString)
    val before = dataFiles(t)

    spark.sql("UPDATE mdv.db.t SET v = -1 WHERE k < 10")
    spark.sql("UPDATE mdv.db.t SET v = -2 WHERE k >= 10 AND k < 20")
    val t2 = GraftTable.load(spark, t.location)
    assert(before.subsetOf(dataFiles(t2)))
    // DV invariant survives repeated MoR updates: ≤ 1 vector per file
    val dvs = deleteEntries(t2).filter(_.dv.isDefined)
    assert(dvs.nonEmpty, "expected deletion vectors")
    val perFile = dvs.groupBy(_.dv.get.dataFile).map(_._2.size)
    assert(perFile.forall(_ == 1), s"multiple DVs per file: $perFile")

    val got = spark.sql(
      "SELECT SUM(v) FROM mdv.db.t WHERE k < 20").head.getDouble(0)
    assert(got == 10 * -1.0 + 10 * -2.0)
    assert(spark.sql("SELECT COUNT(*) FROM mdv.db.t").head.getLong(0)
      == 400L)
  }

  test("MoR UPDATE preserves v3 row lineage") {
    val wh = freshCat("mlin")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mlin.db")
    spark.sql("""CREATE TABLE mlin.db.t (k BIGINT, v DOUBLE)
      TBLPROPERTIES('write.update.mode'='merge-on-read',
        'graft.row-lineage'='true')""")
    spark.sql("INSERT INTO mlin.db.t SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(100)")
    val t = GraftTable.load(spark,
      java.nio.file.Paths.get(wh, "db", "t").toString)
    val idsBefore = t.scanWithLineage().select(col("k"),
      col(GraftTable.RowIdCol).as("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    spark.sql("UPDATE mlin.db.t SET v = v + 1000 WHERE k IN (5, 50)")
    val t2 = GraftTable.load(spark, t.location)
    val after = t2.scanWithLineage().select(col("k"), col("v"),
      col(GraftTable.RowIdCol).as("rid"),
      col(GraftTable.LastUpdCol).as("seq")).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2),
        r.getLong(3)))).toMap
    // updated rows keep their _row_id and advance their last-updated
    // sequence to the update commit's; untouched rows keep both
    val updSeq = t2.metadata.currentSnapshot.get.sequenceNumber
    assert(after(5L)._1 == 1005.0 && after(5L)._2 == idsBefore(5L) &&
      after(5L)._3 == updSeq, after(5L).toString)
    assert(after(50L)._2 == idsBefore(50L) && after(50L)._3 == updSeq)
    assert(after(7L) == ((7.0, idsBefore(7L), 1L)))
  }

  test("MERGE cardinality violation: multiply-matched target row errors " +
      "on both CoW and MoR paths") {
    freshCat("mcv")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mcv.db")
    for ((name, mode) <- Seq(("cw", "copy-on-write"),
        ("mr", "merge-on-read"))) {
      spark.sql(s"""CREATE TABLE mcv.db.$name (k BIGINT, v DOUBLE)
        TBLPROPERTIES('write.merge.mode'='$mode')""")
      spark.sql(s"INSERT INTO mcv.db.$name VALUES (1, 1.0), (2, 2.0)")
      // source holds TWO rows with k=1: target row 1 matches both —
      // silent behavior would duplicate the row (CoW) or double-delete
      // its position (MoR); SQL requires an error
      spark.sql("SELECT * FROM VALUES (1L, 10.0), (1L, 20.0), (3L, 30.0) " +
        "AS s(k, nv)").createOrReplaceTempView("mcv_src")
      val e = intercept[Exception](spark.sql(
        s"""MERGE INTO mcv.db.$name t USING mcv_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)"""
          .stripMargin))
      assert(e.getMessage.contains("cardinality") ||
        Option(e.getCause).exists(_.getMessage.contains("cardinality")),
        s"$mode: ${e.getMessage}")
      // table unchanged after the refused merge
      assert(spark.sql(s"SELECT COUNT(*) FROM mcv.db.$name")
        .head.getLong(0) == 2L)
      // a deduplicated source merges fine
      spark.sql("SELECT * FROM VALUES (1L, 10.0), (3L, 30.0) " +
        "AS s(k, nv)").createOrReplaceTempView("mcv_src_ok")
      spark.sql(
        s"""MERGE INTO mcv.db.$name t USING mcv_src_ok s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)"""
          .stripMargin)
      assert(spark.sql(s"SELECT SUM(v) FROM mcv.db.$name")
        .head.getDouble(0) == 42.0)
    }
  }

  test("engine parity: MoR merge result equals CoW merge result") {
    val wh = freshCat("mp")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mp.db")
    for ((name, mode) <- Seq(("cw", "copy-on-write"),
        ("mr", "merge-on-read"))) {
      spark.sql(s"""CREATE TABLE mp.db.$name (k BIGINT, v DOUBLE)
        TBLPROPERTIES('write.merge.mode'='$mode')""")
      spark.sql(s"INSERT INTO mp.db.$name SELECT id, CAST(id AS DOUBLE) " +
        "FROM range(300)")
      spark.sql("SELECT id * 2 AS k, CAST(id AS DOUBLE) AS nv " +
        "FROM range(200)").createOrReplaceTempView("mp_src")
      spark.sql(s"""MERGE INTO mp.db.$name t USING mp_src s ON t.k = s.k
        WHEN MATCHED AND s.nv > 150 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.nv * 10
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, -s.nv)""")
    }
    val cw = spark.sql("SELECT k, v FROM mp.db.cw ORDER BY k").collect()
    val mr = spark.sql("SELECT k, v FROM mp.db.mr ORDER BY k").collect()
    assert(cw.sameElements(mr),
      s"CoW and MoR merges disagree: ${cw.length} vs ${mr.length} rows")
    // and only the MoR table kept all its original data files
    val tmr = GraftTable.load(spark,
      java.nio.file.Paths.get(wh, "db", "mr").toString)
    assert(tmr.metadata.currentSnapshot.get.summary.other
      .get("row-delta").contains("true"))
  }
}
