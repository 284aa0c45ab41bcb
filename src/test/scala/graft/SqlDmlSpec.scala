package graft

import graft.table.{GraftTable, MergeDelete, MergeInsert, MergeUpdate}
import org.apache.spark.sql.functions._

/** SQL row-level DML through the catalog: DELETE FROM (native
  * SupportsDeleteV2), UPDATE and MERGE INTO (GraftSparkSessionExtensions
  * rewriting onto the engine's CoW mutations), plus the engine-level
  * updateWhere / mergeApply semantics they delegate to.
  */
class SqlDmlSpec extends SparkSpec {

  private lazy val wh = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dml-wh").toString
    spark.conf.set("spark.sql.catalog.gdml", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdml.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdml.db")
    dir
  }

  private def freshTable(name: String): String = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS gdml.db.$name")
    spark.sql(
      s"""CREATE TABLE gdml.db.$name (
         |  id BIGINT, grp STRING, qty DOUBLE
         |) PARTITIONED BY (bucket(4, id))""".stripMargin)
    import spark.implicits._
    (1L to 100L).map(i => (i, if (i % 2 == 0) "even" else "odd", i.toDouble))
      .toDF("id", "grp", "qty").createOrReplaceTempView(s"src_$name")
    spark.sql(s"INSERT INTO gdml.db.$name SELECT * FROM src_$name")
    name
  }

  test("DELETE FROM routes merge-on-read tables to MoR / deletion vectors") {
    val t = freshTable("delmor")
    val loc = s"$wh/db/$t"
    spark.sql(s"ALTER TABLE gdml.db.$t SET TBLPROPERTIES (" +
      "'write.delete.mode' = 'merge-on-read')")
    val g = GraftTable.load(spark, loc)
    val filesBefore = g.planFiles().map(_.path).toSet
    spark.sql(s"DELETE FROM gdml.db.$t WHERE id <= 10")
    assert(spark.table(s"gdml.db.$t").count() == 90)
    val g1 = GraftTable.load(spark, loc)
    assert(g1.planFiles().map(_.path).toSet == filesBefore,
      "MoR SQL DELETE must not rewrite data files")
    val dels1 = g1.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries)
    assert(dels1.nonEmpty && dels1.forall(_.dv.isEmpty),
      "expected parquet position deletes")
    // switch the format to deletion vectors: the same SQL now vectors
    spark.sql(s"ALTER TABLE gdml.db.$t SET TBLPROPERTIES (" +
      "'write.delete.format' = 'deletion-vectors')")
    spark.sql(s"DELETE FROM gdml.db.$t WHERE id > 90")
    assert(spark.table(s"gdml.db.$t").count() == 80)
    val g2 = GraftTable.load(spark, loc)
    assert(g2.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries).exists(_.dv.isDefined),
      "expected deletion-vector entries after the format switch")
    assert(g2.planFiles().map(_.path).toSet == filesBefore)
  }

  test("DELETE FROM deletes exactly the matching rows") {
    val t = freshTable("del")
    spark.sql(s"DELETE FROM gdml.db.$t WHERE qty <= 20 AND grp = 'odd'")
    val left = spark.sql(s"SELECT count(*) AS n, sum(qty) AS s FROM gdml.db.$t").head()
    assert(left.getLong(0) == 90)
    assert(left.getDouble(1) == (1L to 100L).map(_.toDouble).sum - (1 to 20 by 2).sum)
    // delete on a missing-table surfaces the standard analysis error
    val err = intercept[Exception] {
      spark.sql("DELETE FROM gdml.db.nope WHERE qty = 1") }
    assert(err.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      err.getMessage.toLowerCase.contains("not found"))
  }

  test("UPDATE applies assignments to matching rows only") {
    val t = freshTable("upd")
    spark.sql(
      s"UPDATE gdml.db.$t SET qty = qty * 2, grp = 'boosted' WHERE id > 90")
    val out = spark.sql(
      s"""SELECT grp, count(*) AS n, sum(qty) AS s FROM gdml.db.$t
         |GROUP BY grp ORDER BY grp""".stripMargin).collect()
    val boosted = out.find(_.getString(0) == "boosted").get
    assert(boosted.getLong(1) == 10)
    assert(boosted.getDouble(2) == (91 to 100).map(_ * 2.0).sum)
    // untouched rows keep their values
    assert(out.map(_.getLong(1)).sum == 100)
    assert(spark.sql(s"SELECT sum(qty) FROM gdml.db.$t WHERE id <= 90")
      .head().getDouble(0) == (1 to 90).map(_.toDouble).sum)
  }

  test("MERGE INTO: conditional delete, update, insert") {
    val t = freshTable("mrg")
    import spark.implicits._
    // source: ids 51..150, qty = id * 10
    (51L to 150L).map(i => (i, "src", i * 10.0))
      .toDF("id", "grp", "qty").createOrReplaceTempView("mrg_src")
    spark.sql(
      s"""MERGE INTO gdml.db.$t t USING mrg_src s ON t.id = s.id
         |WHEN MATCHED AND s.qty > 900 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET qty = s.qty + t.qty
         |WHEN NOT MATCHED AND s.id <= 140 THEN INSERT *
         |""".stripMargin)
    // ids 1..50 untouched; 51..90 updated to 11*id; 91..100 deleted
    // (s.qty>900); 101..140 inserted (id*10); 141..150 not inserted
    val rows = spark.sql(s"SELECT id, grp, qty FROM gdml.db.$t ORDER BY id")
      .collect()
    assert(rows.length == 50 + 40 + 40)
    assert(rows.take(50).forall(r => r.getDouble(2) == r.getLong(0).toDouble))
    assert(rows.slice(50, 90).forall(r =>
      r.getDouble(2) == r.getLong(0) * 11.0))
    assert(!rows.exists(r => r.getLong(0) > 90 && r.getLong(0) <= 100))
    assert(rows.drop(90).forall(r =>
      r.getLong(0) > 100 && r.getLong(0) <= 140 &&
        r.getDouble(2) == r.getLong(0) * 10.0 && r.getString(1) == "src"))
  }

  test("MERGE INTO: not-matched-by-source actions touch target-only rows") {
    val t = freshTable("mrgnbs")
    import spark.implicits._
    (1L to 30L).map(i => (i, "s", 0.0)).toDF("id", "grp", "qty")
      .createOrReplaceTempView("mrgnbs_src")
    spark.sql(
      s"""MERGE INTO gdml.db.$t t USING mrgnbs_src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET grp = 'kept'
         |WHEN NOT MATCHED BY SOURCE AND t.id > 95 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET grp = 'stale'
         |""".stripMargin)
    val byGrp = spark.sql(
      s"SELECT grp, count(*) FROM gdml.db.$t GROUP BY grp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp == Map("kept" -> 30L, "stale" -> 65L))
  }

  test("partition-aligned DELETE drops whole files without reading them") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-dropfile").toString + "/t"
    val df = (1L to 100L).map(i => (i, (i % 4).toString, i.toDouble))
      .toDF("id", "part", "v")
    val t = GraftTable.create(spark, loc, df.schema,
      partitionBy = Seq(("part", graft.model.TIdentity, "part_p")))
    t.append(df, repartitionByPartition = true)
    val before = t.planFiles().map(_.path).toSet
    // destroy the partition's data files on disk: only a metadata-only
    // drop can delete it without failing
    val victims = t.planFiles(Some(col("part") === "3")).map(_.path)
    assert(victims.nonEmpty)
    victims.foreach(p =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(p)))
    val snap = t.deleteWhere(col("part") === "3")
    assert(snap.summary.other("dropped-files").toInt == victims.size)
    assert(snap.summary.other("rewritten-files").toInt == 0)
    val after = t.planFiles().map(_.path).toSet
    assert(after == before -- victims)
    assert(t.scan().count() == 75)
    // a NON-aligned delete still rewrites (mid-partition predicate)
    val snap2 = t.deleteWhere(col("id") <= 2)
    assert(snap2.summary.other("rewritten-files").toInt > 0)
    assert(t.scan().count() == 75 - df.filter(col("id") <= 2 &&
      col("part") =!= "3").count())
  }

  test("ALTER TABLE ADD COLUMN ... DEFAULT backfills and fills inserts") {
    val t = freshTable("defaults")
    spark.sql(
      s"ALTER TABLE gdml.db.$t ADD COLUMN tier STRING DEFAULT 'standard'")
    // existing rows read the default (metadata-only backfill)
    assert(spark.sql(
      s"SELECT COUNT(*) FROM gdml.db.$t WHERE tier = 'standard'")
      .head().getLong(0) == 100L)
    // an INSERT omitting the column gets the default; explicit wins
    spark.sql(s"INSERT INTO gdml.db.$t (id, grp, qty) VALUES " +
      "(101, 'odd', 101.0)")
    spark.sql(s"INSERT INTO gdml.db.$t VALUES " +
      "(102, 'even', 102.0, 'gold')")
    val byTier = spark.sql(
      s"SELECT tier, COUNT(*) n FROM gdml.db.$t GROUP BY tier")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTier == Map("standard" -> 101L, "gold" -> 1L))
    // typed default on a numeric column
    spark.sql(
      s"ALTER TABLE gdml.db.$t ADD COLUMN score INT DEFAULT 7")
    assert(spark.sql(
      s"SELECT COUNT(*) FROM gdml.db.$t WHERE score = 7")
      .head().getLong(0) == 102L)
    // metadata MIN/MAX pushdown stays CORRECT under defaults: old files
    // carry no stats for score, so they land in the boundary-scan set,
    // which projects the default — the engine-wide extreme includes it
    spark.sql(s"INSERT INTO gdml.db.$t VALUES " +
      "(103, 'odd', 103.0, 'x', 100)")
    val mm = spark.sql(
      s"SELECT MIN(score), MAX(score) FROM gdml.db.$t").head()
    assert(mm.getInt(0) == 7 && mm.getInt(1) == 100,
      s"defaulted MIN/MAX wrong: $mm")
  }

  test("ALTER COLUMN TYPE promotes; old files read through; narrowing refuses") {
    val t = freshTable("promo")
    spark.sql(s"ALTER TABLE gdml.db.$t ADD COLUMN n INT")
    spark.sql(s"INSERT INTO gdml.db.$t VALUES " +
      "(200, 'even', 200.0, 2000000000)")
    spark.sql(s"ALTER TABLE gdml.db.$t ALTER COLUMN n TYPE BIGINT")
    assert(spark.table(s"gdml.db.$t").schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    // a value beyond int range lands in the promoted column
    spark.sql(s"INSERT INTO gdml.db.$t VALUES " +
      "(201, 'odd', 201.0, 9000000000)")
    // filtered scan across MIXED files: the int-typed file's bounds
    // must compare correctly against the long predicate
    val got = spark.sql(s"SELECT id FROM gdml.db.$t " +
      "WHERE n >= 2000000000 ORDER BY id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(200L, 201L), got.mkString(","))
    assert(spark.sql(s"SELECT COUNT(*) FROM gdml.db.$t WHERE n IS NULL")
      .head.getLong(0) == 100L)
    // narrowing refuses at Spark's own analyzer (double -> float is not
    // an up-cast) — defense above the catalog
    val err = intercept[Exception] {
      spark.sql(s"ALTER TABLE gdml.db.$t ALTER COLUMN qty TYPE FLOAT") }
    assert(err.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      err.getMessage)
    // long -> double IS a Spark up-cast but NOT an Iceberg promotion:
    // the catalog's own guard must refuse it
    val errL = intercept[Exception] {
      spark.sql(s"ALTER TABLE gdml.db.$t ALTER COLUMN n TYPE DOUBLE") }
    assert(errL.getMessage.contains("illegal type promotion"),
      errL.getMessage)
    // prove the decimal-widening arm too
    spark.sql(s"ALTER TABLE gdml.db.$t ADD COLUMN price DECIMAL(9,2)")
    spark.sql(s"INSERT INTO gdml.db.$t VALUES " +
      "(202, 'even', 202.0, 1, 1234567.89)")
    spark.sql(
      s"ALTER TABLE gdml.db.$t ALTER COLUMN price TYPE DECIMAL(18,2)")
    spark.sql(s"INSERT INTO gdml.db.$t VALUES " +
      "(203, 'odd', 203.0, 2, 9876543210987654.32)")
    val prices = spark.sql(s"SELECT price FROM gdml.db.$t " +
      "WHERE price IS NOT NULL ORDER BY price").collect()
      .map(_.getDecimal(0).toPlainString)
    assert(prices.toSeq == Seq("1234567.89", "9876543210987654.32"))
    // scale change passes Spark's up-cast check but is not an Iceberg
    // promotion — the catalog's guard refuses
    val err2 = intercept[Exception] {
      spark.sql(
        s"ALTER TABLE gdml.db.$t ALTER COLUMN price TYPE DECIMAL(20,4)") }
    assert(err2.getMessage.contains("illegal type promotion"),
      err2.getMessage)
  }

  test("nested-column DDL through SQL: add/rename/drop inside a struct") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdml.db.nest")
    spark.sql("""CREATE TABLE gdml.db.nest
      (id BIGINT, s STRUCT<a: INT, b: STRING>)""")
    spark.sql("INSERT INTO gdml.db.nest VALUES " +
      "(1, named_struct('a', 10, 'b', 'x'))")
    // add INSIDE the struct: old files' structs null-fill the new field
    spark.sql("ALTER TABLE gdml.db.nest ADD COLUMN s.c DOUBLE")
    spark.sql("INSERT INTO gdml.db.nest VALUES " +
      "(2, named_struct('a', 20, 'b', 'y', 'c', 2.5))")
    val r1 = spark.sql(
      "SELECT id, s.a, s.c FROM gdml.db.nest ORDER BY id").collect()
    assert(r1.map(_.getInt(1)).toSeq == Seq(10, 20))
    assert(r1(0).isNullAt(2) && r1(1).getDouble(2) == 2.5)
    // rename inside the struct: field id stable, old rows keep serving
    spark.sql("ALTER TABLE gdml.db.nest RENAME COLUMN s.a TO a2")
    val r2 = spark.sql(
      "SELECT s.a2 FROM gdml.db.nest ORDER BY id").collect()
    assert(r2.map(_.getInt(0)).toSeq == Seq(10, 20))
    // drop inside the struct
    spark.sql("ALTER TABLE gdml.db.nest DROP COLUMN s.b")
    val fields = spark.table("gdml.db.nest").schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(fields.toSeq == Seq("a2", "c"), fields.mkString(","))
    assert(spark.sql("SELECT COUNT(*) FROM gdml.db.nest")
      .head.getLong(0) == 2L)
  }

  test("ALTER COLUMN nullability and SET/DROP DEFAULT through SQL") {
    wh
    spark.sql("DROP TABLE IF EXISTS gdml.db.nn")
    spark.sql(
      "CREATE TABLE gdml.db.nn (id BIGINT NOT NULL, v DOUBLE, g STRING)")
    spark.sql("INSERT INTO gdml.db.nn VALUES (1, 1.0, 'a')")
    // required -> optional is a metadata-only relaxation
    spark.sql("ALTER TABLE gdml.db.nn ALTER COLUMN id DROP NOT NULL")
    assert(spark.table("gdml.db.nn").schema("id").nullable)
    // optional -> required would assert a fact about written rows no
    // metadata commit can establish — Spark's analyzer already refuses
    // (and the engine's setColumnNullability guards the direct API)
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE gdml.db.nn ALTER COLUMN v SET NOT NULL") }
    assert(err.getMessage.contains("non-nullable"), err.getMessage)
    val errEng = intercept[IllegalArgumentException] {
      GraftTable.load(spark, s"$wh/db/nn")
        .setColumnNullability("v", nullable = false) }
    assert(errEng.getMessage.contains("required"))
    // SET DEFAULT on an EXISTING column: future omitting inserts fill,
    // existing rows are untouched (v3 write-default, not initial)
    spark.sql("ALTER TABLE gdml.db.nn ALTER COLUMN g SET DEFAULT 'zz'")
    spark.sql("INSERT INTO gdml.db.nn (id, v) VALUES (2, 2.0)")
    // DROP DEFAULT: later omitting inserts go back to null
    spark.sql("ALTER TABLE gdml.db.nn ALTER COLUMN g DROP DEFAULT")
    spark.sql("INSERT INTO gdml.db.nn (id, v) VALUES (3, 3.0)")
    val gs = spark.sql("SELECT g FROM gdml.db.nn ORDER BY id").collect()
      .map(r => Option(r.getString(0)))
    assert(gs.toSeq == Seq(Some("a"), Some("zz"), None), gs.mkString(","))
  }

  test("CALL register_table adopts an external Iceberg layout") {
    import spark.implicits._
    wh
    val srcLoc = java.nio.file.Files
      .createTempDirectory("regsrc").toString + "/t"
    val df = (1L to 50L).map(i => (i, i.toDouble)).toDF("id", "v")
    val t = GraftTable.create(spark, srcLoc, df.schema)
    t.append(df)
    val layout = java.nio.file.Files
      .createTempDirectory("reglayout").toString
    graft.table.IcebergInterop.exportTable(t, layout)
    val out = spark.sql(
      s"CALL gdml.system.register_table('db.reg', '$layout')").head
    assert(out.getLong(1) >= 1L, s"no data files adopted: $out")
    // visible and queryable through the catalog, metadata-only adoption
    assert(spark.sql("SELECT COUNT(*) FROM gdml.db.reg")
      .head.getLong(0) == 50L)
    // fully live: native SQL mutations land on the adopted table
    spark.sql("INSERT INTO gdml.db.reg VALUES (100, 100.0)")
    spark.sql("DELETE FROM gdml.db.reg WHERE id <= 10")
    assert(spark.sql("SELECT COUNT(*) FROM gdml.db.reg")
      .head.getLong(0) == 41L)
    // an existing name refuses instead of clobbering
    val err = intercept[Exception] {
      spark.sql(
        s"CALL gdml.system.register_table('db.reg', '$layout')").collect() }
    assert(err.getMessage.contains("already exists"), err.getMessage)
    // multi-table publish needs a single commit authority: a FILE-mode
    // catalog cannot make it atomic and must refuse, not approximate
    val err2 = intercept[Exception] {
      spark.sql(
        "CALL gdml.system.publish_transaction('db.reg', 'x')").collect() }
    assert(err2.getMessage.contains("REST catalog"), err2.getMessage)
  }

  test("SQL time travel and TRUNCATE through the catalog") {
    val t = freshTable("tt")
    val loc = s"$wh/db/$t"
    val g = GraftTable.load(spark, loc)
    val v1 = g.metadata.currentSnapshotId.get
    g.createTag("before_del", v1)
    spark.sql(s"DELETE FROM gdml.db.$t WHERE id > 50")
    assert(spark.sql(s"SELECT count(*) FROM gdml.db.$t").head().getLong(0) == 50)
    // VERSION AS OF snapshot id and ref name both see the pre-delete rows
    assert(spark.sql(
      s"SELECT count(*) FROM gdml.db.$t VERSION AS OF $v1")
      .head().getLong(0) == 100)
    assert(spark.sql(
      s"SELECT count(*) FROM gdml.db.$t VERSION AS OF 'before_del'")
      .head().getLong(0) == 100)
    // TIMESTAMP AS OF the first snapshot's commit time
    val ts1 = g.metadata.snapshots.get.find(_.snapshotId == v1).get.timestampMs
    val tsLit = java.time.Instant.ofEpochMilli(ts1)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
    assert(spark.sql(
      s"SELECT count(*) FROM gdml.db.$t TIMESTAMP AS OF '$tsLit'")
      .head().getLong(0) == 100)
    // bad version fails loudly
    val err = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM gdml.db.$t VERSION AS OF 999999").collect() }
    assert(err.getMessage.contains("999999"))
    // TRUNCATE TABLE (TruncatableTable via SupportsDeleteV2)
    spark.sql(s"TRUNCATE TABLE gdml.db.$t")
    assert(spark.sql(s"SELECT count(*) FROM gdml.db.$t").head().getLong(0) == 0)
  }

  test("CALL procedures: tag, rollback, compact, expire, orphans") {
    val t = freshTable("proc")
    val loc = s"$wh/db/$t"
    val g = GraftTable.load(spark, loc)
    val v1 = g.metadata.currentSnapshotId.get
    // tag the current snapshot by default, then mutate and roll back
    val tagged = spark.sql(
      s"CALL gdml.system.create_tag(`table` => 'db.$t', name => 'keep')")
      .head()
    assert(tagged.getString(0) == "keep" && tagged.getLong(1) == v1)
    spark.sql(s"DELETE FROM gdml.db.$t WHERE id > 10")
    assert(spark.table(s"gdml.db.$t").count() == 10)
    val rolled = spark.sql(
      s"CALL gdml.system.rollback_to_snapshot('db.$t', $v1)").head()
    assert(rolled.getLong(0) == v1)
    assert(spark.table(s"gdml.db.$t").count() == 100)
    // compaction through CALL commits a new snapshot
    val compacted = spark.sql(
      s"CALL gdml.system.compact('db.$t', ${256L << 20})").head()
    assert(compacted.getLong(0) != v1)
    // branch via CALL
    val br = spark.sql(
      s"CALL gdml.system.create_branch('db.$t', 'wip', $v1)").head()
    assert(br.getString(0) == "wip" && br.getLong(1) == v1)
    // expire everything but the latest (tagged/branched snapshots stay)
    spark.sql(s"CALL gdml.system.expire_snapshots('db.$t', 1)").head()
    assert(GraftTable.load(spark, loc).metadata.refs.get.keySet
      .intersect(Set("keep", "wip")) == Set("keep", "wip"))
    // orphan cleanup runs (nothing eligible under a 1h cutoff)
    assert(spark.sql(
      s"CALL gdml.system.remove_orphan_files('db.$t', ${3600L * 1000})")
      .head().getLong(0) == 0L)
    // metadata-only manifest consolidation through CALL
    spark.sql(
      s"INSERT INTO gdml.db.$t VALUES (201, 'x', 1.0), (202, 'y', 2.0)")
    val rw = spark.sql(
      s"CALL gdml.system.rewrite_manifests('db.$t')").head()
    assert(rw.getLong(0) >= 2 && rw.getLong(1) >= 1)
    assert(spark.table(s"gdml.db.$t").count() == 102)
    // unknown table fails loudly
    intercept[Exception] {
      spark.sql("CALL gdml.system.compact('db.nope')").collect() }
  }

  test("CALL compact strategies: sort and zorder full rewrites") {
    val t = freshTable("sortz")
    // scatter rows across several commits so the rewrite has real work
    spark.sql(s"INSERT INTO gdml.db.$t SELECT id + 100, grp, qty " +
      s"FROM src_$t")
    val sorted = spark.sql(
      s"CALL gdml.system.compact('db.$t', ${64L << 20}, 'sort', 'id')")
      .head()
    assert(sorted.getLong(1) >= 2, "expected a multi-file rewrite")
    assert(spark.table(s"gdml.db.$t").count() == 200)
    // every rewritten file is internally ordered on the sort column
    val paths = spark.sql(s"SELECT file_path FROM gdml.db.$t.files")
      .collect().map(_.getString(0))
    assert(paths.nonEmpty && paths.length <= 4) // one per live bucket
    paths.foreach { pth =>
      val ids = spark.read.parquet(pth).select("id")
        .collect().map(_.getLong(0))
      assert(ids.toSeq == ids.sorted.toSeq, s"$pth is not sorted")
    }

    // zorder: unpartitioned two-dimension table rewrites into one file
    // whose row order follows the range-scaled interleave
    spark.sql("DROP TABLE IF EXISTS gdml.db.zgrid")
    spark.sql("CREATE TABLE gdml.db.zgrid (x BIGINT, y BIGINT)")
    spark.sql("INSERT INTO gdml.db.zgrid " +
      "SELECT pmod(hash(id), 16), pmod(hash(id * 7), 16) " +
      "FROM range(256) AS r(id)")
    val z = spark.sql(
      s"CALL gdml.system.compact('db.zgrid', ${64L << 20}, 'zorder', " +
        "'x,y')").head()
    assert(z.getLong(1) >= 1)
    val zPaths = spark.sql("SELECT file_path FROM gdml.db.zgrid.files")
      .collect().map(_.getString(0))
    assert(zPaths.length == 1, s"expected one rewritten file: $zPaths")
    // fixed 16-byte interleave: hex strings compare like unsigned bytes
    val zs = spark.read.parquet(zPaths.head)
      .select(hex(graft.functions.ZOrder.zorderScaled(
        col("x"), 0, 15, col("y"), 0, 15)).as("z"))
      .collect().map(_.getString(0))
    assert(zs.zip(zs.drop(1)).forall { case (a, b) => a <= b },
      "file rows do not follow z-order")
    // THREE-column z-order through the same CALL (N-ary interleave)
    spark.sql("DROP TABLE IF EXISTS gdml.db.zcube")
    spark.sql("CREATE TABLE gdml.db.zcube (x BIGINT, y BIGINT, w BIGINT)")
    spark.sql("INSERT INTO gdml.db.zcube " +
      "SELECT pmod(hash(id), 16), pmod(hash(id * 7), 16), " +
      "pmod(hash(id * 13), 16) FROM range(256) AS r(id)")
    val z3 = spark.sql(
      s"CALL gdml.system.compact('db.zcube', ${64L << 20}, 'zorder', " +
        "'x,y,w')").head()
    assert(z3.getLong(1) >= 1)
    val z3Paths = spark.sql("SELECT file_path FROM gdml.db.zcube.files")
      .collect().map(_.getString(0))
    assert(z3Paths.length == 1, s"expected one rewritten file: $z3Paths")
    val z3s = spark.read.parquet(z3Paths.head)
      .select(hex(graft.functions.ZOrder.zorderScaledN(Seq(
        (col("x"), 0L, 15L), (col("y"), 0L, 15L), (col("w"), 0L, 15L))))
        .as("z"))
      .collect().map(_.getString(0))
    assert(z3s.zip(z3s.drop(1)).forall { case (a, b) => a <= b },
      "file rows do not follow 3-dim z-order")
    // the strategy knob rejects nonsense loudly
    intercept[Exception] { spark.sql(
      s"CALL gdml.system.compact('db.$t', 1, 'shuffle', '')").collect() }
  }

  test("incremental re-cluster: concurrent appends survive the multi-commit rewrite") {
    import spark.implicits._
    val t = freshTable("increc")
    // several commits → several files per bucket, real group count
    spark.sql(s"INSERT INTO gdml.db.$t SELECT id + 100, grp, qty FROM src_$t")
    spark.sql(s"INSERT INTO gdml.db.$t SELECT id + 200, grp, qty FROM src_$t")
    val g = GraftTable.load(spark, s"$wh/db/$t")
    val filesBefore = g.liveEntries().count(_.isData)
    assert(filesBefore >= 8)
    // appends racing the re-cluster: each group commit must rebase over
    // them (reused manifests), never conflict them away
    val appender = new Thread(() => {
      (0 until 3).foreach { k =>
        g.append((1000L + k * 10 to 1009L + k * 10)
          .map(i => (i, "new", i.toDouble)).toDF("id", "grp", "qty"))
        Thread.sleep(30)
      }
    })
    appender.start()
    // group_bytes=1 → every file its own group → one commit per file
    val snaps = g.compactIncremental(Seq(col("id")), maxGroupBytes = 1L)
    appender.join(60000)
    assert(snaps.size >= filesBefore / 2,
      s"expected a multi-commit re-cluster, got ${snaps.size} commits")
    snaps.foreach(s => assert(s.summary.operation.contains("replace")))
    // every original row AND every concurrently appended row survived
    val g2 = GraftTable.load(spark, s"$wh/db/$t")
    assert(g2.scan().count() == 300 + 30)
    assert(g2.scan().filter(col("grp") === "new").count() == 30)
    assert(g2.scan().agg(sum(col("id"))).head().getLong(0) ==
      (1L to 300L).sum + (1000L to 1029L).sum)
    // the re-clustered files are internally sorted on id
    g2.liveEntries().filter(e => e.isData)
      .filter(e => snaps.map(_.snapshotId).contains(e.snapshotId))
      .foreach { e =>
        val ids = spark.read.parquet(e.path).select("id")
          .collect().map(_.getLong(0))
        assert(ids.toSeq == ids.sorted.toSeq, s"${e.path} unsorted")
      }
    // the CALL surface drives the same path
    val r = spark.sql(
      s"CALL gdml.system.compact('db.$t', ${64L << 20}, 'sort', 'id', 1)")
      .head()
    assert(r.getLong(1) >= 1L)
    assert(GraftTable.load(spark, s"$wh/db/$t").scan().count() == 330)
  }

  test("CALL set_sort_order: subsequent INSERTs cluster within files") {
    val t = freshTable("sortddl")
    val oid = spark.sql(
      s"CALL gdml.system.set_sort_order('db.$t', 'id')").head().getLong(0)
    assert(oid == 1L)
    // scattered insert order; bucket partitioning spreads across files
    spark.sql(s"INSERT INTO gdml.db.$t " +
      "SELECT pmod(id * 613, 1000), 'g', 1.0 FROM range(500)")
    val g = GraftTable.load(spark, s"$wh/db/$t")
    val snap = g.metadata.currentSnapshotId.get
    val newFiles = spark.sql(
      s"SELECT file_path FROM gdml.db.$t.files " +
        s"WHERE added_snapshot_id = $snap")
      .collect().map(_.getString(0))
    assert(newFiles.nonEmpty)
    newFiles.foreach { p =>
      val ids = spark.read.parquet(p).select("id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"$p not clustered after set_sort_order")
    }
  }

  test("CALL convert_equality_deletes restores metadata-only counting") {
    import spark.implicits._
    val t = freshTable("eqproc")
    val g = GraftTable.load(spark, s"$wh/db/$t")
    g.deleteWhereEq((1L to 10L).toDF("id"))
    val out = spark.sql(
      s"CALL gdml.system.convert_equality_deletes('db.$t')").head()
    assert(out.getLong(1) == 10)
    val g2 = GraftTable.load(spark, s"$wh/db/$t")
    assert(g2.liveManifests().forall(_.content != 2))
    assert(spark.table(s"gdml.db.$t").count() == 90)
    assert(g2.countRows() == 90)
  }

  test("CALL rewrite_position_deletes reports and consolidates") {
    val t = freshTable("posproc")
    val g = GraftTable.load(spark, s"$wh/db/$t")
    (0 until 3).foreach(i => g.deleteWhereMoR(col("id") % 7 === i))
    // parallel delete writes emit several part files per commit — the
    // accumulation consolidation exists to fix
    val before = g.liveManifests().filter(_.content == 1)
      .map(_.entryCount).sum
    assert(before >= 3)
    // the position_deletes metadata table exposes the live tuples
    val deleted = (1L to 100L).count(_ % 7 < 3)
    assert(spark.sql(
      s"SELECT count(*) FROM gdml.db.$t.position_deletes")
      .head().getLong(0) == deleted)
    val out = spark.sql(
      s"CALL gdml.system.rewrite_position_deletes('db.$t')").head()
    assert(out.getLong(1) == before)
    val g2 = GraftTable.load(spark, s"$wh/db/$t")
    assert(g2.liveManifests().filter(_.content == 1)
      .map(_.entryCount).sum == 1)
    assert(spark.table(s"gdml.db.$t").count() ==
      (1L to 100L).count(_ % 7 >= 3))
    // same tuples, now all in the single consolidated delete file
    val pd = spark.sql(s"SELECT delete_file FROM gdml.db.$t.position_deletes")
      .collect().map(_.getString(0))
    assert(pd.length == deleted && pd.distinct.length == 1)
  }

  test("CALL rollback_to_timestamp restores the newest covered snapshot") {
    val t = freshTable("rbts")
    val g = GraftTable.load(spark, s"$wh/db/$t")
    val s1 = g.metadata.currentSnapshot.get
    Thread.sleep(5) // distinct commit timestamps
    spark.sql(s"INSERT INTO gdml.db.$t VALUES (999, 'x', 9.0)")
    val s2 = GraftTable.load(spark, s"$wh/db/$t").metadata.currentSnapshot.get
    assert(s2.timestampMs >= s1.timestampMs)
    // an instant between the two commits resolves to the first
    val mid = s2.timestampMs - 1
    val out = spark.sql(
      s"CALL gdml.system.rollback_to_timestamp('db.$t', $mid)").head()
    assert(out.getLong(0) == s1.snapshotId)
    assert(spark.table(s"gdml.db.$t").count() == 100)
    // before the first commit: loud failure, state unchanged
    intercept[Exception] { spark.sql(
      s"CALL gdml.system.rollback_to_timestamp('db.$t', 1)").collect() }
    assert(spark.table(s"gdml.db.$t").count() == 100)
    // candidates are MAIN-ancestry only: a branch-staged (unpublished
    // WAP) snapshot and the rolled-back-away s2 are both newer than s1,
    // yet rolling to "now" must stay on s1 — moving main onto either
    // would publish rows main never held at any instant
    val g2 = GraftTable.load(spark, s"$wh/db/$t")
    g2.createBranch("audit", s1.snapshotId)
    import spark.implicits._
    g2.appendToBranch("audit",
      Seq((7777L, "staged", 1.0)).toDF("id", "grp", "qty"))
    Thread.sleep(5)
    val out2 = spark.sql(s"CALL gdml.system.rollback_to_timestamp(" +
      s"'db.$t', ${System.currentTimeMillis})").head()
    assert(out2.getLong(0) == s1.snapshotId,
      s"rollback left main ancestry: ${out2.getLong(0)}")
    assert(spark.table(s"gdml.db.$t").count() == 100)
  }

  test("CALL evolve_partition_spec: new writes land under the new spec") {
    val t = freshTable("specddl") // starts bucket(4, id)
    val sid = spark.sql(
      s"CALL gdml.system.evolve_partition_spec('db.$t', " +
        "'truncate(1, grp)')").head().getLong(0)
    assert(sid == 2L)
    spark.sql(s"INSERT INTO gdml.db.$t " +
      "SELECT id + 1000, 'odd', 2.0 FROM range(50)")
    val g = GraftTable.load(spark, s"$wh/db/$t")
    val snap = g.metadata.currentSnapshotId.get
    // new files carry the new spec's partition tuple; old files keep
    // their write-time bucket tuple and the table still reads whole
    val parts = spark.sql(
      s"SELECT partition FROM gdml.db.$t.files " +
        s"WHERE added_snapshot_id = $snap").collect().map(_.getString(0))
    assert(parts.nonEmpty && parts.forall(_.startsWith("grp_trunc=")),
      s"new files not under evolved spec: ${parts.toSeq}")
    assert(spark.table(s"gdml.db.$t").count() == 150)
    // both specs prune: a grp filter hits only new-spec survivors plus
    // old files (may-match), and results stay exact
    assert(spark.sql(
      s"SELECT count(*) FROM gdml.db.$t WHERE grp = 'odd'")
      .head().getLong(0) == 100)
  }

  test("write-audit-publish: branch isolation and fast-forward safety") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-wap").toString + "/t"
    val df0 = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df0.schema)
    t.append(df0)
    t.createBranch("audit", t.metadata.currentSnapshotId.get)
    t.appendToBranch("audit",
      (11L to 20L).map(i => (i, i.toDouble)).toDF("id", "v"))
    // isolation: main unchanged, branch sees staged rows
    assert(t.scan().count() == 10)
    assert(t.scanRef("audit").count() == 20)
    // a second staged append stacks on the branch head
    t.appendToBranch("audit",
      (21L to 25L).map(i => (i, i.toDouble)).toDF("id", "v"))
    assert(t.scanRef("audit").count() == 25)
    assert(t.scan().count() == 10)
    // publish: main fast-forwards to the branch head
    t.fastForward("audit")
    assert(t.scan().count() == 25)
    // diverged main (a commit after the branch point) must refuse
    t.createBranch("stale", t.metadata.currentSnapshotId.get)
    t.append(Seq((99L, 9.9)).toDF("id", "v"))
    val err = intercept[IllegalArgumentException] { t.fastForward("stale") }
    assert(err.getMessage.contains("not an ancestor"))
    // unknown branch fails loudly on write and publish
    intercept[IllegalArgumentException] {
      t.appendToBranch("nope", df0) }
    intercept[IllegalArgumentException] { t.fastForward("nope") }
  }

  test("SQL-only WAP: wap.branch conf + CALL fast_forward") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wapsql").toString
    spark.conf.set("spark.sql.catalog.gwap", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gwap.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gwap.db")
    spark.sql("CREATE TABLE gwap.db.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gwap.db.t VALUES (1, 1.0), (2, 2.0)")
    spark.sql("CALL gwap.system.create_branch('db.t', 'audit')")
    spark.conf.set("graft.wap.branch", "audit")
    try {
      // with the conf set, a plain INSERT stages onto the branch
      spark.sql("INSERT INTO gwap.db.t VALUES (3, 3.0), (4, 4.0)")
      assert(spark.sql("SELECT COUNT(*) FROM gwap.db.t").head.getLong(0) == 2)
      assert(spark.sql(
        "SELECT COUNT(*) FROM gwap.db.t VERSION AS OF 'audit'")
        .head.getLong(0) == 4)
    } finally spark.conf.unset("graft.wap.branch")
    // publish via SQL; main now sees the staged rows
    val out = spark.sql("CALL gwap.system.fast_forward('db.t', 'audit')")
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "audit")
    assert(spark.sql("SELECT COUNT(*) FROM gwap.db.t").head.getLong(0) == 4)
    // publishing a diverged branch refuses through SQL too
    spark.sql("CALL gwap.system.create_branch('db.t', 'stale')")
    spark.sql("INSERT INTO gwap.db.t VALUES (9, 9.0)")
    val err = intercept[Exception] {
      spark.sql("CALL gwap.system.fast_forward('db.t', 'stale')").collect()
    }
    assert(err.getMessage.contains("not an ancestor"))
  }

  test("WAP through the DSv2 surface: branch write option + ref read") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-wap-dsv2").toString + "/t"
    val df0 = (1L to 10L).map(i => (i, i.toDouble)).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df0.schema)
    t.append(df0)
    t.createBranch("audit", t.metadata.currentSnapshotId.get)
    // stage through the public writer; main readers see nothing
    (11L to 15L).map(i => (i, i.toDouble)).toDF("id", "v")
      .write.format("graft").option("branch", "audit")
      .mode("append").save(loc)
    assert(spark.read.format("graft").load(loc).count() == 10)
    assert(spark.read.format("graft").option("ref", "audit").load(loc)
      .count() == 15)
    t.fastForward("audit")
    assert(spark.read.format("graft").load(loc).count() == 15)
    // branch writes are append-only staging: overwrite modes refuse
    val err = intercept[Exception] {
      df0.write.format("graft").option("branch", "audit")
        .mode("overwrite").save(loc)
    }
    assert(err.getMessage.contains("append only"))
  }

  test("changes(): row-level CDC with recovered delete content") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-cdc").toString + "/t"
    val t = GraftTable.create(spark, loc,
      Seq((1L, "a", 1.0)).toDF("id", "k", "v").schema)
    val s1 = t.append(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "k", "v"))
    val s2 = t.append(Seq((3L, "c", 3.0), (4L, "d", 4.0)).toDF("id", "k", "v"))
    val s3 = t.deleteWhereMoR(col("id") === 2L)
    val s4 = t.deleteWhereEq(Seq(Tuple1("c")).toDF("k"))
    val ch = t.changes(s1.snapshotId, s4.snapshotId).collect()
    def rows(tpe: String) = ch.filter(_.getAs[String]("_change_type") == tpe)
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("k"),
        r.getAs[Long]("_commit_snapshot_id"))).sortBy(_._1)
    assert(rows("insert").toSeq ==
      Seq((3L, "c", s2.snapshotId), (4L, "d", s2.snapshotId)))
    // deleted rows carry FULL recovered content and the deleting commit
    assert(rows("delete").toSeq ==
      Seq((2L, "b", s3.snapshotId), (3L, "c", s4.snapshotId)))
    // empty range → empty changelog with the full schema
    assert(t.changes(s4.snapshotId, s4.snapshotId).count() == 0)
    // ancestry-scoped: a branch commit shares the table-global sequence
    // domain but is NOT part of main's lineage — it must not appear
    t.createBranch("side", s4.snapshotId)
    t.appendToBranch("side", Seq((90L, "z", 9.0)).toDF("id", "k", "v"))
    val s4b = t.append(Seq((5L, "e", 5.0)).toDF("id", "k", "v"))
    val ids = t.changes(s4.snapshotId, s4b.snapshotId).collect()
      .map(_.getAs[Long]("id")).toSeq
    assert(ids == Seq(5L), s"branch commit leaked into main CDC: $ids")
    // CoW DELETE: net changes derived from the dropped-vs-added file
    // diff — only the logically removed row surfaces, the rewritten
    // survivors cancel
    val s5 = t.deleteWhere(col("id") === 1L)
    val ch2 = t.changes(s4b.snapshotId, s5.snapshotId).collect()
    assert(ch2.map(r => (r.getAs[String]("_change_type"),
      r.getAs[Long]("id"), r.getAs[Long]("_commit_snapshot_id"))).toSeq
      == Seq(("delete", 1L, s5.snapshotId)), ch2.mkString("\n"))
    // CoW UPDATE: one delete (pre-image) + one insert (post-image)
    val s6 = t.updateWhere(col("id") === 4L, Map("v" -> lit(44.0)))
    val ch3 = t.changes(s5.snapshotId, s6.snapshotId).collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("id"),
        r.getAs[Double]("v"))).sortBy(_._1)
    assert(ch3.toSeq == Seq(("delete", 4L, 4.0), ("insert", 4L, 44.0)),
      ch3.mkString("\n"))
    // a CoW commit whose PARENT was expired still refuses loudly (the
    // dropped-file set lives in the parent's manifest list): anchor the
    // range exactly at the parent's sequence so the ancestry walk lands
    // (recorded parent sequence) and only the CoW recovery is starved
    val s6b = t.append(Seq((6L, "f", 6.0)).toDF("id", "k", "v"))
    val s7 = t.deleteWhere(col("id") === 5L)
    GraftTable.load(spark, loc).expireSnapshots(keepLast = 1)
    val err = intercept[IllegalStateException] {
      GraftTable.load(spark, loc)
        .changesBySeq(s6b.sequenceNumber, s7.snapshotId).collect() }
    assert(err.getMessage.contains("copy-on-write"), err.getMessage)
  }

  test("changes(): an expired ancestor inside the range refuses loudly") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-cdc-gap").toString + "/t"
    val t = GraftTable.create(spark, loc,
      Seq((1L, 1.0)).toDF("id", "v").schema)
    val s1 = t.append(Seq((1L, 1.0)).toDF("id", "v"))
    t.append(Seq((2L, 2.0)).toDF("id", "v"))
    val s3 = t.append(Seq((3L, 3.0)).toDF("id", "v"))
    val fromSeq = s1.sequenceNumber
    // sanity: the full range reads before expiry
    val t1 = GraftTable.load(spark, loc)
    assert(t1.changesBySeq(fromSeq, s3.snapshotId).collect()
      .map(_.getAs[Long]("id")).sorted.toSeq == Seq(2L, 3L))
    // expire the middle commit: its changes are gone forever — a
    // consumer asking for the range must hear that, not get a delta
    // silently missing id=2
    t1.expireSnapshots(keepLast = 1)
    val t2 = GraftTable.load(spark, loc)
    assert(t2.metadata.snapshots.get.size == 1)
    val err = intercept[IllegalStateException] {
      t2.changesBySeq(fromSeq, s3.snapshotId) }
    assert(err.getMessage.contains("incomplete"))
    // a range starting at the last retained ancestor still reads
    assert(t2.changesBySeq(s3.sequenceNumber, s3.snapshotId).count() == 0)
  }

  test("changes(): recorded parent sequence rides out branch-made gaps") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-cdc-gapseq").toString + "/t"
    val t = GraftTable.create(spark, loc,
      Seq((1L, 1.0)).toDF("id", "v").schema)
    val s1 = t.append(Seq((1L, 1.0)).toDF("id", "v"))
    // a short-lived branch consumes the table-global sequence 2, so the
    // MAIN lineage's sequences are 1 -> 3 with no commit at 2
    t.createBranch("side", s1.snapshotId,
      graft.model.BranchRetention(1, Long.MaxValue, 1L))
    t.appendToBranch("side", Seq((50L, 5.0)).toDF("id", "v"))
    val s3 = t.append(Seq((3L, 3.0)).toDF("id", "v"))
    Thread.sleep(10)
    // ONE pass: the side ref ages out (appendToBranch preserved its
    // 1 ms max-ref-age) and the snapshots it pinned collect with it
    GraftTable.load(spark, loc).expireSnapshots(keepLast = 1)
    val t2 = GraftTable.load(spark, loc)
    assert(t2.metadata.snapshots.get.map(_.snapshotId)
      == Seq(s3.snapshotId), "expiry must leave only the head")
    // the head's parent (seq 1) is expired and the lineage sequences
    // are NOT dense — the parent sequence recorded in the commit
    // summary proves (1, 3] is complete anyway
    val ch = t2.changesBySeq(s1.sequenceNumber, s3.snapshotId).collect()
    assert(ch.map(_.getAs[Long]("id")).toSeq == Seq(3L))
  }

  test("changes(): an overwrite as the table's FIRST commit is plain " +
      "inserts (no parent, nothing dropped)") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-cdc-ow1").toString + "/t"
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df.schema)
    t.overwriteWhere(lit(true), df) // op=overwrite, parentless
    val head = t.metadata.currentSnapshotId.get
    val ch = t.changesBySeq(0L, head).collect()
    assert(ch.map(r => (r.getAs[String]("_change_type"),
      r.getAs[Long]("id"))).sortBy(_._2).toSeq ==
      Seq(("insert", 1L), ("insert", 2L)), ch.mkString("\n"))
  }

  test("changes(): legacy snapshot (no recorded parent seq) refuses " +
      "when its parent expired, even under dense adjacency") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-cdc-legacy").toString + "/t"
    val t = GraftTable.create(spark, loc,
      Seq((1L, 1.0)).toDF("id", "v").schema)
    val s1 = t.append(Seq((1L, 1.0)).toDF("id", "v"))
    val s2 = t.append(Seq((2L, 2.0)).toDF("id", "v"))
    // simulate a pre-upgrade snapshot: strip the recorded
    // parent-sequence-number from the head's summary in metadata JSON
    val metaDir = java.nio.file.Paths.get(loc, "metadata")
    val hint = java.nio.file.Files
      .readString(metaDir.resolve("version-hint.text")).trim
    val metaPath = metaDir.resolve(s"v$hint.metadata.json")
    val root = graft.model.Json
      .parse(java.nio.file.Files.readString(metaPath))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val snaps = root.withArray("snapshots")
    var stripped = false
    (0 until snaps.size).foreach { i =>
      val sn = snaps.get(i)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      if (sn.path("snapshot-id").asLong == s2.snapshotId) {
        val sm = sn.path("summary")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        stripped = sm.remove("parent-sequence-number") != null
      }
    }
    assert(stripped, "test setup: summary key not found to strip")
    java.nio.file.Files.writeString(metaPath, root.toString)
    GraftTable.load(spark, loc).expireSnapshots(keepLast = 1)
    val t2 = GraftTable.load(spark, loc)
    assert(t2.metadata.snapshots.get.map(_.snapshotId)
      == Seq(s2.snapshotId))
    // s2.sequenceNumber == s1.sequenceNumber + 1 (dense), but density
    // is not proof of landing — a legacy snapshot with an expired
    // parent must refuse so consumers recompute in full
    val err = intercept[IllegalStateException] {
      t2.changesBySeq(s1.sequenceNumber, s2.snapshotId) }
    assert(err.getMessage.contains("incomplete"), err.getMessage)
  }

  test("changes(): a rolled-back start sequence refuses loudly") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-cdc-rb").toString + "/t"
    val t = GraftTable.create(spark, loc,
      Seq((1L, 1.0)).toDF("id", "v").schema)
    val s1 = t.append(Seq((1L, 1.0)).toDF("id", "v"))
    val s2 = t.append(Seq((2L, 2.0)).toDF("id", "v"))
    t.rollbackTo(s1.snapshotId)
    val s4 = t.append(Seq((4L, 4.0)).toDF("id", "v"))
    // a consumer anchored at the ABANDONED s2 (an MV watermark, a
    // stream offset) cannot be served a delta: its state holds rows
    // this lineage never produced
    val err = intercept[IllegalStateException] {
      GraftTable.load(spark, loc)
        .changesBySeq(s2.sequenceNumber, s4.snapshotId) }
    assert(err.getMessage.contains("rolled back"), err.getMessage)
    // anchored at the restored ancestor, the delta is exactly the
    // post-rollback append
    val ok = GraftTable.load(spark, loc)
      .changesBySeq(s1.sequenceNumber, s4.snapshotId).collect()
    assert(ok.map(_.getAs[Long]("id")).toSeq == Seq(4L))
  }

  test("engine updateWhere: null condition rows are not matched") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-updw").toString + "/t"
    val df = Seq((1L, Some(5.0)), (2L, None), (3L, Some(50.0)))
      .toDF("id", "v")
    val t = GraftTable.create(spark, loc, df.schema)
    t.append(df)
    t.updateWhere(col("v") > 10, Map("v" -> (col("v") + 1)))
    val out = t.scan().orderBy("id").collect()
    assert(out.map(r => if (r.isNullAt(1)) null else r.getDouble(1)).toSeq ==
      Seq(5.0, null, 51.0))
  }

  test("engine mergeApply prunes: disjoint-key files are not rewritten") {
    import spark.implicits._
    val loc = java.nio.file.Files
      .createTempDirectory("graft-mrgprune").toString + "/t"
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df.schema)
    // two files with disjoint id ranges
    t.append((1L to 50L).map(i => (i, i.toDouble)).toDF("id", "v")
      .coalesce(1))
    t.append((51L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
      .coalesce(1))
    val filesBefore = t.planFiles().map(_.path).toSet
    val src = Seq((60L, -1.0)).toDF("id", "v")
    t.mergeApply(src, Seq(("id", "id")),
      matched = Seq(MergeUpdate(None, Map("v" -> col("__src_v")))),
      notMatched = Seq(MergeInsert(None,
        Map("id" -> col("__src_id"), "v" -> col("__src_v")))))
    val filesAfter = t.planFiles().map(_.path).toSet
    // the 1..50 file must have survived the merge untouched
    assert(filesBefore.intersect(filesAfter).nonEmpty,
      "merge rewrote every file despite disjoint key ranges")
    assert(t.scan(Some(col("id") === 60L)).head().getDouble(1) == -1.0)
    assert(t.scan().count() == 100)
  }
}
