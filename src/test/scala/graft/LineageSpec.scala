package graft

import graft.table.{GraftTable, IcebergInterop}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row lineage (Iceberg v3): stable `_row_id` per row assigned at append
  * (first-row-id inheritance, O(shards) commit work), preserved across
  * merge-on-read deletes, CoW rewrites, and lineage-materializing
  * compaction. `_last_updated_sequence_number` tracks the writing
  * commit.
  */
class LineageSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def lineitem: DataFrame =
    Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")

  private def lineageTable(name: String, src: DataFrame): GraftTable =
    GraftTable.create(spark, freshLoc(name), src.schema,
      properties = Map(GraftTable.RowLineageProp -> "true"))

  test("append assigns dense unique row ids; second append continues") {
    val src = lineitem.limit(3000)
    val t = lineageTable("lin", src)
    t.append(src.repartition(3))
    val n = src.count()
    val ids = t.scanWithLineage().select("_row_id")
    assert(ids.distinct().count() == n)
    assert(ids.agg(min("_row_id"), max("_row_id")).head() ==
      org.apache.spark.sql.Row(0L, n - 1))
    assert(t.metadata.nextRowId.contains(n))
    // second append starts where the first ended — no overlap, dense
    t.append(src.limit(100))
    val ids2 = t.scanWithLineage().select("_row_id")
    assert(ids2.distinct().count() == n + 100)
    assert(ids2.agg(max("_row_id")).head().getLong(0) == n + 99)
  }

  test("_last_updated_sequence_number is the writing commit's sequence") {
    val src = lineitem.limit(500)
    val t = lineageTable("lin-seq", src)
    val s1 = t.append(src.limit(200))
    val s2 = t.append(src.limit(300))
    val bySeq = t.scanWithLineage()
      .groupBy("_last_updated_sequence_number").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySeq == Map(s1.sequenceNumber -> 200L,
      s2.sequenceNumber -> 300L))
  }

  // identity = (id, full-row-hash): the synthetic data does not enforce
  // the TPC-H key, so "this exact row kept this exact id" is the check
  private def idHashes(df: DataFrame, cols: Seq[String]): Set[(Long, Int)] =
    df.select(col("_row_id"), hash(cols.map(col): _*).as("__h"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("row ids survive MoR and DV deletes (survivors keep their ids)") {
    val src = lineitem.limit(2000)
    val t = lineageTable("lin-del", src)
    t.append(src)
    val cols = src.columns.toSeq
    val before = idHashes(t.scanWithLineage(), cols)
    t.deleteWhereMoR(col("l_linenumber") === 1)
    t.deleteWhereDv(col("l_linenumber") === 2)
    val after = idHashes(t.scanWithLineage(), cols)
    assert(after.nonEmpty)
    assert(after.subsetOf(before), "survivors must keep their ids")
  }

  test("compaction materializes and preserves ids and sequences") {
    val src = lineitem.limit(2000)
    val t = lineageTable("lin-compact", src)
    t.append(src.repartition(4))
    t.deleteWhereDv(col("l_linenumber") === 3)
    val cols = src.columns.toSeq
    def snapshotIds(g: GraftTable): Set[(Long, Long, Int)] =
      g.scanWithLineage()
        .select(col("_row_id"), col("_last_updated_sequence_number"),
          hash(cols.map(col): _*).as("__h"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = snapshotIds(t)
    t.compact()
    // rewritten files carry materialized lineage (no first-row-id)
    assert(t.liveEntries().filter(_.isData).forall(_.firstRowId.isEmpty))
    val after = snapshotIds(t)
    assert(after == before)
    // a fresh append after compaction continues the id sequence uniquely
    t.append(src.limit(50))
    val all = t.scanWithLineage().select("_row_id")
    assert(all.distinct().count() == all.count())
  }

  test("bin-pack compaction preserves ids on lineage tables") {
    val src = lineitem.limit(1200)
    val t = lineageTable("lin-binpack", src)
    (0 until 3).foreach(i =>
      t.append(src.filter(col("l_orderkey") % 3 === i)))
    val cols = src.columns.toSeq
    val before = idHashes(t.scanWithLineage(), cols)
    t.compactBinPack()
    val after = idHashes(t.scanWithLineage(), cols)
    assert(after == before)
  }

  test("distributed planning path serves identical lineage") {
    val src = lineitem.limit(1000)
    val t = lineageTable("lin-dist", src)
    t.append(src.repartition(2))
    t.deleteWhereDv(col("l_linenumber") === 1)
    val driver = t.scanWithLineage().select("l_orderkey", "l_linenumber",
      "_row_id", "_last_updated_sequence_number").collect().toSet
    spark.conf.set("spark.graft.distributedPlanningThreshold", "1")
    try {
      val dist = t.scanWithLineage().select("l_orderkey", "l_linenumber",
        "_row_id", "_last_updated_sequence_number").collect().toSet
      assert(dist == driver)
    } finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  test("CoW DELETE preserves surviving ids; whole-file drops included") {
    val src = lineitem.limit(2000)
    val t = lineageTable("lin-cowdel", src)
    t.append(src.repartition(4))
    val cols = src.columns.toSeq
    val before = idHashes(t.scanWithLineage(), cols)
    t.deleteWhere(col("l_quantity") < 10)
    val after = idHashes(t.scanWithLineage(), cols)
    assert(after.nonEmpty && after.subsetOf(before))
    assert(t.scan().count() ==
      src.filter(col("l_quantity") >= 10).count())
  }

  test("UPDATE keeps _row_id; updated rows get the update commit's seq") {
    val src = lineitem.limit(1000)
    val t = lineageTable("lin-upd", src)
    t.append(src)
    val pre = t.scanWithLineage()
      .select(col("_row_id"), col("l_linenumber"),
        col("_last_updated_sequence_number").as("seq0"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val snap = t.updateWhere(col("l_linenumber") === 1,
      Map("l_quantity" -> lit(999.0)))
    val post = t.scanWithLineage()
      .select(col("_row_id"), col("l_linenumber"), col("l_quantity"),
        col("_last_updated_sequence_number"))
      .collect()
    assert(post.length == pre.size, "UPDATE must not change row count")
    post.foreach { r =>
      val (ln0, seq0) = pre(r.getLong(0)) // same _row_id must exist
      assert(r.getInt(1) == ln0)
      if (ln0 == 1) {
        assert(r.getDouble(2) == 999.0)
        assert(r.getLong(3) == snap.sequenceNumber,
          "updated rows carry the UPDATE commit's sequence")
      } else assert(r.getLong(3) == seq0,
        "untouched rows keep their original sequence")
    }
  }

  test("MERGE upsert: updated rows keep ids, inserts get fresh ones") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshLoc("lin-merge"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))),
      properties = Map(GraftTable.RowLineageProp -> "true"))
    t.append((1L to 100L).map(i => (i, i)).toDF("id", "v"))
    val pre = t.scanWithLineage().select(col("id"), col("_row_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // upsert: ids 51..150 — 50 updates, 50 inserts
    val snap = t.mergeInto((51L to 150L).map(i => (i, i * 10))
      .toDF("id", "v"), Seq("id"))
    val post = t.scanWithLineage()
      .select(col("id"), col("v"), col("_row_id"),
        col("_last_updated_sequence_number"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(post.length == 150)
    assert(post.map(_._3).distinct.length == 150, "ids must stay unique")
    post.foreach { case (id, v, rowId, seq) =>
      if (id <= 50) { // untouched: same id, same value, original seq
        assert(rowId == pre(id) && v == id && seq == 1L)
      } else if (id <= 100) { // updated: SAME id, new value, merge seq
        assert(rowId == pre(id), s"updated row $id changed _row_id")
        assert(v == id * 10 && seq == snap.sequenceNumber)
      } else { // inserted: fresh id past the original range, merge seq
        assert(rowId >= 100L, s"insert $id got a recycled id $rowId")
        assert(v == id * 10 && seq == snap.sequenceNumber)
      }
    }
  }

  test("INSERT OVERWRITE: replaced rows get FRESH ids, survivors keep theirs") {
    // sf0.001 lineitem holds duplicate (orderkey, linenumber) pairs —
    // dedup so the key → id binding below is well-defined
    val src = lineitem.dropDuplicates("l_orderkey", "l_linenumber")
      .limit(600)
    val t = lineageTable("lin-ow", src)
    t.append(src)
    val before = t.scanWithLineage()
      .select("l_orderkey", "l_linenumber", "_row_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nextBefore = t.metadata.nextRowId.get
    val repl = src.filter(col("l_linenumber") === 1).limit(50)
      .withColumn("l_quantity", lit(-99.0))
    t.overwriteWhere(col("l_linenumber") === 1, repl)
    val after = t.scanWithLineage().cache()
    // v3: overwrite's NEW rows get ids from the table's next-row-id on
    val fresh = after.filter(col("l_quantity") === -99.0).select("_row_id")
    assert(fresh.count() == 50)
    assert(fresh.agg(min("_row_id")).head().getLong(0) >= nextBefore)
    // survivor rows (untouched by the overwrite) keep the id they had
    val survivors = after.filter(col("l_quantity") =!= -99.0)
      .select("l_orderkey", "l_linenumber", "_row_id").collect()
    assert(survivors.nonEmpty)
    survivors.foreach { r =>
      assert(before((r.getLong(0), r.getInt(1))) == r.getLong(2),
        s"survivor (${r.getLong(0)},${r.getInt(1)}) changed id") }
    // global uniqueness holds across the overwrite
    assert(after.select("_row_id").distinct().count() == after.count())
    after.unpersist()
  }

  test("partition overwrite: replaced partitions mint ids, others keep") {
    import spark.implicits._
    def df(r: Range, g: Long) =
      r.map(i => (i.toLong, g, s"v$i")).toDF("id", "grp", "v")
    val base = df(1 to 100, 1L).union(df(101 to 200, 2L))
    val t = GraftTable.create(spark, freshLoc("lin-pow"), base.schema,
      partitionBy = Seq(("grp", graft.model.TIdentity, "grp_p")),
      properties = Map(GraftTable.RowLineageProp -> "true"))
    t.append(base, repartitionByPartition = true)
    val before = t.scanWithLineage().select("id", "_row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nextBefore = t.metadata.nextRowId.get
    t.overwritePartitions(df(1001 to 1050, 1L)) // replaces grp=1 only
    val after = t.scanWithLineage()
      .select("id", "grp", "_row_id").collect()
    assert(after.length == 150)
    // untouched partition keeps every id; replacement rows are fresh
    after.foreach { r =>
      if (r.getLong(1) == 2L)
        assert(r.getLong(2) == before(r.getLong(0)),
          s"grp=2 row ${r.getLong(0)} changed id")
      else assert(r.getLong(2) >= nextBefore,
        s"replacement row ${r.getLong(0)} did not mint a fresh id")
    }
    assert(after.map(_.getLong(2)).distinct.length == 150)
    assert(t.metadata.nextRowId.contains(nextBefore + 50))
  }

  test("export carries lineage: external read returns identical ids") {
    val src = lineitem.limit(400)
    val t = lineageTable("lin-exp", src)
    t.append(src)
    t.deleteWhereDv(col("l_linenumber") === 2) // DV + lineage together
    t.compact()                      // materialized-lineage files...
    t.append(src.limit(50))          // ...plus fresh virtual ones
    val dir = java.nio.file.Files
      .createTempDirectory("lin-layout").toString
    IcebergInterop.exportTable(t, dir)
    // v3 metadata declares itself and carries the id high-water mark
    val metaJson = java.nio.file.Files.readString(
      IcebergInterop.currentMetadataPath(dir))
    assert(metaJson.contains("\"format-version\":3") &&
      metaJson.contains("\"next-row-id\""))
    def rows(df: DataFrame) = df
      .select("_row_id", "_last_updated_sequence_number", "l_orderkey",
        "l_linenumber")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    val external = rows(IcebergInterop.readTableWithLineage(spark, dir))
    assert(external == rows(t.scanWithLineage()),
      "external-layout lineage read drifted from the native scan")
    // a non-lineage layout refuses the lineage read loudly
    val plain = GraftTable.create(spark, freshLoc("lin-exp-off"),
      src.schema)
    plain.append(src.limit(10))
    val plainDir = java.nio.file.Files
      .createTempDirectory("plain-layout").toString
    IcebergInterop.exportTable(plain, plainDir)
    intercept[IllegalArgumentException] {
      IcebergInterop.readTableWithLineage(spark, plainDir) }
  }

  test("late enablement refuses") {
    val src = lineitem.limit(300)
    // enabling lineage AFTER rows exist refuses OUTRIGHT — pre-existing
    // rows have no ids, so accepting the property would serve NULL
    // lineage (and compaction would then materialize the nulls)
    val t2 = GraftTable.create(spark, freshLoc("lin-late"), src.schema)
    t2.append(src)
    intercept[IllegalArgumentException] {
      t2.updateProperties(Map(GraftTable.RowLineageProp -> Some("true"))) }
    // an empty table may still enable it late
    val t3 = GraftTable.create(spark, freshLoc("lin-late-empty"), src.schema)
    t3.updateProperties(Map(GraftTable.RowLineageProp -> Some("true")))
    t3.append(src.limit(10))
    assert(t3.scanWithLineage().select(GraftTable.RowIdCol)
      .distinct().count() == 10)
  }

  test("scanWithLineage refuses on tables without the property") {
    val src = lineitem.limit(10)
    val t = GraftTable.create(spark, freshLoc("lin-off"), src.schema)
    t.append(src)
    intercept[IllegalArgumentException] { t.scanWithLineage() }
  }

  test("SQL: _row_id metadata column through the DSv2 catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft-lin-wh").toString
    spark.conf.set("spark.sql.catalog.glin", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.glin.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glin.db")
    spark.sql("""CREATE TABLE glin.db.t (id BIGINT, v STRING)
      TBLPROPERTIES ('graft.row-lineage' = 'true')""")
    import spark.implicits._
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .createOrReplaceTempView("lin_src")
    spark.sql("INSERT INTO glin.db.t SELECT * FROM lin_src")
    val rows = spark.sql(
      "SELECT id, _row_id, _last_updated_sequence_number FROM glin.db.t")
      .collect()
    assert(rows.length == 50)
    assert(rows.map(_.getLong(1)).toSet == (0L until 50L).toSet)
    assert(rows.forall(_.getLong(2) == 1L))
    // CoW SQL DELETE preserves surviving ids
    val before = spark.sql("SELECT id, _row_id FROM glin.db.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sql("DELETE FROM glin.db.t WHERE id <= 10")
    val after = spark.sql("SELECT id, _row_id FROM glin.db.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after.size == 40 && after.forall { case (k, v) => before(k) == v })
    // a non-lineage table does not even expose the column
    spark.sql("CREATE TABLE glin.db.plain (id BIGINT)")
    spark.sql("INSERT INTO glin.db.plain VALUES (1)")
    val err = intercept[Exception] {
      spark.sql("SELECT _row_id FROM glin.db.plain").collect() }
    assert(err.getMessage.contains("_row_id"))
  }

  test("changelog emits _row_id: inserts, DV deletes, post-compact deletes") {
    val src = lineitem.limit(1000)
    val t = lineageTable("lin-cdc", src)
    val s0 = t.append(src.limit(600)).snapshotId
    // pin every row's id while all files are still virtual
    val cols = src.columns.toSeq
    def idsOf(df: DataFrame): Set[(Long, Int)] =
      df.select(col("_row_id"), hash(cols.map(col): _*).as("__h"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val all0 = idsOf(t.scanWithLineage())
    val s1 = t.deleteWhereDv(col("l_linenumber") === 1).snapshotId
    val deleted1 = all0 diff idsOf(t.scanWithLineage())
    val s2 = t.append(src.filter(col("l_linenumber") === 7).limit(50))
      .snapshotId
    val ch = t.changes(s0, s2)
    assert(ch.columns.contains("_row_id"))
    val chDel = idsOf(ch.filter(col("_change_type") === "delete"))
    assert(chDel == deleted1,
      "delete change rows must carry the ids the rows died with")
    val chIns = idsOf(ch.filter(col("_change_type") === "insert"))
    assert(chIns == (idsOf(t.scanWithLineage()) diff
      (all0 diff deleted1)), "insert change rows carry the appended ids")
    // a delete AFTER compaction addresses MATERIALIZED files — the
    // changelog must recover ids from the physical columns
    t.compact()
    val s3 = t.metadata.currentSnapshotId.get
    val pre = idsOf(t.scanWithLineage())
    val s4 = t.deleteWhereDv(col("l_linenumber") === 2).snapshotId
    val deleted2 = pre diff idsOf(t.scanWithLineage())
    assert(deleted2.nonEmpty)
    val ch2 = t.changes(s3, s4)
    assert(idsOf(ch2.filter(col("_change_type") === "delete")) == deleted2)
  }

  test("CoW UPDATE changelog pairs delete+insert on the stable _row_id") {
    val src = lineitem.limit(500)
    val t = lineageTable("lin-cow-cdc", src)
    val s0 = t.append(src)
    // pin the pre-image ids of the rows the update will touch
    val touched = t.scanWithLineage()
      .filter(col("l_linenumber") === 3)
      .select(col("_row_id"), col("l_quantity"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(touched.nonEmpty)
    val s1 = t.updateWhere(col("l_linenumber") === 3,
      Map("l_quantity" -> (col("l_quantity") + 1000)))
    val ch = t.changes(s0.snapshotId, s1.snapshotId)
    val dels = ch.filter(col("_change_type") === "delete")
      .select(col("_row_id"), col("l_quantity"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ins = ch.filter(col("_change_type") === "insert")
      .select(col("_row_id"), col("l_quantity"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // exact UPDATE pairing: same id set on both sides, pre-image
    // quantities on the delete side, post-image on the insert side —
    // and rewritten-but-unchanged rows (same id, same content) cancel
    assert(dels.keySet == touched.keySet && ins.keySet == touched.keySet,
      s"paired ids diverged: del=${dels.size} ins=${ins.size} " +
        s"want=${touched.size}")
    assert(dels == touched)
    assert(ins == touched.map { case (id, q) => id -> (q + 1000) })
  }

  test("snapshots record their first-row-id (v3); non-minting commits omit it") {
    val src = lineitem.limit(120)
    val t = lineageTable("lin-fri", src)
    t.append(src.limit(100))
    t.append(src.limit(20))
    t.deleteWhereDv(col("l_linenumber") === 1) // assigns no ids
    val snaps = t.metadata.snapshots.get.sortBy(_.sequenceNumber)
    assert(snaps(0).firstRowId.contains(0L))
    assert(snaps(1).firstRowId.contains(100L))
    assert(snaps(2).firstRowId.isEmpty)
    // the field survives the JSON round-trip
    val rt = graft.model.TableMetadataV2
      .fromJsonString(t.metadata.toJsonString)
    assert(rt.snapshots.get.sortBy(_.sequenceNumber).apply(1)
      .firstRowId.contains(100L))
  }

  test("next-row-id round-trips through metadata JSON") {
    val src = lineitem.limit(100)
    val t = lineageTable("lin-json", src)
    t.append(src)
    val reloaded = GraftTable.load(spark, t.location)
    assert(reloaded.metadata.nextRowId.contains(100L))
  }
}
