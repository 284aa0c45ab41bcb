package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** The `_file` metadata (virtual) column: served as a per-file constant
  * on the native columnar path, derived from `_metadata.file_path` on
  * the V1 delete-bridge path, and consistent with the manifest on both.
  */
class MetaColumnSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-metacol").toString + "/t"

  test("native path: _file matches the manifest for every row") {
    import spark.implicits._
    val loc = tmp()
    val df0 = (1L to 300L).map(i => (i, i.toDouble)).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df0.schema)
    t.append(df0.repartition(4))
    val manifestPaths = t.liveEntries().filter(_.isData).map(_.path).toSet
    assert(manifestPaths.size == 4)

    val out = spark.read.format("graft").load(loc)
      .select(col("id"), col("_file")).collect()
    assert(out.length == 300)
    val seenPaths = out.map(_.getString(1)).toSet
    assert(seenPaths == manifestPaths, "files diverge from manifest")
    // per-file grouping is consistent: each id maps into exactly one file
    assert(out.map(_.getLong(0)).distinct.length == 300)

    // _file composes with data predicates and aggregation
    val perFile = spark.read.format("graft").load(loc)
      .groupBy("_file").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perFile.keySet == manifestPaths)
    assert(perFile.values.sum == 300L)
    val fromManifest = t.liveEntries().filter(_.isData)
      .map(e => e.path -> e.recordCount).toMap
    assert(perFile == fromManifest, "per-file counts diverge from manifest")
  }

  test("V1 bridge path (MoR deletes): _file still served and exact") {
    import spark.implicits._
    val loc = tmp()
    val df0 = (1L to 200L).map(i => (i, i.toDouble)).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df0.schema)
    t.append(df0.repartition(3))
    t.deleteWhereMoR(col("id") % 4 === 0) // forces the V1 bridge
    val out = spark.read.format("graft").load(loc)
      .select(col("id"), col("_file")).collect()
    assert(out.length == 150)
    val manifestPaths = t.liveEntries().filter(_.isData).map(_.path).toSet
    assert(out.map(_.getString(1)).toSet == manifestPaths)
    // engine-level surface agrees
    val eng = t.scan(withFileColumn = true)
    assert(eng.columns.contains("_file"))
    assert(eng.select("_file").distinct().count() == manifestPaths.size)
  }

  test("schema evolution: _file rides along renamed/null-filled groups") {
    import spark.implicits._
    val loc = tmp()
    val df0 = (1L to 50L).map(i => (i, s"a$i")).toDF("id", "a")
    val t = GraftTable.create(spark, loc, df0.schema)
    t.append(df0)
    t.renameColumn("a", "b")
    t.addColumn("c", org.apache.spark.sql.types.StringType)
    t.append((51L to 80L).map(i => (i, s"b$i", s"c$i")).toDF("id", "b", "c"))
    val out = spark.read.format("graft").load(loc)
      .select(col("id"), col("b"), col("c"), col("_file"))
    assert(out.count() == 80)
    // old-group rows: c is null, _file points at the old group's files
    val oldFiles = out.filter(col("c").isNull)
      .select("_file").distinct().collect().map(_.getString(0)).toSet
    val newFiles = out.filter(col("c").isNotNull)
      .select("_file").distinct().collect().map(_.getString(0)).toSet
    assert(oldFiles.nonEmpty && newFiles.nonEmpty)
    assert((oldFiles intersect newFiles).isEmpty)
  }

  test("native path: _pos is the in-file row position, exact per file") {
    import spark.implicits._
    val loc = tmp()
    val df0 = (1L to 400L).map(i => (i, i * 2.0)).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df0.schema)
    t.append(df0.repartition(4))
    val out = spark.read.format("graft").load(loc)
      .select(col("id"), col("_file"), col("_pos")).collect()
    assert(out.length == 400)
    // per file: positions are exactly 0..n-1 (no gaps, no dups)
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.toSeq == (0L until ps.length).toSeq)
    }
    // a filtered read keeps the ORIGINAL positions (row-group filter
    // pushdown is disabled when _pos rides; Spark re-filters above)
    val byId = out.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val filtered = spark.read.format("graft").load(loc)
      .filter(col("id") > 350).select("id", "_file", "_pos").collect()
    assert(filtered.length == 50)
    filtered.foreach(r => assert(
      byId(r.getLong(0)) == (r.getString(1), r.getLong(2)),
      s"position changed under filtering for id ${r.getLong(0)}"))
  }

  test("MoR deletes: _pos survives as the ORIGINAL file position") {
    import spark.implicits._
    val loc = tmp()
    val df0 = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df0.schema)
    t.append(df0.coalesce(1))
    // full-scan ordering before the delete pins each id's position
    val before = t.scan(withPosColumn = true)
      .select("id", "_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    t.deleteWhereMoR(col("id") % 3 === 0)
    val after = spark.read.format("graft").load(loc)
      .select(col("id"), col("_pos")).collect()
    assert(after.length == 100 - 33)
    after.foreach(r => assert(r.getLong(1) == before(r.getLong(0)),
      s"_pos shifted after MoR delete for id ${r.getLong(0)}"))
  }

  test("_file is absent unless selected; SQL surface works") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-whmc").toString
    spark.conf.set("spark.sql.catalog.gmc", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmc.db")
    spark.sql("CREATE TABLE gmc.db.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gmc.db.t VALUES (1, 1.0), (2, 2.0)")
    // a plain star-select does NOT include the metadata column
    assert(spark.sql("SELECT * FROM gmc.db.t").columns.toSeq ==
      Seq("id", "v"))
    // explicit selection works through SQL
    val rows = spark.sql("SELECT id, _file, _pos FROM gmc.db.t ORDER BY id")
      .collect()
    assert(rows.length == 2 && rows.forall(_.getString(1).endsWith(".parquet")))
    assert(rows.forall(_.getLong(2) >= 0L))
  }
}
