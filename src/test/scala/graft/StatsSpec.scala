package graft

import graft.table.{GraftTable, Stats}
import org.apache.spark.sql.functions._

/** ANALYZE table statistics: NDV sketches + rollups in a stats sidecar,
  * ancestor-resolved across appends, expired with their snapshots, and
  * reported to Spark's CBO through the connector.
  */
class StatsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-stats").toString + "/t"

  private def build(loc: String, n: Int = 5000): GraftTable = {
    import spark.implicits._
    val df = (1 to n).map { i =>
      (i.toLong, (i % 97).toLong,
        if (i % 10 == 0) null else s"name-${i % 500}",
        i.toDouble / 7.0)
    }.toDF("id", "grp", "name", "score")
    val t = GraftTable.create(spark, loc, df.schema)
    t.append(df.repartition(4))
    t
  }

  test("analyze: exact nulls/min/max, NDV within 2%, bounded sketch") {
    val loc = tmp()
    val t = build(loc)
    val ref = t.analyze()
    assert(ref.snapshotId == t.metadata.currentSnapshotId.get)
    val (rows, entries) = Stats.readFile(ref.path)
    assert(rows == 5000L)
    val byName = entries.map(e => e.name -> e).toMap
    assert(byName.keySet == Set("id", "grp", "name", "score"))
    // exact rollups
    assert(byName("id").nullCount == 0 && byName("name").nullCount == 500)
    assert(byName("id").min.contains("1") && byName("id").max.contains("5000"))
    assert(byName("grp").min.contains("0") && byName("grp").max.contains("96"))
    // NDV: id unique (5000), grp 97, name 500 minus the nulled slots
    def err(c: String, exact: Long): Double =
      math.abs(byName(c).ndv - exact).toDouble / exact
    assert(err("id", 5000) < 0.02, s"id ndv=${byName("id").ndv}")
    assert(byName("grp").ndv == 97L) // sparse-mode sketch is exact
    assert(err("score", 5000) < 0.02)
    // string lengths present for the CBO's row-width estimate
    assert(byName("name").avgLen.exists(l => l >= 6 && l <= 10))
    assert(byName("name").maxLen.contains(8L))
    // sketch bytes bounded (mergeable summary, not data)
    assert(entries.flatMap(_.sketch).forall(_.length < 64 * 1024))
    // metadata references the file
    assert(t.metadata.statistics.exists(_.exists(_.path == ref.path)))
  }

  test("stats file is a spec Puffin: theta blobs + blob-metadata in JSON") {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches}
    val t = build(tmp(), 2000)
    val ref = t.analyze(Seq("id", "grp"))
    // metadata carries the spec fields
    assert(ref.fileFooterSizeBytes.exists(_ > 0L))
    val blobs = ref.blobMetadata.get
    assert(blobs.count(_.blobType == Stats.ThetaBlobType) == 2)
    assert(blobs.filter(_.blobType == Stats.ThetaBlobType)
      .forall(b => b.fields.nonEmpty && b.properties.contains("ndv")))
    // the file itself is a readable Puffin container whose theta blobs
    // parse with the PLAIN datasketches library (no graft code) and
    // estimate the right cardinalities
    val footer = graft.table.Puffin.readFooter(
      java.nio.file.Paths.get(ref.path))
    val thetas = footer.filter(_.tpe == Stats.ThetaBlobType)
    assert(thetas.size == 2)
    // the FOOTER's own blob metadata attributes each sketch to its
    // column field id — readers discovering stats from the file alone
    // (not via table-metadata blob refs) need this
    val schemaIds = t.metadata.currentSchema.fields.map(f => f.name -> f.id)
      .toMap
    thetas.foreach { b =>
      assert(b.fields == Seq(schemaIds(b.properties("graft.column"))),
        s"theta blob for ${b.properties("graft.column")} must carry its " +
          s"field id in footer `fields`, got ${b.fields}")
    }
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(ref.path))
    val byCol = thetas.map(b => b.properties("graft.column") ->
      java.util.Arrays.copyOfRange(bytes, b.offset.toInt,
        (b.offset + b.length).toInt)).toMap
    val grpEst = Sketches.wrapCompactSketch(Memory.wrap(byCol("grp")))
      .getEstimate
    assert(math.round(grpEst) == 97L)
    val idEst = Sketches.wrapCompactSketch(Memory.wrap(byCol("id")))
      .getEstimate
    assert(math.abs(idEst - 2000.0) / 2000.0 < 0.02)
    // mergeability: two sketches UNION like the spec intends
    val u = SetOperation.builder().buildUnion()
    u.union(Memory.wrap(byCol("grp")))
    u.union(Memory.wrap(byCol("id")))
    assert(u.getResult.getEstimate >= idEst) // superset cardinality
    // the JSON metadata round-trips the spec fields
    val meta2 = graft.model.TableMetadataV2.fromJsonString(
      t.metadata.toJsonString)
    assert(meta2.statistics.get.head.blobMetadata.get
      .exists(b => b.blobType == Stats.ThetaBlobType &&
        b.properties.contains("ndv")))
  }

  test("legacy .stats.json sidecars still read after the Puffin upgrade") {
    // a table analyzed BEFORE the Puffin conversion carries a statistics
    // ref to a plain-JSON file; readFile must branch on the actual magic
    // instead of throwing "not a Puffin file"
    val dir = java.nio.file.Files.createTempDirectory("legacy-stats")
    val legacy =
      """{"snapshot-id": 7, "row-count": 123, "columns": [
         {"name": "id", "ndv": 120, "null-count": 0,
          "min": "1", "max": "123"}]}"""
    val p = dir.resolve("7-abc.stats.json")
    java.nio.file.Files.writeString(p, legacy)
    val (rows, entries) = Stats.readFile(p.toString)
    assert(rows == 123L)
    assert(entries.map(_.name) == Seq("id"))
    assert(entries.head.ndv == 120L && entries.head.max == Some("123"))
  }

  test("partition statistics file: spec fields, counts match, expiry sweeps") {
    import spark.implicits._
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(2000)
    val t = GraftTable.create(spark, tmp(), src.schema,
      partitionBy = Seq(("l_shipdate", graft.model.TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)
    val ref = t.writePartitionStats()
    assert(t.metadata.partitionStatistics.exists(_.exists(
      _.path == ref.path)))
    // the file is plain parquet with the spec's column names; the
    // unified tuple is typed (month transform → int)
    val df = spark.read.parquet(ref.path)
    assert(df.columns.toSet == Set("partition", "spec_id",
      "data_record_count", "data_file_count",
      "total_data_file_size_in_bytes", "last_updated_snapshot_id",
      "position_delete_record_count", "position_delete_file_count",
      "equality_delete_record_count", "equality_delete_file_count"))
    // no deletes yet: attribution is zero-filled, never null
    assert(df.agg(sum("position_delete_record_count")).head().getLong(0)
      == 0L)
    assert(df.agg(sum("equality_delete_record_count")).head().getLong(0)
      == 0L)
    assert(df.filter(col("equality_delete_file_count").isNull).count()
      == 0L)
    assert(df.schema("partition").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("ship_month")
      .dataType == org.apache.spark.sql.types.IntegerType)
    // per-partition record counts match the source grouping exactly
    val got = df.select(col("partition.ship_month"),
        col("data_record_count"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = src.groupBy(
        ((year(col("l_shipdate")) - 1970) * 12 +
          month(col("l_shipdate")) - 1).as("m"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(df.agg(sum("data_file_count")).head().getLong(0) ==
      t.planFiles().size.toLong)
    // a new snapshot + re-analyze replaces; expiry sweeps the old file
    t.append(src.limit(100), repartitionByPartition = true)
    val ref2 = t.writePartitionStats()
    t.expireSnapshots(keepLast = 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ref.path)),
      "expired partition-stats file not swept")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(ref2.path)))
    assert(t.metadata.partitionStatistics.get.map(_.path) == Seq(ref2.path))
  }

  test("partition stats attribute MoR deletes to their partitions") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(3000)
    val t = GraftTable.create(spark, tmp(), src.schema,
      partitionBy = Seq(("l_shipdate", graft.model.TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)
    // one parquet-form MoR delete + one DV delete: both forms attribute
    t.deleteWhereMoR(col("l_linenumber") === 1)
    t.deleteWhereDv(col("l_linenumber") === 2)
    val ref = t.writePartitionStats()
    val df = spark.read.parquet(ref.path)
    val got = df.select(col("partition.ship_month"),
        col("position_delete_record_count"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = src.filter(col("l_linenumber").isin(1, 2))
      .groupBy(((year(col("l_shipdate")) - 1970) * 12 +
        month(col("l_shipdate")) - 1).as("m"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // partitions with no deletes report 0, not null; the rest exact
    assert(got.filter(_._2 > 0L) == want,
      s"per-partition delete attribution mismatch: got=$got want=$want")
    assert(df.filter(col("position_delete_record_count").isNull).count()
      == 0)
    // the live .partitions table agrees with the durable artifact
    val live = t.partitionsDf
      .select(col("partition"), col("position_delete_record_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromFile = df.select(
        concat(lit("ship_month="), col("partition.ship_month")),
        col("position_delete_record_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(live == fromFile)
    // total rows scanned = data minus attributed deletes
    assert(t.scan().count() ==
      df.agg(sum("data_record_count")).head().getLong(0) -
        df.agg(sum("position_delete_record_count")).head().getLong(0))
    // file-count semantics: DISTINCT delete files per partition — a
    // delete file covering several data files of one partition counts
    // once. Recomputed independently from the raw delete entries.
    val partOfData = t.planFiles()
      .map(e => e.path -> e.partition("ship_month").get.toInt).toMap
    def dec(raw: String): String =
      try new java.net.URI(raw).getPath
      catch { case _: Exception => raw.stripPrefix("file:") }
    val delEntries = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries)
    val pairs = delEntries.flatMap { e =>
      e.dv match {
        case Some(d) => Seq(e.path -> partOfData(dec(d.dataFile)))
        case None =>
          spark.read.parquet(e.path).select("file_path").distinct()
            .collect().map(r => e.path -> partOfData(dec(r.getString(0))))
            .toSeq
      }
    }.distinct
    val wantFiles = pairs.groupBy(_._2)
      .map { case (m, ps) => m -> ps.map(_._1).distinct.size.toLong }
    val gotFiles = df.select(col("partition.ship_month"),
        col("position_delete_file_count"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      .filter(_._2 > 0L)
    assert(gotFiles == wantFiles,
      s"delete-FILE attribution mismatch: got=$gotFiles want=$wantFiles")
  }

  test("partition stats attribute equality deletes when keys cover the spec") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(3000)
    val t = GraftTable.create(spark, tmp(), src.schema,
      partitionBy = Seq(("l_shipdate", graft.model.TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)
    // keys INCLUDE the partition source column → every delete row's
    // partition tuple is recomputable from the key values alone
    t.deleteWhereEq(src.filter(col("l_linenumber") === 3)
      .select("l_orderkey", "l_linenumber", "l_shipdate"))
    val ref = t.writePartitionStats()
    val df = spark.read.parquet(ref.path)
    val got = df.select(col("partition.ship_month"),
        col("equality_delete_record_count"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = src.filter(col("l_linenumber") === 3)
      .groupBy(((year(col("l_shipdate")) - 1970) * 12 +
        month(col("l_shipdate")) - 1).as("m"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.filter(_._2 > 0L) == want,
      s"eq-delete attribution mismatch: got=$got want=$want")
    // coverable spec: zero-filled, never null; ONE delete file per
    // partition it touches
    assert(df.filter(col("equality_delete_record_count").isNull).count()
      == 0L)
    assert(df.filter(col("equality_delete_record_count") > 0L)
      .filter(col("equality_delete_file_count") =!= 1L).count() == 0L)
    // the live .partitions table agrees with the durable artifact
    val live = t.partitionsDf
      .select(col("partition"), col("equality_delete_record_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromFile = df.select(
        concat(lit("ship_month="), col("partition.ship_month")),
        col("equality_delete_record_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(live == fromFile)
    // an UNCOVERED delete (keys lack the partition source) flips the
    // spec's partitions to NULL — unknown, not a fake zero
    t.deleteWhereEq(src.filter(col("l_linenumber") === 4)
      .select("l_orderkey", "l_linenumber"))
    val ref2 = t.writePartitionStats()
    val df2 = spark.read.parquet(ref2.path)
    assert(df2.filter(col("equality_delete_record_count").isNotNull)
      .count() == 0L,
      "uncoverable eq delete must yield NULL attribution, not a guess")
    assert(df2.filter(col("equality_delete_file_count").isNotNull)
      .count() == 0L)
    // the scan itself still applies BOTH deletes exactly
    assert(t.scan().count() ==
      src.filter(!col("l_linenumber").isin(3, 4)).count())
  }

  test("partition display-string collisions do not double-count attribution") {
    import spark.implicits._
    // a literal "null" string value and an actual NULL render the SAME
    // display string ("kp=null") but are distinct partition tuples —
    // attribution must join on the injective key, not the display form
    val df = Seq((1L, "null"), (2L, "null"), (3L, null), (4L, null),
      (5L, null)).toDF("id", "k")
    val t = GraftTable.create(spark, tmp(), df.schema,
      partitionBy = Seq(("k", graft.model.TIdentity, "kp")))
    t.append(df, repartitionByPartition = true)
    t.deleteWhereDv(col("id") === 1L) // hits the literal-"null" tuple
    val parts = t.partitionsDf.select("partition", "record_count",
      "position_delete_record_count").collect()
    assert(parts.count(_.getString(0) == "kp=null") == 2,
      s"colliding tuples must stay distinct rows: ${parts.toSeq}")
    // the delete attributes ONCE, to the right tuple (double-counting
    // via the display string would yield total 2)
    assert(parts.map(_.getLong(2)).sum == 1L, parts.toSeq)
    assert(parts.map(_.getLong(1)).sorted.toSeq == Seq(2L, 3L))
    // the durable artifact agrees
    val ref = t.writePartitionStats()
    val file = spark.read.parquet(ref.path)
    assert(file.agg(sum("position_delete_record_count")).head().getLong(0)
      == 1L)
    assert(file.count() == 2L)
  }

  test("stats resolve from nearest ancestor after appends; refresh replaces") {
    import spark.implicits._
    val loc = tmp()
    val t = build(loc, 1000)
    val ref = t.analyze(Seq("id", "grp"))
    // append twice: current snapshot has no stats, ancestor does
    t.append((1001L to 1200L).map(i =>
      (i, i % 97, s"name-$i", i / 7.0)).toDF("id", "grp", "name", "score"))
    t.append((1201L to 1300L).map(i =>
      (i, i % 97, s"name-$i", i / 7.0)).toDF("id", "grp", "name", "score"))
    val got = t.columnStatistics()
    assert(got.exists(_._1.snapshotId == ref.snapshotId),
      "ancestor stats should resolve")
    // re-analyze at head: now exact-match resolution, new NDV
    val ref2 = t.analyze(Seq("id", "grp"))
    val got2 = t.columnStatistics().get
    assert(got2._1.snapshotId == t.metadata.currentSnapshotId.get)
    assert(got2._3.find(_.name == "id").get.ndv > 1200,
      "refreshed NDV sees appended rows")
    // both stats files coexist (keyed by snapshot) until expiry
    assert(t.metadata.statistics.get.map(_.snapshotId).toSet ==
      Set(ref.snapshotId, ref2.snapshotId))
  }

  test("time-travel reads resolve the as-of snapshot's stats") {
    import spark.implicits._
    val loc = tmp()
    val t = build(loc, 800)
    val sid1 = t.metadata.currentSnapshotId.get
    val ref1 = t.analyze(Seq("id"))
    t.append((801L to 900L).map(i =>
      (i, i % 97, s"n$i", i / 7.0)).toDF("id", "grp", "name", "score"))
    t.analyze(Seq("id"))
    val atOld = t.columnStatistics(Some(sid1)).get
    assert(atOld._1.path == ref1.path)
    assert(atOld._3.head.ndv <= 810, "old snapshot stats, not head's")
  }

  test("expire_snapshots drops stats files with their snapshots") {
    import spark.implicits._
    val loc = tmp()
    val t = build(loc, 500)
    val ref1 = t.analyze()
    t.append((501L to 600L).map(i =>
      (i, i % 97, s"n$i", i / 7.0)).toDF("id", "grp", "name", "score"))
    val ref2 = t.analyze()
    t.expireSnapshots(keepLast = 1)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ref1.path)),
      "expired snapshot's stats file should be deleted")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(ref2.path)))
    assert(t.metadata.statistics.get.map(_.snapshotId) == Seq(ref2.snapshotId))
    // reads still fine, stats resolve to the surviving file
    assert(t.columnStatistics().exists(_._1.path == ref2.path))
  }

  test("connector reports column stats; catalyst attributeStats populate") {
    val loc = tmp()
    val t = build(loc)
    t.analyze()
    val df = spark.read.format("graft").load(loc)
    val scanRel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r
    }
    assert(scanRel.nonEmpty)
    val stats = scanRel.head.computeStats()
    assert(stats.rowCount.contains(BigInt(5000)))
    val attr = stats.attributeStats.toSeq.map { case (a, s) => a.name -> s }
      .toMap
    assert(attr.contains("id") && attr.contains("grp"),
      s"attributeStats missing: ${attr.keySet}")
    assert(attr("grp").distinctCount.contains(BigInt(97)))
    assert(attr("id").nullCount.contains(BigInt(0)))
    assert(attr("id").min.contains(1L) && attr("id").max.contains(5000L))
  }

  test("CALL compute_partition_stats registers the spec artifact") {
    val wh = java.nio.file.Files.createTempDirectory("graft-whps").toString
    spark.conf.set("spark.sql.catalog.gps", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gps.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gps.db")
    spark.sql("CREATE TABLE gps.db.t (id BIGINT, grp BIGINT)")
    spark.sql("INSERT INTO gps.db.t SELECT id, id % 3 FROM range(300)")
    val out = spark.sql(
      "CALL gps.system.compute_partition_stats('db.t')").collect()
    assert(out.length == 1)
    val path = out.head.getString(1)
    assert(out.head.getLong(2) > 0L)
    val df = spark.read.parquet(path)
    assert(df.agg(sum("data_record_count")).head().getLong(0) == 300L)
    val t = GraftTable.load(spark, s"$wh/db/t")
    assert(t.metadata.partitionStatistics.exists(_.exists(_.path == path)))
  }

  test("CALL analyze_table through the catalog; CBO join estimate uses NDV") {
    val wh = java.nio.file.Files.createTempDirectory("graft-whstats").toString
    spark.conf.set("spark.sql.catalog.gst", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gst.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gst.db")
    spark.sql("CREATE TABLE gst.db.t (id BIGINT, grp BIGINT)")
    spark.sql(
      "INSERT INTO gst.db.t SELECT id, id % 11 FROM range(2000)")
    val out = spark.sql("CALL gst.system.analyze_table('db.t')").collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
    val t = GraftTable.load(spark, s"$wh/db/t")
    val got = t.columnStatistics().get._3.map(e => e.name -> e.ndv).toMap
    assert(got("grp") == 11L)
    assert(math.abs(got("id") - 2000L) <= 40L)
    // with CBO on, the reported NDV drives the join cost model
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val joined = spark.sql(
        "SELECT a.grp, count(*) c FROM gst.db.t a JOIN gst.db.t b " +
          "ON a.grp = b.grp GROUP BY a.grp")
      val jstats = joined.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          j.stats.rowCount
      }
      // 2000×2000 rows / max(ndv)=11 ≈ 364k estimated join rows —
      // without NDV the estimate would be the 4M cross size
      assert(jstats.exists(_.exists(rc =>
        rc > BigInt(100000) && rc < BigInt(1000000))),
        s"join row estimate should reflect NDV, got $jstats")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }
}
