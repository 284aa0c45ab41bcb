package graft

import graft.model._
import graft.table.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TableSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def lineitem: DataFrame =
    Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")

  test("partition pruning reads only matching month partitions") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("prune"), src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)
    val f = col("l_shipdate") >= lit("1997-01-01") &&
      col("l_shipdate") < lit("1998-01-01")
    val total = t.liveEntries().size
    val planned = t.planFiles(Some(f))
    assert(planned.size == 12, s"expected 12 month files of $total")
    // pruned scan returns exactly the plain-filter result
    val expected = src.filter(f).count()
    assert(t.scan(Some(f)).count() == expected)
  }

  test("min/max stats prune an unpartitioned sorted table") {
    val src = lineitem.orderBy("l_orderkey").repartitionByRange(8, col("l_orderkey"))
    val t = GraftTable.create(spark, freshLoc("stats"), lineitem.schema)
    t.append(src, sortWithin = Seq(col("l_orderkey")))
    val total = t.liveEntries().size
    val planned = t.planFiles(Some(col("l_orderkey") === 42L))
    assert(planned.size < total, s"stats pruning: ${planned.size} of $total")
  }

  test("bucket partition pruning hits exactly one bucket on equality") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("bucket"), src.schema,
      partitionBy = Seq(("l_orderkey", TBucket(16), "key_bucket")))
    t.append(src, repartitionByPartition = true)
    assert(t.liveEntries().size == 16)
    val planned = t.planFiles(Some(col("l_orderkey") === 42L))
    assert(planned.size == 1)
    // and the scan through that single file still answers correctly
    assert(t.scan(Some(col("l_orderkey") === 42L)).count() ==
      src.filter(col("l_orderkey") === 42L).count())
  }

  test("default SortOrder clusters appended files automatically") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("autosort"), src.schema,
      sortOrder = Seq(("l_orderkey", TIdentity)))
    t.append(src.repartitionByRange(4, col("l_orderkey")))
    val ranges = t.liveEntries().flatMap(e =>
      e.stats.get("l_orderkey").flatMap(s =>
        s.min.zip(s.max).map { case (a, b) => (BigDecimal(a), BigDecimal(b)) }))
      .sortBy(_._1)
    assert(ranges.size == 4)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin)
      case _ =>
    }
  }

  test("identity-transform partitioning on timestamps prunes correctly") {
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2023-01-01 12:00:00")),
      (2L, java.sql.Timestamp.valueOf("2023-01-02 12:00:00")),
      (3L, java.sql.Timestamp.valueOf("2023-01-03 12:00:00")))
      .toDF("id", "ts")
    val t = GraftTable.create(spark, freshLoc("ident-ts"), df.schema,
      partitionBy = Seq(("ts", TIdentity, "ts_part")))
    t.append(df, repartitionByPartition = true)
    // equality on the exact partition value must NOT be pruned away
    val f = col("ts") === lit("2023-01-02 12:00:00")
    assert(t.scan(Some(f)).count() == 1,
      "identity ts partition wrongly pruned a matching file")
    assert(t.planFiles(Some(f)).size == 1)
    // distributed path stays conservative but never loses the file
    assert(t.planFilesDistributed(Some(f)).count() >= 1)
  }

  test("deleteWhere keeps rows where the predicate is NULL") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, 7.0), (3L, null)).toDF("id", "x")
    val t = GraftTable.create(spark, freshLoc("nulldel"), df.schema)
    t.append(df)
    t.deleteWhere(col("x") === 5.0)
    val left = t.scan().collect().map(_.getAs[Long]("id")).sorted.toSeq
    // SQL DELETE removes only rows where the condition is TRUE: the
    // x-NULL row must survive
    assert(left == Seq(2L, 3L))
  }

  test("countRows falls back to scanning for untranslatable filters") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("countx"), src.schema)
    t.append(src)
    // modulo is not a pruning predicate — a metadata shortcut would
    // silently return the full table count
    val f = col("l_orderkey") % 2 === 0
    assert(t.countRows(Some(f)) == src.filter(f).count())
    // partially translatable conjunction: the translated half must not
    // certify files against the weaker predicate
    val g = col("l_orderkey") > 100L && col("l_orderkey") % 2 === 0
    assert(t.countRows(Some(g)) == src.filter(g).count())
  }

  test("append rejects narrowing input types, accepts upcasts") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshLoc("castck"),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.IntegerType))))
    // upcast int→long for id is fine
    t.append(Seq((1, 10), (2, 20)).toDF("id", "v"))
    assert(t.scan().count() == 2)
    // narrowing double→int must be rejected, not silently truncated
    val e = intercept[IllegalArgumentException](
      t.append(Seq((3L, 3.9)).toDF("id", "v")))
    assert(e.getMessage.contains("does not safely widen"))
    assert(t.scan().count() == 2)
  }

  test("countRows answers from metadata, scanning only boundary files") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("count"), src.schema,
      partitionBy = Seq(("l_shipdate", TYear, "ship_year")))
    t.append(src, repartitionByPartition = true)
    // full count: pure metadata
    assert(t.countRows() == src.count())
    // range filter: year files inside the range are fully-matching
    val f = col("l_shipdate") >= lit("1996-01-01") &&
      col("l_shipdate") < lit("1999-01-01")
    assert(t.countRows(Some(f)) == src.filter(f).count())
    // point filter: must equal the scan
    val p = col("l_orderkey") === 42L
    assert(t.countRows(Some(p)) == src.filter(p).count())
  }

  test("rollback makes an earlier snapshot current again") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("rollback"), src.schema)
    val s1 = t.append(src.filter(col("l_orderkey") % 2 === 0))
    t.append(src.filter(col("l_orderkey") % 2 === 1))
    val full = t.scan().count()
    t.rollbackTo(s1.snapshotId)
    assert(t.scan().count() == src.filter(col("l_orderkey") % 2 === 0).count())
    assert(t.metadata.refs.get("main").snapshotId == s1.snapshotId)
    // roll forward again works too (later snapshot still exists)
    assert(t.metadata.snapshots.get.size == 2)
  }

  test("removeOrphanFiles deletes unreferenced data, keeps live files") {
    val src = lineitem.limit(100)
    val t = GraftTable.create(spark, freshLoc("orphan"), src.schema)
    t.append(src)
    // simulate a failed write: parquet data that never got committed
    val stray = java.nio.file.Paths.get(t.location, "data", "failed-write")
    src.limit(10).coalesce(1).write.parquet(stray.toString)
    // and an abandoned changelog staging range from a crashed stream
    val staged = java.nio.file.Paths.get(t.location,
      "_changelog", "s-dead", "0-3")
    src.limit(5).coalesce(1).write.parquet(staged.toString)
    val removed = t.removeOrphanFiles(olderThanMillis = 0L)
    assert(removed.nonEmpty)
    assert(removed.forall(p =>
      p.contains("failed-write") || p.contains("_changelog")))
    assert(removed.exists(_.contains("s-dead")),
      "abandoned staging range must be swept")
    assert(!java.nio.file.Files.exists(staged))
    assert(t.scan().count() == 100)
  }

  test("orphan sweep spares staged ranges of a live-but-idle stream") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    import java.nio.file.attribute.FileTime
    val src = lineitem.limit(20)
    val t = GraftTable.create(spark, freshLoc("hbsweep"), src.schema)
    t.append(src)
    val old = FileTime.fromMillis(System.currentTimeMillis - 60000)
    def stage(stream: String): java.nio.file.Path = {
      val d = JPaths.get(t.location, "_changelog", stream, "0-3")
      src.limit(5).coalesce(1).write.parquet(d.toString)
      // age every staged file past the cutoff window
      val w = JFiles.walk(d)
      try w.iterator().forEachRemaining(p =>
        JFiles.setLastModifiedTime(p, old): Unit)
      finally w.close()
      d
    }
    val dead = stage("s-dead2")
    val live = stage("s-live")
    // a RUNNING stream refreshes this marker at every offset poll —
    // fresh heartbeat means the stream is alive even if staging is old
    JFiles.write(JPaths.get(t.location, "_changelog", "s-live",
      "_heartbeat"), Array.empty[Byte])
    val removed = t.removeOrphanFiles(olderThanMillis = 5000L)
    assert(!JFiles.exists(dead), "dead stream's range must be swept")
    assert(JFiles.exists(live),
      "live stream's staged range must survive the sweep")
    assert(removed.exists(_.contains("s-dead2")) &&
      !removed.exists(_.contains("s-live")))
  }

  test("appends reuse parent manifests; mutations rewrite only touched ones") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("mreuse"), src.schema,
      partitionBy = Seq(("l_shipdate", TYear, "ship_year")))
    t.append(src.filter(col("l_shipdate") < lit("1998-01-01")),
      repartitionByPartition = true)
    val m1 = t.liveManifests().map(_.path)
    t.append(src.filter(col("l_shipdate") >= lit("1998-01-01")),
      repartitionByPartition = true)
    val m2 = t.liveManifests().map(_.path)
    // append: the first snapshot's manifest is reused verbatim
    assert(m2.size == 2 && m2.take(1) == m1)
    // delete touching only late years: the early manifest survives
    t.deleteWhere(col("l_shipdate") >= lit("2001-01-01"))
    val m3 = t.liveManifests().map(_.path)
    assert(m3.contains(m1.head), "untouched manifest must be reused")
    assert(!m3.contains(m2(1)), "touched manifest must be replaced")
    assert(t.scan().count() ==
      src.filter(col("l_shipdate") < lit("2001-01-01")).count())
  }

  test("distributed planning agrees with driver-side planFiles") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("distplan"), src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)
    for (f <- Seq(
      col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"),
      col("l_orderkey") === 42L,
      col("l_returnflag") === "R")) {
      val driver = t.planFiles(Some(f)).map(_.path).sorted
      val dist = t.planFilesDistributed(Some(f)).collect()
        .map(_.getString(0)).sorted.toSeq
      assert(dist == driver, s"distributed plan diverged for $f")
    }
    // unfiltered: both list every live file
    assert(t.planFilesDistributed().count() == t.liveEntries().size)
  }

  test("streaming ingestion commits one snapshot per micro-batch") {
    val src = lineitem.limit(200)
    val stage = java.nio.file.Files.createTempDirectory("stream-in")
    src.limit(100).coalesce(1).write.parquet(s"$stage/b1")
    // move batch files into a watched dir one at a time
    val watched = java.nio.file.Files.createTempDirectory("stream-watch")
    def promote(sub: String): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$stage/$sub"))
        .iterator.asScala.filter(_.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.copy(p,
          java.nio.file.Paths.get(watched.toString, s"$sub-${p.getFileName}")))
    }
    promote("b1")
    val t = GraftTable.create(spark, freshLoc("ingest"), src.schema)
    val stream = spark.readStream.schema(src.schema).parquet(watched.toString)
    val chk = java.nio.file.Files.createTempDirectory("chk").toString
    val q1 = t.appendStream(stream, chk)
    q1.awaitTermination()
    assert(t.scan().count() == 100)
    assert(t.metadata.snapshots.get.size == 1)
    // second batch arrives; a fresh AvailableNow run picks up only the delta
    src.filter(col("l_linenumber") >= 1).limit(100).coalesce(1)
      .write.parquet(s"$stage/b2")
    promote("b2")
    val q2 = t.appendStream(
      spark.readStream.schema(src.schema).parquet(watched.toString), chk)
    q2.awaitTermination()
    assert(t.scan().count() == 200)
    assert(t.metadata.snapshots.get.size == 2)
    assert(t.metadata.snapshots.get.forall(
      _.summary.operation == Some("append")))
  }

  test("time travel and incremental read partition history exactly") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("tt"), src.schema)
    val s1 = t.append(src.filter(col("l_orderkey") % 2 === 0))
    val s2 = t.append(src.filter(col("l_orderkey") % 2 === 1))
    val even = src.filter(col("l_orderkey") % 2 === 0).count()
    val odd = src.filter(col("l_orderkey") % 2 === 1).count()
    assert(t.scan(asOf = Some(s1.snapshotId)).count() == even)
    assert(t.scan().count() == even + odd)
    assert(t.incrementalRead(s1.snapshotId, s2.snapshotId).count() == odd)
  }

  test("schema evolution: rename keeps field id, add projects null") {
    val part = Tables.tbl(spark, "/root/testdata/sf0.001", "part")
    val v1 = part.select("p_partkey", "p_name")
    val t = GraftTable.create(spark, freshLoc("evolve"), v1.schema)
    t.append(v1.limit(10))
    t.renameColumn("p_name", "part_name")
    t.addColumn("extra", org.apache.spark.sql.types.IntegerType)
    val out = t.scan()
    assert(out.columns.toSeq == Seq("p_partkey", "part_name", "extra"))
    assert(out.filter(col("part_name").isNull).count() == 0) // old data visible
    assert(out.filter(col("extra").isNull).count() == 10)    // new col null
    // name mapping records both names for the renamed field id
    val nm = t.metadata.currentSchema.nameMapping.get.toFieldIds
    assert(nm("p_name") == nm("part_name"))
  }

  test("v3 column defaults: initial-default backfills, write-default fills") {
    import spark.implicits._
    val part = Tables.tbl(spark, "/root/testdata/sf0.001", "part")
    val v1 = part.select("p_partkey", "p_name")
    val t = GraftTable.create(spark, freshLoc("defaults"), v1.schema)
    t.append(v1.limit(10))
    // add with BOTH defaults: pre-existing rows read the initial
    // default (metadata-only backfill); future writes omitting the
    // column get the write default
    t.addColumn("tier", org.apache.spark.sql.types.StringType,
      initialDefault = Some("legacy"), writeDefault = Some("standard"))
    t.addColumn("score", org.apache.spark.sql.types.LongType,
      initialDefault = Some("42"), writeDefault = None)
    val old = t.scan()
    assert(old.filter(col("tier") === "legacy").count() == 10)
    assert(old.filter(col("score") === 42L).count() == 10)
    // an append omitting ONLY tier: the write-default fills it (score
    // is provided explicitly — it has no write default)
    t.append(v1.limit(5).withColumn("score", lit(5L)))
    val both = t.scan()
    assert(both.count() == 15)
    assert(both.filter(col("tier") === "standard").count() == 5)
    assert(both.filter(col("tier") === "legacy").count() == 10)
    intercept[Exception] {
      // score has no write-default: omitting it stays an error
      t.append(v1.limit(1))
    }
    // explicit values always win over write-defaults
    t.append(v1.limit(3).withColumn("tier", lit("gold"))
      .withColumn("score", lit(7L)))
    assert(t.scan().filter(col("tier") === "gold" && col("score") === 7L)
      .count() == 3)
    // defaults survive the JSON round-trip AND the Avro export's schema
    val rt = graft.model.TableMetadataV2
      .fromJsonString(t.metadata.toJsonString)
    val f = rt.currentSchema.fieldByName("tier").get
    assert(f.initialDefault.contains("legacy") &&
      f.writeDefault.contains("standard"))
    // external-format read projects the initial default for old files
    val layout = java.nio.file.Files
      .createTempDirectory("defaults-layout").toString
    graft.table.IcebergInterop.exportTable(t, layout)
    val ext = graft.table.IcebergInterop.readTable(spark, layout)
    assert(ext.filter(col("tier") === "legacy").count() == 10)
    assert(ext.filter(col("score") === 42L).count() == 10)
  }

  test("delete is copy-on-write: untouched files survive by path") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("del"), src.schema,
      partitionBy = Seq(("l_shipdate", TYear, "ship_year")))
    t.append(src, repartitionByPartition = true)
    val before = t.liveEntries().map(_.path).toSet
    t.deleteWhere(col("l_shipdate") >= lit("2000-01-01"))
    val after = t.liveEntries().map(_.path).toSet
    assert(after.subsetOf(before ++ after)) // sanity
    assert((before intersect after).nonEmpty, "some files must be untouched")
    assert(t.scan().filter(col("l_shipdate") >= lit("2000-01-01")).count() == 0)
    assert(t.scan().count() ==
      src.filter(col("l_shipdate") < lit("2000-01-01")).count())
  }

  test("compaction shrinks file count, preserves rows, op=replace") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("compact"), src.schema)
    t.append(src.repartition(10))
    assert(t.liveEntries().size == 10)
    t.compact()
    assert(t.liveEntries().size == 1)
    assert(t.scan().count() == src.count())
    assert(t.metadata.currentSnapshot.get.summary.operation == Some("replace"))
  }

  test("expire snapshots deletes orphans but keeps ref'd history") {
    val src = lineitem.limit(100)
    val t = GraftTable.create(spark, freshLoc("expire"), src.schema)
    val s1 = t.append(src)
    t.createTag("keepme", s1.snapshotId)
    t.compact()
    val orphans = t.expireSnapshots(keepLast = 1)
    // s1 is tagged → its files are NOT orphaned even though only the
    // compacted snapshot is in the keep-last window
    assert(orphans.isEmpty)
    assert(t.scanRef("keepme").count() == 100)
    // drop the tag path: a fresh table without refs does orphan
    val t2 = GraftTable.create(spark, freshLoc("expire2"), src.schema)
    t2.append(src)
    t2.compact()
    val orphans2 = t2.expireSnapshots(keepLast = 1)
    assert(orphans2.nonEmpty)
    assert(orphans2.forall(p => !java.nio.file.Files.exists(
      java.nio.file.Paths.get(p))))
    assert(t2.scan().count() == 100)
  }

  test("age-based expiry keeps young snapshots regardless of count") {
    val src = lineitem.limit(50)
    val t = GraftTable.create(spark, freshLoc("expire3"), src.schema)
    val s1 = t.append(src)
    t.compact()
    // everything committed seconds ago → a 1h age rule retains ALL of it
    assert(t.expireSnapshots(keepLast = 1,
      olderThanMs = Some(3600L * 1000)).isEmpty)
    assert(t.scan(asOf = Some(s1.snapshotId)).count() == 50)
    // age 0 → the age rule protects nothing; count rule applies as before
    val orphans = t.expireSnapshots(keepLast = 1, olderThanMs = Some(0L))
    assert(orphans.nonEmpty)
    assert(t.scan().count() == 50)
  }

  test("struct-field filters prune files via dotted nested stats") {
    val src = lineitem.withColumn("meta",
      struct(col("l_orderkey").as("ok"), col("l_returnflag").as("flag")))
    val t = GraftTable.create(spark, freshLoc("nested"), src.schema)
    // range-clustered files → tight per-file min/max on meta.ok
    t.append(src.repartitionByRange(8, col("l_orderkey")),
      sortWithin = Seq(col("l_orderkey")))
    val total = t.liveEntries().size
    assert(total == 8)
    // nested stats were collected under the dotted path
    assert(t.liveEntries().forall(_.stats.contains("meta.ok")))
    val f = col("meta.ok") === 42L
    val planned = t.planFiles(Some(f))
    assert(planned.size < total, s"struct filter planned ${planned.size}/$total")
    assert(t.scan(Some(f)).count() == src.filter(f).count())
    assert(t.countRows(Some(f)) == src.filter(f).count())
    // distributed planner prunes the same way
    val dist = t.planFilesDistributed(Some(f)).count()
    assert(dist == planned.size.toLong)
    // string leaf too
    val g = col("meta.flag") === "R"
    assert(t.scan(Some(g)).count() == src.filter(g).count())
  }

  test("bin-pack compaction merges only undersized files, keeps the rest") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("binpack"), src.schema,
      partitionBy = Seq(("l_returnflag", TIdentity, "flag_p")))
    // one right-sized file per partition...
    t.append(src, repartitionByPartition = true)
    val healthy = t.liveEntries().map(_.path).toSet
    assert(t.liveEntries().forall(_.fileSize > 0L))
    // ...plus a spray of small files in ONE partition ("R")
    t.append(src.filter(col("l_returnflag") === "R").limit(200).repartition(8))
    val before = t.liveEntries()
    val smallR = before.map(_.path).toSet -- healthy
    assert(smallR.size == 8)
    val total = src.count() + 200
    // target sized between the small files and the healthy ones
    val healthySize = before.filter(e => healthy.contains(e.path))
      .map(_.fileSize).min
    val smallMax = before.filter(e => smallR.contains(e.path))
      .map(_.fileSize).max
    assert(smallMax < healthySize)
    t.compactBinPack(targetFileBytes = (smallMax + healthySize) / 2)
    val after = t.liveEntries().map(_.path).toSet
    // every right-sized file kept its ORIGINAL path; the 8 small files
    // are gone, replaced by fewer merged files
    assert(healthy.subsetOf(after))
    assert((after & smallR).isEmpty)
    assert(after.size < before.size)
    assert(t.scan().count() == total)
    // second run is a no-op: nothing undersized remains grouped
    val snapBefore = t.metadata.currentSnapshotId
    t.compactBinPack(targetFileBytes = (smallMax + healthySize) / 2)
    assert(t.metadata.currentSnapshotId == snapBefore)
  }

  test("equality deletes: key-addressed, sequence-scoped, stack with position deletes") {
    val src = lineitem.limit(1000)
    val t = GraftTable.create(spark, freshLoc("eqdel"), src.schema)
    t.append(src)
    val dataFiles = t.planFiles().map(_.path).toSet
    // delete all rows of two flags' keys by equality — no data touched
    val keys = src.filter(col("l_quantity") < 15).select("l_orderkey", "l_linenumber").distinct()
    t.deleteWhereEq(keys)
    assert(t.planFiles().map(_.path).toSet == dataFiles)
    val expect1 = src.join(keys, Seq("l_orderkey", "l_linenumber"), "left_anti")
    assert(t.scan().count() == expect1.count())
    assert(t.countRows() == expect1.count())
    // re-insert some of the deleted rows: younger sequence → they survive
    val back = src.join(keys, Seq("l_orderkey", "l_linenumber"), "left_semi").limit(50)
    val backRows = back.count()
    t.append(back)
    assert(t.scan().count() == expect1.count() + backRows)
    // filtered scans apply equality deletes too
    val f = col("l_returnflag") === "A"
    assert(t.scan(Some(f)).count() ==
      expect1.filter(f).count() + back.filter(f).count())
    // position delete on top composes
    t.deleteWhereMoR(col("l_returnflag") === "N")
    val expect3 = expect1.filter(col("l_returnflag") =!= "N").count() +
      back.filter(col("l_returnflag") =!= "N").count()
    assert(t.scan().count() == expect3)
    // compaction absorbs both delete kinds
    t.compact()
    assert(t.liveEntries().forall(_.isData))
    assert(t.scan().count() == expect3)
    assert(t.countRows() == expect3)
  }

  test("streaming batch commits are idempotent under replayed delivery") {
    val src = lineitem.limit(100)
    val t = GraftTable.create(spark, freshLoc("stream-idem"), src.schema)
    t.commitStreamBatch(src, 0L, "s1")
    t.commitStreamBatch(src, 0L, "s1") // at-least-once replay → skipped
    assert(t.scan().count() == 100)
    assert(t.metadata.snapshots.get.size == 1)
    t.commitStreamBatch(src, 1L, "s1") // genuinely new batch appends
    assert(t.scan().count() == 200)
    // an EMPTY batch commits nothing — no empty snapshot, and because
    // its id is not recorded, a later replay that DOES carry rows still
    // lands (round-15: the commit decision moved after the file write,
    // dropping the per-batch isEmpty job)
    t.commitStreamBatch(src.limit(0), 2L, "s1")
    assert(t.metadata.snapshots.get.size == 2)
    t.commitStreamBatch(src, 2L, "s1")
    assert(t.scan().count() == 300)
    assert(t.metadata.snapshots.get.size == 3)
  }

  test("equality deletes match NULL keys null-safely") {
    import spark.implicits._
    val src = Seq((1L, "a"), (2L, null), (3L, "c"), (4L, null))
      .toDF("id", "k")
    val t = GraftTable.create(spark, freshLoc("eqnull"), src.schema)
    t.append(src)
    // deleting key NULL must remove every null-keyed row
    t.deleteWhereEq(Seq(Option.empty[String]).toDF("k"))
    assert(t.scan().collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("merge-on-read deletes: no rewrite, exact counts, absorbed by compaction") {
    val src = lineitem.limit(1000)
    val t = GraftTable.create(spark, freshLoc("mor"), src.schema)
    t.append(src)
    val dataFilesBefore = t.planFiles().map(_.path).toSet
    val s1 = t.metadata.currentSnapshotId.get
    // first MoR delete: no data file touched
    t.deleteWhereMoR(col("l_quantity") < 10)
    assert(t.planFiles().map(_.path).toSet == dataFilesBefore)
    val expect1 = src.filter(!(col("l_quantity") < 10)).count()
    assert(t.scan().count() == expect1)
    assert(t.countRows() == expect1) // metadata-only: data minus deletes
    // overlapping second delete must not double-count positions
    t.deleteWhereMoR(col("l_quantity") < 20)
    val expect2 = src.filter(!(col("l_quantity") < 20)).count()
    assert(t.scan().count() == expect2)
    assert(t.countRows() == expect2)
    // filtered reads apply deletes too
    val f = col("l_returnflag") === "R"
    assert(t.scan(Some(f)).count() ==
      src.filter(f && !(col("l_quantity") < 20)).count())
    assert(t.countRows(Some(f)) ==
      src.filter(f && !(col("l_quantity") < 20)).count())
    // time travel to before the deletes sees every row
    assert(t.scan(asOf = Some(s1)).count() == 1000)
    // a CoW delete on top must not resurrect MoR-deleted rows
    t.deleteWhere(col("l_returnflag") === "N")
    val expect3 = src.filter(!(col("l_quantity") < 20) &&
      col("l_returnflag") =!= "N").count()
    assert(t.scan().count() == expect3)
    // the CoW rewrite must also rebuild the delete set: positions into
    // rewritten files are dead, and metadata-only counts stay exact
    assert(t.countRows() == expect3)
    // compaction absorbs the position-delete files entirely
    t.compact()
    assert(t.scan().count() == expect3)
    assert(t.liveEntries().forall(_.isData))
    assert(t.countRows() == expect3)
  }

  test("commits write manifests on executors; driver holds no per-file stats") {
    // a 10k-file append: the commit must reference executor-written shard
    // manifests via sequence-number inheritance — the driver never builds
    // a per-file entry list for fresh data
    val src = spark.range(10000).toDF("id")
      .withColumn("v", col("id") % 97)
    val t = GraftTable.create(spark, freshLoc("sharded"), src.schema)
    // one row per file → exactly 10k files from 32 write tasks
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    val snap =
      try t.append(src)
      finally spark.conf.set("spark.sql.files.maxRecordsPerFile", "0")
    val refs = t.liveManifests()
    assert(refs.nonEmpty)
    // every new manifest is a shard written by a Spark task under
    // manifest-shards-*/part-*, ref'd with inherited snapshot/sequence ids
    refs.foreach { r =>
      assert(r.path.contains("manifest-shards-"), r.path)
      assert(r.addedSnapshotId.contains(snap.snapshotId))
      assert(r.addedSequenceNumber.contains(snap.sequenceNumber))
    }
    // raw JSONL on disk still carries the pending sentinel (proof the
    // driver didn't rewrite/stamp the shards at commit time)...
    val raw = graft.table.DataFileEntry.readManifest(
      java.nio.file.Paths.get(refs.head.path))
    assert(raw.forall(_.snapshotId == graft.table.DataFileEntry.PendingSnapshot))
    // ...while every read path substitutes the inherited ids
    assert(refs.head.entries.forall(_.snapshotId == snap.snapshotId))
    val entries = t.liveEntries()
    assert(entries.size == 10000)
    assert(entries.map(_.recordCount).sum == 10000L)
    assert(entries.forall(_.sequenceNumber == snap.sequenceNumber))
    // stats survived the executor-side serialization: pruning + scans work
    assert(t.scan(Some(col("id") === 4242L)).count() == 1L)
    assert(t.planFiles(Some(col("id") === 4242L)).size < entries.size)
    assert(t.countRows(Some(col("v") === 0L)) ==
      src.filter(col("v") === 0L).count())
    // incremental read sees the inherited sequence number
    val before = snap.parentSnapshotId
    assert(before.isEmpty) // first commit
    // distributed planner reads the same shards
    assert(t.planFilesDistributed(None).count() == 10000L)
  }

  test("all-null column through the executor-shard path: stats None, pruning sound") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("id", "s")
    val allNull = df.filter(col("id") < 3).select(col("id"), col("s"))
      .coalesce(1)
    val t = GraftTable.create(spark, freshLoc("nullstats"), df.schema)
    t.append(allNull)
    // shards serialize stats on executors; an all-null column must read
    // back as None min/max (NOT the string "null", which would poison
    // lexical pruning comparisons — r5 ColStats fix)
    val st = t.liveEntries().head.stats("s")
    assert(st.min.isEmpty && st.max.isEmpty, s"stats read back as $st")
    assert(st.nulls == 2L)
    // pruning over the all-null file stays sound in both planners
    assert(t.scan(Some(col("s").isNull)).count() == 2L)
    assert(t.scan(Some(col("s") === "zzz")).count() == 0L)
    assert(t.planFiles(Some(col("s").isNotNull)).isEmpty) // nulls==count prunes
    spark.conf.set("spark.graft.distributedPlanningThreshold", "1")
    try {
      assert(t.scan(Some(col("s").isNull)).count() == 2L)
      assert(t.planFilesDistributed(Some(col("s").isNotNull)).count() == 0L)
    } finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  test("stream ids never collide across checkpoints; high-water mark survives expiry") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-streamid")
    // "Aa" and "BB" have equal String.hashCode — the old 32-bit id collided
    val c1 = root.resolve("Aa").toString
    val c2 = root.resolve("BB").toString
    assert(c1.hashCode == c2.hashCode)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = GraftTable.create(spark, freshLoc("streamid"), df.schema)
    val id1 = t.streamIdFor(c1)
    val id2 = t.streamIdFor(c2)
    assert(id1 != id2, "distinct checkpoints must get distinct stream ids")
    assert(t.streamIdFor(c1) == id1, "id must be stable across calls")
    t.commitStreamBatch(df, 7L, id1)
    assert(t.scan().count() == 2L)
    t.commitStreamBatch(df, 7L, id1) // replayed delivery → skipped
    assert(t.scan().count() == 2L)
    t.commitStreamBatch(df, 7L, id2) // OTHER stream, same batch id → lands
    assert(t.scan().count() == 4L)
    // the mark lives in table properties, not just expirable summaries
    (1 to 3).foreach(_ => t.append(df))
    t.expireSnapshots(1)
    t.commitStreamBatch(df, 7L, id1) // still skipped after expiry
    assert(t.scan().count() == 10L)
    t.commitStreamBatch(df, 8L, id1) // a NEW batch still lands
    assert(t.scan().count() == 12L)
  }

  test("sorted write produces disjoint per-file key ranges") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("sorted"), src.schema)
    t.append(src.repartitionByRange(6, col("l_orderkey")),
      sortWithin = Seq(col("l_orderkey")))
    val ranges = t.liveEntries().flatMap { e =>
      for {
        st <- e.stats.get("l_orderkey")
        mn <- st.min; mx <- st.max
      } yield (BigDecimal(mn), BigDecimal(mx))
    }.sortBy(_._1)
    assert(ranges.size == 6)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax <= bMin)
      case _ =>
    }
  }

  test("replaceSortOrder clusters new writes; records-per-file cap sizes them") {
    import spark.implicits._
    val loc = freshLoc("sortevolve")
    val rows = (1L to 1000L).map(i => ((i * 613) % 1000, s"v$i"))
      .toDF("k", "v")
    val t = GraftTable.create(spark, loc, rows.schema)
    t.append(rows.coalesce(1))
    // pre-evolution file is unclustered (scattered insert order)
    def fileRows(path: String): Seq[Long] =
      spark.read.parquet(path).select("k").collect().map(_.getLong(0)).toSeq
    val before = fileRows(t.liveEntries().head.path)
    assert(before != before.sorted, "test premise: unsorted input")

    // evolve the default sort order; metadata is spec-shaped
    t.replaceSortOrder(Seq(("k", TIdentity)))
    assert(t.metadata.defaultSortOrderId == 1L)
    assert(t.metadata.sortOrders.map(_.orderId) == Seq(0, 1))
    // a second replace appends another order and moves the default
    t.replaceSortOrder(Seq(("k", TIdentity)))
    assert(t.metadata.defaultSortOrderId == 2L)
    intercept[IllegalArgumentException] {
      t.replaceSortOrder(Seq(("nope", TIdentity)))
    }

    // new writes cluster on the evolved order without any explicit sort
    val snap = t.append(rows.coalesce(1))
    val newFiles = t.liveEntries()
      .filter(_.snapshotId == snap.snapshotId).map(_.path)
    assert(newFiles.nonEmpty)
    newFiles.foreach { p =>
      val ks = fileRows(p)
      assert(ks == ks.sorted, s"$p not clustered on evolved order")
    }

    // write.target-records-per-file bounds file sizes from a property
    t.updateProperties(Map("write.target-records-per-file" -> Some("150")))
    val snap2 = t.append(rows.coalesce(1))
    val sized = t.liveEntries().filter(_.snapshotId == snap2.snapshotId)
    assert(sized.size >= 7, s"expected >=7 capped files, got ${sized.size}")
    assert(sized.forall(_.recordCount <= 150),
      s"files exceed the cap: ${sized.map(_.recordCount)}")
    // each rolled file is still internally clustered
    sized.map(_.path).foreach { p =>
      val ks = fileRows(p)
      assert(ks == ks.sorted, s"sized file $p lost clustering")
    }
  }

  test("rewritePositionDeletes consolidates MoR delete files exactly") {
    val src = lineitem.limit(600).cache()
    val t = GraftTable.create(spark, freshLoc("posrw"), src.schema)
    t.append(src)
    // five MoR delete commits → five position-delete files
    (0 until 5).foreach(i =>
      t.deleteWhereMoR(col("l_orderkey") % 11 === i))
    def delFiles: Seq[_root_.graft.table.ManifestRef] =
      t.liveManifests().filter(_.content == 1)
    assert(delFiles.map(_.entryCount).sum == 5)
    val expect = src.filter(col("l_orderkey") % 11 >= 5)
    val wantRows = expect.count()
    assert(t.scan().count() == wantRows)
    assert(t.countRows() == wantRows) // metadata-only count agrees

    val snap = t.rewritePositionDeletes()
    assert(snap.summary.other("consolidated-delete-files") == "5")
    assert(delFiles.map(_.entryCount).sum == 1, "expected one delete file")
    // nothing changed semantically: scan, metadata count, eq behavior
    assert(t.scan().count() == wantRows)
    assert(t.countRows() == wantRows)
    assert(t.scan().exceptAll(expect).isEmpty &&
      expect.exceptAll(t.scan()).isEmpty)
    // further mutation still composes: another MoR delete then compact
    t.deleteWhereMoR(col("l_orderkey") % 11 === 5)
    val want2 = src.filter(col("l_orderkey") % 11 >= 6).count()
    assert(t.scan().count() == want2 && t.countRows() == want2)
    t.compactBinPack()
    assert(t.scan().count() == want2)
    // a second consolidation (possibly a no-op) changes nothing
    t.rewritePositionDeletes()
    assert(t.scan().count() == want2)
    assert(t.countRows() == want2)
  }

  test("convertEqualityDeletes materializes positions, counts return") {
    import spark.implicits._
    val df0 = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, freshLoc("eqconv"), df0.schema)
    t.append(df0.filter(col("id") <= 100))
    // stack the tricky shapes: a position delete, two eq-delete commits
    // on different column sets, and a RE-INSERT of a deleted key (the
    // sequence-scoped case conversion must preserve)
    t.deleteWhereMoR(col("id") === 7L)
    t.deleteWhereEq(Seq(5L, 6L, 7L).toDF("id")) // 7 already pos-deleted
    t.deleteWhereEq(Seq(("v10")).toDF("v"))
    t.append(df0.filter(col("id") === 5L)) // id 5 re-inserted, survives
    val expect = df0.filter(col("id") <= 100)
      .filter(!col("id").isin(6L, 7L, 10L))
    def sameAsExpected(): Unit = {
      assert(t.scan().count() == expect.count())
      assert(t.scan().exceptAll(expect).isEmpty &&
        expect.exceptAll(t.scan()).isEmpty)
    }
    sameAsExpected()
    // metadata-only count refuses while eq deletes live (falls through
    // to an exact scan-count inside countRows)
    assert(t.countRows() == expect.count())

    val snap = t.convertEqualityDeletes()
    assert(snap.summary.other("converted-equality-files").toLong >= 2)
    // 6 and 10 materialized; 7 was already position-deleted; the
    // re-inserted 5 survives (its row is NEWER than the eq delete)
    assert(snap.summary.other("materialized-positions").toLong == 3)
    assert(t.liveManifests().forall(_.content != 2), "eq manifests live")
    sameAsExpected()
    assert(t.countRows() == expect.count())
    // time travel BEFORE the conversion still applies eq semantics
    val preConv = t.metadata.snapshots.get
      .sortBy(_.sequenceNumber).takeRight(2).head
    assert(t.scan(asOf = Some(preConv.snapshotId)).count() == expect.count())
    // conversion is idempotent once nothing equality-shaped remains
    t.convertEqualityDeletes()
    sameAsExpected()
  }

  test("append summaries carry exact added-file/record counts") {
    import spark.implicits._
    val rows = (1L to 120L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, freshLoc("addsum"), rows.schema)
    val s1 = t.append(rows.repartition(3))
    assert(s1.summary.other("added-data-files").toLong == 3)
    assert(s1.summary.other("added-records").toLong == 120)
    val s2 = t.append(rows.limit(30).coalesce(1))
    assert(s2.summary.other("added-data-files").toLong == 1)
    assert(s2.summary.other("added-records").toLong == 30)
    // non-append commits do NOT claim exact adds (their shards may
    // carry rewritten survivors)
    val s3 = t.deleteWhere(col("id") <= 10)
    assert(!s3.summary.other.contains("added-data-files"))
  }

  test("write.distribution-mode shapes append layout declaratively") {
    import spark.implicits._
    // range: scattered input globally range-shuffles on the sort order →
    // disjoint per-file key ranges without the caller pre-shuffling
    val src = lineitem
    val tr = GraftTable.create(spark, freshLoc("distrange"), src.schema,
      sortOrder = Seq(("l_orderkey", TIdentity)),
      properties = Map("write.distribution-mode" -> "range"))
    // AQE rightly coalesces a tiny range shuffle to one partition; pin
    // several output files to make the disjointness observable
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "6")
    try tr.append(src.repartition(8))
    finally {
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
    }
    val ranges = tr.liveEntries().flatMap { e =>
      for {
        st <- e.stats.get("l_orderkey")
        mn <- st.min; mx <- st.max
      } yield (BigDecimal(mn), BigDecimal(mx))
    }.sortBy(_._1)
    assert(ranges.size > 1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, "range-mode files must not overlap")
      case _ =>
    }
    assert(tr.scan().count() == src.count())

    // hash: partitioned table clusters by partition tuple → one file per
    // live partition value even from scattered input
    val rows = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val th = GraftTable.create(spark, freshLoc("disthash"), rows.schema,
      partitionBy = Seq(("g", TIdentity, "g_p")),
      properties = Map("write.distribution-mode" -> "hash"))
    th.append(rows.repartition(8))
    assert(th.liveEntries().size == 3,
      s"expected one file per partition value, got ${th.liveEntries().size}")
    assert(th.scan().count() == 300)

    // unknown modes fail loudly
    val tb = GraftTable.create(spark, freshLoc("distbad"), rows.schema,
      properties = Map("write.distribution-mode" -> "zigzag"))
    intercept[IllegalArgumentException] { tb.append(rows) }
  }

  test("streaming read refuses a table with non-append history") {
    val src = lineitem.limit(200)
    val t = GraftTable.create(spark, freshLoc("streamguard"), src.schema)
    t.append(src)
    t.readStream() // append-only history is fine
    t.deleteWhere(col("l_orderkey") % 2 === 0)
    val e = intercept[IllegalArgumentException](t.readStream())
    assert(e.getMessage.contains("append-only"),
      s"wrong failure: ${e.getMessage}")
  }
}
