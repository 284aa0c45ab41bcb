package graft

import graft.table.{Dv, GraftTable, IcebergInterop}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deletion vectors (the Iceberg-v3 merge-on-read delete form): codec
  * round-trips, one-DV-per-file supersession, exact counts, interplay
  * with CoW rewrites / compaction / manifest rewrites / changelog /
  * orphan cleanup, and the export refusal seam.
  */
class DvSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def lineitem: DataFrame =
    Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")

  // ------------------------------------------------------------- codec ----

  test("DV codec round-trips empty, single, dense, sparse, large") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(7L),
      (0L until 1000L).toArray,                       // dense run
      Array(0L, 1L, 1000000L, 1000001L, 1L << 40),    // sparse jumps
      (0L until 100000L).map(_ * 37L).toArray)        // large
    cases.foreach { ps =>
      val bytes = Dv.encode(ps)
      assert(Dv.decode(bytes).sameElements(ps))
    }
  }

  test("DV codec rejects corruption instead of resurrecting rows") {
    val bytes = Dv.encode(Array(1L, 5L, 9L))
    intercept[IllegalArgumentException] {
      Dv.decode(bytes.take(bytes.length - 1)) // truncated
    }
    intercept[IllegalArgumentException] {
      Dv.decode("XXXX0000".getBytes) // bad magic
    }
    intercept[IllegalArgumentException] {
      Dv.encode(Array(5L, 5L)) // not strictly increasing
    }
  }

  // ------------------------------------------------- delete semantics ----

  test("deleteWhereDv deletes exactly the matching rows, no data rewrite") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("dv"), src.schema)
    t.append(src.repartition(4))
    val before = t.planFiles().map(_.path).toSet
    t.deleteWhereDv(col("l_returnflag") === "R")
    assert(t.planFiles().map(_.path).toSet == before)
    val expected = src.filter(col("l_returnflag") =!= "R").count()
    assert(t.scan().count() == expected)
    assert(t.countRows() == expected) // metadata-only under DVs
    val dvEntries = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries)
    assert(dvEntries.nonEmpty && dvEntries.forall(_.dv.isDefined))
  }

  test("a second DV delete merges per file: at most one DV per data file") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("dv-merge"), src.schema)
    t.append(src.repartition(4))
    t.deleteWhereDv(col("l_returnflag") === "R")
    t.deleteWhereDv(col("l_quantity") < 5)
    val dvFiles = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries).flatMap(_.dv.map(_.dataFile))
    assert(dvFiles.nonEmpty)
    assert(dvFiles.distinct.size == dvFiles.size,
      s"duplicate DVs per data file: $dvFiles")
    val expected = src.filter(col("l_returnflag") =!= "R" &&
      col("l_quantity") >= 5).count()
    assert(t.scan().count() == expected)
    assert(t.countRows() == expected)
  }

  test("write.delete.format=deletion-vectors routes deleteWhereMoR") {
    val src = lineitem.limit(500)
    val t = GraftTable.create(spark, freshLoc("dv-prop"), src.schema,
      properties = Map(GraftTable.DeleteFormatProp -> "deletion-vectors"))
    t.append(src)
    t.deleteWhereMoR(col("l_linenumber") === 1)
    val delEntries = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries)
    assert(delEntries.nonEmpty && delEntries.forall(_.dv.isDefined),
      "property must route the MoR delete to deletion vectors")
  }

  test("DV sidecar Puffin footers carry the real commit ids, not -1s") {
    val src = lineitem.limit(800)
    val t = GraftTable.create(spark, freshLoc("dv-stamp"), src.schema)
    t.append(src)
    val snap1 = t.deleteWhereDv(col("l_linenumber") === 1)
    def sidecars = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries).filter(_.dv.isDefined).map(_.path).distinct
    sidecars.foreach { s =>
      val blobs = graft.table.Puffin.readFooter(java.nio.file.Paths.get(s))
      assert(blobs.nonEmpty)
      blobs.foreach { b =>
        assert(b.snapshotId == snap1.snapshotId,
          s"footer snapshot-id ${b.snapshotId} != ${snap1.snapshotId}")
        assert(b.sequenceNumber == snap1.sequenceNumber)
      }
    }
    // the stamped file still reads exactly (blob offsets untouched)
    val expected = src.filter(col("l_linenumber") =!= 1).count()
    assert(t.scan().count() == expected)
    // a superseding delete writes fresh sidecars stamped with ITS ids
    val snap2 = t.deleteWhereDv(col("l_linenumber") === 2)
    sidecars.foreach { s =>
      graft.table.Puffin.readFooter(java.nio.file.Paths.get(s)).foreach {
        b => assert(b.snapshotId == snap2.snapshotId) }
    }
    assert(t.scan().count() ==
      src.filter(col("l_linenumber") =!= 1 &&
        col("l_linenumber") =!= 2).count())
  }

  test("a DV commit permanently raises the declared format-version to 3") {
    val src = lineitem.limit(300)
    val t = GraftTable.create(spark, freshLoc("dv-fv"), src.schema)
    t.append(src)
    assert(t.metadata.toJsonString.contains("\"format-version\":2"),
      "plain v2 table must not over-declare")
    t.deleteWhereDv(col("l_linenumber") === 1)
    assert(t.metadata.toJsonString.contains("\"format-version\":3"),
      "DVs are v3-only manifest features; metadata must agree")
    // sticky: even after compaction rewrites the DVs away, the table
    // stays v3 (format versions never decrease)
    t.compact()
    assert(t.liveManifests(None).flatMap(_.entries).forall(_.dv.isEmpty))
    assert(t.metadata.toJsonString.contains("\"format-version\":3"),
      "format floor must not decay when DVs are compacted away")
  }

  test("DV positions survive re-appended rows (only old files vectored)") {
    val src = lineitem.limit(1000)
    val t = GraftTable.create(spark, freshLoc("dv-app"), src.schema)
    t.append(src)
    t.deleteWhereDv(col("l_linenumber") === 2)
    // rows appended after the DV are untouched by it
    val re = src.filter(col("l_linenumber") === 2).limit(10)
    t.append(re)
    val expected = src.filter(col("l_linenumber") =!= 2).count() + 10
    assert(t.scan().count() == expected)
  }

  // -------------------------------------------- maintenance interplay ----

  test("CoW rewrite drops a rewritten file's DV metadata-only") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("dv-cow"), src.schema)
    t.append(src.repartition(4))
    t.deleteWhereDv(col("l_returnflag") === "R")
    // CoW delete rewrites the files matching this predicate; their DVs
    // are superseded by the rewrite and must drop out
    t.deleteWhere(col("l_quantity") < 5)
    val expected = src.filter(col("l_returnflag") =!= "R" &&
      col("l_quantity") >= 5).count()
    assert(t.scan().count() == expected)
    // no DV may reference a file that is no longer live
    val live = t.planFiles().map(_.path).toSet
    def decode(raw: String): String =
      try new java.net.URI(raw).getPath
      catch { case _: Exception => raw.stripPrefix("file:") }
    val danglers = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries).flatMap(_.dv.map(_.dataFile))
      .filterNot(d => live.contains(decode(d)))
    assert(danglers.isEmpty, s"DVs referencing dead files: $danglers")
  }

  test("export carries live DVs in spec form; external read applies them") {
    val src = lineitem.limit(2000)
    val t = GraftTable.create(spark, freshLoc("dv-compact"), src.schema)
    t.append(src)
    t.deleteWhereDv(col("l_linenumber") === 3)
    val expected = src.filter(col("l_linenumber") =!= 3).count()
    // un-compacted: the export references the Puffin sidecars directly
    // (referenced_data_file/content_offset/content_size_in_bytes) and
    // the external-format read decodes + applies them
    val dir = java.nio.file.Files.createTempDirectory("dv-exp").toString
    IcebergInterop.exportTable(t, dir)
    assert(IcebergInterop.readTable(spark, dir).count() == expected)
    // compaction absorbs the DVs; the absorbed layout exports too
    t.compact()
    assert(t.liveManifests(None).forall(_.content == 0))
    assert(t.scan().count() == expected)
    val dir2 = java.nio.file.Files.createTempDirectory("dv-exp2").toString
    IcebergInterop.exportTable(t, dir2)
    assert(IcebergInterop.readTable(spark, dir2).count() == expected)
  }

  test("rewriteManifests carries DVs losslessly through the dataset") {
    val src = lineitem
    val t = GraftTable.create(spark, freshLoc("dv-rwm"), src.schema)
    t.append(src.repartition(2))
    t.append(src.limit(0)) // second manifest so the rewrite consolidates
    t.deleteWhereDv(col("l_returnflag") === "R")
    val expected = src.filter(col("l_returnflag") =!= "R").count()
    t.rewriteManifests(targetEntriesPerManifest = 1000L)
    val dvAfter = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries).filter(_.dv.isDefined)
    assert(dvAfter.nonEmpty, "manifest rewrite must not drop DV refs")
    assert(t.scan().count() == expected)
    assert(t.countRows() == expected)
  }

  test("rewritePositionDeletes consolidates parquet deletes, carries DVs") {
    val src = lineitem.limit(3000)
    val t = GraftTable.create(spark, freshLoc("dv-rpd"), src.schema)
    t.append(src)
    t.deleteWhereMoR(col("l_linenumber") === 1) // parquet form
    t.deleteWhereMoR(col("l_linenumber") === 2) // parquet form
    t.deleteWhereDv(col("l_linenumber") === 3)  // vector form
    t.rewritePositionDeletes()
    val delEntries = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries)
    assert(delEntries.count(_.dv.isDefined) >= 1)
    val expected = src.filter(!col("l_linenumber").isin(1, 2, 3)).count()
    assert(t.scan().count() == expected)
    assert(t.countRows() == expected)
  }

  test("orphan cleanup sweeps abandoned DV sidecars, keeps live ones") {
    val src = lineitem.limit(1000)
    val loc = freshLoc("dv-orph")
    val t = GraftTable.create(spark, loc, src.schema)
    t.append(src)
    t.deleteWhereDv(col("l_linenumber") === 1)
    // plant an abandoned sidecar (a conflict-aborted attempt's leftover)
    val dead = java.nio.file.Paths.get(loc, "deletes", "dv-dead")
    java.nio.file.Files.createDirectories(dead)
    val deadFile = dead.resolve("part-x.puffin")
    java.nio.file.Files.write(deadFile, Dv.encode(Array(1L, 2L)))
    java.nio.file.Files.setLastModifiedTime(deadFile,
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    val removed = t.removeOrphanFiles(olderThanMillis = 0L)
    assert(removed.exists(_.endsWith("part-x.puffin")),
      s"abandoned DV sidecar not swept: $removed")
    val expected = src.filter(col("l_linenumber") =!= 1).count()
    assert(t.scan().count() == expected) // live sidecar survived
  }

  // --------------------------------------------------------- changelog ----

  test("changelog emits per-commit DV deltas, not the merged vector") {
    val src = lineitem.limit(2000)
    val t = GraftTable.create(spark, freshLoc("dv-cdc"), src.schema)
    t.append(src)
    val s0 = t.metadata.currentSnapshotId.get
    t.deleteWhereDv(col("l_linenumber") === 1)
    val s1 = t.metadata.currentSnapshotId.get
    t.deleteWhereDv(col("l_linenumber") === 2)
    val s2 = t.metadata.currentSnapshotId.get
    val d1 = src.filter(col("l_linenumber") === 1).count()
    val d2 = src.filter(col("l_linenumber") === 2).count()
    val all = t.changes(s0, s2)
    assert(all.filter(col("_change_type") === "delete").count() == d1 + d2)
    // the second commit alone must emit ONLY its own rows, even though
    // its DV blob physically contains the first commit's positions too
    val second = t.changes(s1, s2)
    assert(second.filter(col("_change_type") === "delete").count() == d2)
    assert(second.filter(col("_change_type") === "delete")
      .filter(col("l_linenumber") === 1).count() == 0)
  }

  // --------------------------------------------------- metadata tables ----

  test("position_deletes metadata table includes decoded DV positions") {
    val src = lineitem.limit(1000)
    val t = GraftTable.create(spark, freshLoc("dv-meta"), src.schema)
    t.append(src)
    t.deleteWhereMoR(col("l_linenumber") === 1) // parquet
    t.deleteWhereDv(col("l_linenumber") === 2)  // vector
    val pd = t.positionDeletesDf
    val deleted = src.filter(col("l_linenumber").isin(1, 2)).count()
    assert(pd.count() == deleted)
    assert(pd.filter(col("delete_file").endsWith(".puffin")).count() ==
      src.filter(col("l_linenumber") === 2).count())
  }
}
