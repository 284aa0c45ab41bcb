package graft

import graft.model._
import graft.table.{GraftTable, ManifestRef}
import org.apache.spark.sql.functions._

/** Maintenance at scale: snapshot expiry, orphan cleanup, and the
  * files/all_files metadata tables must all threshold-dispatch to the
  * manifest dataset — `ManifestRef.entriesReads` counts driver-side
  * entry materializations, and these bounds fail if maintenance
  * regresses to a driver loop over the table's entry list. Plus per-ref
  * Retention enforcement (reference snapshot.rs:70-95).
  */
class MaintenancePlanningSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def readCount(body: => Unit): Long = {
    val before = ManifestRef.entriesReads.get()
    body
    ManifestRef.entriesReads.get() - before
  }

  private def withThreshold[A](n: Long)(body: => A): A = {
    spark.conf.set("spark.graft.distributedPlanningThreshold", n.toString)
    try body
    finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  private def df(from: Long, until: Long) =
    spark.range(from, until).select(col("id"),
      col("id").cast("string").as("v"))

  test("expireSnapshots plans distributedly: entriesReads == 0") {
    val t = GraftTable.create(spark, freshLoc("dexp"), df(0, 1).schema)
    t.append(df(0, 100).coalesce(1))
    t.append(df(100, 200).coalesce(1))
    t.compact()
    val liveBefore = t.scan().count()
    withThreshold(1) {
      var orphans: Seq[String] = Seq.empty
      val n = readCount { orphans = t.expireSnapshots(keepLast = 1) }
      assert(n == 0, s"expiry materialized $n manifests driver-side")
      assert(orphans.nonEmpty, "compacted-away files must orphan")
      orphans.foreach(p =>
        assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
          s"orphan $p not deleted"))
    }
    assert(t.metadata.snapshots.get.size == 1)
    assert(t.scan().count() == liveBefore)
  }

  test("removeOrphanFiles plans distributedly: entriesReads == 0") {
    val t = GraftTable.create(spark, freshLoc("dorph"), df(0, 1).schema)
    t.append(df(0, 100).coalesce(1))
    t.append(df(100, 200).coalesce(1))
    // leak an uncommitted file into the data dir
    df(900, 950).coalesce(1).write.mode("append")
      .parquet(t.location + "/data/leaked")
    withThreshold(1) {
      var removed: Seq[String] = Seq.empty
      val n = readCount { removed = t.removeOrphanFiles(olderThanMillis = 0L) }
      assert(n == 0, s"orphan scan materialized $n manifests driver-side")
      assert(removed.exists(_.contains("/data/leaked/")),
        s"leaked file not swept: $removed")
    }
    // live data survived the distributed reachability diff
    assert(t.scan().count() == 200)
  }

  test("files/all_files serve from the manifest dataset above threshold") {
    val t = GraftTable.create(spark, freshLoc("dfiles"), df(0, 1).schema)
    t.append(df(0, 100).coalesce(1))
    t.append(df(100, 200).coalesce(2))
    t.compact()
    // driver-side reference content (threshold high → driver path)
    val filesRef = t.filesDf.collect().map(_.toSeq).toSet
    val allRef = t.allFilesDf.collect().map(_.toSeq).toSet
    val entriesRef = t.entriesDf.collect().map(_.toSeq).toSet
    val allEntriesRef = t.allEntriesDf.collect().map(_.toSeq).toSet
    assert(entriesRef.nonEmpty && allEntriesRef.size > entriesRef.size)
    withThreshold(1) {
      var files: Set[Seq[Any]] = Set.empty
      var all: Set[Seq[Any]] = Set.empty
      var ents: Set[Seq[Any]] = Set.empty
      var allEnts: Set[Seq[Any]] = Set.empty
      val n = readCount {
        files = t.filesDf.collect().map(_.toSeq).toSet
        all = t.allFilesDf.collect().map(_.toSeq).toSet
        ents = t.entriesDf.collect().map(_.toSeq).toSet
        allEnts = t.allEntriesDf.collect().map(_.toSeq).toSet
      }
      assert(n == 0, s"metadata tables materialized $n manifests driver-side")
      assert(files == filesRef)
      assert(all == allRef)
      assert(ents == entriesRef)
      assert(allEnts == allEntriesRef)
    }
  }

  test("retention: aged-out tag drops and unpins its snapshot") {
    val t = GraftTable.create(spark, freshLoc("rtag"), df(0, 1).schema)
    t.append(df(0, 100).coalesce(1))
    val s1 = t.metadata.currentSnapshotId.get
    t.append(df(100, 200).coalesce(1))
    t.compact()
    val s3 = t.metadata.currentSnapshotId.get
    t.createTag("rc-old", s1, maxRefAgeMs = 0L)
    t.createTag("rc-keep", s1) // default: never ages out
    Thread.sleep(5)
    t.expireSnapshots(keepLast = 1)
    val meta = t.metadata
    assert(!meta.refs.get.contains("rc-old"), "aged-out tag must drop")
    assert(meta.refs.get.contains("rc-keep"))
    // the surviving tag pins s1; unpinned s2 expires (its rows live on
    // in the compacted file)
    assert(meta.snapshots.get.map(_.snapshotId).toSet == Set(s1, s3))
    assert(t.scan().count() == 200)
    // once the last pin ages out, s1 expires and its file goes too
    val t2 = GraftTable.load(spark, t.location)
    t2.createTag("rc-keep", s1, maxRefAgeMs = 0L)
    Thread.sleep(5)
    val orphans2 = t2.expireSnapshots(keepLast = 1)
    assert(orphans2.nonEmpty)
    assert(t2.metadata.snapshots.get.size == 1)
    assert(t2.scan().count() == 200)
  }

  test("retention: branch minSnapshotsToKeep pins ancestors") {
    val t = GraftTable.create(spark, freshLoc("rbr"), df(0, 1).schema)
    t.append(df(0, 100).coalesce(1))
    val s1 = t.metadata.currentSnapshotId.get
    t.append(df(100, 200).coalesce(1))
    val s2 = t.metadata.currentSnapshotId.get
    t.append(df(200, 300).coalesce(1))
    val s3 = t.metadata.currentSnapshotId.get
    t.createBranch("audit", s3,
      BranchRetention(2, Long.MaxValue, Long.MaxValue))
    t.expireSnapshots(keepLast = 1)
    val kept = t.metadata.snapshots.get.map(_.snapshotId).toSet
    assert(kept == Set(s2, s3),
      s"minSnapshotsToKeep=2 must keep head+parent, kept $kept (s1=$s1)")
  }

  test("retention: branch maxSnapshotAgeMs keeps young ancestors") {
    val t = GraftTable.create(spark, freshLoc("rage"), df(0, 1).schema)
    (0 until 3).foreach(k => t.append(df(k * 100L, k * 100L + 100L).coalesce(1)))
    val head = t.metadata.currentSnapshotId.get
    t.createBranch("fresh", head,
      BranchRetention(1, 3600000L, Long.MaxValue))
    t.expireSnapshots(keepLast = 1)
    // every ancestor is younger than an hour → all three survive
    assert(t.metadata.snapshots.get.size == 3)
  }

  test("shared-files tables refuse expiry (clone cache protection)") {
    val t = GraftTable.create(spark, freshLoc("shared"), df(0, 1).schema)
    t.append(df(0, 10))
    t.append(df(10, 20))
    t.updateProperties(Map(GraftTable.SharedFilesProp -> Some("true")))
    val e = intercept[IllegalArgumentException] {
      t.expireSnapshots(keepLast = 1)
    }
    assert(e.getMessage.contains("shared"), e.getMessage)
    // the orphan sweep stays allowed — it only walks THIS location
    t.removeOrphanFiles()
    assert(t.scan().count() == 20)
  }

  test("a live sink query's heartbeat protects its staged epoch " +
      "from the orphan sweep; a stale one does not") {
    val loc = freshLoc("hb")
    val t = GraftTable.create(spark, loc, df(0, 1).schema)
    t.append(df(0, 5))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis - 7200000L)
    def stage(query: String, heartbeatFresh: Boolean): java.nio.file.Path = {
      val epoch = java.nio.file.Paths.get(loc, "stream-staging", query, "3")
      java.nio.file.Files.createDirectories(epoch)
      val f = epoch.resolve("part-x.parquet")
      java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
      java.nio.file.Files.setLastModifiedTime(f, old)
      java.nio.file.Files.setLastModifiedTime(epoch, old)
      val hb = epoch.getParent.resolve("_heartbeat")
      java.nio.file.Files.write(hb, Array.emptyByteArray)
      if (!heartbeatFresh) java.nio.file.Files.setLastModifiedTime(hb, old)
      epoch
    }
    val live = stage("qlive", heartbeatFresh = true)
    val dead = stage("qdead", heartbeatFresh = false)
    t.removeOrphanFiles(olderThanMillis = 3600000L)
    assert(java.nio.file.Files.exists(live.resolve("part-x.parquet")),
      "live query's staged epoch was swept despite a fresh heartbeat")
    assert(!java.nio.file.Files.exists(dead),
      "dead query's stale epoch survived the sweep")
  }
}
