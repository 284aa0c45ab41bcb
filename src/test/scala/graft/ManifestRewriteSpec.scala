package graft

import graft.table.{Blooms, GraftTable}
import org.apache.spark.sql.functions._

/** Metadata-only manifest consolidation: many-commit tables collapse to
  * one manifest per content type with identical read/pruning/incremental
  * semantics, and prior snapshots stay readable until expired.
  */
class ManifestRewriteSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-rw").toString + "/t"

  test("orphaned shard files from failed attempts are swept") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("shard-sweep")
    val live = dir.resolve("shard-live00000001.jsonl")
    Files.writeString(live, "{}\n")
    // a failed/speculative attempt's attempt-unique file: no rollup line
    // ever references it, and before the sweep nothing deleted it
    Files.writeString(dir.resolve("shard-orphan0000.jsonl"), "{}\n")
    // non-shard files (whatever a future layout adds) are not touched
    Files.writeString(dir.resolve("_other"), "x")
    GraftTable.sweepOrphanShards(dir,
      Seq(GraftTable.ShardRef(live.toString, 1L, 1L)))
    assert(Files.exists(live), "referenced shard must survive")
    assert(!Files.exists(dir.resolve("shard-orphan0000.jsonl")),
      "unreferenced shard must be deleted")
    assert(Files.exists(dir.resolve("_other")))
  }

  test("a commit leaves no unreferenced shard files behind") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val loc = tmp()
    val t = GraftTable.create(spark, loc,
      (1L to 4L).map(i => (i, i.toDouble)).toDF("id", "v").schema)
    t.append((1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v"))
    t.append((101L to 200L).map(i => (i, i.toDouble)).toDF("id", "v"))
    // every shard file on disk must be referenced by some snapshot's
    // manifest list — the invariant the sweep maintains
    val referenced = t.metadata.snapshots.getOrElse(Seq.empty)
      .flatMap(s => t.liveManifests(Some(s.snapshotId)))
      .map(m => new java.io.File(m.path).getName).toSet
    val metaDir = java.nio.file.Paths.get(loc, "metadata")
    val onDisk = java.nio.file.Files.walk(metaDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("shard-"))
      .map(_.getFileName.toString).toList
    assert(onDisk.nonEmpty && onDisk.forall(referenced.contains),
      s"unreferenced shards on disk: ${onDisk.filterNot(referenced)}")
  }

  test("consolidation preserves every read path exactly") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(),
      (1L to 4L).map(i => (i, i.toDouble)).toDF("id", "v").schema,
      properties = Map(Blooms.ColumnsProp -> "id"))
    // five appends (five-plus manifests), then MoR + equality deletes
    (0 until 5).foreach { k =>
      t.append(((k * 100L + 1L) to (k * 100L + 80L))
        .map(i => (i, i.toDouble)).toDF("id", "v"))
    }
    val midSnapshot = t.metadata.currentSnapshotId.get
    t.append((901L to 950L).map(i => (i, i.toDouble)).toDF("id", "v"))
    t.deleteWhereMoR(col("id") % 10 === 0)
    t.deleteWhereEq(Seq(Tuple1(405L)).toDF("id"))
    val refsBefore = t.liveManifests().size
    assert(refsBefore > 3, s"expected many manifests, got $refsBefore")

    val preRewriteHead = t.metadata.currentSnapshotId.get
    val fullBefore = t.scan().collect().map(_.toString).sorted.toSeq
    val filteredBefore = t.scan(Some(col("id") > 400L)).count()
    val incBefore = t.incrementalRead(midSnapshot, preRewriteHead)
      .collect().map(_.toString).sorted.toSeq
    val prunedBefore = t.planFiles(Some(col("id") === 333L)).map(_.path)

    val snap = t.rewriteManifests()
    assert(snap.summary.operation.contains("replace"))
    val refsAfter = t.liveManifests()
    // one manifest per content type (data, position deletes, eq deletes)
    assert(refsAfter.size == 3, s"got ${refsAfter.map(_.content)}")
    assert(refsAfter.map(_.content).sorted == Seq(0, 1, 2))

    assert(t.scan().collect().map(_.toString).sorted.toSeq == fullBefore)
    assert(t.scan(Some(col("id") > 400L)).count() == filteredBefore)
    // per-entry sequence numbers were materialized: an incremental read
    // THROUGH the consolidated manifests agrees with the pre-rewrite one
    assert(t.incrementalRead(midSnapshot, t.metadata.currentSnapshotId.get)
      .collect().map(_.toString).sorted.toSeq == incBefore)
    // stats AND bloom refs survived the row roundtrip: same files planned
    assert(t.planFiles(Some(col("id") === 333L)).map(_.path) == prunedBefore)
    // time travel to the pre-rewrite snapshot still reads old manifests
    assert(t.scan(asOf = Some(midSnapshot)).count() == 400)

    // another delete AFTER consolidation sequences correctly
    t.deleteWhereMoR(col("id") === 777L)
    assert(t.scan(Some(col("id") === 777L)).count() == 0)

    // expire reclaims the superseded manifests; current reads unaffected
    t.expireSnapshots(keepLast = 1)
    assert(t.scan().collect().map(_.toString).sorted.toSeq ==
      fullBefore.filterNot(_.contains("[777,")))
  }

  test("no-op on an already-consolidated table") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, 1.0)).toDF("id", "v").schema)
    t.append((1L to 50L).map(i => (i, i.toDouble)).toDF("id", "v"))
    t.rewriteManifests() // collapses the single append's shards (if >1)
    val v = t.metadata.currentSnapshotId.get
    t.rewriteManifests() // second call: nothing to do, no new snapshot
    assert(t.metadata.currentSnapshotId.get == v)
  }
}
