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
