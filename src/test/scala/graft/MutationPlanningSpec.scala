package graft

import graft.model._
import graft.table.{GraftTable, ManifestRef}
import org.apache.spark.sql.functions._

/** Distributed mutation planning: above the planning threshold every
  * mutation decides its affected-manifest set via a Spark filter over the
  * manifest dataset, and the driver materializes entry lists ONLY for
  * affected manifests. `ManifestRef.entriesReads` counts driver-side
  * materializations — the bounds here fail if any mutation regresses to
  * loading the whole table's entries.
  */
class MutationPlanningSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def reads[A](body: => A): Long = {
    val before = ManifestRef.entriesReads.get()
    body
    ManifestRef.entriesReads.get() - before
  }

  private def withThreshold[A](n: Long)(body: => A): A = {
    spark.conf.set("spark.graft.distributedPlanningThreshold", n.toString)
    try body
    finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  test("mutations plan distributedly: entriesReads stays O(affected)") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshLoc("distplan"),
      spark.range(0).select(col("id"), col("id").cast("string").as("v")).schema)
    // 12 commits with disjoint id ranges → 12 manifests with disjoint
    // min/max stats, so a narrow mutation affects exactly one
    (0 until 12).foreach { k =>
      t.append(spark.range(k * 100L, k * 100L + 100L)
        .select(col("id"), col("id").cast("string").as("v")).coalesce(1))
    }
    assert(t.liveManifests().size == 12)
    withThreshold(1) {
      // CoW delete hitting one manifest's range
      val dDel = reads { t.deleteWhere(col("id").between(250, 259)) }
      assert(t.scan().count() == 1190)
      assert(dDel <= 4, s"deleteWhere materialized $dDel manifests (affected=1)")

      // MoR delete: the pruned plan comes from the manifest dataset
      val dMor = reads { t.deleteWhereMoR(col("id") === 450) }
      assert(t.scan().count() == 1189)
      assert(dMor <= 4, s"deleteWhereMoR materialized $dMor manifests")

      // incremental read plans from the manifest dataset too
      val snaps = t.metadata.snapshots.get.sortBy(_.sequenceNumber)
      val dInc = reads {
        assert(t.incrementalRead(snaps(snaps.size - 3).snapshotId,
          snaps.last.snapshotId).count() >= 0L)
      }
      assert(dInc <= 2, s"incrementalRead materialized $dInc manifests")

      // merge keyed into one manifest's range (plus the delete manifest
      // the MoR delete just added)
      val dMerge = reads {
        t.mergeInto(Seq((500L, "X")).toDF("id", "v"), Seq("id"))
      }
      assert(t.scan(Some(col("id") === 500L))
        .select("v").as[String].collect().toSeq == Seq("X"))
      assert(t.scan().count() == 1189)
      assert(dMerge <= 6, s"mergeInto materialized $dMerge manifests")
    }
  }

  test("countRows: rollup-only when unfiltered, distributed may/must when filtered") {
    val t = GraftTable.create(spark, freshLoc("distcount"),
      spark.range(0).select(col("id"), col("id").cast("string").as("v")).schema)
    (0 until 6).foreach { k =>
      t.append(spark.range(k * 100L, k * 100L + 100L)
        .select(col("id"), col("id").cast("string").as("v")).coalesce(1))
    }
    // unfiltered count answers from manifest-list rollups alone — no
    // manifest ENTRY is materialized at any threshold
    val dPlain = reads { assert(t.countRows() == 600L) }
    assert(dPlain == 0L, s"unfiltered countRows read $dPlain manifests")
    withThreshold(1) {
      // fully-certain range: stats prove every row of manifests 1-2 match
      val dRange = reads {
        assert(t.countRows(Some(col("id").between(100, 299))) == 200L)
      }
      assert(dRange == 0L, s"certain countRows read $dRange manifests")
      // boundary range: one file scanned, rest certified
      assert(t.countRows(Some(col("id").between(150, 299))) == 150L)
      // agreement with the driver path on the same filters
      val exp = t.countRows(Some(col("id") % 7 === 0))
      spark.conf.unset("spark.graft.distributedPlanningThreshold")
      assert(t.countRows(Some(col("id") % 7 === 0)) == exp)
    }
  }

  test("overwritePartitions + compactBinPack plan distributedly") {
    val t = GraftTable.create(spark, freshLoc("distplan2"),
      spark.range(0).select(col("id"), col("id").cast("string").as("cat")).schema,
      partitionBy = Seq(("cat", TIdentity, "cat_p")))
    // one commit per category value → the overwrite of one category
    // affects exactly one manifest
    (0 until 5).foreach { c =>
      t.append(spark.range(c * 20L, c * 20L + 20L)
        .select(col("id"), lit(c.toString).as("cat")))
    }
    withThreshold(1) {
      val dOw = reads {
        t.overwritePartitions(
          spark.range(1000L, 1003L).select(col("id"), lit("3").as("cat")))
      }
      assert(t.scan(Some(col("cat") === "3")).count() == 3)
      assert(t.scan().count() == 83)
      assert(dOw <= 3, s"overwritePartitions materialized $dOw manifests")

      // compaction: distributed small-file selection (window count over
      // the manifest dataset), correct contents after the rewrite
      t.compactBinPack()
      assert(t.scan().count() == 83)
      assert(t.scan(Some(col("cat") === "3")).count() == 3)
      val dataFiles = t.liveEntries().filter(_.isData)
      assert(dataFiles.size == 5, s"one packed file per category, got ${dataFiles.size}")
    }
  }
}
