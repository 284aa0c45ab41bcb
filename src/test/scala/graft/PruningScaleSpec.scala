package graft

import graft.model._
import graft.table.{DataFileEntry, GraftTable, ManifestList, ManifestRef,
  PartitionTuple}
import graft.table.ColStats
import org.apache.spark.sql.functions._

/** Manifest-level pruning at its DESIGN POINT (round-14 verdict #4): the
  * claim is "a partition-aligned query on a many-manifest table plans
  * O(matching manifests)", previously exercised at 8 manifests. This spec
  * synthesizes a 2,000-manifest / 100,000-entry METADATA-ONLY table —
  * planning never opens data files, so the entries reference paths that
  * do not exist — and pins loaded-manifest counts, planned-file sets,
  * metadata-only counts, planning wall-time scaling, and
  * rewriteManifests consolidation at that scale.
  */
class PruningScaleSpec extends SparkSpec {

  private val NManifests = 2000
  private val EntriesPer = 50
  private val SnapId = 424242L

  /** Build the synthetic table once: a real CREATE (v1 metadata via the
    * public API), then a hand-written snapshot whose manifest list
    * references 2,000 manifests of 50 entries each, one partition value
    * per manifest — the shape a long-lived partitioned table converges
    * to (each commit lands in few partitions).
    */
  private lazy val table: GraftTable = {
    import org.apache.spark.sql.types._
    val loc = java.nio.file.Files
      .createTempDirectory("prune-scale").toString + "/t"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", LongType),
      StructField("v", StringType)))
    val t = GraftTable.create(spark, loc, schema,
      partitionBy = Seq(("grp", TIdentity, "grp_p")))
    val meta = t.metadata
    val specId = meta.defaultSpecId
    val schemaId = meta.currentSchemaId
    val metaDir = java.nio.file.Paths.get(loc, "metadata")
    val refs = (0 until NManifests).map { i =>
      val entries = (0 until EntriesPer).map { j =>
        DataFileEntry(
          path = s"$loc/data/fake-$i-$j.parquet",
          recordCount = 10L,
          snapshotId = SnapId,
          sequenceNumber = 1L,
          schemaId = schemaId,
          partition = Map("grp_p" -> Some(i.toString)),
          // exact per-column stats so mustMatch can certify counts
          stats = Map(
            "grp" -> ColStats(Some(i.toString), Some(i.toString), 0L),
            "id" -> ColStats(Some((i * EntriesPer + j).toString),
              Some((i * EntriesPer + j).toString), 0L)),
          fileSize = 1000L,
          specId = Some(specId))
      }
      val mf = metaDir.resolve(f"manifest-big-$i%05d.jsonl")
      DataFileEntry.writeManifest(mf, entries)
      ManifestRef(mf.toString, EntriesPer.toLong,
        entries.map(_.recordCount).sum, Some(SnapId), Some(1L),
        content = 0,
        partitionSummary = Some(Seq(PartitionTuple(Some(specId),
          Map("grp_p" -> Some(i.toString))))))
    }
    val listPath = metaDir.resolve(s"snap-$SnapId.manifest-list.json")
    ManifestList.write(listPath, refs)
    val now = System.currentTimeMillis
    val snap = SnapshotV2(SnapId, None, 1L, now, listPath.toString,
      Summary(Some("append"), Map(
        "total-data-files" -> (NManifests * EntriesPer).toString,
        "total-records" -> (NManifests * EntriesPer * 10L).toString)),
      Some(schemaId.toLong))
    val v2 = meta.copy(
      lastSequenceNumber = 1L,
      lastUpdatedMs = now,
      currentSnapshotId = Some(SnapId),
      snapshots = Some(Seq(snap)),
      snapshotLog = Some(Seq(SnapshotLog(SnapId, now))),
      refs = Some(Map("main" ->
        SnapshotRef(SnapId, BranchRetention(1, Long.MaxValue, Long.MaxValue)))))
    java.nio.file.Files.write(metaDir.resolve("v2.metadata.json"),
      v2.toJsonString.getBytes("UTF-8"))
    GraftTable.load(spark, loc)
  }

  private def timeBestOf3[A](f: => A): (Double, A) = {
    var best = Double.MaxValue
    var last: Option[A] = None
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      last = Some(f)
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
    }
    (best, last.get)
  }

  test("partition-aligned planning loads O(matching) of 2000 manifests") {
    val t = table
    // unfiltered: all 100k entries, all 2000 manifests load
    val before0 = ManifestRef.entriesReads.get
    val (tFull, full) = timeBestOf3(t.planFiles(None))
    assert(full.size == NManifests * EntriesPer)
    assert(ManifestRef.entriesReads.get - before0 == 3L * NManifests)

    // partition-aligned filter: exactly ONE manifest's entries load
    val before1 = ManifestRef.entriesReads.get
    val (tOne, planned) = timeBestOf3(
      t.planFiles(Some(col("grp") === 1234L)))
    val loads = (ManifestRef.entriesReads.get - before1) / 3
    assert(planned.size == EntriesPer)
    assert(planned.forall(_.path.contains("fake-1234-")))
    assert(loads == 1L,
      s"expected exactly 1 manifest load per filtered plan, got $loads")

    // a small partition RANGE loads only the covered manifests
    val before2 = ManifestRef.entriesReads.get
    val ranged = t.planFiles(
      Some(col("grp") >= 100L && col("grp") < 110L))
    assert(ranged.size == 10 * EntriesPer)
    assert(ManifestRef.entriesReads.get - before2 == 10L)

    // wall time scales with MATCHES, not manifest count: one-manifest
    // planning must be far under the full-list walk (measured best-of-3;
    // generous 5x bar — the real gap is ~100x)
    assert(tOne * 5 < tFull,
      f"filtered planning $tOne%.3fs not << full planning $tFull%.3fs")
  }

  test("distributed planning path prunes the same manifests at scale") {
    val t = table
    // 100k entries ≥ the default threshold — countRows takes the
    // manifest-dataset path; exact stats let mustMatch certify every
    // file, so the count is metadata-only (fake data paths prove it:
    // touching one would throw)
    assert(t.countRows(Some(col("grp") === 777L)) == EntriesPer * 10L)
    assert(t.countRows(None) == NManifests * EntriesPer * 10L)
    // distributed file planning unions only may-matching manifests
    val paths = t.planFilesDistributed(Some(col("grp") === 777L))
      .collect().map(_.getString(0)).toSet
    assert(paths.size == EntriesPer && paths.forall(_.contains("fake-777-")))
    // forced-distributed driver scan planning agrees with the driver path
    spark.conf.set("spark.graft.distributedPlanningThreshold", "0")
    try {
      val dist = t.planFilesDistributed(Some(col("grp") === 1234L))
        .collect().map(_.getString(0)).toSet
      assert(dist == t.planFiles(Some(col("grp") === 1234L))
        .map(_.path).toSet)
    } finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  test("rewriteManifests consolidates 2000 manifests without losing files") {
    val t = table
    // depends on the planning tests above reading the PRE-rewrite shape:
    // scalatest runs tests in registration order within a suite
    val before = t.planFiles(Some(col("grp") === 42L)).map(_.path).toSet
    val snap = t.rewriteManifests(targetEntriesPerManifest = 25000L)
    assert(snap.summary.operation.contains("replace"))
    val refs = t.liveManifests(None).filter(_.content == 0)
    assert(refs.size == 4, s"expected 4 consolidated manifests: ${refs.size}")
    assert(refs.map(_.entryCount).sum == NManifests * EntriesPer)
    // consolidated manifests span ~500 partitions each — over the
    // summary cap, so they carry NO summary (None = always read): the
    // deliberate trade of manifest-level pruning for fewer list entries
    assert(refs.forall(_.partitionSummary.isEmpty))
    // planning stays EXACT through entry-level pruning
    val after = t.planFiles(Some(col("grp") === 42L)).map(_.path).toSet
    assert(after == before)
    // and metadata-only counts still certify
    assert(t.countRows(Some(col("grp") === 42L)) == EntriesPer * 10L)
  }
}
