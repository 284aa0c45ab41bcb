package graft.connector

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Row-level change-data-feed through the connector:
  *
  * {{{
  *   spark.read.format("graft").option("changelog", "true").load(loc)
  *   spark.readStream.format("graft").option("changelog", "true").load(loc)
  * }}}
  *
  * Rows are the engine's [[GraftTable.changesBySeq]] output — inserts
  * plus RECOVERED-content deletes — tagged with `_change_type`,
  * `_commit_snapshot_id`, `_commit_sequence`.
  *
  * Execution model: a changelog batch is a JOIN (delete files against
  * the data rows they address), not a file scan, so each planned range
  * is MATERIALIZED once by a distributed job into a staging directory
  * under the table and then served as plain parquet splits. The staging
  * write is the honest cost of exactly-once CDC replay: a restarted
  * micro-batch re-reads its deterministic staged result instead of
  * recomputing a join against possibly-expired metadata. Committed
  * ranges are cleaned up on checkpoint commit.
  *
  * Offsets are COMMITTED sequence numbers (they survive snapshot
  * expiry). `changelog-from` = "begin" (default: full history) or a
  * snapshot id; batch reads also honor `changelog-to`. NET-CHANGES
  * semantics: `replace` commits (compaction, re-cluster, manifest
  * rewrite) are skipped — routine maintenance never breaks a CDC
  * consumer. Copy-on-write deletes/overwrites in a planned range fail
  * loudly (the engine cannot express them as row-level changes) —
  * stream MoR tables.
  */
object GraftChangelog {
  val OptionKey = "changelog"
  val FromOption = "changelog-from"
  val ToOption = "changelog-to"

  val metaFields: Seq[StructField] = Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_snapshot_id", LongType, nullable = false),
    StructField("_commit_sequence", LongType, nullable = false))

  def schemaFor(tableSchema: StructType): StructType =
    StructType(tableSchema.fields ++ metaFields)

  /** Resolve `changelog-from` to an EXCLUSIVE starting sequence. */
  def fromSeq(graft: GraftTable, opt: String): Long = opt match {
    case null | "" | "begin" => 0L
    case id =>
      graft.metadata.snapshotById(id.toLong).getOrElse(
        throw new IllegalArgumentException(s"no snapshot $id"))
        .sequenceNumber
  }

  /** Materialize changes (fromSeq, toSnap] once per (key, range):
    * reruns of the same range reuse the staged files (the replay path
    * of a restarted micro-batch). Returns (path, size) per data file.
    */
  def stage(spark: SparkSession, graft: GraftTable, key: String,
      fromSeq: Long, toSnapshotId: Long): Seq[(String, Long)] = {
    val toSeq = graft.metadata.snapshotById(toSnapshotId)
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot $toSnapshotId")).sequenceNumber
    val dir = stagingRoot(graft, key).resolve(s"$fromSeq-$toSeq")
    if (!Files.exists(dir.resolve("_SUCCESS")))
      graft.changesBySeq(fromSeq, toSnapshotId)
        .write.mode("overwrite")
        // per-write committer pin (see GraftTable.commitPinned): task-
        // side renames; the _SUCCESS marker this protocol gates on is
        // written by job commit under both algorithms
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(dir.toString)
    val ls = Files.list(dir)
    try ls.iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => (p.toString, Files.size(p))).toSeq
    finally ls.close()
  }

  def stagingRoot(graft: GraftTable, key: String): Path =
    Paths.get(graft.location, "_changelog", key)

  /** Drop staged ranges fully covered by the committed offset. */
  def cleanupThrough(graft: GraftTable, key: String, seq: Long): Unit = {
    val root = stagingRoot(graft, key)
    if (!Files.isDirectory(root)) return
    val ls = Files.list(root)
    val done =
      try ls.iterator.asScala.filter { d =>
        d.getFileName.toString.split('-') match {
          case Array(_, to) => to.toLongOption.exists(_ <= seq)
          case _ => false
        }
      }.toSeq
      finally ls.close()
    done.foreach { d =>
      val w = Files.walk(d)
      try w.sorted(java.util.Comparator.reverseOrder())
        .iterator.asScala.foreach(Files.deleteIfExists(_))
      finally w.close()
    }
  }

  /** Deterministic per-stream staging key from the checkpoint location
    * (concurrent streams over one table stage independently).
    */
  def streamKey(checkpointLocation: String): String =
    "s-" + Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(checkpointLocation))

  /** Liveness marker refreshed at every offset poll: a RUNNING stream —
    * even one idle past the orphan cutoff — keeps this fresh, so the
    * orphan sweep can tell a live-but-idle stream's staged ranges from a
    * dead stream's leftovers instead of guessing from range-file mtimes.
    */
  val HeartbeatFile = "_heartbeat"

  def touchHeartbeat(graft: GraftTable, key: String): Unit = {
    val dir = stagingRoot(graft, key)
    try {
      Files.createDirectories(dir)
      Files.write(dir.resolve(HeartbeatFile), Array.empty[Byte])
    } catch { case _: java.io.IOException => () } // advisory only
  }
}

/** Batch + streaming changelog scan (one class: Spark calls `toBatch`
  * or `toMicroBatchStream` on the same built scan).
  */
class GraftChangelogScan(graft: GraftTable, outSchema: StructType,
    startSeq: Long, toSnapshot: Option[Long],
    limits: StreamLimits = StreamLimits.none) extends Scan with Batch {

  private def spark: SparkSession = SparkSession.active

  override def readSchema(): StructType = outSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-changelog ${graft.location} from-seq=$startSeq"

  override def planInputPartitions(): Array[InputPartition] = {
    val to = toSnapshot.orElse(graft.metadata.currentSnapshotId)
      .getOrElse(return Array.empty)
    val files = GraftChangelog.stage(spark, graft, "batch", startSeq, to)
    GraftRead.binPack(spark,
      files.map(f => (f._1, 0, f._2, _root_.graft.table.DataFileEntry.Parquet)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftRead.flatFactory(spark, outSchema)

  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new GraftChangelogStream(graft, outSchema, startSeq,
      checkpointLocation, limits)
}

/** The streaming shape: sequence-number offsets, each micro-batch one
  * staged changes() range.
  */
class GraftChangelogStream(graft: GraftTable, outSchema: StructType,
    startSeq: Long, checkpointLocation: String,
    limits: StreamLimits = StreamLimits.none)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark: SparkSession = SparkSession.active
  private val key = GraftChangelog.streamKey(checkpointLocation)

  @volatile private var availableNowCap: Option[Long] = None

  private def committedSeq: Long =
    graft.metadata.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)

  override def initialOffset(): Offset = GraftSeqOffset(startSeq)

  override def latestOffset(): Offset = {
    GraftChangelog.touchHeartbeat(graft, key)
    GraftSeqOffset(availableNowCap.fold(committedSeq)(
      cap => math.min(cap, committedSeq)))
  }

  override def getDefaultReadLimit: ReadLimit = limits.toReadLimit

  // admission caps bound each staged changes() range. chargeDeletes:
  // delete commits add no DATA files/records, but each stages changelog
  // delete rows — charge them by their delete-file/record deltas (1-file
  // floor) so delete-heavy backlogs stay bounded by the caps too
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    GraftChangelog.touchHeartbeat(graft, key)
    val from = start.asInstanceOf[GraftSeqOffset].seq
    val cap = availableNowCap.fold(committedSeq)(
      c => math.min(c, committedSeq))
    val (maxFiles, maxRows) = SnapshotAdmission.caps(limit)
    GraftSeqOffset(SnapshotAdmission.admissibleEnd(
      graft.metadata.snapshots.getOrElse(Seq.empty),
      from, cap, maxFiles, maxRows, chargeDeletes = true))
  }

  override def reportLatestOffset(): Offset = GraftSeqOffset(committedSeq)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(committedSeq)

  override def deserializeOffset(json: String): Offset =
    GraftSeqOffset.fromJson(json)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftSeqOffset].seq
    val to = end.asInstanceOf[GraftSeqOffset].seq
    if (to <= from) return Array.empty
    // the snapshot whose sequence IS the end offset: latestOffset only
    // ever returns committed sequences, so it must exist
    val toSnap = graft.metadata.snapshots.getOrElse(Seq.empty)
      .find(_.sequenceNumber == to).getOrElse(throw new IllegalStateException(
        s"no snapshot at sequence $to (expired mid-plan?)")).snapshotId
    val files = GraftChangelog.stage(spark, graft, key, from, toSnap)
    GraftRead.binPack(spark,
      files.map(f => (f._1, 0, f._2, _root_.graft.table.DataFileEntry.Parquet)))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftRead.flatFactory(spark, outSchema)

  override def commit(end: Offset): Unit =
    GraftChangelog.cleanupThrough(graft, key,
      end.asInstanceOf[GraftSeqOffset].seq)

  override def stop(): Unit = ()
}
