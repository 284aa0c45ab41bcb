package graft.connector

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Per-trigger admission caps parsed from the streaming read options
  * (`maxFilesPerTrigger` / `maxRowsPerTrigger`, file-source parity
  * naming). `none` = drain everything available each trigger.
  */
case class StreamLimits(maxFiles: Option[Int], maxRows: Option[Long]) {
  def toReadLimit: ReadLimit = {
    val ls = maxFiles.map(ReadLimit.maxFiles).toSeq ++
      maxRows.map(ReadLimit.maxRows).toSeq
    ls match {
      case Seq() => ReadLimit.allAvailable()
      case Seq(one) => one
      case many => ReadLimit.compositeLimit(many.toArray)
    }
  }
}

object StreamLimits {
  val none: StreamLimits = StreamLimits(None, None)

  def fromOptions(options: CaseInsensitiveStringMap): StreamLimits = {
    def pos(key: String): Option[Long] =
      Option(options.get(key)).map { v =>
        val n = v.toLong
        require(n > 0, s"$key must be positive, got $v")
        n
      }
    // narrow with a range check: a value above Int.MaxValue must fail
    // loudly, not overflow into a tiny (or negative) cap
    StreamLimits(pos("maxFilesPerTrigger").map { n =>
      require(n <= Int.MaxValue,
        s"maxFilesPerTrigger must fit in an Int, got $n")
      n.toInt
    }, pos("maxRowsPerTrigger"))
  }
}

/** Offset admission shared by the snapshot stream and the changelog
  * stream: walk the committed snapshots oldest-first and pick the
  * greatest end sequence whose accumulated added-file/row deltas fit the
  * caps. Deltas come from the monotone `total-data-files` /
  * `total-records` summary rollups — pure arithmetic on already-loaded
  * metadata, no manifest reads at offset time.
  */
private[connector] object SnapshotAdmission {

  /** Flatten a (possibly composite) ReadLimit to file/row caps. */
  def caps(limit: ReadLimit): (Option[Long], Option[Long]) = {
    def flat(l: ReadLimit): Seq[ReadLimit] = l match {
      case c: CompositeReadLimit => c.getReadLimits.toSeq.flatMap(flat)
      case _: ReadAllAvailable => Seq.empty
      case x => Seq(x)
    }
    val ls = flat(limit)
    (ls.collectFirst { case f: ReadMaxFiles => f.maxFiles.toLong },
      ls.collectFirst { case r: ReadMaxRows => r.maxRows })
  }

  /** End sequence for the batch (from, cap] under the caps; `from` when
    * nothing is admissible. At least one snapshot is always admitted so
    * the stream makes progress even when a single commit exceeds the cap
    * (file-source semantics). Append commits carry EXACT
    * `added-data-files` / `added-records` summary keys (used directly);
    * older or foreign snapshots fall back to total-rollup deltas, and
    * absent/non-monotone totals charge one file/one row so the walk
    * stays bounded instead of admitting the whole backlog.
    *
    * `chargeDeletes` (the CHANGELOG stream): a MoR delete commit leaves
    * `total-data-files`/`total-records` unchanged yet can stage millions
    * of changelog delete rows, so non-append commits are additionally
    * charged by their `total-delete-files`/`total-delete-records` deltas
    * (pos-deletes: exact rows; eq-deletes: key-count proxy), with a
    * 1-file/1-row floor when the keys are absent — delete batches stay
    * bounded by the caps instead of riding in free.
    */
  def admissibleEnd(snapshots: Seq[_root_.graft.model.SnapshotV2],
      from: Long, cap: Long,
      maxFiles: Option[Long], maxRows: Option[Long],
      chargeDeletes: Boolean = false): Long = {
    if (cap <= from) return from
    if (maxFiles.isEmpty && maxRows.isEmpty) return cap
    val snaps = snapshots.filter(_.sequenceNumber <= cap)
      .sortBy(_.sequenceNumber)
    def key(s: _root_.graft.model.SnapshotV2, k: String): Long =
      s.summary.other.get(k).map(_.toLong).getOrElse(-1L)
    def totals(s: _root_.graft.model.SnapshotV2): (Long, Long) =
      (key(s, "total-data-files"), key(s, "total-records"))
    def delTotals(s: _root_.graft.model.SnapshotV2): (Long, Long) =
      (key(s, "total-delete-files"), key(s, "total-delete-records"))
    var prevFiles = 0L
    var prevRows = 0L
    var prevDelFiles = 0L
    var prevDelRows = 0L
    snaps.takeWhile(_.sequenceNumber <= from).lastOption.foreach { s =>
      val (f, r) = totals(s); prevFiles = f; prevRows = r
      val (df, dr) = delTotals(s); prevDelFiles = df; prevDelRows = dr
    }
    var admFiles = 0L
    var admRows = 0L
    var end = from
    var open = true
    snaps.dropWhile(_.sequenceNumber <= from).foreach { s =>
      if (open) {
        val (tf, tr) = totals(s)
        val (tdf, tdr) = delTotals(s)
        val exactF = key(s, "added-data-files")
        val exactR = key(s, "added-records")
        var addF =
          if (exactF >= 0) exactF
          else if (tf >= 0 && prevFiles >= 0 && tf >= prevFiles)
            tf - prevFiles
          else 1L
        var addR =
          if (exactR >= 0) exactR
          else if (tr >= 0 && prevRows >= 0 && tr >= prevRows)
            tr - prevRows
          else 1L
        val isAppend = s.summary.operation.contains("append")
        if (chargeDeletes && !isAppend) {
          val delF =
            if (tdf >= 0 && prevDelFiles >= 0 && tdf >= prevDelFiles)
              tdf - prevDelFiles
            else -1L
          val delR =
            if (tdr >= 0 && prevDelRows >= 0 && tdr >= prevDelRows)
              tdr - prevDelRows
            else -1L
          addF = math.max(1L, addF + math.max(delF, 0L))
          addR = math.max(1L, addR + math.max(delR, 0L))
        }
        val fits = maxFiles.forall(admFiles + addF <= _) &&
          maxRows.forall(admRows + addR <= _)
        if (fits || end == from) {
          admFiles += addF; admRows += addR
          prevFiles = tf; prevRows = tr
          prevDelFiles = tdf; prevDelRows = tdr
          end = s.sequenceNumber
          if (!fits) open = false
        } else open = false
      }
    }
    end
  }
}

/** Snapshot-offset streaming read of an append-only graft table:
  * `spark.readStream.format("graft").load(location)`.
  *
  * Offsets are COMMITTED sequence numbers — a micro-batch is exactly the
  * data files with `start < sequenceNumber <= end`. Unlike a
  * directory-tailing file stream, data files of in-flight or failed
  * writes are invisible (they have no committed manifest entry), and a
  * restarted query resumes from its checkpointed sequence number with
  * exactly-once file consumption. Entries are planned from CURRENT
  * metadata (append-only history keeps every entry live), so offsets
  * survive snapshot expiry.
  *
  * Admission control: `maxFilesPerTrigger` / `maxRowsPerTrigger` cap how
  * many snapshots a single micro-batch admits. Per-snapshot added
  * file/row counts come from the monotone `total-data-files` /
  * `total-records` summary deltas — O(snapshots-in-backlog) arithmetic on
  * already-loaded metadata, no manifest reads at offset time. A first
  * read of a large table therefore drains as a sequence of bounded
  * batches instead of one batch over the whole table; at least one
  * snapshot is always admitted so the stream makes progress even when a
  * single commit exceeds the cap (file-source semantics).
  *
  * Histories containing deletes/overwrites/compactions are rejected at
  * offset time — rewritten files would double-count rows (the same
  * contract as Iceberg's streaming read and GraftTable.readStream).
  *
  * Adopted-AVRO data files (no FileFormat to delegate to) are STAGED:
  * each planned range's avro rows are materialized once by a
  * distributed engine read into a parquet staging dir under the table
  * (same exactly-once-replay machinery as the changelog stream —
  * deterministic per (stream, range), cleaned on checkpoint commit,
  * heartbeat-guarded against the orphan sweep) and served as ordinary
  * parquet splits alongside the delegated files.
  */
class GraftMicroBatchStream(graft: GraftTable, prunedSchema: StructType,
    pushed: Array[Filter], limits: StreamLimits = StreamLimits.none,
    checkpointLocation: String = "")
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark: SparkSession = SparkSession.active

  // Trigger.AvailableNow pin: batches stop at the sequence committed when
  // the trigger started, so concurrent appends don't keep the run alive
  @volatile private var availableNowCap: Option[Long] = None

  // DELEGATED data-file formats present at stream start, plus parquet
  // (always) and the table's CURRENT write.format.default (a stream
  // started on a fresh ORC-default table must read its first appends;
  // a mid-stream property FLIP still refuses clearly at read time —
  // restart the stream to pick the new format up). Adopted avro is
  // STAGED as parquet at planning, so it never needs a factory. One
  // small distributed distinct over the manifest dataset, once per
  // stream.
  private lazy val streamFormats: Seq[String] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    val present = graft.manifestDf(None)
      .filter(coalesce(col("content"), lit(0)) === 0)
      .select(coalesce(col("format"),
        lit(_root_.graft.table.DataFileEntry.Parquet)).as("f"))
      .distinct().collect().map(_.getString(0)).toSeq
    val writeFmt = graft.metadata.properties.getOrElse(Map.empty)
      .getOrElse(GraftTable.WriteFormatProp,
        _root_.graft.table.DataFileEntry.Parquet)
    (_root_.graft.table.DataFileEntry.Parquet +: writeFmt +: present)
      .distinct
      .filter(f => f == _root_.graft.table.DataFileEntry.Parquet ||
        f == _root_.graft.table.DataFileEntry.Orc)
  }

  private def filterColumn =
    pushed.flatMap(FilterColumns.toColumn).reduceOption(_ && _)

  // avro staging key: per-stream via the checkpoint (concurrent streams
  // over one table stage independently), "av-" keeps it disjoint from
  // changelog keys under the shared _changelog root
  private lazy val stagingKey: String =
    "av-" + GraftChangelog.streamKey(checkpointLocation)

  // read ONCE at stream start, not per poll: the flag is stamped at
  // adoption (before any stream exists) and clearing it mid-stream
  // requires a compact(), which ends the stream via the append-only
  // gate anyway — so a construction-time read is equally correct and
  // keeps avro-free tables' hot polling path free of extra metadata
  // loads. A fresh avro-DEFAULT table latches true too — its first
  // appends stamp the flag AFTER this stream starts, and without this
  // the stream would die on them claiming the property is unset (the
  // same fresh-table case streamFormats covers for ORC)
  private lazy val avroFlagAtStart: Boolean = {
    // ONE metadata read: both checks must observe the same snapshot
    val props = graft.metadata.properties.getOrElse(Map.empty)
    props.get(GraftTable.HasAvroProp).contains("true") ||
      props.get(GraftTable.WriteFormatProp)
        .contains(_root_.graft.table.DataFileEntry.Avro)
  }

  /** Materialize a range's avro rows once as parquet splits (aligned to
    * the current schema by the engine read); replays of the same range
    * reuse the staged files — the restarted-micro-batch path. The
    * staged content is FILTER-INDEPENDENT (the caller plans the avro
    * set unfiltered), so a checkpointed restart with changed pushed
    * filters replays safely — Spark re-evaluates filters above the
    * scan; only file-level pruning is forgone for the avro legacy set.
    */
  private def stageAvro(from: Long, to: Long,
      avro: Seq[(String, Int, Long, String)])
      : Seq[(String, Int, Long, String)] = {
    import java.nio.file.{Files, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val dir = GraftChangelog.stagingRoot(graft, stagingKey)
      .resolve(s"$from-$to")
    // the staged columns' schema id is recorded NEXT TO the files: a
    // replay after a schema evolution must read them under the id they
    // were aligned to, not the current one. The marker lands by ATOMIC
    // move — a crash at any point leaves either no marker or a complete
    // one, and a missing/corrupt marker restages (deterministic bytes)
    val marker = dir.resolve("_schema_id")
    def readMarker: Option[Int] =
      if (!Files.exists(marker)) None
      else Files.readString(marker).trim.toIntOption
    if (!Files.exists(dir.resolve("_SUCCESS")) || readMarker.isEmpty) {
      val (df, stagedSid) = graft.readFilesAligned(
        avro.map(f => (f._1, f._2)), avro.map(f => f._1 -> f._4).toMap)
      df.write.mode("overwrite")
        // per-write committer pin (see GraftTable.commitPinned)
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .parquet(dir.toString)
      val tmp = dir.resolve("_schema_id.tmp")
      Files.writeString(tmp, stagedSid.toString)
      Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    val sid = readMarker.getOrElse(throw new IllegalStateException(
      s"unreadable staging marker $marker"))
    val ls = Files.list(dir)
    try ls.iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => (p.toString, sid, Files.size(p),
        _root_.graft.table.DataFileEntry.Parquet)).toList.sortBy(_._1)
    finally ls.close()
  }

  private def requireAppendOnly(): Unit = {
    val nonAppend = graft.metadata.snapshots.getOrElse(Seq.empty)
      .flatMap(_.summary.operation).filterNot(_ == "append").distinct
    require(nonAppend.isEmpty,
      s"streaming read requires an append-only history; found $nonAppend")
  }

  private def committedSeq: Long = {
    requireAppendOnly()
    graft.metadata.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
  }

  override def initialOffset(): Offset = GraftSeqOffset(0L)

  override def latestOffset(): Offset = {
    if (avroFlagAtStart) GraftChangelog.touchHeartbeat(graft, stagingKey)
    GraftSeqOffset(availableNowCap.fold(committedSeq)(
      cap => math.min(cap, committedSeq)))
  }

  override def getDefaultReadLimit: ReadLimit = limits.toReadLimit

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    if (avroFlagAtStart) GraftChangelog.touchHeartbeat(graft, stagingKey)
    val from = start.asInstanceOf[GraftSeqOffset].seq
    val cap = availableNowCap.fold(committedSeq)(
      c => math.min(c, committedSeq))
    val (maxFiles, maxRows) = SnapshotAdmission.caps(limit)
    GraftSeqOffset(SnapshotAdmission.admissibleEnd(
      graft.metadata.snapshots.getOrElse(Seq.empty),
      from, cap, maxFiles, maxRows))
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
    // threshold-dispatched with the sequence-range bound pushed into the
    // (possibly distributed) manifest filter — a micro-batch over a huge
    // table plans O(batch), never materializing the full entry list
    val files = graft
      .plannedConnectorFiles(filterColumn, None, Some((from, to)),
        allowAvro = true)
      .map(f => (f.path, f.schemaId, f.fileSize, f.format))
    val posRead = prunedSchema.fieldNames.contains(GraftMetaColumns.Pos)
    if (posRead) files.find(
        _._4 != _root_.graft.table.DataFileEntry.Parquet).foreach(f =>
      throw new IllegalArgumentException(
        s"position-addressed streaming reads (_pos) require parquet " +
          s"data files; ${f._1} is ${f._4}"))
    val delegated = files.filterNot(
      _._4 == _root_.graft.table.DataFileEntry.Avro)
    // the avro set is planned UNFILTERED: staged content must depend on
    // the range alone, never on this run's pushed filters — a restarted
    // checkpoint may carry different filters and would silently reuse a
    // filter-pruned staging otherwise. Extra planning pass only on
    // avro-flagged tables; Spark's residual filter handles the rows.
    // with the flag unset the delegated set must cover everything — an
    // avro file surfacing anyway (hand-edited properties) fails loudly
    // rather than silently dropping its rows from the batch
    if (!avroFlagAtStart) files.find(
        _._4 == _root_.graft.table.DataFileEntry.Avro).foreach(f =>
      throw new IllegalStateException(
        s"avro data file ${f._1} planned but ${GraftTable.HasAvroProp} " +
          "is not set on the table — re-set the property"))
    val staged =
      if (!avroFlagAtStart) Seq.empty
      else {
        // with no pushed filters the first planning pass already IS the
        // unfiltered one — don't run it twice per batch
        val avroAll =
          if (filterColumn.isEmpty)
            files.filter(_._4 == _root_.graft.table.DataFileEntry.Avro)
          else graft
            .plannedConnectorFiles(None, None, Some((from, to)),
              allowAvro = true)
            .collect { case f
              if f.format == _root_.graft.table.DataFileEntry.Avro =>
                (f.path, f.schemaId, f.fileSize, f.format) }
        if (avroAll.isEmpty) Seq.empty
        else {
          // staging is checkpoint-scoped: the same emptiness condition
          // that gates cleanup must gate the write, or a keyless stream
          // would leak ranges under one shared degenerate key
          require(checkpointLocation.nonEmpty,
            "streaming an avro-bearing table requires a checkpointed " +
              "stream (staging is keyed by the checkpoint)")
          stageAvro(from, to, avroAll)
        }
      }
    GraftRead.binPack(spark, delegated ++ staged,
      splitLargeFiles = !posRead)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val meta = graft.metadata
    // cover every (schema, format) group the table has ever written
    // under — a factory is built once per batch and must read any
    // planned file group. Position-addressed streams stay parquet-only
    // (the _pos contract is validated for the parquet reader alone);
    // plain reads add only the DELEGATED formats actually present, so a
    // pure-parquet stream's scan-wide columnar decision is never ANDed
    // with OrcFileFormat.supportBatch through a phantom group (mid-
    // stream adoption of a new format refuses clearly at read time —
    // restart the stream to pick it up)
    val fmts =
      if (prunedSchema.fieldNames.contains(GraftMetaColumns.Pos))
        Seq(_root_.graft.table.DataFileEntry.Parquet)
      else streamFormats
    GraftRead.factoryFor(spark, meta, meta.currentSchema, prunedSchema,
      pushed, for (sid <- meta.schemas.map(_.schemaId); f <- fmts)
        yield (sid, f))
  }

  override def commit(end: Offset): Unit =
    // staged avro ranges fully covered by the committed offset can never
    // be replayed — drop them (no-op when nothing was staged)
    if (checkpointLocation.nonEmpty)
      GraftChangelog.cleanupThrough(graft, stagingKey,
        end.asInstanceOf[GraftSeqOffset].seq)

  override def stop(): Unit = ()
}

case class GraftSeqOffset(seq: Long) extends Offset {
  override def json(): String = s"""{"seq":$seq}"""
}

object GraftSeqOffset {
  private val Pat = """\{\s*"seq"\s*:\s*(\d+)\s*\}""".r
  def fromJson(s: String): GraftSeqOffset = s.trim match {
    case Pat(n) => GraftSeqOffset(n.toLong)
    case other =>
      throw new IllegalArgumentException(s"bad graft offset: $other")
  }
}
