package graft.connector

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

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
  * Histories containing deletes/overwrites/compactions are rejected at
  * offset time — rewritten files would double-count rows (the same
  * contract as Iceberg's streaming read and GraftTable.readStream).
  */
class GraftMicroBatchStream(graft: GraftTable, prunedSchema: StructType,
    pushed: Array[Filter])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark: SparkSession = SparkSession.active

  // Trigger.AvailableNow pin: batches stop at the sequence committed when
  // the trigger started, so concurrent appends don't keep the run alive
  @volatile private var availableNowCap: Option[Long] = None

  private def filterColumn =
    pushed.flatMap(FilterColumns.toColumn).reduceOption(_ && _)

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

  override def latestOffset(): Offset =
    GraftSeqOffset(availableNowCap.fold(committedSeq)(
      cap => math.min(cap, committedSeq)))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    latestOffset()

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
      .plannedConnectorFiles(filterColumn, None, Some((from, to)))
      .map(f => (f.path, f.schemaId, f.fileSize))
    GraftRead.binPack(spark, files)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val meta = graft.metadata
    // cover every schema the table has ever written under — a factory is
    // built once per batch and must read any planned file group
    GraftRead.factoryFor(spark, meta, meta.currentSchema, prunedSchema,
      pushed, meta.schemas.map(_.schemaId))
  }

  override def commit(end: Offset): Unit = ()

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
