package graft.connector

import graft.table.{DataFileEntry, GraftTable, MetadataIo, SerConf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** DSv2 STREAMING_WRITE for graft tables: the public
  * `df.writeStream.format("graft").start(path)` /
  * `.toTable("cat.db.t")` surface.
  *
  * Epoch protocol (exactly-once, shared with the engine's
  * appendStream): executors write this epoch's rows as data files into
  * a per-query per-epoch STAGING directory (outside `data/`, so
  * directory-tailing readers never see uncommitted files) and report
  * the files they committed; the driver's `commit(epochId)` adopts
  * exactly those files into a fresh `data/<writeId>/` dir, derives
  * manifest entries from their FOOTERS (the same O(files) stats pass
  * every batch append uses), and commits ONE append snapshot carrying
  * the `stream-batch-<queryId>` high-water mark — a replayed epoch at
  * or below the mark deletes its staged files instead of
  * double-committing. The streaming query id is stable across restarts
  * from the same checkpoint, so the mark survives restarts exactly
  * like appendStream's checkpoint-persisted stream id.
  *
  * Epochs honour the table's `write.format.default`: parquet (the
  * default) and orc tables stage files in their declared format, with
  * stats derived by the matching footer pass at commit. Avro-default
  * tables refuse loudly — the avro leg is the batch interop writer
  * (external Rows, inline stat accumulation) with no InternalRow
  * surface, and silently staging parquet epochs into a table that
  * declared avro would surprise its external readers.
  *
  * Partitioned tables fan out per task: partition transform values are
  * computed row-side with the same Catalyst expressions the batch
  * writer uses (bound once on the driver), and files land in
  * hive-style `name=value/` dirs — the layout the footer-stats pass
  * already parses partition values from. Open writers per task are
  * CAPPED at [[GraftStreamTaskWriter.MaxOpenWriters]] with
  * least-recently-written eviction (each open writer buffers a row
  * group / stripe; a backfill epoch into a day-partitioned table can
  * send months of days through one task — unbounded fanout is an
  * executor OOM at scale). An evicted partition re-opens a fresh file
  * if more rows arrive: more files, never more memory, and manifests
  * handle multiple files per tuple. At 100 TB nothing here is per-row
  * driver work: the driver sees only file names and O(shards) rollups
  * per epoch.
  */
private[connector] class GraftStreamingWrite(location: String,
    metadataIo: MetadataIo, info: LogicalWriteInfo)
    extends StreamingWrite {

  private def spark: SparkSession = SparkSession.active
  private def table: GraftTable =
    GraftTable.load(spark, location, metadataIo)
  // one staging namespace per streaming query; epochs nest inside
  private val stagingRoot = s"$location/stream-staging/${info.queryId}"

  override def createStreamingWriterFactory(
      pInfo: PhysicalWriteInfo): StreamingDataWriterFactory = {
    // liveness beacon for the orphan sweep: an epoch can legitimately
    // sit staged longer than the sweep cutoff (long backfill epoch,
    // backpressured sink) — the per-query heartbeat, refreshed every
    // epoch, keeps a LIVE query's staging from being swept mid-flight
    // (same contract as the changelog ranges' _heartbeat)
    try {
      val hb = Paths.get(stagingRoot, "_heartbeat")
      Files.createDirectories(hb.getParent)
      Files.write(hb, Array.emptyByteArray)
    } catch { case scala.util.control.NonFatal(_) => () }
    val t = table
    val meta = t.metadata
    val schema = meta.currentSchema
    val sparkSchema = GraftTable.toSparkSchema(schema)
    require(info.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      sparkSchema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"streaming write schema ${info.schema.simpleString} does not " +
        s"match table schema ${sparkSchema.simpleString}")
    val fmt = meta.properties.getOrElse(Map.empty)
      .getOrElse(GraftTable.WriteFormatProp, DataFileEntry.Parquet)
    require(fmt != DataFileEntry.Avro,
      "streaming writes into an avro-default table are unsupported: " +
        "the avro leg is the batch interop writer (external Rows, " +
        "inline stats) with no per-row InternalRow surface — set " +
        "write.format.default to parquet or orc for streaming ingest " +
        "(batch appends still write avro)")
    val spec = meta.defaultSpec
    // bind the partition transform expressions to the write schema ONCE
    // (driver-side analysis); executors evaluate them per row
    val (names, exprs, types) =
      if (spec.fields.isEmpty) (Seq.empty[String], Seq.empty[Expression],
        Seq.empty[DataType])
      else {
        val dummy = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          sparkSchema)
        val cols = spec.fields.map { pf =>
          val src = schema.fieldById(pf.sourceId).getOrElse(
            throw new IllegalArgumentException(
              s"spec source id ${pf.sourceId} not in schema"))
          GraftTable.transformColumn(pf.transform,
            org.apache.spark.sql.functions.col(src.name),
            sparkSchema(src.name).dataType)
        }
        val analyzed = dummy.select(cols: _*).queryExecution.analyzed
        val proj = analyzed.asInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.Project]
        val bound = proj.projectList.map(e =>
          org.apache.spark.sql.catalyst.expressions.BindReferences
            .bindReference(e, proj.child.output, allowFailures = false)
            : Expression)
        val outTypes = proj.projectList.map(_.dataType)
        outTypes.foreach {
          case IntegerType | LongType | StringType | DateType => ()
          case other => throw new IllegalArgumentException(
            s"streaming writes to a table partitioned on a $other " +
              "transform value are unsupported — partition on a " +
              "temporal/bucket/truncate transform instead")
        }
        (spec.fields.map(_.name), bound, outTypes)
      }
    val conf =
      if (fmt == DataFileEntry.Orc)
        Bridge.preparedOrcConf(spark, sparkSchema)
      else Bridge.preparedParquetConf(spark, sparkSchema)
    new GraftStreamWriterFactory(stagingRoot, names, exprs, types,
      new SerConf(conf), fmt, sparkSchema)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val rels = messages.toSeq
      .collect { case m: GraftStreamFiles => m.relPaths }.flatten
    table.commitStreamedFiles(s"$stagingRoot/$epochId", rels, epochId,
      info.queryId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    graft.Staging.wipe(Paths.get(s"$stagingRoot/$epochId"))
}

/** Staged files one task committed, as paths RELATIVE to the epoch's
  * staging dir (partition dirs included) — the driver adopts exactly
  * these, so stray files from zombie task attempts never commit.
  */
private[connector] case class GraftStreamFiles(relPaths: Seq[String])
  extends WriterCommitMessage

private[connector] class GraftStreamWriterFactory(stagingRoot: String,
    partNames: Seq[String], partExprs: Seq[Expression],
    partTypes: Seq[DataType], conf: SerConf, fmt: String,
    rowSchema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    // refresh the per-query heartbeat from the EXECUTOR side too: the
    // driver touches it once at epoch start, but an epoch can stage
    // longer than the orphan-sweep cutoff — task creation is spread
    // across the epoch's whole task timeline, keeping the beacon fresh
    // while work is actually happening
    try Files.write(Paths.get(stagingRoot, "_heartbeat"),
      Array.emptyByteArray)
    catch { case scala.util.control.NonFatal(_) => () }
    new GraftStreamTaskWriter(s"$stagingRoot/$epochId", partNames,
      partExprs, partTypes, conf, fmt, rowSchema, partitionId, taskId)
  }
}

private[graft] object GraftStreamTaskWriter {
  /** Per-task cap on simultaneously open data-file writers — each open
    * writer buffers a full row group (parquet) / stripe (orc), so the
    * cap bounds fanout memory the same way AvroDataWrite's does.
    */
  val MaxOpenWriters = 64

  /** Test-only gauge: high-water mark of simultaneously open writers
    * across all tasks in this JVM (meaningful under local mode, where
    * executors share the test's JVM). Reset before streaming an epoch,
    * assert `get <= MaxOpenWriters` after.
    */
  private[graft] val maxOpenGauge =
    new java.util.concurrent.atomic.AtomicInteger(0)
  private def gauge(n: Int): Unit = {
    var cur = maxOpenGauge.get
    while (n > cur && !maxOpenGauge.compareAndSet(cur, n))
      cur = maxOpenGauge.get
  }
}

/** Executor-side fan-out writer: one open data-file writer per
  * partition tuple seen by this task (unpartitioned tables: exactly
  * one file), capped at [[GraftStreamTaskWriter.MaxOpenWriters]] with
  * least-recently-written eviction.
  */
private[connector] class GraftStreamTaskWriter(epochDir: String,
    partNames: Seq[String], partExprs: Seq[Expression],
    partTypes: Seq[DataType], conf: SerConf, fmt: String,
    rowSchema: StructType, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  private val proj =
    if (partExprs.isEmpty) null else UnsafeProjection.create(partExprs)
  // rel path -> (write, close); LinkedHashMap iteration order is the
  // eviction order — entries are remove+re-inserted on every hit so
  // the head is the least-recently-WRITTEN tuple, not the
  // earliest-seen one (insertion-order eviction would thrash the
  // hottest partition once a task sees >cap tuples)
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[String, (InternalRow => Unit, () => Unit)]
  private val uuid = java.util.UUID.randomUUID.toString.take(8)
  // monotonic per-task counter: an evicted-then-revisited tuple opens a
  // FRESH file name (open.size would repeat after eviction and collide)
  private var fileNo = 0

  private def dirFor(vals: InternalRow): String =
    partNames.indices.map { i =>
      val raw =
        if (vals.isNullAt(i)) null
        else partTypes(i) match {
          case DateType => // render like Spark's partitionBy, not as days
            java.time.LocalDate.ofEpochDay(vals.getInt(i).toLong).toString
          case IntegerType => vals.getInt(i).toString
          case LongType => vals.getLong(i).toString
          case _ => vals.getUTF8String(i).toString
        }
      Bridge.partitionPathSegment(partNames(i), raw)
    }.mkString("/")

  // every file THIS task created, in creation order — the exact set the
  // commit message claims and abort() deletes. A filesystem re-walk
  // filtered by the 8-char uuid would mis-claim (and in abort, DELETE)
  // a colliding concurrent task's files at large task counts; the
  // writer already knows its own paths, so no walk and no collision.
  private val created = Seq.newBuilder[String]

  private def writerFor(rel: String): InternalRow => Unit =
    open.get(rel) match {
      case Some(wc) =>
        // refresh recency (LinkedHashMap keeps an updated key at its
        // original position — must remove+re-insert)
        open.remove(rel); open.put(rel, wc)
        wc._1
      case None =>
        if (open.size >= GraftStreamTaskWriter.MaxOpenWriters) {
          val (oldRel, oldWc) = open.head
          oldWc._2() // close: flushes the buffered row group/stripe
          open.remove(oldRel)
        }
        fileNo += 1
        val name =
          f"part-$partitionId%05d-$taskId-$uuid-$fileNo%04d.$fmt"
        val relPath = if (rel.isEmpty) name else s"$rel/$name"
        val abs = Paths.get(epochDir).resolve(relPath)
        Files.createDirectories(abs.getParent)
        val (w, c) =
          if (fmt == DataFileEntry.Orc)
            Bridge.orcRowWriter(abs.toString, rowSchema, conf.value,
              partitionId, (taskId & 0x7fffffffL).toInt)
          else Bridge.parquetRowWriter(abs.toString, conf.value,
            partitionId, (taskId & 0x7fffffffL).toInt)
        open.put(rel, (w, c))
        GraftStreamTaskWriter.gauge(open.size)
        created += relPath
        w
    }

  override def write(row: InternalRow): Unit = {
    val rel = if (proj == null) "" else dirFor(proj(row))
    writerFor(rel)(row)
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._2())
    GraftStreamFiles(created.result().sorted)
  }

  override def abort(): Unit = {
    open.values.foreach(c => try c._2() catch { case _: Exception => () })
    created.result().foreach(rel =>
      Files.deleteIfExists(Paths.get(epochDir).resolve(rel)))
  }

  override def close(): Unit = ()
}
