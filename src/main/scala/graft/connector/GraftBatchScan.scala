package graft.connector

import graft.table.GraftTable
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal => CatalystLiteral, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import scala.jdk.CollectionConverters._

/** Native DSv2 batch scan for delete-free snapshots — the dominant table
  * shape at scale (append-only ingest).
  *
  * Planning happens on the driver against graft metadata: the pushed
  * filters drive transform-aware partition + min/max file pruning, the
  * surviving files are bin-packed into input partitions, and each
  * partition delegates to Spark's own vectorized parquet reader
  * (ParquetFileFormat.buildReaderWithPartitionValues — the exact reader
  * FileSourceScanExec uses), so the scan inherits codegen-friendly
  * columnar batches, row-group statistics skipping, and page-level
  * filtering for free.
  *
  * Schema evolution is resolved per file group: files written under an
  * older schema are read with their write-time physical column names and
  * projected to the current schema BY FIELD ID (renames resolve, dropped
  * fields null-fill) — columnar batches stay columnar through the
  * projection (column reorder + constant null vectors).
  *
  * Implements SupportsRuntimeFiltering on the partition-spec source
  * columns, so dynamic partition pruning re-plans the file list when a
  * join's build side completes.
  */
class GraftBatchScan(protected val graft: GraftTable,
    protected val prunedSchema: StructType,
    protected val pushed: Array[Filter], protected val asOf: Option[Long],
    limits: StreamLimits = StreamLimits.none)
    extends Scan with Batch with GraftScanStatistics
    with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  private def spark: SparkSession = SparkSession.active

  @volatile private var runtimeFilters: Array[Filter] = Array.empty
  @volatile private var plannedCache: Array[InputPartition] = _
  @volatile private var plannedFiles: Seq[_root_.graft.table.ConnectorFile] = _
  @volatile private var plannedKeyGroups: Int = -1

  override def readSchema(): StructType = prunedSchema

  override def toBatch: Batch = this

  override def description(): String = {
    val rt = if (runtimeFilters.isEmpty) ""
      else s" runtime=[${runtimeFilters.mkString(", ")}]"
    s"graft ${graft.location} pushed=[${pushed.mkString(", ")}]$rt"
  }

  // ------------------------------------------------- runtime filtering ----

  override def filterAttributes(): Array[NamedReference] = {
    val meta = graft.metadata
    // only partition source columns that survived column pruning — Spark
    // resolves these against the scan's output
    val visible = prunedSchema.fieldNames.toSet
    meta.defaultSpec.fields.flatMap(pf =>
      meta.currentSchema.fieldById(pf.sourceId)
        .filter(f => visible.contains(f.name))
        .map(f => Expressions.column(f.name))).toArray
  }

  override def filter(filters: Array[Filter]): Unit = {
    runtimeFilters = filters
    plannedCache = null
  }

  // --------------------------------------------------------- planning ----

  private def effectiveFilter = (pushed ++ runtimeFilters)
    .flatMap(FilterColumns.toColumn).reduceOption(_ && _)

  // ----------------------------------------- storage-partitioned joins ----

  /** The table's partition tuple as DSv2 clustering keys, when the scan
    * can promise key-grouped output: a SINGLE spec whose fields are
    * identity or bucket transforms on columns surviving the projection
    * (bucket resolves through GraftCatalog's FunctionCatalog — both join
    * sides bind the same canonical murmur3 function; temporal/truncate
    * transforms could follow the same path). Returns (clustering
    * expressions, partition-field name + KEY VALUE type per key — the
    * transform's OUTPUT type, which is what the partition directory
    * renders and what HasPartitionKey rows must carry).
    */
  private def spjKeys: Option[(Array[org.apache.spark.sql.connector.expressions.Expression],
      Seq[(String, org.apache.spark.sql.types.DataType)])] = {
    // key-grouped splits are only useful when storage-partitioned
    // execution is enabled; otherwise plain bin-packing sizes splits
    // better (keyed grouping forces >= one split per partition value)
    if (spark.conf.get("spark.sql.sources.v2.bucketing.enabled",
        "false") != "true") return None
    val meta = graft.metadata
    if (meta.partitionSpecs.size != 1 || asOf.nonEmpty) return None
    val spec = meta.defaultSpec
    if (spec.fields.isEmpty) return None
    val fields = spec.fields.map { pf =>
      val src = meta.currentSchema.fieldById(pf.sourceId)
        .getOrElse(return None)
      if (!prunedSchema.fieldNames.contains(src.name)) return None
      pf.transform match {
        case _root_.graft.model.TIdentity =>
          (pf.name, Expressions.identity(src.name),
            GraftTable.toSparkType(src.fieldType))
        case _root_.graft.model.TBucket(n) =>
          (pf.name, Expressions.bucket(n, src.name),
            org.apache.spark.sql.types.IntegerType
              : org.apache.spark.sql.types.DataType)
        case _ => return None
      }
    }
    Some((fields.map(_._2)
        .map(_.asInstanceOf[org.apache.spark.sql.connector.expressions.Expression])
        .toArray,
      fields.map(f => (f._1, f._3))))
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    val parts = planInputPartitions()
    spjKeys match {
      case Some((exprs, _)) if plannedKeyGroups >= 0 =>
        new org.apache.spark.sql.connector.read.partitioning
          .KeyGroupedPartitioning(exprs, plannedKeyGroups)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning
          .UnknownPartitioning(parts.length)
    }
  }

  /** Per-partition output ordering (SupportsReportOrdering): reported —
    * so EnsureRequirements drops Sort nodes under SortMergeJoins on
    * co-sorted tables — only when provably true of every planned split:
    *
    *   1. the table's default sort order is non-trivial and its leading
    *      fields are identity transforms on columns in the pruned
    *      output (the longest such prefix is reported; a prefix of a
    *      sort is itself a valid ordering);
    *   2. every planned file post-dates the order's sequence watermark
    *      ([[GraftTable.SortSinceSeqProp]] — writeFiles sorts every
    *      append/rewrite by the default order, so such files are
    *      file-local sorted);
    *   3. every split reads ranges of exactly ONE file in ascending
    *      offset order (bin-packed multi-file splits concatenate
    *      independently-sorted files — NOT sorted; the one-file shape
    *      is what sorted compaction + storage-partitioned joins
    *      produce).
    */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection}
    val meta = graft.metadata
    val order = meta.sortOrders
      .find(_.orderId == meta.defaultSortOrderId)
      .filter(_.orderId != 0)
    val since = meta.properties.getOrElse(Map.empty)
      .get(_root_.graft.table.GraftTable.SortSinceSeqProp)
      .flatMap(_.toLongOption)
    (order, since) match {
      case (Some(o), Some(watermark)) =>
        val schema = meta.currentSchema
        val prefix = o.fields.iterator.map { f =>
          if (f.transform != _root_.graft.model.TIdentity) None
          else schema.fieldById(f.sourceId)
            .filter(src => prunedSchema.fieldNames.contains(src.name))
            .map { src =>
              Expressions.sort(Expressions.column(src.name),
                if (f.direction == _root_.graft.model.SortAsc)
                  SortDirection.ASCENDING
                else SortDirection.DESCENDING,
                if (f.nullOrder == _root_.graft.model.NullsFirst)
                  NullOrdering.NULLS_FIRST
                else NullOrdering.NULLS_LAST)
            }
        }.takeWhile(_.isDefined).flatten.toArray
        if (prefix.isEmpty) return Array.empty
        val parts = planInputPartitions()
        val filesSorted =
          plannedFiles.forall(_.sequenceNumber > watermark)
        val splitsSorted = parts.forall { p =>
          val fs = p.asInstanceOf[GraftSplit].files
          fs.map(_._1).distinct.length <= 1 &&
            fs.map(_._2).sameElements(fs.map(_._2).sorted)
        }
        if (filesSorted && splitsSorted) prefix else Array.empty
      case _ => Array.empty
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val cached = plannedCache
    if (cached != null) return cached
    // threshold-dispatched: big tables prune on executors over the
    // manifest dataset; only surviving (path, schema, size, partition)
    // rows reach the driver for bin-packing — the connector never
    // materializes the full entry list driver-side
    val files = graft.plannedConnectorFiles(effectiveFilter, asOf)
    plannedFiles = files
    // `_pos` positions are counted per file from zero — such scans read
    // whole files; everything else range-splits oversized files
    val splitOk =
      !prunedSchema.fieldNames.contains(GraftMetaColumns.Pos)
    val out = spjKeys match {
      case Some((_, keyFields))
          if files.forall(f =>
            keyFields.forall { case (n, _) => f.partition.contains(n) }) =>
        try {
          val (parts, groups) =
            GraftRead.binPackKeyed(spark, files, keyFields, splitOk)
          plannedKeyGroups = groups
          parts
        } catch { case _: Exception =>
          // undecodable partition value → fall back to unkeyed splits
          plannedKeyGroups = -1
          GraftRead.binPack(spark,
            files.map(f => (f.path, f.schemaId, f.fileSize, f.format)),
            splitOk)
        }
      case _ =>
        plannedKeyGroups = -1
        GraftRead.binPack(spark,
          files.map(f => (f.path, f.schemaId, f.fileSize, f.format)),
          splitOk)
    }
    plannedCache = out
    out
  }

  override def toMicroBatchStream(
      checkpointLocation: String): streaming.MicroBatchStream =
    new GraftMicroBatchStream(graft, prunedSchema, pushed, limits,
      checkpointLocation)

  override def createReaderFactory(): PartitionReaderFactory = {
    val meta = graft.metadata
    // the logical schema the pruned column NAMES resolve against: the
    // asOf snapshot's schema for time travel, else the current schema
    val readIce = asOf
      .flatMap(id => meta.snapshotById(id).flatMap(_.schemaId))
      .map(_.toInt).flatMap(meta.schemaById)
      .getOrElse(meta.currentSchema)
    val keys = planInputPartitions()
      .map(p => { val g = p.asInstanceOf[GraftSplit]
        (g.schemaId, g.format) }).distinct
    GraftRead.factoryFor(spark, meta, readIce, prunedSchema, pushed, keys)
  }

  // Scan equality enables exchange reuse and is required for runtime
  // filtering; identity = (table, snapshot pin, projection, filters).
  override def equals(other: Any): Boolean = other match {
    case o: GraftBatchScan =>
      o.graft.location == graft.location && o.asOf == asOf &&
        o.prunedSchema == prunedSchema &&
        o.pushed.toSeq == pushed.toSeq &&
        o.runtimeFilters.toSeq == runtimeFilters.toSeq
    case _ => false
  }

  override def hashCode(): Int =
    (graft.location, asOf, prunedSchema, pushed.toSeq).hashCode()
}

/** Shared planning/reading machinery for the batch scan and the
  * micro-batch stream: bin-packing surviving files into input
  * partitions, and building per-write-time-schema reader recipes.
  */
object GraftRead {

  /** Alignment-slot marker: emit the FILE PATH as a per-file constant
    * (the `_file` metadata column). -1 stays the null-fill marker.
    */
  val FileSlot: Int = -2

  /** Alignment-slot marker: emit the row's ORIGINAL position within its
    * data file (the `_pos` metadata column). Requesting it disables
    * parquet-level row-group filter pushdown for the scan — positions
    * must be file-absolute, and skipped row groups would renumber them
    * (Spark re-applies every filter above the scan regardless).
    */
  val PosSlot: Int = -3

  /** Bin-pack planned (path, schemaId, fileSize) files into input
    * partitions, one write-time schema per partition, first-fit-decreasing
    * against the session's maxPartitionBytes target.
    *
    * Files larger than the target SPLIT into byte ranges (parquet is
    * range-splittable: a reader processes exactly the row groups whose
    * midpoint falls inside its range), so one multi-GB file fans out
    * across tasks instead of serializing on one. Pass
    * `splitLargeFiles = false` when the scan serves `_pos` — positions
    * are counted per FILE from zero, so those scans must read whole
    * files.
    */
  def binPack(spark: SparkSession,
      files: Seq[(String, Int, Long, String)],
      splitLargeFiles: Boolean = true): Array[InputPartition] = {
    val target = math.max(1L << 20,
      spark.sessionState.conf.filesMaxPartitionBytes)
    val hadoop = spark.sessionState.newHadoopConf()
    def sizeOf(path: String, recorded: Long): Long =
      if (recorded > 0L) recorded
      else { // legacy entries predating fileSize stats: ask the FS once
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(hadoop).getFileStatus(p).getLen
      }
    // one (schema, format) group per split: the reader recipe differs
    // by both. Both parquet and orc range-split by bytes (readers
    // process the row groups / stripes whose start falls in range).
    files.groupBy(f => (f._2, f._4)).toSeq.flatMap { case ((sid, fmt), es) =>
      val ranges = es.flatMap(e =>
        splitRanges(e._1, sizeOf(e._1, e._3), target, splitLargeFiles))
      packBins(ranges, target).map(b => GraftInputPartition(sid, b, fmt))
    }.toArray
  }

  /** (path, start, length) ranges of one file: whole when it fits the
    * target (or splitting is off), else even chunks ≤ target.
    */
  private def splitRanges(path: String, size: Long, target: Long,
      split: Boolean): Seq[(String, Long, Long)] =
    if (!split || size <= target) Seq((path, 0L, size))
    else {
      val n = math.ceil(size.toDouble / target).toLong
      val chunk = math.ceil(size.toDouble / n).toLong
      (0L until n).map { i =>
        val start = i * chunk
        (path, start, math.min(chunk, size - start))
      }
    }

  private def packBins(sized0: Seq[(String, Long, Long)],
      target: Long): Seq[Array[(String, Long, Long)]] = {
    val sized = sized0.sortBy(-_._3)
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[(String, Long, Long)], Long)]
    sized.foreach { f =>
      bins.indexWhere(_._2 + f._3 <= target) match {
        case -1 =>
          bins += ((scala.collection.mutable.ArrayBuffer(f), f._3))
        case i =>
          bins(i)._1 += f
          bins(i) = (bins(i)._1, bins(i)._2 + f._3)
      }
    }
    bins.map(_._1.toArray).toSeq
  }

  /** Key-grouped bin-packing for storage-partitioned joins: files group
    * by their partition TUPLE first (the decoded tuple rides on every
    * split as its HasPartitionKey), then bin-pack within each
    * (partition, write-schema) group. Returns (splits, distinct key
    * count). Throws if a partition value fails to decode — the caller
    * falls back to unkeyed splits.
    */
  def binPackKeyed(spark: SparkSession, files: Seq[_root_.graft.table.ConnectorFile],
      keyFields: Seq[(String, org.apache.spark.sql.types.DataType)],
      splitLargeFiles: Boolean = true): (Array[InputPartition], Int) = {
    val target = math.max(1L << 20,
      spark.sessionState.conf.filesMaxPartitionBytes)
    val hadoop = spark.sessionState.newHadoopConf()
    def sizeOf(path: String, recorded: Long): Long =
      if (recorded > 0L) recorded
      else {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(hadoop).getFileStatus(p).getLen
      }
    val grouped = files.groupBy(f =>
      keyFields.map { case (n, _) => f.partition.getOrElse(n, None) })
    val splits = grouped.toSeq.flatMap { case (keyStrs, fs) =>
      val keyVals: Array[Any] = keyStrs.zip(keyFields).map {
        case (vOpt, (_, dt)) =>
          vOpt.map(decodePartitionValue(_, dt)).orNull
      }.toArray
      fs.groupBy(f => (f.schemaId, f.format)).toSeq.flatMap {
        case ((sid, fmt), es) =>
          // ranges of one file share its partition tuple, so splitting
          // preserves the one-key-per-split SPJ contract
          val ranges = es.flatMap(e => splitRanges(e.path,
            sizeOf(e.path, e.fileSize), target, splitLargeFiles))
          packBins(ranges, target).map(b =>
            GraftKeyedPartition(sid, b, keyVals, fmt))
      }
    }
    (splits.toArray, grouped.size)
  }

  /** Hive-style partition-directory string → Catalyst internal value of
    * the source column type (identity transforms render the raw value;
    * Cast-from-string inverts it — dates ISO, timestamps
    * `yyyy-MM-dd HH:mm:ss[.S]`, numerics plain). Both sides of a
    * storage-partitioned join decode through this same path, so the
    * grouping keys compare consistently.
    */
  private def decodePartitionValue(s: String,
      dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val v = Cast(Literal(org.apache.spark.unsafe.types.UTF8String
        .fromString(s), org.apache.spark.sql.types.StringType),
      dt, Some("UTC")).eval(null)
    if (v == null)
      throw new IllegalArgumentException(s"undecodable partition value $s")
    v
  }

  /** Reader factory covering the given (write-time schema id, data-file
    * format) groups: each group reads files under their physical column
    * names (resolved BY FIELD ID against the logical read schema)
    * through Spark's vectorized parquet or orc reader, then aligns to
    * the logical schema.
    */
  def factoryFor(spark: SparkSession,
      meta: graft.model.TableMetadataV2, readIce: graft.model.SchemaV2,
      prunedSchema: StructType, pushed: Array[Filter],
      groupKeys: Seq[(Int, String)]): GraftReaderFactory = {
    val formats: Map[String, org.apache.spark.sql.execution.datasources
        .FileFormat] = Map(
      graft.table.DataFileEntry.Parquet -> new ParquetFileFormat,
      graft.table.DataFileEntry.Orc -> new org.apache.spark.sql.execution
        .datasources.orc.OrcFileFormat)
    // `_pos` needs file-absolute row positions counted by the reader;
    // that contract is only validated for the parquet path (the engine
    // scan refuses position-addressed orc reads for the same reason)
    require(!prunedSchema.fieldNames.contains(GraftMetaColumns.Pos) ||
      groupKeys.forall(_._2 == graft.table.DataFileEntry.Parquet),
      "position-addressed DSv2 reads (_pos) require parquet data files")
    // resolve every group's physical schema FIRST: Spark's
    // DataSourceV2ScanExecBase forbids mixing row-based and columnar
    // input partitions in one scan, so the batch decision is a single
    // scan-wide AND over all schema groups — an evolved table whose
    // groups differ in batch support falls back to rows uniformly
    val resolved = groupKeys.map { case (sid, fmt) =>
      val fileSchema = meta.schemaById(sid).getOrElse(readIce)
      // physical read schema: the pruned logical columns that exist in
      // this file group, under their WRITE-TIME names. Nested struct
      // shapes evolve by field id, but the parquet reader resolves
      // SUBfields by name — a group whose struct shape differs from the
      // logical one reads the file's own shape and realigns per row.
      val physFields = prunedSchema.fields.toSeq.flatMap { f =>
        val readField = readIce.fieldByName(f.name)
          .orElse(fileSchema.fieldByName(f.name))
        readField.flatMap(rf => fileSchema.fields.find(_.id == rf.id)
          .map(ff => (rf, ff))).map { case (rf, ff) =>
          val realign = (ff.fieldType, rf.fieldType) match {
            case (ft: graft.model.TStruct, rt: graft.model.TStruct)
              if ft != rt => Some((ft: graft.model.IceType,
                rt: graft.model.IceType))
            case _ => None
          }
          val physType = realign.map(r => GraftTable.toSparkType(r._1))
            .getOrElse(f.dataType)
          (f.name, StructField(ff.name, physType, nullable = true), realign)
        }
      }
      (sid, fmt, physFields)
    }
    // v3 initial-defaults for columns a file group predates, in
    // Catalyst internal form — the same string→typed cast the native
    // read path applies, so both serve identical values
    val defaults: Array[Any] = prunedSchema.fields.map { f =>
      readIce.fieldByName(f.name).flatMap(_.initialDefault).map { s =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          CatalystLiteral(
            org.apache.spark.unsafe.types.UTF8String.fromString(s),
            org.apache.spark.sql.types.StringType),
          f.dataType, Some("UTC")).eval(null)
      }.orNull
    }
    // a group missing a defaulted column projects a CONSTANT — served
    // on the row path (scan-wide batch decision, like realigns)
    val hasMissingDefault = resolved.exists { case (_, _, physFields) =>
      val have = physFields.map(_._1).toSet
      prunedSchema.fields.zipWithIndex.exists { case (f, k) =>
        !have.contains(f.name) && defaults(k) != null }
    }
    val columnar = !hasMissingDefault && resolved.forall {
      case (_, fmt, physFields) =>
        formats(fmt).supportBatch(spark,
          StructType(physFields.map(_._2).toArray)) &&
          physFields.forall(_._3.isEmpty)
    }
    val groups = resolved.map { case (sid, fmt, physFields) =>
      val physSchema = StructType(physFields.map(_._2).toArray)
      val physIndex = physFields.map(_._1).zipWithIndex.toMap
      val realignByName = physFields.collect {
        case (n, _, Some(r)) => n -> r }.toMap
      val realigns: Array[Option[(graft.model.IceType, graft.model.IceType)]] =
        prunedSchema.fields.map(f => realignByName.get(f.name))
      val slots: Array[Int] = prunedSchema.fields.map { f =>
        if (f.name == GraftMetaColumns.File) GraftRead.FileSlot
        else if (f.name == GraftMetaColumns.Pos) GraftRead.PosSlot
        else physIndex.getOrElse(f.name, -1)
      }
      val identity = slots.length == physSchema.length &&
        slots.zipWithIndex.forall { case (s, i) => s == i } &&
        realigns.forall(_.isEmpty)
      // only push row-group filters whose columns kept their physical
      // name — parquet-level filtering is best-effort; Spark re-applies.
      // `_pos` disables parquet filtering entirely: row positions must
      // stay file-absolute, and row-group skipping would renumber them
      val physNames = physSchema.fieldNames.toSet
      val pushable =
        if (slots.contains(GraftRead.PosSlot)) Array.empty[Filter]
        else pushed.filter(
          _.references.forall(r => physNames.contains(r)))
      val readFunc = formats(fmt).buildReaderWithPartitionValues(
        sparkSession = spark,
        dataSchema = physSchema,
        partitionSchema = StructType(Nil),
        requiredSchema = physSchema,
        filters = pushable.toIndexedSeq,
        options = Map(
          org.apache.spark.sql.execution.datasources.FileFormat
            .OPTION_RETURNING_BATCH -> columnar.toString),
        // a FRESH conf per group: buildReaderWithPartitionValues writes
        // the requested schema INTO the conf it is given, and a shared
        // conf object would leak the last group's schema into all of
        // them (local mode hands broadcasts back unserialized)
        hadoopConf = spark.sessionState.newHadoopConf())
      if (sys.props.contains("graft.debug.scan"))
        println(s"GROUP sid=$sid fmt=$fmt " +
          s"phys=${physSchema.fieldNames.mkString(",")} " +
          s"slots=${slots.mkString(",")} identity=$identity columnar=$columnar")
      (sid, fmt) -> SchemaGroupReader(readFunc, slots, identity, columnar,
        physSchema, prunedSchema, realigns, defaults)
    }.toMap
    new GraftReaderFactory(groups)
  }

  /** Catalyst expression realigning an evolved nested struct from its
    * write-time shape to the logical read shape: subfields match by
    * FIELD ID (renames resolve), subfields the file predates null-fill,
    * and a null struct stays null. The same id-based alignment the top
    * level gets, pushed inside the row.
    */
  private[connector] def realignExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fileT: graft.model.IceType, readT: graft.model.IceType)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct,
      GetStructField, If, IsNull, Literal}
    import graft.model.TStruct
    if (fileT == readT) e
    else (fileT, readT) match {
      case (TStruct(ffs), TStruct(rfs)) =>
        val kids = rfs.flatMap { rf =>
          val v = ffs.zipWithIndex.find(_._1.id == rf.id) match {
            case Some((ff, idx)) => realignExpr(
              GetStructField(e, idx, Some(ff.name)),
              ff.fieldType, rf.fieldType)
            case None => Literal(null, GraftTable.toSparkType(rf.fieldType))
          }
          Seq(Literal(org.apache.spark.unsafe.types.UTF8String
            .fromString(rf.name),
            org.apache.spark.sql.types.StringType), v)
        }
        If(IsNull(e), Literal(null, GraftTable.toSparkType(readT)),
          CreateNamedStruct(kids))
      case _ => e
    }
  }

  /** Single-schema reader factory for files the engine itself wrote
    * with exactly `schema` (no field-id alignment — identity reads):
    * the changelog's staged-range splits.
    */
  def flatFactory(spark: SparkSession,
      schema: StructType): GraftReaderFactory = {
    val parquet = new ParquetFileFormat
    val columnar = parquet.supportBatch(spark, schema)
    val readFunc = parquet.buildReaderWithPartitionValues(
      sparkSession = spark,
      dataSchema = schema,
      partitionSchema = StructType(Nil),
      requiredSchema = schema,
      filters = Seq.empty,
      options = Map(
        org.apache.spark.sql.execution.datasources.FileFormat
          .OPTION_RETURNING_BATCH -> columnar.toString),
      hadoopConf = spark.sessionState.newHadoopConf())
    new GraftReaderFactory(Map(
      (0, graft.table.DataFileEntry.Parquet) -> SchemaGroupReader(readFunc,
      schema.indices.toArray, identity = true, columnar, schema, schema,
      Array.fill(schema.length)(None),
      Array.fill[Any](schema.length)(null))))
  }
}

/** One input partition: (path, start, length) byte ranges of one
  * write-time schema, bin-packed to the maxPartitionBytes target.
  */
sealed trait GraftSplit extends InputPartition {
  def schemaId: Int
  def files: Array[(String, Long, Long)]
  /** Data-file format of every file in this split (splits never mix
    * formats — the reader recipe is per (schema, format) group).
    */
  def format: String
}

case class GraftInputPartition(schemaId: Int,
    files: Array[(String, Long, Long)],
    format: String = graft.table.DataFileEntry.Parquet) extends GraftSplit

/** A split whose rows all share one partition tuple — the unit of
  * key-grouped (storage-partitioned) execution.
  */
case class GraftKeyedPartition(schemaId: Int,
    files: Array[(String, Long, Long)], keyVals: Array[Any],
    format: String = graft.table.DataFileEntry.Parquet) extends GraftSplit
    with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(keyVals)
}

/** Per-schema-group read recipe: Spark's parquet reader closure plus the
  * field-id alignment (slot i of the logical output = physical column
  * slots(i), or -1 → null fill).
  */
case class SchemaGroupReader(
    readFunc: PartitionedFile => Iterator[InternalRow],
    slots: Array[Int],
    identity: Boolean,
    columnar: Boolean,
    physSchema: StructType,
    logicalSchema: StructType,
    realigns: Array[Option[(graft.model.IceType, graft.model.IceType)]],
    // Catalyst-internal initial-default per logical column (null = none)
    defaults: Array[Any])
    extends Serializable

class GraftReaderFactory(groups: Map[(Int, String), SchemaGroupReader])
    extends PartitionReaderFactory {

  private def groupOf(p: GraftSplit): SchemaGroupReader =
    groups((p.schemaId, p.format))

  override def supportColumnarReads(partition: InputPartition): Boolean =
    groupOf(partition.asInstanceOf[GraftSplit]).columnar

  private def rawIterator(p: GraftSplit): Iterator[AnyRef] =
    perFileIterator(p).flatMap(_._2)

  /** One (path, reader output) pair per file — the path feeds per-file
    * constant columns (`_file`).
    */
  private def perFileIterator(p: GraftSplit)
      : Iterator[(String, Iterator[AnyRef])] = {
    val g = groupOf(p)
    p.files.iterator.map { case (path, start, len) =>
      path -> g.readFunc(PartitionedFile(InternalRow.empty,
        SparkPath.fromPathString(path), start, len))
        .asInstanceOf[Iterator[AnyRef]]
    }
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftSplit]
    val g = groupOf(p)
    // the parquet reader may yield ColumnarBatch even on the row path
    // (vectorized reader); flatten defensively
    def rowsOf(raw: Iterator[AnyRef]): Iterator[InternalRow] = raw.flatMap {
      case b: ColumnarBatch => b.rowIterator().asScala
      case r: InternalRow => Iterator.single(r)
    }
    val aligned: Iterator[InternalRow] =
      if (g.identity) rowsOf(rawIterator(p))
      else perFileIterator(p).flatMap { case (path, raw) =>
        // projection is rebuilt per FILE so FileSlot binds this file's
        // path as a constant; PosSlot reads a one-field meta row joined
        // to the right of the data row and stepped per row
        val nPhys = g.physSchema.length
        val exprs = g.slots.zip(g.logicalSchema.fields).zipWithIndex.map {
          case ((GraftRead.FileSlot, f), _) => CatalystLiteral(
            org.apache.spark.unsafe.types.UTF8String.fromString(path),
            f.dataType)
          case ((GraftRead.PosSlot, _), _) => BoundReference(nPhys,
            org.apache.spark.sql.types.LongType, nullable = false)
          case ((-1, f), k) => CatalystLiteral(g.defaults(k), f.dataType)
          case ((i, f), k) => g.realigns(k) match {
            case Some((ft, rt)) => GraftRead.realignExpr(
              BoundReference(i, g.physSchema(i).dataType, nullable = true),
              ft, rt)
            case None => BoundReference(i, f.dataType, nullable = true)
          }
        }
        val proj = UnsafeProjection.create(exprs.toIndexedSeq)
        if (g.slots.contains(GraftRead.PosSlot)) {
          val metaRow = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(1)
          val joined = new org.apache.spark.sql.catalyst.expressions
            .JoinedRow
          var pos = -1L
          rowsOf(raw).map { r =>
            pos += 1L
            metaRow.setLong(0, pos)
            proj(joined(r, metaRow))
          }
        } else rowsOf(raw).map(proj)
      }
    iteratorReader(aligned)
  }

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = partition.asInstanceOf[GraftSplit]
    val g = groupOf(p)
    val aligned: Iterator[ColumnarBatch] =
      if (g.identity) rawIterator(p).map(_.asInstanceOf[ColumnarBatch])
      else perFileIterator(p).flatMap { case (path, raw) =>
        var filePos = 0L // running row offset within THIS file
        raw.map(_.asInstanceOf[ColumnarBatch]).map { b =>
          val start = filePos
          filePos += b.numRows
          val vecs: Array[ColumnVector] =
            g.slots.zip(g.logicalSchema.fields).map {
              case (GraftRead.FileSlot, f) =>
                val v = new org.apache.spark.sql.execution.vectorized
                  .ConstantColumnVector(b.numRows, f.dataType)
                v.setUtf8String(org.apache.spark.unsafe.types
                  .UTF8String.fromString(path))
                v
              case (GraftRead.PosSlot, _) =>
                val v = new org.apache.spark.sql.execution.vectorized
                  .OnHeapColumnVector(b.numRows,
                    org.apache.spark.sql.types.LongType)
                var i = 0
                while (i < b.numRows) { v.putLong(i, start + i); i += 1 }
                v
              case (-1, f) =>
                val v = new org.apache.spark.sql.execution.vectorized
                  .ConstantColumnVector(b.numRows, f.dataType)
                v.setNull()
                v
              case (i, _) => b.column(i)
            }
          new ColumnarBatch(vecs, b.numRows)
        }
      }
    iteratorReader(aligned)
  }

  private def iteratorReader[T](it: Iterator[T]): PartitionReader[T] =
    new PartitionReader[T] {
      private var current: T = _
      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false
      override def get(): T = current
      override def close(): Unit = ()
    }
}
