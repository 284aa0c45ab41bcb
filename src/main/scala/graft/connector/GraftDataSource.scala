package graft.connector

import graft.table.{FileMetadataIo, GraftTable, MetadataIo}
import graft.model._
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions
import org.apache.spark.sql.connector.expressions.{Expressions, Transform => SparkTransform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util.OptionalLong
import scala.jdk.CollectionConverters._

/** Spark DataSourceV2 connector for graft tables:
  *
  * {{{
  *   spark.read.format("graft").load("/path/to/table")          // batch read
  *   spark.read.format("graft").option("snapshot-id", id).load(p) // time travel
  *   spark.read.format("graft").option("ref", "audit").load(p)  // branch/tag
  *   df.write.format("graft").mode("append").save(p)            // commit append
  *   df.write.format("graft").option("branch", b).mode("append").save(p) // WAP stage
  * }}}
  *
  * The scan integrates with Catalyst natively: filters arrive via
  * SupportsPushDownFilters and drive graft's transform-aware partition +
  * min/max file pruning BEFORE any Spark job runs; column pruning arrives
  * via SupportsPushDownRequiredColumns and reaches the parquet readers;
  * SupportsReportStatistics feeds pruned row/byte counts to the join
  * planner so a filtered graft table broadcasts when it should.
  *
  * Execution delegates to the proven DataFrame read path (schema-aligned
  * reads, position + sequence-scoped equality deletes) through Spark's
  * V1Scan bridge — the same strategy Spark's own JDBC connector uses — so
  * DSv2 reads and `GraftTable.scan` CANNOT drift semantically.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  private def location(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft source requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSparkTable.load(location(options), options).schema()

  override def getTable(schema: StructType,
      partitioning: Array[SparkTransform],
      properties: java.util.Map[String, String]): Table =
    GraftSparkTable.load(location(new CaseInsensitiveStringMap(properties)),
      new CaseInsensitiveStringMap(properties))
}

object GraftSparkTable {
  def load(location: String, options: CaseInsensitiveStringMap): GraftSparkTable = {
    val asOf = readSnapshotId(location, options)
    val incremental = Option(options.get("start-snapshot-id")).map { s =>
      require(asOf.isEmpty,
        "incremental read cannot combine with snapshot-id/ref time travel")
      (s.toLong, Option(options.get("end-snapshot-id")).map(_.toLong))
    }
    new GraftSparkTable(location, asOf,
      changelog = options.getBoolean(GraftChangelog.OptionKey, false),
      incremental = incremental)
  }

  /** Resolve the `snapshot-id` / `ref` read options to a snapshot id. */
  private def readSnapshotId(location: String,
      options: CaseInsensitiveStringMap): Option[Long] = {
    val sid = Option(options.get("snapshot-id")).map(_.toLong)
    val ref = Option(options.get("ref"))
    require(sid.isEmpty || ref.isEmpty,
      "set at most one of snapshot-id and ref")
    sid.orElse(ref.map { name =>
      val t = GraftTable.load(SparkSession.active, location)
      t.metadata.refs.flatMap(_.get(name))
        .getOrElse(throw new IllegalArgumentException(s"no ref $name"))
        .snapshotId
    })
  }
}

/** One graft table as a Spark DSv2 Table (optionally pinned to a
  * snapshot for time travel — reads resolve the snapshot's own schema).
  */
class GraftSparkTable(val location: String, asOf: Option[Long],
    changelog: Boolean = false,
    incremental: Option[(Long, Option[Long])] = None,
    // the REST catalog mode routes this table's COMMITS through the
    // REST service; reads and data/manifest IO stay on shared storage
    private[connector] val metadataIo: MetadataIo = FileMetadataIo)
    extends Table with SupportsRead with SupportsWrite
    with SupportsDeleteV2
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  def this(location: String, asOf: Option[Long]) =
    this(location, asOf, changelog = false)

  /** Iceberg-parity virtual columns, servable on BOTH read paths: the
    * native columnar scan emits a per-file constant vector, the V1
    * delete-bridge derives it from `_metadata.file_path`. The changelog
    * shape serves none — its change rows are staged materializations,
    * not file-resident rows.
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    if (changelog) Array.empty
    else GraftMetaColumns.columns ++
      // _row_id / _last_updated_sequence_number exist only where the
      // table declares row lineage
      (if (graft.metadata.properties.exists(
          _.get(GraftTable.RowLineageProp).contains("true")))
        GraftMetaColumns.lineageColumns
      else Array.empty[org.apache.spark.sql.connector.catalog.MetadataColumn])

  private def spark: SparkSession = SparkSession.active
  private[connector] def graft: GraftTable =
    GraftTable.load(spark, location, metadataIo)

  // ------------------------------------------ SQL DELETE FROM support ----
  // `DELETE FROM graft_cat.db.t WHERE ...` plans DeleteFromTableExec when
  // every predicate translates; execution is the engine's file-granular
  // copy-on-write deleteWhere (exact row-level semantics, not a
  // metadata-only drop), so any translatable predicate is accepted.

  private def deleteCondition(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[Column] = {
    val v1 = org.apache.spark.sql.graft.Bridge.predicatesToV1(predicates)
    if (v1.length != predicates.length) None
    else {
      val cols = v1.flatMap(FilterColumns.toColumn)
      if (cols.length != v1.length) None
      // rows delete iff ALL predicates match
      else Some(cols.reduceOption(_ && _).getOrElse(lit(true)))
    }
  }

  override def canDeleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean = asOf.isEmpty && deleteCondition(predicates).isDefined

  override def deleteWhere(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    require(asOf.isEmpty, "cannot delete from a time-travel read")
    val cond = deleteCondition(predicates).getOrElse(
      throw new UnsupportedOperationException(
        s"untranslatable DELETE predicates: ${predicates.mkString(", ")}"))
    graft.deleteWhere(cond)
    ()
  }

  override def name(): String = s"graft.`$location`"

  override def schema(): StructType = {
    val meta = graft.metadata
    val sid = asOf.flatMap(id => meta.snapshotById(id).flatMap(_.schemaId))
      .map(_.toInt).getOrElse(meta.currentSchemaId)
    val base = GraftTable.toSparkSchema(
      meta.schemaById(sid).getOrElse(meta.currentSchema))
    if (changelog) GraftChangelog.schemaFor(base) else base
  }

  /** v2 column surface WITH write-defaults: the analyzer fills an
    * INSERT that omits a defaulted column from here (schema() alone
    * would null-fill it).
    */
  override def columns()
      : Array[org.apache.spark.sql.connector.catalog.Column] = {
    import org.apache.spark.sql.connector.catalog.{Column => V2Column}
    val meta = graft.metadata
    val iceSchema = meta.currentSchema
    schema().fields.map { f =>
      iceSchema.fieldByName(f.name).flatMap(_.writeDefault) match {
        case Some(d) if !changelog =>
          val lit = org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal(
              org.apache.spark.unsafe.types.UTF8String.fromString(d),
              org.apache.spark.sql.types.StringType),
            f.dataType, Some("UTC")).eval(null)
          val sql = org.apache.spark.sql.catalyst.expressions
            .Literal(lit, f.dataType).sql
          V2Column.create(f.name, f.dataType, f.nullable, null,
            new org.apache.spark.sql.connector.catalog.ColumnDefaultValue(
              sql, org.apache.spark.sql.graft.Bridge
                .literalValue(lit, f.dataType)),
            null)
        case _ => V2Column.create(f.name, f.dataType, f.nullable)
      }
    }
  }

  override def partitioning(): Array[SparkTransform] =
    graft.metadata.defaultSpec.fields.flatMap { pf =>
      graft.metadata.currentSchema.fieldById(pf.sourceId).map { src =>
        pf.transform match {
          case TIdentity => Expressions.identity(src.name)
          case TBucket(n) => Expressions.bucket(n, src.name)
          case TTruncate(w) =>
            Expressions.apply("truncate", Expressions.literal(w),
              Expressions.column(src.name))
          case TYear => Expressions.years(src.name)
          case TMonth => Expressions.months(src.name)
          case TDay => Expressions.days(src.name)
          case THour => Expressions.hours(src.name)
          case TVoid =>
            Expressions.apply("void", Expressions.column(src.name))
        }
      }
    }.toArray

  override def properties(): java.util.Map[String, String] =
    graft.metadata.properties.getOrElse(Map.empty).asJava

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      // BATCH_WRITE advertises writability to DataFrameWriter.save();
      // the WriteBuilder still produces a V1Write, which Spark's write
      // strategy routes to the V1 exec nodes
      TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC,
      // snapshot-offset streaming read of append-only tables
      TableCapability.MICRO_BATCH_READ,
      // per-epoch append commits with the appendStream exactly-once
      // high-water protocol (GraftStreamingWrite)
      TableCapability.STREAMING_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (changelog) {
      val g = graft
      val start = GraftChangelog.fromSeq(g,
        options.get(GraftChangelog.FromOption))
      val to = Option(options.get(GraftChangelog.ToOption)).map(_.toLong)
      val out = schema()
      new ScanBuilder {
        override def build(): Scan =
          new GraftChangelogScan(g, out, start, to,
            StreamLimits.fromOptions(options))
      }
    } else incremental match {
      case Some((from, toOpt)) =>
        // append-flavored incremental consumption as a batch read:
        //   spark.read.format("graft").option("start-snapshot-id", s1)
        //     [.option("end-snapshot-id", s2)].load(loc)
        // rows added strictly after `from` up to `to` (default current),
        // with the range's MoR deletes applied — the engine's
        // incrementalRead, planned O(added) above the threshold
        val g = graft
        val to = toOpt.orElse(g.metadata.currentSnapshotId).getOrElse(
          throw new IllegalArgumentException("table has no snapshot"))
        val out = schema()
        new ScanBuilder {
          override def build(): Scan = new GraftIncrementalScan(g, out, from, to)
        }
      case None => new GraftScanBuilder(graft, schema(), asOf,
        StreamLimits.fromOptions(options))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(asOf.isEmpty, "cannot write to a time-travel read")
    require(!changelog, "the changelog read shape is not writable")
    require(incremental.isEmpty, "an incremental read is not writable")
    new GraftWriteBuilder(graft, Option(info.options.get("branch")),
      Some(info))
  }
}

/** Incremental batch read: rows added in `(from, to]` with the range's
  * MoR deletes applied — the engine's incrementalRead behind the V1
  * bridge (it is a deletes-applied DataFrame, same bridge rationale as
  * GraftV1Scan). Volume is O(added), so pushdown stays with Spark.
  */
class GraftIncrementalScan(graft: GraftTable, out: StructType,
    from: Long, to: Long) extends V1Scan {

  override def readSchema(): StructType = out

  override def description(): String =
    s"graft-incremental ${graft.location} ($from, $to]"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val rel = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = out
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] =
        graft.incrementalRead(from, to)
          .queryExecution.toRdd.asInstanceOf[RDD[Row]]
    }
    rel.asInstanceOf[T]
  }
}

/** Read-only metadata tables surfaced through SQL (Iceberg parity):
  * `SELECT * FROM g.db.t.snapshots|history|files|partitions|refs|manifests|
  * metadata_log_entries`. Each read recomputes from current table
  * metadata.
  */
class GraftMetaTable(location: String, kind: String)
    extends Table with SupportsRead {

  private def spark: SparkSession = SparkSession.active

  private def df: DataFrame = {
    val t = GraftTable.load(spark, location)
    kind match {
      case "snapshots" => t.snapshotsDf
      case "history" => t.historyDf
      case "files" => t.filesDf
      case "partitions" => t.partitionsDf
      case "refs" => t.refsDf
      case "manifests" => t.manifestsDf
      case "metadata_log_entries" => t.metadataLogDf
      case "position_deletes" => t.positionDeletesDf
      case "all_files" => t.allFilesDf
      case "all_manifests" => t.allManifestsDf
      case "entries" => t.entriesDf
      case "all_entries" => t.allEntriesDf
    }
  }

  override def name(): String = s"graft.`$location`.$kind"

  override def schema(): StructType = df.schema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder = new ScanBuilder {
    override def build(): Scan = new V1Scan {
      private val pinned = df
      override def readSchema(): StructType = pinned.schema
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T = {
        val rel = new BaseRelation with TableScan {
          override def sqlContext: SQLContext = context
          override def schema: StructType = pinned.schema
          override def needConversion: Boolean = false
          override def buildScan(): RDD[Row] =
            pinned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
        }
        rel.asInstanceOf[T]
      }
    }
  }
}

object GraftMetaTable {
  val Kinds: Set[String] =
    Set("snapshots", "history", "files", "partitions", "refs",
      "manifests", "metadata_log_entries", "position_deletes",
      "all_files", "all_manifests", "entries", "all_entries")
}

/** Collects Catalyst's pushed filters and required columns. Filters are
  * used for file-level pruning (and reported as pushed for plan
  * visibility) but conservatively re-evaluated by Spark above the scan —
  * min/max pruning is may-match, not exact.
  */
/** Metadata (virtual) columns the connector serves. */
object GraftMetaColumns {
  val File = graft.table.GraftTable.FileCol
  val Pos = graft.table.GraftTable.RowPosCol

  /** (name, type, comment) of every served metadata column, in the
    * order they append to a read schema when requested.
    */
  val specs: Seq[(String, org.apache.spark.sql.types.DataType, String)] =
    Seq(
      (File, org.apache.spark.sql.types.StringType,
        "on-disk data file path of the row"),
      (Pos, org.apache.spark.sql.types.LongType,
        "original row position within the data file"))

  val names: Set[String] = specs.map(_._1).toSet

  val RowId: String = graft.table.GraftTable.RowIdCol
  val LastUpd: String = graft.table.GraftTable.LastUpdCol

  /** Row-lineage virtual columns — advertised ONLY on tables that
    * declare `graft.row-lineage=true` (served via scanWithLineage on
    * the V1 bridge).
    */
  val lineageSpecs: Seq[(String, org.apache.spark.sql.types.DataType, String)] =
    Seq(
      (RowId, org.apache.spark.sql.types.LongType,
        "stable row id assigned at append (row lineage)"),
      (LastUpd, org.apache.spark.sql.types.LongType,
        "data sequence number of the commit that last wrote the row"))

  val lineageNames: Set[String] = lineageSpecs.map(_._1).toSet

  private def toColumns(
      ss: Seq[(String, org.apache.spark.sql.types.DataType, String)])
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    ss.map { case (n, dt, c) =>
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = n
        override def dataType(): org.apache.spark.sql.types.DataType = dt
        override def isNullable: Boolean = false
        override def comment(): String = c
      }: org.apache.spark.sql.connector.catalog.MetadataColumn
    }.toArray

  val columns: Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    toColumns(specs)

  val lineageColumns
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    toColumns(lineageSpecs)
}

class GraftScanBuilder(graft: GraftTable, tableSchema: StructType,
    asOf: Option[Long], limits: StreamLimits = StreamLimits.none)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var requiredNames: Seq[String] = tableSchema.fieldNames.toSeq
  private var pushedAggs: Seq[GraftAggScan.Agg] = Seq.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(FilterColumns.toColumn(_).isDefined)
    filters // all residual: file pruning is approximate by design
  }

  override def pushedFilters(): Array[Filter] = pushed

  // --------------------------- COUNT(*)/MIN/MAX from table metadata ----
  // A bare `SELECT COUNT(*)[, MIN(c), MAX(c)] FROM graft.t` answers from
  // manifest rollups and per-file stat bounds (GraftTable.countRows /
  // columnExtreme) — zero data files scanned, except legacy files
  // written without stats for the asked column (the boundary set).
  // Complete pushdown is only claimed when sound:
  //   - no pushed filters (graft file pruning is may-match, filters stay
  //     residual, so Spark never offers an aggregation past a filter);
  //   - MIN/MAX only on stat-aggregable types (no float/double — NaN
  //     ordering; no zoned timestamps — decode would be tz-dependent)
  //     and only on DELETE-FREE snapshots (a MoR delete could remove
  //     the extreme row);
  //   - COUNT(*) alone tolerates deletes (countRows subtracts exactly).
  // Everything else aggregates through the ordinary columnar scan.

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = translate(agg).isDefined

  private def translate(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Seq[GraftAggScan.Agg]] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty ||
        agg.aggregateExpressions.isEmpty) return None
    def topCol(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: org.apache.spark.sql.connector.expressions.NamedReference
          if r.fieldNames.length == 1 &&
            tableSchema.fieldNames.contains(r.fieldNames()(0)) &&
            _root_.graft.table.Pruning.statAggregable(
              tableSchema(r.fieldNames()(0)).dataType) =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    val translated = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(GraftAggScan.CountStarAgg)
      case m: Min => topCol(m.column).map(GraftAggScan.MinAgg)
      case m: Max => topCol(m.column).map(GraftAggScan.MaxAgg)
      case _ => None
    }
    if (translated.exists(_.isEmpty)) return None
    val aggs = translated.flatten
    val needsDeleteFree = aggs.exists(_ != GraftAggScan.CountStarAgg)
    if (needsDeleteFree && graft.liveManifests(asOf).exists(_.content != 0))
      None
    else Some(aggs)
  }

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean =
    translate(agg) match {
      case Some(aggs) => pushedAggs = aggs; true
      case None => false
    }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // nested pruning is intentionally widened back to whole top-level
    // columns: the V1 bridge materializes full field values
    requiredNames = requiredSchema.fieldNames.toSeq

  override def build(): Scan = {
    if (pushedAggs.nonEmpty)
      return new GraftAggScan(graft, asOf, pushedAggs,
        pushedAggs.map {
          case GraftAggScan.CountStarAgg =>
            org.apache.spark.sql.types.LongType: org.apache.spark.sql.types.DataType
          case GraftAggScan.MinAgg(c) => tableSchema(c).dataType
          case GraftAggScan.MaxAgg(c) => tableSchema(c).dataType
        })
    val prunedSchema = StructType(
      tableSchema.fields.filter(f => requiredNames.contains(f.name)) ++
        // requested metadata columns ride at the END of the read schema;
        // the reader factories emit them per file (path constant / row
        // position counter)
        (GraftMetaColumns.specs ++ GraftMetaColumns.lineageSpecs).collect {
          case (n, dt, _) if requiredNames.contains(n) =>
            org.apache.spark.sql.types.StructField(n, dt, nullable = false)
        })
    // delete-free snapshots (the dominant shape at scale: append-only
    // ingest) take the native columnar batch path; snapshots carrying
    // position/equality deletes — and lineage-column reads — fall back
    // to the V1 bridge, which runs the proven DataFrame logic unchanged
    val wantsLineage =
      requiredNames.exists(GraftMetaColumns.lineageNames.contains)
    val hasDeletes = graft.liveManifests(asOf).exists(_.content != 0)
    // adopted-avro tables also bridge: avro has no vectorized FileFormat
    // in this build, and the engine scan decodes it. The flag is a table
    // property stamped at adoption (the only way avro files enter) and
    // cleared by a full compact() — an O(1) check, never a manifest load.
    val hasAvro = graft.hasAvroFlag
    if (hasDeletes || wantsLineage || hasAvro)
      new GraftV1Scan(graft, prunedSchema, pushed, asOf, limits)
    else new GraftBatchScan(graft, prunedSchema, pushed, asOf, limits)
  }
}

/** Completely-pushed metadata aggregation: one row of COUNT(*)/MIN/MAX
  * values derived from manifest rollups and per-file stat bounds
  * (GraftTable.countRows / columnExtreme). Output columns bind
  * positionally to the pushed aggregate expressions.
  */
class GraftAggScan(graft: GraftTable, asOf: Option[Long],
    aggs: Seq[GraftAggScan.Agg],
    types: Seq[org.apache.spark.sql.types.DataType]) extends V1Scan {

  private val schema = StructType(aggs.zip(types).zipWithIndex.map {
    case ((a, dt), i) => org.apache.spark.sql.types.StructField(
      s"agg_$i", dt, nullable = a != GraftAggScan.CountStarAgg)
  })

  override def readSchema(): StructType = schema

  override def description(): String = {
    val shown = aggs.map {
      case GraftAggScan.CountStarAgg => "COUNT(*)"
      case GraftAggScan.MinAgg(c) => s"MIN($c)"
      case GraftAggScan.MaxAgg(c) => s"MAX($c)"
    }
    s"graft ${graft.location} PushedAggregates=[${shown.mkString(", ")}]"
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val rel = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = GraftAggScan.this.schema
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] = {
        lazy val cnt = graft.countRows(None, asOf)
        val values: Seq[Any] = aggs.map {
          case GraftAggScan.CountStarAgg => cnt
          case GraftAggScan.MinAgg(c) =>
            graft.columnExtreme(c, isMin = true, asOf).orNull
          case GraftAggScan.MaxAgg(c) =>
            graft.columnExtreme(c, isMin = false, asOf).orNull
        }
        val one = context.sparkSession.createDataFrame(
          java.util.Collections.singletonList(Row(values: _*)),
          GraftAggScan.this.schema)
        one.queryExecution.toRdd.asInstanceOf[RDD[Row]]
      }
    }
    rel.asInstanceOf[T]
  }
}

object GraftAggScan {
  sealed trait Agg
  case object CountStarAgg extends Agg
  case class MinAgg(col: String) extends Agg
  case class MaxAgg(col: String) extends Agg
}

/** The scan: prunes with the pushed filters, reports pruned-plan
  * statistics, and executes through the table's DataFrame read path.
  */
/** Post-pruning statistics shared by both scan shapes: the join planner
  * sees the size AFTER partition/stats pruning, so a filtered fact table
  * can broadcast. Above the distributed-planning threshold the estimate
  * falls back to O(refs) manifest rollups — never a driver loop over all
  * entries.
  */
trait GraftScanStatistics extends SupportsReportStatistics {
  protected def graft: GraftTable
  protected def prunedSchema: StructType
  protected def pushed: Array[Filter]
  protected def asOf: Option[Long]

  protected final def filterColumn: Option[Column] =
    pushed.flatMap(FilterColumns.toColumn).reduceOption(_ && _)

  override def estimateStatistics(): Statistics = {
    val refs = graft.liveManifests(asOf)
    val (rows, bytes) =
      if (refs.map(_.entryCount).sum >= graft.planningThreshold) {
        val dataRefs = refs.filter(_.content == 0)
        val delRows = refs.filter(_.content != 0).map(_.recordCount).sum
        (math.max(0L, dataRefs.map(_.recordCount).sum - delRows), 0L)
      } else {
        val entries = graft.planFiles(filterColumn, asOf).filter(_.isData)
        (entries.map(_.recordCount).sum,
          entries.map(e => math.max(e.fileSize, 0L)).sum)
      }
    val rowWidth = math.max(8,
      prunedSchema.fields.map(_.dataType.defaultSize + 1).sum)
    val sizeEst = if (bytes > 0L) bytes else rows * rowWidth
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(sizeEst)
      override def numRows(): OptionalLong = OptionalLong.of(rows)
      override def columnStats()
          : java.util.Map[expressions.NamedReference,
            colstats.ColumnStatistics] = reportedColumnStats
    }
  }

  /** ANALYZE-produced per-column statistics (NDV / nulls / bounds from
    * the stats sidecar of this read's snapshot or its nearest ancestor),
    * keyed for Spark's `transformV2Stats` → CBO join sizing. Table-level
    * numbers ride with the post-pruning row count: pushed filters stay
    * RESIDUAL in the plan here (may-match pruning), so Spark's own
    * FilterEstimation applies selectivity above the scan using exactly
    * these stats. Computed once per scan — O(analyzed columns).
    */
  protected final lazy val reportedColumnStats
      : java.util.Map[expressions.NamedReference,
        colstats.ColumnStatistics] = {
    val m = new java.util.HashMap[expressions.NamedReference,
      colstats.ColumnStatistics]()
    try graft.columnStatistics(asOf).foreach { case (_, _, entries) =>
      val byName = entries.map(e => e.name -> e).toMap
      prunedSchema.fields.foreach { f =>
        byName.get(f.name).foreach { e =>
          // min/max only for types whose catalyst-internal value is the
          // parsed box (CBO range estimation); others still carry NDV
          def parse(s: String): Option[Object] = f.dataType match {
            case org.apache.spark.sql.types.IntegerType =>
              s.toIntOption.map(Int.box)
            case org.apache.spark.sql.types.LongType =>
              s.toLongOption.map(Long.box)
            case org.apache.spark.sql.types.ShortType =>
              s.toShortOption.map(Short.box)
            case org.apache.spark.sql.types.DoubleType =>
              s.toDoubleOption.map(Double.box)
            case org.apache.spark.sql.types.FloatType =>
              s.toFloatOption.map(Float.box)
            case _ => None
          }
          m.put(Expressions.column(f.name),
            new colstats.ColumnStatistics {
              override def distinctCount(): OptionalLong =
                OptionalLong.of(e.ndv)
              override def nullCount(): OptionalLong =
                OptionalLong.of(e.nullCount)
              override def min(): java.util.Optional[Object] =
                e.min.flatMap(parse) match {
                  case Some(v) => java.util.Optional.of(v)
                  case None => java.util.Optional.empty()
                }
              override def max(): java.util.Optional[Object] =
                e.max.flatMap(parse) match {
                  case Some(v) => java.util.Optional.of(v)
                  case None => java.util.Optional.empty()
                }
              override def avgLen(): OptionalLong =
                e.avgLen.map(OptionalLong.of).getOrElse(OptionalLong.empty)
              override def maxLen(): OptionalLong =
                e.maxLen.map(OptionalLong.of).getOrElse(OptionalLong.empty)
            })
        }
      }
    } catch { case _: Exception => () } // stats are advisory, never fatal
    m
  }
}

/** The deletes-present scan shape: executes through the table's
  * DataFrame read path (schema-aligned reads, position + sequence-scoped
  * equality deletes) via Spark's V1 bridge, so DSv2 reads of mutated
  * tables CANNOT drift from `GraftTable.scan`. (Note: Spark wraps V1
  * scans in a stats-opaque V1ScanWrapper during pushdown, so reported
  * statistics only bind on the native batch path.)
  */
class GraftV1Scan(protected val graft: GraftTable,
    protected val prunedSchema: StructType,
    protected val pushed: Array[Filter], protected val asOf: Option[Long],
    limits: StreamLimits = StreamLimits.none)
    extends V1Scan with GraftScanStatistics {

  override def readSchema(): StructType = prunedSchema

  // a streaming read that routed here (history carries deletes) must
  // surface GraftMicroBatchStream's append-only diagnostic, not Scan's
  // generic UnsupportedOperationException
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(graft, prunedSchema, pushed, limits,
      checkpointLocation)

  override def description(): String =
    s"graft ${graft.location} pushed=[${pushed.mkString(", ")}]"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    val rel = new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = prunedSchema
      // rows come out of an inner Spark plan as UnsafeRow already
      override def needConversion: Boolean = false
      override def buildScan(): RDD[Row] = {
        val withFile =
          prunedSchema.fieldNames.contains(GraftMetaColumns.File)
        val withPos =
          prunedSchema.fieldNames.contains(GraftMetaColumns.Pos)
        val wantsLineage = prunedSchema.fieldNames
          .exists(GraftMetaColumns.lineageNames.contains)
        val df =
          if (wantsLineage) {
            require(!withFile && !withPos, "lineage columns cannot yet " +
              "combine with _file/_pos in one read")
            require(asOf.isEmpty,
              "lineage columns are not served on time-travel reads")
            graft.scanWithLineage(filterColumn)
          } else graft.scan(filterColumn, asOf, withFileColumn = withFile,
            withPosColumn = withPos)
        val projected =
          if (prunedSchema.isEmpty) df.select()
          else df.select(prunedSchema.fieldNames.map(col).toIndexedSeq: _*)
        projected.queryExecution.toRdd.asInstanceOf[RDD[Row]]
      }
    }
    rel.asInstanceOf[T]
  }
}

/** Write modes arrive as WriteBuilder mixin calls; execution delegates to
  * the table's commit protocol (executor-written stats shards + atomic
  * metadata swap with optimistic retry) through the V1 bridge.
  */
class GraftWriteBuilder(graft: GraftTable, branch: Option[String] = None,
    info: Option[LogicalWriteInfo] = None)
    extends WriteBuilder
    with SupportsTruncate with SupportsOverwrite with SupportsDynamicOverwrite {

  private var overwriteCond: Option[Column] = None
  private var dynamic = false

  override def truncate(): WriteBuilder = {
    overwriteCond = Some(lit(true)); this
  }

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    overwriteCond = Some(filters.flatMap(FilterColumns.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true)))
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    dynamic = true; this
  }

  override def build(): Write = new V1Write {
    /** DSv2 streaming sink (STREAMING_WRITE): append output mode only —
      * per-epoch append commits via GraftStreamingWrite, exactly-once
      * under the same stream high-water protocol as appendStream.
      */
    override def toStreaming: org.apache.spark.sql.connector.write
        .streaming.StreamingWrite = {
      require(branch.isEmpty,
        "streaming writes to a branch are not supported — stage with " +
          "the engine's appendToBranch instead")
      require(overwriteCond.isEmpty && !dynamic,
        "the graft streaming sink supports APPEND output mode only")
      val meta = graft.metadata
      require(meta.defaultSortOrderId == 0,
        "streaming writes to a table with a default sort order are " +
          "unsupported (micro-batch files would break the table's " +
          "sorted-file claim) — use the engine's appendStream, which " +
          "sorts within batches")
      new GraftStreamingWrite(graft.location, graft.io, info.getOrElse(
        throw new IllegalStateException(
          "streaming write without LogicalWriteInfo")))
    }

    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          // Iceberg-style session-wide WAP: with graft.wap.branch set,
          // every plain INSERT/append stages onto that branch until the
          // conf is cleared and the branch fast-forwarded
          val effectiveBranch = branch.orElse(
            Option(data.sparkSession.conf.get("graft.wap.branch", null))
              .filter(_.nonEmpty))
          effectiveBranch match {
            // write-audit-publish through the PUBLIC surface: stage onto
            // the branch, audit via .option("ref", b), publish with
            // fastForward — main readers see nothing until then
            case Some(b) =>
              require(overwriteCond.isEmpty && !dynamic,
                "branch writes support append only (stage, audit, publish)")
              graft.appendToBranch(b, data); ()
            case None if dynamic => graft.overwritePartitions(data); ()
            case None => overwriteCond match {
              // one commit: readers never see the truncated-but-unfilled gap
              case Some(cond) => graft.overwriteWhere(cond, data); ()
              case None => graft.append(data); ()
            }
          }
        }
      }
  }
}

/** DSv2 source Filter → Column translation (the subset graft pruning
  * understands; anything else stays Spark-side).
  */
object FilterColumns {
  import sources._

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
