package graft.connector

import graft.table.GraftTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Maintenance stored procedures behind Spark 4's SQL `CALL` syntax —
  * the operational surface of the table format without leaving SQL:
  *
  * {{{
  *   CALL g.system.expire_snapshots(`table` => 'db.t', keep_last => 3)
  *   CALL g.system.remove_orphan_files('db.t', 0)
  *   CALL g.system.rollback_to_snapshot('db.t', 123456789)
  *   CALL g.system.compact('db.t')
  *   CALL g.system.create_tag('db.t', 'audit-2026q1')
  *   CALL g.system.create_branch('db.t', 'wip', 123456789)
  * }}}
  *
  * Each delegates to the proven engine API and returns a one-row result
  * set (LocalScan) describing what happened. The `table` argument is a
  * catalog-relative identifier (`db.t` or `t`).
  */
object GraftProcedures {

  val names: Seq[String] = Seq("expire_snapshots", "remove_orphan_files",
    "rollback_to_snapshot", "compact", "create_tag", "create_branch",
    "fast_forward", "rewrite_manifests", "analyze_table",
    "create_changelog_view", "set_sort_order", "evolve_partition_spec",
    "rollback_to_timestamp", "rewrite_position_deletes",
    "convert_equality_deletes", "compute_partition_stats",
    "compute_delete_attribution", "refresh_mview", "register_table",
    "publish_transaction")

  /** Live data-file count from manifest rollups — O(refs), no entries. */
  private def dataFileCount(t: GraftTable): Long =
    t.liveManifests(None).filter(_.content == 0).map(_.entryCount).sum

  /** One `transform(col)` spec string → (source column, transform,
    * partition field name), same naming as the catalog's CREATE TABLE
    * transform parsing. A bare column name means identity.
    */
  private def parseTransformSpec(s: String)
      : (String, _root_.graft.model.Transform, String) = {
    import _root_.graft.model._
    val Fn = """(\w+)\s*\(\s*([^)]*)\s*\)""".r
    s.trim match {
      case Fn(fn, argstr) =>
        val args = argstr.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        def c = args.last // bucket(4, id) / truncate(10, s): column last
        fn.toLowerCase match {
          case "identity" => (args.head, TIdentity, s"${args.head}_p")
          case "years" | "year" => (args.head, TYear, s"${args.head}_year")
          case "months" | "month" =>
            (args.head, TMonth, s"${args.head}_month")
          case "days" | "day" => (args.head, TDay, s"${args.head}_day")
          case "hours" | "hour" => (args.head, THour, s"${args.head}_hour")
          case "bucket" => (c, TBucket(args.head.toInt), s"${c}_bucket")
          case "truncate" => (c, TTruncate(args.head.toInt), s"${c}_trunc")
          case "void" => (args.head, TVoid, s"${args.head}_void")
          case other => throw new IllegalArgumentException(
            s"unsupported transform $other")
        }
      case bare if bare.nonEmpty => (bare, TIdentity, s"${bare}_p")
      case _ => throw new IllegalArgumentException("empty transform spec")
    }
  }

  def load(name: String, resolveTable: String => GraftTable,
      locate: String => String = _ => throw new UnsupportedOperationException(
        "this catalog does not resolve table locations"),
      publish: Option[(Seq[String], String) => Long] = None)
      : Option[UnboundProcedure] = {
    def p(n: String, params: Seq[ProcedureParameter],
        out: StructType)(body: (GraftTable, InternalRow) => Seq[Any])
        : UnboundProcedure =
      new GraftProcedure(n, params.toArray, out, resolveTable, body)
    val table = ProcedureParameter.in("table", StringType).build()
    name match {
      // CALL <cat>.system.publish_transaction('db.a,db.b', 'txn'):
      // atomically fast-forward EVERY listed table's main to its
      // staging-branch head through the REST transaction endpoint —
      // the multi-table write-audit-publish pattern. REST-only: a
      // single commit authority is what makes cross-table atomicity
      // possible; independent file version claims cannot provide it.
      case "publish_transaction" => Some(new UnboundProcedure
          with BoundProcedure {
        private val outSchema = StructType(Seq(
          StructField("published_tables", LongType)))
        override def name(): String = "publish_transaction"
        override def description(): String =
          "atomically publish staged branches across tables"
        override def bind(inputType: StructType): BoundProcedure = this
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("tables", StringType).build(),
          ProcedureParameter.in("branch", StringType).build())
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val tables = input.getUTF8String(0).toString
            .split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val branch = input.getUTF8String(1).toString
          val n = publish.getOrElse(throw new UnsupportedOperationException(
            "publish_transaction needs a REST catalog (.uri): only a " +
              "single commit authority can make a multi-table commit " +
              "atomic"))(tables, branch)
          val row: InternalRow =
            new GenericInternalRow(Array[Any](n))
          val scan: Scan = new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = outSchema
            override def description(): String =
              "graft publish_transaction"
          }
          java.util.Collections.singletonList(scan).iterator()
        }
      })

      // CALL <cat>.system.register_table('db.t', '/path/to/iceberg'):
      // adopt an external Iceberg layout INTO this catalog at db.t —
      // metadata-only (data/delete/DV files referenced at their
      // absolute paths, never copied); subsequent operations run
      // natively. The one procedure whose table does not exist yet, so
      // it resolves a LOCATION instead of a table.
      case "register_table" => Some(new UnboundProcedure
          with BoundProcedure {
        private val outSchema = StructType(Seq(
          StructField("location", StringType),
          StructField("data_files", LongType)))
        override def name(): String = "register_table"
        override def description(): String =
          "adopt an external Iceberg table layout into this catalog"
        override def bind(inputType: StructType): BoundProcedure = this
        override def parameters(): Array[ProcedureParameter] = Array(
          table,
          ProcedureParameter.in("source_dir", StringType).build())
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val target = locate(input.getUTF8String(0).toString)
          val src = input.getUTF8String(1).toString
          val t = graft.table.IcebergInterop.adoptTable(
            SparkSession.active, src, target)
          val row: InternalRow = new GenericInternalRow(Array[Any](
            UTF8String.fromString(t.location), dataFileCount(t)))
          val scan: Scan = new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = outSchema
            override def description(): String = "graft register_table"
          }
          java.util.Collections.singletonList(scan).iterator()
        }
      })
      case "expire_snapshots" => Some(p("expire_snapshots",
        Seq(table,
          ProcedureParameter.in("keep_last", IntegerType)
            .defaultValue("1").build(),
          // -1 = no age rule; otherwise snapshots younger than this
          // survive regardless of count (union of retention rules)
          ProcedureParameter.in("older_than_ms", LongType)
            .defaultValue("-1").build()),
        StructType(Seq(StructField("removed_data_files", LongType)))) {
        (t, args) =>
          val age = args.getLong(2) match {
            case -1L => None
            case ms => Some(ms)
          }
          Seq(t.expireSnapshots(args.getInt(1), age).size.toLong)
      })
      case "remove_orphan_files" => Some(p("remove_orphan_files",
        Seq(table,
          ProcedureParameter.in("older_than_ms", LongType)
            .defaultValue("3600000").build()),
        StructType(Seq(StructField("removed_files", LongType)))) {
        (t, args) => Seq(t.removeOrphanFiles(args.getLong(1)).size.toLong)
      })
      case "rollback_to_snapshot" => Some(p("rollback_to_snapshot",
        Seq(table, ProcedureParameter.in("snapshot_id", LongType).build()),
        StructType(Seq(StructField("current_snapshot_id", LongType)))) {
        (t, args) =>
          t.rollbackTo(args.getLong(1))
          Seq(t.metadata.currentSnapshotId.getOrElse(-1L))
      })
      // state as of a wall-clock instant: the newest MAIN-ancestry
      // snapshot COMMITTED at or before the timestamp (epoch millis)
      // becomes current. Candidates are restricted to the current main
      // head's parent chain — branch-only (write-audit-publish) and
      // rolled-back-away snapshots were never main's state at any
      // instant, so rolling onto one would publish unaudited rows
      case "rollback_to_timestamp" => Some(p("rollback_to_timestamp",
        Seq(table, ProcedureParameter.in("timestamp_ms", LongType).build()),
        StructType(Seq(StructField("current_snapshot_id", LongType)))) {
        (t, args) =>
          val ts = args.getLong(1)
          val meta = t.metadata
          val mainAncestry = Iterator.iterate(meta.currentSnapshotId)(c =>
              c.flatMap(id =>
                meta.snapshotById(id).flatMap(_.parentSnapshotId)))
            .takeWhile(_.isDefined).map(_.get).toSet
          val snap = meta.snapshots.getOrElse(Seq.empty)
            .filter(s => mainAncestry.contains(s.snapshotId) &&
              s.timestampMs <= ts)
            .sortBy(s => (s.timestampMs, s.sequenceNumber)).lastOption
            .getOrElse(throw new IllegalArgumentException(
              s"no main-ancestry snapshot committed at or before $ts"))
          t.rollbackTo(snap.snapshotId)
          Seq(t.metadata.currentSnapshotId.getOrElse(-1L))
      })
      case "compact" => Some(p("compact",
        Seq(table,
          ProcedureParameter.in("target_file_bytes", LongType)
            .defaultValue((64L << 20).toString).build(),
          // binpack (default): merge undersized files only;
          // sort: rewrite clustered on sort_by columns;
          // zorder: rewrite on a range-scaled 2-column interleave
          ProcedureParameter.in("strategy", StringType)
            .defaultValue("'binpack'").build(),
          ProcedureParameter.in("sort_by", StringType)
            .defaultValue("''").build(),
          // sort/zorder: 0 = whole-table single-commit rewrite;
          // >0 = INCREMENTAL per-file-group commits bounded by this many
          // bytes, rebasing over concurrent traffic (the 100 TB shape)
          ProcedureParameter.in("group_bytes", LongType)
            .defaultValue("0").build()),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("rewritten_files", LongType)))) {
        (t, args) =>
          import org.apache.spark.sql.functions.col
          val sortBy = args.getUTF8String(3).toString
            .split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val groupBytes = args.getLong(4)
          def recluster(sorts: Seq[org.apache.spark.sql.Column]): Seq[Any] =
            if (groupBytes > 0L) {
              val snaps = t.compactIncremental(sorts, groupBytes)
              Seq(snaps.lastOption.map(_.snapshotId).getOrElse(
                t.metadata.currentSnapshotId.getOrElse(-1L)),
                snaps.map(_.summary.other.get("compaction-group-files")
                  .map(_.toLong).getOrElse(0L)).sum)
            } else {
              val n = dataFileCount(t)
              Seq(t.compact(sorts).snapshotId, n)
            }
          args.getUTF8String(2).toString match {
            case "binpack" =>
              val snap = t.compactBinPack(args.getLong(1))
              Seq(snap.snapshotId,
                snap.summary.other.get("binpacked-files")
                  .map(_.toLong).getOrElse(0L))
            case "sort" =>
              require(sortBy.nonEmpty, "sort strategy needs sort_by")
              recluster(sortBy.map(col))
            case "zorder" =>
              require(sortBy.length >= 2,
                s"zorder strategy needs at least 2 sort_by columns, " +
                  s"got $sortBy")
              // range-scale each dimension from the table's own stat
              // bounds so all contribute bits at the same significance
              def bound(c: String, isMin: Boolean): Long =
                t.columnExtreme(c, isMin) match {
                  case Some(v: Number) => v.longValue
                  case other => throw new IllegalArgumentException(
                    s"zorder column $c has no numeric bounds: $other")
                }
              val z = _root_.graft.functions.ZOrder.zorderScaledN(
                sortBy.map(c =>
                  (col(c), bound(c, isMin = true), bound(c, isMin = false))))
              recluster(Seq(z))
            case other => throw new IllegalArgumentException(
              s"unknown compact strategy '$other' " +
                "(binpack | sort | zorder)")
          }
      })
      case "create_tag" => Some(p("create_tag",
        Seq(table, ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("snapshot_id", LongType)
            .defaultValue("-1").build()),
        StructType(Seq(StructField("tag", StringType),
          StructField("snapshot_id", LongType)))) {
        (t, args) =>
          val sid = args.getLong(2) match {
            case -1L => t.metadata.currentSnapshotId.getOrElse(
              throw new IllegalStateException("table has no snapshot"))
            case s => s
          }
          t.createTag(args.getUTF8String(1).toString, sid)
          Seq(args.getUTF8String(1), sid)
      })
      case "create_branch" => Some(p("create_branch",
        Seq(table, ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("snapshot_id", LongType)
            .defaultValue("-1").build()),
        StructType(Seq(StructField("branch", StringType),
          StructField("snapshot_id", LongType)))) {
        (t, args) =>
          val sid = args.getLong(2) match {
            case -1L => t.metadata.currentSnapshotId.getOrElse(
              throw new IllegalStateException("table has no snapshot"))
            case s => s
          }
          t.createBranch(args.getUTF8String(1).toString, sid)
          Seq(args.getUTF8String(1), sid)
      })
      // the WAP publish step: CALL g.system.fast_forward('db.t', 'audit')
      // moves main to the branch head (refuses when main diverged)
      case "fast_forward" => Some(p("fast_forward",
        Seq(table, ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(StructField("branch", StringType),
          StructField("current_snapshot_id", LongType)))) {
        (t, args) =>
          t.fastForward(args.getUTF8String(1).toString)
          Seq(args.getUTF8String(1),
            t.metadata.currentSnapshotId.getOrElse(-1L))
      })
      // metadata-only manifest consolidation (no data file moves)
      case "rewrite_manifests" => Some(p("rewrite_manifests",
        Seq(table,
          ProcedureParameter.in("target_entries", LongType)
            .defaultValue("250000").build()),
        StructType(Seq(StructField("rewritten_manifests", LongType),
          StructField("consolidated_manifests", LongType)))) {
        (t, args) =>
          val snap = t.rewriteManifests(args.getLong(1))
          Seq(
            snap.summary.other.get("rewritten-manifests")
              .map(_.toLong).getOrElse(0L),
            snap.summary.other.get("consolidated-manifests")
              .map(_.toLong).getOrElse(0L))
      })
      // ANALYZE: one distributed pass → NDV sketches + rollups in a
      // stats sidecar; the connector reports them to the CBO
      case "analyze_table" => Some(p("analyze_table",
        Seq(table,
          ProcedureParameter.in("columns", StringType)
            .defaultValue("''").build()),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("analyzed_columns", LongType),
          StructField("stats_path", StringType)))) {
        (t, args) =>
          val cols = Option(args.getUTF8String(1)).map(_.toString)
            .getOrElse("").split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val ref = t.analyze(cols)
          val n = graft.table.Stats.readFile(ref.path)._2.size.toLong
          Seq(ref.snapshotId, n, UTF8String.fromString(ref.path))
      })
      // the spec partition-statistics artifact: per-partition rollups
      // in a plain-parquet file registered in table metadata
      case "compute_partition_stats" => Some(p("compute_partition_stats",
        Seq(table),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("stats_path", StringType),
          StructField("file_size_bytes", LongType)))) {
        (t, _) =>
          val ref = t.writePartitionStats()
          Seq(ref.snapshotId, UTF8String.fromString(ref.path),
            ref.fileSizeBytes)
      })
      // data-plane maintenance: apply uncovered-spec equality deletes
      // to data ONCE, cache exact per-partition counts, and rewrite the
      // partition-statistics artifact with them — `.partitions` serves
      // exact (non-NULL) counts until the next commit invalidates it
      case "compute_delete_attribution" =>
        Some(p("compute_delete_attribution",
          Seq(table),
          StructType(Seq(StructField("snapshot_id", LongType),
            StructField("stats_path", StringType),
            StructField("file_size_bytes", LongType)))) {
          (t, _) =>
            val ref = t.computeDeleteAttribution()
            Seq(ref.snapshotId, UTF8String.fromString(ref.path),
              ref.fileSizeBytes)
        })
      // row-level CDC as a queryable temp view:
      //   CALL g.system.create_changelog_view('db.t', 'changes_v')
      // from/to default to the full history up to the current snapshot
      case "create_changelog_view" => Some(p("create_changelog_view",
        Seq(table, ProcedureParameter.in("view", StringType).build(),
          ProcedureParameter.in("from_snapshot", LongType)
            .defaultValue("-1").build(),
          ProcedureParameter.in("to_snapshot", LongType)
            .defaultValue("-1").build()),
        StructType(Seq(StructField("view", StringType),
          StructField("to_snapshot_id", LongType)))) {
        (t, args) =>
          val to = args.getLong(3) match {
            case -1L => t.metadata.currentSnapshotId.getOrElse(
              throw new IllegalStateException("table has no snapshot"))
            case s => s
          }
          val fromSeq = args.getLong(2) match {
            case -1L => 0L
            case s => t.metadata.snapshotById(s).getOrElse(
              throw new IllegalArgumentException(s"no snapshot $s"))
              .sequenceNumber
          }
          val view = args.getUTF8String(1).toString
          t.changesBySeq(fromSeq, to).createOrReplaceTempView(view)
          Seq(UTF8String.fromString(view), to)
      })
      // default write clustering without leaving SQL:
      //   CALL g.system.set_sort_order('db.t', 'c1,c2')  ('' = unsorted)
      // subsequent INSERTs cluster within files on the order; re-cluster
      // existing data via compact(strategy => 'sort')
      case "set_sort_order" => Some(p("set_sort_order",
        Seq(table, ProcedureParameter.in("order_by", StringType).build()),
        StructType(Seq(StructField("sort_order_id", LongType)))) {
        (t, args) =>
          val cols = args.getUTF8String(1).toString
            .split(',').map(_.trim).filter(_.nonEmpty).toSeq
          t.replaceSortOrder(
            cols.map(c => (c, _root_.graft.model.TIdentity)))
          Seq(t.metadata.defaultSortOrderId)
      })
      // MoR maintenance: resolve equality deletes to positions once, so
      // scans stop re-running the key anti-join and metadata-only
      // counts work again
      case "convert_equality_deletes" => Some(p("convert_equality_deletes",
        Seq(table),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("materialized_positions", LongType)))) {
        (t, args) =>
          val snap = t.convertEqualityDeletes()
          Seq(snap.snapshotId,
            snap.summary.other.get("materialized-positions")
              .map(_.toLong).getOrElse(0L))
      })
      // MoR maintenance: union per-commit position-delete files so scans
      // stop opening one tiny delete file per historical DELETE
      case "rewrite_position_deletes" => Some(p("rewrite_position_deletes",
        Seq(table),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("consolidated_files", LongType)))) {
        (t, args) =>
          val before = t.liveManifests(None).filter(_.content == 1)
            .map(_.entryCount).sum
          val snap = t.rewritePositionDeletes()
          Seq(snap.snapshotId, before)
      })
      // hidden-partitioning evolution without leaving SQL:
      //   CALL g.system.evolve_partition_spec('db.t', 'months(d), bucket(8, id)')
      // future writes partition under the new spec; existing files keep
      // their write-time spec and still prune under it ('' un-partitions)
      case "evolve_partition_spec" => Some(p("evolve_partition_spec",
        Seq(table,
          ProcedureParameter.in("partition_by", StringType).build()),
        StructType(Seq(StructField("spec_id", LongType)))) {
        (t, args) =>
          val specs = args.getUTF8String(1).toString
            .split(",(?![^(]*\\))").map(_.trim).filter(_.nonEmpty).toSeq
            .map(parseTransformSpec)
          t.evolvePartitionSpec(specs)
          Seq(t.metadata.defaultSpecId.toLong)
      })
      // MATERIALIZED-view refresh: INCREMENTAL when the stored SQL is a
      // maintainable aggregate over one graft table — apply the base's
      // changelog since the recorded sequence watermark and merge
      // per-key deltas (O(delta) base rows scanned, never the full
      // base); full recompute otherwise. Either way the backing table
      // swaps atomically in ONE commit — readers see either the old
      // refresh or the new one, never a mix.
      case "refresh_mview" => Some(p("refresh_mview",
        Seq(table),
        StructType(Seq(StructField("snapshot_id", LongType),
          StructField("row_count", LongType),
          StructField("mode", StringType),
          StructField("delta_rows", LongType)))) {
        (t, _) =>
          val s = SparkSession.active
          val df = GraftViewRewrite.materializedQuery(s, t.location)
          val r = GraftMviewRefresh.refresh(s, t, df)
          Seq(r.snapshotId, r.rowCount,
            UTF8String.fromString(r.mode), r.deltaRows)
      })
      case _ => None
    }
  }
}

/** One maintenance procedure: binds as-declared, executes on the driver
  * against the resolved table, returns its one-row summary as a
  * LocalScan.
  */
class GraftProcedure(procName: String,
    params: Array[ProcedureParameter], outSchema: StructType,
    resolveTable: String => GraftTable,
    body: (GraftTable, InternalRow) => Seq[Any])
    extends UnboundProcedure with BoundProcedure {

  override def name(): String = procName
  override def description(): String = s"graft maintenance: $procName"
  override def bind(inputType: StructType): BoundProcedure = this
  override def parameters(): Array[ProcedureParameter] = params
  override def isDeterministic: Boolean = false

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val tableIdent = input.getUTF8String(0).toString
    val t = resolveTable(tableIdent)
    val values = body(t, input)
    val row: InternalRow = new GenericInternalRow(values.map {
      case s: String => UTF8String.fromString(s)
      case other => other
    }.toArray[Any])
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = outSchema
      override def description(): String = s"graft $procName result"
    }
    java.util.Collections.singletonList(scan).iterator()
  }
}
