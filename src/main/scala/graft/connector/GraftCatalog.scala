package graft.connector

import graft.table.GraftTable
import graft.model.{TBucket, TDay, THour, TIdentity, TMonth, TTruncate, TVoid, TYear, Transform => IceTransform}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference, Transform => SparkTransform}
import org.apache.spark.sql.types.{IntegerType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** A Spark TableCatalog over a warehouse directory of graft tables —
  * full SQL DDL/DML surface:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.g", "graft.connector.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.g.warehouse", "/wh")
  *   spark.sql("CREATE TABLE g.db.t (id BIGINT, d DATE) PARTITIONED BY (months(d))")
  *   spark.sql("INSERT INTO g.db.t SELECT ...")
  *   spark.sql("SELECT * FROM g.db.t WHERE d >= DATE'2024-01-01'")
  *   spark.sql("ALTER TABLE g.db.t ADD COLUMN score DOUBLE")
  * }}}
  *
  * Layout: `warehouse/namespace.../tableName/` is the table location
  * (identified by its `metadata/` directory). Namespaces are directories.
  * Hidden-partition SQL transforms (years/months/days/hours/bucket/
  * truncate) map onto graft partition specs; identity partitions get a
  * `_p`-suffixed partition-field name (graft keeps source columns in the
  * data files — hidden partitioning, not directory-only columns).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with FunctionCatalog with ProcedureCatalog with ViewCatalog {

  private var catalogName: String = _
  private var warehouse: Path = _
  // REST mode (`spark.sql.catalog.X.uri = http://...`): table lifecycle
  // + commits speak the Iceberg REST protocol against the service; the
  // warehouse path comes from GET /v1/config, and data/manifest IO
  // still hits that shared storage directly (the standard REST model)
  private var restClient: Option[rest.GraftRestClient] = None

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val uri = options.get("uri")
    if (uri != null && uri.nonEmpty) {
      val client = new rest.GraftRestClient(uri)
      restClient = Some(client)
      warehouse = Paths.get(client.warehouse())
    } else {
      val wh = options.get("warehouse")
      require(wh != null && wh.nonEmpty,
        s"catalog $name requires spark.sql.catalog.$name.warehouse " +
          "(or .uri for REST mode)")
      warehouse = Paths.get(wh)
      Files.createDirectories(warehouse)
    }
  }

  /** The commit path for tables of this catalog: REST-guarded in REST
    * mode, direct file CREATE_NEW otherwise.
    */
  private[connector] def ioFor(ident: Identifier): graft.table.MetadataIo =
    restClient.map(c => new rest.RestMetadataIo(c, ident.namespace.toSeq,
      ident.name)).getOrElse(graft.table.FileMetadataIo)

  override def name(): String = catalogName

  private def tablePath(ident: Identifier): Path =
    ident.namespace.foldLeft(warehouse)(_.resolve(_)).resolve(ident.name)

  /** The on-disk dir a view with this identifier lives in (same layout
    * as tables; views carry `viewmeta/` instead of `metadata/`).
    */
  private[connector] def viewDirPath(ident: Identifier): Path =
    tablePath(ident)

  private def isTableDir(p: Path): Boolean =
    Files.isDirectory(p.resolve("metadata")) &&
      // a dir that is ALSO a view serves as a table only once its
      // materialized tag is COMMITTED: during the CREATE MATERIALIZED
      // VIEW window (or after a crash inside it) the half-built table
      // must stay invisible so reads fall through to SQL expansion
      (!GraftViews.isViewDir(p) || GraftViews.load(p).exists(
        _.current.properties.get(GraftViews.MaterializedProp)
          .contains("true")))

  // ------------------------------------------------------------ tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    restClient.foreach { c =>
      if (!c.namespaceExists(namespace.toSeq))
        throw new NoSuchNamespaceException(namespace)
      return c.listTables(namespace.toSeq)
        .map(Identifier.of(namespace, _)).toArray
    }
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val ls = Files.list(dir)
    try ls.iterator.asScala
      .filter(isTableDir)
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally ls.close()
  }

  override def tableExists(ident: Identifier): Boolean =
    restClient match {
      case Some(c) => c.tableExists(ident.namespace.toSeq, ident.name)
      case None => isTableDir(tablePath(ident))
    }

  override def loadTable(ident: Identifier): Table = {
    restClient.foreach { c =>
      c.loadTable(ident.namespace.toSeq, ident.name).foreach { case (_, m) =>
        return new GraftSparkTable(m.location, None,
          metadataIo = ioFor(ident))
      }
      // fall through: metadata-table names resolve against the parent
    }
    val p = tablePath(ident)
    if (isTableDir(p) && restClient.isEmpty)
      return new GraftSparkTable(p.toString, None)
    // metadata table: g.db.t.snapshots parses as namespace [db, t] with
    // name "snapshots" — route to the parent table's metadata view
    if (ident.namespace.nonEmpty && GraftMetaTable.Kinds.contains(ident.name)) {
      val parent = ident.namespace.foldLeft(warehouse)(_.resolve(_))
      if (isTableDir(parent))
        return new GraftMetaTable(parent.toString, ident.name)
    }
    throw new NoSuchTableException(ident)
  }

  // ------------------------------------------------- SQL time travel ----
  // SELECT ... FROM g.db.t VERSION AS OF <snapshot-id | ref-name>
  // SELECT ... FROM g.db.t TIMESTAMP AS OF '<ts>'

  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = GraftTable.load(spark, tablePath(ident).toString, ioFor(ident))
    val snapshotId = version.toLongOption
      .filter(id => t.metadata.snapshotById(id).isDefined)
      .orElse(t.metadata.refs.flatMap(_.get(version)).map(_.snapshotId))
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot or ref '$version' on ${ident.name}"))
    new GraftSparkTable(tablePath(ident).toString, Some(snapshotId),
      metadataIo = ioFor(ident))
  }

  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = GraftTable.load(spark, tablePath(ident).toString, ioFor(ident))
    val ms = timestampMicros / 1000L
    // the snapshot CURRENT at that wall-clock time: latest whose commit
    // timestamp is <= the asked instant (Iceberg time-travel contract)
    val snap = t.metadata.snapshots.getOrElse(Seq.empty)
      .filter(_.timestampMs <= ms)
      .sortBy(s => (s.timestampMs, s.sequenceNumber)).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot at or before timestamp $ms on ${ident.name}"))
    new GraftSparkTable(tablePath(ident).toString, Some(snap.snapshotId),
      metadataIo = ioFor(ident))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[SparkTransform],
      properties: java.util.Map[String, String]): Table = {
    val p = tablePath(ident)
    val partitionBy = partitions.map(toGraftPartition(_, schema)).toSeq
    // strip Spark-managed props (provider/location/owner) from table props
    val props = properties.asScala.toMap --
      Seq(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
        TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
        TableCatalog.PROP_COMMENT)
    restClient.foreach { c =>
      if (c.tableExists(ident.namespace.toSeq, ident.name))
        throw new TableAlreadyExistsException(ident)
      // spec-shaped create: Iceberg schema JSON + partition spec; the
      // SERVICE writes metadata v1 and is the commit authority from here
      val ice = GraftTable.toIceSchema(schema, schemaId = 0)
      val fields = partitionBy.zipWithIndex.map { case ((src, t, nm), i) =>
        val f = ice.fieldByName(src).getOrElse(
          throw new IllegalArgumentException(s"no column $src"))
        graft.model.PartitionField(f.id, 1000 + i, nm, t)
      }
      val spec =
        if (fields.isEmpty) None
        else Some(graft.model.PartitionSpec(1, fields))
      val meta = c.createTable(ident.namespace.toSeq, ident.name,
        ice, spec, props)
      return new GraftSparkTable(meta.location, None,
        metadataIo = ioFor(ident))
    }
    if (isTableDir(p)) throw new TableAlreadyExistsException(ident)
    // a table must not silently nest inside an existing VIEW's dir
    if (GraftViews.isViewDir(p))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    Files.createDirectories(p.getParent)
    GraftTable.create(spark, p.toString, schema, partitionBy,
      properties = props)
    new GraftSparkTable(p.toString, None)
  }

  /** SQL PARTITIONED BY transform → (sourceColumn, transform, fieldName)
    * — shared with CREATE MATERIALIZED VIEW's partitioning clause.
    */
  private[connector] def toGraftPartitionSpec(t: SparkTransform,
      schema: StructType): (String, IceTransform, String) =
    toGraftPartition(t, schema)

  /** SQL PARTITIONED BY transform → (sourceColumn, transform, fieldName).
    * Identity partitions are suffixed `_p`: graft models hidden
    * partitioning, so the partition field must not shadow the data column.
    */
  private def toGraftPartition(t: SparkTransform,
      schema: StructType): (String, IceTransform, String) = {
    val refs = t.references()
    require(refs.length == 1 && refs.head.fieldNames.length == 1,
      s"unsupported partition reference in $t")
    val c = refs.head.fieldNames.head
    def intArg: Int = t.arguments().collectFirst {
      case l: Literal[_] if l.dataType == IntegerType =>
        l.value.asInstanceOf[Int]
    }.getOrElse(throw new IllegalArgumentException(
      s"$t needs an int literal argument"))
    t.name() match {
      case "identity" => (c, TIdentity, s"${c}_p")
      case "years" | "year" => (c, TYear, s"${c}_year")
      case "months" | "month" => (c, TMonth, s"${c}_month")
      case "days" | "day" => (c, TDay, s"${c}_day")
      case "hours" | "hour" => (c, THour, s"${c}_hour")
      case "bucket" => (c, TBucket(intArg), s"${c}_bucket")
      case "truncate" => (c, TTruncate(intArg), s"${c}_trunc")
      case "void" => (c, TVoid, s"${c}_void")
      case other =>
        throw new IllegalArgumentException(s"unsupported transform $other")
    }
  }

  // the analyzer rejects DEFAULT clauses unless the catalog declares it
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    // existence check FIRST: a missing table must surface Spark's
    // NoSuchTableException, not whatever GraftTable.load throws
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val t = GraftTable.load(spark, tablePath(ident).toString, ioFor(ident))
    // multi-part field names route to the engine's dotted-path nested
    // evolution (the same field-id machinery behind ice_nested_struct)
    def dotted(fieldNames: Array[String]): String = fieldNames.mkString(".")
    changes.foreach {
      case add: TableChange.AddColumn =>
        // ALTER TABLE ... ADD COLUMN x T DEFAULT v: Spark's semantics
        // make the default apply to existing rows AND future inserts
        // omitting the column — exactly the v3 initial-default +
        // write-default pair. Render via a Catalyst cast-to-string so
        // the stored form round-trips through GraftTable's own parser.
        val dflt = Option(add.defaultValue()).flatMap { dv =>
          val l = dv.getValue
          Option(org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal(
              l.value, l.dataType),
            org.apache.spark.sql.types.StringType,
            Some("UTC")).eval(null)).map(_.toString)
        }
        t.addColumn(dotted(add.fieldNames), add.dataType, dflt, dflt)
      case ren: TableChange.RenameColumn =>
        t.renameColumn(dotted(ren.fieldNames), ren.newName)
      case del: TableChange.DeleteColumn =>
        t.dropColumn(dotted(del.fieldNames))
      case up: TableChange.UpdateColumnType =>
        t.promoteColumn(dotted(up.fieldNames), up.newDataType)
      case nl: TableChange.UpdateColumnNullability =>
        t.setColumnNullability(dotted(nl.fieldNames), nl.nullable)
      case dv: TableChange.UpdateColumnDefaultValue =>
        // SET DEFAULT changes what FUTURE inserts omitting the column
        // fill (v3 write-default); DROP DEFAULT clears it. The rendered
        // form comes through Spark's DefaultValue SQL string via the
        // same cast-to-string path as ADD COLUMN ... DEFAULT.
        val rendered = for {
          d <- Option(dv.newCurrentDefault())
          sql <- Option(d.getSql)
          e = spark.sessionState.sqlParser.parseExpression(sql)
          _ = require(e.foldable,
            s"DEFAULT must be a constant expression: $sql")
          v <- Option(org.apache.spark.sql.catalyst.expressions.Cast(
            e, org.apache.spark.sql.types.StringType,
            Some("UTC")).eval(null))
        } yield v.toString
        t.setWriteDefault(dotted(dv.fieldNames), rendered)
      case set: TableChange.SetProperty =>
        t.updateProperties(Map(set.property -> Some(set.value)))
      case rm: TableChange.RemoveProperty =>
        t.updateProperties(Map(rm.property -> None))
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE change not supported: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    restClient.foreach(c =>
      return c.dropTable(ident.namespace.toSeq, ident.name))
    val p = tablePath(ident)
    if (!isTableDir(p)) return false
    val w = Files.walk(p)
    try w.sorted(java.util.Comparator.reverseOrder())
      .iterator.asScala.foreach(Files.deleteIfExists(_))
    finally w.close()
    true
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    // graft manifests pin absolute file paths (like Iceberg's Hadoop
    // catalog); a directory move would orphan every entry
    throw new UnsupportedOperationException(
      "graft tables pin absolute paths; use CREATE TABLE ... AS SELECT")

  // ------------------------------------------------------------- views ----
  // SQL views through the DSv2 ViewCatalog (the successor crate's first
  // post-serde feature — reference lib.rs:21): CREATE [OR REPLACE] VIEW /
  // SELECT / ALTER VIEW SET-UNSET TBLPROPERTIES / SHOW VIEWS / DROP VIEW.
  // Versioned Iceberg-view-spec-shaped metadata in <view>/viewmeta/
  // (GraftViews); the stored SQL re-resolves at read time against the
  // stored default catalog+namespace, so the view tracks the CURRENT
  // table state while its definition history stays replayable.

  /** View-state load through this catalog's commit authority: the REST
    * service in REST mode (views are protocol state there, like table
    * metadata — a second REST client must see them), the file layout
    * otherwise.
    */
  private[connector] def loadViewState(ident: Identifier)
      : Option[GraftViews.ViewState] =
    restClient match {
      case Some(c) => c.loadView(ident.namespace.toSeq, ident.name)
        .map(_._2)
      case None => GraftViews.load(tablePath(ident))
    }

  /** Commit the next view version through this catalog's authority.
    * REST mode posts the successor state with the version claim the
    * server validates (base = prev's version-file number, which equals
    * the version count — every commit appends exactly one of each).
    */
  private[connector] def commitViewState(ident: Identifier,
      prev: Option[GraftViews.ViewState], next: GraftViews.ViewVersion)
      : GraftViews.ViewState = {
    val p = tablePath(ident)
    restClient match {
      case Some(c) =>
        val st = GraftViews.nextState(p, prev, next)
        prev match {
          case None =>
            c.createView(ident.namespace.toSeq, ident.name, st)
          case Some(pr) => c.commitView(ident.namespace.toSeq,
            ident.name, baseVersion = pr.versions.size, st)
        }
        st
      case None =>
        Files.createDirectories(p.getParent)
        // the same base-version claim the REST server enforces: a
        // racing commit since `prev` was loaded must CONFLICT (and let
        // callers with retry loops re-derive), never be silently
        // overwritten by a successor built on stale state
        val st = GraftViews.nextState(p, prev, next)
        GraftViews.commitState(p,
          expectedVersion = prev.map(_.versions.size).getOrElse(0), st)
        st
    }
  }

  override def listViews(namespace: String*): Array[Identifier] = {
    val ns = namespace.toArray
    restClient.foreach { c =>
      if (!c.namespaceExists(ns.toSeq))
        throw new NoSuchNamespaceException(ns)
      return c.listViews(ns.toSeq).map(Identifier.of(ns, _)).toArray
    }
    val dir = ns.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(ns)
    val ls = Files.list(dir)
    try ls.iterator.asScala
      .filter(GraftViews.isViewDir)
      .map(p => Identifier.of(ns, p.getFileName.toString))
      .toArray
    finally ls.close()
  }

  override def viewExists(ident: Identifier): Boolean =
    restClient match {
      case Some(c) => c.viewExists(ident.namespace.toSeq, ident.name)
      case None => GraftViews.isViewDir(tablePath(ident))
    }

  override def loadView(ident: Identifier): View =
    loadViewState(ident)
      .map(st => new GraftView(ident.name, st.current))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))

  override def createView(info: ViewInfo): View = {
    val ident = info.ident
    if (viewExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(ident)
    if (tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    val st = commitViewState(ident, None,
      GraftViews.versionFromInfo(info, versionId = 1, operation = "create"))
    new GraftView(ident.name, st.current)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val ident = info.ident
    val prev = loadViewState(ident)
    if (prev.isEmpty && !orCreate)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    if (prev.isEmpty && tableExists(ident))
      throw new TableAlreadyExistsException(ident)
    val nextId = prev.map(_.versions.map(_.versionId).max + 1).getOrElse(1)
    val st = commitViewState(ident, prev,
      GraftViews.versionFromInfo(info, nextId, operation = "replace"))
    new GraftView(ident.name, st.current)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    // optimistic-commit retry like table commits: a racing view commit
    // loses the version claim (file CREATE_NEW or REST 409) — re-derive
    // the change against the FRESH state and try again
    var attempts = 0
    while (true) {
      attempts += 1
      val prev = loadViewState(ident).getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchViewException(ident))
      var props = prev.current.properties
      changes.foreach {
        case s: ViewChange.SetProperty => props += s.property -> s.value
        case r: ViewChange.RemoveProperty => props -= r.property
        case other => throw new UnsupportedOperationException(
          s"ALTER VIEW change not supported: $other")
      }
      val next = prev.current.copy(
        versionId = prev.versions.map(_.versionId).max + 1,
        timestampMs = System.currentTimeMillis(),
        operation = "alter", properties = props)
      try {
        val st = commitViewState(ident, Some(prev), next)
        return new GraftView(ident.name, st.current)
      } catch {
        case _: graft.table.CommitConflictException |
            _: java.nio.file.FileAlreadyExistsException
            if attempts < 10 =>
          Thread.sleep(5L * attempts + scala.util.Random.nextInt(20))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def dropView(ident: Identifier): Boolean = {
    restClient.foreach(c =>
      return c.dropView(ident.namespace.toSeq, ident.name))
    val p = tablePath(ident)
    if (!GraftViews.isViewDir(p)) return false
    val w = Files.walk(p)
    try w.sorted(java.util.Comparator.reverseOrder())
      .iterator.asScala.foreach(Files.deleteIfExists(_))
    finally w.close()
    true
  }

  override def renameView(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    restClient.foreach { c =>
      if (!c.viewExists(oldIdent.namespace.toSeq, oldIdent.name))
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchViewException(oldIdent)
      if (c.viewExists(newIdent.namespace.toSeq, newIdent.name))
        throw new org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException(newIdent)
      c.renameView(oldIdent.namespace.toSeq, oldIdent.name,
        newIdent.namespace.toSeq, newIdent.name)
      return
    }
    // unlike tables, a PLAIN view's metadata holds only SQL text — no
    // pinned absolute data paths — so a directory move IS a correct
    // rename. A MATERIALIZED view carries a backing table whose
    // manifests pin absolute paths (same reason renameTable refuses).
    val from = tablePath(oldIdent)
    if (!GraftViews.isViewDir(from))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(oldIdent)
    if (isTableDir(from))
      throw new UnsupportedOperationException(
        "a materialized view's backing table pins absolute paths; " +
          "DROP TABLE and recreate instead of renaming")
    val to = tablePath(newIdent)
    if (GraftViews.isViewDir(to))
      throw new org.apache.spark.sql.catalyst.analysis
        .ViewAlreadyExistsException(newIdent)
    Files.createDirectories(to.getParent)
    Files.move(from, to)
  }

  // -------------------------------------------------------- procedures ----
  // SQL CALL surface for table maintenance:
  //   CALL <cat>.system.expire_snapshots('db.t', 3)   etc.

  /** Procedure-side table resolution: loads with this catalog's commit
    * io, so CALL-driven maintenance commits through REST in REST mode.
    */
  private def resolveGraftTable(ident: String): GraftTable = {
    val parts = ident.split('.')
    val id = Identifier.of(parts.dropRight(1), parts.last)
    if (!tableExists(id)) throw new NoSuchTableException(id)
    GraftTable.load(spark, tablePath(id).toString, ioFor(id))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names
      .map(Identifier.of(Array("system"), _)).toArray

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident.name, resolveGraftTable,
      locate = s => {
        val parts = s.split('.')
        // A dotless name would yield an empty namespace and adopt the
        // table at the warehouse root, unreachable through the catalog.
        require(parts.length >= 2,
          s"table identifier '$s' must be qualified as namespace.table")
        val id = Identifier.of(parts.dropRight(1), parts.last)
        require(!tableExists(id) && !viewExists(id),
          s"$s already exists in catalog $catalogName")
        tablePath(id).toString
      },
      publish = restClient.map(c => (tables: Seq[String],
          branch: String) => {
        rest.GraftTransactions.publishBranches(c, tables.map { s =>
          val parts = s.split('.').toSeq
          (parts.dropRight(1), parts.last, branch)
        })
        tables.size.toLong
      })).getOrElse(
      throw new RuntimeException(s"no such procedure ${ident.name}"))

  // --------------------------------------------------------- functions ----
  // System functions backing partition-transform resolution (storage-
  // partitioned joins over bucket tables); exposed in every namespace.

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    GraftFunctions.names.map(Identifier.of(namespace, _)).toArray
  }

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    GraftFunctions.load(ident.name).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident))

  // -------------------------------------------------------- namespaces ----

  override def listNamespaces(): Array[Array[String]] = {
    restClient.foreach(c =>
      return c.listNamespaces().map(_.toArray).toArray)
    val ls = Files.list(warehouse)
    try ls.iterator.asScala
      .filter(p => Files.isDirectory(p) && !isTableDir(p) &&
        !GraftViews.isViewDir(p))
      .map(p => Array(p.getFileName.toString))
      .toArray
    finally ls.close()
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    restClient.foreach { c =>
      if (!c.namespaceExists(namespace.toSeq))
        throw new NoSuchNamespaceException(namespace)
      return c.listNamespaces(namespace.toSeq).map(_.toArray).toArray
    }
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(dir)) throw new NoSuchNamespaceException(namespace)
    val ls = Files.list(dir)
    try ls.iterator.asScala
      // a dir holding table or view metadata is a table/view, never a
      // namespace (a PLAIN view dir is not a table dir either)
      .filter(p => Files.isDirectory(p) && !isTableDir(p) &&
        !GraftViews.isViewDir(p))
      .map(p => namespace :+ p.getFileName.toString)
      .toArray
    finally ls.close()
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    restClient match {
      case Some(c) => c.namespaceExists(namespace.toSeq)
      case None =>
        Files.isDirectory(namespace.foldLeft(warehouse)(_.resolve(_)))
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    restClient match {
      case Some(c) => c.createNamespace(namespace.toSeq)
      case None =>
        Files.createDirectories(namespace.foldLeft(warehouse)(_.resolve(_)))
    }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace properties")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    restClient.foreach { c =>
      val ns = namespace.toSeq
      if (!c.namespaceExists(ns)) return false
      if (cascade) {
        // cascade through the PROTOCOL: children drop as first-class
        // protocol operations, never as a filesystem walk around it
        c.listTables(ns).foreach(t => c.dropTable(ns, t))
        c.listViews(ns).foreach(v => c.dropView(ns, v))
        c.listNamespaces(ns).foreach(child =>
          dropNamespace(child.toArray, cascade = true))
      }
      return c.dropNamespace(ns)
    }
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(dir)) return false
    val ls = Files.list(dir)
    val empty = try !ls.iterator.hasNext finally ls.close()
    if (!empty && !cascade)
      throw new IllegalStateException(s"namespace not empty: ${namespace.mkString(".")}")
    val w = Files.walk(dir)
    try w.sorted(java.util.Comparator.reverseOrder())
      .iterator.asScala.foreach(Files.deleteIfExists(_))
    finally w.close()
    true
  }
}
