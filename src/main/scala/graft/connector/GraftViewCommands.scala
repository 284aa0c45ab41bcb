package graft.connector

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{ResolvedNamespace, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.Bridge

/** SQL views over [[GraftCatalog]]'s DSv2 ViewCatalog.
  *
  * Spark 4.1 ships the ViewCatalog API but its analyzer routes view DDL
  * only to the SESSION catalog (ResolveSessionCatalog throws
  * MISSING_CATALOG_ABILITY.VIEWS for any other ResolvedIdentifier), so —
  * exactly like Iceberg's spark-extensions — the engine claims the view
  * commands itself: this rule intercepts the parsed plans while their
  * identifiers are still unresolved and rewrites them to eager commands
  * against the graft ViewCatalog. Reads substitute the stored SQL:
  * an UnresolvedRelation naming a graft view expands (recursively, with
  * cycle detection) into its parsed body, table references qualified
  * against the view's stored default catalog + namespace, so the view is
  * stable under `USE` and always reflects the referenced tables' CURRENT
  * state.
  */
/** Delegating parser that rewrites view COMMANDS right after parse.
  *
  * This must happen pre-analysis: ResolveSessionCatalog sits AHEAD of
  * injected resolution rules in the analyzer's Resolution batch and
  * throws MISSING_CATALOG_ABILITY.VIEWS the moment it sees a view
  * command whose identifier resolved to a non-session catalog — an
  * injected rule never gets a chance. View READS don't pass through
  * that rule and stay in [[GraftViewRewrite]].
  */
class GraftViewSqlParser(
    delegate: org.apache.spark.sql.catalyst.parser.ParserInterface)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan = {
    val plan = delegate.parsePlan(sqlText)
    // catalog lookup needs a session; a parse outside one (tooling)
    // passes through to Spark's own handling
    if (SparkSession.getActiveSession
        .orElse(SparkSession.getDefaultSession).isEmpty) plan
    else GraftViewRewrite.rewriteViewCommands(plan)
  }
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}

object GraftViewRewrite extends Rule[LogicalPlan] {

  private def spark: SparkSession = SparkSession.active

  /** Resolve name parts to (graft catalog, identifier) — None when the
    * leading part is not a registered GraftCatalog (leave the plan for
    * Spark's own resolution: session-catalog views, temp views, tables).
    * Single-part names fall back to the CURRENT catalog + namespace.
    */
  private def graftCatalogAndIdent(parts: Seq[String])
      : Option[(GraftCatalog, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val (plugin, idParts) =
      (try Some(cm.catalog(parts.head))
      catch { case _: Exception => None }) match {
        case Some(c) if parts.length > 1 => (c, parts.tail)
        // Spark's v2 resolution: only a BARE name takes the current
        // namespace; a multi-part name is already namespace-qualified
        // within the current catalog (`USE cat.db; ... FROM db.v` must
        // resolve db.v, not db.db.v)
        case _ if parts.length == 1 =>
          (cm.currentCatalog, cm.currentNamespace.toSeq ++ parts)
        case _ => (cm.currentCatalog, parts)
      }
    plugin match {
      case g: GraftCatalog if idParts.nonEmpty =>
        Some((g, Identifier.of(idParts.init.toArray, idParts.last)))
      case _ => None
    }
  }

  /** A view whose CURRENT version is tagged materialized serves reads
    * from its backing table — substitution must never re-expand its SQL
    * (that would silently un-materialize it). Keyed on the COMMITTED
    * property, not on the table dir existing: during CREATE MATERIALIZED
    * VIEW the table materializes BEFORE the tagged version commits, so a
    * crash mid-create leaves a plain view (reads expand the SQL) instead
    * of a half-built table serving zero rows.
    */
  private def isMaterialized(st: GraftViews.ViewState): Boolean =
    st.current.properties.get(GraftViews.MaterializedProp)
      .contains("true")

  /** Temp views keep precedence over catalog views (Spark contract) —
    * both reads AND view DDL with a bare name matching a temp view must
    * leave the plan to Spark's own handling.
    */
  private def isTempView(parts: Seq[String]): Boolean =
    spark.sessionState.catalog.isTempView(parts)

  /** Parse a stored view body and qualify + expand it: relation
    * references missing a catalog qualifier are prefixed with the view's
    * default catalog / namespace, and nested graft views expand
    * recursively (`seen` stops cycles with a clear error instead of
    * analyzer max-iterations). Materialized views do NOT expand — their
    * table serves.
    */
  private[connector] def qualifiedBody(v: GraftViews.ViewVersion,
      key: String, seen: Set[String]): LogicalPlan = {
    if (seen.contains(key))
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "RECURSIVE_VIEW",
        messageParameters = Map("viewIdent" -> key,
          "newPath" -> (seen + key).mkString(" -> ")))
    // CTE substitution must run HERE: the analyzer's own Substitution
    // batch already finished before this rule injects the parsed body,
    // so `WITH big AS (...) SELECT ... FROM big` would otherwise leave
    // `big` as an unresolvable relation (and qualification would turn
    // it into a phantom catalog table). After substitution, CTE refs
    // are CTERelationRef nodes — qualification only ever sees real
    // table references. (Iceberg's ResolveViews does the same.)
    val parsed = org.apache.spark.sql.catalyst.analysis.CTESubstitution(
      spark.sessionState.sqlParser.parsePlan(v.sql))
    val cm = spark.sessionState.catalogManager
    // ...WithSubqueries: IN/EXISTS/scalar subqueries inside the stored
    // body must get the same stored-default qualification — plain
    // transformUp never descends into subquery expressions, so an
    // unqualified table there would resolve against the READER's USE
    // context instead of the view's
    val qualified = parsed.transformUpWithSubqueries {
      case r: UnresolvedRelation =>
        val parts = r.multipartIdentifier
        val headIsCatalog =
          try { cm.catalog(parts.head); parts.length > 1 }
          catch { case _: Exception => false }
        val full =
          if (headIsCatalog) parts
          else if (parts.length == 1)
            v.currentCatalog +: v.currentNamespace :+ parts.head
          else v.currentCatalog +: parts
        r.copy(multipartIdentifier = full)
    }
    // expand nested graft views NOW (one rule application yields a fully
    // substituted tree; cycles surface as RECURSIVE_VIEW, never as the
    // analyzer's opaque max-iterations failure)
    qualified.transformUpWithSubqueries {
      case r: UnresolvedRelation =>
        graftCatalogAndIdent(r.multipartIdentifier) match {
          case Some((g2, id2)) =>
            g2.loadViewState(id2) match {
              case Some(st2) if !isMaterialized(st2) =>
                expandView(g2, id2, st2, seen + key)
              case _ => r
            }
          case _ => r
        }
    }
  }

  private[connector] def expandView(g: GraftCatalog, ident: Identifier,
      st: GraftViews.ViewState, seen: Set[String]): LogicalPlan = {
    val v = st.current
    // cycle key = the catalog the view LIVES in (two catalogs' same-named
    // views both storing default-catalog spark_catalog must not collide)
    val key = (g.name() +: ident.namespace :+ ident.name)
      .mkString(".")
    val expanded = qualifiedBody(v, key, seen)
    val aliased =
      if (v.columnAliases.nonEmpty)
        UnresolvedSubqueryColumnAliases(v.columnAliases, expanded)
      else expanded
    SubqueryAlias(ident.name, aliased)
  }

  /** The analyzed recomputation of a MATERIALIZED view's stored SQL —
    * the refresh procedure's body. Cycle seed = the view itself.
    */
  private[connector] def materializedQuery(s: SparkSession,
      location: String): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Paths.get(location)
    val st = GraftViews.load(dir).getOrElse(
      throw new IllegalArgumentException(
        s"$location is not a materialized view (no view metadata)"))
    require(st.current.properties.get(GraftViews.MaterializedProp)
        .contains("true"),
      s"$location is a plain view, not a materialized view")
    val key = s"mv:$location"
    Bridge.ofRows(s, qualifiedBody(st.current, key, Set.empty))
  }

  private def viewPath(g: GraftCatalog, ident: Identifier)
      : java.nio.file.Path = g.viewDirPath(ident)

  /** Analyzer side: substitute a graft view's stored SQL for relations
    * that name it (DDL commands never reach here — see
    * [[GraftViewSqlParser]]).
    */
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // temp views keep precedence over catalog views (Spark contract):
      // a bare name matching a temp view is never claimed here; a
      // MATERIALIZED view is served by its table (standard resolution)
      case r: UnresolvedRelation if !r.isStreaming &&
          !isTempView(r.multipartIdentifier) =>
        graftCatalogAndIdent(r.multipartIdentifier).flatMap {
          case (g, ident) =>
            g.loadViewState(ident)
              .filterNot(isMaterialized)
              .map(st => expandView(g, ident, st, Set.empty))
        }.getOrElse(r)
    }

  /** Parse-time rewrite of view COMMANDS whose identifier lives in a
    * GraftCatalog; anything else passes through untouched for Spark's
    * own (session-catalog / temp-view) handling.
    */
  def rewriteViewCommands(plan: LogicalPlan): LogicalPlan =
    plan.transformDown {
      case c @ CreateView(UnresolvedIdentifier(parts, _), userCols,
          comment, _, props, originalText, query, allowExisting, replace,
          _) =>
        graftCatalogAndIdent(parts).map { case (g, ident) =>
          val sql = originalText.getOrElse(
            throw new UnsupportedOperationException(
              "CREATE VIEW on a graft catalog requires the original " +
                "query text"))
          CreateGraftViewCommand(g, ident, sql, query,
            userCols.map(_._1), userCols.map(_._2),
            comment, props, allowExisting, replace): LogicalPlan
        }.getOrElse(c)

      // CREATE MATERIALIZED VIEW (Spark 4.1 parses the syntax; no
      // in-tree execution exists): table + stored definition in one dir,
      // refreshed on demand via CALL <cat>.system.refresh_mview('db.v')
      case c @ CreateMaterializedViewAsSelect(
          UnresolvedIdentifier(parts, _), columns, partitioning, _,
          query, originalText, ifNotExists) =>
        graftCatalogAndIdent(parts).map { case (g, ident) =>
          require(columns.isEmpty, "column definitions on CREATE " +
            "MATERIALIZED VIEW are not supported — alias in the query")
          CreateGraftMaterializedViewCommand(g, ident, originalText,
            query, partitioning, ifNotExists): LogicalPlan
        }.getOrElse(c)

      case d @ DropView(UnresolvedIdentifier(parts, _), ifExists)
          if !isTempView(parts) =>
        graftCatalogAndIdent(parts).map { case (g, ident) =>
          DropGraftViewCommand(g, ident, ifExists): LogicalPlan
        }.getOrElse(d)

      case s @ ShowViews(UnresolvedNamespace(parts, _), pattern, output)
          if parts.nonEmpty =>
        (try Some(spark.sessionState.catalogManager.catalog(parts.head))
        catch { case _: Exception => None }) match {
          case Some(g: GraftCatalog) =>
            ShowGraftViewsCommand(g, parts.tail, pattern, output)
          case _ => s
        }

      case s @ SetViewProperties(UnresolvedView(parts, _, _, _), props)
          if !isTempView(parts) =>
        graftCatalogAndIdent(parts).map { case (g, ident) =>
          AlterGraftViewPropsCommand(g, ident,
            props.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) })
            : LogicalPlan
        }.getOrElse(s)

      case u @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys,
          _) if !isTempView(parts) =>
        graftCatalogAndIdent(parts).map { case (g, ident) =>
          AlterGraftViewPropsCommand(g, ident,
            keys.map(ViewChange.removeProperty)): LogicalPlan
        }.getOrElse(u)

      // ALTER VIEW ... AS: a NEW definition version through the same
      // versioned metadata (history stays replayable)
      case a @ AlterViewAs(UnresolvedView(parts, _, _, _), originalText,
          query) if !isTempView(parts) =>
        graftCatalogAndIdent(parts).map { case (g, ident) =>
          AlterGraftViewAsCommand(g, ident, originalText, query)
            : LogicalPlan
        }.getOrElse(a)

      // SHOW CREATE TABLE on a graft view renders the view DDL (Spark's
      // own handling covers tables; views live here)
      case s @ ShowCreateTable(UnresolvedTableOrView(parts, _, _), _,
          output) if !isTempView(parts) =>
        graftCatalogAndIdent(parts) match {
          case Some((g, ident)) if g.viewExists(ident) =>
            ShowCreateGraftViewCommand(g, ident, output)
          case _ => s
        }

      // DESCRIBE [EXTENDED] on a graft view: column schema, and with
      // EXTENDED the stored defaults, properties, and version history
      case d @ DescribeRelation(UnresolvedTableOrView(parts, _, _), _,
          isExtended, output) if !isTempView(parts) =>
        graftCatalogAndIdent(parts) match {
          case Some((g, ident)) if g.viewExists(ident) =>
            DescribeGraftViewCommand(g, ident, isExtended, output)
          case _ => d
        }

      case rn @ RenameTable(UnresolvedTableOrView(parts, _, _), newName,
          true) if !isTempView(parts) =>
        graftCatalogAndIdent(parts).flatMap { case (g, ident) =>
          if (!g.viewExists(ident)) None
          else graftCatalogAndIdent(newName).map { case (g2, newIdent) =>
            require(g2 eq g,
              "ALTER VIEW RENAME across catalogs is not supported")
            RenameGraftViewCommand(g, ident, newIdent): LogicalPlan
          }
        }.getOrElse(rn)
    }
}

/** Eager CREATE [OR REPLACE] VIEW [IF NOT EXISTS]: analyzes the view
  * query (for the persisted schema + query column names), then commits a
  * new view version through the catalog.
  */
case class CreateGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, sql: String, query: LogicalPlan,
    columnAliases: Seq[String], columnComments: Seq[Option[String]],
    comment: Option[String], properties: Map[String, String],
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    if (allowExisting && catalog.viewExists(ident)) return Seq.empty
    // a MATERIALIZED view must not be silently replaced by a plain one:
    // the backing table would keep serving the OLD rows (reads route to
    // it) while refresh_mview starts refusing — a stuck view
    if (catalog.loadViewState(ident).exists(
        _.current.properties.get(GraftViews.MaterializedProp)
          .contains("true")))
      throw new UnsupportedOperationException(
        s"$ident is a MATERIALIZED view — CREATE OR REPLACE VIEW cannot " +
          "change its kind; DROP TABLE it and recreate")
    val analyzed = Bridge.ofRows(spark, query)
    val queryNames = analyzed.schema.fieldNames.toSeq
    val schema =
      if (columnAliases.isEmpty) analyzed.schema
      else {
        require(columnAliases.length == queryNames.length,
          s"view columns (${columnAliases.length}) must match query " +
            s"output (${queryNames.length})")
        org.apache.spark.sql.types.StructType(
          analyzed.schema.fields.zip(columnAliases).map {
            case (f, n) => f.copy(name = n) })
      }
    val cm = spark.sessionState.catalogManager
    import scala.jdk.CollectionConverters._
    val props = properties ++
      comment.map(org.apache.spark.sql.connector.catalog.ViewCatalog
        .PROP_COMMENT -> _)
    val info = new ViewInfo(ident, sql, cm.currentCatalog.name(),
      cm.currentNamespace, schema, queryNames.toArray,
      columnAliases.toArray, columnComments.map(_.orNull).toArray,
      props.asJava)
    if (replace) catalog.replaceView(info, true)
    else catalog.createView(info)
    Seq.empty
  }
}

/** Eager CREATE MATERIALIZED VIEW: persists the definition (versioned
  * view metadata tagged materialized) and a graft TABLE of the query's
  * rows in ONE directory — reads are plain table scans (no
  * re-computation), staleness is by design until refresh_mview
  * refreshes the table. Two-phase for crash safety: the definition
  * commits FIRST as a PLAIN view version, the rows materialize, and
  * only then does a second version commit the materialized tag — a
  * crash at ANY intermediate point leaves a working plain view (reads
  * re-expand the SQL; a half-built table dir is ignored because the
  * read path keys on the committed property, not the dir).
  */
case class CreateGraftMaterializedViewCommand(catalog: GraftCatalog,
    ident: Identifier, sql: String, query: LogicalPlan,
    partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform],
    ifNotExists: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    if (catalog.viewExists(ident) || catalog.tableExists(ident)) {
      if (ifNotExists) return Seq.empty
      if (catalog.viewExists(ident))
        throw new org.apache.spark.sql.catalyst.analysis
          .ViewAlreadyExistsException(ident)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    }
    val analyzed = Bridge.ofRows(spark, query)
    val cm = spark.sessionState.catalogManager
    val dir = catalog.viewDirPath(ident)
    java.nio.file.Files.createDirectories(dir.getParent)
    def version(id: Int, op: String, props: Map[String, String]) =
      GraftViews.ViewVersion(
        versionId = id, timestampMs = System.currentTimeMillis(),
        operation = op, sql = sql,
        currentCatalog = cm.currentCatalog.name(),
        currentNamespace = cm.currentNamespace.toSeq,
        schemaDdl = analyzed.schema.toDDL,
        queryColumnNames = analyzed.schema.fieldNames.toSeq,
        columnAliases = Seq.empty, columnComments = Seq.empty,
        properties = props)
    // phase 1: a plain-view version — valid on its own if we crash
    val v1 = catalog.commitViewState(ident, None,
      version(1, "create", Map.empty))
    // phase 2: materialize the rows through the refresh machinery, so
    // an incrementally-maintainable definition seeds its state sidecar
    // + watermark in the SAME base scan (the first refresh_mview is
    // then O(delta), not a full bootstrap)
    val partitionBy = partitioning
      .map(catalog.toGraftPartitionSpec(_, analyzed.schema))
    // asNullable, as Spark's own CTAS does: scan-level pushdowns (e.g.
    // the global-count rewrite) may legally widen an output column's
    // nullability, and the refresh write must still resolve against
    // the table schema
    val relaxed = org.apache.spark.sql.types.StructType(
      analyzed.schema.fields.map(_.copy(nullable = true)))
    val t = graft.table.GraftTable.create(spark, dir.toString,
      relaxed, partitionBy)
    // This create-window materialization commits DIRECTLY (file io) by
    // design, even in REST mode: until the materialized tag commits,
    // the service hides this dir as a table AND refuses protocol
    // commits to it, so these writes are provably single-writer. Every
    // post-tag refresh (CALL refresh_mview) resolves its handle through
    // the catalog's io and commits behind the protocol.
    GraftMviewRefresh.refresh(spark, t, analyzed)
    // phase 3: flip to materialized — reads route to the table only now
    catalog.commitViewState(ident, Some(v1),
      version(2, "create-materialized",
        Map(GraftViews.MaterializedProp -> "true")))
    Seq.empty
  }
}

case class DropGraftViewCommand(catalog: GraftCatalog, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = catalog.dropView(ident)
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Seq.empty
  }
}

case class ShowGraftViewsCommand(catalog: GraftCatalog,
    namespace: Seq[String], pattern: Option[String],
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val views = catalog.listViews(namespace: _*)
    // Spark's SHOW ... LIKE semantics: '|' separates alternatives, '*'
    // is a wildcard, everything ELSE is literal — quote it so 'v(1)'
    // matches the name v(1) instead of blowing up the regex compiler
    val re = pattern.map { p =>
      val alts = p.split("\\|").map(_.split("\\*", -1)
        .map(s => if (s.isEmpty) "" else java.util.regex.Pattern.quote(s))
        .mkString(".*")).mkString("|")
      java.util.regex.Pattern.compile(alts,
        java.util.regex.Pattern.CASE_INSENSITIVE)
    }
    views.toSeq
      .filter(v => re.forall(_.matcher(v.name).matches()))
      .sortBy(_.name)
      .map(v => Row(namespace.mkString("."), v.name, false))
  }
}

case class AlterGraftViewPropsCommand(catalog: GraftCatalog,
    ident: Identifier, changes: Seq[ViewChange])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.alterView(ident, changes: _*)
    Seq.empty
  }
}

case class RenameGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, newIdent: Identifier)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    catalog.renameView(ident, newIdent)
    Seq.empty
  }
}

/** Eager ALTER VIEW ... AS: commits the next definition version through
  * the same versioned metadata — the old SQL stays replayable in the
  * version log, exactly like CREATE OR REPLACE.
  */
case class AlterGraftViewAsCommand(catalog: GraftCatalog,
    ident: Identifier, sql: String, query: LogicalPlan)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val prev = catalog.loadViewState(ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))
    if (prev.current.properties.get(GraftViews.MaterializedProp)
        .contains("true"))
      throw new UnsupportedOperationException(
        s"$ident is a MATERIALIZED view — its backing table serves its " +
          "current definition; DROP TABLE and recreate to change it")
    val analyzed = Bridge.ofRows(spark, query)
    val cm = spark.sessionState.catalogManager
    catalog.commitViewState(ident, Some(prev), GraftViews.ViewVersion(
      versionId = prev.versions.map(_.versionId).max + 1,
      timestampMs = System.currentTimeMillis(),
      operation = "replace", sql = sql,
      currentCatalog = cm.currentCatalog.name(),
      currentNamespace = cm.currentNamespace.toSeq,
      schemaDdl = analyzed.schema.toDDL,
      queryColumnNames = analyzed.schema.fieldNames.toSeq,
      columnAliases = Seq.empty, columnComments = Seq.empty,
      properties = prev.current.properties))
    Seq.empty
  }
}

/** SHOW CREATE TABLE on a graft view: the reproducing DDL. */
case class ShowCreateGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val st = catalog.loadViewState(ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))
    val v = st.current
    val mat = v.properties.get(GraftViews.MaterializedProp)
      .contains("true")
    val cols =
      if (v.columnAliases.nonEmpty) v.columnAliases
      else org.apache.spark.sql.types.StructType
        .fromDDL(v.schemaDdl).fieldNames.toSeq
    val name = (catalog.name() +: ident.namespace :+ ident.name)
      .mkString(".")
    val props = (v.properties - GraftViews.MaterializedProp).toSeq.sorted
    val kind = if (mat) "MATERIALIZED VIEW" else "VIEW"
    val sb = new StringBuilder
    sb.append(s"CREATE $kind $name")
    if (!mat) sb.append(cols.mkString(" (\n  ", ",\n  ", ")"))
    sb.append('\n')
    if (props.nonEmpty)
      sb.append(props.map { case (k, x) => s"'$k' = '$x'" }
        .mkString("TBLPROPERTIES (\n  ", ",\n  ", ")\n"))
    sb.append(s"AS ${v.sql}\n")
    Seq(Row(sb.toString))
  }
}

/** DESCRIBE [EXTENDED] on a graft view: column schema; EXTENDED adds the
  * stored resolution defaults, properties, and the full version history
  * (the Iceberg-view-spec `versions` + `version-log` surfaced in SQL).
  */
case class DescribeGraftViewCommand(catalog: GraftCatalog,
    ident: Identifier, isExtended: Boolean,
    override val output: Seq[Attribute]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val st = catalog.loadViewState(ident).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident))
    val v = st.current
    val schema = org.apache.spark.sql.types.StructType.fromDDL(v.schemaDdl)
    val cols = schema.fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, null))
    if (!isExtended) return cols
    val mat = v.properties.get(GraftViews.MaterializedProp)
      .contains("true")
    def ts(ms: Long): String =
      java.time.Instant.ofEpochMilli(ms).toString
    cols ++ Seq(
      Row("", "", ""),
      Row("# Detailed View Information", "", ""),
      Row("Name",
        (catalog.name() +: ident.namespace :+ ident.name).mkString("."),
        ""),
      Row("Kind", if (mat) "MATERIALIZED VIEW" else "VIEW", ""),
      Row("View Text", v.sql, ""),
      Row("Default Catalog", v.currentCatalog, ""),
      Row("Default Namespace", v.currentNamespace.mkString("."), ""),
      Row("View Properties",
        (v.properties - GraftViews.MaterializedProp).toSeq.sorted
          .map { case (k, x) => s"$k=$x" }.mkString("[", ", ", "]"), ""),
      Row("", "", ""),
      Row("# Version History", "", "")) ++
      st.versions.sortBy(_.versionId).map(ver =>
        Row(s"v${ver.versionId}", s"${ver.operation} @ ${ts(ver.timestampMs)}",
          if (ver.versionId == st.currentVersionId) "(current)" else null))
  }
}
