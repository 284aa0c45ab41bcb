package graft.connector.rest

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.model._
import graft.table.{CommitConflictException, FileMetadataIo, GraftTable}
import java.net.{InetSocketAddress, URLDecoder}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** In-process Iceberg REST catalog service (the reference's lib.rs:22
  * "Multiple catalog implementations: REST" successor feature, built
  * offline against the PUBLIC REST catalog OpenAPI surface): config,
  * namespace CRUD, table list/create/load/drop, and the
  * requirements-guarded commit protocol — served from an embedded JDK
  * HttpServer (zero new dependencies) over a file warehouse. Data and
  * manifest files go straight to shared storage (the standard REST
  * deployment model); ONLY metadata commits flow through here, so the
  * service is the table's single commit authority and any engine
  * speaking the protocol (a future pyiceberg/Trino peer, or this
  * engine's own REST-mode catalog) shares one consistent view.
  *
  * Commit concurrency: requirements are validated against current
  * metadata, updates fold in ([[RestProtocol.applyUpdates]]), and the
  * result claims the next metadata version with the same atomic
  * CREATE_NEW the file catalog uses — a racing commit loses the claim
  * and surfaces as 409 CommitFailedException for the client to retry.
  */
private[graft] class GraftRestServer(warehouse: String) {

  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // serial dispatch; commits serialize anyway
    // start from a DAEMON thread: the JDK server's internal
    // HTTP-Dispatcher thread inherits daemon status from its creator,
    // so an embedded service never pins the JVM open after main exits
    // (a non-daemon dispatcher hangs bench/verify runs at shutdown)
    val starter = new Thread(() => server.start(), "graft-rest-starter")
    starter.setDaemon(true)
    starter.start()
    starter.join()
    server.getAddress.getPort
  }

  def port: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"
  def stop(): Unit = if (server != null) server.stop(0)

  // ------------------------------------------------------- dispatch ----

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    // decode from the RAW path: getPath already percent-decodes, and a
    // second URLDecoder pass would corrupt names ('+' -> space, literal
    // '%' -> decode error). URLDecoder is form-decoding, so protect '+'
    // (a legal path char) before decoding each raw segment.
    val path = ex.getRequestURI.getRawPath.stripPrefix("/v1")
      .split("/").filter(_.nonEmpty).toSeq
      .map(seg => URLDecoder.decode(seg.replace("+", "%2B"), "UTF-8"))
    try {
      (method, path) match {
        case ("GET", Seq("config")) =>
          val o = Json.obj
          o.putObject("defaults")
          o.putObject("overrides").put("warehouse", warehouse)
          reply(ex, 200, o)

        case ("GET", Seq("namespaces")) =>
          // ?parent=a%1Fb lists CHILD namespaces (the spec's multi-level
          // namespace listing); without it, the top level. Decode from
          // the RAW query for the same reason the path uses getRawPath:
          // getQuery already percent-decodes, and a second pass corrupts
          // '%'/'+'-bearing names
          val parent = Option(ex.getRequestURI.getRawQuery)
            .flatMap(_.split('&').collectFirst {
              case q if q.startsWith("parent=") => splitNs(
                URLDecoder.decode(q.stripPrefix("parent=")
                  .replace("+", "%2B"), "UTF-8"))
            }).getOrElse(Seq.empty)
          if (parent.nonEmpty && !Files.isDirectory(nsDir(parent)))
            return error(ex, 404, "NoSuchNamespaceException",
              s"namespace ${parent.mkString(".")} not found")
          val o = Json.obj
          val arr = o.putArray("namespaces")
          listNamespaces(parent).foreach { ns =>
            val a = arr.addArray(); ns.foreach(a.add) }
          reply(ex, 200, o)

        case ("POST", Seq("namespaces")) =>
          val body = Json.parse(new String(
            ex.getRequestBody.readAllBytes(), "UTF-8"))
          val ns = body.path("namespace").elements.asScala
            .map(_.asText).toSeq
          val dir = nsDir(ns)
          if (Files.isDirectory(dir))
            return error(ex, 409, "AlreadyExistsException",
              s"namespace ${ns.mkString(".")} already exists")
          Files.createDirectories(dir)
          val o = Json.obj
          val a = o.putArray("namespace"); ns.foreach(a.add)
          o.putObject("properties")
          reply(ex, 200, o)

        case ("GET" | "HEAD", Seq("namespaces", ns)) =>
          val parts = splitNs(ns)
          if (!Files.isDirectory(nsDir(parts)))
            return error(ex, 404, "NoSuchNamespaceException",
              s"namespace $ns not found")
          if (method == "HEAD") { ex.sendResponseHeaders(204, 0); return }
          val o = Json.obj
          val a = o.putArray("namespace"); parts.foreach(a.add)
          o.putObject("properties")
          reply(ex, 200, o)

        case ("DELETE", Seq("namespaces", ns)) =>
          val dir = nsDir(splitNs(ns))
          if (!Files.isDirectory(dir))
            return error(ex, 404, "NoSuchNamespaceException",
              s"namespace $ns not found")
          val ls = Files.list(dir)
          val empty = try !ls.iterator.hasNext finally ls.close()
          if (!empty)
            return error(ex, 409, "NamespaceNotEmptyException",
              s"namespace $ns is not empty")
          Files.delete(dir)
          ex.sendResponseHeaders(204, -1)

        case ("GET", Seq("namespaces", ns, "tables")) =>
          val parts = splitNs(ns)
          val dir = nsDir(parts)
          if (!Files.isDirectory(dir))
            return error(ex, 404, "NoSuchNamespaceException",
              s"namespace $ns not found")
          val o = Json.obj
          val arr = o.putArray("identifiers")
          val ls = Files.list(dir)
          try ls.iterator.asScala
            .filter(p => Files.isDirectory(p.resolve("metadata")) &&
              tableVisible(p))
            .foreach { p =>
              val t = arr.addObject()
              val a = t.putArray("namespace"); parts.foreach(a.add)
              t.put("name", p.getFileName.toString)
            }
          finally ls.close()
          reply(ex, 200, o)

        case ("POST", Seq("namespaces", ns, "tables")) =>
          createTable(ex, splitNs(ns))

        case ("GET" | "HEAD", Seq("namespaces", ns, "tables", t)) =>
          val loc = tableDir(splitNs(ns), t)
          FileMetadataIo.latest(loc.toString)
            .filter(_ => tableVisible(loc)) match {
            case None => error(ex, 404, "NoSuchTableException",
              s"table $ns.$t not found")
            case Some((v, meta)) =>
              if (method == "HEAD") {
                ex.sendResponseHeaders(204, 0); return
              }
              reply(ex, 200, loadResponse(loc, v, meta))
          }

        case ("POST", Seq("namespaces", ns, "tables", t)) =>
          commitTable(ex, splitNs(ns), t)

        // Multi-table ATOMIC transaction (the REST spec's
        // /v1/transactions/commit): validate every table's requirements
        // against current metadata, apply every update list, then write
        // all version claims — all-or-nothing under this server's
        // serial dispatch (the single commit authority is exactly what
        // makes cross-table atomicity possible at all; independent
        // file version-claims cannot provide it).
        case ("POST", Seq("transactions", "commit")) =>
          commitTransaction(ex)

        // ---- views (the REST spec's /v1/.../views surface): list /
        // create / load / commit-replace / drop. View metadata commits
        // flow through here in REST mode — one commit authority for
        // tables AND views, so a second REST client sees every view.
        case ("GET", Seq("namespaces", ns, "views")) =>
          val parts = splitNs(ns)
          val dir = nsDir(parts)
          if (!Files.isDirectory(dir))
            return error(ex, 404, "NoSuchNamespaceException",
              s"namespace $ns not found")
          val o = Json.obj
          val arr = o.putArray("identifiers")
          val ls = Files.list(dir)
          try ls.iterator.asScala
            .filter(graft.connector.GraftViews.isViewDir)
            .foreach { p =>
              val t = arr.addObject()
              val a = t.putArray("namespace"); parts.foreach(a.add)
              t.put("name", p.getFileName.toString)
            }
          finally ls.close()
          reply(ex, 200, o)

        case ("POST", Seq("namespaces", ns, "views")) =>
          createView(ex, splitNs(ns))

        case ("POST", Seq("views", "rename")) =>
          val body = Json.parse(new String(
            ex.getRequestBody.readAllBytes(), "UTF-8"))
          def ident(k: String): (Seq[String], String) = {
            val n = body.path(k)
            (n.path("namespace").elements.asScala.map(_.asText).toSeq,
              n.path("name").asText)
          }
          val (sns, sname) = ident("source")
          val (dns, dname) = ident("destination")
          val from = tableDir(sns, sname)
          val to = tableDir(dns, dname)
          if (!graft.connector.GraftViews.isViewDir(from))
            return error(ex, 404, "NoSuchViewException",
              s"view ${sns.mkString(".")}.$sname not found")
          // a materialized view's backing table pins absolute paths — a
          // dir move would orphan every manifest entry
          if (FileMetadataIo.latest(from.toString).isDefined)
            return error(ex, 400, "BadRequestException",
              "a materialized view cannot be renamed: its backing " +
                "table pins absolute paths")
          if (graft.connector.GraftViews.isViewDir(to) ||
              FileMetadataIo.latest(to.toString).isDefined)
            return error(ex, 409, "AlreadyExistsException",
              s"${dns.mkString(".")}.$dname already exists")
          if (!Files.isDirectory(nsDir(dns)))
            return error(ex, 404, "NoSuchNamespaceException",
              s"namespace ${dns.mkString(".")} not found")
          Files.move(from, to)
          ex.sendResponseHeaders(204, -1)

        case ("GET" | "HEAD", Seq("namespaces", ns, "views", v)) =>
          val loc = tableDir(splitNs(ns), v)
          graft.connector.GraftViews.loadWithVersion(loc) match {
            case None => error(ex, 404, "NoSuchViewException",
              s"view $ns.$v not found")
            case Some((n, st)) =>
              if (method == "HEAD") {
                ex.sendResponseHeaders(204, 0); return
              }
              reply(ex, 200, viewResponse(loc, n, st))
          }

        case ("POST", Seq("namespaces", ns, "views", v)) =>
          commitView(ex, splitNs(ns), v)

        case ("DELETE", Seq("namespaces", ns, "views", v)) =>
          val loc = tableDir(splitNs(ns), v)
          if (!graft.connector.GraftViews.isViewDir(loc))
            return error(ex, 404, "NoSuchViewException",
              s"view $ns.$v not found")
          val w = Files.walk(loc)
          try w.sorted(java.util.Comparator.reverseOrder())
            .iterator.asScala.foreach(Files.deleteIfExists(_))
          finally w.close()
          ex.sendResponseHeaders(204, -1)

        case ("DELETE", Seq("namespaces", ns, "tables", t)) =>
          val loc = tableDir(splitNs(ns), t)
          if (FileMetadataIo.latest(loc.toString).isEmpty ||
              !tableVisible(loc))
            return error(ex, 404, "NoSuchTableException",
              s"table $ns.$t not found")
          val w = Files.walk(loc)
          try w.sorted(java.util.Comparator.reverseOrder())
            .iterator.asScala.foreach(Files.deleteIfExists(_))
          finally w.close()
          ex.sendResponseHeaders(204, -1)

        case _ =>
          error(ex, 404, "NotFound", s"$method /v1${path.mkString("/")}")
      }
    } catch {
      case e: Exception =>
        try error(ex, 500, e.getClass.getSimpleName,
          Option(e.getMessage).getOrElse("internal error"))
        catch { case _: Exception => }
    } finally ex.close()
  }

  // -------------------------------------------------------- handlers ----

  private def createTable(ex: HttpExchange, ns: Seq[String]): Unit = {
    if (!Files.isDirectory(nsDir(ns)))
      return error(ex, 404, "NoSuchNamespaceException",
        s"namespace ${ns.mkString(".")} not found")
    val body = Json.parse(new String(
      ex.getRequestBody.readAllBytes(), "UTF-8"))
    val name = body.path("name").asText
    val loc = tableDir(ns, name)
    if (FileMetadataIo.latest(loc.toString).isDefined)
      return error(ex, 409, "AlreadyExistsException",
        s"table ${ns.mkString(".")}.$name already exists")
    val schema = SchemaV2.fromJson(body.path("schema"))
      .copy(schemaId = 0)
    val spec = Option(body.get("partition-spec")).filterNot(_.isNull)
      .map(PartitionSpec.fromJson)
      .filter(_.fields.nonEmpty)
    val props = Option(body.get("properties")).filterNot(_.isNull)
      .map(_.fields.asScala.map(e =>
        e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty)
    val meta = TableMetadataV2(
      tableUuid = java.util.UUID.randomUUID.toString,
      location = loc.toString,
      lastSequenceNumber = 0L,
      lastUpdatedMs = System.currentTimeMillis,
      lastColumnId = GraftTable.maxFieldId(schema),
      schemas = Seq(schema),
      currentSchemaId = 0,
      partitionSpecs = Seq(spec.map(_.copy(specId = 1))
        .getOrElse(PartitionSpec.unpartitioned)),
      defaultSpecId = spec.map(_ => 1).getOrElse(0),
      lastPartitionId = spec.map(_.fields.map(_.fieldId).max)
        .getOrElse(999),
      properties = if (props.isEmpty) None else Some(props))
    FileMetadataIo.commit(loc.toString, None, meta)
    val (v, committed) = FileMetadataIo.latest(loc.toString).get
    reply(ex, 200, loadResponse(loc, v, committed))
  }

  private def commitTable(ex: HttpExchange, ns: Seq[String],
      name: String): Unit = {
    val loc = tableDir(ns, name)
    val body = Json.parse(new String(
      ex.getRequestBody.readAllBytes(), "UTF-8"))
    val reqs = Option(body.get("requirements"))
      .map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
    val updates = Option(body.get("updates"))
      .map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
    // same visibility rule as loads: a half-built materialized view's
    // backing table takes NO protocol commits until its tag lands —
    // the create-window materialization is single-writer by exclusion
    val cur = FileMetadataIo.latest(loc.toString)
      .filter(_ => tableVisible(loc))
    if (cur.isEmpty)
      return error(ex, 404, "NoSuchTableException",
        s"table ${ns.mkString(".")}.$name not found")
    RestProtocol.checkRequirements(cur.map(_._2), reqs) match {
      case Some(violation) =>
        return error(ex, 409, "CommitFailedException", violation)
      case None =>
    }
    try {
      val next = RestProtocol.applyUpdates(cur.get._2, updates)
        .copy(lastUpdatedMs = System.currentTimeMillis)
      // the atomic version claim is the serializer: a commit that lands
      // between our read and this write loses the claim → 409 → retry
      FileMetadataIo.commit(loc.toString, Some((cur.get._1, cur.get._2)),
        next)
      val (v, committed) = FileMetadataIo.latest(loc.toString).get
      reply(ex, 200, loadResponse(loc, v, committed))
    } catch {
      case e @ (_: CommitConflictException |
          _: RestProtocol.CommitConflict) =>
        error(ex, 409, "CommitFailedException", e.getMessage)
    }
  }

  private def createView(ex: HttpExchange, ns: Seq[String]): Unit = {
    if (!Files.isDirectory(nsDir(ns)))
      return error(ex, 404, "NoSuchNamespaceException",
        s"namespace ${ns.mkString(".")} not found")
    val body = Json.parse(new String(
      ex.getRequestBody.readAllBytes(), "UTF-8"))
    val name = body.path("name").asText
    val loc = tableDir(ns, name)
    if (graft.connector.GraftViews.isViewDir(loc))
      return error(ex, 409, "AlreadyExistsException",
        s"view ${ns.mkString(".")}.$name already exists")
    if (FileMetadataIo.latest(loc.toString).isDefined)
      return error(ex, 409, "AlreadyExistsException",
        s"table ${ns.mkString(".")}.$name already exists")
    val st = graft.connector.GraftViews
      .fromJson(Json.write(body.path("metadata")))
      .copy(location = loc.toString) // server re-anchors the location
    try {
      val n = graft.connector.GraftViews.commitState(loc, 0, st)
      reply(ex, 200, viewResponse(loc, n, st))
    } catch {
      case e: CommitConflictException =>
        error(ex, 409, "CommitFailedException", e.getMessage)
    }
  }

  private def commitView(ex: HttpExchange, ns: Seq[String],
      name: String): Unit = {
    val loc = tableDir(ns, name)
    val body = Json.parse(new String(
      ex.getRequestBody.readAllBytes(), "UTF-8"))
    val cur = graft.connector.GraftViews.loadWithVersion(loc)
    if (cur.isEmpty)
      return error(ex, 404, "NoSuchViewException",
        s"view ${ns.mkString(".")}.$name not found")
    val base = body.path("base-version").asInt
    val st = graft.connector.GraftViews
      .fromJson(Json.write(body.path("metadata")))
      .copy(location = loc.toString)
    // identity must hold across the replace (spec assert-view-uuid)
    if (st.uuid != cur.get._2.uuid)
      return error(ex, 409, "CommitFailedException",
        s"view uuid changed: ${cur.get._2.uuid} != ${st.uuid}")
    try {
      val n = graft.connector.GraftViews.commitState(loc, base, st)
      reply(ex, 200, viewResponse(loc, n, st))
    } catch {
      case e: CommitConflictException =>
        error(ex, 409, "CommitFailedException", e.getMessage)
    }
  }

  private def commitTransaction(ex: HttpExchange): Unit = {
    val body = Json.parse(new String(
      ex.getRequestBody.readAllBytes(), "UTF-8"))
    val changes = body.path("table-changes").elements.asScala.toSeq
    if (changes.isEmpty)
      return error(ex, 400, "BadRequestException",
        "transaction carries no table changes")
    case class Staged(loc: Path, base: (Int, TableMetadataV2),
      next: TableMetadataV2, ident: String)
    val staged = Seq.newBuilder[Staged]
    val seen = scala.collection.mutable.Set.empty[String]
    // phase 1: validate EVERYTHING against current state; nothing is
    // written until every table's requirements and updates are clean
    changes.foreach { ch =>
      val ns = ch.path("identifier").path("namespace").elements.asScala
        .map(_.asText).toSeq
      val name = ch.path("identifier").path("name").asText
      val ident = (ns :+ name).mkString(".")
      val loc = tableDir(ns, name)
      if (!seen.add(loc.toString))
        return error(ex, 400, "BadRequestException",
          s"table $ident appears twice in one transaction")
      val cur = FileMetadataIo.latest(loc.toString)
        .filter(_ => tableVisible(loc)).getOrElse(
          return error(ex, 404, "NoSuchTableException",
            s"table $ident not found"))
      val reqs = Option(ch.get("requirements"))
        .map(_.elements.asScala.toSeq).getOrElse(Seq.empty)
      RestProtocol.checkRequirements(Some(cur._2), reqs).foreach(v =>
        return error(ex, 409, "CommitFailedException", s"$ident: $v"))
      val next =
        try RestProtocol.applyUpdates(cur._2,
          Option(ch.get("updates")).map(_.elements.asScala.toSeq)
            .getOrElse(Seq.empty))
        catch {
          case e: RestProtocol.CommitConflict =>
            return error(ex, 409, "CommitFailedException",
              s"$ident: ${e.getMessage}")
        }
      staged += Staged(loc, cur,
        next.copy(lastUpdatedMs = System.currentTimeMillis), ident)
    }
    // phase 2: write every claim. The serial dispatcher guarantees no
    // protocol commit raced phase 1; a claim can only fail if a writer
    // bypassed the service entirely (out of contract in REST mode).
    staged.result().foreach { s =>
      try FileMetadataIo.commit(s.loc.toString, Some(s.base), s.next)
      catch {
        case e: CommitConflictException =>
          return error(ex, 500, "CommitStateUnknownException",
            s"transaction partially applied at ${s.ident}: a writer " +
              s"bypassed the catalog service (${e.getMessage})")
      }
    }
    ex.sendResponseHeaders(204, -1)
  }

  // --------------------------------------------------------- helpers ----

  /** A dir that is ALSO a view serves as a table only once its
    * materialized tag is committed — the same visibility rule the file
    * catalog applies, mirrored here so REST clients never see a
    * half-built materialized view's backing table.
    */
  private def tableVisible(loc: Path): Boolean =
    !graft.connector.GraftViews.isViewDir(loc) ||
      graft.connector.GraftViews.load(loc).exists(
        _.current.properties
          .get(graft.connector.GraftViews.MaterializedProp)
          .contains("true"))

  private def viewResponse(loc: Path, version: Int,
      st: graft.connector.GraftViews.ViewState): ObjectNode = {
    val o = Json.obj
    o.put("metadata-location", graft.connector.GraftViews.metaDir(loc)
      .resolve(f"v$version%05d.view-metadata.json").toString)
    o.set[JsonNode]("metadata",
      Json.parse(graft.connector.GraftViews.toJson(st)))
    o
  }

  private def nsDir(ns: Seq[String]): Path =
    ns.foldLeft(Paths.get(warehouse))(_.resolve(_))
  private def tableDir(ns: Seq[String], t: String): Path =
    nsDir(ns).resolve(t)
  /** The REST spec separates multi-level namespace parts with %1F. */
  private def splitNs(ns: String): Seq[String] =
    ns.split('\u001f').toSeq
  private def listNamespaces(
      parent: Seq[String] = Seq.empty): Seq[Seq[String]] = {
    val root = nsDir(parent)
    if (!Files.isDirectory(root)) return Seq.empty
    val ls = Files.list(root)
    // a child dir holding table or view metadata is a TABLE/VIEW, not a
    // namespace — only plain dirs list as namespaces
    try ls.iterator.asScala.filter(p => Files.isDirectory(p) &&
        !Files.isDirectory(p.resolve("metadata")) &&
        !Files.isDirectory(p.resolve("viewmeta")))
      .filterNot(_.getFileName.toString.startsWith("."))
      .map(p => parent :+ p.getFileName.toString).toSeq.sortBy(_.mkString)
    finally ls.close()
  }

  private def loadResponse(loc: Path, version: Int,
      meta: TableMetadataV2): ObjectNode = {
    val o = Json.obj
    o.put("metadata-location",
      loc.resolve("metadata").resolve(s"v$version.metadata.json").toString)
    o.set[ObjectNode]("metadata", meta.toJson)
    o.putObject("config")
    o
  }

  private def reply(ex: HttpExchange, code: Int, body: JsonNode): Unit = {
    val bytes = Json.write(body).getBytes("UTF-8")
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def error(ex: HttpExchange, code: Int, errType: String,
      msg: String): Unit = {
    val o = Json.obj
    val e = o.putObject("error")
    e.put("message", msg)
    e.put("type", errType)
    e.put("code", code)
    reply(ex, code, o)
  }
}
