package graft.connector.rest

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.model._
import graft.table.{CommitConflictException, MetadataIo}
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import scala.jdk.CollectionConverters._

/** Client side of the Iceberg REST catalog protocol (JDK HttpClient,
  * zero new dependencies): namespace/table lifecycle plus the
  * requirements-guarded commit. A 409 surfaces as
  * [[graft.table.CommitConflictException]], so the engine's standard
  * retryingCommit loop re-derives and retries exactly as it does for a
  * lost file-version claim.
  */
private[graft] class GraftRestClient(baseUri: String) {

  private val http = HttpClient.newHttpClient()

  // URLEncoder is form-encoding: a space becomes '+', but the server's
  // raw-path decode (GraftRestServer) treats '+' as the literal char
  // (a legal path byte). Re-encode space as %20 so names containing
  // spaces round-trip; literal '+' itself is form-encoded to %2B.
  private def enc(s: String): String =
    URLEncoder.encode(s, "UTF-8").replace("+", "%20")
  private def nsPath(ns: Seq[String]): String =
    enc(ns.mkString("\u001f"))

  private def request(method: String, path: String,
      body: Option[JsonNode] = None): (Int, JsonNode) = {
    val b = HttpRequest.newBuilder(java.net.URI.create(s"$baseUri$path"))
      .header("Content-Type", "application/json")
    val req = (body match {
      case Some(j) => b.method(method,
        HttpRequest.BodyPublishers.ofString(Json.write(j)))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    val json =
      if (resp.body() == null || resp.body().isEmpty) Json.obj
      else Json.parse(resp.body())
    (resp.statusCode(), json)
  }

  private def fail(code: Int, body: JsonNode, ctx: String): Nothing = {
    val msg = body.path("error").path("message").asText(ctx)
    val tpe = body.path("error").path("type").asText("")
    if (code == 409 && tpe == "CommitFailedException")
      throw new CommitConflictException(msg)
    throw new RuntimeException(s"REST catalog $ctx failed ($code $tpe): $msg")
  }

  // ---------------------------------------------------------- config ----

  def warehouse(): String = {
    val (code, body) = request("GET", "/v1/config")
    if (code != 200) fail(code, body, "config")
    body.path("overrides").path("warehouse").asText
  }

  // ------------------------------------------------------ namespaces ----

  def listNamespaces(parent: Seq[String] = Seq.empty): Seq[Seq[String]] = {
    val q = if (parent.isEmpty) ""
      else s"?parent=${nsPath(parent)}"
    val (code, body) = request("GET", s"/v1/namespaces$q")
    if (code != 200) fail(code, body, "listNamespaces")
    body.path("namespaces").elements.asScala
      .map(_.elements.asScala.map(_.asText).toSeq).toSeq
  }

  def createNamespace(ns: Seq[String]): Unit = {
    val o = Json.obj
    val a = o.putArray("namespace"); ns.foreach(a.add)
    o.putObject("properties")
    val (code, body) = request("POST", "/v1/namespaces", Some(o))
    if (code != 200) fail(code, body, "createNamespace")
  }

  def namespaceExists(ns: Seq[String]): Boolean =
    request("HEAD", s"/v1/namespaces/${nsPath(ns)}")._1 == 204

  def dropNamespace(ns: Seq[String]): Boolean = {
    val (code, body) = request("DELETE", s"/v1/namespaces/${nsPath(ns)}")
    if (code == 404) return false
    if (code != 204) fail(code, body, "dropNamespace")
    true
  }

  // ---------------------------------------------------------- tables ----

  def listTables(ns: Seq[String]): Seq[String] = {
    val (code, body) =
      request("GET", s"/v1/namespaces/${nsPath(ns)}/tables")
    if (code != 200) fail(code, body, "listTables")
    body.path("identifiers").elements.asScala
      .map(_.path("name").asText).toSeq
  }

  def tableExists(ns: Seq[String], name: String): Boolean =
    request("HEAD",
      s"/v1/namespaces/${nsPath(ns)}/tables/${enc(name)}")._1 == 204

  /** (metadata-location, metadata) or None when absent. */
  def loadTable(ns: Seq[String], name: String)
      : Option[(String, graft.model.TableMetadataV2)] = {
    val (code, body) = request("GET",
      s"/v1/namespaces/${nsPath(ns)}/tables/${enc(name)}")
    if (code == 404) return None
    if (code != 200) fail(code, body, "loadTable")
    Some((body.path("metadata-location").asText,
      graft.model.TableMetadataV2.fromJson(body.path("metadata"))))
  }

  def createTable(ns: Seq[String], name: String, schema: SchemaV2,
      spec: Option[PartitionSpec],
      properties: Map[String, String]): graft.model.TableMetadataV2 = {
    val o = Json.obj
    o.put("name", name)
    o.set[ObjectNode]("schema", schema.toJson)
    spec.foreach(s => o.set[ObjectNode]("partition-spec", s.toJson))
    if (properties.nonEmpty) {
      val p = o.putObject("properties")
      properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    }
    val (code, body) =
      request("POST", s"/v1/namespaces/${nsPath(ns)}/tables", Some(o))
    if (code != 200) fail(code, body, "createTable")
    graft.model.TableMetadataV2.fromJson(body.path("metadata"))
  }

  def dropTable(ns: Seq[String], name: String): Boolean = {
    val (code, body) = request("DELETE",
      s"/v1/namespaces/${nsPath(ns)}/tables/${enc(name)}")
    if (code == 404) return false
    if (code != 204) fail(code, body, "dropTable")
    true
  }

  /** The commit protocol: requirements + updates; 409 →
    * CommitConflictException (retryable).
    */
  def commitTable(ns: Seq[String], name: String,
      requirements: Seq[ObjectNode], updates: Seq[ObjectNode])
      : graft.model.TableMetadataV2 = {
    val o = Json.obj
    val r = o.putArray("requirements"); requirements.foreach(r.add)
    val u = o.putArray("updates"); updates.foreach(u.add)
    val (code, body) = request("POST",
      s"/v1/namespaces/${nsPath(ns)}/tables/${enc(name)}", Some(o))
    if (code != 200) fail(code, body, "commitTable")
    graft.model.TableMetadataV2.fromJson(body.path("metadata"))
  }

  /** Atomic multi-table commit (REST spec /v1/transactions/commit):
    * every table's requirements validate against current metadata and
    * every update list applies, or nothing does.
    */
  def commitTransaction(changes: Seq[GraftRestClient.TxnChange]): Unit = {
    val o = Json.obj
    val arr = o.putArray("table-changes")
    changes.foreach { c =>
      val ch = arr.addObject()
      val id = ch.putObject("identifier")
      val na = id.putArray("namespace"); c.ns.foreach(na.add)
      id.put("name", c.name)
      val r = ch.putArray("requirements"); c.requirements.foreach(r.add)
      val u = ch.putArray("updates"); c.updates.foreach(u.add)
    }
    val (code, body) = request("POST", "/v1/transactions/commit", Some(o))
    if (code != 204) fail(code, body, "commitTransaction")
  }

  // ------------------------------------------------------------ views ----

  def listViews(ns: Seq[String]): Seq[String] = {
    val (code, body) = request("GET",
      s"/v1/namespaces/${nsPath(ns)}/views")
    if (code != 200) fail(code, body, "listViews")
    body.path("identifiers").elements.asScala
      .map(_.path("name").asText).toSeq.sorted
  }

  def viewExists(ns: Seq[String], name: String): Boolean =
    request("HEAD",
      s"/v1/namespaces/${nsPath(ns)}/views/${enc(name)}")._1 == 204

  /** Load a view: (version-file number, state) — the version is the
    * base the next [[commitView]] must assert.
    */
  def loadView(ns: Seq[String], name: String)
      : Option[(Int, graft.connector.GraftViews.ViewState)] = {
    val (code, body) = request("GET",
      s"/v1/namespaces/${nsPath(ns)}/views/${enc(name)}")
    if (code == 404) return None
    if (code != 200) fail(code, body, "loadView")
    val re = """v(\d+)\.view-metadata\.json$""".r
    val v = re.findFirstMatchIn(body.path("metadata-location").asText)
      .map(_.group(1).toInt).getOrElse(throw new IllegalStateException(
        s"unparseable view metadata location for ${ns.mkString(".")}.$name"))
    Some((v, graft.connector.GraftViews.fromJson(
      Json.write(body.path("metadata")))))
  }

  def createView(ns: Seq[String], name: String,
      st: graft.connector.GraftViews.ViewState): Unit = {
    val o = Json.obj
    o.put("name", name)
    o.set[JsonNode]("metadata",
      Json.parse(graft.connector.GraftViews.toJson(st)))
    val (code, body) = request("POST",
      s"/v1/namespaces/${nsPath(ns)}/views", Some(o))
    if (code != 200) fail(code, body, "createView")
  }

  def commitView(ns: Seq[String], name: String, baseVersion: Int,
      st: graft.connector.GraftViews.ViewState): Unit = {
    val o = Json.obj
    o.put("base-version", baseVersion)
    o.set[JsonNode]("metadata",
      Json.parse(graft.connector.GraftViews.toJson(st)))
    val (code, body) = request("POST",
      s"/v1/namespaces/${nsPath(ns)}/views/${enc(name)}", Some(o))
    if (code != 200) fail(code, body, "commitView")
  }

  def renameView(srcNs: Seq[String], srcName: String,
      dstNs: Seq[String], dstName: String): Unit = {
    val o = Json.obj
    val s = o.putObject("source")
    val sn = s.putArray("namespace"); srcNs.foreach(sn.add)
    s.put("name", srcName)
    val d = o.putObject("destination")
    val dn = d.putArray("namespace"); dstNs.foreach(dn.add)
    d.put("name", dstName)
    val (code, body) = request("POST", "/v1/views/rename", Some(o))
    if (code != 204) fail(code, body, "renameView")
  }

  def dropView(ns: Seq[String], name: String): Boolean = {
    val (code, body) = request("DELETE",
      s"/v1/namespaces/${nsPath(ns)}/views/${enc(name)}")
    if (code == 404) return false
    if (code != 204) fail(code, body, "dropView")
    true
  }
}

/** [[MetadataIo]] over the REST protocol: the engine's commits become
  * requirement-guarded update lists POSTed to the catalog service —
  * the service is the single commit authority; reads and data/manifest
  * IO still hit shared storage directly.
  */
private[graft] class RestMetadataIo(client: GraftRestClient,
    ns: Seq[String], name: String) extends MetadataIo {

  private def versionOf(metadataLocation: String): Int = {
    val re = """v(\d+)\.metadata\.json$""".r
    re.findFirstMatchIn(metadataLocation).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"unparseable metadata location $metadataLocation"))
  }

  override def latest(location: String)
      : Option[(Int, graft.model.TableMetadataV2)] =
    client.loadTable(ns, name).map { case (loc, meta) =>
      (versionOf(loc), meta)
    }

  override def commit(location: String,
      base: Option[(Int, graft.model.TableMetadataV2)],
      meta: graft.model.TableMetadataV2): Unit = {
    val (_, baseMeta) = base.getOrElse(throw new IllegalStateException(
      "REST table creation goes through createTable, not commit"))
    val updates = RestProtocol.diff(baseMeta, meta)
    if (updates.isEmpty) return
    client.commitTable(ns, name,
      RestProtocol.requirementsFor(baseMeta, updates), updates)
  }
}

private[graft] object GraftRestClient {
  /** One table's slice of a multi-table transaction. */
  case class TxnChange(ns: Seq[String], name: String,
      requirements: Seq[ObjectNode], updates: Seq[ObjectNode])
}
