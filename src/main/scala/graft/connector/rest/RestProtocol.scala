package graft.connector.rest

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.model._
import scala.jdk.CollectionConverters._

/** The Iceberg REST catalog commit vocabulary (the published OpenAPI
  * spec's `TableUpdate` / `TableRequirement` shapes), restricted to
  * exactly the updates this engine's commits produce. The client turns
  * a (base metadata, next metadata) pair into an update list with
  * [[diff]]; the server folds updates into ITS current metadata with
  * [[applyUpdates]] after [[checkRequirements]] passes — deltas, not
  * wholesale replacement, so commits touching disjoint state merge
  * instead of conflicting (the REST protocol's core concurrency model).
  *
  * [[diff]] self-checks: applying the generated updates to `base` must
  * reproduce `next` (modulo the server-maintained metadata-log /
  * snapshot-log / last-updated fields) or it throws — no engine state
  * change can silently fail to cross the wire.
  */
private[graft] object RestProtocol {

  private def action(name: String): ObjectNode = {
    val o = Json.obj; o.put("action", name); o
  }

  // ------------------------------------------------------------ diff ----

  def diff(base: TableMetadataV2, next: TableMetadataV2)
      : Seq[ObjectNode] = {
    val out = Seq.newBuilder[ObjectNode]

    if (next.location != base.location) {
      val o = action("set-location"); o.put("location", next.location)
      out += o
    }

    // schemas (add by id; the update carries the new last-column-id)
    val baseSchemaIds = base.schemas.map(_.schemaId).toSet
    next.schemas.filterNot(s => baseSchemaIds.contains(s.schemaId))
      .foreach { s =>
        val o = action("add-schema")
        o.set[ObjectNode]("schema", s.toJson)
        o.put("last-column-id", next.lastColumnId)
        out += o
      }
    if (next.currentSchemaId != base.currentSchemaId) {
      val o = action("set-current-schema")
      o.put("schema-id", next.currentSchemaId); out += o
    }

    val baseSpecIds = base.partitionSpecs.map(_.specId).toSet
    next.partitionSpecs.filterNot(s => baseSpecIds.contains(s.specId))
      .foreach { s =>
        val o = action("add-spec"); o.set[ObjectNode]("spec", s.toJson)
        out += o
      }
    if (next.defaultSpecId != base.defaultSpecId) {
      val o = action("set-default-spec")
      o.put("spec-id", next.defaultSpecId); out += o
    }

    val baseOrderIds = base.sortOrders.map(_.orderId).toSet
    next.sortOrders.filterNot(s => baseOrderIds.contains(s.orderId))
      .foreach { s =>
        val o = action("add-sort-order")
        o.set[ObjectNode]("sort-order", s.toJson); out += o
      }
    if (next.defaultSortOrderId != base.defaultSortOrderId) {
      val o = action("set-default-sort-order")
      o.put("sort-order-id", next.defaultSortOrderId); out += o
    }

    // properties
    val bp = base.properties.getOrElse(Map.empty)
    val np = next.properties.getOrElse(Map.empty)
    val changed = np.filter { case (k, v) => !bp.get(k).contains(v) }
    val removed = bp.keySet -- np.keySet
    if (changed.nonEmpty) {
      val o = action("set-properties")
      val u = o.putObject("updates")
      changed.toSeq.sortBy(_._1).foreach { case (k, v) => u.put(k, v) }
      out += o
    }
    if (removed.nonEmpty) {
      val o = action("remove-properties")
      val a = o.putArray("removals")
      removed.toSeq.sorted.foreach(a.add)
      out += o
    }

    // snapshots
    val bs = base.snapshots.getOrElse(Seq.empty)
    val ns = next.snapshots.getOrElse(Seq.empty)
    val bsIds = bs.map(_.snapshotId).toSet
    val nsIds = ns.map(_.snapshotId).toSet
    ns.filterNot(s => bsIds.contains(s.snapshotId)).foreach { s =>
      val o = action("add-snapshot")
      o.set[ObjectNode]("snapshot", s.toJson); out += o
    }
    val goneSnaps = bsIds -- nsIds
    if (goneSnaps.nonEmpty) {
      val o = action("remove-snapshots")
      val a = o.putArray("snapshot-ids")
      goneSnaps.toSeq.sorted.foreach(a.add)
      out += o
    }

    // refs (current-snapshot-id rides on the main branch per the spec;
    // a rollback that moved current without touching refs still emits
    // set-snapshot-ref main)
    val br = base.refs.getOrElse(Map.empty)
    val nr = next.refs.getOrElse(Map.empty)
    val refChanged = nr.filter { case (k, v) => !br.get(k).contains(v) }
    val mainMoved = next.currentSnapshotId != base.currentSnapshotId &&
      !refChanged.contains("main")
    (refChanged ++ (if (mainMoved)
      next.currentSnapshotId.map(id => "main" ->
        nr.getOrElse("main",
          SnapshotRef(id, BranchRetention(1, Long.MaxValue, Long.MaxValue))
        ).copy(snapshotId = id)).toMap
    else Map.empty)).toSeq.sortBy(_._1).foreach { case (name, ref) =>
      val o = action("set-snapshot-ref")
      o.put("ref-name", name)
      o.setAll[ObjectNode](ref.toJson)
      out += o
    }
    (br.keySet -- nr.keySet).toSeq.sorted.foreach { name =>
      val o = action("remove-snapshot-ref")
      o.put("ref-name", name); out += o
    }

    // statistics / partition statistics (set per snapshot-id, as spec'd)
    def statsDiff(kind: String, b: Option[Seq[StatisticsFileRef]],
        n: Option[Seq[StatisticsFileRef]]): Unit = {
      val bm = b.getOrElse(Seq.empty).map(r => r.snapshotId -> r).toMap
      val nm = n.getOrElse(Seq.empty).map(r => r.snapshotId -> r).toMap
      nm.filter { case (k, v) => !bm.get(k).contains(v) }
        .toSeq.sortBy(_._1).foreach { case (_, r) =>
          val o = action(s"set-$kind")
          o.set[ObjectNode](kind, r.toJson); out += o
        }
      (bm.keySet -- nm.keySet).toSeq.sorted.foreach { id =>
        val o = action(s"remove-$kind")
        o.put("snapshot-id", id); out += o
      }
    }
    statsDiff("statistics", base.statistics, next.statistics)
    statsDiff("partition-statistics", base.partitionStatistics,
      next.partitionStatistics)

    // format-version bump (the spec's upgrade-format-version action):
    // committing a deletion vector permanently raises the declared
    // format floor (v2 -> v3) — without this action every DV commit on
    // a REST table would fail the self-check below and abort
    if (next.formatVersion != base.formatVersion) {
      val o = action("upgrade-format-version")
      o.put("format-version", next.formatVersion)
      out += o
    }

    // v3 row-lineage high-water mark (shaped like the other updates;
    // the official spec tracks next-row-id through add-snapshot
    // first-row-id — carried explicitly here so the engine's lineage
    // accounting is exact)
    if (next.nextRowId != base.nextRowId) {
      val o = action("set-next-row-id")
      next.nextRowId.foreach(o.put("next-row-id", _))
      out += o
    }

    val updates = out.result()
    // self-check: the update list must reproduce `next` from `base`
    val replay = applyUpdates(base, updates.map(_.asInstanceOf[JsonNode]))
    val want = normalize(next)
    val got = normalize(replay)
    require(got == want,
      s"REST diff cannot express this metadata change:\n want $want\n" +
        s" got  $got")
    updates
  }

  /** Server-maintained fields are excluded from the diff contract. */
  private def normalize(m: TableMetadataV2): TableMetadataV2 =
    m.copy(lastUpdatedMs = 0L, metadataLog = None, snapshotLog = None,
      // map ordering
      properties = m.properties.map(p => scala.collection.immutable
        .TreeMap.from(p)), refs = m.refs.map(r =>
        scala.collection.immutable.TreeMap.from(r)))

  // ----------------------------------------------------------- apply ----

  def applyUpdates(cur: TableMetadataV2, updates: Seq[JsonNode])
      : TableMetadataV2 = {
    var m = cur
    updates.foreach { u =>
      u.path("action").asText match {
        case "set-location" =>
          m = m.copy(location = u.path("location").asText)
        case "add-schema" =>
          val s = SchemaV2.fromJson(u.path("schema"))
          m = m.copy(
            schemas = m.schemas.filterNot(_.schemaId == s.schemaId) :+ s,
            lastColumnId = math.max(m.lastColumnId,
              Option(u.get("last-column-id")).map(_.asInt)
                .getOrElse(m.lastColumnId)))
        case "set-current-schema" =>
          m = m.copy(currentSchemaId = u.path("schema-id").asInt)
        case "add-spec" =>
          val s = PartitionSpec.fromJson(u.path("spec"))
          m = m.copy(
            partitionSpecs =
              m.partitionSpecs.filterNot(_.specId == s.specId) :+ s,
            lastPartitionId = math.max(m.lastPartitionId,
              s.fields.map(_.fieldId).maxOption.getOrElse(0)))
        case "set-default-spec" =>
          m = m.copy(defaultSpecId = u.path("spec-id").asInt)
        case "add-sort-order" =>
          val s = SortOrder.fromJson(u.path("sort-order"))
          m = m.copy(sortOrders =
            m.sortOrders.filterNot(_.orderId == s.orderId) :+ s)
        case "set-default-sort-order" =>
          m = m.copy(defaultSortOrderId = u.path("sort-order-id").asLong)
        case "set-properties" =>
          val ups = u.path("updates").fields.asScala
            .map(e => e.getKey -> e.getValue.asText).toMap
          val p = m.properties.getOrElse(Map.empty) ++ ups
          m = m.copy(properties = if (p.isEmpty) None else Some(p))
        case "remove-properties" =>
          val rem = u.path("removals").elements.asScala
            .map(_.asText).toSet
          val p = m.properties.getOrElse(Map.empty) -- rem
          m = m.copy(properties = if (p.isEmpty) None else Some(p))
        case "add-snapshot" =>
          val s = SnapshotV2.fromJson(u.path("snapshot"))
          // a server-side sanity rule real REST services enforce too:
          // sequence numbers are table-global — a snapshot built against
          // a stale base re-uses a claimed sequence and must conflict
          // (this also catches cross-branch races main-ref asserts miss)
          if (s.sequenceNumber <= m.lastSequenceNumber &&
              s.sequenceNumber != 0)
            throw new CommitConflict(
              s"snapshot sequence ${s.sequenceNumber} already assigned " +
                s"(last: ${m.lastSequenceNumber})")
          m = m.copy(
            snapshots = Some(m.snapshots.getOrElse(Seq.empty) :+ s),
            lastSequenceNumber =
              math.max(m.lastSequenceNumber, s.sequenceNumber))
        case "remove-snapshots" =>
          val gone = u.path("snapshot-ids").elements.asScala
            .map(_.asLong).toSet
          m = m.copy(
            snapshots = m.snapshots.map(_.filterNot(s =>
              gone.contains(s.snapshotId))),
            snapshotLog = m.snapshotLog.map(_.filterNot(l =>
              gone.contains(l.snapshotId))))
        case "set-snapshot-ref" =>
          val name = u.path("ref-name").asText
          val ref = SnapshotRef.fromJson(u)
          m = m.copy(refs =
            Some(m.refs.getOrElse(Map.empty) + (name -> ref)))
          if (name == "main") {
            // the log records WHEN main moved, not when the snapshot was
            // created — stamping server time keeps the snapshot-log
            // monotonic across rollbacks (a rollback re-targets an OLD
            // snapshot whose own timestamp precedes the log tail)
            m = m.copy(currentSnapshotId = Some(ref.snapshotId),
              snapshotLog = Some(m.snapshotLog.getOrElse(Seq.empty) :+
                SnapshotLog(ref.snapshotId, System.currentTimeMillis)))
          }
        case "remove-snapshot-ref" =>
          val name = u.path("ref-name").asText
          m = m.copy(refs = m.refs.map(_ - name))
        case "set-statistics" =>
          val r = StatisticsFileRef.fromJson(u.path("statistics"))
          m = m.copy(statistics = Some(m.statistics.getOrElse(Seq.empty)
            .filterNot(_.snapshotId == r.snapshotId) :+ r))
        case "remove-statistics" =>
          m = m.copy(statistics = m.statistics.map(_.filterNot(
            _.snapshotId == u.path("snapshot-id").asLong)))
        case "set-partition-statistics" =>
          val r = StatisticsFileRef.fromJson(u.path("partition-statistics"))
          m = m.copy(partitionStatistics =
            Some(m.partitionStatistics.getOrElse(Seq.empty)
              .filterNot(_.snapshotId == r.snapshotId) :+ r))
        case "remove-partition-statistics" =>
          m = m.copy(partitionStatistics = m.partitionStatistics.map(
            _.filterNot(_.snapshotId == u.path("snapshot-id").asLong)))
        case "upgrade-format-version" =>
          val v = u.path("format-version").asInt
          if (v < m.formatVersion) throw new IllegalArgumentException(
            s"cannot downgrade format version ${m.formatVersion} -> $v")
          m = m.copy(formatVersion = v)
        case "set-next-row-id" =>
          m = m.copy(nextRowId =
            Option(u.get("next-row-id")).map(_.asLong))
        case other => throw new IllegalArgumentException(
          s"unsupported table update action: $other")
      }
    }
    m
  }

  // ---------------------------------------------------- requirements ----

  /** The requirement set guarding a commit built against `base`:
    * identity (uuid) plus every ref the commit touches — a concurrent
    * move of any of them invalidates the update list. Snapshot-adding
    * commits always assert main (plus the server's global sequence
    * check, which catches cross-branch races).
    */
  def requirementsFor(base: TableMetadataV2, updates: Seq[ObjectNode])
      : Seq[ObjectNode] = {
    val reqs = Seq.newBuilder[ObjectNode]
    val uuid = Json.obj
    uuid.put("type", "assert-table-uuid") // spec discriminator is `type`
    uuid.put("uuid", base.tableUuid)
    reqs += uuid
    val touched = updates.flatMap(u => u.path("action").asText match {
      case "set-snapshot-ref" | "remove-snapshot-ref" =>
        Some(u.path("ref-name").asText)
      case "add-snapshot" => Some("main")
      case _ => None
    }).distinct
    touched.sorted.foreach { name =>
      val o = Json.obj
      o.put("type", "assert-ref-snapshot-id")
      o.put("ref", name)
      base.refs.getOrElse(Map.empty).get(name) match {
        case Some(r) => o.put("snapshot-id", r.snapshotId)
        case None => o.putNull("snapshot-id")
      }
      reqs += o
    }
    // Metadata-evolution commits need the spec's stronger asserts: two
    // concurrent schema (or spec / sort-order) evolutions both built
    // against the same base would otherwise BOTH pass the uuid+ref
    // checks, and applyUpdates' replace-by-id fold would let the second
    // silently overwrite the first — a lost update the file catalog's
    // CREATE_NEW version claim would have caught.
    val actions = updates.map(_.path("action").asText).toSet
    if (actions.contains("add-schema") ||
        actions.contains("set-current-schema")) {
      val a = Json.obj
      a.put("type", "assert-current-schema-id")
      a.put("current-schema-id", base.currentSchemaId)
      reqs += a
      val b = Json.obj
      b.put("type", "assert-last-assigned-field-id")
      b.put("last-assigned-field-id", base.lastColumnId)
      reqs += b
    }
    if (actions.contains("add-spec") ||
        actions.contains("set-default-spec")) {
      val a = Json.obj
      a.put("type", "assert-default-spec-id")
      a.put("default-spec-id", base.defaultSpecId)
      reqs += a
      val b = Json.obj
      b.put("type", "assert-last-assigned-partition-id")
      b.put("last-assigned-partition-id", base.lastPartitionId)
      reqs += b
    }
    if (actions.contains("add-sort-order") ||
        actions.contains("set-default-sort-order")) {
      val o = Json.obj
      o.put("type", "assert-default-sort-order-id")
      o.put("default-sort-order-id", base.defaultSortOrderId)
      reqs += o
    }
    reqs.result()
  }

  /** Validate requirements against the server's CURRENT metadata.
    * Returns the first violation message, or None when all hold.
    */
  def checkRequirements(cur: Option[TableMetadataV2],
      reqs: Seq[JsonNode]): Option[String] = {
    reqs.iterator.flatMap { r =>
      // the spec names the discriminator `type`; `action` tolerated
      val t = Option(r.get("type")).map(_.asText)
        .getOrElse(r.path("action").asText)
      t match {
        case "assert-create" =>
          if (cur.isDefined) Some("table already exists") else None
        case "assert-table-uuid" =>
          val want = r.path("uuid").asText
          cur match {
            case Some(m) if m.tableUuid != want =>
              Some(s"table uuid changed: ${m.tableUuid} != $want")
            case None => Some("table does not exist")
            case _ => None
          }
        case "assert-ref-snapshot-id" =>
          val ref = r.path("ref").asText
          val want = Option(r.get("snapshot-id")).filterNot(_.isNull)
            .map(_.asLong)
          val have = cur.flatMap(_.refs.getOrElse(Map.empty).get(ref))
            .map(_.snapshotId)
          if (have != want)
            Some(s"ref $ref moved: expected $want, found $have")
          else None
        case "assert-current-schema-id" =>
          val want = r.path("current-schema-id").asInt
          cur.map(_.currentSchemaId).filter(_ != want)
            .map(h => s"current schema id changed: expected $want, found $h")
        case "assert-last-assigned-field-id" =>
          val want = r.path("last-assigned-field-id").asInt
          cur.map(_.lastColumnId).filter(_ != want)
            .map(h =>
              s"last assigned field id changed: expected $want, found $h")
        case "assert-default-spec-id" =>
          val want = r.path("default-spec-id").asInt
          cur.map(_.defaultSpecId).filter(_ != want)
            .map(h => s"default spec id changed: expected $want, found $h")
        case "assert-last-assigned-partition-id" =>
          val want = r.path("last-assigned-partition-id").asInt
          cur.map(_.lastPartitionId).filter(_ != want)
            .map(h =>
              s"last assigned partition id changed: expected $want, found $h")
        case "assert-default-sort-order-id" =>
          val want = r.path("default-sort-order-id").asLong
          cur.map(_.defaultSortOrderId).filter(_ != want)
            .map(h =>
              s"default sort order id changed: expected $want, found $h")
        case other => Some(s"unsupported requirement: $other")
      }
    }.nextOption()
  }

  /** 409-surface for requirement/sequence conflicts. */
  class CommitConflict(msg: String) extends RuntimeException(msg)
}
