package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import scala.jdk.CollectionConverters._

/** Iceberg table-metadata model (spec §"Table Metadata"), mirroring the
  * reference's surface — /root/reference/src/model/schema.rs:16,152,193
  * (PrimitiveType/Struct/SchemaV2), partition.rs:18,118,133
  * (Transform/PartitionField/PartitionSpec), snapshot.rs:18,46,70,82
  * (Operation/SnapshotV2/Reference/Retention), sort.rs:36,52
  * (SortField/SortOrder), table.rs:19 (TableMetadataV2) — re-expressed as
  * Scala case classes with hand-rolled Jackson-node serde emitting the
  * spec's kebab-case JSON.
  */
object Json {
  val mapper = new ObjectMapper()
  def obj: ObjectNode = mapper.createObjectNode()
  def arr: ArrayNode = mapper.createArrayNode()
  def parse(s: String): JsonNode = mapper.readTree(s)
  def write(n: JsonNode): String = mapper.writeValueAsString(n)
}

// ---------------------------------------------------------------- types ----

/** Schema types: primitives + struct/list/map (schema.rs:16,163,219,230).
  * Serializable: nested-evolution read alignment ships (fileType,
  * readType) pairs to executors inside the connector's reader factory.
  */
sealed trait IceType extends Serializable {
  def toJson: JsonNode
}

sealed abstract class IcePrimitive(val render: String) extends IceType {
  def toJson: JsonNode = Json.mapper.getNodeFactory.textNode(render)
}
case object TBoolean extends IcePrimitive("boolean")
case object TInt extends IcePrimitive("int")
case object TLong extends IcePrimitive("long")
case object TFloat extends IcePrimitive("float")
case object TDouble extends IcePrimitive("double")
case object TDate extends IcePrimitive("date")
case object TTime extends IcePrimitive("time")
case object TTimestamp extends IcePrimitive("timestamp")
case object TTimestamptz extends IcePrimitive("timestamptz")
case object TString extends IcePrimitive("string")
case object TUuid extends IcePrimitive("uuid")
case object TBinary extends IcePrimitive("binary")
case class TDecimal(precision: Int, scale: Int)
    extends IcePrimitive(s"decimal($precision,$scale)")
case class TFixed(length: Long) extends IcePrimitive(s"fixed[$length]")

case class TStruct(fields: Seq[StructField]) extends IceType {
  def toJson: JsonNode = {
    val o = Json.obj
    o.put("type", "struct")
    val fs = o.putArray("fields")
    fields.foreach(f => fs.add(f.toJson))
    o
  }
}

case class TList(elementId: Int, elementRequired: Boolean, element: IceType)
    extends IceType {
  def toJson: JsonNode = {
    val o = Json.obj
    o.put("type", "list")
    o.put("element-id", elementId)
    o.put("element-required", elementRequired)
    o.set[ObjectNode]("element", element.toJson)
    o
  }
}

case class TMap(keyId: Int, key: IceType, valueId: Int,
    valueRequired: Boolean, value: IceType) extends IceType {
  def toJson: JsonNode = {
    val o = Json.obj
    o.put("type", "map")
    o.put("key-id", keyId)
    o.set[ObjectNode]("key", key.toJson)
    o.put("value-id", valueId)
    o.put("value-required", valueRequired)
    o.set[ObjectNode]("value", value.toJson)
    o
  }
}

object IceType {
  private val DecimalRe = """^decimal\((\d+),\s*(\d+)\)$""".r
  private val FixedRe = """^fixed\[(\d+)\]$""".r

  def parsePrimitive(s: String): IcePrimitive = s match {
    case "boolean" => TBoolean
    case "int" => TInt
    case "long" => TLong
    case "float" => TFloat
    case "double" => TDouble
    case "date" => TDate
    case "time" => TTime
    case "timestamp" => TTimestamp
    // the reference serializes Timestampz as "timestampz"; the spec says
    // "timestamptz" — accept both, emit the spec form.
    case "timestamptz" | "timestampz" => TTimestamptz
    case "string" => TString
    case "uuid" => TUuid
    case "binary" => TBinary
    case DecimalRe(p, sc) => TDecimal(p.toInt, sc.toInt)
    case FixedRe(l) => TFixed(l.toLong)
    case other => throw new IllegalArgumentException(s"bad primitive: $other")
  }

  def fromJson(n: JsonNode): IceType =
    if (n.isTextual) parsePrimitive(n.asText)
    else n.path("type").asText match {
      case "struct" =>
        TStruct(n.path("fields").elements.asScala.toSeq.map(StructField.fromJson))
      case "list" =>
        TList(n.path("element-id").asInt, n.path("element-required").asBoolean,
          fromJson(n.path("element")))
      case "map" =>
        TMap(n.path("key-id").asInt, fromJson(n.path("key")),
          n.path("value-id").asInt, n.path("value-required").asBoolean,
          fromJson(n.path("value")))
      case other => throw new IllegalArgumentException(s"bad type: $other")
    }
}

/** A named, id'd struct field (schema.rs:176 StructField). */
case class StructField(id: Int, name: String, required: Boolean,
    fieldType: IceType, doc: Option[String] = None,
    // Iceberg v3 column defaults, in the spec's JSON single-value
    // string rendering: `initial-default` backfills rows written
    // BEFORE the column existed (reads of old files project it instead
    // of null); `write-default` applies to new rows omitting the column
    initialDefault: Option[String] = None,
    writeDefault: Option[String] = None) {
  def toJson: JsonNode = {
    val o = Json.obj
    o.put("id", id)
    o.put("name", name)
    o.put("required", required)
    o.set[ObjectNode]("type", fieldType.toJson)
    doc.foreach(o.put("doc", _))
    initialDefault.foreach(putDefault(o, "initial-default", _))
    writeDefault.foreach(putDefault(o, "write-default", _))
    o
  }

  /** Spec "JSON single-value serialization": numeric and boolean defaults
    * are native JSON values (int default 5 is the JSON number 5, not the
    * string "5"); decimal, date/time/timestamp, string, uuid and binary
    * keep the spec's string rendering. Emitting everything as strings
    * made exported v3 metadata unparseable by spec-compliant readers.
    */
  private def putDefault(o: ObjectNode, key: String, v: String): Unit =
    fieldType match {
      case TInt => o.put(key, v.toInt)
      case TLong => o.put(key, v.toLong)
      case TFloat => o.put(key, v.toFloat)
      case TDouble => o.put(key, v.toDouble)
      case TBoolean => o.put(key, v.toBoolean)
      case _ => o.put(key, v)
    }
}

object StructField {
  def fromJson(n: JsonNode): StructField = {
    // the reference's fixtures use "field_type"; the spec uses "type"
    val t = if (n.has("type")) n.path("type") else n.path("field_type")
    StructField(
      n.path("id").asInt, n.path("name").asText,
      n.path("required").asBoolean, IceType.fromJson(t),
      Option(n.get("doc")).map(_.asText),
      Option(n.get("initial-default")).map(_.asText),
      Option(n.get("write-default")).map(_.asText))
  }
}

/** Table schema: id + identifier fields + optional name-mapping + struct
  * fields (schema.rs:193 SchemaV2, 245 NameMapping).
  */
case class SchemaV2(schemaId: Int, identifierFieldIds: Option[Seq[Int]],
    nameMapping: Option[NameMappings], fields: Seq[StructField]) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("schema-id", schemaId)
    identifierFieldIds.foreach { ids =>
      val a = o.putArray("identifier-field-ids"); ids.foreach(a.add)
    }
    nameMapping.foreach(nm => o.set[ObjectNode]("name-mapping", nm.toJson))
    o.put("type", "struct")
    val fs = o.putArray("fields")
    fields.foreach(f => fs.add(f.toJson))
    o
  }
  /** Field lookup by name. A plain name resolves at the top level; a
    * DOTTED path ("a.b.c") descends through structs (and transparently
    * through list elements) — nested fields are first-class schema
    * fields (schema.rs:170-243 models the full tree).
    */
  def fieldByName(n: String): Option[StructField] = {
    val top = fields.find(_.name == n)
    if (top.isDefined || !n.contains('.')) top
    else SchemaV2.resolvePath(fields, n.split('.').toList)
  }

  /** Field lookup by id, top-level OR nested — ids are unique across the
    * whole tree, so any id addresses exactly one field.
    */
  def fieldById(id: Int): Option[StructField] = {
    def walkType(t: IceType): Option[StructField] = t match {
      case TStruct(nfs) => walk(nfs)
      case TList(_, _, el) => walkType(el)
      case TMap(_, k, _, _, v) => walkType(k).orElse(walkType(v))
      case _ => None
    }
    def walk(fs: Seq[StructField]): Option[StructField] =
      fs.find(_.id == id)
        .orElse(fs.view.flatMap(f => walkType(f.fieldType)).headOption)
    walk(fields)
  }
}

object SchemaV2 {
  /** Resolve a dotted path against struct fields; descends through
    * structs and list-of-struct elements.
    */
  private[model] def resolvePath(fs: Seq[StructField],
      parts: List[String]): Option[StructField] = parts match {
    case Nil => None
    case p :: Nil => fs.find(_.name == p)
    case p :: rest => fs.find(_.name == p).flatMap(_.fieldType match {
      case TStruct(nfs) => resolvePath(nfs, rest)
      case TList(_, _, TStruct(nfs)) => resolvePath(nfs, rest)
      case _ => None
    })
  }

  def fromJson(n: JsonNode): SchemaV2 = SchemaV2(
    n.path("schema-id").asInt,
    Option(n.get("identifier-field-ids"))
      .map(_.elements.asScala.toSeq.map(_.asInt)),
    Option(n.get("name-mapping")).filter(!_.isNull).map(NameMappings.fromJson),
    n.path("fields").elements.asScala.toSeq.map(StructField.fromJson))
}

case class NameMappings(default: Seq[NameMapping]) {
  def toJson: ObjectNode = {
    val o = Json.obj
    val a = o.putArray("default")
    default.foreach(m => a.add(m.toJson))
    o
  }
  /** name → field-id over all mapped names. */
  def toFieldIds: Map[String, Int] =
    default.flatMap(m => m.fieldId.toSeq.flatMap(id => m.names.map(_ -> id))).toMap
}

object NameMappings {
  def fromJson(n: JsonNode): NameMappings =
    NameMappings(n.path("default").elements.asScala.toSeq.map(NameMapping.fromJson))
}

/** Fallback field-id mapping for files written without ids (schema.rs:245). */
case class NameMapping(fieldId: Option[Int], names: Seq[String],
    fields: Option[Seq[NameMapping]] = None) {
  def toJson: ObjectNode = {
    val o = Json.obj
    fieldId.foreach(o.put("field-id", _))
    val a = o.putArray("names")
    names.foreach(a.add)
    fields.foreach { fs =>
      val fa = o.putArray("fields"); fs.foreach(f => fa.add(f.toJson))
    }
    o
  }
}

object NameMapping {
  def fromJson(n: JsonNode): NameMapping = NameMapping(
    Option(n.get("field-id")).map(_.asInt),
    n.path("names").elements.asScala.toSeq.map(_.asText),
    Option(n.get("fields")).map(_.elements.asScala.toSeq.map(fromJson)))
}

// ----------------------------------------------------------- transforms ----

/** Partition transform (partition.rs:18), with the spec's string forms. */
// Serializable: transforms travel inside PartitionSpec to executors
// (manifest-shard writing closes over the spec)
sealed abstract class Transform(val render: String) extends Serializable
case object TIdentity extends Transform("identity")
case object TVoid extends Transform("void")
case object TYear extends Transform("year")
case object TMonth extends Transform("month")
case object TDay extends Transform("day")
case object THour extends Transform("hour")
case class TBucket(n: Int) extends Transform(s"bucket[$n]")
case class TTruncate(w: Int) extends Transform(s"truncate[$w]")

object Transform {
  private val BucketRe = """^bucket\[(\d+)\]$""".r
  private val TruncateRe = """^truncate\[(\d+)\]$""".r
  def parse(s: String): Transform = s match {
    case "identity" => TIdentity
    case "void" => TVoid
    case "year" => TYear
    case "month" => TMonth
    case "day" => TDay
    case "hour" => THour
    case BucketRe(n) => TBucket(n.toInt)
    case TruncateRe(w) => TTruncate(w.toInt)
    case other => throw new IllegalArgumentException(s"bad transform: $other")
  }
}

/** partition.rs:118 PartitionField. */
case class PartitionField(sourceId: Int, fieldId: Int, name: String,
    transform: Transform) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("source-id", sourceId)
    o.put("field-id", fieldId)
    o.put("name", name)
    o.put("transform", transform.render)
    o
  }
}

object PartitionField {
  def fromJson(n: JsonNode): PartitionField = PartitionField(
    n.path("source-id").asInt, n.path("field-id").asInt,
    n.path("name").asText, Transform.parse(n.path("transform").asText))
}

/** partition.rs:133 PartitionSpec. */
case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("spec-id", specId)
    val a = o.putArray("fields")
    fields.foreach(f => a.add(f.toJson))
    o
  }
}

object PartitionSpec {
  val unpartitioned: PartitionSpec = PartitionSpec(0, Seq.empty)
  def fromJson(n: JsonNode): PartitionSpec = PartitionSpec(
    n.path("spec-id").asInt,
    n.path("fields").elements.asScala.toSeq.map(PartitionField.fromJson))
}

// ----------------------------------------------------------------- sort ----

sealed abstract class SortDirection(val render: String)
case object SortAsc extends SortDirection("asc")
case object SortDesc extends SortDirection("desc")

sealed abstract class NullOrder(val render: String)
case object NullsFirst extends NullOrder("nulls-first")
case object NullsLast extends NullOrder("nulls-last")

/** sort.rs:36 SortField. */
case class SortField(sourceId: Int, transform: Transform,
    direction: SortDirection, nullOrder: NullOrder) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("source-id", sourceId)
    o.put("transform", transform.render)
    o.put("direction", direction.render)
    o.put("null-order", nullOrder.render)
    o
  }
}

object SortField {
  def fromJson(n: JsonNode): SortField = SortField(
    n.path("source-id").asInt,
    Transform.parse(n.path("transform").asText),
    n.path("direction").asText match {
      case "asc" => SortAsc; case "desc" => SortDesc
      case o => throw new IllegalArgumentException(s"bad direction: $o")
    },
    n.path("null-order").asText match {
      case "nulls-first" => NullsFirst; case "nulls-last" => NullsLast
      case o => throw new IllegalArgumentException(s"bad null-order: $o")
    })
}

/** sort.rs:52 SortOrder; order_id 0 = unsorted. */
case class SortOrder(orderId: Int, fields: Seq[SortField]) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("order-id", orderId)
    val a = o.putArray("fields")
    fields.foreach(f => a.add(f.toJson))
    o
  }
}

object SortOrder {
  val unsorted: SortOrder = SortOrder(0, Seq.empty)
  def fromJson(n: JsonNode): SortOrder = SortOrder(
    n.path("order-id").asInt,
    n.path("fields").elements.asScala.toSeq.map(SortField.fromJson))
}

// ------------------------------------------------------------- snapshot ----

/** snapshot.rs:18 Operation (append/replace/overwrite/delete). */
object Operation {
  val values = Set("append", "replace", "overwrite", "delete")
  def validate(op: String): String = {
    require(values(op), s"bad operation: $op"); op
  }
}

/** snapshot.rs:33 Summary: operation + free-form string map. */
case class Summary(operation: Option[String],
    other: Map[String, String] = Map.empty) {
  operation.foreach(Operation.validate)
  def toJson: ObjectNode = {
    val o = Json.obj
    operation.foreach(o.put("operation", _))
    other.toSeq.sortBy(_._1).foreach { case (k, v) => o.put(k, v) }
    o
  }
}

object Summary {
  def fromJson(n: JsonNode): Summary = {
    val op = Option(n.get("operation")).map(_.asText)
    val other = n.properties.asScala
      .filter(_.getKey != "operation")
      .map(e => e.getKey -> e.getValue.asText).toMap
    Summary(op, other)
  }
}

/** snapshot.rs:46 SnapshotV2. */
case class SnapshotV2(snapshotId: Long, parentSnapshotId: Option[Long],
    sequenceNumber: Long, timestampMs: Long, manifestList: String,
    summary: Summary, schemaId: Option[Long],
    // Iceberg v3 row lineage: the first row id this snapshot assigned
    // (present only on commits that minted fresh ids)
    firstRowId: Option[Long] = None) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("snapshot-id", snapshotId)
    parentSnapshotId.foreach(o.put("parent-snapshot-id", _))
    o.put("sequence-number", sequenceNumber)
    o.put("timestamp-ms", timestampMs)
    o.put("manifest-list", manifestList)
    o.set[ObjectNode]("summary", summary.toJson)
    schemaId.foreach(o.put("schema-id", _))
    firstRowId.foreach(o.put("first-row-id", _))
    o
  }
}

object SnapshotV2 {
  def fromJson(n: JsonNode): SnapshotV2 = SnapshotV2(
    n.path("snapshot-id").asLong,
    Option(n.get("parent-snapshot-id")).map(_.asLong),
    n.path("sequence-number").asLong,
    n.path("timestamp-ms").asLong,
    n.path("manifest-list").asText,
    Summary.fromJson(n.path("summary")),
    Option(n.get("schema-id")).map(_.asLong),
    Option(n.get("first-row-id")).map(_.asLong))
}

/** snapshot.rs:82 Retention: branch (with snapshot retention knobs) or tag. */
sealed trait Retention {
  def writeInto(o: ObjectNode): Unit
}
case class BranchRetention(minSnapshotsToKeep: Int, maxSnapshotAgeMs: Long,
    maxRefAgeMs: Long) extends Retention {
  def writeInto(o: ObjectNode): Unit = {
    o.put("type", "branch")
    o.put("min-snapshots-to-keep", minSnapshotsToKeep)
    o.put("max-snapshot-age-ms", maxSnapshotAgeMs)
    o.put("max-ref-age-ms", maxRefAgeMs)
  }
}
case class TagRetention(maxRefAgeMs: Long) extends Retention {
  def writeInto(o: ObjectNode): Unit = {
    o.put("type", "tag")
    o.put("max-ref-age-ms", maxRefAgeMs)
  }
}

/** snapshot.rs:70 Reference — a branch/tag ref to a snapshot. */
case class SnapshotRef(snapshotId: Long, retention: Retention) {
  def isBranch: Boolean = retention.isInstanceOf[BranchRetention]
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("snapshot-id", snapshotId)
    retention.writeInto(o)
    o
  }
}

object SnapshotRef {
  def fromJson(n: JsonNode): SnapshotRef = {
    val ret = n.path("type").asText match {
      case "branch" => BranchRetention(
        n.path("min-snapshots-to-keep").asInt,
        n.path("max-snapshot-age-ms").asLong,
        n.path("max-ref-age-ms").asLong)
      case "tag" => TagRetention(n.path("max-ref-age-ms").asLong)
      case o => throw new IllegalArgumentException(s"bad ref type: $o")
    }
    SnapshotRef(n.path("snapshot-id").asLong, ret)
  }
}

case class SnapshotLog(snapshotId: Long, timestampMs: Long) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("snapshot-id", snapshotId)
    o.put("timestamp-ms", timestampMs)
    o
  }
}
object SnapshotLog {
  def fromJson(n: JsonNode): SnapshotLog =
    SnapshotLog(n.path("snapshot-id").asLong, n.path("timestamp-ms").asLong)
}

case class MetadataLog(metadataFile: String, timestampMs: Long) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("metadata-file", metadataFile)
    o.put("timestamp-ms", timestampMs)
    o
  }
}
object MetadataLog {
  def fromJson(n: JsonNode): MetadataLog =
    MetadataLog(n.path("metadata-file").asText, n.path("timestamp-ms").asLong)
}

/** One table-statistics file (Iceberg spec §"Table Statistics": the
  * `statistics` metadata list references puffin-style sidecar files,
  * keyed by the snapshot they were computed at). The file itself holds
  * per-column NDV sketches + rollups; metadata carries only the pointer.
  */
case class StatisticsFileRef(snapshotId: Long, path: String,
    fileSizeBytes: Long, fileFooterSizeBytes: Option[Long] = None,
    blobMetadata: Option[Seq[BlobMetaRef]] = None) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("snapshot-id", snapshotId)
    o.put("statistics-path", path)
    o.put("file-size-in-bytes", fileSizeBytes)
    fileFooterSizeBytes.foreach(o.put("file-footer-size-in-bytes", _))
    blobMetadata.foreach { bs =>
      val a = o.putArray("blob-metadata"); bs.foreach(b => a.add(b.toJson))
    }
    o
  }
}
object StatisticsFileRef {
  def fromJson(n: JsonNode): StatisticsFileRef = StatisticsFileRef(
    n.path("snapshot-id").asLong, n.path("statistics-path").asText,
    n.path("file-size-in-bytes").asLong,
    Option(n.get("file-footer-size-in-bytes")).map(_.asLong),
    Option(n.get("blob-metadata")).map(_.elements.asScala.toSeq
      .map(BlobMetaRef.fromJson)))
}

/** Spec blob-metadata entry inside a `statistics` file reference. */
case class BlobMetaRef(blobType: String, snapshotId: Long,
    sequenceNumber: Long, fields: Seq[Int],
    properties: Map[String, String]) {
  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("type", blobType)
    o.put("snapshot-id", snapshotId)
    o.put("sequence-number", sequenceNumber)
    val a = o.putArray("fields"); fields.foreach(a.add)
    if (properties.nonEmpty) {
      val p = o.putObject("properties")
      properties.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
    }
    o
  }
}
object BlobMetaRef {
  def fromJson(n: JsonNode): BlobMetaRef = BlobMetaRef(
    n.path("type").asText,
    n.path("snapshot-id").asLong,
    n.path("sequence-number").asLong,
    Option(n.get("fields")).map(_.elements.asScala.toSeq.map(_.asInt))
      .getOrElse(Seq.empty),
    Option(n.get("properties")).map(p => p.fields.asScala
      .map(e => e.getKey -> e.getValue.asText).toMap)
      .getOrElse(Map.empty))
}

// ------------------------------------------------------- table metadata ----

/** table.rs:19 TableMetadataV2 — the root metadata document. */
case class TableMetadataV2(
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    schemas: Seq[SchemaV2],
    currentSchemaId: Int,
    partitionSpecs: Seq[PartitionSpec],
    defaultSpecId: Int,
    lastPartitionId: Int,
    properties: Option[Map[String, String]] = None,
    currentSnapshotId: Option[Long] = None,
    snapshots: Option[Seq[SnapshotV2]] = None,
    snapshotLog: Option[Seq[SnapshotLog]] = None,
    metadataLog: Option[Seq[MetadataLog]] = None,
    sortOrders: Seq[SortOrder] = Seq(SortOrder.unsorted),
    defaultSortOrderId: Long = 0L,
    refs: Option[Map[String, SnapshotRef]] = None,
    statistics: Option[Seq[StatisticsFileRef]] = None,
    // spec `partition-statistics` list: per-partition rollup files
    // (same {snapshot-id, statistics-path, file-size-in-bytes} shape)
    partitionStatistics: Option[Seq[StatisticsFileRef]] = None,
    // row-lineage high-water mark (Iceberg v3 `next-row-id`): the first
    // row id the NEXT append may assign; present only on tables with
    // row lineage enabled
    nextRowId: Option[Long] = None,
    // sticky format floor: bumped to 3 the first time a v3-only feature
    // lands that is NOT visible from the metadata JSON itself (deletion
    // vectors live in manifests); format versions never decrease, so the
    // parsed value is carried forward on every rewrite
    formatVersion: Int = 2) {

  // validate the UUID eagerly, as the reference does via the Uuid type
  java.util.UUID.fromString(tableUuid)

  def currentSchema: SchemaV2 =
    schemas.find(_.schemaId == currentSchemaId)
      .getOrElse(throw new IllegalStateException("no current schema"))
  def defaultSpec: PartitionSpec =
    partitionSpecs.find(_.specId == defaultSpecId)
      .getOrElse(PartitionSpec.unpartitioned)
  def schemaById(id: Int): Option[SchemaV2] = schemas.find(_.schemaId == id)
  def snapshotById(id: Long): Option[SnapshotV2] =
    snapshots.getOrElse(Seq.empty).find(_.snapshotId == id)
  def currentSnapshot: Option[SnapshotV2] =
    currentSnapshotId.flatMap(snapshotById)

  /** True when any schema field (recursively) carries a v3 column
    * default — defaults require format-version 3.
    */
  private def anyDefaults: Boolean = {
    def walkType(t: IceType): Boolean = t match {
      case TStruct(nfs) => walk(nfs)
      case TList(_, _, el) => walkType(el)
      case TMap(_, k, _, _, v) => walkType(k) || walkType(v)
      case _ => false
    }
    def walk(fs: Seq[StructField]): Boolean = fs.exists(f =>
      f.initialDefault.isDefined || f.writeDefault.isDefined ||
        walkType(f.fieldType))
    schemas.exists(s => walk(s.fields))
  }

  /** The format version this metadata MUST declare: 3 when any v3-only
    * feature is present (row lineage, column defaults, or the sticky
    * DV floor), else 2 so plain v2 readers keep working. Declaring 2
    * while manifests carry v3 fields is a spec-invalid layout external
    * readers reject.
    */
  def effectiveFormatVersion: Int =
    if (formatVersion >= 3 || nextRowId.isDefined || anyDefaults) 3 else 2

  def toJson: ObjectNode = {
    val o = Json.obj
    o.put("format-version", effectiveFormatVersion)
    o.put("table-uuid", tableUuid)
    o.put("location", location)
    o.put("last-sequence-number", lastSequenceNumber)
    o.put("last-updated-ms", lastUpdatedMs)
    o.put("last-column-id", lastColumnId)
    val sa = o.putArray("schemas"); schemas.foreach(s => sa.add(s.toJson))
    o.put("current-schema-id", currentSchemaId)
    val pa = o.putArray("partition-specs")
    partitionSpecs.foreach(p => pa.add(p.toJson))
    o.put("default-spec-id", defaultSpecId)
    o.put("last-partition-id", lastPartitionId)
    properties.foreach { p =>
      val po = o.putObject("properties")
      p.toSeq.sortBy(_._1).foreach { case (k, v) => po.put(k, v) }
    }
    currentSnapshotId.foreach(o.put("current-snapshot-id", _))
    snapshots.foreach { ss =>
      val a = o.putArray("snapshots"); ss.foreach(s => a.add(s.toJson))
    }
    snapshotLog.foreach { ls =>
      val a = o.putArray("snapshot-log"); ls.foreach(l => a.add(l.toJson))
    }
    metadataLog.foreach { ls =>
      val a = o.putArray("metadata-log"); ls.foreach(l => a.add(l.toJson))
    }
    val soa = o.putArray("sort-orders")
    sortOrders.foreach(s => soa.add(s.toJson))
    o.put("default-sort-order-id", defaultSortOrderId)
    refs.foreach { r =>
      val ro = o.putObject("refs")
      r.toSeq.sortBy(_._1).foreach { case (k, v) => ro.set[ObjectNode](k, v.toJson) }
    }
    statistics.foreach { ss =>
      val a = o.putArray("statistics"); ss.foreach(s => a.add(s.toJson))
    }
    partitionStatistics.foreach { ss =>
      val a = o.putArray("partition-statistics")
      ss.foreach(s => a.add(s.toJson))
    }
    nextRowId.foreach(o.put("next-row-id", _))
    o
  }

  def toJsonString: String = Json.write(toJson)
}

object TableMetadataV2 {
  def fromJsonString(s: String): TableMetadataV2 = fromJson(Json.parse(s))

  def fromJson(n: JsonNode): TableMetadataV2 = {
    require(Set(2, 3).contains(n.path("format-version").asInt),
      s"unsupported format-version: ${n.path("format-version")}")
    TableMetadataV2(
      tableUuid = n.path("table-uuid").asText,
      location = n.path("location").asText,
      lastSequenceNumber = n.path("last-sequence-number").asLong,
      lastUpdatedMs = n.path("last-updated-ms").asLong,
      lastColumnId = n.path("last-column-id").asInt,
      schemas = n.path("schemas").elements.asScala.toSeq.map(SchemaV2.fromJson),
      currentSchemaId = n.path("current-schema-id").asInt,
      partitionSpecs = n.path("partition-specs").elements.asScala.toSeq
        .map(PartitionSpec.fromJson),
      defaultSpecId = n.path("default-spec-id").asInt,
      lastPartitionId = n.path("last-partition-id").asInt,
      properties = Option(n.get("properties")).map(p =>
        p.properties.asScala.map(e => e.getKey -> e.getValue.asText).toMap),
      currentSnapshotId = Option(n.get("current-snapshot-id")).map(_.asLong),
      snapshots = Option(n.get("snapshots"))
        .map(_.elements.asScala.toSeq.map(SnapshotV2.fromJson)),
      snapshotLog = Option(n.get("snapshot-log"))
        .map(_.elements.asScala.toSeq.map(SnapshotLog.fromJson)),
      metadataLog = Option(n.get("metadata-log"))
        .map(_.elements.asScala.toSeq.map(MetadataLog.fromJson)),
      sortOrders = n.path("sort-orders").elements.asScala.toSeq
        .map(SortOrder.fromJson),
      defaultSortOrderId = n.path("default-sort-order-id").asLong,
      refs = Option(n.get("refs")).map(r =>
        r.properties.asScala.map(e =>
          e.getKey -> SnapshotRef.fromJson(e.getValue)).toMap),
      statistics = Option(n.get("statistics"))
        .map(_.elements.asScala.toSeq.map(StatisticsFileRef.fromJson)),
      partitionStatistics = Option(n.get("partition-statistics"))
        .map(_.elements.asScala.toSeq.map(StatisticsFileRef.fromJson)),
      nextRowId = Option(n.get("next-row-id")).map(_.asLong),
      // the declared version is a floor that never decreases — a table
      // once written as v3 stays v3 even if its lineage/default markers
      // are later absent from this particular JSON
      formatVersion = math.max(2, n.path("format-version").asInt))
  }
}
