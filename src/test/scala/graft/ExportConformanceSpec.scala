package graft

import graft.table.{GraftTable, IcebergInterop}
import graft.model.TBucket
import org.apache.spark.sql.functions._

/** Byte-level conformance of the exported Iceberg layout against
  * constants transcribed from the PUBLIC format documents — the Apache
  * Iceberg Table Spec ("Manifests", "Manifest Lists", "Deletion
  * Vectors"), the Puffin file-format spec, and the RoaringFormatSpec
  * (portable 64-bit serialization).
  *
  * A true second-engine read is impossible in this container (no
  * pyiceberg, DuckDB's iceberg extension needs network — see
  * ExportGoldenSpec); this spec is the next-best evidence: the
  * VALIDATOR shares no helpers with graft's writers (plain Avro
  * library, plain Jackson, raw bytes — field ids, framing magics, CRCs
  * and roaring cookies are literal constants transcribed from the spec
  * documents), so a writer bug cannot self-certify. Mutation tests
  * prove the checks bite: perturbing a field id, the declared
  * format-version, or a single DV byte each fails validation.
  */
class ExportConformanceSpec extends SparkSpec {

  // ----- constants transcribed from the public Iceberg Table Spec -----
  // (Appendix C "Avro manifest fields" / manifest-list field ids)

  /** manifest_entry top-level field ids. */
  private val EntryIds = Map(
    "status" -> 0, "snapshot_id" -> 1, "data_file" -> 2,
    "sequence_number" -> 3, "file_sequence_number" -> 4)

  /** data_file struct field ids (v2 core + v3 DV/lineage fields). */
  private val DataFileIds = Map(
    "content" -> 134, "file_path" -> 100, "file_format" -> 101,
    "partition" -> 102, "record_count" -> 103,
    "file_size_in_bytes" -> 104, "column_sizes" -> 108,
    "value_counts" -> 109, "null_value_counts" -> 110,
    "nan_value_counts" -> 137, "lower_bounds" -> 125,
    "upper_bounds" -> 128, "key_metadata" -> 131,
    "split_offsets" -> 132, "equality_ids" -> 135,
    "sort_order_id" -> 140, "first_row_id" -> 142,
    "referenced_data_file" -> 143, "content_offset" -> 144,
    "content_size_in_bytes" -> 145)

  /** manifest_file (manifest list) field ids. */
  private val ListIds = Map(
    "manifest_path" -> 500, "manifest_length" -> 501,
    "partition_spec_id" -> 502, "added_snapshot_id" -> 503,
    "added_files_count" -> 504, "existing_files_count" -> 505,
    "deleted_files_count" -> 506, "partitions" -> 507,
    "added_rows_count" -> 512, "existing_rows_count" -> 513,
    "deleted_rows_count" -> 514, "sequence_number" -> 515,
    "min_sequence_number" -> 516, "content" -> 517,
    "key_metadata" -> 519)

  /** Fields a v2 reader REQUIRES (spec: required manifest columns). */
  private val RequiredEntryFields = Set("status", "snapshot_id", "data_file")
  private val RequiredDataFileFields = Set("content", "file_path",
    "file_format", "partition", "record_count", "file_size_in_bytes")
  private val RequiredListFields = Set("manifest_path", "manifest_length",
    "partition_spec_id", "content", "sequence_number",
    "min_sequence_number", "added_snapshot_id")

  /** Puffin spec: header/footer magic "PFA1". */
  private val PuffinMagic = Array[Byte](0x50, 0x46, 0x41, 0x31)

  /** Iceberg v3 deletion-vector-v1 blob magic (file byte order). */
  private val DvMagic = Array(0xd1, 0xd3, 0x39, 0x64).map(_.toByte)

  /** RoaringFormatSpec cookies (32-bit serialization, little-endian). */
  private val SerialCookieNoRun = 12346
  private val SerialCookie = 12347

  // ------------------------------------------------- the validator ----

  /** Walk an exported layout; return every conformance violation found
    * (empty = conformant). Parsing uses only the plain Avro library,
    * Jackson, and raw byte access.
    */
  private def validate(outDir: String): Seq[String] = {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    def err(s: String): Unit = errs += s

    // ---- metadata.json ----
    val metaPath = java.nio.file.Paths.get(outDir, "metadata")
    val metaJson = {
      val hint = metaPath.resolve("version-hint.text")
      val v = java.nio.file.Files.readString(hint).trim
      java.nio.file.Files.readString(
        metaPath.resolve(s"v$v.metadata.json"))
    }
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = m.readTree(metaJson)
    Seq("format-version", "table-uuid", "location", "last-sequence-number",
      "last-updated-ms", "last-column-id", "schemas", "current-schema-id",
      "partition-specs", "default-spec-id", "last-partition-id",
      "sort-orders", "default-sort-order-id")
      .foreach(k => if (!meta.has(k)) err(s"metadata.json missing $k"))
    val fv = meta.path("format-version").asInt
    if (fv != 2 && fv != 3) err(s"format-version $fv not in {2,3}")
    val snapIds = meta.path("snapshots").elements.asScala
      .map(_.path("snapshot-id").asLong).toSet
    errs ++= validateMetadataDoc(meta)

    // ---- manifest list ----
    val listPath = java.nio.file.Paths.get(meta.path("snapshots")
      .elements.asScala.toSeq.head.path("manifest-list").asText)
    def fieldId(f: org.apache.avro.Schema.Field): Option[Int] =
      Option(f.getObjectProp("field-id")).map(_.toString.toInt)
    def open(p: java.nio.file.Path) =
      new DataFileReader[GenericRecord](p.toFile,
        new GenericDatumReader[GenericRecord]())
    val lr = open(listPath)
    val (listFields, listRows) =
      try (lr.getSchema.getFields.asScala.toSeq,
        lr.iterator.asScala.toVector)
      finally lr.close()
    listFields.foreach { f =>
      ListIds.get(f.name) match {
        case Some(want) => if (!fieldId(f).contains(want))
          err(s"manifest-list field ${f.name}: field-id ${fieldId(f)} " +
            s"!= spec $want")
        case None => err(s"manifest-list field ${f.name} not in spec")
      }
    }
    RequiredListFields.diff(listFields.map(_.name).toSet)
      .foreach(n => err(s"manifest-list missing required field $n"))
    listRows.foreach { r =>
      val c = r.get("content").asInstanceOf[Int]
      if (c != 0 && c != 1) err(s"manifest-list content $c not in {0,1}")
      if (!snapIds.contains(r.get("added_snapshot_id").asInstanceOf[Long]))
        err("manifest-list added_snapshot_id not a table snapshot")
    }

    // ---- manifest-list partition summaries (field 507) ----
    // For every summarized manifest, recompute contains_null and the
    // per-field min/max from the manifest's OWN typed partition records
    // (read with plain Avro, decoded with plain ByteBuffers — nothing
    // shared with the writer) and require the declared bounds attained.
    def decodeSummaryBound(bb: java.nio.ByteBuffer, like: Any): Option[Any] = {
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      def le = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      like match {
        case _: java.lang.Integer => Some(le.getInt)
        case _: java.lang.Long => Some(le.getLong)
        case _: java.lang.Float => Some(le.getFloat)
        case _: java.lang.Double => Some(le.getDouble)
        case _: org.apache.avro.util.Utf8 | _: String =>
          Some(new String(bytes, "UTF-8"))
        case _ => None
      }
    }
    def cmpVals(a: Any, b: Any): Int = (a, b) match {
      case (x: java.lang.Integer, y: java.lang.Integer) => x.compareTo(y)
      case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
      case (x: java.lang.Float, y: java.lang.Float) => x.compareTo(y)
      case (x: java.lang.Double, y: java.lang.Double) => x.compareTo(y)
      case _ => a.toString.compareTo(b.toString)
    }
    listRows.foreach { r =>
      val parts = r.get("partitions")
      if (parts != null) {
        val summaries = parts.asInstanceOf[java.util.List[GenericRecord]]
          .asScala.toSeq
        val mp = r.get("manifest_path").toString
        val mr2 = open(java.nio.file.Paths.get(mp))
        val entries2 = try mr2.iterator.asScala.toVector finally mr2.close()
        val partRecords = entries2.map(_.get("data_file")
          .asInstanceOf[GenericRecord].get("partition")
          .asInstanceOf[GenericRecord])
        if (partRecords.isEmpty)
          err(s"summary present on empty manifest $mp")
        else {
          val pf = partRecords.head.getSchema.getFields.asScala.toSeq
          if (summaries.size != pf.size)
            err(s"summary has ${summaries.size} fields, spec has " +
              s"${pf.size} in $mp")
          else summaries.zip(pf).foreach { case (s, f) =>
            val vals = partRecords.map(_.get(f.name))
            val cn = s.get("contains_null").asInstanceOf[Boolean]
            if (cn != vals.contains(null))
              err(s"contains_null wrong for ${f.name} in $mp")
            val nonNull = vals.filter(_ != null)
            val lb = Option(s.get("lower_bound")
              .asInstanceOf[java.nio.ByteBuffer])
            val ub = Option(s.get("upper_bound")
              .asInstanceOf[java.nio.ByteBuffer])
            if (nonNull.isEmpty) {
              if (lb.nonEmpty || ub.nonEmpty)
                err(s"bounds on all-null field ${f.name} in $mp")
            } else (lb, ub) match {
              case (Some(l), Some(u)) =>
                (decodeSummaryBound(l, nonNull.head),
                  decodeSummaryBound(u, nonNull.head)) match {
                  case (Some(lo), Some(hi)) =>
                    val mn = nonNull.reduceLeft((a, b) =>
                      if (cmpVals(a, b) <= 0) a else b)
                    val mx = nonNull.reduceLeft((a, b) =>
                      if (cmpVals(a, b) >= 0) a else b)
                    if (cmpVals(lo, mn) != 0)
                      err(s"summary lower $lo != actual min $mn for " +
                        s"${f.name} in $mp")
                    if (cmpVals(hi, mx) != 0)
                      err(s"summary upper $hi != actual max $mx for " +
                        s"${f.name} in $mp")
                  case _ => // un-decodable type: no independent check
                }
              case _ =>
                err(s"missing bounds for non-null field ${f.name} in $mp")
            }
          }
        }
      }
    }

    // ---- manifests ----
    var sawDv = false
    listRows.map(_.get("manifest_path").toString).foreach { mp =>
      val r = open(java.nio.file.Paths.get(mp))
      val (schema, rows) =
        try (r.getSchema, r.iterator.asScala.toVector) finally r.close()
      val entryFields = schema.getFields.asScala.toSeq
      entryFields.foreach { f =>
        EntryIds.get(f.name) match {
          case Some(want) => if (!fieldId(f).contains(want))
            err(s"manifest field ${f.name}: ${fieldId(f)} != spec $want")
          case None => err(s"manifest field ${f.name} not in spec")
        }
      }
      RequiredEntryFields.diff(entryFields.map(_.name).toSet)
        .foreach(n => err(s"manifest missing required field $n"))
      def unwrap(s: org.apache.avro.Schema): org.apache.avro.Schema =
        if (s.getType == org.apache.avro.Schema.Type.UNION)
          s.getTypes.asScala.find(
            _.getType != org.apache.avro.Schema.Type.NULL).get
        else s
      val dfSchema = unwrap(schema.getField("data_file").schema())
      dfSchema.getFields.asScala.foreach { f =>
        DataFileIds.get(f.name) match {
          case Some(want) => if (!fieldId(f).contains(want))
            err(s"data_file field ${f.name}: ${fieldId(f)} != spec $want")
          case None if f.name == "partition" =>
          case None => err(s"data_file field ${f.name} not in spec")
        }
      }
      RequiredDataFileFields.diff(
          dfSchema.getFields.asScala.map(_.name).toSet)
        .foreach(n => err(s"data_file missing required field $n"))
      // partition struct: field ids must match the table's partition
      // spec (metadata partition-specs assign them, 1000+)
      val specFieldIds = meta.path("partition-specs").elements.asScala
        .flatMap(_.path("fields").elements.asScala)
        .map(f => f.path("name").asText -> f.path("field-id").asInt)
        .toMap
      val partSchema = unwrap(dfSchema.getField("partition").schema())
      partSchema.getFields.asScala.foreach { f =>
        specFieldIds.get(f.name) match {
          case Some(want) => if (!fieldId(f).contains(want))
            err(s"partition field ${f.name}: ${fieldId(f)} != spec $want")
          case None => err(s"partition field ${f.name} not in any spec")
        }
      }
      // table columns by field id, for bound decoding (primitives only)
      val colsById = meta.path("schemas").elements.asScala
        .flatMap(_.path("fields").elements.asScala)
        .filter(_.path("type").isTextual)
        .map(f => f.path("id").asInt ->
          (f.path("name").asText, f.path("type").asText))
        .toMap
      // entry rows
      rows.foreach { e =>
        val status = e.get("status").asInstanceOf[Int]
        if (status < 0 || status > 2) err(s"entry status $status")
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        if (df.get("file_format").toString != "PARQUET" &&
            df.get("file_format").toString != "PUFFIN")
          err(s"file_format ${df.get("file_format")}")
        val rdf = Option(df.get("referenced_data_file")).map(_.toString)
        if (rdf.isDefined) {
          sawDv = true
          val off = df.get("content_offset").asInstanceOf[Long]
          val len = df.get("content_size_in_bytes").asInstanceOf[Long]
          val card = df.get("record_count").asInstanceOf[Long]
          errs ++= validateDvBlob(df.get("file_path").toString, off, len,
            card)
        } else {
          errs ++= validateBounds(df, colsById)
        }
      }
    }
    // DVs (and lineage/defaults) are v3-only: metadata must declare 3
    if (sawDv && fv < 3)
      err(s"manifests carry deletion vectors but format-version is $fv")

    // ---- Puffin sidecars referenced by DV entries ----
    errs ++= validatePuffinFooters(outDir, snapIds)
    errs.toSeq
  }

  /** Validate the metadata.json DOCUMENT itself against the table-spec
    * "Table Metadata Fields" section — cross-references (current ids
    * must resolve), v3 requirements (`next-row-id`), id high-water
    * marks, snapshot/snapshot-log/metadata-log shapes, ref shapes, and
    * the JSON single-value rendering of v3 column defaults. Constants
    * and rules are transcribed from the public spec; parsing is plain
    * Jackson, sharing nothing with graft's metadata serializer.
    */
  private def validateMetadataDoc(
      meta: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    def err(s: String): Unit = errs += s
    val fv = meta.path("format-version").asInt

    // ---- v3-required keys (spec: next-row-id is required in v3) ----
    if (fv >= 3 && !meta.has("next-row-id"))
      err("v3 metadata missing required next-row-id")

    // ---- cross-references: current ids must resolve ----
    val schemaIds = meta.path("schemas").elements.asScala
      .map(_.path("schema-id").asInt).toSet
    if (!schemaIds.contains(meta.path("current-schema-id").asInt))
      err(s"current-schema-id ${meta.path("current-schema-id").asInt} " +
        "not among schemas")
    val specIds = meta.path("partition-specs").elements.asScala
      .map(_.path("spec-id").asInt).toSet
    if (!specIds.contains(meta.path("default-spec-id").asInt))
      err("default-spec-id not among partition-specs")
    val orderIds = meta.path("sort-orders").elements.asScala
      .map(_.path("order-id").asInt).toSet
    if (!orderIds.contains(meta.path("default-sort-order-id").asInt))
      err("default-sort-order-id not among sort-orders")

    // ---- id high-water marks ----
    // last-column-id >= every field id across every schema (recursive:
    // struct fields, list element-id, map key-id/value-id)
    def maxFieldId(n: com.fasterxml.jackson.databind.JsonNode): Int = {
      var mx = -1
      def walkType(t: com.fasterxml.jackson.databind.JsonNode): Unit =
        if (t.isObject) t.path("type").asText match {
          case "struct" => t.path("fields").elements.asScala.foreach(walkField)
          case "list" =>
            mx = math.max(mx, t.path("element-id").asInt)
            walkType(t.path("element"))
          case "map" =>
            mx = math.max(mx, math.max(t.path("key-id").asInt,
              t.path("value-id").asInt))
            walkType(t.path("key")); walkType(t.path("value"))
          case _ =>
        }
      def walkField(f: com.fasterxml.jackson.databind.JsonNode): Unit = {
        mx = math.max(mx, f.path("id").asInt)
        walkType(f.path("type"))
      }
      n.path("fields").elements.asScala.foreach(walkField)
      mx
    }
    val maxCol = meta.path("schemas").elements.asScala
      .map(maxFieldId).foldLeft(-1)(math.max)
    if (meta.path("last-column-id").asInt < maxCol)
      err(s"last-column-id ${meta.path("last-column-id").asInt} below " +
        s"max schema field id $maxCol")
    // partition field ids start at 1000; last-partition-id covers them
    val partFieldIds = meta.path("partition-specs").elements.asScala
      .flatMap(_.path("fields").elements.asScala)
      .map(_.path("field-id").asInt).toSeq
    partFieldIds.filter(_ < 1000)
      .foreach(id => err(s"partition field-id $id below spec floor 1000"))
    if (partFieldIds.nonEmpty &&
        meta.path("last-partition-id").asInt < partFieldIds.max)
      err("last-partition-id below max partition field-id")

    // ---- snapshots: required keys, sequence-number ceiling ----
    val lastSeq = meta.path("last-sequence-number").asLong
    val snapIds = meta.path("snapshots").elements.asScala
      .map(_.path("snapshot-id").asLong).toSet
    meta.path("snapshots").elements.asScala.foreach { s =>
      Seq("snapshot-id", "sequence-number", "timestamp-ms",
        "manifest-list", "summary")
        .foreach(k => if (!s.has(k))
          err(s"snapshot missing required $k"))
      if (!s.path("summary").has("operation"))
        err("snapshot summary missing operation")
      if (s.path("sequence-number").asLong > lastSeq)
        err(s"snapshot sequence-number ${s.path("sequence-number").asLong}" +
          s" above last-sequence-number $lastSeq")
    }
    if (meta.has("current-snapshot-id") &&
        !snapIds.contains(meta.path("current-snapshot-id").asLong))
      err("current-snapshot-id not among snapshots")

    // ---- snapshot-log / metadata-log shapes ----
    var prevTs = Long.MinValue
    meta.path("snapshot-log").elements.asScala.foreach { l =>
      if (!l.has("snapshot-id") || !l.has("timestamp-ms"))
        err("snapshot-log entry missing snapshot-id/timestamp-ms")
      else {
        if (!snapIds.contains(l.path("snapshot-id").asLong))
          err(s"snapshot-log references unknown snapshot " +
            s"${l.path("snapshot-id").asLong}")
        val ts = l.path("timestamp-ms").asLong
        if (ts < prevTs) err("snapshot-log timestamps not monotonic")
        prevTs = ts
      }
    }
    meta.path("metadata-log").elements.asScala.foreach { l =>
      if (!l.has("metadata-file") || !l.has("timestamp-ms"))
        err("metadata-log entry missing metadata-file/timestamp-ms")
    }

    // ---- refs: shape + main must track current-snapshot-id ----
    meta.path("refs").properties.asScala.foreach { e =>
      val (name, r) = (e.getKey, e.getValue)
      val t = r.path("type").asText
      if (t != "branch" && t != "tag") err(s"ref $name: bad type '$t'")
      if (!snapIds.contains(r.path("snapshot-id").asLong))
        err(s"ref $name references unknown snapshot")
      if (name == "main" && meta.has("current-snapshot-id") &&
          r.path("snapshot-id").asLong !=
            meta.path("current-snapshot-id").asLong)
        err("main ref does not match current-snapshot-id")
    }

    // ---- v3 column defaults: JSON single-value rendering ----
    // (spec Appendix D: int/long/float/double -> JSON number, boolean
    // -> JSON bool, string/date/time/timestamp/uuid/decimal/binary ->
    // JSON string; never an object or array)
    def checkDefaults(f: com.fasterxml.jackson.databind.JsonNode): Unit = {
      val tpe = f.path("type")
      Seq("initial-default", "write-default").foreach { k =>
        if (f.has(k)) {
          if (fv < 3) err(s"column default $k present under v$fv")
          val v = f.path(k)
          if (v.isObject || v.isArray)
            err(s"default $k of ${f.path("name").asText} is not a " +
              "single-value rendering")
          else if (tpe.isTextual) tpe.asText match {
            case "int" | "long" | "float" | "double" =>
              if (!v.isNumber)
                err(s"default $k of ${f.path("name").asText}: " +
                  s"${tpe.asText} default must be a JSON number")
            case "boolean" =>
              if (!v.isBoolean)
                err(s"default $k of ${f.path("name").asText}: " +
                  "boolean default must be a JSON boolean")
            case _ =>
              if (!v.isTextual)
                err(s"default $k of ${f.path("name").asText}: " +
                  s"${tpe.asText} default must be a JSON string")
          }
        }
      }
      if (tpe.isObject && tpe.path("type").asText == "struct")
        tpe.path("fields").elements.asScala.foreach(checkDefaults)
    }
    meta.path("schemas").elements.asScala
      .flatMap(_.path("fields").elements.asScala).foreach(checkDefaults)
    errs.toSeq
  }

  /** Validate a data entry's lower/upper bounds: decode the raw bytes
    * per the spec's single-value BINARY serialization (Appendix D —
    * long/double little-endian, string UTF-8; transcribed here, not
    * imported) and compare against the TRUE per-file min/max recomputed
    * by reading the referenced parquet with plain Spark — a third-party
    * reader, not graft's stats pipeline. Numeric bounds must be exact;
    * string bounds may be truncated, so lower ≤ min and upper ≥ max.
    */
  private def validateBounds(df: org.apache.avro.generic.GenericRecord,
      colsById: Map[Int, (String, String)]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val path = df.get("file_path").toString
    def boundMap(field: String): Map[Int, Array[Byte]] =
      Option(df.get(field)).toSeq.flatMap {
        _.asInstanceOf[java.util.List[_]].asScala.map { kv =>
          val r = kv.asInstanceOf[org.apache.avro.generic.GenericRecord]
          val bb = r.get("value").asInstanceOf[java.nio.ByteBuffer]
          val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
          r.get("key").asInstanceOf[Int] -> bytes
        }
      }.toMap
    val lows = boundMap("lower_bounds")
    val ups = boundMap("upper_bounds")
    if (lows.isEmpty) return Seq(s"$path: no lower bounds recorded")
    val actual = spark.read.parquet(path)
    (lows.keySet ++ ups.keySet).foreach { id =>
      colsById.get(id) match {
        case None => errs += s"$path: bound for unknown field id $id"
        case Some((name, tpe)) =>
          val row = actual.agg(min(col(name)), max(col(name))).head()
          def le(b: Array[Byte]) = java.nio.ByteBuffer.wrap(b)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          tpe match {
            case "long" =>
              lows.get(id).foreach { b =>
                if (le(b).getLong != row.getLong(0))
                  errs += s"$path.$name: lower ${le(b).getLong} != " +
                    s"true min ${row.getLong(0)}" }
              ups.get(id).foreach { b =>
                if (le(b).getLong != row.getLong(1))
                  errs += s"$path.$name: upper != true max" }
            case "double" =>
              lows.get(id).foreach { b =>
                if (le(b).getDouble != row.getDouble(0))
                  errs += s"$path.$name: lower != true min" }
              ups.get(id).foreach { b =>
                if (le(b).getDouble != row.getDouble(1))
                  errs += s"$path.$name: upper != true max" }
            case "int" =>
              lows.get(id).foreach { b =>
                if (le(b).getInt != row.getInt(0))
                  errs += s"$path.$name: lower != true min" }
              ups.get(id).foreach { b =>
                if (le(b).getInt != row.getInt(1))
                  errs += s"$path.$name: upper != true max" }
            case "string" =>
              lows.get(id).foreach { b =>
                if (new String(b, "UTF-8") > row.getString(0))
                  errs += s"$path.$name: lower above true min" }
              ups.get(id).foreach { b =>
                if (new String(b, "UTF-8") < row.getString(1))
                  errs += s"$path.$name: upper below true max" }
            case _ => // other types not present in the fixture table
          }
      }
    }
    errs.toSeq
  }

  /** Validate one deletion-vector-v1 blob at `path`@[off, off+len):
    * spec framing (length field, magic, CRC-32 big-endian) and an
    * INDEPENDENT portable-roaring cardinality count (headers only —
    * transcribed from RoaringFormatSpec, not graft's codec).
    */
  private def validateDvBlob(path: String, off: Long, len: Long,
      wantCardinality: Long): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path))
    val bytes =
      try {
        val buf = java.nio.ByteBuffer.allocate(len.toInt)
        ch.position(off)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        if (buf.hasRemaining) return Seq(s"short DV read $path@$off+$len")
        buf.array()
      } finally ch.close()
    // framing: u32 BE length of magic+vector | magic | vector | u32 BE crc
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    val stated = bb.getInt
    if (stated != bytes.length - 8)
      errs += s"DV length field $stated != ${bytes.length - 8}"
    if (!bytes.slice(4, 8).sameElements(DvMagic))
      errs += "DV magic mismatch"
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 4, bytes.length - 8)
    val statedCrc = java.nio.ByteBuffer
      .wrap(bytes, bytes.length - 4, 4).getInt
    if (statedCrc != crc.getValue.toInt) errs += "DV CRC-32 mismatch"
    // independent portable-roaring cardinality (RoaringFormatSpec)
    roaringCardinality(bytes, 8, bytes.length - 12) match {
      case Right(n) =>
        if (n != wantCardinality)
          errs += s"DV cardinality $n != record_count $wantCardinality"
      case Left(e) => errs += s"DV roaring parse: $e"
    }
    errs.toSeq
  }

  /** Count set bits of a portable-64 roaring bitmap by walking bucket
    * and container HEADERS (cookie 12346/12347, descriptive headers
    * carry cardinality-1) — an independent transcription of
    * RoaringFormatSpec, sharing nothing with graft's Roaring codec.
    */
  private def roaringCardinality(bytes: Array[Byte], off: Int,
      len: Int): Either[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes, off, len)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val buckets = bb.getLong
    if (buckets < 0 || buckets > 1000000) return Left(s"buckets $buckets")
    var total = 0L
    var b = 0L
    while (b < buckets) {
      bb.getInt // 32-bit high key
      val cookie = bb.getInt
      val (nContainers, runBitmap) =
        if ((cookie & 0xffff) == SerialCookie) {
          val n = (cookie >>> 16) + 1
          val rb = new Array[Byte]((n + 7) / 8)
          bb.get(rb)
          (n, Some(rb))
        } else if (cookie == SerialCookieNoRun) (bb.getInt, None)
        else return Left(f"bad cookie 0x$cookie%08x")
      val cards = new Array[Int](nContainers)
      var i = 0
      while (i < nContainers) {
        bb.getShort // container key
        cards(i) = (bb.getShort & 0xffff) + 1
        total += cards(i)
        i += 1
      }
      // offset header present when no-run cookie or >= 4 containers
      if (runBitmap.isEmpty || nContainers >= 4)
        (0 until nContainers).foreach(_ => bb.getInt)
      // skip container bodies to reach the next bucket
      i = 0
      while (i < nContainers) {
        val isRun = runBitmap.exists(rb =>
          (rb(i / 8) & (1 << (i % 8))) != 0)
        if (isRun) {
          val nRuns = bb.getShort & 0xffff
          bb.position(bb.position() + nRuns * 4)
        } else if (cards(i) <= 4096) {
          bb.position(bb.position() + cards(i) * 2)
        } else bb.position(bb.position() + 8192)
        i += 1
      }
      b += 1
    }
    Right(total)
  }

  /** Every Puffin sidecar under the SOURCE table's deletes dirs that a
    * DV entry references: header/tail magic, parseable footer, blob
    * types, and post-commit-stamped snapshot ids.
    */
  private def validatePuffinFooters(outDir: String,
      snapIds: Set[Long]): Seq[String] = {
    import scala.jdk.CollectionConverters._
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaPath = java.nio.file.Paths.get(outDir, "metadata")
    val hint = metaPath.resolve("version-hint.text")
    val meta = m.readTree(java.nio.file.Files.readString(metaPath.resolve(
      s"v${java.nio.file.Files.readString(hint).trim}.metadata.json")))
    val listPath = java.nio.file.Paths.get(meta.path("snapshots")
      .elements.asScala.toSeq.head.path("manifest-list").asText)
    def open(p: java.nio.file.Path) =
      new DataFileReader[GenericRecord](p.toFile,
        new GenericDatumReader[GenericRecord]())
    val lr = open(listPath)
    val manifestPaths =
      try lr.iterator.asScala.map(_.get("manifest_path").toString).toVector
      finally lr.close()
    val sidecars = manifestPaths.flatMap { mp =>
      val r = open(java.nio.file.Paths.get(mp))
      try r.iterator.asScala.flatMap { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        if (df.get("referenced_data_file") != null)
          Some(df.get("file_path").toString)
        else None
      }.toVector
      finally r.close()
    }.distinct
    sidecars.foreach { s =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s))
      if (!bytes.take(4).sameElements(PuffinMagic))
        errs += s"$s: missing Puffin header magic"
      if (!bytes.takeRight(4).sameElements(PuffinMagic))
        errs += s"$s: missing Puffin tail magic"
      val payloadSize = java.nio.ByteBuffer
        .wrap(bytes, bytes.length - 12, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
      val payloadStart = bytes.length - 12 - payloadSize
      if (!bytes.slice(payloadStart - 4, payloadStart)
          .sameElements(PuffinMagic))
        errs += s"$s: missing footer-start magic"
      else {
        val footer = m.readTree(new String(bytes, payloadStart,
          payloadSize, "UTF-8"))
        footer.path("blobs").elements.asScala.foreach { b =>
          if (b.path("type").asText != "deletion-vector-v1")
            errs += s"$s: unexpected blob type ${b.path("type").asText}"
          val sid = b.path("snapshot-id").asLong
          if (sid == -1L) errs += s"$s: footer snapshot-id not stamped"
          else if (!snapIds.contains(sid))
            errs += s"$s: footer snapshot-id $sid unknown to the table"
          if (!b.path("properties").has("referenced-data-file"))
            errs += s"$s: blob missing referenced-data-file property"
        }
      }
    }
    errs.toSeq
  }

  // --------------------------------------------------------- set-up ----

  private def buildTable(): GraftTable = {
    import spark.implicits._
    val df = (0L until 60L)
      .map(i => (i, s"n${i % 7}", i * 1.5)).toDF("id", "name", "score")
    val loc = java.nio.file.Files
      .createTempDirectory("conf-src").toString + "/t"
    val t = GraftTable.create(spark, loc, df.schema,
      partitionBy = Seq(("id", TBucket(2), "id_bucket")))
    t.append(df.coalesce(1), repartitionByPartition = true)
    t.deleteWhereDv(col("id") % 11L === 3L)
    t
  }

  private def export(t: GraftTable): String = {
    val out = java.nio.file.Files
      .createTempDirectory("conf-out").toString
    IcebergInterop.exportTable(t, out)
    out
  }

  // ---------------------------------------------------------- tests ----

  test("exported layout passes the full byte-level conformance walk") {
    val t = buildTable()
    val errs = validate(export(t))
    assert(errs.isEmpty, s"conformance violations:\n${errs.mkString("\n")}")
  }

  test("mutation: demoting format-version to 2 under DVs is caught") {
    val t = buildTable()
    val out = export(t)
    val p = java.nio.file.Paths.get(out, "metadata", "v1.metadata.json")
    java.nio.file.Files.writeString(p,
      java.nio.file.Files.readString(p)
        .replace("\"format-version\":3", "\"format-version\":2"))
    assert(validate(out).exists(_.contains("format-version")),
      "walker must reject v2 metadata over v3 manifests")
  }

  test("mutation: a perturbed manifest field id is caught") {
    val t = buildTable()
    val out = export(t)
    // find the avro manifest holding data entries and corrupt
    // file_path's field id 100 -> 999 inside the header schema JSON
    // (same byte length, so the container still parses)
    val metaDir = java.nio.file.Paths.get(out, "metadata")
    import scala.jdk.CollectionConverters._
    val manifests = java.nio.file.Files.list(metaDir).iterator.asScala
      .filter(_.getFileName.toString.matches("manifest-\\d+\\.avro"))
      .toSeq
    assert(manifests.nonEmpty)
    var mutated = false
    manifests.foreach { mp =>
      val bytes = java.nio.file.Files.readAllBytes(mp)
      val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val want = "\"field-id\":100"
      val idx = s.indexOf(want)
      if (idx >= 0 && !mutated) {
        mutated = true
        val corrupted = s.substring(0, idx) + "\"field-id\":999" +
          s.substring(idx + want.length)
        java.nio.file.Files.write(mp, corrupted.getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1))
      }
    }
    assert(mutated, "no manifest carried field-id 100 to perturb")
    assert(validate(out).exists(e =>
        e.contains("file_path") && e.contains("999")),
      "walker must flag the perturbed file_path field id")
  }

  test("mutation: a flipped DV byte is caught (magic and vector)") {
    // magic flip
    locally {
      val t = buildTable()
      val out = export(t)
      val sidecar = t.liveManifests(None).filter(_.content == 1)
        .flatMap(_.entries).find(_.dv.isDefined).get
      val p = java.nio.file.Paths.get(sidecar.path)
      val bytes = java.nio.file.Files.readAllBytes(p)
      val blobOff = sidecar.dv.get.off.toInt
      bytes(blobOff + 4) = (bytes(blobOff + 4) ^ 0x01).toByte // magic[0]
      java.nio.file.Files.write(p, bytes)
      assert(validate(out).exists(_.contains("DV magic")),
        "walker must reject a corrupted DV magic")
    }
    // vector byte flip -> CRC mismatch
    locally {
      val t = buildTable()
      val out = export(t)
      val sidecar = t.liveManifests(None).filter(_.content == 1)
        .flatMap(_.entries).find(_.dv.isDefined).get
      val p = java.nio.file.Paths.get(sidecar.path)
      val bytes = java.nio.file.Files.readAllBytes(p)
      val blobOff = sidecar.dv.get.off.toInt
      bytes(blobOff + 12) = (bytes(blobOff + 12) ^ 0x40).toByte
      java.nio.file.Files.write(p, bytes)
      assert(validate(out).exists(_.contains("CRC")),
        "walker must reject a DV failing its CRC")
    }
  }

  test("mutation: a corrupted column bound is caught") {
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter,
      GenericRecord}
    import scala.jdk.CollectionConverters._
    val t = buildTable()
    val out = export(t)
    val metaDir = java.nio.file.Paths.get(out, "metadata")
    val manifests = java.nio.file.Files.list(metaDir).iterator.asScala
      .filter(_.getFileName.toString.matches("manifest-\\d+\\.avro"))
      .toSeq
    // rewrite one manifest with a flipped byte inside a data entry's
    // id lower bound (plain Avro read/modify/write — same schema)
    var mutated = false
    manifests.foreach { mp =>
      if (!mutated) {
        val r = new DataFileReader[GenericRecord](mp.toFile,
          new GenericDatumReader[GenericRecord]())
        val (schema, recs) =
          try (r.getSchema, r.iterator.asScala.toVector) finally r.close()
        var hitHere = false
        val changed = recs.map { e =>
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          if (!hitHere && df.get("referenced_data_file") == null &&
              df.get("lower_bounds") != null) {
            val lb = df.get("lower_bounds")
              .asInstanceOf[java.util.List[GenericRecord]]
            if (!lb.isEmpty) {
              val kv = lb.get(0)
              val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
              val bytes = new Array[Byte](bb.remaining())
              bb.duplicate().get(bytes)
              bytes(0) = (bytes(0) ^ 0x7f).toByte
              kv.put("value", java.nio.ByteBuffer.wrap(bytes))
              hitHere = true
            }
          }
          e
        }
        if (hitHere) {
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          val tmp = mp.resolveSibling(mp.getFileName.toString + ".mut")
          w.create(schema, tmp.toFile)
          try changed.foreach(w.append) finally w.close()
          java.nio.file.Files.move(tmp, mp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          mutated = true
        }
      }
    }
    assert(mutated, "no data entry with bounds found to perturb")
    assert(validate(out).exists(e =>
        e.contains("lower") || e.contains("upper")),
      "walker must flag a bound that contradicts the file data")
  }

  test("mutation: a corrupted manifest-list partition-summary bound is caught") {
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter,
      GenericRecord}
    import scala.jdk.CollectionConverters._
    val t = buildTable()
    val out = export(t)
    val metaDir = java.nio.file.Paths.get(out, "metadata")
    val listPath = java.nio.file.Files.list(metaDir).iterator.asScala
      .find(_.getFileName.toString.matches("snap-\\d+\\.avro")).get
    val r = new DataFileReader[GenericRecord](listPath.toFile,
      new GenericDatumReader[GenericRecord]())
    val (schema, rows) =
      try (r.getSchema, r.iterator.asScala.toVector) finally r.close()
    var mutated = false
    rows.foreach { row =>
      val parts = row.get("partitions")
      if (!mutated && parts != null) {
        val ss = parts.asInstanceOf[java.util.List[GenericRecord]].asScala
        ss.find(_.get("lower_bound") != null).foreach { s =>
          val bb = s.get("lower_bound").asInstanceOf[java.nio.ByteBuffer]
          val bytes = new Array[Byte](bb.remaining())
          bb.duplicate().get(bytes)
          bytes(0) = (bytes(0) ^ 0x7f).toByte
          s.put("lower_bound", java.nio.ByteBuffer.wrap(bytes))
          mutated = true
        }
      }
    }
    assert(mutated, "no summarized manifest with bounds found to perturb")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    val tmp = listPath.resolveSibling(listPath.getFileName.toString + ".mut")
    w.create(schema, tmp.toFile)
    try rows.foreach(w.append) finally w.close()
    java.nio.file.Files.move(tmp, listPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(validate(out).exists(e => e.contains("summary lower")),
      "walker must flag a summary bound that contradicts the entries")
  }

  test("mutation: an unstamped (-1) sidecar footer snapshot-id is caught") {
    val t = buildTable()
    val out = export(t)
    val sidecar = t.liveManifests(None).filter(_.content == 1)
      .flatMap(_.entries).find(_.dv.isDefined).get
    val p = java.nio.file.Paths.get(sidecar.path)
    // un-stamp by rewriting the footer JSON in place: the snapshot id is
    // a positive long; replace it with same-length -0…01 (keeps sizes)
    val bytes = java.nio.file.Files.readAllBytes(p)
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val snapId = graft.table.Puffin.readFooter(p).head.snapshotId
    val want = s""""snapshot-id":$snapId"""
    val idx = s.indexOf(want)
    assert(idx >= 0, "footer snapshot-id not found")
    val repl = "\"snapshot-id\":" + ("-" + "1" * (snapId.toString.length - 1))
    java.nio.file.Files.write(p,
      (s.substring(0, idx) + repl + s.substring(idx + want.length))
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(validate(out).exists(_.contains("snapshot-id")),
      "walker must flag an unstamped/unknown footer snapshot id")
  }

  // ----- metadata.json document-layer checks (round 14) -----

  test("a v3 export with column defaults passes the metadata-doc walk") {
    import org.apache.spark.sql.types.IntegerType
    import scala.jdk.CollectionConverters._
    val t = buildTable()
    t.addColumn("bonus", IntegerType, Some("7"), Some("9"))
    val out = export(t)
    val errs = validate(out)
    assert(errs.isEmpty, s"violations:\n${errs.mkString("\n")}")
    // and the doc really is v3 with a stamped next-row-id + native
    // JSON-number defaults — read raw, not through graft's parser
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = m.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "metadata", "v1.metadata.json")))
    assert(doc.path("format-version").asInt == 3)
    assert(doc.has("next-row-id"))
    val bonus = doc.path("schemas").elements().asScala
      .flatMap(_.path("fields").elements().asScala)
      .find(_.path("name").asText == "bonus").get
    assert(bonus.path("initial-default").isNumber)
  }

  test("mutation: current-schema-id pointing at no schema is caught") {
    val t = buildTable()
    val out = export(t)
    val p = java.nio.file.Paths.get(out, "metadata", "v1.metadata.json")
    val s = java.nio.file.Files.readString(p)
    assert(s.matches("(?s).*\"current-schema-id\":\\d+.*"))
    java.nio.file.Files.writeString(p,
      s.replaceAll("\"current-schema-id\":\\d+",
        "\"current-schema-id\":424242"))
    assert(validate(out).exists(_.contains("current-schema-id")),
      "walker must reject a dangling current-schema-id")
  }

  test("mutation: dropping next-row-id from a v3 doc is caught") {
    val t = buildTable()
    val out = export(t)
    val p = java.nio.file.Paths.get(out, "metadata", "v1.metadata.json")
    val s = java.nio.file.Files.readString(p)
    assert(s.contains("\"next-row-id\""), "fixture must carry next-row-id")
    java.nio.file.Files.writeString(p,
      s.replaceAll(",\"next-row-id\":\\d+", ""))
    assert(validate(out).exists(_.contains("next-row-id")),
      "walker must reject v3 metadata without next-row-id")
  }

  test("mutation: a snapshot-log entry for an unknown snapshot is caught") {
    val t = buildTable()
    val out = export(t)
    val p = java.nio.file.Paths.get(out, "metadata", "v1.metadata.json")
    val s = java.nio.file.Files.readString(p)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val snapId = m.readTree(s).path("snapshot-log").elements().next()
      .path("snapshot-id").asLong
    // perturb ONLY the log entry (leave snapshots + refs intact):
    // the log object is {"snapshot-id":N,"timestamp-ms":M}
    val want = s"""{"snapshot-id":$snapId,"timestamp-ms""""
    assert(s.contains(want), "snapshot-log entry not found")
    java.nio.file.Files.writeString(p,
      s.replace(want, s"""{"snapshot-id":${snapId + 1},"timestamp-ms""""))
    assert(validate(out).exists(_.contains("snapshot-log")),
      "walker must reject a snapshot-log entry naming an unknown snapshot")
  }

  test("mutation: a string-rendered numeric default is caught") {
    import org.apache.spark.sql.types.IntegerType
    val t = buildTable()
    t.addColumn("bonus", IntegerType, Some("7"), None)
    val out = export(t)
    val p = java.nio.file.Paths.get(out, "metadata", "v1.metadata.json")
    val s = java.nio.file.Files.readString(p)
    assert(s.contains("\"initial-default\":7"), "numeric default not found")
    java.nio.file.Files.writeString(p,
      s.replace("\"initial-default\":7", "\"initial-default\":\"7\""))
    assert(validate(out).exists(_.contains("JSON number")),
      "walker must reject a string-rendered int default")
  }
}
