package graft.table

import graft.model._
import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.types.{DoubleType, FloatType, TimestampNTZType}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Path
import scala.jdk.CollectionConverters._

/** Iceberg-spec Avro manifest interop: the v2 `manifest_entry` /
  * `manifest_file` record shapes with the spec's published field names
  * AND field-ids (the same metadata surface the reference models at
  * /root/reference/src/model/snapshot.rs). Graft's native manifests are
  * JSONL — chosen for the Spark-JSON distributed planning path — so this
  * module EXPORTS a snapshot as spec-shaped Avro for external Iceberg
  * tooling, and reads those files back (validated by a golden-fixture
  * roundtrip spec; no external Iceberg reader installs in this
  * container).
  *
  * Bounds use the spec's single-value binary serialization: int/date
  * 4-byte little-endian, long/timestamp-micros 8-byte LE, float/double
  * LE IEEE bits, string UTF-8 bytes, boolean one byte, decimal
  * minimal-length big-endian unscaled.
  */
object AvroManifest {

  // ------------------------------------------------------------ schemas ----

  /** Avro field-type name + value converters for one partition field.
    * `enc` maps graft's normalized string partition value to the typed
    * Avro value; `dec` inverts it.
    */
  private case class PartCodec(avroType: String,
      enc: String => Any, dec: Any => String)

  private def partCodec(pf: PartitionField, schema: SchemaV2): PartCodec =
    pf.transform match {
      case TBucket(_) | TYear | TMonth | TDay | THour =>
        PartCodec("int", _.toInt, _.toString)
      case TVoid => PartCodec("string", identity, _.toString)
      case TIdentity | TTruncate(_) =>
        schema.fieldById(pf.sourceId).map(_.fieldType) match {
          case Some(TInt) => PartCodec("int", _.toInt, _.toString)
          // `time` surfaces as micros-since-midnight longs (spec physical
          // form) — the manifest partition field must be Avro long, not
          // the string fallback external readers fail schema resolution on
          case Some(TLong) | Some(TTime) =>
            PartCodec("long", _.toLong, _.toString)
          case Some(TDate) => PartCodec("int",
            s => java.time.LocalDate.parse(s).toEpochDay.toInt,
            v => java.time.LocalDate.ofEpochDay(
              v.asInstanceOf[Int].toLong).toString)
          case _ => PartCodec("string", identity, _.toString)
        }
    }

  private def partitionSchemaJson(spec: PartitionSpec,
      schema: SchemaV2): String = {
    val fields = spec.fields.map { pf =>
      val c = partCodec(pf, schema)
      s"""{"name":"${pf.name}","type":["null","${c.avroType}"],""" +
        s""""default":null,"field-id":${pf.fieldId}}"""
    }
    s"""{"type":"record","name":"r102","fields":[${fields.mkString(",")}]}"""
  }

  /** Spec v2 manifest_entry schema for one (spec, table-schema) pair —
    * field names and field-ids are the published constants.
    */
  private[graft] def entrySchema(spec: PartitionSpec,
      schema: SchemaV2): ASchema = {
    // spec field-ids: null_value_counts 110 (key 121/value 122),
    // lower_bounds 125 (126/127), upper_bounds 128 (129/130)
    val json = s"""{
      "type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int","field-id":0},
        {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
        {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
        {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
        {"name":"data_file","field-id":2,"type":{
          "type":"record","name":"r2","fields":[
            {"name":"content","type":"int","field-id":134},
            {"name":"file_path","type":"string","field-id":100},
            {"name":"file_format","type":"string","field-id":101},
            {"name":"partition","field-id":102,
             "type":${partitionSchemaJson(spec, schema)}},
            {"name":"record_count","type":"long","field-id":103},
            {"name":"file_size_in_bytes","type":"long","field-id":104},
            {"name":"null_value_counts","field-id":110,"type":["null",
              {"type":"array","logicalType":"map","items":
                {"type":"record","name":"k121_v122","fields":[
                  {"name":"key","type":"int","field-id":121},
                  {"name":"value","type":"long","field-id":122}]}}],
             "default":null},
            {"name":"lower_bounds","field-id":125,"type":["null",
              {"type":"array","logicalType":"map","items":
                {"type":"record","name":"k126_v127","fields":[
                  {"name":"key","type":"int","field-id":126},
                  {"name":"value","type":"bytes","field-id":127}]}}],
             "default":null},
            {"name":"upper_bounds","field-id":128,"type":["null",
              {"type":"array","logicalType":"map","items":
                {"type":"record","name":"k129_v130","fields":[
                  {"name":"key","type":"int","field-id":129},
                  {"name":"value","type":"bytes","field-id":130}]}}],
             "default":null},
            {"name":"equality_ids","field-id":135,"type":["null",
              {"type":"array","items":"int","element-id":136}],
             "default":null},
            {"name":"first_row_id","type":["null","long"],
             "default":null,"field-id":142},
            {"name":"referenced_data_file","type":["null","string"],
             "default":null,"field-id":143},
            {"name":"content_offset","type":["null","long"],
             "default":null,"field-id":144},
            {"name":"content_size_in_bytes","type":["null","long"],
             "default":null,"field-id":145}
          ]}}
      ]}"""
    new ASchema.Parser().parse(json)
  }

  /** Spec v2 manifest_file schema (manifest-list rows). */
  private[graft] val listSchema: ASchema = new ASchema.Parser().parse(s"""{
    "type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"partitions","type":["null",{"type":"array","items":{
        "type":"record","name":"r508","fields":[
          {"name":"contains_null","type":"boolean","field-id":509},
          {"name":"contains_nan","type":["null","boolean"],
            "default":null,"field-id":518},
          {"name":"lower_bound","type":["null","bytes"],
            "default":null,"field-id":510},
          {"name":"upper_bound","type":["null","bytes"],
            "default":null,"field-id":511}
        ]},"element-id":508}],"default":null,"field-id":507}
    ]}""")

  // ----------------------------------------------- single-value encoding ----

  /** Dotted stat path → (field-id, type) over the schema's struct tree. */
  private[table] def statFields(schema: SchemaV2): Map[String, (Int, IceType)] = {
    def walk(prefix: String, fields: Seq[StructField]): Seq[(String, (Int, IceType))] =
      fields.flatMap { f =>
        val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.fieldType match {
          case TStruct(fs) => walk(p, fs)
          case t => Seq(p -> (f.id, t))
        }
      }
    walk("", schema.fields).toMap
  }

  /** Normalized stat string → spec single-value bytes (None = type not
    * representable; the stat is skipped, never mis-encoded).
    */
  private[table] def encodeBound(v: String, t: IceType): Option[Array[Byte]] = {
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    try t match {
      case TInt => Some(le(4).putInt(v.toInt).array)
      // time = micros-since-midnight stored as an 8-byte little-endian
      // long, exactly the spec's single-value serialization for `time`
      case TLong | TTime => Some(le(8).putLong(v.toLong).array)
      case TFloat => Some(le(4).putFloat(v.toFloat).array)
      case TDouble => Some(le(8).putDouble(v.toDouble).array)
      case TDate => Some(le(4).putInt(
        java.time.LocalDate.parse(v).toEpochDay.toInt).array)
      case TTimestamp | TTimestamptz =>
        Some(le(8).putLong(Pruning.tsMicros(v)).array)
      case TString => Some(v.getBytes("UTF-8"))
      case TBoolean => Some(Array[Byte](if (v.toBoolean) 1 else 0))
      case TDecimal(_, s) => Some(new java.math.BigDecimal(v)
        .setScale(s).unscaledValue.toByteArray)
      case _ => None
    } catch { case _: RuntimeException => None }
  }

  /** Inverse of [[encodeBound]] back to graft's normalized string form
    * (via Pruning.normalize so both sides share one rendering).
    */
  private[table] def decodeBound(bytes: Array[Byte], t: IceType): Option[String] = {
    def le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    t match {
      case TInt => Some(le.getInt.toString)
      case TLong | TTime => Some(le.getLong.toString)
      case TFloat => Pruning.normalize(le.getFloat, FloatType)
      case TDouble => Pruning.normalize(le.getDouble, DoubleType)
      case TDate => Some(java.time.LocalDate.ofEpochDay(le.getInt.toLong).toString)
      case TTimestamp | TTimestamptz =>
        Pruning.normalize(le.getLong, TimestampNTZType)
      case TString => Some(new String(bytes, "UTF-8"))
      case TBoolean => Some((bytes.headOption.exists(_ != 0)).toString)
      case TDecimal(_, s) => Some(new java.math.BigDecimal(
        new java.math.BigInteger(bytes), s).toPlainString)
      case _ => None
    }
  }

  // -------------------------------------------------------------- write ----

  private def mapArray(schema: ASchema,
      kvs: Seq[(Int, Any)]): GenericData.Array[GenericRecord] = {
    val itemSchema = schema.getElementType
    val arr = new GenericData.Array[GenericRecord](kvs.size, schema)
    kvs.sortBy(_._1).foreach { case (k, v) =>
      val r = new GenericData.Record(itemSchema)
      r.put("key", k)
      r.put("value", v)
      arr.add(r)
    }
    arr
  }

  private def nonNull(s: ASchema): ASchema =
    s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get

  /** Write `entries` as one spec-shaped Avro manifest. `status` is 1
    * (ADDED) for entries added by `snapshotId`, 0 (EXISTING) otherwise.
    * Returns the file length in bytes (the manifest list records it).
    */
  def writeManifest(path: Path, entries: Seq[DataFileEntry],
      schema: SchemaV2, spec: PartitionSpec, snapshotId: Long,
      content: Int): Long = {
    val aschema = entrySchema(spec, schema)
    val dfSchema = aschema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    val stats = statFields(schema)
    val codecs = spec.fields.map(pf => pf.name -> partCodec(pf, schema)).toMap
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](aschema))
    writer.setMeta("schema", Json.write(schema.toJson))
    // Spec: the 'partition-spec' key holds the JSON *fields* list; the id
    // travels separately in 'partition-spec-id' (pyiceberg parses it so).
    writer.setMeta("partition-spec", Json.write(spec.toJson.path("fields")))
    writer.setMeta("partition-spec-id", spec.specId.toString)
    writer.setMeta("format-version",
      if (entries.exists(e => e.dv.isDefined || e.firstRowId.isDefined)) "3"
      else "2")
    writer.setMeta("content", if (content == 0) "data" else "deletes")
    writer.create(aschema, path.toFile)
    try entries.foreach { e =>
      val part = new GenericData.Record(partSchema)
      spec.fields.foreach { pf =>
        part.put(pf.name,
          e.partition.get(pf.name).flatten.map(codecs(pf.name).enc).orNull)
      }
      val lower = e.stats.toSeq.flatMap { case (name, cs) =>
        for { (id, t) <- stats.get(name); v <- cs.min
              b <- encodeBound(v, t) } yield id -> ByteBuffer.wrap(b)
      }
      val upper = e.stats.toSeq.flatMap { case (name, cs) =>
        for { (id, t) <- stats.get(name); v <- cs.max
              b <- encodeBound(v, t) } yield id -> ByteBuffer.wrap(b)
      }
      val nulls = e.stats.toSeq.flatMap { case (name, cs) =>
        stats.get(name).map { case (id, _) => id -> (cs.nulls: Any) }
      }
      val df = new GenericData.Record(dfSchema)
      df.put("content", e.content)
      df.put("file_path", e.path)
      // a DV entry's path names a Puffin sidecar, not a data file;
      // data entries export their actual format (adopted tables may
      // reference orc files alongside graft-written parquet)
      df.put("file_format",
        if (e.dv.isDefined) "PUFFIN"
        else e.format.toUpperCase(java.util.Locale.ROOT))
      // v3 fields: row-lineage base ids and deletion-vector blob ranges.
      // referenced_data_file exports in the DECODED on-disk form — the
      // same form data-file `file_path`s use, so external readers
      // correlate them directly (internally DvRef holds the raw
      // `_metadata.file_path` URI form; readManifest re-encodes).
      e.firstRowId.foreach(v => df.put("first_row_id", v))
      e.dv.foreach { d =>
        df.put("referenced_data_file", GraftTable.decodePath(d.dataFile))
        df.put("content_offset", d.off)
        df.put("content_size_in_bytes", d.len)
      }
      df.put("partition", part)
      df.put("record_count", e.recordCount)
      df.put("file_size_in_bytes", e.fileSize)
      df.put("null_value_counts",
        mapArray(nonNull(dfSchema.getField("null_value_counts").schema()), nulls))
      df.put("lower_bounds",
        mapArray(nonNull(dfSchema.getField("lower_bounds").schema()),
          lower.map { case (k, v) => k -> (v: Any) }))
      df.put("upper_bounds",
        mapArray(nonNull(dfSchema.getField("upper_bounds").schema()),
          upper.map { case (k, v) => k -> (v: Any) }))
      if (e.eqColumns.nonEmpty) {
        val ids = e.eqColumns.flatMap(c => stats.get(c).map(_._1))
        df.put("equality_ids", ids.map(Integer.valueOf).asJava)
      }
      val rec = new GenericData.Record(aschema)
      rec.put("status", if (e.snapshotId == snapshotId) 1 else 0)
      rec.put("snapshot_id", e.snapshotId)
      rec.put("sequence_number", e.sequenceNumber)
      rec.put("file_sequence_number", e.sequenceNumber)
      rec.put("data_file", df)
      writer.append(rec)
    } finally writer.close()
    java.nio.file.Files.size(path)
  }

  /** Read a spec-shaped Avro manifest back to graft entries. The entry
    * schema id comes from the file's `schema` metadata.
    */
  def readManifest(path: Path): Seq[DataFileEntry] = {
    val reader = new DataFileReader[GenericRecord](path.toFile,
      new GenericDatumReader[GenericRecord]())
    try {
      val schema = SchemaV2.fromJson(Json.parse(
        new String(reader.getMeta("schema"), "UTF-8")))
      val specNode = Json.parse(
        new String(reader.getMeta("partition-spec"), "UTF-8"))
      val specId = Option(reader.getMetaString("partition-spec-id"))
        .map(_.toInt).getOrElse(0)
      // Spec form is the bare fields array; pre-fix exports carried the
      // whole {"spec-id":..,"fields":[..]} object — accept both.
      val spec =
        if (specNode.isArray)
          PartitionSpec(specId,
            specNode.elements.asScala.toSeq.map(PartitionField.fromJson))
        else PartitionSpec.fromJson(specNode)
      val stats = statFields(schema)
      val byId = stats.map { case (p, (id, t)) => id -> (p, t) }
      val codecs = spec.fields.map(pf => pf.name -> partCodec(pf, schema)).toMap
      def str(v: Any): String = v match {
        case u: Utf8 => u.toString
        case s: String => s
        case other => String.valueOf(other)
      }
      def asMap(v: Any): Seq[(Int, Any)] = v match {
        case null => Seq.empty
        case l: java.util.List[_] => l.asScala.toSeq.map { r =>
          val rec = r.asInstanceOf[GenericRecord]
          rec.get("key").asInstanceOf[Int] -> rec.get("value")
        }
        case _ => Seq.empty
      }
      def bytesOf(v: Any): Array[Byte] = {
        val bb = v.asInstanceOf[ByteBuffer].duplicate()
        val a = new Array[Byte](bb.remaining()); bb.get(a); a
      }
      reader.iterator.asScala.map { rec =>
        val df = rec.get("data_file").asInstanceOf[GenericRecord]
        val part = df.get("partition").asInstanceOf[GenericRecord]
        val partVals = spec.fields.map { pf =>
          pf.name -> Option(part.get(pf.name)).map(codecs(pf.name).dec)
        }.toMap
        val lower = asMap(df.get("lower_bounds")).flatMap { case (id, v) =>
          byId.get(id).flatMap { case (p, t) =>
            decodeBound(bytesOf(v), t).map(p -> _) } }.toMap
        val upper = asMap(df.get("upper_bounds")).flatMap { case (id, v) =>
          byId.get(id).flatMap { case (p, t) =>
            decodeBound(bytesOf(v), t).map(p -> _) } }.toMap
        val nulls = asMap(df.get("null_value_counts")).flatMap { case (id, v) =>
          byId.get(id).map { case (p, _) => p -> v.asInstanceOf[Long] } }.toMap
        val colStats = (lower.keySet ++ upper.keySet ++ nulls.keySet).map { p =>
          p -> ColStats(lower.get(p), upper.get(p), nulls.getOrElse(p, 0L))
        }.toMap
        val eqIds = df.get("equality_ids") match {
          case null => Seq.empty[String]
          case l: java.util.List[_] => l.asScala.toSeq
            .flatMap(id => byId.get(id.asInstanceOf[Int]).map(_._1))
          case _ => Seq.empty[String]
        }
        // v3 optionals absent from pre-v3 files read back as null
        val dv = Option(df.get("referenced_data_file")).map(rdf =>
          Dv.DvRef(GraftTable.encodePath(str(rdf)),
            df.get("content_offset").asInstanceOf[Long],
            df.get("content_size_in_bytes").asInstanceOf[Long]))
        val firstRowId =
          Option(df.get("first_row_id")).map(_.asInstanceOf[Long])
        DataFileEntry(
          str(df.get("file_path")),
          df.get("record_count").asInstanceOf[Long],
          rec.get("snapshot_id").asInstanceOf[Long],
          rec.get("sequence_number").asInstanceOf[Long],
          schema.schemaId,
          partVals,
          colStats,
          df.get("content").asInstanceOf[Int],
          df.get("file_size_in_bytes").asInstanceOf[Long],
          eqIds,
          specId = Some(specId),
          dv = dv,
          firstRowId = firstRowId,
          // spec file_format: PARQUET/ORC/AVRO (PUFFIN marks DV
          // sidecars, whose `format` is irrelevant — keep parquet)
          format = str(df.get("file_format"))
            .toLowerCase(java.util.Locale.ROOT) match {
            case "puffin" => DataFileEntry.Parquet
            case f => f
          })
      }.toSeq
    } finally reader.close()
  }

  /** One manifest-list row per exported manifest. Field 515
    * (`sequence_number`, the sequence the manifest was added at) and 516
    * (`min_sequence_number`, its oldest entry) are distinct — a manifest
    * carrying older entries after a rewrite was still ADDED later.
    */
  case class ListEntry(path: Path, length: Long, content: Int,
      addedSequenceNumber: Long, minSequenceNumber: Long,
      addedSnapshotId: Long, fileCount: Long, rowCount: Long,
      specId: Option[Int] = None,
      partitions: Option[Seq[FieldSummary]] = None)

  /** Spec manifest-list `field_summary` (fields 509/518/510/511): one
    * per partition field of the manifest's spec, in spec-field order.
    * Bounds use the transform RESULT type's single-value encoding and
    * are OMITTED (spec-legal nulls) whenever a value fails to
    * parse/encode — never mis-encoded.
    */
  case class FieldSummary(containsNull: Boolean,
      lower: Option[Array[Byte]], upper: Option[Array[Byte]])

  /** Compute field 507 for one exported manifest's entries.
    *
    * None — omit the field entirely, which spec readers treat as "no
    * information, keep the manifest" — whenever a FAITHFUL summary is
    * impossible: unpartitioned spec, entries that don't carry the
    * spec's tuple (delete sidecars record no partition values), or a
    * field whose present values can't be encoded. This matters for
    * correctness on the READER side: null bounds mean "no non-null
    * values" to Iceberg's manifest evaluator, so a lazy
    * contains_null+null-bounds summary would let a spec-compliant
    * reader wrongly PRUNE the manifest.
    */
  private[table] def partitionSummaries(es: Seq[DataFileEntry],
      spec: PartitionSpec, schema: SchemaV2): Option[Seq[FieldSummary]] = {
    if (spec.fields.isEmpty || es.isEmpty) return None
    if (!es.forall(e => spec.fields.forall(pf =>
        e.partition.contains(pf.name)))) return None
    val out: Seq[Option[FieldSummary]] = spec.fields.map { pf =>
      val raw = es.map(_.partition(pf.name))
      val containsNull = raw.exists(_.isEmpty)
      val present = raw.flatten
      if (present.isEmpty)
        // truly all-null for this field (e.g. void transform) — the
        // spec-exact rendering IS null bounds
        Some(FieldSummary(containsNull, None, None))
      else {
        val resultType: Option[IceType] = pf.transform match {
          case TIdentity | TTruncate(_) =>
            schema.fieldById(pf.sourceId).map(_.fieldType)
          case TYear | TMonth | TDay | THour | TBucket(_) => Some(TInt)
          case _ => None
        }
        resultType.flatMap { t =>
          try {
            val sdt = GraftTable.toSparkType(t)
            // partition strings may carry Spark's rendering — normalize
            // to the manifest encoding before comparing/encoding (same
            // as the identity-partition pruning path)
            val norm = present.map(v =>
              Pruning.normalize(v, sdt).getOrElse(v))
            // the spec forbids NaN in bounds (readers' comparisons
            // against NaN are vacuously false → wrong pruning) — a NaN
            // partition value poisons the summary instead
            val hasNaN = (t == TFloat || t == TDouble) &&
              norm.exists(v => v.toDouble.isNaN)
            if (hasNaN) None
            else {
              val lo = norm.reduceLeft((a, b) =>
                if (Pruning.compare(a, b, sdt) <= 0) a else b)
              val hi = norm.reduceLeft((a, b) =>
                if (Pruning.compare(a, b, sdt) >= 0) a else b)
              for (lb <- encodeBound(lo, t); ub <- encodeBound(hi, t))
                yield FieldSummary(containsNull, Some(lb), Some(ub))
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        }
      }
    }
    // one unencodable field poisons the whole summary — a partial
    // rendering would read as "no non-null values" for that field
    if (out.exists(_.isEmpty)) None else Some(out.flatten)
  }

  def writeManifestList(path: Path, manifests: Seq[ListEntry],
      specId: Int): Unit = {
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](listSchema))
    writer.setMeta("format-version", "2")
    writer.create(listSchema, path.toFile)
    val partsSchema = listSchema.getField("partitions").schema
      .getTypes.get(1) // the non-null union branch (array)
    val summarySchema = partsSchema.getElementType
    try manifests.foreach { m =>
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", m.path.toString)
      r.put("manifest_length", m.length)
      r.put("partition_spec_id", m.specId.getOrElse(specId))
      r.put("content", if (m.content == 0) 0 else 1)
      r.put("sequence_number", m.addedSequenceNumber)
      r.put("min_sequence_number", m.minSequenceNumber)
      r.put("added_snapshot_id", m.addedSnapshotId)
      r.put("added_files_count", m.fileCount.toInt)
      r.put("existing_files_count", 0)
      r.put("deleted_files_count", 0)
      r.put("added_rows_count", m.rowCount)
      r.put("existing_rows_count", 0L)
      r.put("deleted_rows_count", 0L)
      m.partitions.foreach { fs =>
        val arr = new GenericData.Array[GenericRecord](fs.size, partsSchema)
        fs.foreach { f =>
          val fr = new GenericData.Record(summarySchema)
          fr.put("contains_null", f.containsNull)
          fr.put("contains_nan", null)
          f.lower.foreach(b => fr.put("lower_bound", ByteBuffer.wrap(b)))
          f.upper.foreach(b => fr.put("upper_bound", ByteBuffer.wrap(b)))
          arr.add(fr)
        }
        r.put("partitions", arr)
      }
      writer.append(r)
    } finally writer.close()
  }

  def readManifestList(path: Path): Seq[(String, Long, Int)] = {
    val reader = new DataFileReader[GenericRecord](path.toFile,
      new GenericDatumReader[GenericRecord]())
    try reader.iterator.asScala.map { r =>
      (r.get("manifest_path").toString,
        r.get("manifest_length").asInstanceOf[Long],
        r.get("content").asInstanceOf[Int])
    }.toSeq
    finally reader.close()
  }
}
