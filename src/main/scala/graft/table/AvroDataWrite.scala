package graft.table

import graft.model._
import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{DataType => SparkType, _}
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro DATA-file writes — the third leg of the spec's `file_format`
  * triad (write.format.default=avro). The reference models only the
  * snapshot's manifest-list location,
  * /root/reference/src/model/snapshot.rs:58-60 (an `.avro` path per
  * its fixture, snapshot.rs:117); per-file formats live in the
  * manifest files that list points to, a spec surface the reference
  * does not model.
  * The reverse of [[AvroDataRead]]:
  * executors encode rows per the Iceberg Avro appendix (field-id
  * props, decimal bytes, date days, timestamp micros with
  * adjust-to-utc, struct/list/map nesting) and fan out into hive-style
  * partition dirs computed row-side, so [[GraftTable.parsePartition]]
  * reads the tuples back exactly as for parquet/orc files.
  *
  * Avro files carry no per-column footer statistics, so manifest stats
  * are accumulated INLINE while writing — min/max/null-count per stat
  * path under Spark's own orderings (UTF8String binary order for
  * strings, NaN-greatest for float/double), normalized through
  * [[Pruning.normalize]] so the encoding is byte-identical to the
  * scan-based pass. No second pass over the data, not even a footer
  * read: the write IS the stats job. A stat path whose accumulation
  * hits any surprise is omitted (sound — never pruned, never
  * certified).
  *
  * Same per-row decode caveat as the read side: this is the deliberate
  * `mapPartitions` last resort, interop-only (parquet/orc writes stay
  * on the vectorized path). Restrictions mirror adopted avro: no
  * position-addressed reads (MoR position deletes, `_pos`, lineage),
  * no bloom sidecars (those ride the vectorized scan pass).
  */
object AvroDataWrite {

  /** Write `df` (table columns first, partition transform columns
    * trailing, already sorted/distributed by the caller) as avro data
    * files under `writeDir`; manifest shards land in `shardDir` exactly
    * as the parquet/orc stats passes produce them. Returns the shard
    * rollups (empty input → empty).
    */
  def write(df: DataFrame, writeDir: String, schema: SchemaV2,
      sparkSchema: StructType, spec: PartitionSpec, shardDir: String,
      maxRecordsPerFile: Option[Long],
      conf: org.apache.hadoop.conf.Configuration): Seq[GraftTable.ShardRef] = {
    val avroJson = dataSchema(schema).toString // Schema is not serializable
    val statFields = GraftTable.statPaths(sparkSchema)
    val partNames = spec.fields.map(_.name)
    val schemaId = schema.schemaId
    val specLocal = spec
    val dataWidth = sparkSchema.fields.length
    // 0/negative = no limit, matching Spark's maxRecordsPerFile
    val rollCap = maxRecordsPerFile.filter(_ > 0L).getOrElse(Long.MaxValue)
    val serConf = new SerConf(conf)
    val dataTypes = sparkSchema.fields.map(_.dataType)
    val rollups = df.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val aschema = new ASchema.Parser().parse(avroJson)
        val conv = rowConverter(aschema, dataTypes)
        val tid = Option(org.apache.spark.TaskContext.get())
          .map(t => t.partitionId().toLong << 20 | t.attemptNumber())
          .getOrElse(0L)
        val writer = new FanoutWriter(writeDir, aschema, conv, dataWidth,
          partNames, statFields, sparkSchema, rollCap, tid, serConf.value)
        // close every open file even when the task dies mid-iterator —
        // abandoned files are swept by removeOrphanFiles (never
        // referenced: their entries are only emitted on success)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => writer.closeAll()))
        it.foreach(writer.write)
        val entries = writer.finish(schemaId, specLocal)
        GraftTable.shardRollup(entries.iterator, shardDir, serConf.value)
      }
    }(org.apache.spark.sql.Encoders.STRING).collect()
    GraftTable.parseRollups(rollups.toSeq)
  }

  // ------------------------------------------------------------ fanout ----

  /** Per-task cap on simultaneously open avro files (≈ open fds). */
  private val MaxOpenWriters = 64

  /** One open avro file per partition tuple (rolled at the record cap),
    * with inline stat accumulation per file.
    */
  private final class FanoutWriter(writeDir: String, aschema: ASchema,
      conv: Row => GenericRecord, dataWidth: Int, partNames: Seq[String],
      statFields: Seq[(String, SparkType)], rowSchema: StructType,
      rollCap: Long, taskId: Long,
      conf: org.apache.hadoop.conf.Configuration) {

    private final class OpenFile(val path: org.apache.hadoop.fs.Path,
        val partDir: String) {
      val out = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](aschema, GenericData.get))
        // parquet/orc legs compress (snappy); raw avro blocks would be
        // several times the bytes and every later scan pays the I/O
        .setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
        .create(aschema, path.getFileSystem(conf).create(path, false))
      var rows = 0L
      val acc: Array[StatAcc] = statFields.map { case (p, dt) =>
        new StatAcc(accessor(rowSchema, p), dt)
      }.toArray
      def write(r: Row): Unit = {
        out.append(conv(r))
        rows += 1
        var i = 0
        while (i < acc.length) { acc(i).update(r); i += 1 }
      }
    }

    private val open =
      scala.collection.mutable.LinkedHashMap.empty[String, OpenFile]
    private val done = Seq.newBuilder[OpenFile]
    private val uuid = java.util.UUID.randomUUID.toString.take(8)
    private var fileNo = 0

    private def dirFor(r: Row): String =
      partNames.indices.map { i =>
        val v = r.get(dataWidth + i)
        val raw = v match {
          case null => null
          case d: java.sql.Date => d.toString
          case d: java.time.LocalDate => d.toString
          case other @ (_: java.lang.Integer | _: java.lang.Long |
              _: java.lang.Short | _: java.lang.Byte | _: String |
              _: java.lang.Boolean | _: java.math.BigDecimal) =>
            other.toString
          case other => throw new IllegalArgumentException(
            s"avro writes to a table partitioned on a " +
              s"${other.getClass.getSimpleName} transform value are " +
              "unsupported — use parquet/orc, or partition on a " +
              "temporal/bucket/truncate transform")
        }
        org.apache.spark.sql.graft.Bridge
          .partitionPathSegment(partNames(i), raw)
      }.mkString("/")

    def write(r: Row): Unit = {
      val rel = if (partNames.isEmpty) "" else dirFor(r)
      val f = open.get(rel) match {
        case Some(f) if f.rows < rollCap =>
          // refresh recency: LinkedHashMap keeps an updated key at its
          // ORIGINAL position, so without remove+re-insert the eviction
          // below is insertion-order — a task cycling through >64
          // tuples would repeatedly evict its hottest earliest-seen
          // partition and multiply small files
          open.remove(rel); open.put(rel, f)
          f
        case prev =>
          prev.foreach { p => p.out.close(); done += p }
          // bound open handles: Spark's own fanout writer SORTS by
          // partition when tasks span many values; here the least-
          // recently-written writer is evicted instead (its partition
          // re-opens a fresh file if more rows arrive — more files,
          // never more handles)
          if (prev.isEmpty && open.size >= MaxOpenWriters) {
            val (oldRel, old) = open.head
            old.out.close(); done += old
            open.remove(oldRel)
          }
          fileNo += 1
          val name = f"part-$taskId%08x-$uuid-$fileNo%04d.avro"
          val p = new org.apache.hadoop.fs.Path(java.net.URI.create(
            GraftTable.encodePath(
              if (rel.isEmpty) s"$writeDir/$name"
              else s"$writeDir/$rel/$name")))
          val nf = new OpenFile(p, rel)
          open.put(rel, nf)
          nf
      }
      f.write(r)
    }

    def closeAll(): Unit = open.values.foreach { f =>
      try f.out.close() catch { case _: Exception => () }
    }

    def finish(schemaId: Int, spec: PartitionSpec): Seq[DataFileEntry] = {
      open.values.foreach { f => f.out.close(); done += f }
      open.clear()
      done.result().filter(_.rows > 0L).map { f =>
        val decoded = f.path.toUri.getPath
        val stats = statFields.zip(f.acc).flatMap { case ((p, dt), a) =>
          a.result(f.rows, dt).map(p -> _)
        }.toMap
        DataFileEntry(decoded, f.rows, DataFileEntry.PendingSnapshot, 0L,
          schemaId, GraftTable.parsePartition(decoded, spec), stats,
          fileSize = f.path.getFileSystem(conf).getFileStatus(f.path).getLen,
          specId = Some(spec.specId), format = DataFileEntry.Avro)
      }
    }
  }

  // ------------------------------------------------------------- stats ----

  /** Nested accessor for a dotted stat path over external Rows; a null
    * ancestor yields null (same as the scan pass's `col("a.b")`).
    * Ordinals are resolved against the schema ONCE — a per-row
    * fieldIndex lookup would dominate the whole encode loop.
    */
  private def accessor(schema: StructType, dotted: String): Row => Any = {
    val ords = {
      var st: SparkType = schema
      dotted.split('.').map { seg =>
        val s = st.asInstanceOf[StructType]
        val i = s.fieldIndex(seg)
        st = s.fields(i).dataType
        i
      }
    }
    r => {
      var cur: Any = r
      var i = 0
      while (i < ords.length && cur != null) {
        val row = cur.asInstanceOf[Row]
        cur = if (row.isNullAt(ords(i))) null else row.get(ords(i))
        i += 1
      }
      cur
    }
  }

  /** Inline min/max/null accumulator under Spark's own orderings. Any
    * unexpected value class poisons the accumulator → the stat path is
    * omitted entirely (absent stats are always sound).
    */
  private final class StatAcc(get: Row => Any, dt: SparkType) {
    private var mn: Any = null
    private var mx: Any = null
    private var nonNull = 0L
    private var bad = false
    // strings are held AS UTF8String — one conversion per incoming
    // value in the per-row hot loop, not two per comparison
    // (Pruning.normalize renders UTF8String directly at result time)
    private val prep: Any => Any = dt match {
      case StringType => v => UTF8String.fromString(v.asInstanceOf[String])
      case _ => identity
    }
    private val cmp: (Any, Any) => Int = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        (a, b) => java.lang.Long.compare(
          a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
      case FloatType | DoubleType =>
        // NaN greatest — Spark's min/max ordering, not IEEE
        (a, b) => java.lang.Double.compare(
          a.asInstanceOf[Number].doubleValue,
          b.asInstanceOf[Number].doubleValue)
      case StringType =>
        // UTF-8 BINARY order (UTF8String), not UTF-16 String.compareTo —
        // they diverge on supplementary-plane characters
        (a, b) => a.asInstanceOf[UTF8String]
          .compareTo(b.asInstanceOf[UTF8String])
      case _: DecimalType =>
        (a, b) => a.asInstanceOf[java.math.BigDecimal]
          .compareTo(b.asInstanceOf[java.math.BigDecimal])
      case DateType => (a, b) => java.lang.Long.compare(days(a), days(b))
      case TimestampType | TimestampNTZType =>
        (a, b) => java.lang.Long.compare(micros(a), micros(b))
      case BooleanType =>
        (a, b) => java.lang.Boolean.compare(
          a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
      case _ => (_, _) => { bad = true; 0 }
    }
    def update(r: Row): Unit = if (!bad) {
      val v0 = get(r)
      if (v0 != null) {
        nonNull += 1
        try {
          val v = prep(v0)
          if (mn == null || cmp(v, mn) < 0) mn = v
          if (mx == null || cmp(v, mx) > 0) mx = v
        } catch { case scala.util.control.NonFatal(_) => bad = true }
      }
    }
    def result(rows: Long, dt: SparkType): Option[ColStats] =
      if (bad) None
      else if (nonNull == 0L) Some(ColStats(None, None, rows))
      else try Some(ColStats(Pruning.normalize(mn, dt),
        Pruning.normalize(mx, dt), rows - nonNull))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  private def days(v: Any): Long = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay
    case d: java.time.LocalDate => d.toEpochDay
  }

  private def micros(v: Any): Long = v match {
    case t: java.sql.Timestamp => Pruning.sqlTsMicros(t)
    case i: java.time.Instant =>
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L)
    case l: java.time.LocalDateTime =>
      micros(l.toInstant(java.time.ZoneOffset.UTC))
  }

  // ------------------------------------------------------ avro schema ----

  /** Iceberg schema → Avro data-file schema per the spec's Avro
    * appendix: every field carries its `field-id` (the read side's
    * resolution key), optional fields are `[null, T]` unions, logical
    * types annotate date/time/timestamp/decimal/uuid. Names are
    * sanitized to Avro's identifier rules — resolution is by field-id,
    * so sanitized names never mislead a conforming reader.
    */
  private[table] def dataSchema(schema: SchemaV2): ASchema = {
    val r = record(s"table_schema_${schema.schemaId}",
      TStruct(schema.fields))
    r
  }

  private var anon = 0 // record name uniquifier (avro requires names)

  private def record(name: String, st: TStruct): ASchema = synchronized {
    val fields = st.fields.map { f =>
      val base = avroType(f.fieldType, f.name)
      val (s, default) =
        if (f.required) (base, null)
        else (ASchema.createUnion(
          ASchema.create(ASchema.Type.NULL), base),
          ASchema.Field.NULL_DEFAULT_VALUE)
      // a sanitized name gets the field id appended — two distinct
      // originals may sanitize to the same string ('a b' and 'a_b'),
      // and avro rejects duplicate field names; resolution is by
      // field-id anyway, so the rendered name is cosmetic
      val sane = sanitize(f.name)
      val fname = if (sane == f.name) sane else s"${sane}_fid${f.id}"
      val fld = new ASchema.Field(fname, s, null, default)
      fld.addProp("field-id", f.id: Integer)
      fld
    }
    ASchema.createRecord(sanitize(name), null, "graft", false,
      fields.asJava)
  }

  private def avroType(t: IceType, hint: String): ASchema = t match {
    case TBoolean => ASchema.create(ASchema.Type.BOOLEAN)
    case TInt => ASchema.create(ASchema.Type.INT)
    case TLong => ASchema.create(ASchema.Type.LONG)
    case TFloat => ASchema.create(ASchema.Type.FLOAT)
    case TDouble => ASchema.create(ASchema.Type.DOUBLE)
    case TDate =>
      LogicalTypes.date.addToSchema(ASchema.create(ASchema.Type.INT))
    case TTime => LogicalTypes.timeMicros
      .addToSchema(ASchema.create(ASchema.Type.LONG))
    case TTimestamp => // spec: adjust-to-utc=false
      val s = LogicalTypes.timestampMicros
        .addToSchema(ASchema.create(ASchema.Type.LONG))
      s.addProp("adjust-to-utc", false: java.lang.Boolean); s
    case TTimestamptz =>
      val s = LogicalTypes.timestampMicros
        .addToSchema(ASchema.create(ASchema.Type.LONG))
      s.addProp("adjust-to-utc", true: java.lang.Boolean); s
    case TString => ASchema.create(ASchema.Type.STRING)
    case TUuid => // spec Avro appendix: uuid is fixed[16] + uuid
      // logical type (big-endian bytes), NOT a plain string — the read
      // side accepts both, but external conforming readers expect fixed
      anon += 1
      LogicalTypes.uuid.addToSchema(
        ASchema.createFixed(s"uuid_$anon", null, "graft", 16))
    case TBinary => ASchema.create(ASchema.Type.BYTES)
    case TFixed(len) =>
      anon += 1
      ASchema.createFixed(s"fixed_$anon", null, "graft", len.toInt)
    case TDecimal(p, s) =>
      LogicalTypes.decimal(p, s).addToSchema(
        ASchema.create(ASchema.Type.BYTES))
    case TStruct(fs) =>
      anon += 1
      record(s"r${anon}_${hint}", TStruct(fs))
    case TList(elemId, required, elem) =>
      val e0 = avroType(elem, s"${hint}_elem")
      val e = if (required) e0
        else ASchema.createUnion(ASchema.create(ASchema.Type.NULL), e0)
      val arr = ASchema.createArray(e)
      arr.addProp("element-id", elemId: Integer)
      arr
    case TMap(keyId, key, valueId, valueRequired, value) =>
      val v0 = avroType(value, s"${hint}_val")
      val v = if (valueRequired) v0
        else ASchema.createUnion(ASchema.create(ASchema.Type.NULL), v0)
      key match {
        case TString =>
          val m = ASchema.createMap(v)
          m.addProp("key-id", keyId: Integer)
          m.addProp("value-id", valueId: Integer)
          m
        case _ => // spec: non-string keys as an array of k/v records
          anon += 1
          val kf = new ASchema.Field("key",
            avroType(key, s"${hint}_key"), null, null.asInstanceOf[AnyRef])
          kf.addProp("field-id", keyId: Integer)
          val vf = new ASchema.Field("value", v, null,
            if (valueRequired) null else ASchema.Field.NULL_DEFAULT_VALUE)
          vf.addProp("field-id", valueId: Integer)
          val entry = ASchema.createRecord(s"kv$anon", null, "graft",
            false, Seq(kf, vf).asJava)
          val arr = ASchema.createArray(entry)
          arr.addProp("logicalType", "map")
          arr
      }
  }

  private def sanitize(name: String): String = {
    val s = name.map(c =>
      if (c.isLetterOrDigit || c == '_') c else '_').mkString
    if (s.isEmpty || s.head.isDigit) "_" + s else s
  }

  // --------------------------------------------------- row conversion ----

  /** External Row → GenericRecord under the data schema; positional —
    * the caller aligned the DataFrame to the table schema already.
    */
  private def rowConverter(aschema: ASchema,
      types: Seq[SparkType]): Row => GenericRecord = {
    val fields = aschema.getFields.asScala.toArray
    val convs: Array[Any => Any] = types.toArray.zip(fields).map {
      case (dt, f) => valueWriter(nonNull(f.schema()), dt)
    }
    r => {
      val rec = new GenericData.Record(aschema)
      var i = 0
      while (i < convs.length) {
        val v = if (r.isNullAt(i)) null else convs(i)(r.get(i))
        rec.put(i, v)
        i += 1
      }
      rec
    }
  }

  private def nonNull(s: ASchema): ASchema =
    if (s.getType != ASchema.Type.UNION) s
    else s.getTypes.asScala.find(_.getType != ASchema.Type.NULL).get

  private def valueWriter(ws: ASchema, dt: SparkType): Any => Any = {
    val conv: Any => Any = dt match {
      case BooleanType | IntegerType | LongType | FloatType | DoubleType =>
        identity
      case ByteType => v => v.asInstanceOf[Byte].toInt
      case ShortType => v => v.asInstanceOf[Short].toInt
      case StringType =>
        if (ws.getType == ASchema.Type.FIXED) v => { // uuid → fixed[16]
          val u = java.util.UUID.fromString(v.toString)
          val bb = ByteBuffer.allocate(16)
          bb.putLong(u.getMostSignificantBits)
          bb.putLong(u.getLeastSignificantBits)
          new GenericData.Fixed(ws, bb.array)
        }
        else v => v.toString
      case BinaryType =>
        if (ws.getType == ASchema.Type.FIXED)
          v => new GenericData.Fixed(ws, v.asInstanceOf[Array[Byte]])
        else v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case d: DecimalType => v =>
        ByteBuffer.wrap(v.asInstanceOf[java.math.BigDecimal]
          .setScale(d.scale).unscaledValue.toByteArray)
      case DateType => {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case d: java.time.LocalDate => d.toEpochDay.toInt
      }
      case TimestampType | TimestampNTZType => micros(_)
      case st: StructType =>
        val rec = nonNull(ws)
        val inner = rowConverter(rec, st.fields.map(_.dataType).toSeq)
        v => inner(v.asInstanceOf[Row])
      case ArrayType(et, _) =>
        val ec = valueWriter(nonNull(ws.getElementType), et)
        v => v.asInstanceOf[scala.collection.Seq[Any]]
          .map(x => if (x == null) null else ec(x)).asJava
      case MapType(kt, vt, _) =>
        if (ws.getType == ASchema.Type.MAP) {
          val vc = valueWriter(nonNull(ws.getValueType), vt)
          v => v.asInstanceOf[scala.collection.Map[Any, Any]]
            .map { case (k, mv) =>
              k.toString -> (if (mv == null) null else vc(mv))
            }.toMap.asJava
        } else { // k/v record array (non-string keys)
          val entry = ws.getElementType
          val kc = valueWriter(nonNull(entry.getField("key").schema()), kt)
          val vc = valueWriter(nonNull(entry.getField("value").schema()), vt)
          v => v.asInstanceOf[scala.collection.Map[Any, Any]]
            .map { case (k, mv) =>
              val rec = new GenericData.Record(entry)
              rec.put(0, kc(k))
              rec.put(1, if (mv == null) null else vc(mv))
              rec
            }.toSeq.asJava
        }
      case other => throw new IllegalArgumentException(
        s"avro writes do not support $other columns")
    }
    v => if (v == null) null else conv(v)
  }
}
