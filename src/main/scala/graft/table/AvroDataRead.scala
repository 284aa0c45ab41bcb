package graft.table

import graft.model._
import org.apache.avro.{LogicalTypes, Schema => ASchema}
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericFixed, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField => SparkField, StructType}

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Avro DATA files on the interop read path (Iceberg Table Spec:
  * `file_format` admits AVRO alongside ORC/PARQUET; reference
  * table.rs:19 models the same manifest surface that declares it).
  *
  * Spark ships no avro DataFrame datasource in this build, but the
  * plain Avro library (already used for spec manifests) is on the
  * classpath — so Avro data files read through a one-task-per-file
  * `mapPartitions` decode into the table's write-time schema. This is
  * deliberately the `mapPartitions` last resort: Spark genuinely cannot
  * express the scan, and the path is interop-only (graft writes
  * parquet; `compact()` migrates adopted Avro files to the vectorized
  * path). Parallelism is one partition per file — at adoption scale
  * (thousands of files) that is thousands of tasks, the same
  * file-granular parallelism spark-avro itself would produce.
  *
  * Field resolution follows Iceberg's Avro rules: match the writer
  * field by its `field-id` property first, by name as a fallback;
  * fields absent from the writer read as null (the caller's field-id
  * alignment then applies v3 initial-defaults / renames exactly as for
  * parquet). Logical types decode per the spec's Avro appendix:
  * decimal bytes/fixed, date days, time/timestamp micros (millis
  * accepted), string/fixed(16) uuid; non-string map keys arrive as the
  * spec's key/value record-array encoding.
  */
object AvroDataRead {

  /** Read `paths` (all written under `fileSchema`) into a DataFrame of
    * `fileSchema`'s Spark shape; `withFile` appends the on-disk path as
    * [[GraftTable.FileCol]] (the manifest path IS the decoded form the
    * virtual column contracts).
    */
  def read(spark: SparkSession, paths: Seq[String], fileSchema: SchemaV2,
      withFile: Boolean = false): DataFrame = {
    val dataSchema = GraftTable.toSparkSchema(fileSchema)
    val outSchema =
      if (withFile) StructType(dataSchema.fields :+
        SparkField(GraftTable.FileCol, StringType, nullable = false))
      else dataSchema
    if (paths.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)
    val targets = fileSchema.fields
    // ship the session's Hadoop conf to the tasks as plain entries
    // (Configuration itself is not serializable), so the decode opens
    // through the same FileSystem layer as the parquet/ORC paths — a
    // layout on object storage reads exactly like file://
    val confArr: Array[(String, String)] = {
      val c = spark.sessionState.newHadoopConf()
      val it = c.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (it.hasNext) { val e = it.next(); buf += (e.getKey -> e.getValue) }
      buf.toArray
    }
    val bConf = spark.sparkContext.broadcast(confArr)
    val rdd = spark.sparkContext
      .parallelize(paths, paths.size)
      .mapPartitions { it =>
        val hconf = new org.apache.hadoop.conf.Configuration(false)
        bConf.value.foreach { case (k, v) => hconf.set(k, v) }
        // close the in-flight reader even when the task stops early
        // (limit, take, failure) — exhaustion is not guaranteed
        var open: DataFileReader[GenericRecord] = null
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (open != null) open.close()
          })
        it.flatMap { path =>
          // manifest paths from genuinely external layouts may be URI
          // form (file:///…) — decode like every other read path does
          val local = GraftTable.decodePath(path)
          val reader = new DataFileReader[GenericRecord](
            new org.apache.avro.mapred.FsInput(hadoopPath(path), hconf),
            new GenericDatumReader[GenericRecord]())
          open = reader
          val conv = structConverter(reader.getSchema, targets)
          val base = new Iterator[Row] {
            def hasNext: Boolean = {
              val h = reader.hasNext
              if (!h) { reader.close(); if (open eq reader) open = null }
              h
            }
            def next(): Row = conv(reader.next())
          }
          if (withFile) base.map(r => Row.fromSeq(r.toSeq :+ local)) else base
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Manifest `file_path` → Hadoop Path: URI-form paths (file:///…,
    * s3a://…) keep their scheme and percent-decode through java.net.URI
    * (Hadoop's Path(URI) takes decoded components); scheme-less paths
    * resolve against the default FileSystem.
    */
  private def hadoopPath(raw: String): org.apache.hadoop.fs.Path =
    try {
      val u = new java.net.URI(raw)
      if (u.getScheme != null) new org.apache.hadoop.fs.Path(u)
      else new org.apache.hadoop.fs.Path(raw)
    } catch { case _: Exception => new org.apache.hadoop.fs.Path(raw) }

  /** GenericRecord → external-typed Row for `targets`, resolving writer
    * fields by field-id property; unmatched targets → null. The
    * name fallback applies ONLY when the writer record carries no
    * field-id properties at all (a non-Iceberg Avro file) — an
    * id-tracked writer that misses an id must resolve to null, never
    * to a same-named column whose id differs (a dropped-and-readded
    * column would otherwise silently serve the deleted column's data).
    */
  private def structConverter(writer: ASchema,
      targets: Seq[StructField]): GenericRecord => Row = {
    require(writer.getType == ASchema.Type.RECORD,
      s"avro data file root must be a record, got ${writer.getType}")
    val writerFields = scala.jdk.CollectionConverters
      .ListHasAsScala(writer.getFields).asScala.toSeq
    val idTracked = writerFields.exists(_.getObjectProp("field-id") != null)
    val slots: Array[(Int, Any => Any)] = targets.map { t =>
      val found =
        if (idTracked) writerFields.find(f =>
          Option(f.getObjectProp("field-id"))
            .exists(_.toString == t.id.toString)).orNull
        else writer.getField(t.name)
      Option(found)
        .map(f => (f.pos(), valueConverter(f.schema(), t.fieldType)))
        .getOrElse((-1, identity[Any] _))
    }.toArray
    rec => {
      val vals = new Array[Any](slots.length)
      var i = 0
      while (i < slots.length) {
        val (pos, conv) = slots(i)
        vals(i) = if (pos < 0) null else conv(rec.get(pos))
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericRow(vals)
    }
  }

  /** Unwrap `[null, T]` unions to the non-null branch. */
  private def nonNull(s: ASchema): ASchema =
    if (s.getType != ASchema.Type.UNION) s
    else {
      val branches = scala.jdk.CollectionConverters
        .ListHasAsScala(s.getTypes).asScala
        .filter(_.getType != ASchema.Type.NULL)
      require(branches.size == 1,
        s"only [null, T] unions are readable, got $s")
      branches.head
    }

  private def bytesOf(v: Any): Array[Byte] = v match {
    case b: ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case f: GenericFixed => f.bytes().clone()
    case a: Array[Byte] => a
    case other => throw new IllegalArgumentException(
      s"expected bytes, got ${other.getClass}")
  }

  /** Avro in-memory value → Spark external type, driven by the TABLE
    * type (the file was declared under `fileSchema`, so the target type
    * is authoritative; writer widenings int→long etc. resolve here).
    */
  private def valueConverter(ws0: ASchema, t: IceType): Any => Any = {
    val ws = nonNull(ws0)
    val conv: Any => Any = t match {
      case TBoolean => v => v.asInstanceOf[Boolean]
      case TInt => v => v.asInstanceOf[Number].intValue()
      case TLong => v => v.asInstanceOf[Number].longValue()
      case TFloat => v => v.asInstanceOf[Number].floatValue()
      case TDouble => v => v.asInstanceOf[Number].doubleValue()
      case TString | TUuid => {
        case f: GenericFixed => // spec uuid: fixed[16] big-endian
          val bb = ByteBuffer.wrap(f.bytes())
          new java.util.UUID(bb.getLong, bb.getLong).toString
        case v => v.toString
      }
      case TBinary | TFixed(_) => bytesOf
      case TDecimal(_, scale) => v =>
        new JBigDecimal(new BigInteger(bytesOf(v)), scale)
      case TDate => v =>
        java.sql.Date.valueOf(LocalDate.ofEpochDay(
          v.asInstanceOf[Number].longValue()))
      case TTime => v => // micros since midnight, surfaced as LongType
        ws.getLogicalType match {
          case _: LogicalTypes.TimeMillis =>
            v.asInstanceOf[Number].longValue() * 1000L
          case _ => v.asInstanceOf[Number].longValue()
        }
      case TTimestamp => v => // TimestampNTZType ⇒ LocalDateTime
        LocalDateTime.ofInstant(microsInstant(ws, v), ZoneOffset.UTC)
      case TTimestamptz => v => // TimestampType ⇒ java.sql.Timestamp
        java.sql.Timestamp.from(microsInstant(ws, v))
      case TStruct(fields) =>
        val c = structConverter(ws, fields)
        v => c(v.asInstanceOf[GenericRecord])
      case TList(_, _, el) =>
        require(ws.getType == ASchema.Type.ARRAY,
          s"list field written as ${ws.getType}")
        val ec = valueConverter(ws.getElementType, el)
        v => scala.jdk.CollectionConverters
          .ListHasAsScala(v.asInstanceOf[java.util.List[Any]]).asScala
          .toSeq.map(x => if (x == null) null else ec(x))
      case TMap(_, k, _, _, vt) => ws.getType match {
        case ASchema.Type.MAP => // string-keyed: native avro map
          val vc = valueConverter(ws.getValueType, vt)
          v => scala.jdk.CollectionConverters
            .MapHasAsScala(v.asInstanceOf[java.util.Map[Any, Any]]).asScala
            .map { case (mk, mv) =>
              mk.toString -> (if (mv == null) null else vc(mv)) }.toMap
        case ASchema.Type.ARRAY => // spec non-string keys: k/v records
          val entry = ws.getElementType
          val kc = valueConverter(entry.getField("key").schema(), k)
          val vc = valueConverter(entry.getField("value").schema(), vt)
          v => scala.jdk.CollectionConverters
            .ListHasAsScala(v.asInstanceOf[java.util.List[Any]]).asScala
            .map { e =>
              val r = e.asInstanceOf[GenericRecord]
              val mv = r.get("value")
              kc(r.get("key")) -> (if (mv == null) null else vc(mv))
            }.toMap
        case other => throw new IllegalArgumentException(
          s"map field written as $other")
      }
    }
    v => if (v == null) null else conv(v)
  }

  /** Long timestamp value → Instant, honoring millis/micros logical
    * types (bare longs are spec micros).
    */
  private def microsInstant(ws: ASchema, v: Any): Instant = {
    val n = v.asInstanceOf[Number].longValue()
    val micros = ws.getLogicalType match {
      case _: LogicalTypes.TimestampMillis => Math.multiplyExact(n, 1000L)
      case _ => n
    }
    Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)
  }
}
