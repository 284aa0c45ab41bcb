package graft

import graft.model._
import graft.table.{AvroManifest, ColStats, DataFileEntry, GraftTable}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Iceberg `time` primitive (reference schema.rs:16): surfaced as
  * LongType micros-since-midnight (Spark has no time-of-day type).
  * Pins the full seam: a reference-written TIME(MICROS)-annotated
  * parquet file scans back as the micros longs; writes are REJECTED
  * (Spark would emit unannotated INT64, degrading external-reader
  * interop); Avro manifest export carries time partitions/bounds as
  * spec longs, not the string fallback.
  */
class TimeTypeSpec extends SparkSpec {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$name")

  private val micros = Seq(0L,
    12L * 3600L * 1000000L + 34L * 60L * 1000000L + 56123456L,
    86399999999L)

  /** Write an INT64 TIME(MICROS, adjustToUtc=false) parquet file — the
    * physical form a reference (Iceberg) writer produces for `time`.
    */
  private def writeTimeParquet(path: String, rows: Seq[(Long, Long)]): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.hadoop.ParquetFileWriter
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val schema = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.INT64).named("id"))
      .addField(Types.optional(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timeType(false,
          LogicalTypeAnnotation.TimeUnit.MICROS)).named("t"))
      .named("r")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withType(schema)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .withConf(new org.apache.hadoop.conf.Configuration())
      .build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, t) =>
      val g = f.newGroup()
      g.add("id", id)
      g.add("t", t)
      w.write(g)
    } finally w.close()
  }

  /** Rewrite the table's latest metadata json, retyping column `name`
    * from `long` to `time` — simulating a reference-written table.
    */
  private def retypeToTime(location: String, name: String): Unit = {
    val metaDir = java.nio.file.Paths.get(location, "metadata")
    val ls = java.nio.file.Files.list(metaDir)
    val latest = try {
      import scala.jdk.CollectionConverters._
      ls.iterator.asScala.map(_.toString)
        .filter(_.matches(""".*v\d+\.metadata\.json"""))
        .maxBy(p => """v(\d+)\.metadata\.json""".r
          .findFirstMatchIn(p).get.group(1).toInt)
    } finally ls.close()
    val p = java.nio.file.Paths.get(latest)
    val node = Json.parse(new String(java.nio.file.Files.readAllBytes(p),
      "UTF-8")).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.path("schemas").forEach { s =>
      s.path("fields").forEach { f =>
        if (f.path("name").asText == name)
          f.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .put("type", "time")
      }
    }
    java.nio.file.Files.write(p, Json.write(node).getBytes("UTF-8"))
  }

  private def timeTable(name: String): GraftTable = {
    val loc = tmp(name).toString + "/t"
    val rows = micros.zipWithIndex.map { case (m, i) => (i.toLong, m) }
    val df = spark.createDataFrame(rows).toDF("id", "t").coalesce(1)
    val t = GraftTable.create(spark, loc, df.schema)
    t.append(df)
    // swap the Spark-written plain-INT64 file for a genuinely
    // TIME(MICROS)-annotated one holding the same rows
    val file = t.liveEntries().head.path
    writeTimeParquet(file, rows)
    retypeToTime(loc, "t")
    GraftTable.load(spark, loc)
  }

  test("TIME(MICROS)-annotated files scan as micros-since-midnight longs") {
    val t = timeTable("time-rt")
    assert(t.metadata.currentSchema.fields.find(_.name == "t")
      .get.fieldType == TTime)
    val scanned = t.scan()
    assert(scanned.schema("t").dataType == LongType)
    val out = scanned.orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(out == micros, s"expected $micros got $out")
    // filters over the surfaced long push down and prune like any long
    assert(t.scan(Some(col("t") > 0L)).count() == 2)
  }

  test("writes to time-carrying schemas are rejected, reads keep working") {
    val t = timeTable("time-guard")
    val more = spark.createDataFrame(Seq((9L, 1L))).toDF("id", "t")
    val e = intercept[IllegalArgumentException] { t.append(more) }
    assert(e.getMessage.contains("time"), e.getMessage)
    assert(t.scan().count() == 3)
  }

  test("avro export: time partitions and bounds travel as spec longs") {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._
    val schema = SchemaV2(0, None, None, Seq(
      graft.model.StructField(1, "id", required = true, TLong),
      graft.model.StructField(2, "t", required = false, TTime)))
    val spec = PartitionSpec(1,
      Seq(PartitionField(2, 1000, "t", TIdentity)))
    val e = DataFileEntry("/data/a.parquet", 10L, 1L, 1L, 0,
      Map("t" -> Some("45296123456")),
      Map("t" -> ColStats(Some("0"), Some("86399999999"), 0L)),
      fileSize = 1L)
    val p = tmp("avro-time").resolve("m.avro")
    AvroManifest.writeManifest(p, Seq(e), schema, spec, 1L, 0)
    val r = new DataFileReader[GenericRecord](p.toFile,
      new GenericDatumReader[GenericRecord]())
    val recs = try r.iterator.asScala.toList finally r.close()
    val df = recs.head.get("data_file").asInstanceOf[GenericRecord]
    val part = df.get("partition").asInstanceOf[GenericRecord]
    // Avro long carrying the micros value — NOT a string
    assert(part.get("t") == 45296123456L, s"got ${part.get("t")}")
    val partType = part.getSchema.getField("t").schema()
      .getTypes.asScala.map(_.getType.getName).toSet
    assert(partType == Set("null", "long"), s"got $partType")
    // typed 8-byte bounds roundtrip through the binary encoding
    assert(AvroManifest.readManifest(p) ==
      Seq(e.copy(specId = Some(spec.specId))))
  }
}
