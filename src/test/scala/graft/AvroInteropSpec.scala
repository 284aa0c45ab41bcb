package graft

import graft.model._
import graft.table.{AvroDataRead, AvroManifest, DataFileEntry, GraftTable, IcebergInterop}
import org.apache.avro.{Schema => ASchema}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions._

/** AVRO data files through the interop surface: the public Iceberg spec
  * admits `file_format` AVRO alongside ORC/PARQUET. Spark ships no avro
  * DataFrame datasource in this build, so AvroDataRead decodes files
  * with the plain Avro library (one task per file) into the declared
  * write-time schema — field-id resolution, logical types per the
  * spec's Avro appendix. Position-addressed reads (MoR position
  * deletes, _pos, lineage) refuse loudly, same as ORC; `compact()`
  * migrates to parquet and the vectorized DSv2 path.
  *
  * The external layout is HAND-BUILT here (graft's own writer emits
  * parquet only): avro files written by the plain library, spec Avro
  * manifests + manifest list, and metadata JSON.
  */
class AvroInteropSpec extends SparkSpec {

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(s"avrodata-$n").toString

  private val basicWriter = new ASchema.Parser().parse(
    """{"type":"record","name":"r","fields":[
      |{"name":"id","type":["null","long"],"field-id":1},
      |{"name":"name","type":["null","string"],"field-id":2},
      |{"name":"score","type":["null","double"],"field-id":3}]}"""
      .stripMargin)

  private def writeAvro(path: java.nio.file.Path, schema: ASchema,
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    try rows.foreach(w.append) finally w.close()
  }

  /** Wrap data files + schema into a spec external layout (manifest,
    * manifest list, metadata JSON, version hint).
    */
  private def layoutFor(dir: String, schema: SchemaV2,
      files: Seq[(java.nio.file.Path, Long)]): String = {
    val snapId = 8888L
    val entries = files.map { case (p, rc) =>
      DataFileEntry(p.toString, rc, snapId, 1L, 0, Map.empty, Map.empty,
        content = 0, fileSize = java.nio.file.Files.size(p),
        specId = Some(0), format = DataFileEntry.Avro)
    }
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    java.nio.file.Files.createDirectories(metaDir)
    val mPath = metaDir.resolve("manifest-00000.avro")
    AvroManifest.writeManifest(mPath, entries, schema,
      PartitionSpec.unpartitioned, snapId, content = 0)
    val listPath = metaDir.resolve(s"snap-$snapId.avro")
    AvroManifest.writeManifestList(listPath, Seq(AvroManifest.ListEntry(
      mPath, java.nio.file.Files.size(mPath), 0, 1L, 1L, snapId,
      entries.size.toLong, entries.map(_.recordCount).sum, Some(0))), 0)
    val meta = TableMetadataV2(
      tableUuid = java.util.UUID.randomUUID.toString,
      location = dir,
      lastSequenceNumber = 1L,
      lastUpdatedMs = 1700000000000L,
      lastColumnId = schema.fields.map(_.id).max,
      schemas = Seq(schema),
      currentSchemaId = 0,
      partitionSpecs = Seq(PartitionSpec.unpartitioned),
      defaultSpecId = 0,
      lastPartitionId = 999,
      currentSnapshotId = Some(snapId),
      snapshots = Some(Seq(SnapshotV2(snapId, None, 1L, 1700000000000L,
        listPath.toString, Summary(Some("append")), Some(0L)))))
    java.nio.file.Files.writeString(metaDir.resolve("v1.metadata.json"),
      meta.toJsonString)
    java.nio.file.Files.writeString(metaDir.resolve("version-hint.text"),
      "1")
    dir
  }

  /** Basic (id long, name string, score double) avro layout, two files. */
  private def buildAvroLayout(nRows: Int): String = {
    val dir = tmp("layout")
    val dataDir = java.nio.file.Paths.get(dir, "data")
    java.nio.file.Files.createDirectories(dataDir)
    def rec(i: Int): GenericRecord = {
      val r = new GenericData.Record(basicWriter)
      r.put("id", i.toLong); r.put("name", s"n${i % 7}"); r.put("score", i * 2.5)
      r
    }
    val half = nRows / 2
    val f1 = dataDir.resolve("part-0.avro")
    val f2 = dataDir.resolve("part-1.avro")
    writeAvro(f1, basicWriter, (1 to half).map(rec))
    writeAvro(f2, basicWriter, (half + 1 to nRows).map(rec))
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = false, TLong),
      StructField(2, "name", required = false, TString),
      StructField(3, "score", required = false, TDouble)))
    layoutFor(dir, schema, Seq(f1 -> half.toLong, f2 -> (nRows - half).toLong))
  }

  test("external AVRO table reads correctly (plain-library decode)") {
    val dir = buildAvroLayout(500)
    val df = IcebergInterop.readTable(spark, dir)
    assert(df.count() == 500L)
    assert(df.agg(sum("id")).head().getLong(0) == (1L to 500L).sum)
    assert(df.filter(col("name") === "n3").count() ==
      (1 to 500).count(_ % 7 == 3))
  }

  test("field resolution: field-id beats name; missing column reads null") {
    // writer names DIFFER from the table schema's, but field-ids match —
    // Iceberg's avro resolution contract; plus a table column (id 4)
    // the writer never had, which must read as null
    val writer = new ASchema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"old_id","type":["null","long"],"field-id":1},
        |{"name":"old_name","type":["null","string"],"field-id":2}]}"""
        .stripMargin)
    val dir = tmp("renamed")
    val dataDir = java.nio.file.Paths.get(dir, "data")
    java.nio.file.Files.createDirectories(dataDir)
    val f = dataDir.resolve("part-0.avro")
    writeAvro(f, writer, (1 to 40).map { i =>
      val r = new GenericData.Record(writer)
      r.put("old_id", i.toLong); r.put("old_name", s"v$i"); r
    })
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = false, TLong),
      StructField(2, "name", required = false, TString),
      StructField(4, "added_later", required = false, TInt)))
    layoutFor(dir, schema, Seq(f -> 40L))
    val df = IcebergInterop.readTable(spark, dir)
    assert(df.columns.toSeq == Seq("id", "name", "added_later"))
    assert(df.agg(sum("id")).head().getLong(0) == (1L to 40L).sum)
    assert(df.filter(col("name") === "v7").count() == 1L)
    assert(df.filter(col("added_later").isNull).count() == 40L)
  }

  test("id-tracked writer: same NAME with a different id reads null") {
    // table history: 'tag' (id 2) dropped, a NEW 'tag' (id 9) added.
    // The old file's same-named column must NOT serve the deleted
    // column's data — id-tracked files resolve by id only
    val writer = new ASchema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":["null","long"],"field-id":1},
        |{"name":"tag","type":["null","string"],"field-id":2}]}"""
        .stripMargin)
    val dir = tmp("readded")
    val dataDir = java.nio.file.Paths.get(dir, "data")
    java.nio.file.Files.createDirectories(dataDir)
    val f = dataDir.resolve("part-0.avro")
    writeAvro(f, writer, (1 to 25).map { i =>
      val r = new GenericData.Record(writer)
      r.put("id", i.toLong); r.put("tag", s"OLD$i"); r
    })
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = false, TLong),
      StructField(9, "tag", required = false, TString)))
    layoutFor(dir, schema, Seq(f -> 25L))
    val df = IcebergInterop.readTable(spark, dir)
    assert(df.filter(col("tag").isNotNull).count() == 0L,
      "stale same-named column leaked through the id-tracked resolve")
    assert(df.agg(sum("id")).head().getLong(0) == (1L to 25L).sum)
  }

  test("URI-form manifest paths (file://) read; _file is the decoded path") {
    val dir = buildAvroLayout(60)
    // rewrite the manifest to carry file:// URI paths, the form
    // external java/Spark writers store
    val t = IcebergInterop.adoptTable(spark, dir, tmp("uriform") + "/t")
    val mf = t.liveManifests(None).head
    DataFileEntry.writeManifest(
      java.nio.file.Paths.get(mf.path),
      mf.entries.map(e => e.copy(path =
        new java.net.URI("file", null, e.path, null).toString)))
    assert(t.scan().count() == 60L)
    assert(t.scan().agg(sum("id")).head().getLong(0) == (1L to 60L).sum)
    val files = t.scan(withFileColumn = true)
      .select(GraftTable.FileCol).distinct().collect().map(_.getString(0))
    assert(files.forall(p => p.startsWith("/") && p.endsWith(".avro")),
      s"_file must be the decoded on-disk form: ${files.toSeq}")
  }

  test("percent-encoded URIs open through the Hadoop FS layer") {
    // a data file in a directory with a space: only a reader that
    // percent-decodes the URI AND opens through a FileSystem (not a
    // bare java.io.File of the raw string) finds it — the object-store
    // portability seam, exercised with file:// as the vehicle
    val dir = tmp("uri enc")
    val dataDir = java.nio.file.Paths.get(dir, "da ta")
    java.nio.file.Files.createDirectories(dataDir)
    val f = dataDir.resolve("part-0.avro")
    writeAvro(f, basicWriter, (1 to 15).map { i =>
      val r = new GenericData.Record(basicWriter)
      r.put("id", i.toLong); r.put("name", s"n$i"); r.put("score", i * 1.0)
      r
    })
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = false, TLong),
      StructField(2, "name", required = false, TString),
      StructField(3, "score", required = false, TDouble)))
    val uri = new java.net.URI("file", null, f.toString, null).toString
    assert(uri.contains("%20"), s"fixture must exercise encoding: $uri")
    val got = AvroDataRead.read(spark, Seq(uri), schema)
    assert(got.count() == 15L)
    assert(got.agg(sum("id")).head().getLong(0) == (1L to 15L).sum)
    // and the decode path must not regress to java.io.File: the task
    // closure opens via Avro's FsInput over Hadoop's FileSystem
    val src = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "src/main/scala/graft/table/AvroDataRead.scala"))
    assert(!src.contains("java.io.File"),
      "AvroDataRead must open through the Hadoop FS layer, not java.io.File")
    assert(src.contains("FsInput"), "expected the FsInput seam")
  }

  test("rich types decode per the spec avro appendix") {
    val writer = new ASchema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":"long","field-id":1},
        |{"name":"dec","type":{"type":"bytes","logicalType":"decimal",
        |  "precision":9,"scale":2},"field-id":2},
        |{"name":"d","type":{"type":"int","logicalType":"date"},"field-id":3},
        |{"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"},
        |  "field-id":4},
        |{"name":"tags","type":{"type":"array","items":"string"},"field-id":5},
        |{"name":"props","type":{"type":"map","values":"long"},"field-id":6},
        |{"name":"st","type":{"type":"record","name":"inner","fields":[
        |  {"name":"a","type":"int","field-id":8},
        |  {"name":"b","type":"string","field-id":9}]},"field-id":7},
        |{"name":"kv","type":{"type":"array","items":{"type":"record",
        |  "name":"k12_v13","fields":[
        |  {"name":"key","type":"int","field-id":12},
        |  {"name":"value","type":"string","field-id":13}]}},"field-id":10},
        |{"name":"bin","type":"bytes","field-id":11}]}""".stripMargin)
    val dir = tmp("rich")
    val dataDir = java.nio.file.Paths.get(dir, "data")
    java.nio.file.Files.createDirectories(dataDir)
    val f = dataDir.resolve("part-0.avro")
    writeAvro(f, writer, (1 to 10).map { i =>
      val r = new GenericData.Record(writer)
      r.put("id", i.toLong)
      r.put("dec", java.nio.ByteBuffer.wrap( // unscaled big-endian bytes
        java.math.BigDecimal.valueOf(i * 125L, 2).unscaledValue.toByteArray))
      r.put("d", 19000 + i) // days since epoch
      r.put("ts", 1700000000000000L + i * 1000000L) // micros
      r.put("tags", java.util.List.of(s"t$i", "x"))
      r.put("props", java.util.Map.of("n", i.toLong * 10))
      val st = new GenericData.Record(writer.getField("st").schema())
      st.put("a", i); st.put("b", s"s$i"); r.put("st", st)
      val kvs = writer.getField("kv").schema().getElementType
      val kv = new GenericData.Record(kvs)
      kv.put("key", i); kv.put("value", s"m$i")
      r.put("kv", java.util.List.of(kv))
      r.put("bin", java.nio.ByteBuffer.wrap(Array[Byte](i.toByte, 0x7f)))
      r
    })
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = true, TLong),
      StructField(2, "dec", required = true, TDecimal(9, 2)),
      StructField(3, "d", required = true, TDate),
      StructField(4, "ts", required = true, TTimestamptz),
      StructField(5, "tags", required = true, TList(50, elementRequired = true, TString)),
      StructField(6, "props", required = true,
        TMap(60, TString, 61, valueRequired = true, TLong)),
      StructField(7, "st", required = true, TStruct(Seq(
        StructField(8, "a", required = true, TInt),
        StructField(9, "b", required = true, TString)))),
      StructField(10, "kv", required = true,
        TMap(12, TInt, 13, valueRequired = true, TString)),
      StructField(11, "bin", required = true, TBinary)))
    layoutFor(dir, schema, Seq(f -> 10L))
    val df = IcebergInterop.readTable(spark, dir)
    val row = df.filter(col("id") === 4L).head()
    assert(row.getAs[java.math.BigDecimal]("dec")
      .compareTo(java.math.BigDecimal.valueOf(500L, 2)) == 0)
    assert(row.getAs[java.sql.Date]("d").toLocalDate ==
      java.time.LocalDate.ofEpochDay(19004))
    assert(row.getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.ofEpochSecond(1700000004L))
    assert(row.getSeq[String](row.fieldIndex("tags")).toSeq == Seq("t4", "x"))
    assert(row.getMap[String, Long](row.fieldIndex("props")).toMap ==
      Map("n" -> 40L))
    val st = row.getAs[org.apache.spark.sql.Row]("st")
    assert(st.getAs[Int]("a") == 4 && st.getAs[String]("b") == "s4")
    assert(row.getMap[Int, String](row.fieldIndex("kv")).toMap ==
      Map(4 -> "m4"))
    assert(row.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](4, 0x7f))
    // aggregates cross-check the whole file, not one row
    assert(df.agg(sum("dec")).head().getDecimal(0)
      .compareTo(java.math.BigDecimal.valueOf((1 to 10).map(_ * 125L).sum, 2)) == 0)
    assert(df.agg(sum(col("st.a"))).head().getLong(0) == 55L)
  }

  test("adopted AVRO table: scan, append, eq-delete, CoW, compact→DSv2") {
    val dir = buildAvroLayout(400)
    val t = IcebergInterop.adoptTable(spark, dir, tmp("adopted") + "/t")
    assert(t.scan().count() == 400L)
    // adoption stamped the avro flag, so the DSv2 read routes through
    // the V1 bridge (the engine scan decodes avro) instead of refusing;
    // metadata COUNT(*) stays format-agnostic
    assert(t.metadata.properties
      .exists(_.get(GraftTable.HasAvroProp).contains("true")))
    assert(spark.read.format("graft").load(t.location).count() == 400L)
    val dsv2Pre = spark.read.format("graft").load(t.location)
    assert(dsv2Pre.agg(sum("id")).head().getLong(0) == (1L to 400L).sum)
    assert(dsv2Pre.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s
    }.nonEmpty, "adopted-avro DSv2 read should plan through the V1 bridge")
    // mixed formats: a native parquet append lands next to avro files
    import spark.implicits._
    t.append((401L to 450L).map(i => (i, s"n${i % 7}", i * 2.5))
      .toDF("id", "name", "score"))
    assert(t.scan().count() == 450L)
    assert(t.scan().agg(sum("id")).head().getLong(0) == (1L to 450L).sum)
    // equality deletes apply by VALUE — no row positions needed
    t.deleteWhereEq(Seq(7L, 408L).toDF("id"))
    assert(t.scan().count() == 448L)
    assert(t.scan().filter(col("id").isin(7L, 408L)).count() == 0L)
    // with deletes present DSv2 routes through the V1 bridge (the
    // engine's deletes-applied scan), which reads avro — correct values
    assert(spark.read.format("graft").load(t.location)
      .agg(sum("id")).head().getLong(0) == (1L to 450L).sum - 7L - 408L)
    // CoW delete rewrites affected avro files (into parquet)
    t.deleteWhere(col("id") <= 10L)
    assert(t.scan().count() == 439L)
    assert(t.scan().agg(min("id")).head().getLong(0) == 11L)
    assert(t.countRows() == 439L)
    // compact() migrates the LIVE set to parquet, but retained snapshots
    // still reference avro — the flag stays and time travel keeps
    // bridging; once expiry drops them the vectorized path returns
    val preCompactSnap = t.metadata.currentSnapshotId.get
    t.compact()
    assert(GraftTable.load(spark, t.location).metadata.properties
      .exists(_.get(GraftTable.HasAvroProp).contains("true")),
      "flag must survive compact while avro history is retained")
    // time travel into the avro history still reads (via the bridge)
    assert(spark.read.format("graft")
      .option("snapshot-id", preCompactSnap.toString)
      .load(t.location).count() == 439L)
    t.expireSnapshots(keepLast = 1)
    assert(!GraftTable.load(spark, t.location).metadata.properties
      .exists(_.contains(GraftTable.HasAvroProp)),
      "flag must clear once no retained snapshot references avro")
    val viaDsv2 = spark.read.format("graft").load(t.location)
    assert(viaDsv2.count() == 439L)
    assert(viaDsv2.agg(sum("id")).head().getLong(0) ==
      (11L to 450L).sum - 408L)
    val q = viaDsv2.filter(col("id") > 100L).select("id", "score")
    q.collect()
    assert(q.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.nonEmpty, "post-migration DSv2 read should plan the columnar scan")
  }

  test("position-addressed ops on AVRO files refuse loudly") {
    val dir = buildAvroLayout(200)
    val t = IcebergInterop.adoptTable(spark, dir, tmp("adopted2") + "/t")
    val e = intercept[IllegalArgumentException] {
      t.deleteWhereMoR(col("id") === 5L) }
    assert(e.getMessage.contains("parquet"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      t.deleteWhereDv(col("id") === 5L) }
    assert(e2.getMessage.contains("parquet"))
    val e3 = intercept[IllegalArgumentException] {
      t.scan(withPosColumn = true).count() }
    assert(e3.getMessage.contains("parquet"))
    // the table is untouched by the refused operations
    assert(t.scan().count() == 200L)
    // the _file virtual column works (synthesized by the avro decode)
    val files = t.scan(withFileColumn = true)
      .select(GraftTable.FileCol).distinct().collect().map(_.getString(0))
    assert(files.length == 2 && files.forall(_.endsWith(".avro")), files.toSeq)
  }

  test("streaming read of an adopted AVRO table stages micro-batches") {
    val dir = buildAvroLayout(300)
    val loc = tmp("adoptstream") + "/t"
    val t = IcebergInterop.adoptTable(spark, dir, loc)
    val root = tmp("avstream")
    def drain(): org.apache.spark.sql.DataFrame = {
      val q = spark.readStream.format("graft").load(loc)
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$root/out")
    }
    // first batch covers the adoption snapshot: all-avro, served via
    // range staging (the reader factory cannot decode avro)
    val out1 = drain()
    assert(out1.count() == 300L)
    assert(out1.agg(sum("id")).head().getLong(0) == (1L to 300L).sum)
    // the staged range was dropped on checkpoint commit
    def stagedRanges: Seq[String] = {
      val chRoot = java.nio.file.Paths.get(loc, "_changelog")
      if (!java.nio.file.Files.isDirectory(chRoot)) Seq.empty
      else {
        import scala.jdk.CollectionConverters._
        val w = java.nio.file.Files.walk(chRoot, 2)
        try w.iterator.asScala.filter(d =>
          java.nio.file.Files.isDirectory(d) &&
            d.getFileName.toString.matches("""\d+-\d+""")).map(_.toString)
          .toList
        finally w.close()
      }
    }
    // Spark commits a source's final batch on the NEXT run's startup, so
    // the staged range survives the first drain and is dropped by the
    // second (which stages nothing itself — its range is pure parquet)
    assert(stagedRanges.nonEmpty, "expected the avro range staged")
    // a native (parquet) append flows into the next batch exactly once,
    // through the delegated reader — no staging involved
    import spark.implicits._
    t.append((301L to 320L).map(i => (i, s"n${i % 7}", i * 2.5))
      .toDF("id", "name", "score"))
    val out2 = drain()
    assert(out2.count() == 320L)
    assert(out2.agg(sum("id")).head().getLong(0) == (1L to 320L).sum)
    assert(stagedRanges.isEmpty, s"staged ranges not cleaned: $stagedRanges")
  }

  test("exported manifests carry AVRO file_format; re-export round-trips") {
    val dir = buildAvroLayout(100)
    val t = IcebergInterop.adoptTable(spark, dir, tmp("adopted3") + "/t")
    import spark.implicits._
    t.append(Seq((101L, "x", 1.0)).toDF("id", "name", "score"))
    val out = tmp("reexport")
    IcebergInterop.exportTable(t, out)
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.GenericDatumReader
    import scala.jdk.CollectionConverters._
    val metaDir = java.nio.file.Paths.get(out, "metadata")
    val fmts = java.nio.file.Files.list(metaDir).iterator.asScala
      .filter(_.getFileName.toString.matches("manifest-\\d+\\.avro"))
      .flatMap { p =>
        val r = new DataFileReader[GenericRecord](p.toFile,
          new GenericDatumReader[GenericRecord]())
        try r.iterator.asScala.map(_.get("data_file")
          .asInstanceOf[GenericRecord].get("file_format").toString).toVector
        finally r.close()
      }.toVector
    assert(fmts.count(_ == "AVRO") == 2, s"avro entries lost: $fmts")
    assert(fmts.contains("PARQUET"), s"parquet append lost: $fmts")
    assert(IcebergInterop.readTable(spark, out).count() == 101L)
  }

  test("AvroDataRead refuses multi-branch unions and non-record roots") {
    val writer = new ASchema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"id","type":["null","long","string"],"field-id":1}]}"""
        .stripMargin)
    val dir = tmp("badunion")
    val f = java.nio.file.Paths.get(dir, "part-0.avro")
    writeAvro(f, writer, Seq({
      val r = new GenericData.Record(writer); r.put("id", 1L); r
    }))
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = false, TLong)))
    val e = intercept[Exception] {
      AvroDataRead.read(spark, Seq(f.toString), schema).count() }
    assert(exceptionChain(e).exists(_.getMessage != null) &&
      exceptionChain(e).exists(m => Option(m.getMessage)
        .exists(_.contains("unions"))), e.toString)
  }

  private def exceptionChain(e: Throwable): List[Throwable] =
    e :: Option(e.getCause).map(exceptionChain).getOrElse(Nil)
}
