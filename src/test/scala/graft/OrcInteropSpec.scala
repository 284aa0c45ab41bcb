package graft

import graft.model._
import graft.table.{AvroManifest, DataFileEntry, GraftTable, IcebergInterop}
import org.apache.spark.sql.functions._

/** ORC data files through the interop surface: the public Iceberg spec
  * admits `file_format` AVRO/ORC/PARQUET, and an external table holding
  * ORC files used to be silently scanned as parquet. Scans, equality
  * deletes, and CoW rewrites (which re-cluster into parquet) now work;
  * position-addressed reads (MoR position deletes, _pos, lineage)
  * refuse loudly — ORC has no `_metadata.row_index` in this Spark.
  *
  * The external layout is HAND-BUILT here (graft's own writer emits
  * parquet only): ORC files written by plain Spark, spec Avro manifests
  * + manifest list, and metadata JSON.
  */
class OrcInteropSpec extends SparkSpec {

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(s"orc-$n").toString

  /** Build an external Iceberg layout whose data files are ORC. */
  private def buildOrcLayout(nRows: Int): (String, Long) = {
    import spark.implicits._
    val dir = tmp("layout")
    val dataDir = java.nio.file.Paths.get(dir, "data")
    java.nio.file.Files.createDirectories(dataDir)
    (1 to nRows).map(i => (i.toLong, s"n${i % 7}", i * 2.5))
      .toDF("id", "name", "score")
      .repartition(2).write.orc(dataDir.toString + "/files")
    val orcFiles = java.nio.file.Files
      .walk(java.nio.file.Paths.get(dataDir.toString, "files"))
      .iterator()
    val paths = scala.jdk.CollectionConverters
      .IteratorHasAsScala(orcFiles).asScala
      .filter(_.getFileName.toString.endsWith(".orc")).toSeq.sortBy(_.toString)
    assert(paths.size >= 2)
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = false, TLong),
      StructField(2, "name", required = false, TString),
      StructField(3, "score", required = false, TDouble)))
    val snapId = 7777L
    val entries = paths.map { p =>
      val rc = spark.read.orc(p.toString).count()
      DataFileEntry(p.toString, rc, snapId, 1L, 0, Map.empty, Map.empty,
        content = 0, fileSize = java.nio.file.Files.size(p),
        specId = Some(0), format = DataFileEntry.Orc)
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
      lastColumnId = 3,
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
    (dir, snapId)
  }

  test("external ORC table reads correctly (not parsed as parquet)") {
    val (dir, _) = buildOrcLayout(500)
    val df = IcebergInterop.readTable(spark, dir)
    assert(df.count() == 500L)
    assert(df.agg(sum("id")).head().getLong(0) == (1L to 500L).sum)
    assert(df.filter(col("name") === "n3").count() ==
      (1 to 500).count(_ % 7 == 3))
  }

  test("adopted ORC table: scan, append, eq-delete, CoW all work") {
    val (dir, _) = buildOrcLayout(400)
    val t = IcebergInterop.adoptTable(spark, dir, tmp("adopted") + "/t")
    assert(t.scan().count() == 400L)
    // mixed formats: a native parquet append lands next to orc files
    import spark.implicits._
    t.append((401L to 450L).map(i => (i, s"n${i % 7}", i * 2.5))
      .toDF("id", "name", "score"))
    assert(t.scan().count() == 450L)
    assert(t.scan().agg(sum("id")).head().getLong(0) == (1L to 450L).sum)
    // equality deletes apply by VALUE — no row positions needed
    t.deleteWhereEq(Seq(7L, 408L).toDF("id"))
    assert(t.scan().count() == 448L)
    assert(t.scan().filter(col("id").isin(7L, 408L)).count() == 0L)
    // CoW delete rewrites affected orc files (into parquet) — allowed
    // (ids 1..10 minus the already-eq-deleted 7 = 9 more rows gone)
    t.deleteWhere(col("id") <= 10L)
    assert(t.scan().count() == 439L)
    assert(t.scan().agg(min("id")).head().getLong(0) == 11L)
    assert(t.countRows() == 439L)
  }

  test("position-addressed ops on ORC files refuse loudly") {
    val (dir, _) = buildOrcLayout(200)
    val t = IcebergInterop.adoptTable(spark, dir, tmp("adopted2") + "/t")
    val e = intercept[IllegalArgumentException] {
      t.deleteWhereMoR(col("id") === 5L) }
    assert(e.getMessage.contains("parquet"),
      s"MoR refusal must explain the parquet requirement: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      t.deleteWhereDv(col("id") === 5L) }
    assert(e2.getMessage.contains("parquet"))
    // _pos scans refuse too
    val e3 = intercept[IllegalArgumentException] {
      t.scan(withPosColumn = true).count() }
    assert(e3.getMessage.contains("parquet"))
    // the table is untouched by the refused operations
    assert(t.scan().count() == 200L)
  }

  test("DSv2 delegates adopted ORC scans to Spark's vectorized reader") {
    val (dir, _) = buildOrcLayout(300)
    val t = IcebergInterop.adoptTable(spark, dir, tmp("adopted5") + "/t")
    // COUNT(*) stays metadata-only (no file ever opens)
    assert(spark.read.format("graft").load(t.location).count() == 300L)
    // plain row reads now go through Spark's vectorized ORC FileFormat
    // inside the same DSv2 scan — values correct, plan COLUMNAR
    val df = spark.read.format("graft").load(t.location)
    val agg = df.agg(sum("id"))
    // collect() (not head(), which re-plans under a limit) so THIS
    // queryExecution runs and AQE finalizes the inspected plan
    assert(agg.collect().head.getLong(0) == (1L to 300L).sum)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"adopted-orc DSv2 scan should plan columnar:\n$plan")
    assert(df.filter(col("name") === "n3").count() ==
      (1 to 300).count(_ % 7 == 3))
    // mixed formats: a native parquet append lands next to the orc
    // files and ONE DSv2 scan reads both (schema, format) groups
    import spark.implicits._
    t.append((301L to 320L).map(i => (i, s"n${i % 7}", i * 2.5))
      .toDF("id", "name", "score"))
    val mixed = spark.read.format("graft").load(t.location)
    assert(mixed.count() == 320L)
    assert(mixed.agg(sum("id")).head().getLong(0) == (1L to 320L).sum)
    // position-addressed DSv2 reads stay parquet-only: refuse on the
    // driver with a message naming the requirement, never inside a task
    val e = intercept[Exception] {
      spark.read.format("graft").load(t.location)
        .select(col("id"), col("_pos")).collect() }
    assert(e.getMessage.contains("parquet"), e.getMessage)
  }

  test("unknown data-file formats refuse with a clear message") {
    val (dir, _) = buildOrcLayout(50)
    // rewrite the adopted manifest to claim a format this build has no
    // reader for (avro now reads via AvroDataRead — see AvroInteropSpec)
    val t = IcebergInterop.adoptTable(spark, dir, tmp("adopted3") + "/t")
    val mf = t.liveManifests(None).head
    val entries = mf.entries.map(_.copy(format = "feather"))
    DataFileEntry.writeManifest(
      java.nio.file.Paths.get(mf.path), entries)
    val e = intercept[IllegalArgumentException] { t.scan().count() }
    assert(e.getMessage.contains("feather"),
      s"must name the unsupported format: ${e.getMessage}")
  }

  test("non-parquet position-DELETE files refuse (correctness-bearing)") {
    // forge a delete manifest claiming an ORC position-delete file —
    // an external layout may declare one; misreading it as parquet
    // would silently resurrect or drop rows
    import spark.implicits._
    val df = (1L to 80L).map(i => (i, s"n${i % 7}", i * 2.5))
      .toDF("id", "name", "score")
    val t = GraftTable.create(spark, tmp("posdel") + "/t", df.schema)
    t.append(df)
    t.deleteWhereMoR(col("id") <= 5L)
    val delMf = t.liveManifests(None).find(_.content == 1).get
    DataFileEntry.writeManifest(
      java.nio.file.Paths.get(delMf.path),
      delMf.entries.map(_.copy(format = DataFileEntry.Orc)))
    val e = intercept[IllegalArgumentException] { t.scan().count() }
    assert(e.getMessage.contains("position-delete") &&
      e.getMessage.contains("orc"), e.getMessage)
  }

  test("exported manifests carry the true file_format per entry") {
    val (dir, _) = buildOrcLayout(100)
    val t = IcebergInterop.adoptTable(spark, dir, tmp("adopted4") + "/t")
    import spark.implicits._
    t.append(Seq((101L, "x", 1.0)).toDF("id", "name", "score"))
    val out = tmp("reexport")
    IcebergInterop.exportTable(t, out)
    // read back the exported Avro manifests with the plain library
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
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
    assert(fmts.count(_ == "ORC") >= 2, s"orc entries lost: $fmts")
    assert(fmts.contains("PARQUET"), s"parquet append lost: $fmts")
    // and the re-exported layout round-trips through the external read
    assert(IcebergInterop.readTable(spark, out).count() == 101L)
  }
}
