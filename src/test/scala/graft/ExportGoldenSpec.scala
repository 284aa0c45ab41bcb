package graft

import graft.model._
import graft.table.{GraftTable, IcebergInterop}
import org.apache.spark.sql.functions._

/** Golden-fixture pinning of the Iceberg-layout export.
  *
  * A true second-engine read is IMPOSSIBLE in this container: pyiceberg
  * is not installed and DuckDB's iceberg extension downloads at INSTALL
  * time — both need network, and this environment has zero egress
  * (verified: `INSTALL iceberg` fails with ERROR Connection; re-probed
  * rounds 14, 15 and 16, same result — the round-15/16 probes also
  * confirmed no iceberg-spark-runtime jar under /opt/spark/jars and no
  * pyiceberg / fastavro pip package, so no foreign reader exists in ANY
  * form here).
  * The next
  * best evidence is committed golden fixtures: the export of a FIXED
  * table is canonicalized (volatile ids/paths/timestamps masked) and
  * compared byte-for-byte against files checked into
  * src/test/resources/golden/iceberg-export — any drift in the external
  * format fails here, and an auditor can regenerate the layout and feed
  * it to a real Iceberg reader outside the container.
  *
  * Regenerate after an INTENTIONAL format change with:
  *   GRAFT_REGEN_GOLDEN=true sbt "testOnly graft.ExportGoldenSpec"
  */
class ExportGoldenSpec extends SparkSpec {

  private val goldenDir =
    java.nio.file.Paths.get("src/test/resources/golden/iceberg-export")

  private def buildAndExport(): String = {
    import spark.implicits._
    val df = (0L until 40L)
      .map(i => (i, s"n${i % 7}", i * 1.5)).toDF("id", "name", "score")
    val loc = java.nio.file.Files
      .createTempDirectory("golden-src").toString + "/t"
    val t = GraftTable.create(spark, loc, df.schema,
      partitionBy = Seq(("id", TBucket(2), "id_bucket")))
    t.append(df.coalesce(1), repartitionByPartition = true)
    t.deleteWhereMoR(col("id") === 13L)
    // a LIVE deletion vector travels through the export: pins the v3
    // referenced_data_file/content_offset/content_size_in_bytes fields
    // and (via content_size) the spec roaring blob encoding itself
    t.deleteWhereDv(col("id") === 21L)
    val out = java.nio.file.Files
      .createTempDirectory("golden-out").toString
    IcebergInterop.exportTable(t, out)
    out
  }

  /** Mask volatile content: absolute paths, snapshot ids, uuids,
    * timestamps, file sizes/lengths — structure, names, field ids,
    * partition values, counts, and typed bounds stay.
    */
  private def canon(s: String): String = s
    .replaceAll(""""file_path":\s*"[^"]*/([^/"]+\.(parquet|puffin))"""",
      "\"file_path\": \"<path>/$1\"")
    .replaceAll(""""referenced_data_file":\s*"[^"]*/([^/"]+\.parquet)"""",
      "\"referenced_data_file\": \"<path>/$1\"")
    .replaceAll("""/deletes/dv-[0-9a-f]{8}/""", "/deletes/dv-<write-id>/")
    .replaceAll("""part-[0-9a-f-]{36}\.puffin""", "part-<uuid>.puffin")
    .replaceAll(""""manifest_path":\s*"[^"]*/([^/"]+\.avro)"""",
      "\"manifest_path\": \"<path>/$1\"")
    .replaceAll(""""manifest-list"\s*:\s*"[^"]*"""",
      "\"manifest-list\":\"<path>\"")
    .replaceAll(""""location"\s*:\s*"[^"]*"""", "\"location\":\"<path>\"")
    .replaceAll(""""table-uuid"\s*:\s*"[^"]*"""",
      "\"table-uuid\":\"<uuid>\"")
    .replaceAll("""/data/[0-9a-f]{8}/""", "/data/<write-id>/")
    .replaceAll("""/deletes/[0-9a-f]{8}/""", "/deletes/<write-id>/")
    .replaceAll("""part-\d{5}-[0-9a-f-]{36}""", "part-<n>-<uuid>")
    .replaceAll(""""(snapshot_id|added_snapshot_id|snapshot-id|current-snapshot-id|parent-snapshot-id)"\s*:\s*\d+""",
      "\"$1\": <snap>")
    .replaceAll(""""(timestamp-ms|last-updated-ms)"\s*:\s*\d+""",
      "\"$1\": <ts>")
    .replaceAll(""""(file_size_in_bytes|manifest_length|file-size|added-files-size)"\s*:\s*\d+""",
      "\"$1\": <len>")

  /** The export rendered as deterministic text artifacts. */
  private def artifacts(outDir: String): Map[String, String] = {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._
    val metaPath = IcebergInterop.currentMetadataPath(outDir)
    val metaJson = java.nio.file.Files.readString(metaPath)
    val meta = TableMetadataV2.fromJsonString(metaJson)
    val listPath = java.nio.file.Paths
      .get(meta.currentSnapshot.get.manifestList)
    def open(p: java.nio.file.Path) =
      new DataFileReader[GenericRecord](p.toFile,
        new GenericDatumReader[GenericRecord]())
    val lr = open(listPath)
    val (listSchema, listRows) =
      try (lr.getSchema.toString(true),
        lr.iterator.asScala.map(_.toString).toVector)
      finally lr.close()
    val manifestPaths = listRows.indices.map(i =>
      listPath.getParent.resolve(f"manifest-$i%05d.avro"))
    val mr = open(manifestPaths.head)
    val manifestSchema = try mr.getSchema.toString(true) finally mr.close()
    val entryRows = manifestPaths.flatMap { p =>
      val r = open(p)
      try r.iterator.asScala.map(_.toString).toVector finally r.close()
    }
    Map(
      "metadata.json" -> canon(metaJson),
      "manifest-list-schema.json" -> listSchema,
      "manifest-schema.json" -> manifestSchema,
      "manifest-list-rows.jsonl" -> listRows.map(canon).sorted
        .mkString("\n"),
      "manifest-entries.jsonl" -> entryRows.map(canon).sorted
        .mkString("\n"))
  }

  test("export layout matches the committed golden fixtures byte-for-byte") {
    val got = artifacts(buildAndExport())
    if (sys.env.get("GRAFT_REGEN_GOLDEN").contains("true")) {
      java.nio.file.Files.createDirectories(goldenDir)
      got.foreach { case (name, content) =>
        java.nio.file.Files.writeString(goldenDir.resolve(name), content)
      }
      info(s"regenerated ${got.size} golden fixtures under $goldenDir")
    } else {
      got.foreach { case (name, content) =>
        val gp = goldenDir.resolve(name)
        assert(java.nio.file.Files.exists(gp),
          s"missing golden fixture $gp — run with -Dgraft.regenGolden=true")
        val want = java.nio.file.Files.readString(gp)
        assert(content == want,
          s"$name drifted from golden:\n--- got ---\n$content\n" +
            s"--- want ---\n$want")
      }
    }
  }

  test("golden fixtures carry the spec-required table surface") {
    // independent of the live export: validate the COMMITTED fixtures
    // themselves, so a bad regeneration cannot silently weaken the pin.
    // The golden table carries deletion vectors (a v3-only manifest
    // feature), so its metadata MUST declare format-version 3 — a v2
    // declaration over v3 manifests is a spec-invalid layout
    val meta = java.nio.file.Files.readString(
      goldenDir.resolve("metadata.json"))
    Seq("\"format-version\":3", "\"table-uuid\"", "\"schemas\"",
      "\"partition-specs\"", "\"current-snapshot-id\"", "\"snapshots\"",
      "\"sort-orders\"", "\"last-column-id\"", "\"last-sequence-number\"")
      .foreach(k => assert(meta.contains(k), s"metadata.json missing $k"))
    val listSchema = java.nio.file.Files.readString(
      goldenDir.resolve("manifest-list-schema.json"))
    Seq("manifest_path", "manifest_length", "partition_spec_id",
      "added_snapshot_id", "sequence_number", "min_sequence_number",
      "content").foreach(k =>
      assert(listSchema.contains(k), s"list schema missing $k"))
    val mSchema = java.nio.file.Files.readString(
      goldenDir.resolve("manifest-schema.json"))
    Seq("manifest_entry", "data_file", "file_path", "file_format",
      "partition", "record_count", "lower_bounds", "upper_bounds",
      "equality_ids", "field-id").foreach(k =>
      assert(mSchema.contains(k), s"manifest schema missing $k"))
    // the MoR delete travels: one content=1 (position delete) entry
    val entries = java.nio.file.Files.readString(
      goldenDir.resolve("manifest-entries.jsonl"))
    assert(entries.contains("\"content\": 1"),
      "position-delete entry missing from golden export")
    // the v3 deletion-vector surface travels: spec field names present
    // in the schema with the published ids, and a live DV entry carries
    // its referenced file + blob range + Puffin sidecar path
    Seq("first_row_id", "referenced_data_file", "content_offset",
      "content_size_in_bytes").foreach(k =>
      assert(mSchema.contains(k), s"manifest schema missing v3 field $k"))
    Seq("\"field-id\" : 142", "\"field-id\" : 143", "\"field-id\" : 144",
      "\"field-id\" : 145").foreach(k =>
      assert(mSchema.contains(k), s"manifest schema missing $k"))
    assert(entries.contains(".puffin") &&
      entries.contains("\"content_offset\": 4"),
      "DV entry (Puffin sidecar, blob at offset 4) missing from export")
  }
}
