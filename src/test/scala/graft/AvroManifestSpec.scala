package graft

import graft.model._
import graft.table.{AvroManifest, ColStats, DataFileEntry, GraftTable}
import org.apache.spark.sql.functions._

/** Golden-fixture validation of the Iceberg-spec Avro manifest export:
  * field names/ids match the published spec constants, and entries
  * roundtrip byte-exactly (no external Iceberg reader installs in this
  * container — pyiceberg and DuckDB's iceberg extension both need
  * network — so the shape is pinned here instead).
  */
class AvroManifestSpec extends SparkSpec {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$name")

  test("manifest_entry / manifest_file schemas carry the spec field ids") {
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = true, TLong),
      StructField(2, "v", required = false, TString)))
    val spec = PartitionSpec(1,
      Seq(PartitionField(1, 1000, "id_bucket", TBucket(4))))
    val s = AvroManifest.entrySchema(spec, schema)
    def fid(f: org.apache.avro.Schema.Field): Int =
      f.getObjectProp("field-id").asInstanceOf[Number].intValue
    assert(fid(s.getField("status")) == 0)
    assert(fid(s.getField("snapshot_id")) == 1)
    assert(fid(s.getField("data_file")) == 2)
    assert(fid(s.getField("sequence_number")) == 3)
    assert(fid(s.getField("file_sequence_number")) == 4)
    val df = s.getField("data_file").schema()
    assert(fid(df.getField("file_path")) == 100)
    assert(fid(df.getField("file_format")) == 101)
    assert(fid(df.getField("partition")) == 102)
    assert(fid(df.getField("record_count")) == 103)
    assert(fid(df.getField("file_size_in_bytes")) == 104)
    assert(fid(df.getField("null_value_counts")) == 110)
    assert(fid(df.getField("lower_bounds")) == 125)
    assert(fid(df.getField("upper_bounds")) == 128)
    assert(fid(df.getField("content")) == 134)
    assert(fid(df.getField("equality_ids")) == 135)
    val part = df.getField("partition").schema()
    assert(fid(part.getField("id_bucket")) == 1000)
    val ls = AvroManifest.listSchema
    assert(fid(ls.getField("manifest_path")) == 500)
    assert(fid(ls.getField("manifest_length")) == 501)
    assert(fid(ls.getField("partition_spec_id")) == 502)
    assert(fid(ls.getField("added_snapshot_id")) == 503)
    assert(fid(ls.getField("added_files_count")) == 504)
    assert(fid(ls.getField("added_rows_count")) == 512)
    assert(fid(ls.getField("sequence_number")) == 515)
    assert(fid(ls.getField("min_sequence_number")) == 516)
    assert(fid(ls.getField("content")) == 517)
  }

  test("v3 fields carry spec ids 142-145; DV + first_row_id roundtrip") {
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = true, TLong)))
    val spec = PartitionSpec.unpartitioned
    val s = AvroManifest.entrySchema(spec, schema)
    def fid(f: org.apache.avro.Schema.Field): Int =
      f.getObjectProp("field-id").asInstanceOf[Number].intValue
    val df = s.getField("data_file").schema()
    assert(fid(df.getField("first_row_id")) == 142)
    assert(fid(df.getField("referenced_data_file")) == 143)
    assert(fid(df.getField("content_offset")) == 144)
    assert(fid(df.getField("content_size_in_bytes")) == 145)
    // a lineage data entry and a deletion-vector entry round-trip; the
    // referenced data file exports decoded and re-encodes to the raw
    // URI join form on read
    val eData = DataFileEntry("/data/a.parquet", 100L, 42L, 7L, 0,
      Map.empty, Map.empty, firstRowId = Some(12345L))
    val eDv = DataFileEntry("/deletes/s.puffin", 3L, 42L, 7L, 0,
      Map.empty, Map.empty, content = 1, fileSize = 99L,
      dv = Some(graft.table.Dv.DvRef("file:/data/a.parquet", 4L, 42L)))
    val p = tmp("avro-v3").resolve("m.avro")
    AvroManifest.writeManifest(p, Seq(eData, eDv), schema, spec, 42L, 0)
    assert(AvroManifest.readManifest(p) ==
      Seq(eData, eDv).map(_.copy(specId = Some(spec.specId))))
  }

  test("entries roundtrip through spec-shaped Avro with typed bounds") {
    val schema = SchemaV2(3, None, None, Seq(
      StructField(1, "i", required = true, TInt),
      StructField(2, "l", required = true, TLong),
      StructField(3, "f", required = false, TFloat),
      StructField(4, "d", required = false, TDouble),
      StructField(5, "s", required = false, TString),
      StructField(6, "dt", required = false, TDate),
      StructField(7, "ts", required = false, TTimestamp)))
    val spec = PartitionSpec(1,
      Seq(PartitionField(2, 1000, "l_bucket", TBucket(8))))
    val e1 = DataFileEntry("/data/a.parquet", 100L, 42L, 7L, 3,
      Map("l_bucket" -> Some("3")),
      Map(
        "i" -> ColStats(Some("-5"), Some("17"), 0L),
        "l" -> ColStats(Some("100"), Some("900"), 1L),
        "f" -> ColStats(Some("0.25"), Some("2.5"), 2L),
        "d" -> ColStats(Some("-1.5"), Some("3.75"), 0L),
        "s" -> ColStats(Some("aardvark"), Some("zebra"), 3L),
        "dt" -> ColStats(Some("2024-01-31"), Some("2024-12-01"), 0L),
        "ts" -> ColStats(Some("2024-01-31 12:34:56.789000"),
          Some("2024-12-01 00:00:00.000000"), 0L)),
      fileSize = 4096L)
    // a null partition value, no stats, equality-delete columns
    val e2 = DataFileEntry("/data/b.parquet", 50L, 41L, 6L, 3,
      Map("l_bucket" -> None), Map.empty, content = 2, fileSize = 99L,
      eqColumns = Seq("i", "s"))
    val p = tmp("avro-rt").resolve("m.avro")
    val len = AvroManifest.writeManifest(p, Seq(e1, e2), schema, spec, 42L, 0)
    assert(len > 0L && java.nio.file.Files.size(p) == len)
    // readback stamps the manifest's spec id on every entry
    assert(AvroManifest.readManifest(p) ==
      Seq(e1, e2).map(_.copy(specId = Some(spec.specId))))
  }

  test("'partition-spec' metadata is the bare fields array; legacy object form still reads") {
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    import scala.jdk.CollectionConverters._
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = true, TLong)))
    val spec = PartitionSpec(1,
      Seq(PartitionField(1, 1000, "id_bucket", TBucket(4))))
    val e = DataFileEntry("/data/a.parquet", 10L, 1L, 1L, 0,
      Map("id_bucket" -> Some("2")), Map.empty, fileSize = 1L)
    val dir = tmp("avro-specmeta")
    val p = dir.resolve("m.avro")
    AvroManifest.writeManifest(p, Seq(e), schema, spec, 1L, 0)

    // The spec defines this key as the JSON FIELDS list (the id travels in
    // 'partition-spec-id'); external readers such as pyiceberg parse it as
    // a field array and would fail on a wrapped {"spec-id":..} object.
    val r = new DataFileReader[GenericRecord](p.toFile,
      new GenericDatumReader[GenericRecord]())
    val (rawSpec, rawSchema, recs, aschema) = try {
      (new String(r.getMeta("partition-spec"), "UTF-8"),
        r.getMetaString("schema"),
        r.iterator.asScala.toList, r.getSchema)
    } finally r.close()
    val node = Json.parse(rawSpec)
    assert(node.isArray, s"expected bare fields array, got $rawSpec")
    assert(node == spec.toJson.path("fields"))
    assert(AvroManifest.readManifest(p) ==
      Seq(e.copy(specId = Some(spec.specId))))

    // pre-fix exports carried the whole spec object — must still read
    val p2 = dir.resolve("legacy.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](aschema))
    w.setMeta("schema", rawSchema)
    w.setMeta("partition-spec", Json.write(spec.toJson))
    w.setMeta("partition-spec-id", spec.specId.toString)
    w.create(aschema, p2.toFile)
    try recs.foreach(w.append) finally w.close()
    assert(AvroManifest.readManifest(p2) ==
      Seq(e.copy(specId = Some(spec.specId))))
  }

  test("exported files read with the PLAIN Avro library: embedded schema, v2 metadata, field-ids") {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import scala.jdk.CollectionConverters._
    // independent-reader evidence: everything below decodes the exported
    // bytes with org.apache.avro generic classes only — the embedded
    // writer schema, not graft's — so any Avro-based Iceberg reader
    // parses the same structures
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(300)
    val t = GraftTable.create(spark, tmp("avro-ind").toString + "/t",
      src.schema,
      partitionBy = Seq(("l_orderkey", TBucket(4), "key_bucket")))
    t.append(src, repartitionByPartition = true)
    val listPath = t.exportAvro(tmp("avro-ind-out").toString)
    def openGeneric(p: java.nio.file.Path) =
      new DataFileReader[GenericRecord](p.toFile,
        new GenericDatumReader[GenericRecord]())
    def fid(s: org.apache.avro.Schema, name: String): Int =
      s.getField(name).getObjectProp("field-id")
        .asInstanceOf[Number].intValue
    // manifest list: embedded schema carries the spec list field-ids
    val lr = openGeneric(listPath)
    val listRecs = try lr.iterator.asScala.toVector finally lr.close()
    assert(listRecs.nonEmpty)
    val lSchema = listRecs.head.getSchema
    assert(fid(lSchema, "manifest_path") == 500)
    assert(fid(lSchema, "manifest_length") == 501)
    assert(fid(lSchema, "added_snapshot_id") == 503)
    assert(fid(lSchema, "sequence_number") == 515)
    listRecs.foreach { r =>
      val mPath = java.nio.file.Paths.get(r.get("manifest_path").toString)
      assert(java.nio.file.Files.size(mPath) ==
        r.get("manifest_length").asInstanceOf[Long])
      val mr = openGeneric(mPath)
      // spec-required v2 file metadata keys, written per manifest
      val meta = Seq("schema", "partition-spec", "partition-spec-id",
        "format-version", "content")
      meta.foreach(k => assert(mr.getMetaString(k) != null,
        s"manifest missing required metadata key $k"))
      assert(mr.getMetaString("format-version") == "2")
      val recs = try mr.iterator.asScala.toVector finally mr.close()
      assert(recs.nonEmpty)
      val eSchema = recs.head.getSchema
      assert(fid(eSchema, "status") == 0)
      assert(fid(eSchema, "data_file") == 2)
      val dfSchema = eSchema.getField("data_file").schema()
      assert(fid(dfSchema, "file_path") == 100)
      assert(fid(dfSchema, "record_count") == 103)
      recs.foreach { rec =>
        val df = rec.get("data_file").asInstanceOf[GenericRecord]
        assert(df.get("file_path").toString.endsWith(".parquet"))
        assert(df.get("file_format").toString == "PARQUET")
        assert(df.get("record_count").asInstanceOf[Long] > 0L)
        // hidden-partition value present under the spec'd field name
        val part = df.get("partition").asInstanceOf[GenericRecord]
        assert(part.getSchema.getField("key_bucket") != null)
      }
    }
  }

  test("distributed export (above planning threshold) reads back file-for-file") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(400)
    val t = GraftTable.create(spark, tmp("avro-dist").toString + "/t",
      src.schema,
      partitionBy = Seq(("l_orderkey", TBucket(4), "key_bucket")))
    t.append(src, repartitionByPartition = true)
    t.append(src.limit(120))
    t.deleteWhereMoR(col("l_linenumber") === 1) // delete manifest travels
    spark.conf.set("spark.graft.distributedPlanningThreshold", "1")
    val listPath =
      try t.exportAvro(tmp("avro-dist-out").toString)
      finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
    val manifests = AvroManifest.readManifestList(listPath)
    assert(manifests.nonEmpty)
    val back = manifests.flatMap { case (p, len, _) =>
      val path = java.nio.file.Paths.get(p)
      assert(java.nio.file.Files.size(path) == len)
      AvroManifest.readManifest(path)
    }
    val live = t.liveEntries()
    assert(back.map(_.path).sorted == live.map(_.path).sorted)
    assert(back.map(_.recordCount).sum == live.map(_.recordCount).sum)
    assert(back.count(_.content == 1) == live.count(_.content == 1),
      "position-delete manifest lost in the distributed export")
    val byPath = back.map(e => e.path -> e).toMap
    live.foreach { e =>
      val b = byPath(e.path)
      // data entries roundtrip their partition tuple exactly; a
      // partition-LESS delete entry exports under the table's spec with
      // null partition values (same as the driver path), so only the
      // defined values must survive
      if (e.isData) assert(b.partition == e.partition)
      else assert(b.partition.filter(_._2.isDefined) ==
        e.partition.filter(_._2.isDefined))
      assert(b.sequenceNumber == e.sequenceNumber)
      assert(b.stats.get("l_orderkey") == e.stats.get("l_orderkey"))
    }
  }

  test("exportAvro: a live table's snapshot reads back file-for-file") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(500)
    val t = GraftTable.create(spark, tmp("avro-exp").toString + "/t",
      src.schema,
      partitionBy = Seq(("l_orderkey", TBucket(4), "key_bucket")))
    t.append(src, repartitionByPartition = true)
    t.append(src.limit(100))
    val listPath = t.exportAvro(tmp("avro-out").toString)
    val manifests = AvroManifest.readManifestList(listPath)
    assert(manifests.nonEmpty)
    val back = manifests.flatMap { case (p, len, _) =>
      val path = java.nio.file.Paths.get(p)
      assert(java.nio.file.Files.size(path) == len)
      AvroManifest.readManifest(path)
    }
    val live = t.liveEntries()
    assert(back.map(_.path).sorted == live.map(_.path).sorted)
    assert(back.map(_.recordCount).sum == live.map(_.recordCount).sum)
    val byPath = back.map(e => e.path -> e).toMap
    live.foreach { e =>
      val b = byPath(e.path)
      assert(b.partition == e.partition)
      assert(b.sequenceNumber == e.sequenceNumber)
      assert(b.snapshotId == e.snapshotId)
      assert(b.fileSize == e.fileSize)
      // representative typed bounds survive the binary encoding
      assert(b.stats.get("l_orderkey") == e.stats.get("l_orderkey"))
      assert(b.stats.get("l_comment") == e.stats.get("l_comment"))
    }
  }
}
