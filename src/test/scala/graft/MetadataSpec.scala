package graft

import graft.model._
import graft.table.MetadataFixtures
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's serde tests (table.rs/schema.rs/snapshot.rs/
  * sort.rs #[cfg(test)] blocks) as golden JSON roundtrips.
  */
class MetadataSpec extends AnyFunSuite {

  test("full metadata fixture roundtrips exactly") {
    val m1 = TableMetadataV2.fromJsonString(MetadataFixtures.full)
    val m2 = TableMetadataV2.fromJsonString(m1.toJsonString)
    assert(m1 == m2)
    assert(m1.currentSchema.fields.map(_.name) == Seq("id", "ts", "payload"))
    assert(m1.defaultSpec.fields.map(_.transform) == Seq(TDay, TBucket(16)))
    assert(m1.currentSnapshot.map(_.summary.operation) == Some(Some("overwrite")))
    assert(m1.refs.get("v1").retention == TagRetention(1515100955770L))
    assert(m1.sortOrders(1).fields.head.direction == SortAsc)
  }

  test("reference table.rs fixture shape parses (field_type + kebab-case)") {
    // the reference's own test JSON (table.rs:110) uses "field_type"
    val data = """{
      "format-version": 2,
      "table-uuid": "fb072c92-a02b-11e9-ae9c-1bb7bc9eca94",
      "location": "s3://b/wh/data.db/table",
      "last-sequence-number": 1,
      "last-updated-ms": 1515100955770,
      "last-column-id": 1,
      "schemas": [{"schema-id": 1, "type": "struct", "fields": [
        {"id": 1, "name": "struct_name", "required": true,
         "field_type": "fixed[1]"}]}],
      "current-schema-id": 1,
      "partition-specs": [{"spec-id": 1, "fields": [
        {"source-id": 4, "field-id": 1000, "name": "ts_day",
         "transform": "day"}]}],
      "default-spec-id": 1,
      "last-partition-id": 1,
      "properties": {"commit.retry.num-retries": "1"},
      "metadata-log": [{"metadata-file": "s3://bucket/.../v1.json",
        "timestamp-ms": 1515100}],
      "sort-orders": [],
      "default-sort-order-id": 0
    }"""
    val m = TableMetadataV2.fromJsonString(data)
    assert(m.currentSchema.fields.head.fieldType == TFixed(1))
    val again = TableMetadataV2.fromJsonString(m.toJsonString)
    assert(m == again)
  }

  test("invalid table uuid rejected (table.rs:171)") {
    val bad = """{"format-version": 2, "table-uuid": "xxxx", "location": "l",
      "last-sequence-number": 0, "last-updated-ms": 0, "last-column-id": 0,
      "schemas": [], "current-schema-id": 0, "partition-specs": [],
      "default-spec-id": 0, "last-partition-id": 0, "sort-orders": [],
      "default-sort-order-id": 0}"""
    intercept[IllegalArgumentException](TableMetadataV2.fromJsonString(bad))
  }

  test("format-version 1 rejected (table.rs:182)") {
    intercept[IllegalArgumentException](
      TableMetadataV2.fromJsonString("""{"format-version": 1}"""))
  }

  test("primitive type string forms (schema.rs PrimitiveType)") {
    assert(IceType.parsePrimitive("decimal(9,2)") == TDecimal(9, 2))
    assert(IceType.parsePrimitive("fixed[16]") == TFixed(16))
    assert(IceType.parsePrimitive("timestampz") == TTimestamptz)
    assert(TDecimal(9, 2).render == "decimal(9,2)")
    intercept[IllegalArgumentException](IceType.parsePrimitive("decimal(9;2)"))
    intercept[IllegalArgumentException](IceType.parsePrimitive("nope"))
  }

  test("transform string forms (partition.rs Transform)") {
    assert(Transform.parse("bucket[4]") == TBucket(4))
    assert(Transform.parse("truncate[10]") == TTruncate(10))
    assert(Transform.parse("day") == TDay)
    assert(TBucket(4).render == "bucket[4]")
    intercept[IllegalArgumentException](Transform.parse("bucket[]"))
  }

  test("ColStats: explicit JSON null min/max parse as None, never \"null\"") {
    // executor-written shard manifests can carry explicit nulls; parsing
    // them as the STRING "null" poisoned min/max pruning (r5 fix)
    val cs = graft.table.ColStats.fromJson(
      Json.parse("""{"min":null,"max":null,"nulls":3}"""))
    assert(cs == graft.table.ColStats(None, None, 3L))
    val present = graft.table.ColStats.fromJson(
      Json.parse("""{"min":"a","max":"z","nulls":0}"""))
    assert(present == graft.table.ColStats(Some("a"), Some("z"), 0L))
  }

  test("sort field fixture (sort.rs:62)") {
    val f = SortField.fromJson(Json.parse(
      """{"transform": "bucket[4]", "source-id": 3, "direction": "desc",
         "null-order": "nulls-last"}"""))
    assert(f == SortField(3, TBucket(4), SortDesc, NullsLast))
  }

  test("branch and tag refs roundtrip (snapshot.rs:118,131)") {
    val tag = SnapshotRef.fromJson(Json.parse(
      """{"snapshot-id": 3051729675574597004, "type": "tag",
         "max-ref-age-ms": 1515100955770}"""))
    assert(tag.retention == TagRetention(1515100955770L))
    val branch = SnapshotRef.fromJson(Json.parse(
      """{"snapshot-id": 1, "type": "branch", "min-snapshots-to-keep": 1,
         "max-snapshot-age-ms": 2, "max-ref-age-ms": 3}"""))
    assert(branch.retention == BranchRetention(1, 2L, 3L))
    assert(SnapshotRef.fromJson(Json.parse(Json.write(branch.toJson))) == branch)
  }

  test("snapshot summary keeps free-form keys (snapshot.rs:100)") {
    val s = SnapshotV2.fromJson(Json.parse(
      """{"snapshot-id": 3051729675574597004, "sequence-number": 1,
         "timestamp-ms": 1515100955770,
         "summary": {"operation": "append", "added-files": "7"},
         "manifest-list": "s3://b/wh/.../s1.avro", "schema-id": 0}"""))
    assert(s.summary.operation == Some("append"))
    assert(s.summary.other == Map("added-files" -> "7"))
    intercept[IllegalArgumentException](Summary(Some("bogus")))
  }

  test("v3 defaults serialize as JSON single-values, parse both forms") {
    // spec: an int default 5 is the JSON number 5 (not the string "5");
    // booleans are JSON literals; strings/dates keep the string form
    def fld(id: Int, n: String, t: IceType, d: String) =
      StructField(id, n, required = false, t, initialDefault = Some(d),
        writeDefault = Some(d))
    val s = SchemaV2(0, None, None, Seq(
      fld(1, "i", TInt, "5"), fld(2, "l", TLong, "9000000000"),
      fld(3, "f", TFloat, "1.5"), fld(4, "d", TDouble, "2.25"),
      fld(5, "b", TBoolean, "true"), fld(6, "s", TString, "hi"),
      fld(7, "dt", TDate, "2024-01-02")))
    val json = Json.write(s.toJson)
    assert(json.contains(""""initial-default":5"""), json)
    assert(json.contains(""""initial-default":9000000000"""))
    assert(json.contains(""""initial-default":1.5"""))
    assert(json.contains(""""initial-default":2.25"""))
    assert(json.contains(""""initial-default":true"""))
    assert(json.contains(""""initial-default":"hi""""))
    assert(json.contains(""""initial-default":"2024-01-02""""))
    // roundtrip: native JSON values parse back to the string rendering
    val back = SchemaV2.fromJson(Json.parse(json))
    assert(back.fields.map(_.initialDefault) == s.fields.map(_.initialDefault))
    // legacy string-rendered numerics (what graft wrote before) still parse
    val legacy = SchemaV2.fromJson(Json.parse(
      """{"schema-id":0,"type":"struct","fields":[
         {"id":1,"name":"i","required":false,"type":"int",
          "initial-default":"5"}]}"""))
    assert(legacy.fields.head.initialDefault == Some("5"))
  }

  test("format-version 3 declared whenever any v3 feature is present") {
    val base = TableMetadataV2.fromJsonString(MetadataFixtures.full)
    assert(base.effectiveFormatVersion == 2)
    // row lineage → v3
    assert(base.copy(nextRowId = Some(10L)).effectiveFormatVersion == 3)
    // a column default anywhere in any schema → v3
    val s = base.currentSchema
    val withDef = s.copy(fields = s.fields.map(f =>
      if (f.name == "payload") f.copy(writeDefault = Some("x")) else f))
    assert(base.copy(schemas = base.schemas.map(x =>
        if (x.schemaId == s.schemaId) withDef else x))
      .effectiveFormatVersion == 3)
    // the sticky DV floor: a parsed v3 declaration never decays to 2,
    // even with no lineage/default markers in this particular JSON
    val v3Json = base.copy(formatVersion = 3).toJsonString
    assert(v3Json.contains("\"format-version\":3"))
    val reparsed = TableMetadataV2.fromJsonString(v3Json)
    assert(reparsed.effectiveFormatVersion == 3)
    // defaults hide in every nested position externally-authored
    // metadata can put them: map values and doubly-nested lists
    val inMap = StructField(10, "m", required = false,
      TMap(11, TString, 12, valueRequired = false,
        TStruct(Seq(StructField(13, "x", required = false, TInt,
          writeDefault = Some("1"))))))
    val inListList = StructField(20, "ll", required = false,
      TList(21, elementRequired = false, TList(22,
        elementRequired = false,
        TStruct(Seq(StructField(23, "y", required = false, TInt,
          initialDefault = Some("2")))))))
    Seq(inMap, inListList).foreach { f =>
      val s2 = base.currentSchema.copy(fields =
        base.currentSchema.fields :+ f)
      assert(base.copy(schemas = base.schemas.map(x =>
          if (x.schemaId == s2.schemaId) s2 else x))
        .effectiveFormatVersion == 3,
        s"default nested under ${f.name} must force v3")
    }
  }
}
