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
}
