package graft

import graft.model._
import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Nested types end-to-end (reference schema.rs:170-243): struct/list/
  * map columns write, evolve IN PLACE (field-id semantics inside the
  * struct), prune, and read back identically through the native scan
  * and the public DSv2 connector.
  */
class NestedTypesSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def nestedDf(from: Long, until: Long) =
    spark.range(from, until).select(
      col("id"),
      when(col("id") % 10 =!= 9,
        struct(col("id").as("a"), (col("id") * 2).as("b")))
        .as("info"),
      array(col("id") % 3, col("id") % 5).as("tags"),
      map(lit("k"), col("id").cast("string")).as("attrs"))

  test("struct/list/map roundtrip through BOTH read paths") {
    val df = nestedDf(0, 100)
    val t = GraftTable.create(spark, freshLoc("nested-rt"), df.schema)
    t.append(df)
    val want = df.select(col("id"), col("info.a"), col("info.b"),
      element_at(col("tags"), 2), element_at(col("attrs"), "k"))
      .orderBy("id").collect().toSeq
    def got(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("info.a"), col("info.b"),
        element_at(col("tags"), 2), element_at(col("attrs"), "k"))
        .orderBy("id").collect().toSeq
    assert(got(t.scan()) == want)
    assert(got(spark.read.format("graft").load(t.location)) == want)
    // null structs stay null through both paths
    assert(t.scan().filter(col("info").isNull).count() == 10)
    assert(spark.read.format("graft").load(t.location)
      .filter(col("info").isNull).count() == 10)
  }

  test("evolution inside a struct: rename resolves, add null-fills by id") {
    val old = nestedDf(0, 50)
    val t = GraftTable.create(spark, freshLoc("nested-evo"), old.schema)
    t.append(old)
    t.addColumn("info.c", DoubleType)
    t.renameColumn("info.b", "twice")
    val evolved = spark.range(50, 80).select(
      col("id"),
      struct(col("id").as("a"), (col("id") * 2).as("twice"),
        (col("id") * 0.5).as("c")).as("info"),
      array(col("id") % 3, col("id") % 5).as("tags"),
      map(lit("k"), col("id").cast("string")).as("attrs"))
    t.append(evolved)
    def check(d: org.apache.spark.sql.DataFrame): Unit = {
      val rows = d.select(col("id"), col("info.a").as("a"),
        col("info.twice").as("twice"), col("info.c").as("c"))
        .orderBy("id").collect()
      assert(rows.length == 80)
      rows.foreach { r =>
        val id = r.getLong(0)
        if (id % 10 == 9 && id < 50) assert(r.isNullAt(1) && r.isNullAt(2))
        else {
          // renamed subfield carries the OLD files' values (id-based)
          assert(r.getLong(2) == id * 2, s"twice broken at $id")
          // added subfield: null for old files, real for new
          if (id < 50) assert(r.isNullAt(3), s"expected null c at $id")
          else assert(r.getDouble(3) == id * 0.5)
        }
      }
      // null structs from the old shape survive the realign
      assert(d.filter(col("info").isNull).count() == 5)
    }
    check(t.scan())
    check(spark.read.format("graft").load(t.location))
  }

  test("recursive field lookup: nested ids and dotted paths resolve") {
    val df = nestedDf(0, 10)
    val t = GraftTable.create(spark, freshLoc("nested-look"), df.schema)
    val s = t.metadata.currentSchema
    val a = s.fieldByName("info.a")
    assert(a.isDefined && a.get.fieldType == TLong)
    assert(s.fieldById(a.get.id).contains(a.get))
    assert(s.fieldByName("info.nope").isEmpty)
    assert(s.fieldByName("tags").isDefined)
    // every STRUCT FIELD id resolves (list/map element ids are not
    // fields and stay unresolvable)
    def fieldIds(fs: Seq[StructField]): Seq[Int] = fs.flatMap { f =>
      f.id +: (f.fieldType match {
        case TStruct(n) => fieldIds(n)
        case TList(_, _, TStruct(n)) => fieldIds(n)
        case _ => Seq.empty
      })
    }
    fieldIds(s.fields).foreach(id =>
      assert(s.fieldById(id).isDefined, s"field id $id"))
  }

  test("nested struct stats prune files like top-level ones") {
    val t = GraftTable.create(spark, freshLoc("nested-prune"),
      nestedDf(0, 1).schema)
    t.append(nestedDf(0, 100).coalesce(1))
    t.append(nestedDf(1000, 1100).coalesce(1))
    val planned = t.planFiles(Some(col("info.a") === 1050L))
    assert(planned.size == 1,
      s"struct-field filter must prune to 1 file, got ${planned.size}")
    assert(t.scan(Some(col("info.a") === 1050L)).count() == 1)
  }

  test("nested addColumn allocates unique ids for every element") {
    val df = nestedDf(0, 5)
    val t = GraftTable.create(spark, freshLoc("nested-add"), df.schema)
    t.addColumn("extra", new org.apache.spark.sql.types.StructType()
      .add("x", LongType).add("y", new org.apache.spark.sql.types
        .StructType().add("z", DoubleType)))
    val s = t.metadata.currentSchema
    assert(s.fieldByName("extra.x").isDefined)
    assert(s.fieldByName("extra.y.z").isDefined)
    // ids unique across the whole tree
    def ids(fs: Seq[StructField]): Seq[Int] = fs.flatMap { f =>
      f.id +: (f.fieldType match {
        case TStruct(n) => ids(n)
        case TList(i, _, el) => i +: (el match {
          case TStruct(n) => ids(n); case _ => Seq.empty })
        case TMap(ki, _, vi, _, _) => Seq(ki, vi)
        case _ => Seq.empty
      })
    }
    val all = ids(s.fields)
    assert(all.distinct.size == all.size, s"duplicate ids in $all")
  }
}
