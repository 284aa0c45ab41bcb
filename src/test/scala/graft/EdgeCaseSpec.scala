package graft

import graft.model._
import graft.table.GraftTable
import org.apache.spark.sql.functions._

/** Regression coverage for review-found edge cases. */
class EdgeCaseSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"edge-$name").toString + "/t"

  test("defaults interact soundly with eq-deletes, CoW, and compaction") {
    import spark.implicits._
    val t = GraftTable.create(spark, freshLoc("dflt-mor"),
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").schema)
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.addColumn("tier", org.apache.spark.sql.types.StringType,
      initialDefault = Some("legacy"), writeDefault = None)
    t.append((11L to 15L).map(i => (i, s"v$i", "fresh"))
      .toDF("id", "v", "tier"))
    // an equality delete keyed on the DEFAULTED column must remove the
    // old rows — their key value exists only via the default projection
    t.deleteWhereEq(Seq("legacy").toDF("tier"))
    assert(t.scan().count() == 5)
    assert(t.scan().filter(col("tier") === "legacy").count() == 0)
    // CoW delete filtered on the default works the same way
    val t2 = GraftTable.create(spark, freshLoc("dflt-cow"),
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").schema)
    t2.append((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    t2.addColumn("tier", org.apache.spark.sql.types.StringType,
      initialDefault = Some("legacy"), writeDefault = None)
    t2.deleteWhere(col("tier") === "legacy" && col("id") > 5L)
    assert(t2.scan().count() == 5)
    // compaction MATERIALIZES the default physically; reads unchanged
    t2.compact()
    assert(t2.scan().filter(col("tier") === "legacy").count() == 5)
    assert(t2.scan().count() == 5)
  }

  test("NaN/Infinity stats do not break filtered scans") {
    import spark.implicits._
    val df = Seq((1L, 1.5), (2L, Double.NaN), (3L, Double.PositiveInfinity),
      (4L, -2.5)).toDF("id", "x")
    val t = GraftTable.create(spark, freshLoc("nan"), df.schema)
    t.append(df)
    assert(t.scan(Some(col("x") > 0.0)).count() ==
      df.filter(col("x") > 0.0).count())
    assert(t.scan(Some(col("x") < 0.0)).count() == 1)
    assert(t.countRows(Some(col("x") > 1.0)) ==
      df.filter(col("x") > 1.0).count())
  }

  test("mergeInto preserves a null-keyed source row's values") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b"))
      .toDF("k", "v").withColumn("k", col("k").cast("long"))
    val t = GraftTable.create(spark, freshLoc("nullkey"), target.schema)
    t.append(target)
    val source = Seq((Some(2L), "B"), (None, "ghost"))
      .map { case (k, v) => (k.map(Long.box).orNull, v) }
      .toDF("k", "v").withColumn("k", col("k").cast("long"))
    t.mergeInto(source, Seq("k"))
    val rows = t.scan().collect()
      .map(r => Option(r.getAs[java.lang.Long]("k")).map(_.toLong) ->
        r.getAs[String]("v")).toMap
    assert(rows(Some(1L)) == "a")
    assert(rows(Some(2L)) == "B")       // matched → updated
    assert(rows(None) == "ghost")       // null-key insert keeps its values
  }

  test("identity string partition values with '+' survive roundtrip") {
    import spark.implicits._
    val df = Seq((1L, "a+b"), (2L, "c d"), (3L, "plain")).toDF("id", "tag")
    val t = GraftTable.create(spark, freshLoc("plus"), df.schema,
      partitionBy = Seq(("tag", TIdentity, "tag_p")))
    t.append(df, repartitionByPartition = true)
    // partition value recorded correctly → equality pruning keeps the file
    assert(t.scan(Some(col("tag") === "a+b")).count() == 1)
    assert(t.scan(Some(col("tag") === "c d")).count() == 1)
    val pv = t.liveEntries().flatMap(_.partition.get("tag_p")).flatten.toSet
    assert(pv == Set("a+b", "c d", "plain"))
  }

  test("partition field name colliding with a column is rejected") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "tag")
    val e = intercept[IllegalArgumentException](
      GraftTable.create(spark, freshLoc("collide"), df.schema,
        partitionBy = Seq(("tag", TIdentity, "tag"))))
    assert(e.getMessage.contains("collides"))
  }

  test("dropColumn refuses partition-spec and sort-order sources") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.0)).toDF("id", "tag", "v")
    val t = GraftTable.create(spark, freshLoc("dropguard"), df.schema,
      partitionBy = Seq(("tag", TIdentity, "tag_p")),
      sortOrder = Seq(("id", TIdentity)))
    val e1 = intercept[IllegalArgumentException](t.dropColumn("tag"))
    assert(e1.getMessage.contains("partition spec"))
    val e2 = intercept[IllegalArgumentException](t.dropColumn("id"))
    assert(e2.getMessage.contains("sort order"))
    t.dropColumn("v") // unreferenced column drops fine
    assert(t.metadata.currentSchema.fieldByName("v").isEmpty)
  }

  test("nested schemas keep field ids unique through addColumn") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("x", StringType), StructField("y", IntegerType))))))
    val t = GraftTable.create(spark, freshLoc("nested"), schema)
    t.addColumn("z", StringType)
    val ice = t.metadata.currentSchema
    val allIds = GraftTable.maxFieldId(ice)
    val topIds = ice.fields.map(_.id)
    assert(topIds.distinct.size == topIds.size)
    assert(ice.fieldByName("z").get.id > 4) // beyond nested x/y ids
  }

  test("addColumn rejects unparseable defaults at the API boundary") {
    import org.apache.spark.sql.types._
    val t = GraftTable.create(spark, freshLoc("baddef"),
      StructType(Seq(StructField("id", LongType))))
    // an unparseable default must fail HERE with the column name, not
    // as a bare NumberFormatException from inside metadata JSON writing
    Seq(
      ("i", IntegerType: DataType, "abc"),
      ("l", LongType: DataType, "12x"),
      ("d", DoubleType: DataType, "not-a-double"),
      ("dt", DateType: DataType, "2024-13-99")).foreach {
      case (n, dt, bad) =>
        val e = intercept[IllegalArgumentException] {
          t.addColumn(n, dt, Some(bad), None) }
        assert(e.getMessage.contains(n) && e.getMessage.contains(bad),
          s"error must name column and value: ${e.getMessage}")
    }
    // valid defaults still land, including the boolean literal
    t.addColumn("ok", IntegerType, Some("5"), Some("7"))
    t.addColumn("flag", BooleanType, Some("true"), None)
    val s = t.metadata.currentSchema
    assert(s.fieldByName("ok").get.initialDefault == Some("5"))
    assert(s.fieldByName("flag").get.initialDefault == Some("true"))
  }
}
