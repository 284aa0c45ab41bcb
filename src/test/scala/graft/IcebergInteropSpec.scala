package graft

import graft.table.{GraftTable, IcebergInterop}
import org.apache.spark.sql.functions._

/** External-layout interop: a graft table exported as metadata.json +
  * Avro manifests must read back identically through the external format
  * only — including schema evolution (field-id alignment) and
  * merge-on-read deletes (the import shares the native read core, but
  * these tests pin the behavior through the public layout surface).
  */
class IcebergInteropSpec extends SparkSpec {

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString

  test("layout roundtrip: discovery via version-hint, rows identical") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "orders").limit(400)
    val t = GraftTable.create(spark, tmp("ie-rt") + "/t", src.schema)
    t.append(src)
    val layout = tmp("ie-rt-out")
    val metaPath = IcebergInterop.exportTable(t, layout)
    assert(metaPath.getFileName.toString == "v1.metadata.json")
    assert(IcebergInterop.currentMetadataPath(layout) == metaPath)
    val back = IcebergInterop.readTable(spark, layout)
    assert(back.count() == src.count())
    assert(back.agg(sum("o_totalprice")).head ==
      src.agg(sum("o_totalprice")).head)
  }

  test("schema evolution survives the layout: old files align by field id") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice").limit(300)
    val t = GraftTable.create(spark, tmp("ie-evo") + "/t", src.schema)
    t.append(src.limit(100))
    t.renameColumn("o_totalprice", "price")
    t.dropColumn("o_custkey")
    t.append(src.select(col("o_orderkey"),
      col("o_totalprice").as("price")).limit(50))
    val layout = tmp("ie-evo-out")
    IcebergInterop.exportTable(t, layout)
    val back = IcebergInterop.readTable(spark, layout)
    // current schema names, old files' renamed column resolved by id
    assert(back.columns.toSeq == Seq("o_orderkey", "price"))
    assert(back.count() == 150)
    assert(back.filter(col("price").isNull).count() == 0)
  }

  test("MoR deletes apply through the external read (seq-scoped eq)") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "orders")
      .limit(500)
    val t = GraftTable.create(spark, tmp("ie-mor") + "/t", src.schema)
    t.append(src)
    t.deleteWhereMoR(col("o_orderkey") % 7 === 0)
    t.deleteWhereEq(src.filter(col("o_orderkey") % 5 === 0)
      .select("o_custkey").distinct())
    // younger re-insert of an eq-deleted key must survive
    val resurrect = src.filter(col("o_orderkey") % 5 === 0).limit(20)
    t.append(resurrect)
    val layout = tmp("ie-mor-out")
    IcebergInterop.exportTable(t, layout)
    val back = IcebergInterop.readTable(spark, layout)
    val native = t.scan()
    assert(back.count() == native.count())
    assert(back.agg(sum("o_orderkey")).head == native.agg(sum("o_orderkey")).head)
  }

  test("export with no snapshot fails loudly; bad asOf rejected") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "orders").limit(10)
    val t = GraftTable.create(spark, tmp("ie-err") + "/t", src.schema)
    intercept[IllegalStateException] {
      IcebergInterop.exportTable(t, tmp("ie-err-out"))
    }
    t.append(src)
    val layout = tmp("ie-err-out2")
    IcebergInterop.exportTable(t, layout)
    intercept[IllegalArgumentException] {
      IcebergInterop.readTable(spark, layout, asOf = Some(12345L))
    }
  }

  test("adopt: an exported layout becomes a LIVE native table") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(1500)
    val t = GraftTable.create(spark, tmp("adopt-src").toString + "/t",
      src.schema,
      properties = Map(GraftTable.RowLineageProp -> "true"))
    t.append(src)
    t.deleteWhereMoR(col("l_linenumber") === 1) // parquet positions
    t.deleteWhereDv(col("l_linenumber") === 2)  // deletion vector
    val expected = src
      .filter(col("l_linenumber") =!= 1 && col("l_linenumber") =!= 2)
      .count()
    val layout = tmp("adopt-layout").toString
    IcebergInterop.exportTable(t, layout)

    // adopt at a NEW location: scans serve through native manifests
    // (deletes and DV blobs referenced in place), lineage ids identical
    val adopted = IcebergInterop.adoptTable(spark, layout,
      tmp("adopt-dst").toString + "/t")
    assert(adopted.scan().count() == expected)
    def ids(x: GraftTable) = x.scanWithLineage()
      .select("_row_id", "l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ids(adopted) == ids(t), "adopted lineage ids drifted")
    // double-adoption refuses
    intercept[IllegalArgumentException] {
      IcebergInterop.adoptTable(spark, layout, adopted.location) }

    // the adopted table is fully LIVE: mutations + maintenance run
    // natively and lineage keeps minting from the adopted next-row-id
    val nextBefore = adopted.metadata.nextRowId.get
    adopted.deleteWhereDv(col("l_linenumber") === 3)
    adopted.append(src.limit(100))
    val expected2 = expected -
      src.filter(col("l_linenumber") === 3 &&
        col("l_linenumber") =!= 1 && col("l_linenumber") =!= 2).count() +
      100
    assert(adopted.scan().count() == expected2)
    val lin = adopted.scanWithLineage()
    assert(lin.select("_row_id").distinct().count() == expected2)
    assert(lin.agg(max("_row_id")).head().getLong(0) ==
      nextBefore + 100 - 1)
    adopted.compact()
    assert(adopted.scan().count() == expected2)
    // and the adopted table re-exports
    val layout2 = tmp("adopt-layout2").toString
    IcebergInterop.exportTable(adopted, layout2)
    assert(IcebergInterop.readTable(spark, layout2).count() == expected2)
  }

  test("adopt: partitioned + schema-evolved layout keeps pruning working") {
    import graft.model.TMonth
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(2000)
    val t = GraftTable.create(spark, tmp("adoptp-src").toString + "/t",
      src.schema, partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src.limit(1000), repartitionByPartition = true)
    t.addColumn("extra_note", org.apache.spark.sql.types.StringType)
    t.append(src.limit(500).withColumn("extra_note", lit("x")),
      repartitionByPartition = true)
    val layout = tmp("adoptp-layout").toString
    IcebergInterop.exportTable(t, layout)
    val adopted = IcebergInterop.adoptTable(spark, layout,
      tmp("adoptp-dst").toString + "/t")
    // rows identical through adoption, old files null-fill the new col
    assert(adopted.scan().count() == 1500)
    assert(adopted.scan().filter(col("extra_note").isNull).count() == 1000)
    // hidden-partition pruning still plans from the adopted manifests:
    // a one-month filter reads fewer files than the table holds
    val total = adopted.planFiles().size
    val cut = java.sql.Date.valueOf("1995-01-01")
    val pruned = adopted.planFiles(Some(col("l_shipdate") < lit(cut)))
    assert(pruned.size < total,
      s"pruning dead after adoption: ${pruned.size} of $total files")
    val expectedF = adopted.scan().filter(col("l_shipdate") < lit(cut))
      .count()
    assert(adopted.scan(Some(col("l_shipdate") < lit(cut))).count()
      == expectedF)
  }
}
