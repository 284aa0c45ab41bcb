package graft

import graft.table.{DataFileEntry, GraftTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ORC data-file writes (`write.format.default=orc`, Iceberg Table
  * Spec: `file_format` admits ORC alongside PARQUET). The contract:
  * ORC writes commit manifest entries with footer-derived stats under
  * the exact same soundness rules as parquet (OrcFooter mirrors
  * GraftTable.footerEntry), reads dispatch per-file by the
  * manifest-recorded format (mixed tables work), and every
  * position-addressed surface refuses loudly instead of misreading.
  */
class OrcWriteSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  private val OrcProps = Map(GraftTable.WriteFormatProp -> "orc")

  private def orcLeaves(loc: String): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(loc))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator.asScala
        .filter(_.getFileName.toString.endsWith(".orc")).toList
    } finally s.close()
  }

  test("orc roundtrip: .orc files on disk, orc entries, scan equality") {
    val loc = freshLoc("orcw-rt")
    val df = spark.range(500).selectExpr("id", "id % 7 as k",
      "concat('v', cast(id as string)) as s",
      // ntz is PHYSICALLY int64 in Spark-written ORC — the engine's
      // schema-pinned read must still surface it as timestamp_ntz
      "timestamp_micros(1577836800000000 + id * 1000003) as ts",
      "cast(timestamp_micros(1577836800000000 + id * 999983) " +
        "as timestamp_ntz) as tsn")
    val t = GraftTable.create(spark, loc, df.schema, properties = OrcProps)
    t.append(df)
    assert(orcLeaves(loc).nonEmpty, "no .orc data files written")
    val entries = t.planFiles(None)
    assert(entries.nonEmpty &&
      entries.forall(_.format == DataFileEntry.Orc))
    assert(entries.forall(e => e.fileSize > 0 && e.recordCount > 0))
    assert(t.scan().count() == 500)
    assert(t.scan().schema("tsn").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    assert(t.scan(Some(col("k") === 3)).agg(sum("id")).head.getLong(0) ==
      df.filter(col("k") === 3).agg(sum("id")).head.getLong(0))
    // value-exact roundtrip, timestamps included
    assert(t.scan().exceptAll(df).isEmpty &&
      df.exceptAll(t.scan()).isEmpty, "orc scan != input rows")
  }

  test("orc footer stats equal scan stats byte-for-byte " +
      "across all types") {
    val df = spark.range(1000).selectExpr(
      "id as l",
      "cast(id % 97 as int) as i",
      "id % 2 = 0 as b",
      "cast(id as float) / 3.0f as f",
      "cast(id as double) / 7.0 as d",
      "cast(cast(id as decimal(12,2)) / 3 as decimal(12,2)) as dec",
      "cast(cast(id as decimal(24,4)) * 123456789012 as decimal(24,4)) " +
        "as bigdec",
      "concat('v', lpad(cast(id as string), 5, '0')) as s",
      "date_add(date'2020-01-01', cast(id % 400 as int)) as dt",
      "timestamp_micros(1577836800000000 + id * 987654321) as ts",
      "cast(timestamp_micros(1577836800000000 + id * 123456789) " +
        "as timestamp_ntz) as tsn",
      "named_struct('x', id * 3, 'y', concat('n', cast(id as string))) " +
        "as st",
      "if(id % 5 = 0, null, cast(id as string)) as withnulls",
      "cast(null as int) as allnull")
    val one = df.coalesce(1)
    val tF = GraftTable.create(spark, freshLoc("orcw-f"), df.schema,
      properties = OrcProps)
    tF.append(one)
    spark.conf.set("spark.graft.footerStats", "false")
    val tS =
      try {
        val t = GraftTable.create(spark, freshLoc("orcw-s"), df.schema,
          properties = OrcProps)
        t.append(one)
        t
      } finally spark.conf.unset("spark.graft.footerStats")
    val Seq(eF) = tF.planFiles(None)
    val Seq(eS) = tS.planFiles(None)
    assert(eF.format == DataFileEntry.Orc && eS.format == DataFileEntry.Orc)
    assert(eF.recordCount == eS.recordCount)
    assert(eF.stats.keySet == eS.stats.keySet,
      s"column sets differ: footer=${eF.stats.keySet} " +
        s"scan=${eS.stats.keySet}")
    eS.stats.foreach { case (k, sv) =>
      assert(eF.stats(k) == sv,
        s"stats differ on $k: footer=${eF.stats(k)} scan=$sv")
    }
    // zoned AND ntz timestamps carry REAL micros-exact bounds (ORC 2.x
    // nanos + the int64-micros ntz encoding; see OrcFooter)
    assert(eF.stats("ts").min.isDefined && eF.stats("tsn").min.isDefined)
    assert(eF.stats.contains("st.x") && eF.stats.contains("st.y"))
    assert(eF.stats("withnulls").nulls == 200L)
    assert(eF.stats("allnull") ==
      graft.table.ColStats(None, None, 1000L))
  }

  test("orc manifest stats prune files exactly") {
    val loc = freshLoc("orcw-prune")
    val df = spark.range(10000).selectExpr("id", "id * 2 as v")
      .repartitionByRange(8, col("id"))
    val t = GraftTable.create(spark, loc, df.schema, properties = OrcProps)
    t.append(df, sortWithin = Seq(col("id")))
    val all = t.planFiles(None)
    assert(all.size >= 8)
    val kept = t.planFiles(Some(col("id") < 100))
    assert(kept.size < all.size, "orc stats pruning ineffective")
    // and pruned answers stay exact
    assert(t.scan(Some(col("id") < 100)).count() == 100)
  }

  test("NaN-bearing double columns suppress orc footer bounds, " +
      "never mis-prune") {
    val loc = freshLoc("orcw-nan")
    val df = spark.range(100).selectExpr("id",
      "if(id = 50, cast('NaN' as double), cast(id as double)) as d")
    val t = GraftTable.create(spark, loc, df.schema, properties = OrcProps)
    t.append(df.coalesce(1))
    val Seq(e) = t.planFiles(None)
    assert(e.stats("d").min.isEmpty && e.stats("d").max.isEmpty,
      "NaN-polluted orc double bounds must be suppressed")
    // Spark orders NaN greatest: the row must survive any range filter
    // a false bound could have pruned
    assert(t.scan(Some(col("d") > 1e9)).count() == 1)
  }

  test("copy-on-write delete and equality delete work on orc tables; " +
      "MoR position deletes refuse loudly") {
    val loc = freshLoc("orcw-del")
    val df = spark.range(1000).selectExpr("id", "id % 10 as k")
    val t = GraftTable.create(spark, loc, df.schema, properties = OrcProps)
    t.append(df)
    t.deleteWhere(col("k") === 3) // CoW rewrite — rewritten files are orc
    assert(t.scan().count() == 900)
    assert(t.planFiles(None).forall(_.format == DataFileEntry.Orc))
    import spark.implicits._
    t.deleteWhereEq(Seq(4L, 14L).toDF("id")) // eq-delete file is parquet
    assert(t.scan().count() == 898)
    val ex = intercept[Exception] { t.deleteWhereMoR(col("id") === 5) }
    assert(ex.getMessage.contains("parquet"),
      s"expected a parquet-only refusal, got: ${ex.getMessage}")
  }

  test("mixed-format tables: property flip affects future writes only; " +
      "compact() rewrites under the current format") {
    val loc = freshLoc("orcw-mix")
    val df = spark.range(100).selectExpr("id")
    val t = GraftTable.create(spark, loc, df.schema)
    t.append(df) // parquet
    t.updateProperties(Map(GraftTable.WriteFormatProp -> Some("orc")))
    t.append(df.selectExpr("id + 100 as id")) // orc
    val fmts = t.planFiles(None).map(_.format).distinct.sorted
    assert(fmts == Seq(DataFileEntry.Orc, DataFileEntry.Parquet),
      s"expected a mixed table, got $fmts")
    assert(t.scan().count() == 200)
    assert(t.scan(Some(col("id") >= 150)).count() == 50)
    t.compact()
    assert(t.planFiles(None).forall(_.format == DataFileEntry.Orc))
    assert(t.scan().count() == 200)
  }

  test("row-lineage tables and unknown write formats refuse") {
    val df = spark.range(10).selectExpr("id")
    val lin = GraftTable.create(spark, freshLoc("orcw-lin"), df.schema,
      properties = OrcProps +
        (GraftTable.RowLineageProp -> "true"))
    val e1 = intercept[IllegalArgumentException] { lin.append(df) }
    assert(e1.getMessage.contains("row-lineage"))
    val bad = GraftTable.create(spark, freshLoc("orcw-bad"), df.schema,
      properties = Map(GraftTable.WriteFormatProp -> "csv"))
    val e2 = intercept[IllegalArgumentException] { bad.append(df) }
    assert(e2.getMessage.contains("unsupported"))
  }

  test("partitioned orc writes: hive fanout, partition pruning, " +
      "per-partition stats") {
    val loc = freshLoc("orcw-part")
    val df = spark.range(1000).selectExpr("id",
      "cast(id % 4 as int) as bucket_src")
    val t = GraftTable.create(spark, loc, df.schema,
      partitionBy = Seq(("bucket_src", graft.model.TIdentity, "bp")),
      properties = OrcProps)
    t.append(df, repartitionByPartition = true)
    val all = t.planFiles(None)
    assert(all.forall(_.format == DataFileEntry.Orc))
    assert(all.forall(_.partition.contains("bp")))
    val kept = t.planFiles(Some(col("bucket_src") === 2))
    assert(kept.nonEmpty && kept.size < all.size)
    assert(kept.forall(_.partition("bp").contains("2")))
    assert(t.scan(Some(col("bucket_src") === 2)).count() == 250)
  }

  test("bloom sidecars ride the (scan-stats) pass on ORC writes and " +
      "prune point lookups") {
    import graft.table.Blooms
    val loc = freshLoc("orcw-bloom")
    import spark.implicits._
    // round-robin layout: every file spans the whole id range, so any
    // skipping observed is the bloom's, not min/max stats
    val df = (0L until 8000L).map(i => (i, s"key-$i")).toDF("id", "name")
    val t = GraftTable.create(spark, loc, df.schema,
      properties = OrcProps + (Blooms.ColumnsProp -> "id") +
        (Blooms.ItemsProp -> "2000"))
    t.append(df.repartition(8))
    val entries = t.planFiles(None)
    assert(entries.length == 8 &&
      entries.forall(e => e.format == DataFileEntry.Orc &&
        e.bloom.exists(_.cols.contains("id"))))
    val kept = t.planFiles(Some(col("id") === 4242L))
    assert(kept.size < entries.size,
      s"orc bloom pruning ineffective: ${kept.size}/${entries.size}")
    assert(t.scan(Some(col("id") === 4242L)).count() == 1)
  }

  test("DSv2 streaming sink honours write.format.default=orc: epochs " +
      "stage orc files with footer-derived stats; avro refuses") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("orc-sink-src")
    (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
      .coalesce(1).write.mode("overwrite")
      .parquet(srcDir.resolve("f").toString)
    val srcSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.StringType)))
    def runInto(loc: String): Unit = {
      val ckpt = java.nio.file.Files
        .createTempDirectory("orc-sink-ckpt").toString
      val q = spark.readStream.schema(srcSchema)
        .parquet(srcDir.resolve("f").toString)
        .writeStream.format("graft").option("path", loc)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val loc = freshLoc("orc-sink-t")
    GraftTable.create(spark, loc, srcSchema,
      partitionBy = Seq(("g", graft.model.TIdentity, "g_p")),
      properties = OrcProps)
    runInto(loc)
    val t = GraftTable.load(spark, loc)
    val entries = t.planFiles(None)
    assert(entries.nonEmpty && entries.forall(e =>
      e.format == DataFileEntry.Orc && e.path.endsWith(".orc")),
      s"expected all-orc epoch files, got " +
        entries.map(e => (e.format, e.path)).take(3).toString)
    // footer-derived stats landed (OrcFooter pass, not a blind adopt)
    assert(entries.forall(_.stats.get("id").exists(s =>
      s.min.isDefined && s.max.isDefined)),
      "orc epoch entries missing footer-derived id bounds")
    assert(t.scan().count() == 300)
    assert(t.scan().agg(sum("id")).head.getLong(0) ==
      (0L until 300L).sum)
    // fanout wrote hive partition dirs the planner prunes on
    val kept = t.planFiles(Some(col("g") === "g1"))
    assert(kept.nonEmpty && kept.size < entries.size &&
      kept.forall(_.partition.get("g_p").flatten.contains("g1")))
    // avro-default tables refuse loudly instead of silently staging
    // a different format
    val avroLoc = freshLoc("avro-sink-t")
    GraftTable.create(spark, avroLoc, srcSchema,
      properties = Map(GraftTable.WriteFormatProp -> "avro"))
    val err = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] { runInto(avroLoc) }
    assert(err.getMessage.contains("avro-default") ||
      Option(err.getCause).exists(_.getMessage.contains("avro-default")),
      s"expected the documented avro refusal, got ${err.getMessage}")
  }

  test("directory-tail streaming read refuses orc-bearing tables") {
    val loc = freshLoc("orcw-stream")
    val df = spark.range(10).selectExpr("id")
    val t = GraftTable.create(spark, loc, df.schema, properties = OrcProps)
    t.append(df)
    val ex = intercept[IllegalArgumentException] { t.readStream() }
    assert(ex.getMessage.contains("all-parquet"))
  }

  test("full SQL surface on an orc table: CREATE TBLPROPERTIES, " +
      "INSERT, SELECT, UPDATE, DELETE through the catalog") {
    val dir = java.nio.file.Files.createTempDirectory("orcw-sql").toString
    spark.conf.set("spark.sql.catalog.gorc", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gorc.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gorc.db")
    spark.sql(
      """CREATE TABLE gorc.db.t (id BIGINT, qty DOUBLE)
        |PARTITIONED BY (bucket(4, id))
        |TBLPROPERTIES ('write.format.default' = 'orc')""".stripMargin)
    spark.sql("INSERT INTO gorc.db.t SELECT id, cast(id as double) " +
      "FROM range(100)")
    val g = GraftTable.load(spark, s"$dir/db/t")
    assert(g.planFiles(None).nonEmpty &&
      g.planFiles(None).forall(_.format == DataFileEntry.Orc),
      "SQL INSERT did not produce orc files")
    assert(spark.table("gorc.db.t").count() == 100)
    spark.sql("UPDATE gorc.db.t SET qty = qty * 2 WHERE id < 10")
    spark.sql("DELETE FROM gorc.db.t WHERE id >= 90")
    val got = spark.sql(
      "SELECT count(*) AS n, sum(qty) AS s FROM gorc.db.t").head
    assert(got.getLong(0) == 90)
    assert(got.getDouble(1) == (0 until 90).map(i =>
      if (i < 10) i * 2.0 else i.toDouble).sum)
    assert(GraftTable.load(spark, s"$dir/db/t").planFiles(None)
      .forall(_.format == DataFileEntry.Orc))
  }

  test("schema evolution + type promotion read orc files written " +
      "under the old schema") {
    val loc = freshLoc("orcw-evo")
    val df = spark.range(50).selectExpr("cast(id as int) as n",
      "cast(id as string) as s")
    val t = GraftTable.create(spark, loc, df.schema, properties = OrcProps)
    t.append(df)
    t.promoteColumn("n", org.apache.spark.sql.types.LongType)
    t.append(spark.range(50, 100)
      .selectExpr("id as n", "cast(id as string) as s"))
    assert(t.scan().agg(sum("n")).head.getLong(0) == (0L until 100L).sum)
    assert(t.scan(Some(col("n") >= 25L && col("n") < 75L)).count() == 50)
  }
}
