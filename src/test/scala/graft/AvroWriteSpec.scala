package graft

import graft.model._
import graft.table.{DataFileEntry, GraftTable}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Avro data-file writes (`write.format.default=avro`) — the third leg
  * of the spec's file_format triad. Contract: rows roundtrip through
  * the Iceberg Avro encoding (decimal bytes, date days, timestamp
  * micros, nested struct/list/map, field-id resolution on the read
  * side), manifest stats accumulated INLINE during the write are
  * byte-identical to what the parquet footer pass derives for the same
  * data, and every position-addressed surface refuses loudly.
  */
class AvroWriteSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  private val AvroProps = Map(GraftTable.WriteFormatProp -> "avro")

  test("avro roundtrip across all types, including nested") {
    val loc = freshLoc("avw-rt")
    val df = spark.range(300).selectExpr(
      "id",
      "cast(id % 11 as int) as i",
      "cast(id as float) / 3.0f as f",
      "cast(id as double) / 7.0 as d",
      "id % 2 = 0 as b",
      "cast(cast(id as decimal(12,2)) / 3 as decimal(12,2)) as dec",
      "concat('v', cast(id as string)) as s",
      "date_add(date'2021-06-01', cast(id % 200 as int)) as dt",
      "timestamp_micros(1577836800000000 + id * 987654321) as ts",
      "cast(timestamp_micros(1577836800000000 + id * 123456789) " +
        "as timestamp_ntz) as tsn",
      "cast(concat('b', cast(id as string)) as binary) as bin",
      "named_struct('x', id * 3, 'y', concat('n', cast(id as string))) " +
        "as st",
      "array(id, id + 1) as arr",
      "map(concat('k', cast(id % 3 as string)), id) as m")
    val t = GraftTable.create(spark, loc, df.schema, properties = AvroProps)
    t.append(df)
    val entries = t.planFiles(None)
    assert(entries.nonEmpty &&
      entries.forall(_.format == DataFileEntry.Avro))
    assert(entries.forall(e => e.path.endsWith(".avro") && e.fileSize > 0))
    assert(t.scan().count() == 300)
    // exceptAll rejects MAP columns — compare with the map flattened to
    // sorted entry structs (order-insensitive, value-exact)
    def cmp(x: org.apache.spark.sql.DataFrame) = x.withColumn("m",
      array_sort(map_entries(col("m"))))
    assert(cmp(t.scan()).exceptAll(cmp(df)).isEmpty &&
      cmp(df).exceptAll(cmp(t.scan())).isEmpty, "avro scan != input rows")
    // the has-avro flag was stamped automatically (the DSv2/SQL bridge
    // keys on it)
    assert(t.metadata.properties.getOrElse(Map.empty)
      .get(GraftTable.HasAvroProp).contains("true"))
  }

  test("uuid columns encode as fixed[16] + uuid logical type " +
      "(spec Avro appendix), roundtrip intact") {
    // uuid is an Iceberg-only type (no Spark analogue), so the table is
    // laid out from an explicit SchemaV2 rather than GraftTable.create
    val dir = freshLoc("avw-uuid")
    val schema = SchemaV2(0, None, None, Seq(
      StructField(1, "id", required = false, TLong),
      StructField(2, "u", required = false, TUuid)))
    val metaDir = java.nio.file.Paths.get(dir, "metadata")
    java.nio.file.Files.createDirectories(metaDir)
    val meta = TableMetadataV2(
      tableUuid = java.util.UUID.randomUUID.toString,
      location = dir, lastSequenceNumber = 0L,
      lastUpdatedMs = 1700000000000L, lastColumnId = 2,
      schemas = Seq(schema), currentSchemaId = 0,
      partitionSpecs = Seq(PartitionSpec.unpartitioned),
      defaultSpecId = 0, lastPartitionId = 999,
      properties = Some(AvroProps))
    java.nio.file.Files.writeString(metaDir.resolve("v1.metadata.json"),
      meta.toJsonString)
    java.nio.file.Files.writeString(metaDir.resolve("version-hint.text"),
      "1")
    val t = GraftTable.load(spark, dir)
    val df = spark.range(40).selectExpr("id",
      "concat(lower(lpad(hex(id), 8, '0')), " +
        "'-0000-4000-8000-0000000000ff') as u")
    t.append(df.coalesce(1))
    // on-disk schema: fixed[16] annotated uuid, NOT a plain string —
    // what an external conforming Iceberg reader expects
    val file = t.planFiles(None).head.path
    val rdr = new org.apache.avro.file.DataFileReader(
      new java.io.File(file),
      new org.apache.avro.generic.GenericDatumReader[AnyRef]())
    val uField = try rdr.getSchema.getField("u").schema()
      .getTypes.asScala.find(
        _.getType != org.apache.avro.Schema.Type.NULL).get
    finally rdr.close()
    assert(uField.getType == org.apache.avro.Schema.Type.FIXED &&
      uField.getFixedSize == 16 &&
      uField.getProp("logicalType") == "uuid",
      s"uuid column encoded as $uField")
    // and the big-endian bytes decode back to the exact same strings
    assert(t.scan().exceptAll(df).isEmpty &&
      df.exceptAll(t.scan()).isEmpty, "uuid roundtrip mismatch")
  }

  test("inline avro stats are byte-identical to the parquet footer " +
      "pass for the same rows") {
    val df = spark.range(1000).selectExpr(
      "id as l",
      "cast(id % 97 as int) as i",
      "id % 2 = 0 as b",
      "cast(id as float) / 3.0f as f",
      "cast(id as double) / 7.0 as d",
      "cast(cast(id as decimal(12,2)) / 3 as decimal(12,2)) as dec",
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
    val tA = GraftTable.create(spark, freshLoc("avw-a"), df.schema,
      properties = AvroProps)
    tA.append(one)
    val tP = GraftTable.create(spark, freshLoc("avw-p"), df.schema)
    tP.append(one)
    val Seq(eA) = tA.planFiles(None)
    val Seq(eP) = tP.planFiles(None)
    assert(eA.recordCount == eP.recordCount)
    assert(eA.stats.keySet == eP.stats.keySet,
      s"stat column sets differ: avro=${eA.stats.keySet} " +
        s"parquet=${eP.stats.keySet}")
    eP.stats.foreach { case (k, pv) =>
      assert(eA.stats(k) == pv,
        s"stats differ on $k: avro=${eA.stats(k)} parquet=$pv")
    }
  }

  test("NaN doubles follow Spark's ordering in inline stats " +
      "(greatest), never mis-prune") {
    val loc = freshLoc("avw-nan")
    val df = spark.range(100).selectExpr("id",
      "if(id = 50, cast('NaN' as double), cast(id as double)) as d")
    val t = GraftTable.create(spark, loc, df.schema, properties = AvroProps)
    t.append(df.coalesce(1))
    val Seq(e) = t.planFiles(None)
    // the scan-based pass produces max=NaN for parquet too when forced;
    // inline stats match that convention (NaN greatest)
    assert(e.stats("d").max.contains("NaN"),
      s"expected NaN max, got ${e.stats("d")}")
    assert(t.scan(Some(col("d") > 1e9)).count() == 1)
  }

  test("partitioned avro writes: hive fanout, pruning, record-cap " +
      "file rolling") {
    val loc = freshLoc("avw-part")
    val df = spark.range(1000).selectExpr("id",
      "cast(id % 4 as int) as k",
      "date_add(date'2022-01-01', cast(id % 3 as int) * 40) as dt")
    val t = GraftTable.create(spark, loc, df.schema,
      partitionBy = Seq(("dt", graft.model.TMonth, "mo"),
        ("k", graft.model.TIdentity, "kp")),
      properties = AvroProps +
        ("write.target-records-per-file" -> "50"))
    t.append(df, repartitionByPartition = true)
    val all = t.planFiles(None)
    assert(all.forall(_.format == DataFileEntry.Avro))
    assert(all.forall(e =>
      e.partition.contains("mo") && e.partition.contains("kp")))
    assert(all.forall(_.recordCount <= 50L), "record cap not honored")
    val kept = t.planFiles(Some(col("k") === 2))
    assert(kept.nonEmpty && kept.size < all.size)
    assert(kept.forall(_.partition("kp").contains("2")))
    assert(t.scan(Some(col("k") === 2)).count() == 250)
    // stats-only pruning inside a partition also works (id bounds)
    assert(t.planFiles(Some(col("id") < 5)).size < all.size)
  }

  test("CoW delete and equality delete work on avro tables; MoR " +
      "position deletes refuse loudly; blooms refuse") {
    val loc = freshLoc("avw-del")
    val df = spark.range(500).selectExpr("id", "id % 10 as g")
    val t = GraftTable.create(spark, loc, df.schema, properties = AvroProps)
    t.append(df)
    t.deleteWhere(col("g") === 3) // CoW: reads avro, rewrites avro
    assert(t.scan().count() == 450)
    assert(t.planFiles(None).forall(_.format == DataFileEntry.Avro))
    import spark.implicits._
    t.deleteWhereEq(Seq(4L, 14L).toDF("id"))
    assert(t.scan().count() == 448)
    val ex = intercept[Exception] { t.deleteWhereMoR(col("id") === 5) }
    assert(ex.getMessage.contains("parquet"),
      s"expected a parquet-only refusal, got: ${ex.getMessage}")
    val tb = GraftTable.create(spark, freshLoc("avw-bloom"),
      spark.range(1).toDF("id").schema,
      properties = AvroProps +
        (graft.table.Blooms.ColumnsProp -> "id"))
    val e2 = intercept[IllegalArgumentException] {
      tb.append(spark.range(10).toDF("id"))
    }
    assert(e2.getMessage.contains("bloom"))
  }

  test("SQL surface: CREATE with avro default, INSERT, SELECT " +
      "through the catalog bridge") {
    val dir = java.nio.file.Files.createTempDirectory("avw-sql").toString
    spark.conf.set("spark.sql.catalog.gavw", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gavw.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gavw.db")
    spark.sql(
      """CREATE TABLE gavw.db.t (id BIGINT, s STRING)
        |TBLPROPERTIES ('write.format.default' = 'avro')""".stripMargin)
    spark.sql("INSERT INTO gavw.db.t " +
      "SELECT id, concat('x', cast(id as string)) FROM range(50)")
    val g = GraftTable.load(spark, s"$dir/db/t")
    assert(g.planFiles(None).nonEmpty &&
      g.planFiles(None).forall(_.format == DataFileEntry.Avro))
    val got = spark.sql(
      "SELECT count(*) AS n, sum(id) AS s FROM gavw.db.t").head
    assert(got.getLong(0) == 50 && got.getLong(1) == (0L until 50L).sum)
  }

  test("type promotion reads avro files written under the old schema " +
      "(field-id alignment widens)") {
    val loc = freshLoc("avw-evo")
    val df = spark.range(50).selectExpr("cast(id as int) as n",
      "cast(id as string) as s")
    val t = GraftTable.create(spark, loc, df.schema, properties = AvroProps)
    t.append(df)
    t.promoteColumn("n", org.apache.spark.sql.types.LongType)
    t.append(spark.range(50, 100)
      .selectExpr("id as n", "cast(id as string) as s"))
    assert(t.scan().agg(sum("n")).head.getLong(0) == (0L until 100L).sum)
    // stats written under INT still prune the promoted LONG predicate
    assert(t.planFiles(Some(col("n") < 25L)).size <
      t.planFiles(None).size)
    assert(t.scan(Some(col("n") >= 25L && col("n") < 75L)).count() == 50)
  }

  test("a DSv2 stream started on a FRESH avro-default table serves " +
      "its first appends") {
    val loc = freshLoc("avw-freshstream")
    import spark.implicits._
    val df = (1L to 50L).toDF("id")
    // table exists, ZERO data — has-avro is not stamped yet; the stream
    // must latch staging readiness off write.format.default, or the
    // first mid-stream avro append kills it claiming the flag is unset
    val t = GraftTable.create(spark, loc, df.schema, properties = AvroProps)
    val root = java.nio.file.Files.createTempDirectory("avw-fs").toString
    val q = spark.readStream.format("graft").load(loc)
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      q.processAllAvailable() // empty table
      t.append(df) // stamps has-avro AFTER the stream latched
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 50L &&
      out.agg(sum("id")).head.getLong(0) == (1L to 50L).sum)
  }

  test("edge hardening: record-cap 0 means unlimited, sanitized name " +
      "collisions get field-id suffixes, short identity partitions work") {
    // write.target-records-per-file=0 = no limit (Spark semantics), not
    // one file per row
    val t0 = GraftTable.create(spark, freshLoc("avw-cap0"),
      spark.range(1).toDF("id").schema,
      properties = AvroProps + ("write.target-records-per-file" -> "0"))
    t0.append(spark.range(1000).toDF("id").coalesce(1))
    assert(t0.planFiles(None).size == 1,
      s"cap 0 must mean unlimited, got ${t0.planFiles(None).size} files")
    // 'a b' and 'a_b' sanitize to the same avro name — field-id
    // suffixing keeps them distinct (resolution is by field-id)
    val df = spark.range(20).selectExpr("id as `a b`", "id * 2 as a_b")
    val tc = GraftTable.create(spark, freshLoc("avw-coll"), df.schema,
      properties = AvroProps)
    tc.append(df)
    assert(tc.scan().agg(sum(col("`a b`")), sum(col("a_b"))).head match {
      case r => r.getLong(0) == (0L until 20L).sum &&
        r.getLong(1) == 2 * (0L until 20L).sum
    })
    // identity partition on a SMALLINT source
    val ds = spark.range(100).selectExpr("id", "cast(id % 3 as short) as k")
    val ts = GraftTable.create(spark, freshLoc("avw-short"), ds.schema,
      partitionBy = Seq(("k", graft.model.TIdentity, "kp")),
      properties = AvroProps)
    ts.append(ds, repartitionByPartition = true)
    assert(ts.scan(Some(col("k") === 1)).count() == 33)
    assert(ts.planFiles(Some(col("k") === 1)).size <
      ts.planFiles(None).size)
  }

  test("mixed triad: parquet, orc, and avro files in ONE table scan " +
      "correctly; compact converges to the current default") {
    val loc = freshLoc("avw-mix")
    val df = spark.range(100).selectExpr("id")
    val t = GraftTable.create(spark, loc, df.schema)
    t.append(df) // parquet
    t.updateProperties(Map(GraftTable.WriteFormatProp -> Some("orc")))
    t.append(df.selectExpr("id + 100 as id")) // orc
    t.updateProperties(Map(GraftTable.WriteFormatProp -> Some("avro")))
    t.append(df.selectExpr("id + 200 as id")) // avro
    val fmts = t.planFiles(None).map(_.format).distinct.sorted
    assert(fmts ==
      Seq(DataFileEntry.Avro, DataFileEntry.Orc, DataFileEntry.Parquet),
      s"expected the full triad, got $fmts")
    assert(t.scan().count() == 300)
    assert(t.scan().agg(sum("id")).head.getLong(0) == (0L until 300L).sum)
    assert(t.scan(Some(col("id") >= 250)).count() == 50)
    t.updateProperties(Map(GraftTable.WriteFormatProp -> Some("parquet")))
    t.compact()
    assert(t.planFiles(None).forall(_.format == DataFileEntry.Parquet))
    assert(t.scan().count() == 300)
  }
}
