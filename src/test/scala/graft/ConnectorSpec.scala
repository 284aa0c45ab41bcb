package graft

import graft.model.TMonth
import graft.table.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.RowDataSourceScanExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSv2 connector + SQL catalog: spark.read.format("graft"), pushdown
  * visibility, statistics-driven broadcast, SQL DDL/DML through
  * GraftCatalog, time travel options, and read-equivalence with
  * GraftTable.scan on mutated tables (the V1 bridge shares the scan
  * code path, so this pins the wiring, not a re-implementation).
  */
class ConnectorSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-dsv2-$name").toString + "/t"

  private def lineitem: DataFrame =
    Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")

  test("format read equals table scan, with filter and projection") {
    val src = lineitem
    val loc = freshLoc("read")
    val t = GraftTable.create(spark, loc, src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)

    val df = spark.read.format("graft").load(loc)
      .filter(col("l_shipdate") >= "1997-06-01")
      .select("l_orderkey", "l_quantity")
    val expected = src.filter(col("l_shipdate") >= "1997-06-01")
      .select("l_orderkey", "l_quantity")
    assert(df.exceptAll(expected).isEmpty && expected.exceptAll(df).isEmpty)
  }

  test("pushed filters appear in the physical plan and prune files") {
    val src = lineitem
    val loc = freshLoc("push")
    val t = GraftTable.create(spark, loc, src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)

    val df = spark.read.format("graft").load(loc)
      .filter(col("l_shipdate") >= "1998-01-01")
    val descs = df.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s.scan.description()
      case s: RowDataSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "")
    }
    assert(descs.nonEmpty, "expected a DSv2 scan node")
    assert(descs.head.contains("l_shipdate"),
      s"pushdown not visible in plan: ${descs.head}")
    // and the count is right (file pruning is exercised inside scan())
    assert(df.count() == src.filter(col("l_shipdate") >= "1998-01-01").count())
  }

  test("native path: schema evolution across file groups, columnar read") {
    val src = lineitem.limit(300).cache()
    val loc = freshLoc("evolve")
    val t = GraftTable.create(spark, loc, src.schema)
    t.append(src)
    t.renameColumn("l_returnflag", "flag")
    t.addColumn("grade", org.apache.spark.sql.types.StringType)
    val evolved = src.withColumnRenamed("l_returnflag", "flag")
      .withColumn("grade", lit("A"))
    t.append(evolved)

    val df = spark.read.format("graft").load(loc)
    assert(df.count() == 600) // count(*): empty required schema
    // old files null-fill grade; both groups align flag by field id
    assert(df.filter(col("grade").isNull).count() == 300)
    assert(df.filter(col("flag").isNotNull).count() == 600)
    val viaScan = t.scan()
    assert(df.exceptAll(viaScan).isEmpty && viaScan.exceptAll(df).isEmpty)
  }

  test("reported statistics shrink under a selective filter") {
    val src = lineitem
    val loc = freshLoc("stats")
    val t = GraftTable.create(spark, loc, src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)

    def planned(df: DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val all = planned(spark.read.format("graft").load(loc))
    val some = planned(spark.read.format("graft").load(loc)
      .filter(col("l_shipdate") >= "1998-06-01"))
    assert(some < all, s"filtered stats $some should be < unfiltered $all")
  }

  test("post-pruning statistics let a filtered graft table broadcast") {
    val src = lineitem
    val loc = freshLoc("bcast")
    val t = GraftTable.create(spark, loc, src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)

    val dim = spark.read.format("graft").load(loc)
      .filter(col("l_shipdate") >= "1998-11-01")
      .select("l_orderkey", "l_quantity")
    // the planner's own estimate of the pruned side — derived from graft
    // metadata (surviving file bytes), scaled by the projection
    val est = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est > 0 && est < BigInt(Long.MaxValue) / 4, s"usable estimate: $est")

    def planWithThreshold(threshold: BigInt): String = {
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        threshold.toString)
      try {
        // fact side far above both thresholds: never the broadcast side
        val fact = Tables.tbl(spark, "/root/testdata/sf0.1", "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"))
        fact.join(dim, "l_orderkey").queryExecution.executedPlan.toString
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
    // estimate below threshold -> stats-driven broadcast; above -> shuffle
    assert(planWithThreshold(est * 2).contains("BroadcastHashJoin"),
      s"pruned graft side (est $est) should broadcast under ${est * 2}:\n" +
        planWithThreshold(est * 2))
    assert(!planWithThreshold(est / 2).contains("BroadcastHashJoin"),
      s"pruned graft side (est $est) must NOT broadcast under ${est / 2}")
  }

  test("format write appends a snapshot; time-travel options read history") {
    val src = lineitem.limit(100).cache()
    val loc = freshLoc("write")
    GraftTable.create(spark, loc, src.schema)
    src.write.format("graft").mode("append").save(loc)
    val t = GraftTable.load(spark, loc)
    val snap1 = t.metadata.currentSnapshotId.get
    src.write.format("graft").mode("append").save(loc)

    assert(spark.read.format("graft").load(loc).count() == 200)
    assert(spark.read.format("graft")
      .option("snapshot-id", snap1.toString).load(loc).count() == 100)
    t.createTag("v1", snap1)
    assert(spark.read.format("graft")
      .option("ref", "v1").load(loc).count() == 100)
  }

  test("INSERT OVERWRITE is one atomic commit") {
    val src = lineitem.limit(50)
    val loc = freshLoc("ovw")
    GraftTable.create(spark, loc, src.schema)
    src.write.format("graft").mode("append").save(loc)
    val before = GraftTable.load(spark, loc).metadata.snapshots
      .getOrElse(Seq.empty).size
    src.limit(10).write.format("graft").mode("overwrite").save(loc)
    val t = GraftTable.load(spark, loc)
    assert(t.scan().count() == 10)
    val after = t.metadata.snapshots.getOrElse(Seq.empty).size
    assert(after == before + 1, s"overwrite must be ONE commit " +
      s"(snapshots went $before -> $after)")
  }

  test("SQL catalog: DDL, hidden partitioning, DML, metadata on disk") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.conf.set("spark.sql.catalog.gtest", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    spark.sql(
      """CREATE TABLE gtest.db.li (
        |  l_orderkey BIGINT, l_quantity DOUBLE, l_shipdate DATE
        |) PARTITIONED BY (months(l_shipdate))""".stripMargin)

    lineitem.select(col("l_orderkey"), col("l_quantity"),
        col("l_shipdate").cast("date").as("l_shipdate"))
      .createOrReplaceTempView("li_src")
    spark.sql("INSERT INTO gtest.db.li SELECT * FROM li_src")

    val n = spark.sql(
      "SELECT COUNT(*) FROM gtest.db.li WHERE l_shipdate >= DATE'1997-01-01'")
      .head().getLong(0)
    assert(n == lineitem.filter(col("l_shipdate") >= "1997-01-01").count())

    // a real graft table materialized under the warehouse
    val t = GraftTable.load(spark, s"$wh/db/li")
    assert(t.metadata.defaultSpec.fields.map(_.name) == Seq("l_shipdate_month"))
    assert(t.planFiles(Some(col("l_shipdate") >= lit("1998-06-01").cast("date")))
      .size < t.liveEntries().size, "hidden partition pruning through SQL DDL")

    // ALTER TABLE surfaces schema evolution
    spark.sql("ALTER TABLE gtest.db.li ADD COLUMN note STRING")
    assert(spark.table("gtest.db.li").schema.fieldNames.contains("note"))
    spark.sql("ALTER TABLE gtest.db.li RENAME COLUMN note TO remark")
    assert(spark.table("gtest.db.li").schema.fieldNames.contains("remark"))
    spark.sql("ALTER TABLE gtest.db.li DROP COLUMN remark")
    assert(!spark.table("gtest.db.li").schema.fieldNames.contains("remark"))

    // properties round-trip through SET/UNSET TBLPROPERTIES
    spark.sql(
      "ALTER TABLE gtest.db.li SET TBLPROPERTIES ('write.target'='128m')")
    assert(GraftTable.load(spark, s"$wh/db/li").metadata.properties
      .exists(_.get("write.target").contains("128m")))
    spark.sql("ALTER TABLE gtest.db.li UNSET TBLPROPERTIES ('write.target')")
    assert(!GraftTable.load(spark, s"$wh/db/li").metadata.properties
      .exists(_.contains("write.target")))

    assert(spark.sql("SHOW TABLES IN gtest.db").collect()
      .map(_.getString(1)).contains("li"))
    spark.sql("DROP TABLE gtest.db.li")
    assert(!spark.catalog.tableExists("gtest.db.li"))
  }

  test("dynamic partition pruning reaches the graft scan at runtime") {
    val src = lineitem
    val loc = freshLoc("dpp")
    val t = GraftTable.create(spark, loc, src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)

    // tiny dim carrying a FILTER on the join key (the DPP precondition:
    // a surviving selective predicate — a LocalRelation would be
    // constant-folded away); join key = the fact's partition source col
    val dimPath = java.nio.file.Files
      .createTempDirectory("dpp-dim").toString + "/d"
    src.select(col("l_shipdate").as("d_date")).distinct()
      .write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter(col("d_date") >= "1998-06-01")
    // the sf0.001 fact side is too small for DPP's cost heuristic —
    // force the benefit estimate so the MECHANISM (filterAttributes →
    // runtime filter injection → re-planned file list) is what's tested
    val olds = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      .map(k => k -> spark.conf.get(k))
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio",
      "100000")
    try {
      val joined = spark.read.format("graft").load(loc)
        .join(dim, col("l_shipdate") === col("d_date"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") ||
        plan.contains("RuntimeFilters: [in"),
        s"no runtime filter reached the graft scan:\n$plan")
      val expected = src.join(dim, col("l_shipdate") === col("d_date"))
        .count()
      assert(joined.count() == expected)
    } finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("SQL metadata tables: t.snapshots / t.partitions / t.files") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh3").toString
    spark.conf.set("spark.sql.catalog.gmeta", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmeta.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmeta.db")
    spark.sql(
      """CREATE TABLE gmeta.db.t (k BIGINT, d TIMESTAMP_NTZ)
        |PARTITIONED BY (months(d))""".stripMargin)
    lineitem.select(col("l_orderkey").as("k"),
        col("l_shipdate").as("d"))
      .createOrReplaceTempView("meta_src")
    spark.sql("INSERT INTO gmeta.db.t SELECT * FROM meta_src")
    spark.sql("INSERT INTO gmeta.db.t SELECT * FROM meta_src")

    val snaps = spark.sql(
      "SELECT operation FROM gmeta.db.t.snapshots ORDER BY sequence_number")
      .collect().map(_.getString(0))
    assert(snaps.toSeq == Seq("append", "append"))
    assert(spark.sql("SELECT * FROM gmeta.db.t.history").count() == 2)
    val nFiles = spark.sql("SELECT COUNT(*) FROM gmeta.db.t.files")
      .head().getLong(0)
    assert(nFiles > 0)
    val recs = spark.sql(
      "SELECT SUM(record_count) FROM gmeta.db.t.partitions")
      .head().getLong(0)
    assert(recs == lineitem.count() * 2)
    // refs: main plus a staged WAP branch, each with its head snapshot
    val t = graft.table.GraftTable.load(spark, s"$wh/db/t")
    t.createBranch("audit", t.metadata.currentSnapshotId.get)
    val refs = spark.sql(
      "SELECT name, type, snapshot_id FROM gmeta.db.t.refs ORDER BY name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(refs.map(x => (x._1, x._2)).toSeq ==
      Seq(("audit", "branch"), ("main", "branch")))
    assert(refs(0)._3 == refs(1)._3) // branch starts at main's head

    // manifests: every manifest the current snapshot references, with
    // rollup counts that reconcile against the files table
    val mans = spark.sql(
      """SELECT content, entry_count, record_count
        |FROM gmeta.db.t.manifests""".stripMargin).collect()
    assert(mans.nonEmpty && mans.forall(_.getInt(0) == 0))
    assert(mans.map(_.getLong(1)).sum == nFiles)
    assert(mans.map(_.getLong(2)).sum == lineitem.count() * 2)
    // metadata_log_entries: one versioned metadata file per commit so
    // far (create + 2 inserts + the branch), oldest first
    val log = spark.sql(
      "SELECT timestamp_ms, file FROM gmeta.db.t.metadata_log_entries")
      .collect()
    assert(log.length >= 3, s"metadata log too short: ${log.length}")
    assert(log.map(_.getLong(0)).toSeq == log.map(_.getLong(0)).sorted.toSeq)
    assert(log.map(_.getString(1)).distinct.length == log.length)
    // all_files covers files the CURRENT snapshot dropped: after a CoW
    // delete, the rewritten-away originals stay visible through history
    val liveBefore = spark.sql(
      "SELECT file_path FROM gmeta.db.t.files")
      .collect().map(_.getString(0)).toSet
    t.deleteWhere(col("k") % 2 === 0)
    val allAfter = spark.sql(
      "SELECT DISTINCT file_path FROM gmeta.db.t.all_files")
      .collect().map(_.getString(0)).toSet
    val liveAfter = spark.sql(
      "SELECT file_path FROM gmeta.db.t.files")
      .collect().map(_.getString(0)).toSet
    assert(liveBefore.subsetOf(allAfter),
      "all_files must retain pre-delete files")
    assert(liveAfter.subsetOf(allAfter) && liveAfter != allAfter)
    assert(spark.sql("SELECT COUNT(*) FROM gmeta.db.t.all_manifests")
      .head().getLong(0) >
      spark.sql("SELECT COUNT(*) FROM gmeta.db.t.manifests")
        .head().getLong(0))
    // entries: one row per live manifest entry, reconciling with .files;
    // rows of the CoW-delete commit are ADDED (status 1), the untouched
    // survivors EXISTING (status 0)
    val ents = spark.sql(
      """SELECT status, snapshot_id, manifest_path, file_path, content
        |FROM gmeta.db.t.entries""".stripMargin).collect()
    assert(ents.map(_.getString(3)).toSet == liveAfter)
    assert(ents.forall(_.getInt(4) == 0)) // CoW: no delete entries
    val head = graft.table.GraftTable.load(spark, s"$wh/db/t")
      .metadata.currentSnapshotId.get
    assert(ents.forall(r => (r.getInt(0) == 1) == (r.getLong(1) == head)),
      "status must be ADDED exactly for current-snapshot entries")
    assert(ents.exists(_.getInt(0) == 1), "the delete commit added entries")
    assert(ents.map(_.getString(2)).distinct.forall(_.nonEmpty))
    // all_entries covers the rewritten-away originals too
    val allEnts = spark.sql(
      "SELECT DISTINCT file_path FROM gmeta.db.t.all_entries")
      .collect().map(_.getString(0)).toSet
    assert(allAfter.subsetOf(allEnts))
  }

  test("SQL CTAS creates and fills a graft table") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh2").toString
    spark.conf.set("spark.sql.catalog.gctas", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gctas.warehouse", wh)
    lineitem.createOrReplaceTempView("li_ctas_src")
    spark.sql(
      """CREATE TABLE gctas.default.big_orders AS
        |SELECT l_orderkey, l_quantity FROM li_ctas_src
        |WHERE l_quantity >= 30""".stripMargin)
    val n = spark.table("gctas.default.big_orders").count()
    assert(n == lineitem.filter(col("l_quantity") >= 30).count())
    // and it is a real graft table with a committed snapshot
    val t = GraftTable.load(spark, s"$wh/default/big_orders")
    assert(t.metadata.currentSnapshotId.isDefined)
    spark.sql("DROP TABLE gctas.default.big_orders")
  }

  test("readStream.format(graft): snapshot offsets, exactly-once resume") {
    val events = Tables.tbl(spark, "/root/testdata/sf0.001", "events")
      .limit(900).cache()
    val root = java.nio.file.Files.createTempDirectory("dsv2-stream").toString
    val t = GraftTable.create(spark, s"$root/src", events.schema)
    t.append(events.filter(col("user_id") % 3 === 0))
    t.append(events.filter(col("user_id") % 3 === 1))

    def drain(): Long = {
      val q = spark.readStream.format("graft").load(s"$root/src")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$root/out").count()
    }
    val n1 = drain()
    assert(n1 == events.filter(col("user_id") % 3 =!= 2).count(),
      s"first pass consumed $n1")
    // an append between runs flows into the next batch, nothing re-read
    t.append(events.filter(col("user_id") % 3 === 2))
    val n2 = drain()
    assert(n2 == events.count(),
      s"expected exactly-once total ${events.count()}, got $n2")

    // uncommitted files are invisible: a bare parquet drop into the data
    // dir (a failed write's leftovers) must NOT appear in any batch
    events.limit(7).write.mode("append")
      .parquet(s"$root/src/data/zz-orphan")
    assert(drain() == events.count(), "orphan uncommitted files leaked in")

    t.deleteWhere(col("user_id") === -1L)
    val err = intercept[Exception] { drain() }
    // the V1-bridge scan must still route streaming to the micro-batch
    // stream so the user sees the append-only diagnostic, not a generic
    // "unsupported" from Scan's default toMicroBatchStream
    def messages(e: Throwable): Seq[String] =
      if (e == null) Seq.empty
      else Option(e.getMessage).toSeq ++ messages(e.getCause)
    assert(messages(err).exists(_.contains("append-only")),
      s"expected the append-only diagnostic, got: ${messages(err)}")
  }

  test("bare COUNT(*) answers from metadata: zero data files scanned") {
    val src = lineitem.limit(500).cache()
    val loc = freshLoc("cnt")
    val t = GraftTable.create(spark, loc, src.schema)
    t.append(src)
    t.append(src.limit(100))
    // filtered count still goes through the real scan (pre-deletion)
    val filtered = spark.read.format("graft").load(loc)
      .filter(col("l_quantity") >= 25).count()
    assert(filtered == 600 - src.unionAll(src.limit(100))
      .filter(col("l_quantity") < 25).count())
    // destroy every data file: only a metadata-only plan can still count
    val w = java.nio.file.Files.walk(java.nio.file.Paths.get(loc, "data"))
    try {
      import scala.jdk.CollectionConverters._
      w.iterator.asScala.filter(_.toString.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.delete(p))
    } finally w.close()
    assert(spark.read.format("graft").load(loc).count() == 600L,
      "DataFrame count() did not answer from metadata")
    // MIN/MAX from per-file stat bounds, mixed with COUNT(*), and
    // through SQL via the catalog — still zero data files on disk
    val expMin = src.agg(min("l_orderkey")).head().getLong(0)
    val expMax = src.agg(max("l_shipdate")).head()
      .getAs[java.time.LocalDateTime](0)
    val wh = java.nio.file.Files.createTempDirectory("graft-cnt-wh")
    spark.conf.set("spark.sql.catalog.gcnt", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcnt.warehouse", wh.toString)
    java.nio.file.Files.createDirectories(wh.resolve("db"))
    val link = wh.resolve("db").resolve("t")
    java.nio.file.Files.createSymbolicLink(link,
      java.nio.file.Paths.get(loc))
    val r = spark.sql(
      """SELECT COUNT(*) AS a, MIN(l_orderkey) AS b, MAX(l_shipdate) AS c,
        |       MAX(l_returnflag) AS d
        |FROM gcnt.db.t""".stripMargin).head()
    assert(r.getLong(0) == 600L)
    assert(r.getLong(1) == expMin)
    assert(r.getAs[java.time.LocalDateTime](2) == expMax)
    assert(r.getString(3) == "R")
    // float/double min/max must NOT claim pushdown (NaN ordering) —
    // with the data files gone the ordinary scan fails, proving the
    // eligibility gate rather than silently wrong answers
    intercept[Exception] {
      spark.sql("SELECT MIN(l_quantity) FROM gcnt.db.t").collect() }
  }

  test("connector planning stays off the driver above the threshold") {
    val src = lineitem.limit(800).cache()
    val loc = freshLoc("distplan")
    val t = GraftTable.create(spark, loc, src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    // several commits → several manifests, so bounded planning is visible
    (0 to 3).foreach(i =>
      t.append(src.filter(col("l_orderkey") % 4 === i)))
    spark.conf.set("spark.graft.distributedPlanningThreshold", "1")
    try {
      val before = graft.table.ManifestRef.entriesReads.get()
      // batch read through the native DSv2 path with a pushed filter
      val n = spark.read.format("graft").load(loc)
        .filter(col("l_shipdate") >= "1997-06-01")
        .select("l_orderkey", "l_quantity").count()
      assert(n == src.filter(col("l_shipdate") >= "1997-06-01").count())
      // micro-batch planning through the streaming path
      val root = java.nio.file.Files.createTempDirectory("distplan-s").toString
      val q = spark.readStream.format("graft").load(loc)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(graft.table.ManifestRef.entriesReads.get() == before,
        "connector planning materialized manifest entries on the driver")
    } finally
      spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  test("storage-partitioned join: co-partitioned tables join with no shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val src = lineitem.limit(2000).cache()
    def build(name: String, df: org.apache.spark.sql.DataFrame): String = {
      val loc = freshLoc(name)
      val t = GraftTable.create(spark, loc, df.schema,
        partitionBy = Seq(("l_returnflag", graft.model.TIdentity, "flag_p")))
      t.append(df, repartitionByPartition = true)
      loc
    }
    val locA = build("spja", src)
    val locB = build("spjb",
      src.groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("q")).toDF())
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val a = spark.read.format("graft").load(locA)
      val b = spark.read.format("graft").load(locB)
      val joined = a.join(b, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      // the join itself must be shuffle-free (both sides key-grouped on
      // the storage partitioning); only the final single-key aggregate
      // may exchange — and since the join output is already clustered
      // by the key, even that collapses
      assert(shuffles.isEmpty,
        s"expected a shuffle-free storage-partitioned join, found " +
          s"${shuffles.size} exchanges:\n${joined.queryExecution.executedPlan}")
      // and the answer matches the computation on the raw source
      val expect = src.join(
          src.groupBy("l_returnflag", "l_linestatus")
            .agg(sum("l_quantity").as("q")), "l_returnflag")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expect).isEmpty &&
        expect.exceptAll(joined).isEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket SPJ: catalog tables bucketed on the join key, no shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val wh = java.nio.file.Files.createTempDirectory("graft-bspj-wh")
    spark.conf.set("spark.sql.catalog.gbspj", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbspj.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gbspj.db")
    spark.sql(
      """CREATE TABLE gbspj.db.orders (o_key BIGINT, o_total DOUBLE)
        |PARTITIONED BY (bucket(8, o_key))""".stripMargin)
    spark.sql(
      """CREATE TABLE gbspj.db.items (o_key BIGINT, qty DOUBLE)
        |PARTITIONED BY (bucket(8, o_key))""".stripMargin)
    import spark.implicits._
    (1L to 400L).map(i => (i, i * 1.5)).toDF("o_key", "o_total")
      .createOrReplaceTempView("bspj_o")
    (1L to 1200L).map(i => (i % 400 + 1, i * 0.25)).toDF("o_key", "qty")
      .createOrReplaceTempView("bspj_i")
    spark.sql("INSERT INTO gbspj.db.orders SELECT * FROM bspj_o")
    spark.sql("INSERT INTO gbspj.db.items SELECT * FROM bspj_i")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = spark.sql(
        """SELECT o.o_key, o.o_total, SUM(i.qty) AS q
          |FROM gbspj.db.orders o JOIN gbspj.db.items i
          |  ON o.o_key = i.o_key
          |GROUP BY o.o_key, o.o_total""".stripMargin)
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected a shuffle-free bucket SPJ, found ${shuffles.size}:\n" +
          joined.queryExecution.executedPlan)
      assert(joined.count() == 400)
      assert(joined.filter(col("o_key") === 7L).head().getDouble(2) ==
        (1L to 1200L).filter(i => i % 400 + 1 == 7).map(_ * 0.25).sum)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-sorted bucket tables join with a sort-free SMJ " +
      "(SupportsReportOrdering)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.SortExec
    val wh = java.nio.file.Files.createTempDirectory("graft-sspj-wh")
    spark.conf.set("spark.sql.catalog.gsrt", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsrt.warehouse", wh.toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gsrt.db")
    for (t <- Seq("a", "b")) {
      spark.sql(
        s"""CREATE TABLE gsrt.db.$t (k BIGINT, v DOUBLE)
          |PARTITIONED BY (bucket(4, k))
          |TBLPROPERTIES('write.distribution-mode'='hash')""".stripMargin)
      // sort order declared BEFORE any rows: the sequence watermark
      // covers every file, and hash distribution → ONE file per bucket
      spark.sql(s"CALL gsrt.system.set_sort_order('db.$t', 'k')")
    }
    import spark.implicits._
    (1L to 500L).map(i => (i, i * 1.5)).toDF("k", "v")
      .createOrReplaceTempView("sspj_a")
    (1L to 500L).map(i => (i, i * 0.25)).toDF("k", "v")
      .createOrReplaceTempView("sspj_b")
    spark.sql("INSERT INTO gsrt.db.a SELECT * FROM sspj_a")
    spark.sql("INSERT INTO gsrt.db.b SELECT * FROM sspj_b")
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def planOf() = spark.sql(
        """SELECT a.k, a.v, b.v AS w FROM gsrt.db.a a
          |JOIN gsrt.db.b b ON a.k = b.k""".stripMargin)
      val joined = planOf()
      val plan = joined.queryExecution.executedPlan
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"expected shuffle-free SPJ:\n$plan")
      // the headline: each side is ONE sorted file per bucket and the
      // scan reports its ordering, so the SMJ needs NO Sort nodes
      assert(plan.collect { case s: SortExec => s }.isEmpty,
        s"expected a SORT-FREE storage-partitioned SMJ:\n$plan")
      assert(joined.count() == 500)
      assert(joined.filter(col("k") === 7L).head().getDouble(2) == 1.75)

      // a second append gives two independently-sorted files per bucket
      // — the split is no longer provably sorted, the report must
      // withdraw (sorts reappear, results stay right)
      spark.sql("INSERT INTO gsrt.db.b SELECT k + 1000, v FROM sspj_b")
      val again = planOf()
      val plan2 = again.queryExecution.executedPlan
      assert(plan2.collect { case s: SortExec => s }.nonEmpty,
        s"multi-file buckets must NOT report ordering:\n$plan2")
      assert(again.count() == 500)

      // a sort-strategy compaction that RE-STATES the default order
      // restores one sorted file per bucket — the claim (and the
      // sort-free plan) must come back
      spark.sql(s"CALL gsrt.system.compact('db.b', ${256L << 20}, " +
        "'sort', 'k')")
      val restored = planOf()
      assert(restored.queryExecution.executedPlan
        .collect { case s: SortExec => s }.isEmpty,
        "default-order re-cluster must restore the ordering claim")
      assert(restored.count() == 500)

      // ... but an EXPLICIT NON-DEFAULT sort rewrite produces files not
      // clustered by k: the commit advances the ordering watermark and
      // the claim is withdrawn even though every split is one file
      val tb = graft.table.GraftTable.load(spark,
        java.nio.file.Paths.get(wh.toString, "db", "b").toString)
      tb.compact(sortWithin = Seq(col("v")))
      val invalidated = planOf()
      assert(invalidated.queryExecution.executedPlan
        .collect { case s: SortExec => s }.nonEmpty,
        "non-default sort rewrite must invalidate the ordering claim")
      assert(invalidated.count() == 500)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("concurrent format(graft) writers all commit through the V2 path") {
    val src = lineitem.limit(300).cache()
    val loc = freshLoc("conc")
    GraftTable.create(spark, loc, src.schema)
    val writers = 4
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futures = (1 to writers).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            src.write.format("graft").mode("append").save(loc)
        })
      }
      futures.foreach(_.get(300, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    val t = GraftTable.load(spark, loc)
    assert(t.scan().count() == src.count() * writers)
    assert(t.metadata.snapshots.get.size == writers)
    assert(t.metadata.snapshots.get.map(_.sequenceNumber).sorted ==
      (1L to writers.toLong))
  }

  test("DSv2 read equals scan on a mutated table (deletes + evolution)") {
    val src = lineitem.limit(400).cache()
    val loc = freshLoc("mut")
    val t = GraftTable.create(spark, loc, src.schema)
    t.append(src)
    t.deleteWhereMoR(col("l_orderkey") % 7 === 0)
    t.renameColumn("l_returnflag", "l_note")
    val viaScan = t.scan().orderBy("l_orderkey", "l_linenumber")
    val viaDsv2 = spark.read.format("graft").load(loc)
      .orderBy("l_orderkey", "l_linenumber")
    assert(viaDsv2.schema.fieldNames.contains("l_note"))
    assert(viaScan.exceptAll(viaDsv2).isEmpty &&
      viaDsv2.exceptAll(viaScan).isEmpty)
  }

  test("incremental batch read: start/end-snapshot-id options") {
    import spark.implicits._
    val loc = freshLoc("incr")
    val df = (1L to 90L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df.schema)
    val s1 = t.append(df.filter(col("id") <= 30))
    val s2 = t.append(df.filter(col("id") > 30 && col("id") <= 60))
    t.deleteWhereMoR(col("id") === 40L) // inside the range, MoR
    val s3 = t.append(df.filter(col("id") > 60))

    // (s1, current]: appends 2+3 minus the MoR-deleted row
    val got = spark.read.format("graft")
      .option("start-snapshot-id", s1.snapshotId).load(loc)
    val wantIds = (31L to 90L).filterNot(_ == 40L)
    assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == wantIds)
    // bounded end: (s1, s2] stops before the third append
    val bounded = spark.read.format("graft")
      .option("start-snapshot-id", s1.snapshotId)
      .option("end-snapshot-id", s2.snapshotId).load(loc)
    assert(bounded.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (31L to 60L))
    // matches the engine surface exactly
    val engine = t.incrementalRead(s1.snapshotId, s3.snapshotId)
    assert(got.exceptAll(engine).isEmpty && engine.exceptAll(got).isEmpty)
    // guards: no combining with time travel, not writable
    intercept[Exception] {
      spark.read.format("graft")
        .option("start-snapshot-id", s1.snapshotId)
        .option("snapshot-id", s2.snapshotId).load(loc).collect()
    }
    intercept[Exception] {
      df.write.format("graft").mode("append")
        .option("start-snapshot-id", s1.snapshotId).save(loc)
    }
  }

  test("large files range-split into multiple input partitions") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.01", "lineitem")
    val big = src.unionAll(src.withColumn("l_orderkey",
      col("l_orderkey") + 10000000L))
    val loc = freshLoc("split")
    // small row groups so byte ranges land on distinct group midpoints
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = Option(hc.get("parquet.block.size"))
    hc.setInt("parquet.block.size", 256 * 1024)
    val t = try {
      val t = GraftTable.create(spark, loc, big.schema)
      t.append(big.coalesce(1))
      t
    } finally oldBlock match {
      case Some(v) => hc.set("parquet.block.size", v)
      case None => hc.unset("parquet.block.size")
    }
    val entries = t.liveManifests().filter(_.content == 0)
    assert(entries.map(_.entryCount).sum == 1, "expected one data file")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (1L << 20).toString)
    try {
      val df = spark.read.format("graft").load(loc)
      // the single >1MiB file fans out over several byte-range splits...
      assert(df.rdd.getNumPartitions >= 2,
        s"expected range splits, got ${df.rdd.getNumPartitions}")
      // ...with no row lost or duplicated across range boundaries
      assert(df.count() == big.count())
      val whole = t.scan()
      assert(df.exceptAll(whole).isEmpty && whole.exceptAll(df).isEmpty)
      // a _pos scan must NOT split (positions count per file from zero):
      // one partition for the one file, every position distinct
      val withPos = spark.read.format("graft").load(loc)
        .select(col("l_orderkey"), col("_pos"))
      assert(withPos.rdd.getNumPartitions == 1,
        "a _pos scan must read whole files")
      assert(withPos.select("_pos").distinct().count() == big.count())
    } finally
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("streaming admission control: maxFilesPerTrigger / maxRowsPerTrigger") {
    val events = Tables.tbl(spark, "/root/testdata/sf0.001", "events")
      .limit(800).cache()
    val total = events.count()
    val root = java.nio.file.Files.createTempDirectory("dsv2-limit").toString
    val t = GraftTable.create(spark, s"$root/src", events.schema)
    // backlog of 4 append snapshots, 2 data files each
    for (i <- 0 until 4)
      t.append(events.filter(col("user_id") % 4 === i).repartition(2))
    val maxSnapRows = (0 until 4)
      .map(i => events.filter(col("user_id") % 4 === i).count()).max

    // drain the backlog under the given read options; returns the
    // per-micro-batch row counts in arrival order
    def drain(tag: String, opts: (String, String)*): Seq[Long] = {
      val sizes = java.util.Collections.synchronizedList(
        new java.util.ArrayList[java.lang.Long]())
      val reader = opts.foldLeft(spark.readStream.format("graft")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(s"$root/src").writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          sizes.add(df.count()): Unit
        }
        .option("checkpointLocation", s"$root/ckpt-$tag")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      sizes.asScala.toSeq.map(_.longValue).filter(_ > 0)
    }

    // no limit: the whole backlog is one batch
    val all = drain("all")
    assert(all.size == 1 && all.sum == total, s"unlimited drain: $all")

    // 2-file cap admits exactly one 2-file snapshot per batch
    val byFiles = drain("files", "maxFilesPerTrigger" -> "2")
    assert(byFiles.size == 4, s"expected 4 capped batches, got $byFiles")
    assert(byFiles.sum == total, s"capped drain lost rows: $byFiles")

    // a row cap below two snapshots' rows also yields snapshot-per-batch
    val byRows = drain("rows", "maxRowsPerTrigger" -> maxSnapRows.toString)
    assert(byRows.size == 4, s"expected 4 row-capped batches, got $byRows")
    assert(byRows.sum == total, s"row-capped drain lost rows: $byRows")

    // an oversized single commit is still admitted (progress guarantee):
    // each snapshot has 2 files, cap of 1 must not stall the stream
    val oversized = drain("oversized", "maxFilesPerTrigger" -> "1")
    assert(oversized.size == 4 && oversized.sum == total,
      s"oversized-commit progress violated: $oversized")

    // capped resume on a committed checkpoint: two more commits land,
    // re-running the SAME checkpoint reads exactly the new snapshots —
    // one per capped batch, nothing re-read
    val extra = (1 to 2).map { i =>
      val rows = events.withColumn("user_id",
        col("user_id") + lit(1000L * i))
      t.append(rows.repartition(2))
      rows.count()
    }
    val resumed = drain("files", "maxFilesPerTrigger" -> "2")
    assert(resumed.size == 2,
      s"resume should process 2 new capped batches: $resumed")
    assert(resumed.sum == extra.sum,
      s"resume read wrong rows: $resumed vs ${extra.sum}")
  }
}
