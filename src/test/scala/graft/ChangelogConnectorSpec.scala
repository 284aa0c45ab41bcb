package graft

import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The connector changelog (CDF) surfaces: batch `option("changelog")`
  * reads, the staged micro-batch stream (exactly-once across restarts,
  * staging cleanup on commit), and CALL create_changelog_view.
  */
class ChangelogConnectorSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  /** A 3-commit MoR history: 2 appends + 1 position-delete commit. */
  private def buildHistory(loc: String): GraftTable = {
    import spark.implicits._
    val df0 = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df0.schema)
    t.append(df0.coalesce(1))
    t.append((61L to 90L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.deleteWhereMoR(col("id") % 10 === 0)
    t
  }

  test("batch changelog read equals the engine's changes()") {
    val loc = tmp("graft-cdfb")
    val t = buildHistory(loc)
    val viaConnector = spark.read.format("graft")
      .option("changelog", "true").load(loc)
    assert(viaConnector.columns.takeRight(3).toSeq ==
      Seq("_change_type", "_commit_snapshot_id", "_commit_sequence"))
    val got = viaConnector
      .select("id", "_change_type", "_commit_sequence")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val first = t.metadata.snapshots.get.minBy(_.sequenceNumber)
    val expected = t.changesBySeq(0L, t.metadata.currentSnapshotId.get)
      .select("id", "_change_type", "_commit_sequence")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == expected)
    // 90 inserts + 9 recovered deletes
    assert(got.count(_._2 == "insert") == 90)
    assert(got.count(_._2 == "delete") == 9)
    // from a mid-history snapshot: only later commits
    val fromMid = spark.read.format("graft")
      .option("changelog", "true")
      .option("changelog-from", first.snapshotId.toString).load(loc)
    assert(fromMid.filter(col("_commit_sequence") === 1).count() == 0)
    assert(fromMid.count() == 30 + 9)
  }

  test("streaming changelog: per-commit batches, restart resumes exactly-once") {
    import spark.implicits._
    val loc = tmp("graft-cdfs")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdfs-ck")
      .toString
    val sinkLoc = tmp("graft-cdfs-sink")
    val t = buildHistory(loc)
    // the graft streaming sink appends to an EXISTING table
    val cdfSchema = graft.connector.GraftChangelog.schemaFor(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val sinkT = GraftTable.create(spark, sinkLoc, cdfSchema)

    def runOnce(): Unit = {
      val src = spark.readStream.format("graft")
        .option("changelog", "true").load(loc)
      val q = sinkT.appendStream(src, ckpt)
      q.awaitTermination(120000)
      assert(!q.isActive)
    }
    runOnce()
    val sink = GraftTable.load(spark, sinkLoc)
    val round1 = sink.scan().collect()
    assert(round1.length == 90 + 9)
    assert(round1.count(_.getAs[String]("_change_type") == "delete") == 9)

    // new commits while the stream is down: an append AND an eq-delete
    t.append((91L to 95L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.deleteWhereEq(Seq(2L, 91L).toDF("id"))
    runOnce()
    val round2 = GraftTable.load(spark, sinkLoc).scan().collect()
    // exactly-once: prior rows NOT re-emitted; 5 inserts + 2 deletes new
    assert(round2.length == round1.length + 7,
      s"expected ${round1.length + 7} rows, got ${round2.length}")
    val newDeletes = round2.filter(r =>
      r.getAs[String]("_change_type") == "delete")
      .map(_.getAs[Long]("id")).toSet
    assert(newDeletes.contains(2L) && newDeletes.contains(91L))
    // staging cleanup: Spark commits a source's final batch on the NEXT
    // run (commit lags one batch), so only the last range may remain —
    // every earlier range must be gone, and the survivor must be the
    // final one (its range ends at the current committed sequence)
    val stagedRoot = java.nio.file.Paths.get(loc, "_changelog")
    import scala.jdk.CollectionConverters._
    val ranges = {
      val ls = java.nio.file.Files.walk(stagedRoot, 2)
      try ls.iterator.asScala
        .filter(p => p.getFileName.toString.matches("""\d+-\d+"""))
        .map(_.getFileName.toString).toSeq
      finally ls.close()
    }
    val headSeq = t.metadata.currentSnapshot.get.sequenceNumber
    assert(ranges.size <= 1, s"stale staged ranges: $ranges")
    ranges.foreach(r => assert(r.endsWith(s"-$headSeq"),
      s"survivor $r is not the final range"))
  }

  test("changelog streams ACROSS a compaction commit: net-changes skips it") {
    import spark.implicits._
    val loc = tmp("graft-cdfc")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdfc-ck")
      .toString
    val sinkLoc = tmp("graft-cdfc-sink")
    val t = buildHistory(loc) // appends(60+30) + MoR delete(9)
    // routine maintenance mid-history: rewrites every file, changes no rows
    t.compact()
    // post-compaction logical commits keep flowing
    t.append((91L to 95L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.deleteWhereEq(Seq(5L).toDF("id"))
    val cdfSchema = graft.connector.GraftChangelog.schemaFor(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))))
    val sinkT = GraftTable.create(spark, sinkLoc, cdfSchema)
    val q = sinkT.appendStream(spark.readStream.format("graft")
      .option("changelog", "true").load(loc), ckpt)
    q.awaitTermination(120000)
    val rows = GraftTable.load(spark, sinkLoc).scan().collect()
    // 95 inserts (pre-compaction appends recovered from their OWN
    // snapshots' manifests) + 9 pos-deletes + 1 eq-delete; the replace
    // commit itself contributes NOTHING
    assert(rows.count(_.getAs[String]("_change_type") == "insert") == 95,
      s"got ${rows.count(_.getAs[String]("_change_type") == "insert")}")
    assert(rows.count(_.getAs[String]("_change_type") == "delete") == 10)
    val replaceSeq = t.metadata.snapshots.get
      .find(_.summary.operation.contains("replace")).get.sequenceNumber
    assert(!rows.exists(_.getAs[Long]("_commit_sequence") == replaceSeq),
      "replace commit leaked changelog rows")
    // the batch surface agrees
    val batch = spark.read.format("graft")
      .option("changelog", "true").load(loc)
    assert(batch.count() == rows.length.toLong)
    // eq-delete AFTER compaction recovers content from compacted files
    val eqDel = rows.filter(r =>
      r.getAs[String]("_change_type") == "delete" &&
        r.getAs[Long]("id") == 5L)
    assert(eqDel.length == 1 && eqDel.head.getAs[String]("v") == "v5")
  }

  test("CALL create_changelog_view: full history queryable as a view") {
    val wh = java.nio.file.Files.createTempDirectory("graft-whcdf").toString
    spark.conf.set("spark.sql.catalog.gcdf", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcdf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcdf.db")
    spark.sql("CREATE TABLE gcdf.db.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gcdf.db.t SELECT id, CAST(id AS STRING) " +
      "FROM range(50)")
    spark.sql("INSERT INTO gcdf.db.t VALUES (100, 'x'), (101, 'y')")
    val out = spark.sql(
      "CALL gcdf.system.create_changelog_view('db.t', 'cdf_v')").collect()
    assert(out.length == 1 && out.head.getString(0) == "cdf_v")
    val rows = spark.sql(
      "SELECT _change_type, count(*) n FROM cdf_v GROUP BY 1").collect()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("insert" -> 52L))
    // per-commit attribution is queryable
    assert(spark.sql(
      "SELECT count(DISTINCT _commit_snapshot_id) FROM cdf_v")
      .head().getLong(0) == 2L)
  }

  test("streaming changelog honors maxFilesPerTrigger admission caps") {
    import spark.implicits._
    val loc = tmp("graft-cdfl")
    val df0 = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = GraftTable.create(spark, loc, df0.schema)
    // 4 single-file append commits, then one MoR delete commit
    for (i <- 0 until 4)
      t.append(df0.filter(col("id") % 4 === i).coalesce(1))
    t.deleteWhereMoR(col("id") % 10 === 0)

    def drain(tag: String, opts: (String, String)*): Seq[Long] = {
      val sizes = java.util.Collections.synchronizedList(
        new java.util.ArrayList[java.lang.Long]())
      val reader = opts.foldLeft(
        spark.readStream.format("graft").option("changelog", "true")) {
        case (r, (k, v)) => r.option(k, v)
      }
      val q = reader.load(loc).writeStream
        .foreachBatch {
          (df: org.apache.spark.sql.DataFrame, _: Long) =>
            sizes.add(df.count()): Unit
        }
        .option("checkpointLocation", s"$loc-ckpt-$tag")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      sizes.asScala.toSeq.map(_.longValue).filter(_ > 0)
    }

    val all = drain("all")
    assert(all.size == 1, s"unlimited drain should be one batch: $all")
    // one file per append commit: cap 1 yields one append per batch; the
    // MoR delete adds no DATA files but is charged by its delete-file
    // delta (1-file floor), so it lands in its OWN batch instead of
    // riding in free — delete-heavy backlogs stay bounded by the caps
    val capped = drain("capped", "maxFilesPerTrigger" -> "1")
    assert(capped.size == 5,
      s"expected 4 append + 1 delete batches, got $capped")
    assert(capped.sum == all.sum,
      s"capped drain changed the row total: $capped vs $all")
  }

  test("CoW changelog replication formula: chunked two-level explode " +
      "emits exactly |net| rows past the chunk boundary (r20 ADVICE)") {
    // the production path replicates net row counts with a two-level
    // explode bounded at GraftTable.ChangelogChunk elements per array
    // (one sequence() was O(count) memory and failed above ~2.1B);
    // exercise the exact expression shape with the REAL constant across
    // the boundary cases
    import org.apache.spark.sql.functions._
    val chunk = graft.table.GraftTable.ChangelogChunk
    val weights = Seq(1L, 2L, chunk - 1, chunk, chunk + 1,
      2 * chunk, 2 * chunk + 5)
    val df = spark.createDataFrame(
      weights.map(w => Tuple1(w))).toDF("__w")
    val out = df
      .withColumn("__c",
        expr(s"explode(sequence(0L, (abs(__w) - 1L) div ${chunk}L))"))
      .withColumn("__i", expr(
        s"explode(sequence(1L, least(${chunk}L, abs(__w) - __c * ${chunk}L)))"))
      .groupBy("__w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    weights.foreach(w => assert(out(w) == w,
      s"weight $w replicated ${out.getOrElse(w, 0L)} times"))
  }
}
