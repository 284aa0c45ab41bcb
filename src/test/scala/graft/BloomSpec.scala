package graft

import graft.table.{Blooms, GraftTable}
import org.apache.spark.sql.functions._

/** Per-file bloom-filter file skipping: sidecar write, point-lookup
  * pruning where min/max cannot prune, zero false negatives, driver and
  * distributed planning parity, and sidecar lifecycle.
  */
class BloomSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-bloom").toString + "/t"

  /** An 8-file table whose id ranges all overlap completely (round-robin
    * layout): min/max stats prune NOTHING for a point lookup, so any
    * skipping observed is the bloom's.
    */
  private def buildTable(loc: String,
      props: Map[String, String]): GraftTable = {
    import spark.implicits._
    val df = (0L until 8000L).map(i => (i, s"key-$i", i % 7))
      .toDF("id", "name", "grp")
    val t = GraftTable.create(spark, loc, df.schema, properties = props)
    t.append(df.repartition(8))
    t
  }

  test("blooms build in the stats pass and land in sidecars") {
    val t = buildTable(tmp(), Map(Blooms.ColumnsProp -> "id,name",
      Blooms.ItemsProp -> "2000"))
    val entries = t.liveEntries().filter(_.isData)
    assert(entries.length == 8)
    entries.foreach { e =>
      val b = e.bloom.get
      assert(b.cols.keySet == Set("id", "name"))
      assert(java.nio.file.Files.isRegularFile(
        java.nio.file.Paths.get(b.path)))
      // the two ranges tile the sidecar contiguously
      val ranges = b.cols.values.toSeq.sortBy(_._1)
      assert(ranges.head._1 == 0L)
      assert(ranges(1)._1 == ranges.head._2)
    }
    // the data files also carry PARQUET-native blooms for row-group
    // skipping inside kept files
    import scala.jdk.CollectionConverters._
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(entries.head.path),
        spark.sessionState.newHadoopConf()))
    try {
      val cols = rd.getFooter.getBlocks.get(0).getColumns.asScala
      assert(cols.find(_.getPath.toDotString == "id")
        .exists(_.getBloomFilterOffset >= 0), "no parquet bloom on id")
      assert(cols.find(_.getPath.toDotString == "grp")
        .exists(_.getBloomFilterOffset < 0), "unexpected bloom on grp")
    } finally rd.close()
    // no property → no blooms, nothing else changes
    val plain = buildTable(tmp(), Map.empty)
    assert(plain.liveEntries().forall(_.bloom.isEmpty))
  }

  test("point lookup prunes files min/max cannot, with zero false negatives") {
    val t = buildTable(tmp(), Map(Blooms.ColumnsProp -> "id,name",
      Blooms.ItemsProp -> "2000"))
    val plain = buildTable(tmp(), Map.empty) // identical layout, no blooms
    assert(t.planFiles().length == 8 && plain.planFiles().length == 8)
    // 50 point lookups: blooms must beat stats-only pruning decisively
    // AND never lose the true row (false negatives are impossible)
    var bloomKept = 0
    var statsKept = 0
    val ids = (0L until 8000L by 163L).toSeq
    ids.foreach { id =>
      val kept = t.planFiles(Some(col("id") === id))
      bloomKept += kept.length
      statsKept += plain.planFiles(Some(col("id") === id)).length
      val rows = t.scan(Some(col("id") === id)).collect()
      assert(rows.length == 1 && rows.head.getAs[Long]("id") == id,
        s"lost id $id")
      assert(kept.nonEmpty, s"id $id pruned away entirely")
    }
    val bloomAvg = bloomKept.toDouble / ids.length
    val statsAvg = statsKept.toDouble / ids.length
    // round-robin layout: stats keep (nearly) everything...
    assert(statsAvg > 4.0, s"layout not adversarial: stats avg $statsAvg")
    // ...bloom keeps ≈ 1 + (files-1)*fpp; generous bound at 2.0
    assert(bloomAvg < 2.0 && bloomAvg < statsAvg / 2,
      s"bloom avg $bloomAvg vs stats avg $statsAvg")
    // string-column lookups prune the same way
    val keptStr = t.planFiles(Some(col("name") === "key-4242")).length
    assert(keptStr < plain.planFiles(Some(col("name") === "key-4242")).length)
    assert(t.scan(Some(col("name") === "key-4242")).count() == 1)
  }

  test("IN-set pruning keeps the union of may-contain files") {
    val t = buildTable(tmp(), Map(Blooms.ColumnsProp -> "id",
      Blooms.ItemsProp -> "2000"))
    val ids = Seq(11L, 4242L, 7777L)
    val kept = t.planFiles(Some(col("id").isin(ids: _*)))
    assert(kept.nonEmpty && kept.length < 8)
    val got = t.scan(Some(col("id").isin(ids: _*)))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == ids.sorted)
  }

  test("range predicates ignore blooms (stats-only, still correct)") {
    val t = buildTable(tmp(), Map(Blooms.ColumnsProp -> "id"))
    assert(t.scan(Some(col("id") < 100L)).count() == 100)
    // grp is not bloom'd; equality on it stays stats-only and correct
    assert(t.scan(Some(col("grp") === 3L)).count() ==
      (0L until 8000L).count(_ % 7 == 3))
  }

  test("distributed planning path prunes identically via the bloom probe") {
    val t = buildTable(tmp(), Map(Blooms.ColumnsProp -> "id",
      Blooms.ItemsProp -> "2000"))
    val ids = Seq(99L, 5050L, 6301L)
    val driverKept = ids.map(id =>
      t.planFiles(Some(col("id") === id)).map(_.path).toSet)
    spark.conf.set("spark.graft.distributedPlanningThreshold", "1")
    try {
      val distKept = ids.map(id =>
        t.planFilesDistributed(Some(col("id") === id))
          .collect().map(_.getString(0)).toSet)
      assert(driverKept == distKept)
      // the bloom probe is a StaticInvoke, not a ScalaUDF: the
      // manifest-planning stage must stay inside WholeStageCodegen
      val pdf = t.planFilesDistributed(Some(col("id") === 99L))
      pdf.collect() // finalize AQE so codegen spans are visible
      val p = pdf.queryExecution.executedPlan.toString
      assert(!p.toLowerCase.contains("scalaudf") && !p.contains("UDF("),
        s"bloom planning stage contains a Scala UDF:\n$p")
      assert(p.contains("*("), s"no codegen span in bloom planning:\n$p")
      // scan through the distributed planner also loses nothing
      ids.foreach(id =>
        assert(t.scan(Some(col("id") === id)).count() == 1))
      // metadata-assisted count agrees
      assert(t.countRows(Some(col("id") === 5050L)) == 1L)
    } finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  test("DSv2 connector reads inherit bloom pruning via pushed filters") {
    val loc = tmp()
    val t = buildTable(loc, Map(Blooms.ColumnsProp -> "id",
      Blooms.ItemsProp -> "2000"))
    // post-pruning SupportsReportStatistics reflect the planned file set
    // (tiny files bin-pack into one split, so partition counts can't
    // observe pruning — planned bytes can)
    def scanBytes(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          s.scan match {
            case r: org.apache.spark.sql.connector.read
                .SupportsReportStatistics =>
              r.estimateStatistics().sizeInBytes().orElse(-1L)
          }
      }.sum
    val all = spark.read.format("graft").load(loc)
    val point = spark.read.format("graft").load(loc)
      .filter(col("id") === 4242L)
    assert(scanBytes(point) > 0 && scanBytes(point) < scanBytes(all) / 2,
      s"connector planned ${scanBytes(point)} of ${scanBytes(all)} bytes")
    assert(point.count() == 1)
  }

  test("mutation planning skips bloom-absent files") {
    import spark.implicits._
    val t = buildTable(tmp(), Map(Blooms.ColumnsProp -> "id",
      Blooms.ItemsProp -> "2000"))
    val before = t.liveEntries().filter(_.isData).map(_.path).toSet
    t.deleteWhere(col("id") === 4242L)
    val after = t.liveEntries().filter(_.isData).map(_.path).toSet
    // only the bloom-kept file(s) were rewritten; the rest survive as-is
    assert((before -- after).size < 8)
    assert((before intersect after).nonEmpty)
    assert(t.scan().count() == 7999)
    assert(t.scan(Some(col("id") === 4242L)).count() == 0)
  }

  test("rewritten files get fresh blooms; expire cleans orphaned sidecars") {
    val t = buildTable(tmp(), Map(Blooms.ColumnsProp -> "id",
      Blooms.ItemsProp -> "2000"))
    val oldBlooms = t.liveEntries().filter(_.isData)
      .flatMap(_.bloom.map(_.path)).toSet
    t.deleteWhere(col("id") === 123L) // CoW rewrite of may-match files
    val newEntries = t.liveEntries().filter(_.isData)
    // every live data file still carries a bloom (carried or rebuilt)
    assert(newEntries.forall(_.bloom.isDefined))
    t.expireSnapshots(keepLast = 1)
    val liveBlooms = t.liveEntries().filter(_.isData)
      .flatMap(_.bloom.map(_.path)).toSet
    liveBlooms.foreach(p => assert(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(p)), s"live sidecar $p deleted"))
    // sidecars of expired-only files are gone
    (oldBlooms -- liveBlooms).foreach(p =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
        s"orphan sidecar $p survived expire"))
    // pruning still works after the lifecycle churn
    assert(t.scan(Some(col("id") === 777L)).count() == 1)
  }
}
