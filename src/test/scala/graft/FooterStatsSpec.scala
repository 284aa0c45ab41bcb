package graft

import graft.model._
import graft.table.{ColStats, GraftTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-15 footer-stats commit path: manifest stats come straight
  * off parquet footers (O(files)) instead of re-scanning the written
  * data (O(data)). The contract is BYTE EQUALITY with the scan-based
  * aggregate for every supported type, and sound OMISSION wherever the
  * footer carries no usable statistics.
  */
class FooterStatsSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/t"

  /** Build one table per stats path from the same input, coalesced to a
    * single file so the two entries compare 1:1.
    */
  private def bothPaths(df: DataFrame)
      : (graft.table.DataFileEntry, graft.table.DataFileEntry) = {
    val one = df.coalesce(1)
    val tF = GraftTable.create(spark, freshLoc("fstats-f"), df.schema)
    tF.append(one)
    spark.conf.set("spark.graft.footerStats", "false")
    val tS =
      try {
        val t = GraftTable.create(spark, freshLoc("fstats-s"), df.schema)
        t.append(one)
        t
      } finally spark.conf.unset("spark.graft.footerStats")
    val Seq(eF) = tF.planFiles(None)
    val Seq(eS) = tS.planFiles(None)
    (eF, eS)
  }

  test("footer stats equal scan stats byte-for-byte across all types") {
    val df = spark.range(1000).selectExpr(
      "id as l",
      "cast(id % 97 as int) as i",
      "id % 2 = 0 as b",
      "cast(id as float) / 3.0f as f",
      "cast(id as double) / 7.0 as d",
      "cast(cast(id as decimal(12,2)) / 3 as decimal(12,2)) as dec",
      // precision > 18 → FIXED_LEN_BYTE_ARRAY physical (Binary branch)
      "cast(cast(id as decimal(24,4)) * 123456789012 as decimal(24,4)) " +
        "as bigdec",
      "concat('v', lpad(cast(id as string), 5, '0')) as s",
      "date_add(date'2020-01-01', cast(id % 400 as int)) as dt",
      "timestamp_micros(1577836800000000 + id * 987654321) as ts",
      "cast(timestamp_micros(1577836800000000 + id * 123456789) " +
        "as timestamp_ntz) as tsn",
      "named_struct('x', id * 3, 'y', concat('n', cast(id as string))) " +
        "as st")
    val (eF, eS) = bothPaths(df)
    assert(eF.recordCount == eS.recordCount)
    assert(eF.stats.keySet == eS.stats.keySet,
      s"column sets differ: footer=${eF.stats.keySet} scan=${eS.stats.keySet}")
    eS.stats.foreach { case (k, sv) =>
      assert(eF.stats(k) == sv, s"stats differ on $k: " +
        s"footer=${eF.stats(k)} scan=$sv")
    }
    // struct leaves made it through both paths
    assert(eF.stats.contains("st.x") && eF.stats.contains("st.y"))
    // and the zoned timestamp column has REAL bounds — which also proves
    // the INT96→TIMESTAMP_MICROS write pin (INT96 footers carry no
    // usable stats, so this column would be missing without it)
    assert(eF.stats("ts").min.isDefined && eF.stats("ts").max.isDefined)
  }

  test("driver and distributed footer-shard paths emit identical entries") {
    // r20 optimization: small writes read footers on the DRIVER (no
    // Spark job); spark.graft.driverStatsThreshold=0 forces the
    // distributed path over the same input. Entries must match exactly
    // (paths aside) — same stats, same counts, same partition tuples.
    val df = spark.range(2000).selectExpr(
      "id", "cast(id % 13 as int) as k",
      "concat('s', cast(id % 7 as string)) as s",
      "cast(id as double) / 3.0 as d")
    def entriesVia(thresh: String): Seq[graft.table.DataFileEntry] = {
      spark.conf.set("spark.graft.driverStatsThreshold", thresh)
      try {
        val t = GraftTable.create(spark, freshLoc(s"fstats-p$thresh"),
          df.schema,
          partitionBy = Seq(("k", TIdentity, "k_p")))
        t.append(df.repartition(4))
        t.planFiles(None).sortBy(e => (e.partition.toString, e.path))
      } finally spark.conf.unset("spark.graft.driverStatsThreshold")
    }
    val drv = entriesVia("1000")
    val dist = entriesVia("0")
    assert(drv.size == dist.size, s"${drv.size} vs ${dist.size} entries")
    drv.zip(dist).foreach { case (a, b) =>
      assert(a.recordCount == b.recordCount)
      assert(a.partition == b.partition)
      assert(a.stats == b.stats,
        s"stats differ for ${a.partition}: ${a.stats} vs ${b.stats}")
    }
  }

  test("data files write int64-micros timestamps, never INT96") {
    // Iceberg requires int64 micros for timestamp/timestamptz data;
    // Spark's default INT96 would be unreadable by conforming readers
    val df = spark.range(10).selectExpr("id",
      "timestamp_micros(id * 1000000) as ts")
    val t = GraftTable.create(spark, freshLoc("fstats-ts"), df.schema)
    t.append(df.coalesce(1))
    val Seq(e) = t.planFiles(None)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(e.path),
        spark.sparkContext.hadoopConfiguration))
    try {
      import scala.jdk.CollectionConverters._
      val tsCol = reader.getFooter.getFileMetaData.getSchema
        .getColumns.asScala.find(_.getPath.head == "ts").get
      assert(tsCol.getPrimitiveType.getPrimitiveTypeName.toString == "INT64",
        s"ts physical type: ${tsCol.getPrimitiveType}")
    } finally reader.close()
  }

  test("all-null columns carry (None, None, n) on both paths") {
    val df = spark.range(100).selectExpr("id",
      "cast(null as double) as dnull", "cast(null as string) as snull")
    val (eF, eS) = bothPaths(df)
    assert(eF.stats("dnull") == ColStats(None, None, 100L))
    assert(eF.stats("dnull") == eS.stats("dnull"))
    assert(eF.stats("snull") == ColStats(None, None, 100L))
  }

  test("suppressed footer bounds drop to None with EXACT null counts kept") {
    // parquet suppresses double min/max when a value is NaN, and binary
    // min/max when values exceed the stats size cap — but it still
    // records the exact null count. The footer path must emit
    // (None, None, exact-nulls): boundless stats never prune a range
    // filter, while IS [NOT] NULL pruning stays exact. Filters on those
    // columns still answer exactly via the scan.
    val df = spark.range(64).selectExpr("id",
      "case when id = 7 then cast('NaN' as double) " +
        "else cast(id as double) end as dn",
      "case when id = 9 then cast(null as string) " +
        "else repeat('x', 5000) end as big")
    val loc = freshLoc("fstats-nan")
    val t = GraftTable.create(spark, loc, df.schema)
    t.append(df.coalesce(1))
    val Seq(e) = t.planFiles(None)
    assert(e.stats("dn") == ColStats(None, None, 0L),
      s"NaN double: bounds dropped, nulls exact — got ${e.stats.get("dn")}")
    // oversized binaries make parquet drop the column's statistics
    // ENTIRELY (no usable null count either) — the column must be
    // omitted, not guessed
    assert(!e.stats.contains("big"),
      s"oversized binary must omit stats, got ${e.stats.get("big")}")
    assert(e.stats("id").min.isDefined)
    // pruning still sound without those columns' bounds
    assert(t.scan(Some(col("dn") > 10.0)).count() ==
      df.filter(col("dn") > 10.0).count())
    assert(t.scan(Some(col("big").isNull)).count() == 1L)
    assert(t.countRows(Some(col("id") < 10L)) == 10L)
  }

  test("fuzz: footer/scan stats parity over random data (6 seeds)") {
    // randomized differential: random value ranges (extremes included),
    // random null rates, random row counts — the stats maps must match
    // byte-for-byte. NaN is excluded (covered by the dedicated
    // suppression test: the paths legitimately differ there).
    for (seed <- Seq(2, 3, 5, 7, 11, 13)) {
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(400)
      val nullPct = rnd.nextInt(40)
      val lo = rnd.nextLong() % 1000000L
      val df = spark.range(n).selectExpr(
        s"if(id % 100 < $nullPct, null, id * ${1 + rnd.nextInt(9)} + $lo) " +
          "as l",
        s"if(id % 100 < $nullPct, null, " +
          s"cast((id - ${rnd.nextInt(200)}) as double) / 7.0) as d",
        s"if(id % 100 < $nullPct, null, concat('é中', " +
          "cast(id as string), char(1 + cast(id % 90 as int)))) as s",
        s"if(id % 100 < $nullPct, null, timestamp_micros(" +
          s"${rnd.nextLong() % 100000000000L} + id * 1000003)) as ts",
        s"if(id % 100 < $nullPct, null, cast(cast(id as decimal(22,3)) * " +
          s"${rnd.nextInt(100000)} - 500000 as decimal(22,3))) as dec")
      val (eF, eS) = bothPaths(df)
      assert(eF.recordCount == eS.recordCount, s"seed=$seed rows")
      assert(eF.stats == eS.stats,
        s"seed=$seed stats diverged:\n footer=${eF.stats}\n scan=${eS.stats}")
    }
  }

  test("footer path survives hive-escaped partition directory names") {
    // identity partitions on strings with ':', ' ', '%' produce escaped
    // dir names (literal % on disk) — the footer path's Hadoop listing
    // and URI round-trip must address the literal names, and partition
    // values must decode exactly as the scan path's did
    import spark.implicits._
    val df = Seq((1L, "a:b"), (2L, "c d"), (3L, "e%3Af"), (4L, "plain"))
      .toDF("id", "k")
    val t = GraftTable.create(spark, freshLoc("fstats-esc"), df.schema,
      partitionBy = Seq(("k", TIdentity, "k_p")))
    t.append(df, repartitionByPartition = true)
    val entries = t.planFiles(None)
    assert(entries.flatMap(_.partition.get("k_p")).toSet ==
      Set(Some("a:b"), Some("c d"), Some("e%3Af"), Some("plain")))
    assert(entries.forall(_.stats.get("id").exists(_.min.isDefined)))
    // pruned read THROUGH the escaped dirs answers exactly
    assert(t.scan(Some(col("k") === "a:b")).count() == 1L)
    assert(t.scan(Some(col("k") === "e%3Af"))
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    assert(t.countRows(Some(col("k") === "c d")) == 1L)
  }

  test("partitioned writes summarize tuples identically on both paths") {
    val df = spark.range(400).selectExpr("id", "id % 4 as grp",
      "cast(id as string) as v")
    def build(footer: Boolean): GraftTable = {
      if (!footer) spark.conf.set("spark.graft.footerStats", "false")
      try {
        val t = GraftTable.create(spark, freshLoc(s"fstats-p$footer"),
          df.schema, partitionBy = Seq(("grp", TIdentity, "grp_p")))
        t.append(df, repartitionByPartition = true)
        t
      } finally if (!footer) spark.conf.unset("spark.graft.footerStats")
    }
    val (tF, tS) = (build(true), build(false))
    def summaries(t: GraftTable) = t.liveManifests(None)
      .flatMap(_.partitionSummary).flatten
      .map(pt => pt.partition.get("grp_p").flatten).toSet
    assert(summaries(tF) == summaries(tS))
    assert(summaries(tF) == Set(Some("0"), Some("1"), Some("2"), Some("3")))
    // identical pruning behavior
    val fF = tF.planFiles(Some(col("grp") === 2L))
    val fS = tS.planFiles(Some(col("grp") === 2L))
    assert(fF.size == fS.size && fF.nonEmpty)
    assert(tF.scan(Some(col("grp") === 2L)).count() == 100L)
  }

  test("lineage parity: driver and distributed footer paths both yield " +
      "disjoint covering row-id ranges (r20 ADVICE)") {
    // the two paths compute rowIdOffset differently (single global-offset
    // shard on the driver vs per-shard offsets distributed) — the
    // invariant is that the RESOLVED firstRowId ranges tile [0, total)
    // without gap or overlap on BOTH paths, and the read-side ids agree
    val df = spark.range(3000).selectExpr("id", "cast(id % 5 as int) as k")
    def viaThreshold(thresh: String): (Seq[(Long, Long)], Long) = {
      spark.conf.set("spark.graft.driverStatsThreshold", thresh)
      try {
        val t = GraftTable.create(spark, freshLoc(s"fstats-lin$thresh"),
          df.schema,
          properties = Map(GraftTable.RowLineageProp -> "true"))
        t.append(df.repartition(4))
        t.append(df.selectExpr("id + 10000 as id", "k").repartition(3))
        val ranges = t.liveManifests(None).filter(_.content == 0)
          .flatMap { ref =>
            ref.entries.filter(_.isData).map { e =>
              val first = e.firstRowId.orElse(for {
                base <- ref.firstRowId; off <- e.rowIdOffset
              } yield base + off)
              assert(first.isDefined,
                s"unresolvable firstRowId for ${e.path}")
              (first.get, e.recordCount)
            }
          }
        val distinctIds = t.scanWithLineage()
          .select(countDistinct(col("_row_id"))).head.getLong(0)
        (ranges, distinctIds)
      } finally spark.conf.unset("spark.graft.driverStatsThreshold")
    }
    Seq("1000", "0").foreach { thresh =>
      val (ranges, distinctIds) = viaThreshold(thresh)
      assert(ranges.map(_._2).sum == 6000L, s"row count (thresh=$thresh)")
      // disjoint + covering: sorted ranges tile [0, 6000) exactly
      ranges.sortBy(_._1).foldLeft(0L) { case (expect, (first, n)) =>
        assert(first == expect,
          s"id range gap/overlap at $first, expected $expect " +
            s"(thresh=$thresh)")
        expect + n
      }
      assert(distinctIds == 6000L,
        s"read-side distinct _row_id (thresh=$thresh)")
    }
  }
}
