package graft

import graft.model._
import graft.table.GraftTable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Randomized differential test of pruning soundness: for random filter
  * conjunctions, a metadata-pruned scan and countRows must agree exactly
  * with a plain Spark filter over the source data. Any file wrongly
  * pruned (or wrongly certified by mustMatch) shows up as a count
  * mismatch. Fixed seed → deterministic.
  */
class PruningFuzzSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xf005ba11L)

  private def randomPredicate(): Column = {
    def one(): Column = rnd.nextInt(4) match {
      case 0 => // long key, possibly out of range
        val v = rnd.nextInt(8000).toLong - 500L
        Seq(col("l_orderkey") === v, col("l_orderkey") < v,
          col("l_orderkey") >= v)(rnd.nextInt(3))
      case 1 => // double
        val v = rnd.nextInt(60).toDouble - 5.0
        Seq(col("l_quantity") > v, col("l_quantity") <= v)(rnd.nextInt(2))
      case 2 => // timestamp literal (sometimes date-only, sometimes with time)
        val y = 1994 + rnd.nextInt(9)
        val m = 1 + rnd.nextInt(12)
        val lit0 =
          if (rnd.nextBoolean()) f"$y%04d-$m%02d-15"
          else f"$y%04d-$m%02d-15 13:30:00"
        Seq(col("l_shipdate") >= lit(lit0), col("l_shipdate") < lit(lit0),
          col("l_shipdate") === lit(lit0))(rnd.nextInt(3))
      case _ => // string flag, sometimes a value that doesn't exist
        val v = Seq("A", "N", "R", "Z")(rnd.nextInt(4))
        Seq(col("l_returnflag") === v, col("l_returnflag") > v)(rnd.nextInt(2))
    }
    (1 to (1 + rnd.nextInt(3))).map(_ => one()).reduce(_ && _)
  }

  private def check(t: GraftTable, src: DataFrame, rounds: Int,
      pred: () => Column = () => randomPredicate()): Unit =
    (1 to rounds).foreach { i =>
      val f = pred()
      val expected = src.filter(f).count()
      assert(t.scan(Some(f)).count() == expected, s"scan diverged on: $f")
      assert(t.countRows(Some(f)) == expected, s"countRows diverged on: $f")
      // DSv2 path: Catalyst-pushed filters drive the same pruning (native
      // batch scan on delete-free tables, V1 bridge otherwise)
      assert(spark.read.format("graft").load(t.location).filter(f).count()
        == expected, s"DSv2 read diverged on: $f")
      // same scan with planning forced onto the distributed path
      spark.conf.set("spark.graft.distributedPlanningThreshold", "0")
      try assert(t.scan(Some(f)).count() == expected,
        s"distributed-planned scan diverged on: $f")
      finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
      // distributed planning must never plan FEWER files than the rows
      // require: every row the plain filter finds must live in a planned
      // file (subset-check via the driver plan, which scan just proved)
      val driver = t.planFiles(Some(f)).map(_.path).toSet
      val dist = t.planFilesDistributed(Some(f)).collect()
        .map(_.getString(0)).toSet
      assert(driver.subsetOf(dist),
        s"distributed plan pruned more than driver plan on: $f")
    }

  test("partition summaries skip WHOLE manifests from planning") {
    import spark.implicits._
    import graft.table.ManifestRef
    val df = (0 until 400).map(i => (i.toLong, (i % 8).toLong, s"v$i"))
      .toDF("id", "grp", "v")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("msum").toString + "/t",
      df.schema, partitionBy = Seq(("grp", TIdentity, "grp_p")))
    // one commit per partition → each manifest summarizes ONE tuple
    (0L until 8L).foreach(g => t.append(df.filter(col("grp") === g)))
    val before = ManifestRef.entriesReads.get
    val planned = t.planFiles(Some(col("grp") === 3L))
    val loads = ManifestRef.entriesReads.get - before
    assert(planned.nonEmpty &&
      planned.forall(_.partition.get("grp_p").flatten.contains("3")))
    // 8 data manifests exist; the summary must keep planning from
    // loading (nearly) all of them — exactly 1 here
    assert(loads <= 2, s"manifest summaries did not skip: $loads loads")
    // the unfiltered plan still covers every partition
    assert(t.planFiles(None).map(_.partition.get("grp_p").flatten)
      .flatten.toSet.size == 8)
    // and the filtered SCAN stays exact (the real correctness bar)
    assert(t.scan(Some(col("grp") === 3L)).count() ==
      df.filter(col("grp") === 3L).count())
    // summaries survive the manifest-list round-trip
    val withSummary = t.liveManifests(None)
      .filter(r => r.content == 0 && r.partitionSummary.isDefined)
    assert(withSummary.size == 8, s"summaries missing: $withSummary")
  }

  test("partition summaries stay sound across SPEC EVOLUTION") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i.toLong, (i % 8).toLong, s"v$i"))
      .toDF("id", "grp", "v")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("msev").toString + "/t",
      df.schema, partitionBy = Seq(("grp", TIdentity, "grp_p")))
    (0L until 4L).foreach(g => t.append(df.filter(col("grp") === g)))
    // evolve: new commits partition by bucket(id); OLD manifests keep
    // summarizing under their write-time spec (tuples carry spec ids)
    t.evolvePartitionSpec(Seq(("id", TBucket(4), "id_b")))
    (4L until 8L).foreach(g => t.append(df.filter(col("grp") === g)))
    // a grp filter: old-spec manifests prune by their identity tuples;
    // new-spec manifests (bucket on id — grp not derivable) must be
    // KEPT, and the scan stays exact on the mixed-spec table
    val expected = df.filter(col("grp") === 2L).count()
    assert(t.scan(Some(col("grp") === 2L)).count() == expected)
    assert(t.scan(Some(col("grp") === 6L)).count() ==
      df.filter(col("grp") === 6L).count())
    val planned = t.planFiles(Some(col("grp") === 2L)).map(_.path).toSet
    // every row of grp=2 lives in a planned file (soundness); and the
    // old-spec manifests for other grps were skipped (effectiveness):
    // plan must NOT include old-spec files whose tuple says another grp
    val old2 = t.planFiles(None).filter(e =>
      e.partition.get("grp_p").flatten.exists(_ != "2") &&
        e.partition.contains("grp_p"))
    assert(old2.forall(e => !planned.contains(e.path)),
      "old-spec files of other partitions must prune out")
    // distributed planning agrees
    spark.conf.set("spark.graft.distributedPlanningThreshold", "0")
    try assert(t.scan(Some(col("grp") === 2L)).count() == expected)
    finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  test("fuzz: month-partitioned table (partition + stats pruning)") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("fuzz-m").toString + "/t",
      src.schema, partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)
    check(t, src, rounds = 25)
  }

  test("fuzz: bucket-partitioned sorted table (bucket + stats pruning)") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("fuzz-b").toString + "/t",
      src.schema,
      partitionBy = Seq(("l_orderkey", TBucket(8), "key_bucket")),
      sortOrder = Seq(("l_shipdate", TIdentity)))
    t.append(src, repartitionByPartition = true)
    check(t, src, rounds = 25)
  }

  test("fuzz: bloom'd unsorted table (bloom + stats pruning)") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("fuzz-bl").toString + "/t",
      src.schema,
      properties = Map(
        graft.table.Blooms.ColumnsProp -> "l_orderkey,l_returnflag",
        graft.table.Blooms.ItemsProp -> "4000"))
    // round-robin layout: every file's key range overlaps — equality
    // conjuncts in the random predicates exercise the bloom paths on
    // every planning surface check() covers (driver, distributed, DSv2,
    // countRows); a broken hash contract shows up as lost rows
    t.append(src.repartition(6))
    check(t, src, rounds = 25)
    // bloom pruning survives MoR deletes (data-file blooms unchanged)
    t.deleteWhereMoR(col("l_quantity") < 5)
    val remain = src.filter(!(col("l_quantity") < 5))
    (1 to 10).foreach { _ =>
      val f = randomPredicate()
      assert(t.scan(Some(f)).count() == remain.filter(f).count(),
        s"bloom'd deleted-scan diverged on: $f")
    }
  }

  test("fuzz: filters over stacked position+equality deletes stay exact") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("fuzz-d").toString + "/t",
      src.schema)
    t.append(src.repartitionByRange(6, col("l_orderkey")),
      sortWithin = Seq(col("l_orderkey")))
    t.deleteWhereMoR(col("l_quantity") < 8)
    val keys = src.filter(col("l_returnflag") === "R" &&
      col("l_linenumber") === 1)
      .select("l_orderkey", "l_linenumber").distinct()
    t.deleteWhereEq(keys)
    // ground truth in plain Spark over the source
    val remain = src.filter(!(col("l_quantity") < 8))
      .join(keys, Seq("l_orderkey", "l_linenumber"), "left_anti")
    assert(t.scan().count() == remain.count())
    (1 to 15).foreach { _ =>
      val f = randomPredicate()
      val expected = remain.filter(f).count()
      assert(t.scan(Some(f)).count() == expected,
        s"deleted-scan diverged on: $f")
      assert(t.countRows(Some(f)) == expected,
        s"deleted-countRows diverged on: $f")
      spark.conf.set("spark.graft.distributedPlanningThreshold", "0")
      try assert(t.scan(Some(f)).count() == expected,
        s"distributed deleted-scan diverged on: $f")
      finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
    }
  }

  test("null-count and string-prefix conjuncts prune files") {
    val li = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val src = li.select(col("l_orderkey"), col("l_returnflag"),
      when(col("l_returnflag") === "R", lit(null))
        .otherwise(col("l_returnflag")).as("flag2"),
      concat(col("l_returnflag"), lit("-"), col("l_orderkey")).as("tag"))
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("fuzz-n").toString + "/t",
      src.schema, partitionBy = Seq(("l_returnflag", TIdentity, "flag_p")))
    t.append(src, repartitionByPartition = true)
    assert(t.liveEntries().size == 3) // one file per flag
    // IS NULL: only the R file carries nulls in flag2
    assert(t.planFiles(Some(col("flag2").isNull)).size == 1)
    assert(t.scan(Some(col("flag2").isNull)).count() ==
      src.filter(col("flag2").isNull).count())
    // the all-null file is certified fully-matching: metadata-only count
    assert(t.countRows(Some(col("flag2").isNull)) ==
      src.filter(col("flag2").isNull).count())
    // IS NOT NULL: the all-null file is pruned
    assert(t.planFiles(Some(col("flag2").isNotNull)).size == 2)
    assert(t.countRows(Some(col("flag2").isNotNull)) ==
      src.filter(col("flag2").isNotNull).count())
    // startsWith: tag values cluster by flag prefix
    assert(t.planFiles(Some(col("tag").startsWith("N-"))).size == 1)
    assert(t.scan(Some(col("tag").startsWith("N-"))).count() ==
      src.filter(col("tag").startsWith("N-")).count())
    // distributed planner agrees
    spark.conf.set("spark.graft.distributedPlanningThreshold", "0")
    try {
      assert(t.planFilesDistributed(Some(col("flag2").isNotNull)).count() == 2L)
      assert(t.planFilesDistributed(Some(col("tag").startsWith("N-"))).count() == 1L)
      assert(t.scan(Some(col("tag").startsWith("N-"))).count() ==
        src.filter(col("tag").startsWith("N-")).count())
    } finally spark.conf.unset("spark.graft.distributedPlanningThreshold")
  }

  test("fuzz: float columns — inexact binary literals (stats + identity-partition)") {
    val src0 = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    // qf: many distinct floats like 0.35f whose double widening differs
    // from the decimal literal; lf: low-cardinality float used as an
    // IDENTITY partition column (exercises dir-string normalization)
    val src = src0.select(col("l_orderkey"),
      (col("l_quantity") / 100.0).cast("float").as("qf"),
      (col("l_linenumber") / 20.0).cast("float").as("lf"),
      col("l_returnflag"))
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("fuzz-f").toString + "/t",
      src.schema, partitionBy = Seq(("lf", TIdentity, "lf_p")))
    t.append(src, repartitionByPartition = true)
    def floatPred(): Column = {
      def one(): Column = rnd.nextInt(3) match {
        case 0 => // double literal against float stats col (e.g. 0.35)
          val v = (1 + rnd.nextInt(60)) / 100.0
          Seq(col("qf") < v, col("qf") <= v, col("qf") === v,
            col("qf") >= v, col("qf") > v)(rnd.nextInt(5))
        case 1 => // float literal against float partition col
          val v = ((1 + rnd.nextInt(8)) / 20.0).toFloat
          Seq(col("lf") === lit(v), col("lf") < lit(v),
            col("lf") >= lit(v))(rnd.nextInt(3))
        case _ => // double literal against float partition col
          val v = (1 + rnd.nextInt(8)) / 20.0
          Seq(col("lf") === v, col("lf") <= v, col("lf") > v)(rnd.nextInt(3))
      }
      (1 to (1 + rnd.nextInt(2))).map(_ => one()).reduce(_ && _)
    }
    check(t, src, rounds = 40, pred = floatPred _)
  }
}
