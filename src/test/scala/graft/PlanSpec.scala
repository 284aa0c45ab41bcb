package graft

import graft.table.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression tests: the properties that matter at 100 TB
  * are asserted, not just audited — filters reach the parquet scan,
  * small sides broadcast, reads are column-pruned, and no accidental
  * cartesian products appear.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def pushed(p: String): Seq[String] =
    "PushedFilters: \\[[^\\]\\n]+".r.findAllIn(p).toSeq
      .filterNot(_.contains("[]"))

  test("headline joins: broadcast dims, pushed filters, no cartesian") {
    Seq("q03_join_agg", "q04_broadcast_join", "q05_multi_join",
      "q06_semi_join").foreach { q =>
      val p = plan(Registry.byName(q).fn(spark, "/root/testdata/sf0.001"))
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product")
      assert(pushed(p).nonEmpty, s"$q: no pushed filters")
    }
  }

  test("table scan pushes residual filters below MoR delete anti-joins") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("planspec").toString + "/t",
      src.schema)
    t.append(src)
    t.deleteWhereMoR(col("l_quantity") < 5)
    t.deleteWhereEq(src.filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber").distinct())
    val p = plan(t.scan(Some(col("l_shipdate") >= lit("1997-06-01"))))
    // the user filter reaches the data parquet scan…
    assert(pushed(p).exists(_.contains("l_shipdate")),
      "residual filter not pushed to the data scan")
    // …and both delete applications are broadcast (corpus never shuffles)
    assert(p.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")) >= 2,
      "delete anti-joins are not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("equality deletes: one anti-join per column-set, not per data-sequence group") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("planspec3").toString + "/t",
      src.schema)
    // three data sequence groups…
    t.append(src.filter(col("l_linenumber") === 1))
    t.append(src.filter(col("l_linenumber") === 2))
    t.deleteWhereEq(src.filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber").distinct())
    t.append(src.filter(col("l_linenumber") === 3))
    // …one key-column-set: the scan CONSTRUCTS a single anti-join above
    // the union with the delete sequence in the join condition (the old
    // fold built one join per seq group, re-planning the delete read
    // each time). Catalyst then legally pushes it through the union and
    // specializes each branch's build by its literal sequence — so the
    // structural property is pinned on the ANALYZED plan, and the
    // physical requirement is that every residual anti-join broadcasts.
    val df = t.scan()
    val analyzedAnti = df.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType.sql == "LEFT ANTI" => j
    }
    assert(analyzedAnti.size == 1,
      s"expected one constructed eq-delete anti-join, got ${analyzedAnti.size}")
    val p = plan(df)
    assert(p.linesIterator.filter(_.contains("LeftAnti"))
      .forall(_.contains("BroadcastHashJoin")),
      "eq-delete anti-joins must broadcast, never shuffle the data side")
    // correctness across the groups: deletes are KEY-addressed (the
    // synthetic lineitem has duplicate key pairs, so anti-join — not a
    // quantity filter — is the oracle) and apply only to earlier data
    val keys = src.filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber").distinct()
    def antiCount(lineno: Int): Long =
      src.filter(col("l_linenumber") === lineno)
        .join(keys, Seq("l_orderkey", "l_linenumber"), "left_anti").count()
    val expected = antiCount(1) + antiCount(2) +
      src.filter(col("l_linenumber") === 3).count()
    assert(t.scan().count() == expected)
  }

  test("column selection prunes the parquet read schema through scan()") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("planspec2").toString + "/t",
      src.schema)
    t.append(src)
    val p = plan(t.scan().select("l_orderkey", "l_quantity"))
    val read = "ReadSchema: struct<[^>]*".r.findFirstIn(p)
      .getOrElse(fail("no ReadSchema in plan"))
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"scan reads columns the query never uses: $read")
  }

  test("d_decontaminate_ngram: eval gram set broadcasts, corpus never shuffles for the semi-join") {
    val p = plan(Registry.byName("d_decontaminate_ngram")
      .fn(spark, "/root/testdata/sf0.001"))
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      "eval-gram semi-join is not broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("d_sample_mixture: map-side partial aggregation before the shuffle") {
    val p = plan(Registry.byName("d_sample_mixture")
      .fn(spark, "/root/testdata/sf0.001"))
    // partial_count/partial_sum must appear below the exchange — the
    // keep-decision reduces map-side, only per-source partials shuffle
    assert(p.contains("partial_count") || p.contains("partial"),
      "no map-side partial aggregation")
    assert(!p.contains("CartesianProduct"))
  }

  test("d_bm25_topk: broadcast one-row stats, distributed top-k, no SMJ") {
    val p = plan(Registry.byName("d_bm25_topk")
      .fn(spark, "/root/testdata/sf0.001"))
    // the global-stats row joins back by BROADCAST nested loop (1 row),
    // never a shuffle join; ranking is TakeOrdered, not a global sort
    assert(p.contains("BroadcastNestedLoopJoin"),
      "global stats row is not broadcast")
    assert(!p.contains("SortMergeJoin"), "unexpected shuffle join")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k is not a distributed TakeOrdered")
  }

  test("d_importance_weight: scoring pass is map-only over the scan") {
    val p = plan(Registry.byName("d_importance_weight")
      .fn(spark, "/root/testdata/sf0.001"))
    // the 256-bucket model is inlined as a literal — the scored output
    // plan has NO join and NO aggregation exchange above the scan
    assert(!p.contains("Join"), "scoring pass should not join")
    assert(!p.contains("HashAggregate"), "scoring pass should not aggregate")
  }

  test("post-compaction lineage scan: projected off the scan, NO join") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(2000)
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("planspec-lin").toString + "/t",
      src.schema,
      properties = Map(GraftTable.RowLineageProp -> "true"))
    t.append(src)
    t.append(src.limit(100))
    t.compact()
    // every file now carries _row_id physically — lineage must come off
    // the parquet projection, not a (file, position) join-back
    val p = plan(t.scanWithLineage())
    assert(!p.contains("Join"),
      s"fully-compacted lineage scan should be join-free:\n$p")
    assert(t.scanWithLineage().select("_row_id").distinct().count() == 2100)
  }

  test("_file-bearing scans decode paths without a Scala UDF") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(1000)
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("planspec-fc").toString + "/t",
      src.schema)
    t.append(src)
    t.deleteWhereMoR(col("l_quantity") < 3) // exercises the MoR read too
    // StaticInvoke compiles to a direct static call inside
    // WholeStageCodegen; a Scala UDF would break fusion for the stage
    val df = t.scan(withFileColumn = true)
    df.collect() // finalize the AQE plan so codegen spans are visible
    val p = plan(df)
    assert(!p.toLowerCase.contains("scalaudf") && !p.contains("UDF("),
      s"_file scan contains a Scala UDF:\n$p")
    // `*(n)` prefixes mark WholeStageCodegen spans in the simple form
    assert(p.contains("*("), "no codegen span in _file scan")
  }

  test("ANALYZE pass: ONE ObjectHashAggregate pair, map-side partials") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("planspec-th").toString + "/t",
      src.schema)
    t.append(src)
    val exprs = graft.table.Stats.aggExprs(
      t.scan().schema.fields.filter(f =>
        graft.table.Stats.eligible(f.dataType)).toSeq)
    val df = t.scan().agg(exprs.head, exprs.tail: _*)
    df.collect()
    // the AQE plan string repeats nodes under "== Initial Plan ==" —
    // audit the FINAL plan section only
    val p = plan(df).split("== Initial Plan ==").head
    // the theta TypedImperativeAggregate partial-merges on the map side:
    // exactly one partial/final ObjectHashAggregate pair, one exchange
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) == 2,
      s"stats agg should be one partial/final pair:\n$p")
    assert(p.contains("partial_theta_sketch_agg"),
      "theta sketches must partial-aggregate map-side")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      "stats agg should shuffle exactly once")
  }

  test("adopted table: filters prune files through the adopted manifests") {
    import graft.model.TMonth
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val t = GraftTable.create(spark,
      java.nio.file.Files.createTempDirectory("planspec-ad").toString + "/t",
      src.schema, partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(src, repartitionByPartition = true)
    val layout = java.nio.file.Files
      .createTempDirectory("planspec-ad-layout").toString
    graft.table.IcebergInterop.exportTable(t, layout)
    val adopted = graft.table.IcebergInterop.adoptTable(spark, layout,
      java.nio.file.Files
        .createTempDirectory("planspec-ad-dst").toString + "/t")
    val cut = java.sql.Date.valueOf("1994-01-01")
    val filter = col("l_shipdate") < lit(cut)
    val pruned = adopted.planFiles(Some(filter)).size
    val total = adopted.planFiles().size
    assert(pruned < total,
      s"hidden partitioning dead after adoption ($pruned of $total)")
    // and the pruned read is still exact
    assert(adopted.scan(Some(filter)).count() ==
      src.filter(filter).count())
  }
}
