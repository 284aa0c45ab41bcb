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
}
