package graft

import graft.functions.{ZOrder, ZOrderOps}
import graft.table.GraftTable
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("interleave is monotone per dimension and orders quadrants") {
    def sortedZ(zs: Seq[Array[Byte]]): Boolean =
      zs.sliding(2).forall {
        case Seq(a, b) => ZOrderOps.compareZ(a, b) < 0
        case _ => true
      }
    // holding one dim fixed, z-value grows with the other
    val xs = Seq(-1000L, -1L, 0L, 1L, 5L, 1L << 40)
    for (fix <- xs) {
      assert(sortedZ(xs.map(x => ZOrderOps.interleave(x, fix))),
        s"not monotone in a (fix=$fix)")
      assert(sortedZ(xs.map(y => ZOrderOps.interleave(fix, y))),
        s"not monotone in b (fix=$fix)")
    }
    // quadrant ordering: both-small < both-large
    assert(ZOrderOps.compareZ(
      ZOrderOps.interleave(1L, 1L),
      ZOrderOps.interleave(1L << 40, 1L << 40)) < 0)
  }

  test("z-order clustering bounds file ranges in BOTH dimensions") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")

    def buildAndPlan(sortCol: org.apache.spark.sql.Column): (Int, Int, Int) = {
      val loc = java.nio.file.Files
        .createTempDirectory("zorder").toString + "/t"
      val t = GraftTable.create(spark, loc, src.schema)
      t.append(src.repartitionByRange(8, sortCol),
        sortWithin = Seq(sortCol))
      val total = t.liveEntries().size
      val onOrder = t.planFiles(
        Some(col("l_orderkey").between(1000L, 1200L))).size
      val onPart = t.planFiles(
        Some(col("l_partkey").between(10L, 20L))).size
      (total, onOrder, onPart)
    }

    // lexicographic by orderkey: prunes orderkey filters, NOT partkey
    val (t1, lexOrder, lexPart) = buildAndPlan(col("l_orderkey"))
    assert(lexOrder < t1, "lexicographic must prune its own column")
    // range-normalized z-order: prunes BOTH dimensions
    val (t2, zOrder_, zPart) = buildAndPlan(
      ZOrder.zorderScaled(col("l_orderkey"), 0L, 1500L,
        col("l_partkey"), 0L, 200L))
    assert(zOrder_ < t2, s"z-order failed to prune orderkey: $zOrder_/$t2")
    assert(zPart < t2, s"z-order failed to prune partkey: $zPart/$t2")
    // and partkey pruning must beat the lexicographic layout, where the
    // second dimension spans every file
    assert(lexPart == t1, "test premise: lexicographic spans partkey")
    assert(zPart < lexPart)
  }
}
