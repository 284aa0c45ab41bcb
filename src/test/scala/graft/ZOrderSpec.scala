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

  test("interleaveN: n=2 matches the binary path; monotone in 3 dims") {
    val xs = Seq(-1000L, -1L, 0L, 1L, 5L, 1L << 40)
    for (a <- xs; b <- xs)
      assert(ZOrderOps.interleaveN(Array(a, b)).toSeq ==
        ZOrderOps.interleave(a, b).toSeq, s"n=2 mismatch at ($a,$b)")
    def sortedZ(zs: Seq[Array[Byte]]): Boolean =
      zs.sliding(2).forall {
        case Seq(a, b) => ZOrderOps.compareZ(a, b) < 0
        case _ => true
      }
    // holding any two of three dims fixed, z grows with the third
    for (f1 <- Seq(-1L, 7L); f2 <- Seq(0L, 1L << 20)) {
      assert(sortedZ(xs.map(x => ZOrderOps.interleaveN(Array(x, f1, f2)))))
      assert(sortedZ(xs.map(x => ZOrderOps.interleaveN(Array(f1, x, f2)))))
      assert(sortedZ(xs.map(x => ZOrderOps.interleaveN(Array(f1, f2, x)))))
    }
    // octant ordering: all-small < all-large
    assert(ZOrderOps.compareZ(
      ZOrderOps.interleaveN(Array(1L, 1L, 1L)),
      ZOrderOps.interleaveN(Array(1L << 40, 1L << 40, 1L << 40))) < 0)
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

  test("3-dimensional z-order clustering prunes on ALL THREE columns") {
    val src = Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")
    val loc = java.nio.file.Files
      .createTempDirectory("zorder3").toString + "/t"
    val t = GraftTable.create(spark, loc, src.schema)
    val z3 = ZOrder.zorderScaledN(Seq(
      (col("l_orderkey"), 0L, 1500L),
      (col("l_partkey"), 0L, 200L),
      (col("l_suppkey"), 0L, 10L)))
    // file count sets per-dimension resolution: log2(files)/dims bits
    // each. 8 files over 3 dims = ONE bit per dim, which quantile
    // (non-bit-aligned) range boundaries wash out — 32 files give each
    // dimension bounded sub-ranges in most files (verified offline by
    // replaying the interleave over the actual table)
    t.append(src.repartitionByRange(32, z3), sortWithin = Seq(z3))
    val total = t.liveEntries().size
    assert(total >= 16, s"test premise: many files, got $total")
    val onOrder = t.planFiles(
      Some(col("l_orderkey").between(1000L, 1200L))).size
    val onPart = t.planFiles(Some(col("l_partkey").between(10L, 20L))).size
    val onSupp = t.planFiles(Some(col("l_suppkey") === 3L)).size
    assert(onOrder < total, s"no orderkey pruning: $onOrder/$total")
    assert(onPart < total, s"no partkey pruning: $onPart/$total")
    assert(onSupp < total, s"no suppkey pruning: $onSupp/$total")
  }
}
