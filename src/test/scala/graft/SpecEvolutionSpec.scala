package graft

import graft.model._
import graft.table.GraftTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-spec evolution: files written before the evolution keep
  * pruning under their write-time spec, new files prune under the new
  * one, and both planning paths (driver loop and manifest dataset)
  * agree on every mixed-spec table.
  */
class SpecEvolutionSpec extends SparkSpec {

  private def freshLoc(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString + "/t"

  private def lineitem: DataFrame =
    Tables.tbl(spark, "/root/testdata/sf0.001", "lineitem")

  /** month(l_shipdate)-partitioned table, first half appended, then
    * evolved to bucket[8](l_orderkey) with the second half appended.
    */
  private def evolved(): (GraftTable, DataFrame, DataFrame) = {
    val src = lineitem
    val a = src.filter(col("l_orderkey") % 2 === 0)
    val b = src.filter(col("l_orderkey") % 2 === 1)
    val t = GraftTable.create(spark, freshLoc("evo"), src.schema,
      partitionBy = Seq(("l_shipdate", TMonth, "ship_month")))
    t.append(a, repartitionByPartition = true)
    t.evolvePartitionSpec(Seq(("l_orderkey", TBucket(8), "key_bucket")))
    t.append(b, repartitionByPartition = true)
    (t, a, b)
  }

  test("entries carry their write-time spec; scan returns everything") {
    val (t, a, b) = evolved()
    val bySpec = t.liveEntries().groupBy(_.specId)
    assert(bySpec.keySet == Set(Some(1), Some(2)), s"specs: ${bySpec.keySet}")
    assert(t.metadata.defaultSpecId == 2)
    assert(t.metadata.partitionSpecs.map(_.specId).sorted == Seq(1, 2))
    assert(t.scan().count() == a.count() + b.count())
  }

  test("old-spec files still prune on the old partition column") {
    val (t, a, _) = evolved()
    val f = col("l_shipdate") >= lit("1997-01-01") &&
      col("l_shipdate") < lit("1998-01-01")
    val planned = t.planFiles(Some(f))
    val oldSpec = planned.filter(_.specId.contains(1))
    val oldTotal = t.liveEntries().count(_.specId.contains(1))
    assert(oldSpec.size == 12, s"12 month files, got ${oldSpec.size} of $oldTotal")
    val expected = lineitem.filter(f).count()
    assert(t.scan(Some(f)).count() == expected)
    assert(t.scan(Some(f)).count() >= a.filter(f).count())
  }

  test("new-spec files prune on the new bucket column") {
    val (t, _, _) = evolved()
    val planned = t.planFiles(Some(col("l_orderkey") === 43L))
    val newSpec = planned.filter(_.specId.contains(2))
    assert(newSpec.size == 1, s"one bucket file, got ${newSpec.size}")
    assert(t.scan(Some(col("l_orderkey") === 43L)).count() ==
      lineitem.filter(col("l_orderkey") === 43L).count())
  }

  test("driver and distributed planning agree on mixed-spec tables") {
    val (t, _, _) = evolved()
    val filters = Seq(
      col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"),
      col("l_orderkey") === 43L,
      col("l_quantity") > 25.0)
    filters.foreach { f =>
      val driver = t.planFiles(Some(f)).map(_.path).toSet
      val dist = t.planFilesDistributed(Some(f))
        .collect().map(_.getString(0)).toSet
      assert(driver == dist,
        s"driver ${driver.size} != distributed ${dist.size} for $f")
    }
  }

  test("mutations work across specs; counts stay exact") {
    val (t, a, b) = evolved()
    val before = t.countRows()
    assert(before == a.count() + b.count())
    val doomed = lineitem.filter(col("l_orderkey") % 10 === 3)
    t.deleteWhere(col("l_orderkey") % 10 === 3)
    assert(t.countRows() == before - doomed.count())
    // rewritten files were re-derived under the CURRENT spec
    val specs = t.liveEntries().flatMap(_.specId).toSet
    assert(specs.subsetOf(Set(1, 2)), s"unexpected specs $specs")
  }

  test("evolving to an identical spec reuses it; empty spec unpartitions") {
    val (t, _, _) = evolved()
    t.evolvePartitionSpec(Seq(("l_shipdate", TMonth, "ship_month")))
    assert(t.metadata.defaultSpecId == 1, "identical spec must be reused")
    assert(t.metadata.partitionSpecs.size == 2)
    t.evolvePartitionSpec(Seq.empty)
    assert(t.metadata.defaultSpec.fields.isEmpty)
    t.append(lineitem.limit(10))
    assert(t.liveEntries().exists(e =>
      e.specId.contains(t.metadata.defaultSpecId) && e.partition.isEmpty))
  }

  test("avro export groups manifests by write-time spec and rounds trip") {
    val (t, a, b) = evolved()
    val out = java.nio.file.Files.createTempDirectory("evo-avro")
    val listPath = t.exportAvro(out.toString)
    val manifests = graft.table.AvroManifest.readManifestList(listPath)
    val entries = manifests.flatMap { case (p, _, _) =>
      graft.table.AvroManifest.readManifest(java.nio.file.Paths.get(p))
    }
    assert(entries.map(_.path).toSet == t.liveEntries().map(_.path).toSet)
    // each avro manifest holds entries of exactly one spec
    manifests.foreach { case (p, _, _) =>
      val specs = graft.table.AvroManifest
        .readManifest(java.nio.file.Paths.get(p)).flatMap(_.specId).toSet
      assert(specs.size == 1, s"manifest $p mixes specs $specs")
    }
    assert(entries.flatMap(_.specId).toSet == Set(1, 2))
    assert(entries.filter(_.isData).map(_.recordCount).sum ==
      a.count() + b.count())
  }
}
