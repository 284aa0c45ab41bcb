package graft

import graft.model.TIdentity
import graft.table.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Exact equality-delete attribution for UNCOVERED specs
  * (`GraftTable.computeDeleteAttribution` / `CALL
  * system.compute_delete_attribution`): when delete keys do not cover a
  * spec's source columns, `.partitions` answers NULL (unknown); the
  * CALL applies the deletes to data once — null-safe key equality,
  * delete sequence strictly above the row's, exactly the scan's match
  * rule — caches exact per-partition counts, and `.partitions` plus the
  * partition-statistics artifact serve them until the next commit
  * invalidates the cache.
  */
class DeleteAttributionSpec extends SparkSpec {

  private def tmp(n: String): String =
    java.nio.file.Files.createTempDirectory(s"eqatt-$n").toString + "/t"

  import org.apache.spark.sql.DataFrame
  private def eqCounts(df: DataFrame): Map[String, (Any, Any)] =
    df.select("partition", "equality_delete_record_count",
        "equality_delete_file_count")
      .collect().map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) null else r.getLong(1)),
          (if (r.isNullAt(2)) null else r.getLong(2)))).toMap

  test("uncovered spec: NULL before the CALL, exact after") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 1.0), ("a", 1L, 2.0), ("a", 2L, 3.0), ("a", 3L, 4.0),
      ("b", 1L, 5.0), ("b", 9L, 6.0))
      .toDF("cat", "k", "v")
    val t = GraftTable.create(spark, tmp("basic"), df.schema,
      partitionBy = Seq(("cat", TIdentity, "cat_p")))
    t.append(df, repartitionByPartition = true)
    // keys (k) do not cover the spec source (cat) → spec UNCOVERED.
    // key 1 matches rows in BOTH partitions (counts toward both);
    // key 2 matches only a (twice — still ONE record); 42 matches none
    t.deleteWhereEq(Seq(1L, 2L, 42L).toDF("k"))
    val before = eqCounts(t.partitionsDf)
    assert(before("cat_p=a") == ((null, null)), s"expected NULL: $before")
    assert(before("cat_p=b") == ((null, null)), s"expected NULL: $before")

    val ref = t.computeDeleteAttribution()
    val after = eqCounts(t.partitionsDf)
    assert(after("cat_p=a") == ((2L, 1L)), s"exact a: $after")
    assert(after("cat_p=b") == ((1L, 1L)), s"exact b: $after")
    // the durable partition-statistics artifact carries the SAME exact
    // counts (it was written after the cache registration)
    val fromFile = spark.read.parquet(ref.path)
      .select(concat(lit("cat_p="), col("partition.cat_p")).as("partition"),
        col("equality_delete_record_count"),
        col("equality_delete_file_count"))
    assert(eqCounts(fromFile) == after, "stats file diverged")
  }

  test("a commit invalidates the cache; re-CALL respects sequences") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("b", 1L, 2.0)).toDF("cat", "k", "v")
    val t = GraftTable.create(spark, tmp("seq"), df.schema,
      partitionBy = Seq(("cat", TIdentity, "cat_p")))
    t.append(df, repartitionByPartition = true)
    t.deleteWhereEq(Seq(1L).toDF("k"))
    t.computeDeleteAttribution()
    assert(eqCounts(t.partitionsDf)("cat_p=a") == ((1L, 1L)))
    // a NEW append with the same key, in a new partition, at a sequence
    // ABOVE the delete's: first the commit invalidates the cache...
    t.append(Seq(("c", 1L, 3.0)).toDF("cat", "k", "v"),
      repartitionByPartition = true)
    val stale = eqCounts(t.partitionsDf)
    assert(stale("cat_p=a") == ((null, null)), s"cache must expire: $stale")
    // ...then the re-CALL attributes nothing to the new partition (the
    // delete is strictly OLDER than its rows — the scan's own rule)
    t.computeDeleteAttribution()
    val again = eqCounts(t.partitionsDf)
    assert(again("cat_p=a") == ((1L, 1L)) && again("cat_p=b") == ((1L, 1L)))
    assert(again("cat_p=c") == ((0L, 0L)), s"newer rows survive: $again")
  }

  test("metadata-only schema evolution invalidates the cache too") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1.0), ("b", 2L, 2.0)).toDF("cat", "k", "v")
    val t = GraftTable.create(spark, tmp("evolve"), df.schema,
      partitionBy = Seq(("cat", TIdentity, "cat_p")))
    t.append(df, repartitionByPartition = true)
    t.deleteWhereEq(Seq(1L).toDF("k"))
    t.computeDeleteAttribution()
    assert(eqCounts(t.partitionsDf)("cat_p=a") == ((1L, 1L)))
    // a RENAME is metadata-only (no new snapshot) but can flip a spec
    // between covered and uncovered — the cache must not survive it
    t.renameColumn("v", "w")
    val stale = eqCounts(t.partitionsDf)
    assert(stale("cat_p=a") == ((null, null)),
      s"schema evolution must expire the cache: $stale")
  }

  test("null-safe keys; covered signatures stay key-mapped and sum") {
    import spark.implicits._
    val df = Seq(("a", Some(1L), 1.0), ("a", None, 2.0), ("b", None, 3.0))
      .toDF("cat", "k", "v")
    val t = GraftTable.create(spark, tmp("mix"), df.schema,
      partitionBy = Seq(("cat", TIdentity, "cat_p")))
    t.append(df, repartitionByPartition = true)
    // uncovered signature (k) with a NULL key: null matches null rows
    // in BOTH partitions, per Iceberg's null-safe equality semantics
    t.deleteWhereEq(Seq[Option[Long]](None).toDF("k"))
    // covered signature (cat): key-mapped attribution — the record
    // counts toward cat_p=a whether or not it still matches data
    t.deleteWhereEq(Seq("a").toDF("cat"))
    t.computeDeleteAttribution()
    val after = eqCounts(t.partitionsDf)
    // a: 1 matched (null key) + 1 key-mapped (covered sig) = 2 records
    // across 2 distinct delete files; b: the null-key match only
    assert(after("cat_p=a") == ((2L, 2L)), s"sum of both paths: $after")
    assert(after("cat_p=b") == ((1L, 1L)), s"null-safe match: $after")
  }

  test("CALL system.compute_delete_attribution through the catalog") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("eqatt-wh").toString
    spark.conf.set("spark.sql.catalog.gatt", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gatt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gatt.db")
    spark.sql("DROP TABLE IF EXISTS gatt.db.t")
    spark.sql("""CREATE TABLE gatt.db.t (cat STRING, k BIGINT, v DOUBLE)
      PARTITIONED BY (cat)""")
    Seq(("a", 1L, 1.0), ("b", 1L, 2.0)).toDF("cat", "k", "v")
      .createOrReplaceTempView("eqatt_src")
    spark.sql("INSERT INTO gatt.db.t SELECT * FROM eqatt_src")
    val g = GraftTable.load(spark, s"$wh/db/t")
    g.deleteWhereEq(Seq(1L).toDF("k"))
    val out = spark.sql(
      "CALL gatt.system.compute_delete_attribution('db.t')").head()
    assert(out.getLong(0) == g.metadata.currentSnapshotId.get)
    assert(out.getString(1).nonEmpty && out.getLong(2) > 0L)
    val after = eqCounts(g.partitionsDf)
    assert(after.values.forall(_ == ((1L, 1L))), s"exact via SQL: $after")
  }
}
