package graft.connector

import graft.{GraftQuery, Help, Tables}
import graft.table.GraftTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.2 Spark-integration queries: the DSv2 connector and SQL catalog as
  * driver-checked capabilities — a user drives graft tables entirely
  * through `spark.read.format("graft")` / `spark.sql` and gets the same
  * answers DuckDB computes from the source parquet.
  */
object ConnectorQueries {
  import Help._

  /** Catalog warehouse paths are memoized per session: Spark caches
    * catalog instances after first use, so re-pointing the warehouse conf
    * (and deleting the old directory) mid-session would leave the cached
    * GraftCatalog reading a vanished path. Re-runs reuse the same
    * warehouse and rely on DROP TABLE IF EXISTS for isolation.
    */
  private val warehouseCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def warehouseLoc(name: String): String =
    warehouseCache.computeIfAbsent(name, _ => loc(name))

  private def loc(name: String): String = {
    val root = java.nio.file.Paths.get("/root/repo/target/graft-conn")
    if (java.nio.file.Files.isDirectory(root)) {
      import scala.jdk.CollectionConverters._
      val ls = java.nio.file.Files.list(root)
      val dirs =
        try ls.iterator.asScala
          .filter(_.getFileName.toString.startsWith(s"$name-")).toSeq
        finally ls.close()
      dirs.foreach { d =>
        val w = java.nio.file.Files.walk(d)
        try w.sorted(java.util.Comparator.reverseOrder())
          .iterator.asScala.foreach(java.nio.file.Files.deleteIfExists(_))
        finally w.close()
      }
    }
    s"/root/repo/target/graft-conn/$name-${java.util.UUID.randomUUID.toString.take(8)}"
  }

  private def flagAgg(df: DataFrame): DataFrame =
    df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), r4(dsum(col("l_quantity"))).as("sum_qty"))
      .orderBy("l_returnflag")

  private val flagAggSql =
    s"SELECT l_returnflag, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty"

  def queries: Seq[GraftQuery] = Seq(
    // Full SQL surface through the TableCatalog: CREATE TABLE with
    // hidden partitioning, INSERT INTO, pushdown-pruned SELECT.
    GraftQuery(
      "ice_sql_catalog",
      (s, dir) => {
        val wh = warehouseLoc("wh")
        s.conf.set("spark.sql.catalog.graft_ct", "graft.connector.GraftCatalog")
        s.conf.set("spark.sql.catalog.graft_ct.warehouse", wh)
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft_ct.db")
        s.sql("DROP TABLE IF EXISTS graft_ct.db.li")
        s.sql(
          """CREATE TABLE graft_ct.db.li (
            |  l_orderkey BIGINT, l_quantity DOUBLE,
            |  l_returnflag STRING, l_shipdate TIMESTAMP_NTZ
            |) PARTITIONED BY (months(l_shipdate))""".stripMargin)
        Tables.tbl(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
          .createOrReplaceTempView("li_src_ct")
        s.sql("INSERT INTO graft_ct.db.li SELECT * FROM li_src_ct")
        flagAgg(s.sql(
          """SELECT l_returnflag, l_quantity FROM graft_ct.db.li
            |WHERE l_shipdate >= TIMESTAMP'1998-01-01 00:00:00'""".stripMargin))
      },
      Some(s"""$flagAggSql FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1 ORDER BY l_returnflag""")),

    // DataFrame connector roundtrip: format("graft") writes (append,
    // atomic overwrite), tagged time travel, pushdown-pruned reads.
    GraftQuery(
      "ice_dsv2_scan",
      (s, dir) => {
        val src = Tables.tbl(s, dir, "lineitem")
        val where = loc("dsv2")
        GraftTable.create(s, where, src.schema,
          partitionBy = Seq(("l_shipdate", graft.model.TMonth, "ship_month")))
        src.filter(col("l_orderkey") % 2 === 0)
          .write.format("graft").mode("append").save(where)
        val t = GraftTable.load(s, where)
        t.createTag("pre", t.metadata.currentSnapshotId.get)
        // ONE-commit truncate-and-replace through the connector
        src.filter(col("l_quantity") >= 25)
          .write.format("graft").mode("overwrite").save(where)
        val now = flagAgg(s.read.format("graft").load(where)
          .filter(col("l_shipdate") >= "1998-01-01")
          .select("l_returnflag", "l_quantity"))
          .withColumnRenamed("n", "n_now")
          .withColumnRenamed("sum_qty", "qty_now")
        val before = s.read.format("graft").option("ref", "pre").load(where)
          .filter(col("l_shipdate") >= "1998-01-01")
          .groupBy("l_returnflag").agg(count(lit(1)).as("n_before"))
        now.join(before, Seq("l_returnflag")).orderBy("l_returnflag")
      },
      Some(s"""SELECT a.l_returnflag, a.n_now, a.qty_now, b.n_before FROM
        (SELECT l_returnflag, COUNT(*) AS n_now,
           ${sqlDsum("l_quantity")} AS qty_now
         FROM lineitem
         WHERE l_quantity >= 25
           AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1) a
        JOIN
        (SELECT l_returnflag, COUNT(*) AS n_before FROM lineitem
         WHERE l_orderkey % 2 = 0
           AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1) b
        ON a.l_returnflag = b.l_returnflag
        ORDER BY a.l_returnflag""")))
}
