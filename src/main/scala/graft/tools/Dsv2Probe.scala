package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: per-phase wall clock of the ice_dsv2_scan key
  * (optimization-round diagnostics only).
  */
object Dsv2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions",
        "graft.connector.GraftSparkSessionExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    // warmup
    try graft.SparkEntry.queries("q01_pricing_summary")(s, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"warmup: $e") }

    (1 to 3).foreach { round =>
      var last = System.nanoTime()
      def lap(tag: String): Unit = {
        val now = System.nanoTime()
        println(f"[dsv2] $round $tag%-22s ${(now - last) / 1e9}%6.3f")
        last = now
      }
      val src = graft.Tables.tbl(s, sfDir, "lineitem")
        .select("l_shipdate", "l_orderkey", "l_quantity", "l_returnflag")
      val where = graft.Staging.freshDir("graft-conn", "dsv2probe")
      lap("srcdef+freshdir")
      graft.table.GraftTable.create(s, where, src.schema,
        partitionBy = Seq(("l_shipdate", graft.model.TMonth, "ship_month")))
      lap("create")
      src.filter(col("l_orderkey") % 2 === 0)
        .write.format("graft").mode("append").save(where)
      lap("append-write")
      val t = graft.table.GraftTable.load(s, where)
      lap("load")
      t.createTag("pre", t.metadata.currentSnapshotId.get)
      lap("tag")
      src.filter(col("l_quantity") >= 25)
        .write.format("graft").mode("overwrite").save(where)
      lap("overwrite-write")
      val now2 = s.read.format("graft").load(where)
        .filter(col("l_shipdate") >= "1998-01-01")
        .select("l_returnflag", "l_quantity")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_now"))
      val before = s.read.format("graft").option("ref", "pre").load(where)
        .filter(col("l_shipdate") >= "1998-01-01")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_before"))
      lap("readback-def")
      now2.join(before, Seq("l_returnflag")).orderBy("l_returnflag")
        .write.format("noop").mode("overwrite").save()
      lap("readback-exec")
    }
    spark.stop()
  }
}
