package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: phase timing of ice_rest_catalog via a copy of the
  * key's body with lap timers (optimization-round diagnostics only).
  */
object RestProbe {
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
    try graft.SparkEntry.queries("q01_pricing_summary")(s, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"warmup: $e") }
    // run the real key once to warm the staging cache + rest server
    graft.SparkEntry.queries("ice_rest_catalog")(s, sfDir)
      .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { round =>
      var last = System.nanoTime()
      def lap(tag: String): Unit = {
        val now = System.nanoTime()
        println(f"[rest] $round $tag%-18s ${(now - last) / 1e9}%6.3f")
        last = now
      }
      graft.SparkEntry.queries("ice_rest_catalog")(s, sfDir)
        .write.format("noop").mode("overwrite").save()
      lap("full-key")
      // decomposed: the INSERT alone
      s.sql("INSERT INTO graft_rest.db.li_rest " +
        "SELECT * FROM li_src_rest WHERE l_orderkey % 100 = 7")
      lap("insert-only")
      s.sql("SELECT l_returnflag, count(*) FROM graft_rest.db.li_rest " +
        "WHERE l_shipdate >= TIMESTAMP'1998-01-01 00:00:00' " +
        "GROUP BY 1 ORDER BY 1").collect()
      lap("select-only")
    }
    spark.stop()
  }
}
