package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-floor for the write path: raw Spark parquet writes of lineitem
  * (plain and month-partitioned) in the bench session, no graft
  * machinery — how much of a GraftTable append is Spark itself.
  */
object MicroWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // warmup
    src.write.format("noop").mode("overwrite").save()
    val base = java.nio.file.Files.createTempDirectory("microwrite")
    def t(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    var n = 0
    def out(): String = { n += 1; s"$base/o$n" }
    t("plain3task")(src.write.parquet(out()))
    t("coalesce1")(src.coalesce(1).write.parquet(out()))
    t("bymonth")(src.withColumn("m", date_format(col("l_shipdate"), "yyyyMM"))
      .write.partitionBy("m").parquet(out()))
    t("noop-scan")(src.write.format("noop").mode("overwrite").save())
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    hc.setBoolean("mapreduce.fileoutputcommitter.marksuccessfuljobs", false)
    t("plain3task-v2")(src.write.parquet(out()))
    t("bymonth-v2")(src.withColumn("m",
        date_format(col("l_shipdate"), "yyyyMM"))
      .write.partitionBy("m").parquet(out()))
    val src4 = src.select("l_shipdate", "l_orderkey", "l_quantity",
      "l_returnflag")
    t("bymonth4col")(src4.withColumn("m",
        date_format(col("l_shipdate"), "yyyyMM"))
      .write.partitionBy("m").parquet(out()))
    t("bymonth4col-nodict")(src4.withColumn("m",
        date_format(col("l_shipdate"), "yyyyMM"))
      .write.option("parquet.enable.dictionary", "false")
      .partitionBy("m").parquet(out()))
    t("bymonth4col-1task")(src4.coalesce(1).withColumn("m",
        date_format(col("l_shipdate"), "yyyyMM"))
      .write.partitionBy("m").parquet(out()))
    spark.stop()
  }
}
