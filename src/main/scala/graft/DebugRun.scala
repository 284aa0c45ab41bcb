package graft

/** Scratch runner: execute named registry queries against a data dir and
  * print full stack traces (bench reports ok=false without the cause).
  */
object DebugRun {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      try {
        val rows = Registry.byName(n).fn(spark, dir).count()
        println(s"OK   $n rows=$rows")
      } catch {
        case e: Throwable =>
          println(s"FAIL $n: ${e.getClass.getName}: ${e.getMessage}")
          e.printStackTrace()
      }
    }
    spark.stop()
  }
}
