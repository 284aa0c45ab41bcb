package graft.tools

import org.apache.spark.sql.SparkSession

/** Optimization-round helper: write `explain("formatted")` for named
  * registry keys (or key prefixes) to text files, one per key — the plan
  * evidence OPTIMIZATION_r*.md cites lives in plans/r*&#47;.
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> key[,key...]
  * (keys match exactly or by prefix, like the bench's subset filter).
  * The dumped plan is the query's RETURNED read plan — demo keys run
  * their construction first, exactly as the bench does.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val keys = args(2).split(',').map(_.trim).filter(_.nonEmpty)
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val selected = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => keys.exists(k => n == k || n.startsWith(k)))
    selected.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"OK   $name")
      } catch { case e: Throwable =>
        println(s"FAIL $name: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
