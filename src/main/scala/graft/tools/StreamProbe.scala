package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch probe: count micro-batches and per-batch wall for the
  * streaming drain keys (optimization-round diagnostics only).
  */
object StreamProbe {
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
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] started ${e.name}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(f"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
          f"durMs=${p.batchDuration} " +
          s"stateOps=${p.stateOperators.length} " +
          p.durationMs.toString)
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[probe] terminated")
    })
    args.foreach { k =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(k)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $k total=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    Thread.sleep(500)
    spark.stop()
  }
}
